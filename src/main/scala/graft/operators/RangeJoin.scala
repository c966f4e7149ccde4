package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed range join: `left.point BETWEEN right.lo AND right.hi`
  * with NO equi key.
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side fits in memory) — O(n·m) at
  * scale. The standard fix, and what dedicated interval-join engines
  * do internally (the reference's IntervalJoinOperator bucketizes
  * event time the same way; Databricks' range-join optimization is the
  * same idea as a planner rule): quantize the range dimension into
  * fixed-width bins, replicate each interval to every bin it overlaps,
  * give each point its single containing bin, equi-join on the bin id
  * and re-check the exact predicate as a residual filter.
  *
  * Cost model: intervals spanning w bins replicate w×; points never
  * replicate. Choose binWidth near the typical interval length so the
  * average interval lands in ~2 bins; the shuffle then carries
  * ~2·|right| + |left| rows on a well-distributed key — no hot key,
  * no nested loop. Degenerate long intervals (≫ binWidth) fan out
  * proportionally; cap them upstream or split the dimension per scale
  * notes elsewhere (same df-cap reasoning as q66's shingles).
  */
object RangeJoin {

  /** Inner-join rows of `left` to the rows of `right` whose
    * [lo, hi] interval contains `point` (inclusive both ends).
    * All three columns must be in the same integral unit (e.g. µs).
    * Output: left columns then right columns, like a plain join. */
  def pointInInterval(left: DataFrame, point: Column,
                      right: DataFrame, lo: Column, hi: Column,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("__bin", floorDiv(point, binWidth))
    val rb = right.withColumn("__bin",
      explode(sequence(floorDiv(lo, binWidth), floorDiv(hi, binWidth))))
    lb.join(rb, "__bin")
      .filter(point >= lo && point <= hi)
      .drop("__bin")
  }

  /** Floor division on integral columns (negative-safe: pmod makes the
    * numerator an exact multiple of w). The division runs in DECIMAL,
    * not double: a double `/` is inexact once |c| ≥ 2^53 and could
    * silently mis-bin (drop or duplicate) join pairs; decimal division
    * of an exact multiple is exact at any long magnitude. */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")
}
