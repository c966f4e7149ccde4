package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join: equality with the naive nested-loop result and
  * the no-nested-loop plan property it exists for. */
class RangeJoinSpec extends SparkSpec {

  private def fixtures = {
    val spark2 = spark; import spark2.implicits._
    // deterministic pseudo-random points and intervals (no RNG)
    val pts = (1 to 300).map(i => (i.toLong, (i * 7919L) % 1000))
      .toDF("p_id", "t")
    val ivs = (1 to 40).map { j =>
      val lo = (j * 104729L) % 900
      (j.toLong, lo, lo + 30 + (j % 4) * 40) // widths 30..150
    }.toDF("i_id", "lo", "hi")
    (pts, ivs)
  }

  test("matches the nested-loop result exactly") {
    val (pts, ivs) = fixtures
    val naive = pts.join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("p_id", "i_id")
    val binned = RangeJoin.pointInInterval(
        pts, col("t"), ivs, col("lo"), col("hi"), binWidth = 64)
      .select("p_id", "i_id")
    assert(naive.count() > 0) // the fixture actually joins
    assert(binned.except(naive).count() == 0)
    assert(naive.except(binned).count() == 0)
  }

  test("bin width 1 and huge bin width are still exact") {
    val (pts, ivs) = fixtures
    val naive = pts.join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("p_id", "i_id").collect().toSet
    for (w <- Seq(1L, 1000000L)) {
      val got = RangeJoin.pointInInterval(
          pts, col("t"), ivs, col("lo"), col("hi"), binWidth = w)
        .select("p_id", "i_id").collect().toSet
      assert(got == naive, s"binWidth=$w diverged")
    }
  }

  test("negative coordinates bin correctly (floor, not truncate)") {
    val spark2 = spark; import spark2.implicits._
    val pts = Seq((1L, -5L), (2L, -64L), (3L, 0L)).toDF("p_id", "t")
    val ivs = Seq((10L, -70L, -1L)).toDF("i_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(
        pts, col("t"), ivs, col("lo"), col("hi"), binWidth = 64)
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // -5 and -64 in [-70,-1]; 0 outside
  }

  test("plans as an equi-join on the bin, not a nested loop") {
    val (pts, ivs) = fixtures
    val plan = RangeJoin.pointInInterval(
        pts, col("t"), ivs, col("lo"), col("hi"), binWidth = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    val naivePlan = pts
      .join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
           naivePlan.contains("CartesianProduct"),
      "baseline is no longer a nested loop — reassess the operator")
  }
}
