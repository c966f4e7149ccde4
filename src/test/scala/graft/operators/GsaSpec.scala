package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The other two Gelly iteration surfaces: pull-based Gather-Sum-Apply
  * (gsa/GatherSumApplyIteration.java) and scatter-gather
  * (spargel/ScatterGatherIteration.java). */
class GsaSpec extends SparkSpec {

  import spark.implicits._

  //   1 → 2 → 3     4 → 5      6 (isolated)
  private def edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
  private def vertices = (1L to 6L).toDF("id")

  test("GSA SSSP pulls to the same fixpoint as the push surface") {
    val weighted = edges.withColumn("weight", lit(1.0))
    val init = vertices.select(col("id"),
      when(col("id") === 1L, 0.0).as("dist"))
    val out = Gsa.run(init, weighted, "dist", maxIter = 10)(
      gather = col("nbr_dist") + col("weight"),
      sum = ms => min(ms),
      apply = (cur, m) => when(cur.isNull || m < cur, m).otherwise(cur))
    val got = out.collect().map(r =>
      r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(1L -> Some(0.0), 2L -> Some(1.0), 3L -> Some(2.0),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("GSA converges early: unchanged solution stops the loop") {
    // all vertices already at the fixpoint (component max) — the
    // convergence check must stop after the first superstep
    val bidir = edges.union(edges.select(col("dst"), col("src")))
    val init = Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 5L, 5L -> 5L,
      6L -> 6L).toDF("id", "best")
    val out = Gsa.run(init, bidir, "best", maxIter = 50)(
      gather = col("nbr_best"),
      sum = ms => max(ms),
      apply = (cur, m) => greatest(cur, m))
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 5L, 5L -> 5L, 6L -> 6L))
  }

  test("GSA maxIter caps supersteps") {
    val weighted = edges.withColumn("weight", lit(1.0))
    val init = vertices.select(col("id"),
      when(col("id") === 1L, 0.0).as("dist"))
    val out = Gsa.run(init, weighted, "dist", maxIter = 1)(
      gather = col("nbr_dist") + col("weight"),
      sum = ms => min(ms),
      apply = (cur, m) => when(cur.isNull || m < cur, m).otherwise(cur))
    val reached = out.filter(col("dist").isNotNull)
      .collect().map(_.getLong(0)).toSet
    assert(reached == Set(1L, 2L))
  }

  test("scatter-gather surface runs the spargel CC program") {
    val bidir = edges.union(edges.select(col("dst"), col("src")))
    val init = vertices.select(col("id"), col("id").as("component"))
    val out = ScatterGather.run(init, bidir, "component", maxIter = 10)(
      scatter = col("src_component"),
      combine = ms => min(ms),
      gather = (cur, m) => when(m < cur, m).otherwise(cur))
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }
}
