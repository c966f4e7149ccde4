package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generic vertex-centric iteration surface: program semantics
  * (scatter-from-active, gather-merge, vote-to-halt), termination, and
  * a novel program written directly against the API (max-value flood)
  * — the "new algorithm without hand-written joins" use case. */
class PregelSpec extends SparkSpec {

  import spark.implicits._

  //   1 → 2 → 3     4 → 5      6 (isolated)
  private def edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
  private def vertices = (1L to 6L).toDF("id")

  test("SSSP as a vertex program (directed chain)") {
    val weighted = edges.withColumn("weight", lit(1.0))
    val init = vertices.select(col("id"),
      when(col("id") === 1L, 0.0).as("dist"))
    val out = Pregel.delta(init, weighted, "dist", maxIter = 10,
        initialActive = col("dist").isNotNull)(
      sendMsg = col("src_dist") + col("weight"),
      mergeMsg = ms => min(ms),
      vprog = (cur, m) => when(cur.isNull || m < cur, m).otherwise(cur))
    val got = out.collect().map(r =>
      r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(got == Map(1L -> Some(0.0), 2L -> Some(1.0), 3L -> Some(2.0),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("inactive vertices do not scatter; no-inbox vertices halt") {
    // only vertex 4 active initially: the 1→2→3 chain must stay put
    val weighted = edges.withColumn("weight", lit(1.0))
    val init = vertices.select(col("id"),
      when(col("id") === 4L, 0.0).as("dist"))
    val out = Pregel.delta(init, weighted, "dist", maxIter = 10,
        initialActive = col("dist").isNotNull)(
      sendMsg = col("src_dist") + col("weight"),
      mergeMsg = ms => min(ms),
      vprog = (cur, m) => when(cur.isNull || m < cur, m).otherwise(cur))
    val reached = out.filter(col("dist").isNotNull)
      .collect().map(_.getLong(0)).toSet
    assert(reached == Set(4L, 5L))
  }

  test("maxIter caps supersteps") {
    val weighted = edges.withColumn("weight", lit(1.0))
    val init = vertices.select(col("id"),
      when(col("id") === 1L, 0.0).as("dist"))
    val out = Pregel.delta(init, weighted, "dist", maxIter = 1,
        initialActive = col("dist").isNotNull)(
      sendMsg = col("src_dist") + col("weight"),
      mergeMsg = ms => min(ms),
      vprog = (cur, m) => when(cur.isNull || m < cur, m).otherwise(cur))
    // one superstep: only vertex 2 got a distance
    val reached = out.filter(col("dist").isNotNull)
      .collect().map(_.getLong(0)).toSet
    assert(reached == Set(1L, 2L))
  }

  test("a novel program straight on the API: max-value flood") {
    // undirected max propagation — the component maximum floods each
    // component; written with zero hand-rolled superstep joins
    val bidir = edges.union(edges.select(col("dst"), col("src")))
    val init = vertices.select(col("id"), col("id").as("best"))
    val out = Pregel.delta(init, bidir, "best", maxIter = 10)(
      sendMsg = col("src_best"),
      mergeMsg = ms => max(ms),
      vprog = (cur, m) => greatest(cur, m))
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 5L, 5L -> 5L, 6L -> 6L))
  }

  test("vertex schema is validated") {
    val bad = vertices.withColumn("a", lit(1)).withColumn("b", lit(2))
    val e = intercept[IllegalArgumentException] {
      Pregel.delta(bad, edges, "a", 3)(col("src_a"), ms => min(ms), (c, _) => c)
    }
    assert(e.getMessage.contains("struct"))
  }
}
