package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  private def df(pairs: (Long, Long)*) = {
    val spark2 = spark; import spark2.implicits._
    pairs.toDF("src", "dst")
  }
  private def verts(ids: Long*) = {
    val spark2 = spark; import spark2.implicits._
    ids.toDF("id")
  }

  test("connectedComponents labels two components and an isolate") {
    // component {1,2,3}, component {4,5}, isolate {6}
    val cc = GraphOps.connectedComponents(
      verts(1, 2, 3, 4, 5, 6), df((1, 2), (2, 3), (4, 5)))
    val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("pageRank sums to ~1 and ranks the hub highest") {
    // star: all point to 1
    val pr = GraphOps.pageRank(verts(1, 2, 3, 4), df((2, 1), (3, 1), (4, 1)), iters = 15)
    val ranks = pr.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6)
    assert(ranks(1L) > ranks(2L) && ranks(2L) == ranks(3L))
  }

  test("triangleCounts finds the one triangle") {
    val tc = GraphOps.triangleCounts(df((1, 2), (2, 3), (3, 1), (3, 4)))
    val got = tc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
