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

  test("shortestPaths relaxes weighted edges from the source") {
    val spark2 = spark; import spark2.implicits._
    // 1→2 (1.0), 2→3 (1.0), 1→3 (5.0): best path to 3 is 2.0; 4 unreachable
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0))
      .toDF("src", "dst", "weight")
    val got = GraphOps.shortestPaths(verts(1, 2, 3, 4), e, source = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0)) // no row for 4
  }

  test("labelPropagation converges on a two-community barbell") {
    // triangle {1,2,3} + triangle {4,5,6}, one bridge 3-4
    val lp = GraphOps.labelPropagation(
      verts(1, 2, 3, 4, 5, 6),
      df((1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)), iters = 6)
    val got = lp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each triangle agrees internally on one label
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
  }

  test("jaccardSimilarity scores co-neighborhood overlap") {
    // N(1)={2,3}, N(4)={2,3} → jaccard(1,4) = 2/2 = 1.0
    val j = GraphOps.jaccardSimilarity(df((1, 2), (1, 3), (4, 2), (4, 3)))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 4L)) == 1.0)
    // N(2)={1,4}, N(3)={1,4} → jaccard(2,3) = 1.0 as well
    assert(j((2L, 3L)) == 1.0)
    assert(j.size == 2)
  }

  test("communityDetection separates two weighted triangles") {
    val spark2 = spark; import spark2.implicits._
    // triangle {1,2,3} + triangle {4,5,6}, weak bridge 3-4
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0),
                (4L, 5L, 1.0), (5L, 6L, 1.0), (6L, 4L, 1.0),
                (3L, 4L, 0.1))
      .toDF("src", "dst", "weight")
    val got = GraphOps.communityDetection(verts(1, 2, 3, 4, 5, 6), e,
        maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L)) // the weak bridge does not merge them
  }

  test("hits ranks the hub and authority of a bipartite fan") {
    // 1,2,3 all point at 4; 1 also points at 5.
    // 4 is the top authority; 1 is the top hub (points at both).
    val h = GraphOps.hits(df((1, 4), (2, 4), (3, 4), (1, 5)), iters = 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val topAuth = h.maxBy(_._2._2)._1
    val topHub = h.maxBy(_._2._1)._1
    assert(topAuth == 4L && topHub == 1L)
    // L2 norms are 1 after the final normalization
    assert(math.abs(h.values.map(v => v._2 * v._2).sum - 1.0) < 1e-9)
    assert(math.abs(h.values.map(v => v._1 * v._1).sum - 1.0) < 1e-9)
  }

  test("clusteringCoefficient is 1 on a triangle, lower with a pendant") {
    // triangle {1,2,3} + pendant edge 3-4
    val cc = GraphOps.clusteringCoefficient(df((1, 2), (2, 3), (3, 1), (3, 4)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(cc(1L) == ((2L, 1.0)))
    assert(cc(2L) == ((2L, 1.0)))
    assert(cc(3L) == ((3L, 1.0 / 3))) // 1 triangle of 3 possible pairs
    assert(cc(4L) == ((1L, 0.0)))
  }

  test("adamicAdar scores the shared-hub pair by the hub's quantized log degree") {
    // star center 1 with leaves 2,3,4 + edge 2-3: pair (2,3) shares
    // hub 1 (deg 3 → blog2 = 1 → w = 1e6) AND each other... common
    // neighbors of (2,3) = {1}; (2,4) and (3,4) also share {1}.
    val aa = GraphOps.adamicAdar(df((1, 2), (1, 3), (1, 4), (2, 3)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // hub 1 has deg 3 → floor(log2 3)=1 → weight 1_000_000
    assert(aa((2L, 3L)) == ((1L, 1000000L)))
    assert(aa((2L, 4L)) == ((1L, 1000000L)))
    assert(aa((3L, 4L)) == ((1L, 1000000L)))
    // pair (1,2): common neighbor 3 (deg 2 → blog2 1 → 1e6);
    // 4 is NOT common (deg 1, only neighbor of 1)
    assert(aa((1L, 2L)) == ((1L, 1000000L)))
  }

  test("intraListPairs distributes a 5000-degree hub across banded join keys") {
    val spark2 = spark; import spark2.implicits._
    // One hub posting list of 5000 sorted neighbors. The round-6 shape
    // built all 12,497,500 pairs as ONE array value in ONE row — the
    // OOM class at a 100k-degree hub. The banded shape must (a) produce
    // the exact pair count, (b) spread the work over >1 (src, block)
    // join key, (c) never construct a flattened pair array in the plan.
    val ns = (1L to 5000L).toArray
    val nbrs = Seq((0L, ns)).toDF("src", "ns")
    val pairs = GraphOps.intraListPairs(nbrs)
    val n = ns.length.toLong
    assert(pairs.count() == n * (n - 1) / 2)
    // banding: ceil(5000/1024) = 5 blocks → 15 unordered block pairs
    val blocks = (n - 1) / GraphOps.PairBlock + 1
    assert(blocks > 1)
    val plan = pairs.queryExecution.optimizedPlan.toString
    assert(!plan.contains("flatten("), "pair set must never be one array value")
    assert(plan.toLowerCase.contains("join"), "pairs must come from a distributed self-join")
    // spot-check order and bounds on a tiny list
    val tiny = GraphOps.intraListPairs(Seq((9L, Array(3L, 5L, 8L))).toDF("src", "ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny == Set((3L, 5L), (3L, 8L), (5L, 8L)))
  }

  test("localClusteringCoefficient is exact ppm of the double form") {
    val ppm = GraphOps.localClusteringCoefficient(df((1, 2), (2, 3), (3, 1), (3, 4)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(ppm(1L) == 1000000L && ppm(2L) == 1000000L)
    assert(ppm(3L) == 333333L) // 2e6*1 // (3*2)
    assert(ppm(4L) == 0L)
  }

  test("graphMetrics summarizes the pendant-triangle graph exactly") {
    // triangle {1,2,3} + pendant 3-4: V=4 E=4, deg = 2,2,3,1;
    // wedges = 1+1+3+0 = 5; triangles = 1; gcc = 3/5
    val m = GraphOps.graphMetrics(df((1, 2), (2, 3), (3, 1), (3, 4)))
      .collect().head
    assert(m.getAs[Long]("n_vertices") == 4L)
    assert(m.getAs[Long]("n_edges") == 4L)
    assert(m.getAs[Long]("max_degree") == 3L)
    assert(m.getAs[Long]("min_degree") == 1L)
    assert(m.getAs[Long]("n_wedges") == 5L)
    assert(m.getAs[Long]("n_triangles") == 1L)
    assert(m.getAs[Long]("avg_degree_milli") == 2000L)
    assert(m.getAs[Long]("gcc_ppm") == 600000L)
  }

  test("summarize condenses by vertex value (reference Javadoc example)") {
    // Summarization.java:53 — vertices A:{0,1}, B:{2,3};
    // edges (0,1)(1,0)(1,2)(2,1)(2,3)(3,2), all value "x"
    val spark2 = spark; import spark2.implicits._
    val v = Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B"))
      .toDF("id", "value")
    val e = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst").withColumn("value",
        org.apache.spark.sql.functions.lit("x"))
    val (sv, se) = GraphOps.summarize(v, e)
    val verts = sv.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(verts == Set((0L, "A", 2L), (2L, "B", 2L)))
    val edges = se.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(edges == Map((0L, 0L) -> 2L, (2L, 2L) -> 2L,
                        (0L, 2L) -> 1L, (2L, 0L) -> 1L))
  }
}
