package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Gelly-style graph algorithms (SURVEY §2.8) over (vertices, edges)
  * DataFrames — the GraphFrames pattern: iterative driver loop, each
  * superstep a join + aggregation.
  *
  * Reference: `flink-libraries/flink-gelly/.../Graph.java:87`,
  * library algorithms `graph/library/` (ConnectedComponents, PageRank
  * in `linkanalysis/`), vertex-centric iteration `pregel/`.
  *
  * Scale notes: each superstep shuffles on vertex id; intermediate
  * results are persisted and the previous iteration unpersisted so the
  * lineage (and executor memory) stays bounded — the standard Spark
  * iterative-job pattern (Flink's native BSP iterations are a
  * documented non-goal, SURVEY §7.4). Convergence is checked with a
  * count aggregate per superstep.
  */
object GraphOps {

  /** Connected components by iterative min-label propagation.
    * vertices: (id: Long); edges: (src: Long, dst: Long), undirected.
    * Returns (id, component) where component = min vertex id reachable. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(col("id"), col("id").as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // candidate label per vertex: min over own and neighbors' labels
      val viaNeighbors = bidir
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("component")).as("nbr_min"))
      val next = labels.join(viaNeighbors, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") < col("old")).count()
      labels.unpersist()
      labels = next
      i += 1
    }
    bidir.unpersist()
    labels
  }

  /** PageRank with damping, fixed iteration count.
    * edges: (src, dst) directed. Dangling mass is redistributed
    * uniformly. Returns (id, rank). */
  def pageRank(vertices: DataFrame, edges: DataFrame,
               iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val spark = vertices.sparkSession
    val n = vertices.count().toDouble
    val outDeg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(outDeg.withColumnRenamed("id", "src"), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = vertices.select(col("id"), lit(1.0 / n).as("rank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      // dangling vertices contribute their rank uniformly
      val danglingMass = ranks
        .join(outDeg, Seq("id"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val next = vertices.select(col("id"))
        .join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              lit(danglingMass / n))).as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      ranks.unpersist()
      ranks = next
    }
    withDeg.unpersist()
    ranks
  }

  /** Triangle count per vertex (undirected): intersect neighbor sets
    * along canonical edges — one self-join, no iteration. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges a<b<c from edges (a,b) and (a,c); triangle iff (b,c) exists
    val wedges = canon.as("e1")
      .join(canon.as("e2"), col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    val tris = wedges.join(canon,
      wedges("b") === canon("a") && wedges("c") === canon("b"))
      .select(wedges("a").as("a"), wedges("b").as("b"), wedges("c").as("c"))
    val out = tris.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    canon.unpersist()
    out
  }
}
