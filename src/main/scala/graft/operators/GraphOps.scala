package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Gelly-style graph algorithms (SURVEY §2.8) over (vertices, edges)
  * DataFrames — each superstep a join + aggregation, looped through
  * [[Iterate]] (bulk for fixed-count algorithms, delta for
  * propagation algorithms where only changed vertices matter).
  *
  * Reference: `flink-libraries/flink-gelly/.../Graph.java:87`,
  * library algorithms `graph/library/` (ConnectedComponents, PageRank
  * in `linkanalysis/`), vertex-centric iteration `pregel/`.
  *
  * Scale notes: each superstep shuffles on vertex id; Iterate
  * localCheckpoint()s every superstep result — EAGER materialization
  * that also TRUNCATES the logical lineage. persist() alone is not
  * enough for iterative jobs: the logical plan still grows by one
  * join+agg+project per superstep and Catalyst replans the whole
  * history every iteration (measured: a 15-iteration pageRank spent
  * minutes inside the optimizer on a 4-vertex graph). Static inputs
  * (edges) stay persist()ed; superseded checkpoint RDDs are freed by
  * the ContextCleaner.
  */
object GraphOps {

  /** Connected components by min-label propagation, as a DELTA
    * iteration ([[Iterate.delta]], the reference's iterateDelta form —
    * `Graph.java run(ConnectedComponents)` uses exactly this): the
    * workset holds only vertices whose label just changed, so a
    * mostly-converged graph shuffles a few hot frontiers per
    * superstep instead of every vertex.
    * vertices: (id: Long); edges: (src: Long, dst: Long), undirected.
    * Returns (id, component) where component = min vertex id reachable. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // min-label propagation as a vertex program on the generic Pregel
    // surface (VertexCentricIteration.java): active vertices scatter
    // their label, gather = min, a vertex adopts a smaller label and
    // re-activates — the classic HCC compute function.
    val init = vertices.select(col("id"), col("id").as("component"))
    val labels = Pregel.delta(init, bidir, "component", maxIter)(
      sendMsg = col("src_component"),
      mergeMsg = ms => min(ms),
      vprog = (cur, m) => when(m < cur, m).otherwise(cur))
    bidir.unpersist()
    labels
  }

  /** Connected components with POINTER JUMPING — the high-diameter
    * form (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014, are the canonical treatment): plain min-label
    * propagation ([[connectedComponents]]) needs one superstep per
    * unit of graph DIAMETER, which a near-dup chain breaks (a
    * 3000-doc dup chain at the soak replica has diameter ≫ 30). Each
    * round here takes
    *   label′(v) = min(label(v), min over N(v) of label(u),
    *               label(label(v)))
    * — the `label(label(v))` term is the pointer-doubling step, so
    * label depth roughly halves per round and convergence is
    * O(log diameter): 30 rounds cover diameters past 10⁹. Early-stops
    * when no label changed (one metadata-sized count per round).
    * Same contract as [[connectedComponents]]: (id, component) with
    * component = min reachable id. */
  def connectedComponentsJump(vertices: DataFrame, edges: DataFrame,
                              maxIter: Int = 30): DataFrame = {
    // localCheckpoint CUTS LINEAGE but (Spark 4) REWRITES the origin
    // plan's estimated stats into the LogicalRDD — and size-only
    // stats MULTIPLY across joins, so round k's label table carries
    // sizeInBytes ≈ (round k−1)³: the BigInt doubles its BIT LENGTH
    // every round and by round ~25 the planner sits in
    // million-digit Toom-Cook multiplications for minutes (observed
    // live at the ≈sf1 replica — the driver "hang" was
    // SizeInBytesOnlyStatsPlanVisitor, not the job). statsCut
    // rebuilds the frame from the checkpointed RDD, which drops the
    // origin stats and resets every round to the default estimate.
    def statsCut(df: DataFrame): DataFrame = {
      val cp = df.localCheckpoint()
      cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
    }
    val bidir = statsCut(edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"))))
    var labels = statsCut(vertices.select(col("id"), col("id").as("component")))
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val nbrMin = bidir
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min(col("component")).as("nmin"))
      val jump = labels.select(col("id").as("jid"), col("component").as("jc"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .join(jump, labels("component") === col("jid"), "left")
        .select(col("id"),
          least(col("component"),
            coalesce(col("nmin"), col("component")),
            coalesce(col("jc"), col("component"))).as("component"),
          (least(col("component"),
            coalesce(col("nmin"), col("component")),
            coalesce(col("jc"), col("component"))) < col("component"))
            .as("moved"))
      val cut = statsCut(next) // eager lineage + stats cut per round
      changed = cut.filter(col("moved")).count()
      labels = cut.drop("moved")
      iter += 1
    }
    // a silent non-convergence would return PLAUSIBLE-looking but
    // fragmented components (exactly the under-iteration failure this
    // variant exists to fix) — fail loudly instead
    require(changed == 0,
      s"connectedComponentsJump: not converged after $maxIter rounds " +
        s"($changed labels still moving) — raise maxIter")
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
    val init = vertices.select(col("id"), lit(1.0 / n).as("rank"))
    val ranks = Iterate.bulk(init, iters) { (r, _) =>
      val contribs = withDeg
        .join(r.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      // dangling vertices contribute their rank uniformly
      val danglingMass = r
        .join(outDeg, Seq("id"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      vertices.select(col("id"))
        .join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              lit(danglingMass / n))).as("rank"))
    }()
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
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize so canon's cache is actually used, then freed
    canon.unpersist()
    out
  }

  /** Single-source shortest paths (Gelly
    * `library/SingleSourceShortestPaths.java`): Bellman-Ford edge
    * relaxation as a DELTA iteration — only vertices whose distance
    * just improved relax their out-edges in the next superstep.
    * edges: (src, dst, weight: Double), directed. Returns (id, dist)
    * for reachable vertices. */
  def shortestPaths(vertices: DataFrame, edges: DataFrame, source: Long,
                    maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("weight"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Bellman-Ford relaxation as a vertex program on the generic
    // Pregel surface (the reference ships exactly this as the Pregel
    // example, pregel/SSSP-style ComputeFunction): active vertices
    // scatter dist+weight along out-edges, gather = min, a vertex
    // adopts a shorter distance and re-activates.
    val init = vertices.select(col("id"),
      when(col("id") === source, 0.0).as("dist")) // null = unreachable
    val dist = Pregel.delta(init, e, "dist", maxIter,
        initialActive = col("dist").isNotNull)(
      sendMsg = col("src_dist") + col("weight"),
      mergeMsg = ms => min(ms),
      vprog = (cur, m) => when(cur.isNull || m < cur, m).otherwise(cur))
    e.unpersist()
    dist.filter(col("dist").isNotNull)
  }

  /** Label propagation (Gelly `library/LabelPropagation.java`):
    * each superstep every vertex adopts its neighbors' most frequent
    * label (ties → smallest label). Fixed iteration count — the
    * algorithm may oscillate, as in the reference. Undirected. */
  def labelPropagation(vertices: DataFrame, edges: DataFrame,
                       iters: Int = 5): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val init = vertices.select(col("id"), col("id").as("label"))
    val labels = Iterate.bulk(init, iters) { (ls, _) =>
      val freq = bidir
        .join(ls.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("f"))
      // most frequent neighbor label, ties to the smallest label
      val top = freq.groupBy(col("id"))
        .agg(max_by(col("label"), struct(col("f"), -col("label"))).as("nbr_label"))
      ls.join(top, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("nbr_label"), col("label")).as("label"))
    }()
    bidir.unpersist()
    labels
  }

  /** Index-band width for [[intraListPairs]]. 1024² = ~1M candidate
    * pairs per (src, block-pair) join key — a few ms of streamed
    * hash-agg work per task, small enough that AQE never sees a
    * monster partition. */
  private[operators] val PairBlock = 1024

  /** Distributed generation of intra-posting-list pairs: for each
    * input row (src, ns = [x₀ < x₁ < …]) emit one row per unordered
    * pair (u = ns[i], v = ns[j], i < j) — WITHOUT ever materializing
    * the O(deg²) pair set inside a single array value or a single
    * task. The sorted list is exploded to (src, i, x) rows, indices
    * are banded into blocks of [[PairBlock]], and pairs come from an
    * equi-join on (src, targetBlock) where each left row is
    * replicated to every block at-or-after its own. A 100k-neighbor
    * hub thus becomes ~98 independent join keys of ≤ deg·PairBlock
    * matches each, spread across shuffle partitions, instead of one
    * 5·10⁹-struct array in one executor row (the round-6 OOM class).
    * Gelly streams the same pairs through a group-limited reduce —
    * `flink-gelly/.../library/similarity/JaccardIndex.java` (whose
    * `setGroupSize` exists for exactly this hub problem).
    * `carry` columns (constant per src) ride along on the left side.
    * Output: (u, v, carry…). */
  private[operators] def intraListPairs(nbrs: DataFrame,
                                        carry: Seq[String] = Nil): DataFrame = {
    val carryCols = carry.map(col)
    val exploded = nbrs
      .withColumn("nblk", ((size(col("ns")) - lit(1)) / PairBlock).cast("int"))
      .select(Seq(col("src"), col("nblk")) ++ carryCols :+
        posexplode(col("ns")).as(Seq("i", "x")): _*)
      .withColumn("blk", (col("i") / PairBlock).cast("int"))
    val left = exploded
      .withColumn("jblk", explode(sequence(col("blk"), col("nblk"))))
      .select(Seq(col("src"), col("jblk"), col("i"),
        col("x").as("u")) ++ carryCols: _*)
    val right = exploded
      .select(col("src"), col("blk").as("jblk"), col("i").as("j"),
        col("x").as("v"))
    left.join(right, Seq("src", "jblk"))
      .filter(col("i") < col("j"))
      .select(Seq(col("u"), col("v")) ++ carryCols: _*)
  }

  /** Jaccard neighborhood similarity (Gelly
    * `library/similarity/JaccardIndex.java`): for vertex pairs sharing
    * at least one neighbor, |N(u)∩N(v)| / |N(u)∪N(v)|. Pairs are
    * generated from each vertex's sorted neighbor list via
    * [[intraListPairs]] — the deg² blow-up is distributed across
    * banded join keys, never materialized per-row. */
  def jaccardSimilarity(edges: DataFrame): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    val nbrs = bidir.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("ns"))
    val deg = nbrs.select(col("src").as("id"), size(col("ns")).as("deg"))
    val co = intraListPairs(nbrs)
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("co"))
    co.join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
      .select(col("u"), col("v"),
        (col("co") / (col("du") + col("dv") - col("co"))).as("jaccard"))
  }

  /** Community detection by score-attenuated label propagation (Gelly
    * `library/CommunityDetection.java:49`, after "Towards real-time
    * community detection in large networks"): each superstep a vertex
    * sends (label, score·edgeWeight) to its neighbors, adopts the
    * label with the highest SUMMED received score (ties → smallest
    * label, matching the reference's ordered-map iteration), and
    * re-scores it to the highest single received score for that
    * label, minus delta/superstep when the label changed.
    * vertices: (id); edges: (src, dst, weight: Double), undirected.
    * Returns (id, label). */
  def communityDetection(vertices: DataFrame, edges: DataFrame,
                         maxIter: Int = 10, delta: Double = 0.5): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"), col("weight"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"),
        col("weight")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val init = vertices.select(col("id"), col("id").as("label"),
      lit(1.0).as("score"))
    val state = Iterate.bulk(init, maxIter) { (st, i) =>
      val step = i + 1 // reference supersteps are 1-based
      val msgs = bidir
        .join(st.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"),
          (col("score") * col("weight")).as("s"))
      val perLabel = msgs.groupBy(col("id"), col("label"))
        .agg(sum(col("s")).as("tot"), max(col("s")).as("mx"))
      val best = perLabel.groupBy(col("id"))
        .agg(max_by(struct(col("label"), col("mx")),
          struct(col("tot"), (-col("label")).as("nl"))).as("b"))
      st.join(best, Seq("id"), "left_outer")
        .select(col("id"),
          coalesce(col("b.label"), col("label")).as("newLabel"),
          when(col("b.label").isNull, col("score"))
            .otherwise(col("b.mx") -
              when(col("b.label") =!= col("label"), delta / step)
                .otherwise(0.0)).as("score"))
        .withColumnRenamed("newLabel", "label")
    }()
    bidir.unpersist()
    state.select(col("id"), col("label"))
  }

  /** HITS hubs-and-authorities (Gelly
    * `library/linkanalysis/HITS.java`): iterative — authority(v) =
    * Σ hub(u) over in-neighbors, hub(u) = Σ authority(v) over
    * out-neighbors, each L2-normalized per iteration (as the
    * reference). edges: (src, dst) directed. Returns
    * (id, hub, authority).
    *
    * Scale: each half-step is one shuffle on vertex id; the L2 norm is
    * a scalar aggregate to the driver (bounded, same class as
    * pageRank's dangling mass). */
  def hits(edges: DataFrame, iters: Int = 10): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val init = verts
      .select(col("id"), lit(1.0).as("hub"), lit(1.0).as("auth"))
    val scores = Iterate.bulk(init, iters) { (sc, _) =>
      // Norms guarded twice: sum() over zero rows is null (NPE on
      // getDouble with an empty edge set), and a zero norm would turn
      // every score into NaN and poison all later iterations — divide
      // only when the norm is positive.
      val authRaw = e
        .join(sc.select(col("id").as("src"), col("hub")), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("a"))
      val authN = math.sqrt(
        authRaw.agg(coalesce(sum(col("a") * col("a")), lit(0.0)))
          .head().getDouble(0))
      val auth = verts.join(authRaw, Seq("id"), "left_outer")
        .select(col("id"),
          (if (authN > 0) coalesce(col("a"), lit(0.0)) / lit(authN)
           else lit(0.0)).as("auth"))
      val hubRaw = e
        .join(auth.select(col("id").as("dst"), col("auth")), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("auth")).as("h"))
      val hubN = math.sqrt(
        hubRaw.agg(coalesce(sum(col("h") * col("h")), lit(0.0)))
          .head().getDouble(0))
      verts.join(hubRaw, Seq("id"), "left_outer")
        .join(auth, "id")
        .select(col("id"),
          (if (hubN > 0) coalesce(col("h"), lit(0.0)) / lit(hubN)
           else lit(0.0)).as("hub"), col("auth"))
    }()
    e.unpersist()
    scores
  }

  /** Local clustering coefficient (Gelly
    * `library/metric/undirected/` + clustering/undirected
    * LocalClusteringCoefficient): triangles(v) / (deg(v)·(deg(v)-1)/2)
    * over the undirected simple graph. Returns (id, degree,
    * n_triangles, coefficient). */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val tris = triangleCounts(edges)
    deg.join(tris, Seq("id"), "left_outer")
      .select(col("id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") < 2, 0.0)
          .otherwise(coalesce(col("n_triangles"), lit(0L)) * 2.0 /
            (col("degree") * (col("degree") - 1))).as("coefficient"))
  }

  /** Graph summarization (Gelly `library/Summarization.java:92`):
    * condense the graph by vertex value — one output vertex per
    * distinct vertex value (with member count), one output edge per
    * (source group, target group, edge value) (with count). The
    * reference picks a nondeterministic member id as the group
    * representative; here it is the MIN member id, making the output
    * deterministic (still "one of the represented vertex identifiers"
    * as the reference guarantees).
    *
    * vertices: (id, value); edges: (src, dst, value).
    * Returns (vertices (id, value, cnt), edges (src, dst, value, cnt)).
    *
    * Scale: the (value → rep, cnt) group table is |distinct values| —
    * broadcast-sized in practice, so tagging members with their rep is
    * a broadcast join; the member→rep map itself is |vertices|-sized.
    * By default the two edge-endpoint joins shuffle on vertex id (the
    * only correct general plan — vertices can be fact-sized). When
    * the CALLER knows the vertex set is dimension-sized (as in q83,
    * where vertices are customers+suppliers and only edges scale with
    * fact volume), `broadcastVertexMap = true` broadcasts the id→rep
    * map instead, removing BOTH fact-sized edge shuffles — the edge
    * rollup's (srep, drep, value) shuffle then moves pre-condensed
    * groups only. */
  def summarize(vertices: DataFrame, edges: DataFrame,
                broadcastVertexMap: Boolean = false)
      : (DataFrame, DataFrame) = {
    val groups = vertices.groupBy(col("value"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("cnt"))
    val sumVerts = groups.select(col("rep").as("id"), col("value"), col("cnt"))
    val v2rMap = vertices.join(broadcast(groups.select(col("value"), col("rep"))),
      "value").select(col("id"), col("rep"))
    val v2r = if (broadcastVertexMap) broadcast(v2rMap) else v2rMap
    val sumEdges = edges.select(col("src"), col("dst"),
        col("value").as("evalue"))
      .join(v2r.withColumnRenamed("id", "src")
        .withColumnRenamed("rep", "srep"), "src")
      .join(v2r.withColumnRenamed("id", "dst")
        .withColumnRenamed("rep", "drep"), "dst")
      .groupBy(col("srep").as("src"), col("drep").as("dst"),
        col("evalue").as("value"))
      .agg(count(lit(1)).as("cnt"))
    (sumVerts, sumEdges)
  }

  /** [[clusteringCoefficient]] in the ORACLE-exact integer form: the
    * closed-wedge fraction as ppm (2e6·tri // deg·(deg−1)) — the
    * double `coefficient` column is repr-fragile across engines, the
    * integer quotient is not. */
  def localClusteringCoefficient(edges: DataFrame): DataFrame =
    clusteringCoefficient(edges)
      .select(col("id"), col("degree").as("deg"),
        col("n_triangles").as("tri"))
      .withColumn("lcc_ppm", when(col("deg") >= 2,
        expr("(2000000 * tri) div (deg * (deg - 1))")).otherwise(lit(0L)))

  /** Whole-graph metrics (Gelly `library/metric/undirected/
    * VertexMetrics.java` + `EdgeMetrics.java` + the global clustering
    * coefficient): ONE summary row — vertex/edge/triangle counts,
    * degree extremes, average degree (milli), and the global
    * clustering coefficient 3·tri/wedges (ppm) — every figure an
    * exact integer. Cost: the triangle pass + one degree rollup; the
    * output is a single metadata-sized row at any graph size. */
  def graphMetrics(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
              greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val tri = triangleCounts(edges)
      .agg((sum(col("n_triangles")) / 3).cast("long").as("n_triangles"))
    deg.agg(count(lit(1)).as("n_vertices"),
        (sum(col("deg")) / 2).cast("long").as("n_edges"),
        max(col("deg")).as("max_degree"), min(col("deg")).as("min_degree"),
        sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_wedges"))
      .crossJoin(broadcast(tri))
      .withColumn("avg_degree_milli", expr("(2000 * n_edges) div n_vertices"))
      .withColumn("gcc_ppm",
        expr("(3000000 * n_triangles) div greatest(n_wedges, 1)"))
  }

  /** Adamic-Adar similarity, log2-quantized (Gelly `library/similarity/
    * AdamicAdar.java`): pairs sharing a neighbor z score
    * Σ 1/log(deg(z)) — here the per-neighbor weight is the INTEGER
    * 1e6 // floor(log2(deg(z))) so both engines agree exactly (same
    * blog2 discipline as the curation scores; a common neighbor
    * always has deg ≥ 2, so the quantized log is ≥ 1). Same
    * [[intraListPairs]] banded pair generation as Jaccard —
    * candidates only where a common neighbor exists, never
    * all-pairs, and never a per-row deg² array. */
  def adamicAdar(edges: DataFrame): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
    val nbrs = bidir.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("ns"))
      .filter(size(col("ns")) >= 2)
      .withColumn("w", expr("1000000 div (length(bin(size(ns))) - 1)"))
    intraListPairs(nbrs, carry = Seq("w"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("co"), sum(col("w")).as("aa_e6"))
  }
}
