package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables

/** Frequency-sketch operators: Count-Min heavy hitters over the corpus
  * token stream (Cormode & Muthukrishnan 2005 — the streaming-frequency
  * primitive every large-scale n-gram/vocabulary pipeline runs).
  *
  * The sketch is built RELATIONALLY: `depth` salted md5 hash rows ×
  * `width` buckets, one groupBy — the sketch table is depth×width rows
  * (2 K cells here) NO MATTER THE CORPUS SIZE, with map-side partial
  * aggregation doing the heavy lifting, so at 100 TB the shuffle moves
  * at most `depth·width` rows per task. Point queries are `depth`
  * lookups joined against the broadcast cell table and take the MIN
  * across rows. Salted md5 keeps every cell assignment deterministic
  * and exactly replicable in the DuckDB oracle (the q275 approx-agg
  * family discipline, but here the whole data structure is exact-match
  * verifiable, not just invariant-bound).
  *
  * Reference anchor: the reference's approx-agg story is the same
  * sketch-partial-aggregation pattern (flink-table-runtime-blink
  * aggregate partials); Count-Min is its frequency-domain sibling.
  */
object SketchQueries {

  /** 32-bit integer hash of a string column: first 8 hex chars of md5. */
  private def md5i(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  private def md5iSql(e: String): String =
    s"('0x'||substr(md5($e),1,8))::BIGINT"

  private val depth = 4   // independent hash rows (error prob 2^-4)
  private val width = 512 // buckets per row (overcount ≤ 2N/512 w.h.p.)

  /** A token's `depth` (row, bucket) sketch cells — shared by the
    * batch build, the streaming build, and the probe side, so the
    * three can never drift. */
  private def cellArr(term: Column): Column =
    array((0 until depth).map { r =>
      struct(lit(r).as("r"),
        pmod(md5i(concat(lit(s"$r|"), term)), lit(width)).as("b"))
    }: _*)

  /** q298's probe + audit tail over a finished (r, b, cnt) cell table:
    * estimate every distinct term (min over its depth cells against
    * the broadcast sketch), rank, audit the top 20 against exact
    * counts with the never-under and 2N/width-bound invariants. */
  private def heavyHitters(cells: DataFrame, tok: DataFrame): DataFrame = {
    val nTotal = tok.agg(count(lit(1)).as("n_total"))
    val vocab = tok.distinct()
    val probes = vocab.select(col("term"), explode(cellArr(col("term"))).as("rb"))
      .select(col("term"), col("rb.r").as("r"), col("rb.b").as("b"))
    val est = probes.join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("term")).agg(min(col("cnt")).as("est"))
    val exact = tok.groupBy(col("term")).agg(count(lit(1)).as("exact"))
    // top-20 via orderBy+limit (TakeOrderedAndProject — partial
    // top-k per partition, no single-partition window)
    est.join(exact, "term")
      .crossJoin(broadcast(nTotal))
      .orderBy(col("est").desc, col("term"))
      .limit(20)
      .select(col("term"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overcount"),
        (col("est") >= col("exact")).as("never_under"),
        (col("est") - col("exact") <=
          ceil(lit(2.0) * col("n_total") / lit(width)).cast("long"))
          .as("bound_ok"))
      .orderBy(col("est").desc, col("term"))
  }

  val queries: Map[String, Q] = Map(
    // Count-Min heavy hitters: build the depth×width sketch over every
    // corpus token, estimate EVERY distinct term from the sketch
    // (vocabulary-bounded probe join — natural-language vocabularies
    // saturate, so the probe side stays small at any corpus size; the
    // sketch itself is 2 K cells and broadcasts), rank by estimate and
    // audit the top 20 against exact counts. Count-Min guarantees
    // est ≥ exact always and est ≤ exact + ⌈2N/width⌉ with prob
    // 1−2^−depth; both are emitted as columns so the oracle pins the
    // estimates AND the bound held on this corpus.
    "q298_cms_heavy_hitters" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      // one pass, depth cells per token; partial agg collapses each
      // map task to ≤ depth×width rows before the shuffle
      val cells = tok
        .select(explode(cellArr(col("term"))).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
      heavyHitters(cells, tok)
    }),

    // STREAMING Count-Min maintenance — q298's sketch as update-mode
    // STREAMING AGGREGATION STATE (the q308 HLL pattern verbatim,
    // closing the batch/stream symmetry for both sketch families):
    // each micro-batch folds its tokens' (r, b) cell increments into
    // the per-cell running count — a plain order-independent SUM over
    // ≤ depth×width keys, so state is 2 K cells at ANY corpus size
    // and batch boundaries cannot change the final sketch. The final
    // cell table (newest emission per cell) then answers the q298
    // heavy-hitter audit bit-for-bit — same oracle.
    "q313_cms_stream" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("graft-cmsstream")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val chunks = (0 until 4).map(i => pmod(col("doc_id"), lit(4)) === i)
      val (inDir, schema) = graft.streaming.Replay
        .fileEpochs(docs, chunks, base.toString)
      val liveCells = graft.streaming.Replay.streamDf(s, inDir, schema)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .select(explode(cellArr(col("term"))).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val cells = StreamParityQueries.latestPerKey(
        StreamParityQueries.runUpdate(liveCells, base.toString, s),
        col("r"), col("b"))
      val tok = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      heavyHitters(cells, tok)
    }),

    // HLL SKETCH-CUBE rollup — the OLAP-at-scale pattern for distinct
    // counts: ONE corpus pass builds a per-(source, lang) cell table
    // of HLL sketches (bounded by the dimension cardinalities), and
    // every coarser grain — per source, per lang, grand total — is a
    // MERGE of cell sketches (hll_union_agg), never a rescan. At
    // 100 TB this is the difference between re-scanning the corpus
    // per grain and rolling up a few-KB sketch table; exactly the
    // datasketches mergeability q275 binds, promoted to the cube
    // shape. HLL merge is a per-bucket max → order-independent, so
    // the estimates are deterministic and the ±5% audit booleans are
    // stable; the exact side rides Spark's cube() grouping sets and
    // is what the oracle recomputes.
    "q307_hll_cube" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val cells = tok.groupBy(col("source"), col("lang"))
        .agg(expr("hll_sketch_agg(w)").as("sk"))
        .localCheckpoint() // the few-KB cell table feeds 4 rollups
      val merged = expr("hll_sketch_estimate(hll_union_agg(sk))")
      val g2 = cells.select(col("source"), col("lang"),
        expr("hll_sketch_estimate(sk)").as("est"))
      val gs = cells.groupBy(col("source"))
        .agg(merged.as("est"))
        .select(col("source"), lit(null).cast("string").as("lang"),
          col("est"))
      val gl = cells.groupBy(col("lang"))
        .agg(merged.as("est"))
        .select(lit(null).cast("string").as("source"), col("lang"),
          col("est"))
      val g0 = cells.agg(merged.as("est"))
        .select(lit(null).cast("string").as("source"),
          lit(null).cast("string").as("lang"), col("est"))
      val ests = g2.unionAll(gs).unionAll(gl).unionAll(g0)
      val exact = tok.cube(col("source"), col("lang"))
        .agg(countDistinct(col("w")).as("exact"))
      exact.join(ests,
          exact("source") <=> ests("source") &&
            exact("lang") <=> ests("lang"))
        .select(exact("source"), exact("lang"), col("exact"),
          (abs(col("est") - col("exact")) <=
            lit(0.05) * col("exact") + lit(8.0)).as("est_ok"))
        .orderBy(exact("source").asc_nulls_first,
          exact("lang").asc_nulls_first)
    }),

    // STREAMING distinct-count maintenance: the per-source HLL sketch
    // as STREAMING AGGREGATION STATE — each micro-batch folds its
    // tokens into the per-key sketch (KB-scale state per key, never a
    // distinct-set), update mode emits the refreshed estimate per
    // batch, and the FINAL estimate must match the whole-corpus
    // audit. HLL state is a per-bucket max, so batch boundaries
    // cannot change the result — the q154/q218 streaming-parity
    // discipline applied to sketch state. This is how a 100 TB
    // ingest pipeline keeps live cardinality dashboards without ever
    // re-scanning: the q307 cube's cells maintained incrementally.
    "q308_hll_stream" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("graft-hllstream")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      val chunks = (0 until 4).map(i => pmod(col("doc_id"), lit(4)) === i)
      val (inDir, schema) = graft.streaming.Replay
        .fileEpochs(docs, chunks, base.toString)
      val agg = graft.streaming.Replay.streamDf(s, inDir, schema)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("source"))
        .agg(expr("hll_sketch_agg(w)").as("sk"))
        .select(col("source"), expr("hll_sketch_estimate(sk)").as("est"))
      val fin = StreamParityQueries.latestPerKey(
        StreamParityQueries.runUpdate(agg, base.toString, s), col("source"))
      val exact = docs
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("source")).agg(countDistinct(col("w")).as("exact"))
      fin.join(exact, "source")
        .select(col("source"), col("exact"),
          (abs(col("est") - col("exact")) <=
            lit(0.05) * col("exact") + lit(8.0)).as("est_ok"))
        .orderBy(col("source"))
    }))

  /** CMS heavy hitters replicated relationally in DuckDB — shared by
    * the batch (q298) and streaming (q313) legs: the streamed sketch
    * must equal the batch sketch (order-independent cell sums). */
  private val cmsSql: String = {
    val salted = (0 until depth).map { r =>
      s"SELECT term, $r AS r, ${md5iSql(s"'$r|' || term")} % $width AS b FROM tok"
    }.mkString("\n        UNION ALL ")
    s"""WITH tok AS (
      |  SELECT t.term FROM (
      |    SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
      |  WHERE len(t.term) > 0),
      |keyed AS (
      |        $salted),
      |cells AS (SELECT r, b, count(*) AS cnt FROM keyed GROUP BY 1, 2),
      |probes AS (SELECT DISTINCT term, r, b FROM keyed),
      |est AS (SELECT p.term, min(c.cnt) AS est
      |        FROM probes p JOIN cells c USING (r, b) GROUP BY 1),
      |exact AS (SELECT term, count(*) AS exact FROM tok GROUP BY 1),
      |n AS (SELECT count(*) AS n_total FROM tok)
      |SELECT term, est, exact, est - exact AS overcount,
      |       est >= exact AS never_under,
      |       est - exact <= CAST(ceil(2.0 * n_total / $width) AS BIGINT)
      |         AS bound_ok
      |FROM est JOIN exact USING (term) CROSS JOIN n
      |ORDER BY est DESC, term LIMIT 20""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q313_cms_stream" -> cmsSql,
    "q298_cms_heavy_hitters" -> cmsSql,
    "q307_hll_cube" ->
      """SELECT source, lang, count(DISTINCT w) AS exact,
        |       true AS est_ok
        |FROM (SELECT source, lang, t.w FROM
        |        (SELECT source, lang,
        |                unnest(string_split(text, ' ')) AS w
        |         FROM documents) t
        |      WHERE len(t.w) > 0)
        |GROUP BY CUBE (source, lang)
        |ORDER BY source, lang""".stripMargin,
    "q308_hll_stream" ->
      """SELECT source, count(DISTINCT t.w) AS exact, true AS est_ok
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |      FROM documents) t
        |WHERE len(t.w) > 0
        |GROUP BY source ORDER BY source""".stripMargin)
}
