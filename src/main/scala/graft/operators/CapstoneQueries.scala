package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables

/** END-TO-END CURATION PIPELINE CAPSTONE (r11 ask 8): the corpus
  * operators this library grew one oracle row at a time — quality
  * gates (q61-family), near-dup cluster election (q66+q334),
  * benchmark decontamination (q283's exact 13-gram audit), token
  * budgeting (q220) and GPT-style sequence packing (q295) — chained
  * as ONE pipeline, with every stage committed as a MANIFEST TABLE
  * snapshot and the next stage consuming it through a changelog read
  * ([[graft.sources.ManifestTable.readChanges]]). This is the
  * composition proof: the operator set AND the table format carrying
  * a production curation run end to end, with per-stage row/token
  * accounting and the final packed output pinned by one oracle that
  * replays the whole pipeline in SQL.
  *
  * Scale design (100 TB): every stage is the already-audited shape of
  * its standalone row — gates are a pure projection; dedup pairs come
  * from df-capped shingle postings (never doc×doc) and the CC
  * iteration is dup-graph-sized; decontamination joins distinct gram
  * hashes (benchmark-bounded); the budget select is a ≤1001-row
  * histogram + per-tier windows; packing is one exact two-pass prefix
  * sum. Between stages nothing is re-derived: each stage reads the
  * previous SNAPSHOT's added files (an incremental poll, not a table
  * scan), and every intermediate is time-travel-auditable until
  * vacuumed — the lineage story a training-data pipeline owes its
  * auditors.
  *
  * Reference anchor: the reference composes such pipelines as chained
  * DataSet transforms (flink-java/.../DataSet.java operator chains);
  * this adds the durable snapshot-per-stage contract its
  * FileSystem-sink pipelines approximate with directories.
  */
object CapstoneQueries {

  private def toks(c: org.apache.spark.sql.Column) = split(c, " ")
  private def md5i(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 13-gram hashes of (doc_id, text) — the q283 decontamination unit
    * (every doc has ≥1 gram: short docs hash their whole text window). */
  private def gramHashes(df: DataFrame): DataFrame = {
    val w = toks(col("text"))
    df.select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(w) - 12, lit(1))),
        i => concat_ws(" ", slice(w, i, lit(13))))).as("g"))
      .select(col("doc_id"), md5i(col("g")).as("h"))
  }

  val queries: Map[String, Q] = Map(
    "q340_curation_pipeline" -> ((s, d) => {
      import graft.sources.ManifestTable
      val tmp = java.nio.file.Files.createTempDirectory("graft-capstone")
      def tableOf(n: String) = s"$tmp/$n"
      // each stage's survivors become a manifest snapshot (doc_id-
      // clustered, stats-carrying) …
      def commitStage(df: DataFrame, n: String): Unit = {
        ManifestTable.create(
          df.repartitionByRange(4, col("doc_id"))
            .sortWithinPartitions(col("doc_id")),
          tableOf(n), statCol = Some("doc_id"))
        ()
      }
      // … and the next stage consumes it INCREMENTALLY: the changelog
      // window over the create commit reads exactly its added files
      def consume(n: String): DataFrame =
        ManifestTable.readChanges(s, tableOf(n), -1L, 0L)

      val d0 = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          size(toks(col("text"))).cast("long").as("n_tok"))
        .localCheckpoint() // feeds the gates AND the s0 accounting (r12)

      // STAGE 1 — quality gates (q61 integer-ppm discipline): length,
      // type-token ratio, vowel-ratio band. Pure projection.
      val s1 = d0
        .withColumn("ttr", expr(
          "(1000 * cast(size(array_distinct(split(text, ' '))) as bigint))" +
            " div n_tok"))
        .withColumn("vowel_ppm", expr(
          "length(regexp_replace(text, '[^aeiou]', '')) * 1000000" +
            " div length(text)"))
        .filter(col("n_tok") >= 20 && col("ttr") <= 900 &&
          col("vowel_ppm").between(260000, 320000))
        .select(col("doc_id"), col("text"), col("n_tok"))
        // commitStage's range write samples its input first — without
        // the checkpoint the regex/TTR gate pipeline runs twice (r12)
        .localCheckpoint()
      commitStage(s1, "s1")
      val s1r = consume("s1")

      // STAGE 2 — near-dup cluster election (q66 pairs → q334 CC):
      // df-capped shingle postings emit candidate pairs from one
      // shuffle; ≥0.1-Jaccard edges close into components via
      // pointer-jumping; every non-canonical member is removed. The
      // CC state is dup-graph-sized — the corpus never enters it.
      val postings = s1r
        .select(col("doc_id"), explode(TextQueries.shingles4(col("text")))
          .as("sh"))
        .distinct()
        .groupBy(col("sh"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) <= TextQueries.dfCap)
      val pairsArr = flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))
      val singles = transform(col("ds"),
        x => struct(x.as("a"), lit(-1L).as("b")))
      val counts = postings
        .select(explode(concat(singles, pairsArr)).as("p"))
        .groupBy(col("p.a").as("id_a"), col("p.b").as("id_b"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // the shingle pipeline runs ONCE
      val sizes = counts.filter(col("id_b") === -1L)
        .select(col("id_a").as("doc_id"), col("cnt").as("n_sh"))
      val edges = counts.filter(col("id_b") =!= -1L)
        .join(sizes.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("n_sh", "nb"), "id_b")
        .filter(col("cnt") * lit(1000000L) >=
          (col("na") + col("nb") - col("cnt")) * lit(100000L))
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .localCheckpoint()
      val verts = edges.select(col("src").as("id"))
        .unionAll(edges.select(col("dst").as("id"))).distinct()
      val removed = GraphOps.connectedComponentsJump(verts, edges, 32)
        .filter(col("id") =!= col("component"))
        .select(col("id").as("doc_id"))
      val s2 = s1r.join(removed, Seq("doc_id"), "left_anti")
      commitStage(s2, "s2")
      val s2r = consume("s2")

      // STAGE 3 — benchmark decontamination (q283 exact 13-grams):
      // the held-out benchmark = a 3% content-hash slice of the
      // ORIGINAL corpus; any survivor sharing a distinct gram hash
      // with it is removed (benchmark members remove themselves).
      val bench = Tables.documents(s, d)
        .filter(pmod(md5i(col("text")), lit(100)) >= 97)
        .select(col("doc_id"), col("text"))
      val bg = gramHashes(bench).select(col("h")).distinct()
      val dirty = gramHashes(s2r).join(bg, "h")
        .select(col("doc_id")).distinct()
      val s3 = s2r.join(dirty, Seq("doc_id"), "left_anti")
      commitStage(s3, "s3")
      val s3r = consume("s3")

      // STAGE 4 — token-budget selection (q220's bounded-histogram
      // running sum, budget = 50% of surviving tokens): ttr tiers
      // strictly above the cutoff keep everything, the boundary tier
      // runs a per-tier doc_id-ordered window.
      import org.apache.spark.sql.expressions.Window
      val sc4 = s3r.select(col("doc_id"), col("text"), col("n_tok"),
        expr("(1000 * cast(size(array_distinct(split(text, ' '))) as " +
          "bigint)) div n_tok").as("ttr"))
      val hist = sc4.groupBy(col("ttr")).agg(sum(col("n_tok")).as("t"))
      val cum = hist.withColumn("cum_before",
        coalesce(sum(col("t")).over(Window.orderBy(col("ttr").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val budget = sc4.agg((sum(col("n_tok")) / 2).cast("long").as("budget"))
      val tierWin = Window.partitionBy(col("ttr")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val s4 = sc4
        .join(broadcast(cum.select(col("ttr"), col("cum_before"))), "ttr")
        .crossJoin(broadcast(budget))
        .withColumn("tier_cum", sum(col("n_tok")).over(tierWin))
        .filter(col("cum_before") + col("tier_cum") <= col("budget"))
        .select(col("doc_id"), col("text"), col("n_tok"))
      commitStage(s4, "s4")
      val s4r = consume("s4")

      // STAGE 5 — GPT-style sequence packing (q295): one exact
      // two-pass prefix sum assigns every doc its 2048-token sequence.
      val B = 2048L
      val packed = DatasetUtils.prefixSum(
          s4r.select(col("doc_id"), col("n_tok"))
            .repartitionByRange(8, col("doc_id"))
            .sortWithinPartitions(col("doc_id")), "n_tok")
        .withColumn("seq_id", floor(col("prefix") / B).cast("long"))

      // per-stage accounting + the packed output, one pinned frame:
      // n_rows/tok_sum/id_sum per stage (id_sum pins MEMBERSHIP, not
      // just counts), and s5's id_sum = Σ per-doc seq_id pins every
      // doc's sequence assignment.
      def acct(df: DataFrame, stage: String): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), sum(col("n_tok")).as("tok_sum"),
            sum(col("doc_id")).as("id_sum"))
          .select(lit(stage).as("stage"), col("n_rows"), col("tok_sum"),
            col("id_sum"))
      acct(d0, "s0_ingest")
        .unionAll(acct(s1r, "s1_gates"))
        .unionAll(acct(s2r, "s2_dedup"))
        .unionAll(acct(s3r, "s3_decon"))
        .unionAll(acct(s4r, "s4_budget"))
        .unionAll(packed
          .agg(countDistinct(col("seq_id")).as("n_rows"),
            sum(col("n_tok")).as("tok_sum"),
            sum(col("seq_id")).as("id_sum"))
          .select(lit("s5_packed").as("stage"), col("n_rows"),
            col("tok_sum"), col("id_sum")))
        .orderBy(col("stage"))
    }))

  val oracle: Map[String, String] = Map(
    // the whole pipeline replayed in SQL: gates → shingle-postings
    // pairs → recursive transitive closure → 13-gram decontamination
    // → histogram budget select → prefix-sum packing
    "q340_curation_pipeline" ->
      """WITH RECURSIVE
        |d0 AS (
        |  SELECT doc_id, text, len(string_split(text,' '))::BIGINT AS n_tok
        |  FROM documents),
        |s1 AS (
        |  SELECT doc_id, text, n_tok FROM (
        |    SELECT d0.*,
        |      (1000 * len(list_distinct(string_split(text,' ')))::BIGINT)
        |        // n_tok AS ttr,
        |      length(regexp_replace(text,'[^aeiou]','','g')) * 1000000
        |        // length(text) AS vowel_ppm
        |    FROM d0)
        |  WHERE n_tok >= 20 AND ttr <= 900
        |    AND vowel_ppm BETWEEN 260000 AND 320000),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(
        |      list_transform(range(1, greatest(len(string_split(text,' ')) - 2, 2)),
        |      i -> array_to_string(string_split(text,' ')[i:i+3], ' '))) AS sh
        |    FROM s1)),
        |sh AS (
        |  SELECT doc_id, sh FROM sh0
        |  QUALIFY count(*) OVER (PARTITION BY sh) <= 50),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |co AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS co
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT id_a AS a, id_b AS b FROM co
        |  JOIN sizes na ON na.doc_id = id_a
        |  JOIN sizes nb ON nb.doc_id = id_b
        |  WHERE co * 1000000 // (na.n_sh + nb.n_sh - co) >= 100000),
        |und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |reach(a, b) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |lab AS (
        |  SELECT a AS id, least(a, min(b)) AS comp FROM reach GROUP BY a),
        |s2 AS (
        |  SELECT * FROM s1
        |  WHERE doc_id NOT IN (SELECT id FROM lab WHERE id <> comp)),
        |bench AS (
        |  SELECT doc_id, string_split(text,' ') AS ws FROM documents
        |  WHERE ('0x'||substr(md5(text),1,8))::BIGINT % 100 >= 97),
        |bgrams AS (
        |  SELECT DISTINCT unnest(
        |    list_transform(range(1, greatest(len(ws) - 11, 2)),
        |      i -> ('0x'||substr(md5(array_to_string(ws[i:i+12], ' ')),1,8))::BIGINT))
        |    AS h
        |  FROM bench),
        |s2g AS (
        |  SELECT doc_id, unnest(
        |    list_transform(range(1, greatest(len(string_split(text,' ')) - 11, 2)),
        |      i -> ('0x'||substr(md5(
        |        array_to_string(string_split(text,' ')[i:i+12], ' ')),1,8))::BIGINT))
        |    AS h
        |  FROM s2),
        |s3 AS (
        |  SELECT * FROM s2 WHERE doc_id NOT IN (
        |    SELECT DISTINCT s2g.doc_id FROM s2g JOIN bgrams USING (h))),
        |sc AS (
        |  SELECT doc_id, n_tok,
        |    (1000 * len(list_distinct(string_split(text,' ')))::BIGINT)
        |      // n_tok AS ttr
        |  FROM s3),
        |hist AS (SELECT ttr, sum(n_tok)::BIGINT AS t FROM sc GROUP BY 1),
        |cum AS (SELECT ttr, coalesce(sum(t) OVER (ORDER BY ttr DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |          AS cum_before FROM hist),
        |b AS (SELECT sum(n_tok)::BIGINT // 2 AS budget FROM sc),
        |t AS (SELECT sc.doc_id, sc.ttr, sc.n_tok, cum.cum_before,
        |        sum(sc.n_tok) OVER (PARTITION BY sc.ttr ORDER BY sc.doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |          AS tier_cum
        |      FROM sc JOIN cum USING (ttr)),
        |s4 AS (
        |  SELECT doc_id, n_tok FROM t, b
        |  WHERE cum_before + tier_cum <= b.budget),
        |p AS (SELECT doc_id, n_tok,
        |        coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |      FROM s4),
        |packed AS (
        |  SELECT (prefix // 2048)::BIGINT AS seq_id, doc_id, n_tok FROM p)
        |SELECT 's0_ingest' AS stage, count(*)::BIGINT AS n_rows,
        |  sum(n_tok)::BIGINT AS tok_sum, sum(doc_id)::BIGINT AS id_sum FROM d0
        |UNION ALL
        |SELECT 's1_gates', count(*)::BIGINT, sum(n_tok)::BIGINT,
        |  sum(doc_id)::BIGINT FROM s1
        |UNION ALL
        |SELECT 's2_dedup', count(*)::BIGINT, sum(n_tok)::BIGINT,
        |  sum(doc_id)::BIGINT FROM s2
        |UNION ALL
        |SELECT 's3_decon', count(*)::BIGINT, sum(n_tok)::BIGINT,
        |  sum(doc_id)::BIGINT FROM s3
        |UNION ALL
        |SELECT 's4_budget', count(*)::BIGINT, sum(n_tok)::BIGINT,
        |  sum(doc_id)::BIGINT FROM s4
        |UNION ALL
        |SELECT 's5_packed', count(DISTINCT seq_id)::BIGINT,
        |  sum(n_tok)::BIGINT, sum(seq_id)::BIGINT FROM packed
        |ORDER BY stage""".stripMargin)
}
