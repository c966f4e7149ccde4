package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
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
        .select(explode(array((0 until depth).map { r =>
          struct(lit(r).as("r"),
            pmod(md5i(concat(lit(s"$r|"), col("term"))), lit(width)).as("b"))
        }: _*)).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
      val nTotal = tok.agg(count(lit(1)).as("n_total"))
      val vocab = tok.distinct()
      // depth probes per term against the broadcast cell table
      val probes = vocab.select(col("term"),
        explode(array((0 until depth).map { r =>
          struct(lit(r).as("r"),
            pmod(md5i(concat(lit(s"$r|"), col("term"))), lit(width)).as("b"))
        }: _*)).as("rb"))
        .select(col("term"), col("rb.r").as("r"), col("rb.b").as("b"))
      val est = probes.join(broadcast(cells), Seq("r", "b"))
        .groupBy(col("term")).agg(min(col("cnt")).as("est"))
      val exact = tok.groupBy(col("term")).agg(count(lit(1)).as("exact"))
      val w = Window.orderBy(col("est").desc, col("term"))
      est.join(exact, "term")
        .crossJoin(broadcast(nTotal))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select(col("rk"), col("term"), col("est"), col("exact"),
          (col("est") - col("exact")).as("overcount"),
          (col("est") >= col("exact")).as("never_under"),
          (col("est") - col("exact") <=
            ceil(lit(2.0) * col("n_total") / lit(width)).cast("long"))
            .as("bound_ok"))
        .orderBy(col("rk"))
    }))

  val oracle: Map[String, String] = Map(
    "q298_cms_heavy_hitters" -> {
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
        |SELECT rk, term, est, exact, est - exact AS overcount,
        |       est >= exact AS never_under,
        |       est - exact <= CAST(ceil(2.0 * n_total / $width) AS BIGINT)
        |         AS bound_ok
        |FROM (SELECT e.term, e.est, x.exact, n.n_total,
        |        row_number() OVER (ORDER BY e.est DESC, e.term) AS rk
        |      FROM est e JOIN exact x ON e.term = x.term CROSS JOIN n)
        |WHERE rk <= 20 ORDER BY rk""".stripMargin
    })
}
