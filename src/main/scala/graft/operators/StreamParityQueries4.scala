package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.{QuotaSampler, Replay}
import StreamParityQueries.runAppend

/** Round-7 parity pack: streaming corpus-curation additions. */
object StreamParityQueries4 {

  val queries: Map[String, Q] = Map(

    // STREAMING per-language admission quota: replay the documents
    // table as three doc_id-ordered micro-batches through the keyed
    // counter state op — the first `quota` docs of each language are
    // admitted, everything later is dropped. Deterministic because
    // epochs replay in id order and batches sort on doc_id; oracle is
    // the batch rank over the same order. Wrong iff the counter
    // resets between batches, over-admits inside a batch, or the
    // key partitioning leaks rows across languages.
    "q207_stream_quota" -> ((s, d) => {
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-quota")
      val docs = Tables.documents(s, d)
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val (c1, c2) = (maxId / 3, 2 * maxId / 3)
      val keyed = docs.select(col("doc_id"), col("lang").as("k"))
      val (inDir, schema) = Replay.fileEpochs(keyed,
        Seq(col("doc_id") < c1,
          col("doc_id") >= c1 && col("doc_id") < c2,
          col("doc_id") >= c2),
        base.toString)
      val admitted = QuotaSampler.admitFirstN(
        Replay.streamDf(s, inDir, schema).as[QuotaSampler.DocKey], 40)
      runAppend(admitted.toDF(), base.toString, s)
        .select(col("doc_id"), col("k").as("lang"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q207_stream_quota" ->
      """SELECT doc_id, lang FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 40
        |ORDER BY doc_id""".stripMargin
  )
}
