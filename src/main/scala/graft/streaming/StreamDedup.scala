package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextQueries

/** Streaming ingestion dedup against a static historical corpus — the
  * streaming half of the curation pipeline (the reference builds this
  * as a keyed process function holding corpus state; here the corpus
  * is a STATIC table, so Spark's stream-static joins do it without
  * any keyed state on the stream side).
  *
  * Reference analog: dedup-against-history via
  * `StreamingSemiAntiJoinOperator.java:35` when both sides stream;
  * with a frozen corpus the static side needs no state or retraction,
  * which is the common production shape (nightly-refreshed corpus
  * snapshot, intra-day stream).
  *
  * Scale: the exact path is one equi-join per micro-batch against the
  * corpus hash table (broadcast if it fits, shuffled otherwise); the
  * near-dup path computes the minhash signature per row with NO
  * shuffle (all-expression form), explodes k band keys per doc and
  * semi-joins the static band table — the same banded-LSH shape as
  * the batch q65/q72, never all-pairs.
  */
object StreamDedup {

  /** Drop stream docs whose exact content (md5) already occurs in the
    * corpus. Stream-static LEFT ANTI — stateless on the stream side.
    * Input needs a `text` column; output preserves the input schema. */
  def dropSeenExact(stream: DataFrame, corpus: DataFrame): DataFrame = {
    val seen = corpus.select(md5(col("text")).as("__h")).distinct()
    stream.withColumn("__h", md5(col("text")))
      .join(seen, Seq("__h"), "left_anti").drop("__h")
  }

  /** The corpus's (band, h) LSH bucket table — compute once per corpus
    * snapshot and persist/broadcast; both near-dup entry points join
    * against it. */
  def corpusBands(corpus: DataFrame): DataFrame =
    corpus.select(TextQueries.minhashSigArray(col("text")).as("sig"))
      .select(posexplode(col("sig")))
      .toDF("band", "h").distinct()

  /** Flag stream docs near-duplicating the corpus: semi join of the
    * doc's exploded band keys against the static bucket table. A doc
    * hitting several bands is flagged once per micro-batch
    * (dropDuplicates on doc_id is batch-local here — no watermark
    * state; exactly-once flagging across batches would add
    * dropDuplicates over a keyed watermark). */
  def flagNearDups(stream: DataFrame, corpusBands: DataFrame): DataFrame =
    stream
      .withColumn("sig", TextQueries.minhashSigArray(col("text")))
      .select(col("doc_id"), posexplode(col("sig")))
      .toDF("doc_id", "band", "h")
      .join(corpusBands, Seq("band", "h"), "left_semi")
      .dropDuplicates("doc_id")
      .select(col("doc_id"))

  /** Keep only stream docs with NO band in common with the corpus —
    * the drop-side complement of flagNearDups (anti join on the
    * exploded bands, then a doc survives iff all k of its band rows
    * survived). The survivors-count step is an aggregation, so on a
    * stream run this INSIDE foreachBatch (stateless per micro-batch,
    * the standard shape for batch-composed streaming stages);
    * dropSeenExact/flagNearDups run directly on the stream. */
  def dropNearDups(stream: DataFrame, corpusBands: DataFrame): DataFrame = {
    val k = TextQueries.nSig
    stream
      .withColumn("sig", TextQueries.minhashSigArray(col("text")))
      .select(col("doc_id"), col("text"), posexplode(col("sig")))
      .toDF("doc_id", "text", "band", "h")
      .join(corpusBands, Seq("band", "h"), "left_anti")
      .groupBy(col("doc_id"), col("text"))
      .agg(count(lit(1)).as("__survived"))
      .filter(col("__survived") === k)
      .drop("__survived")
  }
}
