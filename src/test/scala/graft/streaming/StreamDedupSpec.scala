package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dedup against a static historical corpus: exact anti
  * join, near-dup flagging via the corpus LSH bucket table, and the
  * foreachBatch drop form. */
class StreamDedupSpec extends SparkSpec {

  // 12-word docs → 9 four-word shingles; nearDup shares 8 of them
  private val docA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val nearA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
  private val novel = "one two three four five six seven eight nine ten eleven twelve"

  private def corpus = {
    val spark2 = spark; import spark2.implicits._
    Seq((100L, docA)).toDF("doc_id", "text")
  }

  test("dropSeenExact removes exact re-ingests, keeps everything else") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val clean = StreamDedup.dropSeenExact(in.toDF().toDF("doc_id", "text"), corpus)
    val q = clean.writeStream.format("memory").queryName("sde")
      .outputMode("append").start()
    in.addData((1L, docA), (2L, nearA), (3L, novel))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sde").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L)) // exact dup of corpus doc dropped
  }

  test("flagNearDups flags band-sharing docs, not novel ones") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val bands = StreamDedup.corpusBands(corpus).cache()
    val in = MemoryStream[(Long, String)]
    val flagged = StreamDedup.flagNearDups(in.toDF().toDF("doc_id", "text"), bands)
    val q = flagged.writeStream.format("memory").queryName("snd")
      .outputMode("append").start()
    in.addData((1L, docA), (2L, nearA), (3L, novel))
    q.processAllAvailable(); q.stop()
    val got = spark.table("snd").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // exact + near dup flagged once each; novel not
  }

  test("on real documents, every exact re-ingest is LSH-flagged") {
    // exact re-ingest ⇒ identical signature ⇒ shares every band ⇒
    // flagged: recall = 1 on the replayed set (the synthetic documents
    // have no natural exact dups, so replay corpus texts as new ids —
    // the actual re-ingestion scenario).
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).cache()
    val corpus = docs.filter(col("doc_id") < 100)
    val bands = StreamDedup.corpusBands(corpus).cache()
    val in = MemoryStream[(Long, String)]
    val flagged = StreamDedup.flagNearDups(in.toDF().toDF("doc_id", "text"), bands)
    val q = flagged.writeStream.format("memory").queryName("sdreal")
      .outputMode("append").start()
    val replayed = corpus.collect()
      .map(r => (r.getLong(0) + 10000, r.getString(1)))
    in.addData(replayed.toIndexedSeq)
    q.processAllAvailable(); q.stop()
    val got = spark.table("sdreal").collect().map(_.getLong(0)).toSet
    val expected = replayed.map(_._1).toSet
    assert(expected.nonEmpty)
    assert(expected.subsetOf(got),
      s"missed exact re-ingests: ${expected -- got}")
    docs.unpersist(); bands.unpersist()
  }

  test("dropNearDups inside foreachBatch keeps only novel docs") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val bands = StreamDedup.corpusBands(corpus).cache()
    val in = MemoryStream[(Long, String)]
    val survivors = scala.collection.mutable.Set[Long]()
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamDedup.dropNearDups(batch, bands)
          .select("doc_id").collect().foreach(r => survivors += r.getLong(0))
      }.start()
    in.addData((1L, docA), (2L, nearA), (3L, novel))
    q.processAllAvailable(); q.stop()
    assert(survivors.toSet == Set(3L))
  }
}
