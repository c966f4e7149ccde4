package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming per-key admission quota (counter keyed state). */
class QuotaSamplerSpec extends SparkSpec {

  import QuotaSampler.DocKey

  test("admits the first N per key across micro-batches, in id order") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[DocKey]
    val q = QuotaSampler.admitFirstN(ms.toDS(), quota = 3)
      .writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    // batch 1: out-of-order inside the batch — admission must sort
    ms.addData(DocKey(5, "en"), DocKey(1, "en"), DocKey(3, "en"),
      DocKey(2, "de"))
    q.processAllAvailable()
    // batch 2: en already holds 3 admissions — everything en drops;
    // de admits two more and then closes
    ms.addData(DocKey(7, "en"), DocKey(4, "de"), DocKey(6, "de"),
      DocKey(8, "de"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("quota").as[DocKey].collect()
      .map(r => (r.k, r.doc_id)).sorted.toList
    assert(got == List(("de", 2L), ("de", 4L), ("de", 6L),
      ("en", 1L), ("en", 3L), ("en", 5L)))
  }
}
