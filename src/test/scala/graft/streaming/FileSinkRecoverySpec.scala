package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exactly-once streaming file sink (reference
  * `StreamingFileSink.java:98` two-phase commit /
  * `TwoPhaseCommitSinkFunction.java`): Spark's parquet sink commits
  * per micro-batch through the checkpoint's write-ahead commit log, so
  * a restarted query resumes AFTER the last committed batch — no
  * duplicates, no losses. */
class FileSinkRecoverySpec extends SparkSpec {

  private def ev(id: Long, tSec: Long) =
    Event(id, new Timestamp(tSec * 1000), 1L, "e", 0.0, "{}")

  test("restart from the checkpoint neither duplicates nor drops rows") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-fsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fsink-ck").toString
    val ms = MemoryStream[Event]
    def start() = ms.toDS()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    ms.addData(ev(1, 10), ev(2, 20))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start() // same checkpoint → resumes after batch 0
    ms.addData(ev(3, 30))
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(out).as[Event].collect().map(_.event_id).toList
    assert(ids.sorted == List(1L, 2L, 3L), s"file sink rows: $ids")
  }
}
