package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exactly-once transactional JDBC sink (TwoPhaseCommitSinkFunction
  * semantics): replays — whole-batch re-runs and partition-level
  * retries — must never duplicate rows, because rows and the commit
  * marker land in one transaction. */
class TxnSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:txnsink;create=true"

  private def countRows(table: String): Long = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT count(*) FROM $table")
      rs.next(); rs.getLong(1)
    } finally conn.close()
  }

  test("streamed batches land exactly once, surviving a simulated replay") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    TxnSink.init(url, "SINK_T")
    val ms = MemoryStream[(Long, Long)]
    var replayed: Option[(org.apache.spark.sql.DataFrame, Long)] = None
    val q = ms.toDF().toDF("id", "v").writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        TxnSink.writeBatch(df, batchId, url, "SINK_T")
        replayed = Some((df, batchId)) // remember for the replay below
      }.start()
    ms.addData((1L, 10L), (2L, 20L), (3L, 30L))
    q.processAllAvailable()
    assert(countRows("SINK_T") == 3)
    // at-least-once replay: foreachBatch re-runs the SAME batchId
    // after a crash-before-checkpoint — must be a no-op
    val (df, bid) = replayed.get
    TxnSink.writeBatch(df, bid, url, "SINK_T")
    assert(countRows("SINK_T") == 3, "whole-batch replay duplicated rows")
    // next batch still lands
    ms.addData((4L, 40L))
    q.processAllAvailable()
    q.stop()
    assert(countRows("SINK_T") == 4)
  }

  test("a partition-level retry after a mid-batch failure completes without dupes") {
    val spark2 = spark; import spark2.implicits._
    TxnSink.init(url, "SINK_P")
    // two partitions; partition containing id=99 fails AFTER its rows
    // would have been buffered — the transaction rolls back, so
    // nothing from that partition is visible
    val df = Seq((1L, 1L), (99L, 9L)).toDF("id", "v").repartition(2, $"id")
    val poisoned = df.map { r =>
      if (r.getLong(0) == 99L && !TxnSinkSpec.armed.get()) {
        TxnSinkSpec.armed.set(true)
        throw new RuntimeException("injected partition failure")
      }
      (r.getLong(0), r.getLong(1))
    }.toDF("id", "v")
    // Spark retries the failed task (local[n] re-attempts); depending
    // on retry config the first attempt may fail the job — either
    // way, re-running writeBatch with the same batchId must converge
    // to exactly one copy of every row.
    try TxnSink.writeBatch(poisoned, 7L, url, "SINK_P")
    catch { case _: Throwable => () }
    TxnSink.writeBatch(df.selectExpr("id", "v"), 7L, url, "SINK_P")
    val conn = java.sql.DriverManager.getConnection(url)
    val ids = try {
      val rs = conn.createStatement()
        .executeQuery("SELECT ID FROM SINK_P ORDER BY ID")
      Iterator.continually(rs).takeWhile(_.next()).map(_.getLong(1)).toList
    } finally conn.close()
    assert(ids == List(1L, 99L), s"partition retry diverged: $ids")
  }
}

object TxnSinkSpec {
  // cross-task flag for the injected one-shot failure (local[n]: all
  // tasks share the JVM)
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
}
