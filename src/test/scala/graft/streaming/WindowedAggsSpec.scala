package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Windowed streaming aggregation tests: tumble finalization at the
  * watermark, late-data dropping, session merge, keep-first dedup. */
class WindowedAggsSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double) =
    Event(id, new Timestamp(tSec * 1000), user, typ, v, "{}")

  test("tumbling window finalizes when the watermark passes; late rows dropped") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val agg = WindowedAggs.tumble(ms.toDF(), "ts", "1 minute", "10 seconds",
      Seq(col("event_type")), Seq(count(lit(1)).as("n"), sum(col("value")).as("v")))
    val q = agg.select(col("window.start").cast("long").as("ws"),
        col("event_type"), col("n"), col("v"))
      .writeStream.format("memory").queryName("tw").outputMode("append").start()
    ms.addData(ev(1, 10, 1, "a", 1.0), ev(2, 20, 1, "a", 2.0))
    q.processAllAvailable()
    // advance watermark beyond minute 0 (event at 130s → watermark 120s)
    ms.addData(ev(3, 130, 1, "a", 3.0))
    q.processAllAvailable()
    // late row for the closed window → dropped
    ms.addData(ev(4, 30, 1, "a", 100.0))
    q.processAllAvailable()
    // close the second window too
    ms.addData(ev(5, 260, 1, "a", 5.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tw").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set((0L, "a", 2L, 3.0), (120L, "a", 1L, 3.0)))
  }

  test("session windows merge events within the gap") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val agg = WindowedAggs.session(ms.toDF(), "ts", "30 seconds", "5 seconds",
      Seq(col("user_id")), Seq(count(lit(1)).as("n")))
    val q = agg.select(col("user_id"),
        col("session_window.start").cast("long").as("ss"),
        col("session_window.end").cast("long").as("se"), col("n"))
      .writeStream.format("memory").queryName("sw").outputMode("append").start()
    // one session: 10,25,40 (gaps < 30s) then new session at 200
    ms.addData(ev(1, 10, 1, "a", 0), ev(2, 25, 1, "a", 0), ev(3, 40, 1, "a", 0))
    q.processAllAvailable()
    ms.addData(ev(4, 200, 1, "a", 0)) // watermark 195 closes session 1
    q.processAllAvailable()
    ms.addData(ev(5, 400, 1, "a", 0)) // closes session 2
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sw").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 10L, 70L, 3L), (1L, 200L, 230L, 1L)))
  }

  test("dedupKeepFirst keeps the first arrival per key") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = WindowedAggs.dedupKeepFirst(ms.toDF(), "ts", "1 minute",
        Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("df1").outputMode("append").start()
    ms.addData(ev(1, 10, 1, "a", 1.0), ev(2, 20, 1, "a", 2.0), ev(3, 30, 2, "a", 3.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("df1").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }
}
