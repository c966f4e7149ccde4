package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class DynSessionAsyncSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double) =
    Event(id, new Timestamp(tSec * 1000), user, typ, v, "{}")

  test("dynamic-gap session windows honor the per-row gap") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    // errors get a 10 s gap, others 100 s
    val gap = when(col("event_type") === "error", "10 seconds").otherwise("100 seconds")
    val agg = WindowedAggs.sessionDynamic(ms.toDF(), "ts", gap, "5 seconds",
      Seq(col("user_id")), Seq(count(lit(1)).as("n")))
    val q = agg.select(col("user_id"), col("session_window.start").cast("long").as("ss"), col("n"))
      .writeStream.format("memory").queryName("dsw").outputMode("append").start()
    // user 1: error at 0 (10 s gap) then event at 50 → 2 sessions
    // user 2: view at 0 (100 s gap) then event at 50 → 1 session
    ms.addData(ev(1, 0, 1, "error", 0), ev(2, 50, 1, "view", 0),
               ev(3, 0, 2, "view", 0), ev(4, 50, 2, "view", 0))
    q.processAllAvailable()
    ms.addData(ev(9, 1000, 1, "view", 0), ev(10, 1000, 2, "view", 0)) // close sessions
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dsw").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((1L, 0L, 1L)) && got.contains((1L, 50L, 1L)),
      s"user 1 should split into two sessions: $got")
    assert(got.contains((2L, 0L, 2L)), s"user 2 should merge into one session: $got")
  }

  test("async lookup join resolves with bounded concurrency") {
    val spark2 = spark; import spark2.implicits._
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val out = StreamJoins.lookupJoinAsync[String](
      base, "k",
      () => k => Future { if (k != 2) Some(s"dim$k") else None },
      "dim", maxInFlight = 2)
    val rows = out.select(col("k"), col("dim")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, Some("dim1")), (2L, None), (3L, Some("dim3"))))
  }
}
