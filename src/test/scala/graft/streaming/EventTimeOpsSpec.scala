package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Out-of-order delivery specs: the watermark-buffered operators must
  * produce the same output as in-order delivery (reference
  * TemporalRowTimeJoinOperator / RowTimeSortOperator semantics). */
class EventTimeOpsSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double = 0.0) =
    Event(id, new Timestamp(tSec * 1000), user, typ, v, "{}")

  test("eventTimeSorted emits rows in event-time order despite shuffled arrival") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventTimeOps.eventTimeSorted(ms.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("ets1").outputMode("append").start()
    ms.addData(ev(3, 50, 1, "c"), ev(1, 10, 1, "a"), ev(2, 30, 1, "b"))
    // watermark advances to 40 s after the batch; the no-data batch
    // flushes 1 and 2 IN ORDER, 3 (t=50) stays buffered
    q.processAllAvailable()
    assert(spark.table("ets1").as[Event].collect().map(_.event_id).toList
      == List(1L, 2L))
    ms.addData(ev(4, 100, 1, "d")) // watermark → 90 s: flushes 3
    q.processAllAvailable()
    assert(spark.table("ets1").as[Event].collect().map(_.event_id).toList
      == List(1L, 2L, 3L))
    ms.addData(ev(5, 200, 1, "e")) // watermark → 190 s: flushes 4
    q.processAllAvailable()
    q.stop()
    val all = spark.table("ets1").as[Event].collect().map(_.event_id).toList
    assert(all == List(1L, 2L, 3L, 4L))
  }

  test("asOfJoinBuffered joins a purchase to a view that ARRIVES after it") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventTimeOps.asOfJoinBuffered(ms.toDS(), "view", "purchase", "30 seconds")
      .writeStream.format("memory").queryName("aob1").outputMode("append").start()
    // purchase delivered FIRST, its view (earlier event time) second —
    // the in-order operator would miss this join
    ms.addData(ev(10, 50, 1, "purchase"))
    q.processAllAvailable()
    ms.addData(ev(5, 40, 1, "view"))
    q.processAllAvailable()
    ms.addData(ev(99, 200, 1, "view")) // advance watermark past 50 s
    q.processAllAvailable()
    q.stop()
    val got = spark.table("aob1").as[StatefulOps.AsOfJoined].collect().toList
    assert(got == List(StatefulOps.AsOfJoined(1L, 10L, Some(5L), Some(10000000L))))
  }

  test("asOfJoinBuffered: shuffled delivery equals sorted delivery") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val events = Seq(
      ev(1, 10, 1, "view"), ev(2, 20, 1, "purchase"), ev(3, 25, 1, "view"),
      ev(4, 30, 1, "purchase"), ev(5, 15, 2, "view"), ev(6, 35, 2, "purchase"))
    val flush = ev(99, 500, 3, "view")
    def run(name: String, batches: Seq[Seq[Event]]): Set[StatefulOps.AsOfJoined] = {
      val ms = MemoryStream[Event]
      val q = EventTimeOps.asOfJoinBuffered(ms.toDS(), "view", "purchase", "60 seconds")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[StatefulOps.AsOfJoined].collect().toSet
    }
    val sorted = run("aob_sorted", Seq(events, Seq(flush)))
    val shuffled = run("aob_shuffled",
      Seq(Seq(events(3), events(0)), Seq(events(5), events(2), events(1)),
          Seq(events(4)), Seq(flush)))
    assert(sorted == shuffled && sorted.size == 3)
  }

  test("matchStreamBuffered finds the pattern when the first event arrives last") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val pat = Cep.Pattern.begin[Event]("v")((e, _) => e.event_type == "view")
      .followedBy("p")((e, _) => e.event_type == "purchase")
    val ms = MemoryStream[Event]
    val q = EventTimeOps.matchStreamBuffered(ms.toDS(), pat, "30 seconds")
      .map { case (u, m) => (u, m("v").head.event_id, m("p").head.event_id) }
      .writeStream.format("memory").queryName("msb1").outputMode("append").start()
    ms.addData(ev(2, 50, 1, "purchase")) // delivered before the view
    q.processAllAvailable()
    ms.addData(ev(1, 40, 1, "view"))
    q.processAllAvailable()
    ms.addData(ev(99, 200, 1, "noise")) // advance watermark
    q.processAllAvailable()
    q.stop()
    val got = spark.table("msb1").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((1L, 1L, 2L)))
  }
}
