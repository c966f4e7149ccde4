package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Operator-harness style tests (reference pattern:
  * OneInputStreamOperatorTestHarness.java:39): feed element sequences
  * through MemoryStream micro-batches and assert exact emitted rows. */
class StatefulOpsSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double) =
    Event(id, new Timestamp(tSec * 1000), user, typ, v, "{}")

  private var qn = 0
  private def sink[T](ds: org.apache.spark.sql.Dataset[T], mode: String): String = {
    qn += 1; val name = s"sink$qn"
    val q = ds.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable(); q.stop()
    name
  }

  test("dedupKeepLast emits the newest row per (user, type)") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(ev(1, 10, 1, "click", 1.0), ev(2, 20, 1, "click", 2.0),
               ev(3, 5, 1, "click", 0.5), // older → ignored
               ev(4, 8, 2, "view", 4.0))
    val name = sink(StatefulOps.dedupKeepLast(ms.toDS()), "update")
    val rows = spark.table(name).as[Event].collect().map(e => (e.user_id, e.event_id)).toSet
    assert(rows == Set((1L, 2L), (2L, 4L)))
  }

  test("dedupKeepLast updates across batches, silent when unchanged") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.dedupKeepLast(ms.toDS())
      .writeStream.format("memory").queryName("dl2").outputMode("update").start()
    ms.addData(ev(1, 10, 1, "click", 1.0))
    q.processAllAvailable()
    ms.addData(ev(2, 5, 1, "click", 9.0)) // older event → no new emission
    q.processAllAvailable()
    ms.addData(ev(3, 30, 1, "click", 3.0)) // newer → emitted
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dl2").as[Event].collect().map(_.event_id).toList
    assert(got == List(1L, 3L))
  }

  test("dedupFirstEventTtl re-opens a key when event-time TTL elapses") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.dedupFirstEventTtl(ms.toDS(), ttlUs = 10_000_000L) // 10 s
      .writeStream.format("memory").queryName("ttl1").outputMode("append").start()
    // batch 1 (unsorted inside the batch): t=5 kept first, t=10 within
    // TTL of 5 (10-5 <= 10) dropped, t=16 exceeds (16-5 > 10) kept
    ms.addData(ev(2, 10, 1, "click", 0), ev(1, 5, 1, "click", 0),
               ev(3, 16, 1, "click", 0))
    q.processAllAvailable()
    // batch 2: t=26 is EXACTLY TTL past 16 → dropped (strictly-greater
    // re-open); t=27 kept; other key unaffected
    ms.addData(ev(4, 26, 1, "click", 0), ev(5, 27, 1, "click", 0),
               ev(6, 26, 2, "view", 0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ttl1").as[Event].collect().map(_.event_id).toSet
    assert(got == Set(1L, 3L, 5L, 6L))
  }

  test("topNPerKey keeps the N best by value with re-emission on change") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.topNPerKey(ms.toDS(), 2)
      .writeStream.format("memory").queryName("tn").outputMode("update").start()
    ms.addData(ev(1, 1, 7, "x", 5.0), ev(2, 2, 7, "x", 3.0))
    q.processAllAvailable() // emits top-2: (5.0, 3.0)
    ms.addData(ev(3, 3, 7, "x", 8.0))
    q.processAllAvailable() // refresh: (8.0, 5.0)
    ms.addData(ev(4, 4, 7, "x", 1.0)) // below top-2 → no emission
    q.processAllAvailable()
    q.stop()
    val batches = spark.table("tn").as[StatefulOps.TopNRow].collect()
    // last refresh: ranks (1 → id 3 @8.0), (2 → id 1 @5.0)
    val last = batches.takeRight(2).map(r => (r.rank, r.event_id, r.value)).toSet
    assert(last == Set((1, 3L, 8.0), (2, 1L, 5.0)))
    assert(batches.length == 4) // initial top-2 + one refresh, nothing for ev4
  }

  test("countTumbleWindow emits fixed-size windows in event order") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.countTumbleWindow(ms.toDS(), 3)
      .writeStream.format("memory").queryName("cw").outputMode("append").start()
    ms.addData(ev(1, 1, 1, "x", 1.0), ev(2, 2, 1, "x", 2.0))
    q.processAllAvailable() // only 2 buffered → nothing
    ms.addData(ev(3, 3, 1, "x", 3.0), ev(4, 4, 1, "x", 4.0))
    q.processAllAvailable() // completes window 0 (1+2+3), buffers ev4
    ms.addData(ev(5, 5, 1, "x", 5.0), ev(6, 6, 1, "x", 6.0))
    q.processAllAvailable() // completes window 1 (4+5+6)
    q.stop()
    val got = spark.table("cw").as[StatefulOps.CountWindowAgg].collect()
      .sortBy(_.w_id).map(w => (w.w_id, w.n, w.sum_v)).toList
    assert(got == List((0L, 3, 6.0), (1L, 3, 15.0)))
  }

  test("asOfJoin joins each purchase to the latest view at or before it") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.asOfJoin(ms.toDS(), "view", "purchase")
      .writeStream.format("memory").queryName("aj").outputMode("append").start()
    ms.addData(ev(1, 10, 1, "view", 0), ev(2, 20, 1, "purchase", 0),
               ev(3, 30, 1, "view", 0), ev(4, 40, 1, "purchase", 0),
               ev(5, 15, 2, "purchase", 0)) // no prior view → null join
    q.processAllAvailable()
    q.stop()
    val got = spark.table("aj").as[StatefulOps.AsOfJoined].collect()
      .sortBy(_.purchase_id)
      .map(r => (r.purchase_id, r.last_view_id, r.lag_us)).toList
    assert(got == List(
      (2L, Some(1L), Some(10000000L)),
      (4L, Some(3L), Some(10000000L)),
      (5L, None, None)))
  }
}
