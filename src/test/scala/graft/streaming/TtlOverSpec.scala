package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TtlOverSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double) =
    Event(id, new Timestamp(tSec * 1000), user, typ, v, "{}")

  test("dedupFirstWithTtl emits first arrival, re-emits after TTL expiry") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val clock = new java.util.concurrent.atomic.AtomicLong(1000000L)
    val ms = MemoryStream[Event]
    val q = StatefulOps.dedupFirstWithTtl(ms.toDS(), ttlMs = 60000L,
        now = () => clock.get())
      .writeStream.format("memory").queryName("ttl1").outputMode("append").start()
    ms.addData(ev(1, 10, 1, "a", 0), ev(2, 5, 1, "a", 0), ev(3, 7, 2, "a", 0))
    q.processAllAvailable()
    ms.addData(ev(4, 20, 1, "a", 0)) // suppressed: key seen, TTL not expired
    q.processAllAvailable()
    clock.addAndGet(120000L) // advance past the TTL
    ms.addData(ev(5, 30, 1, "a", 0)) // expired → re-emitted
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ttl1").as[Event].collect().map(_.event_id).toSet
    assert(got == Set(2L, 3L, 5L)) // first-by-event-time, then post-TTL re-emit
  }

  test("boundedRowsOver aggregates the last n rows per key") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.boundedRowsOver(ms.toDS(), n = 2)
      .writeStream.format("memory").queryName("ov1").outputMode("append").start()
    ms.addData(ev(1, 1, 1, "a", 1.0), ev(2, 2, 1, "a", 2.0))
    q.processAllAvailable()
    ms.addData(ev(3, 3, 1, "a", 4.0)) // window slides across batches
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ov1").as[StatefulOps.OverRow].collect()
      .sortBy(_.event_id).map(r => (r.event_id, r.sum_prev, r.cnt_prev)).toList
    assert(got == List((1L, 1.0, 1), (2L, 3.0, 2), (3L, 6.0, 2)))
  }

  test("boundedRangeOver aggregates the trailing time range per key") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.boundedRangeOver(ms.toDS(), rangeMs = 10000L)
      .writeStream.format("memory").queryName("ov2").outputMode("append").start()
    // rows at 0 s, 5 s, then 20 s (the 10 s range drops the first two)
    ms.addData(ev(1, 0, 1, "a", 1.0), ev(2, 5, 1, "a", 2.0))
    q.processAllAvailable()
    ms.addData(ev(3, 20, 1, "a", 4.0), ev(4, 25, 1, "a", 8.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ov2").as[StatefulOps.OverRow].collect()
      .sortBy(_.event_id).map(r => (r.event_id, r.sum_prev, r.cnt_prev)).toList
    // t=5 includes t=0 (within 10 s); t=20 stands alone; t=25 adds t=20
    assert(got == List((1L, 1.0, 1), (2L, 3.0, 2), (3L, 4.0, 1), (4L, 12.0, 2)))
  }
}
