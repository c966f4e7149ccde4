package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Trigger/evictor options on the stateful tumbling window — one spec
  * per option (reference windowing/triggers + windowing/evictors). */
class WindowOpsSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, v: Double) =
    Event(id, new Timestamp(tSec * 1000), user, "e", v, "{}")

  // all tests: 60 s tumbling windows, 10 s watermark delay
  private def run(name: String, trigger: WindowOps.Trigger,
                  evictor: WindowOps.Evictor = WindowOps.NoEvictor)
                 (batches: Seq[Event]*): List[(Long, Long, Double, Boolean)] = {
    // returns only user 1's fires (flush rows belong to user 99)
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = WindowOps.tumble(ms.toDS(), 60000L, "10 seconds", trigger, evictor)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[WindowOps.WindowFire].collect().toList
      .filter(_.user_id == 1L)
      .map(f => (f.w_start_ms, f.n, f.sum_v, f.closing))
  }

  private def flush(tSec: Long) = ev(999, tSec, 99, 0.0)

  test("EventTimeTrigger: one closing fire when the watermark passes") {
    val got = run("wo_et", WindowOps.EventTimeTrigger)(
      Seq(ev(1, 10, 1, 1.0), ev(2, 20, 1, 2.0)),
      Seq(flush(100)))
    assert(got.filter(_._1 == 0L) == List((0L, 2L, 3.0, true)))
  }

  test("CountTrigger fires early every n rows, then closes with all rows") {
    val got = run("wo_ct", WindowOps.CountTrigger(2))(
      Seq(ev(1, 10, 1, 1.0), ev(2, 20, 1, 2.0), ev(3, 30, 1, 4.0)),
      Seq(flush(100)))
    val w0 = got.filter(t => t._1 == 0L)
    assert(w0 == List((0L, 2L, 3.0, false), (0L, 3L, 7.0, true)))
  }

  test("PurgingTrigger(CountTrigger) clears fired rows from later fires") {
    val got = run("wo_pt",
      WindowOps.PurgingTrigger(WindowOps.CountTrigger(2)))(
      Seq(ev(1, 10, 1, 1.0), ev(2, 20, 1, 2.0), ev(3, 30, 1, 4.0)),
      Seq(flush(100)))
    val w0 = got.filter(_._1 == 0L)
    assert(w0 == List((0L, 2L, 3.0, false), (0L, 1L, 4.0, true)))
  }

  test("DeltaTrigger fires when a value strays from the anchor") {
    // anchor = 1.0 (first value); 2.0 is within 5; 8.0 is not → fire
    val got = run("wo_dt", WindowOps.DeltaTrigger(5.0))(
      Seq(ev(1, 10, 1, 1.0), ev(2, 20, 1, 2.0), ev(3, 30, 1, 8.0)),
      Seq(flush(100)))
    val w0 = got.filter(_._1 == 0L)
    assert(w0 == List((0L, 3L, 11.0, false), (0L, 3L, 11.0, true)))
  }

  test("ContinuousEventTimeTrigger fires as the watermark crosses intervals") {
    val got = run("wo_cet", WindowOps.ContinuousEventTimeTrigger(20000L))(
      Seq(ev(1, 5, 1, 1.0)),
      Seq(flush(35)),  // watermark 25 s: ≥ 20 s past window start → early fire
      Seq(flush(100))) // watermark 90 s: closes the window
    val w0 = got.filter(_._1 == 0L)
    assert(w0 == List((0L, 1L, 1.0, false), (0L, 1L, 1.0, true)))
  }

  test("CountEvictor keeps only the newest rows at fire time") {
    val got = run("wo_ce", WindowOps.EventTimeTrigger, WindowOps.CountEvictor(2))(
      Seq(ev(1, 10, 1, 1.0), ev(2, 20, 1, 2.0), ev(3, 30, 1, 4.0)),
      Seq(flush(100)))
    assert(got.filter(_._1 == 0L) == List((0L, 2L, 6.0, true)))
  }

  test("TimeEvictor keeps only rows near the newest timestamp") {
    val got = run("wo_te", WindowOps.EventTimeTrigger, WindowOps.TimeEvictor(10000L))(
      Seq(ev(1, 1, 1, 1.0), ev(2, 5, 1, 2.0), ev(3, 20, 1, 4.0)),
      Seq(flush(100)))
    // newest = 20 s; 5 s and 1 s are more than 10 s older → evicted
    assert(got.filter(_._1 == 0L) == List((0L, 1L, 4.0, true)))
  }

  test("DeltaEvictor drops rows far from the newest value") {
    val got = run("wo_de", WindowOps.EventTimeTrigger, WindowOps.DeltaEvictor(3.0))(
      Seq(ev(1, 10, 1, 1.0), ev(2, 20, 1, 9.0), ev(3, 30, 1, 10.0)),
      Seq(flush(100)))
    // newest value 10.0: |10-1|≥3 evicts the first row
    assert(got.filter(_._1 == 0L) == List((0L, 2L, 19.0, true)))
  }
}
