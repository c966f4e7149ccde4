package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming semi/anti join specs — both orders of arrival, per the
  * reference StreamingSemiAntiJoinOperator semantics (append-mode
  * approximation documented on SemiAntiJoin). */
class SemiAntiJoinSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String) =
    Event(id, new Timestamp(tSec * 1000), user, typ, 0.0, "{}")

  test("semi join emits a left whose right arrived FIRST") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val lms = MemoryStream[Event]; val rms = MemoryStream[Event]
    val q = SemiAntiJoin.semiJoin(lms.toDS(), rms.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("semi1").outputMode("append").start()
    rms.addData(ev(100, 10, 1, "allow"))
    q.processAllAvailable()
    lms.addData(ev(1, 20, 1, "click"), ev(2, 30, 2, "click"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("semi1").as[Event].collect().map(_.event_id).toSet
    assert(got == Set(1L)) // user 2 has no right row
  }

  test("semi join emits a buffered left when its right arrives LATER") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val lms = MemoryStream[Event]; val rms = MemoryStream[Event]
    val q = SemiAntiJoin.semiJoin(lms.toDS(), rms.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("semi2").outputMode("append").start()
    lms.addData(ev(1, 20, 1, "click"))
    q.processAllAvailable()
    assert(spark.table("semi2").isEmpty) // no right yet → buffered
    rms.addData(ev(100, 25, 1, "allow"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("semi2").as[Event].collect().map(_.event_id).toSet
    assert(got == Set(1L))
  }

  test("anti join emits only lefts with no right for the key, at the watermark") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val lms = MemoryStream[Event]; val rms = MemoryStream[Event]
    val q = SemiAntiJoin.antiJoin(lms.toDS(), rms.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("anti1").outputMode("append").start()
    lms.addData(ev(1, 20, 1, "click"), ev(2, 30, 2, "click"))
    rms.addData(ev(100, 25, 1, "block")) // user 1 matched → suppressed
    q.processAllAvailable()
    assert(spark.table("anti1").isEmpty) // watermark still behind the lefts
    rms.addData(ev(101, 100, 99, "noise")) // advance watermark to 90 s
    q.processAllAvailable()
    q.stop()
    val got = spark.table("anti1").as[Event].collect().map(_.event_id).toSet
    assert(got == Set(2L)) // only the unmatched user-2 left
  }

  test("anti join drops idle-key tombstones at retention expiry (no re-armed timers)") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val lms = MemoryStream[Event]; val rms = MemoryStream[Event]
    // 5 s retention so the test can expire tombstones with small watermarks
    val q = SemiAntiJoin.antiJoin(lms.toDS(), rms.toDS(), "10 seconds",
        retentionMs = 5000L)
      .writeStream.format("memory").queryName("anti3").outputMode("append").start()
    lms.addData(ev(1, 20, 1, "click"))
    rms.addData(ev(100, 25, 1, "block")) // user 1: matched → tombstone
    q.processAllAvailable()
    rms.addData(ev(101, 100, 99, "noise")) // watermark → 90 s: user-1/99 timers fire
    q.processAllAvailable()
    rms.addData(ev(102, 200, 98, "noise")) // watermark → 190 s: user-98 timer set
    q.processAllAvailable()
    rms.addData(ev(103, 300, 97, "noise")) // watermark → 290 s
    q.processAllAvailable()
    val stateRows = q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.toSeq.map(_.numRowsTotal))
      .lastOption.getOrElse(-1L)
    q.stop()
    // only the freshest key's tombstone may remain; every idle key's
    // state (incl. the seen flag) was removed at its retention expiry
    assert(stateRows <= 1L, s"idle tombstones leaked: $stateRows state rows")
    assert(spark.table("anti3").as[Event].collect().isEmpty)
  }

  test("anti join suppresses a left whose right arrives in a LATER batch (within horizon)") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val lms = MemoryStream[Event]; val rms = MemoryStream[Event]
    val q = SemiAntiJoin.antiJoin(lms.toDS(), rms.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("anti2").outputMode("append").start()
    lms.addData(ev(1, 20, 1, "click"))
    q.processAllAvailable()
    rms.addData(ev(100, 22, 1, "block")) // arrives later, still < watermark horizon
    q.processAllAvailable()
    rms.addData(ev(101, 100, 99, "noise")) // advance watermark
    q.processAllAvailable()
    q.stop()
    assert(spark.table("anti2").isEmpty)
  }
}
