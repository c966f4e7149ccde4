package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Late-data side output routing (WindowOperator.java:139
  * lateDataOutputTag → tag column + two filtered sinks, SURVEY §7.3):
  * the round-1 gap was that only the DROP behavior was tested — this
  * asserts the side CHANNEL receives exactly the late rows while the
  * main channel keeps the rest. */
class LateDataSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long) =
    Event(id, new Timestamp(tSec * 1000), user, "e", 0.0, "{}")

  test("late rows are routed to the side sink, on-time rows to the main sink") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val tagged = WindowedAggs.tagLate(ms.toDS(), delayMs = 30000L)
    // two filtered sinks over ONE tagged stream — the side-output shape
    val qMain = tagged.filter(!_._2).map(_._1)
      .writeStream.format("memory").queryName("ld_main").outputMode("append").start()
    val qLate = tagged.filter(_._2).map(_._1)
      .writeStream.format("memory").queryName("ld_late").outputMode("append").start()
    def sync(): Unit = { qMain.processAllAvailable(); qLate.processAllAvailable() }
    ms.addData(ev(1, 100, 1)) // advances user 1's max event time to 100 s
    sync()
    // 10 s is 90 s behind the max → late; 110 s is on time;
    // 80 s is within the 30 s bound → NOT late
    ms.addData(ev(2, 10, 1), ev(3, 110, 1), ev(4, 80, 1))
    sync()
    qMain.stop(); qLate.stop()
    val main = spark.table("ld_main").as[Event].collect().map(_.event_id).toSet
    val late = spark.table("ld_late").as[Event].collect().map(_.event_id).toSet
    assert(late == Set(2L), s"late channel wrong: $late")
    assert(main == Set(1L, 3L, 4L), s"main channel wrong: $main")
  }
}
