package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Global sort-limit (StreamExecSortLimit) and sliding count windows
  * (CountSlidingWindowAssigner). */
class GlobalOpsSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, v: Double) =
    Event(id, new Timestamp(tSec * 1000), user, "e", v, "{}")

  test("sortLimitGlobal keeps the k best rows across keys and batches") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.sortLimitGlobal(ms.toDS(), k = 2)
      .writeStream.format("memory").queryName("glob1").outputMode("update").start()
    ms.addData(ev(1, 10, 1, 5.0), ev(2, 11, 2, 3.0), ev(3, 12, 3, 1.0))
    q.processAllAvailable()
    ms.addData(ev(4, 13, 4, 9.0)) // displaces value 3.0
    q.processAllAvailable()
    ms.addData(ev(5, 14, 5, 0.5)) // below the cut → no emission
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("glob1").as[StatefulOps.GlobalTopRow].collect().toList
    // last refresh: rank1 = id4 (9.0), rank2 = id1 (5.0)
    assert(rows.takeRight(2).map(r => (r.rank, r.event_id)) ==
      List((1, 4L), (2, 1L)))
    // batch 3 emitted nothing (top-2 unchanged)
    assert(rows.size == 2 + 2)
  }

  test("countSlideWindow fires every slide events over the last size events") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StatefulOps.countSlideWindow(ms.toDS(), size = 3, slide = 2)
      .writeStream.format("memory").queryName("csw1").outputMode("append").start()
    // values 1,2,3,4,5,6 in time order for one user
    ms.addData(ev(1, 1, 1, 1.0), ev(2, 2, 1, 2.0), ev(3, 3, 1, 4.0))
    q.processAllAvailable()
    ms.addData(ev(4, 4, 1, 8.0), ev(5, 5, 1, 16.0), ev(6, 6, 1, 32.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("csw1").as[StatefulOps.CountWindowAgg].collect()
      .sortBy(_.w_id).map(a => (a.w_id, a.n, a.sum_v)).toList
    // fire at event 2 (warm-up: [1,2]), event 4 ([2,4,8]), event 6 ([8,16,32])
    assert(got == List((0L, 2, 3.0), (1L, 3, 14.0), (2L, 3, 56.0)))
  }
}
