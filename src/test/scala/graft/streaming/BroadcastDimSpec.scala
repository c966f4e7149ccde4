package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Broadcast-state pattern (reference DataStream.broadcast:415 +
  * broadcast state): a stream enriched against a small dimension via
  * stream-static broadcast join — the static side is re-read per
  * micro-batch, playing the broadcast-state update role. */
class BroadcastDimSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double) =
    Event(id, new Timestamp(tSec * 1000), user, typ, v, "{}")

  test("stream-static broadcast join enriches each event") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val ms = MemoryStream[Event]
    val joined = ms.toDF().join(broadcast(dim), Seq("user_id"), "left_outer")
      .select(col("event_id"), coalesce(col("tier"), lit("none")).as("tier"))
    val q = joined.writeStream.format("memory").queryName("bdim")
      .outputMode("append").start()
    ms.addData(ev(1, 10, 1, "a", 0), ev(2, 20, 2, "a", 0), ev(3, 30, 9, "a", 0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bdim").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "gold"), (2L, "silver"), (3L, "none")))
  }
}
