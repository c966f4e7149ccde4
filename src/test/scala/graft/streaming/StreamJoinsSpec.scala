package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamJoinsSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double) =
    Event(id, new Timestamp(tSec * 1000), user, typ, v, "{}")

  test("watermarked stream-stream interval join matches within the bound") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val lm = MemoryStream[Event]; val rm = MemoryStream[Event]
    val joined = StreamJoins.intervalJoin(
        lm.toDF().select(col("user_id"), col("ts"), col("event_id").as("l_id")),
        rm.toDF().select(col("user_id"), col("ts").as("r_ts"), col("event_id").as("r_id"))
          .withColumnRenamed("r_ts", "ts"),
        key = "user_id", tsCol = "ts", delay = "10 seconds",
        lower = "30 SECONDS", upper = "30 SECONDS")
      .select(col("l_id"), col("r_id"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    lm.addData(ev(1, 100, 1, "a", 0), ev(2, 500, 1, "a", 0))
    rm.addData(ev(10, 110, 1, "b", 0), ev(11, 300, 1, "b", 0), ev(12, 505, 1, "b", 0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 12L))) // within ±30s only
  }

  test("full-outer interval join null-pads unmatched sides after the watermark") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val lm = MemoryStream[Event]; val rm = MemoryStream[Event]
    val joined = StreamJoins.intervalJoin(
        lm.toDF().select(col("user_id"), col("ts"), col("event_id").as("l_id")),
        rm.toDF().select(col("user_id"), col("ts"), col("event_id").as("r_id")),
        key = "user_id", tsCol = "ts", delay = "10 seconds",
        lower = "30 SECONDS", upper = "30 SECONDS",
        joinType = "full_outer")
      .select(col("l_id"), col("r_id"))
    val q = joined.writeStream.format("memory").queryName("ssjfo")
      .outputMode("append").start()
    // user 1: left-only; user 2: matched pair; user 3: right-only
    lm.addData(ev(1, 100, 1, "a", 0), ev(2, 500, 2, "a", 0))
    rm.addData(ev(12, 505, 2, "b", 0), ev(13, 200, 3, "b", 0))
    q.processAllAvailable()
    // push the watermark far past every join window so unmatched rows emit
    lm.addData(ev(90, 10000, 9, "a", 0)); rm.addData(ev(91, 10000, 9, "b", 0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjfo").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                 if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got.contains((1L, -1L)), s"left-only row missing: $got")   // null right
    assert(got.contains((-1L, 13L)), s"right-only row missing: $got") // null left
    assert(got.contains((2L, 12L)), s"matched pair missing: $got")
  }

  test("lookup join enriches via one client per partition") {
    val spark2 = spark; import spark2.implicits._
    var clients = 0
    val base = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v").repartition(2)
    val out = StreamJoins.lookupJoin[String](
      base, "k",
      () => { clients += 1; k => if (k <= 2) Some(s"dim$k") else None },
      "dim")
    val rows = out.select(col("k"), col("dim")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, Some("dim1")), (2L, Some("dim2")), (3L, None)))
  }
}
