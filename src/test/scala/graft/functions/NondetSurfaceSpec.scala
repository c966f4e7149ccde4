package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The nondeterministic function surface (reference UUID / PROCTIME /
  * PRINT — `FlinkSqlOperatorTable` UUID, `ProcTimeMaterialization`,
  * print sink). Excluded from the DuckDB oracle BY DESIGN (values
  * differ run to run); what IS testable and tested here: shape,
  * uniqueness, per-batch semantics, and the sink path.
  */
class NondetSurfaceSpec extends SparkSpec {

  test("uuid() yields distinct well-formed v4 UUIDs per row") {
    val spark2 = spark; import spark2.implicits._
    val ids = (1 to 2000).toDF("i").select(expr("uuid()").as("u"))
      .as[String].collect()
    assert(ids.distinct.length == ids.length, "uuids must be unique per row")
    val v4 = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    assert(ids.forall(u => v4.matches(u)), s"malformed uuid: ${ids.find(u => !v4.matches(u))}")
  }

  test("processing time is query-constant per batch and monotonic across batches") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    // Flink PROCTIME() materializes the operator's wall clock; Spark's
    // analog current_timestamp() is constant WITHIN a (micro-)batch
    // and advances across batches — the semantic streaming sinks see.
    val ms = MemoryStream[Int]
    val q = ms.toDS().withColumn("proctime", current_timestamp())
      .writeStream.format("memory").queryName("proct").outputMode("append")
      .start()
    ms.addData(1, 2, 3); q.processAllAvailable()
    Thread.sleep(5)
    ms.addData(4, 5); q.processAllAvailable()
    q.stop()
    val rows = spark.table("proct").collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).getTime))
    val b1 = rows.filter(_._1 <= 3).map(_._2).distinct
    val b2 = rows.filter(_._1 >= 4).map(_._2).distinct
    assert(b1.length == 1, s"batch 1 proctime not constant: ${b1.toList}")
    assert(b2.length == 1, s"batch 2 proctime not constant: ${b2.toList}")
    assert(b2.head >= b1.head, "proctime must not go backwards across batches")
  }

  test("print sink (console) consumes a streaming batch") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Int]
    val q = ms.toDS().writeStream.format("console")
      .option("numRows", "2").outputMode("append").start()
    ms.addData(1, 2, 3)
    q.processAllAvailable() // would throw if the sink path failed
    q.stop()
    assert(q.exception.isEmpty)
  }
}
