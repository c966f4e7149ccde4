package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession

/** End-to-end streaming drive over the real events table: reads
  * events.parquet as a file stream and runs each streaming operator,
  * printing emitted-row counts. Usage:
  *   tools/run.sh graft.streaming.StreamDemo /root/testdata/sf0.001
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    import spark.implicits._

    // File-stream the events table (ns ts read as long, truncated to µs).
    // The file source wants a directory: stage the single parquet file.
    val stage = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val events = spark.readStream.schema(schema)
      .parquet(stage.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .as[Event]

    def drive[T](name: String, ds: org.apache.spark.sql.Dataset[T], mode: String): Unit = {
      val q = ds.writeStream.format("memory").queryName(name).outputMode(mode).start()
      q.processAllAvailable(); q.stop()
      println(s"[demo] $name emitted ${spark.table(name).count()} rows")
    }

    drive("tumble", WindowedAggs.tumble(events.toDF(), "ts", "1 hour", "10 minutes",
      Seq(col("event_type")), Seq(count(lit(1)).as("n"))), "append")
    drive("dedup_last", StatefulOps.dedupKeepLast(events), "update")
    drive("topn", StatefulOps.topNPerKey(events, 3), "update")
    drive("count_win", StatefulOps.countTumbleWindow(events, 10), "append")
    drive("asof", StatefulOps.asOfJoin(events, "view", "purchase"), "append")
    spark.stop()
  }
}
