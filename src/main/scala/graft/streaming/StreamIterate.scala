package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming feedback loop — the reference's `DataStream.iterate`
  * surface (previously a declared non-goal, now a first-class
  * recipe).
  *
  * Reference: `flink-streaming-java/src/main/java/org/apache/flink/
  * streaming/api/datastream/IterativeStream.java:39` — part of an
  * operator's output is fed back to become input again; the loop
  * carries records until a closing condition routes them out.
  *
  * Structured Streaming has no in-graph feedback edge (its DAG is
  * acyclic per micro-batch), so the loop goes through storage: the
  * query reads `inputDir ∪ feedbackDir` as one file stream; each
  * micro-batch applies `step` once and routes rows matching
  * `isFeedback` back into `feedbackDir` as new files — they re-enter
  * the SAME query in a later micro-batch — while the rest exit to
  * `outDir`. This is the durable version of Flink's in-memory feedback
  * channel: records in flight around the loop survive a crash because
  * the feedback edge IS the storage.
  *
  * Scale: the feedback write is an ordinary partitioned parquet
  * append — the loop's width is the cluster's write throughput, with
  * no single feedback buffer to overflow (Flink's iterate has a
  * bounded feedback queue that can deadlock under backpressure; a
  * storage-backed edge trades latency for that liveness).
  * Micro-batch latency per hop makes this a THROUGHPUT tool
  * (iterative refinement, retry-with-budget loops), not a
  * low-latency one — same caveat the reference docs put on iterate.
  */
object StreamIterate {

  /** Start the feedback-loop query. `step` transforms each
    * micro-batch (must preserve `schema`); rows where `isFeedback`
    * evaluates true re-enter the loop via `feedbackDir`, others are
    * appended to `outDir` as parquet.
    *
    * The per-batch fan-out (one input, two routed writes) is
    * foreachBatch with the batch persisted across the two actions —
    * the same side-output pattern as WindowedAggs.tagLate. */
  def loop(spark: SparkSession, schema: StructType,
           inputDir: String, feedbackDir: String, outDir: String,
           checkpointDir: String)
          (step: DataFrame => DataFrame, isFeedback: Column)
      : StreamingQuery = {
    val in = spark.readStream.schema(schema).parquet(inputDir)
    val fb = spark.readStream.schema(schema).parquet(feedbackDir)
    in.union(fb).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val stepped = step(batch).persist()
        try {
          // Empty writes are GUARDED, not just wasteful: a 0-row
          // append still creates files, the file source would see them
          // as fresh input, and the loop would self-trigger forever on
          // empty batches.
          val back = stepped.filter(isFeedback)
          if (!back.isEmpty) back.write.mode("append").parquet(feedbackDir)
          val exit = stepped.filter(!isFeedback)
          if (!exit.isEmpty) exit.write.mode("append").parquet(outDir)
        } finally { stepped.unpersist(); () }
      }
      .start()
  }
}
