package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}
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
  * Exactly-once around the loop: foreachBatch is at-least-once — a
  * crash after a routed write but before the checkpoint commit re-runs
  * the batch. Each batch therefore writes to a batchId-deterministic
  * subdirectory with mode OVERWRITE: the re-run replaces its own
  * earlier partial output instead of appending a duplicate, and the
  * replaced files cannot have been consumed yet (the source plans
  * batch N+1 only after batch N commits). Readers of `feedbackDir` /
  * `outDir` must set `recursiveFileLookup=true` (the loop's own
  * feedback reader does).
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
    * evaluates true re-enter the loop via `feedbackDir`, others —
    * including rows where the predicate is NULL — exit to `outDir`
    * as parquet (NULL is routed explicitly: a three-valued-logic
    * NULL must not vanish between the two filters).
    *
    * The per-batch fan-out (one input, two routed writes) is
    * foreachBatch with the batch persisted across the actions —
    * the same side-output pattern as WindowedAggs.tagLate. */
  def loop(spark: SparkSession, schema: StructType,
           inputDir: String, feedbackDir: String, outDir: String,
           checkpointDir: String)
          (step: DataFrame => DataFrame, isFeedback: Column)
      : StreamingQuery = {
    def src(dir: String) = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(dir)
    src(inputDir).union(src(feedbackDir)).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // NULL predicate → exit side (not silently dropped).
        val routed = step(batch)
          .withColumn("__fb", coalesce(isFeedback, lit(false))).persist()
        try {
          // One aggregate action yields both side counts; empty writes
          // are GUARDED, not just wasteful: a 0-row write still creates
          // files, the file source would see them as fresh input, and
          // the loop would self-trigger forever on empty batches.
          val counts = routed.groupBy(col("__fb")).count().collect()
            .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
          def emit(fb: Boolean, dir: String): Unit =
            if (counts.getOrElse(fb, 0L) > 0L)
              routed.filter(col("__fb") === fb).drop("__fb")
                .write.mode("overwrite").parquet(s"$dir/batch_$batchId")
          emit(fb = true, feedbackDir)
          emit(fb = false, outDir)
        } finally { routed.unpersist(); () }
      }
      .start()
  }
}
