package graft.streaming

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-stream replay harness: re-emit a batch Dataset as a
  * Structured Streaming file source whose micro-batch boundaries are
  * EXACTLY the given time chunks — the tool behind the
  * streaming-vs-oracle parity queries (q118, q129). Each chunk is
  * written as ONE parquet file (coalesce(1) is replay fidelity, not
  * an operator choice: several part files per chunk would split one
  * epoch across micro-batches in undefined file order), written
  * sequentially so the file source's oldest-modtime-first order
  * replays them as consecutive batches under maxFilesPerTrigger=1. */
object Replay {

  /** Write `ds` into `base/in` as one file per chunk condition;
    * returns (inputDir, schema). Rows matching no condition are
    * dropped — make the conditions a partition of the time range.
    * Schema-generic: any Dataset replays (events, documents, ...). */
  def fileEpochs(ds: Dataset[_], conds: Seq[Column], base: String)
      : (String, StructType) = {
    val in = s"$base/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    // chunks are independent single-task write jobs — run them
    // CONCURRENTLY (each job still writes one file; at a 10 M-row
    // replay the 4 serial writes were most of the prep wall time)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val jobs = conds.zipWithIndex.map { case (cond, i) => Future {
      // small row groups: a chunk is ONE file (the epoch contract),
      // and parquet assigns a row group to the byte-range split
      // holding its midpoint — one default-sized row group would make
      // every micro-batch read effectively serial no matter how many
      // splits the scan planner creates
      ds.filter(cond).coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (4 * 1024 * 1024).toString)
        .parquet(s"$base/stage_$i")
      val listing = java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/stage_$i"))
      val part =
        try listing
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst()
        finally listing.close() // Files.list holds a directory handle
      if (part.isPresent) { // an empty range writes no part file
        val dst = java.nio.file.Paths.get(in, f"chunk_$i%02d.parquet")
        java.nio.file.Files.move(part.get(), dst)
        // Epoch order must be the file source's oldest-modtime-first
        // order; sequential writes can TIE on coarse-modtime
        // filesystems, leaving replay order undefined. Pin an
        // explicitly increasing modtime per chunk index.
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1_000_000_000_000L + i * 60_000L))
      }
    } }
    jobs.foreach(Await.result(_, scala.concurrent.duration.Duration.Inf))
    (in, ds.sparkSession.read.parquet(in).schema)
  }

  /** Open the replay as a one-file-per-trigger stream. */
  def stream(spark: SparkSession, in: String, schema: StructType)
      : Dataset[Event] = {
    import spark.implicits._
    streamDf(spark, in, schema).as[Event]
  }

  /** Untyped replay stream for non-Event schemas. */
  def streamDf(spark: SparkSession, in: String, schema: StructType)
      : org.apache.spark.sql.DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
}
