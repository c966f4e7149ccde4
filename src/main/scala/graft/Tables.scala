package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All scans go through `spark.read.parquet`, so Catalyst's vectorized
  * reader, predicate pushdown and column pruning apply — at 100 TB the
  * same code reads a partitioned table directory unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Work-heavy tables get an adaptive post-scan repartition: the
    * testdata files are single-row-group parquet, so the scan yields
    * ONE task and everything fused into the scan stage (shingling,
    * md5, dot products, Expand+partial-agg, shuffle write) runs
    * single-threaded — measured 20×+ slowdowns at sf0.1. Small dims
    * (region…part) are NOT repartitioned: a shuffle there buys nothing
    * and would precede broadcast exchanges. Parallelism is estimated
    * from the file count (cheap listing, no RDD materialization — an
    * RDD conversion per load would run eagerly on every query and
    * defeat lazy planning). At real scale every big table is
    * multi-file, so this is a no-op — no blind shuffle. */
  private val workHeavyTables =
    Set("documents", "embeddings", "lineitem", "orders", "events")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val target = spark.sparkContext.defaultParallelism
    if (workHeavyTables(name) && df.inputFiles.length < target / 2)
      df.repartition(target)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` in two physical encodings across
    * driver testdata generations: parquet TIMESTAMP(NANOS) (read as a
    * long via spark.sql.legacy.parquet.nanosAsLong, set once in
    * GraftSession.builder as a legacy-data fallback) and plain
    * timestamp[us]. Dispatch on the scanned dtype so both yield the
    * same µs-precision TIMESTAMP column: longs get the ns→µs
    * truncation the DuckDB oracle applies via
    * make_timestamp(epoch_ns(ts)//1000); native timestamps are cast
    * as-is (session timezone is UTC, values identical). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = load(s, d, "events")
    val ts = df.schema("ts").dataType match {
      case LongType => expr("timestamp_micros(ts div 1000)")
      case TimestampType | TimestampNTZType => col("ts").cast(TimestampType)
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other")
    }
    // value normalizes to DOUBLE: if a future regeneration ships
    // float32, Spark would otherwise do FLOAT arithmetic where the
    // DuckDB oracle promotes to double — same drift class as the ts
    // encoding flip that wrecked round 5. No-op on today's data.
    df.withColumn("ts", ts)
      .withColumn("value", col("value").cast("double"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
