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

  /** CPU-heavy tables get an adaptive post-scan repartition: the
    * testdata files are single-row-group parquet, so the scan yields
    * ONE task and the per-row pipelines over these tables (shingling,
    * md5 hashing, 64-dim dot products) would run single-threaded —
    * measured 20×+ slowdowns at sf0.1. Relational tables (lineitem,
    * orders, …) are NOT repartitioned: their queries are scan+agg
    * bound, where an extra full shuffle costs more than the scan
    * parallelism buys. When the scan already has ≥ half the cluster's
    * parallelism (any real multi-file table at scale), this is a
    * no-op — no blind shuffle. */
  private val cpuHeavyTables = Set("documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val target = spark.sparkContext.defaultParallelism
    if (cpuHeavyTables(name) && df.rdd.getNumPartitions < target / 2)
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
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which the
    * Spark reader rejects outright. Read nanos as long
    * (spark.sql.legacy.parquet.nanosAsLong) and truncate to
    * microseconds — the same ns→µs truncation the DuckDB oracle applies
    * via make_timestamp(epoch_ns(ts)//1000). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
