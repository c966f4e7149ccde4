package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the configuration this engine assumes.
  *
  * Design notes (scale-first): AQE is on so skewed shuffles re-plan at
  * runtime on a real cluster; shuffle partitions default to the local
  * core count (the driver overrides per environment); session timezone
  * is pinned to UTC so results are reproducible against the DuckDB
  * oracle and across clusters.
  */
object GraftSession {
  def builder(cores: Int = Runtime.getRuntime.availableProcessors(),
              appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      // whole-operator extension showcase: AsOfJoinPlan strategy
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      // Legacy-data fallback: older driver testdata generations stored
      // events.ts as TIMESTAMP(NANOS), which the Spark reader rejects;
      // reading nanos as long keeps those files loadable (Tables.events
      // dispatches on the scanned dtype). Current testdata ships
      // timestamp[us], which this flag does not affect.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
