package graft

import org.apache.spark.sql.execution.ExplainMode

/** Scale-audit tool: print the plan-shape markers that decide whether
  * a query survives a data-scale decade — run at two SF dirs and diff.
  *
  *   tools/run.sh graft.PlanAudit <sfDir> <name> [<name> …]
  *
  * Markers per query: cartesian products (never), broadcast joins,
  * single-partition windows (empty partitionBy — the global-sort
  * smell), ntile, exchange count, scan count. The SCALING.md soak
  * tables cite this output.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus, "graft-planaudit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val lines = plan.linesIterator.toSeq
      def count(m: String) = lines.count(_.contains(m))
      // a Window whose partition spec is empty sorts ALL data in one
      // task — the detail line renders as "[...] windowspecdefinition()"
      // with no partition columns before the order spec
      val globalWindow = lines.exists(l =>
        l.contains("Arguments:") && l.contains("windowspecdefinition(") &&
          l.contains("specifiedwindowframe") &&
          !l.matches(""".*windowspecdefinition\([^,)]+,.*"""))
      println(Seq(
        s"query=$n",
        s"cartesian=${count("CartesianProduct")}",
        s"bnlj=${count("BroadcastNestedLoopJoin")}",
        s"bhj=${count("BroadcastHashJoin")}",
        s"smj=${count("SortMergeJoin")}",
        s"exchanges=${lines.count(l => l.matches("""^\(\d+\) Exchange\s*"""))}",
        s"scans=${lines.count(l => l.matches("""^\(\d+\) Scan parquet\s*"""))}",
        s"ntile=${count("ntile")}",
        s"globalWindow=$globalWindow").mkString(" "))
    }
    spark.stop()
  }
}
