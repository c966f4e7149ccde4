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

  /** True when a plan line carries a Window whose partition spec is
    * empty — the single-task global sort smell. Partitioned windows
    * render as `windowspecdefinition(part1#1, …, ord#2 ASC …, frame)`;
    * a GLOBAL window's FIRST argument is already the order spec, so
    * ASC/DESC appears before the first comma. */
  private[graft] def hasGlobalWindow(l: String): Boolean = {
    val i = l.indexOf("windowspecdefinition(")
    i >= 0 && {
      val firstArg = l.substring(i + "windowspecdefinition(".length)
        .takeWhile(_ != ',')
      firstArg.contains(" ASC") || firstArg.contains(" DESC")
    }
  }

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
      val globalWindow = lines.exists(PlanAudit.hasGlobalWindow)
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
