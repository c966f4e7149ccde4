package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The PlanAudit global-window detector against REAL plan renderings —
  * a detector that can never fire would silently bless the
  * single-partition global sorts the tool exists to catch. */
class PlanAuditSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      .linesIterator.toSeq

  test("detector fires on an empty-partition window and not on a keyed one") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.0), (2L, "b", 1.0)).toDF("k", "g", "v")
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"))))
    assert(planOf(global).exists(PlanAudit.hasGlobalWindow),
      "global window not detected")
    val keyed = df.withColumn("rn",
      row_number().over(Window.partitionBy(col("g")).orderBy(col("v"))))
    assert(!planOf(keyed).exists(PlanAudit.hasGlobalWindow),
      "keyed window misflagged")
  }
}
