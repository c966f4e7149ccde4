package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Sorted-group / sortPartition semantics (DataSet.java:700,1401):
  * results must reflect the within-partition order, and the plan must
  * be shuffle+local-sort — no window function materialization. */
class SortedGroupsSpec extends SparkSpec {

  private def events = {
    val spark2 = spark; import spark2.implicits._
    Seq(
      (1L, 30L, "c"), (1L, 10L, "a"), (1L, 20L, "b"),
      (2L, 2L, "x"), (2L, 1L, "w"),
      (3L, 5L, "only")
    ).toDF("user_id", "seq", "tag")
  }

  test("firstNPerKeySorted takes the n smallest by order column per key") {
    val got = SortedGroups.firstNPerKeySorted(events, "user_id", "seq", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 20L), (2L, 1L), (2L, 2L), (3L, 5L)))
  }

  test("sortedGroupConcat folds each group in sort order") {
    val got = SortedGroups.sortedGroupConcat(events, "user_id", "seq", "tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "a,b,c", 2L -> "w,x", 3L -> "only"))
  }

  test("plan is exchange + partition-local sort, no window operator") {
    val plan = SortedGroups.firstNPerKeySorted(events, "user_id", "seq", 2)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Exchange") && plan.contains("Sort"),
      s"expected shuffle + sort:\n$plan")
    assert(!plan.contains("Window"), s"window materialization crept in:\n$plan")
    // the sort must be partition-local (sortWithinPartitions), not global
    assert(!plan.contains("rangepartitioning"),
      s"global sort (range partitioning) crept in:\n$plan")
  }
}
