package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions-registered as-of join: custom logical
  * node → injected strategy → merge exec, checked for results (against
  * a hand-computed oracle AND the union+window formulation) and for
  * plan shape (the custom exec with exchanges+sorts supplied by
  * EnsureRequirements). */
class AsOfJoinExtensionSpec extends SparkSpec {

  private def dfs = {
    val spark2 = spark; import spark2.implicits._
    val purchases = Seq( // (user, p_id, p_ts_sec)
      (1L, 101L, 100L), (1L, 102L, 200L), (2L, 201L, 50L), (3L, 301L, 10L))
      .toDF("p_user", "p_id", "p_sec")
      .withColumn("p_ts", timestamp_seconds(col("p_sec")))
    val views = Seq( // (user, v_id, v_ts_sec)
      (1L, 11L, 90L), (1L, 12L, 150L), (1L, 13L, 250L), (2L, 21L, 50L))
      .toDF("v_user", "v_id", "v_sec")
      .withColumn("v_ts", timestamp_seconds(col("v_sec")))
    (purchases, views)
  }

  test("as-of merge exec joins each left to the latest right at-or-before") {
    val (p, v) = dfs
    val out = AsOfJoin(p, v, p("p_user"), v("v_user"), p("p_ts"), v("v_ts"))
      .select(col("p_id"), col("v_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(out == Set(
      (101L, Some(11L)), // 90 ≤ 100 < 150
      (102L, Some(12L)), // 150 ≤ 200 < 250
      (201L, Some(21L)), // tie: 50 ≤ 50 (as-of includes ties)
      (301L, None)))     // user 3 has no views
  }

  test("rightTie totalizes equal-timestamp right rows (highest wins)") {
    val spark2 = spark; import spark2.implicits._
    val p = Seq((1L, 101L, 100L)).toDF("p_user", "p_id", "p_sec")
      .withColumn("p_ts", timestamp_seconds(col("p_sec")))
    val v = Seq((1L, 11L, 90L), (1L, 14L, 90L), (1L, 12L, 90L))
      .toDF("v_user", "v_id", "v_sec")
      .withColumn("v_ts", timestamp_seconds(col("v_sec")))
    val out = AsOfJoin(p, v, p("p_user"), v("v_user"), p("p_ts"), v("v_ts"),
        rightTie = Some(v("v_id")))
      .select(col("p_id"), col("v_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((101L, 14L))) // the highest view id at the tie
  }

  test("physical plan uses the custom exec with co-partitioned sorted children") {
    val (p, v) = dfs
    val out = AsOfJoin(p, v, p("p_user"), v("v_user"), p("p_ts"), v("v_ts"))
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(plan.contains("Exchange") && plan.contains("hashpartitioning"),
      s"no co-partitioning:\n$plan")
    assert(plan.contains("Sort"), s"no per-partition sort:\n$plan")
  }

  test("matches the union+window formulation on real events") {
    val spark2 = spark; import spark2.implicits._
    val e = graft.Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"), col("ts").as("v_ts"))
    val viaExec = AsOfJoin(p, v, p("p_user"), v("v_user"), p("p_ts"), v("v_ts"))
      .select(col("p_id"), col("v_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // union+window form (q54 shape, ties prefer the LATEST view by id)
    val viaWindow = graft.operators.EventQueries
      .queries("q54_asof_join")(spark, sf)
      .select(col("purchase_id"), coalesce(col("last_view_id"), lit(-1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaExec == viaWindow)
  }
}
