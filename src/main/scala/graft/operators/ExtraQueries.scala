package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Oracle-checked queries for round-2 operators: sorted-group
  * semantics (SortedGroups) and the whole-operator as-of join
  * (graft.plans.AsOfJoin via SparkSessionExtensions) — the custom
  * physical operator verified against the SAME DuckDB SQL as the
  * union+window form.
  */
object ExtraQueries {

  val queries: Map[String, Q] = Map(
    // groupBy(key).sortGroup(order).first(3) over orders, as one
    // shuffle + partition-local sort + single pass (SortedGroups).
    "q39_sorted_groups" -> ((s, d) => {
      SortedGroups.firstNPerKeySorted(
          Tables.orders(s, d).select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
          "o_custkey", "o_orderkey", 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // As-of join through the custom Catalyst operator (AsOfJoinExec).
    // Deterministic because (user_id, ts) is unique among views in
    // this dataset; the exec orders its inputs by (key, ts) only.
    "q59_asof_exec" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"),
          col("event_id").as("last_view_id"), col("ts").as("v_ts"))
      graft.plans.AsOfJoin(p, v, p("user_id"), v("v_user"), p("p_ts"), v("v_ts"))
        .select(col("user_id"), col("purchase_id"), col("last_view_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
        .orderBy(col("user_id"), col("purchase_id"))
    })
  )

  private val evCte =
    """WITH ev AS (SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
      |            user_id, event_type, value, props FROM events)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q39_sorted_groups" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q59_asof_exec" -> (evCte +
      """
        |SELECT user_id, purchase_id, last_view_id, lag_us FROM (
        |  SELECT p.user_id, p.event_id AS purchase_id,
        |    v.event_id AS last_view_id,
        |    epoch_us(p.ts) - epoch_us(v.ts) AS lag_us,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM (SELECT * FROM ev WHERE event_type='purchase') p
        |  LEFT JOIN (SELECT * FROM ev WHERE event_type='view') v
        |    ON p.user_id = v.user_id AND v.ts <= p.ts)
        |WHERE rn = 1 ORDER BY user_id, purchase_id""".stripMargin)
  )
}
