package graft.operators

import graft.Tables
import graft.streaming.{FlinkSqlJoins, GroupWindowSql}

/** SQL-text front-end catalog — queries a reference user would paste
  * VERBATIM in the Flink SQL dialect, executed through the dialect
  * rewriters ([[graft.streaming.GroupWindowSql]]; MATCH_RECOGNIZE has
  * its own front-end in [[graft.streaming.MatchRecognize]], bound by
  * q141/q198). Reference surface: group windows in
  * `flink-table-planner-blink/.../functions/sql/FlinkSqlOperatorTable
  * .java` (TUMBLE/HOP/SESSION + `_START`/`_END` auxiliaries), compiled
  * by `StreamExecGroupWindowAggregate.scala:33`.
  */
object SqlFrontendQueries {

  /** The literal Flink-SQL text: all three group-window assigners +
    * their START/END auxiliaries in one statement. Day tumble and
    * 6h-slide/1d-size hop per event type; 30-min-gap sessions per
    * user. Sums are exact integer cents (oracle-parity-rules). */
  private val flinkSql =
    """SELECT 'T' AS kind, event_type AS grp,
      |       TUMBLE_START(ts, INTERVAL '1' DAY) AS ws,
      |       TUMBLE_END(ts, INTERVAL '1' DAY) AS we,
      |       COUNT(*) AS n,
      |       SUM(CAST(ROUND(value*100) AS BIGINT)) AS cents
      |FROM events
      |GROUP BY event_type, TUMBLE(ts, INTERVAL '1' DAY)
      |UNION ALL
      |SELECT 'H' AS kind, event_type AS grp,
      |       HOP_START(ts, INTERVAL '6' HOUR, INTERVAL '1' DAY) AS ws,
      |       HOP_END(ts, INTERVAL '6' HOUR, INTERVAL '1' DAY) AS we,
      |       COUNT(*) AS n,
      |       SUM(CAST(ROUND(value*100) AS BIGINT)) AS cents
      |FROM events
      |GROUP BY event_type, HOP(ts, INTERVAL '6' HOUR, INTERVAL '1' DAY)
      |UNION ALL
      |SELECT 'S' AS kind, CAST(user_id AS VARCHAR) AS grp,
      |       SESSION_START(ts, INTERVAL '30' MINUTE) AS ws,
      |       SESSION_END(ts, INTERVAL '30' MINUTE) AS we,
      |       COUNT(*) AS n,
      |       SUM(CAST(ROUND(value*100) AS BIGINT)) AS cents
      |FROM events
      |GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)
      |ORDER BY kind, grp, ws""".stripMargin

  val queries: Map[String, Q] = Map(
    // The Flink-SQL text above, run verbatim through the dialect
    // rewriter. Binds: TUMBLE→window, HOP(slide,size)→window(size,
    // slide) — an argument-order mixup doubles/halves every hop
    // window; SESSION→session_window with the end = last-event + gap
    // convention; the _START/_END auxiliaries; the VARCHAR cast shim.
    // Plan-wise each branch is the same partial-agg + single shuffle
    // Catalyst builds for the DataFrame groupBy(window(…)) form.
    "q208_flinksql_groupwindow" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events")
      GroupWindowSql.run(s, flinkSql)
    }),

    // Temporal table join in the LITERAL Flink-SQL `FOR SYSTEM_TIME
    // AS OF` syntax, compiled onto the AsOfJoin Catalyst node: each
    // purchase joins the version of the per-user view stream current
    // at its timestamp (latest view with ts <= purchase ts, highest
    // event_id among ties; purchases with no prior view null-pad).
    // Same semantics q54/q59 bind via the DataFrame/exec surfaces —
    // here the USER-FACING TEXT is the thing under test.
    "q222_flinksql_temporal" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
        .createOrReplaceTempView("purchases")
      ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ts"))
        .createOrReplaceTempView("view_versions")
      FlinkSqlJoins.runTemporal(s,
        """SELECT o.user_id, o.event_id AS purchase_id,
          |       r.event_id AS last_view_id,
          |       unix_micros(o.ts) - unix_micros(r.ts) AS lag_us
          |FROM purchases o
          |JOIN view_versions FOR SYSTEM_TIME AS OF o.ts AS r
          |ON o.user_id = r.user_id
          |ORDER BY o.user_id, purchase_id""".stripMargin)
    }),

    // UDTF correlate in the literal `LATERAL TABLE(f(...)) AS t(cols)`
    // syntax (multi-column TableFunction → inline over the
    // array<struct> the UDTF returns) — q149's operator through the
    // reference's SQL text instead of the explode() idiom.
    "q223_flinksql_lateral" -> ((s, d) => {
      graft.functions.Udx.register(s)
      withTables(s, d, "documents")
      FlinkSqlJoins.run(s,
        """SELECT doc_id, t.idx AS idx, t.tok AS tok
          |FROM documents, LATERAL TABLE(tokenize(text)) AS t(idx, tok)
          |WHERE doc_id < 50 AND length(trim(text)) > 0
          |ORDER BY doc_id, idx""".stripMargin)
    }),

    // LEFT correlate: `LEFT JOIN LATERAL TABLE(...) ON TRUE` → OUTER
    // generate — a doc whose UDTF expansion is EMPTY must still emit
    // one null-padded row (the reference's left-correlate contract,
    // CommonCorrelate with outer join type).
    "q224_flinksql_lateral_outer" -> ((s, d) => {
      graft.functions.Udx.register(s)
      withTables(s, d, "documents")
      FlinkSqlJoins.run(s,
        """SELECT doc_id, t.tok AS tok
          |FROM documents LEFT JOIN LATERAL TABLE(long_tokens(text, 6)) AS t(tok) ON TRUE
          |WHERE doc_id < 50
          |ORDER BY doc_id, tok""".stripMargin)
    })
  )

  private val evCte =
    """WITH ev AS (SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
      |            user_id, event_type, value, props FROM events)""".stripMargin

  val oracle: Map[String, String] = Map(
    // Tumble = day-trunc; hop = the 4 slide-aligned windows covering
    // each event (slide 6h = 21_600_000_000 µs, size 1d); session =
    // per-user islands, NEW session when the gap to the previous event
    // is >= 30 min (Spark's session_window splits at exactly-gap:
    // a window [t, t+gap) does not contain t+gap), end = last + gap.
    "q208_flinksql_groupwindow" -> (evCte +
      """
        |SELECT * FROM (
        |SELECT 'T' AS kind, event_type AS grp,
        |       date_trunc('day', ts) AS ws,
        |       date_trunc('day', ts) + INTERVAL 1 DAY AS we,
        |       count(*) AS n,
        |       sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
        |FROM ev GROUP BY 2, 3, 4
        |UNION ALL
        |SELECT 'H' AS kind, event_type AS grp, ws,
        |       ws + INTERVAL 1 DAY AS we, count(*) AS n,
        |       sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
        |FROM (
        |  SELECT event_type, value,
        |    make_timestamp((epoch_us(ts) // 21600000000) * 21600000000
        |                   - k.g * 21600000000) AS ws
        |  FROM ev, generate_series(0, 3) k(g))
        |GROUP BY 1, 2, 3, 4
        |UNION ALL
        |SELECT 'S' AS kind, CAST(user_id AS VARCHAR) AS grp,
        |       min(ts) AS ws, max(ts) + INTERVAL 30 MINUTE AS we,
        |       count(*) AS n,
        |       sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
        |FROM (
        |  SELECT user_id, ts, value,
        |    sum(CASE WHEN prev_ts IS NULL
        |              OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM (SELECT user_id, ts, event_id, value,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |            AS prev_ts
        |        FROM ev))
        |GROUP BY 1, 2, sess_id
        |) ORDER BY kind, grp, ws""".stripMargin),
    "q222_flinksql_temporal" -> (evCte +
      """
        |SELECT user_id, purchase_id, last_view_id, lag_us FROM (
        |  SELECT p.user_id, p.event_id AS purchase_id,
        |         v.event_id AS last_view_id,
        |         epoch_us(p.ts) - epoch_us(v.ts) AS lag_us,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM ev WHERE event_type = 'view') v
        |    ON v.user_id = p.user_id AND v.ts <= p.ts)
        |WHERE rn = 1
        |ORDER BY user_id, purchase_id""".stripMargin),
    "q223_flinksql_lateral" ->
      """SELECT doc_id, s.idx AS idx, s.tok AS tok FROM (
        |  SELECT doc_id,
        |    unnest(list_transform(string_split(rtrim(text, ' '), ' '),
        |      (t, i) -> struct_pack(idx := i - 1, tok := t))) AS s
        |  FROM documents WHERE doc_id < 50 AND length(trim(text)) > 0)
        |ORDER BY doc_id, s.idx""".stripMargin,
    "q224_flinksql_lateral_outer" ->
      """SELECT d.doc_id, t.tok AS tok
        |FROM documents d LEFT JOIN LATERAL (
        |  SELECT unnest(list_filter(string_split(d.text, ' '),
        |                            x -> len(x) > 6)) AS tok) t ON TRUE
        |WHERE d.doc_id < 50
        |ORDER BY doc_id, tok""".stripMargin
  )
}
