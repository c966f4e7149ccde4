package graft.operators

import graft.Tables
import graft.streaming.GroupWindowSql

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
        |) ORDER BY kind, grp, ws""".stripMargin)
  )
}
