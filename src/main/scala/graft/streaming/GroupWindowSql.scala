package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text group-window front-end — the reference's Flink-SQL
  * `GROUP BY TUMBLE/HOP/SESSION(timeattr, INTERVAL …)` surface
  * (parser symbols `flink-table-planner-blink/.../functions/sql/
  * FlinkSqlOperatorTable.java` TUMBLE/HOP/SESSION + the `_START`/
  * `_END`/`_ROWTIME` auxiliary group, compiled by
  * `StreamExecGroupWindowAggregate.scala:33` over the assigners in
  * `window/assigners/`). A reference user pastes their SQL text
  * verbatim; [[rewrite]] translates the dialect onto Spark's native
  * window functions and [[run]] executes it:
  *
  *  - `TUMBLE(ts, INTERVAL 'n' U)`        → `window(ts, 'n u')`
  *  - `HOP(ts, INTERVAL 's' U, INTERVAL 'z' V)` (slide, size)
  *                                        → `window(ts, 'z v', 's u')`
  *  - `SESSION(ts, INTERVAL 'g' U)`       → `session_window(ts, 'g u')`
  *  - `TUMBLE_START/_END`, `HOP_START/_END` → `window.start` / `window.end`
  *  - `SESSION_START/_END` → `session_window.start` / `session_window.end`
  *  - `TUMBLE_ROWTIME/HOP_ROWTIME/SESSION_ROWTIME` → `end - INTERVAL
  *    1 MILLISECOND` (the reference's rowtime attribute of a window
  *    is its inclusive max timestamp, `end - 1ms`)
  *  - `CAST(x AS VARCHAR)` → `CAST(x AS STRING)` (dialect shim)
  *
  * Everything stays one declarative Spark SQL statement — Catalyst
  * plans the same partial-agg + shuffle it would for the DataFrame
  * `groupBy(window(…))` form, so the rewrite costs nothing at 100 TB.
  *
  * Loud rejections (fail at rewrite, not with a cryptic analysis
  * error): `_PROCTIME` auxiliaries (no processing-time attribute in
  * the batch/oracle surface), interval units outside
  * MILLISECOND…DAY (YEAR/MONTH windows are not fixed-width), and any
  * TUMBLE/HOP/SESSION token the rewriter did not consume.
  */
object GroupWindowSql {

  private val Units = Set("MILLISECOND", "SECOND", "MINUTE", "HOUR", "DAY")

  private def dur(n: String, unit: String): String = {
    val u = unit.toUpperCase
    if (!Units(u)) fail(s"unsupported interval unit $unit (fixed-width units only)")
    s"$n ${u.toLowerCase}${if (n == "1") "" else "s"}"
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"GroupWindowSql: $msg")

  private val Iv = """INTERVAL\s+'(\d+)'\s+([A-Za-z]+)"""
  // auxiliary accessors: TUMBLE_START(ts, iv) / HOP_END(ts, iv, iv) / …
  private val AuxRe =
    s"""(?i)\\b(TUMBLE|HOP|SESSION)_(START|END|ROWTIME|PROCTIME)\\s*\\(\\s*[A-Za-z_]\\w*\\s*,\\s*$Iv(?:\\s*,\\s*$Iv)?\\s*\\)""".r
  private val TumbleRe = s"""(?i)\\bTUMBLE\\s*\\(\\s*([A-Za-z_]\\w*)\\s*,\\s*$Iv\\s*\\)""".r
  private val HopRe    = s"""(?i)\\bHOP\\s*\\(\\s*([A-Za-z_]\\w*)\\s*,\\s*$Iv\\s*,\\s*$Iv\\s*\\)""".r
  private val SessRe   = s"""(?i)\\bSESSION\\s*\\(\\s*([A-Za-z_]\\w*)\\s*,\\s*$Iv\\s*\\)""".r
  // `session_window(`/`window(` are our own rewrites — don't re-flag
  private val LeftoverRe = """(?i)\b(TUMBLE|HOP|SESSION)(_(?!window\b)\w+)?\s*\(""".r

  /** Translate the Flink-SQL group-window dialect to Spark SQL.
    * All matching is literal-aware (SqlText): TUMBLE/HOP/SESSION text
    * inside a string literal is data. */
  def rewrite(sql: String): String = {
    import scala.util.matching.Regex.Match
    // 1. auxiliary accessors (before the bare assigners: same prefix)
    val aux = SqlText.replaceAll(AuxRe, sql) { (m: Match) =>
      val win = if (m.group(1).equalsIgnoreCase("SESSION")) "session_window" else "window"
      m.group(2).toUpperCase match {
        case "START"   => s"$win.start"
        case "END"     => s"$win.end"
        case "ROWTIME" => s"($win.end - INTERVAL 1 MILLISECOND)"
        case "PROCTIME" => fail("_PROCTIME auxiliaries are processing-time only")
      }
    }
    // 2. assigners in GROUP BY
    val t = SqlText.replaceAll(TumbleRe, aux)(
      (m: Match) => s"window(${m.group(1)}, '${dur(m.group(2), m.group(3))}')")
    val h = SqlText.replaceAll(HopRe, t)((m: Match) =>
      // Flink HOP(ts, slide, size) → Spark window(ts, size, slide)
      s"window(${m.group(1)}, '${dur(m.group(4), m.group(5))}', '${dur(m.group(2), m.group(3))}')")
    val se = SqlText.replaceAll(SessRe, h)(
      (m: Match) => s"session_window(${m.group(1)}, '${dur(m.group(2), m.group(3))}')")
    SqlText.firstOutside(LeftoverRe, se).foreach(m =>
      fail(s"unsupported group-window form left after rewrite: ${m.matched}"))
    // 3. dialect shim: VARCHAR casts
    SqlText.replaceAll("""(?i)\bAS\s+VARCHAR\b""".r, se)(_ => "AS STRING")
  }

  /** Rewrite + execute against the session's temp views. */
  def run(spark: SparkSession, sql: String): DataFrame = spark.sql(rewrite(sql))
}
