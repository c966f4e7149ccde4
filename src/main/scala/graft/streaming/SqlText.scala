package graft.streaming

import scala.util.matching.Regex
import scala.util.matching.Regex.Match

/** Literal-aware text utilities shared by the SQL dialect rewriters
  * (FlinkFunctions, GroupWindowSql, FlinkSqlJoins): a dialect
  * spelling INSIDE a string literal is data, not syntax — it must be
  * neither rewritten nor tripped over by a leftover valve. */
private[streaming] object SqlText {

  /** True iff index `i` falls inside a string literal (between an
    * opening quote and its closing quote; the SQL '' escape is two
    * adjacent toggles, which keeps interior positions "inside"). */
  def insideLiteral(sql: String, i: Int): Boolean = {
    var inQ = false; var p = 0
    while (p < i) {
      if (sql.charAt(p) == '\'') inQ = !inQ
      p += 1
    }
    inQ
  }

  /** Quote parity as one O(n) prefix pass: `parity(i)` = inside-ness
    * just before index i (the multi-match passes below would be
    * O(n·matches) re-scanning from 0 per match). */
  private def parityPrefix(sql: String): Array[Boolean] = {
    val out = new Array[Boolean](sql.length + 1)
    var inQ = false; var p = 0
    while (p < sql.length) {
      out(p) = inQ
      if (sql.charAt(p) == '\'') inQ = !inQ
      p += 1
    }
    out(sql.length) = inQ
    out
  }

  /** `replaceAllIn` that (a) skips matches starting inside string
    * literals and (b) inserts the callback's result VERBATIM — no
    * `$`-group expansion, so no quoteReplacement dance. */
  def replaceAll(re: Regex, sql: String)(f: Match => String): String = {
    val inside = parityPrefix(sql)
    val sb = new StringBuilder; var last = 0
    re.findAllMatchIn(sql).foreach { m =>
      if (m.start >= last && !inside(m.start)) {
        sb.append(sql.substring(last, m.start)).append(f(m))
        last = m.end
      }
    }
    sb.append(sql.substring(last)).toString
  }

  /** First match NOT inside a string literal (valve checks). */
  def firstOutside(re: Regex, sql: String): Option[Match] = {
    val inside = parityPrefix(sql)
    re.findAllMatchIn(sql).find(m => !inside(m.start))
  }
}
