package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** SQL-text front-ends for the reference's two join dialects that
  * Spark SQL does not parse — the third and fourth text surfaces next
  * to MATCH_RECOGNIZE and the group windows, so a reference user can
  * paste these statements verbatim:
  *
  *  1. Temporal table join — `JOIN V FOR SYSTEM_TIME AS OF l.ts AS r
  *     ON l.k = r.k` (reference: the planner's temporal-join rewrite
  *     in flink-table-planner-blink `plan/nodes/physical/stream/
  *     StreamExecTemporalJoin.scala` + `plan/utils/TemporalJoinUtil
  *     .scala`). [[runTemporal]] parses the clause and compiles it
  *     onto the engine's AsOfJoin Catalyst node (plans/AsOfJoin.scala)
  *     — the co-partitioned merge with O(1) state per key, one
  *     shuffle per side at any scale.
  *
  *  2. UDTF correlate — `[LEFT JOIN|,] LATERAL TABLE(f(args)) AS
  *     t(c1, …) [ON TRUE]` (reference: `plan/nodes/common/
  *     CommonCorrelate.scala`, Calcite LogicalCorrelate). A pure text
  *     rewrite onto Spark's native `LATERAL VIEW [OUTER]
  *     explode/inline` — single-column UDTFs (array<T>) explode,
  *     multi-column ones (array<struct>) inline; `LEFT JOIN … ON
  *     TRUE` becomes OUTER (null-padded empty expansions), exactly
  *     the reference's left correlate semantics. Stays one
  *     declarative statement: Catalyst plans the same Generate node
  *     the DataFrame form would.
  *
  * Conventions (loud rejections otherwise):
  *  - the versioned (right) table exposes its event-time attribute
  *    under the SAME column name as the `AS OF` attribute (in Flink
  *    the DDL's WATERMARK column plays this role);
  *  - among equal-timestamp versions the highest `event_id` wins if
  *    that column exists (the reference keeps the latest version);
  *  - `LEFT JOIN LATERAL TABLE` requires `ON TRUE` (as in Flink).
  */
object FlinkSqlJoins {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"FlinkSqlJoins: $msg")

  // ---- temporal table join -------------------------------------------

  private val TemporalRe = (
    "(?is)^\\s*SELECT\\s+(.*?)\\s+FROM\\s+(\\w+)\\s+(?:AS\\s+)?(\\w+)\\s+" +
      "JOIN\\s+(\\w+)\\s+FOR\\s+SYSTEM_TIME\\s+AS\\s+OF\\s+(\\w+)\\.(\\w+)\\s+(?:AS\\s+)?(\\w+)\\s+" +
      "ON\\s+(\\w+)\\.(\\w+)\\s*=\\s*(\\w+)\\.(\\w+)" +
      "(?:\\s+WHERE\\s+(.*?))?(?:\\s+ORDER\\s+BY\\s+(.*?))?\\s*;?\\s*$").r

  /** Parse a Flink temporal-join statement and execute it through the
    * AsOfJoin plan. Tables resolve as session views; alias-qualified
    * references in SELECT/WHERE/ORDER BY are supported. */
  def runTemporal(spark: SparkSession, sql: String): DataFrame = sql match {
    case TemporalRe(proj, lTable, lAlias, rTable, ofAlias, ofCol, rAlias,
        aA, aCol, aB, bCol, whereOpt, orderOpt) =>
      if (!ofAlias.equalsIgnoreCase(lAlias))
        fail(s"AS OF attribute must come from the left input " +
          s"($ofAlias.$ofCol does not reference $lAlias)")
      val (lKey, rKey) =
        if (aA.equalsIgnoreCase(lAlias) && aB.equalsIgnoreCase(rAlias)) (aCol, bCol)
        else if (aA.equalsIgnoreCase(rAlias) && aB.equalsIgnoreCase(lAlias)) (bCol, aCol)
        else fail(s"ON must equate one $lAlias column with one $rAlias column")
      val lRaw = spark.table(lTable)
      val rRaw = spark.table(rTable)
      if (!rRaw.columns.contains(ofCol))
        fail(s"versioned table $rTable has no event-time column '$ofCol' " +
          "(convention: same name as the AS OF attribute)")
      // prefix both sides so the joined output is collision-free, then
      // rewrite alias.col -> alias_col in the textual clauses
      def prefixed(df: DataFrame, a: String) =
        df.select(df.columns.map(c => col(c).as(s"${a}_$c")).toIndexedSeq: _*)
      val l = prefixed(lRaw, lAlias)
      val r = prefixed(rRaw, rAlias)
      // resolved attributes (df("c")), not bare col("c"): the custom
      // plan node receives expressions as-is and cannot late-resolve
      val tie =
        if (rRaw.columns.contains("event_id")) Some(r(s"${rAlias}_event_id"))
        else None
      val joined = graft.plans.AsOfJoin(l, r,
        l(s"${lAlias}_$lKey"), r(s"${rAlias}_$rKey"),
        l(s"${lAlias}_$ofCol"), r(s"${rAlias}_$ofCol"), tie)
      val view = s"__temporal_join_${System.identityHashCode(joined).toHexString}"
      joined.createOrReplaceTempView(view)
      val qual = s"(?i)\\b($lAlias|$rAlias)\\.(\\w+)".r
      def dealias(s0: String): String =
        qual.replaceAllIn(s0, m => s"${m.group(1)}_${m.group(2)}")
      // a bare `a.col` projection item carries the implicit SQL output
      // name `col` — preserve it through the prefix rewrite
      val bare = s"(?i)^\\s*($lAlias|$rAlias)\\.(\\w+)\\s*$$".r
      val projItems = splitTopLevel(proj).map {
        case bare(a, c) => s"${a}_$c AS $c"
        case item => dealias(item)
      }
      val sb = new StringBuilder(s"SELECT ${projItems.mkString(", ")} FROM $view")
      Option(whereOpt).foreach(w => sb.append(s" WHERE ${dealias(w)}"))
      Option(orderOpt).foreach(o => sb.append(s" ORDER BY ${dealias(o)}"))
      spark.sql(sb.toString)
    case _ =>
      fail("statement does not match the supported temporal-join form " +
        "SELECT … FROM L a JOIN R FOR SYSTEM_TIME AS OF a.ts AS b " +
        "ON a.k = b.k [WHERE …] [ORDER BY …]")
  }

  /** Split a projection list on commas outside parentheses. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    out += cur.toString
    out.result()
  }

  // ---- LATERAL TABLE correlate ---------------------------------------

  private val LateralRe = (
    "(?i)(,|\\bLEFT\\s+(?:OUTER\\s+)?JOIN|\\bCROSS\\s+JOIN|\\bINNER\\s+JOIN|\\bJOIN)" +
      "\\s+LATERAL\\s+TABLE\\s*\\(\\s*" +
      "(\\w+)\\s*\\(([^()]*(?:\\([^()]*\\)[^()]*)*)\\)\\s*\\)\\s*(?:AS\\s+)?" +
      "(\\w+)\\s*\\(\\s*([\\w\\s,]+?)\\s*\\)(\\s+ON\\s+TRUE)?").r
  private val BadJoinRe =
    "(?i)\\b(FULL|RIGHT)(\\s+OUTER)?\\s+JOIN\\s+LATERAL\\s+TABLE\\b".r

  /** Rewrite every `LATERAL TABLE(f(args)) AS t(cols)` correlate to
    * Spark's `LATERAL VIEW [OUTER] explode/inline`. */
  def rewriteLateral(sql: String): String = {
    import scala.util.matching.Regex.Match
    SqlText.firstOutside(BadJoinRe, sql).foreach(j =>
      fail(s"unsupported correlate join type: ${j.matched.trim} " +
        "(the reference supports inner and LEFT ... ON TRUE correlates)"))
    val out = SqlText.replaceAll(LateralRe, sql) { (m: Match) =>
      val joiner = m.group(1).trim.toUpperCase.replaceAll("\\s+", " ")
      val (fn, args, alias) = (m.group(2), m.group(3), m.group(4))
      val cols = m.group(5).split(",").map(_.trim).filter(_.nonEmpty)
      val onTrue = m.group(6) != null
      val outer = joiner.startsWith("LEFT")
      if (outer && !onTrue) fail("LEFT JOIN LATERAL TABLE requires ON TRUE")
      if (!outer && onTrue && joiner != "JOIN" && joiner != "INNER JOIN")
        fail(s"ON TRUE only applies to JOIN/LEFT JOIN correlates, not '$joiner'")
      val gen = if (cols.length == 1) "explode" else "inline"
      // comma correlates consume the separator, so restore its space;
      // word joiners already leave the preceding space in place
      val lead = if (joiner == ",") " " else ""
      s"${lead}LATERAL VIEW ${if (outer) "OUTER " else ""}$gen($fn($args)) " +
        s"$alias AS ${cols.mkString(", ")}"
    }
    SqlText.firstOutside("""(?i)\bLATERAL\s+TABLE\b""".r, out).foreach(_ =>
      fail(s"unsupported LATERAL TABLE form left after rewrite"))
    out
  }

  /** Rewrite + execute against the session's temp views. */
  def run(spark: SparkSession, sql: String): DataFrame =
    spark.sql(rewriteLateral(sql))
}
