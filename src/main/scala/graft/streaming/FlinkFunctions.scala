package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.annotation.tailrec

/** SQL-text scalar-function front-end — the Flink-SQL built-in
  * spellings Spark's parser/registry rejects, translated onto native
  * Spark functions so a reference user's SQL text runs VERBATIM.
  * Reference surface: `flink-table-planner-blink/.../functions/sql/
  * FlinkSqlOperatorTable.java` (SPLIT_INDEX, FROM_BASE64, TO_BASE64,
  * IS_ALPHA, IS_DECIMAL, IS_DIGIT, SHA224…SHA512, CONVERT_TZ,
  * RAND_INTEGER, TRUNCATE, FLOOR/CEIL with a time unit, SIMILAR TO)
  * with runtime semantics in `flink-table-runtime-blink/.../functions/
  * SqlFunctionUtils.java` and `SqlDateTimeUtils.java`:
  *
  *  - `FLOOR(ts TO unit)`  → `date_trunc('unit', ts)`
  *  - `CEIL(ts TO unit)`   → trunc, +1 unit unless already aligned
  *  - `x SIMILAR TO 'pat'` → `regexp_like(x, '^(?:regex)$')` with the
  *    SQL-spec translation (`%`→`.*`, `_`→`.`; `| * + ? { } ( ) [ ]`
  *    keep their regex meaning; everything else is literal)
  *  - `TRUNCATE(x[, d])`   → round-toward-zero via FLOOR/CEIL on the
  *    shifted value (SqlFunctionUtils.struncate: RoundingMode.DOWN)
  *  - `FROM_BASE64(s)`     → `CAST(unbase64(s) AS STRING)` (returns
  *    STRING in the reference, not BINARY)
  *  - `TO_BASE64(s)`       → `base64(CAST(s AS BINARY))`
  *  - `SPLIT_INDEX(s, sep, i)` → `try_element_at(split(s, quoted), i+1)`
  *    guarded for `i < 0 → NULL` (splitIndex: whole-separator split,
  *    all tokens preserved, out-of-range and negative index → NULL)
  *  - `IS_ALPHA(s)` / `IS_DIGIT(s)` → non-null, non-empty, all
  *    Unicode letters / decimal digits (StringUtils.isAlpha/isNumeric
  *    check Character.isLetter/isDigit per char; null and "" → false)
  *  - `IS_DECIMAL(s)` → non-null and matches the standard decimal
  *    forms `[+-]?(d+[.d*]|.d+)([eE][+-]?d+)?[fFdD]?` (the reference
  *    accepts anything Double.parseDouble does; the exotic remainder —
  *    hex floats, Infinity/NaN — is intentionally out)
  *  - `SHA224/SHA256/SHA384/SHA512(s)` → `sha2(s, N)`
  *  - `CONVERT_TZ(s, tzFrom, tzTo)` → re-zone + format back to the
  *    reference's fixed `yyyy-MM-dd HH:mm:ss` STRING
  *  - `RAND_INTEGER([seed,] n)` → `CAST(FLOOR(rand([seed]) * n) AS INT)`
  *    (nondeterministic — invariant-tested, never oracle-hashed)
  *  - `STR_TO_MAP(s)` → `str_to_map(s, ',', '=')` (the reference's
  *    1-arg default is `,`/`=`; Spark's is `,`/`:` — silent wrong
  *    maps without the shim; explicit-delimiter forms pass through)
  *
  * Everything rewrites to plain Spark SQL text, so the result stays
  * one declarative statement inside whole-stage codegen — the dialect
  * costs nothing at 100 TB.
  *
  * Loud rejections (fail at rewrite, not with a cryptic analysis
  * error): non-literal SIMILAR TO patterns and `ESCAPE` clauses,
  * non-literal SPLIT_INDEX separators, negative/non-literal TRUNCATE
  * digits, unsupported FLOOR/CEIL time units, and any dialect token
  * left standing after the rewrite pass.
  */
object FlinkFunctions {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"FlinkFunctions: $msg")

  // ---- generic balanced-paren call scanner -------------------------

  /** A dialect spelling inside a string literal is data, not a call —
    * it must be neither rewritten nor rejected (shared SqlText rule). */
  private def insideLiteral(sql: String, i: Int): Boolean =
    SqlText.insideLiteral(sql, i)

  /** First `NAME ( … )` call at or after `from` that is NOT inside a
    * string literal; top-level args split on commas outside
    * parens/quotes. */
  private def findCall(sql: String, name: String, from: Int)
      : Option[(Int, Int, List[String])] = {
    val re = ("""(?i)\b""" + name + """\s*\(""").r
    re.findAllMatchIn(sql.substring(from))
      .find(m => !insideLiteral(sql, from + m.start))
      .map { m =>
      val open = from + m.end // index just past '('
      var depth = 1; var i = open; var argStart = open; var inQ = false
      val args = scala.collection.mutable.ListBuffer[String]()
      while (depth > 0) {
        if (i >= sql.length) fail(s"unbalanced parentheses in $name(…)")
        val c = sql.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) args += sql.substring(argStart, i).trim
          case ',' if depth == 1 =>
            args += sql.substring(argStart, i).trim; argStart = i + 1
          case _ =>
        }
        i += 1
      }
      (from + m.start, i, args.toList)
    }
  }

  /** Rewrite every `name(…)` call for which `f` yields a replacement;
    * `None` leaves that occurrence untouched (e.g. plain FLOOR). */
  private def rewriteCalls(sql: String, name: String)
                          (f: List[String] => Option[String]): String = {
    @tailrec def go(s: String, from: Int): String =
      findCall(s, name, from) match {
        case None => s
        case Some((a, b, args)) => f(args) match {
          case Some(rep) => go(s.substring(0, a) + rep + s.substring(b), a)
          case None      => go(s, b)
        }
      }
    go(sql, 0)
  }

  // ---- SQL literal helpers -----------------------------------------

  /** Spark SQL string literal. Quotes are escaped by DOUBLING (the
    * SQL-standard form Spark also accepts), NOT by backslash: a
    * backslash-escaped quote would flip [[SqlText.insideLiteral]]'s
    * quote parity and blind every LATER rewrite pass (and the
    * leftover valve) to the rest of the statement. Backslashes
    * still double for Spark's backslash-escaping lexer. */
  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  /** Unwrap a SQL string literal ('' self-escape); None if not one. */
  private def asLiteral(arg: String): Option[String] = {
    val t = arg.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'') {
      val body = t.substring(1, t.length - 1)
      // a lone interior quote would mean this wasn't one literal
      if ("(?<!')'(?!')".r.findFirstIn(body).isDefined) None
      else Some(body.replace("''", "'"))
    } else None
  }

  // ---- FLOOR / CEIL ( expr TO unit ) -------------------------------

  private val TruncUnits =
    Set("YEAR", "QUARTER", "MONTH", "WEEK", "DAY", "HOUR", "MINUTE", "SECOND")

  /** `+1 unit` interval for the CEIL step (week/quarter normalized —
    * Spark intervals have no WEEK/QUARTER units). */
  private def oneInterval(unit: String): String = unit match {
    case "WEEK"    => "INTERVAL '7' DAY"
    case "QUARTER" => "INTERVAL '3' MONTH"
    case u         => s"INTERVAL '1' $u"
  }

  private val ToUnitRe = """(?is)^(.*\S)\s+TO\s+([A-Za-z]+)$""".r

  private def floorCeil(args: List[String], ceil: Boolean): Option[String] =
    args match {
      case one :: Nil => ToUnitRe.findFirstMatchIn(one).map { m =>
        val expr = m.group(1); val unit = m.group(2).toUpperCase
        if (!TruncUnits(unit))
          fail(s"unsupported ${if (ceil) "CEIL" else "FLOOR"} unit $unit " +
            s"(supported: ${TruncUnits.toSeq.sorted.mkString(", ")})")
        val trunc = s"date_trunc(${sqlLit(unit)}, ($expr))"
        if (!ceil) trunc
        else s"(CASE WHEN $trunc = ($expr) THEN $trunc " +
          s"ELSE $trunc + ${oneInterval(unit)} END)"
      }
      case _ => None // plain numeric FLOOR/CEIL — leave to Spark
    }

  // ---- SIMILAR TO --------------------------------------------------

  /** SQL-spec SIMILAR TO pattern → Java regex: `%`→`.*`, `_`→`.`,
    * regex-ish metacharacters pass through, the rest is literal. */
  private[streaming] def similarToRegex(pat: String): String = {
    val sb = new StringBuilder
    pat.foreach {
      case '%' => sb.append(".*")
      case '_' => sb.append('.')
      case c if "|*+?{}()[]".indexOf(c) >= 0 => sb.append(c)
      case c if "\\.^$".indexOf(c) >= 0      => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.toString
  }

  // operand SIMILAR TO 'literal' — operand: qualified identifier or
  // parenthesized group (kept simple on purpose; the leftover valve
  // catches anything fancier with a readable message)
  private val SimilarRe =
    """(?is)([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?|\([^()]*\)|'(?:[^']|'')*')\s+(NOT\s+)?SIMILAR\s+TO\s+'((?:[^']|'')*)'""".r
  private val EscapeClauseRe =
    """(?is)SIMILAR\s+TO\s+'(?:[^']|'')*'\s+ESCAPE\b""".r

  private def rewriteSimilar(sql: String): String = {
    if (EscapeClauseRe.findAllMatchIn(sql)
          .exists(m => !insideLiteral(sql, m.start)))
      fail("SIMILAR TO … ESCAPE is not supported; inline the escapes")
    // manual rebuild so matches INSIDE string literals stay data
    val sb = new StringBuilder; var last = 0
    SimilarRe.findAllMatchIn(sql).foreach { m =>
      if (m.start >= last && !insideLiteral(sql, m.start)) {
        val operand = m.group(1)
        val neg = m.group(2) != null
        val rx = "^(?:" + similarToRegex(m.group(3).replace("''", "'")) + ")$"
        val call = s"regexp_like($operand, ${sqlLit(rx)})"
        sb.append(sql.substring(last, m.start))
          .append(if (neg) s"(NOT $call)" else call)
        last = m.end
      }
    }
    sb.append(sql.substring(last)).toString
  }

  // ---- the rewrite pass --------------------------------------------

  private val sha2Bits = Map("SHA224" -> 224, "SHA256" -> 256,
    "SHA384" -> 384, "SHA512" -> 512)

  /** Translate the Flink-SQL scalar-function dialect to Spark SQL;
    * identity on text that uses none of it. */
  def rewrite(sql: String): String = {
    var s = sql
    s = rewriteCalls(s, "FLOOR")(floorCeil(_, ceil = false))
    s = rewriteCalls(s, "CEILING")(floorCeil(_, ceil = true))
    s = rewriteCalls(s, "CEIL")(floorCeil(_, ceil = true))
    s = rewriteSimilar(s)
    s = rewriteCalls(s, "TRUNCATE") {
      case x :: Nil => Some(truncate(x, "0"))
      case x :: d :: Nil => Some(truncate(x, d))
      case as => fail(s"TRUNCATE takes 1 or 2 arguments, got ${as.length}")
    }
    s = rewriteCalls(s, "FROM_BASE64") {
      case x :: Nil => Some(s"CAST(unbase64($x) AS STRING)")
      case as => fail(s"FROM_BASE64 takes 1 argument, got ${as.length}")
    }
    s = rewriteCalls(s, "TO_BASE64") {
      case x :: Nil => Some(s"base64(CAST(($x) AS BINARY))")
      case as => fail(s"TO_BASE64 takes 1 argument, got ${as.length}")
    }
    s = rewriteCalls(s, "SPLIT_INDEX") {
      case str :: sep :: idx :: Nil =>
        val sepLit = asLiteral(sep).getOrElse(fail(
          "SPLIT_INDEX separator must be a string literal (the reference " +
            "splits on the verbatim separator; a runtime expression would " +
            "be interpreted as a regex here)"))
        val quoted = sqlLit(sepLit.flatMap(c =>
          if ("\\.^$|?*+()[]{}".indexOf(c) >= 0) "\\" + c else c.toString))
        Some(s"(CASE WHEN ($idx) < 0 THEN NULL ELSE " +
          s"try_element_at(split(($str), $quoted, -1), ($idx) + 1) END)")
      case as => fail(s"SPLIT_INDEX takes 3 arguments, got ${as.length}")
    }
    s = rewriteCalls(s, "IS_ALPHA") {
      case x :: Nil =>
        Some(s"(($x) IS NOT NULL AND regexp_like(($x), ${sqlLit("^\\p{L}+$")}))")
      case as => fail(s"IS_ALPHA takes 1 argument, got ${as.length}")
    }
    s = rewriteCalls(s, "IS_DIGIT") {
      case x :: Nil =>
        Some(s"(($x) IS NOT NULL AND regexp_like(($x), ${sqlLit("^\\p{Nd}+$")}))")
      case as => fail(s"IS_DIGIT takes 1 argument, got ${as.length}")
    }
    s = rewriteCalls(s, "IS_DECIMAL") {
      case x :: Nil => Some(s"(($x) IS NOT NULL AND regexp_like(($x), " +
        sqlLit("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?[fFdD]?$") + "))")
      case as => fail(s"IS_DECIMAL takes 1 argument, got ${as.length}")
    }
    for ((name, bits) <- sha2Bits)
      s = rewriteCalls(s, name) {
        case x :: Nil => Some(s"sha2($x, $bits)")
        case as => fail(s"$name takes 1 argument, got ${as.length}")
      }
    s = rewriteCalls(s, "CONVERT_TZ") {
      case ts :: from :: to :: Nil => Some(
        s"date_format(from_utc_timestamp(to_utc_timestamp(($ts), $from), $to), " +
          sqlLit("yyyy-MM-dd HH:mm:ss") + ")")
      case as => fail(s"CONVERT_TZ takes 3 arguments, got ${as.length}")
    }
    // Flink's 1-arg STR_TO_MAP defaults to ',' pairs and '=' key-value
    // (SqlFunctionUtils.strToMap); Spark's default is ',' and ':' — a
    // verbatim 1-arg call would silently yield all-null values. The
    // explicit-delimiter forms agree (both split on regexes) and pass
    // through untouched.
    s = rewriteCalls(s, "STR_TO_MAP") {
      case x :: Nil => Some(s"str_to_map(($x), ',', '=')")
      case _ => None
    }
    s = rewriteCalls(s, "RAND_INTEGER") {
      case n :: Nil => Some(s"CAST(FLOOR(rand() * ($n)) AS INT)")
      case seed :: n :: Nil => Some(s"CAST(FLOOR(rand($seed) * ($n)) AS INT)")
      case as => fail(s"RAND_INTEGER takes 1 or 2 arguments, got ${as.length}")
    }
    // leftover valve: any dialect token still standing is a form this
    // rewriter does not understand — fail loudly instead of handing
    // Spark an unparseable statement
    val leftover = ("""(?i)\b(SPLIT_INDEX|FROM_BASE64|TO_BASE64|IS_ALPHA|""" +
      """IS_DIGIT|IS_DECIMAL|SHA224|SHA256|SHA384|SHA512|CONVERT_TZ|""" +
      """RAND_INTEGER|TRUNCATE)\s*\(|(?i)\bSIMILAR\s+TO\b""").r
    leftover.findAllMatchIn(s)
      .find(m => !insideLiteral(s, m.start))
      .foreach(m =>
        fail(s"unsupported dialect form left after rewrite: ${m.matched.trim}"))
    s
  }

  /** Round-toward-zero to `d` digits (reference struncate:
    * movePointRight(d) → RoundingMode.DOWN → movePointLeft(d)). The
    * shift factor is an integer literal so DECIMAL inputs stay exact. */
  private def truncate(x: String, d: String): String = {
    val digits = d.trim.toIntOption.getOrElse(
      fail(s"TRUNCATE digits must be an integer literal, got '$d'"))
    if (digits < 0) fail("TRUNCATE with negative digits is not supported")
    val p = BigInt(10).pow(digits).toString
    s"((CASE WHEN ($x) < 0 THEN CEIL(($x) * $p) ELSE FLOOR(($x) * $p) END) / $p)"
  }

  /** Rewrite + execute against the session's temp views. */
  def run(spark: SparkSession, sql: String): DataFrame = spark.sql(rewrite(sql))
}
