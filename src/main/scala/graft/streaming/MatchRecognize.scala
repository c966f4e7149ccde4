package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

/** SQL-text MATCH_RECOGNIZE front-end — parses the clause grammar the
  * reference compiles (`flink-table/flink-table-planner-blink/.../
  * StreamExecMatch.scala:69`, parser symbols in
  * `FlinkSqlOperatorTable.java:944+`) onto the existing pattern stack:
  * [[CepDsl.compile]] for the PATTERN/WITHIN/DEFINE surface and
  * [[CepDsl.compileMeasures]] for MEASURES, executed by the [[Cep]]
  * NFA. A user can paste
  *
  * {{{
  *   MATCH_RECOGNIZE (
  *     PARTITION BY user_id
  *     ORDER BY ts
  *     MEASURES first(A.event_id) AS first_view, count(A) AS n_views
  *     AFTER MATCH SKIP PAST LAST ROW
  *     PATTERN (A+? B) WITHIN INTERVAL '1' HOUR
  *     DEFINE A AS A.event_type = 'view', B AS B.event_type = 'purchase'
  *   )
  * }}}
  *
  * instead of hand-translating to the string DSL.
  *
  * Supported subset (errors are loud on anything outside it):
  *  - PARTITION BY: one column; `user_id` routes to the bounded-memory
  *    sort-based batch matcher ([[Cep.matchBatchSorted]]).
  *  - ORDER BY: must be `ts` (the NFA's event-time order; `, event_id`
  *    tiebreak optional — it is always applied).
  *  - MEASURES: `first|last|count|sum|avg(VAR[.field]) AS alias`, the
  *    [[CepDsl.compileMeasures]] grammar (= the SQL surface).
  *  - AFTER MATCH SKIP: PAST LAST ROW / TO NEXT ROW / TO FIRST V /
  *    TO LAST V. ABSENT → the library's no-skip (every match emitted,
  *    the reference CEP's `AfterMatchSkipStrategy.noSkip()`); note
  *    SQL's own default is SKIP PAST LAST ROW — write it explicitly
  *    for that behavior.
  *  - PATTERN: whitespace-separated variables with quantifiers
  *    `? ?? * *? + +? {n} {m,n} {n,} (each {…} optionally followed by
  *    ?)` — zero minimums allowed (`{0,n}`, `{0,}` ≡ `*`, riding the
  *    same optional drift path); alternation `(B|C)` / bare `B|C` of
  *    PLAIN variables, with
  *    an optional quantifier on the parenthesized form (`(B|C)+`,
  *    `(B|C)*`) — events bind under the first alternative whose
  *    DEFINE holds (leftmost preference; reference group patterns,
  *    `cep/pattern/GroupPattern.java`); un-quantified `( … )`
  *    concatenation groups are flattened. `*` is the reference's
  *    `oneOrMore().optional()` composition; like every loop here, a
  *    PATTERN-final `*`/`+` completes at the earliest point rather
  *    than accumulating, so put loops before a closing variable
  *    (`A B* C`). PERMUTE, quantified multi-variable groups, nested
  *    groups, quantified alternatives (`B|C+`) and `{- -}` exclusions
  *    are rejected loudly — as the reference rejects them (Flink
  *    MATCH_RECOGNIZE supports neither PERMUTE nor exclusions).
  *  - WITHIN INTERVAL 'n' SECOND|MINUTE|HOUR|DAY.
  *  - DEFINE: per-variable boolean expressions — comparisons
  *    (= <> != < <= > >=) between field references and literals,
  *    combined with AND/OR/NOT and parentheses. `V.field` where V is
  *    the defined variable (or a bare `field`) reads the CURRENT row;
  *    `W.field` for an earlier variable W reads the LAST row bound to
  *    W (SQL's implicit LAST(W.field)) — absent binding → false.
  *    Variables in PATTERN without a DEFINE match any row (SQL
  *    semantics). No arithmetic (compose in a view first).
  *
  * Contiguity model ([[Contiguity]]): SQL:2016 matches a CONTIGUOUS
  * run of partition rows, while the CEP Pattern API's default is
  * skip-till-next-match (relaxed). [[Relaxed]] (default) maps pattern
  * adjacency to `followedBy` and `+` to the relaxed loop — the same
  * semantics as the library DSL and the q110 oracle; [[Strict]] maps
  * adjacency to `next` and loops to `consecutive`, the SQL-faithful
  * row-contiguous reading. Loop greediness is SQL-faithful in both
  * modes: `+` is greedy (longest run only), `+?` reluctant (every
  * stop point a match) — the reference NFA's reluctant branches.
  */
object MatchRecognize {

  sealed trait Contiguity
  /** Skip-till-next-match — the CEP Pattern API / library DSL model. */
  case object Relaxed extends Contiguity
  /** SQL:2016 row-contiguous — strict `next` adjacency, consecutive
    * loops. */
  case object Strict extends Contiguity

  /** Parse result: everything [[run]] needs, with the pattern already
    * compiled through [[CepDsl.compile]]. */
  case class Parsed(
      partitionBy: String,
      measuresSrc: String,
      skip: Cep.AfterMatchSkip,
      pattern: Cep.Pattern[Event])

  // ---- clause splitter ----------------------------------------------

  private val ClauseRe = (
    """(?is)^\s*PARTITION\s+BY\s+([A-Za-z_]\w*)""" +
    """\s+ORDER\s+BY\s+(ts(?:\s*,\s*event_id)?)(?:\s+ASC)?""" +
    """\s+MEASURES\s+(.+?)""" +
    """\s+(?:ONE\s+ROW\s+PER\s+MATCH\s+)?""" +
    """(?:AFTER\s+MATCH\s+SKIP\s+(PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW|TO\s+FIRST\s+\w+|TO\s+LAST\s+\w+)\s+)?""" +
    """PATTERN\s*\(((?:[^()]|\((?:[^()]|\([^()]*\))*\))*)\)""" +
    """(?:\s+WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+))?""" +
    """\s+DEFINE\s+(.+?)\s*$""").r

  private val PatTokRe = """([A-Za-z_]\w*)([*+?]\??|\{\d+(?:,\d*)?\}\??)?""".r

  def parse(sql: String, contiguity: Contiguity = Relaxed): Parsed = {
    // strip the optional MATCH_RECOGNIZE ( … ) wrapper
    val trimmed = sql.trim
    val body = {
      val m = """(?is)^MATCH_RECOGNIZE\s*\((.*)\)\s*$""".r.findFirstMatchIn(trimmed)
      m.map(_.group(1)).getOrElse(trimmed)
    }
    // PERMUTE's inner parens would defeat the clause splitter — reject
    // it by name before the generic parse error
    if ("""(?is)PATTERN\s*\(\s*PERMUTE""".r.findFirstIn(body).isDefined)
      fail("PERMUTE is not supported")
    body match {
      case ClauseRe(part, _, meas, skipOrNull, patSrc, winNOrNull, winUnitOrNull, defSrc) =>
        val skip = Option(skipOrNull)
          .map(_.trim.replaceAll("\\s+", " ").toUpperCase) match {
          case None                  => Cep.NoSkip
          case Some("PAST LAST ROW") => Cep.SkipPastLastEvent
          case Some("TO NEXT ROW")   => Cep.SkipToNext
          case Some(s) if s.startsWith("TO FIRST ") =>
            Cep.SkipToFirst(s.substring("TO FIRST ".length))
          case Some(s) if s.startsWith("TO LAST ") =>
            Cep.SkipToLast(s.substring("TO LAST ".length))
          case Some(s) => fail(s"unsupported AFTER MATCH SKIP: $s")
        }
        val withinDsl = Option(winNOrNull).map { n =>
          val unit = winUnitOrNull.toUpperCase match {
            case "SECOND" | "SECONDS" => "s"
            case "MINUTE" | "MINUTES" => "m"
            case "HOUR" | "HOURS"     => "h"
            case "DAY" | "DAYS"       => "d"
            case u => fail(s"unsupported WITHIN unit: $u")
          }
          s" within $n$unit"
        }.getOrElse("")
        val (dslPat, greedyVars, loopVars) = translatePattern(patSrc, contiguity)
        val defines = parseDefines(defSrc)
        val vars = PatTokRe.findAllMatchIn(patSrc).map(_.group(1)).toSet
        defines.keys.find(!vars(_)).foreach(v =>
          fail(s"DEFINE for '$v' but '$v' is not in PATTERN"))
        val preds = vars.map(v => v -> defines.getOrElse(v,
          (_: Event, _: Map[String, Vector[Event]]) => true)).toMap
        val pat0 = CepDsl.compile[Event](dslPat + withinDsl, preds)
        // post-pass: greediness is per-variable SQL syntax, which the
        // DSL string cannot carry — set it directly on the steps
        // (only where the loop can vary, Pattern.greedy's contract);
        // Strict mode additionally makes every loop consecutive.
        val steps = pat0.steps.map { st =>
          val canVary = st.oneOrMore || st.timesMax > st.times
          val g = if (greedyVars(st.name) && canVary) st.copy(greedy = true) else st
          if (contiguity == Strict && loopVars(g.name) &&
              (g.oneOrMore || g.times > 1 || g.timesMax > g.times))
            g.copy(loopConsecutive = true)
          else g
        }
        Parsed(part, meas.trim, skip, pat0.copy(steps = steps))
      case _ => fail("cannot parse MATCH_RECOGNIZE clauses (expected " +
        "PARTITION BY … ORDER BY ts … MEASURES … [AFTER MATCH SKIP …] " +
        "PATTERN (…) [WITHIN INTERVAL 'n' unit] DEFINE …)")
    }
  }

  /** Execute the parsed clause over an Event dataset (batch; the
    * streaming form is [[Cep.matchStream]] on the same pattern). */
  def run(events: Dataset[Event], sql: String,
          contiguity: Contiguity = Relaxed): DataFrame = {
    val p = parse(sql, contiguity)
    require(p.partitionBy == "user_id",
      s"PARTITION BY ${p.partitionBy}: the Event surface partitions by user_id")
    val measures = CepDsl.compileMeasures[Event](p.measuresSrc, Event.fieldTable)
    Cep.selectMeasures(
      Cep.matchBatchSorted(events, p.pattern, p.skip), p.partitionBy, measures)
  }

  // ---- PATTERN translation ------------------------------------------

  /** One parsed PATTERN element: a variable (possibly an alternation
    * `B|C`, names.size > 1) with its quantifier text; `isGroup` marks
    * a quantified CONCATENATION group `(A B){2}` whose `names` are the
    * body variables in order (reference `GroupPattern.java:30`). */
  private case class PatElem(names: Vector[String], quant: String,
                             isGroup: Boolean = false) {
    def dslName: String = names.mkString("|")
  }

  /** Tokenize the PATTERN source into elements, resolving groups:
    *  - `( V1 | V2 … )` (plain vars only) + optional group quantifier
    *    → one alternation element (reference group patterns,
    *    `cep/pattern/GroupPattern.java`); bare `B|C` is the same but
    *    cannot take a quantifier (SQL binds `B|C+` as `B|(C+)` —
    *    quantified ALTERNATIVES need a sub-NFA; rejected loudly).
    *  - `( seq )` with no quantifier → spliced into the sequence.
    *  - `( seq )` of 2+ plain vars WITH a quantifier → a quantified
    *    CONCATENATION group (sub-NFA loop, `GroupPattern.java:30`) —
    *    supported for the forms whose semantics the NFA carries
    *    faithfully: exact `{n}`, optional `?`/`??`, and the
    *    RELUCTANT `+?` / `*?` / `{m,n}?` / `{n,}?` (the engine's
    *    group loops are reluctant; SQL's default-greedy `(…)+` /
    *    `(…)*` / `(…){m,n}` reject loudly — as the reference does:
    *    greedy group patterns throw in `Pattern.greedy`). Nested
    *    groups are rejected.
    */
  private def tokenizePattern(src: String): List[PatElem] = {
    val s = src.trim
    require(s.nonEmpty, "empty PATTERN")
    if (s.contains("{-")) fail("{- -} exclusions are not supported " +
      "(the reference rejects them too: Flink MATCH_RECOGNIZE supports " +
      "only ONE ROW PER MATCH, where SQL:2016 gives exclusions no effect)")
    val QuantRe = """\G\s*([*+?]\??|\{\d+(?:,\d*)?\}\??)""".r
    val VarRe = """\G\s*([A-Za-z_]\w*)""".r
    val out = List.newBuilder[PatElem]
    var i = 0
    def quantAt(from: Int): (String, Int) =
      QuantRe.findPrefixMatchOf(s.subSequence(from, s.length)) match {
        case Some(m) => (m.group(1), from + m.end)
        case None => ("", from)
      }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') {
        val close = s.indexOf(')', i + 1)
        if (close < 0) fail(s"unbalanced '(' in PATTERN: '$src'")
        val inner = s.substring(i + 1, close)
        if (inner.contains("(")) fail("nested pattern groups are not supported")
        val (quant, after) = quantAt(close + 1)
        if (inner.contains("|")) {
          val names = inner.split("\\|").toVector.map(_.trim)
          names.foreach { n =>
            if (!n.matches("""[A-Za-z_]\w*""")) fail(
              s"alternation alternatives must be plain variables, got '$n' " +
                "(a quantified alternative needs a sub-NFA)")
          }
          out += PatElem(names, quant)
        } else {
          val seq = inner.trim.split("\\s+").toList.filter(_.nonEmpty)
          if (seq.isEmpty) fail("empty pattern group")
          if (quant.nonEmpty && seq.size > 1) {
            seq.foreach { t =>
              if (!t.matches("""[A-Za-z_]\w*""")) fail(
                s"only plain variables are supported inside a quantified " +
                  s"group, got '$t' in '($inner)$quant'")
            }
            out += PatElem(seq.toVector, quant, isGroup = true)
          }
          else if (quant.nonEmpty) out += parseBare(seq.head + quant)
          else seq.foreach(t => out += parseBare(t))
        }
        i = after
      } else {
        val m = VarRe.findPrefixMatchOf(s.subSequence(i, s.length))
          .getOrElse(fail(s"bad pattern syntax at '${s.substring(i)}'"))
        var names = Vector(m.group(1))
        var j = i + m.end
        var quant = ""
        // bare alternation: VAR ('|' VAR)* — no quantifiers anywhere
        var more = true
        while (more) {
          val k = { var x = j; while (x < s.length && s.charAt(x).isWhitespace) x += 1; x }
          if (k < s.length && s.charAt(k) == '|') {
            val m2 = VarRe.findPrefixMatchOf(s.subSequence(k + 1, s.length))
              .getOrElse(fail(s"expected variable after '|' in '${s.substring(i)}'"))
            names :+= m2.group(1)
            j = k + 1 + m2.end
          } else more = false
        }
        val (q, after) = quantAt(j)
        quant = q
        if (names.size > 1 && quant.nonEmpty) fail(
          s"quantifier '$quant' directly after alternation '${names.mkString("|")}' " +
            "is ambiguous (SQL binds it to the last alternative, which needs a " +
            "sub-NFA) — write (" + names.mkString("|") + s")$quant for a " +
            "group quantifier")
        if (names.size > 1) out += PatElem(names, "")
        else out += PatElem(names, quant)
        i = after
      }
    }
    val elems = out.result()
    require(elems.nonEmpty, "empty PATTERN")
    if (elems.exists(_.names.exists(_.toUpperCase == "PERMUTE")))
      fail("PERMUTE is not supported")
    elems
  }

  private def parseBare(tok: String): PatElem = tok match {
    case PatTokRe(n, qOrNull) if tok == n + Option(qOrNull).getOrElse("") =>
      PatElem(Vector(n), Option(qOrNull).getOrElse(""))
    case _ => fail(s"bad pattern token: '$tok'")
  }

  /** SQL pattern tokens → (DSL string, greedy vars, loop vars).
    * SQL loop quantifiers are greedy unless suffixed `?`. */
  private def translatePattern(src: String, contiguity: Contiguity)
      : (String, Set[String], Set[String]) = {
    val elems = tokenizePattern(src)
    var greedy = Set.empty[String]
    var loops = Set.empty[String]
    val dslToks = elems.zipWithIndex.map { case (el, idx) =>
      if (el.isGroup) {
        // quantified concat group: iteration-to-iteration adjacency in
        // the engine's group loop is RELAXED, so only Relaxed mode and
        // the greediness-faithful quantifier forms are admitted
        if (contiguity == Strict) fail(
          "quantified concat groups need relaxed contiguity " +
            "(strict iteration adjacency is not supported)")
        val gq = el.quant match {
          // optional group (GroupPattern.optional()): greediness is
          // immaterial here — the engine emits both the entered and
          // the skipped match, so ? and ?? coincide
          case "?" | "??" => "?"
          case q if q.matches("""\{\d+\}""") => q // exact: greediness moot
          case "+?" => "+"
          case "*?" => "*"
          case q if q.matches("""\{\d+,\d*\}\?""") => q.init // reluctant range
          case q if q == "+" || q == "*" || q.matches("""\{\d+,\d*\}""") => fail(
            s"greedy group loop '(…)$q' is not supported (the reference " +
              s"rejects greedy group patterns too — Pattern.greedy " +
              s"checkIfNoGroupPattern); write the reluctant '(…)$q?'")
          case q => fail(s"bad quantifier '$q' on a pattern group")
        }
        "(" + el.names.mkString(" ") + ")" + gq
      } else {
      val (name, quant) = (el.dslName, el.quant)
      val dslQuant = quant match {
        case ""            => ""
        case "?" | "??"    => "?"
        case "+"           => greedy += name; loops += name; "+"
        case "+?"          => loops += name; "+"
        case "*"           => greedy += name; loops += name; "*"
        case "*?"          => loops += name; "*"
        case q if q.startsWith("{") =>
          val reluctant = q.endsWith("}?") || !q.contains(",")
          if (!reluctant) greedy += name
          loops += name
          if (q.endsWith("?")) q.init else q
        case q => fail(s"bad quantifier '$q' on '$name'")
      }
      val flag =
        if (idx == 0 || contiguity == Relaxed) "" else ">"
      flag + name + dslQuant
      }
    }
    (dslToks.mkString(" "), greedy, loops)
  }

  // ---- DEFINE expression parser -------------------------------------

  private type Pred = (Event, Map[String, Vector[Event]]) => Boolean

  private def parseDefines(src: String): Map[String, Pred] =
    src.split("""(?i),(?=\s*[A-Za-z_]\w*\s+AS\s)""").map { clause =>
      """(?is)^\s*([A-Za-z_]\w*)\s+AS\s+(.+?)\s*$""".r.findFirstMatchIn(clause) match {
        case Some(m) => m.group(1) -> compileExpr(m.group(2), m.group(1))
        case None => fail(s"bad DEFINE clause: '${clause.trim}'")
      }
    }.toMap

  private val ExprTokRe =
    """<=|>=|<>|!=|=|<|>|\(|\)|(?i:AND)\b|(?i:OR)\b|(?i:NOT)\b|'[^']*'|\d+(?:\.\d+)?|[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?""".r

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"MATCH_RECOGNIZE: $msg")

  /** Compile one DEFINE expression for variable `defVar` into an
    * iterative condition — current-row refs read the candidate event,
    * other-variable refs read that variable's last binding. */
  private[streaming] def compileExpr(src: String, defVar: String): Pred = {
    val toks = ExprTokRe.findAllIn(src).toVector
    val nonWs = src.replaceAll("\\s+", "")
    if (toks.mkString("").replaceAll("\\s+", "") != nonWs)
      fail(s"cannot tokenize DEFINE expression: '$src'")
    var i = 0
    def peek: Option[String] = if (i < toks.length) Some(toks(i)) else None
    def eat(): String = { val t = toks(i); i += 1; t }
    def kw(t: String, w: String) = t.equalsIgnoreCase(w)

    // operand → (event, bindings) => Option[Any]; None = unresolvable
    // (absent cross-variable binding) which makes any comparison false
    def operand(): (Event, Map[String, Vector[Event]]) => Option[Any] = {
      val t = eat()
      if (t.startsWith("'")) { val s = t.substring(1, t.length - 1); (_, _) => Some(s) }
      else if (t.head.isDigit) { val d = t.toDouble; (_, _) => Some(d) }
      else {
        val (varName, field) = t.split("\\.") match {
          case Array(v, f) => (Some(v), f)
          case Array(f)    => (None, f)
          case _           => fail(s"bad reference '$t'")
        }
        val proj = Event.fieldTable.getOrElse(field,
          fail(s"unknown field '$field' in DEFINE"))._2
        varName.filter(_ != defVar) match {
          case None    => (e, _) => Some(proj(e))
          case Some(v) => (_, b) => b.get(v).flatMap(_.lastOption).map(proj)
        }
      }
    }

    def cmpVals(op: String, l: Any, r: Any): Boolean = {
      def num(a: Any): Option[Double] = a match {
        case d: Double => Some(d)
        case l2: Long => Some(l2.toDouble)
        case n: Int => Some(n.toDouble)
        case t: java.sql.Timestamp => Some(Event.micros(t).toDouble)
        case _ => None
      }
      val c: Option[Int] = (num(l), num(r)) match {
        case (Some(a), Some(b)) => Some(java.lang.Double.compare(a, b))
        case _ => (l, r) match {
          case (a: String, b: String) => Some(a.compareTo(b))
          case _ => None
        }
      }
      c match {
        case None => false // incomparable types never match
        case Some(x) => op match {
          case "="          => x == 0
          case "<>" | "!="  => x != 0
          case "<"          => x < 0
          case "<="         => x <= 0
          case ">"          => x > 0
          case ">="         => x >= 0
        }
      }
    }

    def comparison(): Pred = {
      val l = operand()
      val op = peek match {
        case Some(o) if Set("=", "<>", "!=", "<", "<=", ">", ">=")(o) => eat()
        case other => fail(s"expected comparison operator, got $other")
      }
      val r = operand()
      (e, b) => (for { lv <- l(e, b); rv <- r(e, b) } yield cmpVals(op, lv, rv))
        .getOrElse(false)
    }

    def unary(): Pred = peek match {
      case Some(t) if kw(t, "NOT") => eat(); val p = unary(); (e, b) => !p(e, b)
      case Some("(") =>
        eat(); val p = orExpr()
        peek match {
          case Some(")") => eat(); p
          case other => fail(s"expected ')', got $other")
        }
      case _ => comparison()
    }

    def andExpr(): Pred = {
      var l = unary()
      while (peek.exists(kw(_, "AND"))) {
        eat(); val r = unary(); val ll = l; l = (e, b) => ll(e, b) && r(e, b)
      }
      l
    }

    def orExpr(): Pred = {
      var l = andExpr()
      while (peek.exists(kw(_, "OR"))) {
        eat(); val r = andExpr(); val ll = l; l = (e, b) => ll(e, b) || r(e, b)
      }
      l
    }

    val p = orExpr()
    if (i != toks.length) fail(s"trailing tokens in DEFINE expression: '$src'")
    p
  }
}
