package graft.streaming

/** A MATCH_RECOGNIZE-shaped string DSL compiled to [[Cep.Pattern]] —
  * the SQL-surface form of the CEP library (reference compiles SQL
  * MATCH_RECOGNIZE to the same NFA: `flink-table/flink-table-planner-
  * blink/.../StreamExecMatch.scala:69`, parser symbols in
  * `FlinkSqlOperatorTable.java:944`).
  *
  * Grammar (whitespace-separated steps, then an optional time bound):
  *
  * {{{
  *   pattern  := unit+ ("within" duration)?
  *   unit     := step | group
  *   step     := flags NAMES quant?
  *   group    := "(" step+ ")" gquant?   — quantified CONCATENATION
  *               group (reference GroupPattern.java): "(A B){2}"
  *               matches A…B…A…B, occurrences accumulating under
  *               each step's own name. gquant ∈ {"?", "+", "++",
  *               "*", "**", "{n}", "{m,n}", "{n,}", "{0,n}"} — "?"
  *               is the all-or-nothing OPTIONAL group, "*" the
  *               optional loop, "++"/"**" the consecutive loop forms
  *               (strict iteration adjacency). Quantified/negated
  *               steps INSIDE a quantified group, flags on the group
  *               itself, and greedy group loops (also rejected by
  *               the reference: Pattern.greedy
  *               checkIfNoGroupPattern) are rejected loudly.
  *   NAMES    := NAME ("|" NAME)*     — 2+ names = alternation (B|C)
  *   flags    := ""    — relaxed contiguity (followedBy)
  *             | ">"   — strict contiguity (next)
  *             | "!"   — relaxed negation (notFollowedBy)
  *             | "!>"  — strict negation (notNext)
  *   quant    := "?" | "+" | "++" | "*" | "**" | "{n}" | "{m,n}" | "{n,}"
  *   duration := <int>("us"|"ms"|"s"|"m"|"h"|"d")?   (default us)
  * }}}
  *
  * An alternation step `B|C` (reference group patterns,
  * `cep/pattern/GroupPattern.java`) binds each matching event under
  * the first alternative whose predicate holds — see [[Cep.Step.alts]].
  * Negation flags cannot apply to an alternation.
  *
  * `+` is a relaxed loop (Pattern-API `oneOrMore`, accumulates across
  * gaps); `++` is the consecutive loop (`oneOrMore.consecutive`) —
  * the faithful transcription of SQL MATCH_RECOGNIZE's `A+`, whose
  * quantifier adjacency is strict. `*` / `**` are the zero-or-more
  * forms of the same pair (`zeroOrMore`, the reference's
  * `oneOrMore().optional()` composition).
  *
  * Each NAME is bound to its predicate from the `preds` map — the DSL
  * analog of MATCH_RECOGNIZE's DEFINE clause. SQL's `PATTERN (A B)`
  * adjacency is strict, so the faithful transcription of
  * `PATTERN (A X B) DEFINE ...` is `"A >X >B"`; bare adjacency here is
  * relaxed (the Pattern-API default), matching `followedBy`.
  *
  * Example — the q58 "view then purchase within 10 minutes" pattern:
  * {{{
  *   CepDsl.compile[Event]("A B within 10m", Map(
  *     "A" -> ((e, _) => e.event_type == "view"),
  *     "B" -> ((e, bound) => e.event_type == "purchase" &&
  *                           Event.micros(e.ts) > Event.micros(bound("A").head.ts))))
  * }}}
  */
object CepDsl {

  private val StepRe =
    """((?:!>?|>)?)([A-Za-z_][A-Za-z0-9_]*(?:\|[A-Za-z_][A-Za-z0-9_]*)*)((?:\?|\+\+?|\*\*?|\{\d+(?:,\d*)?\})?)""".r
  private val DurRe = """(\d+)(us|ms|s|m|h|d)?""".r

  /** Parse a duration literal to microseconds. */
  private[streaming] def parseDuration(s: String): Long = s match {
    case DurRe(n, unit) =>
      val base = n.toLong
      Option(unit).getOrElse("us") match {
        case "us" => base
        case "ms" => base * 1000L
        case "s"  => base * 1000000L
        case "m"  => base * 60L * 1000000L
        case "h"  => base * 3600L * 1000000L
        case "d"  => base * 86400L * 1000000L
      }
    case _ => throw new IllegalArgumentException(s"bad duration: '$s'")
  }

  /** Compile a pattern string against named iterative conditions
    * (predicates see the candidate event and the bindings so far,
    * like MATCH_RECOGNIZE DEFINE / Flink IterativeCondition). */
  def compile[T](src: String,
                 preds: Map[String, (T, Map[String, Vector[T]]) => Boolean])
      : Cep.Pattern[T] = {
    val toks = src.trim.split("\\s+").toList
    require(toks.nonEmpty && toks.head.nonEmpty, "empty pattern")
    val (stepToks, withinUs) = toks.indexOf("within") match {
      case -1 => (toks, Long.MaxValue)
      case i =>
        require(i == toks.length - 2,
          "'within' takes exactly one duration and ends the pattern")
        (toks.take(i), parseDuration(toks.last))
    }
    require(stepToks.nonEmpty, "pattern needs at least one step")

    def applyQuant(p: Cep.Pattern[T], quant: String): Cep.Pattern[T] = quant match {
      case ""  => p
      case "?" => p.optional
      case "+" => p.oneOrMore
      case "++" => p.oneOrMore.consecutive
      case "*" => p.zeroOrMore
      case "**" => p.zeroOrMore.consecutive
      case q if q.startsWith("{") =>
        val inner = q.substring(1, q.length - 1)
        // zero-minimum ranges ride the optional drift path exactly
        // like `*`: {0,} ≡ zeroOrMore, {0,n} ≡ times(1,n).optional
        // (cnt=0 skips via optional, 1..n accumulate as the range).
        if (inner.endsWith(",")) inner.init.toInt match {
          case 0 => p.zeroOrMore
          case n => p.timesOrMore(n)
        }
        else inner.split(",") match {
          case Array(n)         => p.times(n.toInt)
          case Array("0", n)    => p.times(1, n.toInt).optional
          case Array(m, n)      => p.times(m.toInt, n.toInt)
        }
    }

    def appendStep(acc: Cep.Pattern[T], tok: String,
                   isFirst: Boolean): Cep.Pattern[T] = {
      val (flags, name, quant) = tok match {
        case StepRe(f, n, q) => (f, n, q)
        case _ => throw new IllegalArgumentException(s"bad step: '$tok'")
      }
      def predOf(n: String) = preds.getOrElse(n,
        throw new IllegalArgumentException(s"no predicate defined for '$n'"))
      if (name.contains("|")) {
        val alts = name.split("\\|").toVector.map(n => n -> predOf(n))
        require(!flags.startsWith("!"),
          s"alternation '$name' cannot be negated")
        if (isFirst) {
          require(flags.isEmpty, s"first step '$tok' cannot be strict or negated")
          applyQuant(Cep.Pattern.beginAny(alts: _*), quant)
        } else if (flags == ">") applyQuant(acc.nextAny(alts: _*), quant)
        else applyQuant(acc.followedByAny(alts: _*), quant)
      } else {
        val pred = predOf(name)
        if (isFirst) {
          require(flags.isEmpty, s"first step '$tok' cannot be strict or negated")
          applyQuant(Cep.Pattern.begin(name)(pred), quant)
        } else {
          flags match {
            case ""  => applyQuant(acc.followedBy(name)(pred), quant)
            case ">" => applyQuant(acc.next(name)(pred), quant)
            case neg =>
              require(quant.isEmpty, s"negated step '$tok' cannot be quantified")
              if (neg == "!") acc.notFollowedBy(name)(pred)
              else acc.notNext(name)(pred)
          }
        }
      }
    }

    var acc: Cep.Pattern[T] = null
    var rest = stepToks
    while (rest.nonEmpty) {
      val tok = rest.head
      if (tok.startsWith("(")) {
        // concatenation group "(A B){2}" — tokens up to the one
        // holding ")" form the body; the tail after ")" is the
        // group quantifier, applied through the Pattern methods
        // (which branch on the group and loudly reject the
        // unsupported forms: "?", "*", "++", zero-minimum ranges).
        val closeIdx = rest.indexWhere(_.contains(")"))
        require(closeIdx >= 0, s"unclosed group starting at '$tok'")
        val joined = rest.take(closeIdx + 1).mkString(" ")
        rest = rest.drop(closeIdx + 1)
        val inner = joined.drop(1)
        val cut = inner.indexOf(')')
        val bodyToks = inner.take(cut).trim.split("\\s+").toList.filter(_.nonEmpty)
        require(bodyToks.nonEmpty, s"empty group body in '$joined'")
        val quant = inner.drop(cut + 1)
        val body = bodyToks.zipWithIndex.foldLeft(null: Cep.Pattern[T]) {
          case (b, (t, i)) => appendStep(b, t, i == 0) }
        val grouped =
          if (acc == null) Cep.Pattern.beginGroup(body)
          else acc.followedByGroup(body)
        acc = applyQuant(grouped, quant)
      } else {
        acc = appendStep(acc, tok, acc == null)
        rest = rest.tail
      }
    }
    val pat = acc
    if (withinUs == Long.MaxValue) pat else pat.within(withinUs)
  }

  /** Convenience overload for plain (non-iterative) predicates. */
  def compileSimple[T](src: String, preds: Map[String, T => Boolean])
      : Cep.Pattern[T] =
    compile(src, preds.map { case (k, f) =>
      k -> ((e: T, _: Map[String, Vector[T]]) => f(e))
    })

  // ---- MEASURES clause ---------------------------------------------

  private val MeasureRe =
    """(?i)(?:(?:RUNNING|FINAL)\s+)?(first|last|count|sum|avg|max|min)\(\s*([A-Za-z_][A-Za-z0-9_]*)(?:\.([A-Za-z_][A-Za-z0-9_]*))?\s*\)\s+as\s+([A-Za-z_][A-Za-z0-9_]*)""".r

  /** Compile a MEASURES clause — the declarative output surface of
    * MATCH_RECOGNIZE (`MEASURES FIRST(A.x) AS ..., COUNT(A) AS ...`),
    * reference `StreamExecMatch.scala:69` /
    * `FlinkSqlOperatorTable.java:944+` — into [[Cep.Measure]]s that
    * [[Cep.selectMeasures]] applies at match emission.
    *
    * Grammar: comma-separated `[RUNNING|FINAL] fn(STEP.field) AS
    * alias` with fn ∈ {first, last, count, sum, avg, max, min};
    * `count(STEP)` takes no field. The RUNNING/FINAL prefix parses
    * and is semantically inert: the engine (like the reference —
    * Flink restricts MATCH_RECOGNIZE to ONE ROW PER MATCH,
    * `StreamExecMatch.scala:389`) emits one row per COMPLETED match,
    * where SQL:2016 defines RUNNING ≡ FINAL; the ALL ROWS PER MATCH
    * mode where they diverge does not exist on either engine.
    * `fields` resolves field names to (Spark type, projection)
    * — [[Event.fieldTable]] for the events schema. sum/avg/max/min
    * require a numeric field (LongType or DoubleType). */
  def compileMeasures[T](src: String,
                         fields: Map[String, (org.apache.spark.sql.types.DataType, T => Any)])
      : Seq[Cep.Measure[T]] = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    src.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case MeasureRe(fn, step, fieldOrNull, alias) =>
        val field = Option(fieldOrNull)
        def resolved = {
          val f = field.getOrElse(throw new IllegalArgumentException(
            s"${fn.toLowerCase}($step) needs a field: ${fn.toLowerCase}($step.<field>)"))
          fields.getOrElse(f, throw new IllegalArgumentException(
            s"unknown field '$f' in measure '$fn($step.$f)'"))
        }
        fn.toLowerCase match {
          case "count" =>
            require(field.isEmpty, s"count($step) takes no field")
            Cep.Measures.count[T](step, alias)
          case "first" =>
            val (dt, proj) = resolved
            Cep.Measures.first[T](step, alias, dt)(proj)
          case "last" =>
            val (dt, proj) = resolved
            Cep.Measures.last[T](step, alias, dt)(proj)
          case "sum" => resolved match {
            case (LongType, proj) =>
              Cep.Measures.sumLong[T](step, alias)(e => proj(e).asInstanceOf[Long])
            case (DoubleType, proj) =>
              Cep.Measures.sumDouble[T](step, alias)(e => proj(e).asInstanceOf[Double])
            case (dt, _) => throw new IllegalArgumentException(
              s"sum needs a numeric field, got $dt")
          }
          case "avg" => resolved match {
            case (LongType, proj) =>
              Cep.Measures.avg[T](step, alias)(e => proj(e).asInstanceOf[Long].toDouble)
            case (DoubleType, proj) =>
              Cep.Measures.avg[T](step, alias)(e => proj(e).asInstanceOf[Double])
            case (dt, _) => throw new IllegalArgumentException(
              s"avg needs a numeric field, got $dt")
          }
          case "max" => resolved match {
            case (LongType, proj) =>
              Cep.Measures.maxLong[T](step, alias)(e => proj(e).asInstanceOf[Long])
            case (DoubleType, proj) =>
              Cep.Measures.maxDouble[T](step, alias)(e => proj(e).asInstanceOf[Double])
            case (dt, _) => throw new IllegalArgumentException(
              s"max needs a numeric field, got $dt")
          }
          case "min" => resolved match {
            case (LongType, proj) =>
              Cep.Measures.minLong[T](step, alias)(e => proj(e).asInstanceOf[Long])
            case (DoubleType, proj) =>
              Cep.Measures.minDouble[T](step, alias)(e => proj(e).asInstanceOf[Double])
            case (dt, _) => throw new IllegalArgumentException(
              s"min needs a numeric field, got $dt")
          }
        }
      case bad => throw new IllegalArgumentException(s"bad measure: '$bad'")
    }
  }
}
