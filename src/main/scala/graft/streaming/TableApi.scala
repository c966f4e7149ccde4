package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** The reference's fluent Table-API expression-string surface
  * (flink-table-api-java/.../api/Table.java:104 `select(String)`,
  * `:202 filter(String)`, `:258 groupBy(String)`, `:756 orderBy`,
  * `:791/:812 offset/fetch`, `:476 joinLateral`, `:925/:983/:1010
  * addColumns/renameColumns/dropColumns`) re-expressed over Spark
  * DataFrames. The expression grammar is the planner's
  * `PlannerExpressionParserImpl.scala` (planner-blink): the full
  * precedence chain (alias, then or/and, comparisons, additive,
  * multiplicative, unary, suffix/prefix composite, atom), Flink
  * literal forms (`12L`,
  * `1.5f`, `'It''s'`, `"a ""b"""`, `Null(TYPE)`), suffix calls
  * (`a.sum`, `a.cast(LONG)`, `a.trim(LEADING, '-')`,
  * `ts.extract(YEAR)`, `10.minutes`, `a.asc`), the operand-first
  * prefix spellings (`sum(a)`, `CAST(a, LONG)`, `IF(c, x, y)`), and
  * the rowtime/proctime attribute suffixes.
  *
  * Spark-first: every expression string parses DIRECTLY to a Catalyst
  * `Column` (hand-rolled scanner + recursive descent, same approach
  * as FlinkDdl/MatchRecognize — no parser generator), so a fluent
  * pipeline is exactly as optimizable as hand-written DataFrame code:
  * one lazy logical plan, full pushdown/pruning/codegen. Out-of-scope
  * constructs reject loudly with the supported surface named: `over`
  * (batch OVER lives in WindowQueries / SQL text), `.rows` row
  * intervals (group-window sizes live in GroupWindowSql), composite
  * `get`/`flatten`, and the TIME type (no Spark analog).
  */
object TableApi {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Table API: $msg")

  // ---- tokens ------------------------------------------------------

  private sealed trait Tok { def text: String }
  private case class TIdent(text: String) extends Tok
  private case class TNum(text: String) extends Tok
  private case class TStr(text: String, value: String) extends Tok
  private case class TOp(text: String) extends Tok

  private val ops = List("===", "!==", "==", "!=", "<>", ">=", "<=",
    "&&", "||", "(", ")", ",", ".", "+", "-", "*", "/", "%", "!",
    ">", "<", "=", "?")

  private val NumRe = """\d+(\.\d+)?([eE][+-]?\d+)?[lLfFdDpP]?|\.\d+([eE][+-]?\d+)?[fFdD]?""".r
  private val IdentRe = """[A-Za-z_][A-Za-z0-9_]*""".r

  private def tokenize(s: String): Vector[Tok] = {
    var out = Vector.empty[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val q = c
        val sb = new StringBuilder
        var j = i + 1; var closed = false
        while (j < s.length && !closed) {
          if (s.charAt(j) == q) {
            if (j + 1 < s.length && s.charAt(j + 1) == q) { sb.append(q); j += 2 }
            else { closed = true; j += 1 }
          } else { sb.append(s.charAt(j)); j += 1 }
        }
        if (!closed) fail(s"unterminated string literal in: $s")
        out :+= TStr(s.substring(i, j), sb.toString); i = j
      } else if (c.isDigit ||
          (c == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit &&
            // ".5" starts a number only when not following an ident or
            // a ')' (those dots are suffix-call dots)
            !out.lastOption.exists(t =>
              t.isInstanceOf[TIdent] || t.text == ")"))) {
        val m = NumRe.findPrefixMatchOf(s.substring(i))
          .getOrElse(fail(s"bad number at '${s.substring(i)}'"))
        out :+= TNum(m.matched); i += m.matched.length
      } else if (c.isLetter || c == '_') {
        val m = IdentRe.findPrefixMatchOf(s.substring(i)).get
        out :+= TIdent(m.matched); i += m.matched.length
      } else {
        ops.find(op => s.startsWith(op, i)) match {
          case Some(op) => out :+= TOp(op); i += op.length
          case None     => fail(s"unexpected character '$c' in: $s")
        }
      }
    }
    out
  }

  // ---- parsed expression -------------------------------------------

  /** A parsed item: the Column, whether the tree contains an
    * aggregate, a sort marker (.asc/.desc applied), the literal value
    * when the whole item is one literal (interval suffixes need it),
    * the underlying aggregate call (for `.distinct`), an `as` alias,
    * the bare field name when the item is a plain reference, the
    * over-window alias when the item is `agg over w`, and the struct
    * column name when the item is `s.flatten` (expanded at select
    * time, where the schema is known). */
  private[streaming] case class Px(col: Column, agg: Boolean = false,
      sort: Boolean = false, litVal: Option[Any] = None,
      aggCall: Option[(String, Column)] = None,
      alias: Option[String] = None, fieldName: Option[String] = None,
      overRef: Option[String] = None, flattenOf: Option[String] = None) {
    def named: Column = alias.map(col.as).getOrElse(col)
    def outName: Option[String] = alias.orElse(fieldName)
  }

  private val typeNames: Map[String, String] = Map(
    "INT" -> "int", "LONG" -> "bigint", "FLOAT" -> "float",
    "DOUBLE" -> "double", "BOOLEAN" -> "boolean", "STRING" -> "string",
    "BYTE" -> "tinyint", "SHORT" -> "smallint",
    "DECIMAL" -> "decimal(38,18)", "SQL_DATE" -> "date",
    "SQL_TIMESTAMP" -> "timestamp")

  private val timeUnits = Set("YEAR", "QUARTER", "MONTH", "WEEK", "DAY",
    "HOUR", "MINUTE", "SECOND")

  private val monthIntervals = Map("YEARS" -> 12, "YEAR" -> 12,
    "QUARTERS" -> 3, "QUARTER" -> 3, "MONTHS" -> 1, "MONTH" -> 1)
  private val milliIntervals = Map(
    "WEEKS" -> 604800000L, "WEEK" -> 604800000L,
    "DAYS" -> 86400000L, "DAY" -> 86400000L,
    "HOURS" -> 3600000L, "HOUR" -> 3600000L,
    "MINUTES" -> 60000L, "MINUTE" -> 60000L,
    "SECONDS" -> 1000L, "SECOND" -> 1000L,
    "MILLIS" -> 1L, "MILLI" -> 1L)

  private def litString(p: Px, what: String): String = p.litVal match {
    case Some(s: String) => s
    case _ => fail(s"$what needs a string literal argument")
  }
  private def litInt(p: Px, what: String): Int = p.litVal match {
    case Some(n: Int) => n
    case Some(n: Long) => n.toInt
    case _ => fail(s"$what needs an integer literal argument")
  }

  // aggregate suffix/prefix calls: name -> operand+args -> Column
  private val aggFns: Map[String, Seq[Px] => Column] = Map(
    "sum" -> (a => F.sum(one(a, "sum"))),
    "sum0" -> (a => F.coalesce(F.sum(one(a, "sum0")), F.lit(0L))),
    "count" -> (a => F.count(one(a, "count"))),
    "avg" -> (a => F.avg(one(a, "avg"))),
    "min" -> (a => F.min(one(a, "min"))),
    "max" -> (a => F.max(one(a, "max"))),
    "stddevpop" -> (a => F.stddev_pop(one(a, "stddevPop"))),
    "stddevsamp" -> (a => F.stddev_samp(one(a, "stddevSamp"))),
    "varpop" -> (a => F.var_pop(one(a, "varPop"))),
    "varsamp" -> (a => F.var_samp(one(a, "varSamp"))),
    "collect" -> (a => F.collect_list(one(a, "collect"))))

  private def one(args: Seq[Px], name: String): Column = {
    if (args.length != 1) fail(s"$name takes exactly the operand")
    args.head.col
  }
  private def cols(args: Seq[Px]): Seq[Column] = args.map(_.col)
  private def arity(args: Seq[Px], n: Int, name: String): Seq[Column] = {
    if (args.length != n) fail(s"$name takes $n argument(s), got ${args.length}")
    cols(args)
  }

  // scalar calls: operand-first argument convention (suffix form
  // `a.f(b)` and prefix form `f(a, b)` both arrive as Seq(a, b))
  private val scalarFns: Map[String, Seq[Px] => Column] = Map(
    "uppercase" -> (a => F.upper(one(a, "upperCase"))),
    "lowercase" -> (a => F.lower(one(a, "lowerCase"))),
    "charlength" -> (a => F.length(one(a, "charLength"))),
    "initcap" -> (a => F.initcap(one(a, "initCap"))),
    "substring" -> (a => a.length match {
      case 2 => F.substring(a(0).col, litInt(a(1), "substring"), Int.MaxValue)
      case 3 => F.substring(a(0).col, litInt(a(1), "substring"),
        litInt(a(2), "substring"))
      case _ => fail("substring takes (start [, length])")
    }),
    "replace" -> (a => { val c = arity(a, 3, "replace"); F.replace(c(0), c(1), c(2)) }),
    "regexpreplace" -> (a => { val c = arity(a, 3, "regexpReplace")
      F.regexp_replace(c(0), litString(a(1), "regexpReplace pattern"),
        litString(a(2), "regexpReplace replacement")) }),
    "regexpextract" -> (a => a.length match {
      case 2 => F.regexp_extract(a(0).col, litString(a(1), "regexpExtract"), 0)
      case 3 => F.regexp_extract(a(0).col, litString(a(1), "regexpExtract"),
        litInt(a(2), "regexpExtract group"))
      case _ => fail("regexpExtract takes (pattern [, group])")
    }),
    "position" -> (a => { arity(a, 2, "position")
      F.locate(litString(a(0), "position needle"), a(1).col) }),
    "like" -> (a => { arity(a, 2, "like"); a(0).col.like(litString(a(1), "like pattern")) }),
    "similar" -> (a => { arity(a, 2, "similar")
      a(0).col.rlike("^(?:" +
        FlinkFunctions.similarToRegex(litString(a(1), "similar pattern")) + ")$") }),
    "lpad" -> (a => { arity(a, 3, "lpad")
      F.lpad(a(0).col, litInt(a(1), "lpad"), litString(a(2), "lpad")) }),
    "rpad" -> (a => { arity(a, 3, "rpad")
      F.rpad(a(0).col, litInt(a(1), "rpad"), litString(a(2), "rpad")) }),
    "repeat" -> (a => { arity(a, 2, "repeat"); F.repeat(a(0).col, litInt(a(1), "repeat")) }),
    "reverse" -> (a => F.reverse(one(a, "reverse"))),
    "md5" -> (a => F.md5(F.encode(one(a, "md5"), "UTF-8"))),
    "sha1" -> (a => F.sha1(F.encode(one(a, "sha1"), "UTF-8"))),
    "sha224" -> (a => F.sha2(F.encode(one(a, "sha224"), "UTF-8"), 224)),
    "sha256" -> (a => F.sha2(F.encode(one(a, "sha256"), "UTF-8"), 256)),
    "sha384" -> (a => F.sha2(F.encode(one(a, "sha384"), "UTF-8"), 384)),
    "sha512" -> (a => F.sha2(F.encode(one(a, "sha512"), "UTF-8"), 512)),
    "tobase64" -> (a => F.base64(F.encode(one(a, "toBase64"), "UTF-8"))),
    "frombase64" -> (a => F.unbase64(one(a, "fromBase64")).cast("string")),
    "splitindex" -> (a => { arity(a, 3, "splitIndex")
      graft.functions.GraftFunctions.split_index(a(0).col,
        litString(a(1), "splitIndex sep"), litInt(a(2), "splitIndex idx")) }),
    "hashcode" -> (a => graft.functions.GraftFunctions.hash_code(one(a, "hashCode"))),
    "concat" -> (a => F.concat(cols(a): _*)),
    "abs" -> (a => F.abs(one(a, "abs"))),
    "sqrt" -> (a => F.sqrt(one(a, "sqrt"))),
    "exp" -> (a => F.exp(one(a, "exp"))),
    "ln" -> (a => F.log(one(a, "ln"))),
    "log10" -> (a => F.log10(one(a, "log10"))),
    "log2" -> (a => F.log2(one(a, "log2"))),
    "sin" -> (a => F.sin(one(a, "sin"))),
    "cos" -> (a => F.cos(one(a, "cos"))),
    "tan" -> (a => F.tan(one(a, "tan"))),
    "asin" -> (a => F.asin(one(a, "asin"))),
    "acos" -> (a => F.acos(one(a, "acos"))),
    "atan" -> (a => F.atan(one(a, "atan"))),
    "degrees" -> (a => F.degrees(one(a, "degrees"))),
    "radians" -> (a => F.radians(one(a, "radians"))),
    "sign" -> (a => F.signum(one(a, "sign"))),
    "round" -> (a => { arity(a, 2, "round"); F.round(a(0).col, litInt(a(1), "round")) }),
    "truncate" -> (a => { arity(a, 2, "truncate")
      graft.functions.GraftFunctions.truncate(a(0).col, litInt(a(1), "truncate")) }),
    "power" -> (a => { arity(a, 2, "power"); F.pow(a(0).col, a(1).col) }),
    "mod" -> (a => { arity(a, 2, "mod"); a(0).col % a(1).col }),
    "bin" -> (a => F.bin(one(a, "bin"))),
    "hex" -> (a => F.hex(one(a, "hex"))),
    "dateformat" -> (a => { arity(a, 2, "dateFormat")
      F.date_format(a(0).col, litString(a(1), "dateFormat")) }),
    "isnull" -> (a => one(a, "isNull").isNull),
    "isnotnull" -> (a => one(a, "isNotNull").isNotNull),
    "istrue" -> (a => one(a, "isTrue") <=> F.lit(true)),
    "isfalse" -> (a => one(a, "isFalse") <=> F.lit(false)),
    "isnottrue" -> (a => !(one(a, "isNotTrue") <=> F.lit(true))),
    "isnotfalse" -> (a => !(one(a, "isNotFalse") <=> F.lit(false))),
    "between" -> (a => { val c = arity(a, 3, "between"); c(0).between(c(1), c(2)) }),
    "notbetween" -> (a => { val c = arity(a, 3, "notBetween"); !c(0).between(c(1), c(2)) }),
    "in" -> (a => {
      if (a.length < 2) fail("in takes the operand plus at least one value")
      a.tail.map(v => a.head.col === v.col).reduce(_ || _)
    }),
    "ifthenelse" -> (a => { val c = arity(a, 3, "ifThenElse")
      F.when(c(0), c(1)).otherwise(c(2)) }))

  private val rejected: Map[String, String] = Map(
    "rows" -> "row intervals parameterize group windows (GroupWindowSql q208/q241) and Over.preceding(\"N.rows\") bounds",
    "totime" -> "the TIME type has no Spark analog (engine-wide; see COVERAGE.md)")

  // ---- the parser --------------------------------------------------

  private final class P(src: String) {
    private val toks = tokenize(src)
    private var pos = 0

    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = {
      if (pos >= toks.length) fail(s"unexpected end of expression: $src")
      pos += 1; toks(pos - 1)
    }
    private def peekIs(t: String): Boolean = peek.exists(_.text == t)
    private def peekIdent(kw: String): Boolean = peek match {
      case Some(TIdent(t)) => t.equalsIgnoreCase(kw)
      case _ => false
    }
    private def expect(t: String): Unit = {
      val tok = next()
      if (tok.text != t) fail(s"expected '$t' but found '${tok.text}' in: $src")
    }
    def atEnd: Boolean = pos >= toks.length
    def expectComma(): Boolean =
      if (peekIs(",")) { pos += 1; true } else false

    // expression := logic [AS ident]
    def expression(): Px = {
      val e = logic()
      if (peekIdent("as")) {
        next()
        next() match {
          case TIdent(name) => e.copy(alias = Some(name))
          case TOp("(") => fail("multi-name as(...) is only for joinLateral output lists")
          case t => fail(s"expected alias name after 'as', found '${t.text}'")
        }
      } else e
    }

    private def logic(): Px = {
      var l = comparison()
      while (peekIs("&&") || peekIs("||")) {
        val op = next().text
        val r = comparison()
        l = Px(if (op == "&&") l.col && r.col else l.col || r.col,
          l.agg || r.agg)
      }
      l
    }

    private def comparison(): Px = {
      val l = term()
      peek match {
        case Some(TOp(op)) if Set("===", "==", "=", "!==", "!=", "<>",
            ">", ">=", "<", "<=")(op) =>
          next()
          val r = term()
          val c = op match {
            case "===" | "==" | "=" => l.col === r.col
            case "!==" | "!=" | "<>" => l.col =!= r.col
            case ">" => l.col > r.col
            case ">=" => l.col >= r.col
            case "<" => l.col < r.col
            case "<=" => l.col <= r.col
          }
          Px(c, l.agg || r.agg)
        case _ => l
      }
    }

    private def term(): Px = {
      var l = product()
      while (peekIs("+") || peekIs("-")) {
        val op = next().text
        val r = product()
        l = Px(if (op == "+") l.col + r.col else l.col - r.col, l.agg || r.agg)
      }
      l
    }

    private def product(): Px = {
      var l = unary()
      while (peekIs("*") || peekIs("/") || peekIs("%")) {
        val op = next().text
        val r = unary()
        l = Px(op match {
          case "*" => l.col * r.col
          case "/" => l.col / r.col
          case "%" => l.col % r.col
        }, l.agg || r.agg)
      }
      l
    }

    private def unary(): Px = peek match {
      case Some(TOp("!")) => next(); val e = composite(); e.copy(col = !e.col)
      case Some(TOp("-")) => next(); val e = composite()
        e.copy(col = -e.col, litVal = e.litVal.collect {
          case n: Int => -n; case n: Long => -n; case n: Double => -n })
      case Some(TOp("+")) => next(); composite()
      case _ => composite()
    }

    private def composite(): Px = {
      var e = atomOrPrefix()
      while (peekIs(".")) { next(); e = suffix(e) }
      // the reference's infix `agg over windowRef` form — resolved to
      // a WindowSpec by OverFluentTable.select, where the window
      // definition lives
      if (peekIdent("over")) {
        next()
        val w = next() match {
          case TIdent(n) => n
          case t => fail(s"'over' takes a window alias, found '${t.text}'")
        }
        if (!e.agg)
          fail("'over' applies to an aggregate (a.sum over w)")
        e = e.copy(overRef = Some(w))
      }
      e
    }

    private def suffix(operand: Px): Px = {
      val nameTok = next()
      val name = nameTok match {
        case TIdent(n) => n
        case TOp("?") => "?"
        case t => fail(s"expected suffix name after '.', found '${t.text}'")
      }
      val lower = name.toLowerCase
      rejected.get(lower).foreach(fail)
      lower match {
        case "as" =>
          val args = parenArgs()
          args match {
            case Seq(n) if n.fieldName.isDefined =>
              operand.copy(alias = n.fieldName)
            case _ => fail("suffix as(...) takes one plain name " +
              "(multi-name lists belong to joinLateral output)")
          }
        case "asc" => optEmptyParens(); operand.copy(col = operand.col.asc, sort = true)
        case "desc" => optEmptyParens(); operand.copy(col = operand.col.desc, sort = true)
        case "rowtime" =>
          // the event-time attribute IS the watermarked column in
          // Spark's model — the reference suffix declares/references
          // it (PlannerExpressionParserImpl `rowtime`); identity here
          operand
        case "start" | "end" if operand.fieldName.isDefined =>
          // window properties (reference WindowProperties: w.start /
          // w.end on a group-window alias) — the Spark window struct
          // carries exactly these fields
          optEmptyParens()
          Px(F.col(s"${operand.fieldName.get}.$lower"))
        case "proctime" => Px(F.current_timestamp())
        case "get" =>
          // reference BuiltInFunctionDefinitions GET — composite-field
          // access by NAME ('s.get("field")' → Catalyst getField; the
          // reference's by-position GET(f, 0) depends on planner type
          // info the string grammar doesn't carry, so it's refused)
          val args = parenArgs()
          args match {
            case Seq(n) => n.litVal match {
              case Some(f: String) =>
                Px(operand.col.getField(f), operand.agg)
              case Some(_: Int) | Some(_: Long) =>
                fail("get() supports field NAMES; by-position composite " +
                  "access needs planner type info the string grammar " +
                  "doesn't carry — use get(\"fieldName\")")
              case _ => fail("get() takes one string literal field name")
            }
            case _ => fail("get() takes one string literal field name")
          }
        case "flatten" =>
          // reference FLATTEN — expands a struct column into one
          // output column per field. The expansion needs the schema,
          // so the marker resolves inside select(); anywhere else it
          // rejects loudly.
          optEmptyParens()
          operand.fieldName match {
            case Some(n) => operand.copy(flattenOf = Some(n))
            case None => fail("flatten() applies to a named struct column " +
              "(alias the expression first)")
          }
        case "cast" => castCall(operand)
        case "trim" => trimCall(Some(operand))
        case "extract" => Px(extractCall(unitArg("extract"), operand.col), operand.agg)
        case "floor" if peekIs("(") && peekUnitAhead =>
          Px(floorUnit(unitArg("floor"), operand.col), operand.agg)
        case "ceil" if peekIs("(") && peekUnitAhead =>
          Px(ceilUnit(unitArg("ceil"), operand.col), operand.agg)
        case "floor" => optEmptyParens(); operand.copy(col = F.floor(operand.col))
        case "ceil" => optEmptyParens(); operand.copy(col = F.ceil(operand.col))
        case "log" if peekIs("(") =>
          val args = parenArgs()
          if (args.length != 1) fail("suffix log takes (base)")
          val base = args.head.litVal match {
            case Some(i: Int) => i.toDouble
            case Some(l: Long) => l.toDouble
            case Some(d: Double) => d
            case _ => fail("log base must be a numeric literal")
          }
          Px(F.log(base, operand.col), operand.agg)
        case "log" => optEmptyParens(); operand.copy(col = F.log(operand.col))
        case "todate" => optEmptyParens(); operand.copy(col = operand.col.cast("date"))
        case "totimestamp" => optEmptyParens(); operand.copy(col = operand.col.cast("timestamp"))
        case "?" =>
          val args = parenArgs()
          if (args.length != 2) fail("'?(ifTrue, ifFalse)' takes two arguments")
          Px(F.when(operand.col, args(0).col).otherwise(args(1).col),
            operand.agg || args.exists(_.agg))
        case "distinct" =>
          optEmptyParens()
          operand.aggCall match {
            case Some(("sum", c)) => Px(F.sum_distinct(c), agg = true)
            case Some(("count", c)) => Px(F.count_distinct(c), agg = true)
            case Some((other, _)) =>
              fail(s"distinct modifier supports sum/count, not $other")
            case None => fail("distinct modifier applies to an aggregate (a.sum.distinct)")
          }
        case _ if monthIntervals.contains(name.toUpperCase) ||
            milliIntervals.contains(name.toUpperCase) =>
          operand.litVal match {
            case Some(n) =>
              val u = name.toUpperCase
              val v: Long = n match {
                case i: Int => i.toLong; case l: Long => l
                case d: Double => d.toLong
                case other => fail(s"interval suffix .$name needs a numeric literal, got $other")
              }
              val iv = monthIntervals.get(u)
                .map(k => s"INTERVAL '${v * k}' MONTH")
                .getOrElse {
                  // render sign explicitly: truncating division would
                  // split a negative ms into '0.-10'-style garbage
                  val ms = v * milliIntervals(u)
                  val a = math.abs(ms)
                  val sign = if (ms < 0) "-" else ""
                  s"INTERVAL '$sign${a / 1000}.${"%03d".format(a % 1000)}' SECOND"
                }
              Px(F.expr(iv), litVal = None)
            case None => fail(s"interval suffix .$name needs a numeric literal (e.g. 10.minutes)")
          }
        case _ =>
          val args = if (peekIs("(")) parenArgs() else Nil
          applyCall(name, operand +: args)
      }
    }

    private def peekUnitAhead: Boolean = {
      // lookahead: '(' UNIT ')' — distinguishes ts.floor(MINUTE) from
      // numeric floor()
      if (pos + 1 < toks.length) toks(pos + 1) match {
        case TIdent(u) => timeUnits(u.toUpperCase)
        case _ => false
      } else false
    }

    private def optEmptyParens(): Unit =
      if (peekIs("(")) { expect("("); expect(")") }

    private def parenArgs(): Seq[Px] = {
      expect("(")
      if (peekIs(")")) { next(); return Nil }
      val args = Seq.newBuilder[Px]
      args += expression()
      while (peekIs(",")) { next(); args += expression() }
      expect(")")
      args.result()
    }

    private def unitArg(what: String): String = {
      expect("(")
      val u = next() match {
        case TIdent(u) if timeUnits(u.toUpperCase) => u.toUpperCase
        case t => fail(s"$what takes a time unit (${timeUnits.mkString("/")}), found '${t.text}'")
      }
      expect(")")
      u
    }

    private def extractCall(unit: String, c: Column): Column = unit match {
      case "YEAR" => F.year(c).cast("long")
      case "QUARTER" => F.quarter(c).cast("long")
      case "MONTH" => F.month(c).cast("long")
      case "WEEK" => F.weekofyear(c).cast("long")
      case "DAY" => F.dayofmonth(c).cast("long")
      case "HOUR" => F.hour(c).cast("long")
      case "MINUTE" => F.minute(c).cast("long")
      case "SECOND" => F.second(c).cast("long")
    }

    private def floorUnit(unit: String, c: Column): Column =
      F.date_trunc(unit.toLowerCase, c)

    private def ceilUnit(unit: String, c: Column): Column = {
      val t = F.date_trunc(unit.toLowerCase, c)
      F.when(t === c, c).otherwise(t + F.expr(oneUnitInterval(unit)))
    }

    private def oneUnitInterval(unit: String): String = unit match {
      case "WEEK" => "INTERVAL 7 DAY"
      case "QUARTER" => "INTERVAL 3 MONTH"
      case u => s"INTERVAL 1 $u"
    }

    private def castCall(operand: Px): Px = {
      expect("(")
      val t = next() match {
        case TIdent(tn) => typeTo(tn)
        case tok => fail(s"cast takes a type name, found '${tok.text}'")
      }
      expect(")")
      operand.copy(col = operand.col.cast(t), litVal = None, fieldName = None)
    }

    private def typeTo(tn: String): String = {
      if (tn.equalsIgnoreCase("SQL_TIME"))
        fail("the TIME type has no Spark analog (engine-wide; see COVERAGE.md)")
      typeNames.getOrElse(tn.toUpperCase,
        fail(s"unknown type $tn; supported: ${typeNames.keys.toSeq.sorted.mkString(", ")}"))
    }

    private def trimCall(operand: Option[Px]): Px = {
      // suffix: a.trim() / a.trim(LEADING, '-')
      // prefix: trim(a) / TRIM(LEADING, '-', a)
      if (!peekIs("(")) {
        val op = operand.getOrElse(fail("trim needs an operand"))
        return op.copy(col = F.trim(op.col), litVal = None, fieldName = None)
      }
      expect("(")
      val mode = peek match {
        case Some(TIdent(m)) if Set("LEADING", "TRAILING", "BOTH")(m.toUpperCase) =>
          next(); Some(m.toUpperCase)
        case _ => None
      }
      (mode, operand) match {
        case (None, Some(op)) =>
          if (peekIs(")")) { next(); op.copy(col = F.trim(op.col), litVal = None, fieldName = None) }
          else fail("suffix trim takes () or (LEADING|TRAILING|BOTH, 'char')")
        case (None, None) =>
          val e = expression(); expect(")")
          Px(F.trim(e.col), e.agg)
        case (Some(m), op) =>
          expect(",")
          val chr = expression()
          val target = op.getOrElse { expect(","); expression() }
          expect(")")
          val cs = litString(chr, "trim character")
          val c = m match {
            case "LEADING" => F.ltrim(target.col, cs)
            case "TRAILING" => F.rtrim(target.col, cs)
            case "BOTH" => F.trim(target.col, cs)
          }
          Px(c, target.agg)
      }
    }

    private def applyCall(name: String, args: Seq[Px]): Px = {
      val lower = name.toLowerCase
      rejected.get(lower).foreach(fail)
      aggFns.get(lower) match {
        case Some(f) =>
          if (args.exists(_.agg)) fail(s"nested aggregate in $name")
          Px(f(args), agg = true, aggCall = Some((lower, args.head.col)))
        case None => scalarFns.get(lower) match {
          case Some(f) => Px(f(args), args.exists(_.agg))
          case None => fail(s"unknown function '$name'; aggregates: " +
            s"${aggFns.keys.toSeq.sorted.mkString(", ")}; scalars: " +
            s"${scalarFns.keys.toSeq.sorted.mkString(", ")}")
        }
      }
    }

    private def atomOrPrefix(): Px = next() match {
      case TOp("(") =>
        val e = expression(); expect(")"); e.copy(fieldName = None)
      case TNum(text) =>
        val t = text.toLowerCase
        if (t.endsWith("l")) { val v = text.dropRight(1).toLong; Px(F.lit(v), litVal = Some(v)) }
        else if (t.endsWith("p")) Px(F.lit(new java.math.BigDecimal(text.dropRight(1))))
        else if (t.endsWith("f") || t.endsWith("d")) {
          val v = text.dropRight(1).toDouble
          Px(if (t.endsWith("f")) F.lit(v.toFloat) else F.lit(v), litVal = Some(v))
        }
        else if (text.matches("""\d+""")) { val v = text.toInt; Px(F.lit(v), litVal = Some(v)) }
        else { val v = text.toDouble; Px(F.lit(v), litVal = Some(v)) }
      case TStr(_, value) => Px(F.lit(value), litVal = Some(value))
      case TIdent(id) if id.equalsIgnoreCase("true") => Px(F.lit(true), litVal = Some(true))
      case TIdent(id) if id.equalsIgnoreCase("false") => Px(F.lit(false), litVal = Some(false))
      case TIdent(id) if id.equalsIgnoreCase("null") || id.equalsIgnoreCase("nullof") =>
        expect("(")
        val t = next() match {
          case TIdent(tn) => typeTo(tn)
          case tok => fail(s"Null(TYPE) takes a type name, found '${tok.text}'")
        }
        expect(")")
        Px(F.lit(null).cast(t))
      case TIdent(id) if id.equalsIgnoreCase("cast") && peekIs("(") =>
        expect("(")
        val e = expression()
        expect(",")
        val t = next() match {
          case TIdent(tn) => typeTo(tn)
          case tok => fail(s"CAST takes a type name, found '${tok.text}'")
        }
        expect(")")
        Px(e.col.cast(t), e.agg)
      case TIdent(id) if (id.equalsIgnoreCase("if") ||
          id.equalsIgnoreCase("ifthenelse")) && peekIs("(") =>
        val args = parenArgs()
        if (args.length != 3) fail("IF takes (condition, ifTrue, ifFalse)")
        Px(F.when(args(0).col, args(1).col).otherwise(args(2).col),
          args.exists(_.agg))
      case TIdent(id) if id.equalsIgnoreCase("trim") && peekIs("(") =>
        trimCall(None)
      case TIdent(id) if id.equalsIgnoreCase("extract") && peekIs("(") =>
        expect("(")
        val e = expression()
        expect(",")
        val u = next() match {
          case TIdent(un) if timeUnits(un.toUpperCase) => un.toUpperCase
          case tok => fail(s"EXTRACT takes a time unit, found '${tok.text}'")
        }
        expect(")")
        Px(extractCall(u, e.col), e.agg)
      case TIdent(id) if id.equalsIgnoreCase("timestampdiff") && peekIs("(") =>
        expect("(")
        val u = next() match {
          case TIdent(un) if timeUnits(un.toUpperCase) => un.toUpperCase
          case tok => fail(s"timestampDiff takes a time unit first, found '${tok.text}'")
        }
        expect(",")
        val a = expression(); expect(","); val b = expression(); expect(")")
        Px(timestampDiff(u, a.col, b.col), a.agg || b.agg)
      case TOp("?") if peekIs("(") =>
        val args = parenArgs()
        if (args.length != 3) fail("?(condition, ifTrue, ifFalse) takes three arguments")
        Px(F.when(args(0).col, args(1).col).otherwise(args(2).col),
          args.exists(_.agg))
      case TIdent(id) if peekIs("(") =>
        applyCall(id, parenArgs())
      case TIdent(id) =>
        rejected.get(id.toLowerCase).foreach(fail)
        Px(F.col(id), fieldName = Some(id))
      case TOp("*") => Px(F.col("*"))
      case t => fail(s"unexpected token '${t.text}' in: $src")
    }

    private def timestampDiff(unit: String, a: Column, b: Column): Column = unit match {
      // Flink TIMESTAMPDIFF(unit, t1, t2) = count of COMPLETE units from
      // t1 to t2, truncated toward zero (ScalarFunctionsTest: DAY between
      // '2016-06-15 11:00' and '2016-06-19 00:00' is 3, not the 4 calendar
      // boundaries datediff would count). MONTH/YEAR likewise truncate the
      // fractional months_between toward zero, not toward -inf.
      case "DAY" => ((b.cast("long") - a.cast("long")) / 86400L).cast("int")
      case "HOUR" => ((b.cast("long") - a.cast("long")) / 3600L).cast("int")
      case "MINUTE" => ((b.cast("long") - a.cast("long")) / 60L).cast("int")
      case "SECOND" => (b.cast("long") - a.cast("long")).cast("int")
      case "MONTH" => F.months_between(b, a).cast("int")
      case "YEAR" => (F.months_between(b, a) / 12).cast("int")
      case u => fail(s"timestampDiff unit $u unsupported (YEAR/MONTH/DAY/HOUR/MINUTE/SECOND)")
    }
  }

  private[streaming] def parseList(s: String): Seq[Px] = {
    val p = new P(s)
    val out = Seq.newBuilder[Px]
    out += p.expression()
    while (!p.atEnd) {
      if (!p.expectComma()) fail(s"expected ',' between expressions in: $s")
      out += p.expression()
    }
    out.result()
  }

  private[streaming] def parseOne(s: String): Px = {
    val items = parseList(s)
    if (items.length != 1) fail(s"exactly one expression expected: $s")
    items.head
  }
}

/** Reference `Table` (Table.java) — the fluent, string-expression
  * relational surface over one DataFrame. Every method builds onto
  * ONE lazy Catalyst plan; toDF() hands it back. */
final class FluentTable(private val df: DataFrame) {
  import TableApi.{parseList, parseOne, Px}

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Table API: $msg")

  def toDF: DataFrame = df

  /** Table.java:104 — projection; aggregate-only lists run a global
    * aggregate (GroupedTable-less `select("a.sum")`); `s.flatten`
    * items expand here, where the schema is known, into one column per
    * struct field named `s$field` (the reference FLATTEN spelling). */
  def select(fields: String): FluentTable = {
    val items = parseList(fields)
    items.flatMap(_.overRef).headOption.foreach(w => fail(
      s"'over $w' needs a window definition — go through " +
        "table.window(Over.partitionBy(...).orderBy(...).as(\"" + w + "\")).select(...)"))
    if (items.exists(_.agg)) {
      if (!items.forall(_.agg))
        fail("select mixes aggregates and non-aggregates; groupBy first")
      if (items.exists(_.flattenOf.isDefined))
        fail("flatten() cannot ride an aggregate-only select")
      val named = items.map(_.named)
      new FluentTable(df.agg(named.head, named.tail: _*))
    } else {
      val out = items.flatMap { p =>
        p.flattenOf match {
          case Some(s) => df.schema.find(_.name == s).map(_.dataType) match {
            case Some(st: org.apache.spark.sql.types.StructType) =>
              st.fieldNames.toSeq.map(f => F.col(s"$s.$f").as(s"$s$$$f"))
            case Some(other) => fail(
              s"$s.flatten needs a struct column, found ${other.simpleString}")
            case None => fail(s"$s.flatten: unknown column $s")
          }
          case None => Seq(p.named)
        }
      }
      new FluentTable(df.select(out: _*))
    }
  }

  /** Table.java:174 — positional rename of every column. */
  def as(fields: String): FluentTable = {
    val names = parseList(fields).map(p => p.fieldName.getOrElse(
      fail("as() takes a plain name list")))
    if (names.length != df.columns.length)
      fail(s"as() got ${names.length} names for ${df.columns.length} columns")
    new FluentTable(df.toDF(names: _*))
  }

  /** Table.java:202/:230. */
  def filter(predicate: String): FluentTable = {
    val p = parseOne(predicate)
    if (p.agg) fail("aggregates are not allowed in filter()")
    new FluentTable(df.filter(p.col))
  }
  def where(predicate: String): FluentTable = filter(predicate)

  /** Table.java:258. */
  def groupBy(fields: String): GroupedFluentTable = {
    val keys = parseList(fields)
    if (keys.exists(_.agg)) fail("aggregates are not allowed in groupBy()")
    new GroupedFluentTable(df, keys)
  }

  /** Table.java `window(GroupWindow)` (reference GroupWindowedTable):
    * the subsequent groupBy MUST reference the window alias (the
    * reference's contract), and the window's struct column carries
    * w.start / w.end for the select. */
  def window(w: GroupWindows.GroupWindow): WindowedFluentTable =
    new WindowedFluentTable(df, w)

  /** Table.java `window(OverWindow...)` (reference OverWindowedTable):
    * the select's aggregates must be spelled `agg over w`. The
    * reference supports exactly one over window per call — same here,
    * with the same loud refusal. */
  def window(w: OverWindows.OverWindow, rest: OverWindows.OverWindow*): OverFluentTable = {
    if (rest.nonEmpty)
      fail("over windows: only one window per window() call is supported " +
        "(the reference OverWindowedTable has the same restriction); " +
        "chain .window(...).select(...) steps instead")
    new OverFluentTable(df, w)
  }

  /** Table.java:285. */
  def distinct(): FluentTable = new FluentTable(df.distinct())

  /** Table.java:756 — `.asc`/`.desc` suffixes; ascending by default. */
  def orderBy(fields: String): FluentTable = {
    val items = parseList(fields).map(p => if (p.sort) p.col else p.col.asc)
    new FluentTable(df.orderBy(items: _*))
  }

  /** Table.java:791/:812 — require orderBy upstream as the reference
    * does semantically; Spark's Offset/Limit compose the same way. */
  def offset(n: Int): FluentTable = new FluentTable(df.offset(n))
  def fetch(n: Int): FluentTable = new FluentTable(df.limit(n))

  /** Table.java joins (string predicate forms). */
  def join(other: FluentTable, condition: String): FluentTable =
    joined(other, condition, "inner")
  def leftOuterJoin(other: FluentTable, condition: String): FluentTable =
    joined(other, condition, "left_outer")
  def rightOuterJoin(other: FluentTable, condition: String): FluentTable =
    joined(other, condition, "right_outer")
  def fullOuterJoin(other: FluentTable, condition: String): FluentTable =
    joined(other, condition, "full_outer")
  private def joined(other: FluentTable, condition: String, how: String) = {
    val p = parseOne(condition)
    if (p.agg) fail("aggregates are not allowed in a join condition")
    new FluentTable(df.join(other.df, p.col, how))
  }

  /** Table.java set operations. */
  def union(other: FluentTable): FluentTable =
    new FluentTable(df.union(other.df).distinct())
  def unionAll(other: FluentTable): FluentTable =
    new FluentTable(df.union(other.df))
  def minus(other: FluentTable): FluentTable =
    new FluentTable(df.except(other.df))
  def minusAll(other: FluentTable): FluentTable =
    new FluentTable(df.exceptAll(other.df))
  def intersect(other: FluentTable): FluentTable =
    new FluentTable(df.intersect(other.df))
  def intersectAll(other: FluentTable): FluentTable =
    new FluentTable(df.intersectAll(other.df))

  /** Table.java:925 — every added column needs an alias. */
  def addColumns(fields: String): FluentTable = {
    val items = parseList(fields)
    val added = items.foldLeft(df) { (d, p) =>
      val name = p.alias.getOrElse(fail("addColumns items need 'expr as name'"))
      if (d.columns.contains(name)) fail(s"addColumns: column $name already exists")
      d.withColumn(name, p.col)
    }
    new FluentTable(added)
  }

  /** Table.java:983 — `old as new` pairs. */
  def renameColumns(fields: String): FluentTable = {
    val renamed = parseList(fields).foldLeft(df) { (d, p) =>
      val from = p.fieldName.getOrElse(fail("renameColumns takes 'old as new' pairs"))
      val to = p.alias.getOrElse(fail("renameColumns takes 'old as new' pairs"))
      if (!d.columns.contains(from)) fail(s"renameColumns: unknown column $from")
      d.withColumnRenamed(from, to)
    }
    new FluentTable(renamed)
  }

  /** Table.java:1010. */
  def dropColumns(fields: String): FluentTable = {
    val names = parseList(fields).map(p => p.fieldName.getOrElse(
      fail("dropColumns takes a plain name list")))
    names.foreach(n => if (!df.columns.contains(n))
      fail(s"dropColumns: unknown column $n"))
    new FluentTable(df.drop(names: _*))
  }

  /** Table.java:476 — `f(args) as (n1, n2)` against the registered
    * table-function surface (Udx.register: tokenize, long_tokens).
    * CROSS semantics here; leftOuterJoinLateral keeps empty
    * expansions with nulls (Table.java:566). */
  def joinLateral(call: String): FluentTable = lateral(call, outer = false)
  def leftOuterJoinLateral(call: String): FluentTable = lateral(call, outer = true)

  private val lateralFns: Map[String, Seq[Px] => Column] = Map(
    "tokenize" -> (a => {
      if (a.length != 1) fail("tokenize(text) takes one argument")
      F.filter(
        F.zip_with(
          F.split(a.head.col, " "),
          F.sequence(F.lit(0), F.greatest(F.size(F.split(a.head.col, " ")) - 1, F.lit(0))),
          (t, i) => F.struct(i.as("idx"), t.as("tok"))),
        x => x.isNotNull)
    }),
    "long_tokens" -> (a => {
      if (a.length != 2) fail("long_tokens(text, minLen) takes two arguments")
      F.filter(F.split(a.head.col, " "), t => F.length(t) > a(1).col)
    }))

  private val LateralRe =
    """(?s)\s*([A-Za-z_]\w*)\s*\((.*)\)\s+as\s+\(?\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)?\s*""".r

  private def lateral(call: String, outer: Boolean): FluentTable = call match {
    case LateralRe(name, argsStr, namesStr) =>
      val fn = lateralFns.getOrElse(name.toLowerCase,
        fail(s"unknown table function '$name'; available: ${lateralFns.keys.toSeq.sorted.mkString(", ")}"))
      val args = parseList(argsStr)
      val names = namesStr.split(",").map(_.trim).toSeq
      val arr = fn(args)
      val exploded = if (outer) F.explode_outer(arr) else F.explode(arr)
      val withCol = df.select(F.col("*"), exploded.as("__lat"))
      val expanded = withCol.schema("__lat").dataType match {
        case s: org.apache.spark.sql.types.StructType =>
          if (s.fields.length != names.length)
            fail(s"table function $name produces ${s.fields.length} columns, ${names.length} names given")
          s.fields.zip(names).foldLeft(withCol) { case (d, (f, n)) =>
            d.withColumn(n, F.col(s"__lat.${f.name}"))
          }.drop("__lat")
        case _ =>
          if (names.length != 1)
            fail(s"table function $name produces one column, ${names.length} names given")
          withCol.withColumnRenamed("__lat", names.head)
      }
      new FluentTable(expanded)
    case _ => fail("joinLateral takes 'function(args) as (name, ...)'")
  }
}

/** Reference `GroupWindowedTable` → `WindowGroupedTable`: groupBy must
  * name the window alias; select sees the keys, the aggregates, and
  * the window properties (w.start / w.end as struct fields of the
  * aliased window column). */
final class WindowedFluentTable(df: DataFrame,
                                w: GroupWindows.GroupWindow) {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Table API: $msg")

  def groupBy(fields: String): GroupedFluentTable = {
    val items = TableApi.parseList(fields)
    if (items.exists(_.agg)) fail("aggregates are not allowed in groupBy()")
    if (!items.exists(_.fieldName.contains(w.alias)))
      fail(s"windowed groupBy must reference the window alias '${w.alias}' " +
        "(reference GroupWindowedTable.groupBy contract)")
    val keys = items.map { p =>
      if (p.fieldName.contains(w.alias))
        p.copy(col = w.groupColumn, alias = None)
      else p
    }
    new GroupedFluentTable(df, keys)
  }
}

/** Reference `OverWindowedTable` — the post-window(Over...) select:
  * every aggregate must reference the window (`cents.sum over w`);
  * non-aggregates pass through. Each `agg over w` becomes
  * `agg.over(spec)` on the ONE WindowSpec the window denotes, so the
  * whole select is a single Window operator over one partitioning —
  * exactly the plan hand-written `F.sum(c).over(Window...)` code
  * produces (q30-family machinery). */
final class OverFluentTable(df: DataFrame, w: OverWindows.OverWindow) {
  import TableApi.Px

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Table API: $msg")

  def select(fields: String): FluentTable = {
    if (df.isStreaming)
      fail("OVER windows on a streaming table: Spark has no streaming " +
        "window-function operator — use the engine's stateful forms " +
        "(StatefulOps.boundedRowsOver / boundedRangeOver, q134/q143)")
    val items = TableApi.parseList(fields)
    if (!items.exists(_.overRef.isDefined))
      fail(s"windowed select needs at least one 'agg over ${w.alias}' item")
    val spec = w.spec
    val out = items.zipWithIndex.map { case (p, i) =>
      p.overRef match {
        case Some(a) if a == w.alias =>
          p.col.over(spec).as(p.alias.getOrElse(s"EXPR$$$i"))
        case Some(a) =>
          fail(s"unknown over-window '$a' (this window() defined '${w.alias}')")
        case None if p.agg =>
          fail(s"aggregates in a windowed select must be 'agg over ${w.alias}'")
        case None if p.flattenOf.isDefined =>
          fail("flatten() is not supported in an over-windowed select; " +
            "flatten in a following select step")
        case None => p.named
      }
    }
    new FluentTable(df.select(out: _*))
  }
}

/** Reference `GroupedTable` — the post-groupBy select. */
final class GroupedFluentTable(df: DataFrame,
                               keys: Seq[TableApi.Px]) {
  import TableApi.Px

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Table API: $msg")

  /** GroupedTable.select: key references pass through, aggregates
    * compute — one groupBy().agg() plan in the select list's order.
    * Every aggregate lands in a UNIQUE internal slot and the
    * user-facing name is applied afterwards by position — re-resolving
    * by the user's alias would silently send two same-aliased
    * aggregates to the first one's value, and unaliased aggregates
    * would leak the internal slot name. Unaliased aggregates surface
    * as EXPR$<select-position>, the reference's spelling for unnamed
    * select items. */
  def select(fields: String): FluentTable = {
    val items = TableApi.parseList(fields)
    items.flatMap(_.overRef).headOption.foreach(a => fail(
      s"'over $a' belongs to window(Over...).select, not a grouped select"))
    if (items.exists(_.flattenOf.isDefined))
      fail("flatten() is not supported in a grouped select; " +
        "flatten in a following select step")
    val aggs = items.filter(_.agg)
    if (aggs.isEmpty) fail("grouped select needs at least one aggregate")
    val dup = aggs.flatMap(_.alias).groupBy(identity)
      .collect { case (a, vs) if vs.size > 1 => a }
    if (dup.nonEmpty)
      fail(s"duplicate aggregate alias(es) in grouped select: ${dup.mkString(", ")}")
    val keyCols = keys.map(_.named)
    val aggCols = aggs.zipWithIndex.map { case (p, i) => p.col.as(s"__agg$i") }
    val agged = df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
    var ai = -1
    val out = items.zipWithIndex.map { case (p, i) =>
      if (p.agg) {
        ai += 1
        F.col(s"__agg$ai").as(p.alias.getOrElse(s"EXPR$$$i"))
      } else p.named
    }
    new FluentTable(agged.select(out: _*))
  }
}
