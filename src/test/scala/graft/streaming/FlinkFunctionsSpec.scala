package graft.streaming

import graft.SparkSpec

/** The Flink-SQL scalar-function dialect (q260's front-end): every
  * translated spelling must compute the reference semantics
  * (`SqlFunctionUtils.java` / `SqlDateTimeUtils.java`), and forms the
  * rewriter does not understand must fail loudly at rewrite time. */
class FlinkFunctionsSpec extends SparkSpec {

  private def one(sql: String): Any =
    FlinkFunctions.run(spark, sql).collect()(0).get(0)

  // ---- FLOOR / CEIL to unit ----------------------------------------

  test("FLOOR(ts TO HOUR) truncates; CEIL rounds up unless aligned") {
    assert(one("SELECT CAST(FLOOR(TIMESTAMP'2020-01-01 10:23:45' TO HOUR) AS STRING)")
      == "2020-01-01 10:00:00")
    assert(one("SELECT CAST(CEIL(TIMESTAMP'2020-01-01 10:23:45' TO HOUR) AS STRING)")
      == "2020-01-01 11:00:00")
    // already aligned: CEIL is the identity (not +1 unit)
    assert(one("SELECT CAST(CEIL(TIMESTAMP'2020-01-01 10:00:00' TO HOUR) AS STRING)")
      == "2020-01-01 10:00:00")
    assert(one("SELECT CAST(FLOOR(TIMESTAMP'2020-02-15 10:23:45' TO MONTH) AS STRING)")
      == "2020-02-01 00:00:00")
    assert(one("SELECT CAST(CEIL(TIMESTAMP'2020-02-15 10:23:45' TO MONTH) AS STRING)")
      == "2020-03-01 00:00:00")
  }

  test("plain numeric FLOOR/CEIL pass through untouched") {
    assert(one("SELECT FLOOR(2.7)") == java.math.BigDecimal.valueOf(2))
    assert(one("SELECT CEIL(2.2)") == java.math.BigDecimal.valueOf(3))
  }

  test("unsupported FLOOR unit fails loudly") {
    val e = intercept[IllegalArgumentException](
      FlinkFunctions.rewrite("SELECT FLOOR(ts TO MILLENNIUM) FROM t"))
    assert(e.getMessage.contains("MILLENNIUM"))
  }

  // ---- SIMILAR TO --------------------------------------------------

  test("SIMILAR TO: %/_ wildcards, regex-ish metachars, literal dots") {
    assert(one("SELECT 'abcd' SIMILAR TO 'a%'") == true)
    assert(one("SELECT 'abcd' SIMILAR TO 'a_cd'") == true)
    assert(one("SELECT 'abcd' SIMILAR TO 'a_d'") == false)
    // ( | ) keep their branching meaning per the SQL spec
    assert(one("SELECT 'ad' SIMILAR TO '(ab|a)d'") == true)
    // a dot is LITERAL in SIMILAR TO (unlike LIKE's regex cousins)
    assert(one("SELECT 'axb' SIMILAR TO 'a.b'") == false)
    assert(one("SELECT 'a.b' SIMILAR TO 'a.b'") == true)
    // anchored both ends: a partial match is not a match
    assert(one("SELECT 'xabcx' SIMILAR TO 'abc'") == false)
    assert(one("SELECT 'abc' NOT SIMILAR TO 'z%'") == true)
  }

  test("SIMILAR TO … ESCAPE rejects loudly") {
    val e = intercept[IllegalArgumentException](
      FlinkFunctions.rewrite("SELECT x SIMILAR TO 'a!%' ESCAPE '!' FROM t"))
    assert(e.getMessage.contains("ESCAPE"))
  }

  test("non-literal SIMILAR TO pattern rejects via the leftover valve") {
    val e = intercept[IllegalArgumentException](
      FlinkFunctions.rewrite("SELECT a SIMILAR TO b FROM t"))
    assert(e.getMessage.contains("SIMILAR"))
  }

  // ---- TRUNCATE ----------------------------------------------------

  test("TRUNCATE rounds toward zero (reference RoundingMode.DOWN)") {
    assert(one("SELECT CAST(TRUNCATE(42.345, 2) AS DOUBLE)") == 42.34)
    assert(one("SELECT CAST(TRUNCATE(-42.345, 2) AS DOUBLE)") == -42.34)
    assert(one("SELECT CAST(TRUNCATE(42.999) AS DOUBLE)") == 42.0)
    assert(one("SELECT TRUNCATE(CAST(-3.99 AS DOUBLE), 0)") == -3.0)
  }

  test("TRUNCATE digits must be a non-negative literal") {
    assert(intercept[IllegalArgumentException](
      FlinkFunctions.rewrite("SELECT TRUNCATE(x, -1) FROM t"))
      .getMessage.contains("negative"))
    assert(intercept[IllegalArgumentException](
      FlinkFunctions.rewrite("SELECT TRUNCATE(x, d) FROM t"))
      .getMessage.contains("literal"))
  }

  // ---- base64 ------------------------------------------------------

  test("TO_BASE64/FROM_BASE64 round-trip as STRING (reference types)") {
    assert(one("SELECT TO_BASE64('hello')") == "aGVsbG8=")
    assert(one("SELECT FROM_BASE64('aGVsbG8=')") == "hello")
    assert(one("SELECT FROM_BASE64(TO_BASE64('nested calls'))") == "nested calls")
  }

  // ---- SPLIT_INDEX -------------------------------------------------

  test("SPLIT_INDEX: 0-based, all tokens preserved, out-of-range NULL") {
    assert(one("SELECT SPLIT_INDEX('a,b,c', ',', 1)") == "b")
    assert(one("SELECT SPLIT_INDEX('a,,c', ',', 1)") == "")     // empty token kept
    assert(one("SELECT SPLIT_INDEX('a,b,c,', ',', 3)") == "")   // trailing kept
    assert(one("SELECT SPLIT_INDEX('a,b,c', ',', 9)") == null)
    assert(one("SELECT SPLIT_INDEX('a,b,c', ',', -1)") == null) // reference: <0 → null
    // separator is VERBATIM, not a regex: '.' splits on dots only
    assert(one("SELECT SPLIT_INDEX('a.b.c', '.', 2)") == "c")
    assert(one("SELECT SPLIT_INDEX('a|b', '|', 0)") == "a")
  }

  test("SPLIT_INDEX with a non-literal separator rejects loudly") {
    val e = intercept[IllegalArgumentException](
      FlinkFunctions.rewrite("SELECT SPLIT_INDEX(s, sep, 0) FROM t"))
    assert(e.getMessage.contains("literal"))
  }

  // ---- IS_* predicates ---------------------------------------------

  test("IS_ALPHA / IS_DIGIT / IS_DECIMAL follow SqlFunctionUtils") {
    assert(one("SELECT IS_ALPHA('abc')") == true)
    assert(one("SELECT IS_ALPHA('ab1')") == false)
    assert(one("SELECT IS_ALPHA('')") == false)
    assert(one("SELECT IS_ALPHA(CAST(NULL AS STRING))") == false)
    assert(one("SELECT IS_DIGIT('0123')") == true)
    assert(one("SELECT IS_DIGIT('12.3')") == false)
    assert(one("SELECT IS_DIGIT('')") == false)
    assert(one("SELECT IS_DECIMAL('12.5')") == true)
    assert(one("SELECT IS_DECIMAL('-3e10')") == true)
    assert(one("SELECT IS_DECIMAL('+7')") == true)
    assert(one("SELECT IS_DECIMAL('12x')") == false)
    assert(one("SELECT IS_DECIMAL('')") == false)
  }

  // ---- SHA-2 family ------------------------------------------------

  test("SHA256 lands on sha2(x, 256)") {
    assert(one("SELECT SHA256('x')") == one("SELECT sha2('x', 256)"))
    assert(one("SELECT SHA512('x')") == one("SELECT sha2('x', 512)"))
  }

  // ---- CONVERT_TZ --------------------------------------------------

  test("CONVERT_TZ re-zones and formats to yyyy-MM-dd HH:mm:ss") {
    assert(one("SELECT CONVERT_TZ('2020-06-01 12:00:00', 'UTC', 'Asia/Shanghai')")
      == "2020-06-01 20:00:00")
    assert(one("SELECT CONVERT_TZ('2020-06-01 12:00:00', 'America/New_York', 'UTC')")
      == "2020-06-01 16:00:00")
  }

  // ---- RAND_INTEGER (nondeterministic: invariants only) ------------

  test("RAND_INTEGER stays within [0, bound)") {
    val vals = FlinkFunctions.run(spark,
      "SELECT RAND_INTEGER(10) AS r FROM range(1000)").collect().map(_.getInt(0))
    assert(vals.forall(v => v >= 0 && v < 10))
    assert(vals.distinct.length > 3) // actually random, not constant
  }

  // ---- STR_TO_MAP default-delimiter shim ---------------------------

  test("1-arg STR_TO_MAP uses the reference ','/'=' defaults") {
    assert(one("SELECT STR_TO_MAP('a=1,b=2')['b']") == "2")
    // Spark's own default would have parsed NOTHING from 'a=1' (its
    // kv delimiter is ':'); the shim must not touch explicit forms
    assert(one("SELECT STR_TO_MAP('a:1;b:2', ';', ':')['b']") == "2")
  }

  // ---- plumbing ----------------------------------------------------

  test("identity on SQL that uses none of the dialect") {
    val sql = "SELECT floor(a), ceil(b), substring(c, 1, 2) FROM t WHERE d LIKE 'x%'"
    assert(FlinkFunctions.rewrite(sql) == sql)
  }

  test("dialect spellings INSIDE string literals are data, not calls") {
    // neither rewritten nor rejected by the leftover valve
    val s1 = "SELECT 'see SHA256(x) and TRUNCATE(1) docs' AS note FROM t"
    assert(FlinkFunctions.rewrite(s1) == s1)
    val s2 = "SELECT 'a SIMILAR TO ''b''' AS note FROM t"
    assert(FlinkFunctions.rewrite(s2) == s2)
    // a real call NEXT TO such a literal still rewrites — and the
    // literal survives verbatim
    val s3 = FlinkFunctions.rewrite(
      "SELECT SHA256(name) AS h, 'keep SHA384( text' AS note FROM t")
    assert(s3.contains("sha2(name, 256)") && s3.contains("'keep SHA384( text'"))
    // end-to-end through the engine
    assert(one("SELECT 'x TRUNCATE(9) y'") == "x TRUNCATE(9) y")
  }

  test("a rewritten literal containing a quote keeps later passes seeing") {
    // sqlLit must escape quotes by DOUBLING: a backslash-escaped
    // quote would flip quote parity and blind every later pass —
    // here SIMILAR TO rewrites first and SHA256 must STILL rewrite
    val out = FlinkFunctions.rewrite(
      "SELECT name SIMILAR TO 'it''s%' AS m, SHA256(name) AS h FROM t")
    assert(out.contains("sha2(name, 256)"), out)
    assert(!out.contains("\\'"), out)
    // and end-to-end: a quoted separator through SPLIT_INDEX, then a
    // later dialect call on the same statement
    assert(one("SELECT SPLIT_INDEX('a''b', '''', 1) || TO_BASE64('z')")
      == "b" + java.util.Base64.getEncoder.encodeToString("z".getBytes))
  }

  test("the unified executeSql surface routes the dialect") {
    val env = new FlinkSql.Env(spark)
    val df = env.executeSql(
      "SELECT SPLIT_INDEX('x;y;z', ';', 2) AS v, TO_BASE64('q') AS b").get
    val r = df.collect()(0)
    assert(r.getString(0) == "z" && r.getString(1) == "cQ==")
  }
}
