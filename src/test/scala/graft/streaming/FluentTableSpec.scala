package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The fluent Table-API facade (TableApi/FluentTable) — surface not
  * already hash-bound by q270–q272: set ops, column ops, joinLateral,
  * proctime, and the loud rejections. */
class FluentTableSpec extends SparkSpec {

  private def t(name: String) = new FluentTable(name match {
    case "customer" => Tables.customer(spark, sf)
    case "nation"   => Tables.nation(spark, sf)
  })

  private def err(body: => Any): String =
    intercept[IllegalArgumentException](body).getMessage

  test("select/filter/groupBy pipeline matches hand-written DataFrame code") {
    val fluent = t("customer")
      .filter("c_acctbal > 0")
      .groupBy("c_mktsegment")
      .select("c_mktsegment, c_custkey.count as n, (c_acctbal * 100).round(0).cast(LONG).sum as cents")
      .orderBy("c_mktsegment")
      .toDF.collect().toSeq
    val hand = Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 0)
      .groupBy(col("c_mktsegment"))
      .agg(count(col("c_custkey")).as("n"),
        sum(round(col("c_acctbal") * 100, 0).cast("long")).as("cents"))
      .orderBy(col("c_mktsegment"))
      .collect().toSeq
    assert(fluent == hand)
  }

  test("grouped select: unaliased aggregates get EXPR$n; duplicate aliases refuse") {
    // unaliased aggregate output names are the reference's EXPR$<pos>,
    // never the internal agg-slot placeholders
    val out = t("customer").groupBy("c_mktsegment")
      .select("c_mktsegment, c_custkey.count, c_acctbal.min as lo, c_acctbal.max")
      .toDF
    assert(out.columns.toSeq == Seq("c_mktsegment", "EXPR$1", "lo", "EXPR$3"))
    assert(out.columns.forall(!_.startsWith("__agg")))
    // two aggregates under ONE alias must refuse — alias re-resolution
    // would silently hand both the first aggregate's value
    assert(err(t("customer").groupBy("c_mktsegment")
      .select("c_mktsegment, c_acctbal.min as x, c_acctbal.max as x"))
      .contains("duplicate aggregate alias"))
    // and the values still land in the right slots in list order
    val r = t("customer").groupBy("c_mktsegment")
      .select("c_mktsegment, c_custkey.max, c_custkey.min")
      .orderBy("c_mktsegment").toDF.head()
    assert(r.getLong(1) >= r.getLong(2))
  }

  test("global aggregate select (no groupBy) and mixed-select rejection") {
    val r = t("customer").select("c_custkey.count as n, c_acctbal.min as lo")
      .toDF.head()
    assert(r.getLong(0) > 0)
    assert(err(t("customer").select("c_custkey, c_acctbal.sum"))
      .contains("groupBy"))
  }

  test("as/addColumns/renameColumns/dropColumns") {
    val out = t("nation")
      .as("k, name, region")
      .addColumns("name.charLength as len")
      .renameColumns("region as reg")
      .dropColumns("reg")
      .toDF
    assert(out.columns.toSeq == Seq("k", "name", "len"))
    assert(err(t("nation").as("a, b")).contains("names"))
    assert(err(t("nation").addColumns("n_name")).contains("as name"))
    assert(err(t("nation")
      .renameColumns("missing as x")).contains("unknown column"))
    assert(err(t("nation").dropColumns("missing")).contains("unknown column"))
  }

  test("set operations route to the right Spark ops") {
    val a = t("nation").filter("n_nationkey < 10")
    val b = t("nation").filter("n_nationkey >= 5 && n_nationkey < 15")
    assert(a.union(b).toDF.count() == 15)
    assert(a.unionAll(b).toDF.count() == 20)
    assert(a.minus(b).toDF.count() == 5)
    assert(a.intersect(b).toDF.count() == 5)
  }

  test("joinLateral expands registered table functions; outer keeps empties") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val inner = new FluentTable(docs)
      .joinLateral("tokenize(text) as (idx, tok)").toDF
    assert(inner.filter(col("id") === 1).count() == 3)
    assert(inner.filter(col("id") === 3).count() == 0) // null → no rows
    val outerRows = new FluentTable(docs)
      .leftOuterJoinLateral("long_tokens(text, 0) as tok").toDF
    assert(outerRows.filter(col("id") === 3).count() == 1) // kept with null
    assert(err(new FluentTable(docs).joinLateral("nosuch(text) as x"))
      .contains("available"))
  }

  test("rowtime is the attribute itself; proctime is a wall-clock timestamp") {
    import spark.implicits._
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00")))
      .toDF("id", "ts")
    val out = new FluentTable(df)
      .select("id, ts.rowtime as rt, id.proctime as pt").toDF
    assert(out.schema("pt").dataType.typeName == "timestamp")
    val r = out.head()
    assert(r.getTimestamp(1) == java.sql.Timestamp.valueOf("2024-05-01 10:00:00"))
  }

  test("out-of-scope constructs reject loudly with a pointer") {
    assert(err(t("nation").select("n_nationkey.sum over w"))
      .contains("window(Over"))
    assert(err(t("nation").select("5.rows")).contains("Over.preceding"))
    assert(err(t("nation").select("n_name.get(0)")).contains("fieldName"))
    assert(err(t("nation").select("n_name.cast(SQL_TIME)")).contains("TIME"))
    assert(err(t("nation").select("n_name.noSuchFn"))
      .contains("unknown function"))
    assert(err(t("nation").select("n_name.cast(WIBBLE)")).contains("unknown type"))
    assert(err(t("nation").filter("n_nationkey.sum > 5"))
      .contains("not allowed in filter"))
    assert(err(t("nation").groupBy("n_regionkey.sum"))
      .contains("not allowed in groupBy"))
    assert(err(t("nation").select("n_nationkey.sum.distinct.distinct"))
      .contains("distinct"))
    assert(err(t("nation").select("3.minutes.minutes"))
      .contains("numeric literal"))
  }

  test("fluent over windows are plan-equivalent to hand-written WindowSpecs") {
    import OverWindows.Over
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("cents"))
    // ROWS frame — the q30-family machinery through the fluent spelling
    val fluent = new FluentTable(cust)
      .window(Over.partitionBy("c_nationkey").orderBy("c_custkey")
        .preceding("2.rows").as("w"))
      .select("c_custkey, cents.sum over w as s3, cents.count over w as n3")
      .orderBy("c_custkey").toDF.collect().toSeq
    val spec = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
      .rowsBetween(-2, Window.currentRow)
    val hand = cust.select(col("c_custkey"),
        sum(col("cents")).over(spec).as("s3"),
        count(col("cents")).over(spec).as("n3"))
      .orderBy("c_custkey").collect().toSeq
    assert(fluent == hand && fluent.nonEmpty)
    // default frame = UNBOUNDED_RANGE .. CURRENT_RANGE (peer-inclusive)
    val runFluent = new FluentTable(cust)
      .window(Over.partitionBy("c_nationkey").orderBy("c_custkey").as("u"))
      .select("c_custkey, cents.sum over u as run")
      .orderBy("c_custkey").toDF.collect().toSeq
    val runSpec = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val runHand = cust.select(col("c_custkey"),
        sum(col("cents")).over(runSpec).as("run"))
      .orderBy("c_custkey").collect().toSeq
    assert(runFluent == runHand)
    // bounded FOLLOWING row frames work too (batch OVER supports them)
    val fwd = new FluentTable(cust)
      .window(Over.partitionBy("c_nationkey").orderBy("c_custkey")
        .preceding("1.rows").following("1.rows").as("w"))
      .select("c_custkey, cents.sum over w as s")
      .orderBy("c_custkey").toDF.collect().toSeq
    val fwdSpec = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
      .rowsBetween(-1, 1)
    val fwdHand = cust.select(col("c_custkey"),
        sum(col("cents")).over(fwdSpec).as("s"))
      .orderBy("c_custkey").collect().toSeq
    assert(fwd == fwdHand)
  }

  test("over windows: the unsupported forms reject loudly") {
    import OverWindows.Over
    def overT(sel: String, w: OverWindows.OverWindow = Over
        .partitionBy("c_nationkey").orderBy("c_custkey")
        .preceding("2.rows").as("w")) =
      t("customer").window(w).select(sel).toDF
    // UNBOUNDED following — the reference's OverWindow validation
    assert(err(overT("cents.sum over w as s",
      Over.partitionBy("c_nationkey").orderBy("c_custkey")
        .preceding("2.rows").following("unbounded_row").as("w")))
      .contains("UNBOUNDED following"))
    // mixed ROWS/RANGE frame kinds
    assert(err(overT("c_acctbal.sum over w as s",
      Over.partitionBy("c_nationkey").orderBy("c_custkey")
        .preceding("2.rows").following("current_range").as("w")))
      .contains("mixes ROWS and RANGE"))
    // a bare aggregate inside a windowed select must name the window
    assert(err(overT("c_acctbal.sum as s")).contains("over w"))
    // referencing an undefined window alias
    assert(err(overT("c_acctbal.sum over zzz as s")).contains("unknown over-window"))
    // over is only legal through window(Over...)
    assert(err(t("customer").select("c_acctbal.sum over w"))
      .contains("window(Over"))
    assert(err(t("customer").groupBy("c_nationkey")
      .select("c_nationkey, c_acctbal.sum over w")).contains("grouped select"))
    // one window per window() call, like the reference
    val w1 = Over.partitionBy("c_nationkey").orderBy("c_custkey").as("a")
    val w2 = Over.partitionBy("c_nationkey").orderBy("c_custkey").as("b")
    assert(err(t("customer").window(w1, w2)).contains("one window"))
    // malformed bound strings name the accepted grammar
    assert(err(Over.partitionBy("k").orderBy("o").preceding("sideways"))
      .contains("N.rows"))
    // 'over' on a non-aggregate
    assert(err(overT("c_acctbal over w")).contains("applies to an aggregate"))
    // streaming tables reject with a pointer to the stateful forms
    val stream = spark.readStream.format("rate").load()
    assert(err(new FluentTable(stream)
      .window(Over.partitionBy("value").orderBy("timestamp")
        .preceding("2.rows").as("w"))
      .select("value.sum over w as s"))
      .contains("boundedRowsOver"))
  }

  test("get/flatten read struct columns; misuse rejects loudly") {
    import spark.implicits._
    val df = Seq((1L, ("x", 10.0)), (2L, ("y", 20.0)))
      .toDF("id", "s")
    val got = new FluentTable(df)
      .select("id, s.get('_1') as tag, s.get('_2') as v")
      .orderBy("id").toDF.collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))) ==
      Seq((1L, "x", 10.0), (2L, "y", 20.0)))
    val flat = new FluentTable(df).select("id, s.flatten").toDF
    assert(flat.columns.toSeq == Seq("id", "s$_1", "s$_2"))
    // flatten needs a struct
    assert(err(new FluentTable(df).select("id.flatten, id"))
      .contains("struct"))
    // flatten of an unnamed expression
    assert(err(new FluentTable(df).select("(id + 1).flatten"))
      .contains("named struct column"))
    // get by position is refused with the reason
    assert(err(new FluentTable(df).select("s.get(0)"))
      .contains("fieldName"))
  }

  test("Slide/Session fluent windows match the native Spark operators") {
    import spark.implicits._
    import GroupWindows.{Session, Slide}
    val ev = Seq(
      (1L, "2024-05-01 10:00:00", 10.0), (2L, "2024-05-01 10:04:00", 20.0),
      (3L, "2024-05-01 10:21:00", 30.0), (4L, "2024-05-01 11:00:30", 40.0))
      .toDF("id", "tss", "v")
      .select(col("id"), col("tss").cast("timestamp").as("ts"), col("v"))
    val slide = new FluentTable(ev)
      .window(Slide.over("10.minutes").every("5.minutes").on("ts").as("w"))
      .groupBy("w")
      .select("w.start as ws, v.sum as s")
      .orderBy("ws").toDF.collect().toSeq
    val slideHand = ev.groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(sum(col("v")).as("s"))
      .select(col("w.start").as("ws"), col("s"))
      .orderBy("ws").collect().toSeq
    assert(slide == slideHand && slide.nonEmpty)
    val sess = new FluentTable(ev)
      .window(Session.withGap("10.minutes").on("ts").as("w"))
      .groupBy("w")
      .select("w.start as ws, w.end as we, id.count as n")
      .orderBy("ws").toDF.collect().toSeq
    val sessHand = ev.groupBy(session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(col("id")).as("n"))
      .select(col("w.start").as("ws"), col("w.end").as("we"), col("n"))
      .orderBy("ws").collect().toSeq
    assert(sess == sessHand && sess.size == 3)
    // contract: windowed groupBy must name the window alias
    assert(err(new FluentTable(ev)
      .window(Session.withGap("10.minutes").on("ts").as("w"))
      .groupBy("id")).contains("window alias"))
    // bad duration is loud
    assert(err(GroupWindows.Tumble.over("ten.minutes").on("ts").as("w")
      .groupColumn).contains("duration"))
  }

  test("literal forms: typed numbers, quoted strings with escapes, Null") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    val out = new FluentTable(df).select(
      "12L as a, 1.5f as b, 2.5d as c, 'It''s' as d, \"a \"\"b\"\"\" as e, " +
        "true as f, Null(LONG) as g, -3 as h").toDF.head()
    assert(out.getLong(0) == 12L)
    assert(out.getFloat(1) == 1.5f)
    assert(out.getDouble(2) == 2.5)
    assert(out.getString(3) == "It's")
    assert(out.getString(4) == "a \"b\"")
    assert(out.getBoolean(5))
    assert(out.isNullAt(6))
    assert(out.getInt(7) == -3)
  }

  test("trim modes and interval arithmetic parse to the right Columns") {
    import spark.implicits._
    val df = Seq(("--x--", java.sql.Timestamp.valueOf("2024-05-01 10:00:00")))
      .toDF("s", "ts")
    val r = new FluentTable(df).select(
      "s.trim(LEADING, '-') as l, s.trim(TRAILING, '-') as r2, " +
        "s.trim(BOTH, '-') as b, trim(LEADING, '-', s) as pl, " +
        "ts + 2.hours as t2, ts + 1.days as t3").toDF.head()
    assert(r.getString(0) == "x--" && r.getString(1) == "--x" &&
      r.getString(2) == "x" && r.getString(3) == "x--")
    assert(r.getTimestamp(4) == java.sql.Timestamp.valueOf("2024-05-01 12:00:00"))
    assert(r.getTimestamp(5) == java.sql.Timestamp.valueOf("2024-05-02 10:00:00"))
  }
}
