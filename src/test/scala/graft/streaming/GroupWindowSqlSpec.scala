package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The Flink-SQL group-window dialect rewriter (q208's front-end):
  * each assigner's SQL text must land on exactly the rows of the
  * native DataFrame `groupBy(window(…))` form, and anything outside
  * the dialect must fail loudly at rewrite time. */
class GroupWindowSqlSpec extends SparkSpec {

  private lazy val ev = {
    val df = Tables.events(spark, sf)
    df.createOrReplaceTempView("events")
    df
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("TUMBLE lands on the native window() aggregation") {
    ev // register the view before spark.sql analyzes
    val viaSql = GroupWindowSql.run(spark,
      """SELECT event_type, TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws,
        |       TUMBLE_END(ts, INTERVAL '1' HOUR) AS we, COUNT(*) AS n
        |FROM events GROUP BY event_type, TUMBLE(ts, INTERVAL '1' HOUR)""".stripMargin)
    val native = ev.groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("window.start").as("ws"),
        col("window.end").as("we"), col("n"))
    assert(rows(viaSql) == rows(native))
  }

  test("HOP maps (slide, size) onto window(size, slide)") {
    ev
    val viaSql = GroupWindowSql.run(spark,
      """SELECT HOP_START(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR) AS ws,
        |       COUNT(*) AS n
        |FROM events GROUP BY HOP(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR)""".stripMargin)
    val native = ev.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    assert(rows(viaSql) == rows(native))
    // 4 hop windows per event: total count across windows = 4 × rows
    assert(viaSql.agg(sum("n")).head.getLong(0) == 4 * ev.count())
  }

  test("SESSION lands on the native session_window() aggregation") {
    ev
    val viaSql = GroupWindowSql.run(spark,
      """SELECT user_id, SESSION_START(ts, INTERVAL '30' MINUTE) AS ws,
        |       SESSION_END(ts, INTERVAL '30' MINUTE) AS we, COUNT(*) AS n
        |FROM events GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)""".stripMargin)
    val native = ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("ws"),
        col("session_window.end").as("we"), col("n"))
    assert(rows(viaSql) == rows(native))
  }

  test("ROWTIME auxiliary is the window's inclusive max (end - 1ms)") {
    ev
    val df = GroupWindowSql.run(spark,
      """SELECT TUMBLE_END(ts, INTERVAL '1' DAY) AS we,
        |       TUMBLE_ROWTIME(ts, INTERVAL '1' DAY) AS rt
        |FROM events GROUP BY TUMBLE(ts, INTERVAL '1' DAY)""".stripMargin)
    assert(df.filter(expr("rt <> we - INTERVAL 1 MILLISECOND")).isEmpty)
  }

  test("the rewritten SQL text runs as a watermarked STREAMING query") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def e(id: Long, tSec: Long, typ: String) =
      Event(id, new Timestamp(tSec * 1000), 1L, typ, 0.0, "{}")
    val ms = MemoryStream[Event]
    ms.toDF().withWatermark("ts", "10 seconds")
      .createOrReplaceTempView("events_stream")
    val agg = GroupWindowSql.run(spark,
      """SELECT event_type, TUMBLE_START(ts, INTERVAL '1' MINUTE) AS ws,
        |       COUNT(*) AS n
        |FROM events_stream
        |GROUP BY event_type, TUMBLE(ts, INTERVAL '1' MINUTE)""".stripMargin)
    assert(agg.isStreaming, "the front-end must preserve streaming-ness")
    val q = agg.select(col("event_type"), col("ws").cast("long").as("ws"), col("n"))
      .writeStream.format("memory").queryName("gwsql").outputMode("append").start()
    try {
      ms.addData(e(1, 10, "a"), e(2, 20, "a"), e(3, 30, "b"))
      q.processAllAvailable()
      ms.addData(e(4, 130, "a")) // watermark 120 closes minute 0
      q.processAllAvailable()
      ms.addData(e(5, 400, "a")) // closes minute 2
      q.processAllAvailable()
      val got = spark.table("gwsql").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(("a", 0L, 2L), ("b", 0L, 1L), ("a", 120L, 1L)))
    } finally q.stop()
  }

  test("dialect shim: CAST AS VARCHAR") {
    assert(GroupWindowSql.rewrite("SELECT CAST(user_id AS VARCHAR) FROM events")
      .contains("AS STRING"))
  }

  test("loud rejections: PROCTIME, year windows, unconsumed assigners") {
    ev // force view registration
    intercept[IllegalArgumentException] {
      GroupWindowSql.rewrite(
        "SELECT TUMBLE_PROCTIME(ts, INTERVAL '1' HOUR) FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)")
    }
    intercept[IllegalArgumentException] {
      GroupWindowSql.rewrite(
        "SELECT 1 FROM events GROUP BY TUMBLE(ts, INTERVAL '1' YEAR)")
    }
    intercept[IllegalArgumentException] {
      // malformed interval → assigner not consumed → leftover check
      GroupWindowSql.rewrite("SELECT 1 FROM events GROUP BY TUMBLE(ts, 3600)")
    }
  }

  test("assigner spellings inside string literals are data, not syntax") {
    val s = "SELECT 'docs: TUMBLE(ts, INTERVAL ''1'' HOUR) and AS VARCHAR' AS note FROM t"
    assert(GroupWindowSql.rewrite(s) == s)
    // and a literal next to a REAL assigner survives verbatim
    val r = GroupWindowSql.rewrite(
      "SELECT 'HOP( stays', TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws " +
        "FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)")
    assert(r.contains("'HOP( stays'") && r.contains("window(ts, '1 hour')"))
  }
}
