package graft.streaming

import graft.SparkSpec

/** Parser/rewriter contract for the temporal-join and LATERAL TABLE
  * SQL-text front-ends (oracle rows q222–q224 bind the semantics;
  * these pin the dialect handling and the loud rejections). */
class FlinkSqlJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("lateral rewrite: comma correlate, multi-column → inline") {
    val got = FlinkSqlJoins.rewriteLateral(
      "SELECT a, t.x, t.y FROM d, LATERAL TABLE(f(b, 2)) AS t(x, y) WHERE a > 0")
    assert(got ==
      "SELECT a, t.x, t.y FROM d LATERAL VIEW inline(f(b, 2)) t AS x, y WHERE a > 0")
  }

  test("lateral rewrite: LEFT JOIN ... ON TRUE → OUTER, single col → explode") {
    val got = FlinkSqlJoins.rewriteLateral(
      "SELECT a, t.x FROM d LEFT JOIN LATERAL TABLE(f(b)) t(x) ON TRUE")
    assert(got == "SELECT a, t.x FROM d LATERAL VIEW OUTER explode(f(b)) t AS x")
  }

  test("lateral rewrite: nested parens in args survive") {
    val got = FlinkSqlJoins.rewriteLateral(
      "SELECT t.x FROM d, LATERAL TABLE(f(concat(a, b), 3)) AS t(x)")
    assert(got.contains("explode(f(concat(a, b), 3)) t AS x"))
  }

  test("lateral rewrite rejects LEFT JOIN without ON TRUE") {
    val e = intercept[IllegalArgumentException] {
      FlinkSqlJoins.rewriteLateral(
        "SELECT a FROM d LEFT JOIN LATERAL TABLE(f(b)) t(x)")
    }
    assert(e.getMessage.contains("ON TRUE"))
  }

  test("lateral rewrite rejects forms it did not consume") {
    val e = intercept[IllegalArgumentException] {
      FlinkSqlJoins.rewriteLateral(
        "SELECT a FROM d FULL JOIN LATERAL TABLE(f(b)) t(x) ON TRUE")
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("temporal join executes the documented as-of semantics") {
    Seq((1L, 10L, 100L), (1L, 20L, 200L))
      .toDF("user_id", "event_id", "us")
      .selectExpr("user_id", "event_id", "timestamp_micros(us) AS ts")
      .createOrReplaceTempView("lefts")
    // versions at 50, 150 (+ a same-ts pair at 150 → highest event_id wins)
    Seq((1L, 1L, 50L), (1L, 2L, 150L), (1L, 3L, 150L))
      .toDF("user_id", "event_id", "us")
      .selectExpr("user_id", "event_id", "timestamp_micros(us) AS ts")
      .createOrReplaceTempView("versions")
    val got = FlinkSqlJoins.runTemporal(spark,
      """SELECT o.event_id AS oid, r.event_id AS vid
        |FROM lefts o JOIN versions FOR SYSTEM_TIME AS OF o.ts AS r
        |ON o.user_id = r.user_id ORDER BY oid""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, 1L), (20L, 3L)))
  }

  test("temporal join rejects an AS OF attribute from the right side") {
    val e = intercept[IllegalArgumentException] {
      FlinkSqlJoins.runTemporal(spark,
        """SELECT o.event_id FROM lefts o
          |JOIN versions FOR SYSTEM_TIME AS OF r.ts AS r
          |ON o.user_id = r.user_id""".stripMargin)
    }
    assert(e.getMessage.contains("left input"))
  }

  test("temporal join rejects a versioned table without the time column") {
    Seq((1L, 5L)).toDF("user_id", "event_id")
      .createOrReplaceTempView("versions_nots")
    val e = intercept[IllegalArgumentException] {
      FlinkSqlJoins.runTemporal(spark,
        """SELECT o.event_id FROM lefts o
          |JOIN versions_nots FOR SYSTEM_TIME AS OF o.ts AS r
          |ON o.user_id = r.user_id""".stripMargin)
    }
    assert(e.getMessage.contains("event-time column"))
  }
}
