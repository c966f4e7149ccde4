package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec

/** MEASURES — MATCH_RECOGNIZE's declarative output clause compiled
  * into match emission (reference StreamExecMatch.scala:69 /
  * FlinkSqlOperatorTable.java:944+): FIRST/LAST/COUNT/SUM/AVG over
  * step bindings replace hand-written extraction lambdas. */
class CepMeasuresSpec extends SparkSpec {

  private def ev(id: Long, tsSec: Long, user: Long, t: String, v: Double = 0.0) =
    Event(id, new Timestamp(tsSec * 1000), user, t, v, "{}")

  test("measures project first/last/count/sum/avg over loop bindings") {
    val spark2 = spark; import spark2.implicits._
    val pat = CepDsl.compile[Event]("A+ B within 1h", Map(
      "A" -> ((e, _) => e.event_type == "view"),
      "B" -> ((e, _) => e.event_type == "purchase")))
    val ms = CepDsl.compileMeasures[Event](
      "first(A.event_id) AS first_view, last(A.event_id) AS last_view, " +
        "count(A) AS n_views, sum(A.value) AS sum_v, avg(A.value) AS avg_v, " +
        "first(B.event_id) AS purchase_id",
      Event.fieldTable)
    // user 1: views 1,2 (values 1.0, 3.0) then purchase 3 — the
    // reluctant loop yields matches for view-sets {1,2}, {1}, {2}
    val ds = spark.createDataset(Seq(
      ev(1, 10, 1, "view", 1.0), ev(2, 20, 1, "view", 3.0),
      ev(3, 30, 1, "purchase")))
    val rows = Cep.selectMeasures(Cep.matchBatchSorted(ds, pat), "user_id", ms)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getLong(6))).toSet
    assert(rows == Set(
      (1L, 2L, 2L, 4.0, 2.0, 3L),   // {A1 A2}: first=1 last=2 sum=4 avg=2
      (1L, 1L, 1L, 1.0, 1.0, 3L),   // {A1}
      (2L, 2L, 1L, 3.0, 3.0, 3L)),  // {A2}
      s"got $rows")
  }

  test("measures over an unbound optional step yield NULL / zero") {
    val spark2 = spark; import spark2.implicits._
    val pat = CepDsl.compile[Event]("A B? C", Map(
      "A" -> ((e, _) => e.event_type == "view"),
      "B" -> ((e, _) => e.event_type == "click"),
      "C" -> ((e, _) => e.event_type == "purchase")))
    val ms = CepDsl.compileMeasures[Event](
      "first(B.event_id) AS b_id, count(B) AS n_b, avg(B.value) AS avg_b",
      Event.fieldTable)
    val ds = spark.createDataset(Seq(ev(1, 10, 7, "view"), ev(2, 20, 7, "purchase")))
    val out = Cep.selectMeasures(Cep.matchBatchSorted(ds, pat), "user_id", ms)
      .collect()
    val unbound = out.filter(_.isNullAt(1))
    assert(unbound.nonEmpty, "the B-unbound match must appear")
    assert(unbound.head.getLong(2) == 0L, "count of unbound step = 0")
    assert(unbound.head.isNullAt(3), "avg of unbound step = NULL")
  }

  test("max/min measures and the inert RUNNING/FINAL prefix") {
    val pat = CepDsl.compile[Event]("A+ B within 1h", Map(
      "A" -> ((e, _) => e.event_type == "view"),
      "B" -> ((e, _) => e.event_type == "purchase")))
    // RUNNING/FINAL parse and coincide: one row per COMPLETED match
    // (the reference's only mode — Flink rejects ALL ROWS PER MATCH,
    // StreamExecMatch.scala:389 — and SQL:2016 defines RUNNING=FINAL
    // in ONE ROW PER MATCH)
    val ms = CepDsl.compileMeasures[Event](
      "FINAL max(A.value) AS mx, RUNNING min(A.value) AS mn, " +
        "max(A.event_id) AS mxid, count(A) AS n",
      Event.fieldTable)
    val spark2 = spark; import spark2.implicits._
    val ds = spark.createDataset(Seq(
      ev(1, 10, 1, "view", 5.0), ev(2, 20, 1, "view", 2.0),
      ev(3, 30, 1, "purchase")))
    val rows = Cep.selectMeasures(Cep.matchBatchSorted(ds, pat), "user_id", ms)
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toSet
    assert(rows == Set(
      (5.0, 2.0, 2L, 2L),  // {A1 A2}
      (5.0, 5.0, 1L, 1L),  // {A1}
      (2.0, 2.0, 2L, 1L)), // {A2}
      s"got $rows")
  }

  test("malformed measures are rejected") {
    intercept[IllegalArgumentException] {
      CepDsl.compileMeasures[Event]("first(A.nope) AS x", Event.fieldTable)
    }
    intercept[IllegalArgumentException] {
      CepDsl.compileMeasures[Event]("count(A.event_id) AS x", Event.fieldTable)
    }
    intercept[IllegalArgumentException] {
      CepDsl.compileMeasures[Event]("sum(A.event_type) AS x", Event.fieldTable)
    }
    intercept[IllegalArgumentException] {
      CepDsl.compileMeasures[Event]("median(A.value) AS x", Event.fieldTable)
    }
    intercept[IllegalArgumentException] {
      CepDsl.compileMeasures[Event]("sum(A) AS x", Event.fieldTable)
    }
  }
}
