package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec

/** SQL-text MATCH_RECOGNIZE front-end: clause parsing, quantifier/
  * greediness translation, DEFINE expression compilation, contiguity
  * modes, and end-to-end equivalence with the hand-built DSL form. */
class MatchRecognizeSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double = 0.0) =
    Event(id, new Timestamp(tSec * 1000), user, typ, v, "{}")

  private def matches(pat: Cep.Pattern[Event], skip: Cep.AfterMatchSkip,
                      events: Event*): List[Map[String, Vector[Long]]] = {
    val sorted = events.toList.sortBy(e => (Event.micros(e.ts), e.event_id))
      .map(e => (Event.micros(e.ts), e))
    Cep.advance(pat, Nil, sorted.iterator, skip)._1
      .map(_.view.mapValues(_.map(_.event_id)).toMap)
  }

  private val base = """
    MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts
      MEASURES first(A.event_id) AS a_id, first(B.event_id) AS b_id
      %s
      PATTERN (%s) %s
      DEFINE %s
    )"""

  test("clause parsing: skip strategies, within, partition key") {
    def parsed(skipClause: String) = MatchRecognize.parse(base.format(
      skipClause, "A B", "WITHIN INTERVAL '10' MINUTE",
      "A AS A.event_type = 'view', B AS B.event_type = 'purchase'"))
    assert(parsed("").skip == Cep.NoSkip)
    assert(parsed("AFTER MATCH SKIP PAST LAST ROW").skip == Cep.SkipPastLastEvent)
    assert(parsed("AFTER MATCH SKIP TO NEXT ROW").skip == Cep.SkipToNext)
    assert(parsed("AFTER MATCH SKIP TO FIRST A").skip == Cep.SkipToFirst("A"))
    assert(parsed("AFTER MATCH SKIP TO LAST A").skip == Cep.SkipToLast("A"))
    val p = parsed("")
    assert(p.partitionBy == "user_id")
    assert(p.pattern.withinUs == 600000000L)
    assert(p.pattern.steps.map(_.name) == Vector("A", "B"))
  }

  test("quantifier translation: SQL greedy default, ? reluctant") {
    def pat(patSrc: String) = MatchRecognize.parse(base.format(
      "", patSrc, "", "A AS A.event_type = 'view', B AS B.event_type = 'purchase'"))
      .pattern
    val greedyLoop = pat("A+ B").steps.head
    assert(greedyLoop.oneOrMore && greedyLoop.greedy)
    val reluctantLoop = pat("A+? B").steps.head
    assert(reluctantLoop.oneOrMore && !reluctantLoop.greedy)
    val opt = pat("A? B").steps.head
    assert(opt.optional && !opt.oneOrMore)
    val times = pat("A{2,4} B").steps.head
    assert(times.times == 2 && times.timesMax == 4 && times.greedy)
    val timesReluctant = pat("A{2,4}? B").steps.head
    assert(timesReluctant.times == 2 && !timesReluctant.greedy)
    val timesOrMore = pat("A{3,} B").steps.head
    assert(timesOrMore.times == 3 && timesOrMore.oneOrMore && timesOrMore.greedy)
  }

  test("unsupported surface is rejected loudly") {
    def bad(patSrc: String) = intercept[IllegalArgumentException] {
      MatchRecognize.parse(base.format("", patSrc, "",
        "A AS A.event_type = 'view', B AS B.event_type = 'purchase'"))
    }
    // alternation (CepAlternationSpec) and `*` (CepStarSpec) are
    // supported now; the remaining rejections are quantified
    // alternatives + PERMUTE + exclusions — the same surface the
    // reference rejects (Flink MATCH_RECOGNIZE supports neither).
    assert(bad("A|B+ C").getMessage.contains("ambiguous"))
    assert(bad("PERMUTE(A,B)").getMessage.contains("PERMUTE"))
    assert(bad("A {- B -} C").getMessage.contains("exclusions"))
    val noVar = intercept[IllegalArgumentException] {
      MatchRecognize.parse(base.format("", "A B", "",
        "A AS A.event_type = 'view', C AS C.event_type = 'x'"))
    }
    assert(noVar.getMessage.contains("not in PATTERN"))
  }

  test("DEFINE expressions: literals, AND/OR/NOT, cross-variable refs") {
    val p = MatchRecognize.compileExpr(
      "A.event_type = 'view' AND (A.value > 10 OR NOT A.value >= 1)", "A")
    assert(p(ev(1, 10, 1, "view", 20.0), Map.empty))
    assert(p(ev(1, 10, 1, "view", 0.5), Map.empty))  // NOT value>=1
    assert(!p(ev(1, 10, 1, "view", 5.0), Map.empty)) // 1<=5<=10
    assert(!p(ev(1, 10, 1, "click", 20.0), Map.empty))
    // cross-variable ref reads the LAST binding of that variable
    val q = MatchRecognize.compileExpr("B.value > A.value", "B")
    val bound = Map("A" -> Vector(ev(1, 10, 1, "view", 3.0), ev(2, 11, 1, "view", 7.0)))
    assert(q(ev(3, 12, 1, "purchase", 8.0), bound))  // 8 > last(A)=7
    assert(!q(ev(3, 12, 1, "purchase", 5.0), bound)) // 5 < 7
    assert(!q(ev(3, 12, 1, "purchase", 8.0), Map.empty)) // absent binding
    // undefined pattern variable matches any row
    val anyVar = MatchRecognize.parse(base.format("", "A B", "",
      "A AS A.event_type = 'view'")).pattern
    assert(anyVar.steps(1).pred(ev(9, 9, 9, "whatever"), Map.empty))
  }

  test("relaxed vs strict contiguity") {
    val defs = "A AS A.event_type = 'view', B AS B.event_type = 'purchase'"
    val events = Seq(
      ev(1, 10, 1, "view"), ev(2, 11, 1, "click"), ev(3, 12, 1, "purchase"))
    // relaxed: the click between is skipped
    val rel = MatchRecognize.parse(base.format("", "A B", "", defs)).pattern
    assert(matches(rel, Cep.NoSkip, events: _*) ==
      List(Map("A" -> List(1L), "B" -> List(3L))))
    // strict: PATTERN adjacency is row-contiguous — the click kills it
    val str = MatchRecognize.parse(base.format("", "A B", "", defs),
      MatchRecognize.Strict).pattern
    assert(str.steps(1).strict)
    assert(matches(str, Cep.NoSkip, events: _*).isEmpty)
    assert(matches(str, Cep.NoSkip,
      ev(1, 10, 1, "view"), ev(3, 11, 1, "purchase")) ==
      List(Map("A" -> List(1L), "B" -> List(3L))))
    // strict loops become consecutive
    val loop = MatchRecognize.parse(base.format("", "A+ B", "", defs),
      MatchRecognize.Strict).pattern
    assert(loop.steps.head.loopConsecutive && loop.steps.head.greedy)
  }

  test("SQL text end-to-end equals the hand-built DSL (q110 shape)") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ev(1, 100, 1, "view"), ev(2, 200, 1, "view"), ev(3, 300, 1, "purchase"),
      ev(4, 500, 1, "view"), ev(5, 10000, 1, "purchase"),
      ev(6, 100, 2, "view"), ev(7, 150, 2, "purchase"))
    val ds = events.toDS()
    val sql = """
      MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES first(A.event_id) AS first_view, last(A.event_id) AS last_view,
                 count(A) AS n_views, first(B.event_id) AS purchase_id
        PATTERN (A+? B) WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type = 'view', B AS B.event_type = 'purchase'
      )"""
    val viaSql = MatchRecognize.run(ds, sql)
      .orderBy("user_id", "first_view", "last_view").collect().toSeq
    val pat = CepDsl.compile[Event]("A+ B within 1h", Map(
      "A" -> ((e, _) => e.event_type == "view"),
      "B" -> ((e, _) => e.event_type == "purchase")))
    val ms = CepDsl.compileMeasures[Event](
      "first(A.event_id) AS first_view, last(A.event_id) AS last_view, " +
        "count(A) AS n_views, first(B.event_id) AS purchase_id",
      Event.fieldTable)
    val viaDsl = Cep.selectMeasures(Cep.matchBatchSorted(ds, pat), "user_id", ms)
      .orderBy("user_id", "first_view", "last_view").collect().toSeq
    assert(viaSql == viaDsl)
    assert(viaSql.nonEmpty)
  }
}
