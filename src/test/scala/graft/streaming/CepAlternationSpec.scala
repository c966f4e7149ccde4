package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec

/** Pattern alternation `(B|C)` — NFA binding semantics, DSL grammar,
  * and the MATCH_RECOGNIZE front-end's group handling (reference
  * group patterns: `cep/pattern/GroupPattern.java`). */
class CepAlternationSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double = 0.0) =
    Event(id, new Timestamp(tSec * 1000), user, typ, v, "{}")

  private def run(pat: Cep.Pattern[Event], events: Event*)
      : List[Map[String, Vector[Long]]] = {
    val sorted = events.toList.sortBy(e => (Event.micros(e.ts), e.event_id))
      .map(e => (Event.micros(e.ts), e))
    Cep.advance(pat, Nil, sorted.iterator)._1
      .map(_.view.mapValues(_.map(_.event_id)).toMap)
  }

  private def typed(t: String): (Event, Map[String, Vector[Event]]) => Boolean =
    (e, _) => e.event_type == t

  test("alternation binds under the matching alternative's name") {
    val pat = Cep.Pattern.begin[Event]("A")(typed("view"))
      .followedByAny("B" -> typed("buy"), "C" -> typed("cart"))
    val ms = run(pat,
      ev(1, 1, 9, "view"), ev(2, 2, 9, "cart"),
      ev(3, 3, 9, "view"), ev(4, 4, 9, "buy"))
    // each A-start is consumed by its first matching alternative:
    // A1 takes C2 (cart), A3 takes B4 (buy)
    assert(ms.toSet == Set(
      Map("A" -> Vector(1L), "C" -> Vector(2L)),
      Map("A" -> Vector(3L), "B" -> Vector(4L))))
  }

  test("leftmost preference when both alternatives match") {
    val pat = Cep.Pattern.begin[Event]("A")(typed("view"))
      .followedByAny(
        "B" -> ((e, _) => e.value > 0),          // both hold for v=5
        "C" -> ((e, _) => e.value > 1))
    val ms = run(pat, ev(1, 1, 9, "view"), ev(2, 2, 9, "buy", 5.0))
    assert(ms == List(Map("A" -> Vector(1L), "B" -> Vector(2L))))
  }

  test("(B|C)+ loop counts occurrences across alternatives") {
    val pat = Cep.Pattern.begin[Event]("A")(typed("view"))
      .followedByAny("B" -> typed("buy"), "C" -> typed("cart"))
      .times(2, 2)
      .followedBy("D")(typed("done"))
    val ms = run(pat,
      ev(1, 1, 9, "view"), ev(2, 2, 9, "buy"), ev(3, 3, 9, "cart"),
      ev(4, 4, 9, "done"))
    assert(ms == List(Map("A" -> Vector(1L), "B" -> Vector(2L),
      "C" -> Vector(3L), "D" -> Vector(4L))))
  }

  test("DSL: 'A B|C' compiles to an alternation step; negation rejected") {
    val preds = Map[String, (Event, Map[String, Vector[Event]]) => Boolean](
      "A" -> typed("view"), "B" -> typed("buy"), "C" -> typed("cart"))
    val pat = CepDsl.compile[Event]("A B|C", preds)
    assert(pat.steps.last.alts.map(_._1) == Vector("B", "C"))
    assert(pat.steps.last.name == "B|C")
    val strict = CepDsl.compile[Event]("A >B|C", preds)
    assert(strict.steps.last.strict && strict.steps.last.alts.size == 2)
    intercept[IllegalArgumentException] {
      CepDsl.compile[Event]("A !B|C", preds)
    }
  }

  test("MATCH_RECOGNIZE: (B|C) group, bare B|C, and concat-group flatten") {
    def parse(patSrc: String) = MatchRecognize.parse(s"""
      MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES count(A) AS n
        PATTERN ($patSrc)
        DEFINE A AS A.event_type = 'view', B AS B.event_type = 'buy',
               C AS C.event_type = 'cart'
      )""")
    assert(parse("A (B|C)").pattern.steps.last.alts.map(_._1) == Vector("B", "C"))
    assert(parse("A B|C").pattern.steps.last.alts.map(_._1) == Vector("B", "C"))
    assert(parse("A ( B | C )").pattern.steps.last.alts.map(_._1) == Vector("B", "C"))
    // group quantifier: SQL loops are greedy by default
    val loop = parse("A (B|C)+").pattern.steps.last
    assert(loop.oneOrMore && loop.greedy && loop.alts.size == 2)
    val rel = parse("A (B|C)+?").pattern.steps.last
    assert(rel.oneOrMore && !rel.greedy)
    // un-quantified concatenation group flattens
    assert(parse("(A B) C").pattern.steps.map(_.name) == Vector("A", "B", "C"))
  }

  test("MATCH_RECOGNIZE: single-var group quantifier, no-C defines") {
    def parse(patSrc: String) = MatchRecognize.parse(s"""
      MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES count(A) AS n
        PATTERN ($patSrc)
        DEFINE A AS A.event_type = 'view', B AS B.event_type = 'buy'
      )""")
    assert(parse("A (B){2}").pattern.steps.last.times == 2)
    assert(parse("(A B)").pattern.steps.map(_.name) == Vector("A", "B"))
  }

  test("MATCH_RECOGNIZE: unsupported group shapes are rejected loudly") {
    def parse(patSrc: String) = MatchRecognize.parse(s"""
      MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES count(A) AS n
        PATTERN ($patSrc)
        DEFINE A AS A.event_type = 'view', B AS B.event_type = 'buy',
               C AS C.event_type = 'cart'
      )""")
    // SQL's (A B)+ is GREEDY; the engine's group loops are reluctant —
    // the faithful reluctant form (A B)+? IS supported (sub-NFA,
    // GroupPattern.java:30), the greedy one rejects loudly
    assert(intercept[IllegalArgumentException](parse("(A B)+ C"))
      .getMessage.contains("reluctant"))
    assert(parse("(A B)+? C").pattern.groups ==
      Vector(Cep.Group(0, 1, 1, Int.MaxValue)))
    assert(parse("(A B){2} C").pattern.groups ==
      Vector(Cep.Group(0, 1, 2, 2)))
    // greedy (A B)* rejects (reference parity); reluctant and
    // optional group forms are sub-NFA-supported
    assert(intercept[IllegalArgumentException](parse("(A B)* C"))
      .getMessage.contains("reluctant"))
    assert(parse("(A B)*? C").pattern.groups ==
      Vector(Cep.Group(0, 1, 0, Int.MaxValue)))
    assert(parse("(A B)? C").pattern.groups ==
      Vector(Cep.Group(0, 1, 0, 1)))
    assert(intercept[IllegalArgumentException](parse("A B|C+"))
      .getMessage.contains("ambiguous"))
    assert(intercept[IllegalArgumentException](parse("A ((B|C)) D"))
      .getMessage.contains("nested"))
    assert(intercept[IllegalArgumentException](parse("PERMUTE (A, B)"))
      .getMessage.contains("PERMUTE"))
    assert(intercept[IllegalArgumentException](parse("A {- B -} C"))
      .getMessage.contains("exclusions"))
  }

  test("end-to-end: measures see each alternative separately") {
    import spark.implicits._
    val events = Seq(
      ev(1, 10, 1, "view"), ev(2, 20, 1, "cart", 3.0), ev(3, 30, 1, "buy", 7.0),
      ev(4, 10, 2, "view"), ev(5, 25, 2, "buy", 9.0)).toDS()
    val out = MatchRecognize.run(events, """
      MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES count(B) AS n_buy, count(C) AS n_cart, first(A.event_id) AS a_id
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A (B|C))
        DEFINE A AS A.event_type = 'view', B AS B.event_type = 'buy',
               C AS C.event_type = 'cart'
      )""").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    // user 1: view then cart (first following match); user 2: view then buy
    assert(out.toSeq == Seq((1L, 0L, 1L, 1L), (2L, 1L, 0L, 4L)))
  }
}
