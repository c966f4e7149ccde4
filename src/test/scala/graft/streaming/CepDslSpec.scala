package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The MATCH_RECOGNIZE-shaped string DSL: compiles to the same NFA as
  * the programmatic Pattern API (reference SQL surface:
  * StreamExecMatch.scala:69). The q58 consistency test proves the DSL
  * form of "view followed by purchase within 10m" produces exactly the
  * pairs of Cep.firstFollowedBy — the engine behind the oracle-checked
  * q58_cep_follow. */
class CepDslSpec extends AnyFunSuite with graft.SparkSpec {

  private case class Ev(id: Long, ts: Long, typ: String)
  private def evs(pairs: (Long, String)*): List[Ev] =
    pairs.zipWithIndex.map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }
      .sortBy(e => (e.ts, e.id)).toList

  private def run(pat: Cep.Pattern[Ev], events: List[Ev]) =
    Cep.advance(pat, Nil, events.map(e => (e.ts, e)).iterator)._1

  private val simple = Map[String, Ev => Boolean](
    "A" -> (_.typ == "A"), "B" -> (_.typ == "B"),
    "X" -> (_.typ == "X"), "C" -> (_.typ == "C"))

  test("duration literals") {
    assert(CepDsl.parseDuration("42") == 42L)
    assert(CepDsl.parseDuration("5us") == 5L)
    assert(CepDsl.parseDuration("3ms") == 3000L)
    assert(CepDsl.parseDuration("2s") == 2000000L)
    assert(CepDsl.parseDuration("10m") == 600000000L)
    assert(CepDsl.parseDuration("1h") == 3600000000L)
    assert(CepDsl.parseDuration("7d") == 604800000000L)
    intercept[IllegalArgumentException](CepDsl.parseDuration("7y"))
  }

  test("relaxed follow with within: A B within 10") {
    val pat = CepDsl.compileSimple("A B within 10us", simple)
    val got = run(pat, evs(0L -> "A", 3L -> "X", 5L -> "B", 20L -> "B"))
      .map(m => (m("A").head.id, m("B").head.id))
    assert(got == List((0L, 2L))) // skips the X; the late B is outside
  }

  test("strict next: A >B kills on intervening event") {
    val pat = CepDsl.compileSimple("A >B", simple)
    assert(run(pat, evs(0L -> "A", 1L -> "X", 2L -> "B")).isEmpty)
    val got = run(pat, evs(0L -> "A", 1L -> "B"))
      .map(m => (m("A").head.id, m("B").head.id))
    assert(got == List((0L, 1L)))
  }

  test("notNext: A !>X B guards exactly one event") {
    val pat = CepDsl.compileSimple("A !>X B", simple)
    assert(run(pat, evs(0L -> "A", 1L -> "X", 2L -> "B")).isEmpty)
    // a non-X event immediately after passes the guard; the B binds
    // even with a LATER X in between (the guard is one-shot)
    val got = run(pat, evs(0L -> "A", 1L -> "C", 2L -> "X", 3L -> "B"))
      .map(m => (m("A").head.id, m("B").head.id))
    assert(got == List((0L, 3L)))
    // the guard-passing event may itself bind the next step
    val got2 = run(pat, evs(0L -> "A", 1L -> "B"))
      .map(m => (m("A").head.id, m("B").head.id))
    assert(got2 == List((0L, 1L)))
  }

  test("notFollowedBy: A !X B kills on any X before the B") {
    val pat = CepDsl.compileSimple("A !X B", simple)
    assert(run(pat, evs(0L -> "A", 1L -> "C", 2L -> "X", 3L -> "B")).isEmpty)
    val got = run(pat, evs(0L -> "A", 1L -> "C", 2L -> "B", 3L -> "X"))
      .map(m => (m("A").head.id, m("B").head.id))
    assert(got == List((0L, 2L)))
  }

  test("quantifiers: A B{2} C and A B+ C and A B? C") {
    val e = evs(0L -> "A", 1L -> "B", 2L -> "B", 3L -> "C")
    val got = run(CepDsl.compileSimple("A B{2} C", simple), e)
      .map(m => (m("B").map(_.id), m("C").head.id))
    assert(got == List((List(1L, 2L), 3L)))
    // reluctant loop (the reference default): every prefix of the
    // accumulated run completes as its own match
    val gotPlus = run(CepDsl.compileSimple("A B+ C", simple), e)
      .map(m => (m("B").map(_.id), m("C").head.id))
    assert(gotPlus == List((List(1L, 2L), 3L), (List(1L), 3L)))
    val gotOpt = run(CepDsl.compileSimple("A B? C", simple),
      evs(0L -> "A", 1L -> "C"))
      .map(m => (m.get("B"), m("C").head.id))
    assert(gotOpt == List((None, 1L)))
  }

  test("consecutive loop: A B++ C stops accumulating at the first gap") {
    // B B X B: the relaxed loop takes all three Bs (and, reluctant,
    // completes every prefix); the consecutive loop is closed by the
    // X, so only prefixes of the FIRST run bind
    val e = evs(0L -> "A", 1L -> "B", 2L -> "B", 3L -> "X", 4L -> "B", 5L -> "C")
    val got = run(CepDsl.compileSimple("A B++ C", simple), e)
      .map(m => (m("B").map(_.id), m("C").head.id))
    assert(got == List((List(1L, 2L), 5L), (List(1L), 5L)), s"matches: $got")
    val gotRelaxed = run(CepDsl.compileSimple("A B+ C", simple), e)
      .map(m => (m("B").map(_.id), m("C").head.id))
    assert(gotRelaxed == List((List(1L, 2L, 4L), 5L), (List(1L, 2L), 5L),
      (List(1L), 5L)), s"matches: $gotRelaxed")
  }

  test("timesOrMore: A B{2,} C needs at least two, accumulates beyond") {
    val e = evs(0L -> "A", 1L -> "B", 2L -> "B", 3L -> "B", 4L -> "C")
    val got = run(CepDsl.compileSimple("A B{2,} C", simple), e)
      .map(m => (m("B").map(_.id), m("C").head.id))
    // reluctant: every form from the 2-minimum up
    assert(got == List((List(1L, 2L, 3L), 4L), (List(1L, 2L), 4L)),
      s"matches: $got")
    // a single B never completes
    assert(run(CepDsl.compileSimple("A B{2,} C", simple),
      evs(0L -> "A", 1L -> "B", 2L -> "C")).isEmpty)
  }

  test("rejects malformed patterns") {
    intercept[IllegalArgumentException](
      CepDsl.compileSimple("A NOPE", simple)) // undefined name
    intercept[IllegalArgumentException](
      CepDsl.compileSimple(">A B", simple)) // strict first step
    intercept[IllegalArgumentException](
      CepDsl.compileSimple("A !X+ B", simple)) // quantified negation
    intercept[IllegalArgumentException](
      CepDsl.compileSimple("A within 5us B", simple)) // within not last
    intercept[IllegalArgumentException](
      run(CepDsl.compileSimple("A !X", simple), evs(0L -> "A"))) // ends negated
  }

  test("q58 pattern via the DSL matches Cep.firstFollowedBy") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf).as[Event]

    val pat = CepDsl.compile[Event]("A B within 10m", Map(
      "A" -> ((e, _) => e.event_type == "view"),
      "B" -> ((e, bound) => e.event_type == "purchase" &&
        Event.micros(e.ts) > Event.micros(bound("A").head.ts))))

    val viaDsl = ev
      .filter(e => e.event_type == "view" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroups { (user: Long, rows: Iterator[Event]) =>
        val sorted = rows.toList
          .sortBy(e => (Event.micros(e.ts), e.event_id))
          .map(e => (Event.micros(e.ts), e))
        Cep.advance(pat, Nil, sorted.iterator)._1.iterator.map { m =>
          (user, m("A").head.event_id, m("B").head.event_id)
        }
      }.collect().toSet

    val viaApi = Cep.firstFollowedBy(ev, "view", "purchase", 600000000L)
      .collect().map(r => (r.user_id, r.first_id, r.second_id)).toSet

    assert(viaDsl == viaApi)
    assert(viaDsl.nonEmpty)
  }
}
