package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec

/** times(n) / until / after-match skip / timed-out partials — shapes
  * mirrored from the reference `flink-cep` NFAITCase. Exercises the NFA
  * directly (advance) — streaming integration is covered by CepSpec and
  * EventTimeOpsSpec. */
class CepAdvancedSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, user: Long, typ: String) =
    Event(id, new Timestamp(tSec * 1000), user, typ, 0.0, "{}")

  private val isType = (t: String) =>
    (e: Event, _: Map[String, Vector[Event]]) => e.event_type == t

  private def run(pat: Cep.Pattern[Event],
                  skip: Cep.AfterMatchSkip = Cep.NoSkip)(events: Event*) = {
    val sorted = events.toList.sortBy(e => (Event.micros(e.ts), e.event_id))
      .map(e => (Event.micros(e.ts), e))
    Cep.advance(pat, Nil, sorted.iterator, skip)
  }

  private def ids(m: Map[String, Vector[Event]]): Map[String, Vector[Long]] =
    m.view.mapValues(_.map(_.event_id)).toMap

  test("times(2) needs exactly two occurrences before the next step") {
    val pat = Cep.Pattern.begin[Event]("c")(isType("click")).times(2)
      .followedBy("p")(isType("purchase"))
    val (done, _, _) = run(pat)(
      ev(1, 10, 1, "click"), ev(2, 11, 1, "click"), ev(3, 12, 1, "purchase"))
    assert(done.map(ids) == List(Map("c" -> List(1L, 2L), "p" -> List(3L))))
    // a single occurrence never completes
    val (none, open, _) = run(pat)(ev(1, 10, 1, "click"), ev(3, 12, 1, "purchase"))
    assert(none.isEmpty && open.nonEmpty)
  }

  test("times(m,n) accepts a count range, greedy up to n") {
    val pat = Cep.Pattern.begin[Event]("c")(isType("click")).times(2, 3)
      .followedBy("p")(isType("purchase"))
    // two clicks suffice
    val (two, _, _) = run(pat)(
      ev(1, 10, 1, "click"), ev(2, 11, 1, "click"), ev(5, 14, 1, "purchase"))
    assert(two.map(ids).contains(Map("c" -> List(1L, 2L), "p" -> List(5L))))
    // three clicks all bind (greedy up to the max)...
    val (three, _, _) = run(pat)(
      ev(1, 10, 1, "click"), ev(2, 11, 1, "click"), ev(3, 12, 1, "click"),
      ev(5, 14, 1, "purchase"))
    assert(three.map(ids).contains(Map("c" -> List(1L, 2L, 3L), "p" -> List(5L))))
    // ...but a fourth is NOT bound (n = 3 cap)
    val (four, _, _) = run(pat)(
      ev(1, 10, 1, "click"), ev(2, 11, 1, "click"), ev(3, 12, 1, "click"),
      ev(4, 13, 1, "click"), ev(5, 14, 1, "purchase"))
    assert(four.map(ids).contains(Map("c" -> List(1L, 2L, 3L), "p" -> List(5L))))
    assert(!four.map(ids).exists(_("c").length > 3))
    // one click never completes
    val (one, _, _) = run(pat)(ev(1, 10, 1, "click"), ev(5, 14, 1, "purchase"))
    assert(!one.map(ids).exists(_("c") == List(1L)))
  }

  test("until closes a oneOrMore loop; the closing event is not bound") {
    val pat = Cep.Pattern.begin[Event]("c")(isType("click")).oneOrMore
      .until(isType("error"))
      .followedBy("p")(isType("purchase"))
    val (done, _, _) = run(pat)(
      ev(1, 10, 1, "click"), ev(2, 11, 1, "click"), ev(3, 12, 1, "error"),
      ev(4, 13, 1, "click"), ev(5, 14, 1, "purchase"))
    // the partial started at click#1 stops accumulating at the error:
    // click#4 is NOT added to its loop
    assert(done.map(ids).contains(Map("c" -> List(1L, 2L), "p" -> List(5L))))
    assert(!done.map(ids).exists(m => m("c") == List(1L, 2L, 4L)))
  }

  test("NO_SKIP emits overlapping matches; SKIP_PAST_LAST_EVENT prunes them") {
    val pat = Cep.Pattern.begin[Event]("c")(isType("click")).times(2)
    val evs = Seq(ev(1, 10, 1, "click"), ev(2, 11, 1, "click"), ev(3, 12, 1, "click"))
    val (noskip, _, _) = run(pat)(evs: _*)
    assert(noskip.map(ids).toSet ==
      Set(Map("c" -> List(1L, 2L)), Map("c" -> List(2L, 3L))))
    val (skipped, _, _) = run(pat, Cep.SkipPastLastEvent)(evs: _*)
    assert(skipped.map(ids) == List(Map("c" -> List(1L, 2L))))
  }

  test("SKIP_TO_NEXT drops only partials sharing the match's start EVENT") {
    val pat = Cep.Pattern.begin[Event]("v")(isType("view"))
      .followedBy("p")(isType("purchase"))
    // two views at the SAME timestamp are still DIFFERENT start events
    // (SkipToNextStrategy prunes by event id, not timestamp): each
    // gets its own match, exactly like NO_SKIP here
    val evs = Seq(ev(1, 10, 1, "view"), ev(2, 10, 1, "view"),
                  ev(4, 11, 1, "view"), ev(3, 12, 1, "purchase"))
    val (done, _, _) = run(pat, Cep.SkipToNext)(evs: _*)
    assert(done.map(ids).toSet == Set(
      Map("v" -> List(1L), "p" -> List(3L)),
      Map("v" -> List(2L), "p" -> List(3L)),
      Map("v" -> List(4L), "p" -> List(3L))))
    val (all, _, _) = run(pat, Cep.NoSkip)(evs: _*)
    assert(all.size == 3) // NO_SKIP keeps every start
    // partials genuinely sharing a start EVENT — a reluctant loop's
    // branches — ARE pruned: one match per start event survives
    val loop = Cep.Pattern.begin[Event]("v")(isType("view")).oneOrMore
      .followedBy("p")(isType("purchase"))
    val evs2 = Seq(ev(1, 10, 1, "view"), ev(2, 11, 1, "view"),
                   ev(3, 12, 1, "purchase"))
    val (done2, _, _) = run(loop, Cep.SkipToNext)(evs2: _*)
    assert(done2.map(ids).toSet == Set(
      Map("v" -> List(1L, 2L), "p" -> List(3L)),
      Map("v" -> List(2L), "p" -> List(3L))),
      s"one match per start event: ${done2.map(ids)}")
  }

  test("SKIP_TO_FIRST prunes starts before the loop's first binding, keeps at it") {
    // greedy loop: one (maximal) match per start, keeping the skip-
    // boundary assertions below focused on the strategies themselves
    val pat = Cep.Pattern.begin[Event]("v")(isType("view")).oneOrMore.greedy
      .followedBy("p")(isType("purchase"))
    // starts at t10, t11, t12; first match (start t10) binds v at
    // {10, 11, 12}... — on SKIP_TO_FIRST("v") the boundary is the
    // match's FIRST v (t10): same-start partials survive, nothing
    // earlier exists; on SKIP_TO_LAST("v") the boundary is the last
    // bound v, pruning the t11 start but keeping the t12 one
    val evs = Seq(ev(1, 10, 1, "view"), ev(2, 11, 1, "view"),
                  ev(4, 12, 1, "view"), ev(3, 13, 1, "purchase"))
    val (first, _, _) = run(pat, Cep.SkipToFirst("v"))(evs: _*)
    // boundary = t10 → no partial starts before it → like NO_SKIP
    assert(first.size == 3, s"skipToFirst kept: ${first.map(ids)}")
    val (last, _, _) = run(pat, Cep.SkipToLast("v"))(evs: _*)
    // the first completion (start t10) binds v={1,2,4}, last at t12:
    // the t11 start is pruned, the t12 start survives and completes
    assert(last.map(ids).toSet == Set(
      Map("v" -> List(1L, 2L, 4L), "p" -> List(3L)),
      Map("v" -> List(4L), "p" -> List(3L))),
      s"skipToLast kept: ${last.map(ids)}")
  }

  test("partials dropped by within are returned as timed-out matches") {
    val pat = Cep.Pattern.begin[Event]("v")(isType("view"))
      .followedBy("p")(isType("purchase"))
      .within(5000000L) // 5 s
    val (done, _, timedOut) = run(pat)(
      ev(1, 10, 1, "view"), ev(2, 100, 1, "purchase"))
    assert(done.isEmpty)
    assert(timedOut.map(p => ids(p.bindings)) == List(Map("v" -> List(1L))))
  }
}
