package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests: strict contiguity (`next`) and negation
  * (`notNext` / `notFollowedBy`) equal a direct brute-force evaluation
  * on randomized event sequences (reference semantics:
  * `flink-libraries/flink-cep/.../pattern/Pattern.java:475` next,
  * `:205` notNext, `:177` notFollowedBy; behavior shapes mirrored from
  * NFAITCase). Pure driver-side, like CepPropSpec. */
class CepNegationPropSpec extends AnyFunSuite {

  private case class Ev(id: Long, ts: Long, typ: String)

  private def mkEvents(raw: List[(Long, String)]): List[Ev] =
    raw.zipWithIndex
      .map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }
      .sortBy(e => (e.ts, e.id))

  private def genCase(types: Gen[String]) = for {
    n <- Gen.chooseNum(0, 25)
    evs <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 60L), types))
    w <- Gen.oneOf(3L, 10L, 30L)
  } yield (evs, w)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("strict next equals brute-force immediate-successor matching") {
    check(Prop.forAll(genCase(Gen.oneOf("A", "B"))) { case (raw, w) =>
      val evs = mkEvents(raw)
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .next("b")((e, _) => e.typ == "B")
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m => (m("a").head.id, m("b").head.id)).toSet

      // brute force: an A matches iff the event IMMEDIATELY after it is
      // a B arriving within the window (a later event can't bind —
      // strict contiguity kills the partial on the first non-match).
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        b <- evs.drop(ai + 1).headOption
        if b.typ == "B" && b.ts - a.ts <= w
      } yield (a.id, b.id)).toSet
      got == expected
    })
  }

  test("notNext equals brute-force one-event guard") {
    check(Prop.forAll(genCase(Gen.oneOf("A", "B", "X"))) { case (raw, w) =>
      val evs = mkEvents(raw)
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .notNext("x")((e, _) => e.typ == "X")
        .followedBy("b")((e, _) => e.typ == "B")
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m => (m("a").head.id, m("b").head.id)).toSet

      // brute force: the event immediately after the A must not be an X
      // (if it is, the partial dies — even if the X itself is outside
      // the window the partial expired first, so no match either way);
      // then the first B after the A, arriving within the window,
      // binds (it may be that immediate successor itself).
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        if !evs.drop(ai + 1).headOption.exists(_.typ == "X")
        b <- evs.drop(ai + 1).find(e => e.typ == "B" && e.ts - a.ts <= w)
      } yield (a.id, b.id)).toSet
      got == expected
    })
  }

  test("notFollowedBy equals brute-force kill-on-first-X scan") {
    check(Prop.forAll(genCase(Gen.oneOf("A", "B", "X"))) { case (raw, w) =>
      val evs = mkEvents(raw)
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .notFollowedBy("x")((e, _) => e.typ == "X")
        .followedBy("b")((e, _) => e.typ == "B")
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m => (m("a").head.id, m("b").head.id)).toSet

      // brute force: scan events after the A in order — expiry first
      // (an event past the window bound kills the partial before the
      // guard sees it), then the guard (an X kills the partial), then
      // the positive step (a B completes the match).
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        b <- evs.drop(ai + 1)
          .takeWhile(e => e.ts - a.ts <= w) // expiry cuts the scan
          .find(e => e.typ == "X" || e.typ == "B") // kill-before-bind
        if b.typ == "B"
      } yield (a.id, b.id)).toSet
      got == expected
    })
  }

  test("consecutive oneOrMore equals brute-force maximal-run accumulation") {
    check(Prop.forAll(genCase(Gen.oneOf("A", "B", "C"))) { case (raw, w) =>
      val evs = mkEvents(raw)
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .oneOrMore.consecutive
        .followedBy("b")((e, _) => e.typ == "B")
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m => (m("a").map(_.id), m("b").head.id)).toSet

      // brute force: from each starting A, the loop takes consecutive
      // As until the first non-A event inside the window breaks it for
      // good; reluctant (the reference default), EVERY PREFIX of the
      // accumulated run is its own loop form, completed by the first B
      // after the run (all events between a prefix end and the break
      // are As, so every prefix sees the same first B), within the
      // window of the start. Expiry cuts the scan: an event past the
      // bound kills the partial before anything else sees it.
      val expected = (for {
        (a0, i0) <- evs.zipWithIndex if a0.typ == "A"
        inWin = evs.drop(i0 + 1).takeWhile(e => e.ts - a0.ts <= w)
        run = inWin.takeWhile(_.typ == "A")
        rest = inWin.drop(run.length)
        b <- rest.find(_.typ == "B").toList
        t <- 0 to run.length
      } yield ((a0 :: run.take(t)).map(_.id), b.id)).toSet
      got == expected
    })
  }

  test("reluctant relaxed loop (A+ B) equals brute-force prefix enumeration") {
    check(Prop.forAll(genCase(Gen.oneOf("A", "B", "C"))) { case (raw, w) =>
      val evs = mkEvents(raw)
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .oneOrMore
        .followedBy("b")((e, _) => e.typ == "B")
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m => (m("a").map(_.id), m("b").head.id)).toSet

      // brute force: from each starting A (i0), the relaxed loop binds
      // EVERY A inside the window (skip-till-next); reluctant, the
      // loop may stop after any occurrence j — that form completes
      // with the first B strictly after j, still inside the window.
      val expected = (for {
        (a0, i0) <- evs.zipWithIndex if a0.typ == "A"
        inWin = evs.drop(i0 + 1).takeWhile(e => e.ts - a0.ts <= w)
        aPos = -1 +: inWin.zipWithIndex.filter(_._1.typ == "A").map(_._2)
        j <- aPos // -1 = the loop is just {a0}
        b <- inWin.drop(j + 1).find(_.typ == "B").toList
        loop = a0 :: inWin.take(j + 1).filter(_.typ == "A")
      } yield (loop.map(_.id), b.id)).toSet
      got == expected
    })
  }

  test("greedy loop keeps only the maximal form per start") {
    check(Prop.forAll(genCase(Gen.oneOf("A", "B", "C"))) { case (raw, w) =>
      val evs = mkEvents(raw)
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .oneOrMore.greedy
        .followedBy("b")((e, _) => e.typ == "B")
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m => (m("a").map(_.id), m("b").head.id)).toSet

      // brute force: the loop takes every A up to the first B inside
      // the window (the greedy partial drifts to the next step only
      // when the event matches it), one match per start.
      val expected = (for {
        (a0, i0) <- evs.zipWithIndex if a0.typ == "A"
        inWin = evs.drop(i0 + 1).takeWhile(e => e.ts - a0.ts <= w)
        bIdx = inWin.indexWhere(_.typ == "B")
        if bIdx >= 0
        loop = a0 :: inWin.take(bIdx).filter(_.typ == "A")
      } yield (loop.map(_.id), inWin(bIdx).id)).toSet
      got == expected
    })
  }

  test("strict next with times(n) equals brute-force consecutive run") {
    check(Prop.forAll(genCase(Gen.oneOf("A", "B"))) { case (raw, w) =>
      val evs = mkEvents(raw)
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .next("b")((e, _) => e.typ == "B").times(2)
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m =>
        (m("a").head.id, m("b")(0).id, m("b")(1).id)).toSet

      // brute force: A immediately followed by two consecutive Bs, all
      // inside the window of the A.
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        rest = evs.drop(ai + 1)
        if rest.length >= 2
        b1 = rest(0); b2 = rest(1)
        if b1.typ == "B" && b1.ts - a.ts <= w
        if b2.typ == "B" && b2.ts - a.ts <= w
      } yield (a.id, b1.id, b2.id)).toSet
      got == expected
    })
  }

  test("strict next AFTER a loop (A+ next B) equals brute-force branch matching") {
    check(Prop.forAll(genCase(Gen.oneOf("A", "B", "C"))) { case (raw, w) =>
      val evs = mkEvents(raw)
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .oneOrMore
        .next("b")((e, _) => e.typ == "B")
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m => (m("a").map(_.id), m("b").head.id)).toSet

      // brute force over the branch space: a match starts at some A
      // (index i0), the relaxed loop binds EVERY A (skip-till-next)
      // from i0 through some later A at index j — and the loop "ends"
      // at j only legally if evs(j+1) is the B, since B is strict-next
      // after the loop's last binding. Window bounds the whole match
      // (expiry happens before binding, so the B must be within too).
      val expected = (for {
        (a0, i0) <- evs.zipWithIndex if a0.typ == "A"
        j <- i0 until evs.length if evs(j).typ == "A"
        if j + 1 < evs.length && evs(j + 1).typ == "B"
        if evs(j + 1).ts - a0.ts <= w
        loop = (i0 to j).map(evs(_)).filter(_.typ == "A")
      } yield (loop.map(_.id).toList, evs(j + 1).id)).toSet
      got == expected
    })
  }

  test("A+ consecutive next B: only an unbroken run ending right before B matches") {
    // events: A A X A B — the X breaks the consecutive run, so the
    // armed strict branches from the first run die at X and the
    // closed-loop partial can never reach B; only the run that starts
    // AFTER the break (the single A before B) matches.
    val evs = mkEvents(List((1L, "A"), (2L, "A"), (3L, "X"), (4L, "A"), (5L, "B")))
    val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
      .oneOrMore.consecutive
      .next("b")((e, _) => e.typ == "B")
      .within(100L)
    val (done, _, _) = Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
    val got = done.map(m => (m("a").map(_.id), m("b").head.id)).toSet
    assert(got == Set((List(3L), 4L)), s"matches: $got")
  }
}
