package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: the NFA's 2-step followedBy/within semantics equal a
  * direct brute-force evaluation (skip-till-next-match: each start
  * event pairs with its FIRST strictly-later match inside the window)
  * on randomized event sequences — including same-timestamp events,
  * expiry exactly at the window bound, and interleaved starts.
  * Pure driver-side (no Spark session needed): exercises Cep.advance
  * itself, the engine under both matchBatch and matchStream. */
class CepPropSpec extends AnyFunSuite {

  private case class Ev(id: Long, ts: Long, typ: String)

  test("2-step NFA equals brute-force first-follow on random sequences") {
    val genCase = for {
      n <- Gen.chooseNum(0, 25)
      evs <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 60L), Gen.oneOf("A", "B")))
      w <- Gen.oneOf(3L, 10L, 30L)
    } yield (evs, w)

    val prop = Prop.forAll(genCase) { case (raw, w) =>
      val evs = raw.zipWithIndex
        .map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }
        .sortBy(e => (e.ts, e.id))
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .followedBy("b") { (e, bound) =>
          e.typ == "B" && e.ts > bound("a").head.ts
        }
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m => (m("a").head.id, m("b").head.id)).toSet

      // brute force: each A takes the first later-in-order B with
      // strictly greater ts; the B must ARRIVE no later than ts_a + w
      // (the NFA expires partials when an event past the bound shows up,
      // so a B exactly at the bound still matches).
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        b <- evs.drop(ai + 1).find(b =>
          b.typ == "B" && b.ts > a.ts && b.ts - a.ts <= w)
      } yield (a.id, b.id)).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("times(2) NFA equals brute-force A-A-B accumulation") {
    val genCase = for {
      n <- Gen.chooseNum(0, 25)
      evs <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 60L), Gen.oneOf("A", "B")))
      w <- Gen.oneOf(5L, 15L, 40L)
    } yield (evs, w)

    val prop = Prop.forAll(genCase) { case (raw, w) =>
      val evs = raw.zipWithIndex
        .map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }
        .sortBy(e => (e.ts, e.id))
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A").times(2)
        .followedBy("b") { (e, bound) =>
          e.typ == "B" && e.ts > bound("a").last.ts
        }
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map(m =>
        (m("a")(0).id, m("a")(1).id, m("b").head.id)).toSet

      // brute force: a1 = any A; a2 = FIRST A after a1 (skip-till-next)
      // arriving within w of a1; b = FIRST later B with ts > a2.ts
      // arriving within w of a1 (the NFA expires a partial only when an
      // event past the bound shows up, so "arriving within" means
      // b.ts - a1.ts <= w).
      val expected = (for {
        (a1, i1) <- evs.zipWithIndex if a1.typ == "A"
        a2 <- evs.drop(i1 + 1).find(e =>
          e.typ == "A" && e.ts - a1.ts <= w)
        i2 = evs.indexWhere(_.id == a2.id)
        b <- evs.drop(i2 + 1).find(e =>
          e.typ == "B" && e.ts > a2.ts && e.ts - a1.ts <= w)
      } yield (a1.id, a2.id, b.id)).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("alternation NFA equals brute-force first-any with leftmost preference") {
    // A followed by (B|C); alternative predicates OVERLAP ("B" = typ in
    // {B, X}, "C" = typ in {C, X}) so X events exercise the leftmost
    // rule: they must always bind under "B".
    val genCase = for {
      n <- Gen.chooseNum(0, 25)
      evs <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 60L), Gen.oneOf("A", "B", "C", "X")))
      w <- Gen.oneOf(3L, 10L, 30L)
    } yield (evs, w)

    val prop = Prop.forAll(genCase) { case (raw, w) =>
      val evs = raw.zipWithIndex
        .map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }
        .sortBy(e => (e.ts, e.id))
      val pat = Cep.Pattern.begin[Ev]("a")((e, _) => e.typ == "A")
        .followedByAny(
          "b" -> ((e, _) => e.typ == "B" || e.typ == "X"),
          "c" -> ((e, _) => e.typ == "C" || e.typ == "X"))
        .within(w)
      val (done, _, _) =
        Cep.advance(pat, Nil, evs.map(e => (e.ts, e)).iterator)
      val got = done.map { m =>
        val (name, v) = m.collectFirst {
          case (k, vs) if k != "a" => (k, vs.head.id) }.get
        (m("a").head.id, name, v)
      }.toSet

      // brute force: each A takes the FIRST later-in-order event
      // matching either alternative within the window; the bound name
      // is "b" unless ONLY the c-predicate matches (leftmost rule).
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        x <- evs.drop(ai + 1).find(e =>
          Set("B", "C", "X")(e.typ) && e.ts - a.ts <= w)
      } yield (a.id, if (x.typ == "C") "c" else "b", x.id)).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
