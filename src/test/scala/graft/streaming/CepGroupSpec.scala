package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Quantified CONCATENATION groups — `(A B).times(2)`, `(A B)+`
  * (reference `cep/pattern/GroupPattern.java:30`, quantified via the
  * inherited times/oneOrMore): unit semantics, DSL parse, loud
  * rejection valves, and a brute-force property over random event
  * sequences. */
class CepGroupSpec extends AnyFunSuite {

  private case class Ev(id: Long, ts: Long, typ: String)

  private def isTyp(t: String) =
    (e: Ev, _: Map[String, Vector[Ev]]) => e.typ == t

  private def run(pat: Cep.Pattern[Ev], evs: List[Ev]) =
    Cep.advance(pat, Nil,
      evs.sortBy(e => (e.ts, e.id)).map(e => (e.ts, e)).iterator)._1
      .map(_.view.mapValues(_.map(_.id)).toMap)

  private def evs(pairs: (Long, String)*): List[Ev] =
    pairs.zipWithIndex.map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }.toList

  test("(A B){2} binds two occurrences under each name") {
    val pat = Cep.Pattern.beginGroup(
        Cep.Pattern.begin[Ev]("a")(isTyp("A")).followedBy("b")(isTyp("B")))
      .times(2)
    val got = run(pat, evs(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "B"))
    assert(got == List(Map("a" -> List(0L, 2L), "b" -> List(1L, 3L))))
    // only one iteration: no match
    assert(run(pat, evs(1L -> "A", 2L -> "B")).isEmpty)
    // noise between iterations is skipped (relaxed contiguity)
    val noisy = run(pat, evs(1L -> "A", 2L -> "X", 3L -> "B",
      4L -> "X", 5L -> "A", 6L -> "B"))
    assert(noisy == List(Map("a" -> List(0L, 4L), "b" -> List(2L, 5L))))
  }

  test("(A B)+ C is reluctant: every completed iteration count matches") {
    val pat = Cep.Pattern.beginGroup(
        Cep.Pattern.begin[Ev]("a")(isTyp("A")).followedBy("b")(isTyp("B")))
      .oneOrMore
      .followedBy("c")(isTyp("C"))
    val got = run(pat, evs(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "B",
      5L -> "C")).toSet
    // start at A0: 1-iteration {A0 B1}C and 2-iteration {A0 B1 A2 B3}C;
    // start at A2: {A2 B3}C
    assert(got == Set(
      Map("a" -> List(0L), "b" -> List(1L), "c" -> List(4L)),
      Map("a" -> List(0L, 2L), "b" -> List(1L, 3L), "c" -> List(4L)),
      Map("a" -> List(2L), "b" -> List(3L), "c" -> List(4L))))
  }

  test("(A B){1,2} exits at one or two iterations") {
    val pat = Cep.Pattern.beginGroup(
        Cep.Pattern.begin[Ev]("a")(isTyp("A")).followedBy("b")(isTyp("B")))
      .times(1, 2)
      .followedBy("c")(isTyp("C"))
    val got = run(pat, evs(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "B",
      5L -> "C")).toSet
    assert(got == Set(
      Map("a" -> List(0L), "b" -> List(1L), "c" -> List(4L)),
      Map("a" -> List(0L, 2L), "b" -> List(1L, 3L), "c" -> List(4L)),
      Map("a" -> List(2L), "b" -> List(3L), "c" -> List(4L))))
    // a third iteration is NOT taken at max=2
    val three = run(pat, evs(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "B",
      5L -> "A", 6L -> "B", 7L -> "C"))
    assert(!three.exists(_("a").size > 2))
  }

  test("group after a plain step, and within pruning") {
    val pat = Cep.Pattern.begin[Ev]("s")(isTyp("S"))
      .followedByGroup(
        Cep.Pattern.begin[Ev]("a")(isTyp("A")).followedBy("b")(isTyp("B")))
      .times(2)
      .within(10L)
    val ok = run(pat, evs(1L -> "S", 2L -> "A", 3L -> "B", 4L -> "A", 5L -> "B"))
    assert(ok == List(Map("s" -> List(0L),
      "a" -> List(1L, 3L), "b" -> List(2L, 4L))))
    // second iteration arrives past the window: partial expired
    val late = run(pat, evs(1L -> "S", 2L -> "A", 3L -> "B",
      20L -> "A", 21L -> "B"))
    assert(late.isEmpty)
  }

  test("DSL parses (A B){2} and (A B)+ C") {
    val preds = Map[String, (Ev, Map[String, Vector[Ev]]) => Boolean](
      "A" -> isTyp("A"), "B" -> isTyp("B"), "C" -> isTyp("C"))
    val p2 = CepDsl.compile[Ev]("(A B){2}", preds)
    assert(p2.groups == Vector(Cep.Group(0, 1, 2, 2)))
    val got = run(p2, evs(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "B"))
    assert(got == List(Map("A" -> List(0L, 2L), "B" -> List(1L, 3L))))

    val pPlus = CepDsl.compile[Ev]("(A B)+ C within 100", preds)
    assert(pPlus.groups == Vector(Cep.Group(0, 1, 1, Int.MaxValue)))
    assert(pPlus.withinUs == 100L)
    assert(run(pPlus, evs(1L -> "A", 2L -> "B", 3L -> "C")).size == 1)

    // a group mid-pattern, with a strict step inside the body
    val pMid = CepDsl.compile[Ev]("C (A >B){2}", preds)
    assert(pMid.groups == Vector(Cep.Group(1, 2, 2, 2)))
  }

  test("unsupported group forms are rejected loudly") {
    val preds = Map[String, (Ev, Map[String, Vector[Ev]]) => Boolean](
      "A" -> isTyp("A"), "B" -> isTyp("B"))
    intercept[IllegalArgumentException](CepDsl.compile[Ev]("(A B", preds))
    // quantified step inside a quantified group: rejected at advance
    val inner = CepDsl.compile[Ev]("(A+ B){2}", preds)
    intercept[IllegalArgumentException](run(inner, evs(1L -> "A")))
    // nested groups rejected at build
    intercept[IllegalArgumentException] {
      Cep.Pattern.beginGroup(
        Cep.Pattern.beginGroup(
          Cep.Pattern.begin[Ev]("a")(isTyp("A"))).times(2))
    }
  }

  test("strict step inside the group body stays strict across iterations") {
    // C (A >B){2}: after each A binds, the IMMEDIATELY next event
    // must be B or the partial dies (strictness inside the body);
    // iteration-to-iteration contiguity stays relaxed.
    val preds = Map[String, (Ev, Map[String, Vector[Ev]]) => Boolean](
      "A" -> isTyp("A"), "B" -> isTyp("B"), "C" -> isTyp("C"))
    val pat = CepDsl.compile[Ev]("C (A >B){2}", preds)
    val ok = run(pat, evs(1L -> "C", 2L -> "A", 3L -> "B",
      4L -> "X", 5L -> "A", 6L -> "B"))
    assert(ok == List(Map("C" -> List(0L),
      "A" -> List(1L, 4L), "B" -> List(2L, 5L))))
    // a gap between A and B kills the run (skip-till-next bound the
    // first A; its strict successor window is that one event)
    val broken = run(pat, evs(1L -> "C", 2L -> "A", 3L -> "X",
      4L -> "B", 5L -> "A", 6L -> "B"))
    assert(broken.isEmpty)
  }

  test("after-match skip strategies prune overlapping group matches") {
    val body = Cep.Pattern.begin[Ev]("a")(isTyp("A")).followedBy("b")(isTyp("B"))
    val pat = Cep.Pattern.beginGroup(body).times(2)
    val es = evs(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "B",
      5L -> "A", 6L -> "B").sortBy(e => (e.ts, e.id))
    def runSkip(skip: Cep.AfterMatchSkip) =
      Cep.advance(pat, Nil, es.map(e => (e.ts, e)).iterator, skip)._1
        .map(_("a").map(_.id))
    // NoSkip: starts at A0 and A2 both complete
    assert(runSkip(Cep.NoSkip).toSet == Set(Vector(0L, 2L), Vector(2L, 4L)))
    // SkipPastLastEvent: the A2 start (begun before the first match's
    // last event) is pruned when {A0 B1 A2 B3} completes
    assert(runSkip(Cep.SkipPastLastEvent) == List(Vector(0L, 2L)))
  }

  test("(A B)? optional group binds all-or-nothing") {
    val preds = Map[String, (Ev, Map[String, Vector[Ev]]) => Boolean](
      "A" -> isTyp("A"), "B" -> isTyp("B"), "S" -> isTyp("S"),
      "C" -> isTyp("C"))
    val pat = CepDsl.compile[Ev]("S (A B)? C", preds)
    assert(pat.groups == Vector(Cep.Group(1, 2, 0, 1)))
    // group present
    val full = run(pat, evs(1L -> "S", 2L -> "A", 3L -> "B", 4L -> "C"))
    assert(full == List(Map("S" -> List(0L), "A" -> List(1L),
      "B" -> List(2L), "C" -> List(3L))))
    // group absent: drift past the whole body
    val skip = run(pat, evs(1L -> "S", 2L -> "C"))
    assert(skip == List(Map("S" -> List(0L), "C" -> List(1L))))
    // HALF a body is never a match: A without B blocks that branch,
    // and C arrived before A so no drift match either… C AFTER the
    // dangling A must still match via a fresh scan order: here the
    // entered partial is stuck at B, but C events cannot bind B —
    // all-or-nothing means no {S, A, C} row ever
    val half = run(pat, evs(1L -> "S", 2L -> "A", 3L -> "C"))
    assert(half.forall(m => !m.contains("A")), s"half-bound group leaked: $half")
  }

  test("one event satisfying both the group head and the next step") {
    // (A B)? C where C's predicate also accepts A-typed events: the
    // entry FORK must offer the same event to C with the group
    // unbound, or the match would be lost to leftmost entry.
    val preds = Map[String, (Ev, Map[String, Vector[Ev]]) => Boolean](
      "S" -> isTyp("S"), "A" -> isTyp("A"), "B" -> isTyp("B"),
      "C" -> ((e, _) => e.typ == "A" || e.typ == "C"))
    val pat = CepDsl.compile[Ev]("S (A B)? C", preds)
    val got = run(pat, evs(1L -> "S", 2L -> "A"))
    assert(got == List(Map("S" -> List(0L), "C" -> List(1L))))
  }

  test("(A B)* zero-or-more group emits every reluctant iteration count") {
    val preds = Map[String, (Ev, Map[String, Vector[Ev]]) => Boolean](
      "S" -> isTyp("S"), "A" -> isTyp("A"), "B" -> isTyp("B"),
      "C" -> isTyp("C"))
    val pat = CepDsl.compile[Ev]("S (A B)* C", preds)
    assert(pat.groups == Vector(Cep.Group(1, 2, 0, Int.MaxValue)))
    // zero iterations: S then C with no A in between
    assert(run(pat, evs(1L -> "S", 2L -> "C")) ==
      List(Map("S" -> List(0L), "C" -> List(1L))))
    // skip-till-next: a takeable A may NOT be ignored, so over
    // S A B C only the 1-iteration match exists (no {S C})
    val one = run(pat, evs(1L -> "S", 2L -> "A", 3L -> "B", 4L -> "C"))
    assert(one == List(Map("S" -> List(0L), "A" -> List(1L),
      "B" -> List(2L), "C" -> List(3L))))
  }

  test("(A B)++ consecutive group loop closes on the first gap") {
    val preds = Map[String, (Ev, Map[String, Vector[Ev]]) => Boolean](
      "A" -> isTyp("A"), "B" -> isTyp("B"), "C" -> isTyp("C"))
    val pat = CepDsl.compile[Ev]("(A B)++ C", preds)
    assert(pat.groups.head.consecutive && pat.groups.head.max == Int.MaxValue)
    // back-to-back iterations both match
    val ok = run(pat, evs(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "B",
      5L -> "C")).map(m => m("A").size).toSet
    assert(ok == Set(1, 2))
    // a gap between iterations closes the loop: the 2-iteration
    // match must NOT exist, the per-iteration exits still do
    val gap = run(pat, evs(1L -> "A", 2L -> "B", 3L -> "X", 4L -> "A",
      5L -> "B", 6L -> "C"))
    val aSets = gap.map(_("A").map(identity)).toSet
    assert(aSets == Set(Vector(0L), Vector(3L)),
      s"gap must break the consecutive loop: $aSets")
  }

  test("property: (A B){2} equals brute-force chained firsts") {
    val genCase = for {
      n <- Gen.chooseNum(0, 30)
      raw <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 60L), Gen.oneOf("A", "B", "X")))
      w <- Gen.oneOf(10L, 25L, 100L)
    } yield (raw, w)

    val prop = Prop.forAll(genCase) { case (raw, w) =>
      val es = raw.zipWithIndex
        .map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }
        .sortBy(e => (e.ts, e.id))
      val pat = Cep.Pattern.beginGroup(
          Cep.Pattern.begin[Ev]("a")(isTyp("A")).followedBy("b")(isTyp("B")))
        .times(2).within(w)
      val got = Cep.advance(pat, Nil, es.map(e => (e.ts, e)).iterator)._1
        .map(m => (m("a").map(_.id), m("b").map(_.id))).toSet

      // brute force: a start at each A takes the FIRST B after it,
      // then the FIRST A after that, then the FIRST B after that
      // (skip-till-next-match, relaxed) — completing within w of the
      // start (the NFA expires a partial only when a LATER event
      // exceeds the bound, so completion exactly at the bound counts).
      def firstAfter(i: Int, ty: String): Option[Int] =
        es.indices.drop(i + 1).find(j => es(j).typ == ty)
      val expected = (for {
        i0 <- es.indices if es(i0).typ == "A"
        j0 <- firstAfter(i0, "B")
        i1 <- firstAfter(j0, "A")
        j1 <- firstAfter(i1, "B")
        if es(j1).ts - es(i0).ts <= w
      } yield (Vector(es(i0).id, es(i1).id), Vector(es(j0).id, es(j1).id)))
        .toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("property: (A B)* C equals brute-force with zero-iteration rows") {
    val genCase = for {
      n <- Gen.chooseNum(0, 24)
      raw <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 40L), Gen.oneOf("A", "B", "C")))
    } yield raw

    val prop = Prop.forAll(genCase) { raw =>
      val es = raw.zipWithIndex
        .map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }
        .sortBy(e => (e.ts, e.id))
      val pat = Cep.Pattern.beginGroup(
          Cep.Pattern.begin[Ev]("a")(isTyp("A")).followedBy("b")(isTyp("B")))
        .zeroOrMore
        .followedBy("c")(isTyp("C"))
      val got = Cep.advance(pat, Nil, es.map(e => (e.ts, e)).iterator)._1
        .map(m => (m.getOrElse("a", Vector.empty).map(_.id),
          m.getOrElse("b", Vector.empty).map(_.id), m("c").head.id)).toSet

      def firstAfter(i: Int, ty: String): Option[Int] =
        es.indices.drop(i + 1).find(j => es(j).typ == ty)
      val expected = scala.collection.mutable.Set.empty[(Vector[Long], Vector[Long], Long)]
      // zero-iteration: every C event seeds its own {C} match
      es.filter(_.typ == "C").foreach(c =>
        expected += ((Vector.empty, Vector.empty, c.id)))
      // k >= 1 iterations: chained firsts per A start, every prefix
      for (i0 <- es.indices if es(i0).typ == "A") {
        var as = Vector(i0); var bs = Vector.empty[Int]
        var cur = firstAfter(i0, "B"); var go = true
        while (go) cur match {
          case Some(bIdx) =>
            bs = bs :+ bIdx
            firstAfter(bIdx, "C").foreach(cIdx =>
              expected += ((as.map(es(_).id), bs.map(es(_).id), es(cIdx).id)))
            firstAfter(bIdx, "A") match {
              case Some(aIdx) => as = as :+ aIdx; cur = firstAfter(aIdx, "B")
              case None => go = false
            }
          case None => go = false
        }
      }
      got == expected.toSet
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("property: (A B)+ C equals brute-force iteration prefixes") {
    val genCase = for {
      n <- Gen.chooseNum(0, 24)
      raw <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 40L), Gen.oneOf("A", "B", "C")))
    } yield raw

    val prop = Prop.forAll(genCase) { raw =>
      val es = raw.zipWithIndex
        .map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }
        .sortBy(e => (e.ts, e.id))
      val pat = Cep.Pattern.beginGroup(
          Cep.Pattern.begin[Ev]("a")(isTyp("A")).followedBy("b")(isTyp("B")))
        .oneOrMore
        .followedBy("c")(isTyp("C"))
      val got = Cep.advance(pat, Nil, es.map(e => (e.ts, e)).iterator)._1
        .map(m => (m("a").map(_.id), m("b").map(_.id), m("c").head.id)).toSet

      // brute force: from each A start, the deterministic chain of
      // firsts A B A B …; every k-iteration prefix is reluctantly
      // offered a C = first C after the k-th B.
      def firstAfter(i: Int, ty: String): Option[Int] =
        es.indices.drop(i + 1).find(j => es(j).typ == ty)
      val expected = scala.collection.mutable.Set.empty[(Vector[Long], Vector[Long], Long)]
      for (i0 <- es.indices if es(i0).typ == "A") {
        var as = Vector(i0)
        var bs = Vector.empty[Int]
        var cur = firstAfter(i0, "B")
        var go = true
        while (go) {
          cur match {
            case Some(bIdx) =>
              bs = bs :+ bIdx
              firstAfter(bIdx, "C").foreach { cIdx =>
                expected += ((as.map(es(_).id), bs.map(es(_).id), es(cIdx).id))
              }
              firstAfter(bIdx, "A") match {
                case Some(aIdx) =>
                  as = as :+ aIdx
                  cur = firstAfter(aIdx, "B")
                case None => go = false
              }
            case None => go = false
          }
        }
      }
      got == expected.toSet
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
