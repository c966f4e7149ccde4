package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Zero-or-more (`*`) quantifier — NFA semantics (optional loop, the
  * reference's `oneOrMore().optional()` composition), DSL grammar, and
  * the strict-optional bind-window rule: a strict optional step whose
  * adjacency event does not match can never bind afterwards.
  * Property-tested against brute-force models, pure driver-side. */
class CepStarSpec extends AnyFunSuite {

  private case class Ev(id: Long, ts: Long, typ: String)

  private def typed(t: String): (Ev, Map[String, Vector[Ev]]) => Boolean =
    (e, _) => e.typ == t

  private def run(pat: Cep.Pattern[Ev], evs: List[Ev])
      : List[Map[String, Vector[Long]]] = {
    val sorted = evs.sortBy(e => (e.ts, e.id))
    Cep.advance(pat, Nil, sorted.map(e => (e.ts, e)).iterator)._1
      .map(_.view.mapValues(_.map(_.id)).toMap)
  }

  private def mkEvs(raw: List[(Long, String)]): List[Ev] =
    raw.zipWithIndex.map { case ((ts, ty), i) => Ev(i.toLong, ts, ty) }
      .sortBy(e => (e.ts, e.id))

  test("relaxed greedy A B* C equals brute force on random sequences") {
    val genCase = for {
      n <- Gen.chooseNum(0, 25)
      evs <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 60L), Gen.oneOf("A", "B", "C", "X")))
      w <- Gen.oneOf(3L, 10L, 30L)
    } yield (evs, w)

    val prop = Prop.forAll(genCase) { case (raw, w) =>
      val evs = mkEvs(raw)
      val pat = Cep.Pattern.begin[Ev]("a")(typed("A"))
        .followedBy("b")(typed("B")).zeroOrMore.greedy
        .followedBy("c")(typed("C"))
        .within(w)
      val got = run(pat, evs)
        .map(m => (m("a").head, m.getOrElse("b", Vector.empty), m("c").head))
        .toSet

      // brute force: each A takes the FIRST later-in-order C arriving
      // within w; the greedy loop binds EVERY B between the A and that
      // C (all of them are within w because order is (ts, id)).
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        ci = evs.indexWhere(e => e.typ == "C" && e.ts - a.ts <= w, ai + 1)
        if ci >= 0 && { // no expiry strictly before the C completes it
          val c = evs(ci); c.ts - a.ts <= w
        }
      } yield (a.id,
        evs.slice(ai + 1, ci).filter(_.typ == "B").map(_.id).toVector,
        evs(ci).id)).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("strict consecutive A >B** >C equals brute force (maximal runs)") {
    val genCase = for {
      n <- Gen.chooseNum(0, 25)
      evs <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 40L), Gen.oneOf("A", "B", "C", "X")))
      w <- Gen.oneOf(5L, 15L, 40L)
    } yield (evs, w)

    val prop = Prop.forAll(genCase) { case (raw, w) =>
      val evs = mkEvs(raw)
      val pat = Cep.Pattern.begin[Ev]("a")(typed("A"))
        .next("b")(typed("B")).zeroOrMore.consecutive.greedy
        .next("c")(typed("C"))
        .within(w)
      val got = run(pat, evs)
        .map(m => (m("a").head, m.getOrElse("b", Vector.empty), m("c").head))
        .toSet

      // brute force: from each A, consume the maximal immediately-
      // following run of Bs; the very next event must be a C within w
      // (every consumed event is within w since order is (ts, id)).
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        bEnd = { var j = ai + 1
                 while (j < evs.size && evs(j).typ == "B" &&
                        evs(j).ts - a.ts <= w) j += 1
                 j }
        if bEnd < evs.size && evs(bEnd).typ == "C" && evs(bEnd).ts - a.ts <= w
      } yield (a.id, evs.slice(ai + 1, bEnd).map(_.id).toVector,
        evs(bEnd).id)).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("relaxed reluctant A B*? C equals brute force (every stop point)") {
    val genCase = for {
      n <- Gen.chooseNum(0, 18)
      evs <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 40L), Gen.oneOf("A", "B", "C", "X")))
      w <- Gen.oneOf(5L, 15L, 40L)
    } yield (evs, w)

    val prop = Prop.forAll(genCase) { case (raw, w) =>
      val evs = mkEvs(raw)
      val pat = Cep.Pattern.begin[Ev]("a")(typed("A"))
        .followedBy("b")(typed("B")).zeroOrMore
        .followedBy("c")(typed("C"))
        .within(w)
      val got = run(pat, evs)
        .map(m => (m("a").head, m.getOrElse("b", Vector.empty), m("c").head))
        .toSet

      // brute force. Per A: if the first C arrives before any B, the
      // loop-resident partial completes with zero Bs and is CONSUMED —
      // that zero match is the only one (completion consumes, the
      // documented trailing-optional behavior). Otherwise the partial
      // accumulates every B within w (Cs cannot complete it once
      // cnt>0 — reluctant), and each k-th B's stopped branch binds the
      // first C after that B.
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        m <- {
          val bi1 = evs.indexWhere(e => e.typ == "B" && e.ts - a.ts <= w, ai + 1)
          val ci1 = evs.indexWhere(e => e.typ == "C" && e.ts - a.ts <= w, ai + 1)
          if (ci1 >= 0 && (bi1 < 0 || ci1 < bi1))
            List((a.id, Vector.empty[Long], evs(ci1).id))
          else {
            val bs = evs.drop(ai + 1).filter(e => e.typ == "B" && e.ts - a.ts <= w)
            bs.indices.flatMap { k =>
              val bi = evs.indexWhere(_.id == bs(k).id)
              val ci = evs.indexWhere(e => e.typ == "C" && e.ts - a.ts <= w, bi + 1)
              if (ci >= 0)
                List((a.id, bs.take(k + 1).map(_.id).toVector, evs(ci).id))
              else Nil
            }
          }
        }
      } yield m).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("relaxed greedy A B{0,2} C equals brute force (capped star)") {
    val genCase = for {
      n <- Gen.chooseNum(0, 20)
      evs <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 40L), Gen.oneOf("A", "B", "C", "X")))
      w <- Gen.oneOf(5L, 15L, 40L)
    } yield (evs, w)

    val prop = Prop.forAll(genCase) { case (raw, w) =>
      val evs = mkEvs(raw)
      val pat = Cep.Pattern.begin[Ev]("a")(typed("A"))
        .followedBy("b")(typed("B")).times(1, 2).optional.greedy
        .followedBy("c")(typed("C"))
        .within(w)
      val got = run(pat, evs)
        .map(m => (m("a").head, m.getOrElse("b", Vector.empty), m("c").head))
        .toSet

      // greedy completes at the FIRST C after the A whatever the count
      // is (0, 1 or 2 via drift/satisfied/positioned) — the binding
      // set is the Bs between them capped at 2.
      val expected = (for {
        (a, ai) <- evs.zipWithIndex if a.typ == "A"
        ci = evs.indexWhere(e => e.typ == "C" && e.ts - a.ts <= w, ai + 1)
        if ci >= 0
      } yield (a.id,
        evs.slice(ai + 1, ci).filter(_.typ == "B").take(2).map(_.id).toVector,
        evs(ci).id)).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private def ev(id: Long, ts: Long, typ: String) = Ev(id, ts, typ)

  test("reluctant A B*? C emits every stop point including zero") {
    val pat = Cep.Pattern.begin[Ev]("a")(typed("A"))
      .followedBy("b")(typed("B")).zeroOrMore
      .followedBy("c")(typed("C"))
    // A B B C: stops after 1 B and 2 Bs complete on the C; the
    // zero-B form completed... only if a C precedes the first B.
    val ms = run(pat, List(ev(1, 1, "A"), ev(2, 2, "B"), ev(3, 3, "B"),
      ev(4, 4, "C")))
    assert(ms.toSet == Set(
      Map("a" -> Vector(1L), "b" -> Vector(2L), "c" -> Vector(4L)),
      Map("a" -> Vector(1L), "b" -> Vector(2L, 3L), "c" -> Vector(4L))))
    // C first: the loop-resident partial completes with zero Bs and is
    // consumed — the earliest completion, as with every trailing-
    // optional form.
    val ms2 = run(pat, List(ev(1, 1, "A"), ev(2, 2, "C")))
    assert(ms2 == List(Map("a" -> Vector(1L), "c" -> Vector(2L))))
  }

  test("zero-or-more at the pattern head may stay unbound") {
    val pat = Cep.Pattern.begin[Ev]("a")(typed("A")).zeroOrMore.greedy
      .followedBy("c")(typed("C"))
    val ms = run(pat, List(ev(1, 1, "C")))
    assert(ms == List(Map("c" -> Vector(1L))))
  }

  test("strict optional bind window: >B? cannot bind after a gap event") {
    // A >B? C (C relaxed): X consumes the strict window — B afterwards
    // must NOT bind, but the later relaxed C still completes the match.
    val pat = Cep.Pattern.begin[Ev]("a")(typed("A"))
      .next("b")(typed("B")).optional
      .followedBy("c")(typed("C"))
    val ms = run(pat, List(ev(1, 1, "A"), ev(2, 2, "X"), ev(3, 3, "B"),
      ev(4, 4, "C")))
    assert(ms == List(Map("a" -> Vector(1L), "c" -> Vector(4L))))
    // adjacency honored when B IS immediately next
    val ms2 = run(pat, List(ev(1, 1, "A"), ev(2, 2, "B"), ev(3, 3, "C")))
    assert(ms2 == List(
      Map("a" -> Vector(1L), "b" -> Vector(2L), "c" -> Vector(3L))))
  }

  test("strict zero-or-more: gap before any bind kills the strict tail") {
    // A >B* >C: X after A leaves no legal continuation at all.
    val pat = Cep.Pattern.begin[Ev]("a")(typed("A"))
      .next("b")(typed("B")).zeroOrMore.consecutive.greedy
      .next("c")(typed("C"))
    val ms = run(pat, List(ev(1, 1, "A"), ev(2, 2, "X"), ev(3, 3, "B"),
      ev(4, 4, "C")))
    assert(ms.isEmpty)
  }

  test("{0,n} binds up to n and completes with zero; {0,} equals *") {
    val preds = Map[String, (Ev, Map[String, Vector[Ev]]) => Boolean](
      "A" -> typed("A"), "B" -> typed("B"), "C" -> typed("C"))
    val pat = CepDsl.compile[Ev]("A B{0,2} C", preds)
      .copy(steps = CepDsl.compile[Ev]("A B{0,2} C", preds).steps.map(s =>
        if (s.name == "B") s.copy(greedy = true) else s))
    // three Bs available: the greedy range stops at 2, C closes
    val ms = run(pat, List(ev(1, 1, "A"), ev(2, 2, "B"), ev(3, 3, "B"),
      ev(4, 4, "B"), ev(5, 5, "C")))
    assert(ms == List(Map("A" -> Vector(1L), "B" -> Vector(2L, 3L),
      "C" -> Vector(5L))))
    // zero Bs: the optional drift path completes A-C directly
    val ms2 = run(pat, List(ev(1, 1, "A"), ev(2, 2, "C")))
    assert(ms2 == List(Map("A" -> Vector(1L), "C" -> Vector(2L))))
    // {0,} normalizes to the zero-or-more step
    val star = CepDsl.compile[Ev]("A B{0,} C", preds).steps(1)
    assert(star.optional && star.oneOrMore)
  }

  test("MATCH_RECOGNIZE: B{0,2} parses as an optional range loop") {
    val st = MatchRecognize.parse("""
      MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES count(A) AS n
        PATTERN (A B{0,2} C)
        DEFINE A AS A.event_type = 'view', B AS B.event_type = 'click',
               C AS C.event_type = 'purchase'
      )""").pattern.steps(1)
    assert(st.optional && st.times == 1 && st.timesMax == 2 && st.greedy)
  }

  test("SkipPastLastEvent with a greedy star equals brute force") {
    val genCase = for {
      n <- Gen.chooseNum(0, 22)
      evs <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 40L), Gen.oneOf("A", "B", "C", "X")))
      w <- Gen.oneOf(5L, 15L, 40L)
    } yield (evs, w)

    val prop = Prop.forAll(genCase) { case (raw, w) =>
      val evs = mkEvs(raw)
      val pat = Cep.Pattern.begin[Ev]("a")(typed("A"))
        .followedBy("b")(typed("B")).zeroOrMore.greedy
        .followedBy("c")(typed("C"))
        .within(w)
      val sorted = evs.map(e => (e.ts, e))
      val got = Cep.advance(pat, Nil, sorted.iterator,
          skip = Cep.SkipPastLastEvent)._1
        .map(m => (m("a").head.id, m.getOrElse("b", Vector.empty).map(_.id),
          m("c").head.id)).toSet

      // brute force: at each C (in order), the OLDEST surviving A
      // start in window completes (greedy Bs strictly between), and
      // the completion prunes every start created before this event —
      // only A events POSITIONED after the completing C may start
      // matches afterwards.
      var lastComplete = -1
      val out = scala.collection.mutable.Set.empty[(Long, Vector[Long], Long)]
      evs.zipWithIndex.foreach { case (e, ei) =>
        if (e.typ == "C") {
          val cand = evs.zipWithIndex.slice(lastComplete + 1, ei)
            .filter { case (a, _) => a.typ == "A" && e.ts - a.ts <= w }
          cand.headOption.foreach { case (a, ai) =>
            out += ((a.id,
              evs.slice(ai + 1, ei).filter(_.typ == "B").map(_.id).toVector,
              e.id))
            lastComplete = ei
          }
        }
      }
      got == out.toSet
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("(B|C)* greedy: alternation loop accumulates across names, zero ok") {
    val pat = Cep.Pattern.begin[Ev]("a")(typed("A"))
      .followedByAny("b" -> typed("B"), "c" -> typed("C"))
      .zeroOrMore.greedy
      .followedBy("d")(typed("D"))
    // mixed loop: B, C, (gap), B all accumulate before D closes
    val ms = run(pat, List(ev(1, 1, "A"), ev(2, 2, "B"), ev(3, 3, "C"),
      ev(4, 4, "X"), ev(5, 5, "B"), ev(6, 6, "D")))
    assert(ms == List(Map("a" -> Vector(1L), "b" -> Vector(2L, 5L),
      "c" -> Vector(3L), "d" -> Vector(6L))))
    // zero occurrences: optional drift straight to D
    val ms2 = run(pat, List(ev(1, 1, "A"), ev(2, 2, "D")))
    assert(ms2 == List(Map("a" -> Vector(1L), "d" -> Vector(2L))))
  }

  test("DSL: '*' and '**' compile to the optional-loop step") {
    val preds = Map[String, (Ev, Map[String, Vector[Ev]]) => Boolean](
      "A" -> typed("A"), "B" -> typed("B"), "C" -> typed("C"))
    val p = CepDsl.compile[Ev]("A B* C", preds)
    val b = p.steps(1)
    assert(b.optional && b.oneOrMore && !b.loopConsecutive)
    val pc = CepDsl.compile[Ev]("A >B** >C", preds)
    val bc = pc.steps(1)
    assert(bc.optional && bc.oneOrMore && bc.loopConsecutive && bc.strict)
  }

  test("MATCH_RECOGNIZE: B* parses greedy, B*? reluctant; groups take *") {
    def parse(patSrc: String) = MatchRecognize.parse(s"""
      MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES count(A) AS n
        PATTERN ($patSrc)
        DEFINE A AS A.event_type = 'view', B AS B.event_type = 'click',
               C AS C.event_type = 'purchase'
      )""")
    val st = parse("A B* C").pattern.steps(1)
    assert(st.optional && st.oneOrMore && st.greedy)
    val rel = parse("A B*? C").pattern.steps(1)
    assert(rel.optional && rel.oneOrMore && !rel.greedy)
    val grp = parse("A (B|C)*").pattern.steps(1)
    assert(grp.optional && grp.oneOrMore && grp.greedy && grp.alts.size == 2)
    // strict contiguity: * becomes a consecutive loop
    val strict = MatchRecognize.parse("""
      MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts
        MEASURES count(A) AS n
        PATTERN (A B* C)
        DEFINE A AS A.event_type = 'view', B AS B.event_type = 'click',
               C AS C.event_type = 'purchase'
      )""", MatchRecognize.Strict).pattern.steps(1)
    assert(strict.optional && strict.oneOrMore && strict.loopConsecutive)
  }
}
