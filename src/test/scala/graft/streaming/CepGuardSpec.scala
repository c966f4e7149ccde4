package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec

/** Hot-key partial-match safety valve (CepGuard): bounded state and a
  * loud degrade path under the adversarial workload — a hot key
  * feeding a long greedy oneOrMore with no `within` bound, where every
  * event starts a fresh partial that never completes or expires. */
class CepGuardSpec extends SparkSpec {

  private def ev(id: Long, tSec: Long, typ: String) =
    Event(id, new Timestamp(tSec * 1000), 1L, typ, 0.0, "{}")

  private val isType = (t: String) =>
    (e: Event, _: Map[String, Vector[Event]]) => e.event_type == t

  // the adversarial shape from the round-4 verdict: greedy unbounded
  // loop, hot key, successor never fires
  private val greedyLoop = Cep.Pattern.begin[Event]("a")(isType("view"))
    .oneOrMore.greedy
    .followedBy("b")(isType("purchase"))

  test("unbounded default: partials grow with every start (the hazard)") {
    val events = (1 to 500).map(i => (i * 1000000L, ev(i, i, "view")))
    val (_, open, _) = Cep.advance(greedyLoop, Nil, events.iterator)
    assert(open.size == 500) // one partial per start — linear growth
  }

  test("maxPartials bounds state and sheds loudly") {
    var shed = 0
    val guard = Cep.CepGuard(maxPartials = 64, onDrop = shed += _)
    val events = (1 to 500).map(i => (i * 1000000L, ev(i, i, "view")))
    val (done, open, _) =
      Cep.advance(greedyLoop, Nil, events.iterator, guard = guard)
    assert(done.isEmpty)
    assert(open.size == 64)       // bounded state
    assert(shed == 500 - 64)      // every shed start counted
  }

  test("admission control: in-flight partials still complete") {
    var shed = 0
    val guard = Cep.CepGuard(maxPartials = 64, onDrop = shed += _)
    val events = (1 to 200).map(i => (i * 1000000L, ev(i, i, "view"))) :+
      ((201 * 1000000L, ev(201, 201, "purchase")))
    val (done, open, _) =
      Cep.advance(greedyLoop, Nil, events.iterator, guard = guard)
    // the 64 admitted partials (oldest starts) all complete on B;
    // greedy loop → one maximal match per start
    assert(done.size == 64)
    assert(done.map(_("a").head.event_id).toSet == (1L to 64L).toSet)
    assert(open.isEmpty)
    assert(shed == 200 - 64)
  }

  test("an unsaturated guard changes nothing") {
    val pat = Cep.Pattern.begin[Event]("a")(isType("view"))
      .followedBy("b")(isType("purchase"))
    val events = (1 to 50).flatMap(i => Seq(
      (2L * i * 1000000L, ev(2L * i, 2L * i, "view")),
      ((2L * i + 1) * 1000000L, ev(2L * i + 1, 2L * i + 1, "purchase"))))
    var shed = 0
    val withGuard = Cep.advance(pat, Nil, events.iterator,
      guard = Cep.CepGuard(maxPartials = 1000, onDrop = shed += _))
    val without = Cep.advance(pat, Nil, events.iterator)
    assert(withGuard._1 == without._1)
    assert(shed == 0)
  }

  test("guard state bound holds across streaming-style chunked passes") {
    val guard = Cep.CepGuard(maxPartials = 32)
    var open = List.empty[Cep.PartialMatch[Event]]
    var seqBase = 0L
    (0 until 10).foreach { chunk =>
      val events = (1 to 100).map { i =>
        val id = chunk * 100L + i
        (id * 1000000L, ev(id, id, "view"))
      }
      val r = Cep.advance(greedyLoop, open, events.iterator,
        seqBase = seqBase, guard = guard)
      open = r._2
      seqBase = Cep.nextSeqBase(open) max seqBase + 100
      assert(open.size <= 32) // invariant after every batch
    }
    assert(open.size == 32)
  }
}
