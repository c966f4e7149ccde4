package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.Encoders
import scala.util.Random

/** The scale-safe batch CEP path (Cep.matchBatchSorted): sort-based
  * grouping + a one-pass NFA feed must (a) agree with the
  * materialize-and-sort flatMapGroups path on arbitrary data, and
  * (b) run a hot key's full history through the NFA while holding
  * only within-horizon state — the round-3 `weak` finding. */
class CepSortedSpec extends SparkSpec {

  test("a hot key streams 1e6 events through the NFA without materializing") {
    // ts advances 1 per event; pattern = a (every 100th) then b (50
    // later), within 60 — so at any instant at most two partials are
    // inside the horizon. The event source is a GENERATOR-backed
    // counting iterator: advance() must pull events one at a time
    // (full consumption through the lazy iterator = streaming; a
    // buffered implementation would still pass this pull count, but
    // the surviving/timed-out lists below pin the resident state).
    val n = 1000000L
    val pat = Cep.Pattern.begin[Long]("a")((e, _) => e % 100 == 0)
      .followedBy("b")((e, _) => e % 100 == 50)
      .within(60L)
    var pulled = 0L
    val events = new Iterator[(Long, Long)] {
      private var i = 0L
      def hasNext: Boolean = i < n
      def next(): (Long, Long) = { i += 1; pulled += 1; (i, i) }
    }
    val (done, open, timedOut) =
      Cep.advance(pat, Nil, events, Cep.NoSkip, collectTimeouts = false)
    assert(pulled == n, "the NFA must consume the stream lazily, fully")
    // a = 100k binds b = 100k + 50 for k = 1..9999 (the last a at 1e6
    // has no b inside the input)
    assert(done.size == 9999, s"matches: ${done.size}")
    assert(done.forall(m => m("b").head - m("a").head == 50))
    // resident state at the end: just the horizon's survivors — the
    // partial started at a=1e6. An implementation buffering history
    // or carrying expired partials would show up here as O(events).
    assert(open.size <= 2, s"open partials: ${open.size}")
    assert(timedOut.isEmpty, "suppressed timeout channel must stay empty")
  }

  test("matchBatchSorted equals matchBatch on randomized event data") {
    val spark2 = spark; import spark2.implicits._
    val rnd = new Random(42)
    val types = Array("view", "click", "purchase")
    // clustered timestamps with ties across users to stress the sort
    val evs = (1L to 600L).map { id =>
      Event(id, new Timestamp(1000L * rnd.nextInt(120)),
        rnd.nextInt(8).toLong, types(rnd.nextInt(3)), rnd.nextDouble(), "{}")
    }
    val ds = spark.createDataset(evs)
    // the q88 shape: view, no click between, purchase — exercises
    // negation + relaxed contiguity + within pruning
    val pat = Cep.Pattern
      .begin[Event]("a")((e, _) => e.event_type == "view")
      .notFollowedBy("x") { (e, bound) =>
        e.event_type == "click" &&
          Event.micros(e.ts) > Event.micros(bound("a").head.ts)
      }
      .followedBy("b") { (e, bound) =>
        e.event_type == "purchase" &&
          Event.micros(e.ts) > Event.micros(bound("a").head.ts)
      }
      .within(30000000L)
    def key(m: (Long, Map[String, Vector[Event]])): (Long, Long, Long) =
      (m._1, m._2("a").head.event_id, m._2("b").head.event_id)
    implicit val outEnc = Encoders.kryo[(Long, Map[String, Vector[Event]])]
    for (skip <- Seq(Cep.NoSkip, Cep.SkipPastLastEvent, Cep.SkipToNext)) {
      val viaSorted = Cep.matchBatchSorted(ds, pat, skip).collect().map(key).toSet
      val viaGroups = Cep.matchBatch[Long](ds, _.user_id, pat, skip)
        .collect().map(key).toSet
      assert(viaSorted == viaGroups,
        s"$skip: sorted=${viaSorted.size} grouped=${viaGroups.size}")
      assert(viaSorted.nonEmpty, s"$skip: fixture must actually produce matches")
    }
  }
}
