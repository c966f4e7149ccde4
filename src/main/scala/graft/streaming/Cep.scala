package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Complex event processing: a Flink-CEP-style pattern API compiled to
  * a small NFA, runnable over batch groups and keyed streams.
  *
  * Reference: pattern API `flink-libraries/flink-cep/.../pattern/
  * Pattern.java:50` (`where:156`, `optional:333`, `oneOrMore:352`,
  * `within`), NFA `.../nfa/NFA.java:85`, iterative conditions
  * (predicates see the partial match's bindings), used by SQL
  * MATCH_RECOGNIZE via `StreamExecMatch.scala:69`.
  *
  * Semantics implemented (subset): relaxed contiguity (followedBy),
  * `optional`, `oneOrMore` (greedy accumulation, emits on completion),
  * `within` time bound, NO_SKIP after-match strategy with one match
  * per started partial (a partial is consumed by its first completion
  * — each start event matches its earliest completing continuation).
  *
  * Scale notes: pattern matching is keyed — partials live per key and
  * are pruned by `within`, so state is bounded by (open partials ×
  * pattern length). Batch mode sorts each key group once; streaming
  * mode keeps partials in GroupState.
  */
object Cep {

  /** A pattern step; `pred` is an iterative condition — it sees the
    * candidate event and the events bound so far (Flink
    * IterativeCondition). */
  case class Step[T](name: String,
                     pred: (T, Map[String, List[T]]) => Boolean,
                     optional: Boolean = false,
                     oneOrMore: Boolean = false)

  case class Pattern[T](steps: Vector[Step[T]], withinUs: Long = Long.MaxValue) {
    def followedBy(name: String)(pred: (T, Map[String, List[T]]) => Boolean): Pattern[T] =
      copy(steps = steps :+ Step(name, pred))
    def optional: Pattern[T] =
      copy(steps = steps.init :+ steps.last.copy(optional = true))
    def oneOrMore: Pattern[T] =
      copy(steps = steps.init :+ steps.last.copy(oneOrMore = true))
    def within(us: Long): Pattern[T] = copy(withinUs = us)
  }

  object Pattern {
    def begin[T](name: String)(pred: (T, Map[String, List[T]]) => Boolean): Pattern[T] =
      Pattern(Vector(Step(name, pred)))
  }

  case class PartialMatch[T](stepIdx: Int, startUs: Long,
                             bindings: Map[String, List[T]])

  /** Run the NFA over one key's events (must be fed in event-time
    * order). Returns (completed matches, surviving partials).
    *
    * Skip-till-next-match: a partial ignores non-matching events and
    * takes the first matching one (no branching). A final `oneOrMore`
    * step emits on its first occurrence (non-greedy); a non-final one
    * accumulates until a later step matches. */
  def advance[T](pattern: Pattern[T], partials: List[PartialMatch[T]],
                 events: Iterator[(Long, T)]): (List[Map[String, List[T]]], List[PartialMatch[T]]) = {
    var open = partials
    val out = List.newBuilder[Map[String, List[T]]]
    events.foreach { case (tsUs, e) =>
      open = open.filter(p => tsUs - p.startUs <= pattern.withinUs)
      val next = List.newBuilder[PartialMatch[T]]
      // Returns the advanced partial, None if consumed by a completed
      // match or (for fresh starts) if nothing matched.
      def step(p: PartialMatch[T], retain: Boolean): Unit = {
        var i = p.stepIdx
        while (i < pattern.steps.size) {
          val st = pattern.steps(i)
          if (st.pred(e, p.bindings)) {
            val bound = p.bindings.updated(st.name,
              p.bindings.getOrElse(st.name, Nil) :+ e)
            val nextIdx = i + 1
            val restOptional = pattern.steps.drop(nextIdx).forall(_.optional)
            if (restOptional) out += bound // consumed on first completion
            else next += PartialMatch(if (st.oneOrMore) i else nextIdx, p.startUs, bound)
            return
          } else if (st.optional ||
                     (st.oneOrMore && p.bindings.getOrElse(st.name, Nil).nonEmpty)) {
            i += 1 // skippable: optional, or looping step already satisfied
          } else {
            if (retain) next += p // keep waiting (relaxed contiguity)
            return
          }
        }
        if (retain) next += p
      }
      open.foreach(p => step(p, retain = true))
      step(PartialMatch[T](0, tsUs, Map.empty), retain = false)
      open = next.result()
    }
    (out.result(), open)
  }

  case class FollowRow(user_id: Long, first_id: Long, second_id: Long, delta_us: Long)

  /** The common 2-step pattern as a typed operator: for each
    * `firstType` event, its earliest strictly-later `secondType` event
    * within `withinUs` (CEP semantics of the compiled 2-step NFA; also
    * the MATCH_RECOGNIZE `A B` shape). */
  def firstFollowedBy(events: Dataset[Event], firstType: String,
                      secondType: String, withinUs: Long): Dataset[FollowRow] = {
    import events.sparkSession.implicits._
    val pat = Pattern.begin[Event]("a")((e, _) => e.event_type == firstType)
      .followedBy("b") { (e, bound) =>
        e.event_type == secondType &&
          Event.micros(e.ts) > Event.micros(bound("a").head.ts)
      }
      .within(withinUs)
    events.filter(e => e.event_type == firstType || e.event_type == secondType)
      .groupByKey(_.user_id)
      .flatMapGroups { (user: Long, rows: Iterator[Event]) =>
        val sorted = rows.toList
          .sortBy(e => (Event.micros(e.ts), e.event_id))
          .map(e => (Event.micros(e.ts), e))
        advance(pat, Nil, sorted.iterator)._1.iterator.map { m =>
          val a = m("a").head; val b = m("b").head
          FollowRow(user, a.event_id, b.event_id,
            Event.micros(b.ts) - Event.micros(a.ts))
        }
      }
  }

  /** Batch CEP over a keyed Dataset of events (event-time sorted per
    * key inside). */
  def matchBatch[K](events: Dataset[Event], keyOf: Event => K,
                    pattern: Pattern[Event])(
      implicit ke: Encoder[K], oe: Encoder[(K, Map[String, List[Event]])])
      : Dataset[(K, Map[String, List[Event]])] = {
    import events.sparkSession.implicits._
    events.groupByKey(keyOf).flatMapGroups { (k: K, rows: Iterator[Event]) =>
      val sorted = rows.toList.sortBy(e => (Event.micros(e.ts), e.event_id))
        .map(e => (Event.micros(e.ts), e))
      advance(pattern, Nil, sorted.iterator)._1.map(m => (k, m)).iterator
    }
  }

  /** Streaming CEP: partials persist in keyed state across batches
    * (in-order delivery within the watermark assumed). */
  def matchStream(events: Dataset[Event], pattern: Pattern[Event])
      : Dataset[(Long, Map[String, List[Event]])] = {
    import events.sparkSession.implicits._
    implicit val stateEnc: Encoder[List[PartialMatch[Event]]] =
      Encoders.kryo[List[PartialMatch[Event]]]
    implicit val outEnc: Encoder[(Long, Map[String, List[Event]])] =
      Encoders.kryo[(Long, Map[String, List[Event]])]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[PartialMatch[Event]], (Long, Map[String, List[Event]])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[List[PartialMatch[Event]]]) =>
          val sorted = rows.toList.sortBy(e => (Event.micros(e.ts), e.event_id))
            .map(e => (Event.micros(e.ts), e))
          val (done, open) =
            advance(pattern, state.getOption.getOrElse(Nil), sorted.iterator)
          state.update(open)
          done.map(m => (user, m)).iterator
      }
  }
}
