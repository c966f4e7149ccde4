package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming semi / anti join on a key (reference
  * `join/stream/StreamingSemiAntiJoinOperator.java:35`): left rows are
  * emitted iff a right row with the same key exists (semi) / does not
  * exist (anti).
  *
  * Model mapping: the reference streams retractions — an anti result
  * is emitted immediately and retracted when a matching right arrives.
  * Structured Streaming's append mode has no retract, so:
  *  - semi: a left row is emitted as soon as a right-side match is
  *    known (on arrival of either side — both orders of arrival work);
  *  - anti: a left row is emitted once the event-time watermark passes
  *    `left.ts + gap` with no right row seen for the key — the
  *    no-retract approximation: "no match within the out-of-orderness
  *    horizon" instead of "no match ever".
  *
  * Scale notes: state per key is one boolean + the lefts still inside
  * the horizon; idle keys are garbage-collected by the event-time
  * timeout (the reference's idle-state retention,
  * `StreamQueryConfig.withIdleStateRetentionTime`). Keyed by join key
  * → hash-partitioned, horizontally scalable.
  */
object SemiAntiJoin {

  /** Tagged union row: both inputs flattened into one keyed stream so
    * a single stateful operator sees both sides (the two-input
    * operator pattern from StatefulOps). */
  case class SideEvent(left: Boolean, event_id: Long, ts: Timestamp,
                       user_id: Long, event_type: String, value: Double,
                       props: String)

  case class SAState(rightSeen: Boolean, pending: List[Event])

  private def toEvent(s: SideEvent): Event =
    Event(s.event_id, s.ts, s.user_id, s.event_type, s.value, s.props)

  private def tagged(left: Dataset[Event], right: Dataset[Event],
                     delay: String): Dataset[SideEvent] = {
    val spark = left.sparkSession
    import spark.implicits._
    def tag(ds: Dataset[Event], isLeft: Boolean) = ds.map(e =>
      SideEvent(isLeft, e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props))
    tag(left, isLeft = true).union(tag(right, isLeft = false))
      .withWatermark("ts", delay)
  }

  /** Streaming LEFT SEMI join on user_id: each left event is emitted
    * exactly once, as soon as at least one right event of the same key
    * has been seen (either arrival order). `retention` bounds how long
    * an unmatched left (and the key's seen-flag) is kept. */
  def semiJoin(left: Dataset[Event], right: Dataset[Event], delay: String,
               retentionMs: Long = 3600_000L): Dataset[Event] = {
    val spark = left.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[SAState] = Encoders.kryo[SAState]
    tagged(left, right, delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SAState, Event](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[SAState]) =>
          if (state.hasTimedOut) { // idle-state retention expiry
            state.remove(); Iterator.empty
          } else {
            val st = state.getOption.getOrElse(SAState(rightSeen = false, Nil))
            val rs = rows.toList
            val seen = st.rightSeen || rs.exists(!_.left)
            val lefts = st.pending ++ rs.filter(_.left).map(toEvent)
            val (out, pending) = if (seen) (lefts, Nil) else (Nil, lefts)
            state.update(SAState(seen, pending))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + retentionMs)
            out.sortBy(e => (Event.micros(e.ts), e.event_id)).iterator
          }
      }
  }

  /** Streaming LEFT ANTI join on user_id: each left event is emitted
    * once the watermark passes `left.ts + gap` and no right event of
    * the same key has been seen. Once a right arrives, current and
    * later lefts of that key are suppressed while the key's state
    * lives (`retention` after last watermark movement). */
  def antiJoin(left: Dataset[Event], right: Dataset[Event], delay: String,
               gapMs: Long = 0L, retentionMs: Long = 3600_000L): Dataset[Event] = {
    val spark = left.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[SAState] = Encoders.kryo[SAState]
    tagged(left, right, delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SAState, Event](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[SAState]) =>
          val st = state.getOption.getOrElse(SAState(rightSeen = false, Nil))
          val rs = rows.toList
          val seen = st.rightSeen || rs.exists(!_.left)
          val lefts = st.pending ++ rs.filter(_.left).map(toEvent)
          val wmUs = state.getCurrentWatermarkMs() * 1000
          // mature = watermark passed ts+gap: emit if no right seen
          val (mature, pending) =
            lefts.partition(e => Event.micros(e.ts) + gapMs * 1000 <= wmUs)
          val out = if (seen) Nil else mature
          // Drop ALL key state when nothing is pending and either the
          // retention timeout fired or there is nothing to remember.
          // The timeout branch is unconditional — an idle key's seen
          // tombstone must go at its first retention expiry, never be
          // re-armed by the expiry itself (state-leak risk on
          // high-cardinality keys otherwise).
          if (pending.isEmpty && (state.hasTimedOut || !seen)) {
            if (state.exists) state.remove() // nothing pending / retention up
          } else {
            state.update(SAState(seen, pending))
            val next =
              if (pending.nonEmpty)
                pending.map(e => Event.micros(e.ts) / 1000 + gapMs).min + 1
              else state.getCurrentWatermarkMs() + retentionMs
            state.setTimeoutTimestamp(math.max(next, state.getCurrentWatermarkMs() + 1))
          }
          out.sortBy(e => (Event.micros(e.ts), e.event_id)).iterator
      }
  }
}
