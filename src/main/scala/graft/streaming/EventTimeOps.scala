package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-buffered event-time operators: rows are held in keyed
  * state until the watermark passes their timestamp, then processed in
  * exact event-time order — correct under arbitrary out-of-order
  * delivery within the watermark, unlike the in-order-assuming forms
  * in StatefulOps/Cep.
  *
  * Reference: streaming event-time sort
  * `StreamExecTemporalSort.scala:50` / `RowTimeSortOperator.java`
  * (buffer rows per timestamp, register an event-time timer, emit in
  * order when the watermark fires it); temporal join
  * `join/temporal/TemporalRowTimeJoinOperator.java:71` (buffers BOTH
  * sides in state and only joins rows at watermark advance).
  *
  * Spark mapping: the per-timestamp timer becomes
  * GroupStateTimeout.EventTimeTimeout — one armed timeout per key at
  * the oldest buffered row (a timer wheel in state, SURVEY §7.4 risk
  * 4); the WatermarkService is `state.getCurrentWatermarkMs()`.
  *
  * Scale notes: state per key is bounded by the rows inside the
  * watermark delay (the out-of-orderness horizon), exactly the
  * reference's retention. Keys are hash-partitioned; the state store
  * is RocksDB-backed on a real cluster.
  */
object EventTimeOps {

  private def us(e: Event): Long = Event.micros(e.ts)

  /** Emit buffered rows ≤ watermark; hold and re-arm for the rest.
    * Shared buffer step for every operator in this file. */
  private def split(buf: List[Event], state: GroupState[_])
      : (List[Event], List[Event]) = {
    val wmUs = state.getCurrentWatermarkMs() * 1000
    val (ready, hold) = buf.partition(e => us(e) <= wmUs)
    (ready.sortBy(e => (us(e), e.event_id)), hold)
  }

  private def arm(hold: List[Event], state: GroupState[_]): Unit =
    if (hold.nonEmpty)
      state.setTimeoutTimestamp(math.max(
        hold.map(e => us(e) / 1000).min + 1, state.getCurrentWatermarkMs() + 1))

  /** Streaming event-time sort (StreamExecTemporalSort): per-key rows
    * emitted in exact (ts, event_id) order once the watermark passes
    * them; late rows (beyond `delay`) are dropped by the watermark. */
  def eventTimeSorted(events: Dataset[Event], delay: String): Dataset[Event] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[List[Event]] = Encoders.kryo[List[Event]]
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], Event](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[List[Event]]) =>
          val (ready, hold) = split(state.getOption.getOrElse(Nil) ++ rows, state)
          if (hold.nonEmpty) { state.update(hold); arm(hold, state) }
          else state.remove()
          ready.iterator
      }
  }

  /** Out-of-order-safe temporal as-of join
    * (TemporalRowTimeJoinOperator.java:71): both sides buffer until the
    * watermark, then join in event-time order — a late-but-in-watermark
    * left row still joins rights that arrived earlier in wall time.
    * Same output contract as StatefulOps.asOfJoin. */
  def asOfJoinBuffered(events: Dataset[Event], leftType: String,
                       rightType: String, delay: String)
      : Dataset[StatefulOps.AsOfJoined] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[(Option[(Long, Long)], List[Event])] =
      Encoders.kryo[(Option[(Long, Long)], List[Event])]
    events
      .filter(e => e.event_type == leftType || e.event_type == rightType)
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Option[(Long, Long)], List[Event]), StatefulOps.AsOfJoined](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[(Option[(Long, Long)], List[Event])]) =>
          val (cur0, buf) = state.getOption.getOrElse((None, Nil))
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val all = buf ++ rows
          val (readyUnsorted, hold) = all.partition(e => us(e) <= wmUs)
          // lefts sort before rights at identical ts (as-of includes ties)
          val ready = readyUnsorted.sortBy(e =>
            (us(e), if (e.event_type == leftType) 0 else 1, e.event_id))
          var cur = cur0 // (leftId, leftTsUs)
          val out = List.newBuilder[StatefulOps.AsOfJoined]
          ready.foreach { e =>
            val t = us(e)
            if (e.event_type == leftType) {
              if (cur.forall(_._2 <= t)) cur = Some((e.event_id, t))
            } else out += StatefulOps.AsOfJoined(user, e.event_id,
              cur.map(_._1), cur.map(t - _._2))
          }
          if (hold.nonEmpty || cur.nonEmpty) state.update((cur, hold))
          else state.remove()
          arm(hold, state)
          out.result().iterator
      }
  }

  /** Out-of-order-safe streaming CEP: events buffer until the
    * watermark, then feed the NFA in exact event-time order (the
    * reference CEP operator does the same — `AbstractKeyedCEPPatternOperator`
    * buffers per timestamp and drains on watermark). */
  def matchStreamBuffered(events: Dataset[Event], pattern: Cep.Pattern[Event],
                          delay: String, skip: Cep.AfterMatchSkip = Cep.NoSkip)
      : Dataset[(Long, Map[String, Vector[Event]])] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[(List[Cep.PartialMatch[Event]], List[Event])] =
      Encoders.kryo[(List[Cep.PartialMatch[Event]], List[Event])]
    implicit val outEnc: Encoder[(Long, Map[String, Vector[Event]])] =
      Encoders.kryo[(Long, Map[String, Vector[Event]])]
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(List[Cep.PartialMatch[Event]], List[Event]), (Long, Map[String, Vector[Event]])](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[(List[Cep.PartialMatch[Event]], List[Event])]) =>
          val (partials, buf) = state.getOption.getOrElse((Nil, List.empty[Event]))
          val (ready, hold) = split(buf ++ rows, state)
          val (done, open, _) = Cep.advance(pattern, partials,
            ready.iterator.map(e => (us(e), e)), skip,
            Cep.nextSeqBase(partials))
          if (open.nonEmpty || hold.nonEmpty) state.update((open, hold))
          else state.remove()
          arm(hold, state)
          done.map(m => (user, m)).iterator
      }
  }
}
