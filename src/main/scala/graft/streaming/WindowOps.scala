package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time tumbling windows with pluggable TRIGGERS and EVICTORS —
  * the reference's window machinery options that Spark's built-in
  * `window()` aggregation cannot express (SURVEY §2.2 rows "Triggers"
  * and "Evictors").
  *
  * Reference: triggers `flink-streaming-java/.../windowing/triggers/`
  * (EventTimeTrigger, CountTrigger, DeltaTrigger,
  * ContinuousEventTimeTrigger, PurgingTrigger) and evictors
  * `.../windowing/evictors/` (CountEvictor, TimeEvictor, DeltaEvictor),
  * both consumed by `WindowOperator.java:100`.
  *
  * Semantics: rows buffer per (key, window). A trigger may FIRE the
  * window early (emitted with closing=false); the watermark passing the
  * window end always fires it a final time (closing=true) and drops the
  * window state. The evictor filters the buffered rows immediately
  * before each fire's aggregation (Flink's evictBefore). A
  * PurgingTrigger clears the buffer after each early fire, so later
  * fires only see newer rows. ContinuousEventTimeTrigger fires at
  * watermark-interval boundaries — evaluated at micro-batch/timeout
  * granularity, the model's clock.
  *
  * Scale notes: state is the per-window row buffer (an evicting window
  * inherently needs the raw rows — same in the reference, where an
  * evictor forces buffering instead of incremental aggregation), keyed
  * and watermark-bounded; timeouts re-fire only keys with armed timers.
  */
object WindowOps {

  sealed trait Trigger
  /** Fire only when the watermark passes the window end (default). */
  case object EventTimeTrigger extends Trigger
  /** Also fire every n buffered rows (CountTrigger.java). */
  final case class CountTrigger(n: Int) extends Trigger
  /** Also fire when a row's value differs from the last fire's anchor
    * value by ≥ threshold (DeltaTrigger.java; anchor starts at the
    * window's first value). */
  final case class DeltaTrigger(threshold: Double) extends Trigger
  /** Also fire whenever the watermark advances intervalMs past the
    * last fire (ContinuousEventTimeTrigger.java). */
  final case class ContinuousEventTimeTrigger(intervalMs: Long) extends Trigger
  /** Clear the window buffer after each early fire of the inner
    * trigger (PurgingTrigger.java). */
  final case class PurgingTrigger(inner: Trigger) extends Trigger

  sealed trait Evictor
  case object NoEvictor extends Evictor
  /** Keep only the newest `keep` rows at fire time (CountEvictor.java). */
  final case class CountEvictor(keep: Int) extends Evictor
  /** Keep only rows within keepMs of the newest row (TimeEvictor.java). */
  final case class TimeEvictor(keepMs: Long) extends Evictor
  /** Evict rows whose value differs from the newest row's value by ≥
    * threshold (DeltaEvictor.java). */
  final case class DeltaEvictor(threshold: Double) extends Evictor

  case class Elem(tsUs: Long, id: Long, v: Double)
  case class WinBuf(rows: List[Elem], sinceFire: Int,
                    anchorV: Option[Double], lastContFireMs: Long)
  case class WinState(wins: Map[Long, WinBuf])

  /** One emission: closing=false → early (trigger) fire; closing=true →
    * final fire at the watermark (window dropped afterwards). */
  case class WindowFire(user_id: Long, w_start_ms: Long, n: Long,
                        sum_v: Double, closing: Boolean)

  def tumble(events: Dataset[Event], sizeMs: Long, delay: String,
             trigger: Trigger = EventTimeTrigger,
             evictor: Evictor = NoEvictor): Dataset[WindowFire] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc: Encoder[WinState] = Encoders.kryo[WinState]

    val (innerTrigger, purging) = trigger match {
      case PurgingTrigger(t) => (t, true)
      case t => (t, false)
    }

    def evict(rows: List[Elem]): List[Elem] =
      if (rows.isEmpty) Nil
      else evictor match {
        case NoEvictor => rows
        case CountEvictor(k) => rows.takeRight(k)
        case TimeEvictor(keepMs) =>
          val maxTs = rows.map(_.tsUs).max
          rows.filter(e => maxTs - e.tsUs <= keepMs * 1000)
        case DeltaEvictor(th) =>
          val last = rows.last.v
          rows.filter(e => math.abs(last - e.v) < th)
      }

    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[WinState, WindowFire](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[WinState]) =>
          val wmMs = state.getCurrentWatermarkMs
          var wins = state.getOption.map(_.wins).getOrElse(Map.empty[Long, WinBuf])
          val out = List.newBuilder[WindowFire]

          def fire(start: Long, buf: WinBuf, closing: Boolean): WinBuf = {
            val kept = evict(buf.rows.sortBy(e => (e.tsUs, e.id)))
            out += WindowFire(user, start, kept.size, kept.map(_.v).sum, closing)
            if (!closing && purging) buf.copy(rows = Nil, sinceFire = 0)
            else buf.copy(sinceFire = 0)
          }

          // ---- ingest new rows (sorted), applying per-element triggers
          rows.toList.map(e => (Event.micros(e.ts), e))
            .sortBy { case (t, e) => (t, e.event_id) }
            .foreach { case (tUs, e) =>
              val start = tUs / 1000 / sizeMs * sizeMs
              if (start + sizeMs > wmMs) { // not already closed
                val buf0 = wins.getOrElse(start,
                  WinBuf(Nil, 0, None, start))
                var buf = buf0.copy(
                  rows = buf0.rows :+ Elem(tUs, e.event_id, e.value),
                  sinceFire = buf0.sinceFire + 1,
                  anchorV = buf0.anchorV.orElse(Some(e.value)))
                innerTrigger match {
                  case CountTrigger(n) if buf.sinceFire >= n =>
                    buf = fire(start, buf, closing = false)
                  case DeltaTrigger(th)
                    if buf.anchorV.exists(a => math.abs(e.value - a) >= th) =>
                    buf = fire(start, buf, closing = false)
                      .copy(anchorV = Some(e.value))
                  case _ => ()
                }
                wins += (start -> buf)
              } // else: late beyond watermark → dropped (Flink drop path)
            }

          // ---- watermark-driven fires: continuous + closing
          wins = wins.flatMap { case (start, buf0) =>
            var buf = buf0
            innerTrigger match {
              case ContinuousEventTimeTrigger(i)
                if wmMs < start + sizeMs && wmMs - buf.lastContFireMs >= i =>
                buf = fire(start, buf, closing = false)
                  .copy(lastContFireMs = wmMs)
              case _ => ()
            }
            if (wmMs >= start + sizeMs) { fire(start, buf, closing = true); None }
            else Some(start -> buf)
          }

          if (wins.isEmpty) state.remove()
          else {
            state.update(WinState(wins))
            val nextClose = wins.keys.map(_ + sizeMs).min
            val nextFire = innerTrigger match {
              case ContinuousEventTimeTrigger(i) =>
                math.min(nextClose, wins.values.map(_.lastContFireMs + i).min)
              case _ => nextClose
            }
            state.setTimeoutTimestamp(math.max(nextFire + 1, wmMs + 1))
          }
          out.result().iterator
      }
  }
}
