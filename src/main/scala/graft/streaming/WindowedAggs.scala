package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time window aggregation builders (reference: group window agg
  * `StreamExecGroupWindowAggregate.scala:33`, assigners
  * `flink-table-runtime-blink/.../window/assigners/` Tumbling, Sliding,
  * Session; watermark `WatermarkAssignerOperator.java:38`).
  *
  * Each takes a streaming (or batch — same code path) DataFrame with an
  * event-time column and returns the windowed aggregate. The watermark
  * bound plays Flink's BoundedOutOfOrdernessTimestampExtractor role:
  * rows later than the watermark are dropped, windows finalize when the
  * watermark passes their end.
  */
object WindowedAggs {

  /** Tumbling event-time window (TumblingEventTimeWindows). */
  def tumble(df: DataFrame, tsCol: String, size: String, delay: String,
             keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding/hopping event-time window (SlidingEventTimeWindows). */
  def hop(df: DataFrame, tsCol: String, size: String, slide: String,
          delay: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows with a fixed gap (EventTimeSessionWindows). */
  def session(df: DataFrame, tsCol: String, gap: String, delay: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows with a per-row dynamic gap expression
    * (DynamicEventTimeSessionWindows): gapCol is any Column producing
    * an interval/duration per row, e.g.
    * when($"event_type" === "error", "5 minutes").otherwise("30 minutes"). */
  def sessionDynamic(df: DataFrame, tsCol: String, gapCol: Column, delay: String,
                     keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gapCol) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Keep-first streaming dedup (DeduplicateKeepFirstRowFunction):
    * built-in dropDuplicates scoped by watermark. */
  def dedupKeepFirst(df: DataFrame, tsCol: String, delay: String,
                     keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Late-data side output (reference `WindowOperator.java:139`
    * `lateDataOutputTag`; SURVEY §7.3 maps per-record side outputs to
    * a tag column + two filtered sinks): tags each event `is_late`
    * when it arrives more than `delayMs` behind the maximum event time
    * its key has seen — the BoundedOutOfOrderness watermark model,
    * tracked per key in state so the operator itself needs no engine
    * watermark and LATE ROWS ARE NOT DROPPED but routed. Feed the
    * result to two filtered sinks: !is_late → the windowed aggregation
    * (with the engine watermark), is_late → the late-data channel. */
  def tagLate(events: org.apache.spark.sql.Dataset[Event], delayMs: Long)
      : org.apache.spark.sql.Dataset[(Event, Boolean)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Event, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          var maxUs = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toList
            .sortBy(e => (Event.micros(e.ts), e.event_id))
            .map { e =>
              val t = Event.micros(e.ts)
              val late = maxUs != Long.MinValue && t < maxUs - delayMs * 1000
              if (t > maxUs) maxUs = t
              (e, late)
            }
          state.update(maxUs)
          out.iterator
      }
  }
}
