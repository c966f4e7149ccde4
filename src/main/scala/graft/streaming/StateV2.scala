package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The reference's rich keyed-process surface
  * (`flink-streaming-java/.../api/functions/KeyedProcessFunction.java`
  * with named state descriptors — ValueState / ListState / MapState —
  * and timers) re-expressed on Spark's state-v2 API:
  * `KeyValueGroupedDataset.transformWithState` + `StatefulProcessor`,
  * whose `StatefulProcessorHandle` serves exactly Flink's named-state
  * model (`getValueState(name, encoder, ttl)` ↔
  * `getRuntimeContext.getState(new ValueStateDescriptor(...))`) plus
  * `registerTimer` ↔ `ctx.timerService.registerEventTimeTimer`.
  *
  * The operators themselves are already oracle-bound through
  * flatMapGroupsWithState (q131/q136); this surface re-expresses
  * keep-last dedup on the v2 API — same changelog contract, named
  * per-state TTL, RocksDB-backed (transformWithState requires the
  * RocksDB state store provider, the analog of the reference's
  * RocksDBStateBackend).
  */
object StateV2 {

  /** Flink KeyedProcessFunction with one named ValueState:
    * keep-the-latest per (user, type), emit on change. */
  class KeepLastProcessor
      extends StatefulProcessor[(Long, String), Event, Event] {
    @transient private var latest: ValueState[Event] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[Event](
        "latest", Encoders.product[Event], TTLConfig.NONE)

    override def handleInputRows(
        key: (Long, String), rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Event] = {
      val prev = Option(latest.get())
      val newest = (prev.iterator ++ rows)
        .maxBy(e => (Event.micros(e.ts), e.event_id))
      latest.update(newest)
      if (prev.contains(newest)) Iterator.empty else Iterator.single(newest)
    }
  }

  /** Keep-last dedup on the v2 surface (update-mode changelog —
    * result-identical to [[StatefulOps.dedupKeepLast]]). The caller
    * must run with the RocksDB state store provider (see
    * [[withRocksDb]]). */
  def dedupKeepLastV2(events: Dataset[Event]): Dataset[Event] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new KeepLastProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Run `body` with the RocksDB state store provider installed
    * (transformWithState's requirement), restoring the previous
    * provider afterwards — other queries in the session keep their
    * HDFS-backed checkpoints. */
  def withRocksDb[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
