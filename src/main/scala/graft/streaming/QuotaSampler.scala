package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming admission quota — the sampling / rate-limit stage of a
  * streaming curation pipeline: admit the first `quota` rows per key in
  * arrival order, drop the rest.
  *
  * Reference analog: a keyed process function holding a ValueState
  * counter (`flink-streaming-java/.../api/operators/
  * KeyedProcessOperator.java:45` driving a user function over
  * `flink-core/.../api/common/state/ValueStateDescriptor.java:30`) —
  * the canonical "first N per key" Flink exercise. Spark-first form:
  * `flatMapGroupsWithState` in Append mode.
  *
  * Scale: state per key is ONE long counter — bounded regardless of
  * stream length or key heat; the operator shuffles once on the key,
  * like every keyed stateful op. Rows inside a micro-batch are sorted
  * by id so a replay admits a deterministic prefix (the replay harness
  * delivers epochs in id order).
  */
object QuotaSampler {

  /** A keyed row: `doc_id` orders arrivals inside a batch, `k` is the
    * quota key (language, source, tenant...). */
  case class DocKey(doc_id: Long, k: String)

  def admitFirstN(docs: Dataset[DocKey], quota: Int): Dataset[DocKey] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.k)
      .flatMapGroupsWithState[Long, DocKey](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val admitted = rows.toList.sortBy(_.doc_id).filter { _ =>
            if (n < quota) { n += 1; true } else false
          }
          state.update(n)
          admitted.iterator
      }
  }
}
