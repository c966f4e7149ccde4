package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._

/** Sorted-group semantics (reference `DataSet.java:700`
  * `groupBy(...).sortGroup(...)` consumed by `reduceGroup`, and
  * `sortPartition` `DataSet.java:1401` over
  * `UnilateralSortMerger.java:61`): one shuffle on the key, a
  * partition-local sort, then ONE streaming pass per partition over
  * key-contiguous, order-sorted runs.
  *
  * Scale notes: this is the sort-based alternative to window
  * functions for per-group sequential logic — no per-key row buffering
  * (WindowExec materializes each partition's frame), state during the
  * pass is O(1) per key. At 100 TB the sort spills through Spark's
  * UnsafeExternalSorter exactly like the reference's external sorter.
  */
object SortedGroups {

  /** First n rows per key in `orderCol` order —
    * `groupBy(key).sortGroup(order, ASC).first(n)`. Emits rows in one
    * forward pass over the sorted partition; only a (key, count)
    * cursor is kept. */
  def firstNPerKeySorted(df: DataFrame, keyCol: String, orderCol: String,
                         n: Int): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(df.schema)
    val ki = df.schema.fieldIndex(keyCol)
    df.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
      .mapPartitions { it =>
        var curKey: Any = null
        var seen = 0
        it.filter { r =>
          val k = r.get(ki)
          if (k != curKey) { curKey = k; seen = 0 }
          seen += 1
          seen <= n
        }
      }
  }

  /** Sorted-group reduce: `groupBy(key).sortGroup(order).reduceGroup(f)`
    * where f folds each key's rows IN ORDER into one output row
    * (out = (key, folded string) here — the reference's GroupReduce
    * with sorted input). */
  def sortedGroupConcat(df: DataFrame, keyCol: String, orderCol: String,
                        valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ki = df.schema.fieldIndex(keyCol)
    val vi = df.schema.fieldIndex(valCol)
    df.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
      .mapPartitions { it =>
        // stream key-contiguous runs; O(current group) memory
        new Iterator[(Long, String)] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): (Long, String) = {
            val k = buf.head.get(ki).asInstanceOf[Number].longValue()
            val sb = new StringBuilder
            while (buf.hasNext &&
              buf.head.get(ki).asInstanceOf[Number].longValue() == k) {
              if (sb.nonEmpty) sb.append(",")
              sb.append(buf.next().get(vi))
            }
            (k, sb.toString)
          }
        }
      }.toDF(keyCol, "joined")
  }
}
