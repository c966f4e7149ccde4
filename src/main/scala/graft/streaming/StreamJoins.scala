package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** Stream-stream and lookup joins (SURVEY §2.4 "Joins" streaming rows).
  *
  * Reference: two-sided streaming join `StreamingJoinOperator.java:37`
  * (state both sides); time-bounded join `TimeBoundedStreamJoin.java`;
  * lookup join `LookupJoinRunner.java:36`.
  *
  * Scale notes: the watermarked interval join lets Spark expire both
  * sides' state at the watermark — without the time bound the state
  * store grows without bound (Spark rejects such joins in append
  * mode). Lookup join keeps the dimension in one connection/cache per
  * partition, not per row — on a cluster each executor holds its own
  * cache (the Flink lookup-cache model).
  */
object StreamJoins {

  /** Watermarked stream-stream interval join:
    * left.key = right.key AND right.ts ∈ [left.ts - lower, left.ts + upper].
    * Both inputs may be streaming; state expires at the watermark.
    * joinType covers the reference's streaming two-sided join types:
    * inner/left_outer/right_outer/full_outer here (outer rows emit
    * null-padded once the watermark passes their join window),
    * semi/anti in `SemiAntiJoin`. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String, tsCol: String, delay: String,
                   lower: String, upper: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(tsCol, delay).alias("l")
    val r = right.withWatermark(tsCol, delay).alias("r")
    l.join(r,
      expr(s"""l.$key = r.$key AND
               r.$tsCol >= l.$tsCol - INTERVAL $lower AND
               r.$tsCol <= l.$tsCol + INTERVAL $upper"""),
      joinType)
  }

  /** Lookup join: enrich rows IN PLACE by point-lookups into an
    * external table — one lookup client per partition, one output row
    * per input row with the looked-up value appended (the Flink
    * LookupJoinRunner shape: the operator enriches the row as it flows
    * through, it does not re-scan the input and join back; the earlier
    * scan-twice-and-join form here cost two source scans plus a
    * shuffle). Swap `makeClient` for a real JDBC/HTTP client in
    * production — JdbcSpec exercises it against embedded Derby. */
  def lookupJoin[V](df: DataFrame, keyCol: String,
                    makeClient: () => Long => Option[V],
                    outCol: String, outType: DataType = StringType): DataFrame = {
    val schema = df.schema.add(outCol, outType, nullable = true)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.mapPartitions { it =>
      val client = makeClient() // one per partition, not per row
      it.map { r =>
        val k = r.get(keyIdx).asInstanceOf[Number].longValue()
        Row.fromSeq(r.toSeq :+ client(k).orNull)
      }
    }
  }

  /** Async lookup join (AsyncDataStream.unorderedWait analog): point
    * lookups issued with bounded concurrency per partition, rows
    * enriched in place; results of one mini-batch may interleave
    * within the partition (unordered mode). */
  def lookupJoinAsync[V](df: DataFrame, keyCol: String,
                         makeClient: () => Long => scala.concurrent.Future[Option[V]],
                         outCol: String, outType: DataType = StringType,
                         maxInFlight: Int = 16): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val schema = df.schema.add(outCol, outType, nullable = true)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.mapPartitions { it =>
      val client = makeClient()
      it.grouped(maxInFlight).flatMap { batch =>
        val fs = batch.map { r =>
          val k = r.get(keyIdx).asInstanceOf[Number].longValue()
          client(k).map(v => Row.fromSeq(r.toSeq :+ v.orNull))
        }
        Await.result(Future.sequence(fs), 5.minutes)
      }
    }
  }
}