package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * Both inputs may be streaming; state expires at the watermark. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String, tsCol: String, delay: String,
                   lower: String, upper: String): DataFrame = {
    val l = left.withWatermark(tsCol, delay).alias("l")
    val r = right.withWatermark(tsCol, delay).alias("r")
    l.join(r,
      expr(s"""l.$key = r.$key AND
               r.$tsCol >= l.$tsCol - INTERVAL $lower AND
               r.$tsCol <= l.$tsCol + INTERVAL $upper"""))
  }

  /** Lookup join: enrich rows by point-lookups into an external table,
    * one lookup client + cache per partition (mapPartitions — the
    * Flink sync-lookup model; swap `lookup` for a real JDBC/HTTP
    * client in production). */
  def lookupJoin[V](df: DataFrame, keyCol: String,
                    makeClient: () => Long => Option[V],
                    outCol: String)(implicit vEnc: org.apache.spark.sql.Encoder[(Long, Option[V])]): DataFrame = {
    import df.sparkSession.implicits._
    val keyed = df.select(col(keyCol).cast("long")).as[Long]
    val looked = keyed.mapPartitions { it =>
      val client = makeClient() // one per partition, not per row
      it.map(k => (k, client(k)))
    }.toDF(keyCol, outCol)
    df.join(looked.dropDuplicates(keyCol), keyCol)
  }

  /** Async lookup join (AsyncDataStream.unorderedWait analog): point
    * lookups issued with bounded concurrency per partition; results
    * may interleave within the partition (unordered mode). */
  def lookupJoinAsync[V](df: DataFrame, keyCol: String,
                         makeClient: () => Long => scala.concurrent.Future[Option[V]],
                         outCol: String, maxInFlight: Int = 16)
      (implicit vEnc: org.apache.spark.sql.Encoder[(Long, Option[V])]): DataFrame = {
    import df.sparkSession.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val keyed = df.select(col(keyCol).cast("long")).as[Long]
    val looked = keyed.mapPartitions { it =>
      val client = makeClient()
      it.grouped(maxInFlight).flatMap { batch =>
        val fs = batch.map(k => client(k).map(v => (k, v)))
        Await.result(Future.sequence(fs), 5.minutes)
      }
    }.toDF(keyCol, outCol)
    df.join(looked.dropDuplicates(keyCol), keyCol)
  }
}