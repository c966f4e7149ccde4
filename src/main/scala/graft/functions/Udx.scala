package graft.functions

import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** UDF / UDAF / UDTF surface (SURVEY §2.6).
  *
  * Reference: `ScalarFunction.java:49` (eval methods), `AggregateFunction
  * .java:114` (createAccumulator/accumulate/merge/getValue — `retract`
  * is unnecessary in the micro-batch model), `TableFunction.java:85`
  * (collect() 1→N), registered via the Table environment.
  *
  * Spark-first mapping: scalar UDFs register through spark.udf; typed
  * aggregates are `Aggregator[IN, BUF, OUT]` registered with udaf();
  * table functions are flatMap/explode. Prefer built-ins or native
  * Expressions (GraftFunctions) in hot paths — a Scala UDF blocks
  * whole-stage codegen at the call site.
  */
object Udx {

  /** Flink AggregateFunction equivalent: weighted average with a
    * mergeable accumulator (partial aggregation works map-side). */
  class WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(acc: (Double, Double), in: (Double, Double)): (Double, Double) =
      (acc._1 + in._1 * in._2, acc._2 + in._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(acc: (Double, Double)): Double =
      if (acc._2 == 0) 0.0 else acc._1 / acc._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed geometric mean — another AggregateFunction shape (log-sum
    * accumulator). */
  class GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(acc: (Double, Long), x: Double): (Double, Long) =
      (acc._1 + math.log(x), acc._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(acc: (Double, Long)): Double =
      if (acc._2 == 0) 0.0 else math.exp(acc._1 / acc._2)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** TableAggregateFunction equivalent (N in → M rows out per group)
    * — the reference's canonical Top2 UDTAF
    * (`flink-table/flink-table-common/.../functions/
    * TableAggregateFunction.java:31`, whose doc example IS Top2 with
    * an emitValue collecting multiple rows): keep the two largest
    * (value, id) pairs, emit one row per kept pair with its rank.
    * Spark-first: the multi-row emission is the array-valued finish +
    * explode — the accumulator merges map-side like any Aggregator.
    * Ordering is lexicographic on (value, id) so ties are
    * deterministic. */
  class Top2 extends Aggregator[(Double, Long), ((Double, Long), (Double, Long)),
                                Seq[(Double, Long, Int)]] {
    private val none: (Double, Long) = (Double.NegativeInfinity, Long.MinValue)
    private def gt(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)
    def zero: ((Double, Long), (Double, Long)) = (none, none)
    def reduce(acc: ((Double, Long), (Double, Long)), x: (Double, Long))
        : ((Double, Long), (Double, Long)) =
      if (gt(x, acc._1)) (x, acc._1)
      else if (gt(x, acc._2)) (acc._1, x)
      else acc
    def merge(a: ((Double, Long), (Double, Long)),
              b: ((Double, Long), (Double, Long)))
        : ((Double, Long), (Double, Long)) =
      Seq(a._1, a._2, b._1, b._2).sortWith(gt).take(2) match {
        case Seq(x, y) => (x, y)
      }
    def finish(acc: ((Double, Long), (Double, Long))): Seq[(Double, Long, Int)] =
      Seq(acc._1, acc._2).filter(_ != none).zipWithIndex
        .map { case ((v, id), i) => (v, id, i + 1) }
    def bufferEncoder: Encoder[((Double, Long), (Double, Long))] =
      Encoders.tuple(Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong),
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    def outputEncoder: Encoder[Seq[(Double, Long, Int)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** TableFunction equivalent (1→N): split a string into numbered
    * tokens; use with Dataset.flatMap or as an exploded UDF. */
  def tokenize(text: String): Seq[(Int, String)] =
    if (text == null) Seq.empty
    else text.split(" ").toSeq.zipWithIndex.map { case (t, i) => (i, t) }

  /** Register the whole surface on a session (SQL + Column access). */
  def register(spark: SparkSession): Unit = {
    GraftFunctions.register(spark)
    spark.udf.register("weighted_avg", udaf(new WeightedAvg))
    spark.udf.register("geo_mean", udaf(new GeoMean))
    spark.udf.register("top2", udaf(new Top2))
    spark.udf.register("tokenize",
      (s: String) => tokenize(s)) // SELECT explode(tokenize(text))
    // single-column TableFunction with possibly-EMPTY expansions — the
    // outer-correlate case (LEFT JOIN LATERAL TABLE ... ON TRUE)
    spark.udf.register("long_tokens", (s: String, n: Int) =>
      if (s == null) Seq.empty[String]
      else s.split(" ").toSeq.filter(_.length > n))
  }
}
