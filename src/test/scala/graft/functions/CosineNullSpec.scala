package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Malformed-vector contract of cosine_similarity: null — never NaN,
  * which sorts above every real value under desc and would corrupt
  * top-k results. Exercises both the codegen and interpreted paths. */
class CosineNullSpec extends SparkSpec {

  private def sim(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    val spark2 = spark; import spark2.implicits._
    val df = Seq((a, b)).toDF("a", "b")
      .select(GraftFunctions.cosine_similarity(col("a"), col("b")).as("s"))
    val r = df.collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("normal vectors produce a similarity") {
    assert(sim(Seq(1.0, 0.0), Seq(1.0, 0.0)).contains(1.0))
  }

  test("zero-norm input yields null, not NaN") {
    assert(sim(Seq(0.0, 0.0), Seq(1.0, 2.0)).isEmpty)
  }

  test("empty arrays yield null") {
    assert(sim(Seq.empty, Seq.empty).isEmpty)
  }

  test("mismatched dimensions yield null instead of prefix truncation") {
    assert(sim(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)).isEmpty)
  }

  test("null never outranks real similarities in a top-k sort") {
    val spark2 = spark; import spark2.implicits._
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(0.5, 0.5)))
      .toDF("id", "v")
      .select(col("id"),
        GraftFunctions.cosine_similarity(col("v"), array(lit(1.0), lit(0.0))).as("s"))
      .orderBy(col("s").desc)
    assert(df.collect().head.getLong(0) == 1L) // the zero vector sorts last
  }
}
