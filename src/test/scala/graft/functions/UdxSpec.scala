package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UdxSpec extends SparkSpec {

  test("weighted_avg and geo_mean aggregate correctly through SQL") {
    Udx.register(spark)
    import spark.implicits._
    Seq((1.0, 1.0), (3.0, 3.0)).toDF("v", "w").createOrReplaceTempView("vw")
    val row = spark.sql(
      "SELECT weighted_avg(v, w) AS wa, geo_mean(v) AS gm FROM vw").head()
    assert(math.abs(row.getDouble(0) - 2.5) < 1e-9)   // (1·1+3·3)/(1+3)
    assert(math.abs(row.getDouble(1) - math.sqrt(3.0)) < 1e-9)
  }

  test("tokenize acts as a table function via explode") {
    Udx.register(spark)
    import spark.implicits._
    val out = Seq("a b c").toDF("t")
      .select(explode(expr("tokenize(t)")).as("tok"))
      .select(col("tok._1").as("i"), col("tok._2").as("w"))
      .as[(Int, String)].collect().toList
    assert(out == List((0, "a"), (1, "b"), (2, "c")))
  }

  test("hash_code matches Java semantics with codegen") {
    Udx.register(spark)
    import spark.implicits._
    val got = Seq("abc", "", "Spark").toDF("s")
      .select(GraftFunctions.hash_code(col("s"))).as[Int].collect().toList
    assert(got == List("abc".hashCode, "".hashCode, "Spark".hashCode))
    val viaSql = spark.sql("SELECT hash_code('abc')").head().getInt(0)
    assert(viaSql == "abc".hashCode)
  }

  test("split_index / is_digit / is_alpha / is_decimal semantics") {
    import spark.implicits._
    import GraftFunctions._
    val df = Seq(("a-b-c", "123", "abc", "1.5")).toDF("s", "d", "a", "dec")
    val r = df.select(
      split_index(col("s"), "-", 1), split_index(col("s"), "-", 9),
      is_digit(col("d")), is_digit(col("a")),
      is_alpha(col("a")), is_decimal(col("dec"))).head()
    assert(r.getString(0) == "b" && r.isNullAt(1))
    assert(r.getBoolean(2) && !r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5))
  }
}
