package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Exercises for surface rows that were implemented-but-unexercised in
  * round 1: coGroup (DataSet.java:1009 / CoGroupedStreams), the
  * sort-based aggregate path (BatchExecSortAggRule.scala:59), and the
  * rate streaming source. */
class BatchSurfaceSpec extends SparkSpec {

  test("cogroup merges both sides' groups per key") {
    val spark2 = spark; import spark2.implicits._
    val orders = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDS()
      .groupByKey(_._1)
    val custs = Seq((1L, "alice"), (3L, "carol")).toDS()
      .groupByKey(_._1)
    val got = orders.cogroup(custs) { (k, os, cs) =>
      Iterator((k, os.map(_._2).sum, cs.map(_._2).toList.sorted.mkString(",")))
    }.collect().toSet
    assert(got == Set(
      (1L, 30.0, "alice"),  // both sides
      (2L, 5.0, ""),        // left only
      (3L, 0.0, "carol")))  // right only
  }

  test("sort-based aggregate path produces the same result as hash agg") {
    val spark2 = spark; import spark2.implicits._
    val df = Seq((1L, "b"), (1L, "a"), (2L, "c")).toDF("k", "v")
    def agg() = df.groupBy(col("k"))
      .agg(array_join(array_sort(collect_list(col("v"))), ",").as("vs"))
    val viaHash = agg().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "false")
    try {
      val q = agg()
      val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortAggregate"), s"sort agg not chosen:\n$plan")
      val viaSort = q.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(viaSort == viaHash && viaSort == Set((1L, "a,b"), (2L, "c")))
    } finally spark.conf.unset("spark.sql.execution.useObjectHashAggregateExec")
  }

  test("approximate distinct and quantiles hold their error bounds") {
    // The 100 TB substitutes for exact distinct/percentile: HLL++
    // (approx_count_distinct, rsd-bounded, no full shuffle of keys)
    // and KLL-style approx percentiles (bounded-size sketch, mergeable
    // map-side). Assert the bounds on real data so a Spark upgrade
    // that degrades sketch behavior is caught.
    val li = graft.Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), rsd = 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"HLL off: exact=$exact approx=$approx")
    val (exactMed, approxMed) = {
      val r = li.select(
        expr("percentile(l_quantity, 0.5)"),
        expr("percentile_approx(l_quantity, 0.5, 10000)")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    // quantity is 1..50 integral; a 10k sketch must land within 1
    assert(math.abs(exactMed - approxMed) <= 1.0,
      s"approx median off: exact=$exactMed approx=$approxMed")
  }

  test("rate-micro-batch source produces deterministic rows") {
    val q = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 5).load()
      .writeStream.format("memory").queryName("rate1")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q.awaitTermination(60000)
    val n = spark.table("rate1").count()
    assert(n == 5, s"expected one 5-row batch, got $n")
  }
}
