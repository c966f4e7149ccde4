package graft.operators

import graft.SparkSpec

/** The observable partitioning contracts on controlled inputs —
  * including the shapes the sf-data rollup queries cannot reach
  * (negative keys, non-divisible counts, skewed keys). */
class PartitioningSpec extends SparkSpec {

  private def df(users: Seq[Long]) = {
    val spark2 = spark; import spark2.implicits._
    users.zipWithIndex.map { case (u, i) => (i.toLong, u, 1.0) }
      .toDF("event_id", "user_id", "value")
  }

  test("customPartitionRollup routes by mod, negative keys included") {
    val out = Partitioning.customPartitionRollup(
        df(Seq(0L, 1L, 5L, 9L, -3L)), parts = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // -3 mod 4 normalizes to 1: partition 1 gets {1, 5, 9, -3}
    assert(out == Map(0 -> 1L, 1 -> 4L, 2 -> 0L, 3 -> 0L))
  }

  test("rebalanceSizes yields floor/ceil sizes for non-divisible counts") {
    val out = Partitioning.rebalanceSizes(df(Seq.fill(10)(7L)), parts = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(out.map(_._2).toList == List(3L, 3L, 2L, 2L))
  }

  test("hashColocation sends a hot key to exactly one partition") {
    val out = Partitioning.hashColocation(
        df(Seq.fill(50)(42L) ++ Seq(1L, 2L, 3L)), parts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.values.forall(_ == 1L) && out.size == 4)
  }

  test("rangeDisjointness holds and loses nothing on a skewed input") {
    val row = Partitioning.rangeDisjointness(
        df((1L to 40L) ++ Seq.fill(30)(7L)), parts = 5).head()
    assert(row.getBoolean(0) && row.getBoolean(1) && row.getLong(2) == 70L)
  }

  test("saltedJoin: result equals the plain join; the hot key spreads over salts") {
    import org.apache.spark.sql.functions._
    // 8000 rows on ONE hot key + a 200-key tail
    val fact = df(Seq.fill(8000)(7L) ++ (100L to 299L))
      .select(col("user_id").as("k"), col("event_id"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("category", pmod(col("k"), lit(16)))
    val salted = Partitioning.saltedJoin(fact, dim, "k",
      col("event_id"), salts = 8)
    val plain = fact.join(dim, Seq("k"))
    // result-neutral, row for row
    assert(salted.select(col("k"), col("event_id"), col("category"))
      .exceptAll(plain.select(col("k"), col("event_id"), col("category")))
      .isEmpty)
    assert(salted.count() == plain.count())
    // spread: shuffling on (k, salt) caps the biggest partition near
    // hot/salts, where shuffling on k alone melts one partition
    def maxPart(d: org.apache.spark.sql.DataFrame,
                cols: Seq[String]): Long =
      d.repartition(32, cols.map(col): _*)
        .groupBy(spark_partition_id()).count()
        .agg(max(col("count"))).head().getLong(0)
    val unsalted = maxPart(fact, Seq("k"))
    val spread = maxPart(
      fact.withColumn("__salt", pmod(col("event_id"), lit(8))),
      Seq("k", "__salt"))
    assert(unsalted >= 8000L, s"hot key must melt one partition: $unsalted")
    assert(spread <= unsalted / 4,
      s"salted max partition $spread vs unsalted $unsalted")
  }
}
