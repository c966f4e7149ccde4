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

  test("saltedJoin: NULL salt source routes to salt 0, never drops the row") {
    import org.apache.spark.sql.functions._
    // ADVICE r11: pmod(NULL, n) is NULL — an inner join on (k, NULL)
    // silently dropped the fact row even when its key matched
    val fact = df(Seq(7L, 7L, 8L))
      .select(col("user_id").as("k"),
        when(col("event_id") === 0L, lit(null).cast("long"))
          .otherwise(col("event_id")).as("src"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("category", pmod(col("k"), lit(16)))
    val salted = Partitioning.saltedJoin(fact, dim, "k", col("src"), 4)
    assert(salted.count() == 3,
      "the NULL-salt row must survive the salted join")
    // a user column named __salt must not be shadowed or dropped
    val fact2 = fact.withColumn("__salt", lit(99L))
    val out2 = Partitioning.saltedJoin(fact2, dim, "k", col("src"), 4)
    assert(out2.count() == 3 && out2.columns.contains("__salt"))
    assert(out2.filter(col("__salt") =!= 99L).count() == 0)
  }

  test("adaptiveSaltedJoin: only detected-hot keys fan out, per-key salt counts") {
    import org.apache.spark.sql.functions._
    // key 7: 8000 rows (very hot), key 9: 900 rows (mildly hot),
    // 200-key cold tail of 1 row each
    val fact = df(Seq.fill(8000)(7L) ++ Seq.fill(900)(9L) ++ (100L to 299L))
      .select(col("user_id").as("k"), col("event_id"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("category", pmod(col("k"), lit(16)))
    // detection: exactly the two heavy keys, the heavier with the
    // larger fan-out, every fan-out in [2, maxSalts]
    val hot = Partitioning.hotKeys(fact, "k", maxSalts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hot.keySet == Set(7L, 9L),
      s"mean+sigma must detect exactly the heavy keys: $hot")
    assert(hot(7L) == 8L && hot(9L) >= 2L && hot(9L) < hot(7L),
      s"per-key fan-out must track mass: $hot")
    // result-neutral, row for row
    val salted = Partitioning.adaptiveSaltedJoin(fact, dim, "k",
      col("event_id"), maxSalts = 8)
    val plain = fact.join(dim, Seq("k"))
    assert(salted.select(col("k"), col("event_id"), col("category"))
      .exceptAll(plain.select(col("k"), col("event_id"), col("category")))
      .isEmpty)
    assert(salted.count() == plain.count())
    // spread: the hot partition shrinks ~×salts; measured with
    // broadcast off so the (k, salt) hash exchange is the real plan
    def maxPart(d: org.apache.spark.sql.DataFrame,
                cols: Seq[org.apache.spark.sql.Column]): Long =
      d.repartition(32, cols: _*)
        .groupBy(spark_partition_id()).count()
        .agg(max(col("count"))).head().getLong(0)
    val hotDf = Partitioning.hotKeys(fact, "k", 8)
    val factSalted = fact.join(broadcast(hotDf), Seq("k"), "left")
      .withColumn("__s",
        coalesce(pmod(col("event_id"), col("__salts")), lit(0L)))
    val unsalted = maxPart(fact, Seq(col("k")))
    val spread = maxPart(factSalted, Seq(col("k"), col("__s")))
    assert(unsalted >= 8000L)
    assert(spread <= unsalted / 4,
      s"adaptive-salted max partition $spread vs unsalted $unsalted")
    // cold keys never fan out: dim-side replication count is 1 for
    // cold keys, exactly __salts for hot keys
    val dimRep = dim.join(broadcast(hotDf), Seq("k"), "left")
      .withColumn("__s",
        explode(sequence(lit(0L), coalesce(col("__salts"), lit(1L)) - 1)))
      .groupBy(col("k")).count()
    assert(dimRep.filter(col("k") === 7L).head().getLong(1) == 8L)
    assert(dimRep.filter(col("k") >= 100L)
      .filter(col("count") =!= 1L).count() == 0,
      "cold dim keys must not be replicated")
  }
}
