package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** DataSetUtils surface (reference flink-java DataSetUtils.java):
  * q249/q250 oracle-bind zipWithIndex and checksumHashCode; the
  * nondeterministic-by-value legs (unique ids, random sample) pin
  * their contracts here. */
class DatasetUtilsSpec extends SparkSpec {

  test("zipWithIndex is contiguous 0..n-1 over the sorted frame") {
    val ev = Tables.events(spark, sf).select(col("event_id"))
      .orderBy(col("event_id"))
    val zipped = DatasetUtils.zipWithIndex(ev)
    val n = ev.count()
    assert(zipped.count() == n)
    assert(zipped.agg(min("idx"), max("idx"), countDistinct("idx"))
      .head().toSeq == Seq(0L, n - 1, n))
  }

  test("zipWithUniqueId assigns distinct ids in one pass") {
    val ev = Tables.events(spark, sf).select(col("event_id"))
    val zipped = DatasetUtils.zipWithUniqueId(ev)
    val n = ev.count()
    assert(zipped.count() == n)
    assert(zipped.select("uid").distinct().count() == n)
  }

  test("sampleWithSize is exact-size, a subset, and seed-deterministic") {
    val ev = Tables.events(spark, sf).select(col("event_id"))
    val s1 = DatasetUtils.sampleWithSize(ev, 50, seed = 7L)
    assert(s1.count() == 50)
    assert(s1.select("event_id").distinct().count() == 50) // without replacement
    assert(s1.join(ev, "event_id").count() == 50)          // subset of input
    val s2 = DatasetUtils.sampleWithSize(ev, 50, seed = 7L)
    assert(s1.collect().map(_.getLong(0)).sorted.toSeq ==
           s2.collect().map(_.getLong(0)).sorted.toSeq)
    val s3 = DatasetUtils.sampleWithSize(ev, 50, seed = 8L)
    assert(s1.collect().map(_.getLong(0)).sorted.toSeq !=
           s3.collect().map(_.getLong(0)).sorted.toSeq)
  }
}
