package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Agg-on-agg (SURVEY §7.4 risk 1): both re-modelings must track the
  * true two-level aggregate across batches — users MOVING buckets is
  * the case naive chaining gets wrong. */
class RetractSpec extends SparkSpec {

  private def ev(id: Long, user: Long) =
    Event(id, new Timestamp(id * 1000), user, "click", 0.0, "{}")

  test("explicit changelog keeps the outer aggregate correct across batches") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Retract.applyChangelog(Retract.countPerUserChangelog(ms.toDS()))
      .toDF("bucket", "n_users")
      .writeStream.format("memory").queryName("chg").outputMode("append").start()
    // batch 1: u1 ×1, u2 ×1 → bucket 1 has 2 users
    ms.addData(ev(1, 1), ev(2, 2))
    q.processAllAvailable()
    // batch 2: u1 gets 2 more → moves bucket 1 → 3 (the retract case)
    ms.addData(ev(3, 1), ev(4, 1))
    q.processAllAvailable()
    // batch 3: u3 appears in bucket 1
    ms.addData(ev(5, 3))
    q.processAllAvailable()
    q.stop()
    // latest emission per bucket = current outer aggregate
    val latest = spark.table("chg").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .zipWithIndex
      .groupBy(_._1._1).map { case (b, rows) => b -> rows.maxBy(_._2)._1._2 }
    // u1 in bucket 3; u2, u3 in bucket 1
    assert(latest == Map(1L -> 2L, 3L -> 1L))
    // and the changelog retracted u1 from bucket 1: its history is 2→1→2
    val bucket1 = spark.table("chg").collect()
      .filter(_.getLong(0) == 1L).map(_.getLong(1)).toList
    assert(bucket1 == List(2L, 1L, 2L))
  }

  test("changelog through a join keeps the enriched outer aggregate correct") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "eu"), (2L, "us"), (3L, "eu"))
      .toDF("user_id", "dim_value")
    val ms = MemoryStream[Event]
    val q = Retract.changelogThroughJoin(ms.toDS(), dim)
      .toDF("dim_value", "bucket", "n_users")
      .writeStream.format("memory").queryName("chgjoin").outputMode("append").start()
    // batch 1: u1(eu) ×1, u2(us) ×1
    ms.addData(ev(1, 1), ev(2, 2))
    q.processAllAvailable()
    // batch 2: u1 gets 2 more → LEAVES (eu, 1), enters (eu, 3) — the
    // retraction must survive the join or (eu, 1) double-counts
    ms.addData(ev(3, 1), ev(4, 1))
    q.processAllAvailable()
    // batch 3: u3(eu) enters bucket 1
    ms.addData(ev(5, 3))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("chgjoin").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    // latest emission per (dim, bucket) = current outer aggregate
    val latest = rows.zipWithIndex.groupBy(_._1._1)
      .map { case (k, vs) => k -> vs.maxBy(_._2)._1._2 }
    assert(latest == Map(("eu", 1L) -> 1L, ("us", 1L) -> 1L, ("eu", 3L) -> 1L))
    // and (eu, 1) was retracted when u1 moved: history 1 → 0 → 1
    val eu1 = rows.filter(_._1 == ("eu", 1L)).map(_._2).toList
    assert(eu1 == List(1L, 0L, 1L))
  }

  test("foreachBatch + upsert (MERGE pattern) reaggregates correctly") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val url = "jdbc:derby:memory:retractdb;create=true"
    Retract.initUserCountTable(url)
    val ms = MemoryStream[Event]
    val inner = ms.toDF().groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val q = inner.writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        Retract.upsertUserCounts(df, url)
      }.start()
    ms.addData(ev(1, 1), ev(2, 2))
    q.processAllAvailable()
    val after1 = Retract.bucketCountsFromTable(spark, url).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after1 == Map(1L -> 2L))
    ms.addData(ev(3, 1), ev(4, 1), ev(5, 3)) // u1 moves 1→3, u3 enters 1
    q.processAllAvailable()
    q.stop()
    val after2 = Retract.bucketCountsFromTable(spark, url).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after2 == Map(1L -> 2L, 3L -> 1L)) // u1 no longer double-counted
  }

  test("retractable top-n demotes overtaken rows and re-promotes on retraction") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Retract.topUsersByCount(ms.toDS(), n = 2)
      .writeStream.format("memory").queryName("rtopn").outputMode("append").start()
    def top2(): List[(Long, Long)] = {
      // newest emission per rank = current occupant; tombstone = vacant
      val rows = spark.table("rtopn").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).zipWithIndex
      rows.groupBy(_._1._1).toList.sortBy(_._1)
        .map { case (_, vs) => val r = vs.maxBy(_._2)._1; (r._2, r._3) }
        .filter(_._1 != Retract.TombstoneId)
    }
    // batch 1: u1 ×3, u2 ×2, u3 ×1 → top2 = u1(3), u2(2)
    ms.addData((1L to 3L).map(i => ev(i, 1)) ++
      (4L to 5L).map(i => ev(i, 2)) :+ ev(6L, 3): _*)
    q.processAllAvailable()
    assert(top2() == List((1L, 3L), (2L, 2L)), s"after b1: ${top2()}")
    // batch 2: u3 ×3 → u3(4) overtakes; u2 DEMOTED out of the top-2 —
    // only visible because the rank consumed u3's bucket retractions
    ms.addData((7L to 9L).map(i => ev(i, 3)): _*)
    q.processAllAvailable()
    q.stop()
    assert(top2() == List((3L, 4L), (1L, 3L)), s"after b2: ${top2()}")
  }

  test("retractable top-n tombstones a vacated rank on net deletion") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Long)]
    val q = Retract.retractableTopN(ms.toDS(), n = 2)
      .writeStream.format("memory").queryName("rtomb").outputMode("append").start()
    def current(): Map[Int, (Long, Long)] = {
      val rows = spark.table("rtomb").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).zipWithIndex
      rows.groupBy(_._1._1)
        .map { case (rank, vs) => val r = vs.maxBy(_._2)._1; rank -> (r._2, r._3) }
    }
    // batch 1: two asserted rows fill both ranks
    ms.addData(("k", 10L, 5L, 1L), ("k", 20L, 3L, 1L))
    q.processAllAvailable()
    assert(current() == Map(1 -> (10L, 5L), 2 -> (20L, 3L)))
    // batch 2: id 20 retracted with NO replacing assert — rank 2 must
    // be tombstoned or the old occupant would read as still current
    ms.addData(("k", 20L, 3L, -1L))
    q.processAllAvailable()
    q.stop()
    assert(current() == Map(1 -> (10L, 5L), 2 -> (Retract.TombstoneId, 0L)),
      s"vacated rank not tombstoned: ${current()}")
  }

  test("delta×delta join: accumulated output deltas equal the true join at every batch") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    import Retract.{JoinDelta, SideDelta}
    val rnd = new scala.util.Random(7)
    val ms = MemoryStream[SideDelta]
    val q = Retract.deltaJoin(ms.toDS())
      .writeStream.format("memory").queryName("djoin").outputMode("append").start()
    // model: per key, both sides' live multisets, mutated batch by
    // batch with random asserts AND retracts of previously live rows
    val live = Array.fill(2)(
      scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L))
    def trueJoin(): Map[(Long, Long, Long), Long] =
      (for {
        ((k, l), cl) <- live(0).toSeq
        ((k2, r), cr) <- live(1).toSeq if k2 == k
      } yield (k, l, r) -> cl * cr).filter(_._2 != 0L).toMap
    def applied(): Map[(Long, Long, Long), Long] =
      spark.table("djoin").as[JoinDelta].collect()
        .groupBy(d => (d.key, d.left, d.right))
        .view.mapValues(_.map(_.delta).sum).filter(_._2 != 0L).toMap
    (1 to 5).foreach { _ =>
      val batch = (1 to 12).map { _ =>
        val side = rnd.nextBoolean()
        val idx = if (side) 0 else 1
        val retractable = live(idx).filter(_._2 > 0L).keys.toSeq
        if (retractable.nonEmpty && rnd.nextInt(3) == 0) {
          val (k, v) = retractable(rnd.nextInt(retractable.size))
          live(idx)((k, v)) -= 1
          SideDelta(k, side, v, -1L)
        } else {
          val (k, v) = (rnd.nextInt(3).toLong, rnd.nextInt(4).toLong)
          live(idx)((k, v)) += 1
          SideDelta(k, side, v, 1L)
        }
      }
      ms.addData(batch: _*)
      q.processAllAvailable()
      assert(applied() == trueJoin(),
        s"join changelog diverged:\n applied=${applied()}\n truth=${trueJoin()}")
    }
    q.stop()
  }

  test("delta×delta join self-corrects a retraction overtaking its accumulate") {
    val spark2 = spark; import spark2.implicits._
    implicit val ctx = spark.sqlContext
    import Retract.{JoinDelta, SideDelta}
    val ms = MemoryStream[SideDelta]
    val q = Retract.deltaJoin(ms.toDS())
      .writeStream.format("memory").queryName("djoin2").outputMode("append").start()
    def net(): Map[(Long, Long, Long), Long] =
      spark.table("djoin2").as[JoinDelta].collect()
        .groupBy(d => (d.key, d.left, d.right))
        .view.mapValues(_.map(_.delta).sum).filter(_._2 != 0L).toMap
    // batch 1: right side asserts r=5; left side RETRACTS l=1 that was
    // never asserted — state nets l=1 to count -1 (the reference's
    // transient record-counter state for out-of-order retractions)
    ms.addData(SideDelta(1L, false, 5L, 1L), SideDelta(1L, true, 1L, -1L))
    q.processAllAvailable()
    // batch 2: the overtaken accumulate lands — counts cancel to zero,
    // so the final net join output must be EMPTY, not a phantom pair
    ms.addData(SideDelta(1L, true, 1L, 1L))
    q.processAllAvailable()
    q.stop()
    assert(net() == Map.empty, s"phantom pair survived: ${net()}")
  }
}
