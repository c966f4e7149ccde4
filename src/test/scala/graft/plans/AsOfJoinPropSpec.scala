package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: the custom co-partitioned merge exec equals a
  * brute-force latest-version lookup (max by (ts, tie) among same-key
  * rights at-or-before the left timestamp; null when none) on
  * randomized keys/timestamps — including duplicate timestamps on
  * both sides and keys with no right rows at all. */
class AsOfJoinPropSpec extends SparkSpec {

  test("AsOfJoinExec equals brute-force latest-version lookup") {
    val spark2 = spark; import spark2.implicits._
    val genSide = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 40L)))
    val genCase = Gen.zip(genSide, genSide)

    val prop = Prop.forAll(genCase) { case (ls, rs) =>
      val lefts = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rights = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val l = lefts.toDF("l_id", "l_key", "l_us")
        .withColumn("l_ts", timestamp_micros(col("l_us")))
      val r = rights.toDF("r_id", "r_key", "r_us")
        .withColumn("r_ts", timestamp_micros(col("r_us")))
      val got = AsOfJoin(l, r, l("l_key"), r("r_key"), l("l_ts"), r("r_ts"),
          rightTie = Some(r("r_id")))
        .select(col("l_id"), col("r_id")).collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      val expected = lefts.map { case (lid, lk, lt) =>
        val cands = rights.filter { case (_, rk, rt) => rk == lk && rt <= lt }
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy { case (rid, _, rt) => (rt, rid) }._1))
      }.toMap
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
