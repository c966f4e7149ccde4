package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: the binned range join equals an independently
  * computed (pure-Scala) containment relation on randomized points,
  * intervals, and bin widths — including negative coordinates,
  * empty/degenerate intervals, and bin-boundary alignment. */
class RangeJoinPropSpec extends SparkSpec {

  test("binned range join matches the direct containment relation") {
    val spark2 = spark; import spark2.implicits._
    val genCase = for {
      pts <- Gen.listOfN(40, Gen.chooseNum(-500L, 500L))
      ivs <- Gen.listOfN(12,
        Gen.zip(Gen.chooseNum(-500L, 500L), Gen.chooseNum(0L, 200L)))
      w <- Gen.oneOf(1L, 7L, 64L, 128L, 1000L)
    } yield (pts, ivs, w)

    val prop = Prop.forAll(genCase) { case (ps, is, w) =>
      val pts = ps.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val ivs = is.zipWithIndex.map { case ((lo, len), i) =>
        (i.toLong, lo, lo + len) }
      val expected = (for {
        (pid, t) <- pts
        (iid, lo, hi) <- ivs
        if t >= lo && t <= hi
      } yield (pid, iid)).toSet
      val got = RangeJoin.pointInInterval(
          pts.toDF("p_id", "t"), col("t"),
          ivs.toDF("i_id", "lo", "hi"), col("lo"), col("hi"), binWidth = w)
        .select("p_id", "i_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
