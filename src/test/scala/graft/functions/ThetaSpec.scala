package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property battery for the theta/KMV distinct sketch backing q329. */
class ThetaSpec extends AnyFunSuite {

  private def build(vs: Iterable[Long]): Theta.ThetaBuf =
    Theta.consolidate(vs.foldLeft(Theta.empty)(Theta.update))

  test("exact mode: below k distinct keys the estimate is exact, dups free") {
    val b = build((1L to 500L) ++ (1L to 500L))
    assert(Theta.isExact(b))
    assert(Theta.estimate(b) == 500.0)
  }

  test("order independence: any build order yields the same bytes") {
    val vs = (1L to 50000L).toVector
    val a = Theta.serialize(build(vs))
    val c = Theta.serialize(build(scala.util.Random.shuffle(vs)))
    assert(java.util.Arrays.equals(a, c),
      "consolidated sketch must not depend on insertion order")
  }

  test("serialization round-trips") {
    val b = build(1L to 30000L)
    val rt = Theta.deserialize(Theta.serialize(b))
    assert(rt.theta == b.theta && rt.sorted == b.sorted)
  }

  test("merge of partitions ≈ scratch build; estimates inside 1/sqrt(k) envelopes") {
    val n = 200000L
    val whole = build(1L to n)
    val parts = (0 until 8).map(p => build((1L + p) to n by 8))
    val merged = Theta.consolidate(parts.reduce(Theta.merge))
    // merged keeps ≤ k of the same smallest hashes; theta may sit one
    // trim earlier, but the ESTIMATE must agree with scratch closely
    assert(math.abs(Theta.estimate(merged) - Theta.estimate(whole))
      <= 0.02 * n, "merge vs scratch drift")
    assert(math.abs(Theta.estimate(whole) - n) <= 0.05 * n)
  }

  test("set algebra: union/intersect/difference near exact truth") {
    val a = build(1L to 150000L)
    val b = build(100001L to 250000L)
    val u = Theta.estimate(Theta.unionOf(a, b))
    val i = Theta.intersectEst(a, b)
    val d = Theta.aNotBEst(a, b)
    assert(math.abs(u - 250000) <= 0.05 * 250000, s"union est $u")
    assert(math.abs(i - 50000) <= 0.08 * 50000 + 48, s"intersect est $i")
    assert(math.abs(d - 100000) <= 0.12 * 100000 + 48, s"a-not-b est $d")
    // the theta-framework identity: at the common theta the A-sample
    // partitions into (∩B) and (∖B), so the estimates sum exactly to
    // A's estimate at that theta
    val ca = Theta.consolidate(a)
    val cb = Theta.consolidate(b)
    val theta = math.min(ca.theta, cb.theta)
    val nA = ca.sorted.count(_ < theta)
    val est = i + d
    val expect = nA / (theta.toDouble / 9.223372036854775807e18)
    assert(math.abs(est - expect) < 1e-6 * expect)
  }

  test("hash domain stays inside [0, 2^63)") {
    (-100000L to 100000L by 997L).foreach { v =>
      val h = Theta.hash(v)
      assert(h >= 0L && h < Long.MaxValue)
    }
  }
}
