package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic-KLL invariants beyond the q322/q323 oracle rows:
  * exact side stats, weight conservation, serialization fidelity,
  * merge-vs-stream equivalence of the rank guarantee, and a much
  * TIGHTER realized-error check than the 5%+8 oracle envelope. */
class KllSpec extends AnyFunSuite {

  private def build(vals: Iterable[Double]): Kll.KllBuf =
    vals.foldLeft(Kll.empty)(Kll.update)

  private def totalWeight(b: Kll.KllBuf): Long =
    b.levels.zipWithIndex.map { case (l, i) => l.size.toLong << i }.sum

  // deterministic pseudo-random doubles (no Random: reproducibility)
  private def synth(n: Int): Seq[Double] =
    (0 until n).map(i => ((i.toLong * 2654435761L) % 100003L).toDouble)

  test("n, min, max are exact; total weight is conserved") {
    val vals = synth(50000)
    val b = build(vals)
    assert(b.n == vals.size)
    assert(b.minV == vals.min && b.maxV == vals.max)
    assert(totalWeight(b) == vals.size,
      "compaction must preserve total rank mass exactly")
    assert(b.levels.map(_.size).sum < 16 * Kll.K,
      "the ladder stays KB-scale")
  }

  test("serialize → deserialize is lossless") {
    val b = build(synth(20000))
    val back = Kll.deserialize(Kll.serialize(b))
    assert(back.n == b.n && back.minV == b.minV && back.maxV == b.maxV)
    assert(back.levels.map(_.sorted) == b.levels.map(_.sorted))
    assert(back.flags == b.flags)
  }

  test("realized rank error is far inside the oracle envelope") {
    val vals = synth(200000)
    val sorted = vals.sorted
    val b = build(vals)
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val est = Kll.quantile(b, q)
      val rank = sorted.count(_ <= est)
      val err = math.abs(rank - q * vals.size)
      // worst-case claim is O(H·n/k) ≈ 1.5%; realized should be ≲0.5%
      assert(err <= 0.01 * vals.size,
        s"q=$q: rank err $err on n=${vals.size}")
    }
  }

  test("a merge tree answers like the one-shot stream") {
    val vals = synth(80000)
    val parts = vals.grouped(7001).map(build).toSeq
    val merged = parts.reduce(Kll.merge)
    val direct = build(vals)
    assert(merged.n == direct.n)
    assert(merged.minV == direct.minV && merged.maxV == direct.maxV)
    assert(totalWeight(merged) == vals.size)
    val sorted = vals.sorted
    for (q <- Seq(0.25, 0.5, 0.75)) {
      val rank = sorted.count(_ <= Kll.quantile(merged, q))
      assert(math.abs(rank - q * vals.size) <= 0.02 * vals.size,
        s"merged sketch q=$q out of envelope")
    }
  }

  test("quantile edges: q→0 and q→1 stay inside [min, max]") {
    val b = build(synth(30000))
    assert(Kll.quantile(b, 0.0001) >= b.minV)
    assert(Kll.quantile(b, 1.0) == b.maxV ||
      Kll.quantile(b, 1.0) <= b.maxV)
    val one = build(Seq(42.0))
    assert(Kll.quantile(one, 0.5) == 42.0)
  }
}
