package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A mergeable DISTINCT-COUNT sketch with SET ALGEBRA — the
  * theta-sketch / KMV (k-minimum-values) family (Beyer et al. 2007;
  * Dasgupta et al., "Theta Sketch Framework", 2016). HLL (q307/q308)
  * answers |A| and |A ∪ B|; a theta sketch additionally answers
  * |A ∩ B| and |A \ B| from the sketches alone, because it retains a
  * uniform SAMPLE of the hashed keys rather than only register maxima:
  *
  *  - state: `theta` (an exclusive bound on the 63-bit hash domain)
  *    and the set S of all distinct key hashes below theta, |S| ≤ k;
  *    until the first trim theta = MAX and the sketch is EXACT;
  *  - estimate: |S| / (theta / 2^63) — each retained hash represents
  *    1/θ_norm keys (the inclusion probability of a uniform hash);
  *  - union: θ = min(θa, θb), S = (Sa ∪ Sb) < θ, trim to k;
  *  - intersect / a-not-b: θ = min(θa, θb); BOTH sketches are
  *    complete below their theta, so (Sa ∩ Sb) < θ and (Sa \ Sb) < θ
  *    are exact set operations on the samples — the estimate divides
  *    by the same θ_norm. (Relative error grows as the result shrinks
  *    relative to the inputs: ~1/√(k·|result|/|input|).)
  *
  * Everything is DETERMINISTIC: the hash is a fixed splitmix64
  * finalizer, so estimates are reproducible bit-for-bit and the
  * oracle rows can pin audit booleans. The hash domain is [0, 2^63)
  * (the sign bit cleared; the single value 2^63−1 is folded down so
  * `theta = Long.MaxValue` cleanly means "exact mode").
  *
  * At 100 TB: one corpus pass builds per-cell sketches (the shuffle
  * moves ≤ k longs per cell), every coarser grain is a merge, and any
  * overlap/difference question between slices — "how many customers
  * are in A but not B" — is answered from KB-scale sketches with no
  * second corpus pass and no join.
  *
  * Reference anchor: the reference ships no sketch library; its
  * distinct aggregates (flink-table-runtime-blink count-distinct
  * split) are exact. This is the approximate path the same queries
  * take at corpus scale.
  */
object Theta {

  /** Retained-sample bound. Union-domain relative standard error is
    * ~1/√k ≈ 3.1%; the oracle envelopes add headroom for the
    * shrinking-result intersect/difference cases. */
  val K = 1024

  /** Exclusive upper bound of the hash domain = "never trimmed". */
  val MaxTheta: Long = Long.MaxValue

  /** splitmix64 finalizer (Steele et al., public domain) onto
    * [0, 2^63): deterministic, well-mixed, engine-independent. */
  def hash(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    val h = z >>> 1 // clear the sign bit: [0, 2^63)
    if (h == MaxTheta) MaxTheta - 1 else h
  }

  /** `sorted` = the retained hashes (ascending, distinct, < theta);
    * `pending` = unsorted recent updates, folded in when it reaches K
    * (amortizes the sort to O(log k) per update). */
  case class ThetaBuf(theta: Long, sorted: Seq[Long], pending: Seq[Long])

  val empty: ThetaBuf = ThetaBuf(MaxTheta, Nil, Nil)

  /** Fold `pending` in and re-establish |S| ≤ k: if the distinct set
    * overflows, theta becomes the (k+1)-th smallest hash and exactly
    * the k smaller ones survive — order-independent, so any build or
    * merge order yields the same consolidated sketch for the same
    * key multiset. */
  def consolidate(b: ThetaBuf): ThetaBuf = {
    if (b.pending.isEmpty && b.sorted.size <= K) return b.copy(pending = Nil)
    val all = (b.sorted ++ b.pending.filter(_ < b.theta)).distinct.sorted
    if (all.size <= K) ThetaBuf(b.theta, all, Nil)
    else ThetaBuf(all(K), all.take(K), Nil)
  }

  def update(b: ThetaBuf, v: Long): ThetaBuf = {
    val h = hash(v)
    if (h >= b.theta) b
    else {
      val grown = b.copy(pending = h +: b.pending)
      if (grown.pending.size >= K) consolidate(grown) else grown
    }
  }

  def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = {
    val ca = consolidate(a)
    val cb = consolidate(b)
    val theta = math.min(ca.theta, cb.theta)
    consolidate(ThetaBuf(theta,
      Nil, (ca.sorted ++ cb.sorted).filter(_ < theta)))
  }

  // ---- compact binary form ----

  def serialize(b: ThetaBuf): Array[Byte] = {
    val c = consolidate(b)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(c.theta)
    out.writeInt(c.sorted.size)
    c.sorted.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): ThetaBuf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val theta = in.readLong()
    val sz = in.readInt()
    ThetaBuf(theta, IndexedSeq.fill(sz)(in.readLong()), Nil)
  }

  private def thetaNorm(theta: Long): Double =
    theta.toDouble / 9.223372036854775807e18 // 2^63 − 1 ≈ 2^63

  /** |S| / θ_norm; EXACT while theta = MAX (never trimmed). */
  def estimate(b: ThetaBuf): Double = {
    val c = consolidate(b)
    if (c.theta == MaxTheta) c.sorted.size.toDouble
    else c.sorted.size / thetaNorm(c.theta)
  }

  /** True while the sketch has never trimmed (estimate is exact). */
  def isExact(b: ThetaBuf): Boolean = consolidate(b).theta == MaxTheta

  def unionOf(a: ThetaBuf, b: ThetaBuf): ThetaBuf = merge(a, b)

  /** |A ∩ B| estimate: both samples are complete below min(θa, θb). */
  def intersectEst(a: ThetaBuf, b: ThetaBuf): Double = {
    val ca = consolidate(a); val cb = consolidate(b)
    val theta = math.min(ca.theta, cb.theta)
    val sb = cb.sorted.toSet
    val n = ca.sorted.count(h => h < theta && sb.contains(h))
    if (theta == MaxTheta) n.toDouble else n / thetaNorm(theta)
  }

  /** |A \ B| estimate, same common-theta discipline. */
  def aNotBEst(a: ThetaBuf, b: ThetaBuf): Double = {
    val ca = consolidate(a); val cb = consolidate(b)
    val theta = math.min(ca.theta, cb.theta)
    val sb = cb.sorted.toSet
    val n = ca.sorted.count(h => h < theta && !sb.contains(h))
    if (theta == MaxTheta) n.toDouble else n / thetaNorm(theta)
  }

  /** Build a sketch from raw long keys (the per-cell leaf aggregate). */
  class Agg extends Aggregator[Long, ThetaBuf, Array[Byte]] {
    override def zero: ThetaBuf = Theta.empty
    override def reduce(b: ThetaBuf, v: Long): ThetaBuf = Theta.update(b, v)
    override def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = Theta.merge(a, b)
    override def finish(b: ThetaBuf): Array[Byte] = Theta.serialize(b)
    override def bufferEncoder: Encoder[ThetaBuf] = Encoders.product[ThetaBuf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union already-built sketches (the grain-rollup aggregate). */
  class MergeAgg extends Aggregator[Array[Byte], ThetaBuf, Array[Byte]] {
    override def zero: ThetaBuf = Theta.empty
    override def reduce(b: ThetaBuf, sk: Array[Byte]): ThetaBuf =
      Theta.merge(b, Theta.deserialize(sk))
    override def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = Theta.merge(a, b)
    override def finish(b: ThetaBuf): Array[Byte] = Theta.serialize(b)
    override def bufferEncoder: Encoder[ThetaBuf] = Encoders.product[ThetaBuf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
