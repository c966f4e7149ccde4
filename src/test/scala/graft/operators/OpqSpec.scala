package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** OPQ invariants (Opq.scala) under the q278 oracle row: the learned
  * path (iters > 0) has no one-shot SQL form, so its guarantees pin
  * here — exact-Procrustes orthogonality, the monotone OPQ-NP
  * objective, and descent from the measured starting configuration. */
class OpqSpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf)
  private val d = 64

  private def matMulT(a: Array[Array[Double]],
                      b: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(a.length, b.length)((i, j) =>
      a(i).indices.foldLeft(0.0)((s, k) => s + a(i)(k) * b(j)(k)))

  private def maxOffIdentity(m: Array[Array[Double]]): Double =
    (for (i <- m.indices; j <- m.indices) yield
      math.abs(m(i)(j) - (if (i == j) 1.0 else 0.0))).max

  test("signedPerm is an orthogonal bijection; rotate preserves norms/dots") {
    val r = Opq.signedPerm(d)
    assert(maxOffIdentity(matMulT(r, r)) == 0.0, "R·Rᵀ = I exactly")
    // exactly one ±1 per row AND per column (bijection)
    assert(r.forall(_.count(x => math.abs(x) == 1.0) == 1))
    assert((0 until d).forall(j => r.map(_(j)).count(x => math.abs(x) == 1.0) == 1))
    val rot = Opq.rotate(emb.limit(20), "embedding", r, "rot")
      .select(col("embedding").cast("array<double>").as("e"), col("rot"))
      .collect()
    rot.foreach { row =>
      val e = row.getSeq[Double](0); val y = row.getSeq[Double](1)
      assert(math.abs(e.map(x => x * x).sum - y.map(x => x * x).sum) < 1e-12,
        "signed permutation preserves the norm exactly")
    }
  }

  test("distributed rotate matches the driver-local mirror bit-for-bit") {
    // a NON-trivial learned matrix: one Procrustes output
    val (r, _) = Opq.fitRotation(emb, "embedding", numSub = 8,
      codesPerSub = 16, iters = 1, init = Opq.signedPerm(d))
    val rows = Opq.rotate(emb.limit(5), "embedding", r, "rot")
      .select(col("embedding").cast("array<double>").as("e"), col("rot"))
      .collect()
    rows.foreach { row =>
      val x = row.getSeq[Double](0).toArray
      val y = row.getSeq[Double](1).toArray
      val expect = Array.tabulate(d)(j =>
        x.indices.foldLeft(0.0)((acc, i) => acc + r(j)(i) * x(i)))
      assert(y.toSeq == expect.toSeq,
        "Catalyst left-fold dot must equal the driver fold exactly")
    }
  }

  test("procrustes of an orthogonal B recovers its transpose") {
    val b = Opq.signedPerm(d)
    val r = Opq.procrustes(b)
    val err = (for (i <- 0 until d; j <- 0 until d)
      yield math.abs(r(i)(j) - b(j)(i))).max
    assert(err < 1e-9, s"argmax tr(R·B) for orthogonal B is Bᵀ (err=$err)")
  }

  test("OPQ-NP objective is monotone and descends from the init; R stays orthogonal") {
    val init = Opq.signedPerm(d)
    val (r, hist) = Opq.fitRotation(emb, "embedding", numSub = 8,
      codesPerSub = 16, iters = 4, init = init)
    assert(hist.length == 4)
    // E at the measured starting configuration (init R, init codebook)
    val seeds = emb.orderBy(col("vec_id")).limit(16)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    def rotL(x: Array[Double]) = Array.tabulate(d)(j =>
      x.indices.foldLeft(0.0)((acc, i) => acc + init(j)(i) * x(i)))
    val cb0 = Array.tabulate(8, 16)((m, k) =>
      rotL(seeds(k)).slice(m * 8, (m + 1) * 8))
    val e0 = Opq.quantError(emb, "embedding", init, cb0)
    assert(hist.head <= e0 * (1 + 1e-9),
      s"first iteration must not regress vs the start (E0=$e0, hist=$hist)")
    hist.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1 + 1e-9), s"objective regressed: $hist")
    }
    assert(hist.last < e0, "4 iterations should strictly improve on this data")
    assert(maxOffIdentity(matMulT(r, r)) < 1e-9, "learned R·Rᵀ ≈ I")
  }

  test("OpqIvfPqModel persistence round-trips the rotation exactly") {
    val fitted = new graft.ml.Pipeline()
      .appendStage(new graft.ml.OpqIvfPqEstimator("embedding", 1, 4, 0, 8, 16))
      .fit(emb)
    val json = fitted.toJson
    val reloaded = new graft.ml.Pipeline(json)
    val m0 = fitted.getStages.head.asInstanceOf[graft.ml.OpqIvfPqModel]
    val m1 = reloaded.getStages.head.asInstanceOf[graft.ml.OpqIvfPqModel]
    assert(m0.rotation.map(_.toSeq).toSeq == m1.rotation.map(_.toSeq).toSeq,
      "64×64 rotation must survive toJson (Double.toString round-trip)")
    assert(m0.model.centroids.map(_.toSeq).toSeq ==
      m1.model.centroids.map(_.toSeq).toSeq)
    val probes = emb.filter(col("vec_id") <= 3)
    val idx = reloaded.transform(emb)
    val out = m1.search(idx, probes, k = 3, nprobe = 4)
    assert(out.count() > 0)
  }

  test("guard valves fail loudly") {
    intercept[IllegalArgumentException](Opq.signedPerm(200)) // dims cap
    intercept[IllegalArgumentException](Opq.signedPerm(58))  // gcd(29,58)≠1
    intercept[IllegalArgumentException](
      Opq.fitRotation(emb, "embedding", 8, 16, iters = 65,
        init = Opq.signedPerm(d)))
    intercept[IllegalArgumentException](
      Opq.fitRotation(emb, "embedding", 7, 16, iters = 1,
        init = Opq.signedPerm(d))) // 64 % 7 != 0
  }
}
