package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Full-covariance Gaussian vs brute force — the reference semantics
  * of flink-ml's MultivariateGaussian (eigen pseudo-inverse, tol
  * = ε·k·maxEv, u − ½‖rootSigmaInv'δ‖²). */
class MultivariateGaussianSpec extends SparkSpec {

  private def dataset: Seq[(Long, Int, Array[Float])] =
    (0L until 300L).map { i =>
      val a = ((i * 37 + 11) % 97).toFloat / 97f - 0.5f
      val b = ((i * 53 + 29) % 89).toFloat / 89f - 0.5f
      // dims: independent a, b; a correlated copy with small noise;
      // and a constant-ish dim
      val noise = ((i * 17 + 3) % 13).toFloat / 130f
      (i, 0, Array(a, b, 0.8f * a + noise, 0.25f))
    }

  private def df = {
    import spark.implicits._
    dataset.toDF("vec_id", "label", "embedding")
  }

  test("a dimensionality past the dense-covariance cap fails loudly") {
    import spark.implicits._
    val wide = Seq((0L, 0, Array.fill(513)(0.1f)),
                   (1L, 0, Array.fill(513)(0.2f)))
      .toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException] {
      MultivariateGaussian.fit(wide, "embedding")
    }
    assert(e.getMessage.contains("512"))
  }

  test("jacobiEigen reconstructs the matrix with orthonormal vectors") {
    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, -0.2),
      Array(0.5, -0.2, 2.0))
    val (evs, v) = MultivariateGaussian.jacobiEigen(a)
    val k = 3
    // A == V D V'
    for (i <- 0 until k; j <- 0 until k) {
      val r = (0 until k).map(t => v(i)(t) * evs(t) * v(j)(t)).sum
      assert(math.abs(r - a(i)(j)) < 1e-9, s"recon($i)($j)")
    }
    // V orthonormal
    for (p <- 0 until k; q <- 0 until k) {
      val d = (0 until k).map(t => v(t)(p) * v(t)(q)).sum
      assert(math.abs(d - (if (p == q) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("tiny-magnitude covariance still eigendecomposes (relative tol)") {
    // entries ~1e-16: an absolute convergence floor would declare
    // this "already diagonal" and ignore the strong correlation
    val c = 1e-16
    val a = Array(
      Array(2 * c, 1.9 * c),
      Array(1.9 * c, 2 * c))
    val (evs, v) = MultivariateGaussian.jacobiEigen(a)
    for (i <- 0 until 2; j <- 0 until 2) {
      val r = (0 until 2).map(t => v(i)(t) * evs(t) * v(j)(t)).sum
      assert(math.abs(r - a(i)(j)) < 1e-9 * c, s"recon($i)($j)")
    }
    // the rotation actually happened: eigenvalues split to c±1.9c
    assert(math.abs(evs.max - 3.9 * c) < 1e-3 * c)
    assert(math.abs(evs.min - 0.1 * c) < 1e-3 * c)
  }

  test("fit matches the brute-force mean/covariance and logpdf") {
    val m = MultivariateGaussian.fit(df, "embedding")
    val xs = dataset.map(_._3.map(_.toDouble))
    val n = xs.size
    val k = 4
    val mu = (0 until k).map(d => xs.map(_(d)).sum / n)
    (0 until k).foreach(d => assert(math.abs(m.mu(d) - mu(d)) < 1e-9))
    for (i <- 0 until k; j <- 0 until k) {
      val c = xs.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / n
      assert(math.abs(m.cov(i)(j) - c) < 1e-9, s"cov($i)($j)")
    }
    // the Column projection agrees with the driver-side logpdf
    val scored = df.withColumn("lp",
        MultivariateGaussian.logpdfCol(m, "embedding"))
      .select(col("vec_id"), col("lp")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    dataset.take(50).foreach { case (id, _, e) =>
      val brute = m.logpdf(e.map(_.toDouble))
      assert(math.abs(scored(id) - brute) < 1e-9, s"vec $id")
    }
  }

  test("a singular covariance (duplicated dim) yields finite densities") {
    import spark.implicits._
    val rows = dataset.map { case (id, lb, e) =>
      (id, lb, Array(e(0), e(1), e(0), e(3))) // dim2 := dim0 exactly
    }
    val m = MultivariateGaussian.fit(rows.toDF("vec_id", "label", "embedding"),
      "embedding")
    // pseudo-determinant path: no NaN/Inf anywhere
    val lps = rows.take(20).map(r => m.logpdf(r._3.map(_.toDouble)))
    assert(lps.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("full covariance catches the off-ridge outlier the diagonal misses") {
    val m = MultivariateGaussian.fit(df, "embedding")
    // on-ridge: dim2 tracks 0.8*dim0; off-ridge: same marginals, but
    // dim2 at the OPPOSITE end of the ridge
    val onRidge  = Array(0.4, 0.0, 0.8 * 0.4 + 0.05, 0.25)
    val offRidge = Array(0.4, 0.0, -0.35, 0.25)
    assert(m.logpdf(offRidge) < m.logpdf(onRidge) - 2.0,
      s"off=${m.logpdf(offRidge)} on=${m.logpdf(onRidge)}")
    // the diagonal scorer sees nearly the same marginal deviations:
    // |off - mu2| vs |on - mu2| differ, but both lie INSIDE the
    // marginal range of dim2 ([-0.4-eps, 0.5]); the full-cov gap above
    // is dominated by the broken correlation, which diag cannot express
  }
}
