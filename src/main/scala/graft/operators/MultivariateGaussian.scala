package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-covariance multivariate Gaussian density, the complete surface
  * of the reference's distribution primitive (flink-ml-lib/.../
  * basicstatistic/MultivariateGaussian.java:37): fit mean + covariance
  * over an embedding column, then score points with
  * `pdf(x) = (2π)^(-k/2) det(Σ)^(-1/2) exp(-½ δ'Σ⁻¹δ)`.
  *
  * Same numeric contract as the reference's
  * `calculateCovarianceConstants` (lines 113–141): eigendecompose Σ,
  * drop eigenvalues below `tol = ε·k·maxEv` (so a SINGULAR covariance —
  * e.g. a duplicated dimension — yields the pseudo-determinant /
  * pseudo-inverse density, not NaN), precompute
  * `rootSigmaInv = U·D^(-1/2)` and
  * `u = -½(k·ln 2π + log pseudo-det Σ)`, and score each point as
  * `u − ½‖rootSigmaInv'·δ‖²`. The eigensolver here is a cyclic Jacobi
  * sweep (LAPACK dsyev isn't in a Spark cluster's classpath by
  * contract) — exact to ~1e-12 on the bounded k×k driver-side matrix.
  *
  * Scale split, mirroring the q261/q262 discipline: fitting is ONE
  * distributed pass for the mean (k sums) and ONE for the centered
  * pair products (k(k+1)/2 keys, dimension-bounded per-row expansion,
  * map-side combined); the k×k eigenproblem is driver-side (k=64 →
  * 4096 doubles, the IvfAnn-centroid bounded-collect precedent);
  * scoring is a scan-speed projection — `rootSigmaInv` rides the
  * closure as literals, the corpus never shuffles.
  *
  * Oracle-bound where expressible: the diagonal-covariance reduction
  * faces DuckDB as q261/q263; the full-covariance path (eigen has no
  * relational form) is property-bound in `MultivariateGaussianSpec`
  * against a brute-force JVM evaluation, including the singular and
  * the correlated-outlier cases (the point the DIAGONAL scorer cannot
  * see: inside every marginal, off the correlation ridge).
  */
object MultivariateGaussian {

  /** Machine epsilon by the reference's halving loop (line 42). */
  val Epsilon: Double = {
    var eps = 1.0
    while (1.0 + eps / 2.0 != 1.0) eps /= 2.0
    eps
  }

  /** Fitted model: mean, covariance, and the precomputed constants. */
  case class Model(mu: Array[Double], cov: Array[Array[Double]],
                   rootSigmaInv: Array[Array[Double]], u: Double) {
    def k: Int = mu.length

    /** Driver-side logpdf (the spec's brute-force anchor and the
      * reference's exact call shape). */
    def logpdf(x: Array[Double]): Double = {
      val d = Array.tabulate(k)(i => x(i) - mu(i))
      var q = 0.0
      var j = 0
      while (j < k) { // v_j = column j of rootSigmaInv dotted with δ
        var s = 0.0; var i = 0
        while (i < k) { s += rootSigmaInv(i)(j) * d(i); i += 1 }
        q += s * s; j += 1
      }
      u - 0.5 * q
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * returns (eigenvalues, eigenvectors as COLUMNS of v). */
  private[operators] def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val k = aIn.length
    val a = Array.tabulate(k, k)((i, j) => aIn(i)(j))
    val v = Array.tabulate(k, k)((i, j) => if (i == j) 1.0 else 0.0)
    // convergence is RELATIVE to the matrix scale: the Frobenius
    // norm² is rotation-invariant, so off² / frob² is a pure measure
    // of remaining off-diagonal mass — an absolute floor would
    // declare a tiny-magnitude covariance (entries ~1e-16) "already
    // diagonal" and silently skip its correlation structure.
    var frob = 0.0
    for (p <- 0 until k; q <- 0 until k) frob += a(p)(q) * a(p)(q)
    val tol = frob * 1e-28
    var sweep = 0
    while (sweep < 64) {
      var off = 0.0
      for (p <- 0 until k; q <- p + 1 until k) off += a(p)(q) * a(p)(q)
      if (off <= tol) sweep = 64
      else {
        for (p <- 0 until k; q <- p + 1 until k) if (a(p)(q) != 0.0) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x   => x
            }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until k) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (j <- 0 until k) {
            val apj = a(p)(j); val aqj = a(q)(j)
            a(p)(j) = c * apj - s * aqj
            a(q)(j) = s * apj + c * aqj
          }
          for (i <- 0 until k) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
        sweep += 1
      }
    }
    (Array.tabulate(k)(i => a(i)(i)), v)
  }

  /** The reference's `calculateCovarianceConstants` on a fitted
    * (mean, covariance) pair. */
  def fromMoments(mu: Array[Double], cov: Array[Array[Double]]): Model = {
    val k = mu.length
    val (evs, uMat) = jacobiEigen(cov)
    val maxEv = evs.max
    val tol = Epsilon * k * maxEv
    var logPseudoDet = 0.0
    evs.foreach(ev => if (ev > tol) logPseudoDet += math.log(ev))
    val rsi = Array.tabulate(k, k) { (i, j) =>
      if (evs(j) > tol) uMat(i)(j) * math.sqrt(1.0 / evs(j)) else 0.0
    }
    Model(mu, cov, rsi, -0.5 * (k * math.log(2.0 * math.Pi) + logPseudoDet))
  }

  /** Distributed fit over `embCol` (array column): one pass for the
    * mean, one dimension-bounded pair-product pass for the (biased,
    * 1/n) covariance — the reference's estimator convention for a
    * distribution fit. */
  def fit(df: DataFrame, embCol: String): Model = {
    val xs = transform(col(embCol), x => x.cast("double"))
    val dims = df.select(size(col(embCol))).head().getInt(0)
    // loud valve: the pair pass fans out k(k+1)/2 terms per row and
    // the covariance collect lands a dims²-entry map on the driver —
    // bounded by construction for embedding-sized k, but a caller
    // with a 10⁵-dim column should fail with a message, not an OOM
    require(dims >= 1 && dims <= 512,
      s"MultivariateGaussian.fit: $dims dims exceeds the dense-" +
        "covariance cap of 512 (k(k+1)/2 pair terms per row, k² " +
        "driver entries); reduce dimensionality or use the diagonal-" +
        "covariance Gaussian (VectorQueries.gaussianMoments)")
    val n = df.count()
    // mean: explode once, k keys, map-side combined
    val mu = df.select(posexplode(xs).as(Seq("d", "x")))
      .groupBy(col("d")).agg(sum(col("x")).as("s"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1).map(_._2 / n)
    val muLit = array(mu.toIndexedSeq.map(lit(_)): _*)
    val cxs = transform(xs, (x, i) => x - element_at(muLit, (i + 1).cast("int")))
    // centered pair products incl. diagonal: fixed k(k+1)/2 per row
    val pairSums = df
      .select(explode(flatten(transform(cxs, (x, i) =>
        transform(slice(cxs, i + lit(1), lit(dims)), (y, j) =>
          struct(i.cast("int").as("di"), (i + j).cast("int").as("dj"),
            (x * y).as("p")))))).as("pr"))
      .select(col("pr.di"), col("pr.dj"), col("pr.p"))
      .groupBy(col("di"), col("dj")).agg(sum(col("p")).as("s"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val key = (math.min(i, j), math.max(i, j))
      pairSums(key) / n
    }
    fromMoments(mu, cov)
  }

  /** logpdf as a scan-speed Column projection: δ from the literal
    * mean, v = rootSigmaInv'·δ via one literal-array dot per output
    * coordinate, all inside whole-stage codegen. */
  def logpdfCol(m: Model, embCol: String): Column = {
    val muLit = array(m.mu.toIndexedSeq.map(lit(_)): _*)
    val d = transform(col(embCol),
      (x, i) => x.cast("double") - element_at(muLit, (i + 1).cast("int")))
    val q = (0 until m.k).map { j =>
      val colJ = array((0 until m.k).map(i => lit(m.rootSigmaInv(i)(j))): _*)
      val vj = aggregate(zip_with(d, colJ, (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
      vj * vj
    }.reduce(_ + _)
    lit(m.u) - lit(0.5) * q
  }
}
