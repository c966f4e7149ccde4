package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the dimensionality-reduction pass
  * production vector pipelines run in front of ANN indexing (reduce
  * 64-dim embeddings to the top-k variance directions, then quantize /
  * index the small vectors). Flink-side precedent: the reference's ML
  * pipeline stages (flink-ml Estimator/Transformer surface); the
  * numerics reuse this repo's distributed-moments + Jacobi machinery
  * (MultivariateGaussian) and OPQ's codegen'd projection chains.
  *
  * Scale design: fit = ONE distributed mean pass + ONE d(d+1)/2
  * pair-product pass (both map-side combined; only d² doubles reach
  * the driver), then a driver-side d×d Jacobi eigendecomposition —
  * identical cost shape to the OPQ rotation fit. Transform = a pure
  * literal-coefficient projection (k scalar chains, whole-stage
  * codegen, zero shuffle) so scoring runs at scan speed on any corpus
  * size, batch or streaming.
  *
  * Determinism: the fit runs on the fixed-point grid codes
  * (VectorQueries.gridCode — exact integers), so the moment sums are
  * order-independent and the eigensolver input is bit-identical on
  * every run; components are sign-normalized (largest-|entry| ≥ 0).
  */
object Pca {

  /** Fitted PCA basis: `mu` = per-dim mean of the grid-coded corpus,
    * `comps(j)` = j-th principal axis (unit vector, descending
    * eigenvalue), `eigs` = ALL d eigenvalues descending. */
  case class Model(mu: Array[Double], comps: Array[Array[Double]],
                   eigs: Array[Double]) {
    def dims: Int = mu.length
    def k: Int = comps.length
  }

  /** Fit the top-`k` principal axes of `embCol` (array<float/double>)
    * on the grid-coded domain. */
  def fit(df: DataFrame, embCol: String, k: Int): Model = {
    val codes = df.select(org.apache.spark.sql.functions
      .transform(col(embCol), VectorQueries.gridCode _).as("__xs"))
    val g = MultivariateGaussian.fit(codes, "__xs")
    val (evs, v) = MultivariateGaussian.jacobiEigen(g.cov)
    require(k >= 1 && k <= g.k, s"Pca.fit: k=$k outside 1..${g.k}")
    val order = evs.indices.sortBy(i => (-evs(i), i))
    val comps = order.take(k).map { j =>
      val axis = Array.tabulate(g.k)(i => v(i)(j))
      // deterministic orientation: flip so the largest-|.| entry is ≥ 0
      val pivot = axis.indices.maxBy(i => (math.abs(axis(i)), -i))
      if (axis(pivot) < 0) axis.map(x => -x) else axis
    }.toArray
    Model(g.mu, comps, order.map(evs).toArray)
  }

  /** y = comps·(gridCode(x) − mu). For production-sized k the chains
    * are literal-coefficient scalar sums (the Opq.rotate discipline:
    * explicit left-assoc chains compile to straight-line codegen; a
    * HOF fold runs interpreted). Past ~2 K total terms one generated
    * method would blow janino's 64 KB limit and knock the WHOLE stage
    * out of codegen — there the per-component dot becomes the
    * zip_with/aggregate fold (MultivariateGaussian.logpdfCol's shape,
    * same ascending-i order so values are bit-identical; only the
    * full-rank verification path is that wide). The per-component
    * −comps·mu offset folds into one literal either way. */
  def projectCol(m: Model, embCol: String, tmpCol: String): (Column, Column) = {
    val xd = org.apache.spark.sql.functions
      .transform(col(embCol), x => VectorQueries.gridCode(x).cast("double"))
    val wide = m.k * m.dims > 2048
    val rows = m.comps.toIndexedSeq.map { row =>
      val off = row.indices.map(i => row(i) * m.mu(i)).sum
      val chain =
        if (wide) {
          val cLit = array(row.toIndexedSeq.map(lit(_)): _*)
          aggregate(zip_with(col(tmpCol), cLit, (x, c) => x * c),
            lit(0.0), (acc, t) => acc + t)
        } else {
          val terms = row.indices.collect {
            case i if row(i) != 0.0 =>
              lit(row(i)) * element_at(col(tmpCol), i + 1)
          }
          if (terms.isEmpty) lit(0.0) else terms.reduceLeft(_ + _)
        }
      chain - lit(off)
    }
    (xd, array(rows: _*))
  }

  /** Append `outCol` = the k-dim projection of `embCol`. */
  def transform(df: DataFrame, m: Model, embCol: String,
                outCol: String): DataFrame = {
    val tmp = s"__${outCol}_xd"
    val (xd, proj) = projectCol(m, embCol, tmp)
    df.withColumn(tmp, xd).withColumn(outCol, proj).drop(tmp)
  }
}
