package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** PCA invariants (Pca.scala) under the q301 oracle row: the learned
  * path (eigendecomposition) has no one-shot SQL form, so its
  * guarantees pin here — orthonormal basis, descending eigenvalues,
  * trace preservation against independently-computed per-dim
  * variances, brute-force projection agreement, and the pipeline
  * persistence round trip. */
class PcaSpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf)
  private val d = 64
  lazy val m = Pca.fit(emb, "embedding", d)

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))

  test("eigenvalues are non-negative and descending; trace matches the data") {
    assert(m.eigs.forall(_ > -1e-6))
    assert(m.eigs.zip(m.eigs.tail).forall { case (a, b) => a >= b - 1e-9 })
    // trace(cov) = Σ per-dim biased variance of the grid codes —
    // computed here by an independent one-pass aggregate
    val xs = org.apache.spark.sql.functions
      .transform(col("embedding"), VectorQueries.gridCode _)
    val rows = emb.select(posexplode(xs).as(Seq("dd", "x")))
      .groupBy(col("dd"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("qx"))
      .collect()
    val trace = rows.map { r =>
      val n = r.getLong(1).toDouble
      val sx = r.getLong(2).toDouble; val qx = r.getLong(3).toDouble
      qx / n - (sx / n) * (sx / n)
    }.sum
    val eigSum = m.eigs.sum
    assert(math.abs(eigSum - trace) <= 1e-6 * (1.0 + math.abs(trace)),
      s"Σeig=$eigSum vs trace=$trace")
  }

  test("components are orthonormal") {
    for (i <- m.comps.indices; j <- i until m.comps.length) {
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(m.comps(i), m.comps(j)) - expect) < 1e-9,
        s"c($i) dot c($j)")
    }
  }

  test("distributed projection matches the driver-local mirror") {
    val rows = Pca.transform(emb.limit(5), m, "embedding", "pca")
      .select(col("embedding").cast("array<double>").as("e"), col("pca"))
      .collect()
    rows.foreach { row =>
      val x = row.getSeq[Double](0).toArray.map(v =>
        math.min(math.max(math.round(v * 1000).toDouble, -8000.0), 8000.0) + 8000.0)
      val y = row.getSeq[Double](1).toArray
      m.comps.indices.foreach { j =>
        // same left-assoc order as the Column chain
        var acc = 0.0
        var i = 0
        while (i < d) {
          if (m.comps(j)(i) != 0.0) acc += m.comps(j)(i) * x(i); i += 1 }
        val expect = acc - dot(m.comps(j), m.mu)
        assert(math.abs(y(j) - expect) < 1e-9, s"component $j")
      }
    }
  }

  test("top-k projected variance weakly dominates any other k dims") {
    // Σ top-4 eigenvalues ≥ variance captured by the FIRST 4 raw dims
    // (PCA maximizes captured variance over all orthonormal k-frames)
    val k4 = m.eigs.take(4).sum
    val xs = org.apache.spark.sql.functions
      .transform(col("embedding"), VectorQueries.gridCode _)
    val raw = emb.select(posexplode(xs).as(Seq("dd", "x")))
      .filter(col("dd") < 4)
      .groupBy(col("dd"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("qx"))
      .collect()
      .map { r =>
        val n = r.getLong(1).toDouble
        val sx = r.getLong(2).toDouble; val qx = r.getLong(3).toDouble
        qx / n - (sx / n) * (sx / n)
      }.sum
    assert(k4 >= raw - 1e-6, s"top4=$k4 < first-4-dims=$raw")
  }

  test("pipeline JSON round trip projects identically") {
    val fitted = new graft.ml.Pipeline()
      .appendStage(new graft.ml.PcaEstimator("embedding", 4))
      .fit(emb)
    val reloaded = new graft.ml.Pipeline(fitted.toJson)
    val a = fitted.transform(emb.limit(10))
      .select(col("vec_id"), col("pca")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = reloaded.transform(emb.limit(10))
      .select(col("vec_id"), col("pca")).collect()
    b.foreach { r =>
      assert(r.getSeq[Double](1) == a(r.getLong(0)), "bit-identical reload")
    }
  }
}
