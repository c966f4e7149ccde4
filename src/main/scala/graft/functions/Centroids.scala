package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused coarse-quantizer kernels (r12 optimization round).
  *
  * The IVF assign/probe paths were built as `array_max` / `array_sort`
  * over K struct literals of `cosine_similarity(vec, <64-double array
  * literal>)` — correct and codegen'd, but every plan carrying them
  * holds a ~K×dim literal tree that the optimizer constant-folds on
  * EVERY action (the IVF maintenance queries run 30-40 driver actions
  * each; JobProfile attributed ~half their wall time to driver gaps).
  * These expressions keep the centroid matrix as a referenced
  * double[][] instead, so the plan node is one leaf.
  *
  * Numeric contract — bit-identical to the composition each replaces:
  * per-centroid similarity accumulates dot/na/nb in index order and
  * divides dot / (√na·√nb) (CosineSimilarity's exact arithmetic); a
  * zero-norm/length-mismatch similarity is "null" and loses to every
  * real one (struct-ordering null-first semantics); ties break to the
  * LOWEST centroid index (the negIdx trick's order).
  */
private[functions] object CentroidKernel {
  /** (similarity or NegativeInfinity-for-null) per centroid. Real
    * cosines are ≥ −1 > −∞, so −∞ reproduces null-loses ordering. */
  def sims(a: ArrayData, isFloat: Boolean,
           cents: Array[Array[Double]]): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      if (c.length != n || n == 0) out(j) = Double.NegativeInfinity
      else {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          val y = c(i)
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        out(j) =
          if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
          else dot / (math.sqrt(na) * math.sqrt(nb))
      }
      j += 1
    }
    out
  }
}

/** nearest_centroid(vec) → the argmax-cosine centroid index (ties →
  * lowest index) — replaces `-array_max(array(struct(cos, -i)…)).negIdx`. */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid needs a float/double array, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Public so generated code can call back into this instance. */
  def compute(v: ArrayData): Int = {
    val s = CentroidKernel.sims(v, elemIsFloat, cents)
    var best = Double.NegativeInfinity; var bestJ = 0
    var j = 0
    while (j < s.length) {
      if (java.lang.Double.compare(s(j), best) > 0) { best = s(j); bestJ = j }
      j += 1
    }
    bestJ
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("nearestCentroid", this,
        classOf[NearestCentroid].getName)
      s"${ev.value} = $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}

/** ranked_centroids(vec) → ALL centroid indices ordered by
  * (similarity desc, index asc) — replaces
  * `transform(reverse(array_sort(array(struct(cos, -i)…))), -negIdx)`;
  * callers slice the first nprobe. */
case class RankedCentroids(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ranked_centroids needs a float/double array, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(v: ArrayData): ArrayData = {
    val s = CentroidKernel.sims(v, elemIsFloat, cents)
    val idx = Array.range(0, s.length)
    // insertion sort by (sim desc, idx asc) — K is a coarse-quantizer
    // constant (≤256, guarded upstream)
    var i = 1
    while (i < idx.length) {
      val cur = idx(i)
      var j = i - 1
      while (j >= 0 && (java.lang.Double.compare(s(idx(j)), s(cur)) < 0 ||
          (s(idx(j)) == s(cur) && idx(j) > cur))) {
        idx(j + 1) = idx(j); j -= 1
      }
      idx(j + 1) = cur
      i += 1
    }
    new GenericArrayData(idx)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("rankedCentroids", this,
        classOf[RankedCentroids].getName)
      s"${ev.value} = $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): RankedCentroids =
    copy(child = newChild)
  override def prettyName: String = "ranked_centroids"
}
