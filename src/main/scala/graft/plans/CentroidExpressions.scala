package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid kernels for the ITERATIVE fit path.
  *
  * The oracle-checked step queries build centroids as plan literals
  * ([[graft.functions.VectorOps.nearest]]) — ideal for a one-shot query.
  * In the Lloyd loop, literal centroids change every iteration, so every
  * iteration generates different codegen source and pays a fresh Janino
  * compile (~0.5–1 s/job — measured: the sf0.1 lineitem fit spent 20×
  * that). These kernels carry the centroids as a plain object reference:
  * the plan shape (and generated surrounding code) is identical across
  * iterations, the eval is a tight interpreted loop, and per-iteration
  * cost drops to the actual data work.
  *
  * Semantics are identical to the literal form bit-for-bit: sequential
  * (x−y)² fold per centroid (`utils/utils.go:46-54`), strict `<` argmin
  * keeps the lowest centroid id on ties (`worker.go:297-301`).
  */
abstract class CentroidKernel extends UnaryExpression with CodegenFallback {

  def centroids: Array[Array[Double]]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${t.simpleString}")
  }

  /** (argmin index, min squared distance). */
  protected final def nearest(arr: ArrayData): (Int, Double) = {
    var best = Double.PositiveInfinity
    var bi = -1
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(arr.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = arr.getDouble(i) - cent(i)
        s += d * d
        i += 1
      }
      if (s < best) { best = s; bi = c }
      c += 1
    }
    (bi, best)
  }
}

/** Argmin centroid index (the E-step assignment kernel). */
case class NearestCentroidId(child: Expression, centroids: Array[Array[Double]])
    extends CentroidKernel {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    java.lang.Integer.valueOf(nearest(v.asInstanceOf[ArrayData])._1)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nearest_centroid_id"
}

/** Min squared distance to the centroid set (the seeding kernel). */
case class MinSqDistToCentroids(child: Expression, centroids: Array[Array[Double]])
    extends CentroidKernel {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.valueOf(nearest(v.asInstanceOf[ArrayData])._2)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "min_sqdist_to_centroids"
}
