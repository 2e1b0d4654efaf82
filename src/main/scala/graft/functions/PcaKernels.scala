package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `affine_project(vector)` — out[r] = Σ_j M[r·dim+j] · (x[j] − mean[j])
  * for a broadcast row-major k×dim matrix M: the map-only projection pass
  * of PCA / whitening (the matrix ships once per executor in the task
  * binary, like the centroid kernels). Whitening folds the per-component
  * 1/√λ scale into M on the driver, so one kernel serves both. */
case class AffineProject(
    child: Expression,
    flatRows: Array[Double],
    mean: Array[Double],
    dim: Int) extends UnaryExpression with ImplicitCastInputTypes {
  require(dim > 0 && mean.length == dim && flatRows.length % dim == 0,
    "bad projection matrix shape")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "affine_project"
  override lazy val canonicalized: Expression = this

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(PcaKernels.project(v, flatRows, mean, dim))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mRef = ctx.addReferenceObj("flatRows", flatRows, "double[]")
      val cRef = ctx.addReferenceObj("mean", mean, "double[]")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PcaKernels.project($a.toDoubleArray(), $mRef, $cRef, $dim));""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PcaKernels {
  /** Shared by interpreted eval and codegen: center then k dot products. */
  def project(x: Array[Double], flat: Array[Double], mean: Array[Double], dim: Int): Array[Double] = {
    val k = flat.length / dim
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      var acc = 0.0
      val base = r * dim
      var j = 0
      val n = math.min(dim, x.length)
      while (j < n) { acc += flat(base + j) * (x(j) - mean(j)); j += 1 }
      out(r) = acc
      r += 1
    }
    out
  }
}
