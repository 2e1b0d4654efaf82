package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Scalar (int8) quantization kernels — 4× memory cut vs f32 with a
  * per-dimension affine codebook (the SQ8 every serving stack ships
  * alongside PQ). Codebook arrays ride in the expression like the
  * centroid kernels: shipped once per executor in the task binary. */
case class Sq8Encode(
    child: Expression,
    mins: Array[Double],
    invScales: Array[Double]) extends UnaryExpression with ImplicitCastInputTypes {
  require(mins.length == invScales.length && mins.nonEmpty, "bad codebook shape")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"
  override lazy val canonicalized: Expression = this

  override def nullSafeEval(input: Any): Any =
    SqKernels.encode(input.asInstanceOf[ArrayData].toDoubleArray(), mins, invScales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mRef = ctx.addReferenceObj("mins", mins, "double[]")
      val sRef = ctx.addReferenceObj("invScales", invScales, "double[]")
      s"${ev.value} = graft.functions.SqKernels.encode($a.toDoubleArray(), $mRef, $sRef);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric L2 distance of an SQ8 code array against a query: the
  * query is pre-shifted by the codebook mins (`qAdj = q - mins`) so the
  * inner loop is one fused multiply-subtract per dimension. */
case class Sq8L2Distance(
    child: Expression,
    qAdj: Array[Double],
    scales: Array[Double]) extends UnaryExpression with ImplicitCastInputTypes {
  require(qAdj.length == scales.length && qAdj.nonEmpty, "bad query shape")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_l2_distance"
  override lazy val canonicalized: Expression = this

  override def nullSafeEval(input: Any): Any =
    SqKernels.l2(input.asInstanceOf[Array[Byte]], qAdj, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val qRef = ctx.addReferenceObj("qAdj", qAdj, "double[]")
      val sRef = ctx.addReferenceObj("scales", scales, "double[]")
      s"${ev.value} = graft.functions.SqKernels.l2($a, $qRef, $sRef);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SqKernels {
  final def encode(x: Array[Double], mins: Array[Double], invScales: Array[Double]): Array[Byte] = {
    val d = mins.length
    val out = new Array[Byte](d)
    var j = 0
    val n = math.min(d, x.length)
    while (j < n) {
      val c = Math.round((x(j) - mins(j)) * invScales(j))
      out(j) = (if (c < 0L) 0L else if (c > 255L) 255L else c).toByte
      j += 1
    }
    out
  }

  final def l2(codes: Array[Byte], qAdj: Array[Double], scales: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    val n = math.min(codes.length, qAdj.length)
    while (j < n) {
      val diff = qAdj(j) - (codes(j) & 0xff).toDouble * scales(j)
      acc += diff * diff
      j += 1
    }
    math.sqrt(acc)
  }
}
