package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** RaBitQ signed dot product: given a row's 1-bit sign code (bit i set =
  * rotated residual dimension i is non-negative) and the rotated unit
  * query `qrot`, computes `<x̄_u, q'> = (Σ_i ±qrot[i]) / sqrt(D)` — the
  * inner product between the quantized unit vector and the rotated query
  * (Gao & Long, SIGMOD'24, eq. for the 1-bit estimator; the reference
  * carries the same codes in rs/quantization/src/rabitq/).
  *
  * The caller turns this into a distance estimate with the stored
  * per-vector factor and norms; this kernel is the per-row O(D) part and
  * runs inside whole-stage codegen.
  */
case class RabitqSignedDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rabitq_signed_dot"

  override def nullSafeEval(codeAny: Any, qAny: Any): Any = {
    val code = codeAny.asInstanceOf[Array[Byte]]
    val q = qAny.asInstanceOf[ArrayData].toDoubleArray()
    var acc = 0.0
    var i = 0
    while (i < q.length) {
      val bit = (code(i >> 3) >> (i & 7)) & 1
      acc += (if (bit == 1) q(i) else -q(i))
      i += 1
    }
    acc / math.sqrt(q.length.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, qv) => {
      val code = ctx.freshName("code"); val q = ctx.freshName("q")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
         |byte[] $code = $c;
         |double[] $q = $qv.toDoubleArray();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $q.length; $i++) {
         |  int bit = ($code[$i >> 3] >> ($i & 7)) & 1;
         |  $acc += (bit == 1) ? $q[$i] : -$q[$i];
         |}
         |${ev.value} = $acc / Math.sqrt((double) $q.length);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
