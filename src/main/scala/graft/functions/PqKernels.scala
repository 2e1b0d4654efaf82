package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** PQ asymmetric (ADC) distance: given a row's PQ codes (one byte per
  * subvector) and a per-query lookup table `lut` (flattened
  * `numSubvectors x numCodewords` of squared sub-distances), the L2
  * distance is `sqrt(sum_j lut[j*k + codes[j]])`.
  *
  * Mirrors rs/quantization/src/pq/mod.rs:202-260 (`distance` with the L2
  * selector); the LUT trick replaces the reference's per-pair codebook
  * walk with one table build per query — the standard ADC formulation.
  */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_distance"

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[Array[Byte]]
    val lut = lutAny.asInstanceOf[ArrayData].toDoubleArray()
    val k = if (codes.length == 0) 0 else lut.length / codes.length
    var acc = 0.0
    var j = 0
    while (j < codes.length) { acc += lut(j * k + (codes(j) & 0xff)); j += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val codes = ctx.freshName("codes"); val lut = ctx.freshName("lut")
      val k = ctx.freshName("k"); val acc = ctx.freshName("acc"); val j = ctx.freshName("j")
      s"""
         |byte[] $codes = $c;
         |double[] $lut = $l.toDoubleArray();
         |int $k = $codes.length == 0 ? 0 : $lut.length / $codes.length;
         |double $acc = 0.0;
         |for (int $j = 0; $j < $codes.length; $j++) {
         |  $acc += $lut[$j * $k + ($codes[$j] & 0xff)];
         |}
         |${ev.value} = Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
