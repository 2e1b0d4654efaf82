package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Distance/similarity kernels over two numeric-array columns.
  *
  * Scalar semantics mirror the reference SIMD kernels
  * (rs/utils/src/distance/l2.rs:19-70, rs/utils/src/distance/dot_product.rs:31-95);
  * here they are native Catalyst expressions with `doGenCode`, so they sit
  * inside whole-stage codegen (no UDF boxing) and the JVM JIT auto-vectorizes
  * the generated loop. Inputs are implicitly cast to `array<double>`
  * (lossless from `array<float>`); accumulation is double.
  */
abstract class ArrayPairKernel extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Java statements: given ArrayData `x`, ArrayData `y`, `int n`, assign
    * the kernel result to `target` (already declared as double). Loops read
    * elements via `getDouble(i)` DIRECTLY from the (usually Unsafe) array
    * buffer — no `toDoubleArray()` copy, because in a join's per-pair hot
    * path the two allocations + 2*dim*8-byte copies per evaluated pair
    * dominate the actual distance flops (each element is read exactly once
    * per kernel, so direct access is never worse). */
  protected def genLoop(ctx: CodegenContext, x: String, y: String, n: String, target: String): String
  protected def evalKernel(x: ArrayData, y: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |${genLoop(ctx, a, b, n, ev.value)}
       """.stripMargin
    })
}

/** sqrt(sum((x-y)^2)) — rs/utils/src/distance/l2.rs:19 (`calculate`). */
case class L2Distance(left: Expression, right: Expression) extends ArrayPairKernel {
  override def prettyName: String = "l2_distance"
  override protected def genLoop(ctx: CodegenContext, x: String, y: String, n: String, t: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
    s"""double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) { double $d = $x.getDouble($i) - $y.getDouble($i); $acc += $d * $d; }
       |$t = Math.sqrt($acc);""".stripMargin
  }
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = math.min(x.numElements(), y.numElements())
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sum((x-y)^2) — rs/utils/src/distance/l2.rs:32 (`calculate_squared`). */
case class L2DistanceSquared(left: Expression, right: Expression) extends ArrayPairKernel {
  override def prettyName: String = "l2_distance_squared"
  override protected def genLoop(ctx: CodegenContext, x: String, y: String, n: String, t: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
    s"""double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) { double $d = $x.getDouble($i) - $y.getDouble($i); $acc += $d * $d; }
       |$t = $acc;""".stripMargin
  }
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = math.min(x.numElements(), y.numElements())
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); acc += d * d; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sum(x*y) — rs/utils/src/distance/dot_product.rs:31. */
case class DotProduct(left: Expression, right: Expression) extends ArrayPairKernel {
  override def prettyName: String = "dot_product"
  override protected def genLoop(ctx: CodegenContext, x: String, y: String, n: String, t: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    s"""double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) { $acc += $x.getDouble($i) * $y.getDouble($i); }
       |$t = $acc;""".stripMargin
  }
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double = {
    var acc = 0.0; var i = 0; val n = math.min(x.numElements(), y.numElements())
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dot(x,y) / (|x||y|); 0.0 when either norm is 0. Used by the near-dup /
  * ANN training-data operators (not part of the reference's served surface,
  * which is L2-only — rs/index_server/src/collection_manager.rs:72-94). */
case class CosineSimilarity(left: Expression, right: Expression) extends ArrayPairKernel {
  override def prettyName: String = "cosine_similarity"
  override protected def genLoop(ctx: CodegenContext, x: String, y: String, n: String, t: String): String = {
    val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
    val i = ctx.freshName("i"); val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
    s"""double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $xi = $x.getDouble($i); double $yi = $y.getDouble($i);
       |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
       |}
       |$t = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));""".stripMargin
  }
  override protected def evalKernel(x: ArrayData, y: ArrayData): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
