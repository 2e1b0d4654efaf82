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

  /** Java statements: given `double[] x`, `double[] y`, `int n`, assign the
    * kernel result to `target` (already declared as double). */
  protected def genLoop(ctx: CodegenContext, x: String, y: String, n: String, target: String): String
  protected def evalKernel(x: Array[Double], y: Array[Double]): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    evalKernel(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val n = ctx.freshName("n")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = Math.min($x.length, $y.length);
         |${genLoop(ctx, x, y, n, ev.value)}
       """.stripMargin
    })
}

/** sqrt(sum((x-y)^2)) — rs/utils/src/distance/l2.rs:19 (`calculate`). */
case class L2Distance(left: Expression, right: Expression) extends ArrayPairKernel {
  override def prettyName: String = "l2_distance"
  override protected def genLoop(ctx: CodegenContext, x: String, y: String, n: String, t: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
    s"""double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) { double $d = $x[$i] - $y[$i]; $acc += $d * $d; }
       |$t = Math.sqrt($acc);""".stripMargin
  }
  override protected def evalKernel(x: Array[Double], y: Array[Double]): Double = {
    var acc = 0.0; var i = 0; val n = math.min(x.length, y.length)
    while (i < n) { val d = x(i) - y(i); acc += d * d; i += 1 }
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
       |for (int $i = 0; $i < $n; $i++) { double $d = $x[$i] - $y[$i]; $acc += $d * $d; }
       |$t = $acc;""".stripMargin
  }
  override protected def evalKernel(x: Array[Double], y: Array[Double]): Double = {
    var acc = 0.0; var i = 0; val n = math.min(x.length, y.length)
    while (i < n) { val d = x(i) - y(i); acc += d * d; i += 1 }
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
       |for (int $i = 0; $i < $n; $i++) { $acc += $x[$i] * $y[$i]; }
       |$t = $acc;""".stripMargin
  }
  override protected def evalKernel(x: Array[Double], y: Array[Double]): Double = {
    var acc = 0.0; var i = 0; val n = math.min(x.length, y.length)
    while (i < n) { acc += x(i) * y(i); i += 1 }
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
    val i = ctx.freshName("i")
    s"""double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $dot += $x[$i] * $y[$i]; $nx += $x[$i] * $x[$i]; $ny += $y[$i] * $y[$i];
       |}
       |$t = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));""".stripMargin
  }
  override protected def evalKernel(x: Array[Double], y: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0; val n = math.min(x.length, y.length)
    while (i < n) { dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
