package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Multi-assignment nearest-centroid kernel (SURVEY §2.4 A3,
  * rs/index/src/ivf/builder.rs:292-367): for one vector, return the ids of
  * all centroids with dist <= nearest * (1 + pct), capped at `maxC`,
  * nearest first.
  *
  * The centroid matrix rides in the expression as one flattened row-major
  * `double[]` (cache-friendly inner loop; Spark broadcasts the task
  * binary, so the matrix ships once per executor, not per task). This is
  * the index build's full-data pass — the dominant cost at scale — so it
  * runs inside whole-stage codegen with zero boxing, replacing the
  * UDF formulation (~Seq boxing per row). */
case class NearestCentroids(
    child: Expression,
    flatCentroids: Array[Double],
    dim: Int,
    maxC: Int,
    pct: Double) extends UnaryExpression with ImplicitCastInputTypes {
  require(dim > 0 && flatCentroids.length % dim == 0, "bad centroid matrix shape")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"

  // the matrix participates in equality via reference only (it is
  // immutable per build); avoids O(n) semanticEquals comparisons
  override lazy val canonicalized: Expression = this

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(CentroidKernels.assign(v, flatCentroids, dim, maxC, pct))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("flatCentroids", flatCentroids, "double[]")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CentroidKernels.assign(
         |    $a.toDoubleArray(), $cRef, $dim, $maxC, $pct));""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CentroidKernels {
  /** Shared scalar kernel: squared distances against the flattened matrix,
    * then the multi-assignment rule. Returns centroid indices. */
  final def assign(v: Array[Double], flat: Array[Double], dim: Int,
      maxC: Int, pct: Double): Array[Int] = {
    val k = flat.length / dim
    if (k == 0) return Array.emptyIntArray
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val off = c * dim
      var i = 0
      val n = math.min(dim, v.length)
      while (i < n) { val d = v(i) - flat(off + i); acc += d * d; i += 1 }
      d2(c) = acc
      c += 1
    }
    // selection of up to maxC nearest within the ratio bound
    val order = Array.tabulate(k)(identity)
    // partial selection sort is enough: maxC is tiny (1-4)
    val m = math.min(maxC, k)
    var s = 0
    while (s < m) {
      var best = s
      var j = s + 1
      while (j < k) {
        if (d2(order(j)) < d2(order(best)) ||
          (d2(order(j)) == d2(order(best)) && order(j) < order(best))) best = j
        j += 1
      }
      val t = order(s); order(s) = order(best); order(best) = t
      s += 1
    }
    val lim = math.sqrt(d2(order(0))) * (1.0 + pct)
    var cnt = 0
    while (cnt < m && math.sqrt(d2(order(cnt))) <= lim) cnt += 1
    java.util.Arrays.copyOfRange(order, 0, cnt)
  }
}
