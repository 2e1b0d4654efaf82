package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType}

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
         |    $a.toDoubleArray(), $cRef, $dim, $maxC, ${CentroidKernels.javaDouble(pct)}));""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Two-level pruned variant: centroids are pre-grouped (super-clusters);
  * a vector scans all group centers, then only the member centroids of the
  * `probeGroups` nearest groups — ~sqrt(k)-fold fewer distance evals on
  * the build's full-data pass (ROADMAP #1; SPANN-style hierarchy).
  * Near-exact: the true nearest centroid is outside the probed groups only
  * for points deep in a Voronoi corner; multi-assignment makes that
  * harmless for search recall (every point still lands in >=1 list). */
case class NearestCentroidsPruned(
    child: Expression,
    flatCentroids: Array[Double],
    groupFlat: Array[Double], // g x dim group centers
    memberOffsets: Array[Int], // group -> [start, end) into memberIdx
    memberIdx: Array[Int], // centroid indices grouped by group
    dim: Int,
    maxC: Int,
    pct: Double,
    probeGroups: Int) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids_pruned"
  override lazy val canonicalized: Expression = this

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(CentroidKernels.assignPruned(
      v, flatCentroids, groupFlat, memberOffsets, memberIdx, dim, maxC, pct, probeGroups))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("flatCentroids", flatCentroids, "double[]")
      val gRef = ctx.addReferenceObj("groupFlat", groupFlat, "double[]")
      val oRef = ctx.addReferenceObj("memberOffsets", memberOffsets, "int[]")
      val mRef = ctx.addReferenceObj("memberIdx", memberIdx, "int[]")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CentroidKernels.assignPruned(
         |    $a.toDoubleArray(), $cRef, $gRef, $oRef, $mRef, $dim, $maxC,
         |    ${CentroidKernels.javaDouble(pct)}, $probeGroups));""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `canonical_site(probes, assigns, site)` — true iff `site` is the
  * canonical meeting centroid of a (query, neighbor) candidate pair: the
  * FIRST entry of `probes` (the query's probe list, nearest-first) that
  * also appears in `assigns` (the neighbor's assignment list). The
  * kNN-graph join uses it to count each multi-probed pair exactly once
  * WITHOUT a dropDuplicates exchange of the candidate volume. It runs once
  * per candidate pair — the hottest predicate in the engine — so it is an
  * allocation-free int-loop replacement for
  * `array_min(array_intersect(probes, assigns)) = site`, which builds a
  * hash set per evaluation. */
case class CanonicalSite(probes: Expression, assigns: Expression, site: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def first: Expression = probes
  override def second: Expression = assigns
  override def third: Expression = site
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "canonical_site"

  override def nullSafeEval(p: Any, a: Any, s: Any): Any = {
    val pr = p.asInstanceOf[ArrayData]; val as = a.asInstanceOf[ArrayData]
    val st = s.asInstanceOf[Int]
    val np = pr.numElements(); val na = as.numElements()
    var i = 0
    while (i < np) {
      val pi = pr.getInt(i)
      var j = 0
      while (j < na) {
        if (as.getInt(j) == pi) return java.lang.Boolean.valueOf(pi == st)
        j += 1
      }
      i += 1
    }
    java.lang.Boolean.FALSE
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, a, s) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val np = ctx.freshName("np"); val na = ctx.freshName("na")
      val pi = ctx.freshName("pi"); val done = ctx.freshName("done")
      s"""
         |boolean $done = false;
         |int $np = $p.numElements(); int $na = $a.numElements();
         |for (int $i = 0; $i < $np && !$done; $i++) {
         |  int $pi = $p.getInt($i);
         |  for (int $j = 0; $j < $na; $j++) {
         |    if ($a.getInt($j) == $pi) { ${ev.value} = ($pi == $s); $done = true; break; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(probes = newFirst, assigns = newSecond, site = newThird)
}

object CentroidKernels {
  /** Render a double as a Java literal that Janino accepts for EVERY
    * value: plain interpolation of Infinity/NaN produces the identifiers
    * `Infinity`/`NaN`, which are not valid Java source — the codegen then
    * silently falls back to the interpreter. */
  def javaDouble(d: Double): String =
    if (d.isNaN || d.isInfinite)
      s"java.lang.Double.longBitsToDouble(${java.lang.Double.doubleToLongBits(d)}L)"
    else s"${d}D"

  @inline private def sq(v: Array[Double], flat: Array[Double], off: Int, dim: Int): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { val d = v(i) - flat(off + i); acc += d * d; i += 1 }
    acc
  }

  /** Pruned two-level assignment; see [[NearestCentroidsPruned]]. */
  final def assignPruned(v: Array[Double], flat: Array[Double],
      groupFlat: Array[Double], memberOffsets: Array[Int], memberIdx: Array[Int],
      dim: Int, maxC: Int, pct: Double, probeGroups: Int): Array[Int] = {
    val g = groupFlat.length / dim
    if (g == 0) return Array.emptyIntArray
    // nearest probeGroups groups by center distance (partial selection)
    val gd = new Array[Double](g)
    var i = 0
    while (i < g) { gd(i) = sq(v, groupFlat, i * dim, dim); i += 1 }
    val order = Array.tabulate(g)(identity)
    val m = math.min(probeGroups, g)
    var s = 0
    while (s < m) {
      var best = s; var j = s + 1
      while (j < g) { if (gd(order(j)) < gd(order(best))) best = j; j += 1 }
      val t = order(s); order(s) = order(best); order(best) = t
      s += 1
    }
    // candidate centroids = members of the probed groups
    var total = 0
    var p = 0
    while (p < m) { total += memberOffsets(order(p) + 1) - memberOffsets(order(p)); p += 1 }
    if (total == 0) return assign(v, flat, dim, maxC, pct) // all probed groups empty
    val candIdx = new Array[Int](total)
    val candD = new Array[Double](total)
    var w = 0
    p = 0
    while (p < m) {
      val grp = order(p)
      var q = memberOffsets(grp)
      while (q < memberOffsets(grp + 1)) {
        val ci = memberIdx(q)
        candIdx(w) = ci
        candD(w) = sq(v, flat, ci * dim, dim)
        w += 1
        q += 1
      }
      p += 1
    }
    // multi-assignment rule over candidates
    val sel = math.min(maxC, total)
    var s2 = 0
    while (s2 < sel) {
      var best = s2; var j = s2 + 1
      while (j < total) {
        if (candD(j) < candD(best) || (candD(j) == candD(best) && candIdx(j) < candIdx(best))) best = j
        j += 1
      }
      var td = candD(s2); candD(s2) = candD(best); candD(best) = td
      var ti = candIdx(s2); candIdx(s2) = candIdx(best); candIdx(best) = ti
      s2 += 1
    }
    if (pct.isPosInfinity) return java.util.Arrays.copyOfRange(candIdx, 0, sel)
    val lim = math.sqrt(candD(0)) * (1.0 + pct)
    var cnt = 0
    while (cnt < sel && math.sqrt(candD(cnt)) <= lim) cnt += 1
    java.util.Arrays.copyOfRange(candIdx, 0, cnt)
  }

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
    // pct = +Inf means "the m nearest, unconditionally" (probe selection);
    // the ratio bound would misbehave there when the best distance is 0
    // (lim = 0 * Inf = NaN keeps nothing)
    if (pct.isPosInfinity) return java.util.Arrays.copyOfRange(order, 0, m)
    val lim = math.sqrt(d2(order(0))) * (1.0 + pct)
    var cnt = 0
    while (cnt < m && math.sqrt(d2(order(cnt))) <= lim) cnt += 1
    java.util.Arrays.copyOfRange(order, 0, cnt)
  }
}
