package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}

object HashKernels {
  /** Sign-bit hyperplane sketch: for each of `tables` tables, project the
    * vector onto that table's `planes` hyperplanes (rows of the flattened
    * `tables*planes x dim` matrix) and pack the sign bits into a mask;
    * the table id rides in the top 32 bits so buckets from different
    * tables never collide.
    *
    * `probes` > 0 adds multi-probe buckets (Lv et al., VLDB'07): per
    * table, also emit the masks with the 1..probes least-confident sign
    * bits (smallest |dot|) flipped one at a time — a vector near a
    * hyperplane then lands on both sides, so near-threshold pairs collide
    * without adding tables. Output has `tables * (1 + probes)` keys.
    * Kernel for [[HyperplaneSketch]]. */
  final def hyperplaneBuckets(
      v: Array[Double], flat: Array[Double], tables: Int, planes: Int, dim: Int,
      probes: Int = 0): Array[Long] = {
    val out = new Array[Long](tables * (1 + probes))
    val dots = new Array[Double](planes)
    val n = math.min(dim, v.length)
    var w = 0
    var t = 0
    while (t < tables) {
      var mask = 0L
      var p = 0
      while (p < planes) {
        val off = (t * planes + p) * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v(i) * flat(off + i); i += 1 }
        dots(p) = dot
        if (dot >= 0) mask |= (1L << p)
        p += 1
      }
      out(w) = (t.toLong << 32) | mask
      w += 1
      var done = 0
      var usedMask = 0L
      while (done < probes) {
        var best = -1
        var bestAbs = Double.MaxValue
        var i = 0
        while (i < planes) {
          if ((usedMask & (1L << i)) == 0 && math.abs(dots(i)) < bestAbs) {
            best = i; bestAbs = math.abs(dots(i))
          }
          i += 1
        }
        // probes > planes degenerates to repeating the true mask
        out(w) =
          if (best < 0) (t.toLong << 32) | mask
          else { usedMask |= (1L << best); (t.toLong << 32) | (mask ^ (1L << best)) }
        w += 1
        done += 1
      }
      t += 1
    }
    out
  }
  /** splitmix64 finalizer — the standard public-domain 64-bit mixer. */
  @inline final def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Polynomial byte hash (base 1000003). */
  final def polyHash(bytes: Array[Byte]): Long = {
    var h = 0L; var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** Positioned rolling window hashes for exact substring dedup: one
    * `(pos, h)` struct per L-token window, where h is the base-1000003
    * wrap-around polynomial over the tokens' [[polyHash]] values — O(T)
    * via the rolling recurrence `h' = (h - th[p]*B^(L-1))*B + th[p+L]`
    * (Java long arithmetic IS mod-2^64, so direct HUGEINT re-reduction of
    * any single window in SQL reproduces it bit-exactly; that is the q51
    * oracle). Kernel for [[WindowHashes]]. */
  final def windowHashStructs(arr: ArrayData, windowLen: Int): ArrayData = {
    val n = arr.numElements()
    if (n < windowLen) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = polyHash(arr.getUTF8String(i).getBytes); i += 1 }
    val B = 1000003L
    var pw = 1L
    i = 1
    while (i < windowLen) { pw *= B; i += 1 } // B^(L-1), wrapping
    val m = n - windowLen + 1
    val out = new Array[Any](m)
    var h = 0L
    i = 0
    while (i < windowLen) { h = h * B + th(i); i += 1 }
    out(0) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0, h))
    var p = 1
    while (p < m) {
      h = (h - th(p - 1) * pw) * B + th(p + windowLen - 1)
      out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](p, h))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Order-sensitive combine of each n-window of element hashes; one slot
    * for the whole array when it is shorter than n. */
  final def combineWindows(th: Array[Long], n: Int): Array[Long] = {
    val len = th.length
    if (len < n) {
      var acc = 1125899906842597L; var i = 0
      while (i < len) { acc = mix64(acc ^ (th(i) * 0x9e3779b97f4a7c15L)); i += 1 }
      Array(acc)
    } else {
      val out = new Array[Long](len - n + 1)
      var s = 0
      while (s <= len - n) {
        var acc = 1125899906842597L; var j = 0
        while (j < n) { acc = mix64(acc ^ (th(s + j) * 0x9e3779b97f4a7c15L)); j += 1 }
        out(s) = acc
        s += 1
      }
      out
    }
  }
}

/** MinHash signature of a set of 64-bit element hashes.
  *
  * For permutation j in [0, k): sig[j] = min over elements e of
  * mix64(e ^ seed_j), with seed_j = mix64(seed + j). One pass over the
  * input array computes all k signature slots (k*|set| mixes, no
  * allocation per permutation). Empty input yields Long.MaxValue slots.
  * Used by the MinHash+LSH near-duplicate operator (training-data
  * pipeline surface; no reference counterpart — muopdb has no dedup).
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k > 0 && k <= 1024, s"minhash k out of range: $k")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val elems = input.asInstanceOf[ArrayData].toLongArray()
    val sig = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    while (i < elems.length) {
      var j = 0
      while (j < k) {
        val h = HashKernels.mix64(elems(i) ^ HashKernels.mix64(seed + j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // static forwarder on the companion class resolves under Janino
      val hk = "graft.functions.HashKernels"
      val e = ctx.freshName("elems"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val h = ctx.freshName("h")
      s"""
         |long[] $e = $a.toLongArray();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $e.length; $i++) {
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $h = $hk.mix64($e[$i] ^ $hk.mix64(${seed}L + $j));
         |    if ($h < $sig[$j]) $sig[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass word n-gram shingle hasher: hash each token (polynomial over
  * UTF-8 bytes + splitmix finalizer), then combine each window of n
  * consecutive token hashes order-sensitively. Output has
  * max(1, len - n + 1) slots. Replaces the compositional
  * slice+concat+xxhash formulation, which is O(len * n) with per-position
  * string allocation — this is O(len) with zero allocation per shingle. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1 && n <= 64, s"shingle length out of range: $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) = HashKernels.mix64(HashKernels.polyHash(
        arr.getUTF8String(i).getBytes))
      i += 1
    }
    new GenericArrayData(HashKernels.combineWindows(th, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val hk = "graft.functions.HashKernels"
      val len = ctx.freshName("len"); val th = ctx.freshName("th"); val i = ctx.freshName("i")
      s"""
         |int $len = $a.numElements();
         |long[] $th = new long[$len];
         |for (int $i = 0; $i < $len; $i++) {
         |  $th[$i] = $hk.mix64($hk.polyHash($a.getUTF8String($i).getBytes()));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $hk.combineWindows($th, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Polynomial rolling hash (base 1000003, wrap-around mod 2^64) over a
  * string's UTF-8 bytes — the document-fingerprinting primitive of the
  * training-data pipeline. */
case class RollingHash(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("bytes"); val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |byte[] $b = $a.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) { $h = $h * 1000003L + ($b[$i] & 0xffL); }
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `window_hashes(tokens, L)` — positioned rolling hashes of every
  * L-token window, `array<struct<pos: int, h: long>>`; empty below L
  * tokens. The corpus-wide pass of exact substring dedup (Lee et al.,
  * ACL'22 §4.1 "ExactSubstr"): windows sharing h are duplicate text
  * modulo 2^64 hash collisions. */
case class WindowHashes(child: Expression, windowLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(windowLen >= 1, s"window length out of range: $windowLen")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    HashKernels.windowHashStructs(input.asInstanceOf[ArrayData], windowLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.windowHashStructs($a, $windowLen);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multi-table sign-bit LSH sketch of an embedding (Charikar 2002 over the
  * raw vector): one bucket key per table, `(table << 32) | signMask`.
  * The plane matrix rides in the expression as one flattened row-major
  * `double[]` (same pattern as [[graft.functions.NearestCentroids]]) so the
  * sketch runs inside whole-stage codegen with zero boxing — this is the
  * full-data pass of embedding near-dup candidate generation. */
case class HyperplaneSketch(
    child: Expression,
    flatPlanes: Array[Double],
    tables: Int,
    planes: Int,
    dim: Int,
    probes: Int = 0) extends UnaryExpression with ImplicitCastInputTypes {
  require(tables > 0 && planes > 0 && planes <= 32, s"bad sketch shape: $tables x $planes")
  require(probes >= 0, s"bad probe count: $probes")
  require(flatPlanes.length == tables * planes * dim, "bad plane matrix shape")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sketch"
  // matrix compares by reference only (immutable per run) — see NearestCentroids
  override lazy val canonicalized: Expression = this

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(
      HashKernels.hyperplaneBuckets(v, flatPlanes, tables, planes, dim, probes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pRef = ctx.addReferenceObj("flatPlanes", flatPlanes, "double[]")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HashKernels.hyperplaneBuckets(
         |    $a.toDoubleArray(), $pRef, $tables, $planes, $dim, $probes));""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash of a bag of 64-bit element hashes: per bit, sum +1/-1
  * votes across elements; the sign of each bit's total sets the output bit.
  * (Charikar 2002 random-hyperplane sketch over token hashes.) */
case class SimHash64(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val elems = input.asInstanceOf[ArrayData].toLongArray()
    val votes = new Array[Int](64)
    var i = 0
    while (i < elems.length) {
      val h = elems(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val e = ctx.freshName("elems"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val b = ctx.freshName("b"); val out = ctx.freshName("out")
      s"""
         |long[] $e = $a.toLongArray();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $e.length; $i++) {
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($e[$i] >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) { if ($votes[$b] > 0) $out |= (1L << $b); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
