package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** In-task candidate-pair expansion for LSH bucket joins.
  *
  * Every bucketed near-dup operator (MinHash bands, SimHash blocks,
  * hyperplane sketches, shingle postings) needs "all id pairs within a
  * bucket". Expressed as an aliased self-join that is: the bucket table is
  * computed and shuffled twice and the join machinery re-hashes every row.
  * Expressed as `groupBy(bucket) -> collect_list -> explode(pairs(ids))`
  * it is ONE shuffle of the bucket table and a tight in-task loop — and
  * the hot-bucket guard becomes a free `size(ids) <= cap` filter instead
  * of a separate count+semi-join pass over the postings.
  *
  * Buckets are expected small (that is the point of LSH); a degenerate
  * bucket of n ids emits C(n,2) pairs in one task, so operators cap bucket
  * size (the guard) before expansion — the same quadratic blowup would
  * sink the self-join formulation too, so the cap is inherent to the
  * algorithm, not this encoding. */
object PairKernels {
  /** All unordered id pairs (a < b) within a bucket, duplicates skipped.
    * Output rows are (a: long, b: long), sorted input not required. */
  final def sortedIdPairs(idsIn: Array[Long]): ArrayData = {
    val ids = idsIn.clone()
    java.util.Arrays.sort(ids)
    val n = ids.length
    val m = n.toLong * (n - 1) / 2
    require(m <= Int.MaxValue, s"bucket too large for pair expansion: $n ids")
    val out = new Array[Any](m.toInt)
    var w = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        // equal ids (an id bucketed twice, e.g. degenerate multi-probe)
        // would emit a==b self-pairs; skip them
        if (ids(j) != ids(i))
          { out(w) = new GenericInternalRow(Array[Any](ids(i), ids(j))); w += 1 }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (w == m.toInt) out
      else { val trimmed = new Array[Any](w); System.arraycopy(out, 0, trimmed, 0, w); trimmed })
  }

  /** All unordered (id, sketch) pairs within a bucket whose 64-bit sketches
    * are within `maxHamming` — the SimHash verify fused into the pair
    * expansion, so false candidates never leave the task. Output rows are
    * (a: long, b: long, hamming: int) with a < b by id.
    *
    * Emit-once: a close pair collides in EVERY chunk whose key bits it
    * agrees on (up to C(h+t,t) tables), and deduplicating those copies
    * downstream means shuffling each pair once per colliding table. Both
    * sketches are in-task, so the kernel instead re-checks the earlier
    * chunks' key bits (`(ska^skb) & chunkMasks(c) == 0` iff the pair
    * collides in chunk c) and emits only from the FIRST colliding chunk —
    * output is exactly-once by construction and needs no dropDuplicates.
    * `chunkMasks` empty (or `chunk = 0`) degrades to emit-always, for the
    * guarded path where an earlier bucket may have been pruned. */
  final def hammingPairs(
      idsIn: Array[Long], sksIn: Array[Long], maxHamming: Int,
      chunk: Int, chunkMasks: Array[Long]): ArrayData = {
    val n = idsIn.length
    // sort both parallel arrays by id so a < b falls out of the loop order
    val idx = Array.range(0, n).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) =>
      java.lang.Long.compare(idsIn(x), idsIn(y)))
    val ids = new Array[Long](n); val sks = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = idsIn(idx(i)); sks(i) = sksIn(idx(i)); i += 1 }
    val prior = math.min(chunk, chunkMasks.length)
    val buf = new scala.collection.mutable.ArrayBuffer[Any](n)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (ids(j) != ids(i)) {
          val x = sks(i) ^ sks(j)
          val h = java.lang.Long.bitCount(x)
          if (h <= maxHamming) {
            var c = 0
            var earlier = false
            while (c < prior && !earlier) {
              if ((x & chunkMasks(c)) == 0L) earlier = true
              c += 1
            }
            if (!earlier)
              buf += new GenericInternalRow(Array[Any](ids(i), ids(j), h))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }
}

/** `sorted_pairs(ids)` — all a < b id pairs within an LSH bucket. */
case class SortedPairs(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_pairs"

  override def nullSafeEval(input: Any): Any =
    PairKernels.sortedIdPairs(input.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PairKernels.sortedIdPairs($a.toLongArray());")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `hamming_pairs(entries, chunk, maxHamming, chunkMasks)` — SimHash
  * bucket pair expansion with the exact Hamming verify fused in and
  * emit-once across LSH tables (see [[PairKernels.hammingPairs]]).
  * `entries` is `array<struct<id: long, sk: long>>`; `chunk` is the
  * bucket's table index; `chunkMasks(c)` has the key bits of table c set
  * (empty masks = emit from every colliding table, dedup downstream). */
case class HammingPairs(left: Expression, right: Expression, maxHamming: Int,
    chunkMasks: Array[Long])
    extends BinaryExpression with ImplicitCastInputTypes {
  require(maxHamming >= 0 && maxHamming < 64, s"maxHamming out of range: $maxHamming")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("sk", LongType)))),
    IntegerType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_pairs"

  override def nullSafeEval(entries: Any, chunk: Any): Any = {
    val arr = entries.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n); val sks = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 2)
      ids(i) = r.getLong(0); sks(i) = r.getLong(1)
      i += 1
    }
    PairKernels.hammingPairs(ids, sks, maxHamming, chunk.asInstanceOf[Int], chunkMasks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val masksRef = ctx.addReferenceObj("chunkMasks", chunkMasks, "long[]")
    nullSafeCodeGen(ctx, ev, (a, ch) => {
      val n = ctx.freshName("n"); val ids = ctx.freshName("ids")
      val sks = ctx.freshName("sks"); val i = ctx.freshName("i")
      val r = ctx.freshName("row")
      s"""
         |int $n = $a.numElements();
         |long[] $ids = new long[$n];
         |long[] $sks = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $r = $a.getStruct($i, 2);
         |  $ids[$i] = $r.getLong(0);
         |  $sks[$i] = $r.getLong(1);
         |}
         |${ev.value} = graft.functions.PairKernels.hammingPairs(
         |  $ids, $sks, $maxHamming, $ch, $masksRef);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
