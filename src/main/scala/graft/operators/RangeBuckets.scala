package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic equi-depth range-bucket ids for the distributed
  * prefix-scan family (Sessionize, AsofJoin giant-key path,
  * packSequences, tokenBudgetSample).
  *
  * Those operators tag each row with the partition it landed in and
  * join pid-keyed correction tables back against the row-level tree.
  * Deriving pid from `repartitionByRange` + `spark_partition_id()` made
  * pid an EXECUTION artifact: Catalyst re-plans (does not reuse) each
  * reference to the subtree, and RangePartitioner re-samples its bounds
  * per planned expansion (the sample seed derives from the global
  * RDD-id counter), so two expansions could disagree about a row's pid
  * — silent stale carries / session splits. The round-10 stopgap froze
  * the assignment by persisting the tagged frame (input-scale cache).
  *
  * This helper replaces both: the bucket id is a PURE FUNCTION of the
  * row. Boundaries come from one deterministic hash-sampled quantile
  * pass (a count + a bounded driver collect — the repo's
  * bounded-sample posture), and the id is a codegen-able chained
  * lexicographic comparison against the broadcast boundary literals.
  * Every planned expansion computes identical ids by construction, so
  * nothing needs caching and AQE may re-plan each exchange freely.
  *
  * Balance matches RangePartitioner's (same equi-depth estimate from a
  * same-order sample); correctness never depends on balance. Rows with
  * null keys compare null through the chain and fall to the last
  * bucket — consistently. */
object RangeBuckets {

  /** Bucket-id column over `keys` (lexicographic): 0 .. nBuckets-1.
    * Runs two driver-visible jobs on `df` (count + ~`sampleTarget`-row
    * collect of the key columns) to derive boundaries. */
  def bucketCol(
      df: DataFrame,
      keys: Seq[Column],
      nBuckets: Int,
      samplePerBucket: Int = 100): Column = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets")
    if (nBuckets == 1) return lit(0)
    // RangePartitioner's own sizing: ~100 samples per bucket bounds the
    // quantile error; more samples only slow the driver collect
    val sampleTarget = math.max(2000, nBuckets * samplePerBucket)
    val keyed = df.select(keys: _*)
    // ONE boundary job: the sampling modulus comes from the optimizer's
    // free size estimate (rough row-width guess — only BALANCE depends
    // on it, never correctness), so no count pass is needed. The hash
    // predicate is a pure function of the key tuple: the same rows are
    // picked in every expansion and every retry. The limit caps the
    // driver collect if the estimate ran low; a bitten limit skews
    // balance only.
    val sizeBytes = BigInt(keyed.queryExecution.optimizedPlan.stats.sizeInBytes.bigInteger)
    val approxRows = (sizeBytes / 32).max(1)
    val m = approxRows / sampleTarget
    val modulus = if (m < 1) 1L else if (m > 1000000000L) 1000000000L else m.toLong
    val t0 = System.nanoTime()
    val sample = keyed
      .filter(pmod(xxhash64(keyed.columns.map(col): _*), lit(modulus)) === 0)
      .limit(sampleTarget * 4)
      .collect()
    if (sys.env.contains("GRAFT_DEBUG_BUCKETS"))
      println(f"[buckets] sample=${sample.length} modulus=$modulus took ${(System.nanoTime()-t0)/1e9}%.2f s")
    if (sample.isEmpty) return lit(0)
    val width = keys.length
    val ord = rowOrdering(width)
    val sorted = sample.sortWith((a, b) => ord.compare(a, b) < 0)
    // nBuckets-1 equi-depth boundary tuples (deduplicated; ties would
    // produce empty buckets, which is harmless, but the chain shrinks)
    val bounds = (1 until nBuckets)
      .map(i => sorted(((i.toLong * sorted.length) / nBuckets).toInt.min(sorted.length - 1)))
      .map(r => (0 until width).map(r.get))
      .distinct
    // first boundary b with (row <= b) decides the bucket; rows past
    // every boundary (and null-key rows) land in the last bucket
    def leq(b: Seq[Any]): Column =
      keys.zip(b).foldRight(lit(true)) { case ((k, bv), rest) =>
        (k < lit(bv)) || (k === lit(bv) && rest)
      }
    bounds.zipWithIndex.foldRight(lit(bounds.length)) { case ((b, i), els) =>
      when(leq(b), lit(i)).otherwise(els)
    }
  }

  private def rowOrdering(width: Int): Ordering[org.apache.spark.sql.Row] =
    new Ordering[org.apache.spark.sql.Row] {
      @SuppressWarnings(Array("unchecked"))
      def compare(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Int = {
        var i = 0
        while (i < width) {
          val av = a.get(i); val bv = b.get(i)
          val c =
            if (av == null && bv == null) 0
            else if (av == null) -1
            else if (bv == null) 1
            else (av, bv) match {
              case (x: Long, y: Long) => java.lang.Long.compare(x, y)
              case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
              case (x: Double, y: Double) => java.lang.Double.compare(x, y)
              case (x: String, y: String) => x.compareTo(y)
              case (x: Array[Byte], y: Array[Byte]) =>
                java.util.Arrays.compareUnsigned(x, y)
              case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
            }
          if (c != 0) return c
          i += 1
        }
        0
      }
    }
}
