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
  * same-order sample); correctness never depends on balance. Null key
  * values sort FIRST — both in the driver-side boundary sort and in the
  * generated leq chain — matching the asc-nulls-first ordering the
  * consuming operators' windows use, so placement stays monotone in
  * window order even for nullable keys. Driver-side string comparison
  * is over UTF-8 bytes (Spark's UTF8String binary order), and key types
  * outside the supported whitelist throw rather than silently falling
  * back to a stringified order that could disagree with SQL. */
object RangeBuckets {

  /** Driver-side boundary memo (round-10 verdict #4): repeated operator
    * calls over the SAME file-backed subtree (bench re-executions, q88
    * sessionizing inside its timed window) re-ran the boundary-sample
    * job every time. Boundaries affect BALANCE only — correctness needs
    * just that every expansion of one query agrees, and a memoized
    * constant trivially does — so serving a cached quantile estimate is
    * always safe, even if the underlying files changed. Keyed by the
    * canonicalized optimized plan + the leaf file paths (canonicalized
    * plans normalize expr ids but not file locations, so the paths pin
    * the data source); non-file-backed inputs (in-memory test frames)
    * skip the memo entirely. Bounded LRU. */
  private val memoCap = 64
  private val boundsMemo =
    new java.util.LinkedHashMap[String, Seq[Seq[Any]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[Seq[Any]]]): Boolean = size() > memoCap
    }

  /** Memo key, or None when any leaf is not a file relation. */
  private def memoKey(
      keyed: DataFrame, keys: Seq[Column], nBuckets: Int, samplePerBucket: Int): Option[String] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val plan = keyed.queryExecution.optimizedPlan
    val leaves = plan.collectLeaves()
    val paths = leaves.map {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation => Some(fs.location.rootPaths.mkString(","))
          case _ => None
        }
      case _ => None
    }
    if (paths.isEmpty || paths.exists(_.isEmpty)) None
    else Some(Seq(plan.canonicalized.toString, paths.flatten.mkString(";"),
      keys.map(_.toString).mkString(","), nBuckets, samplePerBucket).mkString("|"))
  }

  /** Bucket-id column over `keys` (lexicographic): 0 .. nBuckets-1.
    * Derives boundaries from one hash-sampled driver job on `df`
    * (memoized per plan+paths across calls). */
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
    val mk = memoKey(keyed, keys, nBuckets, samplePerBucket)
    mk.flatMap(k => boundsMemo.synchronized(Option(boundsMemo.get(k)))) match {
      case Some(bounds) => return boundsChain(keys, bounds)
      case None => ()
    }
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
    val hashed = keyed
      .filter(pmod(xxhash64(keyed.columns.map(col): _*), lit(modulus)) === 0)
      .limit(sampleTarget * 4)
      .collect()
    // The optimizer's sizeInBytes can overshoot wildly for post-filter /
    // post-join subtrees (default stats): the modulus then filters out
    // everything and an empty sample would silently degrade to ONE
    // bucket — a single global window task, exactly what this exists to
    // avoid. Retry once sampling every row (bounded by the same limit;
    // the limit's arbitrary row choice skews balance only, and the
    // boundaries are frozen to literals after this one driver job).
    val sample =
      if (hashed.nonEmpty || modulus == 1L) hashed
      else {
        org.slf4j.LoggerFactory
          .getLogger(getClass)
          .warn(
            s"RangeBuckets: empty boundary sample at modulus=$modulus " +
              s"(sizeInBytes estimate overshot); retrying with modulus=1")
        keyed.limit(sampleTarget * 4).collect()
      }
    if (sys.env.contains("GRAFT_DEBUG_BUCKETS"))
      println(f"[buckets] sample=${sample.length} modulus=$modulus took ${(System.nanoTime()-t0)/1e9}%.2f s")
    val width = keys.length
    val ord = rowOrdering(width)
    val sorted = sample.sortWith((a, b) => ord.compare(a, b) < 0)
    // nBuckets-1 equi-depth boundary tuples (deduplicated; ties would
    // produce empty buckets, which is harmless, but the chain shrinks)
    val bounds =
      if (sorted.isEmpty) Seq.empty[Seq[Any]]
      else (1 until nBuckets)
        .map(i => sorted(((i.toLong * sorted.length) / nBuckets).toInt.min(sorted.length - 1)))
        .map(r => (0 until width).map(r.get))
        .distinct
    mk.foreach(k => boundsMemo.synchronized(boundsMemo.put(k, bounds)))
    boundsChain(keys, bounds)
  }

  /** Perf-only persist for pid-tagged prefix-scan frames. With
    * pure-function pids, correctness NEVER needs the cache — it only
    * saves recomputing the tagged subtree for each consumer. Disabled
    * via GRAFT_PREFIX_PERSIST=0 (the BASELINE.md A/B switch; at cluster
    * scale an input-sized cache may cost more than the extra scan).
    *
    * The cache SELF-UNPERSISTS: a QueryExecutionListener watches for the
    * first completed action whose analyzed plan contains this subtree
    * (the operator composes everything into ONE final action, so by then
    * every consumer expansion has read the cache) and drops it. Callers
    * need no clearCache() hygiene; an external clearCache() is also
    * detected (storageLevel == NONE) and just retires the listener. The
    * unpersist is non-blocking and perf-only — a caller running a SECOND
    * action on the operator output recomputes the subtree, correctly. */
  private[operators] def maybePersist(df: DataFrame): DataFrame =
    if (sys.env.get("GRAFT_PREFIX_PERSIST").contains("0")) df
    else {
      import org.apache.spark.sql.execution.QueryExecution
      import org.apache.spark.sql.util.QueryExecutionListener
      import org.apache.spark.storage.StorageLevel
      val p = df.persist()
      val target = p.queryExecution.analyzed
      val spark = p.sparkSession
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val listener = new QueryExecutionListener {
        private def retire(unpersist: Boolean): Unit =
          if (done.compareAndSet(false, true)) {
            if (unpersist) {
              try p.unpersist(blocking = false) catch { case _: Throwable => () }
            }
            spark.listenerManager.unregister(this)
          }
        private def check(qe: QueryExecution): Unit = {
          val gone =
            try p.storageLevel == StorageLevel.NONE
            catch { case _: Throwable => true }
          if (gone) retire(unpersist = false) // external clearCache beat us
          else {
            val hit =
              try qe.analyzed.exists(_.sameResult(target))
              catch { case _: Throwable => false }
            if (hit) retire(unpersist = true)
          }
        }
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          check(qe)
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
          check(qe)
      }
      spark.listenerManager.register(listener)
      p
    }

  /** The generated id expression: first boundary b with (row <= b)
    * decides the bucket; rows past every boundary land in the last
    * bucket. Nulls-first semantics (matching the consumers'
    * asc-nulls-first windows): a null key is LESS than any non-null
    * boundary value and EQUAL to a null one — three-valued `<` alone
    * would let null keys fall through to the last bucket while sorting
    * at the front of the window order. */
  private def boundsChain(keys: Seq[Column], bounds: Seq[Seq[Any]]): Column = {
    def leq(b: Seq[Any]): Column =
      keys.zip(b).foldRight(lit(true)) { case ((k, bv), rest) =>
        if (bv == null) k.isNull && rest
        else k.isNull || (k < lit(bv)) || (coalesce(k === lit(bv), lit(false)) && rest)
      }
    bounds.zipWithIndex.foldRight(lit(bounds.length)) { case ((b, i), els) =>
      when(leq(b), lit(i)).otherwise(els)
    }
  }

  /** Driver-side ordering for boundary sorting. MUST agree with the
    * SQL-side `<`/`===` chain for every supported key type, or bucket
    * ids go non-monotone in key order and the prefix-scan carries
    * silently corrupt. Strings compare as UTF-8 bytes (Spark's
    * UTF8String binary order — Java String.compareTo is UTF-16
    * code-unit order and DISAGREES for supplementary-plane and some
    * BMP characters). Unsupported types throw rather than falling back
    * to a stringified order that could disagree with SQL. */
  private def rowOrdering(width: Int): Ordering[org.apache.spark.sql.Row] =
    new Ordering[org.apache.spark.sql.Row] {
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
              case (x: Short, y: Short) => java.lang.Short.compare(x, y)
              case (x: Byte, y: Byte) => java.lang.Byte.compare(x, y)
              case (x: Double, y: Double) => java.lang.Double.compare(x, y)
              case (x: Float, y: Float) => java.lang.Float.compare(x, y)
              case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
              case (x: String, y: String) =>
                java.util.Arrays.compareUnsigned(
                  x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                  y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              case (x: Array[Byte], y: Array[Byte]) =>
                java.util.Arrays.compareUnsigned(x, y)
              case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
              case (x: java.time.Instant, y: java.time.Instant) => x.compareTo(y)
              case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
              case (x: java.time.LocalDate, y: java.time.LocalDate) => x.compareTo(y)
              case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
              case (x: BigDecimal, y: BigDecimal) => x.compare(y)
              case (x, y) =>
                throw new IllegalArgumentException(
                  s"RangeBuckets: unsupported key type ${x.getClass.getName} / " +
                    s"${y.getClass.getName} — add it here with semantics matching " +
                    "Spark's SQL ordering, or cast the key column")
            }
          if (c != 0) return c
          i += 1
        }
        0
      }
    }
}
