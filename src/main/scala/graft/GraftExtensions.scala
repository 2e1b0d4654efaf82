package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

object GraftExtensions {
  /** Bounded memo for `graft_ann` results, keyed on (base, name, the
    * collection's [[graft.core.Collection.stateFingerprint]], query, k,
    * nprobe) — the same key discipline as the served-view cache. The TVF
    * executes at ANALYSIS time (see the injection-site rationale), so
    * EXPLAIN, schema-only resolution, and a twice-referenced CTE each
    * re-resolve it; with the memo, every re-resolution of an identical
    * call on an unchanged collection is a driver-local map hit — zero
    * Spark jobs (the fingerprint itself is TOC + file-listing reads).
    * Any flush/delete/merge changes the fingerprint and misses. Values
    * are the collected top-k rows (≤ k by construction — small); the
    * access-ordered map evicts past 64 entries.
    *
    * The memo is bounded by ROWS AND BYTES per entry, not just entry
    * count (round-14 verdict #3): `graft_term_search(..., limit)` takes a
    * caller-controlled limit, so 64 memoized limit=1M results would be
    * driver-heap-sized. A result past either cap executes normally but is
    * NOT cached — the execution contract is unchanged, the repeat-call
    * cost is the same as before memoization existed. */
  private val memoMax = 64
  private[graft] val memoMaxRows = 10000
  private[graft] val memoMaxBytes = 4L << 20 // 4 MiB of UnsafeRow payload per entry
  private type MemoVal =
    (Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      IndexedSeq[org.apache.spark.sql.catalyst.InternalRow])
  private val memo =
    new java.util.LinkedHashMap[String, MemoVal](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, MemoVal]): Boolean = size() > memoMax
    }
  private def memoGet(k: String): Option[MemoVal] =
    memo.synchronized(Option(memo.get(k)))
  private def memoPut(k: String, v: MemoVal): Unit =
    memo.synchronized { memo.put(k, v); () }
  /** Test hooks: misses counts actual search executions. */
  private[graft] val memoMisses = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def clearMemo(): Unit = memo.synchronized(memo.clear())

  /** The shared TVF execution contract (graft_ann AND graft_term_search):
    * memo lookup on (args, stateFingerprint), else execute the
    * distributed query UNDER THE SNAPSHOT'S PIN and collect its (small by
    * construction) result; plan as a LocalRelation with FRESH exprIds per
    * resolution so the same call referenced twice in one query never
    * aliases attributes. One definition so the pin/memo/aliasing
    * discipline can never diverge between the two functions. */
  private[graft] def memoizedRelation(coll: graft.core.Collection, memoKey: String)(
      run: graft.core.Snapshot => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LocalRelation = {
    val (attrs, rows) = memoGet(memoKey).getOrElse {
      memoMisses.incrementAndGet()
      val snap = coll.snapshot() // pin the version across the execution
      val v = try {
        val df = run(snap)
        (df.queryExecution.analyzed.output.map(_.toAttribute),
          df.queryExecution.executedPlan.executeCollect().toIndexedSeq)
      } finally java.lang.ref.Reference.reachabilityFence(snap)
      // cache only row/byte-bounded results — a huge limit executes fine
      // but must not pin driver heap through the memo
      val bytes = v._2.iterator.map {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          u.getSizeInBytes.toLong
        case _ => 256L // non-unsafe rows: conservative estimate
      }.sum
      if (v._2.length <= memoMaxRows && bytes <= memoMaxBytes) memoPut(memoKey, v)
      v
    }
    org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
      attrs.map(_.newInstance()), rows)
  }
}

/** SparkSessionExtensions entry point: injects the engine's SQL functions
  * at session build time — the idiomatic deployment hook
  * (`spark.sql.extensions=graft.GraftExtensions`), so pure-SQL users get
  * the kernel surface without touching the Scala API.
  *
  * No custom rules/strategies are injected: SURVEY §4 — the DataFrame
  * slice needs zero custom Catalyst rules; every reference optimization is
  * either a built-in (pushdown, IN-dedup, empty-relation propagation,
  * top-k) or plain DataFrame logic (centroid ratio pruning). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("l2_distance", "l2_distance(a, b) - Euclidean distance of two double arrays") {
      es => L2Distance(es(0), es(1))
    }
    inject("l2_distance_squared", "l2_distance_squared(a, b) - squared L2") {
      es => L2DistanceSquared(es(0), es(1))
    }
    inject("dot_product", "dot_product(a, b) - inner product") {
      es => DotProduct(es(0), es(1))
    }
    inject("cosine_similarity", "cosine_similarity(a, b) - cosine similarity") {
      es => CosineSimilarity(es(0), es(1))
    }
    inject("simhash64", "simhash64(hashes) - 64-bit SimHash of an array<long>") {
      es => SimHash64(es(0))
    }
    inject("rolling_hash", "rolling_hash(str) - polynomial content fingerprint") {
      es => RollingHash(es(0))
    }
    inject("unpack_f32_le", "unpack_f32_le(bin) - decode packed little-endian f32s") {
      es => UnpackF32Le(es(0))
    }
    inject("pack_f32_le", "pack_f32_le(arr) - encode array<float> as packed little-endian f32s") {
      es => PackF32Le(es(0))
    }
    inject("shingle_hashes",
      "shingle_hashes(tokens, n) - 64-bit hashes of word n-gram shingles") {
      es => ShingleHashes(es(0), es(1).eval().asInstanceOf[Number].intValue())
    }
    inject("window_hashes",
      "window_hashes(tokens, L) - positioned rolling hashes of every L-token window") {
      es => WindowHashes(es(0), es(1).eval().asInstanceOf[Number].intValue())
    }

    // SQL table-valued ANN search (SURVEY §4's one optional custom-Catalyst
    // item): `SELECT * FROM graft_ann('<base>', '<name>', array(<q...>),
    // <k>[, <nprobe>])` — a pure-SQL round trip of the §7.3 minimum slice.
    // Two deliberate choices (both from the round-13 review):
    //   - the collection opens from its PERSISTED config
    //     (Collection.openPersisted), so a PQ/RaBitQ/SQ8 collection serves
    //     SQL users through the same quantizer path as the Scala surface —
    //     a guessed default config would silently diverge the two;
    //   - the distributed search EXECUTES here, under the snapshot's pin,
    //     and the top-k result (≤ k rows by construction) returns as a
    //     LocalRelation. Returning the lazy plan instead would drop the
    //     pin at analysis end, letting a concurrent expireVersions delete
    //     segment files before the user executes the DataFrame — the
    //     read-during-expiry race the pin registry exists to prevent. The
    //     arguments are literals (the TVF contract), so there is no late
    //     binding to preserve.
    ext.injectTableFunction((FunctionIdentifier("graft_ann"),
      info("graft_ann",
        "graft_ann(base, name, query, k[, nprobe]) - ANN search over a graft " +
          "collection. CONTRACT: the distributed search executes at ANALYSIS " +
          "time (under the collection's snapshot pin) and plans as a literal " +
          "top-k relation — EXPLAIN performs the search, and each re-analysis " +
          "of a view/CTE referencing the call re-resolves it. Repeated " +
          "identical calls on an unchanged collection are served from a " +
          "bounded driver memo (zero Spark jobs); any flush/delete/merge " +
          "invalidates it."),
      { (es: Seq[Expression]) =>
        require(es.length == 4 || es.length == 5,
          "graft_ann(base, name, query, k[, nprobe])")
        def str(e: Expression): String = e.eval() match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case other => String.valueOf(other)
        }
        def int(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
        val base = str(es(0)); val name = str(es(1))
        val q: Seq[Double] = es(2).eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toDoubleArray().toSeq
          case other => sys.error(s"graft_ann: query must be array<double>, got $other")
        }
        val k = int(es(3))
        val nprobe = if (es.length == 5) Some(int(es(4))) else None
        val spark = org.apache.spark.sql.SparkSession.active
        val coll = graft.core.Collection.openPersisted(spark, base, name)
        // Memo on (args, state): EXPLAIN / re-resolved CTEs / repeated
        // identical queries cost one driver map hit instead of a full
        // re-search (round-13 verdict #6). The fingerprint read is
        // driver-only (TOC + listings) — no Spark jobs on a hit.
        GraftExtensions.memoizedRelation(coll,
          s"$base|$name|${coll.stateFingerprint()}|${q.mkString(",")}|$k|$nprobe")(
          _.search(q, graft.operators.SearchParams(topK = k,
            numExploredCentroids = nprobe)))
      }))

    // SQL table-valued term search: `SELECT * FROM graft_term_search(
    // '<base>', '<name>', '<filter-json>'[, <limit>])` — the same filter
    // JSON the HTTP surface accepts (FilterJson: proto DocumentFilter
    // shapes + the beyond-proto phrase/near positional extensions), so
    // SQL users get the full attribute-filter surface including phrase
    // and proximity queries. Same execution contract + memo discipline
    // as graft_ann above (analysis-time execution under the snapshot
    // pin; bounded driver memo keyed on args + stateFingerprint).
    ext.injectTableFunction((FunctionIdentifier("graft_term_search"),
      info("graft_term_search",
        "graft_term_search(base, name, filterJson[, limit]) - attribute/term " +
          "search over a graft collection; filterJson is the HTTP surface's " +
          "DocumentFilter JSON (and/or/contains/not_contains/ids/phrase/near). " +
          "CONTRACT: executes at ANALYSIS time under the snapshot pin and " +
          "plans as a literal relation (graft_ann's contract); repeated " +
          "identical calls on an unchanged collection hit a bounded driver " +
          "memo."),
      { (es: Seq[Expression]) =>
        require(es.length == 3 || es.length == 4,
          "graft_term_search(base, name, filterJson[, limit])")
        def str(e: Expression): String = e.eval() match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case other => String.valueOf(other)
        }
        val base = str(es(0)); val name = str(es(1))
        val filterJson = str(es(2))
        val limit =
          if (es.length == 4) es(3).eval().asInstanceOf[Number].intValue() else 100
        val filter = graft.api.FilterJson.parse(
          graft.api.Json.parse(filterJson))
        val spark = org.apache.spark.sql.SparkSession.active
        val coll = graft.core.Collection.openPersisted(spark, base, name)
        GraftExtensions.memoizedRelation(coll,
          s"ts|$base|$name|${coll.stateFingerprint()}|$filterJson|$limit")(
          _.termSearch(filter, limit))
      }))
  }
}
