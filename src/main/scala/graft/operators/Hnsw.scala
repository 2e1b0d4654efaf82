package graft.operators

import scala.collection.mutable.ArrayBuffer

/** In-memory HNSW graph (Malkov & Yashunin, "Efficient and robust
  * approximate nearest neighbor search using Hierarchical Navigable Small
  * World graphs", 2016) — the serving-side centroid selector for large
  * centroid sets.
  *
  * The reference builds an HNSW over each segment's centroids and serves
  * stage-1 centroid selection from it in RAM
  * (rs/index/src/hnsw/builder.rs:48 insert/layer machinery,
  * rs/index/src/hnsw/block_based/index.rs:159-288 traversal;
  * centroids_ef_construction 100, centroids_max_layers 2-10 at
  * rs/config/src/collection.rs:176-218). This repo's default stays the
  * exact centroid scan (SURVEY §2.5 K1: exact beats approximate at the
  * ~sqrt(N) centroid counts a segment carries), so the HNSW is OPT-IN via
  * [[ServedIvfIndex.build]](centroidIndex = "hnsw") for deployments whose
  * centroid sets outgrow the scan (≥~1M centroids).
  *
  * Spark posture: this is a serving-process structure over an
  * already-bounded set (like the reference, which never distributes HNSW
  * construction); the distributed engine's stage 1 remains a broadcast
  * exact scan. Determinism: node levels derive from a hash of the node id
  * (not RNG state), all comparisons tiebreak on id, and insertion order is
  * the caller's array order — the same input always builds the same graph.
  */
final class Hnsw private (
    dim: Int,
    ids: Array[Long],
    flat: Array[Double], // n x dim row-major
    layers: Array[Array[Array[Int]]], // layers(node)(level) = neighbor nodes
    entryNode: Int,
    topLevel: Int) {

  def size: Int = ids.length

  private def dist2(q: Array[Double], node: Int): Double = {
    var acc = 0.0
    var i = 0
    val off = node * dim
    val n = math.min(dim, q.length)
    while (i < n) { val d = q(i) - flat(off + i); acc += d * d; i += 1 }
    acc
  }

  /** (dist, id) ascending with NaN greatest — the engine-wide invariant. */
  private def lt(d1: Double, i1: Int, d2: Double, i2: Int): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c < 0 || (c == 0 && ids(i1) < ids(i2))
  }

  /** Greedy best-first beam in one layer from `eps`; returns up to `ef`
    * nodes as parallel (dist, node) arrays sorted (dist asc, id asc). */
  private def searchLayer(
      q: Array[Double], eps: Array[Int], ef: Int, level: Int,
      visited: java.util.BitSet): (Array[Double], Array[Int]) = {
    // results: bounded sorted insertion (ef is small); candidates: heap
    val resD = new ArrayBuffer[Double](ef + 1)
    val resN = new ArrayBuffer[Int](ef + 1)
    def resInsert(d: Double, node: Int): Unit = {
      var lo = 0
      var hi = resD.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(resD(mid), resN(mid), d, node)) lo = mid + 1 else hi = mid
      }
      resD.insert(lo, d)
      resN.insert(lo, node)
      if (resD.length > ef) { resD.remove(ef); resN.remove(ef) }
    }
    val candOrd = new Ordering[(Double, Int)] {
      def compare(a: (Double, Int), b: (Double, Int)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // reversed: min-heap
        if (c != 0) c else java.lang.Long.compare(ids(b._2), ids(a._2))
      }
    }
    val cand = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(candOrd)
    eps.foreach { e =>
      if (!visited.get(e)) {
        visited.set(e)
        val d = dist2(q, e)
        resInsert(d, e)
        cand.enqueue((d, e))
      }
    }
    while (cand.nonEmpty) {
      val (cd, cn) = cand.dequeue()
      // stop when the closest open candidate is farther than the worst kept
      if (resD.length >= ef && !lt(cd, cn, resD(resD.length - 1), resN(resN.length - 1))) {
        cand.clear()
      } else {
        val nbrs = layers(cn)(level)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          if (!visited.get(nb)) {
            visited.set(nb)
            val d = dist2(q, nb)
            if (resD.length < ef || lt(d, nb, resD(resD.length - 1), resN(resN.length - 1))) {
              resInsert(d, nb)
              cand.enqueue((d, nb))
            }
          }
          i += 1
        }
      }
    }
    (resD.toArray, resN.toArray)
  }

  /** Descend the upper layers greedily, then beam layer 0 with
    * `max(ef, k)`; returns node indexes ordered (dist asc, id asc). */
  private[operators] def searchNodes(q: Array[Double], k: Int, ef: Int): Array[Int] = {
    if (ids.isEmpty || k <= 0) return Array.empty
    val visited = new java.util.BitSet(ids.length)
    var eps = Array(entryNode)
    var lc = topLevel
    while (lc > 0) {
      val (_, n) = searchLayer(q, eps, 1, lc, visited)
      if (n.nonEmpty) eps = Array(n(0))
      visited.clear()
      lc -= 1
    }
    val (_, nodes) = searchLayer(q, eps, math.max(ef, k), 0, visited)
    nodes.take(k)
  }

  /** Top-k by (l2 distance asc, id asc). Approximate: recall is governed
    * by `ef` (the reference's ef_construction/ef_search knob). */
  def search(q: Array[Double], k: Int, ef: Int = 100): Array[(Long, Double)] =
    searchNodes(q, k, ef).map(n => (ids(n), math.sqrt(dist2(q, n))))

  /** Serialize the graph TOPOLOGY (ids, per-level adjacency, entry point)
    * — not the vectors, which live in the centroids parquet alongside;
    * the loader re-marries them ([[Hnsw.readGraph]]). Mirrors the
    * reference's on-disk HNSW (rs/index/src/hnsw/writer.rs writes edges +
    * entry point next to the vector storage; the block-based reader
    * rs/index/src/hnsw/block_based/index.rs:159-211 mmaps it back) so a
    * serving restart loads in seconds instead of re-running the build. */
  def writeGraph(out: java.io.DataOutputStream): Unit = {
    out.writeInt(Hnsw.Magic)
    out.writeInt(1) // version
    out.writeInt(ids.length)
    out.writeInt(dim)
    out.writeInt(entryNode)
    out.writeInt(topLevel)
    var i = 0
    while (i < ids.length) { out.writeLong(ids(i)); i += 1 }
    i = 0
    while (i < ids.length) {
      val lvls = layers(i)
      out.writeInt(lvls.length)
      var l = 0
      while (l < lvls.length) {
        val nbrs = lvls(l)
        out.writeInt(nbrs.length)
        var j = 0
        while (j < nbrs.length) { out.writeInt(nbrs(j)); j += 1 }
        l += 1
      }
      i += 1
    }
    out.writeInt(Hnsw.Magic) // trailer: truncation check
  }
}

object Hnsw {

  private[operators] val Magic = 0x47484e53 // "GHNS"

  /** Fixed bulk-build batch size: a CONSTANT, deliberately not derived
    * from the worker count, so the graph is a pure function of the input
    * (ids, vecs, m, efConstruction, seed) — the same persisted collection
    * yields the same graph (and the same partial-probe answers) on a
    * 4-core laptop and a 128-core server. Parallelism only controls how
    * many of a batch's candidate searches run at once. */
  private val BulkBatchSize = 256

  /** Rebuild a graph from [[Hnsw#writeGraph]] output plus the vectors it
    * was built over (from the centroids parquet, in the SAME order —
    * validated against the stored ids). Returns None on a
    * missing/truncated/mismatched file so callers fall back to a fresh
    * build rather than serve a wrong graph. */
  def readGraph(
      in: java.io.DataInputStream,
      ids: Array[Long],
      vecs: Array[Array[Double]]): Option[Hnsw] = {
    try {
      if (in.readInt() != Magic || in.readInt() != 1) return None
      val n = in.readInt()
      val dim = in.readInt()
      val entry = in.readInt()
      val top = in.readInt()
      if (n != ids.length) return None
      // reject out-of-range entry/top (a file passing the magic checks
      // but with a bad entry index must fall back to rebuild, not crash
      // search) and any vector whose dimension disagrees with the file
      // (zero-padding would silently yield wrong distances)
      if (n > 0 && (entry < 0 || entry >= n)) return None
      if (top < 0 || top > 64) return None
      var v = 0
      while (v < n) {
        if (vecs(v).length != dim) return None
        v += 1
      }
      var i = 0
      while (i < n) {
        if (in.readLong() != ids(i)) return None
        i += 1
      }
      val layers = new Array[Array[Array[Int]]](n)
      i = 0
      while (i < n) {
        val nLvls = in.readInt()
        if (nLvls < 0 || nLvls > 64) return None
        val lvls = new Array[Array[Int]](nLvls)
        var l = 0
        while (l < nLvls) {
          val len = in.readInt()
          if (len < 0 || len > n) return None
          val nbrs = new Array[Int](len)
          var j = 0
          while (j < len) {
            val nb = in.readInt()
            if (nb < 0 || nb >= n) return None
            nbrs(j) = nb
            j += 1
          }
          lvls(l) = nbrs
          l += 1
        }
        layers(i) = lvls
        i += 1
      }
      if (in.readInt() != Magic) return None
      if (n > 0 && top >= layers(entry).length) return None
      // cross-node level validation: searchLayer reads layers(nb)(level)
      // for every neighbor it visits at that level, so a neighbor listed
      // at level l must itself have a level-l adjacency list — a corrupt
      // file violating that must fall back to rebuild, not crash search
      i = 0
      while (i < n) {
        var l = 0
        while (l < layers(i).length) {
          val nbrs = layers(i)(l)
          var j = 0
          while (j < nbrs.length) {
            if (layers(nbrs(j)).length <= l) return None
            j += 1
          }
          l += 1
        }
        i += 1
      }
      val flat = new Array[Double](n * dim)
      i = 0
      while (i < n) {
        System.arraycopy(vecs(i), 0, flat, i * dim, dim)
        i += 1
      }
      Some(new Hnsw(dim, ids, flat, layers, entry, top))
    } catch {
      case _: java.io.IOException => None
    }
  }

  /** Persist a graph next to its segment's centroids parquet. The temp
    * file is unique per call (two concurrent serve-time fallback builds
    * on the same segment must not interleave writes into one temp path
    * — the loser's move would throw and a corrupt interleaving could be
    * atomically published); last atomic move wins, and both writers
    * produce the identical deterministic graph anyway. */
  def save(path: String, g: Hnsw): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val dir = if (p.getParent != null) p.getParent else java.nio.file.Paths.get(".")
    val tmp = java.nio.file.Files.createTempFile(dir, s".tmp_${p.getFileName}", "")
    try {
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(tmp), 1 << 20))
      try g.writeGraph(out) finally out.close()
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** Load a persisted graph; None if absent or stale (id mismatch). */
  def load(path: String, ids: Array[Long], vecs: Array[Array[Double]]): Option[Hnsw] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(java.nio.file.Files.newInputStream(p), 1 << 20))
      try readGraph(in, ids, vecs) finally in.close()
    }
  }

  /** Build the graph over `(ids, vecs)` pairs. `m` is the per-node degree
    * target (2m at layer 0); `efConstruction` the build beam width —
    * defaults match the reference's centroid config
    * (rs/config/src/collection.rs:176-218). Deterministic for a fixed
    * input order.
    *
    * `parallelism > 1` switches to a batch-synchronous bulk build: after a
    * sequential warm-up prefix, nodes insert in fixed-size batches — each
    * batch's candidate searches run CONCURRENTLY against the frozen
    * graph-so-far, then links apply sequentially in index order. Unlike
    * lock-based concurrent insertion (hnswlib), the result is fully
    * deterministic (searches read an immutable snapshot; application
    * order is the input order), at the cost that same-batch near
    * neighbors don't link within their own batch — recall impact is
    * bounded by the batch size and covered by HnswSpec's recall gate. */
  def build(
      ids: Array[Long],
      vecs: Array[Array[Double]],
      m: Int = 16,
      efConstruction: Int = 100,
      maxLayers: Int = 10,
      seed: Long = 42L,
      parallelism: Int = 1): Hnsw = {
    require(ids.length == vecs.length, "ids/vecs length mismatch")
    val n = ids.length
    val dim = if (n == 0) 0 else vecs(0).length
    val flat = new Array[Double](n * dim)
    var i = 0
    while (i < n) {
      // reject ragged input instead of zero-padding: a padded vector
      // silently skews every distance AND readGraph refuses to load the
      // persisted graph against it (dim check), forcing a rebuild on
      // every restart
      require(vecs(i).length == dim,
        s"ragged vectors: vecs($i).length=${vecs(i).length}, expected $dim")
      System.arraycopy(vecs(i), 0, flat, i * dim, dim)
      i += 1
    }
    // level ~ floor(-ln(u) * 1/ln(m)), u hashed from the id: the paper's
    // exponential level distribution without RNG state (rebuild-stable)
    val mL = 1.0 / math.log(m)
    val levels = Array.tabulate(n) { j =>
      val h = graft.functions.HashKernels.mix64(seed ^ ids(j) * 0x9e3779b97f4a7c15L)
      val u = ((h >>> 11) + 1).toDouble / (1L << 53).toDouble // (0, 1]
      math.min(maxLayers - 1, (-math.log(u) * mL).toInt)
    }
    val adj: Array[Array[ArrayBuffer[Int]]] =
      Array.tabulate(n)(j => Array.fill(levels(j) + 1)(new ArrayBuffer[Int]))

    def dist2(a: Int, b: Int): Double = {
      var acc = 0.0
      var d = 0
      val oa = a * dim
      val ob = b * dim
      while (d < dim) { val x = flat(oa + d) - flat(ob + d); acc += x * x; d += 1 }
      acc
    }
    def lt(d1: Double, i1: Int, d2: Double, i2: Int): Boolean = {
      val c = java.lang.Double.compare(d1, d2)
      c < 0 || (c == 0 && ids(i1) < ids(i2))
    }
    // build-time beam over the mutable adjacency
    def searchLayer(q: Int, eps: Array[Int], ef: Int, level: Int): (Array[Double], Array[Int]) = {
      val visited = new java.util.BitSet(n)
      val resD = new ArrayBuffer[Double](ef + 1)
      val resN = new ArrayBuffer[Int](ef + 1)
      def resInsert(d: Double, node: Int): Unit = {
        var lo = 0
        var hi = resD.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (lt(resD(mid), resN(mid), d, node)) lo = mid + 1 else hi = mid
        }
        resD.insert(lo, d)
        resN.insert(lo, node)
        if (resD.length > ef) { resD.remove(ef); resN.remove(ef) }
      }
      val candOrd = new Ordering[(Double, Int)] {
        def compare(a: (Double, Int), b: (Double, Int)): Int = {
          val c = java.lang.Double.compare(b._1, a._1)
          if (c != 0) c else java.lang.Long.compare(ids(b._2), ids(a._2))
        }
      }
      val cand = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(candOrd)
      eps.foreach { e =>
        if (!visited.get(e)) {
          visited.set(e)
          val d = dist2(q, e)
          resInsert(d, e)
          cand.enqueue((d, e))
        }
      }
      while (cand.nonEmpty) {
        val (cd, cn) = cand.dequeue()
        if (resD.length >= ef && !lt(cd, cn, resD(resD.length - 1), resN(resN.length - 1))) {
          cand.clear()
        } else {
          val nbrs = adj(cn)(level)
          var j = 0
          while (j < nbrs.length) {
            val nb = nbrs(j)
            if (!visited.get(nb)) {
              visited.set(nb)
              val d = dist2(q, nb)
              if (resD.length < ef || lt(d, nb, resD(resD.length - 1), resN(resN.length - 1))) {
                resInsert(d, nb)
                cand.enqueue((d, nb))
              }
            }
            j += 1
          }
        }
      }
      (resD.toArray, resN.toArray)
    }
    // Algorithm 4 (paper) / the reference's diverse neighbor selection:
    // walk candidates by ascending distance to q, keep one only if it is
    // closer to q than to every already-kept neighbor — naive closest-M
    // turns dense regions into closed cliques that disconnect from the
    // rest of the layer (observed: the first ~cap nodes of a cluster
    // became unreachable). Pruned candidates refill spare slots
    // (hnswlib's keepPrunedConnections) so degree never starves.
    def selectDiverse(q: Int, candD: Array[Double], candN: Array[Int], m0: Int): Array[Int] = {
      val sel = new ArrayBuffer[Int](m0)
      val pruned = new ArrayBuffer[Int]()
      var i2 = 0
      while (i2 < candN.length && sel.length < m0) {
        val c = candN(i2)
        val dq = candD(i2)
        var ok = true
        var j = 0
        while (ok && j < sel.length) {
          if (dist2(c, sel(j)) < dq) ok = false
          j += 1
        }
        if (ok) sel += c else pruned += c
        i2 += 1
      }
      var pi = 0
      while (sel.length < m0 && pi < pruned.length) { sel += pruned(pi); pi += 1 }
      sel.toArray
    }
    // keep a neighbor list at its degree cap, diversity-first
    def shrink(node: Int, level: Int, cap: Int): Unit = {
      val lst = adj(node)(level)
      if (lst.length <= cap) return
      val arr = lst.toArray.distinct
      val ds = arr.map(a => dist2(node, a))
      val idx = arr.indices.sortWith((x, y) => lt(ds(x), arr(x), ds(y), arr(y))).toArray
      val kept = selectDiverse(node, idx.map(ds(_)), idx.map(arr(_)), cap)
      lst.clear()
      lst ++= kept
    }

    var entry = 0
    var top = if (n > 0) levels(0) else 0

    // Candidate half of one insert, against the graph-so-far: greedy
    // upper-layer descent from (entry0, top0), an efConstruction beam per
    // level <= levels(i), then the diversity selection (pure distance
    // math over the beam — no adjacency reads). Pure reader — safe to
    // run concurrently between mutations.
    def candidates(i: Int, entry0: Int, top0: Int): Array[Array[Int]] = {
      val l = levels(i)
      var eps = Array(entry0)
      var lc = top0
      while (lc > l) {
        val (_, nodes) = searchLayer(i, eps, 1, lc)
        if (nodes.nonEmpty) eps = Array(nodes(0))
        lc -= 1
      }
      val lo = math.min(l, top0)
      val out = new Array[Array[Int]](lo + 1)
      lc = lo
      while (lc >= 0) {
        val (dists, nodes) = searchLayer(i, eps, efConstruction, lc)
        out(lc) = selectDiverse(i, dists, nodes, m)
        eps = nodes
        lc -= 1
      }
      out
    }
    // Mutation half of one insert: add bidirectional links to the
    // selected neighbors, cap degrees, track the entry point.
    def applyLinks(i: Int, nbrsPerLevel: Array[Array[Int]]): Unit = {
      var lc = nbrsPerLevel.length - 1
      while (lc >= 0) {
        val cap = if (lc == 0) 2 * m else m
        nbrsPerLevel(lc).foreach { nb =>
          adj(i)(lc) += nb
          adj(nb)(lc) += i
          shrink(nb, lc, cap)
        }
        lc -= 1
      }
      if (levels(i) > top) { entry = i; top = levels(i) }
    }

    if (parallelism <= 1) {
      i = 1
      while (i < n) { applyLinks(i, candidates(i, entry, top)); i += 1 }
    } else {
      // Batch-synchronous bulk build: a sequential warm-up prefix seeds a
      // navigable graph, then each batch's candidate searches fan out on
      // the pool against the frozen adjacency and links apply in index
      // order — deterministic by construction, and PARALLELISM-INVARIANT:
      // the batch size is a constant, so the graph does not depend on the
      // host's core count (HnswSpec asserts p=2 == p=8).
      val batchSize = BulkBatchSize
      val warm = math.min(n, math.max(batchSize, 1024))
      i = 1
      while (i < warm) { applyLinks(i, candidates(i, entry, top)); i += 1 }
      val pool = new java.util.concurrent.ForkJoinPool(parallelism)
      try {
        // Shrinks are DEFERRED to one batch-end parallel pass: lists grow
        // past cap while the batch's links apply, then every over-cap
        // (node, level) list shrinks concurrently — each shrink reads and
        // writes only its own list, so the result is independent of task
        // order. Deferral also means the diversity selection sees the
        // whole batch's reverse links at once instead of re-running per
        // link — fewer, better-informed shrinks.
        val dirty = new java.util.LinkedHashSet[(Int, Int)]()
        var start = warm
        while (start < n) {
          val end = math.min(n, start + batchSize)
          val e0 = entry
          val t0 = top
          val res = new Array[Array[Array[Int]]](end - start)
          val tasks = new java.util.ArrayList[java.util.concurrent.Callable[Unit]](end - start)
          var j = start
          while (j < end) {
            val jj = j
            tasks.add(() => { res(jj - start) = candidates(jj, e0, t0) })
            j += 1
          }
          pool.invokeAll(tasks).forEach(_.get()) // surface worker exceptions
          j = start
          while (j < end) {
            val nbrsPerLevel = res(j - start)
            var lc = nbrsPerLevel.length - 1
            while (lc >= 0) {
              val cap = if (lc == 0) 2 * m else m
              nbrsPerLevel(lc).foreach { nb =>
                adj(j)(lc) += nb
                adj(nb)(lc) += j
                if (adj(nb)(lc).length > cap) dirty.add((nb, lc))
              }
              lc -= 1
            }
            if (levels(j) > top) { entry = j; top = levels(j) }
            j += 1
          }
          if (!dirty.isEmpty) {
            val st = new java.util.ArrayList[java.util.concurrent.Callable[Unit]](dirty.size)
            dirty.forEach { case (node, lc) =>
              st.add(() => shrink(node, lc, if (lc == 0) 2 * m else m))
            }
            pool.invokeAll(st).forEach(_.get())
            dirty.clear()
          }
          start = end
        }
      } finally pool.shutdown()
    }
    val frozen: Array[Array[Array[Int]]] =
      Array.tabulate(n)(j => adj(j).map(_.toArray))
    new Hnsw(dim, ids, flat, frozen, entry, top)
  }
}
