package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextPipeline}

/** End-to-end curation pipeline: the operators composed the way a real
  * training-data job chains them — quality filter → exact dedup →
  * near-dup collapse → token budget → sequence packing — with planted
  * junk, exact copies, and near-copies verified to fall out at the right
  * stage. Each stage's output feeds the next as a DataFrame (one logical
  * plan family, no materialization between stages required). */
class PipelineE2ESpec extends SparkSuite {
  import spark.implicits._

  test("quality -> exact dedup -> near-dup collapse -> budget -> pack") {
    // per-doc disjoint vocabulary so the only near-dup pair is the planted one
    def fluent(seed: Int): String =
      (0 until 25).map(i => s"word${seed}q${i}x").mkString(" ")
    val docs = (
      (0 until 20).map(i => (i.toLong, fluent(i))) ++            // normal corpus
        Seq((100L, fluent(0)),                                   // exact dup of 0
          (101L, " " + fluent(0).toUpperCase + " ")) ++          // normalized dup of 0
        Seq((110L, fluent(1).replaceFirst("x ", "x CHANGED "))) ++ // near-dup of 1
        Seq((120L, "too short"),                                 // junk: word count
          (121L, (("#!" * 3) + " ") * 20))                       // junk: symbol ratio
      ).toDF("doc_id", "text")

    // stage 1: quality — junk out, everything else (incl. dups) through
    val keep = TextPipeline.gopherQualityFilter(docs, minWords = 10)
      .filter(col("keep")).select(col("id").as("doc_id"))
    val kept = keep.as[Long].collect().toSet
    assert(!kept.contains(120L) && !kept.contains(121L), s"junk survived: $kept")
    assert((0L until 20L).forall(kept.contains) && kept.contains(110L) &&
      kept.contains(100L) && kept.contains(101L))
    val clean = docs.join(keep, Seq("doc_id"))

    // stage 2: exact dedup — 100/101 collapse into 0
    val exact = Dedup.exact(clean)
    val exactKeep = exact.select("keep_id").as[Long].collect().toSet
    assert(exactKeep.contains(0L) && !exactKeep.contains(100L) && !exactKeep.contains(101L))
    assert(exactKeep.size === 21) // 20 normal + near-dup 110
    val exactDocs = clean.join(exact.select(col("keep_id").as("doc_id")), Seq("doc_id"))

    // stage 3: near-dup collapse — (1, 110) is the only surviving pair
    val pairs = Dedup.minhashPairs(exactDocs, shingleLen = 2, k = 64,
      bands = 32, threshold = 0.5)
    val mapped = Dedup.keepList(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapped.getOrElse(110L, 110L) === 1L, s"near-dup not collapsed: $mapped")
    val dropIds = mapped.collect { case (id, canon) if id != canon => id }.toSet
    assert(dropIds === Set(110L), s"unexpected near-dup drops: $dropIds")
    val deduped = exactDocs.filter(!col("doc_id").isin(dropIds.toSeq: _*))
    assert(deduped.count() === 20)

    // stage 4: token budget — deterministic greedy fill caps the stratum
    val budgetRows = TextPipeline.tokenBudgetSample(
      deduped.withColumn("stratum", lit("web")), "stratum",
      budgets = Map("web" -> 250L), defaultBudget = 0L)
    val totalTaken = budgetRows.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(totalTaken === 250L, s"budget not exactly filled: $totalTaken") // 10 docs x 25 tokens
    val budgeted = deduped.join(budgetRows.select(col("id").as("doc_id")), Seq("doc_id"))

    // stage 5: packing — contiguous spans, window math consistent
    val packed = TextPipeline.packSequences(budgeted, contextLen = 64)
    val rows = packed.orderBy("doc_id").collect()
    assert(rows.length === 10)
    val total = rows.map(r => r.getAs[Long]("n_tokens")).sum
    assert(total === 250L)
    // spans tile [0, total) in doc_id order
    val starts = rows.map(r => r.getAs[Long]("start_token"))
    assert(starts.head === 0L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("start_token") + a.getAs[Long]("n_tokens") ===
        b.getAs[Long]("start_token"))
    }
    assert(rows.last.getAs[Long]("window_end") === (total - 1) / 64)
  }
}
