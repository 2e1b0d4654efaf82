package graft

import graft.operators.Bpe

/** BPE tokenizer fit + encode (q73): the Sennrich et al. worked example,
  * greedy-encode semantics, determinism, and the merge-count
  * monotonicity that makes the fit useful for token budgeting. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  // The ACL'16 running example corpus as a word-frequency table.
  private val counts = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainFromCounts: worked example — pair counts and lexicographic tiebreaks") {
    // step 1: (e,s)=9 ties (s,t)=9 and (t,</w>)=9 -> lex-min pair wins
    // then (es,t)=9, (est,</w>)=9, (l,o)=7 ties (o,w)=7, (lo,w)=7
    val merges = Bpe.trainFromCounts(counts, numMerges = 5)
    assert(merges === Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o"), ("lo", "w")))
    // requesting more merges than exist terminates without looping
    val all = Bpe.trainFromCounts(Seq(("ab", 1L)), numMerges = 100)
    assert(all === Seq(("a", "b"), ("ab", Bpe.EndOfWord)))
  }

  test("encodeWord: greedy lowest-rank-first application") {
    val model = Bpe.Model(Bpe.trainFromCounts(counts, numMerges = 5))
    assert(model.encodeWord("lowest") === Seq("low", "est" + Bpe.EndOfWord))
    assert(model.encodeWord("low") === Seq("low", Bpe.EndOfWord))
    assert(model.encodeWord("newest") === Seq("n", "e", "w", "est" + Bpe.EndOfWord))
    // unseen characters stay singletons
    assert(model.encodeWord("xy") === Seq("x", "y", Bpe.EndOfWord))
    // zero merges: characters + boundary marker
    assert(Bpe.Model(Nil).encodeWord("abc") === Seq("a", "b", "c", Bpe.EndOfWord))
  }

  test("train + encodeCounts: distributed fit is deterministic, counts match driver encode") {
    val docs = Seq(
      (0L, "low lowest newest"), (1L, "lower widest low"),
      (2L, "newest newest widest"), (3L, "low low low low low"))
      .toDF("doc_id", "text").repartition(4)
    val m1 = Bpe.train(docs, numMerges = 8)
    val m2 = Bpe.train(docs, numMerges = 8)
    assert(m1.merges === m2.merges && m1.merges.length === 8)
    val got = Bpe.encodeCounts(docs, m1).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver-side reference: encode each word independently
    val want = Seq(
      (0L, "low lowest newest"), (1L, "lower widest low"),
      (2L, "newest newest widest"), (3L, "low low low low low")).map {
      case (id, text) =>
        val ws = text.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
        (id, ws.length.toLong, ws.map(w => m1.encodeWord(w).length.toLong).sum)
    }
    assert(got.toSeq === want)
  }

  test("more merges never increase the corpus token count; vocab tracks merges") {
    val docs = (0L until 60L).map { i =>
      (i, Seq("low", "lower", "newest", "widest", "lowest")(i.toInt % 5) + " " +
        Seq("table", "tables", "stable")(i.toInt % 3))
    }.toDF("doc_id", "text")
    def total(n: Int): Long = {
      val m = Bpe.train(docs, numMerges = n)
      Bpe.encodeCounts(docs, m).agg(org.apache.spark.sql.functions.sum("n_bpe_tokens"))
        .head().getLong(0)
    }
    val t0 = total(0); val t4 = total(4); val t16 = total(16); val t64 = total(64)
    assert(t0 >= t4 && t4 >= t16 && t16 >= t64)
    assert(t64 < t0) // merges actually fired
    val m = Bpe.train(docs, numMerges = 16)
    assert(m.merges.length === 16 && m.vocabulary.nonEmpty && m.vocabulary.length <= 16)
  }
}
