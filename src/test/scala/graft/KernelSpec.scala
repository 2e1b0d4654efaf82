package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.functions.{HashKernels, Porter2}

/** Kernel semantics vs hand values — mirrors the reference's exact-value
  * unit-test style (SURVEY §5; rs/utils/src/distance/l2.rs scalar path). */
class KernelSpec extends SparkSuite {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head().getDouble(0)

  test("l2_distance hand values") {
    val c = l2_distance(vec(Seq(1.0, 2.0, 3.0)), vec(Seq(4.0, 6.0, 3.0)))
    assert(one(c) === 5.0) // sqrt(9+16+0)
  }

  test("l2 of identical vectors is 0, dot/cosine hand values") {
    assert(one(l2_distance(vec(Seq(1.5, -2.5)), vec(Seq(1.5, -2.5)))) === 0.0)
    assert(one(dot_product(vec(Seq(1.0, 2.0, 3.0)), vec(Seq(4.0, 5.0, 6.0)))) === 32.0)
    assert(math.abs(one(cosine_similarity(vec(Seq(1.0, 0.0)), vec(Seq(0.0, 1.0))))) < 1e-12)
    assert(math.abs(one(cosine_similarity(vec(Seq(2.0, 0.0)), vec(Seq(5.0, 0.0)))) - 1.0) < 1e-12)
    assert(one(cosine_similarity(vec(Seq(0.0, 0.0)), vec(Seq(1.0, 1.0)))) === 0.0) // zero-norm guard
  }

  test("kernels null-propagate") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(l2_distance(col("a"), col("b"))).head().isNullAt(0))
  }

  test("kernels work on float arrays (implicit cast) and in SQL") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(4.0f, 6.0f))).toDF("a", "b")
    assert(df.select(l2_distance(col("a"), col("b"))).head().getDouble(0) === 5.0)
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("kernel_sql_t")
    assert(spark.sql(
      "SELECT l2_distance(CAST(a AS array<double>), CAST(b AS array<double>)) FROM kernel_sql_t")
      .head().getDouble(0) === 5.0)
  }

  test("interpreted eval matches codegen (eval path smoke)") {
    val e = graft.functions.L2Distance(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(4.0, 6.0)))
    assert(e.eval(null).asInstanceOf[Double] === 5.0)
  }

  test("canonical_site: first probe present in assigns wins, exactly one site true") {
    def site(probes: Seq[Int], assigns: Seq[Int], s: Int): Boolean =
      Seq(1).toDF("x").select(canonical_site(
        array(probes.map(lit): _*), array(assigns.map(lit): _*), lit(s)))
        .head().getBoolean(0)
    // probes nearest-first (7, 3, 9); neighbor assigned to (3, 9):
    // canonical site is 3 — the first probe that appears in assigns
    assert(site(Seq(7, 3, 9), Seq(3, 9), 3))
    assert(!site(Seq(7, 3, 9), Seq(3, 9), 9))
    assert(!site(Seq(7, 3, 9), Seq(3, 9), 7))
    // disjoint lists: no site is canonical
    assert(!site(Seq(1, 2), Seq(3, 4), 1))
    // exactly one true across any pair's shared sites
    val shared = Seq(5, 2, 8)
    assert(shared.count(s => site(Seq(9, 8, 2, 5), Seq(5, 2, 8), s)) === 1)
  }

  test("minhash: identical inputs give identical signatures; jaccard-ish monotone") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L, 5L)),
      (2L, Seq(1L, 2L, 3L, 4L, 5L)),
      (3L, Seq(1L, 2L, 3L, 4L, 6L)),
      (4L, Seq(100L, 200L, 300L, 400L, 500L))
    ).toDF("id", "els")
    val sigs = df.select(col("id"), minhash_signature(col("els"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    def overlap(a: Seq[Long], b: Seq[Long]): Int = a.zip(b).count { case (x, y) => x == y }
    assert(overlap(sigs(1L), sigs(3L)) > overlap(sigs(1L), sigs(4L)))
    assert(sigs(1L).length === 64)
  }

  test("simhash: identical token bags hash identically; hamming64 works") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "entirely different words here")
    ).toDF("id", "text")
    val sk = df.select(col("id"), simhash(tokenize(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) === sk(2L))
    assert(sk(1L) !== sk(3L))
    val h = Seq((sk(1L), sk(3L))).toDF("a", "b")
      .select(hamming64(col("a"), col("b"))).head().getInt(0)
    assert(h > 0 && h <= 64)
  }

  test("rolling_hash fingerprint: whitespace-normalization invariance") {
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "hello worlds")
    ).toDF("id", "text")
    val fp = df.select(col("id"), doc_fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("mix64 is a bijective-ish mixer (no trivial collisions)") {
    val outs = (0L until 1000L).map(HashKernels.mix64)
    assert(outs.distinct.size === 1000)
  }

  test("Porter2 stems the fixture vocabulary (planner.rs:443-493 scenario)") {
    assert(Porter2.stem("running") === "run")
    assert(Porter2.stem("connections") === "connect")
    assert(Porter2.stem("merge") === "merg")
    assert(Porter2.stem("batches") === "batch")
    assert(Porter2.stem("dying") === "die")
    assert(Porter2.stem("news") === "news")
    assert(Porter2.stem("caresses") === "caress")
    assert(Porter2.stem("ponies") === "poni")
    assert(Porter2.stem("cats") === "cat")
    assert(Porter2.stem("agreed") === "agre")
    assert(Porter2.stem("hopping") === "hop")
    assert(Porter2.stem("joyful") === "joy")
    assert(Porter2.stem("sky") === "sky")
  }

  test("text stats: token counts and ratios") {
    val df = Seq(("a b  c", 3), ("", 0)).toDF("text", "expected")
    val got = df.select(token_count_ws(col("text"))).collect().map(_.getInt(0))
    assert(got.toSeq === Seq(3, 0))
    val bpe = Seq(("hello, world 123")).toDF("text")
      .select(token_count_bpe(col("text"))).head().getInt(0)
    assert(bpe === 4) // hello , world 123
  }

  test("normalize_text: NFC, accent strip, case, whitespace collapse, trim") {
    def norm(in: String): String =
      Seq(in).toDF("text").select(normalize_text(col("text"))).head().getString(0)
    assert(norm("  Hello\t\tWORLD  ") === "hello world")
    assert(norm("Caf\u00e9 r\u00e9sum\u00e9") === "cafe resume") // precomposed accents
    assert(norm("Cafe\u0301") === "cafe") // combining acute (NFD input)
    // NFC equivalence: precomposed and combining forms normalize identically
    assert(norm("\u00e9") === norm("e\u0301"))
    assert(norm("a\nb\r\nc") === "a b c")
    assert(norm("") === "" && norm("   ") === "")
    assert(norm("Stra\u00dfe") === "stra\u00dfe") // sharp s: no casefold expansion
  }
}
