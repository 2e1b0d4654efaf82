package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Term-skipping measurement (round-13 verdict #8): S9 claims a term
  * lookup on a segment terms table prunes to one of the 64 term-hash
  * partition directories and then to few row groups via parquet min/max
  * on the sorted `term` column — this measures it instead of asserting
  * it. Builds a terms table from sf documents with EXACTLY the
  * buildSegment write shape (bucket + in-task sort + partitionBy), then
  * compares task input metrics (bytes read, records read off disk) for:
  *
  *   a) a full scan,
  *   b) the real lookup path (bucket predicate + term equality — what
  *      FilterCompiler emits),
  *   c) term equality WITHOUT the bucket predicate (what row-group
  *      stats alone buy).
  *
  * The probe aggregates over every column (not `count()`, which parquet
  * answers from row-group metadata without reading a byte — the first
  * run of this harness measured exactly that and the "full scan"
  * comparand read 0 MiB).
  *
  * `runMain graft.ProfTerms [sfDir] [term]` — defaults
  * /root/testdata/sf0.1 and a mid-frequency term picked from the table.
  */
object ProfTerms {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val termArg = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = "/tmp/graft_profterms"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // same derivation as a segment terms table for a text field, same
    // write shape as Collection.buildSegment (term-hash partitions,
    // in-task sort by (bucket, term, ...) => term-clustered row groups)
    graft.operators.Gen.explodeOnce(docs,
        Seq(lit(0L).as("user_id"), col("doc_id").as("point_id")),
        term_keys("text", analyze_text(col("text"))), "term")
      .select(col("user_id"), col("term"), col("point_id"))
      .dropDuplicates("user_id", "term", "point_id")
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(graft.core.Collection.termBuckets)))
      .repartition(col("term_bucket"), col("term"))
      .sortWithinPartitions("term_bucket", "term", "user_id", "point_id")
      .write.mode("overwrite").partitionBy("term_bucket").parquet(path)

    val bytes = new AtomicLong(0L)
    val recs = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach { m =>
          bytes.addAndGet(m.inputMetrics.bytesRead)
          recs.addAndGet(m.inputMetrics.recordsRead)
        }
    }
    // force REAL column reads: aggregate over every column so the scan
    // cannot be answered from row-group metadata
    def touchAll(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.agg(sum(pmod(xxhash64(col("term"), col("point_id"), col("user_id")),
        lit(1000000L))).as("s"), count(lit(1)).as("n"))
    def measure(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      touchAll(df).collect() // warm (footers, codegen)
      bytes.set(0L); recs.set(0L)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = touchAll(df).collect()(0).getLong(1)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // listener bus drain
      println(f"[terms] $label%-34s rows=$n%9d  read=${recs.get()}%10d recs ${bytes.get() / 1024.0 / 1024.0}%8.1f MiB  $dt%5.2f s")
    }

    val terms = spark.read.parquet(path)
    val total = terms.count()
    val term = termArg.getOrElse {
      // the most selective real term (the synthetic corpus has a tiny
      // vocabulary — ~31 distinct terms at sf0.1 — so "selective" is
      // relative; the bucket-pruning ratio is what the probe measures)
      terms.groupBy("term").count()
        .orderBy(col("count").asc, col("term")).limit(1).collect()(0).getString(0)
    }
    println(s"[terms] table: $total rows, term=$term")
    measure("full scan")(terms)
    measure("lookup (bucket prune + term)")(terms.filter(
      col("term_bucket") === pmod(xxhash64(lit(term)), lit(graft.core.Collection.termBuckets)) &&
        col("term") === lit(term)))
    measure("term only (row-group stats)")(terms.filter(col("term") === lit(term)))
    // round 15: the dictionary multi-term paths — a PREFIX scan (no
    // bucket pruning possible: the bucket hashes the FULL term, so this
    // measures what the sorted term column's min/max stats + pushed
    // StringStartsWith buy on their own), and a FUZZY dictionary scan
    // (field-range restriction + length prefilter before the Levenshtein)
    val prefix = term.take(math.max(1, term.indexOf(':') + 2))
    measure(s"prefix scan ($prefix*)")(
      terms.filter(col("term").startsWith(prefix)))
    val fieldPrefix = term.take(term.indexOf(':') + 1)
    val token = term.stripPrefix(fieldPrefix)
    measure(s"fuzzy scan ($token ~1, prefix_length=0)")(
      terms.filter(col("term").startsWith(fieldPrefix) &&
        abs(length(col("term")) - lit(term.length)) <= 1 &&
        levenshtein(expr(s"substring(term, ${fieldPrefix.length + 1})"),
          lit(token)) <= 1))
    // prefix_length=1: the first token char joins the seek literal, so
    // the sorted term column's row-group stats turn the full dictionary
    // scan into a range scan (Lucene's prefix_length trade: edits at
    // position 0 are excluded)
    measure(s"fuzzy scan ($token ~1, prefix_length=1)")(
      terms.filter(col("term").startsWith(fieldPrefix + token.take(1)) &&
        abs(length(col("term")) - lit(term.length)) <= 1 &&
        levenshtein(expr(s"substring(term, ${fieldPrefix.length + 1})"),
          lit(token)) <= 1))
    // round 16: the pl=0 path can't range-prune (edits at position 0 are
    // legal), so its cost driver is the per-row Levenshtein DP over the
    // field's whole term range. The char-bigram count bound (each edit
    // touches ≤2 of the token's distinct bigrams) short-circuits the DP;
    // this measures the DP-candidate set each prefilter chain leaves and
    // pins that the match set is identical.
    def bigramRow(tk: String): Unit = {
      val tokCol = expr(s"substring(term, ${fieldPrefix.length + 1})")
      val lenPre = col("term").startsWith(fieldPrefix) &&
        abs(length(col("term")) - lit(fieldPrefix.length + tk.length)) <= 1
      val bigramPre = graft.operators.FilterCompiler
        .bigramPrefilter(tokCol, tk, 1)
      val dpLen = terms.filter(lenPre).count()
      val dpBoth = bigramPre.fold(dpLen)(b => terms.filter(lenPre && b).count())
      println(f"[terms] fuzzy pl=0 '$tk' DP candidates: length prefilter $dpLen%d; " +
        f"+bigram ${dpBoth}%d (${if (dpLen > 0) 100.0 * dpBoth / dpLen else 0.0}%.1f%%)")
      val noBigram = terms.filter(lenPre && levenshtein(tokCol, lit(tk)) <= 1)
      val withBigram = bigramPre.fold(noBigram)(b =>
        terms.filter(lenPre && b && levenshtein(tokCol, lit(tk)) <= 1))
      val a = noBigram.count(); val bN = withBigram.count()
      require(a == bN, s"bigram prefilter changed the match set: $a vs $bN")
      measure(s"fuzzy scan ($tk ~1, pl=0 + bigram prefilter)")(withBigram)
    }
    bigramRow(token)
    // the bound is vacuous for very short tokens (distinct bigrams - 2d
    // < 1) — also measure the LONGEST dictionary token, where it prunes
    val longTok = terms.select(expr(s"substring(term, ${fieldPrefix.length + 1})").as("t"))
      .where(col("term").startsWith(fieldPrefix))
      .distinct().orderBy(length(col("t")).desc, col("t")).limit(1)
      .collect()(0).getString(0)
    if (longTok != token) bigramRow(longTok)
    // the plan the real path runs: partition filter must be visible
    val plan = terms.filter(
      col("term_bucket") === pmod(xxhash64(lit(term)), lit(graft.core.Collection.termBuckets)) &&
        col("term") === lit(term)).queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    println(s"[terms] ${pf.trim.take(160)}")
    spark.stop()
  }
}
