package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextPipeline

/** Partition-boundary invariance of the distributed prefix-scan family
  * (packSequences, tokenBudgetSample): outputs must equal a driver
  * ground-truth scan at EVERY shuffle-partition count. Boundaries land
  * differently each time, so the pid-keyed offset corrections are
  * exercised for real — the guarded hazard is RangePartitioner
  * re-sampling its bounds per planned expansion, which (uncached) can
  * hand the offsets table different pids than the row-level window. */
class PrefixScanInvarianceSpec extends AnyFunSuite {

  test("packSequences and tokenBudgetSample equal driver scans at 2/5/11/32 partitions") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    try {
      val rng = new scala.util.Random(23)
      // ~3000 docs, whitespace token counts 0..24, two strata
      val docs = (0 until 3000).map { i =>
        val n = rng.nextInt(25)
        (i.toLong, if (i % 3 == 0) "web" else "book",
          Seq.fill(n)("tok").mkString(" "))
      }
      // ---- packSequences ground truth: id-order cumsum, 64-token windows
      val ctx = 64L
      var cum = 0L
      val packTruth = docs.sortBy(_._1).map { case (id, _, text) =>
        val n = if (text.isEmpty) 0L else text.split("\\s+").length.toLong
        val start = cum; cum += n
        val wStart = start / ctx
        val wEnd = if (n == 0) wStart else (cum - 1) / ctx
        (id, n, start, wStart, wEnd)
      }.toSet
      // ---- tokenBudgetSample ground truth: per-stratum (md5(id), id)
      // order, keep rows with cumulative <= budget
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      val budgets = Map("web" -> 2000L, "book" -> 5000L)
      val budgetTruth = docs.groupBy(_._2).flatMap { case (stratum, rows) =>
        var c = 0L
        rows.map { case (id, _, text) =>
          val n = if (text.isEmpty) 0L else text.split("\\s+").length.toLong
          (id, md5hex(id.toString), n)
        }.sortBy(r => (r._2, r._1)).flatMap { case (id, _, n) =>
          c += n
          if (c <= budgets(stratum)) Some((id, stratum, n, c)) else None
        }
      }.toSet
      for (np <- Seq(2, 5, 11, 32)) {
        spark.conf.set("spark.sql.shuffle.partitions", np)
        val df = docs.toDF("doc_id", "source", "text").repartition(6)
        val packed = TextPipeline.packSequences(df, contextLen = ctx)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSet
        assert(packed == packTruth, s"packSequences at shuffle.partitions=$np: " +
          s"${(packed -- packTruth).take(3)} vs ${(packTruth -- packed).take(3)}")
        val sampled = TextPipeline.tokenBudgetSample(df, "source",
          budgets, defaultBudget = 1000L)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(sampled == budgetTruth, s"tokenBudgetSample at shuffle.partitions=$np: " +
          s"${(sampled -- budgetTruth).take(3)} vs ${(budgetTruth -- sampled).take(3)}")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", 32)
      spark.catalog.clearCache() // drop the operators' internal persists
    }
  }
}
