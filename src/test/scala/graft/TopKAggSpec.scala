package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions._
import graft.operators.Ann

/** Bounded top-k aggregate: parity with the rank-window formulation it
  * replaced, including tie and NaN ordering, across partition merges. */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  test("topk_by_score matches row_number window incl. ties and NaN-last") {
    // 4 groups x 250 rows across 8 partitions; duplicated scores force id
    // tiebreaks and a few NaNs must sort last
    val rows = for {
      g <- 0L until 4L
      i <- 0L until 250L
    } yield (g, g * 1000 + i,
      if (i % 97 == 0) Double.NaN else (i % 25).toDouble) // heavy ties
    val df = rows.toDF("g", "id", "score").repartition(8)

    val agg = df.groupBy("g").agg(topk_by_score(col("score"), col("id"), 12).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("g"), col("p.id").as("id"), col("p.score").as("score"),
        (col("pos") + 1).as("rank"))

    val w = Window.partitionBy("g").orderBy(col("score").asc, col("id").asc)
    val win = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 12)
      .select("g", "id", "score", "rank")

    val a = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = win.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a === b)
    // NaN-last: with 25 distinct finite scores and k=12, no NaN may appear
    assert(!agg.collect().exists(r => r.getDouble(2).isNaN))
  }

  test("topk_by_score keeps NaN only when the group runs out of finite scores") {
    val df = Seq((0L, 1L, 1.0), (0L, 2L, Double.NaN), (0L, 3L, 2.0))
      .toDF("g", "id", "score")
    val got = df.groupBy("g").agg(topk_by_score(col("score"), col("id"), 3).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("p.id")).as[Long].collect()
    assert(got.toSeq === Seq(1L, 3L, 2L)) // NaN entry ranks last
  }

  test("knnJoin on the aggregate path returns exact ranked neighbors") {
    val corpus = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(2.0, 0.0)),
      (3L, Seq(3.0, 0.0)), (4L, Seq(0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(0.0, 0.0))).toDF("q_id", "q_vec")
    val got = Ann.knnJoin(queries, corpus, k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((0L, 1), (1L, 2), (4L, 3))) // dist 0, 1, 1 (id tiebreak)
  }
}
