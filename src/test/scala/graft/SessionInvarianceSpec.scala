package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

/** Partition-boundary invariance of the distributed sessionize prefix
  * scan: the output must equal a driver ground-truth scan at EVERY
  * shuffle-partition count (boundaries land in different places each
  * time, exercising the correction tables for real — AQE coalescing can
  * otherwise collapse small inputs to one partition and make the
  * boundary logic vacuously pass). */
class SessionInvarianceSpec extends AnyFunSuite {

  private def groundTruth(rows: Seq[(Long, Long, Long)], gapUs: Long): Set[(Long, Long, Long, Long, Long)] = {
    rows.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      var idx = 0L
      var out = List.empty[(Long, Long, Long, Long, Long)]
      var cur: Option[(Long, Long, Long)] = None // start, end, n
      sorted.foreach { case (_, us, _) =>
        cur match {
          case Some((s, e, n)) if us - e <= gapUs =>
            cur = Some((s, us, n + 1))
          case Some((s, e, n)) =>
            out ::= (u, idx, n, s, e)
            idx += 1
            cur = Some((us, us, 1))
          case None =>
            cur = Some((us, us, 1))
        }
      }
      cur.foreach { case (s, e, n) => out ::= (u, idx, n, s, e); idx += 1 }
      // 1-based session_idx in event-time order
      out.reverse.zipWithIndex.map { case ((uu, _, n, s, e), i) => (uu, i.toLong + 1L, n, s, e) }
    }.toSet
  }

  test("batch sessionize equals driver scan at 2/5/11/32 shuffle partitions") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    try {
      // 40 users x dense timelines with gaps; event_id globally unique.
      // gap = 100us; inter-event deltas straddle it.
      val rng = new scala.util.Random(7)
      val rows = (0 until 40).flatMap { u =>
        var t = 1000L * u
        (0 until 500).map { i =>
          t += (if (rng.nextInt(10) == 0) 250L else 40L)
          (u.toLong, t, (u * 10000 + i).toLong)
        }
      }
      val gapUs = 100L
      val truth = groundTruth(rows, gapUs)
      for (np <- Seq(2, 5, 11, 32)) {
        spark.conf.set("spark.sql.shuffle.partitions", np)
        // gapMinutes granularity is too coarse for the fixture: scale us
        // so 1 minute == 100us  =>  us' = us * (60e6 / 100)
        val scale = 60L * 1000000L / gapUs
        val scaled = rows.map { case (u, t, e) => (u, t * scale, e) }
          .toDF("user_id", "us", "event_id").repartition(4)
        val out = Sessionize.batch(scaled, gapMinutes = 1)
          .select(col("user_id"), col("session_idx"), col("n_events"),
            (col("start_us") / scale).cast("long").as("s"),
            (col("end_us") / scale).cast("long").as("e"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSet
        assert(out == truth, s"mismatch at shuffle.partitions=$np: " +
          s"got ${out.size} sessions, expected ${truth.size}; " +
          s"sample diff got-only=${(out -- truth).take(3)} truth-only=${(truth -- out).take(3)}")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", 32)
      spark.catalog.clearCache() // drop the operators' internal persists
    }
  }
}
