package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** AS-OF join: the giant-key-safe range-partitioned prefix carry must
  * equal both a driver ground-truth scan and the default per-key window
  * at EVERY shuffle-partition count — boundaries land differently each
  * time, exercising the exit-carry correction (including equal-ts right
  * tie groups split across a boundary), and the struct carry must keep
  * multi-column payloads row-consistent when individual values are
  * null. */
class AsofInvarianceSpec extends AnyFunSuite {

  test("giantKeySafe asof equals driver scan and default window at 2/5/11/32 partitions") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    try {
      val rng = new scala.util.Random(11)
      // key 0 is the giant key (most of the data); keys 1..9 small.
      // right timestamps collide ~30% of the time (tie groups), and the
      // second value column is null on ~25% of rows.
      val rightRows = (0 until 4000).map { i =>
        val k = if (i % 4 != 0) 0L else (1L + rng.nextInt(9)).toLong
        val ts = (rng.nextInt(500) * 10).toLong // dense -> many equal ts
        val v = i.toLong // unique: (ts, v) alone decides every tie
        val s = if (rng.nextInt(4) == 0) null else s"s$v"
        (k, ts, v, s)
      }
      val leftRows = (0 until 3000).map { i =>
        val k = if (i % 4 != 0) 0L else (1L + rng.nextInt(9)).toLong
        (i.toLong, k, (rng.nextInt(520) * 10 - 50).toLong) // some before all right rows
      }
      // ground truth: per left row, the right row with max (ts, v, s)
      // among same-key rows with ts <= left ts (s compared null-first,
      // matching Spark struct ordering with asc_nulls_first... v is
      // unique enough within a (k, ts) group to decide alone)
      val byKey = rightRows.groupBy(_._1)
      val truth = leftRows.map { case (id, k, lts) =>
        val cands = byKey.getOrElse(k, Nil).filter(_._2 <= lts)
        if (cands.isEmpty) (id, None, None)
        else {
          val best = cands.maxBy(c => (c._2, c._3))
          (id, Some(best._3), Option(best._4))
        }
      }.toSet
      val left = leftRows.toDF("event_id", "k", "lts").repartition(7)
      val right = rightRows.toDF("k", "rts", "v", "s").repartition(5)
      def run(safe: Boolean): Set[(Long, Option[Long], Option[String])] =
        AsofJoin.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("v", "s"),
          giantKeySafe = safe)
          .collect()
          .map { r =>
            (r.getLong(0),
              if (r.isNullAt(3)) None else Some(r.getLong(3)),
              if (r.isNullAt(4)) None else Some(r.getString(4)))
          }.toSet
      assert(run(safe = false) == truth, "default window path vs ground truth")
      for (np <- Seq(2, 5, 11, 32)) {
        spark.conf.set("spark.sql.shuffle.partitions", np)
        assert(run(safe = true) == truth, s"giantKeySafe at shuffle.partitions=$np")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", 32)
      spark.catalog.clearCache() // drop the operators' internal persists
    }
  }

  test("giantKeySafe asof with unicode STRING keys (incl. nulls) matches the default window") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    try {
      val rng = new scala.util.Random(13)
      // keys where UTF-16 code-unit order and UTF-8 byte order DISAGREE
      // (supplementary plane vs U+FFFD) plus ASCII and a null key —
      // exercising RangeBuckets' UTF-8 driver ordering and nulls-first
      // placement through a real consumer, end to end
      val keys: Seq[Option[String]] =
        Seq(Some("😀gk"), Some("�gk"), Some("alpha"), Some("😁"), Some("zz"), None)
      val rightRows = (0 until 2500).map { i =>
        val k = keys(if (i % 3 == 0) rng.nextInt(keys.length) else 0) // key 0 giant
        (k.orNull, (rng.nextInt(400) * 10).toLong, i.toLong)
      }
      val leftRows = (0 until 2000).map { i =>
        val k = keys(if (i % 3 == 0) rng.nextInt(keys.length) else 0)
        (i.toLong, k.orNull, (rng.nextInt(420) * 10 - 40).toLong)
      }
      val left = leftRows.toDF("event_id", "k", "lts").repartition(7)
      val right = rightRows.toDF("k", "rts", "v").repartition(5)
      def run(safe: Boolean): Set[(Long, Option[Long])] =
        AsofJoin.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("v"),
          giantKeySafe = safe)
          .collect()
          .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
          .toSet
      val expected = run(safe = false)
      for (np <- Seq(2, 5, 11, 32)) {
        spark.conf.set("spark.sql.shuffle.partitions", np)
        assert(run(safe = true) == expected, s"string-key giantKeySafe at np=$np")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", 32)
      spark.catalog.clearCache()
    }
  }
}
