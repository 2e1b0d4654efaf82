package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeBuckets

/** Pins the two orderings RangeBuckets must keep in agreement: the
  * driver-side boundary sort and the generated SQL leq chain. If they
  * diverge, bucket ids go non-monotone in key order and every
  * prefix-scan consumer's cross-bucket corrections silently corrupt. */
class RangeBucketsSpec extends SparkSuite {

  /** Bucket ids must be non-decreasing when rows are sorted by Spark's
    * own asc-nulls-first order on the key columns. */
  private def assertMonotone(
      df: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      nBuckets: Int): Unit = {
    val bucket = RangeBuckets.bucketCol(df, keys.map(col), nBuckets, samplePerBucket = 50)
    val ids = df
      .withColumn("__b", bucket)
      .orderBy(keys.map(k => col(k).asc_nulls_first): _*)
      .select("__b")
      .collect()
      .map(_.getInt(0))
    assert(ids.nonEmpty)
    ids.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"bucket ids not monotone: $a then $b")
      case _           =>
    }
    assert(ids.head >= 0 && ids.last < nBuckets)
  }

  test("null keys land in the first bucket (nulls-first, matching window order)") {
    import spark.implicits._
    val rows = (1 to 400).map(i => (Some(i.toLong), i)) ++
      (1 to 40).map(i => (None: Option[Long], 1000 + i))
    val df = rows.toDF("k", "v").repartition(5)
    assertMonotone(df, Seq("k"), 8)
    val bucket = RangeBuckets.bucketCol(df, Seq(col("k")), 8, samplePerBucket = 50)
    val nullBuckets = df.withColumn("__b", bucket).filter($"k".isNull)
      .select("__b").distinct().collect().map(_.getInt(0)).toSeq
    assert(nullBuckets == Seq(0), s"null keys must all land in bucket 0, got $nullBuckets")
  }

  test("string keys bucket in UTF-8 binary order (supplementary plane vs U+FFFD)") {
    import spark.implicits._
    // In UTF-16 code-unit order "😀" (U+1F600) < "�";
    // in UTF-8 byte order (Spark's) it is GREATER. Mixing both with
    // ASCII forces the boundary sort to take a stance.
    val specials = Seq("😀", "�", "😁", "")
    val rows = (1 to 300).map(i => (f"doc$i%04d", i)) ++
      specials.flatMap(s => (1 to 30).map(i => (s + i, i)))
    val df = rows.toDF("k", "v").repartition(7)
    assertMonotone(df, Seq("k"), 6)
  }

  test("two-column keys with nulls in the second column stay monotone") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (rng.nextInt(20).toLong, if (i % 11 == 0) None else Some(rng.nextInt(1000).toLong))
    }
    val df = rows.toDF("a", "b").repartition(5)
    assertMonotone(df, Seq("a", "b"), 10)
  }

  test("unsupported key types throw instead of silently mis-sorting") {
    import spark.implicits._
    val df = (1 to 200).map(i => (Seq(i, i + 1), i)).toDF("k", "v")
    val e = intercept[Exception] {
      RangeBuckets.bucketCol(df, Seq(col("k")), 4, samplePerBucket = 50)
    }
    assert(e.getMessage.contains("unsupported key type") ||
      e.getCause != null && e.getCause.getMessage.contains("unsupported key type"))
  }

  test("empty hash sample degrades to a full-scan sample, not one bucket") {
    import spark.implicits._
    // A post-filter subtree where optimizer stats can wildly overshoot:
    // even if the modulus filters out every row, the fallback must still
    // produce >1 distinct bucket for 4000 distinct keys.
    val df = (1 to 4000).map(i => (i.toLong, i % 3)).toDF("k", "m")
      .filter($"m" =!= 99)
    val bucket = RangeBuckets.bucketCol(df, Seq(col("k")), 8, samplePerBucket = 50)
    val distinct = df.withColumn("__b", bucket).select("__b").distinct().count()
    assert(distinct > 1, s"expected >1 bucket for 4000 distinct keys, got $distinct")
  }

  test("prefix-scan persist self-unpersists after the first completed action") {
    import spark.implicits._
    // maybePersist's QueryExecutionListener must drop the cache once the
    // consuming action completes — callers owe NO clearCache() hygiene.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val events = (0 until 500)
      .map(i => (i.toLong % 7, i.toLong * 60000000L, i.toLong))
      .toDF("user_id", "us", "event_id")
    val out = graft.operators.Sessionize.batch(events, 30).collect()
    assert(out.nonEmpty)
    // the listener fires on the async listener bus — poll with a deadline
    def extra = spark.sparkContext.getPersistentRDDs.keySet -- before
    val deadline = System.currentTimeMillis() + 30000
    while (extra.nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(extra.isEmpty,
      s"prefix-scan cache survived its consuming action: RDDs $extra")
  }
}
