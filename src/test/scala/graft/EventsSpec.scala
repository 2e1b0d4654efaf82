package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.sources.Events

/** Schema-adaptive events reader: both storage encodings the driver has
  * generated (TIMESTAMP(NANOS) read as INT64 nanos, TIMESTAMP_MICROS/NTZ)
  * must normalize to identical `us`/`ts` columns. */
class EventsSpec extends SparkSuite {
  import spark.implicits._

  test("nanos-as-long and micros-timestamp encodings normalize identically") {
    val usVals = Seq(1700000000000000L, 1700000000123456L, 1700003600999999L)
    val asLong = usVals.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L) } // nanos INT64
      .toDF("event_id", "ts")
    val asMicros = usVals.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us_in")
      .select(col("event_id"), timestamp_micros(col("us_in")).as("ts"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      Events.normalize(df).select("event_id", "us", "ts")
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val a = norm(asLong)
    val b = norm(asMicros)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._2).toSeq === usVals)
  }

  test("read() handles the real driver events table end-to-end") {
    val df = Events.read(spark, "/root/testdata/sf0.001")
    assert(df.columns.contains("us") && df.columns.contains("ts"))
    assert(df.schema("us").dataType.typeName === "long")
    assert(df.schema("ts").dataType.typeName === "timestamp")
    val row = df.select(unix_micros(col("ts")), col("us")).head()
    assert(row.getLong(0) === row.getLong(1)) // ts and us agree
    assert(df.count() > 0)
  }

  test("Tables.read normalizes orders/lineitem date columns across encodings") {
    import graft.sources.Tables
    val us = 883612800000000L // 1998-01-01 00:00:00 UTC in micros
    // Three on-disk encodings of the same instant: nanos-as-INT64, NTZ
    // micros, tz-adjusted timestamp.
    val asLong = Seq((1L, us * 1000L)).toDF("o_orderkey", "o_orderdate")
    val asNtz = Seq((1L, us)).toDF("o_orderkey", "us_in")
      .select(col("o_orderkey"),
        timestamp_micros(col("us_in")).cast("timestamp_ntz").as("o_orderdate"))
    val asTz = Seq((1L, us)).toDF("o_orderkey", "us_in")
      .select(col("o_orderkey"), timestamp_micros(col("us_in")).as("o_orderdate"))
    for (df <- Seq(asLong, asNtz, asTz)) {
      val n = Tables.normalizeTs(df, Seq("o_orderdate", "absent_col"))
      assert(n.schema("o_orderdate").dataType.typeName === "timestamp")
      assert(n.select(unix_micros(col("o_orderdate"))).head().getLong(0) === us)
    }
    // End-to-end over the real driver tables: normalized types, q04's
    // literal comparison analyzes and runs.
    val orders = Tables.read(spark, "/root/testdata/sf0.001", "orders")
    assert(orders.schema("o_orderdate").dataType.typeName === "timestamp")
    assert(orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .count() >= 0)
    val li = Tables.read(spark, "/root/testdata/sf0.001", "lineitem")
    assert(li.schema("l_shipdate").dataType.typeName === "timestamp")
  }

  test("round-trip through parquet keeps both encodings readable") {
    // the LongType leg as it would appear on disk: a parquet file whose ts
    // column is a plain INT64 of nanos (what nanosAsLong surfaces)
    val dir = Files.createTempDirectory("graft_events_enc").toString
    Seq((1L, 1700000000000000000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(dir)
    val got = Events.normalize(spark.read.parquet(dir))
      .select("us").head().getLong(0)
    assert(got === 1700000000000000L)
  }
}
