package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Schema-adaptive reader for the driver-generated `events` table.
  *
  * Different testdata generations store `events.ts` differently: as
  * parquet TIMESTAMP(NANOS) — which Spark can only read as INT64 nanos
  * under `spark.sql.legacy.parquet.nanosAsLong` — or as TIMESTAMP_MICROS
  * (isAdjustedToUTC=false, surfaced as TIMESTAMP_NTZ). Both encodings are
  * normalized to the same two columns:
  *   - `us`: micros-since-epoch BIGINT (naive values treated as UTC,
  *     matching DuckDB's `epoch_us(ts)` over the same file), and
  *   - `ts`: TimestampType at micros precision (UTC).
  * so downstream event-time operators (windowed agg, sessionization,
  * streaming watermarks) are insulated from the storage encoding.
  */
object Events {

  /** Normalize an already-loaded events frame (batch or streaming). */
  def normalize(df: DataFrame): DataFrame = {
    val withUs = df.schema("ts").dataType match {
      case LongType => df.withColumn("us", expr("ts DIV 1000"))
      case _        => df.withColumn("us", unix_micros(col("ts").cast("timestamp")))
    }
    withUs.withColumn("ts", timestamp_micros(col("us")))
  }

  def read(s: SparkSession, dir: String): DataFrame = {
    // Must be set before the read: Spark rejects TIMESTAMP(NANOS) otherwise.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ->timestamp cast in normalize() interprets naive values in the
    // session timezone; pin UTC so `us` is deterministic and oracle-stable.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    normalize(s.read.parquet(s"$dir/events.parquet"))
  }
}
