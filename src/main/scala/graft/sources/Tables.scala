package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Schema-adaptive loader for every driver-generated testdata table.
  *
  * The driver has regenerated `/root/testdata` mid-build before, switching
  * `events.ts` from parquet TIMESTAMP(NANOS) (readable only as INT64 under
  * `spark.sql.legacy.parquet.nanosAsLong`) to TIMESTAMP_MICROS with
  * isAdjustedToUTC=false (surfaced as TIMESTAMP_NTZ). Queries that
  * hard-coded one encoding failed at analysis time. This loader
  * generalizes the events fix to every timestamp-bearing column the
  * driver tables declare, normalizing all three possible encodings to
  * TimestampType at micros precision with naive values read as UTC —
  * exactly what DuckDB sees over the same files, so oracle hashes are
  * stable across regenerations.
  *
  * The events table additionally carries the derived `us` (micros BIGINT)
  * column contract from [[Events.normalize]].
  */
object Tables {

  /** Timestamp-bearing columns per driver table. Any of these may arrive
    * as TIMESTAMP_MICROS (NTZ), tz-adjusted TIMESTAMP, or nanos-as-INT64
    * depending on the testdata generation. Columns absent from a given
    * generation are skipped. */
  private val tsColumns: Map[String, Seq[String]] = Map(
    "events"   -> Seq("ts"),
    "orders"   -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate", "l_commitdate", "l_receiptdate"))

  /** Normalize the named timestamp columns of an already-loaded frame:
    * INT64 is treated as nanos-since-epoch (the only way Spark surfaces
    * parquet TIMESTAMP(NANOS)), NTZ values are re-read as UTC instants,
    * and tz-adjusted timestamps pass through. */
  def normalizeTs(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case LongType =>
          d.withColumn(c, timestamp_micros(expr(s"`$c` DIV 1000")))
        case TimestampNTZType =>
          // With the session timezone pinned to UTC (below) this cast is
          // a pure type change on the stored micros value.
          d.withColumn(c, col(c).cast("timestamp"))
        case _ => d
      }
    }

  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    // Must be set before the read: Spark rejects TIMESTAMP(NANOS) otherwise.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NTZ casts interpret naive values in the session timezone; pin UTC so
    // normalized instants match DuckDB's reading of the same file.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") Events.normalize(df)
    else normalizeTs(df, tsColumns.getOrElse(name, Seq.empty))
  }
}
