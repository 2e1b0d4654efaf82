package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval-containment join — points matched to the intervals
  * that contain them (`lo <= pt <= hi`, same key). Spark plans a naive
  * range predicate as a broadcast-nested-loop or cartesian; this is the
  * standard scalable reformulation: intervals EXPLODE onto the
  * fixed-width buckets they cover (span/width + 1 rows per interval),
  * points map to exactly one bucket, and the match becomes a HASH
  * equi-join on (key, bucket) with the exact BETWEEN as a cheap
  * residual filter. The shuffle is keyed and linear in points +
  * interval-bucket coverage; pick `bucketWidth` near the typical
  * interval span so coverage stays O(1) per interval.
  *
  * Point and bound columns must be non-negative integral values (epoch
  * micros, offsets); inner-join semantics — unmatched points drop. */
object RangeJoin {

  def bucketed(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      ptCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth")
    require(keyCols.nonEmpty, "empty key list")
    val lb = Par.ensure(points)
      .withColumn("__b", expr(s"`$ptCol` DIV $bucketWidth"))
    val rb = Gen.explodeOnce(Par.ensure(intervals),
      intervals.columns.map(col).toSeq,
      sequence(expr(s"`$loCol` DIV $bucketWidth"), expr(s"`$hiCol` DIV $bucketWidth")),
      "__b")
    lb.join(rb, keyCols :+ "__b")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__b")
  }
}
