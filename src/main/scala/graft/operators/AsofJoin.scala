package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for every left row, the single most recent
  * right row with the same key and `rightTs <= leftTs` (the time-series
  * enrichment join Spark lacks natively; kdb's `aj`, DuckDB's
  * `ASOF JOIN`, Pandas' `merge_asof`).
  *
  * Formulation: tag both sides, union on (key, ts), and carry each right
  * row's payload forward with `last(..., ignoreNulls)` over a per-key
  * time-ordered running window — at equal timestamps right sorts before
  * left so `<=` semantics hold. ONE shuffle on the key, sort within
  * partitions, no range-expansion join and no per-row right-side probe:
  * the classic scalable Spark shape. A pathologically hot key serializes
  * its own window (sort is per-key); salt upstream if one key dominates.
  *
  * Returns every left row (left-outer): left columns + the requested
  * right value columns (null when no right row precedes). Right value
  * columns must be non-null (null is the no-match sentinel in the
  * carry-forward); right rows tied on (key, ts) resolve to the greatest
  * value tuple, deterministically. */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightValCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && rightValCols.nonEmpty, "empty key/value column list")
    val leftCols = left.columns.toSeq
    require(rightValCols.forall(right.columns.contains), "missing right value column")
    require(!rightValCols.exists(leftCols.contains),
      s"right value columns must not collide with left columns")
    val l = Par.ensure(left).select(
      (keyCols.map(col) :+ col(leftTsCol).as("__ts") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == leftTsCol).map(col) ++
        rightValCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = Par.ensure(right).select(
      (keyCols.map(col) :+ col(rightTsCol).as("__ts") :+ lit(0).as("__side")) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == leftTsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightValCols.map(col): _*)
    // right rows sort before left at equal ts (so <= matches); equal-ts
    // right rows tiebreak by value ascending, making the carried pick
    // (the window's last row = greatest value tuple) deterministic
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc +: col("__side").asc +:
        rightValCols.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .withColumnRenamed("__ts", leftTsCol)
      .drop("__side")
      .select((leftCols ++ rightValCols).map(col): _*)
  }
}
