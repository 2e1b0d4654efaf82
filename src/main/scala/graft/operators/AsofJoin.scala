package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  * the classic scalable Spark shape.
  *
  * The right payload rides as a SINGLE struct column, so the carried
  * pick is always one physical right row — value columns can never mix
  * across right rows, and individually-null right values are carried
  * through as genuine nulls rather than misread as "no match" (the
  * struct itself is the no-match sentinel). Right rows tied on
  * (key, ts) resolve to the greatest value tuple, deterministically.
  *
  * Returns every left row (left-outer): left columns + the requested
  * right value columns (null when no right row precedes).
  *
  * Skew: the per-key window serializes a pathologically hot key. Pass
  * `giantKeySafe = true` to switch to a range-partitioned prefix scan
  * (the [[Sessionize.batch]] construction): the union is range-
  * partitioned on (key, ts, ...), each partition carries locally, and a
  * per-(partition, key) boundary table — at most partitions-1 spanning
  * keys, so it broadcasts at any scale — injects the carry entering
  * each partition. Identical output (spec-gated at several partition
  * counts); costs one extra tiny broadcast join, so the default stays
  * the single-shuffle window. */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightValCols: Seq[String],
      giantKeySafe: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty && rightValCols.nonEmpty, "empty key/value column list")
    val leftCols = left.columns.toSeq
    require(rightValCols.forall(right.columns.contains), "missing right value column")
    require(!rightValCols.exists(leftCols.contains),
      s"right value columns must not collide with left columns")
    val rvType = StructType(rightValCols.map(c => right.schema(c.toString)).toArray)
    val l = Par.ensure(left).select(
      (keyCols.map(col) :+ col(leftTsCol).as("__ts") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == leftTsCol).map(col) :+
        lit(null).cast(rvType).as("__rv"): _*)
    val r = Par.ensure(right).select(
      (keyCols.map(col) :+ col(rightTsCol).as("__ts") :+ lit(0).as("__side")) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == leftTsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValCols.map(col): _*).as("__rv"): _*)
    // persisted in the giantKeySafe path below — perf-only (the bucket
    // id is a pure function of the row); the default window path never
    // materializes it twice and skips the cache
    val unioned = l.unionByName(r)
    // right rows sort before left at equal ts (so <= matches); equal-ts
    // right rows tiebreak by the value struct ascending, making the
    // carried pick (the window's last row = greatest value tuple)
    // deterministic
    val ordering: Seq[Column] =
      col("__ts").asc +: col("__side").asc +: Seq(col("__rv").asc_nulls_first)
    val carried =
      if (!giantKeySafe) {
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(ordering: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      } else {
        // range-bucketed prefix carry: a single hot key spans many
        // buckets instead of serializing one window task. __pid is a
        // DERIVED bucket id — a pure function of the row (see
        // [[RangeBuckets]]), never spark_partition_id(): an
        // execution-derived pid let the re-planned correction subtrees
        // disagree with the row-level tree about row placement
        // (RangePartitioner re-samples bounds per expansion), observed
        // as stale carries. Pure-function ids are consistent across
        // every expansion by construction; the window's hash exchange
        // on (__pid, keys) does the distribution.
        val nParts = unioned.sparkSession.sessionState.conf.numShufflePartitions
        val ranged = unioned.withColumn("__pid",
          RangeBuckets.bucketCol(unioned,
            keyCols.map(col) :+ col("__ts") :+ col("__side"), nParts))
          .transform(RangeBuckets.maybePersist) // perf-only (A/B: GRAFT_PREFIX_PERSIST=0)
        val wL = Window.partitionBy("__pid", keyCols: _*)
          .orderBy(ordering: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // carries travel as (ts, payload) structs compared
        // lexicographically: equal-ts right rows can SPLIT across a
        // partition boundary, so "greatest tuple wins" must be decided
        // by struct max across partitions, not by partition order alone
        val tagged = when(col("__side") === 0,
          struct(col("__ts").as("__t"), col("__rv").as("__v")))
        // per-(pid, key) exit carry = greatest right row in the
        // partition; keys confined to one partition need no correction,
        // so the boundary table keeps only spanning keys — at most
        // partitions-1 of them, broadcastable at any scale
        val exits = ranged.groupBy((col("__pid") +: keyCols.map(col)): _*)
          .agg(max(tagged).as("__exit"))
        val spanning = exits.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("__np")).filter(col("__np") > 1)
          .select(keyCols.map(col): _*)
        val wPid = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pid"))
        val carriedIn = exits.join(spanning, keyCols, "left_semi")
          .withColumn("__in",
            max(col("__exit")).over(wPid.rowsBetween(Window.unboundedPreceding, -1)))
          .select((col("__pid") +: keyCols.map(col) :+ col("__in")): _*)
        ranged
          .withColumn("__loc", last(tagged, ignoreNulls = true).over(wL))
          .join(broadcast(carriedIn), "__pid" +: keyCols, "left")
          .withColumn("__rv", greatest(col("__loc"), col("__in")).getField("__v"))
          .drop("__pid", "__in", "__loc")
      }
    carried
      .filter(col("__side") === 1)
      .withColumnRenamed("__ts", leftTsCol)
      .select(leftCols.map(col) ++
        rightValCols.map(c => col(s"__rv.`$c`").as(c.toString)): _*)
  }
}
