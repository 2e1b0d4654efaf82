package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, explode_outer}

/** Parallelism guard for compute-heavy passes over few-split inputs.
  *
  * Spark's scan parallelism is a property of the data layout: a
  * single-row-group parquet file (or a gzip text file) yields ONE input
  * partition, and every map-side stage before the first exchange — shingle
  * hashing, LSH sketches, tokenize+stem, quantizer encode, a cross-join's
  * stream side — then runs on one core no matter how wide the cluster is.
  * When the scan yields fewer partitions than the cluster's parallelism,
  * redistribute rows once: a linear shuffle of the input buys full-width
  * execution of the (much heavier) downstream compute.
  *
  * At production scale inputs arrive in thousands of splits and this is a
  * no-op — the check costs plan analysis only, no job. */
object Par {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

/** `explode` over an EXPENSIVE generator child, evaluated exactly once.
  *
  * Catalyst's `InferFiltersFromGenerate` wraps a non-outer generate in a
  * `size(child) > 0 AND isnotnull(child)` filter, and predicate pushdown
  * then substitutes the child expression through any alias — so an
  * explode over a kernel (centroid assignment, pair expansion, LSH
  * sketch, tokenize+stem) evaluates it up to three times per row; for
  * `sorted_pairs`/`hamming_pairs` the "size check" alone expands the full
  * pair array of every bucket. OUTER generates are exempt from the rule,
  * so: outer-explode, then drop the null rows the outer form adds back
  * for empty/null arrays. Identical semantics to `explode` whenever array
  * ELEMENTS are non-null, which holds for every kernel output here. */
object Gen {
  def explodeOnce(df: DataFrame, keep: Seq[Column], gen: Column, alias: String): DataFrame =
    df.select(keep :+ explode_outer(gen).as(alias): _*)
      .filter(col(alias).isNotNull)
}
