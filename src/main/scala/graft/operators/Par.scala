package graft.operators

import org.apache.spark.sql.DataFrame

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
