package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection / single-query profiling:
  * `runMain graft.Explain <sfDir> <queryName>[,name2...] [--explain]`
  * Times each named query (after a warm-up run of a trivial job) and
  * optionally dumps the formatted physical plan. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (doExplain) {
        println(s"===== $name plan =====")
        fn(spark, sfDir).explain("formatted")
      }
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"===== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      // Bench parity: drop operator-internal persists between queries so
      // repeated names measure warm plans, not accumulated caches
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
