package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection / single-query profiling:
  * `runMain graft.Explain <sfDir> <queryName>[,name2...] [--explain]`
  * Times each named query (after a warm-up run of a trivial job) and
  * optionally dumps the formatted physical plan.
  *
  * Alongside wall time (noisy on a shared sandbox — BASELINE.md documents
  * ±40% single-run spread) it prints DETERMINISTIC structural metrics per
  * execution — jobs, stages, tasks, shuffle read/write bytes — via a
  * SparkListener: plan-shape regressions/improvements show up exactly,
  * independent of sandbox weather (guide §1: decide from the structure,
  * confirm with the bench). */
object Explain {
  /** Cumulative counters; a query's figures are deltas between markers. */
  private class Meter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
      shufRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    def snap: (Long, Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, shufRead.get, shufWrite.get)
  }

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
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (doExplain) {
        println(s"===== $name plan =====")
        fn(spark, sfDir).explain("formatted")
      }
      val before = meter.snap
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async — poll until the counters stabilize,
      // BOUNDED (round-16 advice): concurrent Spark activity (e.g. a
      // leaked streaming query) emitting events forever must not hang
      // the profiler — report possibly-unsettled counters instead
      var after = meter.snap
      var settled = false
      var polls = 0
      while (!settled && polls < 20) {
        Thread.sleep(150)
        val again = meter.snap
        settled = again == after
        after = again
        polls += 1
      }
      if (!settled)
        println(s"===== $name: WARNING listener counters still moving " +
          "after 3 s — figures below may include concurrent activity")
      println(f"===== $name: $dt%.2f s, $n rows, " +
        f"jobs=${after._1 - before._1} stages=${after._2 - before._2} " +
        f"tasks=${after._3 - before._3} " +
        f"shufR=${(after._4 - before._4) / 1048576.0}%.1fMB " +
        f"shufW=${(after._5 - before._5) / 1048576.0}%.1fMB")
      // Bench parity: drop operator-internal persists between queries so
      // repeated names measure warm plans, not accumulated caches
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
