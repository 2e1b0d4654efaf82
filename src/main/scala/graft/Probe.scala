package graft

// scratch diagnostic main — not part of the library surface
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

object Probe {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "q36_sessionize"
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(q)
    fn(spark, sf).count() // warm
    spark.catalog.clearCache()
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Seq[Int])]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.put(si.stageId, (si.name.take(60), dur, si.numTasks))
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, 0L, js.stageIds))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (s, _, ids) =>
          jobs.put(je.jobId, (s, je.time, ids)) }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sf).count()
    println(f"[probe] $q total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (jid, (s, e, ids)) =>
      println(f"[probe] job $jid%3d ${(e - s) / 1e3}%6.2f s  stages=${ids.mkString(",")}")
      ids.sorted.foreach { sid =>
        Option(stages.get(sid)).foreach { case (name, dur, nt) =>
          println(f"[probe]     stage $sid%3d ${dur / 1e3}%6.2f s  tasks=$nt%3d  $name")
        }
      }
    }
    spark.stop()
  }
}
