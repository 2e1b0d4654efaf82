package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)         => (s, o, None)
      case Array(s, o, filter) => (s, o, Some(filter.split(',').map(_.trim).toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A failing query must still produce exactly one artifact row:
        // write an explicit error marker where the parquet would be, so
        // the driver's gate records `err` instead of silently dropping
        // the query from CORRECTNESS (round-8 verdict finding #2).
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val dir = new java.io.File(s"$outDir/$name")
        deleteRecursively(dir)
        dir.mkdirs()
        val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(2000)}"
        Files.writeString(Paths.get(s"$outDir/$name/error.json"),
          s"""{"query": ${jsonQuote(name)}, "error": ${jsonQuote(msg)}}""")
      }
      // drop operator-internal persisted frames between queries
      spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // stamp the artifact dir: several oracles replay /tmp/graft_artifacts
    // parquet written by THIS run — a later run at a different SF
    // overwrites them, and a comparison against these outputs would then
    // silently mismatch. The stamp records a content fingerprint
    // (file count + max mtime, excluding the stamp itself) so ANY later
    // rewrite is detected — including a Bench run, which executes the
    // same query lambdas and rewrites the artifacts without going
    // through Verify (the out_dir check alone missed that).
    try {
      val root = Paths.get("/tmp/graft_artifacts")
      val walk = Files.walk(root)
      val (count, maxMtime) = try {
        import scala.jdk.CollectionConverters._
        val files = walk.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.getFileName.toString != "VERIFY_STAMP")
          .toSeq
        (files.size, files.map(Files.getLastModifiedTime(_).toMillis).maxOption.getOrElse(0L))
      } finally walk.close()
      Files.writeString(root.resolve("VERIFY_STAMP"),
        s"""{"out_dir": ${jsonQuote(outDir)}, "sf_dir": ${jsonQuote(sfDir)}, "epoch_ms": ${System.currentTimeMillis()}, "artifacts_fingerprint": "$count:$maxMtime"}""")
    } catch { case _: Throwable => () }
    // exact-ground-truth gates for the no-oracle queries (LSH/ANN/PQ/CC):
    // recorded next to the parquet so the round's correctness artifact
    // reflects what is actually verified, not just row counts
    if (only.isEmpty) {
      try Files.writeString(Paths.get(s"$outDir/quality_gates.json"),
        QualityGates.run(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[verify] quality gates failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
