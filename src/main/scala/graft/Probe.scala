package graft

// scratch diagnostic main — not part of the library surface
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

object Probe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val thresh = if (args.length > 1) args(1) else "128"
    val dim = 768
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thresh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val genUdf = udf { (id: Long) =>
      val c = (id % 64).toInt
      Array.tabulate(dim) { d =>
        val base = if (d % 64 == c) 4.0 else 0.0
        val h = graft.functions.HashKernels.mix64(id * 131071L + d)
        base + (h.toDouble / Long.MaxValue.toDouble)
      }
    }
    val emb = spark.range(n.toLong).select(col("id").as("vec_id"),
      genUdf(col("id")).as("embedding"))
      .repartition(32).persist()
    emb.count()

    def time[T](label: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t) / 1e9}%.1f s"); r
    }

    val nc = math.max(16, (1500.0 * n / 1000000.0).toInt)
    val graph = time("knnGraph full") {
      Ann.knnGraph(emb, k = 10, numCentroids = nc, nprobe = 8)
    }
    time("graph.count")(println("edges=" + graph.count()))
    spark.stop()
  }
}
