package graft.bench

import org.apache.spark.sql.SparkSession

/** Targeted 10x A/B for the pageRank round shape (round-14 adjudication;
  * see OPTIMIZATION_r14.md). Runs pageRank on the ScaleCheck synthetic
  * graph at the given scale N times and prints each timing. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val scale = if (args.nonEmpty) args(0).toInt else 10
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = ScaleCheck.syntheticGraph(spark, scale)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      graft.algos.GraphAlgorithms.pageRank(g, 10).count()
      println(f"[prprobe] scale=${scale}x rep$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
