package graft

/** Scratch auditor: times + explains selected SparkEntry queries at a given
  * scale factor; not part of the public API. Usage:
  *   sbt "Test/runMain graft.PlanAudit q_multi_type q_expand_undirected"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q_multi_type", "q_expand_undirected")
    val explain = !sys.env.contains("NO_EXPLAIN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (explain) {
        println(s"===== $n — formatted plan =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      // warm the scan cache once, then time 3 runs
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[audit] $n%-24s run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$c")
      }
    }
    spark.stop()
  }
}
