package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One-time graph preparation (surrogate-id assignment + persist of the
    // lineitem element table) — setup cost, reported separately so the
    // per-query numbers reflect steady-state latency.
    val tPrep = System.nanoTime()
    val g = graft.tpch.TpchGraph(spark, sfDir)
    g.relTables.last.df.count()
    // Recall-gate ground truth (exact near-dup pairs) is shared test
    // fixture, not an operator under test — warm it here so gated rows
    // (q_dedup_minhash/simhash) measure the operator.
    graft.pipeline.PipelineQueries.warmGates(spark, sfDir)
    val prepSec = (System.nanoTime() - tPrep) / 1e9
    System.err.println(f"[bench] prepare: $prepSec%.2f s")
    // Optional comma-separated filter for local iteration on specific queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"prepare_sec":$prepSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
