package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiling harness — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.tpch.TpchGraph(spark, sfDir)
    g.relTables.last.df.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[scratch] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  ($n rows)")
    }
    for (round <- 1 to 3) {
      System.err.println(s"--- round $round")
      time("pagerank") {
        SparkEntry.queries("q_algo_pagerank")(spark, sfDir).count()
      }
      time("components") {
        SparkEntry.queries("q_algo_components")(spark, sfDir).count()
      }
      time("varexpand") {
        SparkEntry.queries("q_varexpand")(spark, sfDir).count()
      }
      time("varexpand_deep") {
        SparkEntry.queries("q_varexpand_deep")(spark, sfDir).count()
      }
      time("dedup_minhash") {
        SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count()
      }
      time("dedup_simhash") {
        SparkEntry.queries("q_dedup_simhash")(spark, sfDir).count()
      }
      time("sim_ivf") {
        SparkEntry.queries("q_sim_ivf")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
