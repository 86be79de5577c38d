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
    import graft.algos.GraphAlgorithms._
    for (round <- 1 to 3) {
      System.err.println(s"--- round $round")
      time("nodeIds")          { nodeIds(g).count() }
      time("edges(pr-types)")  { edges(g, Seq("IN_REGION", "FROM_NATION", "PLACED")).count() }
      time("edges(cc-types)")  { edges(g, Seq("IN_REGION", "FROM_NATION")).count() }
      time("pagerank it=1")    { pageRank(g, 1, relTypes = Seq("IN_REGION", "FROM_NATION", "PLACED")).count() }
      time("pagerank it=3")    { pageRank(g, 3, relTypes = Seq("IN_REGION", "FROM_NATION", "PLACED")).count() }
      time("components max=1") { connectedComponents(g, Seq("IN_REGION", "FROM_NATION"), maxIterations = 1).count() }
      time("components full")  { connectedComponents(g, Seq("IN_REGION", "FROM_NATION")).count() }
    }
    spark.stop()
  }
}
