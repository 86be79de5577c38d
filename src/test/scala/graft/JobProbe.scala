package graft

import graft.algos.GraphAlgorithms
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: count driver-visible jobs per iterative-loop round to
  * locate the two-jobs-per-round shape VERDICT r13 #1 names. Not part of
  * the library surface. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
    })
    def probe(name: String)(f: => Unit): Unit = {
      Thread.sleep(200); val j0 = jobs; val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[jobs] $name%-34s jobs=${jobs - j0}%4d  $sec%7.2f s")
    }

    val e = graft.impl.Pin(graft.bench.ScaleCheck.syntheticEdges(spark, 1))
    e.count()
    val g = graft.bench.ScaleCheck.syntheticGraph(spark, 1)
    val sources8 = spark.range(8).select((col("id") * 7919L).as("id"))

    // micro: count() vs agg().head() on a fresh lazy pin
    val base = spark.range(2000000).select(col("id"),
      pmod(xxhash64(col("id")), lit(97)).as("k"))
    probe("pin.count()") {
      graft.impl.Pin(base.groupBy("k").agg(count(lit(1)).as("n"))).count()
    }
    probe("pin.agg(count).head") {
      graft.impl.Pin(base.groupBy("k").agg(count(lit(1)).as("n")))
        .agg(count(lit(1))).head()
    }
    probe("pin filter-derived count") {
      val p = graft.impl.Pin(base.groupBy("k").agg(count(lit(1)).as("n")))
      p.filter(col("n") > 10).count()
    }
    probe("pin agg-when folded") {
      val p = graft.impl.Pin(base.groupBy("k").agg(count(lit(1)).as("n")))
      p.agg(count(when(col("n") > 10, lit(1)))).head()
    }

    probe("sssp (folded, 8 src)") {
      GraphAlgorithms.sssp(g, sources8, Map("E" -> 1.0),
        maxIterations = 60).count()
    }
    probe("betweenness 8 src") {
      GraphAlgorithms.betweenness(e, sources8).count()
    }
    probe("kcore k=3") { GraphAlgorithms.kCoreEdges(e, 3).count() }
    probe("components") {
      GraphAlgorithms.connectedComponents(g).count()
    }
    probe("labelprop") {
      GraphAlgorithms.labelPropagation(g, Seq("E"), 5).count()
    }
    spark.stop()
  }
}
