package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-14 attribution probe: for each named registry query, run it the
  * way Bench does (fn(...).count()) and report wall seconds, driver-visible
  * jobs, stages, tasks, and total shuffle bytes written — the shape signals
  * the optimization round steers by (guide §1/§2). Two passes per query,
  * min wall time reported, second pass's job/stage counts kept (steady
  * state). Not part of the library surface.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.bench.R14Probe q1,q2,...
  */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // A/B experiment hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" overlays
    // session conf so config candidates are measured before landing in
    // Bench (guide §1.2 step 3 — config last, measured).
    val builder = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .collect { case Array(k, v) => (k.trim, v.trim) }
      .foldLeft(builder0) { case (b, (k, v)) => b.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized { stages += 1 }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        tasks += 1
        val m = te.taskMetrics
        if (m != null) shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      }
    })

    // Same one-time prep as Bench (graph ids + recall-gate fixtures).
    val g = graft.tpch.TpchGraph(spark, sfDir)
    g.relTables.last.df.count()
    graft.pipeline.PipelineQueries.warmGates(spark, sfDir)

    val names = if (args.nonEmpty) args(0).split(",").map(_.trim).toSeq
      else Seq.empty
    val reg = graft.SparkEntry.queries
    println(f"${"query"}%-28s ${"sec1"}%8s ${"sec2"}%8s ${"jobs"}%5s " +
      f"${"stages"}%7s ${"tasks"}%7s ${"shufMB"}%8s")
    names.foreach { name =>
      reg.get(name) match {
        case None => System.err.println(s"[probe] unknown query: $name")
        case Some(fn) =>
          def run(): (Double, Int, Int, Long, Double) = {
            Thread.sleep(150)
            val (j0, s0, t0, w0) = (jobs, stages, tasks, shuffleWrite)
            val n0 = System.nanoTime()
            fn(spark, sfDir).count()
            val sec = (System.nanoTime() - n0) / 1e9
            Thread.sleep(150)
            (sec, jobs - j0, stages - s0, tasks - t0,
              (shuffleWrite - w0) / 1e6)
          }
          try {
            val r1 = run(); val r2 = run()
            println(f"$name%-28s ${r1._1}%8.2f ${r2._1}%8.2f ${r2._2}%5d " +
              f"${r2._3}%7d ${r2._4}%7d ${r2._5}%8.1f")
          } catch { case e: Throwable =>
            println(s"$name FAILED: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
          }
      }
    }
    spark.stop()
  }
}
