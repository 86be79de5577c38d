package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Benchmark main: per-query wall time over SPARK_GRAFT_SF_DIR, printed as
  * one JSON line.
  *
  * The harness defends itself against noisy neighbours on a shared machine
  * (a contention window once inflated unchanged trivial rows 3-6x): every
  * query runs twice and reports the per-row MIN, and a cheap q_scan sentinel
  * brackets each group of rows — when the sentinel drifts >2x from its quiet
  * baseline the whole group is re-run (bounded), with per-row retry counts
  * and a `contaminated` flag recorded in the JSON so a polluted artifact is
  * visible instead of silently wrong.
  */
object Bench {
  private val GroupSize = 6
  private val MaxWindowRetries = 2
  /** Committed quiet-machine reference for the q_scan sentinel (BASELINE.md).
    * The run-start sentinel sample is compared against THIS, not against
    * itself — a run that begins inside a contention window must not certify
    * its own inflated base as "quiet" (the round-6 artifact failure mode). */
  private val QuietScanRefSec = 0.06
  private val BornContendedFactor = 3.0
  private val CalmWaitMs = 30000L
  private val MaxCalmWaits = 4

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

    // A failed query must surface as an error row, never as a (fast-looking)
    // timing: analysis failures die in ~80 ms and would otherwise read as
    // healthy 0.08 s entries in the artifact.
    val errors = mutable.LinkedHashMap.empty[String, String]
    // None on failure — a time-to-failure is not a measurement and must
    // never fold into a per-row min.
    def time(name: String, fn: (SparkSession, String) => DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        errors.remove(name)
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[bench] $name failed: $msg")
        errors(name) = msg.replaceAll("[\"\\\\\n\r\t]", " ").take(200)
        None
      }
    }

    // Sentinel: a trivial fixed query bracketing each group of rows; drift
    // measures machine contention, not engine behavior. The base is accepted
    // only once it lands within BornContendedFactor of the COMMITTED quiet
    // reference — a self-sampled base from inside a contention window would
    // certify the whole polluted run as clean.
    val sentinelFn = SparkEntry.queries("q_scan")
    def sentinel(): Double =
      time("q_scan(sentinel)", sentinelFn).getOrElse(Double.MaxValue)
    sentinel() // warm parquet footer/page cache
    var sentBase = math.min(sentinel(), sentinel())
    var calmWaits = 0
    while (sentBase > BornContendedFactor * QuietScanRefSec &&
        calmWaits < MaxCalmWaits) {
      System.err.println(f"[bench] run-start sentinel $sentBase%.3f s vs quiet " +
        f"ref $QuietScanRefSec%.3f s - machine contended, waiting ${CalmWaitMs / 1000}%d s")
      Thread.sleep(CalmWaitMs)
      sentBase = math.min(sentinel(), sentinel())
      calmWaits += 1
    }
    val bornContended = sentBase > BornContendedFactor * QuietScanRefSec
    if (bornContended)
      System.err.println(f"[bench] STILL contended after $calmWaits%d waits " +
        f"(sentinel $sentBase%.3f s) - artifact will be marked contaminated")
    System.err.println(f"[bench] sentinel baseline: $sentBase%.3f s")

    // Optional comma-separated filter for local iteration on specific queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    val best = mutable.LinkedHashMap.empty[String, Double]
    val retries = mutable.LinkedHashMap.empty[String, Int]
    var contaminated = bornContended
    all.grouped(GroupSize).foreach { group =>
      def pass(): Unit = group.foreach { case (name, fn) =>
        time(name, fn).foreach { dt =>
          best(name) = best.get(name).fold(dt)(math.min(_, dt))
        }
      }
      pass(); pass() // per-row min of two passes
      var tries = 0
      var s = sentinel()
      while (s > 2 * sentBase && tries < MaxWindowRetries) {
        System.err.println(f"[bench] sentinel drift $s%.3f s vs $sentBase%.3f s " +
          s"- re-running window ${group.head._1}..${group.last._1}")
        group.foreach { case (n, _) => retries(n) = retries.getOrElse(n, 0) + 1 }
        pass()
        tries += 1
        s = sentinel()
      }
      if (s > 2 * sentBase) contaminated = true
      group.foreach { case (name, _) =>
        best.get(name) match {
          case Some(v) => System.err.println(f"[bench] $name%-24s $v%8.2f s")
          case None => System.err.println(f"[bench] $name%-24s   FAILED")
        }
      }
    }

    // Errored queries are excluded from the timings map (their elapsed is
    // the time-to-failure, not a measurement) and reported separately.
    // Timings are rounded to ms and empty maps omitted: the downstream
    // capture window truncated a ~10 KB line of 9-decimal doubles once
    // (round 9), so the artifact line is kept deliberately small.
    def ms(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = best.filterNot { case (k, _) => errors.contains(k) }
      .map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val rj = if (retries.isEmpty) "" else
      retries.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString(""","retries":{""", ",", "}")
    val ej = if (errors.isEmpty) "" else
      errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
        .mkString(""","errors":{""", ",", "}")
    val total = best.filterNot { case (k, _) => errors.contains(k) }.values.sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,""" +
      s""""prepare_sec":${ms(prepSec)},"sentinel_base_sec":${ms(sentBase)},""" +
      s""""quiet_scan_ref_sec":$QuietScanRefSec$ej,""" +
      s""""passes":2$rj,"contaminated":$contaminated,"sf":"$sfDir"}""")

    // FINAL summary line, guaranteed <= 1.5 KB. The downstream capture keeps
    // only the last 2000 characters of stdout (measured: BENCH_r10.json tail
    // length = exactly 2000), and the full per-query line above is ~3.4 KB at
    // 147 rows — its front gets cut off and it never parses. This compact
    // trailer (total + top-10 slowest rows) always fits inside the window
    // even after sbt's "[success]" trailer (~80 chars). The full map stays on
    // the line above for committed local artifacts.
    val ok = best.filterNot { case (k, _) => errors.contains(k) }
    val slowest = ok.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val summary =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$slowest,""" +
      s""""n":${ok.size},"error_count":${errors.size},""" +
      s""""prepare_sec":${ms(prepSec)},"sentinel_base_sec":${ms(sentBase)},""" +
      s""""quiet_scan_ref_sec":$QuietScanRefSec,"contaminated":$contaminated,""" +
      s""""sf":"$sfDir","summary":true}"""
    // Hard guarantee: if a pathological row name ever inflates the line past
    // the budget, drop the slowest map rather than risk a cut-off front.
    val budget = 1500
    println(if (summary.length <= budget) summary else
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":{},""" +
      s""""n":${ok.size},"error_count":${errors.size},""" +
      s""""contaminated":$contaminated,"sf":"$sfDir","summary":true}""")
    spark.stop()
  }
}
