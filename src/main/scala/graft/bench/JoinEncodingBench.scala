package graft.bench

import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel



/** One-shot reproduction of the reference's id-encoding join
  * micro-benchmark (morpheus-jmh/.../JoinBenchmark.scala:38-110) to
  * validate this engine's long-id choice with a measured number —
  * promised in BASELINE.md since round 1.
  *
  * Same shape as the reference: left = 100k random + 10k join keys,
  * right = 10k random + 10k join keys, 10 partitions, MEMORY_ONLY cache,
  * inner equi-join + count. Five encodings: long, array<long>, naive
  * decimal string, byte array (binary), and binary-cast string. The
  * reference runs it under JMH AverageTime; no JMH here, so a hand-rolled
  * warmup + measured-average loop stands in (micro-second fidelity is not
  * the point — the ORDERING and the rough ratio between encodings are).
  *
  * Run: sbt "runMain graft.bench.JoinEncodingBench"
  */
object JoinEncodingBench {
  private val IdCol = "id"
  private val Warmup = 3
  private val Measured = 7

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[*]")
      .config("spark.sql.shuffle.partitions", "10")
      .config("spark.ui.enabled", "false")
      // The reference benchmarks the shuffle-join path on pre-partitioned
      // cached inputs; disable auto-broadcast so the 20k side is not
      // broadcast away (JMH-era Spark 2.x had the same plan shape).
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SCALE=1 is the reference's exact shape (110k x 20k). At that size
    // the join is ~50 ms of real work under ~400 ms of fixed job overhead
    // and run-to-run noise swamps the encodings; SCALE=100 (11M x 2M)
    // makes the probe/build sides dominate and separates them. Inputs are
    // generated DISTRIBUTED (spark.range + column transforms, never a
    // driver-side List) so the large scale fits; random non-matching keys
    // come from xxhash64 over disjoint ranges (hash outputs never land in
    // the 10k*scale join window above 10^9 in practice — counts are
    // asserted stable across runs, which would catch a collision).
    import org.apache.spark.sql.functions._
    val scale = sys.env.getOrElse("SCALE", "1").toInt
    val rangeStart = 1000000000L
    val joinN = 10000L * scale

    def base(randomN: Long, seedTag: Int): DataFrame =
      spark.range(randomN).select(
          xxhash64(col("id"), lit(seedTag)).as(IdCol))
        .unionAll(spark.range(rangeStart, rangeStart + joinN)
          .select(col("id").as(IdCol)))
    val leftBase = base(100000L * scale, 1)
    val rightBase = base(10000L * scale, 2)

    def partitionAndCache(df: DataFrame): DataFrame = {
      val cached = df.repartition(10).persist(StorageLevel.MEMORY_ONLY)
      cached.count()
      cached
    }
    // Encodings as column transforms of the long id: array wrap, decimal
    // string, big-endian 8-byte binary (hex round-trip), binary->string.
    val longBytes = unhex(lpad(hex(col(IdCol)), 16, "0"))
    val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("long", identity[DataFrame]),
      ("array_long", _.select(array(col(IdCol)).as(IdCol))),
      ("naive_string", _.select(col(IdCol).cast(StringType).as(IdCol))),
      ("byte_array", _.select(longBytes.as(IdCol))),
      ("binary_cast_string",
        _.select(longBytes.cast(StringType).as(IdCol))))

    val results = variants.map { case (name, enc) =>
      val l = partitionAndCache(enc(leftBase))
      val r = partitionAndCache(enc(rightBase))
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = l.join(r, IdCol).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      (1 to Warmup).foreach(_ => once())
      val runs = (1 to Measured).map(_ => once())
      val counts = runs.map(_._1).distinct
      require(counts.size == 1, s"$name: unstable count $counts")
      val avg = runs.map(_._2).sum / Measured
      System.err.println(f"[join-bench] $name%-20s avg $avg%7.4f s  " +
        f"(count ${counts.head}%d)")
      l.unpersist(); r.unpersist()
      name -> avg
    }
    val longAvg = results.head._2
    val js = results.map { case (n, v) =>
      f""""$n":{"avg_sec":$v%.4f,"vs_long":${v / longAvg}%.2f}"""
    }.mkString(",")
    println(s"""{"bench":"join_id_encoding","warmup":$Warmup,""" +
      s""""measured":$Measured,$js}""")
    spark.stop()
  }
}
