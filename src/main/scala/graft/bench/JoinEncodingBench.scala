package graft.bench

import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import scala.util.Random

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

    val rnd = new Random(42)
    val rangeStart = 1000000000L
    val joinRange = (0 until 10000).map(_.toLong + rangeStart)
    val leftData = List.fill(100000)(rnd.nextLong()) ++ joinRange
    val rightData = List.fill(10000)(rnd.nextLong()) ++ joinRange

    def partitionAndCache(df: DataFrame): DataFrame = {
      val cached = df.repartition(10).persist(StorageLevel.MEMORY_ONLY)
      cached.count()
      cached
    }
    def longToBytes(l: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(l).array()

    import spark.implicits._
    def longDf(d: List[Long]) = partitionAndCache(d.toDF(IdCol))
    def arrDf(d: List[Long]) = partitionAndCache(d.map(Array(_)).toDF(IdCol))
    def strDf(d: List[Long]) = partitionAndCache(d.map(_.toString).toDF(IdCol))
    def binDf(d: List[Long]) = partitionAndCache(d.map(longToBytes).toDF(IdCol))
    def binStrDf(d: List[Long]) = partitionAndCache(
      d.map(longToBytes).toDF(IdCol)
        .select(org.apache.spark.sql.functions.col(IdCol)
          .cast(StringType).as(IdCol)))

    val variants: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("long", longDf(leftData), longDf(rightData)),
      ("array_long", arrDf(leftData), arrDf(rightData)),
      ("naive_string", strDf(leftData), strDf(rightData)),
      ("byte_array", binDf(leftData), binDf(rightData)),
      ("binary_cast_string", binStrDf(leftData), binStrDf(rightData)))

    val results = variants.map { case (name, l, r) =>
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
      name -> avg
    }
    val base = results.head._2
    val js = results.map { case (n, v) =>
      f""""$n":{"avg_sec":$v%.4f,"vs_long":${v / base}%.2f}"""
    }.mkString(",")
    println(s"""{"bench":"join_id_encoding","warmup":$Warmup,""" +
      s""""measured":$Measured,$js}""")
    spark.stop()
  }
}
