package graft.bench

import org.apache.spark.sql.SparkSession

/** Scratch calibration main for the Bench barrier sentinel: prints N
  * consecutive readings so a quiet floor can be committed. Not part of any
  * gate; kept for re-calibration when the machine profile changes. */
object BarrierProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def barrierSentinel(): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 3) {
        spark.range(0L, 1000000L, 1L, cpus.toInt)
          .selectExpr("id % 101 AS k").groupBy("k").count()
          .selectExpr("sum(count)").collect()
        i += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val vals = (1 to n).map { i =>
      val v = barrierSentinel()
      println(f"[probe] barrier $i%02d: $v%.3f s")
      v
    }
    println(f"[probe] min ${vals.min}%.3f  median ${vals.sorted.apply(n / 2)}%.3f")
    spark.stop()
  }
}
