package graft

import graft.pipeline.{Decontaminate, Dedup}
import org.apache.spark.sql.functions._

/** Scratch profiler for the decontamination stages; not part of the API. */
object DecontProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs count")(docs.count())
    // Hypothesis: inlined norm re-evaluates per lambda element; hoisting it
    // into a projected column should collapse the per-gram cost.
    val hoisted = docs
      .withColumn("_norm", lower(regexp_replace(col("text"), "\\s+", " ")))
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(0), greatest(length(col("_norm")) - 20, lit(0))),
        i => col("_norm").substr(i + 1, lit(20))))).as("_g"))
    time("hoisted-norm 20-gram count")(hoisted.count())
    time("hoisted-norm again")(hoisted.count())
    val explode5 = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 5)).as("_g"))
    time("explode 5-gram count")(explode5.count())
    val explode20 = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 20)).as("_g"))
    time("explode 20-gram count")(explode20.count())
    time("explode 20-gram again")(explode20.count())
    val hashed = explode20.select(col("doc_id"), xxhash64(col("_g")).as("_gh"))
    time("hash count")(hashed.count())
    time("distinct-per-doc")(hashed.groupBy("doc_id")
      .agg(count_distinct(col("_gh"))).count())
    time("full flag")(Decontaminate.flag(
      docs.filter(pmod(col("doc_id"), lit(47)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(47)) === 0),
      "doc_id", "text", 20, 1).count())
    spark.stop()
  }
}
