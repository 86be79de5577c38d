package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for pipeline stages; not part of the public API. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("simhash cold")(graft.pipeline.Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    time("simhash warm")(graft.pipeline.Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    time("simhashes only")(graft.pipeline.Dedup.simhashes(docs, "doc_id", "text").count())
    time("docs count")(docs.count())
    val shingled = docs.repartition(32, col("doc_id"))
      .select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 5)).as("_sh"))
    time("shingle explode count")(shingled.count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 64, 5)
    time("signatures")(sigs.count())
    val sigs2 = sigs.persist()
    time("signatures persist")(sigs2.count())
    time("full minhashLsh")(
      Dedup.minhashLsh(docs, "doc_id", "text").count())
    time("full minhashLsh again")(
      Dedup.minhashLsh(docs, "doc_id", "text").count())
    spark.stop()
  }
}
