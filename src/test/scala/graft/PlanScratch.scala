package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary plan-audit harness — not part of the library surface.
object PlanScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      println(s"===== $name")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
    }
  }
}
