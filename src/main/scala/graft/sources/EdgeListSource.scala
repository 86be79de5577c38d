package graft.sources

import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}
import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whitespace edge-list reader: every line `src dst` becomes a `:E`
  * relationship between `:V` nodes — parity with the reference's
  * EdgeListDataSource
  * (flink-cypher/.../api/io/edgelist/EdgeListDataSource.scala:56-91).
  * Comment lines starting with '#' or '%' are skipped.
  */
object EdgeListSource {
  def load(spark: SparkSession, path: String): PropertyGraph = {
    val raw = spark.read
      .schema(StructType(Seq(StructField("line", StringType))))
      .option("lineSep", "\n").csv(path)
      .filter(!col("line").startsWith("#") && !col("line").startsWith("%") &&
        F.length(trim(col("line"))) > 0)
    val edges = raw.select(
        F.split(trim(col("line")), "\\s+").as("parts"))
      .select(element_at(col("parts"), 1).cast(LongType).as("src"),
        element_at(col("parts"), 2).cast(LongType).as("dst"))
      .withColumn("id", monotonically_increasing_id())
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct()
    PropertyGraph(
      Seq(NodeTableDef(Set("V"), nodes, "id", Map.empty, "v")),
      Seq(RelTableDef("E", edges, "id", "src", "dst", Map.empty,
        "e", "v", "v")))
  }
}
