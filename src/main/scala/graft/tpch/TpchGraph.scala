package graft.tpch

import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** The driver-provided TPC-H-ish tables as a property graph.
  *
  * Node labels: Region, Nation, Customer, Supplier, Part, Order, LineItem.
  * Relationships:
  *   (Nation)-[:IN_REGION]->(Region)
  *   (Customer)-[:FROM_NATION]->(Nation)
  *   (Supplier)-[:FROM_NATION]->(Nation)   // same type from two tables:
  *                                         // exercises multi-table type scans
  *   (Customer)-[:PLACED]->(Order)
  *   (Order)-[:HAS_ITEM]->(LineItem)
  *   (LineItem)-[:OF_PART]->(Part)
  *   (LineItem)-[:BY_SUPPLIER]->(Supplier)
  *
  * LineItem ids pack (orderkey, linenumber) into one long; every id space
  * gets its own tag byte inside PropertyGraph.
  */
object TpchGraph {
  private val cache = TrieMap.empty[String, PropertyGraph]

  def apply(spark: SparkSession, sfDir: String): PropertyGraph =
    cache.getOrElseUpdate(sfDir, build(spark, sfDir))

  private def allProps(df: DataFrame, except: Seq[String]): Map[String, String] =
    df.columns.filterNot(except.contains).map(c => c -> c).toMap

  private def build(spark: SparkSession, sfDir: String): PropertyGraph = {
    def read(t: String): DataFrame = spark.read.parquet(s"$sfDir/$t.parquet")
    val region = read("region")
    val nation = read("nation")
    val customer = read("customer")
    val supplier = read("supplier")
    val part = read("part")
    val orders = read("orders")
    // LineItem id packs (orderkey, linenumber, ordinal): the synthetic data
    // contains duplicate (l_orderkey, l_linenumber) pairs, so a per-pair
    // row_number disambiguates. The window is partitioned by the pair —
    // distributed-friendly (no global sort) and deterministic because the
    // ordering covers every column.
    val liRaw = read("lineitem")
    val liWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"), col("l_linenumber"))
      .orderBy(liRaw.columns.map(col): _*)
    // Persisted: the id-assigning window would otherwise recompute in every
    // query that touches LineItem (the node table and three rel tables all
    // derive from this frame). At cluster scale this materialization is the
    // one-off "assign surrogate ids" preparation step.
    val lineitem = liRaw
      .withColumn("_li_id",
        col("l_orderkey") * 128 + col("l_linenumber") * 16 +
          row_number().over(liWin))
      .persist()

    val nodes = Seq(
      NodeTableDef(Set("Region"), region, "r_regionkey",
        allProps(region, Seq.empty), "region"),
      NodeTableDef(Set("Nation"), nation, "n_nationkey",
        allProps(nation, Seq.empty), "nation"),
      NodeTableDef(Set("Customer"), customer, "c_custkey",
        allProps(customer, Seq.empty), "customer"),
      NodeTableDef(Set("Supplier"), supplier, "s_suppkey",
        allProps(supplier, Seq.empty), "supplier"),
      NodeTableDef(Set("Part"), part, "p_partkey",
        allProps(part, Seq.empty), "part"),
      NodeTableDef(Set("Order"), orders, "o_orderkey",
        allProps(orders, Seq.empty), "orders"),
      NodeTableDef(Set("LineItem"), lineitem, "_li_id",
        allProps(lineitem, Seq("_li_id")), "lineitem"))

    val rels = Seq(
      RelTableDef("IN_REGION", nation, "n_nationkey", "n_nationkey",
        "n_regionkey", Map.empty, "r_in_region", "nation", "region"),
      RelTableDef("FROM_NATION", customer, "c_custkey", "c_custkey",
        "c_nationkey", Map.empty, "r_cust_nation", "customer", "nation"),
      RelTableDef("FROM_NATION", supplier, "s_suppkey", "s_suppkey",
        "s_nationkey", Map.empty, "r_supp_nation", "supplier", "nation"),
      RelTableDef("PLACED", orders, "o_orderkey", "o_custkey", "o_orderkey",
        Map("o_orderdate" -> "o_orderdate"), "r_placed", "customer", "orders"),
      RelTableDef("HAS_ITEM", lineitem, "_li_id", "l_orderkey", "_li_id",
        Map.empty, "r_has_item", "orders", "lineitem"),
      RelTableDef("OF_PART", lineitem, "_li_id", "_li_id", "l_partkey",
        Map("l_quantity" -> "l_quantity"), "r_of_part", "lineitem", "part"),
      RelTableDef("BY_SUPPLIER", lineitem, "_li_id", "_li_id", "l_suppkey",
        Map.empty, "r_by_supplier", "lineitem", "supplier"))

    PropertyGraph(nodes, rels)
  }
}
