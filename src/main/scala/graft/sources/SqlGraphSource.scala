package graft.sources

import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}
import org.apache.spark.sql.SparkSession

/** Map registered SQL tables (temp views, catalog tables, Hive/JDBC-backed
  * — anything `spark.table` resolves) onto a property graph: the Spark-side
  * equivalent of the reference's SqlPropertyGraphDataSource + Graph DDL
  * (morpheus-spark-cypher/.../api/io/sql/SqlPropertyGraphDataSource.scala,
  * graph-ddl/.../GraphDdl.scala:49), with the mapping given programmatically
  * instead of via DDL text.
  */
object SqlGraphSource {

  case class NodeMapping(table: String, labels: Set[String], idCol: String,
      properties: Map[String, String] = Map.empty)
  case class RelMapping(table: String, relType: String, idCol: String,
      srcCol: String, tgtCol: String, srcTable: String, tgtTable: String,
      properties: Map[String, String] = Map.empty)

  /** Build a graph from table names; property map defaults to every column
    * except the id/endpoint columns. */
  def load(spark: SparkSession, nodes: Seq[NodeMapping],
      rels: Seq[RelMapping]): PropertyGraph = {
    val nodeDefs = nodes.map { m =>
      val df = spark.table(m.table)
      val props =
        if (m.properties.nonEmpty) m.properties
        else df.columns.filterNot(_ == m.idCol).map(c => c -> c).toMap
      NodeTableDef(m.labels, df, m.idCol, props, m.table)
    }
    val relDefs = rels.map { m =>
      val df = spark.table(m.table)
      val props =
        if (m.properties.nonEmpty) m.properties
        else df.columns
          .filterNot(Set(m.idCol, m.srcCol, m.tgtCol))
          .map(c => c -> c).toMap
      RelTableDef(m.relType, df, m.idCol, m.srcCol, m.tgtCol, props,
        "rel/" + m.table + "/" + m.relType, m.srcTable, m.tgtTable)
    }
    PropertyGraph(nodeDefs, relDefs)
  }
}
