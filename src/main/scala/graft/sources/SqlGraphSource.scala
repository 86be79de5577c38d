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

  /** `srcJoinCol`/`tgtJoinCol`: the reference Graph DDL's JOIN mappings
    * (graph-ddl/.../GraphDdl.scala:49) — when set, the rel table's endpoint
    * column equates to that (non-key) column of the node table, and the
    * loader joins through it to resolve the node key. When empty the
    * endpoint column IS the node key (plain foreign key).
    *
    * `idCol = ""` means the view has no key column (the reference generates
    * edge ids at load, GraphDdl mappings may omit KEY): a synthetic id is
    * derived at load and the frame is pinned so the assignment is stable
    * across actions. */
  case class RelMapping(table: String, relType: String, idCol: String,
      srcCol: String, tgtCol: String, srcTable: String, tgtTable: String,
      properties: Map[String, String] = Map.empty,
      srcJoinCol: Option[String] = None, tgtJoinCol: Option[String] = None,
      // Composite JOIN mappings (`JOIN ON a.c1 = e.c1 AND a.c2 = e.c2`,
      // graph-ddl grammar): (relCol, nodeCol) pairs; when non-empty they
      // supersede srcCol/srcJoinCol for that endpoint.
      srcJoinPairs: Seq[(String, String)] = Seq.empty,
      tgtJoinPairs: Seq[(String, String)] = Seq.empty)

  /** Build a graph from table names; property map defaults to every column
    * except the id/endpoint columns. */
  def load(spark: SparkSession, nodes: Seq[NodeMapping],
      rels: Seq[RelMapping]): PropertyGraph = {
    import org.apache.spark.sql.functions.col
    val nodeDefs = nodes.map { m =>
      val df = spark.table(m.table)
      val props =
        if (m.properties.nonEmpty) m.properties
        else df.columns.filterNot(_ == m.idCol).map(c => c -> c).toMap
      NodeTableDef(m.labels, df, m.idCol, props, m.table)
    }
    val nodeByTable = nodes.map(m => m.table -> m).toMap
    val relDefs = rels.map { m =>
      var df = spark.table(m.table)
      // Props from the ORIGINAL columns (before any join-resolution adds
      // derived key columns).
      val props =
        if (m.properties.nonEmpty) m.properties
        else df.columns
          .filterNot(Set(m.idCol, m.srcCol, m.tgtCol))
          .map(c => c -> c).toMap
      // No key column: synthesize one. Pinning makes the assignment stable
      // across actions (partition-local counters re-evaluate otherwise).
      val idCol = if (m.idCol.nonEmpty) m.idCol else {
        df = graft.impl.Pin(df.withColumn("_rel_id",
          org.apache.spark.sql.functions.monotonically_increasing_id()))
        "_rel_id"
      }
      // JOIN mapping: derive the endpoint node key by joining through the
      // declared node column — one broadcast-friendly equi-join per mapped
      // endpoint, done once at load.
      def resolve(relCol: String, nodeTable: String,
          joinCol: Option[String], pairs: Seq[(String, String)]): String = {
        val joinPairs =
          if (pairs.nonEmpty) pairs
          else joinCol.map(jc => Seq((relCol, jc))).getOrElse(Seq.empty)
        if (joinPairs.isEmpty) return relCol
        val nm = nodeByTable.getOrElse(nodeTable, throw new
            IllegalArgumentException(s"JOIN mapping references unmapped node table $nodeTable"))
        // Plain foreign key: a single pair on the node's own key column
        // needs no resolution join at all.
        if (joinPairs.size == 1 && joinPairs.head._2 == nm.idCol)
          return joinPairs.head._1
        val derived = "_fk_" + relCol
        val jkName = (nc: String) => "_jk_" + relCol + "_" + nc
        val keys = spark.table(nodeTable)
          .select(joinPairs.map { case (_, nc) => col(nc).as(jkName(nc)) } :+
            col(nm.idCol).as(derived): _*)
        val cond = joinPairs.map { case (rc, nc) =>
          col(rc) === col(jkName(nc)) }.reduce(_ && _)
        df = df.join(keys, cond)
        joinPairs.foreach { case (_, nc) => df = df.drop(jkName(nc)) }
        derived
      }
      val srcKey = resolve(m.srcCol, m.srcTable, m.srcJoinCol, m.srcJoinPairs)
      val tgtKey = resolve(m.tgtCol, m.tgtTable, m.tgtJoinCol, m.tgtJoinPairs)
      RelTableDef(m.relType, df, idCol, srcKey, tgtKey, props,
        "rel/" + m.table + "/" + m.relType, m.srcTable, m.tgtTable)
    }
    PropertyGraph(nodeDefs, relDefs)
  }
}
