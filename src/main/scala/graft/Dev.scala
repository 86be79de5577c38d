package graft

import graft.api.GraftSession
import graft.tpch.TpchGraph

/** Scratch main for interactive development; not part of the public API. */
object Dev {
  def main(args: Array[String]): Unit = {
    val session = GraftSession.local(cores = 8, shufflePartitions = 8)
    val g = TpchGraph(session.spark, "/root/testdata/sf0.001")
    val queries = if (args.nonEmpty) args.toSeq else Seq(
      "MATCH (r:Region) RETURN r.r_name AS name ORDER BY name",
      "MATCH (n:Nation)-[:IN_REGION]->(r:Region) RETURN r.r_name AS region, count(*) AS n_nations ORDER BY region",
      "MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE o.o_totalprice > 100000 RETURN c.c_mktsegment AS seg, count(*) AS n, sum(o.o_totalprice) AS total ORDER BY seg",
      "MATCH (c:Customer)-[*1..2]->(x) RETURN count(*) AS paths",
      "MATCH (c:Customer)-[*1..1]->(x) RETURN count(*) AS paths1",
      "MATCH (c:Customer)-[*2..2]->(x) RETURN count(*) AS paths2",
      "MATCH (c:Customer)-[r]->(x) RETURN count(*) AS onehop",
      "UNWIND [1,2,3] AS x RETURN x, x * 2 AS dbl",
      "MATCH (c:Customer) WHERE NOT (c)-[:PLACED]->() RETURN count(*) AS inactive",
      "MATCH (o:Order) RETURN o.o_orderstatus AS st, count(*) AS cnt, avg(o.o_totalprice) AS avg_price ORDER BY st")
    val explain = args.headOption.contains("--explain")
    val qs = if (explain) queries.drop(1) else queries
    qs.foreach { q =>
      println(s"=== $q")
      try {
        val df =
          if (q.startsWith("q_")) SparkEntry.queries(q)(session.spark, "/root/testdata/sf0.001")
          else session.cypher(g, q)
        if (explain) println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        else df.show(10, truncate = false)
      } catch { case e: Throwable =>
        println(s"FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    session.spark.stop()
  }
}
