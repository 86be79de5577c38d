package graft

import graft.api.GraftSession

/** Self-differential net for the round-8 surface sugar: every desugared
  * form must return the same multiset as its explicit counterpart when
  * run through the engine on the sf0.001 TPCH graph. Catches regressions
  * in the desugarings (inline pattern WHERE, scoped CALL, || concat,
  * extended CASE operators, abbreviated QPP, SQL-style TRIM) without an
  * external oracle. */
class SugarEquivalenceSpec extends SparkTestBase {

  lazy val session = new GraftSession(spark)
  lazy val g = graft.tpch.TpchGraph(spark, "/root/testdata/sf0.001")

  private def bag(q: String): Map[Seq[Any], Int] =
    session.cypher(g, q).collect().toSeq
      .map(_.toSeq.map {
        case null => null
        case s: scala.collection.Seq[_] => s.toList
        case x => x
      })
      .groupBy(identity).map { case (k, v) => k -> v.size }

  private def equivalent(name: String, sugar: String, explicit0: String): Unit =
    test(name) {
      val a = bag(sugar)
      val b = bag(explicit0)
      assert(a === b, s"\nsugar:    $sugar\nexplicit: $explicit0")
    }

  equivalent("inline node WHERE == clause WHERE",
    "MATCH (n:Nation WHERE n.n_nationkey < 7) RETURN n.n_name AS x",
    "MATCH (n:Nation) WHERE n.n_nationkey < 7 RETURN n.n_name AS x")

  equivalent("inline WHERE on both endpoints == conjoined clause WHERE",
    "MATCH (c:Customer WHERE c.c_custkey < 20)-[:FROM_NATION]->" +
      "(n WHERE n.n_nationkey > 5) RETURN c.c_custkey AS c, n.n_name AS n",
    "MATCH (c:Customer)-[:FROM_NATION]->(n) " +
      "WHERE c.c_custkey < 20 AND n.n_nationkey > 5 " +
      "RETURN c.c_custkey AS c, n.n_name AS n")

  equivalent("inline rel WHERE == clause WHERE",
    "MATCH (c:Customer)-[r:PLACED WHERE r.o_orderdate >= date('1995-01-01')]->(o) " +
      "RETURN count(*) AS x",
    "MATCH (c:Customer)-[r:PLACED]->(o) " +
      "WHERE r.o_orderdate >= date('1995-01-01') RETURN count(*) AS x")

  equivalent("scoped CALL (n) == CALL { WITH n }",
    "MATCH (n:Nation) CALL (n) { MATCH (n)<-[:FROM_NATION]-(c:Customer) " +
      "RETURN count(*) AS k } RETURN n.n_name AS n, k",
    "MATCH (n:Nation) CALL { WITH n MATCH (n)<-[:FROM_NATION]-(c:Customer) " +
      "RETURN count(*) AS k } RETURN n.n_name AS n, k")

  equivalent("|| == + on strings",
    "MATCH (r:Region) RETURN r.r_name || '!' AS x",
    "MATCH (r:Region) RETURN r.r_name + '!' AS x")

  equivalent("extended CASE operator == searched CASE",
    "MATCH (n:Nation) RETURN CASE n.n_nationkey WHEN > 12 THEN 'hi' " +
      "WHEN <= 12 THEN 'lo' END AS x, count(*) AS c",
    "MATCH (n:Nation) RETURN CASE WHEN n.n_nationkey > 12 THEN 'hi' " +
      "WHEN n.n_nationkey <= 12 THEN 'lo' END AS x, count(*) AS c")

  equivalent("abbreviated leading QPP group == anonymous-node form",
    "MATCH ((x:Nation)-[:IN_REGION]->(y)){1,1} RETURN count(*) AS x",
    "MATCH () ((x:Nation)-[:IN_REGION]->(y)){1,1} () RETURN count(*) AS x")

  equivalent("SQL-style TRIM == function trims",
    "MATCH (r:Region) RETURN trim(LEADING 'A' FROM r.r_name) AS a, " +
      "trim(TRAILING 'A' FROM r.r_name) AS b",
    "MATCH (r:Region) RETURN ltrim(r.r_name, 'A') AS a, " +
      "rtrim(r.r_name, 'A') AS b")

  equivalent("YIELD WHERE == following WITH WHERE",
    "CALL degrees() YIELD id, degree WHERE degree > 3 RETURN count(*) AS x",
    "CALL degrees() YIELD id, degree WITH * WHERE degree > 3 " +
      "RETURN count(*) AS x")

  equivalent("IS :: INTEGER == true/null split on a typed column",
    "MATCH (n:Nation) RETURN (n.n_nationkey IS :: INTEGER) AS x, count(*) AS c",
    "MATCH (n:Nation) RETURN (n.n_nationkey IS NULL OR true) AS x, count(*) AS c")
}
