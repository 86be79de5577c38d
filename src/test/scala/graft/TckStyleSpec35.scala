package graft

/** TCK-style conformance, part 35 — deep write-clause interactions:
  * dynamic SET += from properties() of another entity, DETACH DELETE
  * cascading into later reads, whole-label REMOVE, FOREACH-driven MERGE
  * visibility, time-of-day and list values travelling through writes. */
class TckStyleSpec35 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("B"), Map("name" -> "c"))),
    Seq(R(10, 1, 2, "T"), R(11, 2, 3, "T")))

  scenario("SET += properties() copies another entity's map", g,
    "CREATE (x:W {v: 1})-[:L]->(y:W {v: 2, extra: 9}) WITH x, y " +
      "SET x += properties(y) RETURN x.v AS v, x.extra AS e",
    rows(Map("v" -> 2L, "e" -> 9L)))
  scenario("DETACH DELETE removes the node and its relationships", g,
    "MATCH (m {name: 'b'}) DETACH DELETE m WITH 1 AS one " +
      "MATCH (x)-[r:T]->(y) RETURN count(*) AS n",
    rows(Map("n" -> 0L)))
  scenario("REMOVE a label empties the label scan", g,
    "MATCH (a:A) REMOVE a:A WITH 1 AS one MATCH (x:A) RETURN count(*) AS n",
    rows(Map("n" -> 0L)))
  scenario("REMOVE keeps the node under its other labels", g,
    "MATCH (a {name: 'a'}) SET a:Extra WITH a REMOVE a:A " +
      "WITH 1 AS one MATCH (x:Extra) RETURN x.name AS x",
    value("a"))
  scenario("FOREACH MERGE creates one node per distinct key", g,
    "FOREACH (i IN [1, 2, 2, 3] | MERGE (:FE {k: i})) " +
      "WITH 1 AS one MATCH (f:FE) RETURN count(*) AS n",
    rows(Map("n" -> 3L)))
  scenario("a TIME value survives CREATE and reads back", g,
    "CREATE (x:Tmp {at: time('10:00+01:00')}) RETURN toString(x.at) AS t",
    rows(Map("t" -> "10:00:00+01:00")))
  scenario("a LOCALTIME property compares after a write", g,
    "CREATE (x:Tmp2 {at: localtime('09:30')}) " +
      "WITH x RETURN x.at < localtime('10:00') AS t",
    rows(Map("t" -> true)))
  scenario("SET += with a list value, then size()", g,
    "MATCH (a {name: 'a'}) SET a += {xs: [1, 2, 3]} RETURN size(a.xs) AS n",
    rows(Map("n" -> 3L)))
  scenario("write then aggregate over the post-write graph", g,
    "MATCH (a:A) SET a.num = a.num * 10 WITH DISTINCT 1 AS one " +
      "MATCH (x:A) RETURN sum(x.num) AS s", rows(Map("s" -> 30L)))
  scenario("chained writes: CREATE then SET then DELETE leaves nothing", g,
    "CREATE (t:Tr {v: 1}) WITH t SET t.v = 2 WITH t DELETE t " +
      "WITH 1 AS one MATCH (x:Tr) RETURN count(*) AS n",
    rows(Map("n" -> 0L)))

  // --------------------------------- UNION aligns columns by NAME
  scenario("UNION arms may order the same columns differently", g,
    "RETURN 1 AS a, 2 AS b UNION RETURN 20 AS b, 10 AS a",
    rows(Map("a" -> 1L, "b" -> 2L), Map("a" -> 10L, "b" -> 20L)))
  scenario("UNION result column order follows the first arm", g,
    "RETURN 1 AS a, 2 AS b UNION RETURN 4 AS b, 3 AS a",
    rows(Map("a" -> 1L, "b" -> 2L), Map("a" -> 3L, "b" -> 4L)))
  errorScenario("UNION with genuinely different column names still fails", g,
    "RETURN 1 AS a UNION RETURN 2 AS c",
    graft.api.CypherError.SyntaxError,
    graft.api.CypherError.DifferentColumnsInUnion)
}
