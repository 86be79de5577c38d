package graft

/** TCK-style conformance, part 45 — write-surface probes, round 9:
  * undirected MERGE relationships (bound endpoints: match either
  * direction, create left-to-right — MergeRelationshipAcceptance), and
  * path binding in CREATE / MERGE (`CREATE p = (...)` — CreateAcceptance
  * "bind a path"). */
class TckStyleSpec45 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a")),
      N(2, Set("B"), Map("name" -> "b"))),
    Seq(R(10, 1, 2, "KNOWS")))

  def gRev = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a")),
      N(2, Set("B"), Map("name" -> "b"))),
    Seq(R(10, 2, 1, "KNOWS")))

  def gBoth = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a")),
      N(2, Set("B"), Map("name" -> "b"))),
    Seq(R(10, 1, 2, "KNOWS"), R(11, 2, 1, "KNOWS")))

  // ---------------------------- undirected MERGE
  scenario("undirected MERGE matches the forward relationship", g,
    "MATCH (a:A), (b:B) MERGE (a)-[r:KNOWS]-(b) RETURN count(r) AS x",
    value(1))
  scenario("undirected MERGE matches the reversed relationship", gRev,
    "MATCH (a:A), (b:B) MERGE (a)-[r:KNOWS]-(b) " +
      "RETURN id(startNode(r)) = id(b) AS x", value(true))
  scenario("undirected MERGE matches both directions when both exist", gBoth,
    "MATCH (a:A), (b:B) MERGE (a)-[r:KNOWS]-(b) RETURN count(r) AS x",
    value(2))
  scenario("undirected MERGE creates left-to-right when absent", g,
    "MATCH (a:A), (b:B) MERGE (a)-[r:LIKES]-(b) " +
      "RETURN id(startNode(r)) = id(a) AS x", value(true))
  scenario("undirected MERGE with properties matches on them", g,
    "MATCH (a:A), (b:B) MERGE (a)-[r:KNOWS {w: 1}]-(b) " +
      "MERGE (a)-[r2:KNOWS {w: 1}]-(b) RETURN id(r) = id(r2) AS x",
    value(true))

  // ---------------------------- path binding in CREATE / MERGE
  scenario("CREATE binds a path variable", g,
    "CREATE p = (x:N1)-[:R]->(y:N2) RETURN length(p) AS x", value(1))
  scenario("CREATE path: nodes() and relationships() read it", g,
    "CREATE p = (x:N1 {k: 1})-[:R]->(y:N2 {k: 2}) " +
      "RETURN size(nodes(p)) AS n, size(relationships(p)) AS r",
    rows(Map("n" -> 2, "r" -> 1)))
  scenario("CREATE path over a single node", g,
    "CREATE p = (x:N1) RETURN length(p) AS x", value(0))
  scenario("CREATE path chains two hops", g,
    "CREATE p = (x:N1)-[:R]->(y:N2)<-[:R]-(z:N3) RETURN length(p) AS x",
    value(2))
  scenario("MERGE binds a path variable", g,
    "MERGE p = (z:Zed {k: 9}) RETURN length(p) AS x", value(0))
  scenario("MERGE path over a bound-endpoint relationship", g,
    "MATCH (a:A), (b:B) MERGE p = (a)-[:KNOWS]->(b) " +
      "RETURN length(p) AS x", value(1))
}
