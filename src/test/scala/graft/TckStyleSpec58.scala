package graft

/** TCK-style conformance, part 58 — truthful relationship endpoints under
  * undirected matching, and undirected MERGE with unbound endpoints.
  *
  * Neo4j semantics: startNode()/endNode() (and the rendered relationship
  * value) always report the STORED endpoints, regardless of the direction
  * the pattern happened to walk the relationship. Before this round the
  * undirected scan swapped src/tgt on the reversed orientation (the
  * reference does the same, okapi-relational RelationalPlanner.scala:
  * 154-164) and every reader reported traversal order; a RevSlot
  * orientation marker now recovers storage order for readers while
  * traversal joins keep the swapped columns.
  *
  * Undirected MERGE with unbound endpoints mirrors Neo4j: match either
  * orientation, create left-to-right when absent (the bound-endpoint
  * variant landed in round 11, TckStyleSpec45). */
class TckStyleSpec58 extends TckScenarioBase {
  import TckFixtures._

  /** a -LIKES-> b stored forward; c <-OWES- d stored REVERSED relative to
    * the patterns below (d is the stored source). */
  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a")),
      N(2, Set("B"), Map("name" -> "b")),
      N(3, Set("C"), Map("name" -> "c")),
      N(4, Set("D"), Map("name" -> "d"))),
    Seq(R(10, 1, 2, "LIKES"), R(11, 4, 3, "OWES")))

  // ---- startNode/endNode are truthful on a reversed undirected match
  scenario("startNode is stored source on a reversed undirected match", g,
    "MATCH (c:C)-[r:OWES]-(d:D) RETURN startNode(r).name AS s, " +
      "endNode(r).name AS e", rows(Map("s" -> "d", "e" -> "c")))
  scenario("startNode is stored source on a forward undirected match", g,
    "MATCH (a:A)-[r:LIKES]-(b:B) RETURN startNode(r).name AS s, " +
      "endNode(r).name AS e", rows(Map("s" -> "a", "e" -> "b")))
  scenario("id(startNode()) fast path is truthful when reversed", g,
    "MATCH (c:C)-[r:OWES]-(d:D) RETURN id(startNode(r)) = id(d) AS x",
    value(true))
  scenario("both orientations of an unanchored undirected match agree", g,
    "MATCH ()-[r:OWES]-() RETURN startNode(r).name AS s",
    rows(Map("s" -> "d"), Map("s" -> "d")))
  scenario("directed match stays truthful (no marker)", g,
    "MATCH (d:D)-[r:OWES]->(c:C) RETURN startNode(r).name AS s",
    rows(Map("s" -> "d")))

  // ---- the rendered relationship value carries stored endpoints
  scenario("rel value rendered from a reversed match has stored src", g,
    "MATCH (c:C)-[r:OWES]-(d:D) RETURN id(startNode(r)) = id(d) AS sOk, " +
      "id(endNode(r)) = id(c) AS tOk", rows(Map("sOk" -> true, "tOk" -> true)))

  // ---- re-matching an undirected-bound rel with a direction
  scenario("directed re-match of an undirected-bound rel uses storage order", g,
    "MATCH ()-[r:OWES]-() WITH DISTINCT r MATCH (p)-[r]->(q) " +
      "RETURN p.name AS p, q.name AS q", rows(Map("p" -> "d", "q" -> "c")))
  scenario("reversed directed re-match of an undirected-bound rel", g,
    "MATCH ()-[r:OWES]-() WITH DISTINCT r MATCH (p)<-[r]-(q) " +
      "RETURN p.name AS p, q.name AS q", rows(Map("p" -> "c", "q" -> "d")))

  // ---- undirected MERGE with unbound endpoints (Neo4j parity)
  scenario("undirected MERGE with unbound endpoints matches forward", g,
    "MERGE (a:A {name:'a'})-[r:LIKES]-(b:B {name:'b'}) " +
      "RETURN count(r) AS x", value(1))
  scenario("undirected MERGE with unbound endpoints matches reversed", g,
    "MERGE (c:C {name:'c'})-[r:OWES]-(d:D {name:'d'}) " +
      "RETURN startNode(r).name AS s", rows(Map("s" -> "d")))
  scenario("undirected MERGE with unbound endpoints creates left-to-right", g,
    "MERGE (x:X {name:'x'})-[r:NEW]-(y:Y {name:'y'}) " +
      "RETURN startNode(r).name AS s, endNode(r).name AS e",
    rows(Map("s" -> "x", "e" -> "y")))
  scenario("undirected MERGE match does not duplicate the stored rel", g,
    "MERGE (c:C {name:'c'})-[r:OWES]-(d:D {name:'d'}) " +
      "WITH count(r) AS merged MATCH ()-[z:OWES]-() " +
      "RETURN merged, count(z) AS zz",
    rows(Map("merged" -> 1, "zz" -> 2)))
  scenario("undirected MERGE with one bound endpoint creates outgoing", g,
    "MATCH (a:A) MERGE (a)-[r:KNOWS]-(p:P {name:'p'}) " +
      "RETURN id(startNode(r)) = id(a) AS x", value(true))

  // ---- relationship identity: orientation rows canonicalize at MATCH end
  scenario("WITH DISTINCT r collapses the two orientation rows", g,
    "MATCH ()-[r:OWES]-() WITH DISTINCT r RETURN count(r) AS n",
    rows(Map("n" -> 1)))
  scenario("RETURN DISTINCT r collapses the two orientation rows", g,
    "MATCH ()-[r:OWES]-() RETURN DISTINCT startNode(r).name AS s",
    rows(Map("s" -> "d")))
  scenario("grouping by r merges the orientation rows into one group", g,
    "MATCH ()-[r:OWES]-() WITH r, count(*) AS n RETURN n",
    rows(Map("n" -> 2)))
  scenario("count(DISTINCT r) is 1 across orientations", g,
    "MATCH ()-[r:OWES]-() RETURN count(DISTINCT r) AS n",
    rows(Map("n" -> 1)))

  // ---- reversal marker survives WITH / aliasing / optional padding
  scenario("truthful endpoints survive WITH aliasing", g,
    "MATCH (c:C)-[r:OWES]-(d:D) WITH r AS rr " +
      "RETURN startNode(rr).name AS s", rows(Map("s" -> "d")))
  scenario("startNode of an unmatched OPTIONAL undirected rel is null", g,
    "OPTIONAL MATCH (n:Nope)-[r:NOPE]-() RETURN startNode(r) AS x",
    rows(Map("x" -> null)))
  scenario("union of directed and undirected arms stays truthful", g,
    "MATCH (c:C)-[r:OWES]-(d:D) RETURN startNode(r).name AS s " +
      "UNION MATCH (a:A)-[r:LIKES]->(b) RETURN startNode(r).name AS s",
    rows(Map("s" -> "d"), Map("s" -> "a")))
}
