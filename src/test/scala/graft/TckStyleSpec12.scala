package graft

import graft.api.CypherError._

/** TCK-style conformance, part 12 — write clauses (Create / Set / Remove /
  * Delete / Merge acceptance shapes plus their error classes). A write
  * query's RETURN runs through the normal cypher() surface; state checks
  * read the graph returned by update() (see TckStyleSpec for why these are
  * hand-authored). */
class TckStyleSpec12 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c"))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 1, 3, "LIKES")))

  // ------------------------------------------------------------- CREATE
  scenario("CREATE a node and return a constant", g,
    "CREATE () RETURN 1 AS x", value(1L))
  scenario("CREATE a labeled node and read its property back", g,
    "CREATE (n:X {p: 1}) RETURN n.p AS x", value(1L))
  scenario("CREATE returns labels of the created node", g,
    "CREATE (n:X:Y) RETURN labels(n) AS x",
    value(Seq("X", "Y")))
  scenario("CREATE full pattern returns each element's values", g,
    "CREATE (a {x: 1})-[r:T {w: 2}]->(b {x: 3}) " +
      "RETURN a.x AS ax, r.w AS rw, b.x AS bx",
    rows(Map("ax" -> 1L, "rw" -> 2L, "bx" -> 3L)))
  scenario("CREATE rel across separately-declared parts", g,
    "CREATE (a:A2), (b:B2), (a)-[r:T]->(b) RETURN type(r) AS x",
    value("T"))
  scenario("created relationship endpoints are the bound nodes", g,
    "CREATE (a:X)-[r:T]->(b:Y) " +
      "RETURN startNode(r) = id(a) AS s, endNode(r) = id(b) AS e",
    rows(Map("s" -> true, "e" -> true)))
  scenario("CREATE per UNWIND row", g,
    "UNWIND [1, 2, 3] AS i CREATE (n:N {v: i}) RETURN n.v AS x",
    rows(Map("x" -> 1L), Map("x" -> 2L), Map("x" -> 3L)))
  scenario("CREATE per matched row reads driving values", g,
    "MATCH (m:A) CREATE (n:Copy {of: m.name}) RETURN n.of AS x",
    value("a"))
  scenario("CREATE rel from matched to created node", g,
    "MATCH (m:A) CREATE (m)-[r:TAGGED]->(t:Tag) RETURN type(r) AS x",
    value("TAGGED"))
  scenario("created node property defaults to null when absent", g,
    "CREATE (n:X {p: 1}) RETURN n.q AS x", value(null))

  // ---------------------------------------------------------------- SET
  scenario("SET a property and observe it in RETURN", g,
    "MATCH (n:A) SET n.num = 10 RETURN n.num AS x", value(10L))
  scenario("SET a new property key", g,
    "MATCH (n:A) SET n.fresh = 'yes' RETURN n.fresh AS x", value("yes"))
  scenario("SET from an expression over the driving row", g,
    "MATCH (n:B) SET n.twice = n.num * 2 RETURN n.twice AS x", value(4L))
  scenario("SET a label is visible to labels()", g,
    "MATCH (n:A) SET n:Extra RETURN labels(n) AS x",
    value(Seq("A", "Extra")))
  scenario("SET += literal map adds entries", g,
    "MATCH (n:A) SET n += {mood: 'ok'} RETURN n.mood AS m, n.num AS k",
    rows(Map("m" -> "ok", "k" -> 1L)))
  scenario("SET on a relationship property", g,
    "MATCH ()-[r:KNOWS]->() SET r.since = 2024 RETURN r.since AS x",
    value(2024L))
  scenario("SET to null removes the value", g,
    "MATCH (n:B) SET n.num = null RETURN n.num AS x", value(null))

  // ------------------------------------------------------------- REMOVE
  scenario("REMOVE a property nulls it", g,
    "MATCH (n:A) REMOVE n.num RETURN n.num AS x", value(null))
  scenario("REMOVE a label hides it from labels()", g,
    "MATCH (n:A) SET n:Tmp REMOVE n:Tmp RETURN labels(n) AS x",
    value(Seq("A")))

  // ------------------------------------------------------------- DELETE
  scenario("DELETE a relationship then count in a later read", g,
    "MATCH (a:A)-[r:LIKES]->() DELETE r RETURN a.name AS x", value("a"))
  scenario("DELETE of a null optional binding is a no-op", g,
    "OPTIONAL MATCH (n:Nope) DELETE n RETURN count(*) AS x", value(1L))

  // -------------------------------------------------------------- MERGE
  scenario("MERGE matches before creating", g,
    "MERGE (n:A {name: 'a'}) RETURN n.name AS x", value("a"))
  scenario("MERGE creates when nothing matches", g,
    "MERGE (n:Z {name: 'z'}) RETURN n.name AS x", value("z"))
  scenario("MERGE binds every matching node like MATCH", g,
    "MERGE (n {name: 'a'}) RETURN n.name AS x", value("a"))
  scenario("MERGE dedups identical driving keys", g,
    "UNWIND [1, 1, 2] AS k MERGE (n:K {v: k}) " +
      "RETURN count(DISTINCT id(n)) AS x", value(2L))
  scenario("MERGE ON CREATE fires only for created", g,
    "MERGE (n:Z {k: 1}) ON CREATE SET n.fresh = true " +
      "ON MATCH SET n.seen = true RETURN n.fresh AS f, n.seen AS s",
    rows(Map("f" -> true, "s" -> null)))
  scenario("MERGE ON MATCH fires only for matched", g,
    "MERGE (n:A {name: 'a'}) ON CREATE SET n.fresh = true " +
      "ON MATCH SET n.seen = true RETURN n.fresh AS f, n.seen AS s",
    rows(Map("f" -> null, "s" -> true)))
  scenario("MERGE relationship matches an existing one", g,
    "MATCH (a:A), (b:B) MERGE (a)-[r:KNOWS {since: 2010}]->(b) " +
      "RETURN r.since AS x", value(2010L))
  scenario("MERGE relationship creates on a new key", g,
    "MATCH (a:A), (b:B) MERGE (a)-[r:KNOWS {since: 1999}]->(b) " +
      "RETURN r.since AS x", value(1999L))

  // -------------------------------------------------- persisted effects
  test("[900] update() state: chained writes persist in the result graph") {
    val g2 = session.update(g,
      "MATCH (n:A) SET n.num = 42 SET n:Starred")
    val got = rowsOf(session.cypher(g2,
      "MATCH (n:Starred) RETURN n.num AS x"))
    assert(got === Seq(Map("x" -> 42L)))
  }

  test("[901] update() state: DETACH DELETE empties the component") {
    val g2 = session.update(g, "MATCH (n:A) DETACH DELETE n")
    val got = rowsOf(session.cypher(g2,
      "MATCH ()-[r]->() RETURN count(*) AS x"))
    assert(got === Seq(Map("x" -> 0L)))
  }

  test("[902] update() is idempotent for MERGE re-runs") {
    val g2 = session.update(g, "MERGE (n:Only {k: 1})")
    val g3 = session.update(g2, "MERGE (n:Only {k: 1})")
    val got = rowsOf(session.cypher(g3,
      "MATCH (n:Only) RETURN count(*) AS x"))
    assert(got === Seq(Map("x" -> 1L)))
  }

  // ------------------------------------------------------ error classes
  errorScenario("CREATE of an undirected relationship", g,
    "CREATE (a)-[r:T]-(b) RETURN 1 AS x",
    SyntaxError, RequiresDirectedRelationship)
  errorScenario("CREATE with multiple relationship types", g,
    "CREATE (a)-[r:T1|T2]->(b) RETURN 1 AS x",
    SyntaxError, NoSingleRelationshipType)
  errorScenario("CREATE of a variable-length relationship", g,
    "CREATE (a)-[r:T*2]->(b) RETURN 1 AS x",
    SyntaxError, CreatingVarLength)
  errorScenario("CREATE adding labels to a bound variable", g,
    "MATCH (n:A) CREATE (n:Dup) RETURN 1 AS x",
    SyntaxError, VariableAlreadyBound)
  errorScenario("MERGE of an already-bound variable", g,
    "MATCH (n:A) MERGE (n:A) RETURN 1 AS x",
    SyntaxError, VariableAlreadyBound)
  scenario("MATCH after CREATE sees the created node", g,
    "CREATE (:X) MATCH (m:X) RETURN count(*) AS x", value(1L))
  errorScenario("write clause inside UNION", g,
    "CREATE (n:X) RETURN 1 AS x UNION CREATE (m:Y) RETURN 2 AS x",
    SyntaxError, InvalidSyntax)
  errorScenario("DELETE of a non-element value", g,
    "MATCH (n:A) DELETE 42 RETURN 1 AS x",
    SemanticError, InvalidDelete)
  errorScenario("DELETE of a connected node without DETACH", g,
    "MATCH (n:A) DELETE n RETURN 1 AS x",
    ConstraintValidationFailed, DeleteConnectedNode, Runtime)
}
