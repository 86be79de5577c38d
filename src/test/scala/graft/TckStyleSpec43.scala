package graft

import graft.api.CypherError._

/** TCK-style conformance, part 43 — full-query subquery expressions
  * (Cypher 5 ExistsExpression/CountExpression/CollectExpression with
  * complete bodies): EXISTS/COUNT/COLLECT { MATCH ... [WITH ...]
  * RETURN ... [UNION ...] }, planned through the correlated CALL { }
  * machinery (OPTIONAL, so empty bodies yield false / 0 / []). The simple
  * pattern forms stay on their dedicated fast paths. */
class TckStyleSpec43 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("B"), Map("name" -> "c", "num" -> 3)),
      N(4, Set("C"), Map("name" -> "d", "num" -> 4))),
    Seq(
      R(10, 1, 2, "KNOWS"), R(11, 1, 3, "KNOWS"), R(12, 2, 4, "LIKES")))

  // ----------------------------- EXISTS with a full body
  scenario("EXISTS with RETURN", g,
    "RETURN EXISTS { MATCH (n:B) RETURN n } AS x", value(true))
  scenario("EXISTS false on empty body result", g,
    "RETURN EXISTS { MATCH (n:Zebra) RETURN n } AS x", value(false))
  scenario("EXISTS with WITH pipeline", g,
    "RETURN EXISTS { MATCH (n:B) WITH n.num AS k WHERE k > 2 RETURN k } AS x",
    value(true))
  scenario("correlated EXISTS full body in WHERE", g,
    "MATCH (n) WHERE EXISTS { MATCH (n)-[:KNOWS]->(m) RETURN m } " +
      "RETURN count(*) AS x", value(1))
  scenario("EXISTS body LIMIT 0 is false", g,
    "RETURN EXISTS { MATCH (n) RETURN n LIMIT 0 } AS x", value(false))

  // ----------------------------- COUNT with a full body
  scenario("COUNT with RETURN", g,
    "RETURN COUNT { MATCH (n:B) RETURN n } AS x", value(2L))
  scenario("COUNT respects body DISTINCT", g,
    "RETURN COUNT { MATCH (n)-[:KNOWS]->() RETURN DISTINCT n } AS x",
    value(1L))
  scenario("COUNT respects body LIMIT", g,
    "RETURN COUNT { MATCH (n) RETURN n LIMIT 3 } AS x", value(3L))
  scenario("COUNT respects body SKIP", g,
    "RETURN COUNT { MATCH (n) RETURN n SKIP 3 } AS x", value(1L))
  scenario("COUNT with UNION dedups across arms", g,
    "RETURN COUNT { MATCH (n:A) RETURN n.num AS v " +
      "UNION MATCH (m:B) RETURN m.num AS v } AS x", value(3L))
  scenario("COUNT with UNION ALL keeps duplicates", g,
    "RETURN COUNT { MATCH (n:B) RETURN 1 AS v " +
      "UNION ALL MATCH (m:B) RETURN 1 AS v } AS x", value(4L))
  scenario("correlated COUNT full body per outer row", g,
    "MATCH (n) RETURN n.name AS nm, " +
      "COUNT { MATCH (n)-->(m) RETURN m } AS c ORDER BY nm",
    rows(Map("nm" -> "a", "c" -> 2L), Map("nm" -> "b", "c" -> 1L),
      Map("nm" -> "c", "c" -> 0L), Map("nm" -> "d", "c" -> 0L)),
    ordered = true)
  scenario("COUNT full body in WHERE", g,
    "MATCH (n) WHERE COUNT { MATCH (n)-->(m) RETURN m } = 2 " +
      "RETURN n.name AS x", value("a"))
  scenario("COUNT body without RETURN counts rows", g,
    "RETURN COUNT { MATCH (n:B) WITH n WHERE n.num > 2 } AS x", value(1L))

  // ----------------------------- COLLECT with a full body
  scenario("COLLECT ordered LIMIT slice", g,
    "RETURN COLLECT { MATCH (n) RETURN n.name ORDER BY n.name LIMIT 2 } AS x",
    Seq(Map("x" -> List("a", "b"))))
  scenario("COLLECT DISTINCT body", g,
    "RETURN COLLECT { MATCH (n:B)<-[:KNOWS]-(m) RETURN DISTINCT m.name } AS x",
    Seq(Map("x" -> List("a"))))
  scenario("COLLECT of an empty body is []", g,
    "RETURN COLLECT { MATCH (n:Zebra) RETURN n.name } AS x",
    Seq(Map("x" -> List())))
  scenario("correlated COLLECT full body", g,
    "MATCH (n:A) RETURN COLLECT { MATCH (n)-->(m) WITH m.name AS w " +
      "WHERE w > 'b' RETURN w } AS x",
    Seq(Map("x" -> List("c"))))

  // ----------------------------- misc probe fix
  scenario("split with empty delimiter is a per-character split", g,
    "RETURN split('abc', '') AS x", Seq(Map("x" -> List("a", "b", "c"))))

  // ----------------------------- validation
  errorScenario("COLLECT body must return one column", g,
    "RETURN COLLECT { MATCH (n) RETURN n.name, n.num } AS x",
    SyntaxError, InvalidSyntax)
  errorScenario("COLLECT ORDER BY over UNION without LIMIT unsupported", g,
    "RETURN COLLECT { MATCH (n:A) RETURN n.name ORDER BY n.name " +
      "UNION MATCH (m:B) RETURN m.name ORDER BY m.name } AS x",
    SemanticError, UnsupportedExpression)

  // ----------------------------- ordered COLLECT (list in ORDER BY order)
  scenario("COLLECT returns the list in ORDER BY order", g,
    "RETURN COLLECT { MATCH (n) RETURN n.name ORDER BY n.name } AS x",
    Seq(Map("x" -> List("a", "b", "c", "d"))))
  scenario("COLLECT ORDER BY DESC", g,
    "RETURN COLLECT { MATCH (n) RETURN n.name ORDER BY n.name DESC } AS x",
    Seq(Map("x" -> List("d", "c", "b", "a"))))
  scenario("COLLECT ORDER BY a non-returned key", g,
    "RETURN COLLECT { MATCH (n) RETURN n.name ORDER BY n.num DESC } AS x",
    Seq(Map("x" -> List("d", "c", "b", "a"))))
  scenario("COLLECT ORDER BY the RETURN alias", g,
    "RETURN COLLECT { MATCH (n) RETURN n.name AS v ORDER BY v DESC } AS x",
    Seq(Map("x" -> List("d", "c", "b", "a"))))
  scenario("COLLECT ORDER BY DESC with LIMIT keeps the sorted order", g,
    "RETURN COLLECT { MATCH (n) RETURN n.name ORDER BY n.name DESC " +
      "LIMIT 2 } AS x",
    Seq(Map("x" -> List("d", "c"))))
  scenario("COLLECT ORDER BY LIMIT with SKIP", g,
    "RETURN COLLECT { MATCH (n) RETURN n.name ORDER BY n.name " +
      "SKIP 1 LIMIT 2 } AS x",
    Seq(Map("x" -> List("b", "c"))))
  scenario("correlated ordered COLLECT", g,
    "MATCH (a:A) RETURN COLLECT { MATCH (a)-[:KNOWS]->(m) " +
      "RETURN m.name ORDER BY m.name DESC } AS x",
    Seq(Map("x" -> List("c", "b"))))
}
