package graft

import graft.api.CypherError._

/** TCK-style conformance, part 41 — round-9 probe findings, batch 2:
  * top-level `|` in value-position label expressions (context-sensitive —
  * inside comprehension predicates `|` still terminates, matching Neo4j's
  * resolution of the grammar ambiguity), dynamic property access on
  * entities `n[key]`, and the Cypher-5 `CALL (*)` full-scope import. */
class TckStyleSpec41 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c")),
      N(4, Set("A", "B"), Map("name" -> "ab", "num" -> 4))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 2, 3, "KNOWS", Map("since" -> 2012))))

  // ---------------------------- label disjunction in value position
  scenario("label | in WHERE", g,
    "MATCH (n) WHERE n:A|C RETURN count(*) AS x", value(3))
  scenario("label | chain of three", g,
    "MATCH (n) WHERE n:A|B|C RETURN count(*) AS x", value(4))
  scenario("label | in RETURN value position", g,
    "MATCH (n {name:'b'}) RETURN n:A|B AS x", value(true))
  scenario("label | mixed with & and !", g,
    "MATCH (n) WHERE n:C|(A&!B) RETURN count(*) AS x", value(2))
  scenario("label | binds tighter than AND", g,
    "MATCH (n) WHERE n:A|B AND n.num > 1 RETURN count(*) AS x", value(2))
  scenario("comprehension WHERE: | still separates the projection", g,
    // x:A parses as the whole predicate; | starts the projection.
    "MATCH (x) RETURN size([p = (x)-->() WHERE x:A | 1]) AS x",
    rows(Map("x" -> 1), Map("x" -> 0), Map("x" -> 0), Map("x" -> 0)))
  scenario("comprehension WHERE: parenthesized | works inside", g,
    "MATCH (n {name:'a'}) RETURN size([(n)-->(m) WHERE m:(B|C) | m]) AS x",
    value(1))

  // ---------------------------- dynamic property access n[key]
  scenario("literal key reads the property", g,
    "MATCH (n {name:'a'}) RETURN n['name'] AS x", value("a"))
  scenario("literal key absent from schema is null", g,
    "MATCH (n {name:'a'}) RETURN n['nope'] AS x", Seq(Map("x" -> null)))
  scenario("literal key on a relationship", g,
    "MATCH ()-[r:KNOWS]->({name:'b'}) RETURN r['since'] AS x", value(2010))
  scenario("dynamic key over a uniform-typed entity", g,
    // relationships carry only the LONG property 'since'
    "WITH 'since' AS k MATCH ()-[r:KNOWS]->() RETURN sum(r[k]) AS x",
    value(4022L))
  scenario("dynamic key in WHERE", g,
    "WITH 'since' AS k MATCH ()-[r]->() WHERE r[k] = 2012 " +
      "RETURN count(*) AS x", value(1))
  errorScenario("dynamic key over mixed-type properties is classified", g,
    // nodes carry STRING name + LONG num: no single chain type exists
    "WITH 'name' AS k MATCH (n) RETURN n[k] AS x",
    ArgumentError, InvalidArgumentType)

  // ---------------------------- CALL (*) full-scope import
  scenario("CALL (*) sees the outer variable", g,
    "MATCH (n:A) CALL (*) { RETURN n.num * 10 AS x10 } " +
      "RETURN sum(x10) AS x", value(50L))
  scenario("CALL (*) imports every variable in scope", g,
    "MATCH (n {name:'a'}) WITH n, n.num AS k " +
      "CALL (*) { RETURN n.name AS nm, k + 1 AS k2 } " +
      "RETURN nm, k2 AS x", rows(Map("nm" -> "a", "x" -> 2)))
  scenario("CALL (*) with empty outer scope is uncorrelated", g,
    "CALL (*) { MATCH (n:A) RETURN count(*) AS c } RETURN c AS x",
    value(2L))
  scenario("CALL (*) correlated aggregate per driving row", g,
    "MATCH (n) CALL (*) { MATCH (n)-[:KNOWS]->(m) RETURN count(m) AS deg } " +
      "RETURN n.name AS nm, deg ORDER BY nm",
    rows(Map("nm" -> "a", "deg" -> 1L), Map("nm" -> "ab", "deg" -> 0L),
      Map("nm" -> "b", "deg" -> 1L), Map("nm" -> "c", "deg" -> 0L)),
    ordered = true)
}
