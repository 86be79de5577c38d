package graft

import graft.api.CypherError._

/** TCK-style conformance, part 17 — CALL { } breadth added in round 6:
  * intermediate WITH inside a correlated body (the body plans over the
  * row id + imported vars only and re-joins on the row id, so an
  * aggregating WITH groups per driving row and openCypher scoping holds),
  * and CALL { } / CALL proc after write clauses (the body reads the
  * written ambient graph, like MATCH does). */
class TckStyleSpec17 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c"))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 1, 3, "LIKES"),
      R(12, 2, 3, "LIKES")))

  // -------------------------- intermediate WITH in a correlated body
  scenario("correlated body: WITH renames before RETURN", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) WITH m.name AS nm " +
      "RETURN nm AS t } RETURN n.name AS x, t",
    rows(Map("x" -> "a", "t" -> "b"), Map("x" -> "a", "t" -> "c")))
  scenario("correlated body: aggregating WITH groups per driving row", g,
    "MATCH (n) CALL { WITH n MATCH (n)-->(m) WITH count(m) AS c " +
      "RETURN c } RETURN n.name AS x, c",
    rows(Map("x" -> "a", "c" -> 2L), Map("x" -> "b", "c" -> 1L)))
  scenario("correlated body: WITH WHERE filters per row", g,
    "MATCH (n) CALL { WITH n MATCH (n)-->(m) WITH m WHERE m.num > 1 " +
      "RETURN m.name AS t } RETURN n.name AS x, t",
    rows(Map("x" -> "a", "t" -> "b")))
  scenario("correlated body: DISTINCT WITH dedupes per row", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->()-->(z) " +
      "WITH DISTINCT z RETURN z.name AS t } RETURN t AS x",
    value("c"))
  scenario("correlated body: aggregate of an aggregating WITH", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) " +
      "WITH m, 1 AS one RETURN sum(one) AS s } RETURN s AS x",
    value(2L))
  scenario("correlated body: chain of two WITH clauses", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) WITH m.num AS v " +
      "WITH v * 10 AS w RETURN max(w) AS t } RETURN t AS x",
    value(20L))
  scenario("body WITH cannot see non-imported outer vars", g,
    "MATCH (n:A) MATCH (other:B) " +
      "CALL { WITH n MATCH (n)-->(m) RETURN m.name AS t } " +
      "RETURN count(*) AS x", value(2L))
  errorScenario("correlated body referencing a non-imported var", g,
    "MATCH (n:A) MATCH (other:B) " +
      "CALL { WITH n MATCH (m) WHERE m.num = other.num " +
      "RETURN m.name AS t } RETURN t AS x",
    SyntaxError, UndefinedVariable)
  scenario("intermediate WITH LIMIT selects per driving row", g,
    "MATCH (n) CALL { WITH n MATCH (n)-->(m) " +
      "WITH m ORDER BY m.name LIMIT 1 RETURN m.name AS t } " +
      "RETURN n.name AS x, t",
    rows(Map("x" -> "a", "t" -> "b"), Map("x" -> "b", "t" -> "c")))
  scenario("intermediate WITH SKIP drops per driving row", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) " +
      "WITH m ORDER BY m.name SKIP 1 RETURN m.name AS t } RETURN t AS x",
    value("c"))
  scenario("intermediate WITH LIMIT feeds a per-row aggregate", g,
    "MATCH (n) CALL { WITH n MATCH (n)-->(m) " +
      "WITH m ORDER BY m.name LIMIT 1 RETURN count(m) AS c } " +
      "RETURN n.name AS x, c",
    rows(Map("x" -> "a", "c" -> 1L), Map("x" -> "b", "c" -> 1L),
      Map("x" -> "c", "c" -> 0L)))
  scenario("intermediate WITH LIMIT on a computed projection", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) " +
      "WITH m.name AS nm ORDER BY nm DESC LIMIT 1 RETURN nm AS t } " +
      "RETURN t AS x", value("c"))

  // ---------------------------------------------- UNION bodies in CALL { }
  scenario("uncorrelated UNION body dedups across arms", g,
    "CALL { RETURN 1 AS v UNION RETURN 2 AS v UNION RETURN 1 AS v } " +
      "RETURN v ORDER BY v",
    rows(Map("v" -> 1L), Map("v" -> 2L)), ordered = true)
  scenario("uncorrelated UNION ALL body keeps duplicates", g,
    "CALL { RETURN 1 AS v UNION ALL RETURN 1 AS v } RETURN count(*) AS x",
    value(2L))
  scenario("uncorrelated UNION of two MATCH arms", g,
    "CALL { MATCH (n:A) RETURN n.name AS v UNION MATCH (n:B) " +
      "RETURN n.name AS v } RETURN v ORDER BY v",
    rows(Map("v" -> "a"), Map("v" -> "b")), ordered = true)
  scenario("correlated UNION body runs both arms per driving row", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) RETURN m.name AS v " +
      "UNION WITH n RETURN n.name AS v } RETURN v ORDER BY v",
    rows(Map("v" -> "a"), Map("v" -> "b"), Map("v" -> "c")), ordered = true)
  scenario("correlated UNION dedups within each driving row only", g,
    // both B and C reach c's name: per-row UNION keeps one copy per row,
    // but distinct rows with equal outputs each survive.
    "MATCH (n) WHERE n.name IN ['b', 'c'] " +
      "CALL { WITH n RETURN 'k' AS v UNION WITH n RETURN 'k' AS v } " +
      "RETURN n.name AS x, v",
    rows(Map("x" -> "b", "v" -> "k"), Map("x" -> "c", "v" -> "k")))
  scenario("UNION body mixes aggregate and value arms", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) RETURN count(*) AS v " +
      "UNION WITH n RETURN n.num AS v } RETURN v ORDER BY v",
    rows(Map("v" -> 1L), Map("v" -> 2L)), ordered = true)
  scenario("mixed correlated and uncorrelated arms", g,
    "MATCH (n:A) CALL { WITH n RETURN n.num AS v UNION RETURN 9 AS v } " +
      "RETURN v ORDER BY v",
    rows(Map("v" -> 1L), Map("v" -> 9L)), ordered = true)
  errorScenario("UNION arms must return the same columns", g,
    "CALL { RETURN 1 AS v UNION RETURN 2 AS w } RETURN v",
    SyntaxError, DifferentColumnsInUnion)
  errorScenario("mixing UNION and UNION ALL in a body is invalid", g,
    "CALL { RETURN 1 AS v UNION RETURN 2 AS v UNION ALL RETURN 3 AS v } " +
      "RETURN v",
    SyntaxError, InvalidClauseComposition)
  errorScenario("mixing UNION and UNION ALL at top level is invalid", g,
    "MATCH (n:A) RETURN n.name AS v UNION MATCH (n:B) RETURN n.name AS v " +
      "UNION ALL MATCH (n:C) RETURN n.name AS v",
    SyntaxError, InvalidClauseComposition)

  // ---------------------------------------------- RETURN * in CALL { }
  scenario("uncorrelated RETURN * exports the body variables", g,
    "CALL { MATCH (n:A) RETURN * } RETURN n.name AS x", value("a"))
  scenario("correlated RETURN * exports body-local variables only", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) RETURN * } " +
      "RETURN n.name AS x, m.name AS y",
    rows(Map("x" -> "a", "y" -> "b"), Map("x" -> "a", "y" -> "c")))
  scenario("correlated RETURN * keeps entity semantics on exports", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-[r]->(m:B) RETURN * } " +
      "RETURN type(r) AS x", value("KNOWS"))
  errorScenario("uncorrelated RETURN * with empty scope", g,
    "MATCH (n:A) CALL { RETURN * } RETURN n.name AS x",
    SyntaxError, InvalidSyntax)
  errorScenario("RETURN * still clashes with outer bindings", g,
    "MATCH (n:A), (m:B) CALL { WITH n MATCH (n)-->(m) RETURN * } " +
      "RETURN m.name AS x",
    SyntaxError, VariableAlreadyBound)

  // ----------------------------------------- CALL { } after writes
  scenario("uncorrelated CALL after CREATE reads the written graph", g,
    "CREATE (:X {p: 9}) WITH 1 AS one " +
      "CALL { MATCH (m:X) RETURN m.p AS v } RETURN v AS x", value(9L))
  scenario("correlated CALL after CREATE counts written rels", g,
    "MATCH (a:A) CREATE (a)-[:PING]->(:T) WITH a " +
      "CALL { WITH a MATCH (a)-[r:PING]->() RETURN count(r) AS c } " +
      "RETURN c AS x", value(1L))
  scenario("CALL after DELETE does not see the deleted node", g,
    "MATCH (n:C) DETACH DELETE n WITH 1 AS one " +
      "CALL { MATCH (m) RETURN count(*) AS c } RETURN c AS x",
    value(2L))
  scenario("degree procedure after a write sees the written graph", g,
    "MATCH (a:A) CREATE (a)-[:PING]->(:T) WITH count(*) AS w " +
      "CALL degrees() YIELD degree RETURN sum(degree) AS x",
    value(8L))

  // ---- round 8: scoped CALL (vars), YIELD WHERE, OPTIONAL CALL ----
  scenario("scoped CALL (n) imports like CALL { WITH n }", g,
    "MATCH (a:A) CALL (a) { MATCH (a)-[:KNOWS]->(b) RETURN b.num AS v } " +
      "RETURN sum(v) AS x", value(2L))
  scenario("scoped CALL () is the uncorrelated form", g,
    "MATCH (n) CALL () { MATCH (m:B) RETURN count(*) AS nb } " +
      "RETURN count(*) AS x, max(nb) AS m",
    rows(Map("x" -> 3L, "m" -> 1L)))
  scenario("YIELD ... WHERE filters procedure rows", g,
    "CALL degrees() YIELD degree WHERE degree >= 2 RETURN count(*) AS x",
    value(3L)) // every node touches exactly two of the three edges
  scenario("OPTIONAL CALL subquery keeps empty driving rows as nulls", g,
    "MATCH (a:A) OPTIONAL CALL (a) { MATCH (a)-[:KNOWS]->(b) " +
      "WHERE b.num > 99 RETURN b.num AS v } RETURN count(*) AS x, " +
      "count(v) AS vs", rows(Map("x" -> 1L, "vs" -> 0L)))
  scenario("OPTIONAL CALL procedure with an empty result yields one null row", g,
    "OPTIONAL CALL kcore(99) YIELD id RETURN count(*) AS x, count(id) AS y",
    rows(Map("x" -> 1L, "y" -> 0L)))
  scenario("CALL { } IN TRANSACTIONS is accepted (result-identical here)", g,
    "MATCH (n) CALL (n) { RETURN n.name AS nm } IN TRANSACTIONS OF 10 ROWS " +
      "RETURN count(nm) AS x", value(3L))
}
