package graft

import graft.api.CypherError._

/** TCK-style conformance, part 14 — CALL { } subqueries (beyond-reference:
  * the reference has no subquery clause). Uncorrelated subqueries run once
  * and cross-join; an importing WITH correlates the subquery per driving
  * row (see TckStyleSpec for why these are hand-authored). */
class TckStyleSpec14 extends TckScenarioBase {
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

  // -------------------------------------------------------- uncorrelated
  scenario("uncorrelated subquery runs once, result cross-joins", g,
    "UNWIND [1, 2] AS i CALL { MATCH (n:A) RETURN n.name AS nm } " +
      "RETURN i, nm",
    rows(Map("i" -> 1L, "nm" -> "a"), Map("i" -> 2L, "nm" -> "a")))
  scenario("uncorrelated aggregate joins onto every row", g,
    "MATCH (n) CALL { MATCH (m) RETURN count(*) AS total } " +
      "RETURN n.name AS x, total",
    rows(Map("x" -> "a", "total" -> 3L), Map("x" -> "b", "total" -> 3L),
      Map("x" -> "c", "total" -> 3L)))
  scenario("uncorrelated subquery as the first clause", g,
    "CALL { MATCH (n:B) RETURN n.num AS v } RETURN v + 1 AS x",
    value(3L))
  scenario("uncorrelated subquery multiplies rows", g,
    "UNWIND [10, 20] AS i CALL { UNWIND [1, 2] AS j RETURN j } " +
      "RETURN i + j AS x",
    rows(Map("x" -> 11L), Map("x" -> 12L), Map("x" -> 21L), Map("x" -> 22L)))
  scenario("uncorrelated subquery with WITH-computed literal", g,
    "CALL { WITH 5 AS v RETURN v * 2 AS w } RETURN w AS x", value(10L))
  scenario("node var returned from a subquery stays an element", g,
    "CALL { MATCH (n:A) RETURN n AS m } RETURN m.name AS x", value("a"))
  scenario("uncorrelated ORDER BY LIMIT inside the subquery", g,
    "CALL { MATCH (n) RETURN n.name AS nm ORDER BY nm DESC LIMIT 1 } " +
      "RETURN nm AS x", value("c"))

  // ---------------------------------------------------------- correlated
  scenario("correlated count per driving row", g,
    "MATCH (n) CALL { WITH n MATCH (n)-[r]->() RETURN count(r) AS deg } " +
      "RETURN n.name AS x, deg",
    rows(Map("x" -> "a", "deg" -> 2L), Map("x" -> "b", "deg" -> 1L),
      Map("x" -> "c", "deg" -> 0L)))
  scenario("correlated expansion multiplies rows", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-[r]->(m) RETURN m.name AS t } " +
      "RETURN n.name AS x, t",
    rows(Map("x" -> "a", "t" -> "b"), Map("x" -> "a", "t" -> "c")))
  scenario("correlated non-match drops the driving row", g,
    "MATCH (n) CALL { WITH n MATCH (n)-[:KNOWS]->(m) RETURN m.name AS t } " +
      "RETURN n.name AS x, t",
    rows(Map("x" -> "a", "t" -> "b")))
  scenario("correlated sum coalesces to zero on empty groups", g,
    "MATCH (n:C) CALL { WITH n MATCH (n)-[r:KNOWS]->() " +
      "RETURN sum(r.since) AS s } RETURN s AS x",
    value(0L))
  scenario("correlated subquery over UNWIND-driven rows", g,
    "UNWIND ['a', 'b'] AS nm MATCH (n {name: nm}) " +
      "CALL { WITH n MATCH (n)-->(m) RETURN count(*) AS c } " +
      "RETURN nm AS x, c",
    rows(Map("x" -> "a", "c" -> 2L), Map("x" -> "b", "c" -> 1L)))
  scenario("correlated min over empty group is null", g,
    "MATCH (n:C) CALL { WITH n MATCH (n)-->(m) RETURN min(m.num) AS mn } " +
      "RETURN mn AS x", value(null))
  scenario("aggregate grouped by a subquery-internal key", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-[r]->() " +
      "RETURN type(r) AS t, count(*) AS c } RETURN t, c",
    rows(Map("t" -> "KNOWS", "c" -> 1L), Map("t" -> "LIKES", "c" -> 1L)))
  scenario("DISTINCT applies per driving row", g,
    "MATCH (x:C) CALL { WITH x MATCH (x)<-[r:LIKES]-() " +
      "RETURN DISTINCT type(r) AS t } RETURN x.name AS n, t",
    rows(Map("n" -> "c", "t" -> "LIKES")))

  // ------------------------------------------------------------- errors
  errorScenario("subquery without RETURN", g,
    "CALL { MATCH (n) } RETURN 1 AS x",
    SyntaxError, InvalidSyntax)
  errorScenario("subquery returning an already-bound name", g,
    "MATCH (n) CALL { MATCH (m) RETURN m AS n } RETURN 1 AS x",
    SyntaxError, VariableAlreadyBound)
  errorScenario("importing an unbound variable", g,
    "CALL { WITH ghost MATCH (ghost)-->(m) RETURN m.name AS t } " +
      "RETURN t AS x",
    SyntaxError, UndefinedVariable)
  scenario("correlated top-1 per driving row (ORDER BY + LIMIT)", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) " +
      "RETURN m.name AS t ORDER BY m.num LIMIT 1 } " +
      "RETURN n.name AS x, t",
    rows(Map("x" -> "a", "t" -> "b"))) // ASC nulls-last: b(2) before c(null)
  scenario("correlated SKIP past the first result", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) " +
      "RETURN m.name AS t ORDER BY t SKIP 1 } RETURN t AS x",
    value("c"))
  scenario("correlated LIMIT bounds each row independently", g,
    "MATCH (n) CALL { WITH n MATCH (n)-->(m) " +
      "RETURN m.name AS t ORDER BY t LIMIT 1 } RETURN n.name AS x, t",
    rows(Map("x" -> "a", "t" -> "b"), Map("x" -> "b", "t" -> "c")))
  scenario("aggregating correlated subquery with LIMIT (one row per group)", g,
    "MATCH (n) CALL { WITH n MATCH (n)-->(m) " +
      "RETURN count(*) AS c LIMIT 1 } RETURN n.name AS x, c",
    rows(Map("x" -> "a", "c" -> 2L), Map("x" -> "b", "c" -> 1L),
      Map("x" -> "c", "c" -> 0L)))
  scenario("grouped aggregating body pages groups per driving row", g,
    "MATCH (n) CALL { WITH n MATCH (n)-->(m) " +
      "RETURN m.name AS t, count(*) AS c ORDER BY t DESC LIMIT 1 } " +
      "RETURN n.name AS x, t, c",
    rows(Map("x" -> "a", "t" -> "c", "c" -> 1L),
      Map("x" -> "b", "t" -> "c", "c" -> 1L)))
  scenario("grouped aggregating body SKIPs groups per driving row", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-->(m) " +
      "RETURN m.name AS t, count(*) AS c ORDER BY t SKIP 1 } " +
      "RETURN t AS x", value("c"))
  scenario("grouped aggregating body with no groups drops the driving row", g,
    "MATCH (n:C) CALL { WITH n MATCH (n)-->(m) " +
      "RETURN m.name AS t, count(*) AS c } RETURN n.name AS x, t",
    Seq.empty)
  scenario("grouped body orders groups by the aggregate itself", g,
    "MATCH (n:A) CALL { WITH n MATCH (n)-[r]->(m) " +
      "RETURN m.name AS t, count(r) AS c ORDER BY count(r) DESC, t LIMIT 1 } " +
      "RETURN t AS x", value("b"))
  errorScenario("uncorrelated subquery referencing outer scope", g,
    "MATCH (n) CALL { MATCH (m) WHERE m.num = n.num RETURN m.name AS t } " +
      "RETURN t AS x",
    SyntaxError, UndefinedVariable)
}
