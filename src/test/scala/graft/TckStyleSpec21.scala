package graft

import graft.api.CypherError._

/** TCK-style conformance, part 21 — NESTED CALL { } subqueries (gap closed
  * in round 6: the body clause loops now recurse into planCallSubquery).
  * Covers uncorrelated-in-uncorrelated, correlated-in-correlated with
  * re-imported variables, row multiplication through two levels, inner
  * aggregates feeding outer aggregates, UNION bodies at the inner level,
  * per-row paging at the inner level, and the openCypher scoping rule that
  * an inner body only sees what ITS importing WITH brings in. */
class TckStyleSpec21 extends TckScenarioBase {
  import TckFixtures._

  // A(1)-T->B(3), A(1)-T->B(4), A(2)-T->B(3)
  def g = graph(spark,
    Seq(N(1, Set("A"), Map("num" -> 1L)), N(2, Set("A"), Map("num" -> 2L)),
      N(3, Set("B"), Map("num" -> 3L)), N(4, Set("B"), Map("num" -> 4L))),
    Seq(R(10, 1, 3, "T"), R(11, 1, 4, "T"), R(12, 2, 3, "T")))

  scenario("uncorrelated CALL nests inside an uncorrelated CALL", g,
    "CALL { CALL { MATCH (b:B) RETURN count(*) AS cb } " +
      "RETURN cb + 1 AS c1 } RETURN c1 AS x",
    value(3L))

  scenario("correlated CALL nests inside a correlated CALL (re-import)", g,
    "MATCH (a:A) CALL { WITH a CALL { WITH a MATCH (a)-[:T]->(b:B) " +
      "RETURN count(*) AS k } RETURN k } RETURN a.num AS n, k",
    rows(Map("n" -> 1L, "k" -> 2L), Map("n" -> 2L, "k" -> 1L)))

  scenario("inner row-multiplying CALL multiplies the body rows", g,
    "MATCH (a:A) WHERE a.num = 1 CALL { WITH a MATCH (a)-[:T]->(b:B) " +
      "CALL { WITH b UNWIND [1, 2] AS u RETURN u } " +
      "RETURN b.num AS bn, u } RETURN bn, u",
    rows(Map("bn" -> 3L, "u" -> 1L), Map("bn" -> 3L, "u" -> 2L),
      Map("bn" -> 4L, "u" -> 1L), Map("bn" -> 4L, "u" -> 2L)))

  scenario("inner aggregate feeds an outer per-driving-row aggregate", g,
    // per b: in-degree from A; per a: sum over its neighbors' in-degrees
    "MATCH (a:A) CALL { WITH a MATCH (a)-[:T]->(b:B) " +
      "CALL { WITH b MATCH (x:A)-[:T]->(b) RETURN count(*) AS inDeg } " +
      "RETURN sum(inDeg) AS s } RETURN a.num AS n, s",
    rows(Map("n" -> 1L, "s" -> 3L), Map("n" -> 2L, "s" -> 2L)))

  scenario("UNION body at the inner level, per driving row", g,
    // inner UNION (distinct) per a: {a.num, out-degree}; both sum to 3
    "MATCH (a:A) CALL { WITH a CALL { WITH a RETURN a.num AS v " +
      "UNION WITH a MATCH (a)-[:T]->(b:B) RETURN count(*) AS v } " +
      "RETURN sum(v) AS sv } RETURN a.num AS n, sv",
    rows(Map("n" -> 1L, "sv" -> 3L), Map("n" -> 2L, "sv" -> 3L)))

  scenario("inner ORDER BY / LIMIT pages within each middle-body row", g,
    "MATCH (a:A) WHERE a.num = 1 CALL { WITH a MATCH (a)-[:T]->(b:B) " +
      "CALL { WITH b UNWIND [10, 20, 30] AS u RETURN u ORDER BY u DESC " +
      "LIMIT 1 } RETURN b.num AS bn, u } RETURN bn, u",
    rows(Map("bn" -> 3L, "u" -> 30L), Map("bn" -> 4L, "u" -> 30L)))

  scenario("inner CALL drops middle rows with no inner matches", g,
    // b=4 has in-degree 1 from a=1 only; the x<>a filter leaves no rows for
    // (a=1, b=4) -> that middle row drops (CALL {} zero-rows semantics)
    "MATCH (a:A) WHERE a.num = 1 CALL { WITH a MATCH (a)-[:T]->(b:B) " +
      "CALL { WITH b MATCH (x:A)-[:T]->(b) WHERE x.num = 2 " +
      "RETURN x.num AS xn } RETURN b.num AS bn, xn } RETURN bn, xn",
    rows(Map("bn" -> 3L, "xn" -> 2L)))

  errorScenario("inner body does not see outer vars it did not import", g,
    "MATCH (a:A) CALL { WITH a CALL { MATCH (b:B) WHERE b.num > a.num " +
      "RETURN count(*) AS k } RETURN k } RETURN k",
    SyntaxError, UndefinedVariable)

  errorScenario("inner import must be bound in the middle body", g,
    "MATCH (a:A) CALL { WITH a CALL { WITH q RETURN q AS k } " +
      "RETURN k } RETURN k",
    SyntaxError, UndefinedVariable)

  scenario("three levels of nesting", g,
    "CALL { CALL { CALL { MATCH (n) RETURN count(*) AS c0 } " +
      "RETURN c0 } RETURN c0 + 1 AS c1 } RETURN c1 AS x",
    value(5L))
}
