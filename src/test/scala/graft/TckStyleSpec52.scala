package graft

import graft.api.CypherError._

/** TCK-style conformance, part 52 — `NEXT` linear composition (GQL /
  * Cypher 2025): `q1 NEXT q2 NEXT …` chains queries, each segment's
  * RETURN columns becoming (exactly) the working table of the next.
  * Desugared in the parser onto WITH (the re-scoping projection NEXT
  * specifies); a UNION first segment plans as an uncorrelated CALL { }.
  * UNION binds tighter than NEXT. */
class TckStyleSpec52 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("B"), Map("name" -> "c", "num" -> 3))),
    Seq(R(10, 1, 2, "KNOWS"), R(11, 2, 3, "KNOWS")))

  scenario("NEXT threads returned columns into the next segment", g,
    "MATCH (n:A) RETURN n.num AS v NEXT RETURN sum(v) AS x", value(3L))
  scenario("NEXT re-scopes: only returned columns survive", g,
    "MATCH (n:A) RETURN n.num AS v NEXT RETURN v ORDER BY v",
    rows(Map("v" -> 1L), Map("v" -> 2L)), ordered = true)
  scenario("a NEXT segment can MATCH against the threaded value", g,
    "MATCH (n:A {name: 'a'}) RETURN n.num + 1 AS t " +
      "NEXT MATCH (m {num: t}) RETURN m.name AS x", value("b"))
  scenario("three-segment chain", g,
    "MATCH (n) RETURN n.num AS v NEXT WITH v WHERE v > 1 " +
      "RETURN v * 10 AS w NEXT RETURN sum(w) AS x", value(50L))
  scenario("RETURN DISTINCT in a NEXT segment dedups the working table", g,
    "UNWIND [1, 1, 2, 2, 3] AS v RETURN DISTINCT v " +
      "NEXT RETURN count(*) AS x", value(3L))
  scenario("ORDER BY + LIMIT in a non-final segment selects rows", g,
    "MATCH (n) RETURN n.num AS v ORDER BY v DESC LIMIT 2 " +
      "NEXT RETURN sum(v) AS x", value(5L))
  scenario("RETURN * threads every variable", g,
    "MATCH (n:A) RETURN * NEXT RETURN count(n) AS x", value(2L))
  scenario("UNION first segment seeds the working table", g,
    "MATCH (n:A) RETURN n.num AS v UNION MATCH (m:B) RETURN m.num AS v " +
      "NEXT RETURN sum(v) AS x", value(6L))
  scenario("UNION ALL first segment keeps duplicates", g,
    "MATCH (n:A) RETURN 1 AS v UNION ALL MATCH (m) RETURN 1 AS v " +
      "NEXT RETURN count(*) AS x, sum(v) AS y",
    rows(Map("x" -> 5L, "y" -> 5L)))
  scenario("a write segment can end the chain", g,
    "MATCH (n:A) RETURN n.num AS v NEXT CREATE (:C {v: v}) WITH * " +
      "MATCH (c:C) WITH DISTINCT c RETURN sum(c.v) AS x", value(3L))
  scenario("aggregation segment feeding a per-group segment", g,
    "MATCH (n) RETURN n.num % 2 AS grp, count(*) AS c " +
      "NEXT RETURN grp, c ORDER BY grp",
    rows(Map("grp" -> 0L, "c" -> 1L), Map("grp" -> 1L, "c" -> 2L)),
    ordered = true)
  errorScenario("a non-final segment must end in RETURN", g,
    "MATCH (n) NEXT RETURN 1 AS x", SyntaxError, InvalidSyntax)
  errorScenario("a UNION segment after the first is rejected", g,
    "RETURN 1 AS v NEXT RETURN v UNION RETURN v", SyntaxError, InvalidSyntax)
}
