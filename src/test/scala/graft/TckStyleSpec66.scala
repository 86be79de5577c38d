package graft

import graft.api.CypherError

/** TCK-style conformance, part 66 — round-12 probe batch 10 findings.
  *
  * (1) ORDER BY may only aggregate when the projection itself aggregates
  *     (Neo4j wording) — classified, was a leaked Spark
  *     UNSUPPORTED_EXPR_FOR_OPERATOR.
  * (2) percentileCont/percentileDisc over a statically non-numeric value
  *     (a duration, a string) classify as type errors — was a leaked
  *     Spark DATATYPE_MISMATCH.
  * (3) `USING PERIODIC COMMIT [n]` (Neo4j 4.x LOAD CSV batching) is
  *     accepted and discarded like the other USING hints — 4.x migration
  *     scripts run unmodified; there is no transaction machinery to
  *     batch and LOAD CSV runs as one distributed scan. */
class TckStyleSpec66 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2))),
    Seq(R(10, 1, 2, "KNOWS")))

  errorScenario("aggregate in ORDER BY without aggregating RETURN", g,
    "MATCH (n:A) RETURN n.name AS k ORDER BY count(*)",
    CypherError.SyntaxError, CypherError.InvalidAggregation)
  errorScenario("aggregate in WITH ORDER BY without aggregating WITH", g,
    "MATCH (n:A) WITH n.name AS k ORDER BY sum(n.num) RETURN k",
    CypherError.SyntaxError, CypherError.InvalidAggregation)
  scenario("ORDER BY an aggregate the RETURN computes still works", g,
    "MATCH (n:A) RETURN n.name AS k, count(*) AS c ORDER BY count(*), k",
    rows(Map("k" -> "a", "c" -> 1), Map("k" -> "b", "c" -> 1)),
    ordered = true)
  errorScenario("percentileCont over durations is a type error", g,
    "UNWIND [duration('PT1H'), duration('PT3H')] AS d " +
      "RETURN percentileCont(d, 0.5) AS m",
    CypherError.TypeError, CypherError.InvalidArgumentType)
  errorScenario("percentileDisc over strings is a type error", g,
    "MATCH (n:A) RETURN percentileDisc(n.name, 0.5) AS m",
    CypherError.TypeError, CypherError.InvalidArgumentType)
  scenario("USING PERIODIC COMMIT prefix is tolerated and discarded", g,
    "USING PERIODIC COMMIT 500 MATCH (n:A) RETURN count(*) AS c",
    rows(Map("c" -> 2)))
  scenario("USING PERIODIC COMMIT without a batch size", g,
    "USING PERIODIC COMMIT MATCH (n:A) RETURN count(*) AS c",
    rows(Map("c" -> 2)))
}
