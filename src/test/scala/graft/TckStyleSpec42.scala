package graft

import graft.api.CypherError._

/** TCK-style conformance, part 42 — Neo4j 5.24 dynamic write surface:
  * `SET n[key] = v`, `REMOVE n[key]`, `SET n:$(expr)`, `REMOVE n:$(expr)`.
  * The columnar schema is fixed at plan time, so keys/labels must resolve
  * to compile-time strings (literals or parameters); anything else is a
  * classified UnsupportedExpression — a documented deviation from Neo4j's
  * per-row evaluation. */
class TckStyleSpec42 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A", "B"), Map("name" -> "a", "num" -> 1))),
    Seq.empty)

  // ---------------------------- dynamic property SET
  scenario("SET n[literal] writes the property", g,
    "MATCH (n:A) SET n['num'] = 42 RETURN n.num AS x", value(42))
  scenario("SET n[literal] creates a new property", g,
    "MATCH (n:A) SET n['fresh'] = 'y' RETURN n.fresh AS x", value("y"))
  scenario("SET n[param] resolves through parameters", g,
    "MATCH (n:A) SET n[$key] = 7 RETURN n.num AS x", value(7),
    params = Map("key" -> "num"))
  scenario("SET n[key] mixed with plain items", g,
    "MATCH (n:A) SET n['num'] = 2, n.name = 'z' " +
      "RETURN n.name AS nm, n.num AS x",
    rows(Map("nm" -> "z", "x" -> 2)))

  // ---------------------------- dynamic property REMOVE
  scenario("REMOVE n[literal] nulls the property", g,
    "MATCH (n:A) REMOVE n['num'] RETURN n.num AS x", Seq(Map("x" -> null)))
  scenario("REMOVE n[param]", g,
    "MATCH (n:A) REMOVE n[$key] RETURN n.name AS x", Seq(Map("x" -> null)),
    params = Map("key" -> "name"))

  // ---------------------------- dynamic labels
  scenario("SET n:$(literal) adds the label", g,
    "MATCH (n:A) SET n:$('Extra') RETURN n:Extra AS x", value(true))
  scenario("SET chains static and dynamic label pieces", g,
    "MATCH (n:A) SET n:Stat:$('Dyn') RETURN n:Stat AND n:Dyn AS x",
    value(true))
  scenario("SET n:$(param) with a label list", g,
    "MATCH (n:A) SET n:$($labs) RETURN n:L1 AND n:L2 AS x", value(true),
    params = Map("labs" -> Seq("L1", "L2")))
  scenario("REMOVE n:$(literal) drops the label", g,
    "MATCH (n:A) REMOVE n:$('B') RETURN n:B AS x", value(false))

  // ---------------------------- compile-time resolution rule
  errorScenario("SET key must be compile-time constant", g,
    "MATCH (n:A) WITH n, 'k' AS key SET n[key] = 5 RETURN n.name AS x",
    SemanticError, UnsupportedExpression)
  errorScenario("REMOVE key must be compile-time constant", g,
    "MATCH (n:A) REMOVE n[n.name] RETURN n.name AS x",
    SemanticError, UnsupportedExpression)
  errorScenario("dynamic label must be compile-time constant", g,
    "MATCH (n:A) SET n:$(n.name) RETURN n.name AS x",
    SemanticError, UnsupportedExpression)
}
