package graft

import graft.api.CypherError._
/** TCK-style conformance, part 57 — round-12 probe batch 2 promotions:
  * the quantified-relationship shorthand `-[:R]->{m,n}` (Cypher 5 QPP
  * abbreviation of `(()-[:R]->()){m,n}` — same trail semantics and
  * planner path as every var-length expand) and the `!` not-null type
  * suffix (`INTEGER!` = `INTEGER NOT NULL`, Cypher 2025), including as
  * a LIST element spec. Probes that found the surface already
  * conformant (not re-pinned): FOREACH over bound nodes, MERGE
  * ON CREATE/ON MATCH SET, SET n += map, datetime.truncate, INSERT as
  * CREATE synonym, toIntegerList/toFloatList/toStringList/
  * toBooleanList. */
class TckStyleSpec57 extends TckScenarioBase {
  import TckFixtures._

  //    a -K-> b -K-> c ; a -K-> c
  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a")),
      N(2, Set("B"), Map("name" -> "b")),
      N(3, Set("C"), Map("name" -> "c"))),
    Seq(R(10, 1, 2, "K"), R(11, 2, 3, "K"), R(12, 1, 3, "K")))

  // --- quantified-relationship shorthand --------------------------------
  scenario("rel quantifier {m,n} equals the star range", g,
    "MATCH (s {name: 'a'})-[:K]->{1,2}(b) RETURN b.name AS x ORDER BY x",
    rows(Map("x" -> "b"), Map("x" -> "c"), Map("x" -> "c")), ordered = true)
  scenario("rel quantifier {n} is exactly n", g,
    "MATCH (s {name: 'a'})-[:K]->{2}(b) RETURN b.name AS x", value("c"))
  scenario("rel quantifier on a reversed arrow", g,
    "MATCH (s {name: 'c'})<-[:K]-{1,2}(b) RETURN count(*) AS x", value(3L))
  scenario("rel quantifier with a bound relationship variable groups", g,
    "MATCH (s {name: 'a'})-[r:K]->{2}(b) RETURN size(r) AS x", value(2L))
  scenario("rel quantifier {0,n} admits the empty path", g,
    "MATCH (s {name: 'a'})-[:K]->{0,1}(b) RETURN count(*) AS x",
    value(3L)) // a itself + b + c (direct)
  scenario("shorthand and star agree on the same graph", g,
    "MATCH (s)-[:K]->{1,2}(b) WITH count(*) AS viaBrace " +
      "MATCH (s)-[:K*1..2]->(b) WITH viaBrace, count(*) AS viaStar " +
      "RETURN viaBrace = viaStar AS x",
    value(true))
  // Found while writing the scenario above: a lone projection item mixing
  // an aggregate with an ungrouped variable used to leak Spark's raw
  // MISSING_GROUP_BY analysis error; Neo4j classifies it ("aggregation
  // column contains implicit grouping expressions").
  errorScenario("aggregate mixing an ungrouped variable is classified", g,
    "WITH 1 AS a RETURN a = count(*) AS x",
    SyntaxError, AmbiguousAggregationExpression)

  test("[e1] dead unconstrained var-length endpoint skips the node join") {
    // b is unlabeled and never observed past the MATCH: its id binds
    // straight off the hop column (referential integrity), so the plan
    // must not carry b's node-table union — visible as the absence of
    // b's label columns (the join would materialize b__l_A/B/C).
    val df = session.cypher(g,
      "MATCH (s {name: 'a'})-[:K*1..2]->(b) RETURN count(*) AS x")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("b__l_"),
      s"dead var-length endpoint still joins its node tables:\n$plan")
    assert(df.collect().head.getLong(0) === 3L) // b, c (via b), c (direct)
  }
  test("[e2] an observed var-length endpoint keeps its node join") {
    val df = session.cypher(g,
      "MATCH (s {name: 'a'})-[:K*1..2]->(b) RETURN b.name AS x")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("b__p_name"),
      s"observed endpoint lost its property binding:\n$plan")
  }

  // --- Neo4j drop-in surface: CYPHER preamble + planner hints (both
  //     validated syntactically, then discarded — Catalyst owns planning;
  //     tck_blacklist.md) -------------------------------------------------
  scenario("CYPHER version/options preamble is accepted and ignored", g,
    "CYPHER 25 runtime: MATCH (n:A) RETURN count(*) AS x"
      .replace(" runtime:", " runtime=parallel planner=dp"), value(1L))
  scenario("USING INDEX / SCAN / JOIN hints parse and are ignored", g,
    "MATCH (n:A) USING INDEX n:A(name) WHERE n.name = 'a' " +
      "RETURN count(*) AS x", value(1L))
  scenario("USING JOIN ON with multiple hints", g,
    "MATCH (a:A)-[:K]->(b) USING SCAN a:A USING JOIN ON b " +
      "RETURN count(*) AS x", value(2L)) // a-K->b and a-K->c

  // --- `!` not-null type suffix -----------------------------------------
  // --- single() 3VL (round-12 probe find: size-of-filter dropped nulls,
  //     so single(x IN [1, null] ...) read true — an unknown could be a
  //     second true, making the count unknowable) -------------------------
  scenario("single is three-valued like any/all/none", g,
    "RETURN single(x IN [1, null] WHERE x > 0) AS a, " +
      "single(x IN [1, 2] WHERE x > 0) AS b, " +
      "single(x IN [1] WHERE x > 0) AS c, " +
      "single(x IN [null] WHERE x > 0) AS d, " +
      "single(x IN [] WHERE x > 0) AS e, " +
      "single(x IN [0, 1] WHERE x > 0) AS f",
    rows(Map("a" -> null, "b" -> false, "c" -> true, "d" -> null,
      "e" -> false, "f" -> true)))
  scenario("single over two trues is false despite an unknown", g,
    "RETURN single(x IN [1, 2, null] WHERE x > 0) AS x", value(false))

  scenario("INTEGER! accepts a value and rejects null", g,
    "RETURN 5 IS :: INTEGER! AS a, null IS :: INTEGER! AS b, " +
      "5 IS NOT :: INTEGER! AS c",
    rows(Map("a" -> true, "b" -> false, "c" -> false)))
  scenario("bang suffix equals NOT NULL spelling", g,
    "RETURN (5 IS :: INTEGER!) = (5 IS :: INTEGER NOT NULL) AS a, " +
      "(null IS :: FLOAT!) = (null IS :: FLOAT NOT NULL) AS b",
    rows(Map("a" -> true, "b" -> true)))
  scenario("bang as a list element spec", g,
    "RETURN [1, 2, 3] IS :: LIST<INTEGER!> AS a, " +
      "[1, null] IS :: LIST<INTEGER!> AS b",
    rows(Map("a" -> true, "b" -> false)))
}
