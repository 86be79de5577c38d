package graft

import graft.api.CypherError._

/** TCK-style conformance, part 53 — round-11 probe findings promoted:
  * dynamic labels and relationship types in MATCH (`:$(expr)` /
  * `:!$(expr)`, Neo4j 5.26/2025), the explicit GQL `UNION DISTINCT`
  * keyword, and the `IS [NOT] TYPED` keyword synonym of `::`.
  *
  * Dynamic-term semantics: a STRING is one required label/type; a
  * LIST<STRING> is a conjunction for labels (all present) and a union
  * for relationship types (a rel carries exactly one type); null matches
  * nothing, also under negation. A dynamic term disables compile-time
  * scan pruning (an optimistic include would flip to a wrong exclusion
  * under `!`), so every combo table scans and a runtime row filter
  * applies the constraint. */
class TckStyleSpec53 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("A", "B"), Map("name" -> "ab", "num" -> 3))),
    Seq(R(10, 1, 2, "KNOWS"), R(11, 2, 3, "LIKES")))

  // --- dynamic node labels ------------------------------------------------
  scenario("dynamic label from an outer variable", g,
    "WITH 'A' AS l MATCH (n:$(l)) RETURN n.name AS x ORDER BY x",
    rows(Map("x" -> "a"), Map("x" -> "ab")), ordered = true)
  scenario("dynamic label from a literal", g,
    "MATCH (n:$('B')) RETURN count(*) AS x", value(2L))
  scenario("dynamic label list is a conjunction", g,
    "WITH ['A', 'B'] AS l MATCH (n:$(l)) RETURN n.name AS x", value("ab"))
  scenario("null dynamic label matches nothing", g,
    "WITH null AS l MATCH (n:$(l)) RETURN count(*) AS x", value(0L))
  scenario("negated dynamic label", g,
    "MATCH (n:!$('B')) RETURN n.name AS x", value("a"))
  // Null under `!` mirrors the rel-type rule (null satisfies no pattern
  // predicate, negated or not): a per-term null→false coalesce would flip
  // to match-all under the negation — the round-12 3VL fix.
  scenario("null dynamic label under negation matches nothing", g,
    "WITH null AS l MATCH (n:!$(l)) RETURN count(*) AS x", value(0L))
  scenario("null dynamic label list under negation matches nothing", g,
    "WITH [null] AS l MATCH (n:!$(l)) RETURN count(*) AS x", value(0L))
  // Non-string / un-inferrable dynamic terms are a compile-time type
  // error (Neo4j: "expected STRING or LIST<STRING>"), not a silent
  // cast-to-string comparison that matches nothing.
  errorScenario("integer dynamic label is a type error", g,
    "WITH 1 AS l MATCH (n:$(l)) RETURN count(*) AS x",
    TypeError, InvalidArgumentType)
  errorScenario("integer-list dynamic rel type is a type error", g,
    "WITH [1, 2] AS t MATCH ()-[r:$(t)]->() RETURN count(*) AS x",
    TypeError, InvalidArgumentType)
  scenario("dynamic label mixed with a static conjunct", g,
    "MATCH (n:A&$('B')) RETURN n.name AS x", value("ab"))
  scenario("dynamic label on a bound variable re-constrains", g,
    "MATCH (n) WITH n, 'A' AS l MATCH (n:$(l)) RETURN count(*) AS x",
    value(2L))

  // --- dynamic relationship types ------------------------------------------
  scenario("dynamic rel type from an outer variable", g,
    "WITH 'KNOWS' AS t MATCH (a)-[r:$(t)]->(b) RETURN a.name AS x",
    value("a"))
  scenario("dynamic rel type list is a union", g,
    "MATCH (a)-[r:$(['KNOWS', 'LIKES'])]->(b) RETURN count(*) AS x",
    value(2L))
  scenario("negated dynamic rel type", g,
    "MATCH (a)-[r:!$('KNOWS')]->(b) RETURN a.name AS x", value("b"))
  scenario("null dynamic rel type matches nothing", g,
    "WITH null AS t MATCH (a)-[r:$(t)]->(b) RETURN count(*) AS x",
    value(0L))
  scenario("dynamic rel type on a var-length expand", g,
    "MATCH (s:A {name: 'a'})-[:$('KNOWS')*1..2]->(b) RETURN b.name AS x",
    value("b"))
  scenario("self-contained dynamic type over var-length multi-type graph", g,
    "MATCH (s {name: 'a'})-[:$(['KNOWS', 'LIKES'])*1..2]->(b) " +
      "RETURN b.name AS x ORDER BY x",
    rows(Map("x" -> "ab"), Map("x" -> "b")), ordered = true)
  errorScenario("dynamic rel type cannot mix with | alternatives", g,
    "MATCH (a)-[r:$('KNOWS')|LIKES]->(b) RETURN count(*) AS x",
    SyntaxError, InvalidSyntax)

  // --- plan-time folding of literal/parameter dynamic terms ----------------
  scenario("dynamic label from a parameter", g,
    "MATCH (n:$($lbl)) RETURN count(*) AS x", value(2L),
    params = Map("lbl" -> "B"))
  scenario("dynamic label from a parameter list", g,
    "MATCH (n:$($ls)) RETURN n.name AS x", value("ab"),
    params = Map("ls" -> Seq("A", "B")))
  scenario("dynamic rel type from a parameter", g,
    "MATCH (a)-[r:$($t)]->(b) RETURN a.name AS x",
    value("a"), params = Map("t" -> "KNOWS"))
  test("[f1] literal dynamic label folds to a static scan (plan pruned)") {
    // A plan-time-known label must restore exact closed-world table
    // pruning: the scan of (:$('B')) must not union the A-only table —
    // visible as the absence of A-only property columns in the plan's
    // unioned scan (the Just-A node has a distinct synthetic shape here,
    // so instead assert via row provenance: folding is semantics-checked
    // above; this pins the NodeCons fast path by checking the compiled
    // plan contains no HasDynLabels runtime filter artifacts).
    val df = session.cypher(g, "MATCH (n:$('B')) RETURN n.num AS x")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("array_contains"),
      s"literal dynamic label was not folded:\n$plan")
  }
  test("[f2] parameter dynamic rel type folds (no runtime type filter)") {
    val df = session.cypher(g,
      "MATCH (a)-[r:$($t)]->(b) RETURN count(*) AS x",
      Map("t" -> "KNOWS"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("array_contains"),
      s"parameter dynamic type was not folded:\n$plan")
  }

  // --- UNION DISTINCT / IS TYPED -------------------------------------------
  scenario("UNION DISTINCT explicit keyword", g,
    "RETURN 1 AS x UNION DISTINCT RETURN 1 AS x", value(1L))
  scenario("UNION DISTINCT in a COUNT subquery body", g,
    "RETURN COUNT { RETURN 1 AS v UNION DISTINCT RETURN 1 AS v } AS x",
    value(1L))
  scenario("IS TYPED keyword synonym", g,
    "RETURN 1 IS TYPED INTEGER AS a, '1' IS NOT TYPED INTEGER AS b",
    rows(Map("a" -> true, "b" -> true)))
}
