package graft

import graft.api.CypherError

/** TCK-style conformance, part 67 — round-13 ADVICE regressions: entity
  * values in IN / list concat, and the entity-struct marker convention.
  *
  * (1) An entity needle against a NON-entity list is a cross-type-class
  *     membership — never true; null only through a null side. Previously
  *     `m IN $intList` id-normalized the needle and returned true on an
  *     id collision, and `m IN [n1, n2]` leaked a Spark struct-vs-long
  *     DATATYPE_MISMATCH from the isin fallthrough.
  * (2) nodes(p)/relationships(p) id lists and entity-struct lists mix in
  *     `+` concat (struct side normalizes to ids); an entity list against
  *     a non-entity list is a classified type error (no shared Spark
  *     element type — documented deviation: Neo4j's heterogeneous lists).
  * (3) A user map literal `{_id: 1, ...}` is a PLAIN map — the entity
  *     struct convention requires the full marker set (_id plus _labels
  *     or _src/_tgt/_type), so map equality/render semantics are kept.
  * (4) UNWIND over a statically (or parameter-known) non-list classifies
  *     as TypeError (Neo4j "Expected list<T>"), not SyntaxError. */
class TckStyleSpec67 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a")),
      N(2, Set("A"), Map("name" -> "b"))),
    Seq(R(10, 1, 2, "KNOWS")))

  // --- (1) entity membership vs non-entity lists ------------------------
  scenario("unwound entity IN an integer parameter list is false", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN m.name AS k, m IN $xs AS inxs ORDER BY k",
    rows(Map("k" -> "a", "inxs" -> false), Map("k" -> "b", "inxs" -> false)),
    ordered = true,
    params = Map("xs" -> Seq(1L, 99L))) // 1 collides with node a's id
  scenario("unwound entity IN an integer literal list is false", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN m IN [1, 2] AS x LIMIT 1",
    rows(Map("x" -> false)))
  scenario("entity IN a list containing null is null", g,
    "MATCH (n:A {name: 'a'}) RETURN n IN [null] AS x",
    rows(Map("x" -> null)))
  scenario("entity IN an empty list is false", g,
    "MATCH (n:A {name: 'a'}) RETURN n IN [] AS x",
    rows(Map("x" -> false)))
  scenario("entity IN a literal list of entities compares by identity", g,
    "MATCH (m:A {name: 'a'}) MATCH (x:A) " +
      "RETURN x.name AS k, x IN [m] AS inm ORDER BY k",
    rows(Map("k" -> "a", "inm" -> true), Map("k" -> "b", "inm" -> false)),
    ordered = true)
  scenario("entity IN a mixed literal list: entity item decides", g,
    "MATCH (m:A {name: 'a'}) RETURN m IN [1, m] AS x",
    rows(Map("x" -> true)))
  scenario("header entity IN nodes(p) still works", g,
    "MATCH p = (a:A)-[:KNOWS]->(b) MATCH (x:A {name: 'a'}) " +
      "RETURN x IN nodes(p) AS inp",
    rows(Map("inp" -> true)))
  scenario("entity IN tail(nodes(p)) respects the wrapper", g,
    "MATCH p = (a:A)-[:KNOWS]->(b) MATCH (x:A {name: 'a'}) " +
      "RETURN x IN tail(nodes(p)) AS inp",
    rows(Map("inp" -> false)))
  scenario("entity IN a string list is false", g,
    "MATCH (n:A {name: 'a'}) RETURN n IN ['a', 'b'] AS x",
    rows(Map("x" -> false)))

  // --- (2) mixed-representation list concat ------------------------------
  scenario("nodes(p) + [entity] concatenates (id-list result)", g,
    "MATCH p = (a:A {name: 'a'})-[:KNOWS]->(b) " +
      "RETURN size(nodes(p) + [b]) AS s",
    rows(Map("s" -> 3)))
  scenario("membership over a nodes(p) + [entity] concat", g,
    "MATCH p = (a:A {name: 'a'})-[:KNOWS]->(b) " +
      "RETURN a IN (nodes(p) + [b]) AS x",
    rows(Map("x" -> true)))
  errorScenario("entity list + integer list concat is a type error", g,
    "MATCH (n:A) WITH collect(n) AS ns RETURN ns + [1] AS x",
    CypherError.TypeError, CypherError.InvalidArgumentType)

  // --- (3) map literals with marker-looking keys stay plain maps --------
  scenario("a map literal with an _id key is a plain map", g,
    "RETURN {_id: 1, name: 'x'} AS m",
    rows(Map("m" -> Map("_id" -> 1L, "name" -> "x"))))
  scenario("map equality on an _id-keyed literal compares all keys", g,
    "RETURN {_id: 1, name: 'x'} = {_id: 1, name: 'y'} AS eq",
    rows(Map("eq" -> false)))
  scenario("property access on an _id-keyed map literal", g,
    "RETURN {_id: 1, name: 'x'}.name AS v",
    rows(Map("v" -> "x")))

  // --- (4) UNWIND type classification ------------------------------------
  errorScenario("UNWIND over an integer is a type error", g,
    "UNWIND 5 AS x RETURN x",
    CypherError.TypeError, CypherError.InvalidArgumentType)
  errorScenario("UNWIND over a map literal is a type error", g,
    "UNWIND {a: 1} AS x RETURN x",
    CypherError.TypeError, CypherError.InvalidArgumentType)

  test("UNWIND over a non-list parameter is a classified type error") {
    val e = intercept[graft.api.CypherException] {
      session.cypher(g, "UNWIND $p AS x RETURN x",
        Map("p" -> Map("a" -> 1))).collect()
    }
    assert(e.errorType === CypherError.TypeError, s"raised: $e")
  }

  scenario("UNWIND over a list parameter still explodes", g,
    "UNWIND $p AS x RETURN x ORDER BY x",
    rows(Map("x" -> 1L), Map("x" -> 2L)), ordered = true,
    params = Map("p" -> Seq(1L, 2L)))
}
