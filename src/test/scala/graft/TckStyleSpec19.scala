package graft

import graft.api.CypherError._

/** TCK-style conformance, part 19 — dynamic maps in SET n = / += (round-6
  * gap closed): any struct-typed expression works as the map source —
  * properties(x), an entity variable (copies its properties), a WITH-bound
  * map value, per-row computed maps — with keys fixed at compile time by
  * the struct schema. Only truly runtime-keyed maps (impossible in this
  * typed engine) stay a classified error. */
class TckStyleSpec19 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c"))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 1, 3, "LIKES")))

  // ------------------------------------------------------ properties(x)
  scenario("SET += properties(x) overwrites colliding keys", g,
    "MATCH (a:A), (b:B) SET a += properties(b) RETURN a.name AS x",
    value("b"))
  scenario("SET += properties(x) adds missing keys", g,
    "MATCH (a:A), (c:C) SET c += properties(a) RETURN c.num AS x",
    value(1L))
  scenario("SET = properties(x) clears keys outside the source", g,
    "MATCH (a:A), (c:C) SET a = properties(c) RETURN a.num AS x",
    value(null))
  scenario("SET = properties(x) copies the source keys", g,
    "MATCH (a:A), (c:C) SET a = properties(c) RETURN a.name AS x",
    value("c"))

  // --------------------------------------------------- entity variables
  scenario("SET n = m copies another node's properties", g,
    "MATCH (a:A), (b:B) SET a = b RETURN a.num AS x", value(2L))
  scenario("SET n += r copies a relationship's properties", g,
    "MATCH (a:A)-[r:KNOWS]->(b) SET b += r RETURN b.since AS x",
    value(2010L))

  // ------------------------------------------------------- map values
  scenario("SET += a WITH-bound map value", g,
    "WITH {mood: 'ok', num: 9} AS m MATCH (n:A) SET n += m " +
      "RETURN n.mood AS x", value("ok"))
  scenario("SET += a WITH-bound map overwrites from the value", g,
    "WITH {mood: 'ok', num: 9} AS m MATCH (n:A) SET n += m " +
      "RETURN n.num AS x", value(9L))
  scenario("SET += a per-row computed map", g,
    "MATCH (n) WHERE n.num IS NOT NULL WITH n, {double: n.num * 2} AS m " +
      "SET n += m RETURN n.double AS x",
    rows(Map("x" -> 2L), Map("x" -> 4L)))
  scenario("SET += an empty literal map is a no-op", g,
    "MATCH (n:A) SET n += {} RETURN n.num AS x", value(1L))
  scenario("SET += null value inside a dynamic map removes per row", g,
    "MATCH (a:A), (c:C) SET a = properties(c) WITH a MATCH (m:A) " +
      "RETURN m.num AS x", value(null))

  // ------------------------------------------------------------ errors
  errorScenario("SET += a non-map value", g,
    "MATCH (n:A) SET n += n.num RETURN 1 AS x",
    SemanticError, UnsupportedExpression)
  errorScenario("SET += null", g,
    "MATCH (n:A) SET n += null RETURN 1 AS x",
    SemanticError, UnsupportedExpression)
  errorScenario("SET = a list value", g,
    "MATCH (n:A) SET n = [1, 2] RETURN 1 AS x",
    SemanticError, UnsupportedExpression)
}
