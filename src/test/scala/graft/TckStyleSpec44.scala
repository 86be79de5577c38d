package graft

/** TCK-style conformance, part 44 — GQL / Cypher-2025 standalone clauses,
  * all sugar over WITH *: LET (bindings), FILTER (predicate), and
  * standalone ORDER BY / SKIP / OFFSET / LIMIT. */
class TckStyleSpec44 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("V"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("V"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("V"), Map("name" -> "c", "num" -> 3)),
      N(4, Set("V"), Map("name" -> "d", "num" -> 4))),
    Seq.empty)

  scenario("LET binds an expression and keeps scope", g,
    "MATCH (n:V) LET k = n.num * 10 RETURN n.name AS nm, k " +
      "ORDER BY k LIMIT 2",
    rows(Map("nm" -> "a", "k" -> 10), Map("nm" -> "b", "k" -> 20)),
    ordered = true)
  scenario("LET with multiple bindings", g,
    "MATCH (n:V) LET a = n.num, b = a + 1 RETURN sum(b) AS x", value(14L))
  scenario("FILTER is a standalone predicate", g,
    "MATCH (n:V) FILTER n.num > 2 RETURN count(*) AS x", value(2))
  scenario("FILTER WHERE form", g,
    "MATCH (n:V) FILTER WHERE n.num >= 4 RETURN count(*) AS x", value(1))
  scenario("standalone ORDER BY + LIMIT is top-k", g,
    "MATCH (n:V) ORDER BY n.num DESC LIMIT 2 RETURN n.name AS x",
    rows(Map("x" -> "d"), Map("x" -> "c")))
  scenario("standalone ORDER BY + SKIP", g,
    "MATCH (n:V) ORDER BY n.num SKIP 3 RETURN n.name AS x", value("d"))
  scenario("standalone SKIP", g,
    "MATCH (n:V) ORDER BY n.num SKIP 1 LIMIT 1 RETURN n.name AS x",
    value("b"))
  scenario("standalone LIMIT", g,
    "MATCH (n:V) LIMIT 2 RETURN count(*) AS x", value(2))
  scenario("standalone OFFSET is SKIP", g,
    "MATCH (n:V) ORDER BY n.num OFFSET 3 RETURN n.name AS x", value("d"))
  scenario("OFFSET is a SKIP synonym inside RETURN", g,
    "MATCH (n:V) RETURN n.name AS x ORDER BY x OFFSET 1 LIMIT 2",
    rows(Map("x" -> "b"), Map("x" -> "c")))
  scenario("OFFSET is a SKIP synonym inside WITH", g,
    "MATCH (n:V) WITH n.name AS x ORDER BY x OFFSET 3 RETURN x",
    value("d"))
  // heterogeneous LIST LITERALS under the coercion-list functions convert
  // elementwise at compile time (the bare literal has no single Spark
  // element type, but the coerced result does)
  scenario("toStringList over a mixed literal", g,
    "RETURN toStringList([1, 2.5, true, null]) AS x",
    Seq(Map("x" -> List("1", "2.5", "true", null))))
  scenario("toIntegerList over a mixed literal", g,
    "RETURN toIntegerList(['1', 2.9, true]) AS x",
    Seq(Map("x" -> List(1L, 2L, 1L))))

  scenario("clauses chain", g,
    "MATCH (n:V) LET k = n.num FILTER k > 1 ORDER BY k DESC LIMIT 2 " +
      "RETURN collect(k) AS x", Seq(Map("x" -> List(4, 3))))
}
