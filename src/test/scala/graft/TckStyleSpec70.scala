package graft

/** TCK-style conformance, part 70 — round-13 probe batch 3: entity-value
  * accessor/write shapes and expression corners. */
class TckStyleSpec70 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2))),
    Seq(R(10, 1, 2, "KNOWS", Map("w" -> 5))))

  // --- entity-value accessors ---------------------------------------------
  scenario("id() of an unwound collected node", g,
    "MATCH (n:A {name: 'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "MATCH (x:A {name: 'a'}) RETURN id(m) = id(x) AS same",
    rows(Map("same" -> true)))
  scenario("keys() of an unwound collected node", g,
    "MATCH (n:A {name: 'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN keys(m) AS ks",
    rows(Map("ks" -> Seq("name", "num"))))
  scenario("dynamic property access on an unwound collected node", g,
    "MATCH (n:A {name: 'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN m['name'] AS v",
    rows(Map("v" -> "a")))
  scenario("startNode/endNode of a collected relationship", g,
    "MATCH (a)-[r:KNOWS]->(b) WITH collect(r) AS rs UNWIND rs AS e " +
      "MATCH (x:A {name: 'a'}) RETURN startNode(e) = x AS s",
    rows(Map("s" -> true)))
  scenario("ORDER BY an entity value orders by identity", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN m.name AS k ORDER BY m",
    rows(Map("k" -> "a"), Map("k" -> "b")), ordered = true)

  // --- entity-value writes -------------------------------------------------
  scenario("SET += a map onto an unwound collected node", g,
    "MATCH (n:A {name: 'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "SET m += {num: 10, extra: 'x'} " +
      "WITH m MATCH (y:A {name: 'a'}) RETURN y.num AS v, y.extra AS e",
    rows(Map("v" -> 10L, "e" -> "x")))
  scenario("REMOVE a property through an unwound collected node", g,
    "MATCH (n:A {name: 'b'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "REMOVE m.num WITH m MATCH (y:A {name: 'b'}) RETURN y.num AS v",
    rows(Map("v" -> null)))

  // --- expression corners --------------------------------------------------
  scenario("range with a negative step", g,
    "RETURN range(5, 1, -2) AS r",
    rows(Map("r" -> Seq(5L, 3L, 1L))))
  scenario("substring beyond the end is empty", g,
    "RETURN substring('abc', 10) AS s",
    rows(Map("s" -> "")))
  scenario("reduce building a list accumulator", g,
    "RETURN reduce(acc = [], x IN [1, 2, 3] | acc + [x * 2]) AS r",
    rows(Map("r" -> Seq(2L, 4L, 6L))))
  scenario("percentileCont over a single value", g,
    "UNWIND [42.0] AS v RETURN percentileCont(v, 0.7) AS p",
    rows(Map("p" -> 42.0)))
  scenario("nested quantifier over a comprehension of entities", g,
    "MATCH p = (a:A {name: 'a'})-[:KNOWS]->(b) " +
      "RETURN all(x IN [n IN nodes(p) WHERE n.num IS NOT NULL] " +
      "WHERE x.num < 10) AS ok",
    rows(Map("ok" -> true)))
}
