package graft

/** TCK-style conformance, part 69 — round-13 probe batch 2: compositional
  * entity-value shapes around the r13 type changes (literal entity lists
  * now carry their struct element type statically; CASE/coalesce entity
  * unification; entity ordering/distinct). */
class TckStyleSpec69 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("B"), Map("name" -> "c", "other" -> true))),
    Seq(R(10, 1, 2, "KNOWS"), R(11, 2, 3, "KNOWS")))

  scenario("property access on a CASE over entities", g,
    "MATCH (a:A {name: 'a'}), (b:A {name: 'b'}) " +
      "RETURN (CASE WHEN a.num < b.num THEN a ELSE b END).name AS n",
    rows(Map("n" -> "a")))
  scenario("property access on head(collect(n))", g,
    "MATCH (n:A) WITH n ORDER BY n.name WITH collect(n) AS ns " +
      "RETURN head(ns).name AS n",
    rows(Map("n" -> "a")))
  scenario("list comprehension over a literal entity list", g,
    "MATCH (a:A {name: 'a'}), (b:A {name: 'b'}) " +
      "RETURN [x IN [a, b] WHERE x.num > 1 | x.name] AS ns",
    rows(Map("ns" -> Seq("b"))))
  scenario("size and indexing on a literal entity list", g,
    "MATCH (a:A {name: 'a'}), (b:A {name: 'b'}) " +
      "RETURN size([a, b]) AS s, [a, b][1].name AS n1",
    rows(Map("s" -> 2L, "n1" -> "b")))
  scenario("RETURN DISTINCT on entities deduplicates by identity", g,
    "MATCH (n:A)-[:KNOWS]->() MATCH (m:A) WHERE m = n " +
      "RETURN DISTINCT m.name AS k ORDER BY k",
    rows(Map("k" -> "a"), Map("k" -> "b")), ordered = true)
  scenario("collect(DISTINCT n) over duplicated entities", g,
    "MATCH (n:A {name: 'a'}) UNWIND [1, 2] AS i " +
      "WITH collect(DISTINCT n) AS ns RETURN size(ns) AS s",
    rows(Map("s" -> 1L)))
  scenario("UNION of entity columns then property read", g,
    "MATCH (n:A {name: 'a'}) RETURN n " +
      "UNION MATCH (n:B) RETURN n",
    rows(Map("n" -> Map("_id" -> 1L, "_labels" -> Seq("A"),
        "_properties" -> Map("name" -> "a", "num" -> 1L, "other" -> null))),
      Map("n" -> Map("_id" -> 3L, "_labels" -> Seq("B"),
        "_properties" -> Map("name" -> "c", "num" -> null, "other" -> true)))))
  scenario("coalesce over an optional entity and a bound entity", g,
    "MATCH (a:A {name: 'a'}) OPTIONAL MATCH (z:B {name: 'nope'}) " +
      "RETURN coalesce(z, a).name AS n",
    rows(Map("n" -> "a")))
  scenario("CASE entity result flows into collect and UNWIND", g,
    "MATCH (a:A {name: 'a'}), (c:B) " +
      "WITH collect(CASE WHEN true THEN a ELSE c END) AS ns " +
      "UNWIND ns AS m RETURN m.name AS n, labels(m) AS ls",
    rows(Map("n" -> "a", "ls" -> Seq("A"))))
  scenario("entity equality between CASE result and its source", g,
    "MATCH (a:A {name: 'a'}) " +
      "RETURN (CASE WHEN true THEN a ELSE null END) = a AS eq",
    rows(Map("eq" -> true)))
  scenario("entity equality between coalesce result and its source", g,
    "MATCH (a:A {name: 'a'}) OPTIONAL MATCH (z:B {name: 'nope'}) " +
      "RETURN coalesce(z, a) = a AS eq",
    rows(Map("eq" -> true)))
  scenario("CASE entity result IN a literal entity list", g,
    "MATCH (a:A {name: 'a'}), (b:A {name: 'b'}) " +
      "RETURN (CASE WHEN true THEN a ELSE b END) IN [b] AS x",
    rows(Map("x" -> false)))
}
