package graft

/** TCK-style conformance, part 15 — path function breadth over mixed and
  * var-length patterns, OPTIONAL MATCH chains, var-length property
  * predicates, nested comprehensions and reduce shapes, and EXISTS{} in
  * value positions (see TckStyleSpec for why these are hand-authored). */
class TckStyleSpec15 extends TckScenarioBase {
  import TckFixtures._

  lazy val gPath = graph(spark,
    Seq(N(1, Set("Hub"), Map("name" -> "h")),
      N(2, Set("Spoke"), Map("name" -> "s1")),
      N(3, Set("Spoke"), Map("name" -> "s2"))),
    Seq(R(10, 1, 2, "T"), R(11, 1, 3, "T")))

  // ---- path-bound pattern comprehensions (round 8) ----
  scenario("path-bound comprehension projects path functions", gPath,
    "MATCH (h:Hub) RETURN [p = (h)-[:T]->(s) | length(p)] AS x",
    value(List(1L, 1L)))
  scenario("path-bound comprehension with a WHERE over the path", gPath,
    "MATCH (h:Hub) RETURN size([p = (h)-[:T]->(s) " +
      "WHERE length(p) = 1 | nodes(p)]) AS x", value(2L))
  scenario("bracketed equality over parens stays a list literal", gPath,
    "WITH 3 AS a RETURN [a = (1 + 2)] AS x", value(List(true)))

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c", "num" -> 3)),
      N(4, Set("D"), Map("name" -> "d"))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("w" -> 5)),
      R(11, 2, 3, "KNOWS", Map("w" -> 7)),
      R(12, 3, 4, "KNOWS", Map("w" -> 2)),
      R(13, 1, 3, "LIKES")))

  // ------------------------------------------------------ path functions
  scenario("length of a two-hop path", g,
    "MATCH p = (:A)-[:KNOWS]->()-[:KNOWS]->() RETURN length(p) AS x",
    value(2L))
  scenario("nodes() of a fixed path lists ids in order", g,
    "MATCH p = (a:A)-[:KNOWS]->(b) RETURN size(nodes(p)) AS n, " +
      "nodes(p)[0] = id(a) AS first, nodes(p)[1] = id(b) AS second",
    rows(Map("n" -> 2L, "first" -> true, "second" -> true)))
  scenario("relationships() of a var-length path", g,
    "MATCH p = (:A)-[:KNOWS*2]->() RETURN size(relationships(p)) AS x",
    value(2L))
  scenario("length of a var-length path varies per row", g,
    "MATCH p = (:A)-[:KNOWS*1..3]->() RETURN length(p) AS x",
    rows(Map("x" -> 1L), Map("x" -> 2L), Map("x" -> 3L)))
  scenario("path over a mixed-type pattern", g,
    "MATCH p = (:A)-[:LIKES]->()-[:KNOWS]->(x) " +
      "RETURN length(p) AS n, x.name AS t",
    rows(Map("n" -> 2L, "t" -> "d")))

  // ------------------------------------------- var-length with predicates
  scenario("var-length with a relationship property constraint", g,
    "MATCH (:A)-[:KNOWS* {w: 5}]->(x) RETURN x.name AS t",
    rows(Map("t" -> "b")))
  scenario("all() quantifier over var-length relationships", g,
    "MATCH p = (:A)-[:KNOWS*1..3]->() " +
      "WHERE all(r IN relationships(p) WHERE r.w > 4) " +
      "RETURN length(p) AS x",
    rows(Map("x" -> 1L), Map("x" -> 2L)))
  scenario("any() quantifier over var-length relationships", g,
    "MATCH p = (:A)-[:KNOWS*3]->() " +
      "WHERE any(r IN relationships(p) WHERE r.w = 2) " +
      "RETURN length(p) AS x",
    value(3L))
  scenario("reduce over var-length relationship weights", g,
    "MATCH p = (:A)-[:KNOWS*3]->(:D) " +
      "RETURN reduce(s = 0, r IN relationships(p) | s + r.w) AS x",
    value(14L))
  scenario("var-length lower bound above available depth is empty", g,
    "MATCH (:A)-[:KNOWS*4..5]->(x) RETURN count(*) AS x", value(0L))

  // --------------------------------------------------- OPTIONAL chains
  scenario("two OPTIONAL MATCH clauses chain independently", g,
    "MATCH (a:A) OPTIONAL MATCH (a)-[:NOPE]->(m) " +
      "OPTIONAL MATCH (a)-[:LIKES]->(k) " +
      "RETURN m IS NULL AS noM, k.name AS t",
    rows(Map("noM" -> true, "t" -> "c")))
  scenario("OPTIONAL MATCH row feeds a later MATCH through WITH", g,
    "MATCH (a:A) OPTIONAL MATCH (a)-[:LIKES]->(c) WITH c " +
      "MATCH (c)-[:KNOWS]->(d) RETURN d.name AS x",
    value("d"))
  scenario("OPTIONAL MATCH WHERE filters inside the optional side", g,
    "MATCH (a) OPTIONAL MATCH (a)-[r:KNOWS]->(b) WHERE b.num > 2 " +
      "RETURN a.name AS n, b.name AS t",
    rows(Map("n" -> "a", "t" -> null), Map("n" -> "b", "t" -> "c"),
      Map("n" -> "c", "t" -> null), Map("n" -> "d", "t" -> null)))
  scenario("aggregation over an optional var-length", g,
    "MATCH (a:D) OPTIONAL MATCH (a)-[:KNOWS*]->(m) " +
      "RETURN count(m) AS x", value(0L))

  // ------------------------------------------- comprehensions and reduce
  scenario("nested list comprehension", g,
    "RETURN [x IN [1, 2] | [y IN [10] | x * y]] AS x",
    value(Seq(Seq(10L), Seq(20L))))
  scenario("comprehension over a comprehension result", g,
    "WITH [x IN range(1, 5) WHERE x % 2 = 1 | x] AS odds " +
      "RETURN [o IN odds | o * o] AS x",
    value(Seq(1L, 9L, 25L)))
  scenario("reduce builds a string", g,
    "RETURN reduce(s = '', w IN ['a', 'b', 'c'] | s + w) AS x",
    value("abc"))
  scenario("reduce with a list accumulator", g,
    "RETURN size(reduce(acc = [], x IN [1, 2, 3] | acc + x)) AS x",
    value(3L))
  scenario("comprehension binder shadows an outer variable", g,
    "WITH 100 AS x RETURN [x IN [1, 2] | x] AS l, x",
    rows(Map("l" -> Seq(1L, 2L), "x" -> 100L)))

  // --------------------------------------------- EXISTS in value position
  scenario("EXISTS pattern in RETURN", g,
    "MATCH (n:A) RETURN EXISTS { (n)-[:LIKES]->() } AS x", value(true))
  scenario("EXISTS inside coalesce", g,
    "MATCH (n:D) RETURN coalesce(EXISTS { (n)-->() }, true) AS x",
    value(false))
  scenario("EXISTS inside CASE", g,
    "MATCH (n) RETURN CASE WHEN EXISTS { (n)-[:LIKES]->() } " +
      "THEN 'liker' ELSE 'other' END AS k, count(*) AS c",
    rows(Map("k" -> "liker", "c" -> 1L), Map("k" -> "other", "c" -> 3L)))
  scenario("COUNT subquery in an arithmetic expression", g,
    "MATCH (n:A) RETURN COUNT { (n)-->() } * 10 AS x", value(20L))

  // ----------------------------------------------------- ordering breadth
  scenario("ORDER BY two keys with opposite directions", g,
    "MATCH ()-[r:KNOWS]->() RETURN r.w AS x ORDER BY r.w % 2 DESC, r.w ASC",
    rows(Map("x" -> 5L), Map("x" -> 7L), Map("x" -> 2L)), ordered = true)
  scenario("ORDER BY on a missing property puts nulls last ascending", g,
    "MATCH (n) RETURN n.num AS x ORDER BY n.num",
    rows(Map("x" -> 1L), Map("x" -> 2L), Map("x" -> 3L), Map("x" -> null)),
    ordered = true)
  scenario("ORDER BY with LIMIT larger than the input", g,
    "MATCH (n:A) RETURN n.name AS x ORDER BY x LIMIT 100", value("a"))
  scenario("DISTINCT then ORDER BY then SKIP", g,
    "UNWIND [3, 1, 3, 2] AS i WITH DISTINCT i ORDER BY i SKIP 1 " +
      "RETURN collect(i) AS x",
    value(Seq(2L, 3L)))
}
