package graft

/** TCK-style conformance, part 6 — error classification (the TCK's
  * SyntaxError/SemanticError categories, asserted as engine exceptions
  * with a message check), mixed-direction patterns, and WITH-scope rules
  * (see TckStyleSpec for why these are hand-authored). */
class TckStyleSpec6 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c"))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 2, 3, "KNOWS", Map("since" -> 2012)),
      R(12, 1, 3, "LIKES")))

  private def errors(query: String, fragment: String = ""): Unit = {
    val e = intercept[Exception](session.cypher(g, query).collect())
    if (fragment.nonEmpty)
      assert(e.getMessage.toLowerCase.contains(fragment.toLowerCase),
        s"expected '$fragment' in: ${e.getMessage}")
  }

  // ================================================ error classification
  test("[err] unknown variable in RETURN") {
    errors("MATCH (n) RETURN m AS x", "unknown variable")
  }
  test("[err] unknown variable in WHERE") {
    errors("MATCH (n) WHERE m.x = 1 RETURN n", "unknown variable")
  }
  test("[err] unknown function") {
    errors("RETURN nope(1) AS x", "unknown function")
  }
  test("[err] variable redeclared as different kind") {
    errors("MATCH (n)-[n]->() RETURN n")
  }
  test("[err] unclosed parenthesis") {
    errors("MATCH (n RETURN n")
  }
  test("[err] unterminated string") {
    errors("RETURN 'abc AS x")
  }
  test("[err] aggregation nested in aggregation") {
    errors("MATCH (n) RETURN sum(count(n)) AS x")
  }
  // Standalone ORDER BY is legal since the Cypher-2025 clause sugar
  // (part 44); the error case left is a missing sort item.
  test("[err] ORDER BY without a sort item") {
    errors("MATCH (n) ORDER BY RETURN n")
  }
  test("[err] negative LIMIT") {
    errors("MATCH (n) RETURN n LIMIT -1")
  }
  test("[err] unknown duration accessor") {
    errors("RETURN duration('P1D').fortnights AS x", "duration accessor")
  }
  test("[err] unknown temporal accessor") {
    errors("RETURN date('2020-01-01').lightyears AS x", "temporal accessor")
  }
  test("[err] labels() of a relationship variable") {
    errors("MATCH ()-[r]->() RETURN labels(r) AS x")
  }
  test("[err] type() of a node variable") {
    errors("MATCH (n) RETURN type(n) AS x")
  }

  // ============================================= mixed-direction patterns
  scenario("chain with both directions", g,
    "MATCH (x)<-[:KNOWS]-(m)-[:LIKES]->(y) RETURN m.name AS x", value("a"))
  scenario("three-hop with alternating directions", g,
    "MATCH (a)-[:KNOWS]->(b)-[:KNOWS]->(c)<-[:LIKES]-(d) " +
      "RETURN a.name AS a, d.name AS d",
    rows(Map("a" -> "a", "d" -> "a")))
  scenario("undirected middle segment", g,
    "MATCH (a {name:'a'})-[:KNOWS]-(b)-[:KNOWS]-(c {name:'c'}) " +
      "RETURN b.name AS x", value("b"))
  scenario("shared source fan pattern", g,
    "MATCH (b)<-[:KNOWS]-(a)-[:LIKES]->(c) " +
      "RETURN a.name AS a, b.name AS b, c.name AS c",
    rows(Map("a" -> "a", "b" -> "b", "c" -> "c")))
  scenario("shared target convergence pattern", g,
    "MATCH (x)-[:KNOWS]->(t)<-[:LIKES]-(y) " +
      "RETURN x.name AS x, t.name AS t, y.name AS y",
    rows(Map("x" -> "b", "t" -> "c", "y" -> "a")))
  scenario("relationship variable reused via WITH", g,
    "MATCH ()-[r:KNOWS]->() WITH r WHERE r.since = 2012 " +
      "MATCH (a)-[r]->(b) RETURN a.name AS x, b.name AS y",
    rows(Map("x" -> "b", "y" -> "c")))
  scenario("anonymous everything counts rows", g,
    "MATCH ()-->() RETURN count(*) AS x", value(3))
  scenario("anonymous undirected doubles directed count", g,
    "MATCH ()--() RETURN count(*) AS x", value(6))

  /** diamond s -> {l, r} -> t plus a long way around s -> l -> m -> t */
  lazy val gSp = graph(spark,
    Seq(
      N(1, Set("D"), Map("name" -> "s")), N(2, Set("D"), Map("name" -> "l")),
      N(3, Set("D"), Map("name" -> "r")), N(4, Set("D"), Map("name" -> "t")),
      N(5, Set("D"), Map("name" -> "m"))),
    Seq(
      R(20, 1, 2, "E"), R(21, 1, 3, "E"), R(22, 2, 4, "E"), R(23, 3, 4, "E"),
      R(24, 2, 5, "E"), R(25, 5, 4, "E")))

  // ================================== shortestPath / allShortestPaths
  scenario("shortestPath returns one minimal path per pair", gSp,
    "MATCH p = shortestPath((a {name:'s'})-[:E*1..4]->(b {name:'t'})) " +
      "RETURN length(p) AS l, count(*) AS n",
    rows(Map("l" -> 2, "n" -> 1)))
  scenario("allShortestPaths returns every minimal path", gSp,
    "MATCH p = allShortestPaths((a {name:'s'})-[:E*1..4]->(b {name:'t'})) " +
      "RETURN length(p) AS l, count(*) AS n",
    rows(Map("l" -> 2, "n" -> 2)))
  scenario("shortestPath prunes per endpoint pair independently", gSp,
    "MATCH p = shortestPath((a {name:'s'})-[:E*1..3]->(b)) " +
      "RETURN b.name AS x, length(p) AS l",
    rows(Map("x" -> "l", "l" -> 1), Map("x" -> "r", "l" -> 1),
      Map("x" -> "t", "l" -> 2), Map("x" -> "m", "l" -> 2)))
  scenario("shortestPath zero-length when endpoints coincide", gSp,
    "MATCH p = shortestPath((a {name:'s'})-[:E*0..3]->(a)) " +
      "RETURN length(p) AS x", value(0))
  scenario("shortestPath with no route is empty", gSp,
    "MATCH p = shortestPath((a {name:'t'})-[:E*1..4]->(b {name:'s'})) " +
      "RETURN count(*) AS x", value(0))
  scenario("nodes() of a shortest path includes intermediates", gSp,
    "MATCH p = allShortestPaths((a {name:'s'})-[:E*1..4]->(b {name:'t'})) " +
      "RETURN size(nodes(p)) AS x", rows(Map("x" -> 3), Map("x" -> 3)))
  scenario("shortestPath over a fixed 1-hop selects per endpoint pair", gSp,
    // Generalized in round 10: fixed patterns are legal selector targets
    // (all paths of a pair share one length, so this dedups parallel
    // routes per pair — here each pair has a single edge anyway).
    "MATCH p = shortestPath((a {name:'s'})-[:E]->(b)) " +
      "RETURN length(p) AS x", rows(Map("x" -> 1), Map("x" -> 1)))
  scenario("shortestPath preserves outer row multiplicity (UNWIND)", gSp,
    "UNWIND [1, 2] AS i " +
      "MATCH p = shortestPath((a {name:'s'})-[:E*1..4]->(b {name:'t'})) " +
      "RETURN i, length(p) AS l",
    rows(Map("i" -> 1, "l" -> 2), Map("i" -> 2, "l" -> 2)))

  /** Complete digraph on 7 nodes: per-hop early-stop closes every ordered
    * pair at hop 1, so the expand does O(pairs) work instead of walking the
    * ~7! simple-path space the [*1..7] cap would otherwise enumerate. */
  lazy val gK = graph(spark,
    (1 to 7).map(i => N(i, Set("K"), Map("name" -> s"n$i"))),
    for { i <- 1 to 7; j <- 1 to 7 if i != j } yield R(100 + i * 10 + j, i, j, "E"))

  scenario("shortestPath on a complete graph closes every pair at hop 1", gK,
    "MATCH p = shortestPath((a:K)-[:E*1..7]->(b:K)) " +
      "RETURN length(p) AS l, count(*) AS n",
    // 42 ordered pairs at hop 1; the 7 self-pairs close at hop 2 (a->x->a).
    rows(Map("l" -> 1, "n" -> 42), Map("l" -> 2, "n" -> 7)))
  scenario("allShortestPaths keeps only first-arrival paths", gK,
    "MATCH p = allShortestPaths((a:K {name:'n1'})-[:E*1..7]->(b:K)) " +
      "RETURN count(*) AS x",
    // 6 direct hops + 6 minimal two-hop returns to n1 (one per intermediate).
    value(12))

  // ============================================= pattern comprehensions
  scenario("pattern comprehension collects per outer row", g,
    "MATCH (a:A {name:'a'}) RETURN size([(a)-[:KNOWS]->(b) | b.name]) AS x",
    value(1))
  scenario("pattern comprehension projects values", g,
    "MATCH (a:A {name:'a'}) RETURN [(a)-[:KNOWS]->(b) | b.name] AS x",
    Seq(Map("x" -> List("b"))))
  scenario("pattern comprehension with WHERE", g,
    "MATCH (n) RETURN n.name AS nm, " +
      "size([(n)-[r:KNOWS]->(m) WHERE r.since > 2011 | m]) AS c",
    rows(Map("nm" -> "a", "c" -> 0), Map("nm" -> "b", "c" -> 1),
      Map("nm" -> "c", "c" -> 0)))
  scenario("unmatched pattern comprehension yields empty list", g,
    "MATCH (n:C) RETURN [(n)-[:KNOWS]->(m) | m.name] AS x",
    Seq(Map("x" -> List())))
  scenario("pattern comprehension result feeds reduce", g,
    "MATCH (n:B) RETURN reduce(s = 0, v IN " +
      "[(n)-[:KNOWS]->(m) | m.num] | s + v) AS x",
    // b-KNOWS->c, c has no num: null element; reduce over [null] is null
    value(null))
  scenario("pattern comprehension in WHERE position", g,
    "MATCH (n) WHERE size([(n)-[:KNOWS]->(m) | m]) = 1 " +
      "RETURN n.name AS x", rows(Map("x" -> "a"), Map("x" -> "b")))
  scenario("two comprehensions in one RETURN", g,
    "MATCH (a:A {name:'a'}) RETURN size([(a)-[:KNOWS]->(b) | b]) AS k, " +
      "size([(a)-[:LIKES]->(c) | c]) AS l", rows(Map("k" -> 1, "l" -> 1)))

  // =================================================== WITH scope rules
  scenario("WITH drops unprojected variables", g,
    "MATCH (n)-[r]->(m) WITH n.name AS nn RETURN count(*) AS x", value(3))
  scenario("variable projected through WITH keeps identity", g,
    "MATCH (n {name:'a'}) WITH n MATCH (n)-[:KNOWS]->(m) " +
      "RETURN m.name AS x", value("b"))
  scenario("WITH expression invisible to later clause unless aliased", g,
    "MATCH (n) WITH n.num * 2 AS dbl WHERE dbl = 4 RETURN dbl AS x",
    value(4))
  scenario("aggregate in WITH resets cardinality", g,
    "MATCH (n) WITH count(*) AS total MATCH (m:C) RETURN total, m.name AS x",
    rows(Map("total" -> 3, "x" -> "c")))
  scenario("ORDER BY in WITH may use pre-projection columns", g,
    "MATCH (n) WHERE n.num IS NOT NULL WITH n ORDER BY n.num DESC " +
      "RETURN collect(n.name) AS x", Seq(Map("x" -> List("b", "a"))))
  scenario("WHERE after WITH star filters", g,
    "MATCH (n) WITH * WHERE n.num = 1 RETURN n.name AS x", value("a"))
}
