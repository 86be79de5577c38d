package graft

/** TCK-style conformance, part 7 — map projections, exotic temporal string
  * forms, optional var-length with aggregation, and remaining list/WITH
  * interplay (see TckStyleSpec for why these are hand-authored). */
class TckStyleSpec7 extends TckScenarioBase {
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

  // ====================================================== map projections
  scenario("map projection of selected properties", g,
    "MATCH (n:B) RETURN n {.name, .num} AS m",
    Seq(Map("m" -> Map("name" -> "b", "num" -> 2L))))
  scenario("map projection with computed entry", g,
    "MATCH (n:B) RETURN n {.name, dbl: n.num * 2} AS m",
    Seq(Map("m" -> Map("name" -> "b", "dbl" -> 4L))))
  scenario("map projection of missing property is null entry", g,
    "MATCH (n:C) RETURN n {.num} AS m",
    Seq(Map("m" -> Map("num" -> null))))
  scenario("map projection on relationship", g,
    "MATCH ()-[r:KNOWS]->() WHERE r.since = 2010 RETURN r {.since} AS m",
    Seq(Map("m" -> Map("since" -> 2010L))))

  // ============================================ temporal string-form breadth
  scenario("ISO week date form", g,
    "RETURN toString(date('2015-W30-2')) AS x", value("2015-07-21"))
  scenario("compact ISO week form", g,
    "RETURN toString(date('2015W302')) AS x", value("2015-07-21"))
  scenario("quarter date form", g,
    "RETURN toString(date('2015-Q2-60')) AS x", value("2015-05-30"))
  scenario("ordinal date form", g,
    "RETURN toString(date('2015-202')) AS x", value("2015-07-21"))
  scenario("year-month compact form defaults day 1", g,
    "RETURN toString(date('201507')) AS x", value("2015-07-01"))
  scenario("year-only form defaults jan 1", g,
    "RETURN toString(date('2015')) AS x", value("2015-01-01"))
  scenario("week-form date equals its calendar date", g,
    "RETURN date('2015-W30-2') = date('2015-07-21') AS x", value(true))
  scenario("weekYear accessor on year boundary", g,
    "RETURN date('1813-01-01').weekYear AS x", value(1812))

  // ============================= optional var-length + aggregation
  scenario("count over unmatched optional var-length is zero", g,
    "MATCH (n:C) OPTIONAL MATCH (n)-[:KNOWS*1..2]->(m) " +
      "RETURN count(m) AS x", value(0))
  scenario("optional var-length keeps outer row", g,
    "MATCH (n:C) OPTIONAL MATCH (n)-[:NOPE*1..3]->(m) " +
      "RETURN n.name AS a, m AS b", rows(Map("a" -> "c", "b" -> null)))
  scenario("optional var-length with matches multiplies rows", g,
    "MATCH (n:A {name:'a'}) OPTIONAL MATCH (n)-[:KNOWS*1..2]->(m) " +
      "RETURN count(*) AS x", value(2))
  scenario("collect over optional var-length targets", g,
    "MATCH (n:A {name:'a'}) OPTIONAL MATCH (n)-[:KNOWS*1..2]->(m) " +
      "RETURN size(collect(m.name)) AS x", value(2))

  // ================================= EXISTS { } / COUNT { } subqueries
  scenario("EXISTS subquery with inner WHERE", g,
    "MATCH (n) WHERE EXISTS { MATCH (n)-[r:KNOWS]->(m) " +
      "WHERE r.since > 2011 } RETURN n.name AS x", value("b"))
  scenario("EXISTS subquery abbreviated form", g,
    "MATCH (n) WHERE EXISTS { (n)-[:LIKES]->() } RETURN n.name AS x",
    value("a"))
  scenario("NOT EXISTS subquery", g,
    "MATCH (n) WHERE NOT EXISTS { (n)-[:KNOWS]->() } RETURN n.name AS x",
    value("c"))
  scenario("COUNT subquery in projection", g,
    "MATCH (n) RETURN n.name AS nm, COUNT { (n)-[:KNOWS]->(m) } AS c",
    rows(Map("nm" -> "a", "c" -> 1), Map("nm" -> "b", "c" -> 1),
      Map("nm" -> "c", "c" -> 0)))
  scenario("COUNT subquery with inner WHERE in predicate position", g,
    "MATCH (n) WHERE COUNT { MATCH (n)-[r:KNOWS]->(m) " +
      "WHERE r.since = 2010 } = 1 RETURN n.name AS x", value("a"))
  scenario("COUNT subquery of unmatched pattern is zero", g,
    "MATCH (n:C) RETURN COUNT { (n)-[:NOPE]->() } AS x", value(0))

  // =============================================== residual interplay
  scenario("WITH list literal then comprehension", g,
    "WITH [1, 2, 3] AS l RETURN [v IN l WHERE v > 1 | v * 10] AS x",
    Seq(Map("x" -> List(20L, 30L))))
  scenario("UNWIND a slice", g,
    "WITH [1, 2, 3, 4] AS l UNWIND l[1..3] AS v RETURN sum(v) AS x",
    value(5))
  scenario("nested WITH aggregations chain", g,
    "MATCH (n) WITH count(*) AS c WITH c, c * 2 AS d RETURN c + d AS x",
    value(9))
  scenario("DISTINCT before and after UNWIND", g,
    "UNWIND [1, 1, 2] AS v WITH DISTINCT v UNWIND [v, v] AS w " +
      "RETURN count(w) AS x", value(4))
  scenario("ORDER BY on map projection field", g,
    "MATCH (n) WHERE n.num IS NOT NULL WITH n {.name, .num} AS m " +
      "ORDER BY m.num DESC RETURN collect(m.name) AS x",
    Seq(Map("x" -> List("b", "a"))))
  scenario("pattern comprehension inside WITH", g,
    "MATCH (n:A {name:'a'}) WITH size([(n)-->(m) | m]) AS deg " +
      "RETURN deg AS x", value(2))
  scenario("shortest path length in aggregation", g,
    "MATCH p = shortestPath((a:A {name:'a'})-[*1..3]->(c:C)) " +
      "RETURN min(length(p)) AS x", value(1))
  scenario("case insensitive keyword parsing", g,
    "match (n:C) return n.name as x", value("c"))
  scenario("whitespace and newline tolerance", g,
    "MATCH  (n:C)\n  RETURN\tn.name AS x", value("c"))
}
