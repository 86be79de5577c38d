package graft

/** TCK-style conformance, part 5 — string literal forms and escapes,
  * collect/ordering interplay, label predicates in value position,
  * grouped percentiles, and function-composition chains (see TckStyleSpec
  * for why these are hand-authored). */
class TckStyleSpec5 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c")),
      N(4, Set("A", "B"), Map("name" -> "d", "num" -> 4))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 2, 3, "KNOWS", Map("since" -> 2012)),
      R(12, 1, 3, "LIKES")))

  // =============================================== string literal forms
  scenario("double-quoted string literal", g,
    "RETURN \"hello\" AS x", value("hello"))
  scenario("single quote inside double-quoted literal", g,
    "RETURN \"it's\" AS x", value("it's"))
  scenario("escaped single quote", g,
    "RETURN 'it\\'s' AS x", value("it's"))
  scenario("escaped double quote in double-quoted", g,
    "RETURN \"say \\\"hi\\\"\" AS x", value("say \"hi\""))
  scenario("newline and tab escapes", g,
    "RETURN size('a\\tb\\nc') AS x", value(5))
  scenario("backslash escape", g,
    "RETURN 'a\\\\b' AS x", value("a\\b"))
  scenario("unicode escape", g,
    "RETURN '\\u0041\\u0062' AS x", value("Ab"))
  scenario("empty string literal", g, "RETURN '' AS x", value(""))
  scenario("string with only spaces is preserved", g,
    "RETURN size('   ') AS x", value(3))
  scenario("backtick-quoted identifier as alias", g,
    "RETURN 1 AS `weird name`", Seq(Map("weird name" -> 1L)))

  // ======================================== collect / ordering interplay
  scenario("collect preserves descending order from WITH", g,
    "MATCH (n) WHERE n.num IS NOT NULL WITH n.num AS v ORDER BY v DESC " +
      "RETURN collect(v) AS x", Seq(Map("x" -> List(4L, 2L, 1L))))
  scenario("collect of strings ordered", g,
    "MATCH (n) WITH n.name AS s ORDER BY s RETURN collect(s) AS x",
    Seq(Map("x" -> List("a", "b", "c", "d"))))
  scenario("collect after LIMIT collects the limited rows", g,
    "MATCH (n) WITH n.name AS s ORDER BY s LIMIT 2 " +
      "RETURN collect(s) AS x", Seq(Map("x" -> List("a", "b"))))
  scenario("head of ordered collect is the minimum", g,
    "MATCH (n) WHERE n.num IS NOT NULL WITH n.num AS v ORDER BY v " +
      "RETURN head(collect(v)) AS x", value(1))
  scenario("size of collect equals count", g,
    "MATCH (n) RETURN size(collect(n.name)) = count(n.name) AS x",
    value(true))
  scenario("collect into unwind roundtrip ordered", g,
    "MATCH (n) WHERE n.num IS NOT NULL WITH n.num AS v ORDER BY v DESC " +
      "WITH collect(v) AS l UNWIND l AS w RETURN w AS x",
    rows(Map("x" -> 4), Map("x" -> 2), Map("x" -> 1)), ordered = true)

  // ==================================== label predicates in value position
  scenario("label predicate as boolean value", g,
    "MATCH (n {name:'d'}) RETURN n:A AS a, n:C AS c",
    rows(Map("a" -> true, "c" -> false)))
  scenario("conjoined label predicate in WHERE", g,
    "MATCH (n) WHERE n:A:B RETURN n.name AS x", value("d"))
  scenario("label predicate OR combination", g,
    "MATCH (n) WHERE n:C OR n:B RETURN count(*) AS x", value(3))
  scenario("negated conjoined label predicate", g,
    "MATCH (n) WHERE NOT n:A:B RETURN count(*) AS x", value(3))
  scenario("label predicate inside CASE", g,
    "MATCH (n {name:'b'}) RETURN CASE WHEN n:B THEN 'yes' ELSE 'no' END AS x",
    value("yes"))

  // ================================================== grouped percentiles
  scenario("grouped percentileDisc picks group element", g,
    "UNWIND [['a', 1], ['a', 2], ['a', 3], ['b', 10]] AS r " +
      "RETURN r[0] AS k, percentileDisc(toInteger(r[1]), 0.5) AS p",
    rows(Map("k" -> "a", "p" -> 2), Map("k" -> "b", "p" -> 10)))
  scenario("grouped percentileCont interpolates per group", g,
    "UNWIND [['a', 1.0], ['a', 2.0], ['b', 10.0]] AS r " +
      "RETURN r[0] AS k, percentileCont(toFloat(r[1]), 0.5) AS p",
    rows(Map("k" -> "a", "p" -> 1.5), Map("k" -> "b", "p" -> 10.0)))
  scenario("percentile bounds give min and max", g,
    "UNWIND [3, 1, 2] AS v RETURN percentileDisc(v, 0.0) AS lo, " +
      "percentileDisc(v, 1.0) AS hi", rows(Map("lo" -> 1, "hi" -> 3)))
  scenario("stDevP of two points", g,
    "UNWIND [1.0, 3.0] AS v RETURN stDevP(v) AS x", value(1.0))

  // ================================================= function composition
  scenario("nested string functions", g,
    "RETURN toUpper(left(reverse('hello'), 3)) AS x", value("OLL"))
  scenario("function of aggregate of function", g,
    "MATCH (n) WHERE n.num IS NOT NULL " +
      "RETURN toString(sum(abs(n.num))) AS x", value("7"))
  scenario("coalesce of function results", g,
    "RETURN coalesce(toInteger('x'), toInteger('5')) AS x", value(5))
  scenario("split then join via reduce", g,
    "RETURN reduce(s = '', p IN split('a,b', ',') | s + p) AS x",
    value("ab"))
  scenario("range inside size inside comparison", g,
    "RETURN size(range(1, 10)) > 5 AS x", value(true))
  scenario("substring of toString of arithmetic", g,
    "RETURN substring(toString(123 + 456), 0, 2) AS x", value("57"))
  scenario("abs of difference of aggregates", g,
    "MATCH (n) WHERE n.num IS NOT NULL " +
      "RETURN abs(min(n.num) - max(n.num)) AS x", value(3))
  scenario("list element of function result", g,
    "RETURN split('x:y:z', ':')[2] AS x", value("z"))

  // ===================================================== null in functions
  scenario("list concat with null element keeps null", g,
    "RETURN ([1] + [null])[1] AS x", value(null))
  scenario("replace with null argument is null", g,
    "RETURN replace(null, 'a', 'b') AS x", value(null))
  scenario("substring of null is null", g,
    "RETURN substring(null, 1) AS x", value(null))
  scenario("split of null is null", g,
    "RETURN split(null, ',') AS x", value(null))
  scenario("reverse of null is null", g, "RETURN reverse(null) AS x",
    value(null))
  scenario("trim of null is null", g, "RETURN trim(null) AS x", value(null))
  scenario("left of null is null", g, "RETURN left(null, 2) AS x",
    value(null))

  // ================================ var-length property/type constraints
  scenario("var-length with inline rel property filters every hop", g,
    "MATCH (a)-[:KNOWS*1..1 {since: 2010}]->(b) RETURN b.name AS x",
    value("b"))
  scenario("var-length inline property blocks mismatched hops", g,
    // a-KNOWS{2010}->b-KNOWS{2012}->c: requiring 2012 on both hops of a
    // 2-hop path fails (first hop is 2010)
    "MATCH (a {name:'a'})-[:KNOWS*2..2 {since: 2012}]->(c) " +
      "RETURN count(*) AS x", value(0))
  scenario("var-length inline property all hops match", g,
    "MATCH (a {name:'a'})-[:KNOWS*1..2 {since: 2010}]->(b) " +
      "RETURN b.name AS x", value("b"))
  scenario("multi-type var-length walks both types", g,
    "MATCH (a {name:'a'})-[:KNOWS|LIKES*1..1]->(b) RETURN b.name AS x",
    rows(Map("x" -> "b"), Map("x" -> "c")))
  scenario("multi-type var-length two hops", g,
    "MATCH (a {name:'a'})-[:KNOWS|LIKES*2..2]->(c) RETURN c.name AS x",
    value("c"))

  // =============================================== DISTINCT interactions
  scenario("DISTINCT on two columns", g,
    "MATCH (a)-[r]->(b) RETURN DISTINCT a.name AS x, type(r) AS t",
    rows(Map("x" -> "a", "t" -> "KNOWS"), Map("x" -> "a", "t" -> "LIKES"),
      Map("x" -> "b", "t" -> "KNOWS")))
  scenario("count DISTINCT vs count", g,
    "MATCH (a)-[r:KNOWS]->() RETURN count(type(r)) AS n, " +
      "count(DISTINCT type(r)) AS d", rows(Map("n" -> 2, "d" -> 1)))
  scenario("DISTINCT null collapses to one row", g,
    "MATCH (n) RETURN DISTINCT n.missing AS x", value(null))
  // openCypher (and Neo4j) reject mixing UNION and UNION ALL in one query;
  // pre-round-6 this spec expected the permissive merge — stale, rewritten
  // to assert the classified rejection (impl/Planner.scala checkUnionMix).
  errorScenario("mixing UNION ALL and UNION DISTINCT is rejected", g,
    "RETURN 1 AS x UNION ALL RETURN 1 AS x UNION RETURN 2 AS x",
    graft.api.CypherError.SyntaxError,
    graft.api.CypherError.InvalidClauseComposition)
}
