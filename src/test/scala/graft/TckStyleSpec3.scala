package graft

/** TCK-style conformance, part 3 — multi-clause integration, math/temporal
  * function breadth, duration component accessors, parameters, and
  * grouping-shape scenarios (see TckStyleSpec for why these are
  * hand-authored rather than the vendored feature files). */
class TckStyleSpec3 extends TckScenarioBase {
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

  /** two customers -> orders with amounts, for grouping shapes */
  lazy val gOrders = graph(spark,
    Seq(
      N(1, Set("Cust"), Map("name" -> "x", "seg" -> "S1")),
      N(2, Set("Cust"), Map("name" -> "y", "seg" -> "S1")),
      N(3, Set("Cust"), Map("name" -> "z", "seg" -> "S2")),
      N(10, Set("Ord"), Map("amt" -> 100)),
      N(11, Set("Ord"), Map("amt" -> 200)),
      N(12, Set("Ord"), Map("amt" -> 300)),
      N(13, Set("Ord"), Map("amt" -> 400))),
    Seq(
      R(20, 1, 10, "PLACED"), R(21, 1, 11, "PLACED"),
      R(22, 2, 12, "PLACED"), R(23, 3, 13, "PLACED")))

  // ========================================== multi-clause integration
  scenario("MATCH WITH MATCH pipeline", g,
    "MATCH (a:A {name:'a'}) WITH a MATCH (a)-[:KNOWS]->(b) " +
      "RETURN b.name AS x", value("b"))
  scenario("WITH aggregation feeds second MATCH", gOrders,
    "MATCH (c:Cust)-[:PLACED]->(o) WITH c, count(o) AS n WHERE n = 2 " +
      "MATCH (c)-[:PLACED]->(o2) RETURN sum(o2.amt) AS x", value(300))
  scenario("UNWIND after aggregation", gOrders,
    "MATCH (c:Cust)-[:PLACED]->(o) WITH c.seg AS seg, collect(o.amt) AS amts " +
      "UNWIND amts AS a RETURN seg, sum(a) AS total",
    rows(Map("seg" -> "S1", "total" -> 600), Map("seg" -> "S2", "total" -> 400)))
  scenario("OPTIONAL MATCH after WITH", g,
    "MATCH (n) WITH n WHERE n.name IN ['c', 'd'] " +
      "OPTIONAL MATCH (n)<-[:LIKES]-(m) RETURN n.name AS x, m.name AS y",
    rows(Map("x" -> "c", "y" -> "a"), Map("x" -> "d", "y" -> null)))
  scenario("three chained MATCH clauses", g,
    "MATCH (a:A {name:'a'}) MATCH (a)-[:KNOWS]->(b) MATCH (b)-[:KNOWS]->(c) " +
      "RETURN c.name AS x", value("c"))
  scenario("WITH DISTINCT then aggregate", gOrders,
    "MATCH (c:Cust)-[:PLACED]->() WITH DISTINCT c.seg AS seg " +
      "RETURN count(*) AS x", value(2))
  scenario("ORDER BY inside WITH limits before expansion", gOrders,
    "MATCH (o:Ord) WITH o ORDER BY o.amt DESC LIMIT 2 " +
      "RETURN sum(o.amt) AS x", value(700))
  scenario("SKIP in WITH", gOrders,
    "MATCH (o:Ord) WITH o ORDER BY o.amt SKIP 2 RETURN sum(o.amt) AS x",
    value(700))
  scenario("aggregate then UNWIND then aggregate", g,
    "MATCH (n) WHERE n.num IS NOT NULL WITH collect(n.num) AS l " +
      "UNWIND l AS v WITH v WHERE v > 1 RETURN count(*) AS x", value(2))
  scenario("match after UNWIND binds per row", g,
    "UNWIND ['a', 'c'] AS nm MATCH (n {name: nm}) RETURN labels(n) AS x",
    Seq(Map("x" -> List("A")), Map("x" -> List("C"))))
  scenario("WHERE between two MATCHes scopes to first", g,
    "MATCH (a:A) WHERE a.num = 1 MATCH (a)-[r]->(b) RETURN count(r) AS x",
    value(2))
  scenario("cartesian of two matched sets via WITH", g,
    "MATCH (a:C) WITH a MATCH (b:B {name:'b'}) RETURN a.name AS x, " +
      "b.name AS y", rows(Map("x" -> "c", "y" -> "b")))

  // ====================================================== grouping shapes
  scenario("group by two keys", gOrders,
    "MATCH (c:Cust)-[:PLACED]->(o) RETURN c.seg AS seg, c.name AS nm, " +
      "sum(o.amt) AS s",
    rows(Map("seg" -> "S1", "nm" -> "x", "s" -> 300),
      Map("seg" -> "S1", "nm" -> "y", "s" -> 300),
      Map("seg" -> "S2", "nm" -> "z", "s" -> 400)))
  scenario("group by expression key", gOrders,
    "MATCH (o:Ord) RETURN o.amt > 200 AS big, count(*) AS n",
    rows(Map("big" -> false, "n" -> 2), Map("big" -> true, "n" -> 2)))
  scenario("aggregate without grouping key is global", gOrders,
    "MATCH (o:Ord) RETURN sum(o.amt) AS x", value(1000))
  scenario("avg returns float for integer input", gOrders,
    "MATCH (o:Ord) RETURN avg(o.amt) AS x", value(250.0))
  scenario("collect node properties", gOrders,
    "MATCH (c:Cust {name:'x'})-[:PLACED]->(o) WITH o.amt AS a ORDER BY a " +
      "RETURN collect(a) AS x", Seq(Map("x" -> List(100L, 200L))))
  scenario("min max same column", gOrders,
    "MATCH (o:Ord) RETURN min(o.amt) AS lo, max(o.amt) AS hi",
    rows(Map("lo" -> 100, "hi" -> 400)))
  scenario("count DISTINCT expression", gOrders,
    "MATCH (c:Cust) RETURN count(DISTINCT c.seg) AS x", value(2))
  scenario("grouped ORDER BY aggregate via WITH", gOrders,
    "MATCH (c:Cust)-[:PLACED]->(o) WITH c.name AS nm, sum(o.amt) AS s " +
      "ORDER BY s DESC, nm LIMIT 1 RETURN nm AS x", value("z"))
  scenario("aggregate of aggregate via two WITH", gOrders,
    "MATCH (c:Cust)-[:PLACED]->(o) WITH c, sum(o.amt) AS s " +
      "RETURN avg(s) AS x", Seq(Map("x" -> 1000.0 / 3)))
  scenario("grouping key appears in result unaggregated", gOrders,
    "MATCH (c:Cust)-[:PLACED]->(o) RETURN c.seg AS seg, count(*) AS n " +
      "ORDER BY seg", rows(Map("seg" -> "S1", "n" -> 3),
      Map("seg" -> "S2", "n" -> 1)), ordered = true)

  // ==================================================== math breadth
  scenario("sin of zero", g, "RETURN sin(0) AS x", value(0.0))
  scenario("cos of zero", g, "RETURN cos(0) AS x", value(1.0))
  scenario("tan of zero", g, "RETURN tan(0) AS x", value(0.0))
  scenario("asin acos atan roundtrip", g,
    "RETURN asin(1.0) = acos(0.0) AS x", value(true))
  scenario("atan2 quarter pi", g,
    "RETURN atan2(1.0, 1.0) = pi() / 4 AS x", value(true))
  scenario("natural log of e", g, "RETURN log(e()) AS x", value(1.0))
  scenario("log10 of 100", g, "RETURN log10(100) AS x", value(2.0))
  scenario("exp of zero", g, "RETURN exp(0) AS x", value(1.0))
  scenario("degrees of pi", g, "RETURN degrees(pi()) AS x", value(180.0))
  scenario("radians of 180", g,
    "RETURN radians(180.0) = pi() AS x", value(true))
  scenario("haversin of zero", g, "RETURN haversin(0) AS x", value(0.0))
  scenario("sqrt of integer", g, "RETURN sqrt(16) AS x", value(4.0))
  scenario("abs preserves integer type", g,
    "RETURN abs(-5) = 5 AS x", value(true))
  scenario("sign of negative float", g, "RETURN sign(-2.5) AS x", value(-1))
  scenario("unary minus on property", g,
    "MATCH (n:B {name:'b'}) RETURN -n.num AS x", value(-2))
  scenario("exponent precedence over unary minus", g,
    "RETURN -2 ^ 2 AS x", value(-4.0))
  scenario("integer modulo negative dividend", g,
    "RETURN -7 % 3 AS x", value(-1))
  scenario("division result type follows operands", g,
    "RETURN 7 / 2 AS i, 7.0 / 2 AS f", rows(Map("i" -> 3, "f" -> 3.5)))
  scenario("arithmetic null propagation in nested expression", g,
    "RETURN (1 + null) * 3 AS x", value(null))
  scenario("round half up", g, "RETURN round(0.5) AS x", value(1.0))
  scenario("floor of negative", g, "RETURN floor(-1.2) AS x", value(-2.0))
  scenario("ceil of negative", g, "RETURN ceil(-1.8) AS x", value(-1.0))

  // ================================== temporal + duration accessors
  scenario("date quarter accessor", g,
    "RETURN date('2020-08-15').quarter AS x", value(3))
  scenario("date week accessor", g,
    "RETURN date('2020-01-01').week AS x", value(1))
  scenario("date dayOfWeek ISO monday", g,
    "RETURN date('2024-01-01').dayOfWeek AS x", value(1)) // a Monday
  scenario("date ordinalDay", g,
    "RETURN date('2020-02-01').ordinalDay AS x", value(32))
  scenario("localdatetime time accessors", g,
    "RETURN localdatetime('2020-01-01 13:45:30').hour AS h, " +
      "localdatetime('2020-01-01 13:45:30').minute AS m, " +
      "localdatetime('2020-01-01 13:45:30').second AS s",
    rows(Map("h" -> 13, "m" -> 45, "s" -> 30)))
  scenario("duration hours component", g,
    "RETURN duration('P1DT2H').hours AS x", value(2))
  scenario("duration minutes are total within time group", g,
    "RETURN duration('PT1H30M').minutes AS x", value(90))
  scenario("duration minutesOfHour remainder", g,
    "RETURN duration('PT1H30M').minutesOfHour AS x", value(30))
  scenario("duration years truncate months", g,
    "RETURN duration('P14M').years AS x", value(1))
  scenario("duration monthsOfYear remainder", g,
    "RETURN duration('P14M').monthsOfYear AS x", value(2))
  scenario("duration weeks truncate days", g,
    "RETURN duration('P10D').weeks AS x", value(1))
  scenario("duration secondsOfMinute", g,
    "RETURN duration('PT1H30M45S').secondsOfMinute AS x", value(45))
  scenario("duration groups do not cross-convert", g,
    // P1D has no time-group micros: hours is 0, not 24
    "RETURN duration('P1D').hours AS x", value(0))
  scenario("date plus duration clamps month end", g,
    "RETURN toString(date('2020-01-31') + duration('P1M')) AS x",
    value("2020-02-29"))
  scenario("date minus duration", g,
    "RETURN toString(date('2020-03-01') - duration('P1D')) AS x",
    value("2020-02-29"))
  scenario("duration equality", g,
    "RETURN duration('PT60M') = duration('PT1H') AS x", value(true))
  scenario("duration addition is fieldwise", g,
    "RETURN (duration('P1D') + duration('PT12H')).hours AS x", value(12))
  scenario("duration subtraction can go negative per field", g,
    "RETURN (duration('P1M') - duration('P1D')).days AS x", value(-1))
  scenario("duration scaling by integer", g,
    "RETURN (duration('P1DT2H') * 2).hours AS x", value(4))
  scenario("scalar times duration commutes", g,
    "RETURN (2 * duration('P3D')).days AS x", value(6))
  scenario("duration division", g,
    "RETURN (duration('P2DT2H') / 2).days AS d, " +
      "(duration('P2DT2H') / 2).hours AS h",
    rows(Map("d" -> 1, "h" -> 1)))
  scenario("unary minus negates every component", g,
    "RETURN (-duration('P1MT1H')).months AS m, (-duration('P1MT1H')).hours AS h",
    rows(Map("m" -> -1, "h" -> -1)))
  scenario("duration ordering by total length", g,
    "RETURN duration('P1D') < duration('P2D') AS x", value(true))
  scenario("date difference ordering", g,
    "RETURN date('2020-01-01') < date('2020-01-02') AS x", value(true))

  // ============================================= SKIP/LIMIT expressions
  scenario("LIMIT with constant arithmetic", g,
    "MATCH (n) RETURN n.name AS x ORDER BY n.name LIMIT 1 + 1",
    rows(Map("x" -> "a"), Map("x" -> "b")), ordered = true)
  scenario("SKIP with constant arithmetic", g,
    "MATCH (n) RETURN n.name AS x ORDER BY n.name SKIP 2 * 1 LIMIT 1",
    value("c"))

  // ================================================ pattern predicates
  scenario("pattern predicate in OR disjunction", g,
    "MATCH (a:A {name:'a'}) WHERE (a)-[:LIKES]->() OR a.name = 'zzz' " +
      "RETURN count(*) AS x", value(1))
  scenario("pattern predicate with property map", g,
    "MATCH (a) WHERE (a)-[:KNOWS {since: 2010}]->() RETURN a.name AS x",
    value("a"))
  scenario("negated pattern with bound endpoint", g,
    "MATCH (a:A {name:'a'}), (c:C) WHERE NOT (a)-[:KNOWS]->(c) " +
      "RETURN c.name AS x", value("c"))
  scenario("exists with undirected pattern", g,
    "MATCH (n:C) WHERE exists((n)-[:LIKES]-()) RETURN n.name AS x",
    value("c"))
  scenario("pattern predicate on relationship chain", g,
    "MATCH (a:A {name:'a'}) WHERE (a)-[:KNOWS]->()-[:KNOWS]->() " +
      "RETURN count(*) AS x", value(1))

  // ============================================== expression integration
  scenario("CASE inside aggregation", gOrders,
    "MATCH (o:Ord) RETURN sum(CASE WHEN o.amt > 200 THEN 1 ELSE 0 END) AS x",
    value(2))
  scenario("nested CASE", g,
    "RETURN CASE WHEN true THEN CASE WHEN false THEN 1 ELSE 2 END END AS x",
    value(2))
  scenario("boolean precedence NOT before AND", g,
    "RETURN (NOT false AND true) AS x", value(true))
  scenario("boolean precedence AND before OR", g,
    "RETURN (true OR false AND false) AS x", value(true))
  scenario("comparison precedence over boolean ops", g,
    "RETURN (1 = 1 AND NOT 2 = 3) AS x", value(true))
  scenario("arithmetic inside list literal", g,
    "RETURN [1 + 1, 2 * 3] AS x", Seq(Map("x" -> List(2L, 6L))))
  scenario("function call on list element", g,
    "RETURN toUpper(['a', 'b'][0]) AS x", value("A"))
  scenario("property of startNode", g,
    "MATCH ()-[r:LIKES]->() RETURN startNode(r).name AS x", value("a"))
  scenario("chained property through endNode", g,
    "MATCH ()-[r:KNOWS]->() WHERE r.since = 2010 " +
      "RETURN endNode(r).num AS x", value(2))
  scenario("size of collect in same RETURN", g,
    "MATCH (n:A) RETURN size(collect(n.name)) AS x", value(2))
  scenario("coalesce inside WHERE", gOrders,
    "MATCH (c:Cust) WHERE coalesce(c.missing, c.seg) = 'S2' " +
      "RETURN c.name AS x", value("z"))
  scenario("list comprehension over var-length relationship list", g,
    // rs materializes as the path's relationship ids (opaque, tagged)
    "MATCH (a {name:'a'})-[rs:KNOWS*2..2]->() " +
      "RETURN size([r IN rs | r]) AS x", value(2))

  // ============================================= id/element integration
  scenario("id is stable across clauses", g,
    "MATCH (a:A {name:'a'}) WITH id(a) AS i MATCH (b) WHERE id(b) = i " +
      "RETURN b.name AS x", value("a"))
  scenario("ids distinguish parallel relationships", gOrders,
    "MATCH (c:Cust {name:'x'})-[r:PLACED]->() " +
      "RETURN count(DISTINCT id(r)) AS x", value(2))
  scenario("labels are sorted in output", g,
    "MATCH (n {name:'d'}) RETURN labels(n) AS x",
    Seq(Map("x" -> List("A", "B"))))
  scenario("type in grouping", g,
    "MATCH ()-[r]->() RETURN type(r) AS t, count(*) AS n",
    rows(Map("t" -> "KNOWS", "n" -> 2), Map("t" -> "LIKES", "n" -> 1)))

  // ===================================================== parameters
  test("[param] parameter in WHERE") {
    val got = rowsOf(session.cypher(g,
      "MATCH (n) WHERE n.name = $nm RETURN n.num AS x", Map("nm" -> "b")))
    assert(got == Seq(Map("x" -> 2L)))
  }
  test("[param] parameter in expression position") {
    val got = rowsOf(session.cypher(g,
      "RETURN $a + $b AS x", Map("a" -> 1, "b" -> 2)))
    assert(got == Seq(Map("x" -> 3L)))
  }
  test("[param] list parameter with IN") {
    val got = rowsOf(session.cypher(g,
      "MATCH (n) WHERE n.name IN $names RETURN count(*) AS x",
      Map("names" -> Seq("a", "c"))))
    assert(got == Seq(Map("x" -> 2L)))
  }
  test("[param] parameter as LIMIT") {
    val got = rowsOf(session.cypher(g,
      "MATCH (n) RETURN n.name AS x ORDER BY n.name LIMIT $k", Map("k" -> 2)))
    assert(got == Seq(Map("x" -> "a"), Map("x" -> "b")))
  }
}
