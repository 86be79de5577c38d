package graft

/** TCK-style conformance, part 4 — exhaustive three-valued-logic truth
  * tables, a cross-type comparison matrix, graph-topology shapes (diamond,
  * bidirectional, fan), optional var-length, and nested-list access (see
  * TckStyleSpec for why these are hand-authored). The matrix sections are
  * generated: one scenario per table row, same (graph, query, expected)
  * framework. */
class TckStyleSpec4 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a")), N(2, Set("B"), Map("name" -> "b"))),
    Seq(R(10, 1, 2, "KNOWS")))

  /** diamond: s -> l -> t, s -> r -> t; plus bidirectional u <-> v */
  lazy val gDiamond = graph(spark,
    Seq(
      N(1, Set("D"), Map("name" -> "s")), N(2, Set("D"), Map("name" -> "l")),
      N(3, Set("D"), Map("name" -> "r")), N(4, Set("D"), Map("name" -> "t")),
      N(10, Set("U"), Map("name" -> "u")), N(11, Set("U"), Map("name" -> "v"))),
    Seq(
      R(20, 1, 2, "E"), R(21, 1, 3, "E"), R(22, 2, 4, "E"), R(23, 3, 4, "E"),
      R(30, 10, 11, "F"), R(31, 11, 10, "F")))

  /** fan: hub -> 4 spokes */
  lazy val gFan = graph(spark,
    N(1, Set("H"), Map("name" -> "hub")) +:
      (2L to 5L).map(i => N(i, Set("S"), Map("idx" -> (i - 1)))),
    (2L to 5L).map(i => R(40 + i, 1, i, "SPOKE")))

  // ============================== three-valued logic: full truth tables
  private val tvl: Seq[(String, Any)] = Seq("true" -> true, "false" -> false,
    "null" -> null)
  private def andTruth(a: Any, b: Any): Any = (a, b) match {
    case (false, _) | (_, false) => false
    case (true, true) => true
    case _ => null
  }
  private def orTruth(a: Any, b: Any): Any = (a, b) match {
    case (true, _) | (_, true) => true
    case (false, false) => false
    case _ => null
  }
  private def xorTruth(a: Any, b: Any): Any = (a, b) match {
    case (null, _) | (_, null) => null
    case (x: Boolean, y: Boolean) => x != y
  }
  for ((an, av) <- tvl; (bn, bv) <- tvl) {
    scenario(s"truth table: $an AND $bn", g,
      s"RETURN ($an AND $bn) AS x", value(andTruth(av, bv)))
    scenario(s"truth table: $an OR $bn", g,
      s"RETURN ($an OR $bn) AS x", value(orTruth(av, bv)))
    scenario(s"truth table: $an XOR $bn", g,
      s"RETURN ($an XOR $bn) AS x", value(xorTruth(av, bv)))
  }
  for ((an, av) <- tvl) {
    val expect = av match {
      case null => null
      case b: Boolean => !b
    }
    scenario(s"truth table: NOT $an", g, s"RETURN (NOT $an) AS x",
      value(expect))
  }

  // ================================== cross-type comparison matrix
  // Same-type comparisons are defined; mixed number widths coerce; any
  // comparison involving null (or an incomparable pair) is null.
  private val cmpRows: Seq[(String, Any)] = Seq(
    ("1 < 2", true), ("2 < 1", false), ("1 <= 1", true),
    ("1.5 < 2", true), ("2 < 1.5", false), ("1 = 1.0", true),
    ("'a' < 'b'", true), ("'b' <= 'a'", false), ("'a' = 'a'", true),
    ("true = false", false), ("false < true", true),
    ("1 < null", null), ("null < 1", null), ("null <= null", null),
    ("'a' < null", null), ("1 < 'a'", null), ("'a' < 1", null),
    ("true < 1", null), ("'1' = 1", false), ("'1' <> 1", true),
    ("1 = true", false),
    ("[1, 2] = [1, 2]", true), ("[1] < [2]", true))
  for ((expr, want) <- cmpRows)
    scenario(s"comparison: $expr", g, s"RETURN ($expr) AS x", value(want))

  // ====================================================== topology shapes
  scenario("diamond has two paths source to sink", gDiamond,
    "MATCH (s {name:'s'})-[:E]->()-[:E]->(t {name:'t'}) " +
      "RETURN count(*) AS x", value(2))
  scenario("diamond var-length reaches sink twice", gDiamond,
    "MATCH (s {name:'s'})-[:E*2..2]->(t {name:'t'}) RETURN count(*) AS x",
    value(2))
  scenario("diamond distinct endpoint", gDiamond,
    "MATCH (s {name:'s'})-[:E*2..2]->(t) RETURN DISTINCT t.name AS x",
    value("t"))
  scenario("bidirectional pair matched in both directions", gDiamond,
    "MATCH (u:U)-[:F]->(v:U) RETURN count(*) AS x", value(2))
  scenario("bidirectional undirected dedups per relationship", gDiamond,
    "MATCH (u:U {name:'u'})-[:F]-(v) RETURN count(*) AS x", value(2))
  scenario("two-hop cycle over distinct rels", gDiamond,
    "MATCH (u:U {name:'u'})-[:F*2..2]->(u2) WHERE id(u2) = id(u) " +
      "RETURN count(*) AS x", value(1))
  scenario("fan out counts spokes", gFan,
    "MATCH (h:H)-[:SPOKE]->(s) RETURN count(*) AS x", value(4))
  scenario("fan aggregation by hub", gFan,
    "MATCH (h:H)-[:SPOKE]->(s) RETURN h.name AS hub, sum(s.idx) AS tot",
    rows(Map("hub" -> "hub", "tot" -> 10)))
  scenario("fan: two distinct spokes per pattern row", gFan,
    // ordered pairs of distinct spokes: 4 * 3
    "MATCH (a)<-[:SPOKE]-(h:H)-[:SPOKE]->(b) WHERE id(a) <> id(b) " +
      "RETURN count(*) AS x", value(12))
  scenario("fan: undirected two-hop between spokes", gFan,
    "MATCH (a:S {idx: 1})-[:SPOKE*2..2]-(b:S) RETURN count(*) AS x",
    value(3))
  scenario("diamond OPTIONAL var-length on missing type", gDiamond,
    "MATCH (s {name:'s'}) OPTIONAL MATCH (s)-[:NOPE*1..2]->(m) " +
      "RETURN s.name AS a, m AS b", rows(Map("a" -> "s", "b" -> null)))
  scenario("multi-label scan on topology graph", gDiamond,
    "MATCH (n) RETURN count(*) AS x", value(6))

  // ============================================ nested list / map access
  scenario("nested list double index", g,
    "RETURN [[1, 2], [3]][0][1] AS x", value(2))
  scenario("nested list out-of-range inner", g,
    "RETURN [[1, 2], [3]][1][5] AS x", value(null))
  scenario("list membership of a list element", g,
    "RETURN ([1, 2] IN [[1, 2], [3]]) AS x", value(true))
  scenario("list membership of absent list element", g,
    "RETURN ([2, 1] IN [[1, 2], [3]]) AS x", value(false))
  scenario("slice of a nested list", g,
    "RETURN [[1], [2], [3]][1..][0] AS x", Seq(Map("x" -> List(2L))))
  scenario("map inside list inside map chain", g,
    "RETURN {a: [{b: [7, 8]}]}.a[0].b[1] AS x", value(8))
  scenario("size of nested comprehension result", g,
    "RETURN size([x IN [[1, 2], [3, 4]] | size(x)]) AS x", value(2))
  scenario("flattening one level via reduce concat", g,
    "RETURN reduce(acc = [], l IN [[1], [2, 3]] | acc + l) AS x",
    Seq(Map("x" -> List(1L, 2L, 3L))))
  scenario("index into split result", g,
    "RETURN split('a-b-c', '-')[1] AS x", value("b"))
  scenario("comprehension over range with modulo filter", g,
    "RETURN [i IN range(0, 9) WHERE i % 3 = 0 | i] AS x",
    Seq(Map("x" -> List(0L, 3L, 6L, 9L))))

  // ============================================ WHERE-position breadth
  scenario("WHERE references later-bound var in same MATCH", gDiamond,
    "MATCH (a)-[:E]->(b) WHERE b.name = 't' RETURN a.name AS x",
    rows(Map("x" -> "l"), Map("x" -> "r")))
  scenario("WHERE on relationship of var-length is not required", gDiamond,
    "MATCH (s {name:'s'})-[rs:E*1..2]->(x) WHERE size(rs) = 1 " +
      "RETURN x.name AS x", rows(Map("x" -> "l"), Map("x" -> "r")))
  scenario("WHERE combines pattern and value predicates", gDiamond,
    "MATCH (a:D) WHERE (a)-[:E]->() AND a.name <> 's' RETURN a.name AS x",
    rows(Map("x" -> "l"), Map("x" -> "r")))
  scenario("implicit AND of inline props and WHERE", gDiamond,
    "MATCH (a:D {name:'s'}) WHERE id(a) >= 0 RETURN count(*) AS x",
    value(1))
}
