package graft

/** TCK-style conformance, part 8 — uncorrelated subqueries (EXISTS{},
  * COUNT{}, pattern comprehensions with no shared variable), duration
  * division guards, and temporal-arithmetic edge cases (month-end clamping,
  * leap years, negative components, group non-conversion). */
class TckStyleSpec8 extends TckScenarioBase {
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

  // ================================ uncorrelated subqueries (no shared var)
  scenario("uncorrelated COUNT {} per outer row", g,
    "MATCH (c:C) RETURN COUNT { ()-[:KNOWS]->() } AS x", value(2))
  scenario("uncorrelated COUNT {} with no outer MATCH", g,
    "RETURN COUNT { ()-[:KNOWS]->() } AS x", value(2))
  scenario("uncorrelated COUNT {} in WHERE", g,
    "MATCH (n) WHERE COUNT { ()-[:KNOWS]->() } = 2 RETURN count(*) AS x",
    value(3))
  scenario("uncorrelated pattern comprehension", g,
    "RETURN [ (a)-[:LIKES]->(b) | b.name ] AS x",
    Seq(Map("x" -> List("c"))))
  scenario("uncorrelated comprehension under size()", g,
    "MATCH (n:A) RETURN size([ (x)-[:KNOWS]->(y) | y.name ]) AS x", value(2))
  scenario("uncorrelated EXISTS {} keeps all rows when true", g,
    "MATCH (n) WHERE EXISTS { (:A)-[:LIKES]->(:C) } RETURN count(*) AS x",
    value(3))
  scenario("uncorrelated EXISTS {} drops all rows when false", g,
    "MATCH (n) WHERE EXISTS { (:C)-[:KNOWS]->() } RETURN count(*) AS x",
    value(0))
  scenario("uncorrelated NOT EXISTS {} inverts", g,
    "MATCH (n) WHERE NOT EXISTS { (:C)-[:KNOWS]->() } RETURN count(*) AS x",
    value(3))
  scenario("uncorrelated EXISTS {} in value position", g,
    "MATCH (n:A) RETURN EXISTS { (:B)-[:KNOWS]->(:C) } AS x", value(true))
  scenario("uncorrelated EXISTS {} in CASE", g,
    "RETURN CASE WHEN EXISTS { ()-[:LIKES]->() } THEN 1 ELSE 0 END AS x",
    value(1))

  // ============================================ duration division guards
  scenario("duration division by zero is null", g,
    "RETURN (duration('P1D') / 0) IS NULL AS x", value(true))
  scenario("duration division by zero: accessor is null", g,
    "RETURN (duration('P1D') / 0).days AS x", Seq(Map("x" -> null)))
  scenario("duration halving within the time group", g,
    "RETURN (duration('PT24H') / 2).hours AS x", value(12))
  scenario("duration halving truncates across groups (documented deviation)", g,
    // Groups never convert: P1D/2 is 0 days, not PT12H (tck_blacklist.md,
    // duration-scaling row) — Neo4j would redistribute into hours.
    "RETURN (duration('P1D') / 2).days AS x", value(0))
  scenario("duration division by fraction scales up", g,
    "RETURN (duration('P1D') / 0.5).days AS x", value(2))
  scenario("duration times zero is zero", g,
    "RETURN (duration('PT3H') * 0).seconds AS x", value(0))
  scenario("duration scaling truncates toward zero", g,
    "RETURN (duration('P1D') * 1.5).days AS x", value(1))

  // ======================================= temporal arithmetic edge cases
  scenario("plus one day over non-leap february", g,
    "RETURN toString(date('2019-02-28') + duration('P1D')) AS x",
    value("2019-03-01"))
  scenario("plus one day inside leap february", g,
    "RETURN toString(date('2020-02-28') + duration('P1D')) AS x",
    value("2020-02-29"))
  scenario("minus one month clamps to leap day", g,
    "RETURN toString(date('2020-03-31') - duration('P1M')) AS x",
    value("2020-02-29"))
  scenario("plus two months keeps month-end when it fits", g,
    "RETURN toString(date('2020-01-31') + duration('P2M')) AS x",
    value("2020-03-31"))
  scenario("duration negative component", g,
    "RETURN duration('P-2D').days AS x", value(-2))
  scenario("duration mixed-sign components", g,
    "RETURN duration('PT-1H30M').minutes AS x", value(-30))
  scenario("leading minus negates the whole duration", g,
    "RETURN duration('-P1DT2H').hours AS x", value(-2))
  scenario("duration mixed-sign subtraction: day group", g,
    "RETURN (duration('P1M') - duration('P40D')).days AS x", value(-40))
  scenario("duration mixed-sign subtraction: month group unscathed", g,
    "RETURN (duration('P1M') - duration('P40D')).months AS x", value(1))
  scenario("duration equality within the time group", g,
    "RETURN duration('PT60M') = duration('PT1H') AS x", value(true))
  scenario("duration groups do not convert for equality", g,
    "RETURN duration('P1M') = duration('P30D') AS x", value(false))
  scenario("duration week form is seven days", g,
    "RETURN duration('P1W').days AS x", value(7))
  scenario("duration fractional seconds to milliseconds", g,
    "RETURN duration('PT0.5S').milliseconds AS x", value(500))
  scenario("duration microsecond precision survives", g,
    "RETURN duration('PT1.000001S').microseconds AS x", value(1000001))
  scenario("localdatetime plus 25 hours: hour wraps", g,
    "RETURN (localdatetime('2020-01-01T00:00:00') + duration('PT25H')).hour AS x",
    value(1))
  scenario("localdatetime plus 25 hours: day advances", g,
    "RETURN (localdatetime('2020-01-01T00:00:00') + duration('PT25H')).day AS x",
    value(2))
  scenario("unary minus duration", g,
    "RETURN (-duration('P1DT2H')).hours AS x", value(-2))

  // ================================= unbounded var-length (fixpoint expand)
  /** cycle 1->2->3->1 plus a tail 3->4 and a disconnected self-loop 5->5:
    * rel-id uniqueness must terminate every walk after one lap. */
  lazy val gCyc = graph(spark,
    Seq(
      N(1, Set("V"), Map("name" -> "n1")), N(2, Set("V"), Map("name" -> "n2")),
      N(3, Set("V"), Map("name" -> "n3")), N(4, Set("V"), Map("name" -> "n4")),
      N(5, Set("V"), Map("name" -> "n5"))),
    Seq(
      R(20, 1, 2, "E"), R(21, 2, 3, "E"), R(22, 3, 1, "E"), R(23, 3, 4, "E"),
      R(24, 5, 5, "E")))

  // Walks from n1: [20], [20,21], [20,21,22], [20,21,23] — the lap back to
  // n1 cannot reuse rel 20.
  scenario("unbounded [*] enumerates all rel-unique walks on a cycle", gCyc,
    "MATCH (a {name:'n1'})-[*]->(x) RETURN count(*) AS x", value(4))
  scenario("unbounded [*2..] drops the short walks", gCyc,
    "MATCH (a {name:'n1'})-[*2..]->(x) RETURN count(*) AS x", value(3))
  scenario("unbounded [*0..] adds the zero-length row", gCyc,
    "MATCH (a {name:'n1'})-[*0..]->(x) RETURN count(*) AS x", value(5))
  scenario("unbounded [*] reaches the anchor itself around the cycle", gCyc,
    "MATCH (a {name:'n1'})-[*]->(x) RETURN x.name AS x",
    rows(Map("x" -> "n2"), Map("x" -> "n3"), Map("x" -> "n1"),
      Map("x" -> "n4")))
  // Walks from n2: [21], [21,22], [21,23], [21,22,20] — back at n2, rel 21
  // is spent.
  scenario("unbounded [*] completes exactly one lap from mid-cycle", gCyc,
    "MATCH (a {name:'n2'})-[*]->(x) RETURN count(*) AS x", value(4))
  scenario("shortestPath over unbounded [*]", gCyc,
    "MATCH p = shortestPath((a {name:'n1'})-[:E*]->(b {name:'n4'})) " +
      "RETURN length(p) AS x", value(3))
  scenario("self-loop terminates after one traversal", gCyc,
    "MATCH (a {name:'n5'})-[*]->(x) RETURN count(*) AS x", value(1))
  // Undirected from n4: [23] then 3 walks down each arm of the cycle
  // ([23,21], [23,21,20], [23,21,20,22] / [23,22], [23,22,20],
  // [23,22,20,21]).
  scenario("unbounded undirected walk also terminates", gCyc,
    "MATCH (a {name:'n4'})-[*]-(x) RETURN count(*) AS x", value(7))

  // ================================================ error classification
  test("[err] unknown variable inside COUNT {} WHERE") {
    errors("RETURN COUNT { (a)-[:KNOWS]->(b) WHERE q.num = 1 } AS x")
  }
}
