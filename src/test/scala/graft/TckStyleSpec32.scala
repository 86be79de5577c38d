package graft

/** TCK-style conformance, part 32 — feature-INTERACTION matrix: each
  * scenario composes two or more major features (quantified path
  * patterns × EXISTS/CALL{}/OPTIONAL/writes, time-of-day values ×
  * writes/aggregation/CASE, pattern comprehensions × temporals, UNWIND ×
  * CALL{} × aggregation) — the cross-feature planner-state seams where
  * an engine that passes per-feature suites still breaks. */
class TckStyleSpec32 extends TckScenarioBase {
  import TckFixtures._

  /** a:A -T{w:1}-> m:M -T{w:2}-> b:B; a -S-> z:Z */
  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("M"), Map("name" -> "m", "num" -> 2)),
      N(3, Set("B"), Map("name" -> "b", "num" -> 3)),
      N(4, Set("Z"), Map("name" -> "z"))),
    Seq(
      R(10, 1, 2, "T", Map("w" -> 1)),
      R(11, 2, 3, "T", Map("w" -> 2)),
      R(12, 1, 4, "S")))

  // ----------------------------------------------------- QPP × subqueries
  scenario("EXISTS{} with a QPP body", g,
    "MATCH (n) WHERE EXISTS { MATCH (n) ((x)-[:T]->(y)){2,2} (t) } " +
      "RETURN n.name AS x", value("a"))
  scenario("COUNT{} with a QPP body", g,
    "MATCH (n:A) RETURN COUNT { (n) ((x)-[:T]->(y)){1,2} (t) } AS x",
    value(2L))
  scenario("correlated CALL{} running a QPP per driving row", g,
    "MATCH (n) CALL { WITH n MATCH (n) ((x)-[:T]->(y)){1,1} (t) " +
      "RETURN t.name AS tn } RETURN n.name AS x, tn ORDER BY x",
    rows(Map("x" -> "a", "tn" -> "m"), Map("x" -> "m", "tn" -> "b")),
    ordered = true)
  scenario("OPTIONAL MATCH with a QPP keeps unmatched rows", g,
    "MATCH (n:Z) OPTIONAL MATCH (n) ((x)-[:T]->(y)){1,1} (t) " +
      "RETURN n.name AS x, t.name AS t", rows(Map("x" -> "z", "t" -> null)))
  scenario("QPP group rel list feeds an aggregate", g,
    "MATCH (a:A) ((x)-[r:T]->(y)){1,2} (t) " +
      "RETURN sum(size(r)) AS x", value(3L)) // 1 + 2
  scenario("pattern comprehension and QPP in one query", g,
    "MATCH (a:A) ((x)-[:T]->(y)){2,2} (t) " +
      "RETURN size([(a)-[:S]->(q) | q.name]) AS s, t.name AS tn",
    rows(Map("s" -> 1L, "tn" -> "b")))

  // ----------------------------------------------------- QPP × writes
  test("[qpp-after-write] CREATE an edge, then a QPP traverses it") {
    val g2 = session.update(g,
      "MATCH (b:B), (z:Z) CREATE (b)-[:T {w: 9}]->(z)")
    val got = rowsOf(session.cypher(g2,
      "MATCH (a:A) ((x)-[:T]->(y)){3,3} (t) RETURN t.name AS x"))
    assert(got === Seq(Map("x" -> "z")))
  }

  // ----------------------------------------------------- time × the rest
  test("[time-in-set] SET a LOCALTIME property and read it back") {
    val g2 = session.update(g,
      "MATCH (a:A) SET a.at = localtime('12:30')")
    val got = rowsOf(session.cypher(g2,
      "MATCH (a:A) RETURN toString(a.at) AS x"))
    assert(got === Seq(Map("x" -> "12:30:00")))
  }
  scenario("time values group and aggregate", g,
    "UNWIND [localtime('09:00'), localtime('09:00'), localtime('10:00')] AS t " +
      "RETURN toString(t) AS k, count(*) AS n ORDER BY k",
    rows(Map("k" -> "09:00:00", "n" -> 2L), Map("k" -> "10:00:00", "n" -> 1L)),
    ordered = true)
  scenario("CASE over a time comparison", g,
    "WITH localtime('23:00') AS t RETURN " +
      "CASE WHEN t > localtime('12:00') THEN 'pm' ELSE 'am' END AS x",
    value("pm"))
  scenario("collect of times orders by timeline in a sorted list", g,
    "UNWIND [time('12:00+02:00'), time('11:30Z')] AS t " +
      "WITH t ORDER BY t RETURN collect(toString(t)) AS x",
    value(List("12:00:00+02:00", "11:30:00Z"))) // 10:00Z < 11:30Z
  scenario("duration.between composes with time-of-day extraction", g,
    "RETURN duration.between(localdatetime('2024-01-01 09:00:00'), " +
      "localdatetime('2024-01-01 11:30:00')).minutes AS x", value(150L))

  // -------------------------------------------- UNWIND × CALL{} × agg
  scenario("UNWIND drives a correlated CALL{} aggregate", g,
    "UNWIND [1, 2] AS k CALL { WITH k MATCH (n) WHERE n.num >= k " +
      "RETURN count(*) AS c } RETURN k, c ORDER BY k",
    rows(Map("k" -> 1L, "c" -> 3L), Map("k" -> 2L, "c" -> 2L)),
    ordered = true)
  scenario("CALL{} result feeds a second aggregation", g,
    "MATCH (n) CALL { WITH n MATCH (n)-[e]->() RETURN count(*) AS deg } " +
      "RETURN deg, count(*) AS freq ORDER BY deg",
    rows(Map("deg" -> 0L, "freq" -> 2L), Map("deg" -> 1L, "freq" -> 1L),
      Map("deg" -> 2L, "freq" -> 1L)), ordered = true)

  // -------------------------------------------- comprehension × temporal
  scenario("list comprehension over dates", g,
    "RETURN [d IN [date('2024-01-31'), date('2024-02-29')] | " +
      "toString(d + duration({months: 1}))] AS x",
    value(List("2024-02-29", "2024-03-29")))
  scenario("reduce over durations accumulates fieldwise", g,
    "RETURN reduce(acc = duration({days: 0}), " +
      "d IN [duration({days: 1}), duration({days: 2, hours: 3})] | acc + d).days AS x",
    value(3L))

  // -------------------------------------------- shortest × QPP (pinned)
  scenario("shortestPath over a QPP group prunes to minimal length", g,
    "MATCH p = shortestPath((a:A) ((x)-[:T|S]->(y))+ (t:Z)) " +
      "RETURN length(p) AS x", value(1L))
}
