package graft

/** Scratch probe spec (not part of the TCK mirror): drives candidate
  * syntax through the engine to find gaps. Scenarios that reveal real
  * gaps get promoted to a numbered TckStyleSpec part; this file stays
  * minimal between rounds (round-11 findings live in TckStyleSpec51-54). */
class ProbeSpec extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c", "num" -> 3))),
    Seq(R(10, 1, 2, "KNOWS"), R(11, 2, 3, "KNOWS")))

  private var pc = 0
  def probe(name: String, q: String): Unit = {
    pc += 1
    test(f"[$pc%03d] $name") {
      val got = rowsOf(session.cypher(g, q))
      info(s"$q => $got")
    }
  }

  probe("path var over a QPP group",
    "MATCH p = (a:A) (()-[:KNOWS]->()){1,2} (c) RETURN length(p) AS x ORDER BY x")
  probe("relationships() over a QPP path",
    "MATCH p = (a:A) (()-[:KNOWS]->())+ (c:C) RETURN size(relationships(p)) AS x")
  probe("nodes() distinctness in trail semantics",
    "MATCH p = (a:A)-[*1..3]->(c) RETURN size(nodes(p)) AS x ORDER BY x")
  probe("ORDER BY collect element", 
    "UNWIND [[2,1],[1,3]] AS xs WITH xs ORDER BY xs[0] RETURN collect(xs)[0] AS x")
  probe("reduce over path nodes",
    "MATCH p = (a:A)-[:KNOWS*2]->(c) RETURN reduce(s = 0, n IN nodes(p) | s + n.num) AS x")
  probe("percentileDisc over one row",
    "UNWIND [5] AS v RETURN percentileDisc(v, 0.5) AS x")
  probe("stDev of singleton is 0",
    "UNWIND [5.0] AS v RETURN stDev(v) AS x")
  probe("min over mixed numeric types",
    "UNWIND [2, 1.5] AS v RETURN min(v) AS x")
  probe("duration comparison",
    "RETURN duration('PT1H') < duration('PT2H') AS a, duration('P1M') = duration('P30D') AS b")
  probe("point? (should be unsupported/absent)",
    "RETURN point({x: 1.0, y: 2.0}) AS p")
  probe("char ranges in range()",
    "RETURN range(0, 10, 3) AS x, range(3, 0, -1) AS y")
  probe("head/last/tail on empty",
    "RETURN head([]) AS a, last([]) AS b, tail([]) AS c")
  probe("subquery CALL with ORDER BY LIMIT per row",
    "MATCH (n) CALL (n) { MATCH (m) WHERE m.num > n.num RETURN m.num AS v ORDER BY v LIMIT 1 } RETURN n.num AS a, v ORDER BY a")
}
