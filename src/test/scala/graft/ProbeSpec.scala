package graft

/** Scratch probe spec (not part of the TCK mirror): drives candidate
  * syntax through the engine to find gaps. Scenarios that reveal real
  * gaps get promoted to a numbered TckStyleSpec part; this file stays
  * minimal between rounds (round-11 findings live in TckStyleSpec53). */
class ProbeSpec extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c", "num" -> 3))),
    Seq(R(10, 1, 2, "KNOWS"), R(11, 2, 3, "LIKES")))

  private var pc = 0
  def probe(name: String, q: String): Unit = {
    pc += 1
    test(f"[$pc%03d] $name") {
      val got = rowsOf(session.cypher(g, q))
      info(s"$q => $got")
    }
  }

  probe("two QPP groups in sequence",
    "MATCH (a:A) (()-[:KNOWS]->()){1} (m) (()-[:LIKES]->()){0,1} (c) " +
      "RETURN c.name AS x ORDER BY x")
  probe("QPP with inner WHERE on group nodes",
    "MATCH (a:A) ((x)-[:KNOWS|LIKES]->(y) WHERE y.num > 1){1,2} (c) " +
      "RETURN c.name AS x ORDER BY x")
  probe("NEXT after a union FIRST segment feeding MATCH",
    "MATCH (n:A) RETURN n.num AS v UNION MATCH (n:B) RETURN n.num AS v " +
      "NEXT MATCH (m {num: v + 1}) RETURN m.name AS x ORDER BY x")
  probe("nested NEXT inside CALL subquery body is segment-local",
    "MATCH (n:A) CALL { RETURN 1 AS one } RETURN n.num + one AS x")
  probe("dynamic label inside EXISTS subquery",
    "MATCH (n:A) WHERE EXISTS { MATCH (m:$('B')) RETURN m } RETURN n.name AS x")
  probe("dynamic type in pattern comprehension",
    "MATCH (a:A) RETURN size([(a)-[:$('KNOWS')]->(b) | b.name]) AS x")
  probe("collect DISTINCT inside COLLECT subquery with ORDER BY",
    "RETURN COLLECT { UNWIND [3,1,3,2] AS v WITH v ORDER BY v RETURN DISTINCT v } AS x")
  probe("NEXT + ORDER BY in final segment",
    "UNWIND [3,1,2] AS v RETURN v NEXT RETURN v ORDER BY v DESC LIMIT 2")
  probe("graph pattern repeated var sameness",
    "MATCH (a)-[:KNOWS]->(b), (b)-[:LIKES]->(c) RETURN c.name AS x")
  probe("label wildcard with dynamic conj",
    "MATCH (n:%&$('B')) RETURN n.name AS x")
}
