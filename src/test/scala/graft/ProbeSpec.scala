package graft

/** Scratch probe spec (not part of the TCK mirror): drives candidate
  * syntax through the engine to find gaps. Scenarios that reveal real
  * gaps get promoted to a numbered TckStyleSpec part; this file stays
  * minimal between rounds (round-11 findings live in TckStyleSpec51-54). */
class ProbeSpec extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a", "num" -> 1))),
    Seq.empty)

  private var pc = 0
  def probe(name: String, q: String): Unit = {
    pc += 1
    test(f"[$pc%03d] $name") {
      val got = rowsOf(session.cypher(g, q))
      info(s"$q => $got")
    }
  }

  probe("FOREACH with MERGE inside reads complete binding effects",
    "FOREACH (i IN [1,2] | MERGE (:F {v: i})) WITH * MATCH (f:F) " +
      "RETURN count(*) AS x")
  probe("SET += map keeps other props",
    "MATCH (n:A) SET n += {extra: 9} RETURN n.name AS a, n.extra AS b")
  probe("MERGE after DELETE sees the deletion",
    "MATCH (n:A) DETACH DELETE n MERGE (m:A {name: 'a'}) " +
      "RETURN m.num AS x")
  probe("temporal prop write-read roundtrip",
    "CREATE (t:TS {d: date('2024-02-29'), dt: datetime('2024-02-29T12:00:00Z')}) " +
      "WITH * MATCH (x:TS) RETURN x.d AS d, x.dt AS dt")
  probe("list prop write-read roundtrip",
    "CREATE (t:LS {xs: [1,2,3]}) WITH * MATCH (x:LS) RETURN x.xs[1] AS x")
  probe("MERGE ON CREATE SET dynamic param key",
    "MERGE (n:NK {k: 1}) ON CREATE SET n.made = true RETURN n.made AS x")
  probe("REMOVE label then MERGE re-match",
    "MATCH (n:A) REMOVE n:A WITH * MERGE (m:A {name: 'a'}) " +
      "RETURN m.num AS x")
}
