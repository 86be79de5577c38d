package graft

/** TCK-style conformance, part 16 — reading clauses AFTER write clauses
  * (openCypher visibility: each clause sees every preceding clause's
  * writes). The planner swaps its ambient graph for the written state at
  * each write-clause boundary, so a subsequent MATCH / OPTIONAL MATCH
  * scans the post-write tables; these scenarios pin creation visibility,
  * deletion invisibility, update visibility, per-row multiplication, and
  * write→read→write chains (see TckStyleSpec for why hand-authored). */
class TckStyleSpec16 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c"))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 1, 3, "LIKES")))

  // ------------------------------------------- creation is visible
  scenario("MATCH after CREATE sees the created node", g,
    "CREATE (:X) MATCH (m:X) RETURN count(*) AS x", value(1L))
  scenario("MATCH after CREATE sees old and new nodes", g,
    "CREATE (:X) MATCH (m) RETURN count(*) AS x", value(4L))
  scenario("MATCH traverses a created relationship", g,
    "CREATE (:P {k: 1})-[:E {w: 9}]->(:Q {k: 2}) " +
      "MATCH (x:P)-[r:E]->(y:Q) RETURN x.k AS a, r.w AS w, y.k AS b",
    rows(Map("a" -> 1L, "w" -> 9L, "b" -> 2L)))
  scenario("MATCH from a bound created node expands into the new graph", g,
    "CREATE (a:P {k: 1})-[:E]->(:Q {k: 2}) MATCH (a)-->(z) " +
      "RETURN z.k AS x", value(2L))
  scenario("created rel from an old node is matchable", g,
    "MATCH (a:A) CREATE (a)-[:NEW]->(:N {k: 7}) " +
      "MATCH (x:A)-[:NEW]->(y:N) RETURN y.k AS x", value(7L))
  scenario("per-row CREATE then MATCH multiplies rows", g,
    "UNWIND [1, 2] AS i CREATE (:M {v: i}) MATCH (m:M) " +
      "RETURN count(*) AS x", value(4L))
  scenario("MATCH after MERGE-create sees the merged node", g,
    "MERGE (n:Z {k: 1}) MATCH (m:Z) RETURN m.k AS x", value(1L))
  scenario("MATCH after MERGE-match does not duplicate", g,
    "MERGE (n:A) MATCH (m:A) RETURN count(*) AS x", value(1L))
  scenario("var-length expand over a written chain", g,
    "CREATE (:V {s: 1})-[:VE]->({s: 2})-[:VE]->({s: 3}) " +
      "MATCH p = (v:V)-[:VE*1..2]->() RETURN length(p) AS x",
    rows(Map("x" -> 1L), Map("x" -> 2L)))

  // ------------------------------------------- deletion is invisible
  scenario("MATCH after DETACH DELETE does not see the node", g,
    "MATCH (n:C) DETACH DELETE n MATCH (m) RETURN count(*) AS x",
    value(2L))
  scenario("MATCH after DELETE of a rel sees no such rel", g,
    "MATCH (:A)-[r:KNOWS]->() DELETE r " +
      "MATCH (:A)-[r2:KNOWS]->() RETURN count(*) AS x", value(0L))
  scenario("deleting one label's nodes keeps the rest matchable", g,
    "MATCH (n:B) DETACH DELETE n MATCH (m) RETURN collect(m.name) AS x",
    value(Seq("a", "c")))

  // ------------------------------------------- updates are visible
  scenario("MATCH after SET sees the new property value", g,
    "MATCH (n:A) SET n.num = 99 MATCH (m) WHERE m.num = 99 " +
      "RETURN m.name AS x", value("a"))
  scenario("MATCH after REMOVE no longer sees the property", g,
    "MATCH (n:A) REMOVE n.num MATCH (m) WHERE m.num IS NOT NULL " +
      "RETURN count(*) AS x", value(1L))
  scenario("MATCH after SET label finds the node under the new label", g,
    "MATCH (n:C) SET n:Promoted MATCH (m:Promoted) RETURN m.name AS x",
    value("c"))
  scenario("MATCH after FOREACH-driven SET sees the update", g,
    "MATCH (n:A) FOREACH (i IN [1] | SET n.num = 42) " +
      "MATCH (m) WHERE m.num = 42 RETURN count(*) AS x", value(1L))

  // ------------------------------------------- read between writes
  scenario("write, read, write: SET on a post-write MATCH binding", g,
    "CREATE (:X {p: 1}) MATCH (m:X) SET m.p = 7 RETURN m.p AS x",
    value(7L))
  scenario("post-write MATCH drives a second CREATE", g,
    "CREATE (:S1 {k: 1}) MATCH (s:S1) CREATE (s)-[:LINK]->(:S2 {k: 2}) " +
      "MATCH (:S1)-[:LINK]->(t:S2) RETURN t.k AS x", value(2L))
  scenario("MERGE matches a node created earlier in the query", g,
    "CREATE (:Z {k: 5}) MERGE (m:Z {k: 5}) MATCH (z:Z) " +
      "RETURN count(*) AS x", value(1L))

  // ------------------------------------------- optional + filters
  scenario("OPTIONAL MATCH after a write null-pads on no match", g,
    "CREATE (:X) OPTIONAL MATCH (m:Nope) RETURN m IS NULL AS x",
    value(true))
  scenario("OPTIONAL MATCH after a write binds on match", g,
    "CREATE (:X {p: 3}) OPTIONAL MATCH (m:X) RETURN m.p AS x", value(3L))
  scenario("WHERE on a post-write MATCH filters written rows", g,
    "UNWIND [1, 2, 3] AS i CREATE (:W {v: i}) WITH DISTINCT 0 AS z " +
      "MATCH (w:W) WHERE w.v >= 2 RETURN count(*) AS x", value(2L))
  scenario("aggregation over a post-write MATCH", g,
    "CREATE (:G {v: 10}), (:G {v: 20}) WITH 0 AS z " +
      "MATCH (m:G) RETURN sum(m.v) AS x", value(30L))
  scenario("EXISTS predicate evaluated against the written graph", g,
    "MATCH (a:A) CREATE (a)-[:PING]->(:T) " +
      "MATCH (n:A) WHERE EXISTS { (n)-[:PING]->(:T) } " +
      "RETURN count(*) AS x", value(1L))
}
