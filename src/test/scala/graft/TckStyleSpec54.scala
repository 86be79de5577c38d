package graft

import graft.api.CypherError._

/** TCK-style conformance, part 54 — round-11 probe findings, batch 2:
  *
  *   (a) MERGE bindings are COMPLETE: a matched node/relationship binds
  *       exactly like a MATCH binding — every stored property and label
  *       is readable, not just the ones in the merge pattern. Previously
  *       `MERGE (n:A {name: 'a'}) RETURN n.num` read null off a matched
  *       node (and labels(n) saw only the pattern labels); the existing
  *       pins only ever read back merge-key values, which can't
  *       distinguish matched from created.
  *   (b) Dynamic labels/types in WRITE clauses: CREATE/MERGE accept
  *       `:$(expr)` when the expression is a string/list literal or a
  *       parameter (folded at plan time — Neo4j 5.26 dynamic writes);
  *       row-dependent expressions are classified unsupported, the same
  *       stance as SET/REMOVE's dynamic keys.
  *   (c) NEXT scoping and writes: a NEXT segment re-scopes to exactly the
  *       previous RETURN's columns (reading anything else is
  *       UndefinedVariable), and write segments compose across NEXT.
  */
class TckStyleSpec54 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B", "Extra"), Map("name" -> "b", "num" -> 2))),
    Seq(R(10, 1, 2, "KNOWS", Map("since" -> 2010, "weight" -> 7))))

  // --- (a) complete MERGE bindings -----------------------------------------
  scenario("MERGE-matched node binds its non-key properties", g,
    "MERGE (n:A {name: 'a'}) RETURN n.num AS x", value(1L))
  scenario("MERGE-matched node binds its non-pattern labels", g,
    "MERGE (n:B {name: 'b'}) RETURN labels(n) AS x",
    value(Seq("B", "Extra")))
  scenario("MERGE-created node reads null off-key and pattern labels", g,
    "MERGE (n:Z {name: 'z'}) RETURN n.num AS a, labels(n) AS b",
    rows(Map("a" -> null, "b" -> Seq("Z"))))
  scenario("MERGE-matched relationship binds its non-key properties", g,
    "MATCH (a:A), (b:B) MERGE (a)-[r:KNOWS {since: 2010}]->(b) " +
      "RETURN r.weight AS x", value(7L))
  scenario("MERGE-created relationship reads null off-key", g,
    "MATCH (a:A), (b:B) MERGE (a)-[r:KNOWS {since: 1999}]->(b) " +
      "RETURN r.weight AS x", value(null))
  scenario("undirected MERGE on bound endpoints binds stored props", g,
    "MATCH (b:B), (a:A) MERGE (b)-[r:KNOWS {since: 2010}]-(a) " +
      "RETURN r.weight AS x", value(7L))
  scenario("MERGE path-merge endpoints bind complete (existing shape)", g,
    "MERGE (x:A {name: 'a'})-[r:KNOWS]->(y) " +
      "RETURN y.num AS a, labels(y) AS b, r.weight AS c",
    rows(Map("a" -> 2L, "b" -> Seq("B", "Extra"), "c" -> 7L)))
  scenario("MERGE ON MATCH SET composes with the full binding", g,
    "MERGE (n:A {name: 'a'}) ON MATCH SET n.seen = true " +
      "RETURN n.num AS a, n.seen AS b",
    rows(Map("a" -> 1L, "b" -> true)))

  // --- (b) dynamic labels/types in writes ----------------------------------
  scenario("CREATE with a literal dynamic label", g,
    "CREATE (n:$('D') {v: 1}) WITH * MATCH (d:D) RETURN d.v AS x",
    value(1L))
  scenario("CREATE with a parameter dynamic label list", g,
    "CREATE (n:$($ls) {v: 2}) WITH * MATCH (d:D1:D2) RETURN d.v AS x",
    value(2L), params = Map("ls" -> Seq("D1", "D2")))
  scenario("MERGE with a literal dynamic label matches like the static " +
      "form", g,
    "MERGE (n:$('A') {name: 'a'}) RETURN n.num AS x", value(1L))
  scenario("CREATE with a literal dynamic relationship type", g,
    "MATCH (a:A), (b:B) CREATE (a)-[r:$('ZAP') {v: 9}]->(b) WITH * " +
      "MATCH ()-[z:ZAP]->() RETURN z.v AS x", value(9L))
  errorScenario("row-dependent dynamic label in CREATE is unsupported", g,
    "MATCH (n:A) CREATE (m:$(n.name)) RETURN count(*) AS x",
    SyntaxError, UnsupportedExpression)
  errorScenario("row-dependent dynamic type in MERGE is unsupported", g,
    "MATCH (a:A)-[k:KNOWS]->(b) MERGE (a)-[r:$(type(k))]->(b) " +
      "RETURN count(*) AS x", SyntaxError, UnsupportedExpression)

  // --- (c) NEXT scoping / writes -------------------------------------------
  errorScenario("a NEXT segment cannot read non-returned variables", g,
    "MATCH (n:A) RETURN n.num AS v NEXT RETURN n.num AS x",
    SyntaxError, UndefinedVariable)
  scenario("a write segment mid-chain threads its RETURN", g,
    "CREATE (t:T {v: 10}) RETURN t.v AS v NEXT RETURN v + 1 AS x",
    value(11L))
  scenario("a NEXT segment reads writes from a prior segment", g,
    "CREATE (:T {v: 5}) RETURN 1 AS one NEXT MATCH (t:T) RETURN t.v AS x",
    value(5L))
  scenario("unit CALL body then NEXT", g,
    "MATCH (n:A) CALL (n) { CREATE (:W {v: n.num}) } RETURN n.num AS v " +
      "NEXT MATCH (w:W) RETURN sum(w.v) + sum(v) AS x", value(2L))
}
