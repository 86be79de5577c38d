package graft

import graft.api.CypherError._

/** TCK-style conformance, part 47 — the CALL { } IN TRANSACTIONS surface
  * (Neo4j 5/2025 CallInTxsAcceptance): batch shape `OF n|$p ROW[S]`,
  * concurrency `[n|$p] CONCURRENT`, error handlers `ON ERROR
  * CONTINUE|BREAK|FAIL|RETRY [FOR d] [THEN handler]`, and `REPORT STATUS
  * AS var`. This engine computes over an immutable snapshot, so the
  * unbatched execution is result-identical on the success path; REPORT
  * STATUS binds the no-error status map (started/committed true,
  * transactionId/errorMessage null — deviation: per-batch error recovery
  * does not exist, failures are atomic; see tck_blacklist.md). */
class TckStyleSpec47 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("A"), Map("name" -> "c", "num" -> 3))),
    Seq.empty)

  // ----------------------------- batch / concurrency shapes (ignored)
  scenario("IN TRANSACTIONS bare", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "RETURN sum(v) AS x", value(6L))
  scenario("IN TRANSACTIONS OF n ROWS", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS OF 2 ROWS " +
      "RETURN sum(v) AS x", value(6L))
  scenario("IN TRANSACTIONS OF n ROW (singular)", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS OF 1 ROW " +
      "RETURN sum(v) AS x", value(6L))
  scenario("IN TRANSACTIONS OF $param ROWS", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "OF $batch ROWS RETURN sum(v) AS x", value(6L))
  scenario("IN CONCURRENT TRANSACTIONS", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN CONCURRENT TRANSACTIONS " +
      "RETURN sum(v) AS x", value(6L))
  scenario("IN n CONCURRENT TRANSACTIONS OF n ROWS", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } " +
      "IN 4 CONCURRENT TRANSACTIONS OF 2 ROWS RETURN sum(v) AS x", value(6L))

  // ----------------------------- ON ERROR handlers
  scenario("ON ERROR FAIL (default, identical)", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "ON ERROR FAIL RETURN sum(v) AS x", value(6L))
  scenario("ON ERROR CONTINUE success path", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "ON ERROR CONTINUE RETURN sum(v) AS x", value(6L))
  scenario("ON ERROR BREAK success path", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "ON ERROR BREAK RETURN sum(v) AS x", value(6L))
  scenario("ON ERROR RETRY (bare)", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "ON ERROR RETRY RETURN sum(v) AS x", value(6L))
  scenario("ON ERROR RETRY FOR duration THEN handler", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "ON ERROR RETRY FOR duration({seconds: 3}) THEN CONTINUE " +
      "RETURN sum(v) AS x", value(6L))

  // ----------------------------- REPORT STATUS
  scenario("REPORT STATUS binds the no-error status map", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "ON ERROR CONTINUE REPORT STATUS AS s " +
      "RETURN sum(v) AS t, count(CASE WHEN s.committed THEN 1 END) AS c, " +
      "count(s.errorMessage) AS e",
    rows(Map("t" -> 6L, "c" -> 3L, "e" -> 0L)))
  scenario("REPORT STATUS started accessor", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS OF 1 ROW " +
      "ON ERROR BREAK REPORT STATUS AS s WITH s WHERE s.started " +
      "RETURN count(*) AS x", value(3L))
  scenario("REPORT STATUS over a write body", g,
    "MATCH (n) CALL (n) { CREATE (m:B {src: n.num}) } IN TRANSACTIONS " +
      "OF 2 ROWS ON ERROR CONTINUE REPORT STATUS AS s " +
      "RETURN count(CASE WHEN s.committed THEN 1 END) AS x", value(3L))

  // ----------------------------- unit subqueries (no RETURN, updates)
  scenario("uncorrelated unit body runs once per driving row", g,
    "MATCH (n) CALL { CREATE (:X) } WITH * MATCH (x:X) " +
      "RETURN count(*) AS x", value(9L)) // 3 driving rows x 3 X nodes
  scenario("correlated unit body writes per row", g,
    "MATCH (n) CALL (n) { CREATE (:B {v: n.num * 10}) } WITH * " +
      "MATCH (b:B) RETURN sum(b.v) AS x", value(180L)) // 3 driving rows x (10+20+30)
  scenario("unit body: driving rows pass through unchanged", g,
    "MATCH (n) CALL (n) { CREATE (:X {of: n.num}) } " +
      "RETURN count(*) AS x", value(3L))
  scenario("unit body with SET via MATCH inside", g,
    "MATCH (n {name: 'a'}) CALL (n) { SET n.num = 100 } WITH * " +
      "MATCH (m {name: 'a'}) RETURN m.num AS x", value(100L))
  scenario("unit body with MERGE", g,
    "MATCH (n) CALL (n) { MERGE (:Only) } WITH * MATCH (o:Only) " +
      "RETURN count(*) AS x", value(3L)) // 1 Only node x 3 driving rows
  scenario("unit body with internal WITH filter", g,
    "MATCH (n) CALL (n) { WITH n WHERE n.num > 1 CREATE (:Big) } " +
      "WITH * MATCH (b:Big) RETURN count(*) AS x", value(6L)) // 2 Big x 3 rows
  scenario("unit body ending in FINISH", g,
    "MATCH (n) CALL (n) { CREATE (:F) FINISH } WITH * MATCH (f:F) " +
      "RETURN count(*) AS x", value(9L)) // 3 F nodes x 3 driving rows
  scenario("unit body with DELETE", g,
    "MATCH (n {name: 'c'}) CALL (n) { DETACH DELETE n } WITH * " +
      "MATCH (m) RETURN count(*) AS x", value(2L))
  scenario("unit body IN TRANSACTIONS (the canonical batch-write shape)", g,
    "MATCH (n) CALL (n) { CREATE (:W {v: n.num}) } " +
      "IN TRANSACTIONS OF 2 ROWS WITH * MATCH (w:W) " +
      "RETURN sum(w.v) AS x", value(18L)) // (1+2+3) x 3 driving rows
  errorScenario("unit body cannot read non-imported outer variables", g,
    "MATCH (n) CALL { CREATE (:Y {v: n.num}) } RETURN count(*) AS x",
    SyntaxError, UndefinedVariable)

  // ----------------------------- validation
  errorScenario("REPORT STATUS requires ON ERROR CONTINUE or BREAK", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "REPORT STATUS AS s RETURN s", SyntaxError, InvalidSyntax)
  errorScenario("REPORT STATUS with ON ERROR FAIL is invalid", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "ON ERROR FAIL REPORT STATUS AS s RETURN s",
    SyntaxError, InvalidSyntax)
  errorScenario("OF needs a row count", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS OF ROWS " +
      "RETURN v", SyntaxError, InvalidSyntax)
  errorScenario("ON ERROR needs a known handler", g,
    "MATCH (n) CALL (n) { RETURN n.num AS v } IN TRANSACTIONS " +
      "ON ERROR EXPLODE RETURN v", SyntaxError, InvalidSyntax)
}
