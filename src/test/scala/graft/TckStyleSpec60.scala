package graft

/** TCK-style conformance, part 60 — write clauses inside RETURNing
  * CALL { } subqueries (round 12; the unit RETURN-less body landed in an
  * earlier round via the IN TRANSACTIONS machinery). openCypher: the body
  * executes once per INPUT ROW, imports or not; writes through an
  * imported variable update the store AND the outer binding; post-CALL
  * clauses see the written state. */
class TckStyleSpec60 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "n" -> 5)),
      N(2, Set("A"), Map("name" -> "b", "n" -> 7)),
      N(3, Set("B"), Map("name" -> "c"))),
    Seq(R(10, 1, 2, "KNOWS")))

  scenario("SET through an imported var updates store and outer binding", g,
    "MATCH (x:A {name:'a'}) CALL (x) { SET x.n = x.n + 1 " +
      "RETURN x.n AS m } RETURN m, x.n AS outer",
    rows(Map("m" -> 6, "outer" -> 6)))
  scenario("importing-WITH form writes per driving row", g,
    "MATCH (x:A) CALL { WITH x SET x.hit = 1 RETURN x.n AS m } " +
      "RETURN count(*) AS n, sum(m) AS s", rows(Map("n" -> 2, "s" -> 12)))
  scenario("uncorrelated CREATE body runs once per input row", g,
    "MATCH (x:A) CALL { CREATE (:CW) RETURN 1 AS one } " +
      "WITH count(*) AS c MATCH (y:CW) RETURN c, count(y) AS created",
    rows(Map("c" -> 2, "created" -> 2)))
  scenario("correlated CREATE body mints one element per driving row", g,
    "MATCH (x:A) CALL (x) { CREATE (m:MIR {k: x.n}) RETURN m.k AS k } " +
      "WITH collect(k) AS ks MATCH (y:MIR) " +
      "RETURN size(ks) AS nk, count(y) AS n", rows(Map("nk" -> 2, "n" -> 2)))
  scenario("post-CALL MATCH sees the body's writes", g,
    "CALL { CREATE (:PW {v: 3}) RETURN 1 AS one } " +
      "WITH one MATCH (p:PW) RETURN p.v AS v", rows(Map("v" -> 3)))
  scenario("MERGE inside a correlated body converges per driving row", g,
    "MATCH (x:A) CALL (x) { MERGE (t:Tgt {k: 1}) RETURN id(t) AS i } " +
      "RETURN count(DISTINCT i) AS n", rows(Map("n" -> 1)))
  scenario("DELETE inside a CALL body; post-CALL scan reflects it", g,
    "CREATE (:DD {k: 1}) WITH 1 AS one " +
      "CALL { MATCH (d:DD) DELETE d RETURN count(*) AS c } " +
      "WITH c OPTIONAL MATCH (d2:DD) RETURN c, count(d2) AS left_",
    rows(Map("c" -> 1, "left_" -> 0)))
  scenario("read-only CALL bodies keep the run-once plan (no behavior change)", g,
    "MATCH (x:A) CALL { MATCH (b:B) RETURN b.name AS bn } " +
      "RETURN count(*) AS n", rows(Map("n" -> 2)))
  scenario("UNION arms of a writing body each run per driving row", g,
    "MATCH (x:A) CALL (x) { CREATE (a:UA {k: x.n}) RETURN a.k AS k " +
      "UNION ALL CREATE (b:UB {k: x.n + 10}) RETURN b.k AS k } " +
      "RETURN count(*) AS rows_, count(DISTINCT k) AS ks",
    rows(Map("rows_" -> 4, "ks" -> 4)))
  scenario("nested CALL bodies can write", g,
    "MATCH (x:A {name:'a'}) CALL (x) { CALL { CREATE (:NW) RETURN 1 AS i } " +
      "RETURN i } WITH 1 AS one MATCH (y:NW) RETURN count(y) AS n",
    rows(Map("n" -> 1)))
  scenario("chained writing CALLs compose through the refreshed binding", g,
    "MATCH (x:A {name:'a'}) CALL (x) { SET x.n = x.n * 10 RETURN 0 AS z } " +
      "CALL (x) { SET x.n = x.n + 5 RETURN 0 AS z2 } RETURN x.n AS fin",
    rows(Map("fin" -> 55)))
}
