package graft

import graft.api.CypherError._

/** TCK-style conformance, part 56 — round-12 probe findings promoted:
  * pattern UNION inside a quantified path pattern group
  * (`((x)-[:A]->(y) | (x)<-[:B]-(y)){m,n}`, GQL/Cypher-2025: each
  * repetition may take any branch — the step relation is the union of
  * the branch step relations, deduplicated, under the same trail
  * semantics as every var-length expand), the `RETRY FOR n SECONDS`
  * duration-unit form of CALL { } IN TRANSACTIONS error handling, and
  * zoned-datetime duration arithmetic across a DST transition (instant
  * arithmetic on the UTC value; the zone-unretained rendering is the
  * documented round-10 representation corollary, tck_blacklist.md).
  */
class TckStyleSpec56 extends TckScenarioBase {
  import TckFixtures._

  //    a --K--> b --K--> c      a <--L-- c
  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a")),
      N(2, Set("B"), Map("name" -> "b")),
      N(3, Set("C"), Map("name" -> "c"))),
    Seq(R(10, 1, 2, "K"), R(11, 2, 3, "K"), R(12, 3, 1, "L")))

  // --- QPP pattern union ----------------------------------------------
  scenario("union of opposite directions equals the undirected expand", g,
    "MATCH (s {name: 'a'})((x)-[:K]->(y) | (x)<-[:K]-(y)){1,2}(b) " +
      "RETURN b.name AS x ORDER BY x",
    rows(Map("x" -> "b"), Map("x" -> "c")), ordered = true)
  scenario("union over different types takes any branch per repetition", g,
    "MATCH (s {name: 'a'})((x)-[:K]->(y) | (x)-[:L]->(y)){3,3}(b) " +
      "RETURN b.name AS x", value("a")) // a-K->b-K->c, then c-L->a
  scenario("union branches may carry branch-local WHERE", g,
    "MATCH (s {name: 'a'})((x)-[:K]->(y) WHERE y.name = 'b' " +
      "| (x)-[:L]->(y) WHERE y.name = 'zzz'){1,2}(b) " +
      "RETURN b.name AS x ORDER BY x",
    // a-K->b passes branch 1's WHERE; b-K->c fails it; branch 2's WHERE
    // matches nothing — the filters stay scoped to their own branch.
    value("b"))
  scenario("overlapping branches do not double-count a step", g,
    // Both branches match the same K edges; the step union dedups, so the
    // path count equals the single-branch count.
    "MATCH (s {name: 'a'})((x)-[:K]->(y) | (x)-[:K]->(y)){1,2}(b) " +
      "RETURN count(*) AS x", value(2L))
  scenario("union group exports its inner variables as group lists", g,
    "MATCH (s {name: 'a'})((x)-[:K]->(y) | (x)<-[:L]-(y)){2,2}(b) " +
      "RETURN [n IN y | n.name] AS x", value(Seq("b", "c")))
  scenario("zero repetitions of a union group still allowed", g,
    "MATCH (s {name: 'a'})((x)-[:K]->(y) | (x)<-[:L]-(y)){0,1}(b) " +
      "RETURN count(*) AS x", value(3L)) // a itself, b via K, c via L
  errorScenario("union branches must bind the same variables", g,
    "MATCH (s)((x)-[:K]->(y) | (p)<-[:L]-(q)){1,2}(b) RETURN count(*) AS x",
    SemanticError, DifferentColumnsInUnion)

  // --- CALL IN TRANSACTIONS: RETRY FOR with a duration unit -------------
  scenario("RETRY FOR n SECONDS THEN CONTINUE parses and reports status", g,
    "UNWIND [1, 2] AS i " +
      "CALL { WITH i RETURN i * 2 AS j } IN TRANSACTIONS " +
      "ON ERROR RETRY FOR 5 SECONDS THEN CONTINUE REPORT STATUS AS s " +
      "RETURN sum(j) AS x, count(s) AS c",
    rows(Map("x" -> 6L, "c" -> 2L)))
  scenario("RETRY FOR n SECONDS THEN BREAK parses", g,
    "UNWIND [1] AS i CALL { WITH i RETURN i AS j } IN TRANSACTIONS " +
      "ON ERROR RETRY FOR 2 SECONDS THEN BREAK RETURN j AS x", value(1L))
  scenario("bare RETRY with THEN FAIL parses", g,
    "UNWIND [1] AS i CALL { WITH i RETURN i AS j } IN TRANSACTIONS " +
      "ON ERROR RETRY THEN FAIL RETURN j AS x", value(1L))

  // --- DST-transition duration arithmetic (documented semantics) -------
  // Europe/Berlin springs forward 2024-03-31 02:00 -> 03:00 (+01 -> +02).
  // Duration hours live in the seconds group => INSTANT arithmetic:
  // 01:30+01:00 is 00:30Z; +2h = 02:30Z (Neo4j renders it 04:30+02:00 —
  // same instant; this engine's zone-unretained rendering shows the UTC
  // wall time, tck_blacklist.md).
  scenario("adding hours across spring-forward is instant arithmetic", g,
    "RETURN toString(datetime({year: 2024, month: 3, day: 31, hour: 1, " +
      "minute: 30, timezone: 'Europe/Berlin'}) + duration({hours: 2})) AS x",
    value("2024-03-31T02:30:00"))
  scenario("duration.between across spring-forward measures real time", g,
    // 01:00+01:00 -> 04:00+02:00 is 2 real hours, not 3 wall hours.
    "WITH duration.between(datetime('2024-03-31T01:00:00[Europe/Berlin]'), " +
      "datetime('2024-03-31T04:00:00[Europe/Berlin]')) AS d " +
      "RETURN d.hours AS x", value(2L))
  scenario("fall-back is also instant arithmetic", g,
    // Berlin falls back 2024-10-27 03:00 -> 02:00 (+02 -> +01):
    // 02:30+02:00 is 00:30Z; +2h = 02:30Z (= 03:30+01:00 Berlin).
    "RETURN toString(datetime('2024-10-27T02:30:00+02:00[Europe/Berlin]') " +
      "+ duration({hours: 2})) AS x",
    value("2024-10-27T02:30:00"))
}
