package graft

import graft.api.CypherError

/** TCK-style conformance, part 68 — round-13 probe batch: map projections
  * over entity VALUES, and the year-span temporal truncation units.
  *
  * (1) A map projection whose subject is an entity-struct VALUE (a lambda
  *     binder over nodes(p)/relationships(p), or an unwound collected
  *     node) must read fields off the struct — the bare binder compiles
  *     to its _id (identity semantics), and `.getField` on that long
  *     leaked a Spark analysis error before this round.
  * (2) datetime/date.truncate support the year-span units decade /
  *     century / millennium (Neo4j surface; Spark's date_trunc lacks
  *     them); weekYear stays a classified refusal. */
class TckStyleSpec68 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2))),
    Seq(R(10, 1, 2, "KNOWS")))

  // --- (1) map projections over entity values ----------------------------
  scenario("map projection over a nodes(p) lambda binder", g,
    "MATCH p = (a:A {name: 'a'})-[:KNOWS]->(b) " +
      "RETURN [x IN nodes(p) | x {.name}] AS ms",
    rows(Map("ms" -> Seq(Map("name" -> "a"), Map("name" -> "b")))))
  scenario("map projection .* over an unwound collected node", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN m {.*} AS mm ORDER BY m.name LIMIT 1",
    rows(Map("mm" -> Map("name" -> "a", "num" -> 1L))))
  scenario("map projection mixes .*, literal entries and missing props", g,
    "MATCH (n:A {name: 'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN m {.name, .nope, extra: 42} AS mm",
    rows(Map("mm" -> Map("name" -> "a", "nope" -> null, "extra" -> 42L))))
  scenario("map projection over a relationships(p) binder", g,
    "MATCH p = (a:A {name: 'a'})-[:KNOWS]->(b) " +
      "RETURN [x IN relationships(p) | x {t: type(x)}] AS ts",
    rows(Map("ts" -> Seq(Map("t" -> "KNOWS")))))

  // --- (2) year-span truncation units -------------------------------------
  scenario("datetime.truncate to decade", g,
    "RETURN datetime.truncate('decade', datetime('2027-03-05T12:30:00')) AS t",
    rows(Map("t" -> java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))))
  scenario("datetime.truncate to century", g,
    "RETURN datetime.truncate('century', datetime('2027-03-05T12:30:00')) AS t",
    rows(Map("t" -> java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))))
  scenario("date.truncate to millennium", g,
    "RETURN date.truncate('millennium', date('2987-06-07')) AS t",
    rows(Map("t" -> java.sql.Date.valueOf("2000-01-01"))))
  scenario("decade truncation composes with an override map", g,
    "RETURN datetime.truncate('decade', datetime('2027-03-05T12:30:00'), " +
      "{day: 15}) AS t",
    rows(Map("t" -> java.sql.Timestamp.valueOf("2020-01-15 00:00:00"))))
  errorScenario("weekYear truncation is a classified refusal", g,
    "RETURN datetime.truncate('weekYear', datetime('2027-03-05T12:30:00')) AS t",
    CypherError.ArgumentError, CypherError.InvalidArgumentValue)
}
