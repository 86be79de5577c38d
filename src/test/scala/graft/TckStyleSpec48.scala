package graft

import graft.api.CypherError._

/** TCK-style conformance, part 48 — temporal zone edges (round-10 probe
  * sweep): the datetime map constructor's `timezone` component (wall time
  * in the zone converted to the engine's UTC instant — previously the key
  * was SILENTLY IGNORED, a wrong-answer class), DST gap/overlap
  * resolution (java.time rules: gaps shift forward by the gap length,
  * overlaps take the earlier offset — Neo4j's resolution), epoch
  * constructors (epochSeconds/epochMillis, Neo4j doc examples), and the
  * constructor key validation that makes unknown components loud. The
  * zone itself is never retained (documented deviation: session-UTC
  * TimestampType). */
class TckStyleSpec48 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // ----------------------------- timezone component = wall time in zone
  scenario("timezone converts wall time to the UTC instant", g,
    "RETURN toString(datetime({year: 2026, month: 3, day: 1, hour: 12, " +
      "timezone: 'Europe/Berlin'})) AS x", value("2026-03-01T11:00:00"))
  scenario("timezone with an offset string", g,
    "RETURN toString(datetime({year: 2026, month: 3, day: 1, hour: 12, " +
      "timezone: '+05:00'})) AS x", value("2026-03-01T07:00:00"))
  scenario("southern-hemisphere DST zone", g,
    "RETURN toString(datetime({year: 2026, month: 1, day: 10, hour: 12, " +
      "timezone: 'Australia/Sydney'})) AS x", value("2026-01-10T01:00:00"))
  scenario("timezone over a date base with overrides", g,
    "RETURN toString(datetime({date: date('2026-03-01'), hour: 12, " +
      "timezone: 'Europe/Berlin'})) AS x", value("2026-03-01T11:00:00"))
  scenario("UTC timezone is the identity", g,
    "RETURN toString(datetime({year: 2026, month: 3, day: 1, hour: 12, " +
      "timezone: 'UTC'})) AS x", value("2026-03-01T12:00:00"))

  // ----------------------------- DST edges (Europe/Berlin: 2026-03-29
  // 02:00→03:00 spring gap; 2026-10-25 03:00→02:00 fall overlap)
  scenario("DST gap shifts forward by the gap length", g,
    "RETURN toString(datetime({year: 2026, month: 3, day: 29, hour: 2, " +
      "minute: 30, timezone: 'Europe/Berlin'})) AS x",
    value("2026-03-29T01:30:00"))
  scenario("DST overlap takes the earlier offset", g,
    "RETURN toString(datetime({year: 2026, month: 10, day: 25, hour: 2, " +
      "minute: 30, timezone: 'Europe/Berlin'})) AS x",
    value("2026-10-25T00:30:00"))
  scenario("string literal DST gap resolves the same way", g,
    "RETURN toString(datetime('2026-03-29T02:30[Europe/Berlin]')) AS x",
    value("2026-03-29T01:30:00"))
  scenario("string literal DST overlap takes the earlier offset", g,
    "RETURN toString(datetime('2026-10-25T02:30[Europe/Berlin]')) AS x",
    value("2026-10-25T00:30:00"))
  scenario("explicit offset wins over the bracketed zone", g,
    "RETURN toString(datetime('2026-10-25T02:30+01:00[Europe/Berlin]')) AS x",
    value("2026-10-25T01:30:00"))
  scenario("arithmetic across a DST boundary is naive-UTC", g,
    // The instant one day after the gap-day midnight: pure 24h arithmetic
    // on the UTC instant (zones are not retained — deviation).
    "RETURN toString(datetime('2026-03-29T00:00[Europe/Berlin]') " +
      "+ duration('P1D')) AS x", value("2026-03-29T23:00:00"))

  // ----------------------------- epoch constructors (Neo4j doc examples)
  scenario("epochMillis constructor", g,
    "RETURN toString(datetime({epochMillis: 424797300000})) AS x",
    value("1983-06-18T15:15:00"))
  scenario("epochSeconds constructor", g,
    "RETURN toString(datetime({epochSeconds: 1000000000})) AS x",
    value("2001-09-09T01:46:40"))
  scenario("epochSeconds composes with sub-second components", g,
    "RETURN datetime({epochSeconds: 1, millisecond: 2, microsecond: 3})" +
      ".microsecond AS x", value(2003L))
  scenario("negative epochSeconds reaches before 1970", g,
    "RETURN toString(datetime({epochSeconds: -1})) AS x",
    value("1969-12-31T23:59:59"))
  scenario("epoch round-trips through the accessor", g,
    "RETURN datetime({epochSeconds: 987654321}).epochSeconds AS x",
    value(987654321L))

  // ----------------------------- validation
  errorScenario("unknown datetime component is loud", g,
    "RETURN datetime({year: 2026, frobnicate: 1}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("epochSeconds does not combine with calendar components", g,
    "RETURN datetime({epochSeconds: 1, year: 2026}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("epochSeconds and epochMillis are exclusive", g,
    "RETURN datetime({epochSeconds: 1, epochMillis: 1000}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("localdatetime rejects timezone with components", g,
    "RETURN localdatetime({year: 2026, timezone: 'Europe/Berlin'}) AS x",
    ArgumentError, InvalidArgumentValue)
}
