package graft

import graft.api.CypherError._

/** TCK-style conformance, part 40 — temporal gaps found by round-9 probing
  * (the TCK's temporal blacklist zone): fractional duration components
  * (literal and map constructor: only the smallest literal component may
  * be fractional, fractions cascade into smaller units via the 30.436875
  * Gregorian avg-month, truncating at microseconds — Neo4j duration
  * semantics),
  * ISO 'T' rendering of toString(datetime/localdatetime), and strict
  * component validation in the localtime/time map constructors (nanosecond
  * is a classified resolution error, unknown keys are errors — previously
  * both were silently zeroed). */
class TckStyleSpec40 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // ----------------------------- fractional duration literals (last comp)
  scenario("fractional days split into hours", g,
    "RETURN toString(duration('P2.5D')) AS x", value("P2DT12H"))
  scenario("fractional years split into whole months", g,
    "RETURN toString(duration('P1.5Y')) AS x", value("P1Y6M"))
  scenario("fractional years cascade through avg-month days", g,
    // 0.1y = 1.2 months -> 1 month + 0.2 * 30.436875 d = 6d + 2h5m49.2s
    "RETURN toString(duration('P1.1Y')) AS x", value("P1Y1M6DT2H5M49.2S"))
  scenario("fractional months use the 30.436875 Gregorian average", g,
    "RETURN toString(duration('P1.5M')) AS x", value("P1M15DT5H14M33S"))
  scenario("fractional hours split into minutes", g,
    "RETURN toString(duration('PT1.5H')) AS x", value("PT1H30M"))
  scenario("fractional minutes split into seconds", g,
    "RETURN toString(duration('PT0.5M')) AS x", value("PT30S"))
  scenario("fractional weeks split into days and hours", g,
    "RETURN toString(duration('P1.5W')) AS x", value("P10DT12H"))
  scenario("ISO comma decimal marker accepted", g,
    "RETURN toString(duration('P1,5D')) AS x", value("P1DT12H"))
  scenario("fractional seconds still exact", g,
    "RETURN duration('PT1.5S').milliseconds AS x", value(1500L))
  scenario("negative fractional component keeps its sign", g,
    "RETURN toString(duration('PT-1.5H')) AS x", value("PT-1H-30M"))
  scenario("leading minus negates a fractional duration", g,
    "RETURN toString(duration('-P2.5D')) AS x", value("P-2DT-12H"))
  errorScenario("fraction in a non-smallest component is an error", g,
    "RETURN duration('P1.5Y2M') AS x",
    ArgumentError, InvalidTemporalValue)
  errorScenario("fraction before the time block is an error", g,
    "RETURN duration('P1.5DT1H') AS x",
    ArgumentError, InvalidTemporalValue)
  errorScenario("a duration needs at least one component", g,
    "RETURN duration('P') AS x",
    ArgumentError, InvalidTemporalValue)

  // ----------------------------- fractional duration map constructor
  scenario("map constructor: fractional days", g,
    "RETURN toString(duration({days: 2.5})) AS x", value("P2DT12H"))
  scenario("map constructor: fractional years", g,
    "RETURN toString(duration({years: 1.5})) AS x", value("P1Y6M"))
  scenario("map constructor: independent fractional components", g,
    "RETURN toString(duration({months: 1, days: 2.5, hours: 1.25})) AS x",
    value("P1M2DT13H15M"))
  scenario("map constructor: fractional seconds", g,
    "RETURN toString(duration({seconds: 1.5})) AS x", value("PT1.5S"))
  scenario("map constructor: all-integer path stays exact past 2^53", g,
    "RETURN duration({microseconds: 9007199254740995}).micros AS x",
    value(9007199254740995L))

  // ----------------------------- toString ISO 'T' separator
  scenario("toString(localdatetime) uses the ISO T separator", g,
    "RETURN toString(localdatetime('2015-07-21T21:40:32.142')) AS x",
    value("2015-07-21T21:40:32.142"))
  scenario("toString(datetime) uses T (zone not retained: naive UTC form)", g,
    "RETURN toString(datetime('2015-07-21T21:40:32.142+01:00')) AS x",
    value("2015-07-21T20:40:32.142"))
  scenario("toString of truncate output keeps the T form", g,
    "RETURN toString(datetime.truncate('day', " +
      "localdatetime('2017-11-27T12:31:14'))) AS x",
    value("2017-11-27T00:00:00"))
  scenario("toString of datetime arithmetic keeps the T form", g,
    "RETURN toString(localdatetime('2020-01-01T00:00:00') " +
      "+ duration('PT25H')) AS x",
    value("2020-01-02T01:00:00"))
  scenario("toString(date) unchanged (no time part, no T)", g,
    "RETURN toString(date('2015-07-21')) AS x", value("2015-07-21"))

  // ----------------------------- localtime/time component validation
  errorScenario("localtime map: nanosecond is below resolution", g,
    "RETURN localtime({hour: 12, nanosecond: 645876123}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("time map: nanosecond is below resolution", g,
    "RETURN time({hour: 12, nanosecond: 1}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("localtime map: unknown component is an error", g,
    "RETURN localtime({hou: 12}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("localtime map: timezone is not a localtime component", g,
    "RETURN localtime({hour: 12, timezone: '+01:00'}) AS x",
    ArgumentError, InvalidArgumentValue)
  scenario("time map still accepts timezone + sub-second components", g,
    "RETURN toString(time({hour: 12, minute: 31, second: 14, " +
      "millisecond: 645, microsecond: 876, timezone: '+01:00'})) AS x",
    value("12:31:14.645876+01:00"))
  scenario("localtime map: millisecond and microsecond are additive", g,
    "RETURN toString(localtime({hour: 1, millisecond: 2, " +
      "microsecond: 3})) AS x",
    value("01:00:00.002003"))
}
