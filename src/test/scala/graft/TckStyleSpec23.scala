package graft

import graft.api.CypherError._

/** TCK-style conformance, part 23 — temporal MAP constructors at reference
  * parity (okapi-api/.../impl/temporal/TemporalTypesHelper.scala:184-280,
  * morpheus-testing/.../acceptance/TemporalTests.scala:228-392): the four
  * date identifier chains (calendar, ISO week, ordinal, quarter), the
  * significance-order rule (a present key must not follow an omitted finer
  * one within its chain), `year` always required, non-chain keys ignored,
  * sub-second components additive, nanosecond resolution rejected, and the
  * reference's malformed-string error cases. */
class TckStyleSpec23 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // ------------------------------------------ calendar chain (year/month/day)
  scenario("calendar map form", g,
    "RETURN toString(date({year: 2015, month: 10, day: 12})) AS x",
    value("2015-10-12"))
  scenario("calendar map defaults month and day to 1", g,
    "RETURN toString(date({year: 2015})) AS x", value("2015-01-01"))

  // ------------------------------------------ ISO week chain (year/week/dayOfWeek)
  scenario("week map form reaches across the year boundary", g,
    "RETURN toString(date({year: 2020, week: 53, dayOfWeek: 5})) AS x",
    value("2021-01-01"))
  scenario("week map form defaults dayOfWeek to Monday", g,
    "RETURN toString(date({year: 2020, week: 1})) AS x", value("2019-12-30"))
  scenario("week map form over computed values stays column-level", g,
    // 2020-W09-6: Monday of week 9 is Feb 24, Saturday is the leap day.
    "WITH 2020 AS y, 9 AS w RETURN " +
      "toString(date({year: y, week: w, dayOfWeek: 6})) AS x",
    value("2020-02-29"))

  // ------------------------------------------ ordinal chain (year/ordinalDay)
  scenario("ordinal map form hits the leap day", g,
    "RETURN toString(date({year: 2020, ordinalDay: 60})) AS x",
    value("2020-02-29"))
  scenario("ordinal map form at day 366 of a leap year", g,
    "RETURN toString(date({year: 2020, ordinalDay: 366})) AS x",
    value("2020-12-31"))

  // ------------------------------------------ quarter chain (year/quarter/dayOfQuarter)
  scenario("quarter map form hits the leap day", g,
    "RETURN toString(date({year: 2020, quarter: 1, dayOfQuarter: 60})) AS x",
    value("2020-02-29"))
  scenario("quarter map form defaults dayOfQuarter to 1", g,
    "RETURN toString(date({year: 2020, quarter: 4})) AS x",
    value("2020-10-01"))

  // ------------------------------------------ chain selection and ignored keys
  scenario("non-chain keys in a date map are ignored", g,
    // Reference sanitizeMap does not validate membership: hour has no
    // place in a date and is dropped (TemporalTypesHelper.scala:282-284).
    "RETURN toString(date({year: 2020, hour: 7})) AS x", value("2020-01-01"))
  // Round 8: a fine chain key without its coarser one no longer silently
  // falls back to the calendar chain — {year, dayOfWeek} omits `week`,
  // a significance-order violation (Neo4j raises InvalidArgumentValue).
  errorScenario("dayOfWeek without week is a significance-order error", g,
    "RETURN toString(date({year: 2020, dayOfWeek: 5})) AS x",
    ArgumentError, InvalidArgumentValue)

  // ------------------------------------------ localdatetime / datetime maps
  scenario("datetime map with additive sub-second components", g,
    "RETURN toString(localdatetime({year: 2020, month: 6, day: 15, " +
      "hour: 12, minute: 30, second: 1, millisecond: 10, microsecond: 10})) AS x",
    value("2020-06-15T12:30:01.01001"))
  scenario("datetime map may give hour without month or day", g,
    // The date and time chains validate independently (reference
    // parseDateMap + parseTimeMap) — year alone plus hour is legal.
    "RETURN toString(localdatetime({year: 2018, hour: 12})) AS x",
    value("2018-01-01T12:00:00"))
  scenario("week-form date carries into a datetime map", g,
    "RETURN toString(localdatetime({year: 2020, week: 9, dayOfWeek: 6, " +
      "hour: 23})) AS x", value("2020-02-29T23:00:00"))
  scenario("quarter-form date carries into a datetime map", g,
    "RETURN toString(datetime({year: 2020, quarter: 2, dayOfQuarter: 1, " +
      "hour: 6})) AS x", value("2020-04-01T06:00:00"))
  scenario("week-form datetime map defaults the whole time part", g,
    "RETURN toString(localdatetime({year: 2020, week: 9})) AS x",
    value("2020-02-24T00:00:00"))

  // ------------------------------------------ significance-order errors
  errorScenario("date map omitting month before day is rejected", g,
    "RETURN date({year: 2018, day: 356}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("date map without year is rejected", g,
    "RETURN date({month: 11, day: 2}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("date map with only day is rejected", g,
    "RETURN date({day: 2}) AS x", ArgumentError, InvalidArgumentValue)
  errorScenario("datetime map omitting hour before minute is rejected", g,
    "RETURN localdatetime({year: 2011, minute: 50}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("datetime map omitting minute before second is rejected", g,
    "RETURN localdatetime({year: 2018, hour: 12, second: 14}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("nanosecond resolution is rejected", g,
    "RETURN localdatetime({year: 2015, month: 10, day: 1, hour: 12, " +
      "minute: 50, second: 1, nanosecond: 42}) AS x",
    ArgumentError, InvalidArgumentValue)

  // ------------------------------------------ malformed-string parity
  errorScenario("four-component date string is malformed", g,
    "RETURN date('2018-10-10-10') AS x", ArgumentError, InvalidTemporalValue)
  errorScenario("nine-digit compact date string is malformed", g,
    "RETURN date('201810101') AS x", ArgumentError, InvalidTemporalValue)
  errorScenario("four-component time string is malformed", g,
    "RETURN localdatetime('2018-10-10T12:10:30:15') AS x",
    ArgumentError, InvalidTemporalValue)
  errorScenario("seven-digit compact time string is malformed", g,
    "RETURN localdatetime('20181010T1210301') AS x",
    ArgumentError, InvalidTemporalValue)
  errorScenario("fourteen-digit date part is malformed", g,
    "RETURN localdatetime('20181010123123T12:00') AS x",
    ArgumentError, InvalidTemporalValue)
  errorScenario("seconds without T in a duration string are malformed", g,
    "RETURN duration('P1S') AS x", ArgumentError, InvalidTemporalValue)
}
