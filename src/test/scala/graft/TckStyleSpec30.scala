package graft

import graft.api.CypherError

/** TCK-style conformance, part 30 — LOCALTIME and TIME time-of-day types
  * (BEYOND-reference surface: the reference's Spark backend has neither;
  * graft encodes them as marker structs, see ExprCompiler.localTimeType):
  * constructors (string forms incl. compact + fractional, component maps,
  * offsets), accessors, timeline ordering across offsets, duration
  * arithmetic with midnight wrap (seconds group only), truncation,
  * rendering, and the classified error surface. Divergence (documented in
  * tck_blacklist.md): TIME equality requires equal offsets, not just
  * equal instants. */
class TckStyleSpec30 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark, Seq(N(1, Set("A"), Map("name" -> "a"))))

  // ------------------------------------------------------- constructors
  scenario("localtime from a full string", g,
    "RETURN toString(localtime('12:31:14')) AS x", value("12:31:14"))
  scenario("localtime renders a millisecond fraction trimmed", g,
    "RETURN toString(localtime('12:31:14.123')) AS x", value("12:31:14.123"))
  scenario("localtime keeps microsecond resolution", g,
    "RETURN toString(localtime('12:31:14.123456')) AS x",
    value("12:31:14.123456"))
  scenario("localtime hour-only string", g,
    "RETURN toString(localtime('12')) AS x", value("12:00:00"))
  scenario("localtime compact string", g,
    "RETURN toString(localtime('123114')) AS x", value("12:31:14"))
  scenario("localtime component map", g,
    "RETURN toString(localtime({hour: 9, minute: 5, second: 7})) AS x",
    value("09:05:07"))
  scenario("localtime map with sub-second components", g,
    "RETURN localtime({hour: 1, minute: 2, second: 3, millisecond: 645}).millisecond AS x",
    value(645L))
  scenario("time from a string with a positive offset", g,
    "RETURN toString(time('12:31:14+01:00')) AS x", value("12:31:14+01:00"))
  scenario("time with a negative compact offset", g,
    "RETURN toString(time('06:30-0830')) AS x", value("06:30:00-08:30"))
  scenario("time with Z renders Z", g,
    "RETURN toString(time('23:59:59Z')) AS x", value("23:59:59Z"))
  scenario("time without an offset defaults to UTC", g,
    "RETURN time('10:00').offsetSeconds AS x", value(0L))
  scenario("time component map with timezone", g,
    "RETURN toString(time({hour: 6, minute: 30, timezone: '+02:00'})) AS x",
    value("06:30:00+02:00"))

  // ------------------------------------------------------- accessors
  scenario("localtime accessors", g,
    "WITH localtime('12:31:14.123456') AS t RETURN t.hour AS h, t.minute AS m, t.second AS s, t.millisecond AS ms, t.microsecond AS us",
    rows(Map("h" -> 12L, "m" -> 31L, "s" -> 14L, "ms" -> 123L,
      "us" -> 123456L)))
  scenario("time accessors read the LOCAL wall time", g,
    "WITH time('12:31:14+05:00') AS t RETURN t.hour AS h, t.minute AS m",
    rows(Map("h" -> 12L, "m" -> 31L)))
  scenario("time offset accessors", g,
    "WITH time('12:00-03:30') AS t RETURN t.offset AS o, t.offsetMinutes AS om, t.offsetSeconds AS os",
    rows(Map("o" -> "-03:30", "om" -> -210L, "os" -> -12600L)))

  // ------------------------------------------------------- ordering
  scenario("localtime orders by wall time", g,
    "RETURN localtime('09:00') < localtime('10:00') AS x", value(true))
  scenario("time orders by the UTC instant across offsets", g,
    // 12:00+01:00 is 11:00Z, before 11:30Z
    "RETURN time('12:00+01:00') < time('11:30Z') AS x", value(true))
  scenario("min/max aggregate over localtime", g,
    "UNWIND [localtime('10:00'), localtime('08:30'), localtime('23:59')] AS t " +
      "RETURN toString(min(t)) AS lo, toString(max(t)) AS hi",
    rows(Map("lo" -> "08:30:00", "hi" -> "23:59:00")))
  scenario("ORDER BY over times", g,
    "UNWIND [localtime('10:00'), localtime('08:30')] AS t " +
      "RETURN toString(t) AS x ORDER BY t",
    rows(Map("x" -> "08:30:00"), Map("x" -> "10:00:00")), ordered = true)
  scenario("localtime and date are cross-class: comparison is null", g,
    "RETURN localtime('09:00') < date('2024-01-01') AS x", value(null))
  scenario("localtime equality", g,
    "RETURN localtime('09:00') = localtime({hour: 9}) AS x", value(true))
  scenario("DISTINCT over equal localtimes collapses", g,
    "UNWIND [localtime('09:00'), localtime('09:00:00')] AS t " +
      "RETURN count(DISTINCT t) AS x", value(1L))

  // ------------------------------------------------------- arithmetic
  scenario("localtime + duration uses only the seconds group", g,
    "RETURN toString(localtime('10:00') + duration({days: 5, hours: 2})) AS x",
    value("12:00:00"))
  scenario("localtime + duration wraps past midnight", g,
    "RETURN toString(localtime('23:30') + duration({hours: 2})) AS x",
    value("01:30:00"))
  scenario("localtime - duration wraps backwards", g,
    "RETURN toString(localtime('01:00') - duration({hours: 2})) AS x",
    value("23:00:00"))
  scenario("time + duration keeps the offset", g,
    "RETURN toString(time('23:30+02:30') + duration({hours: 2})) AS x",
    value("01:30:00+02:30"))
  scenario("month components never shift a time", g,
    "RETURN toString(localtime('10:00') + duration({months: 3})) AS x",
    value("10:00:00"))
  errorScenario("two times cannot be added", g,
    "RETURN localtime('09:00') + localtime('01:00') AS x",
    CypherError.SyntaxError, CypherError.InvalidArgumentType)
  errorScenario("a time and a date cannot be added", g,
    "RETURN date('2024-01-01') + localtime('09:00') AS x",
    CypherError.SyntaxError, CypherError.InvalidArgumentType)

  // ------------------------------------------------------- truncation
  scenario("localtime.truncate to the hour", g,
    "RETURN toString(localtime.truncate('hour', localtime('12:31:14'))) AS x",
    value("12:00:00"))
  scenario("localtime.truncate to the second drops the fraction", g,
    "RETURN toString(localtime.truncate('second', localtime('12:31:14.999'))) AS x",
    value("12:31:14"))
  scenario("time.truncate keeps the offset", g,
    "RETURN toString(time.truncate('minute', time('12:31:44+05:00'))) AS x",
    value("12:31:00+05:00"))
  scenario("localtime.truncate of a TIME takes its wall time", g,
    "RETURN toString(localtime.truncate('hour', time('12:31:00+05:00'))) AS x",
    value("12:00:00"))

  // ------------------------------------------- conversion / composition
  scenario("localtime of a localdatetime truncates to the time-of-day", g,
    "RETURN toString(localtime(localdatetime('2024-01-01 12:31:14'))) AS x",
    value("12:31:14"))
  scenario("time of a localtime attaches the session UTC offset", g,
    "RETURN toString(time(localtime('09:30'))) AS x", value("09:30:00Z"))
  scenario("localtime of a time takes the wall time", g,
    "RETURN toString(localtime(time('09:30+02:00'))) AS x",
    value("09:30:00"))
  scenario("datetime composed from date and time bases", g,
    "RETURN toString(datetime({date: date('2024-05-06'), time: localtime('07:08:09.5')})) AS x",
    value("2024-05-06T07:08:09.5"))
  scenario("localdatetime from a date base alone is midnight", g,
    "RETURN toString(localdatetime({date: date('2024-05-06')})) AS x",
    value("2024-05-06T00:00:00"))
  scenario("a TIME base composes via its wall time", g,
    "RETURN toString(datetime({date: date('2024-05-06'), time: time('07:08:09+03:00')})) AS x",
    value("2024-05-06T07:08:09"))
  errorScenario("datetime composition needs a date base", g,
    "RETURN datetime({time: localtime('07:08')}) AS x",
    CypherError.ArgumentError, CypherError.InvalidArgumentValue)
  // Round 8 lifted the old overrides-rejected limitation: selection with
  // component overrides is now supported (TckStyleSpec36 pins the full
  // semantics; this keeps the base-map + override composition visible here).
  scenario("component overrides on a base map select-and-override", g,
    "RETURN toString(datetime({date: date('2024-05-06'), hour: 3})) AS x",
    value("2024-05-06T03:00:00"))
  errorScenario("a number is not a time value", g,
    "RETURN localtime(42) AS x",
    CypherError.SyntaxError, CypherError.InvalidArgumentType)

  // ------------------------------------------------------- errors
  errorScenario("hour out of range is classified", g,
    "RETURN localtime('25:00') AS x",
    CypherError.ArgumentError, CypherError.InvalidTemporalValue)
  errorScenario("minute out of range is classified", g,
    "RETURN localtime('10:71') AS x",
    CypherError.ArgumentError, CypherError.InvalidTemporalValue)
  errorScenario("malformed time string is classified", g,
    "RETURN localtime('half past nine') AS x",
    CypherError.ArgumentError, CypherError.InvalidTemporalValue)
  errorScenario("sub-microsecond resolution is rejected", g,
    "RETURN localtime('12:31:14.1234567') AS x",
    CypherError.ArgumentError, CypherError.InvalidArgumentValue)
  errorScenario("named zones need a date and are rejected in time()", g,
    "RETURN time('12:00[Europe/Paris]') AS x",
    CypherError.ArgumentError, CypherError.InvalidArgumentValue)
  errorScenario("significance order: second without minute", g,
    "RETURN localtime({hour: 1, second: 3}) AS x",
    CypherError.ArgumentError, CypherError.InvalidArgumentValue)
  errorScenario("unknown truncation unit is classified", g,
    "RETURN localtime.truncate('fortnight', localtime('12:00')) AS x",
    CypherError.ArgumentError, CypherError.InvalidArgumentValue)
  errorScenario("offset accessor on a localtime is unknown", g,
    "RETURN localtime('09:00').offset AS x",
    CypherError.SemanticError, CypherError.UnsupportedExpression)
}
