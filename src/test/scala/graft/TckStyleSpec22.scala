package graft

import graft.api.CypherError._

/** TCK-style conformance, part 22 — temporal overflow and boundary
  * semantics, mirroring the mass of the reference's temporal blacklist
  * (morpheus-tck/src/test/resources/temporal_blacklist: duration/date
  * overflow, boundary truncation, timezone-less arithmetic). Groups:
  * month-end clamping in date±duration, leap-year/ISO-week/ordinal/quarter
  * date forms at their boundaries, duration component-group
  * non-normalization (months/days/micros never cross-convert),
  * duration.between at clamp boundaries, timezone-less (local) arithmetic
  * across wall-clock DST dates, truncation at period starts, and classified
  * errors for out-of-range literals. Expected values follow the Neo4j
  * temporal documentation where it speaks; engine-consistent behavior is
  * asserted (with a comment) where it does not. */
class TckStyleSpec22 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // ========================================= month-end clamping: date + nM
  scenario("plus one month clamps Jan 31 to leap Feb 29", g,
    "RETURN toString(date('2020-01-31') + duration('P1M')) AS x",
    value("2020-02-29"))
  scenario("plus one month clamps Jan 31 to non-leap Feb 28", g,
    "RETURN toString(date('2019-01-31') + duration('P1M')) AS x",
    value("2019-02-28"))
  scenario("plus one month clamps Jan 30 to Feb 29", g,
    "RETURN toString(date('2020-01-30') + duration('P1M')) AS x",
    value("2020-02-29"))
  scenario("plus one month from Feb 28 lands on Mar 28 (no inverse clamp)", g,
    "RETURN toString(date('2019-02-28') + duration('P1M')) AS x",
    value("2019-03-28"))
  scenario("plus one year clamps leap day to Feb 28", g,
    "RETURN toString(date('2020-02-29') + duration('P1Y')) AS x",
    value("2021-02-28"))
  scenario("minus one year clamps leap day to Feb 28", g,
    "RETURN toString(date('2020-02-29') - duration('P1Y')) AS x",
    value("2019-02-28"))
  scenario("P12M equals P1Y at the leap boundary", g,
    "RETURN date('2020-02-29') + duration('P12M') = " +
      "date('2020-02-29') + duration('P1Y') AS x", value(true))
  scenario("plus thirteen months clamps across the year", g,
    "RETURN toString(date('2020-01-31') + duration('P13M')) AS x",
    value("2021-02-28"))
  scenario("plus one month from a 31-day month to a 30-day month", g,
    "RETURN toString(date('2020-08-31') + duration('P1M')) AS x",
    value("2020-09-30"))
  scenario("minus one month from a 31-day month to a 30-day month", g,
    "RETURN toString(date('2020-10-31') - duration('P1M')) AS x",
    value("2020-09-30"))
  scenario("minus one month clamps Mar 30 to leap Feb 29", g,
    "RETURN toString(date('2020-03-30') - duration('P1M')) AS x",
    value("2020-02-29"))
  scenario("minus one month keeps Mar 28 at Feb 28", g,
    "RETURN toString(date('2020-03-28') - duration('P1M')) AS x",
    value("2020-02-28"))
  scenario("plus one month across Dec 31 does not clamp", g,
    "RETURN toString(date('2019-12-31') + duration('P1M')) AS x",
    value("2020-01-31"))
  scenario("minus two months across a year boundary", g,
    "RETURN toString(date('2020-01-15') - duration('P2M')) AS x",
    value("2019-11-15"))
  scenario("sequential month adds are not the combined add", g,
    // (Jan31+1M)+1M = Feb29+1M = Mar29, while Jan31+2M = Mar31: month
    // addition does not associate across a clamp.
    "RETURN toString((date('2020-01-31') + duration('P1M')) + duration('P1M')) AS x",
    value("2020-03-29"))
  scenario("months apply before days in a combined duration", g,
    // Jan31 + P1M1D: clamp to Feb29 first, then +1 day = Mar 1.
    "RETURN toString(date('2020-01-31') + duration('P1M1D')) AS x",
    value("2020-03-01"))
  scenario("datetime month clamp preserves the time of day", g,
    "RETURN toString(localdatetime('2020-01-31T23:30:00') + duration('P1M')) AS x",
    value("2020-02-29T23:30:00"))

  // ===================== sub-day duration components are discarded on dates
  scenario("date plus PT25H is the same date (sub-day discarded)", g,
    // Neo4j: duration components finer than the temporal's resolution are
    // discarded, not carried — a date never advances from a time component.
    "RETURN toString(date('2020-01-01') + duration('PT25H')) AS x",
    value("2020-01-01"))
  scenario("date plus PT24H is the same date", g,
    "RETURN toString(date('2020-01-01') + duration('PT24H')) AS x",
    value("2020-01-01"))
  scenario("date minus a time-only duration is the same date", g,
    "RETURN toString(date('2020-01-01') - duration('PT1H')) AS x",
    value("2020-01-01"))
  scenario("mixed duration on a date applies months and days only", g,
    "RETURN toString(date('2020-01-31') + duration('P1M1DT25H')) AS x",
    value("2020-03-01"))

  // ============================ leap-year / ISO-week / ordinal / quarter
  scenario("ordinal date 366 exists in a leap year", g,
    "RETURN toString(date('2020-366')) AS x", value("2020-12-31"))
  scenario("ordinal date 365 in a non-leap year is Dec 31", g,
    "RETURN toString(date('2019-365')) AS x", value("2019-12-31"))
  scenario("ISO week 53 of 2020 reaches into 2021", g,
    // 2020-W53 runs Mon 2020-12-28 .. Sun 2021-01-03; Friday is Jan 1.
    "RETURN toString(date('2020-W53-5')) AS x", value("2021-01-01"))
  scenario("ISO week 1 of 2020 starts in 2019", g,
    "RETURN toString(date('2020-W01-1')) AS x", value("2019-12-30"))
  scenario("quarter-day form crosses into the leap day", g,
    // Q1 day 60 in a leap year: 31 (Jan) + 29 = Feb 29.
    "RETURN toString(date('2020-Q1-60')) AS x", value("2020-02-29"))
  scenario("quarter-day form at the last day of Q4", g,
    "RETURN toString(date('2020-Q4-92')) AS x", value("2020-12-31"))
  scenario("ordinalDay of Dec 31 distinguishes leap years", g,
    "RETURN date('2020-12-31').ordinalDay AS a, " +
      "date('2019-12-31').ordinalDay AS b",
    rows(Map("a" -> 366L, "b" -> 365L)))
  scenario("weekYear of Jan 1 belongs to the previous ISO year", g,
    "RETURN date('2021-01-01').weekYear AS x", value(2020L))
  scenario("week of Jan 1 2021 is week 53", g,
    "RETURN date('2021-01-01').week AS x", value(53L))
  scenario("weekYear of Dec 30 belongs to the next ISO year", g,
    "RETURN date('2019-12-30').weekYear AS y, date('2019-12-30').week AS w",
    rows(Map("y" -> 2020L, "w" -> 1L)))
  scenario("dayOfQuarter on the last day of a leap Q1", g,
    "RETURN date('2020-03-31').dayOfQuarter AS x", value(91L))
  scenario("dayOfQuarter resets on the first day of Q2", g,
    "RETURN date('2020-04-01').dayOfQuarter AS x", value(1L))
  scenario("leap day is a Saturday in 2020", g,
    "RETURN date('2020-02-29').dayOfWeek AS x", value(6L))
  scenario("ordinal and calendar forms of the leap day are equal", g,
    "RETURN date('2020-060') = date('2020-02-29') AS x", value(true))
  scenario("leap day orders between Feb 28 and Mar 1", g,
    "RETURN date('2020-02-28') < date('2020-02-29') AND " +
      "date('2020-02-29') < date('2020-03-01') AS x", value(true))

  // =================== duration groups never normalize into each other
  scenario("25 hours stay hours, not a day", g,
    "RETURN duration('PT25H').hours AS h, duration('PT25H').days AS d",
    rows(Map("h" -> 25L, "d" -> 0L)))
  scenario("hours beyond a day still report minutesOfHour", g,
    "RETURN duration('PT25H30M').minutes AS m, " +
      "duration('PT25H30M').minutesOfHour AS mh",
    rows(Map("m" -> 1530L, "mh" -> 30L)))
  scenario("400 days stay in the day group", g,
    "RETURN duration('P400D').days AS d, duration('P400D').months AS m, " +
      "duration('P400D').weeks AS w",
    rows(Map("d" -> 400L, "m" -> 0L, "w" -> 57L)))
  scenario("18 months split into years and monthsOfYear", g,
    "RETURN duration({months: 18}).years AS y, " +
      "duration({months: 18}).monthsOfYear AS m",
    rows(Map("y" -> 1L, "m" -> 6L)))
  scenario("90 minutes split into hours and minutesOfHour", g,
    "RETURN duration({minutes: 90}).hours AS h, " +
      "duration({minutes: 90}).minutesOfHour AS m",
    rows(Map("h" -> 1L, "m" -> 30L)))
  scenario("map constructor sums time fields into one group", g,
    "RETURN duration({hours: 1, minutes: 90}).minutes AS x", value(150L))
  scenario("week and day ISO components sum", g,
    "RETURN duration('P2W3D').days AS x", value(17L))
  scenario("negative seconds give negative secondsOfMinute", g,
    "RETURN duration('PT-90S').secondsOfMinute AS s, " +
      "duration('PT-90S').minutes AS m",
    rows(Map("s" -> -30L, "m" -> -1L)))
  scenario("negative hour-minute-second decomposition", g,
    "RETURN duration('PT-3661S').hours AS h, " +
      "duration('PT-3661S').minutesOfHour AS m, " +
      "duration('PT-3661S').secondsOfMinute AS s",
    rows(Map("h" -> -1L, "m" -> -1L, "s" -> -1L)))
  scenario("milliseconds accumulate and split", g,
    "RETURN duration({seconds: 1, milliseconds: 500}).milliseconds AS ms, " +
      "duration({seconds: 1, milliseconds: 500}).millisecondsOfSecond AS mss",
    rows(Map("ms" -> 1500L, "mss" -> 500L)))
  scenario("fractional ISO seconds land in milliseconds", g,
    "RETURN duration('PT0.5S').milliseconds AS x", value(500L))
  scenario("mixed-sign groups stay independent", g,
    "RETURN duration({days: 1, hours: -25}).days AS d, " +
      "duration({days: 1, hours: -25}).hours AS h",
    rows(Map("d" -> 1L, "h" -> -25L)))
  scenario("quartersOfYear boundary at month 11", g,
    "RETURN duration({months: 11}).quartersOfYear AS q, " +
      "duration({months: 11}).monthsOfQuarter AS m",
    rows(Map("q" -> 3L, "m" -> 2L)))
  scenario("a million days stay days", g,
    "RETURN duration({days: 1000000}).days AS d, " +
      "duration({days: 1000000}).years AS y",
    rows(Map("d" -> 1000000L, "y" -> 0L)))
  scenario("ten billion seconds of hours", g,
    "RETURN duration({seconds: 10000000000}).hours AS x", value(2777777L))
  scenario("microsecondsOfSecond at the group edge", g,
    "RETURN duration('PT1.000001S').microsecondsOfSecond AS x", value(1L))

  // =========================== duration.between at clamp boundaries
  scenario("between Jan 31 and clamped Feb 28 is one whole month", g,
    // Jan 31 + P1M clamps to exactly Feb 28, so the month counts as full.
    "WITH duration.between(date('2019-01-31'), date('2019-02-28')) AS d " +
      "RETURN d.months AS m, d.days AS dd", rows(Map("m" -> 1L, "dd" -> 0L)))
  scenario("between Jan 31 and Mar 1 is one month and a day", g,
    "WITH duration.between(date('2019-01-31'), date('2019-03-01')) AS d " +
      "RETURN d.months AS m, d.days AS dd", rows(Map("m" -> 1L, "dd" -> 1L)))
  scenario("between leap day and next Feb 28 is twelve months", g,
    "WITH duration.between(date('2020-02-29'), date('2021-02-28')) AS d " +
      "RETURN d.months AS m, d.days AS dd, d.years AS y",
    rows(Map("m" -> 12L, "dd" -> 0L, "y" -> 1L)))
  scenario("between adjacent dates backwards is minus one day", g,
    "WITH duration.between(date('2020-01-01'), date('2019-12-31')) AS d " +
      "RETURN d.months AS m, d.days AS dd", rows(Map("m" -> 0L, "dd" -> -1L)))
  scenario("inMonths counts the clamped month as whole", g,
    "WITH duration.inMonths(date('2019-01-31'), date('2019-02-28')) AS d " +
      "RETURN d.months AS x", value(1L))
  scenario("inDays truncates a negative partial day toward zero", g,
    "WITH duration.inDays(localdatetime('2020-01-02T12:00:00'), " +
      "localdatetime('2020-01-01T00:00:00')) AS d RETURN d.days AS x",
    value(-1L))
  scenario("between across the leap day counts hours only", g,
    // Feb 29 23:00 -> Mar 1 01:00 is two hours, not a month boundary.
    "WITH duration.between(localdatetime('2020-02-29T23:00:00'), " +
      "localdatetime('2020-03-01T01:00:00')) AS d " +
      "RETURN d.months AS m, d.days AS dd, d.hours AS h",
    rows(Map("m" -> 0L, "dd" -> 0L, "h" -> 2L)))
  scenario("inSeconds across the leap day", g,
    "WITH duration.inSeconds(date('2020-02-28'), date('2020-03-01')) AS d " +
      "RETURN d.seconds AS x", value(172800L))
  scenario("between equal instants has all-zero components", g,
    "WITH duration.between(localdatetime('2020-06-15T10:30:00'), " +
      "localdatetime('2020-06-15T10:30:00')) AS d " +
      "RETURN d.months AS m, d.days AS dd, d.seconds AS s",
    rows(Map("m" -> 0L, "dd" -> 0L, "s" -> 0L)))

  // =========================== timezone-less (local) arithmetic
  scenario("local arithmetic ignores the US spring-forward wall date", g,
    "RETURN toString(localdatetime('2020-03-08T01:30:00') + duration('PT2H')) AS x",
    value("2020-03-08T03:30:00"))
  scenario("local arithmetic ignores the US fall-back wall date", g,
    "RETURN toString(localdatetime('2020-11-01T01:30:00') + duration('PT1H')) AS x",
    value("2020-11-01T02:30:00"))
  scenario("one second across the year boundary", g,
    "RETURN toString(localdatetime('2019-12-31T23:59:59') + duration('PT1S')) AS x",
    value("2020-01-01T00:00:00"))
  scenario("one microsecond back across the year boundary", g,
    "RETURN toString(localdatetime('2020-01-01T00:00:00') - duration('PT0.000001S')) AS x",
    value("2019-12-31T23:59:59.999999"))
  scenario("PT24H equals P1D on a local datetime", g,
    // Without a timezone a day is always 24 hours — the two forms agree.
    "WITH localdatetime('2020-03-08T01:30:00') AS t " +
      "RETURN t + duration('PT24H') = t + duration('P1D') AS x", value(true))
  scenario("time-of-day survives a day-group add across months", g,
    "RETURN toString(localdatetime('2020-02-28T18:45:30') + duration('P2D')) AS x",
    value("2020-03-01T18:45:30"))

  // ============================ epoch constructors at boundaries
  scenario("epoch zero is 1970-01-01", g,
    "RETURN datetime.fromepoch(0).year AS y, datetime.fromepoch(0).day AS d",
    rows(Map("y" -> 1970L, "d" -> 1L)))
  scenario("negative epoch millis land in 1969", g,
    "RETURN toString(datetime.fromepochmillis(-1)) AS x",
    value("1969-12-31T23:59:59.999"))
  scenario("minus one epoch day is Dec 31 1969", g,
    "RETURN datetime.fromepoch(-86400).day AS d, " +
      "datetime.fromepoch(-86400).month AS m",
    rows(Map("d" -> 31L, "m" -> 12L)))
  scenario("epoch seconds reach year 9999", g,
    "RETURN datetime.fromepoch(253402300799).year AS x", value(9999L))

  // ================================ truncation at period boundaries
  scenario("week truncation on a Monday is the identity", g,
    "RETURN toString(date.truncate('week', date('2020-12-28'))) AS x",
    value("2020-12-28"))
  scenario("week truncation on a Sunday reaches back six days", g,
    "RETURN toString(date.truncate('week', date('2021-01-03'))) AS x",
    value("2020-12-28"))
  scenario("week truncation crosses the year boundary", g,
    "RETURN toString(date.truncate('week', date('2021-01-01'))) AS x",
    value("2020-12-28"))
  scenario("quarter truncation on the first day is the identity", g,
    "RETURN toString(date.truncate('quarter', date('2020-01-01'))) AS x",
    value("2020-01-01"))
  scenario("year truncation of the last instant of the year", g,
    "RETURN toString(datetime.truncate('year', " +
      "localdatetime('2020-12-31T23:59:59'))) AS x",
    value("2020-01-01T00:00:00"))
  scenario("minute truncation drops seconds and fractions", g,
    "RETURN toString(datetime.truncate('minute', " +
      "localdatetime('2020-06-15T10:45:59.999'))) AS x",
    value("2020-06-15T10:45:00"))
  scenario("second truncation keeps the second, drops the fraction", g,
    "RETURN toString(datetime.truncate('second', " +
      "localdatetime('2020-06-15T10:45:59.999'))) AS x",
    value("2020-06-15T10:45:59"))
  scenario("month truncation of the leap day", g,
    "RETURN toString(date.truncate('month', date('2020-02-29'))) AS x",
    value("2020-02-01"))

  // ====================== constructor boundaries, maps, and accessors
  scenario("map constructor builds the leap day", g,
    "RETURN toString(date({year: 2020, month: 2, day: 29})) AS x",
    value("2020-02-29"))
  scenario("map constructor for an invalid date is null (non-ANSI)", g,
    // Neo4j raises; graft runs non-ANSI Spark where invalid make_date is
    // null — the engine-wide expression-null analogue (tck_blacklist.md).
    "RETURN date({year: 2019, month: 2, day: 29}) IS NULL AS x", value(true))
  scenario("map and literal localdatetime constructors agree", g,
    "RETURN localdatetime({year: 2020}) = " +
      "localdatetime('2020-01-01T00:00:00') AS x", value(true))
  scenario("millisecond accessor at sub-second boundaries", g,
    "RETURN localdatetime('2020-01-01T00:00:00.123').millisecond AS ms, " +
      "localdatetime('2020-01-01T00:00:00.123').microsecond AS us",
    rows(Map("ms" -> 123L, "us" -> 123000L)))
  scenario("second accessor truncates the fraction", g,
    "RETURN localdatetime('2020-01-01T00:00:00.999').second AS x", value(0L))
  scenario("year accessor at the calendar floor", g,
    "RETURN date('0001-01-01').year AS x", value(1L))
  scenario("year accessor at the calendar ceiling", g,
    "RETURN date('9999-12-31').year AS x", value(9999L))
  scenario("compact calendar form parses the leap day", g,
    "RETURN toString(date('20200229')) AS x", value("2020-02-29"))
  scenario("year-month form defaults to the first day", g,
    "RETURN toString(date('2020-02')) AS x", value("2020-02-01"))
  scenario("year-only form defaults to Jan 1", g,
    "RETURN toString(date('2020')) AS x", value("2020-01-01"))

  // ====================== duration algebra at group boundaries
  scenario("half-hour halves sum to an hour across accessors", g,
    "WITH duration('PT30M') + duration('PT30M') AS d " +
      "RETURN d.minutes AS m, d.hours AS h", rows(Map("m" -> 60L, "h" -> 1L)))
  scenario("year minus thirteen months is minus one month", g,
    "RETURN (duration('P1Y') - duration('P13M')).months AS x", value(-1L))
  scenario("fractional scaling truncates per group at 2.5", g,
    "RETURN (duration('P1D') * 2.5).days AS x", value(2L))
  scenario("between Feb 28 and the next leap day is a year and a day", g,
    "WITH duration.between(date('2019-02-28'), date('2020-02-29')) AS d " +
      "RETURN d.months AS m, d.days AS dd", rows(Map("m" -> 12L, "dd" -> 1L)))
  scenario("inSeconds runs negative when the end precedes the start", g,
    "WITH duration.inSeconds(localdatetime('2020-01-01T00:00:01'), " +
      "date('2020-01-01')) AS d RETURN d.seconds AS x", value(-1L))

  // ====================== more truncation / constructor boundaries
  scenario("microsecond truncation is the identity at full precision", g,
    "RETURN toString(datetime.truncate('microsecond', " +
      "localdatetime('2020-06-15T10:45:59.999999'))) AS x",
    value("2020-06-15T10:45:59.999999"))
  scenario("hour truncation at the last instant of the hour", g,
    "RETURN toString(datetime.truncate('hour', " +
      "localdatetime('2020-06-15T10:59:59.999'))) AS x",
    value("2020-06-15T10:00:00"))
  scenario("epoch millis at the last instant of day one", g,
    "RETURN toString(datetime.fromepochmillis(86399999)) AS x",
    value("1970-01-01T23:59:59.999"))
  scenario("week form without a day defaults to Monday", g,
    "RETURN toString(date('2015-W30')) AS x", value("2015-07-20"))
  scenario("Sunday is ISO day seven", g,
    "RETURN date('2021-01-03').dayOfWeek AS x", value(7L))

  // ========================== toString(duration) renders ISO-8601
  scenario("duration toString renders day and time groups", g,
    "RETURN toString(duration({days: 1, hours: 2})) AS x", value("P1DT2H"))
  scenario("duration toString round-trips a full literal", g,
    "RETURN toString(duration('P1Y2M3DT4H5M6.5S')) AS x",
    value("P1Y2M3DT4H5M6.5S"))
  scenario("duration toString signs components individually", g,
    "RETURN toString(duration({months: -13})) AS x", value("P-1Y-1M"))
  scenario("zero duration toString is PT0S", g,
    "RETURN toString(duration({seconds: 0})) AS x", value("PT0S"))
  scenario("duration toString keeps microsecond precision", g,
    "RETURN toString(duration('PT0.000001S')) AS x", value("PT0.000001S"))
  scenario("weeks fold into days in duration toString", g,
    "RETURN toString(duration('P2W')) AS x", value("P14D"))
  scenario("time group normalizes in duration toString", g,
    "RETURN toString(duration('PT90M')) AS x", value("PT1H30M"))

  // =============================================== classified errors
  errorScenario("garbage duration literal is classified", g,
    "RETURN duration('XYZ') AS x", ArgumentError, InvalidTemporalValue)
  errorScenario("two-digit year is a malformed date literal", g,
    "RETURN date('20-01') AS x", ArgumentError, InvalidTemporalValue)
  errorScenario("ordinal day 366 of a non-leap year is out of range", g,
    "RETURN date('2019-366') AS x", ArgumentError, InvalidTemporalValue)
  errorScenario("month 13 is out of range", g,
    "RETURN date('2020-13-01') AS x", ArgumentError, InvalidTemporalValue)
  errorScenario("Feb 30 is out of range", g,
    "RETURN date('2020-02-30') AS x", ArgumentError, InvalidTemporalValue)
  errorScenario("hour 25 in a localdatetime literal is out of range", g,
    "RETURN localdatetime('2020-01-01T25:00:00') AS x",
    ArgumentError, InvalidTemporalValue)
}
