package graft

import graft.api.CypherError._

/** TCK-style conformance, part 36 — the heaviest features of the
  * reference's temporal blacklist (morpheus-tck/src/test/resources/
  * temporal_blacklist: TemporalSelectAcceptance 183, TemporalTruncate-
  * Acceptance 322, TemporalCreateAcceptance week/ordinal/quarter chains,
  * DurationBetweenAcceptance 131). Round 8 adds the SELECTION form —
  * constructing a temporal from another temporal with component
  * overrides, keeping every base component that is not overridden —
  * which these scenarios pin alongside deeper truncate/create/between
  * coverage. Expected values mirror the Neo4j temporal documentation
  * examples where they exist (1984-03-07 = {year 1984, week 10,
  * dayOfWeek 3}, etc.). */
class TckStyleSpec36 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // =========================================================== selection
  // --- date from a temporal base ---
  scenario("date selects the calendar day of a date base", g,
    "RETURN toString(date({date: date('1984-10-11')})) AS x",
    value("1984-10-11"))
  scenario("date selects the calendar day of a datetime base", g,
    "RETURN toString(date({date: localdatetime('1984-10-11T12:31:14')})) AS x",
    value("1984-10-11"))
  scenario("date select with a day override", g,
    "RETURN toString(date({date: date('1984-10-11'), day: 28})) AS x",
    value("1984-10-28"))
  scenario("date select with a month override keeps base day", g,
    "RETURN toString(date({date: date('1984-10-11'), month: 1})) AS x",
    value("1984-01-11"))
  scenario("date select with a year override keeps month and day", g,
    "RETURN toString(date({date: date('1984-10-11'), year: 2000})) AS x",
    value("2000-10-11"))
  scenario("date select overriding month and day", g,
    "RETURN toString(date({date: date('1984-10-11'), month: 2, day: 5})) AS x",
    value("1984-02-05"))
  scenario("date select overriding every component", g,
    "RETURN toString(date({date: date('1984-10-11'), year: 1, month: 2, day: 3})) AS x",
    value("0001-02-03"))
  scenario("date select from a WITH-bound base", g,
    "WITH date('2021-06-15') AS d RETURN (date({date: d, day: 1})).day AS x",
    value(1L))
  scenario("date select composes with accessors", g,
    "RETURN (date({date: date('1984-10-11'), day: 28})).weekday AS x",
    value(7L)) // 1984-10-28 is a Sunday
  scenario("invalid override composition follows non-ANSI null", g,
    // Feb 31 does not exist; Neo4j raises, graft's non-ANSI stance is null
    "RETURN date({date: date('2021-01-31'), month: 2}) IS NULL AS x",
    value(true))
  errorScenario("date select rejects time-component overrides", g,
    "RETURN date({date: date('1984-10-11'), hour: 5}) AS x",
    ArgumentError, InvalidArgumentValue)

  // --- localdatetime / datetime from bases with overrides ---
  scenario("localdatetime from date base alone is midnight", g,
    "RETURN toString(localdatetime({date: date('1984-10-11')})) AS x",
    value("1984-10-11T00:00:00"))
  scenario("localdatetime composes date and time bases", g,
    "RETURN toString(localdatetime({date: date('1984-10-11'), " +
      "time: localtime('12:31:14')})) AS x",
    value("1984-10-11T12:31:14"))
  scenario("localdatetime date base with hour/minute/second overrides", g,
    "RETURN toString(localdatetime({date: date('1984-10-11'), " +
      "hour: 10, minute: 10, second: 10})) AS x",
    value("1984-10-11T10:10:10"))
  scenario("localdatetime time-base second override keeps milliseconds", g,
    "RETURN toString(localdatetime({date: date('1984-10-11'), " +
      "time: localtime('12:31:14.645'), second: 42})) AS x",
    value("1984-10-11T12:31:42.645"))
  scenario("localdatetime day override keeps the base time", g,
    "RETURN toString(localdatetime({date: date('1984-10-11'), " +
      "time: localtime('12:31:14'), day: 28})) AS x",
    value("1984-10-28T12:31:14"))
  scenario("localdatetime from time base plus a year override", g,
    // no date base: month and day default to 1
    "RETURN toString(localdatetime({time: localtime('12:31:14'), " +
      "year: 1984})) AS x",
    value("1984-01-01T12:31:14"))
  scenario("datetime select works through the datetime alias", g,
    "RETURN toString(datetime({date: date('1984-10-11'), hour: 6})) AS x",
    value("1984-10-11T06:00:00"))
  scenario("localdatetime select from a datetime base date part", g,
    "RETURN toString(localdatetime({date: " +
      "localdatetime('1984-10-11T12:31:14'), hour: 5})) AS x",
    // the DATE key selects only the calendar day of the base
    value("1984-10-11T05:00:00"))
  scenario("localdatetime select with every time component", g,
    "RETURN toString(localdatetime({date: date('2000-01-02'), hour: 1, " +
      "minute: 2, second: 3, millisecond: 4, microsecond: 5})) AS x",
    value("2000-01-02T01:02:03.004005"))
  scenario("localdatetime select in a WHERE predicate", g,
    "WITH localdatetime({date: date('1984-10-11'), hour: 12}) AS t " +
      "RETURN t > localdatetime('1984-10-11T11:00:00') AS x",
    value(true))
  errorScenario("localdatetime base rejects unknown override keys", g,
    "RETURN localdatetime({date: date('1984-10-11'), dayofweek: 3}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("localdatetime time component must be a time value", g,
    "RETURN localdatetime({date: date('1984-10-11'), time: 5}) AS x",
    SyntaxError, InvalidArgumentType)
  errorScenario("localdatetime date component must be temporal", g,
    "RETURN localdatetime({date: 7, hour: 1}) AS x",
    SyntaxError, InvalidArgumentType)

  // --- localtime selection ---
  scenario("localtime selects a localtime base unchanged", g,
    "RETURN toString(localtime({time: localtime('12:31:14.645')})) AS x",
    value("12:31:14.645"))
  scenario("localtime second override keeps base milliseconds", g,
    "RETURN toString(localtime({time: localtime('12:31:14.645'), " +
      "second: 42})) AS x",
    value("12:31:42.645"))
  scenario("localtime hour override keeps finer components", g,
    "RETURN toString(localtime({time: localtime('12:31:14'), hour: 6})) AS x",
    value("06:31:14"))
  scenario("localtime selects the time of day of a datetime base", g,
    "RETURN toString(localtime({time: " +
      "localdatetime('1984-10-11T12:31:14')})) AS x",
    value("12:31:14"))
  scenario("localtime selects the local clock of a zoned time base", g,
    "RETURN toString(localtime({time: time('12:31:14+01:00')})) AS x",
    value("12:31:14"))
  scenario("localtime millisecond override", g,
    "RETURN toString(localtime({time: localtime('12:31:14.645'), " +
      "millisecond: 2})) AS x",
    value("12:31:14.002"))
  errorScenario("localtime selection rejects date overrides", g,
    "RETURN localtime({time: localtime('12:00'), day: 2}) AS x",
    ArgumentError, InvalidArgumentValue)

  // --- zoned time selection ---
  scenario("time selection keeps the base offset", g,
    "RETURN toString(time({time: time('12:31:14.645+01:00')})) AS x",
    value("12:31:14.645+01:00"))
  scenario("time selection override keeps the base offset and millis", g,
    "RETURN toString(time({time: time('12:31:14.645+01:00'), " +
      "second: 42})) AS x",
    value("12:31:42.645+01:00"))
  scenario("time from a localtime base defaults to UTC", g,
    "RETURN toString(time({time: localtime('12:31:14')})) AS x",
    value("12:31:14Z"))
  scenario("time from a localtime base with an explicit timezone", g,
    // the WALL-CLOCK reading is preserved; only the offset attaches
    "RETURN toString(time({time: localtime('12:31:14'), " +
      "timezone: '+01:00'})) AS x",
    value("12:31:14+01:00"))
  scenario("timezone override replaces a zoned base's offset, keeps the clock", g,
    "RETURN toString(time({time: time('12:31:14+01:00'), " +
      "timezone: '-05:00'})) AS x",
    value("12:31:14-05:00"))
  scenario("time selection offsetSeconds accessor", g,
    "RETURN time({time: localtime('10:00'), timezone: '+02:00'})" +
      ".offsetSeconds AS x",
    value(7200L))
  scenario("time selection hour override", g,
    "RETURN toString(time({time: time('12:31:14+01:00'), hour: 7})) AS x",
    value("07:31:14+01:00"))

  // ========================================================== truncation
  scenario("date.truncate year from a date", g,
    "RETURN toString(date.truncate('year', date('2017-11-30'))) AS x",
    value("2017-01-01"))
  scenario("date.truncate month from a datetime source", g,
    "RETURN toString(date.truncate('month', " +
      "localdatetime('2017-11-27T12:31:14'))) AS x",
    value("2017-11-01"))
  scenario("date.truncate week on a Sunday lands on the preceding Monday", g,
    // 2017-12-03 is a Sunday; its ISO week began Monday 2017-11-27
    "RETURN toString(date.truncate('week', date('2017-12-03'))) AS x",
    value("2017-11-27"))
  scenario("date.truncate week on a Monday is identity", g,
    "RETURN toString(date.truncate('week', date('2017-11-27'))) AS x",
    value("2017-11-27"))
  scenario("date.truncate day is identity on dates", g,
    "RETURN toString(date.truncate('day', date('2017-11-30'))) AS x",
    value("2017-11-30"))
  scenario("date.truncate quarter of a Q1 date", g,
    "RETURN toString(date.truncate('quarter', date('2017-02-14'))) AS x",
    value("2017-01-01"))
  scenario("localdatetime.truncate minute", g,
    "RETURN toString(localdatetime.truncate('minute', " +
      "localdatetime('2017-11-27T12:31:14'))) AS x",
    value("2017-11-27T12:31:00"))
  scenario("localdatetime.truncate second drops sub-second", g,
    "RETURN toString(localdatetime.truncate('second', " +
      "localdatetime('2017-11-27T12:31:14.645'))) AS x",
    value("2017-11-27T12:31:14"))
  scenario("localdatetime.truncate millisecond keeps milliseconds", g,
    "RETURN toString(localdatetime.truncate('millisecond', " +
      "localdatetime('2017-11-27T12:31:14.645876'))) AS x",
    value("2017-11-27T12:31:14.645"))
  scenario("localdatetime.truncate week", g,
    "RETURN toString(localdatetime.truncate('week', " +
      "localdatetime('2017-11-30T12:31:14'))) AS x",
    value("2017-11-27T00:00:00"))
  scenario("datetime.truncate quarter", g,
    "RETURN toString(datetime.truncate('quarter', " +
      "localdatetime('2017-11-27T12:31:14'))) AS x",
    value("2017-10-01T00:00:00"))
  scenario("localtime.truncate hour", g,
    "RETURN toString(localtime.truncate('hour', " +
      "localtime('12:31:14.645'))) AS x",
    value("12:00:00"))
  scenario("localtime.truncate minute", g,
    "RETURN toString(localtime.truncate('minute', " +
      "localtime('12:31:14.645'))) AS x",
    value("12:31:00"))
  scenario("localtime.truncate second", g,
    "RETURN toString(localtime.truncate('second', " +
      "localtime('12:31:14.645'))) AS x",
    value("12:31:14"))
  scenario("localtime.truncate millisecond", g,
    "RETURN toString(localtime.truncate('millisecond', " +
      "localtime('12:31:14.645876'))) AS x",
    value("12:31:14.645"))
  scenario("localtime.truncate of a zoned time uses the local clock", g,
    "RETURN toString(localtime.truncate('hour', " +
      "time('12:31:14+01:00'))) AS x",
    value("12:00:00"))
  scenario("time.truncate keeps the offset", g,
    "RETURN toString(time.truncate('minute', " +
      "time('12:31:14.645+01:00'))) AS x",
    value("12:31:00+01:00"))
  scenario("truncate then accessor composes", g,
    "RETURN (datetime.truncate('month', " +
      "localdatetime('2017-11-27T12:31:14'))).dayofweek AS x",
    value(3L)) // 2017-11-01 is a Wednesday
  scenario("truncate of a selected value composes", g,
    "RETURN toString(date.truncate('month', " +
      "date({date: date('1984-10-11'), day: 28}))) AS x",
    value("1984-10-01"))
  scenario("localtime.truncate null propagates", g,
    "RETURN localtime.truncate('hour', null) IS NULL AS x", value(true))
  errorScenario("localtime.truncate rejects calendar units", g,
    "RETURN localtime.truncate('month', localtime('12:00')) AS x",
    ArgumentError, InvalidArgumentValue)
  // millennium is implemented since r13 (year-arithmetic truncation);
  // the surviving refusals are the week-year family.
  scenario("date.truncate to the millennium unit", g,
    "RETURN toString(date.truncate('millennium', date('2017-11-30'))) AS x",
    value("2000-01-01"))

  // ===================================================== week / ordinal /
  // quarter creation (the reference documentation's canonical examples)
  scenario("week date construction (doc example)", g,
    "RETURN toString(date({year: 1984, week: 10, dayOfWeek: 3})) AS x",
    value("1984-03-07"))
  scenario("week date defaults dayOfWeek to Monday", g,
    "RETURN toString(date({year: 1984, week: 10})) AS x",
    value("1984-03-05"))
  scenario("week 1 contains January 4 (ISO rule)", g,
    // 2016-01-04 is a Monday, so week 1 of 2016 starts exactly there
    "RETURN toString(date({year: 2016, week: 1, dayOfWeek: 1})) AS x",
    value("2016-01-04"))
  scenario("week 1 can reach back into the previous calendar year", g,
    // Jan 4 2015 is a Sunday; week 1's Monday is 2014-12-29
    "RETURN toString(date({year: 2015, week: 1, dayOfWeek: 1})) AS x",
    value("2014-12-29"))
  scenario("week date round-trips through the week accessor", g,
    "RETURN (date({year: 1984, week: 10, dayOfWeek: 3})).week AS x",
    value(10L))
  scenario("ordinal date construction (doc example)", g,
    "RETURN toString(date({year: 1984, ordinalDay: 202})) AS x",
    value("1984-07-20"))
  scenario("ordinal day 60 in a leap year is February 29", g,
    "RETURN toString(date({year: 2020, ordinalDay: 60})) AS x",
    value("2020-02-29"))
  scenario("ordinal day 60 in a common year is March 1", g,
    "RETURN toString(date({year: 2019, ordinalDay: 60})) AS x",
    value("2019-03-01"))
  scenario("ordinal date round-trips through the ordinalDay accessor", g,
    "RETURN (date({year: 1984, ordinalDay: 202})).ordinalday AS x",
    value(202L))
  scenario("quarter date construction (doc example)", g,
    "RETURN toString(date({year: 1984, quarter: 3, dayOfQuarter: 45})) AS x",
    value("1984-08-14"))
  scenario("quarter date defaults dayOfQuarter to 1", g,
    "RETURN toString(date({year: 1984, quarter: 4})) AS x",
    value("1984-10-01"))
  scenario("quarter date round-trips through accessors", g,
    "WITH date({year: 1984, quarter: 3, dayOfQuarter: 45}) AS d " +
      "RETURN d.quarter AS q, d.dayofquarter AS dq",
    rows(Map("q" -> 3L, "dq" -> 45L)))
  scenario("datetime with a week chain plus time components", g,
    "RETURN toString(localdatetime({year: 1984, week: 10, dayOfWeek: 3, " +
      "hour: 12, minute: 31, second: 14})) AS x",
    value("1984-03-07T12:31:14"))
  scenario("datetime with an ordinal chain plus time components", g,
    "RETURN toString(localdatetime({year: 1984, ordinalDay: 202, " +
      "hour: 12})) AS x",
    value("1984-07-20T12:00:00"))
  scenario("datetime with a quarter chain plus time components", g,
    "RETURN toString(localdatetime({year: 1984, quarter: 3, " +
      "dayOfQuarter: 45, hour: 12, minute: 31, second: 14, " +
      "millisecond: 645})) AS x",
    value("1984-08-14T12:31:14.645"))
  errorScenario("week chain must not skip significance (year+dayOfWeek)", g,
    "RETURN date({year: 1984, dayOfWeek: 3}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("quarter chain must not skip significance", g,
    "RETURN date({year: 1984, dayOfQuarter: 45}) AS x",
    ArgumentError, InvalidArgumentValue)

  // ================================================== duration.between
  scenario("between clamps the day-of-month on short months", g,
    // Jan 30 + 1M clamps to Feb 28 (2018 common year); remainder 1 day
    "WITH duration.between(date('2018-01-30'), date('2018-03-01')) AS d " +
      "RETURN d.months AS m, d.days AS dd",
    rows(Map("m" -> 1L, "dd" -> 1L)))
  scenario("between over a leap-year anniversary clamps Feb 29", g,
    "WITH duration.between(date('2020-02-29'), date('2021-02-28')) AS d " +
      "RETURN d.months AS m, d.days AS dd",
    rows(Map("m" -> 12L, "dd" -> 0L)))
  scenario("between spanning a leap day counts it", g,
    "WITH duration.inDays(date('2020-02-01'), date('2020-03-01')) AS d " +
      "RETURN d.days AS dd",
    rows(Map("dd" -> 29L)))
  scenario("between over several years splits into months then days", g,
    "WITH duration.between(date('1984-10-11'), date('2015-06-24')) AS d " +
      "RETURN d.years AS y, d.monthsofyear AS m, d.days AS dd",
    rows(Map("y" -> 30L, "m" -> 8L, "dd" -> 13L)))
  scenario("inSeconds is negative when the operands are reversed", g,
    "WITH duration.inSeconds(localdatetime('2015-01-02T01:30:00'), " +
      "localdatetime('2015-01-01T23:00:00')) AS d RETURN d.seconds AS s",
    rows(Map("s" -> -9000L)))
  scenario("inDays truncates toward zero in the negative direction", g,
    "WITH duration.inDays(localdatetime('2015-01-02T11:00:00'), " +
      "localdatetime('2015-01-01T12:00:00')) AS d RETURN d.days AS dd",
    rows(Map("dd" -> 0L)))
  scenario("inMonths truncates toward zero in the negative direction", g,
    "WITH duration.inMonths(date('2015-02-27'), date('2015-01-31')) AS d " +
      "RETURN d.months AS m",
    rows(Map("m" -> 0L)))
  scenario("between of datetimes carries sub-second precision", g,
    "WITH duration.between(localdatetime('2015-01-01T00:00:00.500'), " +
      "localdatetime('2015-01-01T00:00:01.700')) AS d " +
      "RETURN d.seconds AS s, d.millisecondsofsecond AS ms",
    rows(Map("s" -> 1L, "ms" -> 200L)))
  scenario("between a selected date and its base is the override delta", g,
    "WITH date('1984-10-11') AS b " +
      "WITH duration.between(b, date({date: b, day: 28})) AS d " +
      "RETURN d.days AS dd",
    rows(Map("dd" -> 17L)))
  scenario("between feeds duration arithmetic", g,
    "WITH duration.between(date('2015-01-01'), date('2015-01-11')) AS d " +
      "RETURN toString(date('2020-01-01') + d) AS x",
    value("2020-01-11"))

  // ============================================ comparison and rendering
  scenario("dates order chronologically in ORDER BY", g,
    "UNWIND [date('2021-06-01'), date('2019-01-01'), date('2020-12-31')] " +
      "AS d RETURN toString(d) AS x ORDER BY d",
    rows(Map("x" -> "2019-01-01"), Map("x" -> "2020-12-31"),
      Map("x" -> "2021-06-01")), ordered = true)
  scenario("min and max aggregate over dates", g,
    "UNWIND [date('2021-06-01'), date('2019-01-01'), date('2020-12-31')] " +
      "AS d RETURN toString(min(d)) AS lo, toString(max(d)) AS hi",
    rows(Map("lo" -> "2019-01-01", "hi" -> "2021-06-01")))
  scenario("a selected date equals its literal spelling", g,
    "RETURN date({date: date('1984-10-11'), day: 28}) = " +
      "date('1984-10-28') AS x",
    value(true))
  scenario("truncated datetimes compare equal to their literal form", g,
    "RETURN datetime.truncate('day', localdatetime('2017-11-27T12:31:14')) " +
      "= localdatetime('2017-11-27T00:00:00') AS x",
    value(true))
  scenario("date inequality drives a CASE branch", g,
    "WITH date('2020-02-29') AS d RETURN " +
      "CASE WHEN d > date('2020-02-28') THEN 'leap' ELSE 'no' END AS x",
    value("leap"))
  scenario("selected localtime equality is exact to the microsecond", g,
    "RETURN localtime({time: localtime('12:31:14.645'), second: 42}) = " +
      "localtime('12:31:42.645') AS x",
    value(true))
  scenario("week-created and calendar-created dates are the same value", g,
    "RETURN date({year: 1984, week: 10, dayOfWeek: 3}) = " +
      "date('1984-03-07') AS x",
    value(true))

  // ================================================ composition round-up
  scenario("select then truncate then accessor chains", g,
    "RETURN (date.truncate('quarter', " +
      "date({date: date('1984-10-11'), month: 12}))).month AS x",
    value(10L))
  scenario("datetime select with only a millisecond override", g,
    "RETURN toString(localdatetime({date: date('2000-01-02'), " +
      "millisecond: 7})) AS x",
    value("2000-01-02T00:00:00.007"))
  scenario("time select with a microsecond override", g,
    "RETURN toString(time({time: time('12:31:14.000001+01:00'), " +
      "microsecond: 9})) AS x",
    value("12:31:14.000009+01:00"))
  scenario("localdatetime.truncate to microsecond is identity", g,
    "RETURN localdatetime.truncate('microsecond', " +
      "localdatetime('2017-11-27T12:31:14.645876')) = " +
      "localdatetime('2017-11-27T12:31:14.645876') AS x",
    value(true))
  scenario("date.truncate year of a leap day", g,
    "RETURN toString(date.truncate('year', date('2020-02-29'))) AS x",
    value("2020-01-01"))
  scenario("quarter-created date exposes the ordinal accessor", g,
    "RETURN (date({year: 1984, quarter: 3, dayOfQuarter: 45})).ordinalday AS x",
    value(227L)) // Aug 14 of leap 1984: 31+29+31+30+31+30+31+13+1
  scenario("between two selected datetimes", g,
    "WITH localdatetime({date: date('2015-03-01'), hour: 6}) AS a, " +
      "localdatetime({date: date('2015-03-02'), hour: 8}) AS b " +
      "WITH duration.between(a, b) AS d " +
      "RETURN d.days AS dd, d.hours AS h",
    rows(Map("dd" -> 1L, "h" -> 2L)))
  scenario("between respects sub-day components of selections", g,
    "WITH duration.inSeconds(localdatetime({date: date('2015-03-01')}), " +
      "localdatetime({date: date('2015-03-01'), minute: 90})) AS d " +
      "RETURN d.minutes AS m",
    rows(Map("m" -> 90L)))
  scenario("week accessor at the year boundary", g,
    // 2016-01-01 is a Friday, ISO week 53 of 2015
    "RETURN (date('2016-01-01')).week AS x", value(53L))
  scenario("selection preserves equality with an independently built value", g,
    "RETURN localdatetime({date: date('1984-10-11'), " +
      "time: localtime('12:31:14')}) = " +
      "localdatetime({year: 1984, month: 10, day: 11, hour: 12, " +
      "minute: 31, second: 14}) AS x",
    value(true))

  // =================================== truncate with an override map
  // (Neo4j's truncate(unit, temporal, {components}) — round 8 closes the
  // "map argument not supported" divergence)
  scenario("datetime.truncate day with an hour override", g,
    "RETURN toString(datetime.truncate('day', " +
      "localdatetime('2017-11-27T12:31:14'), {hour: 12})) AS x",
    value("2017-11-27T12:00:00"))
  scenario("localdatetime.truncate hour with a minute override", g,
    "RETURN toString(localdatetime.truncate('hour', " +
      "localdatetime('2017-11-27T12:31:14'), {minute: 59})) AS x",
    value("2017-11-27T12:59:00"))
  scenario("datetime.truncate year with a day override", g,
    "RETURN toString(datetime.truncate('year', " +
      "localdatetime('2017-11-27T12:31:14'), {day: 5})) AS x",
    value("2017-01-05T00:00:00"))
  scenario("date.truncate month with a day override", g,
    "RETURN toString(date.truncate('month', date('2017-11-27'), " +
      "{day: 15})) AS x",
    value("2017-11-15"))
  scenario("localtime.truncate hour with a minute override", g,
    "RETURN toString(localtime.truncate('hour', " +
      "localtime('12:31:14.645'), {minute: 30})) AS x",
    value("12:30:00"))
  scenario("time.truncate minute with a second override keeps the offset", g,
    "RETURN toString(time.truncate('minute', " +
      "time('12:31:14.645+01:00'), {second: 30})) AS x",
    value("12:31:30+01:00"))
  scenario("truncate override map composes with accessors", g,
    "RETURN (datetime.truncate('week', " +
      "localdatetime('2017-11-30T12:31:14'), {hour: 6})).hour AS x",
    value(6L))
  errorScenario("date.truncate override map rejects time components", g,
    "RETURN date.truncate('month', date('2017-11-27'), {hour: 3}) AS x",
    ArgumentError, InvalidArgumentValue)
  errorScenario("truncate third argument must be a map", g,
    "RETURN datetime.truncate('day', " +
      "localdatetime('2017-11-27T12:31:14'), 5) AS x",
    SyntaxError, InvalidArgumentType)

  // ===================================== duration.between over times
  scenario("between two localtimes is a pure micros duration", g,
    "WITH duration.between(localtime('12:00:00'), " +
      "localtime('13:30:05')) AS d " +
      "RETURN d.hours AS h, d.minutesofhour AS m, d.secondsofminute AS s",
    rows(Map("h" -> 1L, "m" -> 30L, "s" -> 5L)))
  scenario("between localtimes is negative when reversed", g,
    "WITH duration.between(localtime('13:30:00'), localtime('12:00:00')) " +
      "AS d RETURN d.minutes AS m",
    rows(Map("m" -> -90L)))
  scenario("between zoned times compares instants", g,
    // 12:00+01:00 is 11:00Z; 13:00Z is two hours later on the timeline
    "WITH duration.between(time('12:00:00+01:00'), time('13:00:00Z')) AS d " +
      "RETURN d.hours AS h",
    rows(Map("h" -> 2L)))
  scenario("between a localtime and a zoned time (local reads as UTC)", g,
    "WITH duration.between(localtime('10:00:00'), time('11:30:00Z')) AS d " +
      "RETURN d.minutes AS m",
    rows(Map("m" -> 90L)))
  scenario("inDays over times is zero", g,
    "WITH duration.inDays(localtime('01:00:00'), localtime('23:00:00')) " +
      "AS d RETURN d.days AS dd",
    rows(Map("dd" -> 0L)))
  scenario("between times null-propagates", g,
    "RETURN duration.between(localtime('12:00'), null) IS NULL AS x",
    value(true))
  scenario("between times carries sub-second precision", g,
    "WITH duration.between(localtime('12:00:00.250'), " +
      "localtime('12:00:01.750')) AS d " +
      "RETURN d.seconds AS s, d.millisecondsofsecond AS ms",
    rows(Map("s" -> 1L, "ms" -> 500L)))

  // ---- zoned datetime literals (round 8: offsets and zone names
  // normalize to the UTC instant; the zone is not retained — the
  // engine's datetime is session-UTC TimestampType, tck_blacklist.md) --
  scenario("offset literal normalizes to the UTC instant", g,
    "RETURN toString(datetime('2020-01-01T00:00:00+05:00')) AS x",
    value("2019-12-31T19:00:00"))
  scenario("Z literal is the UTC instant", g,
    "RETURN toString(datetime('2020-01-01T00:00:00Z')) AS x",
    value("2020-01-01T00:00:00"))
  scenario("offset literals compare as instants", g,
    "RETURN datetime('2020-01-01T00:00:00+05:00') < " +
      "datetime('2020-01-01T00:00:00Z') AS x", value(true))
  scenario("bracketed zone names resolve DST rules", g,
    "RETURN toString(datetime('2020-06-01T12:00[Europe/Berlin]')) AS x",
    value("2020-06-01T10:00:00"))
  scenario("negative offsets and compact forms", g,
    "RETURN toString(datetime('2020-01-01T00:00-0830')) AS x",
    value("2020-01-01T08:30:00"))
  errorScenario("unknown zone name is a classified error", g,
    "RETURN datetime('2020-01-01T00:00[Mars/Olympus]') AS x",
    ArgumentError, InvalidTemporalValue)

  scenario("epochSeconds and epochMillis accessors", g,
    "RETURN datetime('2020-01-01T00:00:00Z').epochSeconds AS a, " +
      "datetime('1970-01-01T00:00:01Z').epochMillis AS b",
    rows(Map("a" -> 1577836800L, "b" -> 1000L)))
}
