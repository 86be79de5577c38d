package graft

import graft.api.CypherError._

/** TCK-style conformance, part 20 — namespaced temporal functions (closing
  * the "not parsed" divergence recorded in tck_blacklist.md):
  * duration.between / inMonths / inDays / inSeconds over date/datetime
  * operands (calendar-month counting with day-of-month clamping, single
  * whole-unit truncation toward zero, negative direction), the
  * datetime/localdatetime/date.truncate family (unit must be literal;
  * unsupported units are classified errors), and the epoch constructors.
  * Expected values mirror the Neo4j temporal-functions documentation
  * examples where they exist. */
class TckStyleSpec20 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // ------------------------------------------------- duration.between
  scenario("duration.between over dates splits months then days", g,
    "WITH duration.between(date('1984-10-11'), date('1985-11-25')) AS d " +
      "RETURN d.months AS m, d.days AS dd, d.seconds AS s",
    rows(Map("m" -> 13L, "dd" -> 14L, "s" -> 0L)))
  scenario("duration.between reversed is componentwise negative", g,
    "WITH duration.between(date('1985-11-25'), date('1984-10-11')) AS d " +
      "RETURN d.months AS m, d.days AS dd",
    rows(Map("m" -> -13L, "dd" -> -14L)))
  scenario("duration.between month counting clamps day-of-month", g,
    // Jan 31 + 1M = Feb 28 (clamped) fits; +2M = Mar 31 overshoots → 1 month,
    // then Feb 28 12:00 → Mar 30 11:00 is 29 days 23 hours.
    "WITH duration.between(localdatetime('2015-01-31T12:00:00'), " +
      "localdatetime('2015-03-30T11:00:00')) AS d " +
      "RETURN d.months AS m, d.days AS dd, d.hours AS h",
    rows(Map("m" -> 1L, "dd" -> 29L, "h" -> 23L)))
  scenario("duration.between within one day yields a time-only duration", g,
    "WITH duration.between(localdatetime('2015-07-21T21:40:32'), " +
      "localdatetime('2015-07-21T21:45:22')) AS d " +
      "RETURN d.minutes AS m, d.secondsofminute AS s",
    rows(Map("m" -> 4L, "s" -> 50L)))
  scenario("duration.between mixes date and datetime (date = midnight)", g,
    "WITH duration.between(date('2015-07-21'), " +
      "localdatetime('2015-07-21T06:00:00')) AS d RETURN d.hours AS h",
    rows(Map("h" -> 6L)))
  scenario("duration.between null operand is null", g,
    "RETURN duration.between(null, date('2015-07-21')) IS NULL AS x",
    value(true))
  scenario("duration.between same instant is zero", g,
    "WITH duration.between(date('2015-07-21'), date('2015-07-21')) AS d " +
      "RETURN d.months AS m, d.days AS dd, d.seconds AS s",
    rows(Map("m" -> 0L, "dd" -> 0L, "s" -> 0L)))

  // ------------------------------- inMonths / inDays / inSeconds variants
  scenario("duration.inMonths keeps only whole months", g,
    "WITH duration.inMonths(date('1984-10-11'), date('1985-11-25')) AS d " +
      "RETURN d.months AS m, d.days AS dd",
    rows(Map("m" -> 13L, "dd" -> 0L)))
  scenario("duration.inDays keeps only whole days", g,
    "WITH duration.inDays(date('1984-10-11'), date('1985-11-25')) AS d " +
      "RETURN d.days AS dd, d.months AS m",
    rows(Map("dd" -> 410L, "m" -> 0L)))
  scenario("duration.inDays truncates a partial day toward zero", g,
    "WITH duration.inDays(localdatetime('2015-01-01T12:00:00'), " +
      "localdatetime('2015-01-02T11:00:00')) AS d RETURN d.days AS dd",
    rows(Map("dd" -> 0L)))
  scenario("duration.inSeconds spans day boundaries as seconds", g,
    "WITH duration.inSeconds(localdatetime('2015-01-01T23:00:00'), " +
      "localdatetime('2015-01-02T01:30:00')) AS d RETURN d.seconds AS s",
    rows(Map("s" -> 9000L)))
  scenario("duration.inSeconds of a date pair counts whole days in seconds", g,
    "WITH duration.inSeconds(date('2015-01-01'), date('2015-01-03')) AS d " +
      "RETURN d.seconds AS s, d.days AS dd",
    rows(Map("s" -> 172800L, "dd" -> 0L)))
  scenario("duration.inMonths truncates below one month to zero", g,
    "WITH duration.inMonths(date('2015-01-31'), date('2015-02-27')) AS d " +
      "RETURN d.months AS m", rows(Map("m" -> 0L)))

  // ------------------------------------------------- truncate family
  scenario("datetime.truncate to month", g,
    "RETURN toString(datetime.truncate('month', " +
      "localdatetime('2017-11-27T12:31:14'))) AS x",
    value("2017-11-01T00:00:00"))
  scenario("datetime.truncate to day", g,
    "RETURN toString(datetime.truncate('day', " +
      "localdatetime('2017-11-27T12:31:14'))) AS x",
    value("2017-11-27T00:00:00"))
  scenario("datetime.truncate to hour", g,
    "RETURN toString(localdatetime.truncate('hour', " +
      "localdatetime('2017-11-27T12:31:14'))) AS x",
    value("2017-11-27T12:00:00"))
  scenario("datetime.truncate to year", g,
    "RETURN toString(datetime.truncate('year', " +
      "localdatetime('2017-11-27T12:31:14'))) AS x",
    value("2017-01-01T00:00:00"))
  scenario("date.truncate to week lands on Monday", g,
    // 2017-11-30 is a Thursday; the ISO week starts Monday 2017-11-27.
    "RETURN toString(date.truncate('week', date('2017-11-30'))) AS x",
    value("2017-11-27"))
  scenario("date.truncate to quarter", g,
    "RETURN toString(date.truncate('quarter', date('2017-11-30'))) AS x",
    value("2017-10-01"))
  scenario("date.truncate yields a date usable in date arithmetic", g,
    "RETURN (date.truncate('month', date('2017-11-30'))).day AS x",
    value(1L))
  scenario("truncate of a null temporal is null", g,
    "RETURN datetime.truncate('day', null) IS NULL AS x", value(true))

  errorScenario("truncate unit must be a literal string", g,
    "MATCH (a:A) RETURN datetime.truncate(a.name, date('2017-11-30')) AS x",
    ArgumentError, InvalidArgumentType)

  // decade/century/millennium are implemented since r13 (TckStyleSpec68);
  // weekYear remains the classified refusal.
  errorScenario("truncate rejects units Spark cannot express", g,
    "RETURN datetime.truncate('weekYear', date('2017-11-30')) AS x",
    ArgumentError, InvalidArgumentValue)

  // ------------------------------------------------- epoch constructors
  scenario("datetime.fromepochmillis", g,
    "RETURN toString(datetime.fromepochmillis(424797300000)) AS x",
    value("1983-06-18T15:15:00"))
  scenario("datetime.fromepoch with nanoseconds", g,
    "RETURN toString(datetime.fromepoch(1, 900000000)) AS x",
    value("1970-01-01T00:00:01.9"))
  scenario("datetime.fromepoch seconds only", g,
    "RETURN (datetime.fromepoch(86400)).day AS x", value(2L))

  // namespaced call on a computed operand keeps working inside pipelines
  scenario("duration.between composes with WITH-bound temporals", g,
    "WITH date('2015-01-01') AS a, date('2016-03-01') AS b " +
      "WITH duration.between(a, b) AS d RETURN d.months AS m, d.days AS dd",
    rows(Map("m" -> 14L, "dd" -> 0L)))
}
