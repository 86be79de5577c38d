package graft

/** TCK-style conformance, part 46 — pins for behavior verified by the
  * round-9 Dev probe sweep that no earlier part asserts directly:
  * ISO week-year accessors at year boundaries, epoch accessors on zoned
  * datetimes, duration component arithmetic, cross-type temporal
  * comparison (null), and time-of-day offset accessors. */
class TckStyleSpec46 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // ---- ISO week fields at year boundaries
  scenario("weekYear of an early-January date belongs to the prior ISO year", g,
    // 2021-01-01 is a Friday of ISO week 53 of weekYear 2020.
    "RETURN date('2021-01-01').weekYear AS x", value(2020L))
  scenario("week of the same date is 53", g,
    "RETURN date('2021-01-01').week AS x", value(53L))
  scenario("weekYear stays current mid-year", g,
    "RETURN date('2020-06-15').weekYear AS x", value(2020L))

  // ---- epoch accessors
  scenario("epochSeconds of a zoned datetime", g,
    "RETURN datetime('2015-06-24T12:50:35.556+01:00').epochSeconds AS x",
    value(1435146635L))
  scenario("epochMillis keeps the milliseconds", g,
    "RETURN datetime('2015-07-21T21:40:32.142+01:00').epochMillis AS x",
    value(1437511232142L))

  // ---- duration +/-/* component arithmetic (per-group, no conversion)
  scenario("duration addition is componentwise", g,
    "RETURN toString(duration('P1M') + duration('P1D')) AS x",
    value("P1M1D"))
  scenario("duration subtraction may go negative per component", g,
    "RETURN toString(duration('P1M') - duration('P1D')) AS x",
    value("P1M-1D"))
  scenario("integer scaling is exact", g,
    "RETURN toString(duration('P2DT3H') * 3) AS x", value("P6DT9H"))

  // ---- mixed-operand duration.between
  scenario("duration.between over mixed date and localdatetime", g,
    "RETURN duration.between(localdatetime('2020-01-01T00:00:00'), " +
      "date('2020-03-01')).months AS x", value(2L))
  scenario("negative direction flips the sign", g,
    "RETURN duration.between(date('2020-03-01'), " +
      "localdatetime('2020-01-01T10:00:00')).days AS x", value(-30L))

  // ---- cross-type temporal comparison is null
  scenario("date < datetime is null (incomparable types)", g,
    "RETURN (date('2020-01-01') < datetime('2020-01-01T10:00:00Z')) " +
      "IS NULL AS x", value(true))

  // ---- time offset accessors
  scenario("offset renders as a string", g,
    "RETURN time('12:31:14+01:00').offset AS x", value("+01:00"))
  scenario("offsetMinutes and offsetSeconds", g,
    "RETURN time('12:31:14+01:00').offsetMinutes AS m, " +
      "time('12:31:14+01:00').offsetSeconds AS s",
    rows(Map("m" -> 60L, "s" -> 3600L)))
  scenario("hour accessor reads the local clock, not UTC", g,
    "RETURN time('12:31:14+01:00').hour AS x", value(12L))

  // ---- misc pinned probe results
  scenario("unary minus binds looser than exponentiation", g,
    "RETURN -2 ^ 2 AS x", value(-4.0))
  scenario("list concatenation with +", g,
    "RETURN [1, 2] + [3] AS x", Seq(Map("x" -> List(1, 2, 3))))
  scenario("range with negative step", g,
    "RETURN range(10, 0, -3) AS x", Seq(Map("x" -> List(10, 7, 4, 1))))
}
