package graft

/** TCK-style conformance, part 9 — temporal accessor breadth, math /
  * bitwise / conversion function matrices, string and list function edges,
  * null propagation, aggregation breadth, ORDER BY null placement, and
  * SKIP/LIMIT boundaries (see TckStyleSpec for why these are
  * hand-authored). */
class TckStyleSpec9 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c"))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 2, 3, "KNOWS", Map("since" -> 2012)),
      R(12, 1, 3, "LIKES")))

  private def errors(query: String, fragment: String = ""): Unit = {
    val e = intercept[Exception](session.cypher(g, query).collect())
    if (fragment.nonEmpty)
      assert(e.getMessage.toLowerCase.contains(fragment.toLowerCase),
        s"expected '$fragment' in: ${e.getMessage}")
  }

  // ======================================== temporal accessor breadth
  scenario("dayOfWeek is ISO (Monday = 1)", g,
    "RETURN date('2015-07-20').dayOfWeek AS x", value(1))
  scenario("dayOfWeek of a Tuesday", g,
    "RETURN date('2015-07-21').dayOfWeek AS x", value(2))
  scenario("weekday aliases dayOfWeek", g,
    "RETURN date('2015-07-26').weekday AS x", value(7))
  scenario("ordinalDay counts from January 1", g,
    "RETURN date('2015-07-21').ordinalDay AS x", value(202))
  scenario("quarter accessor", g,
    "RETURN date('2015-07-21').quarter AS x", value(3))
  scenario("dayOfQuarter accessor", g,
    "RETURN date('2015-07-21').dayOfQuarter AS x", value(21))
  scenario("week accessor", g,
    "RETURN date('2015-07-21').week AS x", value(30))
  scenario("localdatetime minute and second accessors", g,
    "WITH localdatetime('2020-06-01T12:34:56') AS t " +
      "RETURN t.minute AS m, t.second AS s",
    rows(Map("m" -> 34, "s" -> 56)))
  scenario("localdatetime millisecond accessor", g,
    "RETURN localdatetime('2020-06-01T12:34:56.789').millisecond AS x",
    value(789))
  scenario("date equality and ordering", g,
    "RETURN date('2020-01-01') < date('2020-01-02') AS x", value(true))
  scenario("dates order naturally", g,
    "UNWIND [date('2021-05-05'), date('2019-01-01'), date('2020-12-31')] AS d " +
      "RETURN toString(d) AS x ORDER BY d",
    rows(Map("x" -> "2019-01-01"), Map("x" -> "2020-12-31"),
      Map("x" -> "2021-05-05")), ordered = true)
  scenario("min over dates", g,
    "UNWIND [date('2021-05-05'), date('2019-01-01')] AS d " +
      "RETURN toString(min(d)) AS x", value("2019-01-01"))
  scenario("duration quarters accessor", g,
    "RETURN duration('P14M').quarters AS x", value(4))
  scenario("duration monthsOfQuarter remainder", g,
    "RETURN duration('P14M').monthsOfQuarter AS x", value(2))
  scenario("duration quartersOfYear remainder", g,
    "RETURN duration('P14M').quartersOfYear AS x", value(0))
  scenario("leap-week year has week 53", g,
    "RETURN date('2015-12-31').week AS x", value(53))
  scenario("january 1 can fall in last year's ISO week", g,
    "RETURN date('2016-01-01').week AS x", value(53))

  // ============================== math / bitwise / conversion functions
  scenario("sign of negative, zero, positive", g,
    "RETURN sign(-5) AS a, sign(0) AS b, sign(7) AS c",
    rows(Map("a" -> -1, "b" -> 0, "c" -> 1)))
  scenario("ceil and floor return floats", g,
    "RETURN ceil(1.1) AS a, floor(1.9) AS b",
    rows(Map("a" -> 2.0, "b" -> 1.0)))
  scenario("round to decimal places", g,
    "RETURN round(3.456, 2) AS x", value(3.46))
  scenario("degrees of pi", g,
    "RETURN round(degrees(pi()), 6) AS x", value(180.0))
  scenario("radians round-trips degrees", g,
    "RETURN round(degrees(radians(90.0)), 6) AS x", value(90.0))
  scenario("sqrt of a perfect square", g,
    "RETURN sqrt(16) AS x", value(4.0))
  scenario("log of e is one", g,
    "RETURN round(log(e()), 10) AS x", value(1.0))
  scenario("exp of zero is one", g,
    "RETURN exp(0) AS x", value(1.0))
  scenario("haversin of zero", g,
    "RETURN haversin(0) AS x", value(0.0))
  scenario("shiftLeft and shiftRight functions", g,
    "RETURN shiftLeft(1, 3) AS a, shiftRight(16, 2) AS b",
    rows(Map("a" -> 8, "b" -> 4)))
  scenario("bitwise and / or / xor functions", g,
    "RETURN bitwiseAnd(6, 3) AS a, bitwiseOr(4, 1) AS b, bitwiseXor(5, 3) AS c",
    rows(Map("a" -> 2, "b" -> 5, "c" -> 6)))
  scenario("toInteger parses and rejects", g,
    "RETURN toInteger('42') AS a, toInteger('abc') AS b",
    rows(Map("a" -> 42, "b" -> null)))
  scenario("toFloat parses", g,
    "RETURN toFloat('2.5') AS x", value(2.5))
  scenario("toBoolean strict parse", g,
    "RETURN toBoolean('true') AS a, toBoolean('yes') AS b",
    rows(Map("a" -> true, "b" -> null)))
  scenario("toString of primitives", g,
    "RETURN toString(123) AS a, toString(true) AS b, toString(1.5) AS c",
    rows(Map("a" -> "123", "b" -> "true", "c" -> "1.5")))
  scenario("abs of null is null", g,
    "RETURN abs(null) AS x", Seq(Map("x" -> null)))

  // =============================================== string function edges
  scenario("replace all occurrences", g,
    "RETURN replace('hello', 'l', 'L') AS x", value("heLLo"))
  scenario("replace with empty target deletes", g,
    "RETURN replace('banana', 'a', '') AS x", value("bnn"))
  scenario("reverse a string", g,
    "RETURN reverse('abc') AS x", value("cba"))
  scenario("trim both ends", g,
    "RETURN trim('  x  ') AS x", value("x"))
  scenario("left and right of a word", g,
    "RETURN left('hello', 2) AS a, right('hello', 2) AS b",
    rows(Map("a" -> "he", "b" -> "lo")))
  scenario("split into a list", g,
    "RETURN split('a,b,c', ',') AS x", Seq(Map("x" -> List("a", "b", "c"))))
  scenario("size of a string counts characters", g,
    "RETURN size('hello') AS x", value(5))
  scenario("string concatenation with null is null", g,
    "RETURN 'a' + null AS x", Seq(Map("x" -> null)))
  scenario("contains empty string is true", g,
    "RETURN 'abc' CONTAINS '' AS x", value(true))
  scenario("starts with empty string is true", g,
    "RETURN 'abc' STARTS WITH '' AS x", value(true))
  scenario("upper and lower of mixed case", g,
    "RETURN toUpper('MiXeD') AS a, toLower('MiXeD') AS b",
    rows(Map("a" -> "MIXED", "b" -> "mixed")))
  scenario("toUpper of null is null", g,
    "RETURN toUpper(null) AS x", Seq(Map("x" -> null)))

  // ================================================== list function edges
  scenario("range with positive step", g,
    "RETURN range(1, 10, 3) AS x", Seq(Map("x" -> List(1L, 4L, 7L, 10L))))
  scenario("range with negative step", g,
    "RETURN range(10, 1, -3) AS x", Seq(Map("x" -> List(10L, 7L, 4L, 1L))))
  scenario("range of a single point", g,
    "RETURN range(1, 1) AS x", Seq(Map("x" -> List(1L))))
  scenario("tail drops the head", g,
    "RETURN tail([1, 2, 3]) AS x", Seq(Map("x" -> List(2L, 3L))))
  scenario("tail of empty list is empty", g,
    "RETURN tail([]) AS x", Seq(Map("x" -> List())))
  scenario("head and last of empty list are null", g,
    "RETURN head([]) AS a, last([]) AS b",
    rows(Map("a" -> null, "b" -> null)))
  scenario("list slice", g,
    "RETURN [1, 2, 3, 4][1..3] AS x", Seq(Map("x" -> List(2L, 3L))))
  scenario("list concatenation", g,
    "RETURN [1, 2] + [3, 4] AS x", Seq(Map("x" -> List(1L, 2L, 3L, 4L))))
  scenario("size counts elements not depth", g,
    "RETURN size([[1], [2, 3]]) AS x", value(2))
  scenario("nested list indexing", g,
    "RETURN [[1, 2], [3]][0][1] AS x", value(2))
  scenario("IN matches whole nested lists", g,
    "RETURN [1, 2] IN [[1, 2], [3]] AS x", value(true))
  scenario("reduce sums a list", g,
    "RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS x", value(6))
  scenario("comprehension with filter and projection", g,
    "RETURN [x IN range(1, 6) WHERE x % 2 = 0 | x * 10] AS x",
    Seq(Map("x" -> List(20L, 40L, 60L))))
  scenario("size of null is null", g,
    "RETURN size(null) AS x", Seq(Map("x" -> null)))

  // ============================================== aggregation breadth
  scenario("count DISTINCT collapses duplicates", g,
    "UNWIND [1, 1, 2, 2, 3] AS x RETURN count(DISTINCT x) AS x", value(3))
  scenario("sum DISTINCT sums unique values", g,
    "UNWIND [1, 1, 2, 2, 3] AS x RETURN sum(DISTINCT x) AS x", value(6))
  scenario("collect DISTINCT size", g,
    "UNWIND [1, 1, 2] AS x RETURN size(collect(DISTINCT x)) AS x", value(2))
  scenario("avg of integers is a float", g,
    "UNWIND [1, 2] AS x RETURN avg(x) AS x", value(1.5))
  scenario("min and max over strings are lexicographic", g,
    "UNWIND ['pear', 'apple', 'fig'] AS s RETURN min(s) AS a, max(s) AS b",
    rows(Map("a" -> "apple", "b" -> "pear")))
  scenario("aggregates ignore nulls", g,
    "UNWIND [1, null, 3] AS x RETURN count(x) AS c, sum(x) AS s, min(x) AS m",
    rows(Map("c" -> 2, "s" -> 4, "m" -> 1)))
  scenario("percentileCont median of four", g,
    "UNWIND [1, 2, 3, 4] AS x RETURN percentileCont(x, 0.5) AS x", value(2.5))
  scenario("count star counts null rows too", g,
    "UNWIND [1, null] AS x RETURN count(*) AS x", value(2))

  // ================================= ORDER BY nulls and SKIP/LIMIT edges
  scenario("ascending order puts nulls last", g,
    "UNWIND [3, null, 1] AS x RETURN x ORDER BY x",
    rows(Map("x" -> 1), Map("x" -> 3), Map("x" -> null)), ordered = true)
  scenario("descending order puts nulls first", g,
    "UNWIND [3, null, 1] AS x RETURN x ORDER BY x DESC",
    rows(Map("x" -> null), Map("x" -> 3), Map("x" -> 1)), ordered = true)
  scenario("SKIP past the end yields nothing", g,
    "UNWIND [1, 2] AS x RETURN x SKIP 5", Seq.empty)
  scenario("LIMIT 0 yields nothing", g,
    "UNWIND [1, 2] AS x RETURN x LIMIT 0", Seq.empty)
  scenario("ORDER BY a computed key then value", g,
    "UNWIND [1, 2, 3, 4] AS x RETURN x ORDER BY x % 2, x",
    rows(Map("x" -> 2), Map("x" -> 4), Map("x" -> 1), Map("x" -> 3)),
    ordered = true)
  scenario("SKIP and LIMIT page through ordered rows", g,
    "UNWIND [5, 1, 4, 2, 3] AS x RETURN x ORDER BY x SKIP 1 LIMIT 2",
    rows(Map("x" -> 2), Map("x" -> 3)), ordered = true)

  // =========================================== null / three-valued logic
  scenario("arithmetic with null is null", g,
    "RETURN (null + 1) AS a, (null * 0) AS b",
    rows(Map("a" -> null, "b" -> null)))
  scenario("comparison with null is null, filtered out", g,
    "UNWIND [1, null, 3] AS x WITH x WHERE x > 0 RETURN count(*) AS x",
    value(2))
  scenario("IN over a list containing null can be null", g,
    "RETURN (4 IN [1, null]) IS NULL AS x", value(true))
  scenario("coalesce picks the first non-null", g,
    "RETURN coalesce(null, null, 7, 9) AS x", value(7))
  scenario("CASE with null subject falls to else", g,
    "RETURN CASE null WHEN 1 THEN 'one' ELSE 'other' END AS x",
    value("other"))

  // ================================================ error classification
  test("[err] aggregate in WHERE") {
    errors("MATCH (n) WHERE count(n) > 0 RETURN n.name AS x")
  }
  test("[err] ORDER BY on an unknown variable") {
    errors("MATCH (n) RETURN n.name AS x ORDER BY zz")
  }
  test("[err] range step of zero") {
    errors("RETURN range(1, 5, 0) AS x")
  }
}
