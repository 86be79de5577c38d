package graft

import graft.api.CypherError

/** TCK-style conformance, part 29 — boundary mass for list access
  * (negative/overflow indexes, open/degenerate slices, null operands),
  * range() direction rules, string-function edges (substring/left/right
  * overflow, split corner cases, toString forms), ORDER BY over aggregate
  * aliases, aggregate empty-input boundaries (percentile 0/1, collect of
  * nulls, min/max over strings), temporal end-of-month clamping in
  * date + duration arithmetic, CASE null-subject rules, and self-loop /
  * undirected multi-type pattern edges. */
class TckStyleSpec29 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("A"), Map("name" -> "c", "num" -> 2)),
      N(4, Set("B"), Map("name" -> "d"))),
    Seq(
      R(10, 1, 2, "T"),
      R(11, 2, 3, "T"),
      R(12, 1, 3, "S")))

  /** chain p1 -W{w:1}-> p2 -W{w:2}-> p3 */
  lazy val gRelProps = graph(spark,
    Seq(N(1, Set("P"), Map("name" -> "p1")), N(2, Set("P"), Map("name" -> "p2")),
      N(3, Set("P"), Map("name" -> "p3"))),
    Seq(R(30, 1, 2, "W", Map("w" -> 1)), R(31, 2, 3, "W", Map("w" -> 2))))

  lazy val gLoop = graph(spark,
    Seq(N(1, Set("L"), Map("name" -> "self")),
      N(2, Set("L"), Map("name" -> "other"))),
    Seq(R(20, 1, 1, "T"), R(21, 1, 2, "T")))

  // ------------------------------------------------ list index boundaries
  scenario("negative index counts from the end", g,
    "RETURN [1,2,3][-1] AS x", value(3L))
  scenario("negative index to the first element", g,
    "RETURN [1,2,3][-3] AS x", value(1L))
  scenario("negative index past the front is null", g,
    "RETURN [1,2,3][-4] AS x", value(null))
  scenario("index past the end is null", g,
    "RETURN [1,2,3][3] AS x", value(null))
  scenario("index into an empty list is null", g,
    "RETURN [][0] AS x", value(null))
  scenario("null index yields null", g,
    "WITH [1,2,3] AS xs, null AS i RETURN xs[i] AS x", value(null))
  scenario("indexing a null list yields null", g,
    "WITH null AS xs RETURN xs[0] AS x", value(null))
  scenario("nested list double index", g,
    "RETURN [[1,2],[3,4]][1][0] AS x", value(3L))

  // ------------------------------------------------ list slice boundaries
  scenario("open-ended slice from an index", g,
    "RETURN [1,2,3,4][1..] AS x", value(List(2L, 3L, 4L)))
  scenario("open-start slice to an index", g,
    "RETURN [1,2,3,4][..2] AS x", value(List(1L, 2L)))
  scenario("slice end past the length truncates", g,
    "RETURN [1,2,3][1..10] AS x", value(List(2L, 3L)))
  scenario("negative-start slice", g,
    "RETURN [1,2,3,4][-2..] AS x", value(List(3L, 4L)))
  scenario("negative-end slice", g,
    "RETURN [1,2,3,4][..-1] AS x", value(List(1L, 2L, 3L)))
  scenario("degenerate slice start = end is empty", g,
    "RETURN [1,2,3][1..1] AS x", value(List.empty[Long]))
  scenario("inverted slice is empty", g,
    "RETURN [1,2,3][2..1] AS x", value(List.empty[Long]))
  scenario("slice of a null list is null", g,
    "WITH null AS xs RETURN xs[0..1] AS x", value(null))
  scenario("null slice bound yields null", g,
    "WITH [1,2,3] AS xs, null AS i RETURN xs[i..2] AS x", value(null))

  // ------------------------------------------------ range() direction
  scenario("range is end-inclusive", g,
    "RETURN range(1, 3) AS x", value(List(1L, 2L, 3L)))
  scenario("range with step lands on the last reachable value", g,
    "RETURN range(1, 6, 2) AS x", value(List(1L, 3L, 5L)))
  scenario("descending range needs a negative step", g,
    "RETURN range(5, 1, -2) AS x", value(List(5L, 3L, 1L)))
  scenario("start past end with positive step is empty", g,
    "RETURN range(4, 1) AS x", value(List.empty[Long]))
  scenario("start before end with negative step is empty", g,
    "RETURN range(1, 4, -1) AS x", value(List.empty[Long]))
  scenario("single-point range", g,
    "RETURN range(3, 3) AS x", value(List(3L)))

  // ------------------------------------------------ string function edges
  scenario("substring from an offset to the end", g,
    "RETURN substring('hello', 1) AS x", value("ello"))
  scenario("substring with zero length is empty", g,
    "RETURN substring('hello', 2, 0) AS x", value(""))
  scenario("substring length past the end truncates", g,
    "RETURN substring('hello', 3, 10) AS x", value("lo"))
  scenario("left longer than the string returns it all", g,
    "RETURN left('abc', 10) AS x", value("abc"))
  scenario("right zero is empty", g,
    "RETURN right('abc', 0) AS x", value(""))
  scenario("split on a separator not present returns one part", g,
    "RETURN split('abc', 'x') AS x", value(List("abc")))
  scenario("split keeps empty parts between adjacent separators", g,
    "RETURN split('a,,b', ',') AS x", value(List("a", "", "b")))
  scenario("toString of a boolean", g,
    "RETURN toString(true) AS x", value("true"))
  scenario("toString of a float keeps the decimal point", g,
    "RETURN toString(1.5) AS x", value("1.5"))
  scenario("toUpper of null is null", g,
    "RETURN toUpper(null) AS x", value(null))
  scenario("replace every occurrence", g,
    "RETURN replace('aaa', 'a', 'b') AS x", value("bbb"))
  scenario("replace with empty replacement deletes", g,
    "RETURN replace('banana', 'a', '') AS x", value("bnn"))

  // ------------------------------------------------ ORDER BY + aggregates
  scenario("order by an aggregate alias after RETURN", g,
    "MATCH (n:A) RETURN n.num AS k, count(*) AS c ORDER BY c DESC, k",
    rows(Map("k" -> 2L, "c" -> 2L), Map("k" -> 1L, "c" -> 1L)),
    ordered = true)
  scenario("order by the aggregate expression itself", g,
    "MATCH (n:A) RETURN n.num AS k, count(*) AS c ORDER BY count(*) DESC, k",
    rows(Map("k" -> 2L, "c" -> 2L), Map("k" -> 1L, "c" -> 1L)),
    ordered = true)
  scenario("order by an expression over a projected alias", g,
    "MATCH (n:A) WITH n.num AS v ORDER BY -v LIMIT 1 RETURN v AS x",
    value(2L))

  // ------------------------------------------------ aggregate boundaries
  scenario("percentileCont at 0 is the minimum", g,
    "MATCH (n:A) RETURN percentileCont(n.num, 0.0) AS x", value(1.0))
  scenario("percentileCont at 1 is the maximum", g,
    "MATCH (n:A) RETURN percentileCont(n.num, 1.0) AS x", value(2.0))
  scenario("percentileDisc at 0 is the minimum", g,
    "MATCH (n:A) RETURN percentileDisc(n.num, 0.0) AS x", value(1L))
  scenario("percentileDisc at 1 is the maximum", g,
    "MATCH (n:A) RETURN percentileDisc(n.num, 1.0) AS x", value(2L))
  scenario("collect skips nulls entirely", g,
    "UNWIND [1, null, 2, null] AS v RETURN collect(v) AS x",
    value(List(1L, 2L)))
  scenario("collect over only nulls is the empty list", g,
    "UNWIND [null, null] AS v RETURN collect(v) AS x",
    value(List.empty[Long]))
  scenario("count of a null expression is 0", g,
    "UNWIND [null, null] AS v RETURN count(v) AS x", value(0L))
  scenario("min over strings is lexicographic", g,
    "MATCH (n:A) RETURN min(n.name) AS x", value("a"))
  scenario("max over strings is lexicographic", g,
    "MATCH (n:A) RETURN max(n.name) AS x", value("c"))
  scenario("avg over no rows is null", g,
    "MATCH (n:A) WHERE n.num > 99 RETURN avg(n.num) AS x", value(null))

  // ------------------------------------------------ temporal clamping
  scenario("leap-day + 1 year clamps to Feb 28", g,
    "RETURN toString(date('2024-02-29') + duration({years: 1})) AS x",
    value("2025-02-28"))
  scenario("Jan 31 + 1 month clamps to the leap Feb end", g,
    "RETURN toString(date('2024-01-31') + duration({months: 1})) AS x",
    value("2024-02-29"))
  scenario("Mar 31 - 1 month clamps to Feb end", g,
    "RETURN toString(date('2023-03-31') - duration({months: 1})) AS x",
    value("2023-02-28"))
  scenario("month arithmetic then days applies in that order", g,
    "RETURN toString(date('2024-01-31') + duration({months: 1, days: 1})) AS x",
    value("2024-03-01"))

  // ------------------- float division (IEEE-754, Neo4j — since round 10)
  scenario("division by float zero is IEEE Infinity", g,
    "RETURN toString(1.0 / 0.0) AS x", value("Infinity"))
  scenario("negative over float zero is -Infinity", g,
    "RETURN toString(-1.0 / 0.0) AS x", value("-Infinity"))
  scenario("zero over zero is NaN", g,
    "RETURN toString(0.0 / 0.0) AS x", value("NaN"))
  scenario("null numerator over float zero stays null", g,
    "RETURN (null / 0.0) IS NULL AS x", value(true))
  scenario("float modulo by zero is NaN", g,
    "RETURN toString(1.5 % 0.0) AS x", value("NaN"))
  errorScenario("integer division by literal zero raises", g,
    "RETURN 1 / 0 AS x", CypherError.ArithmeticError, CypherError.DivisionByZero)
  errorScenario("integer modulo by literal zero raises", g,
    "RETURN 1 % 0 AS x", CypherError.ArithmeticError, CypherError.DivisionByZero)
  scenario("negative base fractional power is NaN (IEEE kept elsewhere)", g,
    "RETURN toString((-2.0) ^ 0.5) AS x", value("NaN"))
  scenario("float modulo", g,
    "RETURN 5 % 2.5 AS x", value(0.0))
  scenario("isNaN detects NaN, rejects ordinary floats, propagates null", g,
    "RETURN isNaN((-2.0) ^ 0.5) AS a, isNaN(1.5) AS b, isNaN(null) AS c",
    rows(Map("a" -> true, "b" -> false, "c" -> null)))

  // ------------------------------------------------ CASE null rules
  scenario("null subject falls through to ELSE (null = null is not true)", g,
    "WITH null AS v RETURN CASE v WHEN null THEN 'matched' ELSE 'else' END AS x",
    value("else"))
  scenario("searched CASE without ELSE yields null on no match", g,
    "RETURN CASE WHEN 1 > 2 THEN 'yes' END AS x", value(null))

  // ------------------------- entity lambdas over var-length rel binders
  // (fixed in round 7: `r` from -[r:T*..]- IS a relationship list, but
  // lambdas reading rel properties off it failed analysis — only
  // relationships(p) was materialized to entity structs)
  scenario("all() over a var-length binder reads rel properties", gRelProps,
    "MATCH (a)-[r:W*1..2]->(b) WHERE all(e IN r WHERE e.w > 0) RETURN count(*) AS x",
    value(3L))
  scenario("reduce() over a var-length binder sums rel properties", gRelProps,
    "MATCH (a {name: 'p1'})-[r:W*2..2]->(b) RETURN reduce(s = 0, e IN r | s + e.w) AS x",
    value(3L))
  scenario("comprehension over a var-length binder projects properties", gRelProps,
    "MATCH (a {name: 'p1'})-[r:W*2..2]->(b) RETURN [e IN r | e.w] AS x",
    value(List(1L, 2L)))
  scenario("type() of a var-length binder element", gRelProps,
    "MATCH (a {name: 'p1'})-[r:W*1..1]->(b) RETURN any(e IN r WHERE type(e) = 'W') AS x",
    value(true))
  scenario("bare var-length binder still means the id list", gRelProps,
    "MATCH (a {name: 'p1'})-[r:W*2..2]->(b) RETURN size(r) AS x",
    value(2L))

  // ------------------------------------------------ pattern edges
  scenario("self-loop matches the (a)-[r]->(a) shape", gLoop,
    "MATCH (a)-[r:T]->(a) RETURN a.name AS x", value("self"))
  scenario("self-loop is not duplicated by an undirected match", gLoop,
    "MATCH (a {name: 'self'})-[r:T]-(a) RETURN count(*) AS x", value(1L))
  scenario("undirected multi-type counts both types and directions", g,
    "MATCH (n {name: 'a'})-[r:T|S]-() RETURN count(*) AS x", value(2L))
}
