package graft

/** TCK-style conformance, part 27 — aggregation boundary semantics (TCK
  * expressions/aggregation): percentile bounds and interpolation,
  * null-skipping in count/collect/avg/count(DISTINCT), string min/max,
  * numeric widening in avg/sum, stDev/stDevP degenerate inputs (single
  * value and empty input are 0 per Neo4j — fixed in round 7, Spark's
  * stddev returns null there), and global aggregates over zero rows. */
class TckStyleSpec27 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a", "num" -> 1))),
    Seq.empty)

  // ------------------------------------------------- percentile bounds
  scenario("percentileCont at 0.0 is the minimum", g,
    "UNWIND [1, 2, 3, 4] AS v RETURN percentileCont(v, 0.0) AS x",
    value(1.0))
  scenario("percentileCont at 1.0 is the maximum", g,
    "UNWIND [1, 2, 3, 4] AS v RETURN percentileCont(v, 1.0) AS x",
    value(4.0))
  scenario("percentileCont interpolates between elements", g,
    "UNWIND [1, 2, 3, 4] AS v RETURN percentileCont(v, 0.5) AS x",
    value(2.5))
  scenario("percentileCont interpolates fractionally", g,
    "UNWIND [1, 2] AS v RETURN percentileCont(v, 0.25) AS x", value(1.25))

  // ------------------------------------------------- null skipping
  scenario("count(expr) skips nulls, count(*) does not", g,
    "UNWIND [1, null, 3] AS v RETURN count(v) AS n, count(*) AS m",
    rows(Map("n" -> 2L, "m" -> 3L)))
  scenario("collect skips nulls", g,
    "UNWIND [1, null, 3] AS v RETURN collect(v) AS x",
    value(Seq(1L, 3L)))
  scenario("avg skips nulls", g,
    "UNWIND [1, null, 3] AS v RETURN avg(v) AS x", value(2.0))
  scenario("count DISTINCT skips nulls and dedups", g,
    "UNWIND [1, 1, null] AS v RETURN count(DISTINCT v) AS x", value(1L))

  // ------------------------------------------------- type behavior
  scenario("min orders strings lexicographically", g,
    "UNWIND ['b', 'a'] AS v RETURN min(v) AS x", value("a"))
  scenario("max orders strings lexicographically", g,
    "UNWIND ['b', 'a'] AS v RETURN max(v) AS x", value("b"))
  scenario("avg of integers is a float", g,
    "UNWIND [1, 2] AS v RETURN avg(v) AS x", value(1.5))
  scenario("sum widens over mixed numerics", g,
    "UNWIND [1, 2.5] AS v RETURN sum(v) AS x", value(3.5))
  scenario("min widens over mixed numerics", g,
    "UNWIND [2, 1.5] AS v RETURN min(v) AS x", value(1.5))

  // ------------------------------------------------- stDev degenerate inputs
  scenario("stDev of a single value is zero", g,
    "UNWIND [1] AS v RETURN stDev(v) AS x", value(0.0))
  scenario("stDevP of a single value is zero", g,
    "UNWIND [1] AS v RETURN stDevP(v) AS x", value(0.0))
  scenario("stDev over no rows is zero", g,
    "MATCH (n:Zzz) RETURN stDev(n.num) AS x", value(0.0))

  // --------------------------------------- round ties toward +infinity
  // (Neo4j docs for 1-arg round; fixed round 7 — Spark's HALF_UP gave
  // -3.0 for round(-2.5). The precision form round(v, p) stays HALF_UP,
  // Neo4j's default mode for it.)
  scenario("round ties toward positive infinity", g,
    "RETURN round(-2.5) AS x", value(-2.0))
  scenario("round of negative half is zero", g,
    "RETURN round(-0.5) AS x", value(0.0))
  scenario("round of positive half still rounds up", g,
    "RETURN round(2.5) AS x", value(3.0))

  // --------------------------------------- toInteger parses float strings
  // (Neo4j truncates toward zero; fixed round 7 — the long cast alone
  // nulled them.)
  scenario("toInteger parses a float string by truncation", g,
    "RETURN toInteger('3.7') AS x", value(3L))
  scenario("toInteger truncates a negative float string toward zero", g,
    "RETURN toInteger('-3.7') AS x", value(-3L))

  // ------------------------------------------------- empty-input aggregates
  scenario("count over no rows is zero", g,
    "MATCH (n:Zzz) RETURN count(*) AS x", value(0L))
  scenario("max over no rows is null", g,
    "MATCH (n:Zzz) RETURN max(n.num) IS NULL AS x", value(true))
  scenario("avg over no rows is null", g,
    "MATCH (n:Zzz) RETURN avg(n.num) IS NULL AS x", value(true))
  scenario("collect over no rows is the empty list", g,
    "MATCH (n:Zzz) RETURN collect(n.num) AS x", value(Seq.empty[Long]))
}
