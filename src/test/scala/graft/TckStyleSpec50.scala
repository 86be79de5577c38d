package graft

/** TCK-style conformance, part 50 — collect() order guarantees (round-10
  * scale audit): Cypher's collect respects the incoming row order after
  * WITH … ORDER BY. The engine previously relied on Spark's collect_list
  * happening to preserve sort order (true on few-partition local plans,
  * NOT guaranteed after a multi-partition range sort at scale); a
  * monotone row-sequence stamped after the sort now drives a sort-aware
  * collect, making the guarantee partition-count-independent. These pins
  * use enough rows that the sort genuinely shuffles. */
class TckStyleSpec50 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  scenario("collect after ORDER BY DESC leads with the maximum", g,
    "UNWIND range(1, 20000) AS v WITH v ORDER BY v DESC " +
      "RETURN collect(v)[0] AS x", value(20000L))
  scenario("collect after ORDER BY ASC leads with the minimum", g,
    "UNWIND range(1, 20000) AS v WITH v ORDER BY v " +
      "RETURN collect(v)[0] AS x, collect(v)[19999] AS y",
    rows(Map("x" -> 1L, "y" -> 20000L)))
  scenario("the whole collected list is in ORDER BY order", g,
    "UNWIND range(1, 5000) AS v WITH v ORDER BY v DESC " +
      "WITH collect(v) AS xs " +
      "RETURN all(i IN range(0, 4998) WHERE xs[i] = xs[i + 1] + 1) AS x",
    value(true))
  scenario("grouped collect is ordered within each group", g,
    "UNWIND range(1, 10000) AS v WITH v % 7 AS grp, v ORDER BY v DESC " +
      "RETURN grp, collect(v)[0] AS top ORDER BY grp LIMIT 3",
    rows(Map("grp" -> 0L, "top" -> 9996L), Map("grp" -> 1L, "top" -> 9997L),
      Map("grp" -> 2L, "top" -> 9998L)), ordered = true)
  scenario("ORDER BY on a different key than the collected value", g,
    "UNWIND range(1, 3000) AS v WITH v ORDER BY -v " +
      "RETURN collect(v % 10)[0] AS x", value(0L)) // 3000 % 10
  scenario("a clause between the sort and the collect drops the claim " +
      "without breaking", g,
    // UNWIND after the sorted WITH rebuilds the frame; collect still
    // returns the right multiset (order then unspecified, as in Neo4j).
    "UNWIND range(1, 100) AS v WITH v ORDER BY v DESC " +
      "UNWIND [1] AS one RETURN size(collect(v)) AS x", value(100L))
  scenario("collect DISTINCT after ORDER BY keeps the distinct multiset", g,
    "UNWIND [3, 1, 2, 1, 3] AS v WITH v ORDER BY v " +
      "RETURN size(collect(DISTINCT v)) AS x", value(3L))
}
