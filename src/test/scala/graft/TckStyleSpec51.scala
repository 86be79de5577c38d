package graft

/** TCK-style conformance, part 51 — round-11 fixes pinned:
  *   (a) collect(DISTINCT x) after WITH … ORDER BY returns elements in
  *       first-occurrence sort order (Neo4j semantics). Round 10 fixed
  *       the non-distinct case via a post-sort monotone stamp + the
  *       sort-aware _collectordered aggregate; the distinct path used to
  *       drop to an unordered collect_set. It now routes through the
  *       same stamp with array_distinct on top (Spark's array_distinct
  *       keeps the first occurrence). Multi-partition row counts so the
  *       sort genuinely shuffles.
  *   (b) IEEE-754 float division with a NaN numerator: NaN/0.0 is NaN,
  *       not +Infinity. Spark's ordering ranks NaN above every double,
  *       so the when-chain's `> 0.0` branch used to capture it. */
class TckStyleSpec51 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // --- (a) ordered collect(DISTINCT) ------------------------------------
  scenario("collect DISTINCT after ORDER BY DESC leads with the maximum", g,
    "UNWIND range(1, 20000) AS v WITH v % 100 AS m, v ORDER BY v DESC " +
      "RETURN collect(DISTINCT m)[0] AS x", value(0L)) // 20000 % 100
  scenario("collect DISTINCT after ORDER BY ASC is in first-occurrence " +
      "order end to end", g,
    "UNWIND range(1, 20000) AS v WITH v % 97 AS m, v ORDER BY v " +
      "WITH collect(DISTINCT m) AS xs " +
      // v=1..97 hit residues 1,2,…,96,0 in that order.
      "RETURN xs[0] AS a, xs[95] AS b, xs[96] AS c, size(xs) AS n",
    rows(Map("a" -> 1L, "b" -> 96L, "c" -> 0L, "n" -> 97L)))
  scenario("grouped collect DISTINCT is ordered within each group", g,
    "UNWIND range(1, 10000) AS v WITH v % 3 AS grp, v % 10 AS m, v " +
      "ORDER BY v DESC RETURN grp, collect(DISTINCT m)[0] AS top " +
      "ORDER BY grp LIMIT 3",
    // Max v per grp: 9999 (grp 0, m 9), 10000 (grp 1, m 0), 9998 (grp 2, m 8)
    rows(Map("grp" -> 0L, "top" -> 9L), Map("grp" -> 1L, "top" -> 0L),
      Map("grp" -> 2L, "top" -> 8L)), ordered = true)
  scenario("collect DISTINCT after ORDER BY keeps the distinct multiset", g,
    "UNWIND [3, 1, 2, 1, 3] AS v WITH v ORDER BY v DESC " +
      "RETURN collect(DISTINCT v) AS x", value(Seq(3L, 2L, 1L)))
  scenario("collect DISTINCT with nulls after ORDER BY skips nulls", g,
    "UNWIND [3, null, 1, null, 3] AS v WITH v ORDER BY v " +
      "RETURN collect(DISTINCT v) AS x", value(Seq(1L, 3L)))

  // --- WITH DISTINCT preserves first-occurrence order under a live stamp --
  scenario("WITH DISTINCT after ORDER BY keeps first-occurrence order " +
      "for a later collect", g,
    "UNWIND range(1, 20000) AS v WITH v % 97 AS m, v ORDER BY v DESC " +
      "WITH DISTINCT m RETURN collect(m)[0] AS x", value(20000L % 97))
  scenario("COLLECT subquery: ORDER BY then RETURN DISTINCT is sorted", g,
    "RETURN COLLECT { UNWIND [3, 1, 3, 2] AS v WITH v ORDER BY v " +
      "RETURN DISTINCT v } AS x", value(Seq(1L, 2L, 3L)))
  scenario("WITH DISTINCT under stamp at 20k rows end to end", g,
    "UNWIND range(1, 20000) AS v WITH v % 101 AS m, v ORDER BY v " +
      "WITH DISTINCT m WITH collect(m) AS xs " +
      // v=1..101 first hits residues 1..100 then 0, in that order.
      "RETURN xs[0] AS a, xs[99] AS b, xs[100] AS c, size(xs) AS n",
    rows(Map("a" -> 1L, "b" -> 100L, "c" -> 0L, "n" -> 101L)))

  // --- unit-body write visibility (documented deviation) -----------------
  lazy val g3 = graph(spark,
    Seq(
      N(1, Set("A"), Map("num" -> 1)),
      N(2, Set("A"), Map("num" -> 2)),
      N(3, Set("A"), Map("num" -> 3))),
    Seq.empty)
  // DEVIATION PIN (tck_blacklist.md, CALL IN TRANSACTIONS section): unit
  // bodies execute set-wise, so the body's MATCH sees the pre-call graph
  // for every driving row — 3 rows x 3 pre-call nodes = 9 :C. Neo4j runs
  // the body per row with earlier rows' writes visible (3 + 6 + 12 = 21).
  // This pin exists so any change to the visibility semantics is noticed.
  scenario("unit body read-then-write executes set-wise over the " +
      "pre-call snapshot", g3,
    "MATCH (n) CALL (n) { MATCH (m) CREATE (:C) } WITH * " +
      "MATCH (c:C) WITH DISTINCT c RETURN count(*) AS x", value(9L))

  // --- (b) NaN/0.0 --------------------------------------------------------
  scenario("NaN divided by float zero is NaN, not Infinity", g,
    "WITH 0.0/0.0 AS nan RETURN toString(nan/0.0) AS x", value("NaN"))
  scenario("positive and negative numerators over 0.0 keep their signs", g,
    "RETURN toString(1.0/0.0) AS a, toString(-1.0/0.0) AS b, " +
      "toString(0.0/0.0) AS c",
    rows(Map("a" -> "Infinity", "b" -> "-Infinity", "c" -> "NaN")))
  scenario("NaN propagates through a chained float division", g,
    "RETURN toString((0.0/0.0)/0.0) AS x", value("NaN"))
}
