package graft

/** TCK-style conformance, part 39 — Cypher-5 / GQL keyword path selectors:
  * ANY [k], ALL SHORTEST, SHORTEST k, SHORTEST k GROUPS, ALL, with the
  * optional PATH/PATHS noise words. Reference semantics:
  * okapi/okapi-ir path-pattern docs and the openCypher M23 path-selector
  * proposal; legacy shortestPath()/allShortestPaths() stay supported. */
class TckStyleSpec39 extends TckScenarioBase {
  import TckFixtures._

  /** Diamond with a long arm:
    *   1 -> 2 -> 4   (length 2)
    *   1 -> 3 -> 4   (length 2)
    *   1 -> 5 -> 6 -> 4 (length 3)
    * Shortest 1~>4 group: two paths of length 2; next group: one path of
    * length 3. */
  lazy val gDia = graph(spark,
    Seq(
      N(1, Set("V"), Map("name" -> "n1")), N(2, Set("V"), Map("name" -> "n2")),
      N(3, Set("V"), Map("name" -> "n3")), N(4, Set("V"), Map("name" -> "n4")),
      N(5, Set("V"), Map("name" -> "n5")), N(6, Set("V"), Map("name" -> "n6"))),
    Seq(
      R(20, 1, 2, "E"), R(21, 2, 4, "E"),
      R(22, 1, 3, "E"), R(23, 3, 4, "E"),
      R(24, 1, 5, "E"), R(25, 5, 6, "E"), R(26, 6, 4, "E")))

  // ---- ANY / ANY SHORTEST: one minimal path per endpoint pair
  scenario("ANY picks exactly one shortest path", gDia,
    "MATCH p = ANY (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN length(p) AS x", value(2))
  scenario("ANY SHORTEST is the same selector", gDia,
    "MATCH p = ANY SHORTEST (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN length(p) AS x", value(2))
  scenario("ANY 1 PATH with noise word", gDia,
    "MATCH p = ANY 1 PATH (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(1))
  scenario("SHORTEST 1 equals ANY", gDia,
    "MATCH p = SHORTEST 1 (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN length(p) AS x", value(2))
  scenario("SHORTEST 1 PATH with noise word", gDia,
    "MATCH p = SHORTEST 1 PATH (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(1))

  // ---- ALL SHORTEST: every minimal path
  scenario("ALL SHORTEST keeps both length-2 arms", gDia,
    "MATCH p = ALL SHORTEST (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(2))
  scenario("ALL SHORTEST PATHS with noise word", gDia,
    "MATCH p = ALL SHORTEST PATHS (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN length(p) AS x", rows(Map("x" -> 2), Map("x" -> 2)))
  scenario("SHORTEST 1 GROUP equals ALL SHORTEST", gDia,
    "MATCH p = SHORTEST 1 GROUP (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(2))

  // ---- SHORTEST k: the k shortest distinct paths
  scenario("SHORTEST 2 returns the two minimal paths", gDia,
    "MATCH p = SHORTEST 2 (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN length(p) AS x", rows(Map("x" -> 2), Map("x" -> 2)))
  scenario("SHORTEST 3 spills into the next length group", gDia,
    "MATCH p = SHORTEST 3 (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN length(p) AS x",
    rows(Map("x" -> 2), Map("x" -> 2), Map("x" -> 3)))
  scenario("SHORTEST k larger than the path set returns all paths", gDia,
    "MATCH p = SHORTEST 9 (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(3))
  scenario("ANY 2 behaves as SHORTEST 2", gDia,
    "MATCH p = ANY 2 (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(2))

  // ---- SHORTEST k GROUPS: whole length-groups
  scenario("SHORTEST 2 GROUPS keeps all three paths", gDia,
    "MATCH p = SHORTEST 2 GROUPS (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN length(p) AS x",
    rows(Map("x" -> 2), Map("x" -> 2), Map("x" -> 3)))
  scenario("SHORTEST 1 GROUPS on a unique minimum", gDia,
    "MATCH p = SHORTEST 1 GROUPS (a {name:'n1'})-[:E*]->(b {name:'n6'}) " +
      "RETURN length(p) AS x", value(2))

  // ---- ALL / ALL PATHS: explicit default, no pruning
  scenario("ALL PATHS keeps the full trail set", gDia,
    "MATCH p = ALL PATHS (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(3))

  // ---- binding + multiplicity interactions
  scenario("selector without a path binding still filters", gDia,
    "MATCH ALL SHORTEST (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(2))
  scenario("outer-row multiplicity survives SHORTEST 2", gDia,
    "UNWIND [1, 2] AS i " +
      "MATCH p = SHORTEST 2 (a {name:'n1'})-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(4))
  scenario("per-pair selection: SHORTEST 1 over multiple targets", gDia,
    "MATCH p = SHORTEST 1 (a {name:'n1'})-[:E*]->(b:V) " +
      "WHERE b.name IN ['n4','n6'] RETURN b.name AS n, length(p) AS x",
    rows(Map("n" -> "n4", "x" -> 2), Map("n" -> "n6", "x" -> 2)))

  // ---- path-reading WHERE defers the selection (shortest SATISFYING
  //      path, Neo4j semantics) instead of filtering the chosen path
  scenario("WHERE on nodes(p) picks the shortest satisfying path", gDia,
    // excluding n2 kills the [20,21] arm; the [22,23] arm (also length 2)
    // must be chosen instead of returning nothing.
    "MATCH p = shortestPath((a {name:'n1'})-[:E*]->(b {name:'n4'})) " +
      "WHERE none(x IN nodes(p) WHERE x.name = 'n2') " +
      "RETURN length(p) AS x", value(2))
  scenario("satisfying path may be longer than the true shortest", gDia,
    // excluding BOTH length-2 arms leaves only the length-3 path.
    "MATCH p = shortestPath((a {name:'n1'})-[:E*]->(b {name:'n4'})) " +
      "WHERE none(x IN nodes(p) WHERE x.name IN ['n2','n3']) " +
      "RETURN length(p) AS x", value(3))
  scenario("no satisfying path yields no row", gDia,
    "MATCH p = shortestPath((a {name:'n1'})-[:E*]->(b {name:'n4'})) " +
      "WHERE none(x IN nodes(p) WHERE x.name IN ['n2','n3','n5']) " +
      "RETURN count(*) AS x", value(0))
  scenario("allShortestPaths keeps every satisfying minimum", gDia,
    // min length among satisfying paths is 2 and only one arm qualifies.
    "MATCH p = allShortestPaths((a {name:'n1'})-[:E*]->(b {name:'n4'})) " +
      "WHERE none(x IN nodes(p) WHERE x.name = 'n2') " +
      "RETURN length(p) AS x", value(2))
  scenario("rel-list predicate also defers the selection", gDia,
    "MATCH (a {name:'n1'}), (b {name:'n4'}) " +
      "MATCH p = shortestPath((a)-[r:E*]->(b)) " +
      "WHERE none(e IN r WHERE id(e) = 20) " +
      "RETURN length(p) AS x", value(2))
  scenario("deferred selection stays per-outer-binding", gDia,
    // lim = 2 admits the length-2 arms; lim = 3 only the long way round.
    "UNWIND [2, 3] AS lim " +
      "MATCH p = shortestPath((a {name:'n1'})-[:E*]->(b {name:'n4'})) " +
      "WHERE length(p) >= lim RETURN lim, length(p) AS x",
    rows(Map("lim" -> 2, "x" -> 2), Map("lim" -> 3, "x" -> 3)))
  scenario("endpoint-only WHERE still uses the pruned fast path", gDia,
    "MATCH p = shortestPath((a:V)-[:E*]->(b {name:'n4'})) " +
      "WHERE a.name = 'n1' RETURN length(p) AS x", value(2))

  // ---- legacy function wrappers still parse
  scenario("legacy shortestPath() unchanged", gDia,
    "MATCH p = shortestPath((a {name:'n1'})-[:E*]->(b {name:'n4'})) " +
      "RETURN length(p) AS x", value(2))
  scenario("legacy allShortestPaths() unchanged", gDia,
    "MATCH p = allShortestPaths((a {name:'n1'})-[:E*]->(b {name:'n4'})) " +
      "RETURN count(*) AS x", value(2))

  // ---- error classification
  test("[err] SHORTEST without a count") {
    val e = intercept[Exception](session.cypher(gDia,
      "MATCH p = SHORTEST (a)-[:E*]->(b) RETURN p").collect())
    assert(e.getMessage.toLowerCase.contains("shortest"))
  }
  test("[err] selector count below one") {
    val e = intercept[Exception](session.cypher(gDia,
      "MATCH p = SHORTEST 0 (a)-[:E*]->(b) RETURN p").collect())
    assert(e.getMessage.toLowerCase.contains(">= 1"))
  }
  // ---- generalized patterns (round 10): fixed hops and fixed/var mixes.
  // Selection is per endpoint PAIR (head, tail of the part); a fixed
  // pattern's paths all share one length, so ALL SHORTEST is the identity
  // and SHORTEST 1 dedups parallel routes per pair.
  scenario("ALL SHORTEST over a fixed 1-hop pattern is the identity", gDia,
    "MATCH p = ALL SHORTEST (a {name:'n1'})-[:E]->(m) " +
      "RETURN count(*) AS x", value(3))
  scenario("SHORTEST 1 on a fixed hop keeps one path per pair", gDia,
    // (n1,n2), (n1,n3), (n1,n5) are distinct endpoint pairs
    "MATCH p = SHORTEST 1 (a {name:'n1'})-[:E]->(m) " +
      "RETURN count(*) AS x", value(3))
  scenario("ANY SHORTEST over fixed-then-var picks the short arm", gDia,
    "MATCH p = ANY SHORTEST (a {name:'n1'})-[:E]->(m)-[:E*]->(b {name:'n4'}) " +
      "RETURN length(p) AS x", value(2))
  scenario("ALL SHORTEST over fixed-then-var keeps both short arms", gDia,
    "MATCH p = ALL SHORTEST (a {name:'n1'})-[:E]->(m)-[:E*]->(b {name:'n4'}) " +
      "RETURN count(*) AS x", value(2))
  scenario("SHORTEST 2 over var-then-fixed", gDia,
    "MATCH p = SHORTEST 2 (a {name:'n1'})-[:E*]->(m)-[:E]->(b {name:'n4'}) " +
      "RETURN length(p) AS x", rows(Map("x" -> 2), Map("x" -> 2)))
  scenario("SHORTEST 3 over a mix spills into the long arm", gDia,
    "MATCH p = SHORTEST 3 (a {name:'n1'})-[:E]->(m)-[:E*0..]->(b {name:'n4'}) " +
      "RETURN length(p) AS x ORDER BY x",
    rows(Map("x" -> 2), Map("x" -> 2), Map("x" -> 3)), ordered = true)
  scenario("inline pattern WHERE participates before selection", gDia,
    "MATCH p = ANY SHORTEST (a {name:'n1'})-[:E]->" +
      "(m WHERE m.name = 'n5')-[:E*]->(b {name:'n4'}) " +
      "RETURN length(p) AS x", value(3))

  /** two parallel edges 1->2 */
  lazy val gPar = graph(spark,
    Seq(N(1, Set("V"), Map("name" -> "s")), N(2, Set("V"), Map("name" -> "t"))),
    Seq(R(40, 1, 2, "E"), R(41, 1, 2, "E")))
  scenario("parallel edges: ANY picks one", gPar,
    "MATCH p = ANY (a {name:'s'})-[:E]->(b) RETURN count(*) AS x", value(1))
  scenario("parallel edges: ALL SHORTEST keeps both", gPar,
    "MATCH p = ALL SHORTEST (a {name:'s'})-[:E]->(b) " +
      "RETURN count(*) AS x", value(2))
  scenario("parallel edges: SHORTEST 2 keeps both", gPar,
    "MATCH p = SHORTEST 2 (a {name:'s'})-[:E]->(b) " +
      "RETURN count(*) AS x", value(2))
}
