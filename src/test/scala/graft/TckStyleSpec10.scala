package graft

/** TCK-style conformance, part 10 — map value edges, quantifier boundary
  * cases, WITH/UNWIND/DISTINCT interplay, UNION alignment, path function
  * breadth, OPTIONAL MATCH aggregation, and numeric cross-type/operator
  * semantics (see TckStyleSpec for why these are hand-authored). */
class TckStyleSpec10 extends TckScenarioBase {
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

  /** diamond s -> {l, r} -> t */
  lazy val gD = graph(spark,
    Seq(
      N(1, Set("D"), Map("name" -> "s")), N(2, Set("D"), Map("name" -> "l")),
      N(3, Set("D"), Map("name" -> "r")), N(4, Set("D"), Map("name" -> "t"))),
    Seq(
      R(20, 1, 2, "E"), R(21, 1, 3, "E"), R(22, 2, 4, "E"), R(23, 3, 4, "E")))

  private def errors(query: String, fragment: String = ""): Unit = {
    val e = intercept[Exception](session.cypher(g, query).collect())
    if (fragment.nonEmpty)
      assert(e.getMessage.toLowerCase.contains(fragment.toLowerCase),
        s"expected '$fragment' in: ${e.getMessage}")
  }

  // ======================================================= map value edges
  scenario("keys of a map literal", g,
    "RETURN size(keys({a: 1, b: 2})) AS x", value(2))
  scenario("nested map access chains", g,
    "RETURN {a: {b: 2}}['a']['b'] AS x", value(2))
  scenario("map inside a list indexes through", g,
    "RETURN [{a: 1}, {a: 2}][1]['a'] AS x", value(2))
  scenario("keys of a node include only its properties", g,
    "MATCH (n:A) RETURN size(keys(n)) AS x", value(2))
  scenario("exists() of a missing property is false", g,
    "MATCH (n:C) RETURN exists(n.num) AS x", value(false))
  scenario("exists() of a present property is true", g,
    "MATCH (n:A) RETURN exists(n.num) AS x", value(true))

  // ================================================ quantifier boundaries
  scenario("any over an empty list is false", g,
    "RETURN any(x IN [] WHERE x > 0) AS x", value(false))
  scenario("all over an empty list is true", g,
    "RETURN all(x IN [] WHERE x > 0) AS x", value(true))
  scenario("none over an empty list is true", g,
    "RETURN none(x IN [] WHERE x > 0) AS x", value(true))
  scenario("single over an empty list is false", g,
    "RETURN single(x IN [] WHERE x > 0) AS x", value(false))
  scenario("single matches exactly once", g,
    "RETURN single(x IN [1, 2, 3] WHERE x = 2) AS x", value(true))
  scenario("single fails on two matches", g,
    "RETURN single(x IN [2, 2, 3] WHERE x = 2) AS x", value(false))

  // ======================================== WITH / UNWIND / DISTINCT flow
  scenario("WITH DISTINCT collapses duplicates", g,
    "UNWIND [1, 1, 2] AS x WITH DISTINCT x RETURN count(*) AS x", value(2))
  scenario("UNWIND of an empty list yields no rows", g,
    "UNWIND [] AS x RETURN count(*) AS x", value(0))
  scenario("UNWIND of null yields no rows", g,
    "UNWIND null AS x RETURN count(*) AS x", value(0))
  scenario("UNWIND flattens exactly one level", g,
    "UNWIND [[1, 2], [3]] AS x RETURN size(x) AS x",
    rows(Map("x" -> 2), Map("x" -> 1)))
  scenario("consecutive UNWINDs cross-product", g,
    "UNWIND [1, 2] AS a UNWIND [10, 20] AS b RETURN count(*) AS x", value(4))
  scenario("WITH computed alias feeds WHERE", g,
    "UNWIND [1, 2, 3] AS x WITH x * 2 AS y WHERE y > 2 RETURN count(*) AS x",
    value(2))
  scenario("WITH ORDER BY LIMIT then aggregate", g,
    "UNWIND [3, 1, 2] AS x WITH x ORDER BY x LIMIT 2 RETURN sum(x) AS x",
    value(3))
  scenario("UNWIND a collected aggregate", g,
    "UNWIND [1, 2, 2] AS x WITH collect(DISTINCT x) AS xs " +
      "UNWIND xs AS y RETURN sum(y) AS x", value(3))

  // ===================================================== UNION alignment
  scenario("UNION deduplicates across branches", g,
    "RETURN 1 AS x UNION RETURN 1 AS x", value(1))
  scenario("UNION ALL keeps both branches", g,
    "RETURN 1 AS x UNION ALL RETURN 1 AS x",
    rows(Map("x" -> 1), Map("x" -> 1)))
  scenario("UNION of different values keeps both", g,
    "RETURN 1 AS x UNION RETURN 2 AS x",
    rows(Map("x" -> 1), Map("x" -> 2)))
  test("[err] UNION with mismatched columns") {
    errors("RETURN 1 AS x UNION RETURN 1 AS y")
  }

  // ================================================ path function breadth
  scenario("length counts relationships", g,
    "MATCH p = (a:A)-[:KNOWS]->()-[:KNOWS]->() RETURN length(p) AS x",
    value(2))
  scenario("nodes(p) has length + 1 elements", gD,
    "MATCH p = (a {name:'s'})-[:E]->(b) RETURN size(nodes(p)) AS x",
    rows(Map("x" -> 2), Map("x" -> 2)))
  scenario("relationships(p) matches length", gD,
    "MATCH p = (a {name:'s'})-[:E]->()-[:E]->(c) " +
      "RETURN size(relationships(p)) AS x",
    rows(Map("x" -> 2), Map("x" -> 2)))
  scenario("startNode of a relationship is the source", g,
    "MATCH (a)-[r:LIKES]->(b) RETURN id(startNode(r)) = id(a) AS x",
    value(true))
  scenario("endNode of a relationship is the target", g,
    "MATCH (a)-[r:LIKES]->(b) RETURN id(endNode(r)) = id(b) AS x",
    value(true))
  scenario("type() over mixed relationships", g,
    "MATCH ()-[r]->() RETURN type(r) AS x",
    rows(Map("x" -> "KNOWS"), Map("x" -> "KNOWS"), Map("x" -> "LIKES")))

  // ====================================== OPTIONAL MATCH aggregation edges
  scenario("count(var) over an unmatched optional is zero", g,
    "MATCH (c:C) OPTIONAL MATCH (c)-[:KNOWS]->(x) RETURN count(x) AS x",
    value(0))
  scenario("count(*) over an unmatched optional is one", g,
    "MATCH (c:C) OPTIONAL MATCH (c)-[:KNOWS]->(x) RETURN count(*) AS x",
    value(1))
  scenario("optional WHERE filters inside the optional", g,
    "MATCH (a:A) OPTIONAL MATCH (a)-[:KNOWS]->(b) WHERE b.num > 99 " +
      "RETURN b.name AS x", Seq(Map("x" -> null)))
  scenario("collect skips unmatched optional rows", g,
    "MATCH (n) OPTIONAL MATCH (n)-[:LIKES]->(m) " +
      "RETURN size(collect(m.name)) AS x", value(1))

  // ============================== numeric cross-type / operator semantics
  scenario("integer equals its float value", g,
    "RETURN 1 = 1.0 AS x", value(true))
  scenario("string never equals a number", g,
    "RETURN '1' = 1 AS x", value(false))
  scenario("integer orders against float", g,
    "RETURN 1 < 2.5 AS x", value(true))
  scenario("integer division truncates", g,
    "RETURN 3 / 2 AS x", value(1))
  scenario("float division does not", g,
    "RETURN 3.0 / 2 AS x", value(1.5))
  scenario("modulo keeps the dividend sign", g,
    "RETURN -7 % 3 AS x", value(-1))
  scenario("power returns float", g,
    "RETURN 2 ^ 10 AS x", value(1024.0))
  scenario("unary minus binds looser than power", g,
    "RETURN -2 ^ 2 AS x", value(-4.0))
  scenario("label disjunction in WHERE", g,
    "MATCH (n) WHERE (n:A OR n:B) RETURN count(*) AS x", value(2))
  scenario("type membership via IN", g,
    "MATCH ()-[r]->() WHERE type(r) IN ['LIKES'] RETURN count(*) AS x",
    value(1))

  // properties() of a map is the map itself (Neo4j identity; fixed
  // round 7 — previously "needs an element var", and a WITH-bound map
  // hit an empty prop-slot struct)
  scenario("properties of a literal map is the map", g,
    "RETURN properties({a: 1}).a AS x", value(1))
  scenario("properties of a WITH-bound map is the map", g,
    "WITH {a: 2} AS m RETURN properties(m).a AS x", value(2))
}
