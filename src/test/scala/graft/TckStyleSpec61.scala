package graft

import graft.api.CypherError

/** TCK-style conformance, part 61 — round-12 probe batch 5 findings.
  *
  * (1) shortestPath()/allShortestPaths() in EXPRESSION position (Neo4j:
  *     usable in WHERE/RETURN/WITH, yielding a path-or-null / list of
  *     paths) — desugared onto the pattern-comprehension machinery with
  *     the matching path selector; entity lambdas over
  *     nodes()/relationships() of the computed path materialize real
  *     entities (generalizes the header-path-var machinery).
  * (2) `RETURN *` / `WITH *` with no variables in scope is the TCK's
  *     SyntaxError (NoVariablesInScope), not an empty projection.
  * (3) A missing parameter in SKIP/LIMIT position classifies as
  *     ParameterMissing/MissingParameter like every other parameter site.
  * (4) UNWIND over a statically non-list operand (map, number, string)
  *     is a compile-time type error (Neo4j: "expected List<T>"); a
  *     null-typed operand still produces zero rows.
  * (5) A single trailing statement terminator `;` is tolerated (queries
  *     pasted from cypher-shell); two are still a parse error. */
class TckStyleSpec61 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("B"), Map("name" -> "c"))),
    Seq(R(10, 1, 2, "KNOWS"), R(11, 2, 3, "KNOWS"), R(12, 1, 3, "LIKES")))

  // --- shortestPath / allShortestPaths in expression position
  scenario("shortestPath expr in WHERE filters on reachability", g,
    "MATCH (a:A {name:'a'}), (b:B) " +
      "WHERE shortestPath((a)-[:KNOWS*]-(b)) IS NOT NULL RETURN b.name AS nm",
    rows(Map("nm" -> "c")))
  scenario("length(shortestPath(...)) in RETURN", g,
    "MATCH (a:A {name:'a'}), (b:B) " +
      "RETURN length(shortestPath((a)-[:KNOWS*]-(b))) AS l",
    rows(Map("l" -> 2)))
  scenario("shortestPath expr with no match is null", g,
    "MATCH (a:A {name:'a'}) RETURN shortestPath((a)-[:MISSING*]->(:B)) AS p",
    rows(Map("p" -> null)))
  scenario("length of a null path value is null (not legacy -1)", g,
    "MATCH (a:A {name:'a'}) " +
      "RETURN length(shortestPath((a)-[:MISSING*]->(:B))) AS l, " +
      "nodes(shortestPath((a)-[:MISSING*]->(:B))) AS ns",
    rows(Map("l" -> null, "ns" -> null)))
  scenario("the direct 1-hop LIKES edge wins over the 2-hop KNOWS chain", g,
    "MATCH (a:A {name:'a'}), (b:B) " +
      "RETURN length(shortestPath((a)-[*]-(b))) AS l", rows(Map("l" -> 1)))
  scenario("allShortestPaths expr returns the list of minimal paths", g,
    "MATCH (a:A {name:'a'}), (b:B) " +
      "RETURN size(allShortestPaths((a)-[:KNOWS*]-(b))) AS n",
    rows(Map("n" -> 1)))
  scenario("entity lambda over nodes() of a computed path", g,
    "MATCH (a:A {name:'a'}), (b:B) " +
      "RETURN [x IN nodes(shortestPath((a)-[:KNOWS*]-(b))) | x.name] AS ns",
    rows(Map("ns" -> List("a", "b", "c"))))
  scenario("entity lambda over relationships() of a computed path", g,
    "MATCH (a:A {name:'a'}), (b:B) " +
      "RETURN [r IN relationships(shortestPath((a)-[:KNOWS*]-(b))) | type(r)] AS ts",
    rows(Map("ts" -> List("KNOWS", "KNOWS"))))
  scenario("computed path piped through WITH keeps entity semantics", g,
    "MATCH (a:A {name:'a'}), (b:B) " +
      "WITH shortestPath((a)-[:KNOWS*]-(b)) AS p " +
      "RETURN [x IN nodes(p) | x.name] AS ns",
    rows(Map("ns" -> List("a", "b", "c"))))
  scenario("header path var entity lambda is unchanged", g,
    "MATCH p = (a:A {name:'a'})-[:KNOWS]->(b) " +
      "RETURN [x IN nodes(p) | x.name] AS ns",
    rows(Map("ns" -> List("a", "b"))))

  // --- * with no variables in scope
  errorScenario("RETURN * with no variables in scope", g,
    "RETURN *", CypherError.SyntaxError, CypherError.NoVariablesInScope)
  errorScenario("WITH * with no variables in scope", g,
    "WITH * RETURN 1 AS x",
    CypherError.SyntaxError, CypherError.NoVariablesInScope)
  scenario("WITH *, extra after a binding clause still works", g,
    "MATCH (n:A {name:'a'}) WITH *, 1 AS x RETURN n.num AS num, x",
    rows(Map("num" -> 1, "x" -> 1)))

  // --- missing parameter in SKIP/LIMIT
  errorScenario("missing parameter in LIMIT", g,
    "MATCH (n) RETURN n.name LIMIT $lim",
    CypherError.ParameterMissing, CypherError.MissingParameter)
  errorScenario("missing parameter in SKIP", g,
    "MATCH (n) RETURN n.name SKIP $off",
    CypherError.ParameterMissing, CypherError.MissingParameter)

  // --- UNWIND over a statically non-list operand
  // TypeError class since r13 (ADVICE r12: Neo4j's "Expected list<T>"
  // is a type failure, not a syntax failure).
  errorScenario("UNWIND a map is a type error", g,
    "UNWIND {a: 1} AS x RETURN x",
    CypherError.TypeError, CypherError.InvalidArgumentType)
  errorScenario("UNWIND a number is a type error", g,
    "UNWIND 5 AS x RETURN x",
    CypherError.TypeError, CypherError.InvalidArgumentType)
  scenario("UNWIND a null-typed variable produces zero rows", g,
    "WITH null AS l UNWIND l AS x RETURN x", Seq.empty)

  // --- trailing statement terminator
  scenario("a single trailing semicolon is tolerated", g,
    "RETURN 1 AS x;", rows(Map("x" -> 1)))
  scenario("trailing semicolon with surrounding whitespace", g,
    "RETURN 1 AS x ;  ", rows(Map("x" -> 1)))
  errorScenario("two trailing semicolons still fail to parse", g,
    "RETURN 1 AS x;;",
    CypherError.SyntaxError, CypherError.InvalidSyntax)
}
