package graft

import graft.api.CypherError._

/** TCK-style conformance, part 11 — error classification. The TCK asserts
  * failures as `a <Type> should be raised at <phase>: <Detail>`; these
  * scenarios pin graft's taxonomy (graft.api.CypherError) to the same
  * coordinates, with positive siblings showing the legal boundary next to
  * each error (see TckStyleSpec for why these are hand-authored). */
class TckStyleSpec11 extends TckScenarioBase {
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

  // ================================================= plain syntax errors
  errorScenario("dangling operator is a syntax error", g,
    "RETURN 1 +", SyntaxError, InvalidSyntax)
  errorScenario("unclosed node pattern is a syntax error", g,
    "MATCH (n RETURN n", SyntaxError, InvalidSyntax)
  errorScenario("stray clause keyword is a syntax error", g,
    "MATCH (n) WHERE RETURN n", SyntaxError, InvalidSyntax)

  // ==================================================== undefined variable
  errorScenario("returning an unbound variable", g,
    "MATCH (n) RETURN m", SyntaxError, UndefinedVariable)
  errorScenario("filtering on an unbound variable", g,
    "MATCH (a) WHERE b.num = 1 RETURN a", SyntaxError, UndefinedVariable)
  errorScenario("unbound variable inside a function", g,
    "RETURN toUpper(ghost) AS x", SyntaxError, UndefinedVariable)
  errorScenario("variable dropped by WITH is unbound after it", g,
    "MATCH (n) WITH n.num AS k RETURN n", SyntaxError, UndefinedVariable)
  scenario("same name rebound by WITH is fine", g,
    "MATCH (n:A) WITH n.num AS n RETURN n", rows(Map("n" -> 1L)))

  // ====================================================== unknown function
  errorScenario("calling an unknown function", g,
    "RETURN sinc(1) AS x", SyntaxError, UnknownFunction)
  errorScenario("typo'd aggregate is an unknown function", g,
    "MATCH (n) RETURN cont(n) AS x", SyntaxError, UnknownFunction)

  // ===================================================== missing parameter
  errorScenario("referencing an unprovided parameter", g,
    "RETURN $missing AS x", ParameterMissing, MissingParameter)

  // ============================================== invalid argument types
  errorScenario("labels() of a literal", g,
    "RETURN labels(1) AS x", TypeError, InvalidArgumentType)
  errorScenario("labels() of a relationship", g,
    "MATCH ()-[r]->() RETURN labels(r) AS x", TypeError, InvalidArgumentType)
  errorScenario("type() of a node", g,
    "MATCH (n) RETURN type(n) AS x", TypeError, InvalidArgumentType)
  errorScenario("startNode() of a node", g,
    "MATCH (n) RETURN startNode(n) AS x", TypeError, InvalidArgumentType)
  errorScenario("keys() of an integer", g,
    "RETURN keys(42) AS x", TypeError, InvalidArgumentType)
  errorScenario("properties() of a string", g,
    "RETURN properties('x') AS x", TypeError, InvalidArgumentType)

  // ================================================= temporal value errors
  errorScenario("unparseable date string", g,
    "RETURN date('not-a-date') AS x", ArgumentError, InvalidTemporalValue)
  errorScenario("unparseable duration string", g,
    "RETURN duration('PXYZ') AS x", ArgumentError, InvalidTemporalValue)
  scenario("compact week date is legal next to those", g,
    "RETURN toString(date('2015W302')) AS x", value("2015-07-21"))

  // ===================================================== SKIP/LIMIT bounds
  errorScenario("negative LIMIT", g,
    "MATCH (n) RETURN n.name AS x LIMIT -1",
    SyntaxError, NegativeIntegerArgument)
  errorScenario("negative SKIP", g,
    "MATCH (n) RETURN n.name AS x SKIP -2",
    SyntaxError, NegativeIntegerArgument)
  errorScenario("negative LIMIT via constant arithmetic", g,
    "MATCH (n) RETURN n.name AS x LIMIT 1 - 3",
    SyntaxError, NegativeIntegerArgument)
  errorScenario("float LIMIT", g,
    "MATCH (n) RETURN n.name AS x LIMIT 1.5",
    SyntaxError, InvalidArgumentType)
  errorScenario("non-constant LIMIT expression", g,
    "MATCH (n) RETURN n.name AS x LIMIT n.num",
    SyntaxError, InvalidArgumentExpression)
  scenario("constant-arithmetic LIMIT is legal", g,
    "MATCH (n) RETURN count(*) AS x LIMIT 1 + 1", value(3L))
  scenario("LIMIT 0 is legal and empty", g,
    "MATCH (n) RETURN n.name AS x LIMIT 0", rows())

  // ================================================= aggregation placement
  errorScenario("aggregate in MATCH WHERE", g,
    "MATCH (n) WHERE count(n) > 0 RETURN n.name AS x",
    SyntaxError, InvalidAggregation)
  errorScenario("count(*) in WITH WHERE without alias", g,
    "MATCH (n) WITH n WHERE count(*) > 1 RETURN n.name AS x",
    SyntaxError, InvalidAggregation)
  errorScenario("nested aggregation", g,
    "MATCH (n) RETURN sum(count(n)) AS x",
    SyntaxError, NestedAggregation)
  errorScenario("count of count(*)", g,
    "MATCH (n) RETURN count(count(*)) AS x",
    SyntaxError, NestedAggregation)
  errorScenario("nested aggregation inside arithmetic", g,
    "MATCH (n) RETURN max(1 + avg(n.num)) AS x",
    SyntaxError, NestedAggregation)
  scenario("aggregate filtered through a WITH alias is legal", g,
    "MATCH (n) WITH count(*) AS c WHERE c > 1 RETURN c",
    rows(Map("c" -> 3L)))
  scenario("aggregate of an arithmetic expression is legal", g,
    "MATCH (n) WHERE n.num IS NOT NULL RETURN sum(n.num + 1) AS x",
    value(5L))

  // ========================================================== UNION shapes
  errorScenario("UNION with different column names", g,
    "MATCH (n:A) RETURN n.name AS a UNION MATCH (n:B) RETURN n.name AS b",
    SyntaxError, DifferentColumnsInUnion)
  errorScenario("UNION with different column counts", g,
    "MATCH (n:A) RETURN n.name AS a, n.num AS b UNION " +
      "MATCH (n:B) RETURN n.name AS a",
    SyntaxError, DifferentColumnsInUnion)
  scenario("UNION with aligned columns is legal", g,
    "MATCH (n:A) RETURN n.name AS a UNION MATCH (n:B) RETURN n.name AS a",
    rows(Map("a" -> "a"), Map("a" -> "b")))

  // ================================================== container subscripts
  errorScenario("map subscript by integer", g,
    "RETURN {a: 1}[1] AS x", TypeError, MapElementAccessByNonString)
  errorScenario("map variable subscript by integer", g,
    "WITH {a: 1} AS m RETURN m[1] AS x",
    TypeError, MapElementAccessByNonString)
  errorScenario("list subscript by string", g,
    "RETURN [1, 2]['a'] AS x", TypeError, ListElementAccessByNonInteger)
  errorScenario("list variable subscript by string", g,
    "WITH [1, 2] AS l RETURN l['one'] AS x",
    TypeError, ListElementAccessByNonInteger)
  errorScenario("list subscript by float", g,
    "RETURN [1, 2][0.5] AS x", TypeError, ListElementAccessByNonInteger)
  scenario("list subscript by integer is legal", g,
    "RETURN [1, 2][0] AS x", value(1L))
  scenario("map subscript by string is legal", g,
    "RETURN {a: 1}['a'] AS x", value(1L))
  scenario("map subscript by computed string is legal", g,
    "RETURN {a: 1}[toString('a')] AS x", value(1L))

  // ============================== classification is exception-structural
  test("[999] classified errors expose type, phase, and detail") {
    val e = intercept[graft.api.CypherException] {
      session.cypher(g, "RETURN unbound AS x").collect()
    }
    assert(e.errorType.name === "SyntaxError")
    assert(e.phase.name === "compile time")
    assert(e.toString.contains("UndefinedVariable"))
  }
}
