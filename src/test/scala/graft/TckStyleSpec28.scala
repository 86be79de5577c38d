package graft

import graft.api.CypherError

/** TCK-style conformance, part 28 — projection column-name rules and
  * residual probe-verified semantics (TCK clauses/return + clauses/with +
  * the expressions categories): duplicate result columns are a classified
  * ColumnNameConflict (fixed in round 7 — the engine previously emitted
  * two ambiguous columns), non-variable WITH items require an alias
  * (NoExpressionAlias, fixed in round 7), plus pinned behaviors for
  * undirected rel double-binding, scalar+list `+`, IN with null/empty
  * lists, list orderability/comparability, UNWIND null, LIMIT 0, string
  * coercion in `+`, and classified aggregate-input type errors. */
class TckStyleSpec28 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2))),
    Seq(R(10, 1, 2, "T")))

  // ------------------------------------------- duplicate result columns
  errorScenario("duplicate literal aliases conflict", g,
    "RETURN 1 AS a, 2 AS a",
    CypherError.SyntaxError, CypherError.ColumnNameConflict)
  errorScenario("duplicate aliases on different expressions conflict", g,
    "MATCH (n:A) RETURN n.num AS x, n.name AS x",
    CypherError.SyntaxError, CypherError.ColumnNameConflict)
  errorScenario("star colliding with an explicit item conflicts", g,
    "MATCH (n:A) RETURN *, n",
    CypherError.SyntaxError, CypherError.ColumnNameConflict)
  errorScenario("same unaliased expression twice conflicts", g,
    "MATCH (n:A) RETURN n.num, n.num",
    CypherError.SyntaxError, CypherError.ColumnNameConflict)
  errorScenario("duplicate aliases in WITH conflict", g,
    "MATCH (n:A) WITH n.num AS x, n.name AS x RETURN x",
    CypherError.SyntaxError, CypherError.ColumnNameConflict)

  // ------------------------------------------- WITH alias requirement
  errorScenario("property item in WITH requires an alias", g,
    "MATCH (n:A) WITH n.num RETURN 1 AS x",
    CypherError.SyntaxError, CypherError.NoExpressionAlias)
  errorScenario("computed item in WITH requires an alias", g,
    "WITH 1 + 2 RETURN 1 AS x",
    CypherError.SyntaxError, CypherError.NoExpressionAlias)
  scenario("bare variable in WITH needs no alias", g,
    "MATCH (n:A) WITH n RETURN n.name AS x", value("a"))
  scenario("RETURN keeps unaliased expressions (only WITH requires AS)", g,
    "MATCH (n:A) RETURN n.num + 1 AS x", value(2L))

  // ------------------------------------------- undirected rel binding
  scenario("undirected relationship pattern binds each rel twice", g,
    "MATCH ()-[r:T]-() RETURN count(r) AS x", value(2L))
  scenario("directed relationship pattern binds each rel once", g,
    "MATCH ()-[r:T]->() RETURN count(r) AS x", value(1L))

  // ------------------------------------------- scalar + list, string +
  scenario("scalar + list prepends", g,
    "RETURN 3 + [1, 2] AS x", value(Seq(3L, 1L, 2L)))
  scenario("list + scalar appends", g,
    "RETURN [1, 2] + 3 AS x", value(Seq(1L, 2L, 3L)))
  scenario("string + integer concatenates", g,
    "RETURN '1' + 1 AS x", value("11"))
  scenario("integer + string concatenates", g,
    "RETURN 1 + '1' AS x", value("11"))

  // ------------------------------------------- IN with null/empty lists
  scenario("null IN empty list is false, not null", g,
    "RETURN null IN [] AS x", value(false))
  scenario("missing element with null present is null", g,
    "RETURN 3 IN [1, 2, null] AS x", value(null))
  scenario("null IN non-empty list is null", g,
    "RETURN null IN [1] AS x", value(null))
  scenario("found element short-circuits past null", g,
    "RETURN 1 IN [1, null] AS x", value(true))

  // ------------------------------------------- list order/comparability
  scenario("ORDER BY on lists sorts lexicographically", g,
    "UNWIND [[2, 3], [1], [1, 2]] AS l RETURN l ORDER BY l",
    rows(Map("l" -> Seq(1L)), Map("l" -> Seq(1L, 2L)),
      Map("l" -> Seq(2L, 3L))), ordered = true)
  scenario("list comparison is elementwise then by length", g,
    "RETURN [1, 2] < [1, 3] AS x, [1] < [1, 2] AS y",
    rows(Map("x" -> true, "y" -> true)))

  // ------------------------------------------- UNWIND / LIMIT edges
  scenario("UNWIND null produces zero rows", g,
    "UNWIND null AS v RETURN count(*) AS x", value(0L))
  scenario("LIMIT 0 returns no rows but a valid schema", g,
    "MATCH (n:A) RETURN n.name AS x ORDER BY x LIMIT 0", rows())

  // ------------------------------------------- misc probe pins
  scenario("keys of a map literal includes null-valued entries", g,
    "RETURN keys({a: 1, b: null}) AS x", value(Seq("a", "b")))
  scenario("toInteger on booleans", g,
    "RETURN toInteger(true) AS x, toInteger(false) AS y",
    rows(Map("x" -> 1L, "y" -> 0L)))
  scenario("STARTS WITH null filters every row", g,
    "MATCH (n:A) WHERE n.name STARTS WITH null RETURN count(*) AS x",
    value(0L))
  scenario("one-arg substring runs to the end (0-based start)", g,
    "RETURN substring('hello', 1) AS x", value("ello"))
  scenario("WITH may ORDER BY without LIMIT", g,
    "MATCH (n) WITH n ORDER BY n.name RETURN collect(n.name) AS x",
    value(Seq("a", "b")))

  // ------------------------------------------- classified agg type errors
  errorScenario("aggregating a list input is a classified type error", g,
    "RETURN avg([1, 2]) AS x",
    CypherError.SyntaxError, CypherError.InvalidArgumentType)
  errorScenario("null percentile argument is a classified type error", g,
    "MATCH (n:A) RETURN percentileCont(n.num, null) AS x",
    CypherError.SyntaxError, CypherError.InvalidArgumentType)
  errorScenario("coalesce with no arguments is classified", g,
    "RETURN coalesce() AS x",
    CypherError.SyntaxError, CypherError.InvalidNumberOfArguments)
  errorScenario("range with a literal zero step is classified", g,
    "RETURN range(1, 10, 0) AS x",
    CypherError.SyntaxError, CypherError.NumberOutOfRange)
  scenario("range direction mismatch yields empty, negative step descends", g,
    "RETURN range(2, 1) AS a, range(3, 1, -1) AS b",
    rows(Map("a" -> Seq.empty[Long], "b" -> Seq(3L, 2L, 1L))))

  // ------------------------------------------- temporal instant arithmetic
  errorScenario("subtracting two dates is a classified type error", g,
    "RETURN date('2020-03-01') - date('2020-02-01') AS x",
    CypherError.SyntaxError, CypherError.InvalidArgumentType)
  errorScenario("adding two datetimes is a classified type error", g,
    "RETURN datetime('2020-01-01T00:00:00') + datetime('2020-01-02T00:00:00') AS x",
    CypherError.SyntaxError, CypherError.InvalidArgumentType)
  scenario("duration.between is the instant difference operator", g,
    "RETURN duration.between(date('2020-02-01'), date('2020-03-01')).months AS x",
    value(1L))
  scenario("date minus duration still subtracts", g,
    "RETURN toString(date('2020-03-01') - duration('P1D')) AS x",
    value("2020-02-29"))

  // --------------------------------- grouping keys inside aggregate items
  lazy val gNum = graph(spark,
    Seq(
      N(1, Set("P"), Map("grp" -> 1, "v" -> 10)),
      N(2, Set("P"), Map("grp" -> 1, "v" -> 20)),
      N(3, Set("P"), Map("grp" -> 2, "v" -> 30))))
  scenario("aggregate item may reference an explicit grouping expression", gNum,
    "MATCH (p:P) RETURN p.grp AS k, p.grp + count(*) AS x ORDER BY k",
    rows(Map("k" -> 1L, "x" -> 3L), Map("k" -> 2L, "x" -> 3L)),
    ordered = true)
  scenario("unaliased grouping expression also substitutes", gNum,
    "MATCH (p:P) RETURN p.grp, p.grp * sum(p.v) AS x ORDER BY x",
    rows(Map("p.grp" -> 1L, "x" -> 30L), Map("p.grp" -> 2L, "x" -> 60L)),
    ordered = true)
  scenario("renamed entity grouping key usable inside the aggregate item", gNum,
    "MATCH (p:P) WITH p AS q RETURN q.grp AS k, count(*) + q.grp AS x ORDER BY k",
    rows(Map("k" -> 1L, "x" -> 3L), Map("k" -> 2L, "x" -> 3L)),
    ordered = true)
  errorScenario("implicit grouping inside an aggregate item is classified", gNum,
    "MATCH (p:P) RETURN p.grp + count(*) AS x",
    CypherError.SyntaxError, CypherError.AmbiguousAggregationExpression)
}
