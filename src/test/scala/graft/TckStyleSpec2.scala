package graft

/** TCK-style conformance, part 2 — the corner-case categories the official
  * TCK leans on hardest (hand-authored; the feature files themselves are an
  * external artifact this environment cannot fetch — see TckStyleSpec):
  * equality/comparability coercion, IN + null three-valued semantics, string
  * predicates, quantifier/HOF edges over empty and null lists, aggregation
  * null handling, optional-match null propagation through element functions,
  * orderability, var-length relationship uniqueness, and error scenarios.
  *
  * The list-equality-with-null divergence the reference carries in its
  * failing_blacklist (`[null] = [null]` true under Spark array equality)
  * was closed in round 8: Cmp("=") compiles ternary list/map equality
  * directly (ExprCompiler.ternaryEq), so the openCypher answers are
  * asserted below.
  */
class TckStyleSpec2 extends TckScenarioBase {
  import TckFixtures._

  /** a:A {name:'a', num:1} -KNOWS{since:2010}-> b:B {name:'b', num:2}
    * b -KNOWS{since:2012}-> c:C {name:'c'}   a -LIKES-> c
    * d:A:B {name:'d', num:4} isolated */
  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c")),
      N(4, Set("A", "B"), Map("name" -> "d", "num" -> 4))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 2, 3, "KNOWS", Map("since" -> 2012)),
      R(12, 1, 3, "LIKES")))

  /** chain 1->2->3->4 */
  lazy val gChain = graph(spark,
    Seq(N(1, Set("P"), Map("name" -> "p1")), N(2, Set("P"), Map("name" -> "p2")),
      N(3, Set("P"), Map("name" -> "p3")), N(4, Set("P"), Map("name" -> "p4"))),
    (1L to 3L).map(i => R(30 + i, i, i + 1, "NEXT")))

  /** self-loop on 1, parallel edges 1->2, cycle 2<->3 */
  lazy val gLoops = graph(spark,
    Seq(N(1, Set("X")), N(2, Set("X")), N(3, Set("X"))),
    Seq(
      R(20, 1, 1, "SELF"),
      R(21, 1, 2, "KNOWS"),
      R(22, 1, 2, "KNOWS"),
      R(23, 2, 3, "KNOWS"),
      R(24, 3, 2, "KNOWS")))

  /** string/null-heavy props for orderability + predicates */
  lazy val gS = graph(spark,
    Seq(
      N(1, Set("S"), Map("s" -> "apple", "n" -> 3)),
      N(2, Set("S"), Map("s" -> "Banana", "n" -> 1)),
      N(3, Set("S"), Map("s" -> "cherry")),
      N(4, Set("S"), Map("n" -> 2))))

  // =================================== equality / comparability coercion
  scenario("integer equals float when numerically equal", g,
    "RETURN (1 = 1.0) AS x", value(true))
  scenario("integer float inequality", g, "RETURN (1 = 1.5) AS x", value(false))
  scenario("cross-type comparison integer vs string is null", g,
    "RETURN (1 < 'a') AS x", value(null))
  scenario("string comparison is lexicographic", g,
    "RETURN ('abc' < 'abd') AS x", value(true))
  scenario("boolean equality", g, "RETURN (true = true) AS x", value(true))
  scenario("list equality with numeric coercion", g,
    "RETURN ([1, 2] = [1, 2.0]) AS x", value(true))
  scenario("list inequality by length", g,
    "RETURN ([1] = [1, 2]) AS x", value(false))
  scenario("list equality elementwise", g,
    "RETURN ([1, 2, 3] = [1, 2, 3]) AS x", value(true))
  // Divergence CLOSED in round 8 (ternary list equality — the reference
  // blacklists these TCK rows; this engine compiles the openCypher answer):
  scenario("list of null equality is null (openCypher 3VL)", g,
    "RETURN ([null] = [null]) AS x", value(null))
  scenario("list equality: null element vs value is null", g,
    "RETURN ([1, null] = [1, 2]) AS x", value(null))
  scenario("list equality: definite mismatch beats null element", g,
    "RETURN ([1, null] = [2, null]) AS x", value(false))
  scenario("map equality with null values is null", g,
    "RETURN ({a: 1, b: null} = {a: 1, b: null}) AS x", value(null))
  scenario("map equality ignores key order", g,
    "RETURN ({a: 1, b: 2} = {b: 2, a: 1}) AS x", value(true))
  scenario("map equality with disjoint keys is false", g,
    "RETURN ({a: 1} = {b: 1}) AS x", value(false))
  scenario("nested list equality with null element is null", g,
    "RETURN ([[1, null]] = [[1, null]]) AS x", value(null))
  scenario("list inequality with null element is null", g,
    "RETURN ([null] <> [null]) AS x", value(null))
  scenario("map equality by key and value", g,
    "RETURN ({a: 1} = {a: 1}) AS x", value(true))
  scenario("map inequality by value", g,
    "RETURN ({a: 1} = {a: 2}) AS x", value(false))
  scenario("nested list equality", g,
    "RETURN ([[1], [2, 3]] = [[1], [2, 3]]) AS x", value(true))
  scenario("null equality is null", g, "RETURN (null = 1) AS x", value(null))
  scenario("null inequality is null", g, "RETURN (null <> 1) AS x", value(null))
  scenario("comparison chains through WHERE drop null rows", gS,
    // the s-less node's comparison is null -> filtered; all three strings
    // ('Banana' included — uppercase sorts first) are < 'z'
    "MATCH (v:S) WHERE v.s < 'z' RETURN count(*) AS x", value(3))
  scenario("IS NULL on missing property", gS,
    "MATCH (v:S) WHERE v.s IS NULL RETURN v.n AS x", value(2))
  scenario("IS NOT NULL on missing property", gS,
    "MATCH (v:S) WHERE v.s IS NOT NULL RETURN count(*) AS x", value(3))
  scenario("equality of booleans from expressions", g,
    "RETURN ((1 < 2) = (3 < 4)) AS x", value(true))
  scenario("greater-or-equal boundary", g, "RETURN (2 >= 2) AS x", value(true))
  scenario("less-or-equal with floats", g, "RETURN (2.5 <= 2.5) AS x",
    value(true))

  // ============================================ IN + three-valued logic
  scenario("IN finds a member", g, "RETURN (1 IN [1, 2]) AS x", value(true))
  scenario("IN with null element and a match is true", g,
    "RETURN (1 IN [1, null]) AS x", value(true))
  scenario("IN with null element and no match is null", g,
    "RETURN (2 IN [1, null]) AS x", value(null))
  scenario("null IN a non-empty list is null", g,
    "RETURN (null IN [1, 2]) AS x", value(null))
  scenario("null IN an empty list is false", g,
    "RETURN (null IN []) AS x", value(false))
  scenario("anything IN an empty list is false", g,
    "RETURN (1 IN []) AS x", value(false))
  scenario("IN over a list property", gS,
    "MATCH (v:S) WHERE v.n IN [1, 3] RETURN count(*) AS x", value(2))
  scenario("NOT IN filters matches", g,
    "RETURN (NOT 3 IN [1, 2]) AS x", value(true))
  scenario("IN with string members", g,
    "RETURN ('b' IN ['a', 'b']) AS x", value(true))
  scenario("IN null list is null", g, "RETURN (1 IN null) AS x", value(null))

  // ================================================== string predicates
  scenario("STARTS WITH", g, "RETURN ('abc' STARTS WITH 'ab') AS x",
    value(true))
  scenario("STARTS WITH empty string", g,
    "RETURN ('abc' STARTS WITH '') AS x", value(true))
  scenario("STARTS WITH null is null", g,
    "RETURN ('abc' STARTS WITH null) AS x", value(null))
  scenario("ENDS WITH", g, "RETURN ('abc' ENDS WITH 'bc') AS x", value(true))
  scenario("ENDS WITH mismatch", g, "RETURN ('abc' ENDS WITH 'ab') AS x",
    value(false))
  scenario("CONTAINS", g, "RETURN ('abcd' CONTAINS 'bc') AS x", value(true))
  scenario("CONTAINS empty string", g, "RETURN ('abc' CONTAINS '') AS x",
    value(true))
  scenario("CONTAINS null is null", g, "RETURN (null CONTAINS 'a') AS x",
    value(null))
  scenario("STARTS WITH on property filters rows", gS,
    "MATCH (v:S) WHERE v.s STARTS WITH 'a' RETURN v.s AS x", value("apple"))
  scenario("CONTAINS is case sensitive", gS,
    "MATCH (v:S) WHERE v.s CONTAINS 'an' RETURN v.s AS x", value("Banana"))
  scenario("regex full match semantics", g,
    "RETURN ('abc' =~ 'a.c') AS x", value(true))
  scenario("regex must match whole string", g,
    "RETURN ('abc' =~ 'b') AS x", value(false))
  scenario("regex with null pattern is null", g,
    "RETURN ('abc' =~ null) AS x", value(null))
  scenario("regex character class", g,
    "RETURN ('a1' =~ '[a-z][0-9]') AS x", value(true))

  // =========================================== string function edge cases
  scenario("substring start beyond length is empty", g,
    "RETURN substring('ab', 5) AS x", value(""))
  scenario("substring length clamped to end", g,
    "RETURN substring('hello', 1, 99) AS x", value("ello"))
  scenario("substring zero length", g,
    "RETURN substring('hello', 2, 0) AS x", value(""))
  scenario("left longer than string returns whole", g,
    "RETURN left('ab', 5) AS x", value("ab"))
  scenario("split keeps empty tokens", g,
    "RETURN split('a,b,,c', ',') AS x",
    Seq(Map("x" -> List("a", "b", "", "c"))))
  scenario("split with no separator occurrence", g,
    "RETURN split('abc', ',') AS x", Seq(Map("x" -> List("abc"))))
  scenario("replace all occurrences", g,
    "RETURN replace('aaa', 'a', 'b') AS x", value("bbb"))
  scenario("replace with empty replacement deletes", g,
    "RETURN replace('abcabc', 'b', '') AS x", value("acac"))
  scenario("reverse of a list", g, "RETURN reverse([1, 2, 3]) AS x",
    Seq(Map("x" -> List(3L, 2L, 1L))))
  scenario("reverse of empty string", g, "RETURN reverse('') AS x", value(""))
  scenario("toString of a float", g, "RETURN toString(1.5) AS x",
    value("1.5"))
  scenario("toString of a boolean", g, "RETURN toString(true) AS x",
    value("true"))
  scenario("toUpper on mixed case", gS,
    "MATCH (v:S {s: 'Banana'}) RETURN toUpper(v.s) AS x", value("BANANA"))
  scenario("string concat of two properties", g,
    "MATCH (n:A {name:'a'}), (m:B {name:'b'}) RETURN n.name + m.name AS x",
    value("ab"))
  scenario("string plus integer concatenates", g,
    "RETURN 'a' + 1 AS x", value("a1"))
  scenario("string plus float concatenates", g,
    "RETURN 'a' + 1.5 AS x", value("a1.5"))

  // ======================================= conversion function null paths
  scenario("toInteger of unparseable string is null", g,
    "RETURN toInteger('abc') AS x", value(null))
  scenario("toInteger of numeric string", g, "RETURN toInteger('  42') AS x",
    value(42))
  scenario("toFloat of unparseable string is null", g,
    "RETURN toFloat('x') AS x", value(null))
  scenario("toFloat of integer string", g, "RETURN toFloat('2') AS x",
    value(2.0))
  scenario("toBoolean of unparseable string is null", g,
    "RETURN toBoolean('nope') AS x", value(null))
  scenario("toBoolean of 'false'", g, "RETURN toBoolean('false') AS x",
    value(false))
  scenario("toInteger of null is null", g, "RETURN toInteger(null) AS x",
    value(null))

  // ======================================= quantifier / HOF edge cases
  scenario("any over empty list is false", g,
    "RETURN any(v IN [] WHERE v > 0) AS x", value(false))
  scenario("all over empty list is true", g,
    "RETURN all(v IN [] WHERE v > 0) AS x", value(true))
  scenario("none over empty list is true", g,
    "RETURN none(v IN [] WHERE v > 0) AS x", value(true))
  scenario("single over empty list is false", g,
    "RETURN single(v IN [] WHERE v > 0) AS x", value(false))
  scenario("any over null list is null", g,
    "RETURN any(v IN null WHERE v > 0) AS x", value(null))
  scenario("all over null list is null", g,
    "RETURN all(v IN null WHERE v > 0) AS x", value(null))
  scenario("any with all-null elements is null", g,
    "RETURN any(v IN [null] WHERE v > 0) AS x", value(null))
  scenario("single is false when two match", g,
    "RETURN single(v IN [1, 2] WHERE v > 0) AS x", value(false))
  scenario("comprehension over null list is null", g,
    "RETURN [v IN null WHERE v > 0] AS x", value(null))
  scenario("comprehension over empty list is empty", g,
    "RETURN [v IN [] | v] AS x", Seq(Map("x" -> List())))
  scenario("reduce over null list is null", g,
    "RETURN reduce(s = 0, v IN null | s + v) AS x", value(null))
  scenario("reduce over empty list is the initial value", g,
    "RETURN reduce(s = 42, v IN [] | s + v) AS x", value(42))
  scenario("reduce concatenates strings in order", g,
    "RETURN reduce(s = '', v IN ['x', 'y', 'z'] | s + v) AS x", value("xyz"))
  scenario("nested comprehension", g,
    "RETURN [v IN [1, 2] | [w IN [10] | v * w]] AS x",
    Seq(Map("x" -> List(List(10L), List(20L)))))
  scenario("comprehension referencing outer variable", g,
    "MATCH (n:B {name:'b'}) RETURN [v IN [1, 2] | v * n.num] AS x",
    Seq(Map("x" -> List(2L, 4L))))

  // ============================================== range / list functions
  scenario("range descending mismatch is empty", g,
    "RETURN range(2, 1) AS x", Seq(Map("x" -> List())))
  scenario("range ascending mismatch with negative step is empty", g,
    "RETURN range(1, 2, -1) AS x", Seq(Map("x" -> List())))
  scenario("range single element", g, "RETURN range(1, 1) AS x",
    Seq(Map("x" -> List(1L))))
  scenario("range equal bounds negative step", g,
    "RETURN range(0, 0, -1) AS x", Seq(Map("x" -> List(0L))))
  scenario("range inclusive upper bound", g, "RETURN range(1, 3) AS x",
    Seq(Map("x" -> List(1L, 2L, 3L))))
  scenario("range step skips past upper bound", g,
    "RETURN range(1, 6, 4) AS x", Seq(Map("x" -> List(1L, 5L))))
  scenario("list index with null index is null", g,
    "RETURN [1, 2, 3][null] AS x", value(null))
  scenario("slice with negative from", g,
    "RETURN [1, 2, 3, 4][-2..] AS x", Seq(Map("x" -> List(3L, 4L))))
  scenario("slice with negative to", g,
    "RETURN [1, 2, 3, 4][..-1] AS x", Seq(Map("x" -> List(1L, 2L, 3L))))
  scenario("slice beyond bounds clamps", g,
    "RETURN [1, 2][0..9] AS x", Seq(Map("x" -> List(1L, 2L))))
  scenario("slice crossing bounds is empty", g,
    "RETURN [1, 2, 3][2..1] AS x", Seq(Map("x" -> List())))
  scenario("tail of empty list is empty", g, "RETURN tail([]) AS x",
    Seq(Map("x" -> List())))
  scenario("last of empty list is null", g, "RETURN last([]) AS x",
    value(null))
  scenario("size of nested list counts top level", g,
    "RETURN size([[1, 2], [3]]) AS x", value(2))
  scenario("list concatenation with empty list", g,
    "RETURN [1] + [] AS x", Seq(Map("x" -> List(1L))))

  // ====================================== aggregation null / edge depth
  scenario("avg ignores nulls", gS,
    "MATCH (v:S) RETURN avg(v.n) AS x", value(2.0))
  scenario("min ignores nulls", gS,
    "MATCH (v:S) RETURN min(v.n) AS x", value(1))
  scenario("count property counts only non-null", gS,
    "MATCH (v:S) RETURN count(v.s) AS x", value(3))
  scenario("count star counts all rows", gS,
    "MATCH (v:S) RETURN count(*) AS x", value(4))
  scenario("count distinct on property with duplicates", g,
    "MATCH ()-[r:KNOWS]->() RETURN count(DISTINCT type(r)) AS x", value(1))
  scenario("collect distinct deduplicates", g,
    "UNWIND [1, 1, 2] AS v RETURN size(collect(DISTINCT v)) AS x", value(2))
  scenario("avg over empty is null", g,
    "MATCH (n:Nope) RETURN avg(n.num) AS x", value(null))
  scenario("min of string property", gS,
    "MATCH (v:S) RETURN min(v.s) AS x", value("Banana"))
  scenario("max of string property", gS,
    "MATCH (v:S) RETURN max(v.s) AS x", value("cherry"))
  scenario("sum of floats", g,
    "UNWIND [1.5, 2.5] AS v RETURN sum(v) AS x", value(4.0))
  scenario("aggregation groups on null key", gS,
    "MATCH (v:S) RETURN v.s IS NULL AS k, count(*) AS n",
    rows(Map("k" -> false, "n" -> 3), Map("k" -> true, "n" -> 1)))
  scenario("grouped aggregation with HAVING-style WITH filter", gLoops,
    "MATCH (a)-[:KNOWS]->(b) WITH a, count(*) AS c WHERE c > 1 " +
      "RETURN c AS x", value(2))
  scenario("multiple aggregates in one RETURN", g,
    "MATCH (n) RETURN count(*) AS c, min(n.num) AS lo, max(n.num) AS hi",
    rows(Map("c" -> 4, "lo" -> 1, "hi" -> 4)))
  scenario("aggregate of expression", g,
    "MATCH (n) WHERE n.num IS NOT NULL RETURN sum(n.num * 2) AS x",
    value(14))
  scenario("percentileCont midpoint", g,
    "UNWIND [1.0, 2.0, 3.0, 4.0] AS v RETURN percentileCont(v, 0.5) AS x",
    value(2.5))
  scenario("percentileDisc picks an actual element", g,
    "UNWIND [1, 2, 3, 4] AS v RETURN percentileDisc(v, 0.5) AS x", value(2))
  scenario("stDev of identical values is zero", g,
    "UNWIND [5.0, 5.0, 5.0] AS v RETURN stDev(v) AS x", value(0.0))

  // ========================== OPTIONAL MATCH null propagation / elements
  scenario("type of unmatched optional rel is null", g,
    "OPTIONAL MATCH (n:Nope)-[r:NOPE]->() RETURN type(r) AS x", value(null))
  scenario("labels of unmatched optional node is null", g,
    "OPTIONAL MATCH (n:Nope) RETURN labels(n) AS x", value(null))
  scenario("keys of unmatched optional node is null", g,
    "OPTIONAL MATCH (n:Nope) RETURN keys(n) AS x", value(null))
  scenario("properties of unmatched optional node is null", g,
    "OPTIONAL MATCH (n:Nope) RETURN properties(n) AS x", value(null))
  scenario("id of unmatched optional node is null", g,
    "OPTIONAL MATCH (n:Nope) RETURN id(n) AS x", value(null))
  scenario("startNode of unmatched optional rel is null", g,
    "OPTIONAL MATCH (n:Nope)-[r:NOPE]->() RETURN startNode(r) AS x",
    value(null))
  scenario("property access through null rel is null", g,
    "OPTIONAL MATCH (n:Nope)-[r:NOPE]->() RETURN r.since AS x", value(null))
  scenario("optional match row multiplies matched rows only", g,
    "MATCH (n:A) OPTIONAL MATCH (n)-[:KNOWS]->(m) RETURN n.name AS x, " +
      "m.name AS y",
    rows(Map("x" -> "a", "y" -> "b"), Map("x" -> "d", "y" -> null)))
  scenario("aggregation over optional nulls collects nothing", g,
    "MATCH (n:C) OPTIONAL MATCH (n)-[:KNOWS]->(m) " +
      "RETURN collect(m.name) AS x", Seq(Map("x" -> List())))
  scenario("optional then filter on optional value keeps null rows out", g,
    "MATCH (n) OPTIONAL MATCH (n)-[r:KNOWS]->() WITH n, r " +
      "WHERE r.since = 2010 RETURN n.name AS x", value("a"))

  // ===================================================== CASE / coalesce
  scenario("CASE null subject matches no WHEN (null equality)", g,
    "RETURN CASE null WHEN null THEN 1 ELSE 2 END AS x", value(2))
  scenario("CASE picks first matching WHEN", g,
    "RETURN CASE 1 WHEN 1 THEN 'one' WHEN 1 THEN 'uno' END AS x",
    value("one"))
  scenario("generic CASE evaluates conditions in order", g,
    "RETURN CASE WHEN false THEN 'f' WHEN true THEN 't' END AS x",
    value("t"))
  scenario("generic CASE null condition is not a match", g,
    "RETURN CASE WHEN null THEN 'n' ELSE 'e' END AS x", value("e"))
  scenario("coalesce skips leading nulls", g,
    "RETURN coalesce(null, null, 3) AS x", value(3))
  scenario("coalesce of all nulls is null", g,
    "RETURN coalesce(null, null) AS x", value(null))
  scenario("coalesce with property fallback", gS,
    "MATCH (v:S) RETURN coalesce(v.s, 'none') AS x",
    rows(Map("x" -> "apple"), Map("x" -> "Banana"), Map("x" -> "cherry"),
      Map("x" -> "none")))
  scenario("CASE on property buckets rows", g,
    "MATCH (n) WHERE n.num IS NOT NULL RETURN " +
      "CASE WHEN n.num < 2 THEN 'lo' ELSE 'hi' END AS k, count(*) AS n",
    rows(Map("k" -> "lo", "n" -> 1), Map("k" -> "hi", "n" -> 2)))

  // ======================================================== orderability
  scenario("ORDER BY strings ascending", gS,
    "MATCH (v:S) WHERE v.s IS NOT NULL RETURN v.s AS x ORDER BY v.s",
    rows(Map("x" -> "Banana"), Map("x" -> "apple"), Map("x" -> "cherry")),
    ordered = true)
  scenario("ORDER BY string nulls last ascending", gS,
    "MATCH (v:S) RETURN v.s AS x ORDER BY v.s",
    rows(Map("x" -> "Banana"), Map("x" -> "apple"), Map("x" -> "cherry"),
      Map("x" -> null)), ordered = true)
  scenario("ORDER BY booleans false before true", g,
    "MATCH (n) RETURN n.num > 1 AS x ORDER BY x",
    rows(Map("x" -> null), Map("x" -> false), Map("x" -> true),
      Map("x" -> true)).sortBy(m => m("x") match {
        case null => 2; case false => 0; case true => 1 }),
    ordered = false)
  scenario("ORDER BY expression not in projection", g,
    "MATCH (n) WHERE n.num IS NOT NULL RETURN n.name AS x " +
      "ORDER BY n.num DESC LIMIT 1", value("d"))
  scenario("ORDER BY aliased expression", g,
    "MATCH (n) WHERE n.num IS NOT NULL RETURN n.num * -1 AS x ORDER BY x",
    rows(Map("x" -> -4), Map("x" -> -2), Map("x" -> -1)), ordered = true)
  scenario("SKIP 0 keeps all rows", g,
    "MATCH (n) RETURN n.name AS x ORDER BY n.name SKIP 0 LIMIT 99",
    rows(Map("x" -> "a"), Map("x" -> "b"), Map("x" -> "c"), Map("x" -> "d")),
    ordered = true)
  scenario("LIMIT 0 returns no rows", g,
    "MATCH (n) RETURN n.name AS x LIMIT 0", rows())
  scenario("SKIP beyond rowcount returns empty", g,
    "MATCH (n) RETURN n.name AS x SKIP 99", rows())

  // ================================= var-length relationship uniqueness
  scenario("var-length may not reuse a relationship (cycle)", gLoops,
    // 2->3->2 uses distinct rels 23,24: allowed. A 4-hop 2->3->2->3->2
    // would need to reuse them: forbidden.
    "MATCH (a)-[:KNOWS*2..2]->(a) WHERE id(a) = 2 RETURN count(*) AS x",
    value(1))
  scenario("var-length four hops blocked by uniqueness", gLoops,
    "MATCH (a)-[:KNOWS*4..4]->(a) WHERE id(a) = 2 RETURN count(*) AS x",
    value(0))
  scenario("parallel relationships give one path each", gLoops,
    "MATCH (a)-[:KNOWS*1..1]->(b) WHERE id(a) = 1 RETURN count(*) AS x",
    value(2))
  scenario("var-length zero exact returns the start node", gChain,
    "MATCH (a:P {name:'p1'})-[:NEXT*0..0]->(b) RETURN b.name AS x",
    value("p1"))
  scenario("var-length zero-or-more up to chain end", gChain,
    "MATCH (a:P {name:'p1'})-[:NEXT*0..9]->(b) RETURN count(*) AS x",
    value(4))
  scenario("undirected var-length respects uniqueness", gChain,
    "MATCH (a:P {name:'p1'})-[:NEXT*1..2]-(b) RETURN b.name AS x",
    rows(Map("x" -> "p2"), Map("x" -> "p3")))
  scenario("var-length path length function", gChain,
    "MATCH p = (a:P {name:'p1'})-[:NEXT*2..2]->(b) RETURN length(p) AS x",
    value(2))
  scenario("nodes of a var-length path", gChain,
    "MATCH p = (a:P {name:'p1'})-[:NEXT*2..2]->(b) " +
      "RETURN size(nodes(p)) AS x", value(3))
  scenario("relationships of a zero-length path", gChain,
    "MATCH p = (a:P {name:'p1'})-[:NEXT*0..0]->(b) " +
      "RETURN size(relationships(p)) AS x", value(0))
  scenario("length of a single-hop path", gChain,
    "MATCH p = (a:P {name:'p1'})-[:NEXT]->(b) RETURN length(p) AS x",
    value(1))
  scenario("var-length respects relationship direction", gChain,
    "MATCH (a:P {name:'p4'})-[:NEXT*1..3]->(b) RETURN count(*) AS x",
    value(0))
  scenario("var-length reverse direction arrow", gChain,
    "MATCH (a:P {name:'p4'})<-[:NEXT*1..3]-(b) RETURN count(*) AS x",
    value(3))

  // =========================================== UNWIND / WITH interplay
  scenario("UNWIND list with null element keeps the null row", g,
    "UNWIND [1, null, 2] AS v RETURN v AS x",
    rows(Map("x" -> 1), Map("x" -> null), Map("x" -> 2)))
  scenario("UNWIND of maps projects fields", g,
    "UNWIND [{a: 1}, {a: 2}] AS m RETURN m.a AS x",
    rows(Map("x" -> 1), Map("x" -> 2)))
  scenario("UNWIND collect round-trip preserves multiplicity", g,
    "UNWIND [1, 1, 2] AS v WITH collect(v) AS l UNWIND l AS w " +
      "RETURN count(*) AS x", value(3))
  scenario("WITH arithmetic then RETURN", g,
    "WITH 1 AS a, 2 AS b RETURN a + b AS x", value(3))
  scenario("WITH chained renames", g,
    "WITH 1 AS a WITH a AS b WITH b AS c RETURN c AS x", value(1))
  scenario("WITH star plus new column", g,
    "MATCH (n:C) WITH *, 5 AS extra RETURN n.name AS x, extra AS y",
    rows(Map("x" -> "c", "y" -> 5)))
  scenario("UNWIND range aggregates", g,
    "UNWIND range(1, 100) AS v RETURN sum(v) AS x", value(5050))
  scenario("UNWIND inside WITH-scoped list", g,
    "WITH [10, 20] AS l UNWIND l AS v RETURN v / 10 AS x",
    rows(Map("x" -> 1), Map("x" -> 2)))
  scenario("double aggregation via two WITH", gLoops,
    "MATCH (a)-[r:KNOWS]->() WITH a, count(r) AS deg " +
      "WITH max(deg) AS m RETURN m AS x", value(2))
  scenario("WITH LIMIT then expand", g,
    "MATCH (n:A) WITH n ORDER BY n.name LIMIT 1 " +
      "MATCH (n)-[:KNOWS]->(m) RETURN m.name AS x", value("b"))

  // ==================================================== map semantics
  scenario("nested map literal access", g,
    "RETURN {a: {b: {c: 9}}}.a.b.c AS x", value(9))
  scenario("map bracket then dot access", g,
    "RETURN {a: {b: 7}}['a'].b AS x", value(7))
  scenario("map value list indexing", g,
    "RETURN {a: [1, 2]}.a[1] AS x", value(2))
  scenario("map with heterogeneous values", g,
    "RETURN {i: 1, s: 'x', b: true} AS x",
    Seq(Map("x" -> Map("i" -> 1L, "s" -> "x", "b" -> true))))
  scenario("missing map key is null", g,
    "RETURN {a: 1}.b AS x", value(null))
  scenario("map inside list inside map", g,
    "RETURN {l: [{v: 5}]}.l[0].v AS x", value(5))
  scenario("properties of a relationship", g,
    "MATCH ()-[r:KNOWS]->() WHERE r.since = 2010 " +
      "RETURN properties(r) AS x", Seq(Map("x" -> Map("since" -> 2010L))))

  // ==================================================== temporal basics
  scenario("date comparison", g,
    "RETURN (date('2020-03-01') > date('2020-02-29')) AS x", value(true))
  scenario("date accessors on leap day", g,
    "RETURN date('2020-02-29').year AS y, date('2020-02-29').month AS m, " +
      "date('2020-02-29').day AS d",
    rows(Map("y" -> 2020, "m" -> 2, "d" -> 29)))
  scenario("date equality", g,
    "RETURN (date('2021-01-01') = date('2021-01-01')) AS x", value(true))
  scenario("localdatetime ordering", g,
    "RETURN (localdatetime('2020-01-01 00:00:01') > " +
      "localdatetime('2020-01-01 00:00:00')) AS x", value(true))

  // =================================================== error scenarios
  test("[err] UNION with mismatched columns is rejected") {
    intercept[Exception] {
      session.cypher(g,
        "MATCH (n:A) RETURN n.name AS x UNION MATCH (n:B) RETURN n.name AS y")
        .collect()
    }
  }
  test("[err] unknown function is a compile error") {
    intercept[Exception] {
      session.cypher(g, "RETURN definitelyNotAFunction(1) AS x").collect()
    }
  }
  test("[err] aggregation inside WHERE is rejected") {
    intercept[Exception] {
      session.cypher(g, "MATCH (n) WHERE count(*) > 1 RETURN n").collect()
    }
  }
}
