package graft

import graft.api.CypherError._

/** TCK-style conformance, part 37 — ternary-logic equality mass (the
  * openCypher comparability semantics the reference BLACKLISTS because
  * Spark array equality treats null elements as equal; round 8 compiles
  * the 3VL answer directly, closing the divergence), IN over list/map
  * needles (defined through the same ternary equality), UNWIND boundary
  * behavior, null placement under ORDER BY, and quantifier null
  * propagation. Mirrors the TCK categories Comparability, Equality,
  * List operations (`IN`), Unwind, and Orderability
  * (reference blacklist rows: morpheus-tck/src/test/resources/
  * failing_blacklist "Comparing lists with null" family). */
class TckStyleSpec37 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  /** Nodes carrying an optional num for null-ordering scenarios. */
  def gN = graph(spark,
    Seq(N(1, Set("V"), Map("num" -> 3L)),
      N(2, Set("V"), Map("num" -> 1L)),
      N(3, Set("V"))),
    Seq.empty)

  // ======================================== ternary list equality (=)
  scenario("lists of equal values are equal", g,
    "RETURN ([1, 2, 3] = [1, 2, 3]) AS x", value(true))
  scenario("list equality: trailing null element is null", g,
    "RETURN ([1, null] = [1, null]) AS x", value(null))
  scenario("list equality: leading null element is null", g,
    "RETURN ([null, 1] = [null, 1]) AS x", value(null))
  scenario("list equality: null vs value pair is null", g,
    "RETURN ([1, null] = [1, 2]) AS x", value(null))
  scenario("list equality: definite elementwise mismatch beats null", g,
    "RETURN ([1, null] = [2, null]) AS x", value(false))
  scenario("list equality: length mismatch is false despite nulls", g,
    "RETURN ([null] = [null, null]) AS x", value(false))
  scenario("list equality: empty lists are equal", g,
    "RETURN ([] = []) AS x", value(true))
  scenario("list equality: null operand propagates", g,
    "RETURN (null = [1]) AS x", value(null))
  scenario("list equality: numeric coercion inside elements", g,
    "RETURN ([1, 2] = [1.0, 2.0]) AS x", value(true))
  scenario("nested list equality all definite", g,
    "RETURN ([[1], [2, 3]] = [[1], [2, 3]]) AS x", value(true))
  scenario("nested list equality with inner null is null", g,
    "RETURN ([[1, null]] = [[1, null]]) AS x", value(null))
  scenario("nested list equality: inner definite mismatch is false", g,
    "RETURN ([[1, null]] = [[2, null]]) AS x", value(false))
  scenario("nested list equality: inner length mismatch is false", g,
    "RETURN ([[1, null]] = [[1, null, null]]) AS x", value(false))

  // ======================================== ternary list inequality (<>)
  scenario("list inequality of equal lists is false", g,
    "RETURN ([1, 2] <> [1, 2]) AS x", value(false))
  scenario("list inequality with null element is null", g,
    "RETURN ([null] <> [null]) AS x", value(null))
  scenario("list inequality: definite mismatch is true", g,
    "RETURN ([1, null] <> [2, null]) AS x", value(true))
  scenario("list inequality: length mismatch is true", g,
    "RETURN ([1] <> [1, 2]) AS x", value(true))

  // ======================================== ternary map equality
  scenario("map equality by key and value", g,
    "RETURN ({a: 1, b: 2} = {a: 1, b: 2}) AS x", value(true))
  scenario("map equality ignores literal key order", g,
    "RETURN ({a: 1, b: 2} = {b: 2, a: 1}) AS x", value(true))
  scenario("map equality with a null value is null", g,
    "RETURN ({a: 1, b: null} = {a: 1, b: null}) AS x", value(null))
  scenario("map equality: definite value mismatch beats null", g,
    "RETURN ({a: 1, b: null} = {a: 2, b: null}) AS x", value(false))
  scenario("map equality: disjoint key sets are false", g,
    "RETURN ({a: 1} = {b: 1}) AS x", value(false))
  scenario("map equality: extra key is false", g,
    "RETURN ({a: 1} = {a: 1, b: 2}) AS x", value(false))
  scenario("map inequality with null value is null", g,
    "RETURN ({a: null} <> {a: null}) AS x", value(null))
  scenario("map with list value equality", g,
    "RETURN ({a: [1, 2]} = {a: [1, 2]}) AS x", value(true))
  scenario("map with list-containing-null value is null", g,
    "RETURN ({a: [1, null]} = {a: [1, null]}) AS x", value(null))

  // ======================================== IN over list/map needles
  scenario("list needle found exactly", g,
    "RETURN ([1, 2] IN [[1, 2]]) AS x", value(true))
  scenario("list needle absent definitely", g,
    "RETURN ([1, 2] IN [[1, 3]]) AS x", value(false))
  scenario("list needle with null element is null on match-shape", g,
    "RETURN ([1, null] IN [[1, null]]) AS x", value(null))
  scenario("list needle vs null-element candidate is null", g,
    "RETURN ([1, 2] IN [[1, null]]) AS x", value(null))
  scenario("definite hit beats a null comparison elsewhere", g,
    "RETURN ([1, 2] IN [[1, null], [1, 2]]) AS x", value(true))
  scenario("list needle in empty list is false", g,
    "RETURN ([1, 2] IN []) AS x", value(false))
  scenario("list needle against dynamic list", g,
    "WITH [[1, null], [2, 3]] AS ls RETURN ([2, 3] IN ls) AS x",
    value(true))
  scenario("dynamic: null-shape comparison poisons the miss", g,
    "WITH [[1, null], [2, 3]] AS ls RETURN ([1, 2] IN ls) AS x",
    value(null))
  scenario("dynamic: definite miss everywhere is false", g,
    "WITH [[1, null], [2, 3]] AS ls RETURN ([9, 9] IN ls) AS x",
    value(false))
  scenario("map needle found", g,
    "RETURN ({a: 1} IN [{a: 1}]) AS x", value(true))
  scenario("map needle with null value is null", g,
    "RETURN ({a: null} IN [{a: null}]) AS x", value(null))

  // ======================================== ternary list ordering (< <=)
  scenario("list ordering is lexicographic", g,
    "RETURN ([1, 2] < [1, 3]) AS x", value(true))
  scenario("shorter prefix list orders first", g,
    "RETURN ([1] < [1, null]) AS x", value(true)) // decided before the null
  scenario("definite first-element decision beats a later null", g,
    "RETURN ([2, null] < [1]) AS x", value(false))
  scenario("null pair before any decision poisons ordering", g,
    "RETURN ([1, null] < [1, 2]) AS x", value(null))
  scenario("leading null element poisons ordering", g,
    "RETURN ([null] < [1]) AS x", value(null))
  scenario("empty list orders before non-empty", g,
    "RETURN ([] < [1]) AS x", value(true))
  scenario("list less-or-equal on equal lists", g,
    "RETURN ([1, 2] <= [1, 2]) AS x", value(true))
  scenario("longer list with smaller element orders first", g,
    "RETURN ([1, 2] > [1, 1, 9]) AS x", value(true))
  scenario("nested list ordering recurses", g,
    "RETURN ([[1], [2]] < [[1], [3]]) AS x", value(true))
  scenario("nested inner decision beats inner null", g,
    "RETURN ([[1, null]] < [[2]]) AS x", value(true))
  scenario("maps are not ordered", g,
    "RETURN ({a: 1} < {a: 2}) AS x", value(null))

  // ======================================== scalar IN refresher (3VL)
  scenario("scalar IN with null element and no hit is null", g,
    "RETURN (3 IN [1, null]) AS x", value(null))
  scenario("scalar IN hit beats null element", g,
    "RETURN (3 IN [3, null]) AS x", value(true))
  scenario("null IN empty list is false", g,
    "RETURN (null IN []) AS x", value(false))
  scenario("null IN non-empty list is null", g,
    "RETURN (null IN [1, 2]) AS x", value(null))

  // ======================================== UNWIND boundaries
  scenario("UNWIND null produces no rows", g,
    "UNWIND null AS x RETURN count(*) AS x", value(0L))
  scenario("UNWIND empty list produces no rows", g,
    "UNWIND [] AS x RETURN count(*) AS x", value(0L))
  scenario("UNWIND preserves duplicates and order", g,
    "UNWIND [1, 1, 2] AS x RETURN x", rows(
      Map("x" -> 1L), Map("x" -> 1L), Map("x" -> 2L)))
  scenario("nested UNWIND flattens", g,
    "UNWIND [[1, 2], [3]] AS l UNWIND l AS x RETURN x ORDER BY x", rows(
      Map("x" -> 1L), Map("x" -> 2L), Map("x" -> 3L)), ordered = true)
  scenario("UNWIND keeps null elements as rows", g,
    "UNWIND [1, null, 2] AS x RETURN count(*) AS x", value(3L))
  errorScenario("UNWIND of a non-list is a compile-time error", g,
    // TypeError class since r13 (ADVICE r12: Neo4j raises "Expected
    // list<T>" as a type failure, not a syntax failure).
    "UNWIND 5 AS x RETURN x", TypeError, InvalidArgumentType)

  // ======================================== ORDER BY null placement
  scenario("ascending order puts nulls last", gN,
    "MATCH (v:V) RETURN v.num AS x ORDER BY x", rows(
      Map("x" -> 1L), Map("x" -> 3L), Map("x" -> null)), ordered = true)
  scenario("descending order puts nulls first", gN,
    "MATCH (v:V) RETURN v.num AS x ORDER BY x DESC", rows(
      Map("x" -> null), Map("x" -> 3L), Map("x" -> 1L)), ordered = true)
  scenario("unwound nulls order last ascending", g,
    "UNWIND [3, null, 1] AS x RETURN x ORDER BY x", rows(
      Map("x" -> 1L), Map("x" -> 3L), Map("x" -> null)), ordered = true)

  // ======================================== quantifier null propagation
  scenario("any: true element beats null element", g,
    "RETURN any(x IN [null, true] WHERE x) AS x", value(true))
  scenario("any: only null and false is null", g,
    "RETURN any(x IN [null, false] WHERE x) AS x", value(null))
  scenario("all over a null element is null", g,
    "RETURN all(x IN [null] WHERE x) AS x", value(null))
  scenario("all: false element beats null element", g,
    "RETURN all(x IN [null, false] WHERE x) AS x", value(false))
  scenario("none over a null element is null", g,
    "RETURN none(x IN [null] WHERE x) AS x", value(null))
  scenario("none: true element beats null element", g,
    "RETURN none(x IN [null, true] WHERE x) AS x", value(false))

  // ======================================== filtering on ternary results
  scenario("null-valued list equality filters the row", gN,
    "MATCH (v:V) WITH v WHERE [v.num, null] = [v.num, null] " +
      "RETURN count(*) AS x", value(0L))
  scenario("definite list equality keeps rows", gN,
    "MATCH (v:V) WHERE [v.num] = [v.num] RETURN count(*) AS x",
    value(2L)) // the num-less node compares null -> filtered
  scenario("simple CASE does not match a null candidate", g,
    "RETURN CASE null WHEN null THEN 1 ELSE 2 END AS x", value(2L))
}
