package graft

/** TCK-style conformance, part 25 — list operation semantics (TCK
  * expressions/list): concatenation and element append via `+`, nested
  * list membership, negative/out-of-range/null subscripts, open and
  * clamped slices, head/last/tail on empty lists, numeric coercion in
  * list equality and IN, and range() with negative step. The mixed-type
  * IN divergence (scalar IN list-of-lists is a classified type error,
  * not false) is recorded in tck_blacklist.md. */
class TckStyleSpec25 extends TckScenarioBase {
  import TckFixtures._

  def g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a"))),
    Seq.empty)

  // ------------------------------------------------- concatenation via +
  scenario("list plus list concatenates", g,
    "RETURN [1, 2] + [3] AS x", value(Seq(1L, 2L, 3L)))
  scenario("list plus element appends", g,
    "RETURN [1, 2] + 3 AS x", value(Seq(1L, 2L, 3L)))
  scenario("element plus list prepends", g,
    "RETURN 3 + [1] AS x", value(Seq(3L, 1L)))

  // ------------------------------------------------- membership
  scenario("a list is a member of a list of lists", g,
    "RETURN [1] IN [[1]] AS x", value(true))
  scenario("a different list is not a member", g,
    "RETURN [2] IN [[1]] AS x", value(false))
  scenario("null IN an empty list is false", g,
    "RETURN null IN [] AS x", value(false))
  scenario("null IN a non-empty list is null", g,
    "RETURN (null IN [1]) IS NULL AS x", value(true))
  scenario("numeric coercion applies inside IN", g,
    "RETURN 1.0 IN [1] AS x", value(true))

  // ------------------------------------------------- subscripts
  scenario("negative index counts from the end", g,
    "RETURN [1, 2, 3][-1] AS x", value(3L))
  scenario("out-of-range index is null", g,
    "RETURN [1, 2, 3][3] IS NULL AS x", value(true))
  scenario("null index is null", g,
    "RETURN [1, 2][null] IS NULL AS x", value(true))
  scenario("a null element reads back as null", g,
    "RETURN [null][0] IS NULL AS x", value(true))
  scenario("subscripts chain through nested lists", g,
    "RETURN [[1], [2]][0][0] AS x", value(1L))

  // ------------------------------------------------- slices
  scenario("open-ended slice from an index", g,
    "RETURN [1, 2, 3][1..] AS x", value(Seq(2L, 3L)))
  scenario("slice to a negative bound", g,
    "RETURN [1, 2, 3][..-1] AS x", value(Seq(1L, 2L)))
  scenario("slice from a negative bound", g,
    "RETURN [1, 2, 3][-2..] AS x", value(Seq(2L, 3L)))
  scenario("slice clamps past the end", g,
    "RETURN [1, 2, 3][0..10] AS x", value(Seq(1L, 2L, 3L)))
  scenario("slice to zero is empty", g,
    "RETURN [1, 2, 3][..0] AS x", value(Seq.empty[Long]))
  scenario("single-element interior slice", g,
    "RETURN [1, 2, 3][1..2] AS x", value(Seq(2L)))

  // ------------------------------------------------- head / last / tail
  scenario("head of an empty list is null", g,
    "RETURN head([]) IS NULL AS x", value(true))
  scenario("last of an empty list is null", g,
    "RETURN last([]) IS NULL AS x", value(true))
  scenario("tail of a singleton is empty", g,
    "RETURN tail([1]) AS x", value(Seq.empty[Long]))

  // ------------------------------------------------- size / reverse / range
  scenario("size counts nested lists as single elements", g,
    "RETURN size([[1], [2]]) AS x", value(2L))
  scenario("size of an empty list is zero", g,
    "RETURN size([]) AS x", value(0L))
  scenario("size of null is null", g,
    "RETURN size(null) IS NULL AS x", value(true))
  scenario("reverse reverses", g,
    "RETURN reverse([1, 2]) AS x", value(Seq(2L, 1L)))
  scenario("range with a negative step descends inclusively", g,
    "RETURN range(3, 0, -1) AS x", value(Seq(3L, 2L, 1L, 0L)))

  // ------------------------------------------------- equality
  scenario("numeric coercion applies inside list equality", g,
    "RETURN [1.0] = [1] AS x", value(true))
  scenario("empty lists are equal", g,
    "RETURN [] = [] AS x", value(true))
  scenario("differing lists are unequal", g,
    "RETURN [1, 2] = [1, 3] AS x", value(false))

  // ------------------------------------------------- mixed-type IN
  // Divergence (tck_blacklist.md): openCypher evaluates 1 IN [[1]] to
  // false via elementwise incomparability; graft rejects the statically
  // mixed comparison — consistent with its heterogeneous-container
  // stance (rejecting beats silent corruption).
  errorScenario("scalar IN a list of lists is a classified type error", g,
    "RETURN 1 IN [[1]] AS x",
    graft.api.CypherError.SyntaxError,
    graft.api.CypherError.InvalidArgumentType)
}
