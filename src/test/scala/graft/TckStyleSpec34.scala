package graft

import graft.api.CypherError._

/** TCK-style conformance, part 34 — Neo4j 5 function-surface additions:
  * elementId (string form of the internal id), the *OrNull cast family,
  * lower/upper aliases, char_length/character_length, nullIf, and the
  * extended CASE form `WHEN v1, v2 THEN r` (value lists per alternative,
  * subject form only). */
class TckStyleSpec34 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(N(1, Set("A"), Map("name" -> "a")), N(2, Set("A"), Map("name" -> "b"))))

  scenario("elementId of a node is a string", g,
    "MATCH (n:A {name: 'a'}) RETURN elementId(n) = toString(id(n)) AS x",
    value(true))
  scenario("elementId values are distinct per node", g,
    "MATCH (n:A) RETURN count(DISTINCT elementId(n)) AS x", value(2L))
  scenario("toIntegerOrNull on an unparsable string", g,
    "RETURN toIntegerOrNull('abc') AS x", value(null))
  scenario("toIntegerOrNull on a parsable string", g,
    "RETURN toIntegerOrNull('42') AS x", value(42L))
  scenario("toFloatOrNull and toBooleanOrNull", g,
    "RETURN toFloatOrNull('1.5') AS a, toBooleanOrNull('true') AS b",
    rows(Map("a" -> 1.5, "b" -> true)))
  scenario("toStringOrNull of a number", g,
    "RETURN toStringOrNull(7) AS x", value("7"))
  scenario("lower and upper aliases", g,
    "RETURN lower('AbC') AS a, upper('abc') AS b",
    rows(Map("a" -> "abc", "b" -> "ABC")))
  scenario("char_length and character_length", g,
    "RETURN char_length('abc') AS a, character_length('') AS b",
    rows(Map("a" -> 3L, "b" -> 0L)))
  scenario("nullIf: equal values null out", g,
    "RETURN nullIf(1, 1) AS a, nullIf(1, 2) AS b, nullIf('x', 'y') AS c",
    rows(Map("a" -> null, "b" -> 1L, "c" -> "x")))
  scenario("extended CASE matches any listed value", g,
    "RETURN CASE 2 WHEN 1, 2 THEN 'low' ELSE 'high' END AS x", value("low"))
  scenario("extended CASE falls through listed values to later arms", g,
    "RETURN CASE 5 WHEN 1, 2 THEN 'low' WHEN 5 THEN 'five' END AS x",
    value("five"))
  scenario("extended CASE with no match and no ELSE is null", g,
    "RETURN CASE 9 WHEN 1, 2 THEN 'low' END AS x", value(null))
  scenario("searched CASE is unaffected by the extension", g,
    "RETURN CASE WHEN 1 < 2 THEN 'yes' ELSE 'no' END AS x", value("yes"))
  scenario("extended CASE values may be expressions", g,
    "WITH 4 AS v RETURN CASE v WHEN 1 + 1, 2 * 2 THEN 'hit' ELSE 'miss' END AS x",
    value("hit"))

  // --------------------------------------------------------- valueType
  scenario("valueType of the scalar classes", g,
    "RETURN valueType(1) AS a, valueType(1.5) AS b, valueType('x') AS c, " +
      "valueType(true) AS d",
    rows(Map("a" -> "INTEGER", "b" -> "FLOAT", "c" -> "STRING",
      "d" -> "BOOLEAN")))
  scenario("valueType of temporal values", g,
    "RETURN valueType(date('2024-01-01')) AS a, " +
      "valueType(duration({days: 1})) AS b, " +
      "valueType(localtime('09:00')) AS c, valueType(time('09:00Z')) AS d",
    rows(Map("a" -> "DATE", "b" -> "DURATION", "c" -> "LOCAL TIME",
      "d" -> "ZONED TIME")))
  scenario("valueType of composites and null", g,
    "RETURN valueType([1, 2]) AS a, valueType({k: 1}) AS b, " +
      "valueType(null) AS c",
    rows(Map("a" -> "LIST", "b" -> "MAP", "c" -> "NULL")))
  scenario("valueType reports NULL for a null-valued expression", g,
    "WITH [1, 2] AS xs RETURN valueType(xs[9]) AS x", value("NULL"))

  // --------------------------------------- COLLECT {} subqueries (Cypher 5)
  /** hub h:H with two spokes s1, s2 and an isolate i. */
  lazy val gc = graph(spark,
    Seq(N(1, Set("H"), Map("name" -> "h")),
      N(2, Set("S"), Map("name" -> "s1", "v" -> 1)),
      N(3, Set("S"), Map("name" -> "s2", "v" -> 2)),
      N(4, Set("I"), Map("name" -> "i"))),
    Seq(R(10, 1, 2, "T"), R(11, 1, 3, "T")))

  scenario("COLLECT{} gathers the correlated projection", gc,
    "MATCH (h:H) RETURN size(COLLECT { MATCH (h)-[:T]->(s) RETURN s.v }) AS x",
    value(2L))
  scenario("COLLECT{} with an inner WHERE", gc,
    "MATCH (h:H) RETURN COLLECT { MATCH (h)-[:T]->(s) WHERE s.v > 1 RETURN s.name } AS x",
    value(List("s2")))
  scenario("COLLECT{} on a row with no matches is the empty list", gc,
    "MATCH (i:I) RETURN COLLECT { MATCH (i)-[:T]->(s) RETURN s.v } AS x",
    value(List.empty[Long]))
  scenario("COLLECT{} RETURN DISTINCT dedups the list", gc,
    "MATCH (h:H) RETURN size(COLLECT { MATCH (h)-[:T]->(s) RETURN DISTINCT 'k' }) AS x",
    value(1L))
  scenario("COLLECT{} composes with reduce", gc,
    "MATCH (h:H) RETURN reduce(a = 0, v IN COLLECT { MATCH (h)-[:T]->(s) RETURN s.v } | a + v) AS x",
    value(3L))

  // ---- list coercions (Neo4j toXxxList family, round 8) ----
  scenario("toIntegerList parses and truncates strings, nulls the rest", g,
    "RETURN toIntegerList(['1', '3.7', 'x', null]) AS x",
    value(List(1L, 3L, null, null)))
  scenario("toIntegerList truncates floats toward zero", g,
    "RETURN toIntegerList([1.9, 2.1]) AS x", value(List(1L, 2L)))
  scenario("toFloatList parses float strings", g,
    "RETURN toFloatList(['1.5', 'x']) AS x", value(List(1.5, null)))
  scenario("toBooleanList accepts exactly true/false case-insensitively", g,
    "RETURN toBooleanList(['TRUE', 'no', 'false']) AS x",
    value(List(true, null, false)))
  scenario("toStringList renders numbers", g,
    "RETURN toStringList([1.5, 2.5]) AS x", value(List("1.5", "2.5")))
  scenario("toIntegerList of null is null", g,
    "RETURN toIntegerList(null) AS x", value(null))

  // ---- isEmpty + character-set trims (Neo4j 5.13, round 8) ----
  scenario("isEmpty on empty list, string and populated list", g,
    "RETURN isEmpty([]) AS a, isEmpty('') AS b, isEmpty([1]) AS c",
    rows(Map("a" -> true, "b" -> true, "c" -> false)))
  scenario("isEmpty of null is null", g,
    "RETURN isEmpty(null) AS x", value(null))
  scenario("btrim strips the character set from both ends", g,
    "RETURN btrim('xxaxx', 'x') AS x", value("a"))
  scenario("two-argument ltrim/rtrim strip one side only", g,
    "RETURN ltrim('xxab', 'x') AS a, rtrim('abxx', 'x') AS b",
    rows(Map("a" -> "ab", "b" -> "ab")))
  scenario("two-argument trim strips a set, one-argument btrim whitespace", g,
    "RETURN trim('yay', 'y') AS a, btrim('  a  ') AS b",
    rows(Map("a" -> "a", "b" -> "a")))

  // ---- vector similarity (Neo4j 5.13, [0,1]-normalised scores) ----
  scenario("vector cosine similarity: identical, orthogonal, opposite", g,
    "RETURN vector.similarity.cosine([1.0, 0.0], [1.0, 0.0]) AS a, " +
      "vector.similarity.cosine([1.0, 0.0], [0.0, 1.0]) AS b, " +
      "vector.similarity.cosine([1.0, 0.0], [-1.0, 0.0]) AS c",
    rows(Map("a" -> 1.0, "b" -> 0.5, "c" -> 0.0)))
  scenario("vector euclidean similarity: 1 over 1 + squared distance", g,
    "RETURN vector.similarity.euclidean([1.0], [1.0]) AS a, " +
      "vector.similarity.euclidean([0.0, 0.0], [3.0, 4.0]) AS b",
    rows(Map("a" -> 1.0, "b" -> 1.0 / 26.0)))

  // ---- Cypher 5 type predicates and concatenation (round 8) ----
  scenario("IS :: matches the static type; null inhabits every type", g,
    "RETURN 1 IS :: INTEGER AS a, 'x' IS :: INTEGER AS b, " +
      "null IS :: INTEGER AS c, 2 IS NOT :: STRING AS d",
    rows(Map("a" -> true, "b" -> false, "c" -> true, "d" -> true)))
  scenario("IS :: LIST element specs check the static element type", g,
    "RETURN [1] IS :: LIST<INTEGER> AS a, [1] IS :: LIST<STRING> AS b, " +
      "[1] IS :: LIST<ANY> AS c",
    rows(Map("a" -> true, "b" -> false, "c" -> true)))
  scenario("IS :: NOT NULL rejects null; element NOT NULL is dynamic", g,
    "RETURN 1 IS :: INTEGER NOT NULL AS a, " +
      "null IS :: INTEGER NOT NULL AS b, " +
      "[1, null] IS :: LIST<INTEGER NOT NULL> AS c, " +
      "[1, 2] IS :: LIST<INTEGER NOT NULL> AS d",
    rows(Map("a" -> true, "b" -> false, "c" -> false, "d" -> true)))
  scenario("bare :: is the same predicate; entities report NODE", g,
    "MATCH (v:A {name: 'a'}) RETURN 1.5 :: FLOAT AS a, " +
      "v IS :: NODE AS b, v IS :: ANY AS c",
    rows(Map("a" -> true, "b" -> true, "c" -> true)))
  scenario("|| concatenates strings and lists, null propagates", g,
    "RETURN 'a' || 'b' AS a, [1] || [2] AS b, 'a' || null AS c",
    rows(Map("a" -> "ab", "b" -> List(1L, 2L), "c" -> null)))

  // ---- extended CASE operator alternatives (Neo4j 5, round 8) ----
  scenario("CASE WHEN with comparison operators on the subject", g,
    "WITH 5 AS x RETURN CASE x WHEN > 4 THEN 'big' " +
      "WHEN <= 4 THEN 'small' END AS x", value("big"))
  scenario("CASE WHEN IS NULL matches a null subject", g,
    "WITH null AS v RETURN CASE v WHEN IS NULL THEN 'yes' " +
      "ELSE 'no' END AS x", value("yes"))
  scenario("CASE WHEN STARTS WITH / CONTAINS on the subject", g,
    "WITH 'abc' AS s RETURN CASE s WHEN STARTS WITH 'a' THEN 1 " +
      "ELSE 2 END AS x", value(1L))
  scenario("CASE mixes operator and plain-value alternatives", g,
    "WITH 'abc' AS s RETURN CASE s WHEN CONTAINS 'z', = 'abc' " +
      "THEN 'hit' END AS x", value("hit"))
  scenario("CASE WHEN IN and value lists coexist", g,
    "WITH 3 AS v RETURN CASE v WHEN 1, 2 THEN 'lo' " +
      "WHEN IN [3, 4] THEN 'mid' END AS x", value("mid"))
  scenario("CASE WHEN IS :: type predicate alternative", g,
    "WITH 3 AS v RETURN CASE v WHEN IS :: STRING THEN 'str' " +
      "ELSE 'num' END AS x", value("num"))

  // ---- FINISH (Neo4j 5.19, round 8) ----
  scenario("FINISH returns no rows from a read query", g,
    "MATCH (n:A) FINISH", Seq.empty)

  // ---- INSERT / NODETACH DELETE (Neo4j 5.18 GQL forms, round 8) ----
  scenario("INSERT creates like CREATE", g,
    "INSERT (x:Tmp {v: 41}) RETURN x.v + 1 AS x", value(42L))
  scenario("NODETACH DELETE removes an unconnected node", g,
    "CREATE (a:Tmp2 {v: 9}) WITH a NODETACH DELETE a RETURN count(*) AS x",
    value(1L))

  // ---- SQL-style TRIM forms (Cypher 5, round 8) ----
  scenario("trim with BOTH/LEADING/TRAILING ... FROM", g,
    "RETURN trim(BOTH 'x' FROM 'xxaxx') AS a, " +
      "trim(LEADING 'x' FROM 'xxa') AS b, " +
      "trim(TRAILING 'x' FROM 'axx') AS c",
    rows(Map("a" -> "a", "b" -> "a", "c" -> "a")))
  scenario("trim char-only and bare FROM forms", g,
    "RETURN trim('x' FROM 'xax') AS a, trim(FROM ' a ') AS b",
    rows(Map("a" -> "a", "b" -> "a")))

  // ---- round() explicit modes (Neo4j 4.2, round-8 fix: the mode was
  // silently ignored) ----
  scenario("round HALF_EVEN is banker's rounding", g,
    "RETURN round(2.5, 0, 'HALF_EVEN') AS a, " +
      "round(3.5, 0, 'HALF_EVEN') AS b",
    rows(Map("a" -> 2.0, "b" -> 4.0)))
  scenario("round UP/DOWN are away-from/toward zero", g,
    "RETURN round(-2.5, 0, 'UP') AS a, round(2.4, 0, 'UP') AS b, " +
      "round(2.6, 0, 'DOWN') AS c",
    rows(Map("a" -> -3.0, "b" -> 3.0, "c" -> 2.0)))
  scenario("round CEILING/FLOOR/HALF_DOWN", g,
    "RETURN round(-2.5, 0, 'CEILING') AS a, round(2.5, 0, 'FLOOR') AS b, " +
      "round(2.5, 0, 'HALF_DOWN') AS c",
    rows(Map("a" -> -2.0, "b" -> 2.0, "c" -> 2.0)))
  errorScenario("unknown round mode is a classified error", g,
    "RETURN round(2.5, 0, 'SIDEWAYS') AS x",
    ArgumentError, InvalidArgumentValue)
  scenario("randomUUID returns a 36-char string", g,
    "RETURN size(randomUUID()) AS x", value(36L))

  // ---- split: literal delimiters, delimiter lists (round-8 fix) ----
  scenario("split delimiter is literal, not a regex", g,
    "RETURN split('a.b.c', '.') AS x", value(List("a", "b", "c")))
  scenario("split accepts a list of delimiters", g,
    "RETURN split('a,b;c', [',', ';']) AS x", value(List("a", "b", "c")))
  scenario("split with a dynamic delimiter stays literal", g,
    "WITH '.' AS d RETURN split('a.b', d) AS x", value(List("a", "b")))
}
