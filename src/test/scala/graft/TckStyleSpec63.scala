package graft

/** TCK-style conformance, part 63 — round-12 probe batch 7 findings.
  *
  * (1) Write clauses (SET / SET += / SET label / REMOVE / DELETE) accept
  *     entity-struct VALUE bindings (the collect(n)/UNWIND round-trip —
  *     Neo4j: deleting or updating an unwound collected node works): the
  *     struct's _id drives the id-keyed write machinery, and the binding's
  *     struct fields refresh in place so post-write reads observe the
  *     written values.
  * (2) The single-MATCH COLLECT { } subquery and pattern comprehensions
  *     projecting a BARE entity variable capture full entity structs
  *     (Neo4j: a comprehension of nodes yields nodes), matching
  *     collect(n); lambdas over the result read properties.
  * (3) A pattern predicate (EXISTS / WHERE-position pattern) whose inner
  *     WHERE references outer variables the pattern does not bind — an
  *     unwound entity value, or an outer entity referenced only in the
  *     WHERE — delegates to the QuerySub/CALL machinery, which imports
  *     them (the id-semi-join path cannot correlate them).
  * (4) CALL proc YIELD * binds every procedure column. */
class TckStyleSpec63 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("B"), Map("name" -> "c"))),
    Seq(R(10, 1, 2, "KNOWS", Map("w" -> 5)), R(11, 2, 3, "KNOWS", Map("w" -> 7))))

  // --- writes through entity-struct values
  scenario("SET on an unwound collected node; binding observes it", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m SET m.flag = 1 " +
      "RETURN m.name AS nm, m.flag AS f",
    rows(Map("nm" -> "a", "f" -> 1), Map("nm" -> "b", "f" -> 1)))
  scenario("SET on an unwound entity is visible to a post-write MATCH", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m SET m.flag = 1 " +
      "WITH count(*) AS c MATCH (x:A) RETURN x.name AS nm, x.flag AS f",
    rows(Map("nm" -> "a", "f" -> 1), Map("nm" -> "b", "f" -> 1)))
  scenario("SET += map on an unwound entity", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "SET m += {extra: 9} RETURN m.extra AS x, m.num AS num",
    rows(Map("x" -> 9, "num" -> 1)))
  scenario("SET label on an unwound entity refreshes labels(m)", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "SET m:Xtra RETURN labels(m) AS ls",
    rows(Map("ls" -> List("A", "Xtra"))))
  scenario("REMOVE prop on an unwound entity; keys(m) shrinks", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "REMOVE m.num RETURN m.num AS v, keys(m) AS ks",
    rows(Map("v" -> null, "ks" -> List("name"))))
  scenario("DETACH DELETE an unwound collected node", g,
    "MATCH (b:B) WITH collect(b) AS bs UNWIND bs AS m DETACH DELETE m " +
      "WITH count(*) AS c OPTIONAL MATCH (x:B) RETURN c, count(x) AS left_",
    rows(Map("c" -> 1, "left_" -> 0)))

  // --- COLLECT { } / comprehensions of bare entities
  scenario("single-MATCH COLLECT subquery yields entities", g,
    "MATCH (a:A {name:'a'}) RETURN COLLECT { MATCH (x:B) RETURN x } AS xs",
    rows(Map("xs" -> List(Map("_id" -> 3, "_labels" -> List("B"),
      "_properties" -> Map("name" -> "c"))))))
  scenario("lambda over a COLLECT subquery of entities", g,
    "MATCH (a:A {name:'a'}) WITH COLLECT { MATCH (x:A) RETURN x } AS xs " +
      "RETURN [y IN xs | y.name] AS names",
    rows(Map("names" -> List("a", "b"))))
  scenario("pattern comprehension of a bare node yields entities", g,
    "MATCH (a:A {name:'a'}) RETURN [(a)-[:KNOWS]->(b) | b] AS bs",
    rows(Map("bs" -> List(Map("_id" -> 2, "_labels" -> List("A"),
      "_properties" -> Map("name" -> "b", "num" -> 2))))))

  // --- pattern predicates correlated on outer-only WHERE refs
  scenario("EXISTS correlated on an unwound entity value", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN m.name AS nm, EXISTS { MATCH (x:A) WHERE x = m } AS e",
    rows(Map("nm" -> "a", "e" -> true), Map("nm" -> "b", "e" -> true)))
  scenario("EXISTS whose WHERE references an outer entity not in the pattern", g,
    "MATCH (n:A {name:'a'}) " +
      "RETURN EXISTS { MATCH (b:B) WHERE b.name > n.name } AS e",
    rows(Map("e" -> true)))
  scenario("negated filter-position EXISTS on an unwound entity", g,
    "MATCH (n) WITH collect(n) AS ns UNWIND ns AS m WITH m " +
      "WHERE NOT EXISTS { MATCH (x:B) WHERE x = m } RETURN count(*) AS c",
    rows(Map("c" -> 2)))

  // --- YIELD *
  scenario("CALL proc YIELD * binds all procedure columns", g,
    "CALL db.labels() YIELD * RETURN label ORDER BY label",
    rows(Map("label" -> "A"), Map("label" -> "B")), ordered = true)
}
