package graft

/** TCK-style conformance, part 49 — the `%` wildcard in label and
  * relationship-type expressions (Cypher 5 LabelExpressionAcceptance):
  * `:%` is "at least one label" (a zero-label node fails it), `!%` never
  * matches, and the wildcard composes with &, |, ! and parentheses. On
  * relationships — which carry exactly one type — `%` is every type and
  * `!%` no type, reduced before the flat-form (types, complemented)
  * collapse. Also covers value-position `n:%`. */
class TckStyleSpec49 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a")),
      N(2, Set("A", "B"), Map("name" -> "ab")),
      N(3, Set("B"), Map("name" -> "b")),
      N(4, Set.empty[String], Map("name" -> "bare"))),
    Seq(
      R(10, 1, 2, "T"),
      R(11, 2, 3, "S"),
      R(12, 3, 4, "T")))

  // ----------------------------- node label wildcard
  scenario("`:%` needs at least one label", g,
    "MATCH (n:%) RETURN count(*) AS x", value(3L))
  scenario("a zero-label node fails `:%`", g,
    "MATCH (n) WHERE NOT n:% RETURN n.name AS x", value("bare"))
  scenario("`!%` matches only label-less nodes", g,
    "MATCH (n:!%) RETURN n.name AS x", value("bare"))
  scenario("wildcard conjunction with a negated atom", g,
    "MATCH (n:%&!A) RETURN n.name AS x", value("b"))
  scenario("wildcard in a disjunction is absorbing", g,
    "MATCH (n:A|%) RETURN count(*) AS x", value(3L))
  scenario("value-position wildcard check", g,
    "MATCH (n) RETURN n.name AS nm, n:% AS h ORDER BY nm",
    rows(Map("nm" -> "a", "h" -> true), Map("nm" -> "ab", "h" -> true),
      Map("nm" -> "b", "h" -> true), Map("nm" -> "bare", "h" -> false)),
    ordered = true)
  scenario("wildcard inside a CASE", g,
    "MATCH (n) RETURN count(CASE WHEN n:% THEN 1 END) AS x", value(3L))

  // ----------------------------- relationship type wildcard
  scenario("`[:%]` matches every relationship", g,
    "MATCH ()-[r:%]->() RETURN count(*) AS x", value(3L))
  scenario("`[:!%]` matches none (a rel always has a type)", g,
    "MATCH ()-[r:!%]->() RETURN count(*) AS x", value(0L))
  scenario("wildcard intersected with a type is that type", g,
    "MATCH ()-[r:%&T]->() RETURN count(*) AS x", value(2L))
  scenario("wildcard in a type union is absorbing", g,
    "MATCH ()-[r:S|%]->() RETURN count(*) AS x", value(3L))
  scenario("`!%` in a type union contributes nothing", g,
    "MATCH ()-[r:T|!%]->() RETURN count(*) AS x", value(2L))
  scenario("wildcard on a var-length hop", g,
    "MATCH (a {name: 'a'})-[:%*1..3]->(b) RETURN count(*) AS x", value(3L))
}
