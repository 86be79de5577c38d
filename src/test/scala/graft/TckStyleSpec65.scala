package graft

import graft.api.CypherError

/** TCK-style conformance, part 65 — round-12 probe batch 9: type
  * discipline for entity operands in both representations (id-bound
  * vars and entity-struct values).
  *
  * sum()/avg() over an entity and toString(entity) classify as type
  * errors instead of silently operating on internal ids; valueType()
  * and IS :: NODE/RELATIONSHIP report entity types for struct values.
  * min()/max() stay id-ordered (the engine's orderability stance —
  * entities are orderable by identity). */
class TckStyleSpec65 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2))),
    Seq(R(10, 1, 2, "KNOWS", Map("w" -> 5))))

  errorScenario("sum over a node is a type error", g,
    "MATCH (n:A) RETURN sum(n)",
    CypherError.TypeError, CypherError.InvalidArgumentType)
  errorScenario("avg over an unwound collected node is a type error", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m RETURN avg(m)",
    CypherError.TypeError, CypherError.InvalidArgumentType)
  errorScenario("toString of a node is a type error", g,
    "MATCH (n:A {name:'a'}) RETURN toString(n)",
    CypherError.TypeError, CypherError.InvalidArgumentType)
  errorScenario("toString of a collected relationship is a type error", g,
    "MATCH ()-[r:KNOWS]->() WITH collect(r) AS rs UNWIND rs AS e " +
      "RETURN toString(e)",
    CypherError.TypeError, CypherError.InvalidArgumentType)
  scenario("valueType of an entity-struct value is NODE", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN valueType(m) AS t", rows(Map("t" -> "NODE")))
  scenario("valueType of a collected relationship is RELATIONSHIP", g,
    "MATCH ()-[r:KNOWS]->() WITH collect(r) AS rs UNWIND rs AS e " +
      "RETURN valueType(e) AS t", rows(Map("t" -> "RELATIONSHIP")))
  scenario("IS :: NODE holds for an entity-struct value", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN m IS :: NODE AS a, m IS :: RELATIONSHIP AS b",
    rows(Map("a" -> true, "b" -> false)))
  scenario("DISTINCT over duplicated unwound entities dedups by value", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns + ns AS m " +
      "RETURN DISTINCT m.name AS nm",
    rows(Map("nm" -> "a"), Map("nm" -> "b")))
  scenario("count/collect(DISTINCT) over entity values", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns + ns AS m " +
      "RETURN count(m) AS c, size(collect(DISTINCT m)) AS s",
    rows(Map("c" -> 4, "s" -> 2)))
  scenario("entity var IN nodes(path) still id-correlates", g,
    "MATCH p = (a:A {name:'a'})-[:KNOWS]->(b) MATCH (x:A) " +
      "WHERE x IN nodes(p) RETURN x.name AS nm",
    rows(Map("nm" -> "a"), Map("nm" -> "b")))
}
