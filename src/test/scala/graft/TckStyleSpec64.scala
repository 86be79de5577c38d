package graft

/** TCK-style conformance, part 64 — round-12 probe batch 8 findings:
  * entity values in every remaining VALUE position.
  *
  * (1) UNWIND over nodes()/relationships() of a path — and over a
  *     var-length relationship-list binder — unwinds ENTITIES, not ids.
  * (2) CREATE / MERGE accept entity-struct value bindings as bound
  *     pattern endpoints (the unwound collected node as a rel endpoint).
  * (3) Entity schema unification: list literals, CASE branches,
  *     coalesce(), and entity-list concatenation compile heterogeneous
  *     entities (different label/property sets, one genre) onto the
  *     UNION property schema — absent properties read null.
  * (4) Map literals capture entity-var values as full entity structs.
  * (5) FOREACH over a collected entity list updates/deletes through the
  *     binder (was already green — pinned here). */
class TckStyleSpec64 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("B"), Map("name" -> "c"))),
    Seq(R(10, 1, 2, "KNOWS", Map("w" -> 5)), R(11, 2, 3, "KNOWS", Map("w" -> 7))))

  // --- UNWIND of path element lists
  scenario("UNWIND nodes(path) yields entities", g,
    "MATCH p = (a:A {name:'a'})-[:KNOWS*2]->() UNWIND nodes(p) AS m " +
      "RETURN m.name AS nm",
    rows(Map("nm" -> "a"), Map("nm" -> "b"), Map("nm" -> "c")))
  scenario("UNWIND relationships(path) yields entities", g,
    "MATCH p = (a:A {name:'a'})-[:KNOWS*2]->() UNWIND relationships(p) AS e " +
      "RETURN type(e) AS t, e.w AS w",
    rows(Map("t" -> "KNOWS", "w" -> 5), Map("t" -> "KNOWS", "w" -> 7)))
  scenario("UNWIND a var-length rel binder yields entities", g,
    "MATCH (a:A {name:'a'})-[rs:KNOWS*2]->() UNWIND rs AS e " +
      "RETURN e.w AS w ORDER BY w", rows(Map("w" -> 5), Map("w" -> 7)),
    ordered = true)

  // --- CREATE / MERGE endpoints from entity values
  scenario("CREATE an edge from an unwound collected node", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m " +
      "CREATE (m)-[:TAGGED]->(:Tag) WITH count(*) AS c " +
      "MATCH (:A)-[t:TAGGED]->() RETURN c, count(t) AS n",
    rows(Map("c" -> 2, "n" -> 2)))
  scenario("MERGE an edge from an unwound collected node", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "MERGE (m)-[:FLAGGED]->(:Flag) WITH count(*) AS c " +
      "MATCH (:A)-[f:FLAGGED]->() RETURN c, count(f) AS n",
    rows(Map("c" -> 1, "n" -> 1)))

  // --- entity schema unification
  scenario("list literal of heterogeneous entities unifies schemas", g,
    "MATCH (n:A {name:'a'}), (m:B) RETURN [x IN [n, m] | x.name] AS names",
    rows(Map("names" -> List("a", "c"))))
  scenario("absent property on a unified element reads null", g,
    "MATCH (n:A {name:'a'}), (m:B) RETURN [x IN [n, m] | x.num] AS nums",
    rows(Map("nums" -> List(1, null))))
  scenario("CASE selecting between entities keeps entity semantics", g,
    "MATCH (n:A {name:'a'}), (m:B) " +
      "RETURN (CASE WHEN n.num > 0 THEN n ELSE m END).name AS nm",
    rows(Map("nm" -> "a")))
  scenario("coalesce over an unmatched OPTIONAL entity falls back", g,
    "MATCH (n:A {name:'a'}) OPTIONAL MATCH (x:Missing) " +
      "RETURN coalesce(x, n).name AS nm", rows(Map("nm" -> "a")))
  scenario("entity-list concatenation across label schemas", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns MATCH (b:B) " +
      "WITH ns, collect(b) AS bs RETURN [x IN ns + bs | x.name] AS names",
    rows(Map("names" -> List("a", "c"))))

  // --- map literals
  scenario("map literal captures the entity", g,
    "MATCH (n:A {name:'a'}) WITH {node: n, tag: 'x'} AS m " +
      "RETURN m.node.name AS nm, m.tag AS t",
    rows(Map("nm" -> "a", "t" -> "x")))

  // --- FOREACH over collected entity lists
  scenario("FOREACH SET over a collected entity list", g,
    "MATCH (n:A) WITH collect(n) AS ns FOREACH (x IN ns | SET x.tag = 7) " +
      "WITH 1 AS one MATCH (y:A) RETURN y.name AS nm, y.tag AS t",
    rows(Map("nm" -> "a", "t" -> 7), Map("nm" -> "b", "t" -> 7)))
  scenario("FOREACH DETACH DELETE over a collected entity list", g,
    "MATCH (b:B) WITH collect(b) AS bs FOREACH (x IN bs | DETACH DELETE x) " +
      "WITH 1 AS one OPTIONAL MATCH (y:B) RETURN count(y) AS left_",
    rows(Map("left_" -> 0)))

  // --- indexing / slicing entity lists
  scenario("index into an ordered collected entity list", g,
    "MATCH (n:A) WITH n ORDER BY n.num WITH collect(n) AS ns " +
      "RETURN ns[1].name AS nm", rows(Map("nm" -> "b")))
  scenario("reverse of a collected entity list keeps entities", g,
    "MATCH (n:A) WITH n ORDER BY n.num WITH collect(n) AS ns " +
      "RETURN [x IN reverse(ns) | x.name] AS names",
    rows(Map("names" -> List("b", "a"))))
}
