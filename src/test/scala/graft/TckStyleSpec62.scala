package graft

/** TCK-style conformance, part 62 — round-12 probe batch 6 findings.
  *
  * (1) collect(n) over an ENTITY variable captures the full entity
  *     (identity + labels/type/endpoints + properties) instead of a bare
  *     id, so the element survives list machinery and UNWIND as an
  *     entity value: property access, id()/labels()/type()/keys()/
  *     properties()/startNode()/endNode(), lambdas, DISTINCT, ordered
  *     collect, and rendering all behave as if the entity were bound by
  *     MATCH. Entity equality and IN membership normalize to identity
  *     (_id) across the two representations.
  * (2) Clock-namespace temporal constructors (Neo4j transaction/
  *     statement/realtime clocks) for all five temporal types — the
  *     engine is a one-statement library call, so all three clocks are
  *     the same statement clock.
  * (3) keys(properties(n)) — properties() is now statically typed, so
  *     keys()/field access over it compile. */
class TckStyleSpec62 extends TckScenarioBase {
  import TckFixtures._

  lazy val g = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("A"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("B"), Map("name" -> "c"))),
    Seq(R(10, 1, 2, "KNOWS", Map("w" -> 5)), R(11, 2, 3, "KNOWS", Map("w" -> 7))))

  // --- collect(entity) round-trips
  scenario("collected nodes unwind back to entities", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m RETURN m.name AS nm",
    rows(Map("nm" -> "a"), Map("nm" -> "b")))
  scenario("id/labels of an unwound collected node", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN id(m) = id(m) AS idok, labels(m) AS ls",
    rows(Map("idok" -> true, "ls" -> List("A"))))
  scenario("keys/properties of an unwound collected node", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns UNWIND ns AS m " +
      "RETURN keys(m) AS ks, properties(m) AS ps",
    rows(Map("ks" -> List("name", "num"),
      "ps" -> Map("name" -> "a", "num" -> 1))))
  scenario("collected relationships keep type and properties", g,
    "MATCH ()-[r:KNOWS]->() WITH collect(r) AS rs UNWIND rs AS e " +
      "RETURN type(e) AS t, e.w AS w",
    rows(Map("t" -> "KNOWS", "w" -> 5), Map("t" -> "KNOWS", "w" -> 7)))
  scenario("startNode/endNode of a collected relationship", g,
    "MATCH ()-[r:KNOWS {w: 5}]->() WITH collect(r) AS rs UNWIND rs AS e " +
      "MATCH (x) WHERE id(x) = startNode(e) RETURN x.name AS nm",
    rows(Map("nm" -> "a")))
  scenario("lambda over a collected entity list reads properties", g,
    "MATCH (n:A) WITH collect(n) AS ns " +
      "RETURN [x IN ns WHERE x.num > 1 | x.name] AS names",
    rows(Map("names" -> List("b"))))
  scenario("ordered collect keeps entity order", g,
    "MATCH (n:A) WITH n ORDER BY n.num DESC WITH collect(n) AS ns " +
      "RETURN [x IN ns | x.name] AS names",
    rows(Map("names" -> List("b", "a"))))
  scenario("head(collect(n)).prop", g,
    "MATCH (n:A) WITH n ORDER BY n.num WITH collect(n) AS ns " +
      "RETURN head(ns).name AS nm", rows(Map("nm" -> "a")))
  scenario("collect(DISTINCT n) dedups by entity", g,
    "MATCH (n:A)-[:KNOWS]->() WITH collect(DISTINCT n) AS ns " +
      "RETURN size(ns) AS s", rows(Map("s" -> 2)))
  scenario("entity IN collected list is identity membership", g,
    "MATCH (n:A {name:'a'}) WITH n MATCH (m:A) WITH n, collect(m) AS ms " +
      "RETURN n IN ms AS has", rows(Map("has" -> true)))
  scenario("unwound entity equals a matched entity by identity", g,
    "MATCH (n:A) WITH collect(n) AS ns UNWIND ns AS m " +
      "MATCH (x:A {name:'a'}) WHERE m = x RETURN m.name AS nm",
    rows(Map("nm" -> "a")))
  scenario("RETURN collect(n) renders entity structs", g,
    "MATCH (n:A {name:'a'}) RETURN collect(n) AS ns",
    rows(Map("ns" -> List(Map("_id" -> 1, "_labels" -> List("A"),
      "_properties" -> Map("name" -> "a", "num" -> 1))))))
  scenario("unwound collected entity renders like a matched one", g,
    "MATCH (n:A {name:'a'}) WITH collect(n) AS ns UNWIND ns AS m RETURN m",
    rows(Map("m" -> Map("_id" -> 1, "_labels" -> List("A"),
      "_properties" -> Map("name" -> "a", "num" -> 1)))))

  // --- clock-namespace temporal constructors
  scenario("datetime.statement advances with the clock", g,
    "RETURN datetime.statement() >= datetime('2000-01-01T00:00:00') AS ok",
    rows(Map("ok" -> true)))
  scenario("date.realtime is a date", g,
    "RETURN date.realtime() >= date('2000-01-01') AS ok",
    rows(Map("ok" -> true)))
  scenario("localtime/time clocks exist (timezone arg tolerated)", g,
    "RETURN localtime.statement() IS NOT NULL AS a, " +
      "time.transaction('UTC') IS NOT NULL AS b, " +
      "localdatetime.realtime() IS NOT NULL AS c",
    rows(Map("a" -> true, "b" -> true, "c" -> true)))

  // --- keys/properties composition
  scenario("keys of properties of an entity", g,
    "MATCH (n:A {name:'a'}) RETURN keys(properties(n)) AS ks",
    rows(Map("ks" -> List("name", "num"))))
}
