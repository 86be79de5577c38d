package graft

import graft.api.GraftSession
import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}

/** Ternary-logic null semantics (reference NullTests analogue) and path
  * variable support. */
class NullAndPathSpec extends SparkTestBase {
  import spark.implicits._

  lazy val session = new GraftSession(spark)

  lazy val graph: PropertyGraph = {
    val people = Seq(
      (1L, Some("Ann"), Some(30L)),
      (2L, Some("Bob"), None),
      (3L, None, Some(20L))).map { case (id, n, a) =>
      (id, n.orNull, a.map(Long.box).orNull)
    }.toDF("id", "name", "age")
    val knows = Seq((10L, 1L, 2L), (11L, 2L, 3L)).toDF("id", "src", "tgt")
    PropertyGraph(
      Seq(NodeTableDef(Set("P"), people, "id",
        Map("name" -> "name", "age" -> "age"), "p")),
      Seq(RelTableDef("K", knows, "id", "src", "tgt", Map.empty,
        "k", "p", "p")))
  }

  private def run(q: String) = session.cypher(graph, q)

  test("comparison with null is null -> row filtered") {
    assert(run("MATCH (p:P) WHERE p.age > 10 RETURN p.name AS n").count() === 2)
    assert(run("MATCH (p:P) WHERE NOT p.age > 10 RETURN p.name AS n").count() === 0)
  }

  test("null-aware IS NULL / IS NOT NULL") {
    assert(run("MATCH (p:P) WHERE p.age IS NULL RETURN p.name AS n")
      .collect().head.getString(0) === "Bob")
    assert(run("MATCH (p:P) WHERE p.name IS NOT NULL RETURN count(*) AS n")
      .collect().head.getLong(0) === 2)
  }

  test("null arithmetic propagates") {
    val r = run("MATCH (p:P) RETURN p.name AS n, p.age + 1 AS a1")
      .collect().map(r => (Option(r.getString(0)), Option(r.get(1)))).toMap
    assert(r(Some("Bob")) === None)
    assert(r(Some("Ann" )) === Some(31L))
  }

  test("aggregates skip nulls; count(*) does not") {
    val r = run("MATCH (p:P) RETURN count(*) AS all, count(p.age) AS ages, " +
      "avg(p.age) AS avg_age").collect().head
    assert(r.getLong(0) === 3)
    assert(r.getLong(1) === 2)
    assert(r.getDouble(2) === 25.0)
  }

  test("coalesce and CASE over nulls") {
    val r = run("MATCH (p:P) RETURN coalesce(p.name, 'unknown') AS n, " +
      "CASE WHEN p.age IS NULL THEN -1 ELSE p.age END AS a ORDER BY n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(r === Seq(("Ann", 30L), ("Bob", -1L), ("unknown", 20L)))
  }

  test("ORDER BY puts nulls last ascending, first descending") {
    val asc = run("MATCH (p:P) RETURN p.age AS a ORDER BY a")
      .collect().map(r => Option(r.get(0)))
    assert(asc.last === None)
    val desc = run("MATCH (p:P) RETURN p.age AS a ORDER BY a DESC")
      .collect().map(r => Option(r.get(0)))
    assert(desc.head === None)
  }

  test("path variable over fixed-length pattern") {
    val r = run("MATCH p = (a:P)-[:K]->(b:P)-[:K]->(c:P) " +
      "RETURN length(p) AS len, size(nodes(p)) AS nn, " +
      "size(relationships(p)) AS nr").collect().head
    assert(r.getLong(0) === 2)
    assert(r.getLong(1) === 3)
    assert(r.getLong(2) === 2)
  }

  test("path variable over var-length pattern") {
    val rows = run("MATCH p = (a:P)-[:K*1..2]->(b:P) " +
      "WHERE a.name = 'Ann' RETURN length(p) AS len ORDER BY len")
      .collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(1L, 2L))
  }

  test("IN over empty lists and null needles (ternary logic)") {
    val r = run("RETURN 1 IN [] AS a, null IN [] AS b, null IN [1] AS c, " +
      "1 IN [null, 1] AS d, 2 IN [null, 1] AS e").collect().head
    assert(r.getBoolean(0) === false)
    assert(r.getBoolean(1) === false)
    assert(r.isNullAt(2))
    assert(r.getBoolean(3) === true)
    assert(r.isNullAt(4))
    val dyn = run("WITH [] AS xs RETURN null IN xs AS a, 3 IN xs AS b")
      .collect().head
    assert(dyn.getBoolean(0) === false && dyn.getBoolean(1) === false)
  }

  test("list concat and element append via +") {
    val r = run("RETURN size([1,2] + 3) AS a, size([1,2] + [3]) AS b, " +
      "size([] + 'x') AS c, size(1 + [2]) AS d, ([1,2] + 3)[2] AS e, " +
      "'n' + 1 AS f").collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 1L)
    assert(r.getLong(3) === 2L)
    assert(r.getLong(4) === 3L)
    assert(r.getString(5) === "n1")
  }

  test("CASE with literal-null conditions") {
    val r = run("RETURN CASE WHEN null THEN 1 ELSE 2 END AS a, " +
      "CASE null WHEN null THEN 1 ELSE 2 END AS b").collect().head
    assert(r.getLong(0) === 2L) // null condition is never taken
    assert(r.getLong(1) === 2L) // simple CASE: null = null -> null -> ELSE
  }
}
