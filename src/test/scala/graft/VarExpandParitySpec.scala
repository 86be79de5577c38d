package graft

import graft.api.GraftSession
import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}

/** Scenarios mirrored from the reference's BoundedVarExpandTests
  * (morpheus-testing/.../acceptance/BoundedVarExpandTests.scala): cyclic
  * graphs with edge-isomorphism, default bounds, and var-length between
  * already-bound endpoints. */
class VarExpandParitySpec extends SparkTestBase {
  import spark.implicits._

  lazy val session = new GraftSession(spark)

  // Triangle: a->b->c->a, all :Node, REL.
  lazy val cycle: PropertyGraph = {
    val nodes = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
    val rels = Seq((10L, 0L, 1L), (11L, 1L, 2L), (12L, 2L, 0L))
      .toDF("id", "src", "tgt")
    PropertyGraph(
      Seq(NodeTableDef(Set("Node"), nodes, "id", Map("v" -> "v"), "n")),
      Seq(RelTableDef("REL", rels, "id", "src", "tgt", Map.empty, "r", "n", "n")))
  }

  test("var expand with default lower bound over a loop (isomorphism caps paths)") {
    // BoundedVarExpandTests:89 — 3 starts × paths of length 1..3 = 9 rows.
    val rows = session.cypher(cycle,
      "MATCH (a:Node)-[r*..6]->(b:Node) RETURN b.v AS v")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(rows === Seq("a", "a", "a", "b", "b", "b", "c", "c", "c"))
  }

  test("var expand returns the relationship list; lengths 1..3") {
    // BoundedVarExpandTests:110 — path lists of each length per start.
    val sizes = session.cypher(cycle,
      "MATCH (a:Node)-[r*..6]->(b:Node) RETURN size(r) AS s")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(sizes === Seq(1L, 1L, 1L, 2L, 2L, 2L, 3L, 3L, 3L))
  }

  test("var expand between endpoints bound by earlier edges in the same MATCH") {
    // BoundedVarExpandTests:182 "var expand with expand into".
    val people = Seq((0L, "Philip"), (1L, "Stefan")).toDF("id", "name")
    val cities = Seq((2L, "Berlondon")).toDF("id", "name")
    val knows = Seq((20L, 0L, 1L)).toDF("id", "src", "tgt")
    val lives = Seq((21L, 0L, 2L), (22L, 1L, 2L)).toDF("id", "src", "tgt")
    val g = PropertyGraph(
      Seq(NodeTableDef(Set("Person"), people, "id", Map("name" -> "name"), "n"),
        NodeTableDef(Set("City"), cities, "id", Map("name" -> "name"), "n")),
      Seq(RelTableDef("KNOWS", knows, "id", "src", "tgt", Map.empty, "r", "n", "n"),
        RelTableDef("LIVES_IN", lives, "id", "src", "tgt", Map.empty, "r", "n", "n")))
    val rows = session.cypher(g,
      """MATCH (a:Person)-[:LIVES_IN]->(c:City)<-[:LIVES_IN]-(b:Person),
        |(a)-[:KNOWS*1..2]->(b) RETURN a.name AS an, b.name AS bn, c.name AS cn""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows === Seq(("Philip", "Stefan", "Berlondon")))
  }

  test("zero-length bound explicitly pairs each node with itself") {
    // BoundedVarExpandTests:36 — *0..0 returns each node paired with itself.
    val rows = session.cypher(cycle,
      "MATCH (a:Node)-[r*0..0]->(b:Node) RETURN a.v AS av, b.v AS bv")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(rows === Seq(("a", "a"), ("b", "b"), ("c", "c")))
  }
}
