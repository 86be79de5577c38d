package graft

import graft.api.GraftSession
import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}

/** Scenarios mirrored from the reference's MatchTests
  * (morpheus-testing/.../acceptance/MatchTests.scala): relationship
  * uniqueness scope, undirected cycles, undirected var-length. */
class MatchParitySpec extends SparkTestBase {
  import spark.implicits._

  lazy val session = new GraftSession(spark)

  test("cyphermorphism: rel uniqueness applies per MATCH clause, not across") {
    // MatchTests:142 — KNOWS both ways; e3 may reuse e1's relationship.
    val people = Seq((0L, "Alice"), (1L, "Bob")).toDF("id", "name")
    val knows = Seq((10L, 0L, 1L), (11L, 1L, 0L)).toDF("id", "src", "tgt")
    val g = PropertyGraph(
      Seq(NodeTableDef(Set("Person"), people, "id", Map("name" -> "name"), "n")),
      Seq(RelTableDef("KNOWS", knows, "id", "src", "tgt", Map.empty, "r", "n", "n")))
    val rows = session.cypher(g,
      """MATCH (p1:Person)-[e1:KNOWS]->(p2:Person)-[e2:KNOWS]->(p3:Person)
        |MATCH (p3)-[e3:KNOWS]->(p4:Person)
        |RETURN p1.name AS a, p2.name AS b, p3.name AS c, p4.name AS d""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows === Set(
      ("Alice", "Bob", "Alice", "Bob"),
      ("Bob", "Alice", "Bob", "Alice")))
  }

  test("undirected match binds a self-loop with the var on both ends") {
    // MatchTests:343 — only the self-loop node matches (a)--(a).
    val nodes = Seq((0L, "isA"), (1L, null.asInstanceOf[String]))
      .toDF("id", "prop")
    val aTable = nodes.filter("id = 0")
    val bTable = nodes.filter("id = 1")
    val rels = Seq((10L, 0L, 0L), (11L, 1L, 0L)).toDF("id", "src", "tgt")
    val g = PropertyGraph(
      Seq(NodeTableDef(Set("A"), aTable, "id", Map("prop" -> "prop"), "n"),
        NodeTableDef(Set("B"), bTable, "id", Map("prop" -> "prop"), "n")),
      Seq(RelTableDef("T", rels, "id", "src", "tgt", Map.empty, "r", "n", "n")))
    val rows = session.cypher(g, "MATCH (a:A)--(a) RETURN a.prop AS p")
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("isA"))
  }

  test("undirected var-length relationship walks both orientations") {
    // MatchTests:360 — a-[:T]->b<-[:T]-c; (a)-[*2..2]-(other) reaches c.
    val ns = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "prop")
    val g = PropertyGraph(
      Seq(
        NodeTableDef(Set("A"), ns.filter("id = 0"), "id", Map("prop" -> "prop"), "n"),
        NodeTableDef(Set("B"), ns.filter("id = 1"), "id", Map("prop" -> "prop"), "n"),
        NodeTableDef(Set("C"), ns.filter("id = 2"), "id", Map("prop" -> "prop"), "n")),
      Seq(RelTableDef("T", Seq((10L, 0L, 1L), (11L, 2L, 1L)).toDF("id", "src", "tgt"),
        "id", "src", "tgt", Map.empty, "r", "n", "n")))
    val rows = session.cypher(g,
      "MATCH (a:A)-[*2..2]-(other) RETURN a.prop AS ap, other.prop AS op")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("a", "c")))
  }

  test("expand-into closing a cycle through a var-length segment (LDBC shape)") {
    // ExpandIntoTests "Expand into after var expand".
    val persons = Seq((0L, "Alice"), (1L, "Bob")).toDF("id", "name")
    val comments = Seq((2L, null.asInstanceOf[String])).toDF("id", "content")
    val posts = Seq((3L, "asdf"), (4L, "foobar")).toDF("id", "content")
    val knows = Seq((10L, 0L, 1L)).toDF("id", "src", "tgt")
    val hascreator = Seq((11L, 2L, 1L), (12L, 4L, 0L)).toDF("id", "src", "tgt")
    val replyof = Seq((13L, 2L, 3L), (14L, 3L, 4L)).toDF("id", "src", "tgt")
    val g = PropertyGraph(
      Seq(NodeTableDef(Set("Person"), persons, "id", Map("name" -> "name"), "n"),
        NodeTableDef(Set("Comment"), comments, "id", Map("content" -> "content"), "n"),
        NodeTableDef(Set("Post"), posts, "id", Map("content" -> "content"), "n")),
      Seq(RelTableDef("KNOWS", knows, "id", "src", "tgt", Map.empty, "r", "n", "n"),
        RelTableDef("HASCREATOR", hascreator, "id", "src", "tgt", Map.empty, "r", "n", "n"),
        RelTableDef("REPLYOF", replyof, "id", "src", "tgt", Map.empty, "r", "n", "n")))
    val rows = session.cypher(g,
      """MATCH (p1:Person)-[e1:KNOWS]->(p2:Person),
        |      (p2)<-[e2:HASCREATOR]-(comment:Comment),
        |      (comment)-[e3:REPLYOF*1..10]->(post:Post),
        |      (p1)<-[:HASCREATOR]-(post)
        |WHERE p1.name = 'Alice'
        |RETURN p1.name AS a, p2.name AS b, post.content AS c""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows === Seq(("Alice", "Bob", "foobar")))
  }

  test("disjunction of rel types with var-length expand") {
    // MatchTests:468-style — [:X|Y*1..2] walks across both types.
    val ns = Seq((0L, "s"), (1L, "m"), (2L, "e")).toDF("id", "prop")
    val g = PropertyGraph(
      Seq(NodeTableDef(Set("N"), ns, "id", Map("prop" -> "prop"), "n")),
      Seq(
        RelTableDef("X", Seq((10L, 0L, 1L)).toDF("id", "src", "tgt"),
          "id", "src", "tgt", Map.empty, "rx", "n", "n"),
        RelTableDef("Y", Seq((11L, 1L, 2L)).toDF("id", "src", "tgt"),
          "id", "src", "tgt", Map.empty, "ry", "n", "n")))
    val rows = session.cypher(g,
      "MATCH (a:N {prop: 's'})-[:X|Y*1..2]->(b) RETURN b.prop AS p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("e", "m"))
  }
}
