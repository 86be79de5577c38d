package graft

import graft.api.GraftSession
import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}

/** Acceptance tests over a hand-built social graph with multiple label
  * combinations — mirrors the reference's canonical fixture
  * (flink-cypher-testing/.../CAPFGraphTestData.scala:30-80): Person,
  * Person+Swedish, Person+Programmer, Book; KNOWS, READS. */
class CypherEngineSpec extends SparkTestBase {
  import spark.implicits._

  lazy val session = new GraftSession(spark)

  lazy val graph: PropertyGraph = {
    val persons = Seq((1L, "Alice", 23L), (2L, "Bob", 42L))
      .toDF("id", "name", "luckyNumber")
    val swedes = Seq((3L, "Stefan", 7L)).toDF("id", "name", "luckyNumber")
    val programmers = Seq((4L, "Carol", 13L, "Scala"))
      .toDF("id", "name", "luckyNumber", "language")
    val books = Seq((10L, "1984", 1949L), (11L, "Dune", 1965L))
      .toDF("id", "title", "year")
    val knows = Seq((100L, 1L, 2L, 2018L), (101L, 2L, 3L, 2019L),
      (102L, 3L, 4L, 2020L)).toDF("id", "src", "tgt", "since")
    val reads = Seq((200L, 1L, 10L, true), (201L, 2L, 11L, false),
      (202L, 4L, 10L, true)).toDF("id", "src", "tgt", "recommends")
    PropertyGraph(
      Seq(
        NodeTableDef(Set("Person"), persons, "id",
          Map("name" -> "name", "luckyNumber" -> "luckyNumber"), "person"),
        NodeTableDef(Set("Person", "Swedish"), swedes, "id",
          Map("name" -> "name", "luckyNumber" -> "luckyNumber"), "person"),
        NodeTableDef(Set("Person", "Programmer"), programmers, "id",
          Map("name" -> "name", "luckyNumber" -> "luckyNumber",
            "language" -> "language"), "person"),
        NodeTableDef(Set("Book"), books, "id",
          Map("title" -> "title", "year" -> "year"), "book")),
      Seq(
        RelTableDef("KNOWS", knows, "id", "src", "tgt",
          Map("since" -> "since"), "knows", "person", "person"),
        RelTableDef("READS", reads, "id", "src", "tgt",
          Map("recommends" -> "recommends"), "reads", "person", "book")))
  }

  private def run(q: String, params: Map[String, Any] = Map.empty) =
    session.cypher(graph, q, params)

  test("scan unions all label combinations") {
    assert(run("MATCH (p:Person) RETURN p.name AS name").count() === 4)
    assert(run("MATCH (p:Person:Swedish) RETURN p.name AS name")
      .collect().map(_.getString(0)).toSet === Set("Stefan"))
  }

  test("unlabeled scan covers every node table") {
    assert(run("MATCH (n) RETURN n").count() === 6)
  }

  test("label predicate in WHERE uses flag columns") {
    val got = run("MATCH (p:Person) WHERE p:Programmer RETURN p.name AS name")
      .collect().map(_.getString(0)).toSet
    assert(got === Set("Carol"))
  }

  test("labels() returns the combination") {
    val got = run("MATCH (p) WHERE p.name = 'Stefan' RETURN labels(p) AS ls")
      .collect().head.getSeq[String](0).toSet
    assert(got === Set("Person", "Swedish"))
  }

  test("property absent from one combination is null there") {
    val rows = run(
      "MATCH (p:Person) RETURN p.name AS name, p.language AS lang")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(rows("Carol") === Some("Scala"))
    assert(rows("Alice") === None)
  }

  test("expand with relationship property filter") {
    val got = run(
      "MATCH (a:Person)-[k:KNOWS]->(b:Person) WHERE k.since >= 2019 " +
        "RETURN a.name AS a, b.name AS b ORDER BY a")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("Bob", "Stefan"), ("Stefan", "Carol")))
  }

  test("type(r), startNode, endNode") {
    val got = run(
      "MATCH (a)-[r]->(b) RETURN type(r) AS t, id(a) AS s, id(b) AS e")
      .collect()
    assert(got.map(_.getString(0)).toSet === Set("KNOWS", "READS"))
    assert(got.length === 6)
  }

  test("undirected expand matches both directions") {
    val got = run(
      "MATCH (s)-[:KNOWS]-(o) WHERE s.name = 'Bob' RETURN o.name AS n")
      .collect().map(_.getString(0)).toSet
    assert(got === Set("Alice", "Stefan"))
  }

  test("var-length expand 1..3 with isomorphism") {
    val got = run(
      "MATCH (a)-[:KNOWS*1..3]->(b) WHERE a.name = 'Alice' " +
        "RETURN b.name AS n ORDER BY n")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("Bob", "Carol", "Stefan"))
  }

  test("var-length zero-length includes the start node") {
    val got = run(
      "MATCH (a)-[:KNOWS*0..1]->(b) WHERE a.name = 'Alice' " +
        "RETURN b.name AS n ORDER BY n")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("Alice", "Bob"))
  }

  test("size(r) over var-length path list") {
    val got = run(
      "MATCH (a)-[r:KNOWS*1..3]->(b) WHERE a.name = 'Alice' " +
        "RETURN b.name AS n, size(r) AS hops ORDER BY hops")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("Bob", 1L), ("Stefan", 2L), ("Carol", 3L)))
  }

  test("optional match yields nulls for non-matching rows") {
    val got = run(
      "MATCH (p:Person) OPTIONAL MATCH (p)-[:READS]->(b:Book) " +
        "RETURN p.name AS p, b.title AS t")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got === Set(("Alice", Some("1984")), ("Bob", Some("Dune")),
      ("Carol", Some("1984")), ("Stefan", None)))
  }

  test("pattern predicate (exists) and its negation") {
    assert(run("MATCH (p:Person) WHERE (p)-[:READS]->() RETURN p.name AS n")
      .count() === 3)
    assert(run("MATCH (p:Person) WHERE NOT (p)-[:READS]->() RETURN p.name AS n")
      .collect().map(_.getString(0)).toSet === Set("Stefan"))
  }

  test("aggregation with implicit grouping and DISTINCT") {
    val got = run(
      "MATCH (p:Person)-[r:READS]->(b) RETURN r.recommends AS rec, " +
        "count(*) AS n ORDER BY rec")
      .collect().map(r => (r.getBoolean(0), r.getLong(1))).toSeq
    assert(got === Seq((false, 1L), (true, 2L)))
    assert(run("MATCH (p:Person)-[:READS]->(b) RETURN DISTINCT b.title AS t")
      .count() === 2)
  }

  test("collect and unwind round-trip") {
    val got = run(
      "MATCH (p:Person) WITH collect(p.name) AS names " +
        "UNWIND names AS n RETURN n")
      .collect().map(_.getString(0)).toSet
    assert(got === Set("Alice", "Bob", "Carol", "Stefan"))
  }

  test("parameters") {
    val got = run("MATCH (p:Person) WHERE p.luckyNumber > $min " +
      "RETURN p.name AS n", Map("min" -> 20))
      .collect().map(_.getString(0)).toSet
    assert(got === Set("Alice", "Bob"))
  }

  test("WITH chaining renames and arithmetic") {
    val got = run(
      "MATCH (p:Person) WITH p.luckyNumber AS x WITH x * 2 AS y " +
        "RETURN y ORDER BY y")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(14L, 26L, 46L, 84L))
  }

  test("CASE, IN, string predicates") {
    val got = run(
      "MATCH (p:Person) RETURN p.name AS n, " +
        "CASE WHEN p.luckyNumber < 10 THEN 'small' ELSE 'big' END AS c " +
        "ORDER BY n")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("Alice", "big"), ("Bob", "big"), ("Carol", "big"),
      ("Stefan", "small")))
    assert(run("MATCH (p:Person) WHERE p.name STARTS WITH 'Al' " +
      "RETURN p.name AS n").count() === 1)
    assert(run("MATCH (p:Person) WHERE p.name IN ['Alice', 'Bob'] " +
      "RETURN p.name AS n").count() === 2)
  }

  test("union distinct vs union all") {
    assert(run("MATCH (p:Person:Swedish) RETURN p.name AS n " +
      "UNION ALL MATCH (p:Person:Swedish) RETURN p.name AS n").count() === 2)
    assert(run("MATCH (p:Person:Swedish) RETURN p.name AS n " +
      "UNION MATCH (p:Person:Swedish) RETURN p.name AS n").count() === 1)
  }

  test("returning a whole node renders id/labels/properties struct") {
    val row = run("MATCH (p:Person:Programmer) RETURN p").collect().head
    val struct = row.getStruct(0)
    assert(struct.getAs[Seq[String]]("_labels").toSet ===
      Set("Person", "Programmer"))
  }

  test("keys and properties functions") {
    val got = run("MATCH (p) WHERE p.name = 'Carol' RETURN keys(p) AS ks")
      .collect().head.getSeq[String](0).toSet
    assert(got === Set("name", "luckyNumber", "language"))
  }

  test("chained OPTIONAL MATCH keeps earlier nulls") {
    val got = run(
      "MATCH (p:Person) OPTIONAL MATCH (p)-[:READS]->(b:Book) " +
        "OPTIONAL MATCH (p)-[:KNOWS]->(q:Person) " +
        "RETURN p.name AS p, b.title AS t, q.name AS q")
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.getString(2)))).toSet
    assert(got.contains(("Stefan", None, Some("Carol"))))
    assert(got.contains(("Carol", Some("1984"), None)))
  }

  test("UNION of whole-node returns across label combos") {
    val df = run("MATCH (p:Person:Swedish) RETURN p " +
      "UNION ALL MATCH (b:Book) RETURN b AS p")
    assert(df.count() === 3)
  }

  test("exists() on property and IS NULL") {
    assert(run("MATCH (p:Person) WHERE exists(p.language) " +
      "RETURN p.name AS n").collect().map(_.getString(0)).toSet === Set("Carol"))
    assert(run("MATCH (p:Person) WHERE p.language IS NULL " +
      "RETURN p.name AS n").count() === 3)
  }
}
