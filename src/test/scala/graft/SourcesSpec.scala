package graft

import graft.api.GraftSession
import graft.sources.{EdgeListSource, FsGraphSource}
import graft.tpch.TpchGraph
import graft.types._
import graft.values._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  lazy val session = new GraftSession(spark)

  test("FS graph source round-trips a graph (store + load + query)") {
    val g = TpchGraph(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft_fs").toString
    FsGraphSource.store(g, dir)
    val loaded = FsGraphSource.load(spark, dir)
    val got = session.cypher(loaded,
      "MATCH (n:Nation)-[:IN_REGION]->(r:Region) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(got === 25L)
  }

  test("FS graph source round-trips through csv, orc, and json identically") {
    val g = TpchGraph(spark, "/root/testdata/sf0.001")
    val reference = session.cypher(g,
      """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
        |RETURN r.r_name AS rn, count(*) AS n, round(sum(c.c_acctbal), 4) AS bal
        |ORDER BY rn""".stripMargin).collect().map(_.toSeq).toSeq
    for (fmt <- Seq("csv", "orc", "json")) {
      val dir = Files.createTempDirectory(s"graft_fs_$fmt").toString
      FsGraphSource.store(g, dir, fmt)
      val loaded = FsGraphSource.load(spark, dir)
      // Schema must survive type-erasing formats via the sidecar schema.
      val origSchemas = g.nodeDefs.map(d => d.df.schema).toSet
      val loadSchemas = loaded.nodeDefs.map(d => d.df.schema).toSet
      assert(loadSchemas === origSchemas, s"$fmt must round-trip types exactly")
      val got = session.cypher(loaded,
        """MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
          |RETURN r.r_name AS rn, count(*) AS n, round(sum(c.c_acctbal), 4) AS bal
          |ORDER BY rn""".stripMargin).collect().map(_.toSeq).toSeq
      assert(got === reference, s"$fmt round-trip must match parquet results")
    }
  }

  test("FS graph source rejects an unsupported format") {
    val g = TpchGraph(spark, "/root/testdata/sf0.001")
    val e = intercept[IllegalArgumentException] {
      FsGraphSource.store(g, "/tmp/never_written", "avro")
    }
    assert(e.getMessage.contains("unsupported storage format"))
  }

  test("edge list source: V nodes and E relationships") {
    val dir = Files.createTempDirectory("graft_el")
    Files.writeString(dir.resolve("graph.txt"),
      "# comment\n0 1\n1 2\n2 0\n2 3\n")
    val g = EdgeListSource.load(spark, dir.resolve("graph.txt").toString)
    assert(session.cypher(g, "MATCH (v:V) RETURN count(*) AS n")
      .collect().head.getLong(0) === 4L)
    assert(session.cypher(g, "MATCH ()-[e:E]->() RETURN count(*) AS n")
      .collect().head.getLong(0) === 4L)
    // triangle: 0->1->2->0
    assert(session.cypher(g,
      "MATCH (a)-[:E]->(b)-[:E]->(c)-[:E]->(a) RETURN count(*) AS n")
      .collect().head.getLong(0) === 3L) // each rotation of the triangle
  }

  test("driving table columns are visible as variables") {
    val g = TpchGraph(spark, "/root/testdata/sf0.001")
    val driving = Seq((0L, "even"), (1L, "odd")).toDF("rk", "parity")
    val got = session.cypher(g,
      "MATCH (r:Region) WHERE r.r_regionkey = rk " +
        "RETURN r.r_name AS name, parity ORDER BY name",
      drivingTable = Some(driving))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("AFRICA", "even"), ("AMERICA", "odd")))
  }

  test("SQL table mapping builds a graph from registered views") {
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .createOrReplaceTempView("v_nation")
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .createOrReplaceTempView("v_region")
    val g = graft.sources.SqlGraphSource.load(spark,
      Seq(
        graft.sources.SqlGraphSource.NodeMapping("v_nation", Set("Nation"), "n_nationkey"),
        graft.sources.SqlGraphSource.NodeMapping("v_region", Set("Region"), "r_regionkey")),
      Seq(graft.sources.SqlGraphSource.RelMapping("v_nation", "IN_REGION",
        "n_nationkey", "n_nationkey", "n_regionkey", "v_nation", "v_region")))
    val n = session.cypher(g,
      "MATCH (n:Nation)-[:IN_REGION]->(r:Region) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(n === 25L)
  }

  test("Graph DDL text maps tables to a queryable graph") {
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .createOrReplaceTempView("ddl_nation")
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .createOrReplaceTempView("ddl_region")
    val g = graft.sources.GraphDdl.parse(spark,
      """CREATE GRAPH (
        |  NODE (Nation) FROM ddl_nation KEY n_nationkey PROPERTIES (n_name),
        |  NODE (Region) FROM ddl_region KEY r_regionkey,  -- all columns
        |  REL IN_REGION FROM ddl_nation KEY n_nationkey
        |    SOURCE ddl_nation(n_nationkey) TARGET ddl_region(n_regionkey)
        |)""".stripMargin)
    val rows = session.cypher(g,
      "MATCH (n:Nation)-[:IN_REGION]->(r:Region) " +
        "RETURN r.r_name AS rn, count(*) AS c ORDER BY rn")
      .collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(1)).sum === 25L)
  }

  // ---- reference GraphDdlTest mirror scenarios (graph-ddl/.../GraphDdlTest.scala) ----

  private def ddlFixtures(): Unit = {
    import spark.implicits._
    Seq((1L, "Alice", 30L), (2L, "Bob", 40L))
      .toDF("person_id1", "person_name1", "age").createOrReplaceTempView("personView1")
    Seq((10L, "Carol", 50L))
      .toDF("person_id2", "person_name2", "age").createOrReplaceTempView("personView2")
    Seq((100L, "Dune"), (101L, "Emma"))
      .toDF("book_id", "book_title").createOrReplaceTempView("bookView")
    Seq((1L, 100L, 4.5), (2L, 101L, 3.0))
      .toDF("person", "book", "value1").createOrReplaceTempView("readsView1")
    Seq((10L, 100L, 5.0))
      .toDF("person", "book", "value2").createOrReplaceTempView("readsView2")
  }

  test("Graph DDL: graph type, multi-view node mappings, JOIN ON rel views " +
    "(GraphDdlTest ddlString)") {
    ddlFixtures()
    val g = graft.sources.GraphDdl.parse(spark,
      """CREATE GRAPH TYPE fooSchema (
        |  Person ( name STRING, age INTEGER ),
        |  Book   ( title STRING ),
        |  READS  ( rating FLOAT ),
        |  (Person), (Book),
        |  (Person)-[READS]->(Book)
        |)
        |CREATE GRAPH fooGraph OF fooSchema (
        |  (Person) FROM personView1 KEY person_id1 ( person_name1 AS name )
        |           FROM personView2 KEY person_id2 ( person_name2 AS name ),
        |  (Book)   FROM bookView KEY book_id ( book_title AS title ),
        |  (Person)-[READS]->(Book)
        |    FROM readsView1 e ( value1 AS rating )
        |      START NODES (Person) FROM personView1 p JOIN ON p.person_id1 = e.person
        |      END   NODES (Book)   FROM bookView    b JOIN ON e.book = b.book_id
        |    FROM readsView2 e ( value2 AS rating )
        |      START NODES (Person) FROM personView2 p JOIN ON p.person_id2 = e.person
        |      END   NODES (Book)   FROM bookView    b JOIN ON e.book = b.book_id
        |)""".stripMargin)
    val rows = session.cypher(g,
      "MATCH (p:Person)-[r:READS]->(b:Book) " +
        "RETURN p.name AS n, b.title AS t, r.rating AS v ORDER BY n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq(("Alice", "Dune", 4.5), ("Bob", "Emma", 3.0),
      ("Carol", "Dune", 5.0)))
    // column renames apply per view; age defaults to the same-named column
    val ages = session.cypher(g,
      "MATCH (p:Person) RETURN p.age AS a ORDER BY a")
      .collect().map(_.getLong(0)).toSeq
    assert(ages === Seq(30L, 40L, 50L))
  }

  test("Graph DDL: element-type inheritance carries parent labels and props " +
    "(GraphDdlTest 'schema with inherited node and edge labels')") {
    import spark.implicits._
    Seq((1L, "Ann", 95000.0), (2L, "Ben", 80000.0))
      .toDF("eid", "name", "salary").createOrReplaceTempView("employeeView")
    val g = graft.sources.GraphDdl.parse(spark,
      """CREATE ELEMENT TYPE Person ( name STRING )
        |CREATE ELEMENT TYPE Employee EXTENDS Person ( salary FLOAT )
        |CREATE GRAPH g (
        |  (Employee) FROM employeeView KEY eid
        |)""".stripMargin)
    // the Employee node type must also carry the Person label ...
    val viaParent = session.cypher(g,
      "MATCH (p:Person) RETURN p.name AS n ORDER BY n")
      .collect().map(_.getString(0)).toSeq
    assert(viaParent === Seq("Ann", "Ben"))
    // ... and the merged property set (own salary + inherited name)
    val merged = session.cypher(g,
      "MATCH (e:Employee) WHERE e.salary > 90000.0 RETURN e.name AS n")
      .collect().map(_.getString(0)).toSeq
    assert(merged === Seq("Ann"))
  }

  test("Graph DDL: local element type shadows global " +
    "(GraphDdlTest 'prefers local label over global label')") {
    import spark.implicits._
    Seq((1L, "x"), (2L, "y"))
      .toDF("id", "localprop").createOrReplaceTempView("shadowView")
    val g = graft.sources.GraphDdl.parse(spark,
      """CREATE ELEMENT TYPE Node ( globalprop STRING )
        |CREATE GRAPH TYPE t ( Node ( localprop STRING ), (Node) )
        |CREATE GRAPH g OF t (
        |  (Node) FROM shadowView KEY id
        |)""".stripMargin)
    val got = session.cypher(g,
      "MATCH (n:Node) RETURN n.localprop AS p ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("x", "y"))
  }

  test("Graph DDL failure scenarios (GraphDdlTest 'fails on ...')") {
    ddlFixtures()
    def err(ddl: String): String =
      intercept[IllegalArgumentException] {
        graft.sources.GraphDdl.parse(spark, ddl)
      }.getMessage
    // cyclic element type inheritance
    assert(err(
      """CREATE ELEMENT TYPE A EXTENDS B ( x STRING )
        |CREATE ELEMENT TYPE B EXTENDS A ( y STRING )
        |CREATE GRAPH g ( (A) FROM personView1 KEY person_id1 )""".stripMargin)
      .contains("cyclic"))
    // unresolved inherited element type
    assert(err(
      """CREATE ELEMENT TYPE A EXTENDS Nope ( x STRING )
        |CREATE GRAPH g ( (A) FROM personView1 KEY person_id1 )""".stripMargin)
      .contains("unresolved element type"))
    // unresolved graph type
    assert(err("CREATE GRAPH g OF missing ( (A) FROM personView1 KEY person_id1 )")
      .contains("unresolved graph type"))
    // node type not declared in the graph type
    assert(err(
      """CREATE GRAPH TYPE t ( Person ( name STRING ), (Person) )
        |CREATE GRAPH g OF t ( (Book) FROM bookView KEY book_id )""".stripMargin)
      .contains("not declared"))
    // conflicting property types in the inheritance hierarchy
    assert(err(
      """CREATE ELEMENT TYPE A ( x STRING )
        |CREATE ELEMENT TYPE B EXTENDS A ( x INTEGER )
        |CREATE GRAPH g ( (B) FROM personView1 KEY person_id1 )""".stripMargin)
      .contains("conflicting property types"))
  }

  test("Graph DDL: compact inline graph definition with inlined types, " +
    "<: inheritance, nullable props, element KEY clause " +
    "(GraphDdlTest 'allows compact inline graph definition')") {
    import spark.implicits._
    Seq((1L, "a1"), (2L, "a2")).toDF("id", "x").createOrReplaceTempView("cg_a")
    Seq((3L, "b3", "y3")).toDF("id", "x", "y").createOrReplaceTempView("cg_ab")
    Seq((1L, 3L)).toDF("s", "t").createOrReplaceTempView("cg_r")
    val g = graft.sources.GraphDdl.parse(spark,
      """CREATE GRAPH myGraph (
        |  A ( x STRING? ) KEY a_k (x),
        |  B <: A ( y STRING ),
        |  (A), (A, B),
        |  (A)-[R]->(B),
        |  (A)   FROM cg_a  KEY id,
        |  (B)   FROM cg_ab KEY id,
        |  (A)-[R]->(B) FROM cg_r e
        |    START NODES (A) FROM cg_a  n JOIN ON n.id = e.s
        |    END   NODES (B) FROM cg_ab n JOIN ON e.t = n.id
        |)""".stripMargin)
    // B <: A carries the A label and merged props
    val got = session.cypher(g,
      "MATCH (a:A)-[:R]->(b:B) RETURN a.x AS ax, b.x AS bx, b.y AS by")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq(("a1", "b3", "y3")))
  }

  test("Graph DDL: composite JOIN ON with AND resolves multi-column keys") {
    import spark.implicits._
    // persons keyed by pid but referenced by (first, last) in the edge view
    Seq((1L, "Ann", "Lee"), (2L, "Ann", "Roy"), (3L, "Bob", "Lee"))
      .toDF("pid", "first", "last").createOrReplaceTempView("cj_persons")
    Seq((10L, "club")).toDF("gid", "gname").createOrReplaceTempView("cj_groups")
    Seq(("Ann", "Roy", 10L), ("Bob", "Lee", 10L))
      .toDF("m_first", "m_last", "m_gid").createOrReplaceTempView("cj_members")
    val g = graft.sources.GraphDdl.parse(spark,
      """CREATE GRAPH (
        |  (Person) FROM cj_persons KEY pid,
        |  (Group)  FROM cj_groups  KEY gid,
        |  (Person)-[MEMBER_OF]->(Group) FROM cj_members e
        |    START NODES (Person) FROM cj_persons p
        |      JOIN ON p.first = e.m_first AND p.last = e.m_last
        |    END NODES (Group) FROM cj_groups gr JOIN ON gr.gid = e.m_gid
        |)""".stripMargin)
    val rows = session.cypher(g,
      "MATCH (p:Person)-[:MEMBER_OF]->(gr:Group) " +
        "RETURN p.first AS f, p.last AS l ORDER BY f")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // composite key matches Ann Roy and Bob Lee — NOT Ann Lee
    assert(rows === Seq(("Ann", "Roy"), ("Bob", "Lee")))
  }

  test("Graph DDL: backtick-quoted view names tokenize as one identifier") {
    import spark.implicits._
    Seq((1L, "v")).toDF("id", "p").createOrReplaceTempView("bt_view")
    val g = graft.sources.GraphDdl.parse(spark,
      "CREATE GRAPH ( (A) FROM `bt_view` KEY id )")
    assert(session.cypher(g, "MATCH (a:A) RETURN a.p AS p")
      .collect().map(_.getString(0)).toSeq === Seq("v"))
  }

  test("Graph DDL: unterminated backtick identifier fails loudly") {
    // ADVICE r13: the tokenizer used to run to end-of-input and swallow
    // the rest of the DDL into one identifier.
    val e = intercept[IllegalArgumentException] {
      graft.sources.GraphDdl.parse(spark,
        "CREATE GRAPH ( (A) FROM `bt_view KEY id )")
    }
    assert(e.getMessage.contains("unterminated backtick"))
  }

  test("Graph DDL: relationship label sets and unknown types are classified") {
    def err(ddl: String): String =
      intercept[IllegalArgumentException] {
        graft.sources.GraphDdl.parse(spark, ddl)
      }.getMessage
    assert(err("CREATE GRAPH TYPE t ( (A)-[R, S]->(B) )\nCREATE GRAPH g OF t ()")
      .contains("label sets"))
    assert(err("CREATE ELEMENT TYPE A ( x CHAR )\nCREATE GRAPH g ( (A) FROM v KEY id )")
      .contains("unknown property type"))
  }

  test("Graph DDL SET SCHEMA + JOIN mapping round-trips a two-table join") {
    import spark.implicits._
    // The edge table references persons by EMAIL, not by key — the JOIN
    // mapping resolves the node key through that column at load
    // (reference graph-ddl/.../GraphDdl.scala:49 JOIN syntax).
    Seq((1L, "ann@x.io", "Ann"), (2L, "bob@x.io", "Bob"))
      .toDF("pid", "email", "pname").createOrReplaceGlobalTempView("gd_persons")
    Seq((10L, "eng"), (11L, "ops"))
      .toDF("gid", "gname").createOrReplaceGlobalTempView("gd_groups")
    Seq((100L, "ann@x.io", 10L), (101L, "bob@x.io", 10L), (102L, "ann@x.io", 11L))
      .toDF("mid", "m_email", "m_gid").createOrReplaceGlobalTempView("gd_members")
    val g = graft.sources.GraphDdl.parse(spark,
      """SET SCHEMA global_temp;
        |CREATE GRAPH (
        |  NODE (Person) FROM gd_persons KEY pid PROPERTIES (pname),
        |  NODE (Group) FROM gd_groups KEY gid,
        |  REL MEMBER_OF FROM gd_members KEY mid
        |    SOURCE gd_persons(m_email JOIN email) TARGET gd_groups(m_gid)
        |)""".stripMargin)
    val rows = session.cypher(g,
      "MATCH (p:Person)-[:MEMBER_OF]->(gr:Group) " +
        "RETURN p.pname AS pn, gr.gname AS gn ORDER BY pn, gn").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("Ann", "eng"), ("Ann", "ops"), ("Bob", "eng")))
  }

  test("exactLabelMatch scans only the exact label combination") {
    import spark.implicits._
    val plain = Seq((1L, "solo")).toDF("id", "name")
    val admin = Seq((2L, "root")).toDF("id", "name")
    val g = graft.graph.PropertyGraph(Seq(
      graft.graph.NodeTableDef(Set("Person"), plain, "id",
        Map("name" -> "name"), "plain"),
      graft.graph.NodeTableDef(Set("Person", "Admin"), admin, "id",
        Map("name" -> "name"), "admin")))
    // superset matching: both tables; exact: only the bare Person table
    assert(session.nodes(g, Seq("Person")).count() === 2L)
    assert(session.nodes(g, Seq("Person"), exactLabelMatch = true).count() === 1L)
    assert(session.nodes(g, Seq("Person", "Admin"), exactLabelMatch = true)
      .count() === 1L)
    assert(g.nodeScansForExact(Seq("Person")).map(_.labels) === Seq(Set("Person")))
  }

  test("catalog stores and retrieves graphs by name") {
    val g = TpchGraph(spark, "/root/testdata/sf0.001")
    session.store("tpch", g)
    assert(session.graphByName("tpch") eq g)
  }

  test("cypherValues returns CypherMap rows with nodes") {
    val g = TpchGraph(spark, "/root/testdata/sf0.001")
    val maps = session.cypherValues(g,
      "MATCH (r:Region) RETURN r, r.r_name AS name ORDER BY name LIMIT 1")
    val node = maps.head("r").asInstanceOf[CypherNode]
    assert(node.labels === Set("Region"))
    assert(node.properties("r_name") === CypherString("AFRICA"))
    assert(maps.head("name") === CypherString("AFRICA"))
  }

  test("LOAD CSV: headers as map, headerless as list, terminator, per-row") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.write(dir.resolve("people.csv"),
      "name,age\nalice,30\nbob,25\n".getBytes)
    Files.write(dir.resolve("vals.csv"), "1;x\n2;y\n".getBytes)
    val session = new graft.api.GraftSession(spark)
    val g = graft.graph.PropertyGraph(Seq(graft.graph.NodeTableDef(
      Set("A"), Seq(1L).toDF("id"), "id", Map.empty, "a")), Seq.empty)
    val withH = session.cypher(g,
      s"LOAD CSV WITH HEADERS FROM 'file://$dir/people.csv' AS row " +
        "RETURN row.name AS name, toInteger(row.age) AS age ORDER BY age")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(withH.toSeq === Seq(("bob", 25L), ("alice", 30L)))
    val noH = session.cypher(g,
      s"LOAD CSV FROM 'file://$dir/vals.csv' AS row FIELDTERMINATOR ';' " +
        "RETURN row[0] AS a, row[1] AS b ORDER BY a")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(noH.toSeq === Seq(("1", "x"), ("2", "y")))
    // Neo4j per-row semantics: each incoming row reads the whole file.
    val perRow = session.cypher(g,
      s"UNWIND [1, 2] AS i LOAD CSV FROM 'file://$dir/vals.csv' AS row " +
        "RETURN count(*) AS n").collect().head.getLong(0)
    assert(perRow === 4L)
  }

  test("type lattice join/meet/subtype") {
    assert(CTInteger.join(CTFloat) === CTNumber)
    assert(CTInteger.join(CTNull) === CTNullable(CTInteger))
    assert(CTNode(Set("A")).join(CTNode(Set("A", "B"))) === CTNode(Set("A")))
    assert(CTNode(Set("A")).meet(CTNode(Set("B"))) === CTNode(Set("A", "B")))
    assert(CTInteger.subTypeOf(CTNumber))
    assert(!CTString.subTypeOf(CTInteger))
    assert(CTList(CTInteger).join(CTList(CTFloat)) === CTList(CTNumber))
    assert(CypherType.fromSparkType(
      org.apache.spark.sql.types.IntegerType) === CTInteger)
  }
}
