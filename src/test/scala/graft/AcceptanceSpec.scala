package graft

import graft.api.GraftSession
import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}

/** Compact port of representative behaviors from the reference's acceptance
  * suites (morpheus-testing/.../impl/acceptance/: Aggregation, Expression,
  * With, Predicate, Return, Union, Unwind tests) — value-level assertions
  * on a small inline graph. */
class AcceptanceSpec extends SparkTestBase {
  import spark.implicits._

  lazy val session = new GraftSession(spark)

  lazy val graph: PropertyGraph = {
    val vals = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 4L))
      .toDF("id", "val")
    val links = Seq((10L, 1L, 2L), (11L, 2L, 3L), (12L, 1L, 3L),
      (13L, 3L, 4L)).toDF("id", "src", "tgt")
    PropertyGraph(
      Seq(NodeTableDef(Set("N"), vals, "id", Map("val" -> "val"), "n")),
      Seq(RelTableDef("L", links, "id", "src", "tgt", Map.empty, "l", "n", "n")))
  }

  private def one(q: String): Any =
    session.cypher(graph, q).collect().head.get(0)
  private def col0(q: String): Seq[Any] =
    session.cypher(graph, q).collect().toSeq.map(_.get(0))

  // --- Aggregation ---
  test("avg/sum/min/max/count over vals") {
    assert(one("MATCH (n:N) RETURN avg(n.val) AS a") === 4.0)
    assert(one("MATCH (n:N) RETURN sum(n.val) AS s") === 16L)
    assert(one("MATCH (n:N) RETURN min(n.val) AS m") === 2L)
    assert(one("MATCH (n:N) RETURN max(n.val) AS m") === 6L)
    assert(one("MATCH (n:N) RETURN count(DISTINCT n.val) AS c") === 3L)
  }

  test("collect returns all values; collect distinct dedupes") {
    assert(col0("MATCH (n:N) RETURN collect(n.val) AS c")
      .head.asInstanceOf[scala.collection.Seq[Long]].toSeq.sorted ===
      Seq(2L, 4L, 4L, 6L))
    assert(col0("MATCH (n:N) RETURN collect(DISTINCT n.val) AS c")
      .head.asInstanceOf[scala.collection.Seq[Long]].toSeq.sorted ===
      Seq(2L, 4L, 6L))
  }

  test("grouped aggregation with expression keys") {
    val rows = session.cypher(graph,
      "MATCH (n:N) RETURN n.val % 4 AS k, count(*) AS c ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((0L, 2L), (2L, 2L)))
  }

  // --- Expression ---
  test("arithmetic precedence and literals") {
    assert(one("RETURN 2 + 3 * 4 AS x") === 14L)
    assert(one("RETURN (2 + 3) * 4 AS x") === 20L)
    assert(one("RETURN 2 ^ 3 AS x") === 8.0)
    assert(one("RETURN 7 / 2 AS x") === 3L)   // integer division
    assert(one("RETURN 7.0 / 2 AS x") === 3.5)
    assert(one("RETURN 7 % 3 AS x") === 1L)
    assert(one("RETURN -(-5) AS x") === 5L)
  }

  test("string operations") {
    assert(one("RETURN 'a' + 'b' AS x") === "ab")
    assert(one("RETURN toUpper('ab') + toLower('CD') AS x") === "ABcd")
    assert(one("RETURN substring('hello', 1, 3) AS x") === "ell")
    assert(one("RETURN split('a,b,c', ',') AS x") === Seq("a", "b", "c"))
    assert(one("RETURN reverse('abc') AS x") === "cba")
    assert(one("RETURN trim('  x  ') AS x") === "x")
    assert(one("RETURN toString(42) AS x") === "42")
  }

  test("list expressions") {
    assert(one("RETURN [1,2,3][0] AS x") === 1L)
    assert(one("RETURN [1,2,3][-1] AS x") === 3L)
    assert(one("RETURN [1,2,3,4][1..3] AS x") === Seq(2L, 3L))
    assert(one("RETURN size([1,2,3]) AS x") === 3L)
    assert(one("RETURN head([7,8]) AS x") === 7L)
    assert(one("RETURN last([7,8]) AS x") === 8L)
    assert(one("RETURN range(1, 4) AS x") === Seq(1L, 2L, 3L, 4L))
    assert(one("RETURN range(0, 10, 5) AS x") === Seq(0L, 5L, 10L))
    assert(one("RETURN 1 IN [1,2] AS x") === true)
    assert(one("RETURN [x IN range(1,5) WHERE x % 2 = 0 | x * x] AS r") ===
      Seq(4L, 16L))
    assert(one("RETURN reduce(acc = 0, x IN [1,2,3] | acc + x) AS r") === 6L)
    assert(one("RETURN any(x IN [1,2] WHERE x > 1) AS r") === true)
    assert(one("RETURN all(x IN [1,2] WHERE x > 1) AS r") === false)
    assert(one("RETURN none(x IN [1,2] WHERE x > 5) AS r") === true)
    assert(one("RETURN single(x IN [1,2] WHERE x = 2) AS r") === true)
  }

  test("boolean expressions and comparisons") {
    assert(one("RETURN true AND false OR true AS x") === true)
    assert(one("RETURN true XOR true AS x") === false)
    assert(one("RETURN NOT false AS x") === true)
    assert(one("RETURN 1 < 2 AS x") === true)
    assert(one("RETURN 'abc' STARTS WITH 'ab' AS x") === true)
    assert(one("RETURN 'abc' ENDS WITH 'bc' AS x") === true)
    assert(one("RETURN 'abc' CONTAINS 'b' AS x") === true)
    assert(one("RETURN 'abc' =~ 'a.c' AS x") === true)
    assert(one("RETURN 'abcd' =~ 'a.c' AS x") === false) // full match
  }

  test("maps") {
    assert(one("RETURN {a: 1, b: 'x'}.a AS x") === 1L)
    assert(one("RETURN {a: {b: 2}}.a.b AS x") === 2L)
  }

  // --- With ---
  test("WITH pipelines restrict scope") {
    val e = intercept[Exception] {
      session.cypher(graph,
        "MATCH (n:N) WITH n.val AS v RETURN n.val AS x").collect()
    }
    assert(e.getMessage.contains("unknown variable") ||
      e.getMessage.toLowerCase.contains("unresolved"))
  }

  test("WITH DISTINCT then aggregate") {
    assert(one("MATCH (n:N) WITH DISTINCT n.val AS v RETURN count(*) AS c") === 3L)
  }

  test("WITH ORDER BY LIMIT then continue") {
    // top node by val is id 3 (val 6); it has two incoming :L edges
    assert(one("MATCH (n:N) WITH n ORDER BY n.val DESC LIMIT 1 " +
      "MATCH (m:N)-[:L]->(n) RETURN count(*) AS c") === 2L)
  }

  // --- Predicate ---
  test("predicate connectives over pattern") {
    assert(one("MATCH (a:N)-[:L]->(b:N) WHERE a.val < b.val RETURN count(*) AS c") === 3L)
    assert(one("MATCH (a:N) WHERE a.val = 2 OR a.val = 6 RETURN count(*) AS c") === 2L)
  }

  // --- Union / Unwind ---
  test("unwind over collected list") {
    assert(col0("MATCH (n:N) WITH collect(n.val) AS vs UNWIND vs AS v " +
      "RETURN v ORDER BY v") === Seq(2L, 4L, 4L, 6L))
  }

  test("double unwind is a cross product") {
    assert(one("UNWIND [1,2] AS a UNWIND [10,20] AS b " +
      "RETURN count(*) AS c") === 4L)
  }

  test("union dedupe vs union all") {
    assert(col0("RETURN 1 AS x UNION RETURN 1 AS x").length === 1)
    assert(col0("RETURN 1 AS x UNION ALL RETURN 1 AS x").length === 2)
  }

  // --- Return ---
  test("RETURN * returns all variables") {
    val df = session.cypher(graph, "MATCH (a:N)-[r:L]->(b:N) RETURN *")
    assert(df.columns.toSet === Set("a", "b", "r"))
    assert(df.count() === 4)
  }

  test("map projection") {
    val r = session.cypher(graph,
      "MATCH (n:N) WHERE n.val = 6 RETURN n {.val, doubled: n.val * 2} AS m")
      .collect().head.getStruct(0)
    assert(r.getAs[Long]("val") === 6L)
    assert(r.getAs[Long]("doubled") === 12L)
    val all = session.cypher(graph,
      "MATCH (n:N) WHERE n.val = 2 RETURN n {.*} AS m")
      .collect().head.getStruct(0)
    assert(all.getAs[Long]("val") === 2L)
  }

  test("session-registered extension functions") {
    session.registerFunction("cube", args => args.head * args.head * args.head)
    assert(one("RETURN cube(3) AS x") === 27L)
  }

  test("aggregates over node variables (count/collect by id)") {
    assert(one("MATCH (n:N) RETURN count(n) AS c") === 4L)
    assert(one("MATCH (n:N) RETURN count(DISTINCT n) AS c") === 4L)
    assert(one("MATCH (n:N)-[:L]->(m:N) RETURN count(DISTINCT m) AS c") === 3L)
    assert(one("MATCH (n:N) WITH collect(n) AS ns RETURN size(ns) AS c") === 4L)
  }

  test("LIMIT 0 returns empty with schema") {
    val df = session.cypher(graph, "MATCH (n:N) RETURN n.val AS v LIMIT 0")
    assert(df.count() === 0)
    assert(df.columns.toSeq === Seq("v"))
  }

  test("SHOW PROCEDURES / SHOW FUNCTIONS list the session registries") {
    val procs = session.cypher(graph, "SHOW PROCEDURES")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(procs.map(_._1).toSet.contains("pagerank"))
    assert(procs.map(_._1).toSet.contains("db.labels"))
    assert(procs.forall(_._2 == "READ"))
    assert(procs.map(_._1).toSeq === procs.map(_._1).toSeq.sorted)
    // User registrations surface immediately; built-in scalar functions
    // compile in ExprCompiler (no runtime registry) and are out of scope
    // here — the divergence is recorded in tck_blacklist.md.
    session.registerFunction("sq_show_test", args => args.head * args.head)
    val fns = session.cypher(graph, "SHOW FUNCTIONS")
      .collect().map(_.getString(0)).toSeq
    assert(fns.contains("sq_show_test"))
  }

  test("index DDL is a no-op; constraint DDL refuses with a classified error") {
    // Indexes are performance-only (Catalyst plans; same stance as the
    // discarded USING hints) -> honest no-op. Constraints are enforcement
    // -> refusing beats silently not enforcing.
    assert(session.cypher(graph,
      "CREATE INDEX ix IF NOT EXISTS FOR (n:N) ON (n.val)").count() === 0L)
    assert(session.cypher(graph, "DROP INDEX ix IF EXISTS").count() === 0L)
    val e = intercept[graft.api.CypherException] {
      session.cypher(graph,
        "CREATE CONSTRAINT c FOR (n:N) REQUIRE n.val IS UNIQUE")
    }
    assert(e.detail === graft.api.CypherError.UnsupportedExpression)
    // r13: the inventory pass of a migration script — indexes are no-ops
    // and constraints refuse at CREATE, so both listings are always empty
    assert(session.cypher(graph, "SHOW INDEXES").count() === 0L)
    assert(session.cypher(graph, "SHOW ALL CONSTRAINTS").count() === 0L)
    assert(session.cypher(graph, "SHOW INDEXES").columns.toSeq ===
      Seq("name", "type", "labelsOrTypes", "properties"))
    // DROP CONSTRAINT: IF EXISTS tolerates the necessarily-missing
    // constraint; the bare form raises like Neo4j's unknown-name error
    assert(session.cypher(graph, "DROP CONSTRAINT c IF EXISTS").count() === 0L)
    val e2 = intercept[graft.api.CypherException] {
      session.cypher(graph, "DROP CONSTRAINT c")
    }
    assert(e2.getMessage.contains("no such constraint"))
  }

  test("db.* schema introspection procedures") {
    val labels = session.cypher(graph,
      "CALL db.labels() YIELD label RETURN label ORDER BY label")
      .collect().map(_.getString(0)).toSeq
    assert(labels === Seq("N"))
    val rts = session.cypher(graph,
      "CALL db.relationshipTypes() YIELD relationshipType RETURN relationshipType")
      .collect().map(_.getString(0)).toSeq
    assert(rts === Seq("L"))
    val keys = session.cypher(graph,
      "CALL db.propertyKeys() YIELD propertyKey RETURN propertyKey")
      .collect().map(_.getString(0)).toSet
    assert(keys.contains("val"))
    val ntp = session.cypher(graph,
      "CALL db.schema.nodeTypeProperties() " +
        "YIELD nodeType, propertyName, mandatory RETURN *").collect()
    assert(ntp.exists(r => r.getAs[String]("nodeType") == ":`N`" &&
      r.getAs[String]("propertyName") == "val"))
    val rtp = session.cypher(graph,
      "CALL db.schema.relTypeProperties() YIELD relType RETURN relType")
      .collect().map(_.getString(0)).toSet
    assert(rtp === Set(":`L`"))
  }

  test("algorithm procedures via CALL: kcore/ktruss/betweenness/hits/labelprop/assortativity/neighborhood") {
    // fixture: triangle 1-2-3 with pendant 4 hanging off 3
    val core = session.cypher(graph,
      "CALL kcore(2) YIELD id, degree RETURN id, degree").collect()
    assert(core.length === 3) // the 2-core is the triangle
    assert(core.forall(_.getLong(1) === 2L))
    assert(session.cypher(graph,
      "CALL ktruss(3) YIELD a, b RETURN count(*) AS n")
      .head().getLong(0) === 3L) // 3-truss = the triangle's edges
    val bc = session.cypher(graph,
      "CALL betweenness('N') YIELD id, betweenness " +
        "RETURN id, betweenness ORDER BY betweenness DESC LIMIT 1").head()
    assert((bc.getLong(0) & 0xFFFFFFFFL) === 3L) // all paths to 4 cross 3
    assert(bc.getDouble(1) === 2.0) // pairs (1,4), (2,4)
    assert(session.cypher(graph,
      "CALL hits(2) YIELD id, hub, auth RETURN count(*) AS n")
      .head().getLong(0) === 4L)
    val lbl = session.cypher(graph,
      "CALL labelprop(5) YIELD id, label RETURN count(DISTINCT label) AS c")
      .head().getLong(0)
    assert(lbl >= 1L && lbl <= 2L) // one community (or 2 under oscillation cap)
    assert(session.cypher(graph,
      "CALL assortativity() YIELD assortativity RETURN assortativity")
      .collect().length === 1)
    val balls = session.cypher(graph,
      "CALL neighborhood(2) YIELD id, ball_est RETURN id, ball_est").collect()
    assert(balls.length === 4)
    // below HLL's sparse threshold estimates are exact: every 2-hop ball
    // here covers the whole 4-node component
    assert(balls.forall(_.getLong(1) === 4L))
  }

  test("algorithm procedures via CALL: sssp and ppr seeded by label") {
    // S-labeled seed node 1; E edges 1-2, 2-3 (w=1), F edge 1-3 (w=5):
    // cheapest route to 3 is two E hops (2.0), not the direct F edge (5.0)
    val seeds = Seq((1L, 0L)).toDF("id", "x")
    val vs = Seq((2L, 0L), (3L, 0L)).toDF("id", "x")
    val es = Seq((10L, 1L, 2L), (11L, 2L, 3L)).toDF("id", "src", "tgt")
    val fs = Seq((20L, 1L, 3L)).toDF("id", "src", "tgt")
    val g = PropertyGraph(
      Seq(NodeTableDef(Set("S"), seeds, "id", Map.empty, "n"),
        NodeTableDef(Set("V"), vs, "id", Map.empty, "n")),
      Seq(RelTableDef("E", es, "id", "src", "tgt", Map.empty, "e", "n", "n"),
        RelTableDef("F", fs, "id", "src", "tgt", Map.empty, "f", "n", "n")))
    val dist = session.cypher(g,
      "CALL sssp('S', 'E', 1.0, 'F', 5.0) YIELD id, dist RETURN id, dist")
      .collect().map(r => (r.getLong(0) & 0xFFFFFFFFL, r.getDouble(1))).toMap
    assert(dist === Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0))
    val pprSum = session.cypher(g,
      "CALL ppr('S', 3) YIELD id, rank RETURN round(sum(rank), 6) AS s")
      .head().getDouble(0)
    assert(pprSum === 1.0) // restart mass conserves total rank exactly
  }

  test("EXPLAIN returns the formatted physical plan, not rows") {
    val df = session.cypher(graph,
      "EXPLAIN MATCH (n:N) WHERE n.val > 2 RETURN n.val AS v")
    assert(df.columns.toSeq === Seq("plan"))
    val text = df.head().getString(0)
    // In-memory fixture plans as a LocalTableScan (Catalyst folds the
    // filter into it); parquet-backed graphs show PushedFilters — that
    // end is exercised by the Dev drive on the TPCH graph.
    assert(text.contains("== Physical Plan =="))
    assert(text.contains("(1)"), s"expected numbered operators:\n$text")
    // PROFILE is a synonym
    val p = session.cypher(graph, "PROFILE MATCH (n:N) RETURN n.val AS v")
    assert(p.columns.toSeq === Seq("plan"))
  }
}
