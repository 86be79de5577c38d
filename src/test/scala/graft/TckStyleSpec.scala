package graft

import graft.api.GraftSession
import graft.graph.{NodeTableDef, PropertyGraph, RelTableDef}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** TCK-style conformance scenarios, hand-authored from the openCypher
  * semantics the official TCK exercises (the TCK feature files themselves
  * are an external artifact this environment cannot fetch; the reference
  * consumes them via morpheus-tck/.../TckSparkCypherTest.scala:39-100 with
  * blacklists for write clauses and unbounded var-length — the same scope
  * exclusions apply here). Each scenario is a (graph, query, expected-bag)
  * triple over a purpose-built micro graph; results compare as unordered
  * bags unless the query orders. */
object TckFixtures {
  case class N(id: Long, labels: Set[String], props: Map[String, Any] = Map.empty)
  case class R(id: Long, src: Long, dst: Long, typ: String,
      props: Map[String, Any] = Map.empty)

  private def sparkType(v: Any): DataType = v match {
    case _: Long | _: Int => LongType
    case _: Double => DoubleType
    case _: Boolean => BooleanType
    case _: String => StringType
    case s: Seq[_] if s.nonEmpty => ArrayType(sparkType(s.head))
    case _: Seq[_] => ArrayType(StringType)
    case other => throw new IllegalArgumentException(s"fixture type $other")
  }

  private def toSpark(v: Any): Any = v match {
    case i: Int => i.toLong
    case s: Seq[_] => s.map(toSpark)
    case other => other
  }

  /** Build a PropertyGraph from node/rel fixture rows: nodes grouped by
    * label combination (one element table per combination, the scan-table
    * shape the engine plans against), all in one shared id space. */
  def graph(spark: org.apache.spark.sql.SparkSession,
      nodes: Seq[N], rels: Seq[R] = Seq.empty): PropertyGraph = {
    val nodeDefs = nodes.groupBy(_.labels).map { case (labels, ns) =>
      val keys = ns.flatMap(_.props.keys).distinct
      val fields = StructField("id", LongType, nullable = false) +: keys.map { k =>
        val sample = ns.flatMap(_.props.get(k)).find(_ != null)
        StructField(k, sample.map(sparkType).getOrElse(StringType), nullable = true)
      }
      val rows = ns.map(n => Row.fromSeq(
        n.id +: keys.map(k => n.props.get(k).map(toSpark).orNull)))
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), StructType(fields))
      NodeTableDef(labels, df, "id", keys.map(k => k -> k).toMap, "n")
    }.toSeq
    val relDefs = rels.groupBy(_.typ).map { case (typ, rs) =>
      val keys = rs.flatMap(_.props.keys).distinct
      val fields = Seq(
        StructField("id", LongType, nullable = false),
        StructField("src", LongType, nullable = false),
        StructField("dst", LongType, nullable = false)) ++ keys.map { k =>
        val sample = rs.flatMap(_.props.get(k)).find(_ != null)
        StructField(k, sample.map(sparkType).getOrElse(StringType), nullable = true)
      }
      val rows = rs.map(r => Row.fromSeq(Seq(r.id, r.src, r.dst) ++
        keys.map(k => r.props.get(k).map(toSpark).orNull)))
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), StructType(fields))
      RelTableDef(typ, df, "id", "src", "dst", keys.map(k => k -> k).toMap,
        "r", "n", "n")
    }.toSeq
    PropertyGraph(nodeDefs, relDefs)
  }
}

class TckStyleSpec extends TckScenarioBase {
  import TckFixtures._

  // ------------------------------------------------------------ fixtures
  /** a:A {name:'a', num:1} -KNOWS{since:2010}-> b:B {name:'b', num:2}
    * b -KNOWS{since:2012}-> c:C {name:'c'}   a -LIKES-> c
    * d:A:B {name:'d', num:4} (two labels, isolated) */
  lazy val gAbc = graph(spark,
    Seq(
      N(1, Set("A"), Map("name" -> "a", "num" -> 1)),
      N(2, Set("B"), Map("name" -> "b", "num" -> 2)),
      N(3, Set("C"), Map("name" -> "c")),
      N(4, Set("A", "B"), Map("name" -> "d", "num" -> 4))),
    Seq(
      R(10, 1, 2, "KNOWS", Map("since" -> 2010)),
      R(11, 2, 3, "KNOWS", Map("since" -> 2012)),
      R(12, 1, 3, "LIKES")))

  /** self-loop on 1, parallel edges 1->2 (two KNOWS rels), cycle 2<->3 */
  lazy val gLoops = graph(spark,
    Seq(N(1, Set("X")), N(2, Set("X")), N(3, Set("X"))),
    Seq(
      R(20, 1, 1, "SELF"),
      R(21, 1, 2, "KNOWS"),
      R(22, 1, 2, "KNOWS"),
      R(23, 2, 3, "KNOWS"),
      R(24, 3, 2, "KNOWS")))

  /** chain 1->2->3->4 for var-length */
  lazy val gChain = graph(spark,
    Seq(N(1, Set("P"), Map("name" -> "p1")), N(2, Set("P"), Map("name" -> "p2")),
      N(3, Set("P"), Map("name" -> "p3")), N(4, Set("P"), Map("name" -> "p4"))),
    (1L to 3L).map(i => R(30 + i, i, i + 1, "NEXT")))

  /** nodes with null-ish / list props for expression scenarios */
  lazy val gVals = graph(spark,
    Seq(
      N(1, Set("V"), Map("s" -> "hello", "x" -> 1, "f" -> 1.5,
        "flag" -> true, "list" -> Seq(1, 2, 3))),
      N(2, Set("V"), Map("x" -> 2)), // s, f, flag, list absent -> null
      N(3, Set("V"), Map("s" -> "world", "x" -> 3, "flag" -> false))))

  lazy val gEmpty = graph(spark, Seq(N(1, Set("Unrelated"))))

  // ============================================================ MATCH basics
  scenario("match all nodes", gAbc, "MATCH (n) RETURN count(*) AS x", value(4))
  scenario("match by label", gAbc,
    "MATCH (n:A) RETURN n.name AS x", rows(Map("x" -> "a"), Map("x" -> "d")))
  scenario("match by conjoined labels", gAbc,
    "MATCH (n:A:B) RETURN n.name AS x", value("d"))
  scenario("label match is a superset match", gAbc,
    "MATCH (n:B) RETURN n.name AS x", rows(Map("x" -> "b"), Map("x" -> "d")))
  scenario("inline property predicate", gAbc,
    "MATCH (n {name: 'b'}) RETURN n.num AS x", value(2))
  scenario("inline property on labeled node", gAbc,
    "MATCH (n:A {num: 1}) RETURN n.name AS x", value("a"))
  scenario("no matching nodes returns empty", gAbc,
    "MATCH (n:A {name: 'zzz'}) RETURN n.name AS x", rows())
  scenario("unknown label returns empty", gAbc,
    "MATCH (n:Nope) RETURN count(*) AS x", value(0))
  scenario("directed relationship", gAbc,
    "MATCH (a:A {name:'a'})-[r:KNOWS]->(b) RETURN b.name AS x", value("b"))
  scenario("reversed direction arrow", gAbc,
    "MATCH (b)<-[r:KNOWS]-(a:A {name:'a'}) RETURN b.name AS x", value("b"))
  scenario("undirected matches both orientations", gAbc,
    "MATCH (b:B {name:'b'})-[r:KNOWS]-(o) RETURN o.name AS x",
    rows(Map("x" -> "a"), Map("x" -> "c")))
  scenario("relationship type alternation", gAbc,
    "MATCH (a {name:'a'})-[r:KNOWS|LIKES]->(o) RETURN o.name AS x",
    rows(Map("x" -> "b"), Map("x" -> "c")))
  scenario("unknown relationship type returns empty", gAbc,
    "MATCH ()-[r:NOPE]->() RETURN count(*) AS x", value(0))
  scenario("relationship property", gAbc,
    "MATCH ()-[r:KNOWS]->() WHERE r.since > 2011 RETURN r.since AS x",
    value(2012))
  scenario("inline relationship property predicate", gAbc,
    "MATCH ()-[r:KNOWS {since: 2010}]->(b) RETURN b.name AS x", value("b"))
  scenario("two-hop chain", gAbc,
    "MATCH (a)-[:KNOWS]->(b)-[:KNOWS]->(c) RETURN a.name AS x, c.name AS y",
    rows(Map("x" -> "a", "y" -> "c")))
  scenario("expand into bound endpoints", gAbc,
    "MATCH (a {name:'a'}), (c {name:'c'}) MATCH (a)-[r:LIKES]->(c) " +
      "RETURN count(r) AS x", value(1))
  scenario("anonymous intermediate node", gAbc,
    "MATCH (a:A {name:'a'})-[:KNOWS]->()-[:KNOWS]->(c) RETURN c.name AS x",
    value("c"))
  scenario("directed self-loop", gLoops,
    "MATCH (a)-[r:SELF]->(a) RETURN count(r) AS x", value(1))
  scenario("undirected self-loop matched once", gLoops,
    "MATCH (a)-[r:SELF]-(b) RETURN count(r) AS x", value(1))
  scenario("parallel relationships produce one row each", gLoops,
    "MATCH (a)-[r:KNOWS]->(b) WHERE id(a) < id(b) OR id(a) > id(b) " +
      "RETURN count(r) AS x", value(4))
  scenario("relationship uniqueness within a pattern", gLoops,
    // 1->2 via two parallel rels: r1 != r2 forced by uniqueness, so both
    // orderings of the two parallel rels qualify for (r1,r2) pairs a->b,
    // plus no same-rel pair.
    "MATCH (a {})-[r1:KNOWS]->(b)<-[r2:KNOWS]-(a) RETURN count(*) AS x",
    value(2))
  scenario("cycle match", gLoops,
    "MATCH (a)-[:KNOWS]->(b)-[:KNOWS]->(a) RETURN count(*) AS x", value(2))
  scenario("comma-separated patterns join on shared variable", gAbc,
    "MATCH (a)-[:KNOWS]->(b), (a)-[:LIKES]->(c) " +
      "RETURN a.name AS x, b.name AS y, c.name AS z",
    rows(Map("x" -> "a", "y" -> "b", "z" -> "c")))
  scenario("comma-separated patterns without shared variable are a product",
    gAbc, "MATCH (a:C), (b:B) RETURN count(*) AS x", value(2))
  scenario("label predicate in WHERE", gAbc,
    "MATCH (n) WHERE n:A RETURN count(*) AS x", value(2))
  scenario("negated label predicate", gAbc,
    "MATCH (n) WHERE NOT n:A RETURN n.name AS x",
    rows(Map("x" -> "b"), Map("x" -> "c")))
  scenario("missing property is null", gAbc,
    "MATCH (n:C) RETURN n.num AS x", value(null))

  // ============================================== WHERE / three-valued logic
  scenario("WHERE literal true keeps rows", gAbc,
    "MATCH (n:C) WHERE true RETURN n.name AS x", value("c"))
  scenario("WHERE literal false removes rows", gAbc,
    "MATCH (n) WHERE false RETURN n.name AS x", rows())
  scenario("WHERE null removes rows", gAbc,
    "MATCH (n) WHERE null RETURN n.name AS x", rows())
  scenario("comparison with null is null (filtered)", gAbc,
    "MATCH (n) WHERE n.num > 0 RETURN n.name AS x",
    rows(Map("x" -> "a"), Map("x" -> "b"), Map("x" -> "d")))
  scenario("null AND false is false", gAbc,
    "RETURN (null AND false) AS x", value(false))
  scenario("null AND true is null", gAbc, "RETURN (null AND true) AS x",
    value(null))
  scenario("null OR true is true", gAbc, "RETURN (null OR true) AS x",
    value(true))
  scenario("null OR false is null", gAbc, "RETURN (null OR false) AS x",
    value(null))
  scenario("NOT null is null", gAbc, "RETURN (NOT null) AS x", value(null))
  scenario("null XOR true is null", gAbc, "RETURN (null XOR true) AS x",
    value(null))
  scenario("true XOR true is false", gAbc, "RETURN (true XOR true) AS x",
    value(false))
  scenario("true XOR false is true", gAbc, "RETURN (true XOR false) AS x",
    value(true))
  scenario("null equals null is null", gAbc, "RETURN (null = null) AS x",
    value(null))
  scenario("null not-equals value is null", gAbc, "RETURN (null <> 1) AS x",
    value(null))
  scenario("IS NULL on missing property", gAbc,
    "MATCH (n) WHERE n.num IS NULL RETURN n.name AS x", value("c"))
  scenario("IS NOT NULL", gAbc,
    "MATCH (n) WHERE n.num IS NOT NULL RETURN count(*) AS x", value(3))
  scenario("IN list membership", gAbc,
    "MATCH (n) WHERE n.name IN ['a', 'c'] RETURN count(*) AS x", value(2))
  scenario("IN empty list is false", gAbc, "RETURN (1 IN []) AS x",
    value(false))
  scenario("null IN empty list is false", gAbc, "RETURN (null IN []) AS x",
    value(false))
  scenario("null IN non-empty list is null", gAbc,
    "RETURN (null IN [1, 2]) AS x", value(null))
  scenario("value IN list containing null: found is true", gAbc,
    "RETURN (1 IN [1, null]) AS x", value(true))
  scenario("value IN list containing null: not found is null", gAbc,
    "RETURN (2 IN [1, null]) AS x", value(null))
  scenario("list IN list of lists", gAbc,
    "RETURN ([1, 2] IN [[1, 2], [3]]) AS x", value(true))
  scenario("STARTS WITH", gAbc,
    "MATCH (n) WHERE n.name STARTS WITH 'a' RETURN n.name AS x", value("a"))
  scenario("ENDS WITH", gVals,
    "MATCH (v:V) WHERE v.s ENDS WITH 'lo' RETURN v.s AS x", value("hello"))
  scenario("CONTAINS", gVals,
    "MATCH (v:V) WHERE v.s CONTAINS 'orl' RETURN v.s AS x", value("world"))
  scenario("STARTS WITH null operand is null", gAbc,
    "RETURN (null STARTS WITH 'a') AS x", value(null))
  scenario("CONTAINS on null property filters out", gVals,
    "MATCH (v:V) WHERE v.s CONTAINS 'o' RETURN count(*) AS x", value(2))
  scenario("regex full match", gAbc,
    "MATCH (n) WHERE n.name =~ '[ab]' RETURN count(*) AS x", value(2))
  scenario("regex is a full-string match", gVals,
    "MATCH (v:V) WHERE v.s =~ 'hell' RETURN count(*) AS x", value(0))
  scenario("mixed int/float comparison", gVals,
    "MATCH (v:V) WHERE v.x > 1.5 RETURN count(*) AS x", value(2))
  scenario("chained boolean operators", gAbc,
    "MATCH (n) WHERE n.num >= 1 AND n.num < 4 AND NOT n.name = 'b' " +
      "RETURN n.name AS x", value("a"))
  scenario("comparison between strings", gAbc,
    "MATCH (n) WHERE n.name < 'c' RETURN count(*) AS x", value(2))
  scenario("equality between booleans", gVals,
    "MATCH (v:V) WHERE v.flag = false RETURN v.s AS x", value("world"))

  // ===================================================== RETURN / WITH
  scenario("RETURN literal integer", gAbc, "RETURN 42 AS x", value(42))
  scenario("RETURN literal float", gAbc, "RETURN 1.5 AS x", value(1.5))
  scenario("RETURN literal string", gAbc, "RETURN 'hi' AS x", value("hi"))
  scenario("RETURN literal boolean", gAbc, "RETURN true AS x", value(true))
  scenario("RETURN literal list", gAbc, "RETURN [1, 2, 3] AS x",
    value(List(1L, 2L, 3L)))
  scenario("RETURN literal map", gAbc, "RETURN {a: 1, b: 'two'} AS x",
    value(Map("a" -> 1L, "b" -> "two")))
  scenario("RETURN null literal", gAbc, "RETURN null AS x", value(null))
  scenario("expression projection", gAbc,
    "MATCH (n:B {name:'b'}) RETURN n.num * 10 AS x", value(20))
  scenario("RETURN DISTINCT", gAbc,
    "MATCH (n)-[r]->(m) RETURN DISTINCT n.name AS x",
    rows(Map("x" -> "a"), Map("x" -> "b")))
  scenario("ORDER BY ascending", gAbc,
    "MATCH (n) WHERE n.num IS NOT NULL RETURN n.name AS x ORDER BY n.num",
    rows(Map("x" -> "a"), Map("x" -> "b"), Map("x" -> "d")), ordered = true)
  scenario("ORDER BY descending", gAbc,
    "MATCH (n) WHERE n.num IS NOT NULL RETURN n.name AS x ORDER BY n.num DESC",
    rows(Map("x" -> "d"), Map("x" -> "b"), Map("x" -> "a")), ordered = true)
  scenario("ORDER BY puts nulls last ascending", gAbc,
    "MATCH (n) RETURN n.num AS x ORDER BY n.num",
    rows(Map("x" -> 1), Map("x" -> 2), Map("x" -> 4), Map("x" -> null)),
    ordered = true)
  scenario("ORDER BY puts nulls first descending", gAbc,
    "MATCH (n) RETURN n.num AS x ORDER BY n.num DESC",
    rows(Map("x" -> null), Map("x" -> 4), Map("x" -> 2), Map("x" -> 1)),
    ordered = true)
  scenario("ORDER BY two keys", gLoops,
    "MATCH (a)-[r:KNOWS]->(b) RETURN id(a) < id(b) AS fwd, count(*) AS n " +
      "ORDER BY fwd, n", rows(Map("fwd" -> false, "n" -> 1),
      Map("fwd" -> true, "n" -> 3)), ordered = true)
  scenario("LIMIT", gAbc,
    "MATCH (n) RETURN n.name AS x ORDER BY n.name LIMIT 2",
    rows(Map("x" -> "a"), Map("x" -> "b")), ordered = true)
  scenario("SKIP", gAbc,
    "MATCH (n) RETURN n.name AS x ORDER BY n.name SKIP 3", value("d"))
  scenario("SKIP and LIMIT", gAbc,
    "MATCH (n) RETURN n.name AS x ORDER BY n.name SKIP 1 LIMIT 2",
    rows(Map("x" -> "b"), Map("x" -> "c")), ordered = true)
  scenario("WITH projects and filters", gAbc,
    "MATCH (n) WITH n.name AS name, n.num AS num WHERE num > 1 " +
      "RETURN name AS x", rows(Map("x" -> "b"), Map("x" -> "d")))
  scenario("WITH shadows a variable with an expression", gAbc,
    "MATCH (n:B {name:'b'}) WITH n.name AS n RETURN n AS x", value("b"))
  scenario("WITH DISTINCT", gAbc,
    "MATCH (n)-[r]->() WITH DISTINCT n RETURN count(*) AS x", value(2))
  scenario("WITH ORDER BY LIMIT picks top-k before RETURN", gAbc,
    "MATCH (n) WHERE n.num IS NOT NULL WITH n ORDER BY n.num DESC LIMIT 1 " +
      "RETURN n.name AS x", value("d"))
  scenario("RETURN star preserves variable", gAbc,
    "MATCH (n:C) WITH n.name AS name RETURN * ", value(null).map(_ =>
      Map("name" -> "c")))
  scenario("string concatenation with +", gAbc,
    "MATCH (n:C) RETURN n.name + '!' AS x", value("c!"))
  scenario("unary minus", gAbc, "RETURN -(3) AS x", value(-3))

  // ========================================================== Aggregation
  scenario("count star on empty match is zero", gAbc,
    "MATCH (n:Nope) RETURN count(*) AS x", value(0))
  scenario("count of variable skips nothing", gAbc,
    "MATCH (n) RETURN count(n) AS x", value(4))
  scenario("count of property skips nulls", gAbc,
    "MATCH (n) RETURN count(n.num) AS x", value(3))
  scenario("count distinct", gLoops,
    "MATCH (a)-[:KNOWS]->(b) RETURN count(DISTINCT b) AS x", value(2))
  scenario("sum of integers", gAbc,
    "MATCH (n) RETURN sum(n.num) AS x", value(7))
  scenario("sum skips nulls", gVals,
    "MATCH (v:V) RETURN sum(v.x) AS x", value(6))
  scenario("sum over no rows is 0 (openCypher)", gAbc,
    // Neo4j/openCypher: sum of an empty input is 0. The reference's okapi
    // AggregationTests return null here (Spark's sum) — graft follows the
    // spec instead (round 6; deviation noted in tck_blacklist.md).
    "MATCH (n:Nope) RETURN sum(n.num) AS x", value(0))
  scenario("avg of integers", gAbc,
    "MATCH (n) WHERE n.num < 4 RETURN avg(n.num) AS x", value(1.5))
  scenario("min and max", gAbc,
    "MATCH (n) RETURN min(n.num) AS lo, max(n.num) AS hi",
    rows(Map("lo" -> 1, "hi" -> 4)))
  scenario("min of strings", gAbc,
    "MATCH (n) RETURN min(n.name) AS x", value("a"))
  scenario("max over empty is null", gAbc,
    "MATCH (n:Nope) RETURN max(n.num) AS x", value(null))
  scenario("collect respects ORDER BY of the incoming rows", gAbc,
    "MATCH (n:A) WITH n.name AS name ORDER BY name RETURN collect(name) AS x",
    Seq(Map("x" -> List("a", "d"))))
  scenario("collect skips nulls", gAbc,
    "MATCH (n) RETURN size(collect(n.num)) AS x", value(3))
  scenario("collect on empty is empty list", gAbc,
    "MATCH (n:Nope) RETURN collect(n.name) AS x", Seq(Map("x" -> List())))
  scenario("implicit grouping key", gLoops,
    "MATCH (a)-[:KNOWS]->(b) RETURN id(b) > id(a) AS grp, count(*) AS n",
    rows(Map("grp" -> true, "n" -> 3), Map("grp" -> false, "n" -> 1)))
  scenario("grouping treats null as a group", gAbc,
    "MATCH (n) RETURN n.num IS NULL AS grp, count(*) AS n",
    rows(Map("grp" -> false, "n" -> 3), Map("grp" -> true, "n" -> 1)))
  scenario("aggregate used inside an expression", gAbc,
    "MATCH (n) RETURN count(*) + 1 AS x", value(5))
  scenario("sum distinct", gVals,
    "UNWIND [1, 1, 2] AS v RETURN sum(DISTINCT v) AS x", value(3))
  scenario("aggregation after WITH aggregation", gAbc,
    "MATCH (n)-[r]->() WITH n, count(r) AS deg RETURN max(deg) AS x",
    value(2))

  // ======================================================= OPTIONAL MATCH
  scenario("optional match fills unmatched with null", gAbc,
    "MATCH (n:C) OPTIONAL MATCH (n)-[r:KNOWS]->(m) RETURN n.name AS x, " +
      "m.name AS y", rows(Map("x" -> "c", "y" -> null)))
  scenario("optional match keeps matched rows", gAbc,
    "MATCH (n:B {name:'b'}) OPTIONAL MATCH (n)-[:KNOWS]->(m) " +
      "RETURN m.name AS x", value("c"))
  scenario("property of null node is null", gAbc,
    "MATCH (n:C) OPTIONAL MATCH (n)-[:KNOWS]->(m) RETURN m.num AS x",
    value(null))
  scenario("count over optional nulls is zero", gAbc,
    "MATCH (n:C) OPTIONAL MATCH (n)-[r:KNOWS]->() RETURN count(r) AS x",
    value(0))
  scenario("optional match as first clause", gAbc,
    "OPTIONAL MATCH (n:Nope) RETURN n AS x", value(null))
  scenario("optional match with inner WHERE", gAbc,
    "MATCH (a:A {name:'a'}) OPTIONAL MATCH (a)-[r:KNOWS]->(b) " +
      "WHERE r.since > 2011 RETURN b.name AS x", value(null))
  scenario("two optional matches chain", gAbc,
    "MATCH (c:C) OPTIONAL MATCH (c)-[:KNOWS]->(x) OPTIONAL MATCH " +
      "(c)<-[:LIKES]-(y) RETURN x.name AS x, y.name AS y",
    rows(Map("x" -> null, "y" -> "a")))
  scenario("optional match on bound pair", gAbc,
    "MATCH (a {name:'a'}), (b {name:'b'}) OPTIONAL MATCH (a)-[r:LIKES]->(b) " +
      "RETURN r AS x", value(null))

  // ============================================================== UNWIND
  scenario("unwind literal list", gAbc,
    "UNWIND [1, 2, 3] AS v RETURN v AS x",
    rows(Map("x" -> 1), Map("x" -> 2), Map("x" -> 3)))
  scenario("unwind empty list produces no rows", gAbc,
    "UNWIND [] AS v RETURN v AS x", rows())
  scenario("unwind null produces no rows", gAbc,
    "UNWIND null AS v RETURN v AS x", rows())
  scenario("unwind nested lists one level", gAbc,
    "UNWIND [[1, 2], [3]] AS l RETURN size(l) AS x",
    rows(Map("x" -> 2), Map("x" -> 1)))
  scenario("unwind range", gAbc,
    "UNWIND range(1, 3) AS v RETURN v AS x",
    rows(Map("x" -> 1), Map("x" -> 2), Map("x" -> 3)))
  scenario("unwind range with step", gAbc,
    "UNWIND range(1, 10, 4) AS v RETURN v AS x",
    rows(Map("x" -> 1), Map("x" -> 5), Map("x" -> 9)))
  scenario("unwind keeps other variables in scope", gAbc,
    "MATCH (n:C) UNWIND [1, 2] AS v RETURN n.name AS x, v AS y",
    rows(Map("x" -> "c", "y" -> 1), Map("x" -> "c", "y" -> 2)))
  scenario("double unwind is a cartesian product", gAbc,
    "UNWIND [1, 2] AS a UNWIND [10, 20] AS b RETURN a * b AS x",
    rows(Map("x" -> 10), Map("x" -> 20), Map("x" -> 20), Map("x" -> 40)))
  scenario("unwind node list property", gVals,
    "MATCH (v:V {x: 1}) UNWIND v.list AS e RETURN e AS x",
    rows(Map("x" -> 1), Map("x" -> 2), Map("x" -> 3)))
  scenario("unwind then filter", gAbc,
    "UNWIND range(1, 5) AS v WITH v WHERE v % 2 = 1 RETURN v AS x",
    rows(Map("x" -> 1), Map("x" -> 3), Map("x" -> 5)))
  scenario("unwind a collected list", gAbc,
    "MATCH (n) WHERE n.num IS NOT NULL WITH collect(n.num) AS ns " +
      "UNWIND ns AS v RETURN sum(v) AS x", value(7))

  // ================================================= expressions / functions
  scenario("CASE with value branches", gAbc,
    "MATCH (n:B {name:'b'}) RETURN CASE n.num WHEN 2 THEN 'two' " +
      "WHEN 3 THEN 'three' ELSE 'other' END AS x", value("two"))
  scenario("CASE generic form", gAbc,
    "MATCH (n:B {name:'b'}) RETURN CASE WHEN n.num > 1 THEN 'big' " +
      "ELSE 'small' END AS x", value("big"))
  scenario("CASE without ELSE yields null", gAbc,
    "MATCH (n:C) RETURN CASE WHEN n.num > 1 THEN 'big' END AS x", value(null))
  scenario("coalesce picks first non-null", gAbc,
    "MATCH (n:C) RETURN coalesce(n.num, 99) AS x", value(99))
  scenario("size of list", gAbc, "RETURN size([1, 2, 3]) AS x", value(3))
  scenario("size of string", gAbc, "RETURN size('hello') AS x", value(5))
  scenario("size of null is null", gAbc, "RETURN size(null) AS x", value(null))
  scenario("head of list", gAbc, "RETURN head([1, 2, 3]) AS x", value(1))
  scenario("last of list", gAbc, "RETURN last([1, 2, 3]) AS x", value(3))
  scenario("tail of list", gAbc, "RETURN tail([1, 2, 3]) AS x",
    value(List(2L, 3L)))
  scenario("head of empty list is null", gAbc, "RETURN head([]) AS x",
    value(null))
  scenario("list index positive", gAbc, "RETURN [1, 2, 3][1] AS x", value(2))
  scenario("list index negative", gAbc, "RETURN [1, 2, 3][-1] AS x", value(3))
  scenario("list index out of bounds is null", gAbc,
    "RETURN [1, 2, 3][9] AS x", value(null))
  scenario("list slice", gAbc, "RETURN [1, 2, 3, 4][1..3] AS x",
    value(List(2L, 3L)))
  scenario("list slice open end", gAbc, "RETURN [1, 2, 3, 4][2..] AS x",
    value(List(3L, 4L)))
  scenario("list slice open start", gAbc, "RETURN [1, 2, 3, 4][..2] AS x",
    value(List(1L, 2L)))
  scenario("list concatenation with +", gAbc,
    "RETURN [1, 2] + [3] AS x", value(List(1L, 2L, 3L)))
  scenario("element append with +", gAbc,
    "RETURN [1, 2] + 3 AS x", value(List(1L, 2L, 3L)))
  scenario("list comprehension with filter and map", gAbc,
    "RETURN [v IN range(1, 5) WHERE v % 2 = 0 | v * 10] AS x",
    value(List(20L, 40L)))
  scenario("list comprehension filter only", gAbc,
    "RETURN [v IN [1, 2, 3] WHERE v > 1] AS x", value(List(2L, 3L)))
  scenario("reduce over a list", gAbc,
    "RETURN reduce(acc = 0, v IN [1, 2, 3] | acc + v) AS x", value(6))
  scenario("any quantifier", gAbc,
    "RETURN any(v IN [1, 2, 3] WHERE v > 2) AS x", value(true))
  scenario("all quantifier", gAbc,
    "RETURN all(v IN [1, 2, 3] WHERE v > 0) AS x", value(true))
  scenario("none quantifier", gAbc,
    "RETURN none(v IN [1, 2, 3] WHERE v > 5) AS x", value(true))
  scenario("single quantifier", gAbc,
    "RETURN single(v IN [1, 2, 3] WHERE v = 2) AS x", value(true))
  scenario("labels of a node", gAbc,
    "MATCH (n {name:'d'}) RETURN labels(n) AS x",
    Seq(Map("x" -> List("A", "B"))))
  scenario("type of a relationship", gAbc,
    "MATCH ({name:'a'})-[r:LIKES]->() RETURN type(r) AS x", value("LIKES"))
  scenario("keys of a node", gAbc,
    "MATCH (n:B {name:'b'}) RETURN keys(n) AS x",
    Seq(Map("x" -> List("name", "num"))))
  scenario("properties of a node", gAbc,
    "MATCH (n:B {name:'b'}) RETURN properties(n) AS x",
    Seq(Map("x" -> Map("name" -> "b", "num" -> 2L))))
  scenario("id uniqueness", gAbc,
    "MATCH (a:A {name:'a'}), (b:B {name:'b'}) RETURN id(a) = id(b) AS x",
    value(false))
  scenario("startNode and endNode", gAbc,
    "MATCH ()-[r:LIKES]->() RETURN startNode(r).name AS x, " +
      "endNode(r).name AS y", rows(Map("x" -> "a", "y" -> "c")))
  scenario("toInteger parses string", gAbc, "RETURN toInteger('42') AS x",
    value(42))
  scenario("toInteger truncates float", gAbc, "RETURN toInteger(3.9) AS x",
    value(3))
  scenario("toFloat from integer", gAbc, "RETURN toFloat(2) AS x", value(2.0))
  scenario("toString from number", gAbc, "RETURN toString(42) AS x",
    value("42"))
  scenario("toBoolean from string", gAbc, "RETURN toBoolean('true') AS x",
    value(true))
  scenario("abs", gAbc, "RETURN abs(-3) AS x", value(3))
  scenario("ceil and floor", gAbc,
    "RETURN ceil(1.2) AS c, floor(1.8) AS f", rows(Map("c" -> 2.0, "f" -> 1.0)))
  scenario("round", gAbc, "RETURN round(1.5) AS x", value(2.0))
  scenario("sign", gAbc, "RETURN sign(-5) AS x", value(-1))
  scenario("sqrt", gAbc, "RETURN sqrt(9.0) AS x", value(3.0))
  scenario("integer division truncates", gAbc, "RETURN 3 / 2 AS x", value(1))
  scenario("float division", gAbc, "RETURN 3.0 / 2 AS x", value(1.5))
  scenario("modulo", gAbc, "RETURN 7 % 3 AS x", value(1))
  scenario("exponentiation", gAbc, "RETURN 2 ^ 3 AS x", value(8.0))
  scenario("toUpper and toLower", gAbc,
    "RETURN toUpper('ab') AS u, toLower('AB') AS l",
    rows(Map("u" -> "AB", "l" -> "ab")))
  scenario("trim functions", gAbc,
    "RETURN trim('  a  ') AS t, lTrim('  a') AS l, rTrim('a  ') AS r",
    rows(Map("t" -> "a", "l" -> "a", "r" -> "a")))
  scenario("replace", gAbc, "RETURN replace('abab', 'b', 'c') AS x",
    value("acac"))
  scenario("split", gAbc, "RETURN split('a,b,c', ',') AS x",
    Seq(Map("x" -> List("a", "b", "c"))))
  scenario("substring with start", gAbc, "RETURN substring('hello', 1) AS x",
    value("ello"))
  scenario("substring with length", gAbc,
    "RETURN substring('hello', 1, 3) AS x", value("ell"))
  scenario("left and right", gAbc,
    "RETURN left('hello', 2) AS l, right('hello', 2) AS r",
    rows(Map("l" -> "he", "r" -> "lo")))
  scenario("reverse string", gAbc, "RETURN reverse('abc') AS x", value("cba"))
  scenario("toUpper of null is null", gAbc, "RETURN toUpper(null) AS x",
    value(null))
  scenario("abs of null is null", gAbc, "RETURN abs(null) AS x", value(null))
  scenario("map literal access", gAbc, "RETURN {a: {b: 7}}.a.b AS x",
    value(7))
  scenario("map bracket access", gAbc, "RETURN {a: 1}['a'] AS x", value(1))
  scenario("range descending step", gAbc, "RETURN range(3, 1, -1) AS x",
    value(List(3L, 2L, 1L)))

  // ================================================================ UNION
  scenario("UNION removes duplicate rows", gAbc,
    "MATCH (n:A) RETURN n.name AS x UNION MATCH (n:A) RETURN n.name AS x",
    rows(Map("x" -> "a"), Map("x" -> "d")))
  scenario("UNION ALL keeps duplicates", gAbc,
    "MATCH (n:C) RETURN n.name AS x UNION ALL MATCH (n:C) RETURN n.name AS x",
    rows(Map("x" -> "c"), Map("x" -> "c")))
  scenario("UNION over different labels", gAbc,
    "MATCH (n:C) RETURN n.name AS x UNION MATCH (n:B) RETURN n.name AS x",
    rows(Map("x" -> "c"), Map("x" -> "b"), Map("x" -> "d")))
  scenario("UNION of literals", gAbc,
    "RETURN 1 AS x UNION RETURN 1 AS x UNION RETURN 2 AS x",
    rows(Map("x" -> 1), Map("x" -> 2)))

  // ============================================================ var-length
  scenario("var-length 1..2", gChain,
    "MATCH (a:P {name:'p1'})-[:NEXT*1..2]->(b) RETURN b.name AS x",
    rows(Map("x" -> "p2"), Map("x" -> "p3")))
  scenario("var-length fixed 2", gChain,
    "MATCH (a:P {name:'p1'})-[:NEXT*2]->(b) RETURN b.name AS x",
    value("p3"))
  scenario("var-length 0..1 includes the start node", gChain,
    "MATCH (a:P {name:'p1'})-[:NEXT*0..1]->(b) RETURN b.name AS x",
    rows(Map("x" -> "p1"), Map("x" -> "p2")))
  scenario("var-length upper bound only", gChain,
    "MATCH (a:P {name:'p1'})-[:NEXT*..3]->(b) RETURN count(*) AS x",
    value(3))
  scenario("var-length with bound target", gChain,
    "MATCH (a:P {name:'p1'}), (b:P {name:'p4'}) " +
      "MATCH (a)-[rs:NEXT*1..5]->(b) RETURN size(rs) AS x", value(3))
  scenario("var-length collects relationship list", gChain,
    "MATCH (a:P {name:'p1'})-[rs:NEXT*2..2]->(b) RETURN size(rs) AS x",
    value(2))
  scenario("var-length undirected from middle", gChain,
    "MATCH (a:P {name:'p2'})-[:NEXT*1..1]-(b) RETURN b.name AS x",
    rows(Map("x" -> "p1"), Map("x" -> "p3")))
  scenario("path length function", gChain,
    "MATCH p = (a:P {name:'p1'})-[:NEXT*1..3]->(b:P {name:'p4'}) " +
      "RETURN length(p) AS x", value(3))
  scenario("relationships of a path", gChain,
    "MATCH p = (a:P {name:'p1'})-[:NEXT]->(b) " +
      "RETURN size(relationships(p)) AS x", value(1))
  scenario("nodes of a path", gChain,
    "MATCH p = (a:P {name:'p1'})-[:NEXT]->(b) RETURN size(nodes(p)) AS x",
    value(2))

  // ================================================== EXISTS / predicates
  scenario("WHERE exists pattern", gAbc,
    "MATCH (n) WHERE exists((n)-[:KNOWS]->()) RETURN n.name AS x",
    rows(Map("x" -> "a"), Map("x" -> "b")))
  scenario("WHERE NOT exists pattern", gAbc,
    "MATCH (n) WHERE NOT exists((n)-[:KNOWS]->()) RETURN n.name AS x",
    rows(Map("x" -> "c"), Map("x" -> "d")))
  scenario("pattern predicate in value position", gAbc,
    "MATCH (n:C) RETURN exists((n)<-[:LIKES]-()) AS x", value(true))
  scenario("exists on property", gAbc,
    "MATCH (n) WHERE exists(n.num) RETURN count(*) AS x", value(3))
  scenario("pattern expression as boolean filter", gAbc,
    "MATCH (a:A {name:'a'}), (c:C) WHERE (a)-[:LIKES]->(c) " +
      "RETURN c.name AS x", value("c"))
}
