package graft

import graft.api.GraftSession
import graft.tpch.TpchGraph

/** Duplicate-subtree caching across UNION branches: the planner detects
  * shared clause prefixes, plans them once, and lazily localCheckpoint's the
  * result so every branch scans the materialized blocks (the reference's
  * InsertCachingOperators, okapi-relational/.../impl/planning/
  * RelationalOptimizer.scala:42-93). */
class CachingSpec extends SparkTestBase {

  lazy val session = new GraftSession(spark)
  lazy val g = TpchGraph(spark, "/root/testdata/sf0.001")

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("UNION ALL branches sharing a MATCH prefix plan it once") {
    val df = session.cypher(g,
      """MATCH (c:Customer)-[:PLACED]->(o:Order) WITH c, count(o) AS n
        |RETURN 'hi' AS bucket, count(*) AS cnt
        |UNION ALL
        |MATCH (c:Customer)-[:PLACED]->(o:Order) WITH c, count(o) AS n
        |WHERE n > 5 RETURN 'big' AS bucket, count(*) AS cnt""".stripMargin)
    // Shared prefix materialized once: the physical plan scans a
    // checkpointed RDD in both branches instead of repeating the
    // scan+join+aggregate pipeline.
    assert(executedPlan(df).contains("ExistingRDD"),
      "shared prefix should be localCheckpoint'd")
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("hi") === 150L)
    // oracle: customers with more than 5 orders, computed directly
    val big = session.cypher(g,
      "MATCH (c:Customer)-[:PLACED]->(o:Order) WITH c, count(o) AS n " +
        "WHERE n > 5 RETURN count(*) AS cnt").collect().head.getLong(0)
    assert(rows("big") === big)
  }

  test("three branches, two sharing a longer prefix than the third") {
    val df = session.cypher(g,
      """MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN count(*) AS n
        |UNION ALL
        |MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE o.o_orderkey > 100
        |RETURN count(*) AS n
        |UNION ALL
        |MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN count(*) AS n""".stripMargin)
    val counts = df.collect().map(_.getLong(0)).sorted
    assert(counts.length === 3)
    assert(counts(2) === 1500L) // all orders
    assert(counts(1) === 1500L)
    assert(counts(0) < 1500L)
  }

  test("single-branch queries are not checkpointed") {
    val df = session.cypher(g,
      "MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN count(*) AS n")
    assert(!executedPlan(df).contains("ExistingRDD"),
      "no shared prefix, no checkpoint")
  }

  test("UNION with distinct branch shapes still unions correctly") {
    val df = session.cypher(g,
      """MATCH (r:Region) RETURN r.r_name AS name
        |UNION
        |MATCH (n:Nation) WHERE n.n_nationkey < 3 RETURN n.n_name AS name""".stripMargin)
    assert(df.collect().length === 8) // 5 regions + 3 nations
  }

  test("single-var WHERE conjuncts push into the var-length anchor scan") {
    // the c_custkey predicate must reach the customer parquet scan (anchor
    // seed), not sit above the expand — at scale the anchor seed is what
    // bounds the frontier
    val df = session.cypher(g,
      "MATCH p = shortestPath((c:Customer)-[*1..3]->(r:Region)) " +
        "WHERE c.c_custkey < 100 RETURN length(p) AS l")
    val plan = executedPlan(df)
    assert(plan.contains("LessThan(c_custkey,100)"),
      s"pushed filter should reach the parquet scan:\n$plan")
  }

  test("single-hop var-length patterns do not checkpoint the hop table") {
    // [*1..1] / [*0..1] join the hop table exactly once, so materializing
    // it pre-partitioned is pure overhead — the plan must contain no
    // checkpointed RDD and no exchange of the hop frame (Catalyst
    // broadcasts the small rel scan instead).
    for (pat <- Seq("[:IN_REGION*1..1]", "[:IN_REGION*0..1]")) {
      val df = session.cypher(g,
        s"MATCH (n:Nation)-$pat->(r:Region) RETURN count(*) AS c")
      val plan = executedPlan(df)
      assert(!plan.contains("ExistingRDD"),
        s"$pat must not checkpoint the hop table:\n$plan")
      assert(!plan.contains("hashpartitioning(_h_from"),
        s"$pat must not shuffle the hop table:\n$plan")
      assert(df.collect().head.getLong(0) > 0)
    }
  }

  test("iterated var-length over a non-broadcastable scan pins the hop table") {
    // Force the "large edge table" decision by disabling broadcast: the
    // hop table is then joined per hop and must be materialized
    // pre-partitioned once (the 100-TB-safe shape).
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = session.cypher(g,
        "MATCH (n:Nation)-[:IN_REGION*1..2]->(r) RETURN count(*) AS c")
      assert(executedPlan(df).contains("ExistingRDD"),
        "multi-hop expand over a non-broadcastable scan should pin the hop table")
      assert(df.collect().head.getLong(0) > 0)
    }
  }

  test("FROM GRAPH in one branch does not leak into the next") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val other = graft.graph.PropertyGraph(Seq(
      graft.graph.NodeTableDef(Set("Region"),
        Seq((1L, "ELSEWHERE")).toDF("id", "r_name"), "id",
        Map("r_name" -> "r_name"), "other_region")))
    session.store("otherg", other)
    val rows = session.cypher(g,
      """FROM GRAPH otherg MATCH (r:Region) RETURN r.r_name AS name
        |UNION ALL
        |MATCH (r:Region) RETURN r.r_name AS name""".stripMargin)
      .collect().map(_.getString(0))
    assert(rows.length === 6, "1 from otherg + 5 ambient regions")
    assert(rows.count(_ == "ELSEWHERE") === 1)
  }
}
