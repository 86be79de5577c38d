package graft

import graft.api.GraftSession
import graft.sources.FsGraphSource
import graft.tpch.TpchGraph

/** Bucketed graph storage: expand joins over co-located (bucketed) scans
  * must plan WITHOUT a shuffle on the bucketed keys — the scale story for
  * repeated traversals of a 100 TB stored graph. */
class BucketedSourceSpec extends SparkTestBase {

  lazy val session = new GraftSession(spark)
  lazy val plain = TpchGraph(spark, "/root/testdata/sf0.001")

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    FsGraphSource.storeBucketed(plain, d, buckets = 8)
    d
  }
  private lazy val loaded = FsGraphSource.load(spark, dir)

  /** Shuffle exchanges only — a BroadcastExchange is not a shuffle. */
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  /** At sf0.001 every join would broadcast, which hides the co-location;
    * force sort-merge joins so bucketing is what saves the shuffle (at
    * 100 TB neither side broadcasts and this IS the default shape). */
  private def noBroadcast[T](f: => T): T =
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1")(f)

  test("bucketed round-trip preserves results") {
    val q = "MATCH (c:Customer)-[:PLACED]->(o:Order) " +
      "RETURN c.c_custkey AS ck, o.o_orderkey AS ok"
    val a = session.cypher(plain, q).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = session.cypher(loaded, q).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.length === 1500)
    assert(a.toSeq === b.toSeq)
  }

  test("src-side expand join over bucketed scans has zero shuffles") {
    // o is never observed -> dead-endpoint elision leaves customer JOIN rel,
    // both bucketed on the join key: no shuffle anywhere in the plan.
    noBroadcast {
      val df = session.cypher(loaded,
        "MATCH (c:Customer)-[:PLACED]->(o) RETURN c.c_custkey AS ck")
      assert(df.count() === 1500)
      assert(exchanges(df) === 0, df.queryExecution.executedPlan.toString)
    }
  }

  test("the same plan over the plain graph does shuffle") {
    noBroadcast {
      val df = session.cypher(plain,
        "MATCH (c:Customer)-[:PLACED]->(o) RETURN c.c_custkey AS ck")
      assert(df.count() === 1500)
      assert(exchanges(df) >= 1, "expected the unbucketed baseline to shuffle")
    }
  }

  test("bucket metadata survives catalog re-registration") {
    // Simulate a fresh session: drop the catalog tables, reload - the DDL
    // path re-registers external bucketed tables over the same files.
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_bkt_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val again = FsGraphSource.load(spark, dir)
    noBroadcast {
      val df = session.cypher(again,
        "MATCH (c:Customer)-[:PLACED]->(o) RETURN c.c_custkey AS ck")
      assert(df.count() === 1500)
      assert(exchanges(df) === 0, df.queryExecution.executedPlan.toString)
    }
  }
}
