package graft

import graft.api.GraftSession
import scala.util.Random

/** Differential testing: randomized (Cypher, SQL) template pairs executed
  * through the engine and through Spark SQL over the same raw tables must
  * produce identical multisets. An independent semantic oracle beyond the
  * 50+ handwritten DuckDB oracle queries — catches planner bugs across a
  * much wider predicate/aggregation space. */
class DifferentialSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  lazy val session = new GraftSession(spark)
  lazy val g = graft.tpch.TpchGraph(spark, dir)

  private def registerViews(): Unit =
    Seq("customer", "orders", "nation", "region", "supplier", "part")
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet")
        .createOrReplaceTempView(s"d_$t"))

  private case class Pair(cypher: String, sql: String)

  private def genPairs(rnd: Random, n: Int): Seq[Pair] = {
    val numCols = Seq(
      ("o", "Order", "orders", "o_totalprice"),
      ("o", "Order", "orders", "o_orderkey"),
      ("c", "Customer", "customer", "c_acctbal"),
      ("c", "Customer", "customer", "c_custkey"),
      ("s", "Supplier", "supplier", "s_acctbal"),
      ("p", "Part", "part", "p_retailprice"),
      ("p", "Part", "part", "p_size"))
    val strCols = Seq(
      ("c", "Customer", "customer", "c_mktsegment"),
      ("o", "Order", "orders", "o_orderstatus"),
      ("n", "Nation", "nation", "n_name"),
      ("o", "Order", "orders", "o_orderpriority"))
    val aggs = Seq("count", "sum", "min", "max", "avg")

    (0 until n).map { _ =>
      rnd.nextInt(5) match {
        case 0 => // filter + project
          val (v, label, table, col) = numCols(rnd.nextInt(numCols.size))
          val op = Seq(">", "<", ">=", "<=", "<>")(rnd.nextInt(5))
          val thr = rnd.nextInt(200000)
          Pair(
            s"MATCH ($v:$label) WHERE $v.$col $op $thr RETURN $v.$col AS x",
            s"SELECT $col AS x FROM d_$table WHERE $col $op $thr")
        case 1 => // grouped aggregation
          val (v, label, table, key) = strCols(rnd.nextInt(strCols.size))
          val (_, _, _, num) = numCols.filter(_._3 == table)
            .headOption.getOrElse(numCols.head)
          val fn = aggs(rnd.nextInt(aggs.size))
          val (cyAgg, sqlAgg) =
            if (fn == "count") ("count(*)", "count(*)")
            else if (table == "orders" || table == "customer" ||
              table == "supplier" || table == "part")
              (s"round($fn($v.$num), 4)", s"round($fn($num), 4)")
            else ("count(*)", "count(*)")
          Pair(
            s"MATCH ($v:$label) RETURN $v.$key AS k, $cyAgg AS a",
            s"SELECT $key AS k, $sqlAgg AS a FROM d_$table GROUP BY $key")
        case 2 => // expand join with filters on both sides
          val thr = rnd.nextInt(300000)
          val seg = Seq("BUILDING", "AUTOMOBILE", "MACHINERY")(rnd.nextInt(3))
          Pair(
            s"MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE " +
              s"o.o_totalprice > $thr AND c.c_mktsegment = '$seg' " +
              "RETURN c.c_custkey AS ck, o.o_orderkey AS ok",
            s"SELECT c_custkey AS ck, o_orderkey AS ok FROM d_customer " +
              s"JOIN d_orders ON o_custkey = c_custkey WHERE " +
              s"o_totalprice > $thr AND c_mktsegment = '$seg'")
        case 3 => // order by + limit with tiebreak
          val (v, label, table, col) = numCols(rnd.nextInt(numCols.size))
          val k = 1 + rnd.nextInt(20)
          val dirn = if (rnd.nextBoolean()) "DESC" else "ASC"
          val id = Map("orders" -> "o_orderkey", "customer" -> "c_custkey",
            "supplier" -> "s_suppkey", "part" -> "p_partkey",
            "nation" -> "n_nationkey")(table)
          Pair(
            s"MATCH ($v:$label) RETURN $v.$col AS x ORDER BY x $dirn, " +
              s"$v.$id LIMIT $k",
            s"SELECT $col AS x FROM d_$table ORDER BY $col $dirn, $id LIMIT $k")
        case _ => // distinct projection with string predicate
          val (v, label, table, col) = strCols(rnd.nextInt(strCols.size))
          val letter = ('A' + rnd.nextInt(6)).toChar
          Pair(
            s"MATCH ($v:$label) WHERE $v.$col >= '$letter' " +
              s"RETURN DISTINCT $v.$col AS x",
            s"SELECT DISTINCT $col AS x FROM d_$table WHERE $col >= '$letter'")
      }
    }
  }

  test("randomized cypher/sql pairs agree (seeded)") {
    registerViews()
    val pairs = genPairs(new Random(20260812L), 60)
    var checked = 0
    pairs.foreach { p =>
      val got = dfBag(session.cypher(g, p.cypher))
      val exp = dfBag(spark.sql(p.sql))
      assert(got === exp,
        s"differential mismatch\ncypher: ${p.cypher}\nsql: ${p.sql}")
      checked += 1
    }
    assert(checked === 60)
  }
}
