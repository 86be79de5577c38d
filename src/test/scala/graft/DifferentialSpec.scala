package graft

import graft.api.GraftSession
import scala.util.Random

/** Differential testing: randomized (Cypher, SQL) template pairs executed
  * through the engine and through Spark SQL over the same raw tables must
  * produce identical multisets. An independent semantic oracle beyond the
  * 50+ handwritten DuckDB oracle queries — catches planner bugs across a
  * much wider predicate/aggregation space. */
class DifferentialSpec extends SparkTestBase {

  // Overridable for deeper one-off sweeps: GRAFT_DIFF_DIR / GRAFT_DIFF_N.
  private val dir =
    sys.env.getOrElse("GRAFT_DIFF_DIR", "/root/testdata/sf0.001")
  private val nPairs = sys.env.getOrElse("GRAFT_DIFF_N", "100").toInt
  lazy val session = new GraftSession(spark)
  lazy val g = graft.tpch.TpchGraph(spark, dir)

  private def registerViews(): Unit =
    Seq("customer", "orders", "nation", "region", "supplier", "part",
      "lineitem")
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
      rnd.nextInt(32) match {
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
        case 5 => // OPTIONAL MATCH <-> LEFT JOIN with join-side predicate
          val thr = 100000 + rnd.nextInt(400000)
          Pair(
            s"MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) " +
              s"WHERE o.o_totalprice > $thr " +
              "RETURN c.c_custkey AS ck, o.o_orderkey AS ok",
            s"SELECT c_custkey AS ck, o_orderkey AS ok FROM d_customer " +
              s"LEFT JOIN d_orders ON o_custkey = c_custkey " +
              s"AND o_totalprice > $thr")
        case 6 => // pattern-exists <-> EXISTS subquery (random negation)
          val thr = 100000 + rnd.nextInt(400000)
          val neg = rnd.nextBoolean()
          Pair(
            s"MATCH (c:Customer) WHERE ${if (neg) "NOT " else ""}" +
              s"(c)-[:PLACED]->(:Order {o_orderstatus: 'O'}) " +
              s"RETURN c.c_custkey AS ck",
            s"SELECT c_custkey AS ck FROM d_customer WHERE " +
              s"${if (neg) "NOT " else ""}EXISTS (SELECT 1 FROM d_orders " +
              s"WHERE o_custkey = c_custkey AND o_orderstatus = 'O')")
        case 7 => // undirected degree count
          Pair(
            "MATCH (n:Nation)-[:FROM_NATION]-(x) " +
              "RETURN n.n_nationkey AS nk, count(*) AS deg",
            "SELECT n_nationkey AS nk, count(*) AS deg FROM (" +
              "SELECT c_nationkey AS k FROM d_customer UNION ALL " +
              "SELECT s_nationkey AS k FROM d_supplier) j " +
              "JOIN d_nation ON n_nationkey = j.k GROUP BY n_nationkey")
        case 8 => // label constraint on a re-bound var (round-2 fix path)
          val (v, label, table, col) = numCols(rnd.nextInt(numCols.size))
          val thr = rnd.nextInt(200000)
          Pair(
            s"MATCH ($v) WITH $v MATCH ($v:$label) WHERE $v.$col > $thr " +
              s"RETURN count(*) AS n",
            s"SELECT count(*) AS n FROM d_$table WHERE $col > $thr")
        case 9 => // UNION across differently-labelled branches
          val k = rnd.nextInt(25)
          val all = if (rnd.nextBoolean()) " ALL" else ""
          Pair(
            s"MATCH (n:Nation) WHERE n.n_nationkey < $k RETURN n.n_name AS x " +
              s"UNION$all MATCH (r:Region) RETURN r.r_name AS x",
            s"SELECT n_name AS x FROM d_nation WHERE n_nationkey < $k " +
              s"UNION$all SELECT r_name AS x FROM d_region")
        case 10 => // var-length expand anchored from a pre-bound target
          val rn = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")(
            rnd.nextInt(5))
          Pair(
            s"MATCH (r:Region {r_name: '$rn'}) " +
              s"MATCH (n:Nation)-[:IN_REGION*1..2]->(r) " +
              "RETURN n.n_nationkey AS nk",
            s"SELECT n_nationkey AS nk FROM d_nation JOIN d_region " +
              s"ON n_regionkey = r_regionkey WHERE r_name = '$rn'")
        case 11 => // first-clause OPTIONAL MATCH (null row on empty)
          val thr = rnd.nextInt(20000)
          Pair(
            s"OPTIONAL MATCH (c:Customer) WHERE c.c_acctbal > $thr " +
              "RETURN c.c_custkey AS ck",
            s"SELECT c_custkey AS ck FROM d_customer WHERE c_acctbal > $thr " +
              "UNION ALL SELECT NULL AS ck WHERE NOT EXISTS " +
              s"(SELECT 1 FROM d_customer WHERE c_acctbal > $thr)")
        case 12 => // temporal predicate on order dates
          val y = 1995 + rnd.nextInt(6)
          val m = 1 + rnd.nextInt(12)
          Pair(
            s"MATCH (o:Order) WHERE o.o_orderdate >= " +
              f"localdatetime('$y-$m%02d-01 00:00:00') " +
              "RETURN count(*) AS n",
            f"SELECT count(*) AS n FROM d_orders WHERE o_orderdate >= " +
              f"TIMESTAMP '$y-$m%02d-01 00:00:00'")
        case 13 => // list quantifier over a per-row constructed list
          val t = rnd.nextInt(150000)
          Pair(
            s"MATCH (o:Order) WHERE any(x IN [o.o_totalprice] WHERE x > $t) " +
              "RETURN count(*) AS n",
            s"SELECT count(*) AS n FROM d_orders WHERE o_totalprice > $t")
        case 14 => // string predicates STARTS WITH / ENDS WITH / CONTAINS
          val (v, label, table, col) = strCols(rnd.nextInt(strCols.size))
          val letter = ('A' + rnd.nextInt(15)).toChar
          val (cy, sq) = rnd.nextInt(3) match {
            case 0 => (s"STARTS WITH '$letter'", s"LIKE '$letter%'")
            case 1 => (s"ENDS WITH '$letter'", s"LIKE '%$letter'")
            case _ => (s"CONTAINS '$letter'", s"LIKE '%$letter%'")
          }
          Pair(
            s"MATCH ($v:$label) WHERE $v.$col $cy RETURN count(*) AS n",
            s"SELECT count(*) AS n FROM d_$table WHERE $col $sq")
        case 15 => // CASE bucketing aggregation
          val (v, label, table, col) = numCols(rnd.nextInt(numCols.size))
          val t = rnd.nextInt(200000)
          Pair(
            s"MATCH ($v:$label) RETURN CASE WHEN $v.$col > $t THEN 'hi' " +
              s"ELSE 'lo' END AS k, count(*) AS n",
            s"SELECT CASE WHEN $col > $t THEN 'hi' ELSE 'lo' END AS k, " +
              s"count(*) AS n FROM d_$table GROUP BY 1")
        case 18 => // pattern comprehension vs correlated count subquery
          val t = rnd.nextInt(300000)
          Pair(
            s"MATCH (c:Customer) RETURN c.c_custkey AS ck, " +
              s"size([(c)-[:PLACED]->(o:Order) WHERE o.o_totalprice > $t | o]) AS n",
            s"SELECT c_custkey AS ck, CAST((SELECT count(*) FROM d_orders " +
              s"WHERE o_custkey = c_custkey AND o_totalprice > $t) AS INTEGER) AS n " +
              "FROM d_customer")
        case 17 => // bound-relationship re-match through WITH
          val t = rnd.nextInt(150000)
          Pair(
            s"MATCH (c:Customer)-[r:PLACED]->(o:Order) WITH r, o " +
              s"WHERE o.o_totalprice > $t MATCH (a)-[r]->(b) " +
              "RETURN count(*) AS n",
            s"SELECT count(*) AS n FROM d_orders WHERE o_totalprice > $t")
        case 16 => // arithmetic with ^ and unary minus (precedence parity)
          val (v, label, table, col) = numCols(rnd.nextInt(numCols.size))
          val t = rnd.nextInt(100000)
          Pair(
            s"MATCH ($v:$label) WHERE $v.$col > $t " +
              s"RETURN round(-($v.$col) ^ 2 + $v.$col, 4) AS x",
            s"SELECT round(-power($col, 2) + $col, 4) AS x FROM d_$table " +
              s"WHERE $col > $t")
        case 19 => // unbounded [*] fixpoint vs the DAG's closed-form count
          val k = 1 + rnd.nextInt(12)
          Pair(
            s"MATCH (c:Customer)-[*]->(x) WHERE c.c_custkey < $k " +
              "RETURN count(*) AS n",
            // Reachable set per customer: o (1 per order), n + n>r (2 per
            // customer), and per lineitem of its orders: li, li>p, li>s,
            // s>n, n>r (5).
            s"SELECT (SELECT count(*) FROM d_orders WHERE o_custkey < $k) " +
              s"+ 2 * (SELECT count(*) FROM d_customer WHERE c_custkey < $k) " +
              "+ 5 * (SELECT count(*) FROM d_lineitem JOIN d_orders " +
              s"ON l_orderkey = o_orderkey WHERE o_custkey < $k) AS n")
        case 20 => // shortestPath preserves outer multiplicity (UNWIND rows)
          val k = rnd.nextInt(10)
          val m = 2 + rnd.nextInt(3)
          Pair(
            s"UNWIND range(1, $m) AS i MATCH p = shortestPath(" +
              s"(s:Supplier {s_suppkey: $k})-[*1..4]->(r:Region)) " +
              "RETURN i, length(p) AS len",
            // s>n>r is the unique shortest route, once per UNWIND row.
            s"SELECT CAST(i AS BIGINT) AS i, CAST(2 AS BIGINT) AS len " +
              s"FROM (SELECT explode(sequence(1, $m)) AS i) " +
              s"WHERE EXISTS (SELECT 1 FROM d_supplier WHERE s_suppkey = $k)")
        case 21 => // uncorrelated EXISTS{} / COUNT{} (global probe join)
          val t = rnd.nextInt(11000)
          if (rnd.nextBoolean())
            Pair(
              s"MATCH (r:Region) WHERE EXISTS { (c:Customer) " +
                s"WHERE c.c_acctbal > $t } RETURN r.r_name AS x",
              s"SELECT r_name AS x FROM d_region WHERE EXISTS " +
                s"(SELECT 1 FROM d_customer WHERE c_acctbal > $t)")
          else
            Pair(
              s"RETURN COUNT { (c:Customer)-[:PLACED]->(o:Order) " +
                s"WHERE o.o_totalprice > $t } AS n",
              s"SELECT CAST(count(*) AS INTEGER) AS n FROM d_orders " +
                s"WHERE o_totalprice > $t")
        case 22 => // correlated CALL {} vs scalar subquery
          val t = rnd.nextInt(400000)
          Pair(
            s"MATCH (c:Customer) CALL { WITH c " +
              s"MATCH (c)-[:PLACED]->(o:Order) WHERE o.o_totalprice > $t " +
              "RETURN count(*) AS n } RETURN c.c_custkey AS ck, n",
            s"SELECT c_custkey AS ck, (SELECT count(*) FROM d_orders " +
              s"WHERE o_custkey = c_custkey AND o_totalprice > $t) AS n " +
              "FROM d_customer")
        case 23 => // chained comparison = range conjunction (round 7)
          val (v, label, table, col) = numCols(rnd.nextInt(numCols.size))
          val lo = rnd.nextInt(100000)
          val hi = lo + 1 + rnd.nextInt(100000)
          Pair(
            s"MATCH ($v:$label) WHERE $lo <= $v.$col <= $hi " +
              s"RETURN $v.$col AS x",
            s"SELECT $col AS x FROM d_$table WHERE $col >= $lo AND $col <= $hi")
        case 24 => // hex/octal literal thresholds (round 7)
          val (v, label, table, col) = numCols(rnd.nextInt(numCols.size))
          val thr = rnd.nextInt(0xFFFF)
          val lit = if (rnd.nextBoolean()) s"0x${thr.toHexString}"
                    else s"0o${java.lang.Integer.toOctalString(thr)}"
          Pair(
            s"MATCH ($v:$label) WHERE $v.$col > $lit RETURN $v.$col AS x",
            s"SELECT $col AS x FROM d_$table WHERE $col > $thr")
        case 25 => // temporal accessor predicate (round 7)
          val y = 1992 + rnd.nextInt(7)
          val acc = rnd.nextInt(3)
          val (cy, sq) = acc match {
            case 0 => (s"o.o_orderdate.year = $y", s"year(o_orderdate) = $y")
            case 1 => (s"o.o_orderdate.quarter = ${1 + rnd.nextInt(4)}",
              null) // rebuilt below
            case _ => (s"o.o_orderdate.month = ${1 + rnd.nextInt(12)}", null)
          }
          val cyPred = cy
          val sqPred = if (sq != null) sq else {
            val n = cyPred.split("= ").last
            if (cyPred.contains("quarter")) s"quarter(o_orderdate) = $n"
            else s"month(o_orderdate) = $n"
          }
          Pair(
            s"MATCH (o:Order) WHERE $cyPred RETURN count(*) AS n",
            s"SELECT count(*) AS n FROM d_orders WHERE $sqPred")
        case 26 => // quantified path pattern {1,1} with inner WHERE ==
          // plain filtered join (round 7)
          val thr = rnd.nextInt(400000)
          Pair(
            s"MATCH (c:Customer) ((x)-[r:PLACED]->(y) " +
              s"WHERE y.o_totalprice > $thr){1,1} (o) " +
              "RETURN c.c_custkey AS ck, count(*) AS n",
            s"SELECT c_custkey AS ck, count(*) AS n FROM d_customer " +
              s"JOIN d_orders ON o_custkey = c_custkey " +
              s"WHERE o_totalprice > $thr GROUP BY c_custkey")
        case 28 => // undirected match reports STORED endpoints (round 12):
          // every FROM_NATION rel is stored customer->nation, so however
          // the undirected pattern walks it, startNode must be the
          // customer and endNode the nation.
          val k = 5 + rnd.nextInt(40)
          Pair(
            s"MATCH (c:Customer)-[r:FROM_NATION]-(n:Nation) " +
              s"WHERE c.c_custkey <= $k " +
              "RETURN (id(startNode(r)) = id(c) AND id(endNode(r)) = id(n)) AS ok",
            s"SELECT true AS ok FROM d_customer WHERE c_custkey <= $k")
        case 29 => // WITH DISTINCT r collapses the two orientation rows of
          // an undirected match to relationship identity (round 12).
          val (relType, table) = Seq(
            ("IN_REGION", "d_nation"), ("PLACED", "d_orders"))(rnd.nextInt(2))
          Pair(
            s"MATCH ()-[r:$relType]-() WITH DISTINCT r RETURN count(r) AS n",
            s"SELECT count(*) AS n FROM $table")
        case 27 => // QPP {1,2} over IN_REGION/FROM_NATION == union of the
          // 1- and 2-hop joins (round 7)
          val k = rnd.nextInt(20)
          Pair(
            s"MATCH (c:Customer) ((x)-[:FROM_NATION|IN_REGION]->(y)){1,2} (t) " +
              s"WHERE c.c_custkey <= $k RETURN count(*) AS n",
            s"""SELECT count(*) AS n FROM (
               SELECT 1 FROM d_customer WHERE c_custkey <= $k
               UNION ALL
               SELECT 1 FROM d_customer JOIN d_nation ON n_nationkey = c_nationkey
                 JOIN d_region ON r_regionkey = n_regionkey WHERE c_custkey <= $k) u""")
        case 30 => // entity collect/UNWIND round-trip is the identity
          // (round 12): collected entities keep properties through the
          // list and back out of UNWIND.
          val (v, label, table, c) = numCols(rnd.nextInt(numCols.size))
          val thr = rnd.nextInt(200000)
          Pair(
            s"MATCH ($v:$label) WITH collect($v) AS vs UNWIND vs AS m " +
              s"WITH m WHERE m.$c > $thr RETURN m.$c AS x",
            s"SELECT $c AS x FROM d_$table WHERE $c > $thr")
        case 31 => // coalesce over an unmatched OPTIONAL entity falls
          // back to the matched one (entity schema unification, round 12)
          val (v, label, table, c) = numCols(rnd.nextInt(numCols.size))
          val k = 1 + rnd.nextInt(50)
          Pair(
            s"MATCH ($v:$label) WHERE $v.$c <= $k " +
              s"OPTIONAL MATCH (zz:NoSuchLabel) " +
              s"RETURN coalesce(zz, $v).$c AS x",
            s"SELECT $c AS x FROM d_$table WHERE $c <= $k")
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
    val pairs = genPairs(new Random(20260812L), nPairs)
    var checked = 0
    pairs.foreach { p =>
      val got = dfBag(session.cypher(g, p.cypher))
      val exp = dfBag(spark.sql(p.sql))
      assert(got === exp,
        s"differential mismatch\ncypher: ${p.cypher}\nsql: ${p.sql}")
      checked += 1
    }
    assert(checked === nPairs)
  }
}
