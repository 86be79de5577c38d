package graft

import graft.algos.GraphAlgorithms
import org.apache.spark.sql.functions._

/** Round-14 optimization shape pins (OPTIMIZATION_r14.md): the wedge
  * closing join must stay a shuffled-hash join with the canon side as
  * build (a refactor back to sort-merge silently re-sorts the
  * O(Σ fwd_deg²) wedge frame — the measured dominant cost of the
  * triangle family), and the fused canonicalizations must keep their
  * single-exchange shape (a second exchange means the dedup stopped
  * riding the repartition). */
class R14ShapeSpec extends SparkTestBase {
  import spark.implicits._

  private def withStaticPlans[T](body: => T): T = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("triangle closing join is shuffled-hash (wedge side never sorted)") {
    withStaticPlans {
      import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec,
        SortMergeJoinExec}
      val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
      val plan = GraphAlgorithms.triangleCountEdges(e)
        .queryExecution.executedPlan
      val semiSmj = plan.collect {
        case j: SortMergeJoinExec if j.joinType.sql == "LEFT SEMI" => j
      }
      val semiShj = plan.collect {
        case j: ShuffledHashJoinExec if j.joinType.sql == "LEFT SEMI" => j
      }
      assert(semiSmj.isEmpty && semiShj.nonEmpty,
        s"closing semi-join must be shuffled-hash, not sort-merge:\n$plan")
    }
  }

  test("fused canonicalization: dedup rides the repartition (one exchange)") {
    withStaticPlans {
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
      val canon = e.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .repartition(col("a")).dropDuplicates(Seq("a", "b"))
      val exchanges = canon.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(exchanges.length === 1,
        s"expected the dedup to ride the single hash(a) exchange, got " +
          s"${exchanges.length}:\n${canon.queryExecution.executedPlan}")
      assert(canon.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
        Set((1L, 2L), (2L, 3L)))
    }
  }

  test("betweenness aggregate-before-anti preserves Brandes scores on revisits") {
    // Diamond + tail: 1->2, 1->3, 2->4, 3->4, 4->5 (undirected BFS from 1
    // revisits 4 from two parents and 2/3 from each other at depth 2) —
    // the exact shape where aggregating sigma before the visited
    // anti-join could diverge if exclusion were not all-or-nothing.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val src = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val got = GraphAlgorithms.betweenness(e, src)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Hand-computed exact Brandes (undirected, all sources, halved):
    // (1,4): σ=2 via 2/3 → 2:+0.5, 3:+0.5. (1,5): σ=2, both through 4 →
    // 2:+0.5, 3:+0.5, 4:+1. (2,3): σ=2 via 1/4 → 1:+0.5, 4:+0.5.
    // (2,5)/(3,5): through 4 → 4:+1 each. Totals: 1→0.5, 2→1, 3→1,
    // 4→3.5, 5→0.
    assert(got(2L) === 1.0 && got(3L) === 1.0, s"got $got")
    assert(got(4L) === 3.5, s"got $got")
    assert(got(1L) === 0.5 && got(5L) === 0.0, s"got $got")
  }
}
