package graft

import graft.algos.GraphAlgorithms
import org.apache.spark.sql.functions._

/** Round-15 optimization shape pins: the wedge-family bloom prefilter
  * (guide §3.2) must stay in front of the wedge exchange, and must never
  * change results (no false negatives by construction). */
class R15ShapeSpec extends SparkTestBase {
  import spark.implicits._

  // A graph big enough that triangles/wedges are non-trivial: a clique of
  // 12 (220 triangles) plus a 200-node star (0 triangles, many wedges)
  // plus a chain. Dup edges and both orientations exercise canon.
  private def messyEdges = {
    val clique = for (i <- 1L to 12L; j <- 1L to 12L if i != j) yield (i, j)
    val star = (100L to 299L).map(i => (50L, i))
    val chain = (300L to 340L).map(i => (i, i + 1))
    (clique ++ star ++ chain).toDF("src", "dst")
  }

  test("bloom prefilter leaves triangle counts unchanged (forced on vs off)") {
    val e = messyEdges
    val on = withSQLConf("spark.graft.bloom.minItems" -> "0") {
      GraphAlgorithms.triangleCountEdges(e).head().getLong(0)
    }
    val off = withSQLConf("spark.graft.bloom.minItems" -> s"${Long.MaxValue}") {
      GraphAlgorithms.triangleCountEdges(e).head().getLong(0)
    }
    assert(on === off && on === 220L, s"bloom on=$on off=$off")
  }

  test("bloom prefilter leaves lcc and k-truss unchanged (forced on vs off)") {
    val e = messyEdges
    def lccMap(minItems: String) = withSQLConf(
      "spark.graft.bloom.minItems" -> minItems) {
      GraphAlgorithms.localClusteringCoefficient(e)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
    }
    assert(lccMap("0") === lccMap(s"${Long.MaxValue}"))
    def truss(minItems: String) = withSQLConf(
      "spark.graft.bloom.minItems" -> minItems) {
      GraphAlgorithms.kTrussEdges(e, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(truss("0") === truss(s"${Long.MaxValue}"))
  }

  test("bloom prefilter sits BEFORE the wedge exchange in the plan") {
    withSQLConf("spark.graft.bloom.minItems" -> "0",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.SparkPlan
      val plan = GraphAlgorithms.triangleCountEdges(messyEdges)
        .queryExecution.executedPlan
      // Find the exchange feeding the closing semi-join's streamed (wedge)
      // side; somewhere strictly BELOW it the might_contain predicate must
      // appear (as a Filter or fused into the wedge join's condition), so
      // non-closing wedges are dropped before their bytes are shuffled.
      def hasBloom(p: SparkPlan): Boolean =
        p.expressions.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])) ||
          p.children.exists(hasBloom)
      val wedgeExchanges = plan.collect {
        case ex: ShuffleExchangeExec if hasBloom(ex.child) => ex
      }
      assert(wedgeExchanges.nonEmpty,
        s"might_contain must be below the wedge exchange:\n$plan")
    }
  }
}
