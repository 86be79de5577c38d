package org.apache.spark.sql.graftx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Package-local bridge that makes a lazy `localCheckpoint` keep its TRUE
  * hash partitioning visible to the planner (guide §2.4 — remove shuffles
  * outright).
  *
  * `Dataset.localCheckpoint` wraps the checkpointed RDD in a `LogicalRDD`
  * whose `outputPartitioning` comes out as `UnknownPartitioning(0)` under
  * AQE (the adaptive plan cannot promise a partitioning before execution),
  * so every per-round join against a pinned frame re-exchanges it — the
  * dominant shuffle in the iterative algorithms (measured r15: sssp moved
  * 473 MB for a ~45 MB edge frame, one full re-exchange per round).
  *
  * The data, however, IS hash-placed: when the frame was just produced by
  * `repartition(n, keys)` with an EXPLICIT n (AQE never coalesces an
  * explicitly-sized repartition — shuffle origin REPARTITION_BY_NUM),
  * followed only by partitioning-preserving operators (dedup/aggregate on
  * a key superset, filter, non-renaming project), every row sits in
  * partition `pmod(murmur3(keys), n)` — exactly Spark's
  * `HashPartitioning(keys, n)` contract. This helper re-wraps the
  * checkpointed LogicalRDD with that claim so EnsureRequirements lets
  * co-partitioned consumers skip the exchange.
  *
  * Correctness guards: the claim is refused (falls back to the plain
  * checkpoint) unless the checkpointed RDD's partition count equals the
  * explicit `n`, and the key attributes resolve in the output. A FALSE
  * claim would silently mis-join, so callers must only pass frames shaped
  * as described above; every registry query downstream is hash-checked
  * against the DuckDB oracle, which would catch a violation.
  */
object PinBridge {

  /** The session's AQE advisory partition size (bytes) — the same target
    * AQE coalescing aims for; used to size keyed pins from estimated
    * input bytes (guide §2.2). */
  def advisoryPartitionSize(spark: org.apache.spark.sql.SparkSession): Long =
    spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)

  /** Lazy localCheckpoint of `df` re-wrapped with the
    * `HashPartitioning(keys, n)` the frame was physically laid out with. */
  def checkpointKeepingHash(df: DataFrame, keys: Seq[String],
      n: Int): DataFrame = {
    val ck = df.localCheckpoint(eager = false)
      .asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    ck.queryExecution.analyzed match {
      case lr @ LogicalRDD(output, rdd, _, ordering, streaming, stream)
          if rdd.getNumPartitions == n &&
            keys.forall(k => output.exists(_.name == k)) =>
        val attrs = keys.map(k => output.find(_.name == k).get)
        Dataset.ofRows(ck.sparkSession,
          LogicalRDD(output, rdd, HashPartitioning(attrs, n), ordering,
            streaming, stream)(ck.sparkSession))
      case _ => ck // partition count changed or keys missing: no claim
    }
  }
}
