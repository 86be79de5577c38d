package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Token-budget shard packing for training-data pipelines: assign each
  * document to a contiguous shard such that every shard holds ~`budget`
  * tokens in document order. This is the "pack the corpus into ~equal
  * context-window shards" step that precedes tokenization jobs.
  *
  * `shard(doc) = floor(exclusivePrefixSum(tokens) / budget)` over documents
  * ordered by id — a global prefix sum.
  *
  * Scale design: the naive formulation is a single window
  * `sum(tokens) OVER (ORDER BY id)` with no PARTITION BY, which Spark
  * executes on ONE partition — a non-starter at corpus scale. Instead this
  * runs the classic two-pass distributed prefix sum:
  *
  *   1. range-repartition by id + sort within partitions (one shuffle;
  *      partitions now hold contiguous, sorted id ranges),
  *   2. job A: per-partition token totals (numPartitions rows to the
  *      driver — O(parallelism), independent of data size),
  *   3. driver: exclusive scan of the totals -> per-partition start offset,
  *      keyed by each partition's first id (robust to downstream
  *      coalesce/AQE re-fusing the narrow chain),
  *   4. job B: per-partition running sum seeded from the broadcast offset
  *      of the first id seen (no further shuffle; the step-1 exchange is
  *      persisted so job B does not recompute it).
  *
  * Every stage is partition-parallel and the driver only ever sees one row
  * per partition, so the same plan runs unchanged on a 1000-executor
  * cluster.
  */
object Pack {

  /** Returns (id, toks, shard) — one row per input row. `tokensCol` is any
    * integral column expression (e.g. `TextAnalysis.tokenCount(col)`). */
  def packByTokenBudget(df: DataFrame, idCol: String, tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val ranged = df
      .select(col(idCol).cast(LongType).as("id"),
        tokensCol.cast(LongType).as("toks"))
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions("id")
      .as[(Long, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Job A: (first id, token total) per partition. rdd keeps the
    // partitioning and the within-partition sort of the persisted Dataset;
    // empty partitions drop out (they contribute nothing to any offset).
    val partStats: Array[(Long, Long)] = ranged.rdd
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val (firstId, firstToks) = it.next()
          var total = firstToks
          while (it.hasNext) total += it.next()._2
          Iterator.single((firstId, total))
        }
      }
      .collect().sortBy(_._1)
    // Driver: exclusive scan in first-id order = global order (range
    // partitioning assigns disjoint ascending id ranges), keyed by the
    // partition's first id rather than its index. Job B then recovers its
    // offset by peeking the first row it sees — NOT from
    // TaskContext.getPartitionId(), which is the *task's* partition and
    // diverges from the exchange's whenever a downstream coalesce (e.g. a
    // single-file write) or AQE fuses/merges the narrow chain. Merges only
    // ever concatenate adjacent sorted ranges, so the first id still lands
    // exactly on a recorded boundary and the running sum stays global.
    val firstIds = partStats.map(_._1)
    val offsets = partStats.scanLeft(0L)(_ + _._2).init
    val bcFirstIds = spark.sparkContext.broadcast(firstIds)
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val bud = budget
    // Job B: exclusive running sum from the recovered offset. Reads the
    // persisted step-1 exchange, so the range shuffle and token expression
    // run once. (The offsets snapshot the input at call time, like any
    // built index.)
    ranged.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val buf = it.buffered
        // Floor search: greatest recorded boundary <= the first id seen.
        val ids = bcFirstIds.value
        val pos = java.util.Arrays.binarySearch(ids, buf.head._1)
        val idx = if (pos >= 0) pos else math.max(0, -pos - 2)
        var cum = bcOffsets.value(idx)
        buf.map { case (id, toks) =>
          val shard = cum / bud
          cum += toks
          (id, toks, shard)
        }
      }
    }.toDF("id", "toks", "shard")
  }

  /** Write a packed corpus as one directory per shard
    * (`dir/shard=N/part-*.parquet`): join the shard assignment back onto
    * the full rows by id (both sides hash-shuffle once on the id),
    * repartition by shard so each shard's rows land in as few files as
    * possible, and write with `partitionBy` — the layout tokenizer jobs
    * consume shard-at-a-time. Returns the shard count.
    *
    * Scale notes: `partitionBy` alone would have every task write a file
    * per shard it sees (tasks x shards small files); the repartition on
    * the shard key bounds it to ~one file per shard per storage block.
    * Shard counts are corpus_tokens / budget — thousands, not millions —
    * so the partition column stays low-cardinality by construction. */
  def writeSharded(df: DataFrame, idCol: String, tokensCol: Column,
      budget: Long, dir: String): Long = {
    val packed = packByTokenBudget(df, idCol, tokensCol, budget)
    val joined = df.join(
      packed.select(col("id").as(idCol), col("shard")), idCol)
    joined
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    packed.agg(F.max(col("shard"))).head().getLong(0) + 1
  }
}
