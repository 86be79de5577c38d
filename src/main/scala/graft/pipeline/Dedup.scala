package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Large-scale deduplication operators for training-data pipelines.
  *
  * All operators are pure DataFrame compositions: they shuffle once on the
  * dedup key (exact) or on LSH bucket keys (near-dup), never collect to the
  * driver, and stay inside whole-stage codegen (no UDFs) — the properties
  * that keep them viable at 100 TB.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Split banded LSH bucket rows into (cold rows, hot-bucket stats): a
    * bucket with more than `maxBucketSize` member rows would emit a
    * quadratic candidate-pair blowup (a million-document boilerplate
    * cluster in ONE band bucket is 10^12 pairs), so oversized buckets are
    * excluded from pairing and REPORTED — never silently processed, never
    * silently dropped without a figure (the no-silent-caps rule). Returns
    * (rows in non-hot buckets, (hot bucket count, rows in hot buckets)).
    * The hot-bucket list is aggregated and tiny, so the exclusion join
    * broadcasts.
    *
    * Shape note (round-9 A/B, do not redo): folding this count into a
    * count-window over the banding keys (filter on _bn instead of the
    * anti-join) measured 20-25% SLOWER on q_dedup_minhash at sf0.1 under
    * matched sentinels — the window forces a sort into the pin and widens
    * every cached row, while this shape's groupBy reuses the (band,
    * bucket) partitioning shuffle-free and skips the anti-join entirely
    * in the common zero-hot-buckets case. The guard's remaining cost is
    * one aggregate job over the pinned banded rows — the price of the
    * no-silent-caps report. */
  private[graft] def splitHotBuckets(banded: DataFrame, keys: Seq[String],
      maxBucketSize: Int): (DataFrame, (Long, Long)) = {
    val hot = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") > maxBucketSize)
    val s = hot.agg(count(lit(1)), sum(col("_bn"))).head()
    val stats = (s.getLong(0), if (s.isNullAt(1)) 0L else s.getLong(1))
    val cold = if (stats._1 == 0L) banded
      else banded.join(broadcast(hot.select(keys.map(col): _*)),
        keys, "left_anti")
    (cold, stats)
  }

  /** Exact deduplication: keep the row with the minimum id per key group.
    * One hash-shuffle on the key columns with map-side partial aggregation.
    * For wide payloads pass only (id, key) and re-join; for the common case
    * this returns the surviving ids. */
  def exactIds(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))

  /** Exact dedup retaining whole rows: min-id row per key via a single
    * aggregation over (key -> min_struct(id, row)). */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val payload = struct(col(idCol) +: df.columns.filterNot(_ == idCol)
      .map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(min(payload).as("_row"))
      .select(df.columns.map(c => col("_row." + c).as(c)): _*)
  }

  /** PERF NOTE: this HOF form runs interpreted and re-evaluates the inlined
    * normalization once per element — fine for small fixtures and single
    * values, but hot paths should explode positions over a projected
    * normalized column with a codegen substr instead (see
    * minhashSignatures, Decontaminate.gramHashes, trueNearDupPairs).
    *
    * Character shingles of size k over whitespace-normalized lower-cased
    * text, deduplicated. */
  def shingles(text: Column, k: Int): Column = {
    val norm = lower(regexp_replace(text, "\\s+", " "))
    array_distinct(transform(
      sequence(lit(0), greatest(F.length(norm) - k, lit(0))),
      i => norm.substr(i + 1, lit(k))))
  }

  /** MinHash signatures for a whole DataFrame: explode shingles to rows,
    * then one codegen'd hash aggregation with 64 `min(xxhash64(s, i))`
    * columns. (The tempting nested higher-order-function formulation runs
    * interpreted and single-partition on small files — ~100x slower; this
    * shape is one shuffle and fully codegen'd, which is what survives at
    * 100 TB.) Output: (_mh_id, _mh_sig array<long>). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleSize: Int): DataFrame = {
    val spark = df.sparkSession
    // Explode shingle *positions* and slice with substr so the whole
    // shingling stage stays in codegen (the transform+array_distinct
    // formulation runs interpreted and quadratic — measured 6.5s vs <1s on
    // 5k docs). Duplicate shingles are harmless: min() is idempotent.
    val norm = lower(regexp_replace(col(textCol), "\\s+", " "))
    val exploded = df
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("_mh_id"), norm.as("_norm"))
      .select(col("_mh_id"), col("_norm"),
        explode(sequence(lit(0),
          greatest(F.length(col("_norm")) - shingleSize, lit(0)))).as("_i"))
      .select(col("_mh_id"),
        col("_norm").substr(col("_i") + 1, lit(shingleSize)).as("_sh"))
      .withColumn("_h0", xxhash64(col("_sh")))
    // Universal hashing: hash each shingle STRING once, derive the i-th
    // hash as a_i * h + b_i (overflowing long arithmetic — 64 codegen'd
    // multiply-adds per shingle instead of 64 string hashes). The
    // deliberate WRAPAROUND raises ARITHMETIC_OVERFLOW under Spark's
    // default ANSI mode, and Dedup is a plain DataFrame API a user may
    // call from an ANSI session (the engine's own sessions set
    // ansi=false) — so ANSI sessions take the xxhash64(h, i) derivation
    // instead: mode-independent and equally uniform, measured ~1.8x the
    // multiply-add cost on this stage (r13), which is why it is the
    // fallback and not the default.
    val ansi = spark.conf.getOption("spark.sql.ansi.enabled")
      .exists(_.equalsIgnoreCase("true"))
    val rnd = new scala.util.Random(42)
    val as = Array.fill(numHashes)(rnd.nextLong() | 1L)
    val bs = Array.fill(numHashes)(rnd.nextLong())
    val aggs = (0 until numHashes).map(i =>
      min(if (ansi) xxhash64(col("_h0"), lit(i))
          else col("_h0") * as(i) + bs(i)).as(s"_h$i"))
    exploded.groupBy(col("_mh_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("_mh_id"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("_mh_sig"))
  }

  /** MinHash + banded LSH near-duplicate candidate pairs.
    *
    * shingle -> minhash -> band -> bucket-join (the standard construction;
    * one shuffle on (band index, band hash), candidate verification via
    * signature agreement — no O(n^2) comparisons).
    *
    * Hot-bucket guard: any (band, bucket) with more than `maxBucketSize`
    * documents is excluded from pairing and logged with its dropped row
    * mass — web-scale corpora carry million-document boilerplate clusters
    * whose single bucket would otherwise emit a quadratic pair set.
    * Members of a skipped bucket still pair through their OTHER bands
    * unless those are hot too (a cluster over the cap is hot in every
    * band — that cluster is exactly the boilerplate the cap targets; route
    * it to exact dedup, which handles identical text in one linear pass).
    *
    * @return (id1, id2, est_jaccard) with id1 < id2,
    *         est_jaccard = fraction of agreeing minhash positions.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 5,
      threshold: Double = 0.5, maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = graft.impl.Pin(
      minhashSignatures(df, idCol, textCol, numHashes, shingleSize))
    // band j = hash of the j-th signature slice; explode to SLIM bucket
    // rows (id, band, bucket) — the 64-long signature array stays behind
    // in the pinned sigs frame and is re-attached only to the (small)
    // deduplicated candidate pair set. Carrying the array through the
    // banded self-join shuffled ~32x more bytes for the same pairs.
    // Pinned pre-partitioned on (band, bucket): the hot-bucket count, the
    // broadcast anti-join AND the bucket self-join all consume this one
    // partitioning, so the banded rows shuffle ONCE.
    val banded = graft.impl.Pin(sigs.select(col("_mh_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          j => xxhash64(F.slice(col("_mh_sig"), j * rowsPerBand + 1,
            lit(rowsPerBand)), j))))
      .withColumnRenamed("pos", "_mh_band")
      .withColumnRenamed("col", "_mh_bucket")
      .repartition(col("_mh_band"), col("_mh_bucket")))
    val (cold, (nHot, hotRows)) = splitHotBuckets(
      banded, Seq("_mh_band", "_mh_bucket"), maxBucketSize)
    if (nHot > 0) log.warn(
      s"minhashLsh: excluded $nHot oversized LSH bucket(s) " +
        s"(> $maxBucketSize members; $hotRows bucket rows dropped) from " +
        "pairing — clusters larger than the cap need exact dedup, not LSH")
    val left = cold.select(col("_mh_band").as("_b1"),
      col("_mh_bucket").as("_k1"), col("_mh_id").as("id1"))
    val right = cold.select(col("_mh_band").as("_b2"),
      col("_mh_bucket").as("_k2"), col("_mh_id").as("id2"))
    val pairs = left.join(right,
        col("_b1") === col("_b2") && col("_k1") === col("_k2") &&
          col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .dropDuplicates("id1", "id2")
      .join(sigs.select(col("_mh_id").as("id1"), col("_mh_sig").as("_sig1")),
        "id1")
      .join(sigs.select(col("_mh_id").as("id2"), col("_mh_sig").as("_sig2")),
        "id2")
    val agree = F.size(F.filter(zip_with(col("_sig1"), col("_sig2"),
      (a, b) => a === b), x => x))
    pairs
      .withColumn("est_jaccard", agree.cast(DoubleType) / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("est_jaccard"))
  }

  /** 64-bit SimHash per document: explode tokens, then 64 codegen'd
    * sum(+-1) aggregates (one per bit) combined into a long. Same
    * explode-then-aggregate shape as minhashSignatures and for the same
    * scale reason. Output: (_sh_id, _sh_hash). */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val exploded = df
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("_sh_id"),
        explode(F.split(lower(trim(col(textCol))), "\\s+")).as("_tok"))
      .withColumn("_th", xxhash64(col("_tok")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftrightunsigned(col("_th"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"_v$b")
    }
    exploded.groupBy(col("_sh_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("_sh_id"),
        (0 until 64).map(b =>
          when(col(s"_v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce((a, c) => a.bitwiseOR(c)).as("_sh_hash"))
  }

  /** SimHash near-dup candidate pairs: bucket on 4 16-bit slices (any pair
    * within Hamming distance <= maxHamming shares at least one slice when
    * maxHamming <= 3), verify with bit_count(xor). Oversized slice buckets
    * are excluded and logged — same hot-bucket guard (and rationale) as
    * [[minhashLsh]]. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    val sh = graft.impl.Pin(simhashes(df, idCol, textCol))
    // Same pinned (slice, key) pre-partitioning as minhashLsh: guard
    // count, anti-join and self-join share one shuffle of the banded rows.
    val banded = graft.impl.Pin(sh.select(col("_sh_id"), col("_sh_hash"),
        posexplode(transform(sequence(lit(0), lit(3)), j =>
          call_function("shiftrightunsigned", col("_sh_hash"), j * 16)
            .bitwiseAND(0xFFFFL))))
      .repartition(col("pos"), col("col")))
    val (cold, (nHot, hotRows)) = splitHotBuckets(
      banded, Seq("pos", "col"), maxBucketSize)
    if (nHot > 0) log.warn(
      s"simhashPairs: excluded $nHot oversized slice bucket(s) " +
        s"(> $maxBucketSize members; $hotRows bucket rows dropped) from " +
        "pairing — clusters larger than the cap need exact dedup, not LSH")
    val left = cold.select(col("pos").as("_b1"), col("col").as("_k1"),
      col("_sh_id").as("id1"), col("_sh_hash").as("_h1"))
    val right = cold.select(col("pos").as("_b2"), col("col").as("_k2"),
      col("_sh_id").as("id2"), col("_sh_hash").as("_h2"))
    left.join(right, col("_b1") === col("_b2") && col("_k1") === col("_k2") &&
        col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("_h1").bitwiseXOR(col("_h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Exact n-gram (token-set) Jaccard similarity for all pairs in df
    * (quadratic — bound the input; the scale path is minhashLsh). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val toks = df.select(col(idCol).as("_j_id"),
      array_distinct(F.split(lower(trim(col(textCol))), "\\s+")).as("_j_toks"))
    val l = toks.select(col("_j_id").as("id1"), col("_j_toks").as("_t1"))
    val r = toks.select(col("_j_id").as("id2"), col("_j_toks").as("_t2"))
    val inter = F.size(array_intersect(col("_t1"), col("_t2"))).cast(DoubleType)
    val uni = (F.size(col("_t1")) + F.size(col("_t2"))).cast(DoubleType) - inter
    l.join(r, col("id1") < col("id2"))
      .withColumn("jaccard", inter / uni)
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Exact duplicate token-window (n-gram span) statistics per document —
    * the substring-level exact-dedup signal of Lee et al. 2021
    * ("Deduplicating Training Data Makes Language Models Better"): a
    * window of `n` consecutive whitespace tokens that occurs in more than
    * one document marks both occurrences as duplicated text. Returns one
    * row per input document:
    * (idCol, n_windows, dup_windows, dup_frac) where dup_windows counts
    * window START POSITIONS whose n-token window also appears in some
    * OTHER document (dup_frac = dup_windows / n_windows, 0 for documents
    * shorter than n tokens).
    *
    * Scale shape: fan the input across the shuffle parallelism BEFORE the
    * ~tokens× window expansion, explode window positions over a projected
    * token array (slice + array_join stay codegen), and carry windows as
    * 64-bit hashes so the duplicate-marking shuffle moves longs, not
    * n-token strings (same stance as Decontaminate.gramHashes: a hash
    * collision can over-mark one position in 2^64 — accepted and
    * documented, the string form would multiply shuffle volume by ~8n).
    * Cross-document test is min(id) != max(id) per window hash — one
    * map-side-combinable aggregation, no count-distinct. Two shuffles
    * total (window hash, then doc id). */
  def duplicateSpanStats(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val wins = df.repartition(parts, col(idCol))
      .select(col(idCol), F.split(trim(col(textCol)), "\\s+").as("_tk"))
      // sequence(0, negative) would generate DESCENDING positions for
      // docs shorter than n tokens (the sampleFrames bug class) — such
      // docs have zero windows, so explode an empty array instead.
      .select(col(idCol), col("_tk"),
        explode(when(F.size(col("_tk")) >= n,
            sequence(lit(0), F.size(col("_tk")) - n))
          .otherwise(array().cast(ArrayType(IntegerType)))).as("_i"))
      .select(col(idCol),
        xxhash64(array_join(slice(col("_tk"), col("_i") + 1, lit(n)), "\u0001"))
          .as("_wh"))
    val marks = wins.groupBy(col("_wh"))
      .agg((min(col(idCol)) =!= max(col(idCol))).as("_dup"))
    val perDoc = wins.join(marks, Seq("_wh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("_dup"), 1L).otherwise(0L)).as("dup_windows"))
    df.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
      .withColumn("dup_frac", coalesce(
        round(col("dup_windows") / col("n_windows"), 4), lit(0.0)))
  }

  /** Collapse duplicate pairs into clusters: every id in `allIds` maps to
    * the minimum id reachable through the (id1, id2) pair graph — the
    * terminal canonicalization step of a dedup pipeline (pairs come from
    * minhashLsh / simhashPairs / cosineNearDupPairs / an exact self-join).
    * Delegates to the alternating large-star/small-star contraction
    * (Kiveris et al., SoCC 2014 — [[graft.algos.GraphAlgorithms.ccStarLabels]]):
    * rounds are O(log n) regardless of the pair graph's diameter, and the
    * cap THROWS rather than returning mid-propagation labels (per-hop
    * min-propagation, the previous formulation, needed O(diameter) rounds
    * — a chain of near-dup pairs longer than the cap silently returned
    * wrong canonical ids). Singletons map to themselves. */
  def canonicalize(allIds: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", id1: String = "id1", id2: String = "id2",
      maxIterations: Int = 20): DataFrame = {
    val e = pairs.select(col(id1).cast(LongType).as("src"),
      col(id2).cast(LongType).as("dst"))
    val comp = graft.algos.GraphAlgorithms.ccStarLabels(e, maxIterations)
    allIds.select(col(idCol).cast(LongType).as("id")).distinct()
      .join(comp, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("canonical"))
  }
}
