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

  /** Character shingles of size k over whitespace-normalized lower-cased
    * text, deduplicated. */
  def shingles(text: Column, k: Int): Column = {
    val norm = lower(regexp_replace(text, "\\s+", " "))
    array_distinct(transform(
      sequence(lit(0), greatest(F.length(norm) - k, lit(0))),
      i => norm.substr(i + 1, lit(k))))
  }

  /** MinHash signature: for seed i, min over shingles of xxhash64(s, i). */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleCol, s => xxhash64(s, seed))))

  /** MinHash + banded LSH near-duplicate candidate pairs.
    *
    * shingle -> minhash -> band -> bucket-join (the standard construction;
    * one shuffle on (band index, band hash), candidate verification via
    * signature agreement — no O(n^2) comparisons).
    *
    * @return (id1, id2, est_jaccard) with id1 < id2,
    *         est_jaccard = fraction of agreeing minhash positions.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 5,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = df.select(col(idCol).as("_mh_id"),
        minhashSignature(shingles(col(textCol), shingleSize), numHashes)
          .as("_mh_sig"))
      .persist()
    // band j = hash of the j-th signature slice; explode to bucket rows.
    val banded = sigs.select(col("_mh_id"), col("_mh_sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          j => xxhash64(F.slice(col("_mh_sig"), j * rowsPerBand + 1,
            lit(rowsPerBand)), j))))
      .withColumnRenamed("pos", "_mh_band")
      .withColumnRenamed("col", "_mh_bucket")
    val left = banded.select(col("_mh_band").as("_b1"),
      col("_mh_bucket").as("_k1"), col("_mh_id").as("id1"),
      col("_mh_sig").as("_sig1"))
    val right = banded.select(col("_mh_band").as("_b2"),
      col("_mh_bucket").as("_k2"), col("_mh_id").as("id2"),
      col("_mh_sig").as("_sig2"))
    val pairs = left.join(right,
        col("_b1") === col("_b2") && col("_k1") === col("_k2") &&
          col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("_sig1"), col("_sig2"))
      .dropDuplicates("id1", "id2")
    val agree = F.size(F.filter(zip_with(col("_sig1"), col("_sig2"),
      (a, b) => a === b), x => x))
    pairs
      .withColumn("est_jaccard", agree.cast(DoubleType) / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("est_jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: per bit, +1/-1 votes from each
    * token's xxhash64; the sign becomes the bit. */
  def simhash(text: Column): Column = {
    val tokens = F.split(lower(trim(text)), "\\s+")
    val votes = F.aggregate(tokens,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("shiftrightunsigned", xxhash64(t), b)
              .bitwiseAND(1) === 1,
            lit(1L)).otherwise(lit(-1L))),
        (a, v) => a + v))
    F.aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup candidate pairs: bucket on 4 16-bit slices (any pair
    * within Hamming distance <= maxHamming shares at least one slice when
    * maxHamming <= 3), verify with bit_count(xor). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("_sh_id"),
      simhash(col(textCol)).as("_sh_hash")).persist()
    val banded = sh.select(col("_sh_id"), col("_sh_hash"),
      posexplode(transform(sequence(lit(0), lit(3)), j =>
        call_function("shiftrightunsigned", col("_sh_hash"), j * 16)
          .bitwiseAND(0xFFFFL))))
    val left = banded.select(col("pos").as("_b1"), col("col").as("_k1"),
      col("_sh_id").as("id1"), col("_sh_hash").as("_h1"))
    val right = banded.select(col("pos").as("_b2"), col("col").as("_k2"),
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
}
