package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share long
  * character n-grams with a probe (benchmark/eval) set — the standard
  * train/test-overlap scrub an LLM data pipeline runs before training.
  *
  * Scale shape: both sides explode to (gram, id) rows; grams are compared
  * via their 64-bit hash so the shuffle carries longs, not strings; the
  * probe side of a real run is a benchmark suite (tiny vs the corpus), so
  * Catalyst broadcasts it and the corpus never shuffles. minHits collisions
  * are counted per document with one hash aggregation.
  */
object Decontaminate {

  /** (id, gram-hash) rows per document. Two deliberate shapes for scale:
    * the input is fanned out across the session's shuffle parallelism
    * before the ~(len-n)× expansion (a compact text file scans as few
    * partitions), and grams come from exploding POSITIONS over a
    * projected normalized column with a codegen substr — the
    * transform/array_distinct HOF form runs interpreted and re-evaluates
    * the normalization per element (measured 6× slower; same finding as
    * trueNearDupPairs' 20×). Duplicate grams per doc are fine: every
    * consumer distincts or count-distincts downstream. */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(parts, col(idCol))
      .select(col(idCol),
        lower(regexp_replace(col(textCol), "\\s+", " ")).as("_s"))
      .select(col(idCol), col("_s"), explode(sequence(lit(0),
        greatest(length(col("_s")) - n, lit(0)))).as("_i"))
      .select(col(idCol),
        xxhash64(col("_s").substr(col("_i") + 1, lit(n))).as("_gh"))
  }

  /** Corpus documents sharing at least `minHits` distinct n-grams with any
    * probe document. Returns (idCol, n_hits) — n_hits = number of distinct
    * contaminated grams, for triage/ranking. */
  def flag(corpus: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, n: Int = 20, minHits: Int = 1): DataFrame = {
    val corpusGrams = gramHashes(corpus, idCol, textCol, n)
    val probeGrams = gramHashes(probes, idCol, textCol, n)
      .select(col("_gh")).distinct()
    corpusGrams
      .join(probeGrams, Seq("_gh")) // broadcast-sized in a real run
      .groupBy(col(idCol))
      .agg(count_distinct(col("_gh")).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Per-document contamination FRACTION, not just the flag: of each
    * corpus document's distinct n-grams, how many also occur in the probe
    * set — the triage signal that separates a quoted sentence from a
    * wholesale benchmark copy. Returns (idCol, n_grams, n_hits, frac) for
    * every corpus document (zero-hit documents included, frac = 0).
    *
    * Scale shape: same broadcast-probe gram-hash join as [[flag]], plus
    * one per-document distinct-gram count — two aggregations over the
    * exploded gram frame, both map-side combinable; the corpus never
    * shuffles as a whole. */
  def overlapFrac(corpus: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, n: Int = 20): DataFrame = {
    val corpusGrams =
      gramHashes(corpus, idCol, textCol, n).distinct()
    val probeGrams = gramHashes(probes, idCol, textCol, n)
      .select(col("_gh")).distinct()
    val hits = corpusGrams
      .join(probeGrams, Seq("_gh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    corpusGrams
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("frac", round(col("n_hits") / col("n_grams"), 4))
  }

  /** The complement: corpus with contaminated documents removed. */
  def scrub(corpus: DataFrame, probes: DataFrame, idCol: String,
      textCol: String, n: Int = 20, minHits: Int = 1): DataFrame =
    corpus.join(flag(corpus, probes, idCol, textCol, n, minHits)
      .select(col(idCol)), Seq(idCol), "left_anti")
}
