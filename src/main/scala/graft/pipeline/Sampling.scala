package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, oracle-replayable sampling for dataset curation: the same
  * row set comes back on every run, every engine, every partitioning — the
  * property a training-data pipeline needs so a sample is reproducible from
  * the id alone (no RNG state, no partition order dependence).
  *
  * The hash is a plain LCG step on the id (multiplier/increment from the
  * classic rand48/ANSI C constants), computable in any SQL dialect with
  * 64-bit integers — unlike xxhash64, which an external oracle cannot
  * replay. For ids up to ~2^43 the product stays inside Long range, so the
  * arithmetic is exact everywhere.
  */
object Sampling {

  /** Deterministic per-id bucket in [0, buckets). */
  def idBucket(id: Column, buckets: Int = 2048): Column =
    pmod(id * 1103515245L + 12345L, lit(buckets.toLong))

  /** Keep ~rate of rows, chosen by id hash — stable under re-runs,
    * repartitioning, and engine changes. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
      buckets: Int = 2048): DataFrame =
    df.filter(idBucket(col(idCol), buckets) < (rate * buckets).toLong)

  /** Deterministic k-per-stratum sample: rank ids within each stratum by
    * (bucket, id) and keep the first k. One shuffle on the stratum key;
    * the per-stratum sort is what a 100-TB run pays anyway to group the
    * stratum, and k rows per group bound the output. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int, buckets: Int = 2048): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(idBucket(col(idCol), buckets), col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Deterministic weighted sample of k rows without replacement
    * (Efraimidis–Spirakis A-Res): each row draws u in (0,1) from the LCG
    * bucket of its id — deterministic, partition-stable, replayable by
    * any SQL oracle — and scores ln(u)/w, the k largest scores winning
    * (heavier rows draw keys nearer 0). Selection probability is
    * proportional to weight, exactly the quality-weighted subsampling
    * step of a curation pipeline. One TakeOrdered (sort+limit fuses — no
    * full sort, no extra shuffle); weights must be positive. The key is
    * rounded to 8 decimals before ordering with the id as tiebreak, so
    * an external oracle's ln() agreeing to 8 decimals selects the
    * identical row set. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int, buckets: Int = 2048): DataFrame = {
    val u = (idBucket(col(idCol), buckets).cast("double") + 0.5) / buckets
    df.withColumn("_ws_key", round(log(u) / weightCol, 8))
      .orderBy(col("_ws_key").desc, col(idCol))
      .limit(k)
      .drop("_ws_key")
  }

  /** Per-group share of total rows — the "domain mix" report a curation
    * pipeline balances against (one aggregation + a 1-row broadcast). */
  def domainMix(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("_total"))
    counts.crossJoin(total)
      .select(col(groupCol), col("n"),
        round(col("n").cast("double") / col("_total"), 4).as("frac"))
  }
}
