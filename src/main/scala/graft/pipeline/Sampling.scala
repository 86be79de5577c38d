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

  /** Temperature-reweighted source mixing: resample so source s's share
    * moves from p_s to p_s^alpha / Σ p^alpha — the standard pretraining
    * mixture flattening (alpha < 1 upsamples small sources relatively;
    * alpha = 1 is the identity, alpha = 0 the uniform mix). Without
    * replacement, so a source can contribute at most its own rows: the
    * target draw is n_total · q_s capped at n_s, taken as the
    * deterministic per-source (bucket, id) prefix — the [[hashSample]]
    * stability guarantees, exact counts instead of a rate.
    *
    * Scale shape: one count aggregation (broadcast back as a join on the
    * source key), one window rank per source — the stratified-sample
    * shape; nothing global. Returns the surviving rows plus the
    * per-source target for auditability. */
  def temperatureMix(df: DataFrame, sourceCol: String, alpha: Double,
      idCol: String, buckets: Int = 2048): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
    val total = counts.agg(sum("_n").as("_tot"),
      sum(pow(col("_n").cast("double"), alpha)).as("_z"))
    val targets = counts.crossJoin(total)
      .select(col(sourceCol), col("_n"),
        // round before floor: pow() differs across libms in the last
        // ulp, and an external oracle must land on the identical target
        least(col("_n"),
          floor(round(col("_tot") * pow(col("_n").cast("double"), alpha) /
            col("_z"), 6)).cast("long")).as("_target"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(idBucket(col(idCol), buckets), col(idCol))
    df.join(targets, Seq(sourceCol))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= col("_target"))
      .drop("_rk", "_n")
      .withColumnRenamed("_target", "source_target")
  }

  /** Word unigram + bigram occurrence rows (_d_id, _gh) for DSIR: lower,
    * split on non-alphanumeric runs, drop empties, hash each gram to a
    * long (xxhash64) so the gram shuffle carries 8-byte keys — the same
    * hash-the-feature move as [[Decontaminate]]; an external oracle
    * replays on the gram STRINGS, identical modulo 64-bit collisions. */
  private def dsirGrams(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = filter(split(lower(col(textCol)), "[^a-z0-9]+"),
      t => t =!= "")
    val bi = when(size(col("_ts")) >= 2,
      zip_with(slice(col("_ts"), lit(1), size(col("_ts")) - 1),
        slice(col("_ts"), lit(2), size(col("_ts")) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol).as("_d_id"), toks.as("_ts"))
      .select(col("_d_id"), explode(concat(col("_ts"), bi)).as("_g"))
      .select(col("_d_id"), xxhash64(col("_g")).as("_gh"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per raw document, the
    * log-likelihood ratio of its hashed unigram+bigram features under the
    * target vs the raw n-gram distributions,
    * Σ_g [ln((tc_g+α)/(T+αV)) − ln((rc_g+α)/(R+αV))] over the document's
    * gram OCCURRENCES (α-smoothed; V = raw vocabulary size, so grams the
    * target never saw pull the score down instead of −∞). High weight =
    * looks like the target corpus relative to the raw pool.
    *
    * Scale shape: two map-side-combinable gram-count aggregations, the
    * per-gram weight table joined to the occurrence rows on the 8-byte
    * gram hash (one keyed shuffle — the vocabulary is never collected or
    * broadcast), one per-doc sum; corpus totals travel as 1-row
    * broadcasts. Weights round to 6 decimals so an oracle's ln() lands on
    * the same value. Docs with zero grams are omitted (no features — no
    * likelihood). */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val rg = dsirGrams(raw, idCol, textCol)
    val tg = dsirGrams(target, idCol, textCol)
    val rc = rg.groupBy(col("_gh")).agg(count(lit(1)).cast("double").as("_rc"))
    val tc = tg.groupBy(col("_gh")).agg(count(lit(1)).cast("double").as("_tc"))
    val scalars = rc.agg(sum(col("_rc")).as("_rtot"),
        count(lit(1)).cast("double").as("_v"))
      .crossJoin(tc.agg(coalesce(sum(col("_tc")), lit(0.0)).as("_ttot")))
    val w = rc.join(tc, Seq("_gh"), "left_outer")
      .crossJoin(broadcast(scalars))
      .select(col("_gh"),
        (log((coalesce(col("_tc"), lit(0.0)) + alpha) /
            (col("_ttot") + col("_v") * alpha)) -
          log((col("_rc") + alpha) /
            (col("_rtot") + col("_v") * alpha))).as("_w"))
    rg.join(w, "_gh")
      .groupBy(col("_d_id"))
      .agg(round(sum(col("_w")), 6).as("dsir_weight"))
      .select(col("_d_id").as(idCol), col("dsir_weight"))
  }

  /** DSIR selection: k raw documents drawn without replacement with
    * probability ∝ exp(dsir_weight) via the Gumbel top-k trick — key =
    * weight + Gumbel(0,1), the k largest keys win. The Gumbel draw is
    * −ln(−ln(u)) with u from the deterministic LCG bucket of the id, so
    * the selected set is reproducible anywhere (the [[weightedSample]]
    * guarantees); key rounded to 6 decimals, id tiebreak, TakeOrdered
    * (sort+limit fuse — no full sort). */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, alpha: Double = 0.5,
      buckets: Int = 2048): DataFrame = {
    val u = (idBucket(col(idCol), buckets).cast("double") + 0.5) / buckets
    dsirWeights(raw, target, idCol, textCol, alpha)
      .withColumn("_key", round(col("dsir_weight") - log(-log(u)), 6))
      .orderBy(col("_key").desc, col(idCol))
      .limit(k)
      .drop("_key")
  }

  /** Epoch-based mixture repetition (the multi-epoch upsampling of
    * pretraining mixtures — a source with factor 2.5 contributes every
    * doc twice plus a deterministic half of them a third time): each row
    * is repeated floor(f) times, plus once more when its LCG bucket
    * falls under the fractional part, with an `epoch` index column
    * (0-based) so downstream shuffling/packing can interleave epochs.
    * Factor 0 drops the source. The floor/fraction split is computed
    * driver-side per source (factors are a small config map), so the
    * row-level arithmetic is exact integer — reproducible anywhere.
    *
    * Scale shape: a literal when-chain (no join) plus one explode —
    * map-side only, no shuffle. */
  def epochMix(df: DataFrame, sourceCol: String, idCol: String,
      factors: Map[String, Double], defaultFactor: Double = 1.0,
      buckets: Int = 2048): DataFrame = {
    require((factors.values ++ Seq(defaultFactor)).forall(_ >= 0),
      s"factors must be non-negative: $factors")
    def whenChain(f: Double => Long): Column =
      factors.foldLeft(lit(f(defaultFactor))) { case (acc, (s, v)) =>
        when(col(sourceCol) === s, lit(f(v))).otherwise(acc)
      }
    val base = whenChain(v => math.floor(v).toLong)
    val fracB = whenChain(v =>
      math.round((v - math.floor(v)) * buckets))
    val reps = base +
      when(idBucket(col(idCol), buckets) < fracB, 1L).otherwise(0L)
    df.withColumn("epoch",
      explode(when(reps > 0, sequence(lit(0L), reps - 1))
        .otherwise(array().cast("array<bigint>"))))
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
