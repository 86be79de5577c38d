package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-scrubbing operators for training-data curation: PII redaction,
  * Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
  * Models" §A1.1), and C4-style corpus-level boilerplate line removal
  * (Raffel et al. 2020 §2.2 — "we removed ... any line that appeared more
  * than once in the dataset" generalized to a count threshold).
  *
  * All operators are pure column expressions or explode+groupBy shapes —
  * codegen'd, partition-parallel, no UDFs. Regexes are RE2-compatible (no
  * lookaround, no backreferences) so an external oracle can replay them. */
object Scrub {

  /** PII detectors, in scrub order. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b")

  /** Per-category PII match counts (one derived column per category; the
    * text column is scanned once per pattern, all codegen'd). */
  def flagPii(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +: piiPatterns.map { case (name, pat) =>
      F.size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
        .cast(LongType).as(s"n_$name")
    }: _*)

  /** Redact every PII match with `token`, preserving the rest of the text.
    * Emits the id, the scrubbed text (under the original column name) and
    * the total redaction count. Counting happens on the ORIGINAL text —
    * patterns are applied in `piiPatterns` order, and the replacement token
    * is chosen to never re-match a later pattern. */
  def scrubPii(df: DataFrame, idCol: String, textCol: String,
      token: String = "[PII]"): DataFrame = {
    val scrubbed = piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat)) =>
      regexp_replace(c, pat, token)
    }
    val total = piiPatterns.map { case (_, pat) =>
      F.size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast(LongType)
    }.reduce(_ + _)
    df.select(col(idCol), scrubbed.as(textCol), total.as("n_redacted"))
  }

  /** Word-level repetition signals (Gopher §A1.1 rules): total words,
    * duplicate-word fraction (1 - distinct/total) and most-frequent-word
    * fraction. One explode + two aggregations, keyed by document id — the
    * first shuffle is the explode's repartition (small parquet files scan
    * as one partition; see Dedup.scala perf note), the second is the
    * per-(doc, word) count with map-side combine. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val words = df
      .repartition(spark.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol),
        explode(F.split(trim(col(textCol)), "\\s+")).as("_w"))
    val wc = words.groupBy(col(idCol), col("_w")).agg(count(lit(1)).as("_c"))
    wc.groupBy(col(idCol)).agg(
        sum(col("_c")).as("_n"),
        count(lit(1)).as("_nd"),
        max(col("_c")).as("_mx"))
      .select(col(idCol),
        col("_n").as("n_words"),
        round(lit(1.0) - col("_nd").cast(DoubleType) /
          col("_n").cast(DoubleType), 4).as("dup_word_frac"),
        round(col("_mx").cast(DoubleType) /
          col("_n").cast(DoubleType), 4).as("top_word_frac"))
  }

  /** Fraction of words covered by the most frequent word n-gram (the
    * Gopher top-2-gram/top-3-gram/top-4-gram rules). Explode positions +
    * codegen slice/concat — the interpreted-HOF form (transform over the
    * word array) measured an order of magnitude slower on this engine. */
  def topNgramFrac(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"n-gram size must be >= 2, got $n")
    val spark = df.sparkSession
    // Documents with fewer than n words have no n-grams and emit no row
    // (also keeps the invalid descending `sequence` out of the plan — it
    // throws rather than yielding empty, see ExprCompiler "range").
    val arr = df
      .repartition(spark.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol), F.split(trim(col(textCol)), "\\s+").as("_ws"))
      .filter(F.size(col("_ws")) >= n)
    val grams = arr
      .select(col(idCol), col("_ws"), F.size(col("_ws")).cast(LongType).as("_nw"),
        explode(sequence(lit(1), F.size(col("_ws")) - (n - 1))).as("_i"))
      .select(col(idCol), col("_nw"),
        concat_ws(" ", F.slice(col("_ws"), col("_i"), lit(n))).as("_g"))
    grams.groupBy(col(idCol), col("_nw"), col("_g"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol), col("_nw"))
      .agg(max(col("_c")).as("_mx"))
      .select(col(idCol), col("_nw").as("n_words"),
        // Gopher's rule: fraction of WORDS covered by the top n-gram.
        round(col("_mx").cast(DoubleType) * n /
          col("_nw").cast(DoubleType), 4).as("top_ngram_frac"))
  }

  /** Exact duplicate-span REMOVAL (the scrub counterpart of
    * Dedup.duplicateSpanStats — Lee et al. 2021 / RefinedWeb exact
    * substring dedup): any n-token window occurring more than once in the
    * corpus keeps only its first occurrence (min (doc, position)); every
    * token covered by a later occurrence is cut from its document.
    * Returns (idCol, textCol rebuilt from surviving tokens,
    * n_removed = tokens cut). A removed window overlapping a kept one can
    * cut into the kept occurrence's context — the standard artifact of
    * span-level dedup, documented rather than special-cased.
    *
    * Scale shape: windows travel as 64-bit hashes; the keeper is one
    * min(struct) aggregation per hash (map-side combinable, no global
    * window); covered token positions explode only from NON-keeper
    * duplicated windows (bounded by the duplicated volume, not the
    * corpus); the final anti-join and reassembly are keyed per document. */
  def scrubDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val split = df
      .repartition(parts, col(idCol))
      .select(col(idCol), F.split(trim(col(textCol)), "\\s+").as("_tk"))
    val toks = split
      .select(col(idCol), posexplode(col("_tk")).as(Seq("_pos", "_tok")))
    val wins = split
      .select(col(idCol), col("_tk"),
        explode(when(F.size(col("_tk")) >= n,
            sequence(lit(0), F.size(col("_tk")) - n))
          .otherwise(array().cast(ArrayType(IntegerType)))).as("_i"))
      .select(col(idCol), col("_i"),
        xxhash64(array_join(F.slice(col("_tk"), col("_i") + 1, lit(n)),
          "\u0001")).as("_wh"))
    // Per window hash: the first occurrence and whether others exist.
    val marks = wins.groupBy(col("_wh")).agg(
      min(struct(col(idCol).as("_kid"), col("_i").as("_kpos"))).as("_keep"),
      count(lit(1)).as("_occ"))
    val covered = wins.join(marks, Seq("_wh"))
      .filter(col("_occ") > 1 &&
        !(col("_keep._kid") === col(idCol) && col("_keep._kpos") === col("_i")))
      .select(col(idCol),
        explode(sequence(col("_i"), col("_i") + (n - 1))).as("_pos"))
      .distinct()
    val kept = toks.join(covered, Seq(idCol, "_pos"), "left_anti")
    val removedCounts = covered.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_removed"))
    // Rebuild from the original id frame so fully-scrubbed documents
    // survive as empty text instead of vanishing.
    df.select(col(idCol)).distinct()
      .join(kept.groupBy(col(idCol)).agg(
        concat_ws(" ", F.transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          x => x.getField("_tok"))).as(textCol)), Seq(idCol), "left_outer")
      .join(removedCounts, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }

  /** Dolma-style corpus-global paragraph dedup: every paragraph keeps
    * only its FIRST occurrence in corpus order (min (doc_id, position))
    * and every later occurrence is dropped — unlike
    * [[scrubRepeatedLines]]'s frequency threshold, this preserves one
    * copy of repeated content instead of deleting all of them. Returns
    * (idCol, textCol with surviving paragraphs in original order,
    * n_dropped).
    *
    * Scale shape: paragraphs carry a 64-bit hash through the
    * first-occurrence shuffle (one min(struct) aggregation per hash —
    * map-side combinable, no window) and the keeper frame joins back on
    * that hash; reassembly is the same array_sort-by-position collect as
    * [[scrubRepeatedLines]], bounded per document, unbounded per corpus.
    * `sepRegex` splits documents into paragraphs (default blank line);
    * `joinSep` rejoins the survivors (a regex can't be inverted, so the
    * caller names the literal). */
  def dedupParagraphsGlobal(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\n\n", joinSep: String = "\n\n"): DataFrame = {
    val spark = df.sparkSession
    val paras = df
      .repartition(spark.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol), posexplode(F.split(col(textCol), sepRegex))
        .as(Seq("_pos", "_para")))
      .withColumn("_ph", xxhash64(col("_para")))
    val first = paras.groupBy(col("_ph"))
      .agg(min(struct(col(idCol).as("_kid"), col("_pos").as("_kpos")))
        .as("_keep"))
    paras.join(first, Seq("_ph"))
      .withColumn("_kept",
        col("_keep._kid") === col(idCol) && col("_keep._kpos") === col("_pos"))
      .groupBy(col(idCol)).agg(
        concat_ws(joinSep, F.transform(
          array_sort(collect_list(when(col("_kept"),
            struct(col("_pos"), col("_para"))))),
          x => x.getField("_para"))).as(textCol),
        sum(when(col("_kept"), 0L).otherwise(1L)).as("n_dropped"))
  }

  /** C4-style corpus-level line scrub: drop every line occurring at least
    * `minCount` times across the corpus (boilerplate headers/footers,
    * cookie banners). Returns the id, the scrubbed text in original line
    * order (under the original column name) and the per-document count of
    * removed lines. Shape: one posexplode, one line-count shuffle, one
    * join back, one per-doc aggregation — every step keyed, nothing
    * quadratic, so the plan survives a 100-TB corpus (the line-count join
    * is the canonical C4 implementation). Reassembly collects a document's
    * kept lines into one array and array_sorts them by (_pos, _line), so
    * a SINGLE document is bounded by the JVM array limit (~2^31 lines —
    * a multi-hundred-GB document; corpus size is unbounded). */
  def scrubRepeatedLines(df: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    val spark = df.sparkSession
    val lines = df
      .repartition(spark.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol), posexplode(F.split(col(textCol), "\n"))
        .as(Seq("_pos", "_line")))
    val counts = lines.groupBy(col("_line")).agg(count(lit(1)).as("_lc"))
    val joined = lines.join(counts, Seq("_line"))
    joined.groupBy(col(idCol)).agg(
        concat_ws("\n", F.transform(
          array_sort(collect_list(when(col("_lc") < minCount,
            struct(col("_pos"), col("_line"))))),
          x => x.getField("_line"))).as(textCol),
        sum(when(col("_lc") >= minCount, 1L).otherwise(0L)).as("n_scrubbed"))
  }
}
