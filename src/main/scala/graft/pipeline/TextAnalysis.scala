package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-quality / analysis operators for training-data pipelines. Pure
  * column expressions — fully codegen'd, partition-parallel, no UDFs. */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = F.split(trim(text), "\\s+")

  /** BPE-ish token count: word runs or single non-space symbols. */
  def tokenCount(text: Column): Column =
    F.size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))
      .cast(LongType)

  /** Per-document quality statistics. Emits one row per input row with
    * n_chars / n_tokens / avg token length / punctuation, digit, upper,
    * whitespace ratios and a composite quality score in [0,1]. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = F.length(t).cast(LongType)
    val nTokens = F.size(tokens(t)).cast(LongType)
    val punct = F.length(regexp_replace(t, "[\\w\\s]", "")).cast(DoubleType)
    val digits = F.length(regexp_replace(t, "[^0-9]", "")).cast(DoubleType)
    val uppers = F.length(regexp_replace(t, "[^A-Z]", "")).cast(DoubleType)
    val chars = nChars.cast(DoubleType)
    df.select(
      col(idCol),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      round(chars / greatest(nTokens, lit(1L)), 4).as("avg_token_len"),
      round(punct / greatest(chars, lit(1.0)), 4).as("punct_ratio"),
      round(digits / greatest(chars, lit(1.0)), 4).as("digit_ratio"),
      round(uppers / greatest(chars, lit(1.0)), 4).as("upper_ratio"))
  }

  /** Deterministic language-ID heuristic: CJK codepoints -> zh, else the
    * language whose marker stopwords appear; 'und' when nothing matches.
    * (A real model would plug in here; the operator shape — one scan, one
    * derived column — is what matters at scale.) */
  def languageId(text: Column): Column = {
    def hasAny(words: Seq[String]): Column =
      regexp_like(text, lit(words.mkString("(^|\\s)(", "|", ")(\\s|$)")))
    when(regexp_like(text, lit("[\\x{4e00}-\\x{9fff}]")), "zh")
      .when(hasAny(Seq("the", "and", "of", "with", "is")), "en")
      .when(hasAny(Seq("der", "und", "die", "das", "mit")), "de")
      .when(hasAny(Seq("le", "la", "et", "les", "des")), "fr")
      .when(hasAny(Seq("el", "los", "las", "es", "una")), "es")
      .otherwise("und")
  }

  /** Document fingerprint: hash of whitespace-normalized lower-cased text.
    * (md5 rather than xxhash so external systems can reproduce it.) */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Gopher-style composite quality filter (Rae et al. 2021 §A1.1, the
    * rule family every large-scale curation pipeline applies before
    * training): per-document rule signals plus the combined keep flag.
    * Emits (idCol, n_words, mean_word_len, alpha_frac, symbol_ratio,
    * stopword_hits, keep):
    *   - n_words: whitespace tokens
    *   - mean_word_len: non-space chars / words
    *   - alpha_frac: fraction of words containing a letter
    *   - symbol_ratio: ('#' count + '...' count) / words
    *   - stopword_hits: how many of 8 common English stopwords appear
    *   - keep: words in [minWords, maxWords], mean word length in [3, 10],
    *     alpha_frac >= 0.7, symbol_ratio <= 0.1, stopword_hits >= 2
    * Pure column expressions over one scan — fully codegen'd except the
    * single-pass `filter` HOF for alpha_frac (no shuffle, no UDF), so the
    * operator is a trivially-parallel map at any scale. */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 5L, maxWords: Long = 100000L): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nWords = F.size(toks).cast(LongType)
    val w = greatest(nWords, lit(1L)).cast(DoubleType)
    val nonSpace = F.length(regexp_replace(t, "\\s+", "")).cast(DoubleType)
    val alphaWords =
      F.size(F.filter(toks, x => x.rlike("[A-Za-z]"))).cast(DoubleType)
    val symbols = (F.length(regexp_replace(t, "[^#]", "")) +
      F.size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0)))).cast(DoubleType)
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = stopwords.map(wd =>
        when(regexp_like(lower(t), lit(s"(^|\\s)$wd(\\s|$$)")), 1L)
          .otherwise(0L))
      .reduce(_ + _)
    val meanLen = nonSpace / w
    val alphaFrac = alphaWords / w
    val symbolRatio = symbols / w
    df.select(
      col(idCol),
      nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(alphaFrac, 4).as("alpha_frac"),
      round(symbolRatio, 4).as("symbol_ratio"),
      stopHits.as("stopword_hits"),
      (nWords.between(minWords, maxWords) &&
        meanLen.between(3.0, 10.0) && alphaFrac >= 0.7 &&
        symbolRatio <= 0.1 && stopHits >= 2L).as("keep"))
  }

  /** Per-document unigram surprisal against the corpus's own token
    * distribution: avg of -ln(count(tok)/total) over the document's
    * tokens — the language-model-free stand-in for a perplexity quality
    * score (documents full of corpus-rare tokens score high, boilerplate
    * scores low). Returns (idCol, n_tokens, avg_surprisal).
    *
    * Shape: token explode, one global count aggregation (map-side
    * combinable — token skew cannot hot-spot), a 1-row total broadcast,
    * join back, per-doc average. Two keyed shuffles, linear in token
    * volume — 100-TB-shaped. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    val toks = df
      .repartition(spark.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol),
        explode(F.split(trim(lower(col(textCol))), "\\s+")).as("_tok"))
    val counts = toks.groupBy(col("_tok")).agg(count(lit(1)).as("_n"))
    val total = toks.agg(count(lit(1)).as("_total"))
    toks.join(counts, "_tok").crossJoin(total)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("_n").cast(DoubleType) / col("_total"))), 4)
          .as("avg_surprisal"))
  }

  /** Per-document n-gram novelty under corpus id order: of a document's
    * distinct character n-grams (whitespace-normalized, lower-cased), the
    * count and fraction that NO smaller-id document contains — the
    * standard "how much new text does this shard add" signal when
    * curating incremental corpus drops. Returns
    * (idCol, n_grams, n_novel, novelty).
    *
    * Shape: shingle explode (same normalization as Decontaminate),
    * gram -> min(id) attribution, join back, per-doc aggregation — three
    * keyed shuffles, work linear in total gram volume, nothing
    * pairwise/quadratic, so the plan holds at corpus scale; gram skew
    * (a gram in millions of docs) stays safe because the attribution
    * aggregate is a map-side-combinable min. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 20): DataFrame = {
    val spark = df.sparkSession
    val norm = lower(regexp_replace(col(textCol), "\\s+", " "))
    // Referenced twice (attribution build + join-back) and deliberately
    // NOT pinned: the explode+substr+dedup is cheap codegen, and
    // measuring both ways showed materializing the gram frame
    // (localCheckpoint) costs more than recomputing it — unlike Dedup's
    // shingle frame, whose three consumers tip the trade the other way.
    // The fat gram frame crosses the network ONCE (r14, guide §2.4): the
    // dedup rides the hash(_g) repartition (hash(_g) satisfies the
    // (_g, id) dedup clustering), which is also exactly the partitioning
    // the first-seen aggregation and the join-back consume — the old
    // distinct-then-groupBy-then-join shape shuffled the gram frame three
    // times; both consumers now share the single exchange.
    val grams = df
      .repartition(spark.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol), norm.as("_s"))
      .select(col(idCol),
        explode(sequence(lit(0), greatest(length(col("_s")) - n, lit(0))))
          .as("_i"),
        col("_s"))
      .select(col(idCol), col("_s").substr(col("_i") + 1, lit(n)).as("_g"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("_g"))
      .dropDuplicates("_g", idCol)
    val firstSeen = grams.groupBy(col("_g")).agg(min(col(idCol)).as("_first"))
    grams.join(firstSeen, "_g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_first") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel") / col("n_grams"), 4))
  }

  /** Top-k TF-IDF keywords per document: tf = in-document token count,
    * idf = ln(N / df) over lower-cased whitespace tokens, top k by
    * (tfidf DESC, token ASC) per document. Returns
    * (idCol, token, tfidf, rank).
    *
    * Shape: token explode -> one (doc, token) count aggregation (map-side
    * combinable), document frequency from a second combinable aggregate
    * over the distinct doc-token pairs, a 1-row corpus-size broadcast,
    * and a top-k window PARTITIONED BY document (never global). Token
    * skew is safe everywhere — both aggregates combine map-side. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int)
      : DataFrame = {
    val spark = df.sparkSession
    val toks = df
      .repartition(spark.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol),
        explode(F.split(trim(lower(col(textCol))), "\\s+")).as("token"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("_tf"))
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("_df"))
    val n = df.agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("_tfidf").desc, col("token"))
    tf.join(docFreq, "token").crossJoin(n)
      .withColumn("_tfidf",
        col("_tf") * log(col("_n").cast(DoubleType) / col("_df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"),
        round(col("_tfidf"), 4).as("tfidf"),
        col("rank").cast(LongType).as("rank"))
  }

  /** BM25 relevance of every document against a fixed query-term set —
    * the lexical-retrieval half of a RAG / data-curation ranking stack.
    * Okapi BM25 with the Lucene-style non-negative idf:
    *   idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   score(d)  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * over lower-cased whitespace tokens (same tokenizer as tfidfTopK).
    * Returns (idCol, score) for documents matching ≥1 term.
    *
    * Shape: the query-term filter lands BEFORE the (doc, term) aggregate,
    * so the exploded stream shrinks to |terms| columns' worth immediately;
    * both aggregates combine map-side; N and avgdl are 1-row broadcasts;
    * per-term df is a |terms|-row broadcast. No skew hazard — the only
    * wide keys are (doc, term) with term bounded by the query. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val spark = df.sparkSession
    val toks = df.select(col(idCol),
      explode(F.split(trim(lower(col(textCol))), "\\s+")).as("_t"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("_dl"))
    val stats = dl.agg(count(lit(1)).as("_n"),
      avg(col("_dl")).as("_avgdl"))
    val qtf = toks.filter(col("_t").isin(terms.map(_.toLowerCase): _*))
      .groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_tf"))
    val qdf = qtf.groupBy(col("_t")).agg(count(lit(1)).as("_df"))
    qtf.join(broadcast(qdf), "_t")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("_idf",
        log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5)))
      .withColumn("_s",
        col("_idf") * col("_tf") * (lit(k1) + 1.0) /
          (col("_tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("_s")), 4).as("score"))
  }

  /** Fixed-size character chunking with overlap — the context-window prep
    * step (RAG indexing, long-document training splits). Each document
    * yields chunks of `chunkChars` characters starting every
    * `chunkChars - overlap` characters (the last chunk may be shorter;
    * an empty document yields one empty chunk at offset 0). Returns
    * (idCol, chunk_no, start, chunk).
    *
    * Pure column expressions — sequence + posexplode + substr, codegen'd,
    * partition-parallel, no shuffle at all: chunking is a flatMap over
    * the scan. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkChars: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkChars,
      "0 <= overlap < chunkChars")
    val step = chunkChars - overlap
    df.select(col(idCol),
        posexplode(sequence(lit(0),
          greatest(length(col(textCol)) - 1, lit(0)), lit(step)))
          .as(Seq("chunk_no", "start")),
        col(textCol))
      .select(col(idCol), col("chunk_no").cast(LongType).as("chunk_no"),
        col("start").cast(LongType).as("start"),
        col(textCol).substr(col("start") + 1, lit(chunkChars)).as("chunk"))
  }

  /** Corpus-level top-k word n-grams (vocabulary / boilerplate analysis):
    * lower-cased whitespace tokens, n-grams per document via a
    * transform-over-sequence slice (no UDF), one global count, ties
    * broken lexicographically. Returns (rank, gram, freq).
    *
    * Shape: the n-gram explode is map-local; ONE hash aggregation on the
    * gram (map-side combined), then the top-k selection is a distributed
    * TakeOrdered (orderBy.limit) — the single-partition window only ever
    * ranks the k survivors. */
  def topNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")
    val toks = df.select(
      F.split(trim(lower(col(textCol))), "\\s+").as("_t"))
    val grams = toks.select(explode(
      when(F.size(col("_t")) >= n,
        transform(F.sequence(lit(0), F.size(col("_t")) - n),
          i => array_join(F.slice(col("_t"), i + 1, lit(n)), " ")))
        .otherwise(array().cast(ArrayType(StringType)))).as("gram"))
    val counts = grams.groupBy(col("gram")).agg(count(lit(1)).as("freq"))
    val top = counts.orderBy(col("freq").desc, col("gram")).limit(k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("gram"))).cast(LongType))
      .select(col("rank"), col("gram"), col("freq"))
  }

  /** Zipf diagnostic of the corpus vocabulary: unigram counts, then a
    * least-squares fit of ln(freq) against ln(rank) over the top-k
    * tokens (a healthy natural-language corpus sits near slope −1;
    * boilerplate- or spam-heavy corpora flatten it). Returns 1 row
    * (vocab_size, total_tokens, zipf_slope).
    *
    * Shape: one token aggregation (map-side combined), a distributed
    * TakeOrdered for the top-k, and two 1-row aggregates; the fit's
    * float sums run over k values, so round(·,6) absorbs cross-engine
    * summation order in the oracle. */
  def zipfFit(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 100): DataFrame = {
    val toks = df.select(
      explode(F.split(trim(lower(col(textCol))), "\\s+")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val stats = counts.agg(count(lit(1)).as("vocab_size"),
      sum(col("freq")).as("total_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("tok"))
    val top = counts.orderBy(col("freq").desc, col("tok")).limit(topK)
      .withColumn("rank", row_number().over(w))
      .select(log(col("rank").cast(DoubleType)).as("x"),
        log(col("freq").cast(DoubleType)).as("y"))
    val fit = top.agg(count(lit(1)).cast(DoubleType).as("k"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    stats.crossJoin(fit) // both 1-row aggregates: a broadcast join
      .select(col("vocab_size"), col("total_tokens"),
        round((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")), 6)
          .as("zipf_slope"))
  }
}
