package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Driver-contract entries for the training-data-pipeline operators
  * (dedup / similarity / text analysis / multimodal). Where the operator is
  * expressible in portable SQL the oracle is provided; hash-based ops
  * (minhash/simhash/LSH) get rows-only checks plus ScalaTest assertions. */
object PipelineQueries {

  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfIndex]
  // kNN-join corpus index (different corpus slice than q_sim_ivf's)
  private val knnIvfCache =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfIndex]

  /** The exact near-dup ground truth is a correctness GATE, not part of the
    * operator under test — computing it inside every gated query would bill
    * its (deliberately exhaustive) shingle join to the operator's bench row.
    * Cache it per dataset like the IVF index; eagerly materialized so the
    * first caller pays once and later callers reuse the persisted pairs. */
  private val trueDupCache =
    scala.collection.concurrent.TrieMap.empty[(String, Double), DataFrame]
  private def trueNearDupPairsCached(s: SparkSession, dir: String,
      threshold: Double): DataFrame =
    trueDupCache.getOrElseUpdate((dir, threshold), {
      val df = trueNearDupPairs(docs(s, dir), threshold).persist()
      df.count()
      df
    })

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Deterministic PII planted from doc_id (the synthetic corpus contains
    * none); the DuckDB oracle rebuilds the identical text. */
  private def plantedPii(d: DataFrame): DataFrame =
    d.select(col("doc_id"), concat(
      col("text"), lit(" contact user"), col("doc_id").cast(StringType),
      lit("@example.com call "),
      format_string("555-%03d-%04d",
        pmod(col("doc_id"), lit(1000L)), pmod(col("doc_id"), lit(10000L))),
      lit(" node 10.0."), pmod(col("doc_id"), lit(256L)).cast(StringType),
      lit("."), pmod(col("doc_id"), lit(100L)).cast(StringType),
      lit(" end")).as("text"))

  /** Deterministic messy URLs planted from doc_id (the corpus carries no
    * URL column): mixed-case scheme/host, default port, doubled path
    * slashes, tracking params, fragment, and a trailing path slash — one
    * of each canonicalization hazard. doc_ids agreeing mod 7/50/25
    * canonicalize identically (the dedup groups); the DuckDB oracle
    * rebuilds the identical strings. */
  private def plantedUrls(d: DataFrame): DataFrame =
    d.select(col("doc_id"), concat(
      lit("HTTPS://WWW.Example"), pmod(col("doc_id"), lit(7L)),
      lit(".COM:443//Articles//P"), pmod(col("doc_id"), lit(50L)),
      lit("/?id="), pmod(col("doc_id"), lit(25L)),
      lit("&utm_source=news&gclid=abc123#sec"),
      pmod(col("doc_id"), lit(5L))).as("url"))

  /** Three-line documents: body, a corpus-wide boilerplate footer, and a
    * per-document unique line — the line-scrub fixture. */
  private def multiLineDocs(d: DataFrame): DataFrame =
    d.select(col("doc_id"), concat_ws("\n",
      col("text"), lit("(c) corpus boilerplate footer"),
      concat(lit("unique line "), col("doc_id").cast(StringType))).as("text"))
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) (which Spark
    * cannot represent — read nanos-as-long and convert) and
    * TIMESTAMP(MICROS) / timestamp_ntz. Branch on the dtype the scan
    * actually produced rather than hard-assuming either generation. The
    * nanosAsLong conf is set by every graft session builder; setting it here
    * too keeps the reader usable from a bare session (idempotent, no-op). */
  /** File streams read DIRECTORIES; stage the single events parquet into a
    * temp one for the duration of `f` and always delete it afterwards —
    * runToMemorySink fully drains the stream before returning, and the
    * memory-sink table it returns holds rows, not file references, so the
    * staged copy is dead weight the moment `f` completes (previously every
    * run leaked one copy into the system temp dir). */
  private def withStagedEvents[A](dir: String)(f: String => A): A = {
    val staged = java.nio.file.Files.createTempDirectory("graft_stream")
    val part = staged.resolve("part-0.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), part)
    try f(staged.toString)
    finally {
      java.nio.file.Files.deleteIfExists(part)
      java.nio.file.Files.deleteIfExists(staged)
    }
  }

  /** Stage the events table (ts-normalized) plus a later WATERMARK-PROBE
    * file: two rows ~20 h past max(ts) — one per join side, under negative
    * user ids — so bounded-replay tests can observe watermark-EXPIRY
    * semantics (outer-join null padding, session-window close). The probe
    * batch drives the watermark past every real row's state-expiry bound;
    * the no-data micro-batch that follows emits the expired state. Probe
    * rows are excluded from results by `user_id >= 0`. */
  private def withProbedEvents[A](s: SparkSession, dir: String)
      (f: String => A): A = {
    val staged = java.nio.file.Files.createTempDirectory("graft_probe")
    try {
      val ev = graft.streaming.GraftStreaming.eventsBatch(s, s"$dir/events.parquet")
      def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = staged.resolve(s"_$name")
        df.coalesce(1).write.parquet(tmp.toString)
        val part = {
          val s0 = java.nio.file.Files.list(tmp)
          try s0.iterator().asScala.toSeq
            .find(_.toString.endsWith(".parquet")).get
          finally s0.close()
        }
        val dst = staged.resolve(name)
        java.nio.file.Files.move(part, dst)
        dst.toFile.setLastModified(mtime)
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
      val t0 = System.currentTimeMillis() - 600000L
      writeOne(ev, "b1.parquet", t0)
      def probe(id: Long, typ: String) = struct(
        lit(id).as("event_id"),
        (col("m") + expr("INTERVAL 20 HOURS")).as("ts"),
        lit(id).as("user_id"), lit(typ).as("event_type"),
        lit(0.0).as("value"), lit(null).cast("string").as("props"))
      val probes = ev.agg(max(col("ts")).as("m"))
        .select(explode(array(probe(-1L, "view"), probe(-2L, "click"))).as("e"))
        .select(col("e.*"))
      writeOne(probes, "b2.parquet", t0 + 120000L)
      f(staged.toString)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(staged.toFile)
  }

  /** Three mtime-ordered micro-batch files exercising BOTH sides of
    * dropDuplicatesWithinWatermark's contract (VERDICT r13 #7):
    *   b1 = events TWICE in one file  -> within-watermark copies dedup;
    *   b2 = +20 h probe               -> watermark passes every b1 key's
    *                                     expiry (ts + 2 h), state evicted;
    *   b3 = events again, ts +30 days -> same keys AFTER expiry re-emit
    *                                     (the "within watermark" bound is
    *                                     a guarantee, not global dedup).
    * Consumed with maxFilesPerTrigger = 1 so the batches stay distinct. */
  private def withDedupWmEvents[A](s: SparkSession, dir: String)
      (f: String => A): A = {
    val staged = java.nio.file.Files.createTempDirectory("graft_ddwm")
    try {
      val ev = graft.streaming.GraftStreaming.eventsBatch(s, s"$dir/events.parquet")
      def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = staged.resolve(s"_$name")
        df.coalesce(1).write.parquet(tmp.toString)
        val part = {
          val s0 = java.nio.file.Files.list(tmp)
          try s0.iterator().asScala.toSeq
            .find(_.toString.endsWith(".parquet")).get
          finally s0.close()
        }
        val dst = staged.resolve(name)
        java.nio.file.Files.move(part, dst)
        dst.toFile.setLastModified(mtime)
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
      val t0 = System.currentTimeMillis() - 600000L
      writeOne(ev.unionAll(ev), "b1.parquet", t0)
      val probes = ev.agg(max(col("ts")).as("m"))
        .select(lit(-1L).as("event_id"),
          (col("m") + expr("INTERVAL 20 HOURS")).as("ts"),
          lit(-1L).as("user_id"), lit("probe").as("event_type"),
          lit(0.0).as("value"), lit(null).cast("string").as("props"))
      writeOne(probes, "b2.parquet", t0 + 120000L)
      // Spacer probe: the watermark a batch EVICTS with is the one
      // committed at the END of the previous batch — computed from data
      // through the batch BEFORE it (dual-watermark lag; measured: without
      // this spacer the 62 events in the fixture's last 4 h were still in
      // state at re-ingest and got wrongly deduped).
      writeOne(probes.withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")),
        "b3.parquet", t0 + 240000L)
      // +90 days, NOT +30: the fixture spans ~30 days, so a +30 d shift
      // would land the OLDEST events behind the probe-advanced watermark
      // (max + 18 h) and they would be dropped as late, not re-admitted.
      writeOne(ev.withColumn("ts", col("ts") + expr("INTERVAL 90 DAYS")),
        "b4.parquet", t0 + 360000L)
      f(staged.toString)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(staged.toFile)
  }

  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // Integral DIV, not `/ 1000.0`: micros-since-epoch (~1.7e15) sit
        // where doubles are spaced 0.25 apart, so float division rounds
        // ~12% of rows up by 1us while DuckDB's nanos->micros TRUNCATES —
        // any oracle that surfaces a raw timestamp would hash-mismatch.
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // Session TZ is UTC in every graft entry point, so the NTZ wall
        // time and the LTZ instant coincide — same values DuckDB sees.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Schema of the events.props JSON column. Parsed once per row with
    * from_json (single parse + codegen'd struct access) rather than
    * get_json_object (per-access JSON-path engine re-parse). */
  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** DuckDB rebuild of [[plantedPii]] — byte-identical text. */
  private val plantedPiiSql: String =
    """SELECT doc_id, text || ' contact user' || doc_id || '@example.com call ' ||
         printf('555-%03d-%04d', doc_id % 1000, doc_id % 10000) ||
         ' node 10.0.' || (doc_id % 256) || '.' || (doc_id % 100) || ' end' AS text
       FROM documents"""

  /** Exact near-duplicate ground truth the DuckDB oracle can rebuild
    * cheaply: pairs sharing a 64-char normalized prefix (the synthetic
    * near-dups are suffix mutations, so prefix blocking is a complete and
    * O(n) candidate generator for them) verified by exact character-5-gram
    * Jaccard >= `threshold`. Columns (id1, id2, j). */
  private def trueNearDupPairs(d: DataFrame, threshold: Double): DataFrame = {
    val spark = d.sparkSession
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val base = d
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), norm.as("_s"))
    // Prefix-blocked candidate pairs (tiny) ...
    val pre = base.select(col("doc_id"), substring(col("_s"), 1, 64).as("_pre"))
    val cand = pre.select(col("doc_id").as("id1"), col("_pre"))
      .join(pre.select(col("doc_id").as("id2"), col("_pre")), "_pre")
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
    // ... verified by exact 5-gram Jaccard computed relationally: distinct
    // shingles as rows (codegen explode + substr — the interpreted
    // transform/array_distinct HOF form measured 20x slower at sf0.1),
    // intersection size via a pair/shingle join.
    // Referenced three times below (sizes + both sides of the intersection
    // join); lazy localCheckpoint materializes the explode+distinct once.
    val sh = base
      .select(col("doc_id"), col("_s"), explode(sequence(lit(0),
        greatest(length(col("_s")) - 5, lit(0)))).as("_i"))
      .select(col("doc_id"), col("_s").substr(col("_i") + 1, lit(5)).as("_sh"))
      .distinct()
      .localCheckpoint(eager = false)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("_n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("id1"), col("_sh")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("_sh")), Seq("id2", "_sh"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("_int"))
    cand
      .join(inter, Seq("id1", "id2"), "left_outer")
      .na.fill(0L, Seq("_int"))
      .join(sizes.select(col("doc_id").as("id1"), col("_n").as("_n1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("_n").as("_n2")), "id2")
      .withColumn("j", round(col("_int").cast(DoubleType) /
        (col("_n1") + col("_n2") - col("_int")), 4))
      .filter(col("j") >= threshold)
      .select(col("id1"), col("id2"), col("j"))
  }

  /** Warm the per-dataset gate fixtures (exact near-dup ground truth) so
    * recall-gated bench rows measure the operator under test, not the gate's
    * ground-truth computation. Called from Bench's prepare step, whose cost
    * is reported separately. */
  def warmGates(s: SparkSession, dir: String): Unit =
    trueNearDupPairsCached(s, dir, 0.7)

  /** Summary row for an ANN result vs the exact top-k: (k, top1_ok,
    * overlap >= 8). The oracle replays `k` (brute force in SQL) and pins the
    * two flags to TRUE. The exact top-k is tiny — both joins broadcast. */
  private def annRecallSummary(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.select(col("vec_id"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cosine").desc, col("vec_id"))).as("_rk"))
    val hit = e.join(approx, Seq("vec_id"), "left_semi")
    e.agg(count(lit(1)).as("k")).crossJoin(
        hit.agg(count(lit(1)).as("_c"),
          coalesce(min(col("_rk")), lit(99L)).as("_best")))
      .select(col("k"), (col("_best") === 1).as("top1_ok"),
        (col("_c") >= 8).as("ok"))
  }

  /** DuckDB replay of [[trueNearDupPairs]] (same normalization, same
    * prefix blocking, same 5-gram Jaccard). */
  private def trueNearDupSql(threshold: Double): String =
    s"""WITH t AS (SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS s FROM documents),
       sh AS (SELECT doc_id, substr(s, 1, 64) AS pre,
              list_distinct(list_transform(range(0, greatest(length(s)-5, 0)+1), i -> substr(s, i+1, 5))) AS gs FROM t)
       SELECT a.doc_id AS id1, b.doc_id AS id2,
         round(len(list_intersect(a.gs, b.gs))::DOUBLE /
           (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))), 4) AS j
       FROM sh a JOIN sh b ON a.pre = b.pre AND a.doc_id < b.doc_id
       WHERE len(list_intersect(a.gs, b.gs))::DOUBLE /
         (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) >= $threshold"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- dedup ---
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactIds(docs(s, dir), "doc_id", Seq("text"))),
    // Cluster canonicalization: exact-dup pairs -> min-id per cluster,
    // singletons map to themselves (the dedup pipeline's terminal step).
    "q_dedup_canonical" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val l = d.select(col("doc_id").as("id1"), col("text").as("_t1"))
      val r = d.select(col("doc_id").as("id2"), col("text").as("_t2"))
      val pairs = l.join(r,
        col("_t1") === col("_t2") && col("id1") < col("id2"))
        .select(col("id1"), col("id2"))
      Dedup.canonicalize(d, pairs)
    }),
    // MinHash LSH with a hard recall gate: the output is the LSH candidate
    // pairs intersected with the exact ground truth (prefix-blocked 5-gram
    // Jaccard >= 0.7) — it hash-matches the oracle's exact pair set iff LSH
    // recall is 1.0 on it. Seeded hashes make this deterministic.
    "q_dedup_minhash" -> ((s, dir) => {
      val d = docs(s, dir)
      val lsh = Dedup.minhashLsh(d, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, threshold = 0.5)
      trueNearDupPairsCached(s, dir, 0.7)
        .join(lsh.select(col("id1"), col("id2")), Seq("id1", "id2"), "left_semi")
    }),
    // SimHash recall gate: hamming <= 3 is a narrower net than minhash
    // banding, so the gate is a summary row — ground-truth pair count
    // (oracle-computable) plus a recall >= 0.6 flag (seeded-deterministic).
    "q_dedup_simhash" -> ((s, dir) => {
      val d = docs(s, dir)
      val t = trueNearDupPairsCached(s, dir, 0.7).select(col("id1"), col("id2"))
      val caught = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3)
        .select(col("id1"), col("id2"))
      t.agg(count(lit(1)).as("n_true")).crossJoin(
          t.join(caught, Seq("id1", "id2"), "left_semi")
            .agg(count(lit(1)).as("_c")))
        .select(col("n_true"),
          (col("_c") >= col("n_true").cast(DoubleType) * 0.6).as("ok"))
    }),
    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 100), "doc_id", "text", 0.8)
        .withColumn("jaccard", round(col("jaccard"), 4))),
    "q_dedup_embedding" -> ((s, dir) =>
      Similarity.cosinePairsExact(
          embs(s, dir).filter(col("vec_id") < 200), "vec_id", "embedding", 0.35)
        .withColumn("cosine", round(col("cosine"), 4))),
    // Embedding-LSH recall gate: ground truth = exact cosine pairs on the
    // vec_id < 200 subset (the oracle already replays that in SQL); the
    // summary row asserts LSH recall >= 0.8 on it (seeded-deterministic).
    "q_dedup_embedding_lsh" -> ((s, dir) => {
      val t = Similarity.cosinePairsExact(
          embs(s, dir).filter(col("vec_id") < 200), "vec_id", "embedding", 0.35)
        .select(col("id1"), col("id2"))
      val caught = Similarity.cosineNearDupPairs(
          embs(s, dir), "vec_id", "embedding", 0.35)
        .select(col("id1"), col("id2"))
      t.agg(count(lit(1)).as("n_true")).crossJoin(
          t.join(caught, Seq("id1", "id2"), "left_semi")
            .agg(count(lit(1)).as("_c")))
        .select(col("n_true"),
          (col("_c") >= col("n_true").cast(DoubleType) * 0.8).as("ok"))
    }),
    // --- similarity search ---
    "q_sim_bruteforce" -> ((s, dir) => {
      val q = embs(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      Similarity.bruteForceTopK(
          embs(s, dir).filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 10)
        .withColumn("cosine", round(col("cosine"), 4))
    }),
    // --- hybrid retrieval: BM25 candidates + dense cosine candidates
    //     fused with Reciprocal Rank Fusion (round 12) ---
    "q_hybrid_rrf" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val dense = Similarity.bruteForceTopK(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 20)
      val lex = TextAnalysis.bm25(docs(s, dir), "doc_id", "text",
          Seq("spark", "vector", "customer"))
        .orderBy(col("score").desc, col("doc_id")).limit(20)
      Similarity.rrfFuse(
        Seq((dense, "vec_id", "cosine"), (lex, "doc_id", "score")),
        topK = 15)
    }),
    // ANN recall gates: exact top-10 (brute force, oracle-replayable) vs
    // the approximate search — the summary row asserts >= 8/10 overlap and
    // that the true nearest neighbor is found (seeded-deterministic).
    "q_sim_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val rest = e.filter(col("vec_id") =!= 0)
      val exact = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, 10)
      val approx = Similarity.lshTopK(rest, "vec_id", "embedding", q, 10)
        .select(col("vec_id"))
      annRecallSummary(exact, approx)
    }),
    "q_sim_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val rest = e.filter(col("vec_id") =!= 0)
      // The IVF index is a stored artifact (centroids + cell-partitioned
      // assignments on disk), built once per dataset and loaded by every
      // later session — queries measure the probe, not k-means.
      val idx = ivfCache.getOrElseUpdate(dir,
        Similarity.loadOrBuildIvf(rest, dir, "vec_id", "embedding", nCells = 8))
      val exact = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, 10)
      annRecallSummary(exact, idx.search(q, 10, nProbe = 4).select(col("vec_id")))
    }),
    // --- distributed kNN JOIN (batch retrieval: every query row gets its
    //     top-k corpus neighbors through the cell-keyed IVF join).
    //     Exact mode (nProbe = nCells) is DuckDB-replayable per query;
    //     queries = every 50th vector, corpus = the rest.
    "q_knn_join" -> ((s, dir) => {
      val e = embs(s, dir)
      val queries = e.filter(col("vec_id") % 50 === 0)
      val corpus = e.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("n_id"), col("embedding"))
      val idx = knnIvfCache.getOrElseUpdate(dir,
        Similarity.buildIvf(corpus, "n_id", "embedding", nCells = 8))
      Similarity.knnJoin(queries, "vec_id", "embedding", idx,
          k = 5, nProbe = 8) // nProbe = nCells: exact
        .select(col("vec_id").as("q_id"), col("n_id"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
    }),
    // Pruned-probe recall gate: nProbe = 6 of 8 cells must still find >=
    // 80% of the exact top-5 pairs (seeded-deterministic). The synthetic
    // embeddings are near-uniform, the hardest case for IVF — cosine
    // neighborhoods barely correlate with Euclidean cells, so recall at
    // nProbe 3 measured ~70%; real clustered corpora prune far harder.
    "q_knn_join_recall" -> ((s, dir) => {
      val e = embs(s, dir)
      val queries = e.filter(col("vec_id") % 50 === 0)
      val corpus = e.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("n_id"), col("embedding"))
      val idx = knnIvfCache.getOrElseUpdate(dir,
        Similarity.buildIvf(corpus, "n_id", "embedding", nCells = 8))
      val exact = Similarity.knnJoin(queries, "vec_id", "embedding", idx,
        k = 5, nProbe = 8)
      val approx = Similarity.knnJoin(queries, "vec_id", "embedding", idx,
        k = 5, nProbe = 6)
      val hit = exact.select(col("vec_id"), col("n_id"))
        .join(approx.select(col("vec_id"), col("n_id")),
          Seq("vec_id", "n_id"), "left_semi")
      exact.agg(count(lit(1)).as("_n")).crossJoin(
          hit.agg(count(lit(1)).as("_h")))
        .select(col("_n").as("n_pairs"),
          (col("_h") >= col("_n") * 0.8).as("ok"))
    }),
    // --- text analysis ---
    "q_text_stats" -> ((s, dir) =>
      TextAnalysis.stats(docs(s, dir), "doc_id", "text")),
    "q_token_count" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))),
    "q_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.languageId(col("text")).as("lang_pred"))),
    "q_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))),
    "q_ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(docs(s, dir), "doc_id", "text")),
    "q_surprisal" -> ((s, dir) =>
      TextAnalysis.unigramSurprisal(docs(s, dir), "doc_id", "text")),
    "q_quality_filter" -> ((s, dir) =>
      TextAnalysis.gopherQuality(docs(s, dir), "doc_id", "text")),
    "q_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(docs(s, dir), "doc_id", "text", k = 3)),
    // --- BM25 lexical retrieval (round 12, Okapi/Lucene idf) ---
    // Corpus vocabulary analysis (round 12): top-20 word trigrams and a
    // Zipf least-squares fit over the top-100 unigrams.
    "q_text_topngrams" -> ((s, dir) =>
      TextAnalysis.topNgrams(docs(s, dir), "doc_id", "text", n = 3, k = 20)),
    "q_text_zipf" -> ((s, dir) =>
      TextAnalysis.zipfFit(docs(s, dir), "doc_id", "text", topK = 100)),
    "q_text_bm25" -> ((s, dir) =>
      TextAnalysis.bm25(docs(s, dir), "doc_id", "text",
        Seq("spark", "vector", "customer"))),
    "q_chunk" -> ((s, dir) =>
      TextAnalysis.chunk(docs(s, dir), "doc_id", "text",
          chunkChars = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_no"), col("start"),
          md5(col("chunk")).as("chunk_md5"))),
    // --- clustering over the embedding column ---
    // Fixed centroids = the 8 lowest-id embeddings (deterministic, so the
    // DuckDB oracle rebuilds the identical centroid set).
    "q_cluster_assign" -> ((s, dir) => {
      val cents = embs(s, dir).filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)))
        .collect()
        .map(r => r.getLong(0).toInt -> r.getSeq[Double](1))
        .sortBy(_._1).toSeq
      Clustering.assignCosine(embs(s, dir), "vec_id", "embedding", cents)
    }),
    // Trained clusters: Lloyd k-means, deterministic lowest-id seeding.
    // Output is the id-free cluster-size histogram. tol = 0 so the run
    // does exactly maxIterations updates (or reaches an exact fixpoint,
    // after which further iterations are identities) — that makes the
    // DuckDB oracle an exact unrolled replay; see kmeansSql below.
    "q_cluster_kmeans" -> ((s, dir) =>
      Clustering.kmeans(embs(s, dir), "vec_id", "embedding",
          k = 8, maxIterations = 10, tol = 0.0)
        .assignments
        .groupBy(col("cluster")).agg(count(lit(1)).as("n"))),
    // --- scrubbing: PII, repetition, corpus boilerplate ---
    // PII is planted deterministically from doc_id (the synthetic corpus has
    // none) so the detectors exercise real matches the oracle can replay.
    "q_pii_flag" -> ((s, dir) =>
      Scrub.flagPii(plantedPii(docs(s, dir)), "doc_id", "text")),
    "q_pii_scrub" -> ((s, dir) =>
      Scrub.scrubPii(plantedPii(docs(s, dir)), "doc_id", "text")
        .select(col("doc_id"), col("n_redacted"),
          md5(col("text")).as("scrub_hash"))),
    "q_repetition" -> ((s, dir) =>
      Scrub.repetitionStats(docs(s, dir), "doc_id", "text")),
    "q_repetition_ngram" -> ((s, dir) =>
      Scrub.topNgramFrac(docs(s, dir), "doc_id", "text", n = 2)),
    // Boilerplate is planted as a shared footer line on every document plus
    // a per-document unique line; the scrub must drop exactly the footer.
    "q_line_scrub" -> ((s, dir) =>
      Scrub.scrubRepeatedLines(multiLineDocs(docs(s, dir)), "doc_id", "text",
          minCount = 10L)
        .select(col("doc_id"), col("n_scrubbed"),
          md5(concat_ws("\n", sort_array(split(col("text"), "\n"))))
            .as("kept_hash"))),
    // --- Johnson-Lindenstrauss ±1 random projection of the embeddings
    // (dimension 64 -> 8); sign matrix derived from integer hashing, so
    // the oracle replays the full computation ---
    "q_embed_project" -> ((s, dir) => {
      val proj = Similarity.randomProjection(embs(s, dir), "vec_id",
        "embedding", outDim = 8)
      proj.select(col("vec_id") +:
        (0 until 8).map(j => round(element_at(col("proj"), j + 1), 4)
          .as(s"p$j")): _*)
    }),
    // --- exact duplicate-span removal (Lee et al. 2021): later
    // occurrences of any corpus-duplicated 20-token window are cut ---
    "q_span_scrub" -> ((s, dir) =>
      Scrub.scrubDuplicateSpans(docs(s, dir), "doc_id", "text", n = 20)
        .select(col("doc_id"), col("n_removed"),
          md5(col("text")).as("kept_hash"))),
    // --- Dolma-style global paragraph dedup: first occurrence survives,
    // later copies drop (position-ordered reassembly is hash-checked) ---
    "q_para_dedup" -> ((s, dir) =>
      Scrub.dedupParagraphsGlobal(multiLineDocs(docs(s, dir)), "doc_id",
          "text", sepRegex = "\n", joinSep = "\n")
        .select(col("doc_id"), col("n_dropped"),
          md5(col("text")).as("kept_hash"))),
    // --- multimodal (stubbed codec, real plumbing) ---
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.asMedia(docs(s, dir), "doc_id", "text"))
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1), 4).as("f0"))),
    // dHash media fingerprints (the image/frame dedup pass; byte-level
    // since the codec is stubbed) — the oracle replays all 64 bit
    // comparisons over substr(text) (ASCII: byte == char).
    "q_media_hash" -> ((s, dir) =>
      Multimodal.mediaHashes(
        Multimodal.asMedia(docs(s, dir), "doc_id", "text"))),
    // Frame sampling: byte-exact frames surfaced as md5 so the oracle can
    // replay them over substr(text) (documents are ASCII — byte == char).
    "q_multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.asMedia(docs(s, dir), "doc_id", "text"),
        frameBytes = 64, stride = 2)
        .select(col("media_id"),
          col("frame_no").cast(LongType).as("frame_no"),
          md5(col("frame")).as("frame_md5"))),
    // --- whole-graph analytics (DataFrame-native iterative algos) ---
    // Both project to id-free shapes (rank / component-size histograms) so
    // the DuckDB oracle can replay them without knowing graft's internal
    // surrogate ids; exact per-node membership is asserted in AlgosSpec.
    "q_algo_pagerank" -> ((s, dir) =>
      graft.algos.GraphAlgorithms.pageRank(
        graft.tpch.TpchGraph(s, dir), iterations = 3,
        relTypes = Seq("IN_REGION", "FROM_NATION", "PLACED"))
        .groupBy(round(col("rank"), 5).as("rank"))
        .agg(count(lit(1)).as("n"))),
    // Weighted PageRank (GDS relationshipWeightProperty variant; weights
    // named per rel type — the CALL-args-are-literals convention).
    "q_algo_pagerank_weighted" -> ((s, dir) =>
      graft.algos.GraphAlgorithms.pageRankWeighted(
        graft.tpch.TpchGraph(s, dir),
        Map("IN_REGION" -> 1.0, "FROM_NATION" -> 2.0, "PLACED" -> 3.0),
        iterations = 3)
        .groupBy(round(col("rank"), 5).as("rank"))
        .agg(count(lit(1)).as("n"))),
    "q_algo_components" -> ((s, dir) =>
      graft.algos.GraphAlgorithms.connectedComponents(
        graft.tpch.TpchGraph(s, dir),
        relTypes = Seq("IN_REGION", "FROM_NATION"))
        .groupBy(col("component")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_components"))),
    // ArticleRank (round 12): pagerank's graph/iteration shape with the
    // hub-damped outDeg+avgOutDeg normalizer; CALL procedure path.
    "q_algo_articlerank" -> ((s, dir) =>
      new graft.api.GraftSession(s).cypher(graft.tpch.TpchGraph(s, dir),
        "CALL articlerank(3, 'IN_REGION', 'FROM_NATION', 'PLACED') " +
          "YIELD rank RETURN round(rank, 5) AS rank, count(*) AS n")),
    // Global transitivity over the co-order part-pair graph (round 12):
    // exact triangle + wedge integers, one bit-deterministic division.
    "q_algo_transitivity" -> ((s, dir) => {
      val lp = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = lp.as("x").join(lp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.algos.GraphAlgorithms.transitivityEdges(pairs)
    }),
    // Newman modularity of the connected-components partition on the
    // geography subgraph (round 12): every edge is intra-component, so
    // Q = Σ (e_c/m − (e_c/m)²) — closed-form per region in SQL.
    "q_algo_modularity" -> ((s, dir) => {
      val g = graft.tpch.TpchGraph(s, dir)
      val e = graft.algos.GraphAlgorithms.edges(g,
        Seq("IN_REGION", "FROM_NATION"))
      graft.algos.GraphAlgorithms.modularityEdges(e,
        graft.algos.GraphAlgorithms.connectedComponents(g,
            Seq("IN_REGION", "FROM_NATION"))
          .withColumnRenamed("component", "community"))
    }),
    // Longest-path topological level histogram over the full TPCH DAG,
    // routed through the CALL procedure path.
    "q_algo_toposort" -> ((s, dir) =>
      new graft.api.GraftSession(s).cypher(graft.tpch.TpchGraph(s, dir),
        "CALL toposort() YIELD level RETURN level, count(*) AS n")),
    // SCC size histogram over the geography subgraph (a DAG — every node
    // is its own SCC, so the histogram is one all-singletons row; the
    // oracle catches over-merging, planted-cycle/Tarjan correctness lives
    // in AlgosSpec). CALL path.
    "q_algo_scc" -> ((s, dir) =>
      new graft.api.GraftSession(s).cypher(graft.tpch.TpchGraph(s, dir),
        "CALL scc('IN_REGION', 'FROM_NATION') YIELD scc " +
          "WITH scc, count(*) AS sz RETURN sz, count(*) AS n")),
    // --- curation: decontamination + deterministic sampling ---
    // Probe set = every 47th document (a stand-in benchmark suite); flag
    // corpus docs sharing any 20-char gram with a probe.
    "q_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Decontaminate.flag(
        d.filter(pmod(col("doc_id"), lit(47)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(47)) === 0),
        "doc_id", "text", n = 20, minHits = 1)
    }),
    "q_decontaminate_frac" -> ((s, dir) => {
      val d = docs(s, dir)
      Decontaminate.overlapFrac(
        d.filter(pmod(col("doc_id"), lit(47)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(47)) === 0),
        "doc_id", "text", n = 20)
    }),
    "q_sample_hash" -> ((s, dir) =>
      Sampling.hashSample(docs(s, dir), "doc_id", 0.1)
        .select(col("doc_id"), col("lang"))),
    "q_sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(docs(s, dir), "lang", "doc_id", k = 5)
        .select(col("lang"), col("doc_id"))),
    // Weighted by text length: the quality-weighted subsampling step.
    "q_sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(docs(s, dir), "doc_id",
          length(col("text")).cast(DoubleType), k = 50)
        .select(col("doc_id"), col("lang"))),
    "q_domain_mix" -> ((s, dir) =>
      Sampling.domainMix(docs(s, dir), "source")),
    // --- temperature-reweighted source mixing (alpha = 0.5 flattening) ---
    "q_temperature_mix" -> ((s, dir) =>
      Sampling.temperatureMix(docs(s, dir), "source", alpha = 0.5, "doc_id")
        .select(col("doc_id"), col("source"), col("source_target"))),
    // --- DSIR importance resampling (Xie 2023): target = every 7th doc ---
    "q_dsir_weights" -> ((s, dir) => {
      val d = docs(s, dir)
      Sampling.dsirWeights(d.filter(col("doc_id") % 7 =!= 0),
        d.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    }),
    "q_dsir_sample" -> ((s, dir) => {
      val d = docs(s, dir)
      Sampling.dsirResample(d.filter(col("doc_id") % 7 =!= 0),
        d.filter(col("doc_id") % 7 === 0), "doc_id", "text", k = 50)
    }),
    // --- epoch mixture: src0 x2.5, src1 x0 (dropped), default x1 ---
    "q_epoch_mix" -> ((s, dir) =>
      Sampling.epochMix(docs(s, dir), "source", "doc_id",
          Map("src0" -> 2.5, "src1" -> 0.0))
        .select(col("doc_id"), col("source"), col("epoch"))),
    // --- shard packing: distributed prefix sum (no single-partition window) ---
    "q_pack_budget" -> ((s, dir) =>
      Pack.packByTokenBudget(docs(s, dir), "doc_id",
          TextAnalysis.tokenCount(col("text")), budget = 5000L)
        .select(col("id").as("doc_id"), col("toks").as("n_tok"),
          col("shard"))),
    // --- events (timestamped table ops) ---
    "q_events_daily" -> ((s, dir) =>
      events(s, dir).groupBy(
          date_trunc("DAY", col("ts")).as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))),
    "q_events_json" -> ((s, dir) =>
      events(s, dir).select(
          from_json(col("props"), propsSchema).getField("k").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))),
    // --- streaming: the windowed-count pipeline run END TO END through
    //     Structured Streaming (file stream -> watermark -> tumbling
    //     window -> memory sink, processAllAvailable) and checked against
    //     the batch SQL oracle — streaming was previously spec-only. On a
    //     bounded replay all data is on time, so the streaming result must
    //     equal the batch aggregation exactly.
    "q_stream_window" -> ((s, dir) => withStagedEvents(dir) { stagedDir =>
      import graft.streaming.GraftStreaming
      GraftStreaming.withStatePartitions(s, 4) {
      val stream = GraftStreaming.eventsStream(s, stagedDir)
      val counts = GraftStreaming.windowedCounts(stream, "1 hour", "2 hours")
      val sink = "q_stream_window_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      GraftStreaming.runToMemorySink(counts, sink, outputMode = "complete")
        .select(col("window.start").as("ws"), col("event_type"),
          col("n"), round(col("total"), 4).as("total"))
      }
    }),
    // --- streaming sessionization: the flatMapGroupsWithState custom-state
    //     path, end to end. Only CLOSED sessions are emitted (the last open
    //     session per user stays in state on a bounded replay), so the
    //     oracle computes gap-based sessions and drops each user's last.
    "q_stream_sessionize" -> ((s, dir) => withStagedEvents(dir) { stagedDir =>
      import graft.streaming.GraftStreaming
      GraftStreaming.withStatePartitions(s, 4) {
      val stream = GraftStreaming.eventsStream(s, stagedDir)
      val sessions = GraftStreaming.sessionize(stream,
        gapMs = 12L * 3600 * 1000)
      val sink = "q_stream_sessionize_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      GraftStreaming.runToMemorySink(sessions.toDF(), sink)
        .select(col("user_id"), col("startTs").as("start_ts"),
          col("endTs").as("end_ts"), col("n_events"),
          round(col("total_value"), 4).as("tv"))
      }
    }),
    // --- stream-stream interval join: every view paired with the same
    //     user's clicks within the following hour. Both sides are
    //     watermarked streams; on a bounded on-time replay the result must
    //     equal the batch interval join exactly.
    "q_stream_interval_join" -> ((s, dir) => withStagedEvents(dir) { stagedDir =>
      import graft.streaming.GraftStreaming
      GraftStreaming.withStatePartitions(s, 4) {
      def side(t: String) = GraftStreaming.eventsStream(s, stagedDir)
        .filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"), col("ts"))
      val j = GraftStreaming.intervalJoin(side("view"), side("click"),
        key = "user_id", maxDelay = "1 hour", watermark = "2 hours")
      val sink = "q_stream_interval_join_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      GraftStreaming.runToMemorySink(j, sink)
        .select(col("event_id").as("view_id"),
          col("r_event_id").as("click_id"))
      }
    }),
    // --- stream-static broadcast enrichment: each micro-batch left-joins
    //     the (small, broadcast) customer dimension — no streaming state,
    //     the stream side never shuffles. Aggregated per (market segment,
    //     event type) and checked against the batch join.
    "q_stream_enrich" -> ((s, dir) => withStagedEvents(dir) { stagedDir =>
      import graft.streaming.GraftStreaming
      val dim = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val enriched = GraftStreaming.enrich(
        GraftStreaming.eventsStream(s, stagedDir), dim, "user_id")
      val sink = "q_stream_enrich_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      GraftStreaming.runToMemorySink(enriched, sink)
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
    }),
    // --- in-stream exact dedup (dropDuplicatesWithinWatermark), end to
    //     end: the staged directory holds TWO copies of the events file,
    //     so the stream sees every event twice in one micro-batch; the
    //     deduped output must equal the single-copy batch aggregation
    //     exactly — one surviving duplicate doubles a count and
    //     mismatches loudly.
    "q_stream_dedup" -> ((s, dir) => {
      import graft.streaming.GraftStreaming
      val staged = java.nio.file.Files.createTempDirectory("graft_qsd")
      val p0 = staged.resolve("part-0.parquet")
      val p1 = staged.resolve("part-1.parquet")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), p0)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), p1)
      try GraftStreaming.withStatePartitions(s, 4) {
        val deduped = GraftStreaming.dedupStream(
          GraftStreaming.eventsStream(s, staged.toString))
        val sink = "q_stream_dedup_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        GraftStreaming.runToMemorySink(deduped, sink)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      } finally {
        java.nio.file.Files.deleteIfExists(p0)
        java.nio.file.Files.deleteIfExists(p1)
        java.nio.file.Files.deleteIfExists(staged)
      }
    }),
    // --- dropDuplicatesWithinWatermark's CONTRACT, both sides: copies
    //     arriving within the watermark dedup (batch 1 holds every event
    //     twice); the same keys arriving AFTER their state expired
    //     (batch 3, +90 days, behind a +20 h watermark probe) re-emit.
    //     Every real event must therefore surface EXACTLY twice — the
    //     n_emits histogram collapses to one row and any survivor or
    //     over-drop forks it into a second row and a loud hash mismatch.
    "q_stream_dedup_wm" -> ((s, dir) => withDedupWmEvents(s, dir) { stagedDir =>
      import graft.streaming.GraftStreaming
      GraftStreaming.withStatePartitions(s, 4) {
        val deduped = GraftStreaming.dedupStream(
          GraftStreaming.eventsStream(s, stagedDir, maxFilesPerTrigger = 1))
        val sink = "q_stream_dedup_wm_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        GraftStreaming.runToMemorySink(deduped, sink)
          .filter(col("user_id") >= 0)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_emits"),
            round(sum(col("value")), 4).as("sv2"))
          .groupBy(col("n_emits"))
          .agg(count(lit(1)).as("n_ids"), round(sum(col("sv2")), 4).as("sv"))
      }
    }),
    // --- watermark late-data drop, driver-verified: the events split into
    //     THREE micro-batch files (modTime order) — the newest ~2 hours
    //     first, the two hours before that second, everything older third.
    //     Spark's late-record filter lags the eviction watermark by one
    //     committed batch (dual-watermark model, 3.4+), so batch 1 advances
    //     the watermark to max(ts)-1h, batch 2 rides the still-lagging
    //     filter in (and commits the new watermark for filtering), and
    //     every batch-3 row arrives below it and MUST be discarded by the
    //     windowed aggregation. Hour-aligned slice bounds keep each window
    //     inside one batch, so in update mode each surviving window emits
    //     exactly once. The oracle aggregates only the two on-time slices —
    //     if the watermark failed to discard, the streaming side would
    //     also aggregate the other ~99.5% of events and mismatch loudly.
    "q_stream_late_drop" -> ((s, dir) => {
      import graft.streaming.GraftStreaming
      val staged = java.nio.file.Files.createTempDirectory("graft_qsld")
      try GraftStreaming.withStatePartitions(s, 4) {
        val ev = GraftStreaming.eventsBatch(s, s"$dir/events.parquet")
        val bound = ev.agg(date_trunc("HOUR", max(col("ts"))).as("h"))
        val tagged = ev.crossJoin(broadcast(bound))
          .withColumn("_slice",
            when(col("ts") >= col("h") - expr("INTERVAL 1 HOUR"), 1)
              .when(col("ts") >= col("h") - expr("INTERVAL 3 HOURS"), 2)
              .otherwise(3))
          .drop("h")
        def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
          val tmp = staged.resolve(s"_$name")
          df.coalesce(1).write.parquet(tmp.toString)
          val part = {
            val s0 = java.nio.file.Files.list(tmp)
            try s0.iterator().asScala.toSeq
              .find(_.toString.endsWith(".parquet")).get
            finally s0.close()
          }
          val dst = staged.resolve(name)
          java.nio.file.Files.move(part, dst)
          dst.toFile.setLastModified(mtime)
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        }
        val t0 = System.currentTimeMillis() - 600000L
        Seq(1, 2, 3).foreach { sl =>
          writeOne(tagged.filter(col("_slice") === sl).drop("_slice"),
            s"b$sl.parquet", t0 + (sl - 1) * 120000L)
        }
        val stream = GraftStreaming.eventsStream(s, staged.toString,
          maxFilesPerTrigger = 1)
        val counts = GraftStreaming.windowedCounts(stream, "1 hour", "1 hour")
        val sink = "q_stream_late_drop_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        GraftStreaming.runToMemorySink(counts, sink, outputMode = "update")
          .select(col("window.start").as("ws"), col("event_type"),
            col("n"), round(col("total"), 4).as("total"))
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(staged.toFile)
      }
    }),
    // --- stream-stream LEFT OUTER interval join: views with no click in
    //     the following hour MUST come back null-padded — and a null can
    //     only be emitted once the watermark proves event time ran out for
    //     that view (join-state expiry). The staged watermark probe (+20 h,
    //     negative user ids on both sides) pushes the final watermark past
    //     every real view's expiry bound, so the streaming result must
    //     equal the batch LEFT JOIN exactly: a missing null-padded row
    //     means expiry never emitted; an extra one means a match was
    //     dropped.
    "q_stream_outer_join" -> ((s, dir) => withProbedEvents(s, dir) { stagedDir =>
      import graft.streaming.GraftStreaming
      GraftStreaming.withStatePartitions(s, 4) {
      def side(t: String) = GraftStreaming.eventsStream(s, stagedDir)
        .filter(col("event_type") === t)
        .select(col("event_id"), col("user_id"), col("ts"))
      val j = GraftStreaming.leftOuterIntervalJoin(side("view"), side("click"),
        key = "user_id", maxDelay = "1 hour", watermark = "2 hours")
      val sink = "q_stream_outer_join_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      GraftStreaming.runToMemorySink(j, sink)
        .filter(col("user_id") >= 0)
        .select(col("event_id").as("view_id"),
          col("r_event_id").as("click_id"))
      }
    }),
    // --- native session_window aggregation (the built-in stateful session
    //     operator, complementing the flatMapGroupsWithState formulation):
    //     sessions close in append mode only when the watermark passes
    //     end + gap, so the same +20 h probe forces every real session
    //     closed and the result must equal the batch gaps-and-islands
    //     aggregation over ALL sessions (including each user's last).
    "q_stream_session_window" -> ((s, dir) => withProbedEvents(s, dir) { stagedDir =>
      import graft.streaming.GraftStreaming
      GraftStreaming.withStatePartitions(s, 4) {
      val sess = GraftStreaming.sessionWindowAgg(
        GraftStreaming.eventsStream(s, stagedDir),
        gap = "12 hours", watermark = "2 hours")
      val sink = "q_stream_session_window_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      GraftStreaming.runToMemorySink(sess, sink)
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          col("session_window.start").as("start_ts"),
          col("n_events"), round(col("total_value"), 4).as("tv"))
      }
    }),
    // --- as-of join: each click matched to the user's most recent view ---
    "q_asof_join" -> ((s, dir) => {
      val e = events(s, dir)
      Temporal.asofJoin(
        e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        e.filter(col("event_type") === "view"),
        keyCol = "user_id", tsCol = "ts",
        rightPayload = Seq("event_id", "ts"))
        .select(col("event_id").as("click_id"),
          col("asof_event_id").as("view_id"), col("asof_ts").as("view_ts"))
    }),
    // --- sessionization (batch gaps-and-islands, 12h inactivity gap) ---
    "q_sessionize" -> ((s, dir) =>
      Temporal.sessionize(events(s, dir), "user_id", "ts", "value",
          gapUs = 12L * 3600 * 1000000)
        .select(col("user_id"), col("session_start"), col("dur_us"),
          col("n_events"), round(col("total_value"), 4).as("tv"))),
    // --- weighted SSSP from Region 0, undirected, per-type hop costs ---
    // (id-free output: distance histogram, same trick as the other algos)
    // Exact k-source harmonic centrality over the IN_REGION star:
    // sources = every Nation and Region, so per region with k nations a
    // nation scores 1 + (k-1)/2 and the region scores k; all other nodes
    // 0. Histogram of rounded scores.
    "q_algo_harmonic" -> ((s, dir) => {
      val g = graft.tpch.TpchGraph(s, dir)
      val src = g.nodeScansFor(Seq("Nation"))
        .map(_.df.select(col(graft.graph.PropertyGraph.ID).as("id")))
        .reduce(_.unionByName(_))
        .unionByName(g.nodeScansFor(Seq("Region"))
          .map(_.df.select(col(graft.graph.PropertyGraph.ID).as("id")))
          .reduce(_.unionByName(_)))
      graft.algos.GraphAlgorithms.harmonicCentrality(g, src,
          relTypes = Seq("IN_REGION"))
        .groupBy(round(col("harmonic"), 4).as("h"))
        .agg(count(lit(1)).as("n"))
    }),
    "q_algo_sssp" -> ((s, dir) => {
      val g = graft.tpch.TpchGraph(s, dir)
      val src = g.nodeScansFor(Seq("Region"))
        .map(_.df.filter(col("p_r_regionkey") === 0)
          .select(col(graft.graph.PropertyGraph.ID).as("id")))
        .reduce(_.unionByName(_))
      graft.algos.GraphAlgorithms.sssp(g, src, Map(
          "IN_REGION" -> 1.0, "FROM_NATION" -> 2.0, "PLACED" -> 3.0,
          "HAS_ITEM" -> 4.0, "OF_PART" -> 5.0, "BY_SUPPLIER" -> 6.0))
        .groupBy(col("dist").cast(LongType).as("dist"))
        .agg(count(lit(1)).as("n"))
    }),
    // --- triangle count over the co-order part-pair graph ---
    "q_algo_triangles" -> ((s, dir) => {
      val lp = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = lp.as("x").join(lp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.algos.GraphAlgorithms.triangleCountEdges(pairs)
    }),
    // --- degree assortativity of the co-order part-pair graph ---
    // (exact Decimal moment sums -> the one floating-point step is
    // replayed identically by the DuckDB oracle's HUGEINT sums)
    "q_algo_assortativity" -> ((s, dir) => {
      val lp = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = lp.as("x").join(lp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.algos.GraphAlgorithms.degreeAssortativity(pairs)
    }),
    // --- label propagation communities (id-free size histogram; 5 exact
    // synchronous rounds replayed by the DuckDB oracle, membership in
    // AlgosSpec) ---
    "q_algo_labelprop" -> ((s, dir) =>
      graft.algos.GraphAlgorithms.labelPropagation(
        graft.tpch.TpchGraph(s, dir),
        relTypes = Seq("IN_REGION", "FROM_NATION"), maxIterations = 5)
        .groupBy(col("label")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_communities"))),
    // --- 3-core of the co-order part-pair graph (degree histogram of the
    // core members; the unique peeling fixpoint is replayed by the DuckDB
    // oracle's unrolled rounds, membership pinned in AlgosSpec) ---
    "q_algo_kcore" -> ((s, dir) => {
      val lp = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = lp.as("x").join(lp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.algos.GraphAlgorithms.kCoreEdges(pairs, k = 3)
        .groupBy(col("degree")).agg(count(lit(1)).as("n"))
    }),
    // --- k-source Brandes betweenness over the TPCH subset graph,
    // sources sampled (customers 1..19); id-free score histogram;
    // correctness carried by AlgosSpec's exact driver-side Brandes replay ---
    "q_algo_betweenness" -> ((s, dir) => {
      val g = graft.tpch.TpchGraph(s, dir)
      val seeds = g.nodeScansFor(Seq("Customer"))
        .map(_.df.filter(col("p_c_custkey") < 20)
          .select(col(graft.graph.PropertyGraph.ID).as("id")))
        .reduce(_.unionByName(_))
      graft.algos.GraphAlgorithms.betweenness(
          graft.algos.GraphAlgorithms.edges(g,
            Seq("IN_REGION", "FROM_NATION", "PLACED")), seeds)
        .groupBy(round(col("betweenness"), 4).as("bc"))
        .agg(count(lit(1)).as("n"))
    }),
    // --- k-truss edge cohesion of the bounded co-order part-pair graph
    // (1-in-10-orders subgraph, the q_algo_neighborhood input bound);
    // support peeling replayed by the DuckDB oracle's unrolled rounds ---
    "q_algo_ktruss" -> ((s, dir) => {
      val lp = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(pmod(col("l_orderkey"), lit(10L)) === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = lp.as("x").join(lp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.algos.GraphAlgorithms.kTrussEdges(pairs, k = 4)
        .agg(count(lit(1)).as("n_edges"),
          count_distinct(col("a")).as("n_lo"),
          count_distinct(col("b")).as("n_hi"))
    }),
    // --- SemDeDup: semantic dedup bucketed by fixed-centroid clusters ---
    // (same deterministic lowest-8-id centroid set as q_cluster_assign, so
    // the DuckDB oracle replays assignment + the within-cluster drop rule)
    "q_semdedup" -> ((s, dir) => {
      val cents = embs(s, dir).filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)))
        .collect()
        .map(r => r.getLong(0).toInt -> r.getSeq[Double](1))
        .sortBy(_._1).toSeq
      Similarity.semanticDedup(embs(s, dir), "vec_id", "embedding",
        cents, threshold = 0.4)
    }),
    // --- neighborhood function over the order-part bipartite graph ---
    // (part ids offset into their own id space; output is the id-free
    // ball-size histogram, the same trick as the other algo oracles).
    // Exact closure on the 1-in-10-orders subgraph — the documented
    // bounded-input correctness baseline (same stance as q_dedup_jaccard);
    // the full-graph scale path is the HLL gate below.
    "q_algo_neighborhood" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(pmod(col("l_orderkey"), lit(10L)) === 0)
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + lit(10000000L)).as("dst"))
      graft.algos.GraphAlgorithms.neighborhoodSizes2(e)
        .groupBy(col("ball2")).agg(count(lit(1)).as("n"))
    }),
    // HyperBall accuracy gate: HLL ball estimates over the FULL graph vs
    // the exact 2-hop balls of a 1-in-97 owner sample (the exact side only
    // materializes the sampled owners' closure; ball contents are
    // unaffected) — >= 95% of sampled nodes within 10% relative error
    // (HLL at lgK=12 has ~1.6% RSE; both sides deterministic, so the gate
    // is stable). Oracle replays n_nodes and asserts the booleans TRUE.
    "q_algo_neighborhood_hll" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("src"),
          (col("l_partkey") + lit(10000000L)).as("dst"))
      val exact = graft.algos.GraphAlgorithms.neighborhoodSizes2(e,
        u => pmod(u, lit(97L)) === 0)
      // lgK=10 (1 KiB dense sketches, ~3.3% RSE): 4x less sketch volume
      // through the per-round merge shuffle than the lgK=12 default, still
      // an order of magnitude inside the 10% gate.
      val est = graft.algos.GraphAlgorithms.neighborhoodHll(e, maxHops = 2,
          lgK = 10)
        .withColumnRenamed("id", "_eid")
      exact.join(est, col("id") === col("_eid"))
        .select((abs(col("ball_est") - col("ball2")) /
          col("ball2").cast(DoubleType)).as("_relerr"))
        .agg(count(lit(1)).as("n_nodes"),
          (sum(when(col("_relerr") <= 0.1, 1L).otherwise(0L)) >=
            count(lit(1)).cast(DoubleType) * 0.95).as("ok"))
    }),
    // --- exact duplicate token-window spans (Lee et al. 2021): per-doc
    // fraction of 20-token windows that also occur in another document ---
    "q_dedup_spans" -> ((s, dir) =>
      Dedup.duplicateSpanStats(docs(s, dir), "doc_id", "text", n = 20)),
    // --- URL canonicalization + URL-level dedup over planted URLs ---
    "q_url_canonical" -> ((s, dir) =>
      Urls.dedupByUrl(plantedUrls(docs(s, dir)), "doc_id", "url")),
    // --- personalized PageRank seeded on customers 1..9 (rank > 0 is
    // exactly the seed-reachable set; id-free rank histogram) ---
    "q_algo_ppr" -> ((s, dir) => {
      val g = graft.tpch.TpchGraph(s, dir)
      val seeds = g.nodeScansFor(Seq("Customer"))
        .map(_.df.filter(col("p_c_custkey") < 10)
          .select(col(graft.graph.PropertyGraph.ID).as("id")))
        .reduce(_.unionByName(_))
      graft.algos.GraphAlgorithms.personalizedPageRank(g, seeds,
          iterations = 3,
          relTypes = Seq("IN_REGION", "FROM_NATION", "PLACED"))
        .filter(col("rank") > 0)
        .groupBy(round(col("rank"), 5).as("rank"))
        .agg(count(lit(1)).as("n"))
    }),
    // --- HITS hub/authority (2 exact integer iterations; id-free
    // (hub, auth)-histogram output, same trick as the other algos).
    // Routed through the CALL procedure surface end-to-end — this oracle
    // row exercises the Cypher-reachable path (parse -> planCall -> YIELD
    // -> aggregate), not just the programmatic API. ---
    "q_algo_hits" -> ((s, dir) =>
      new graft.api.GraftSession(s).cypher(graft.tpch.TpchGraph(s, dir),
        "CALL hits(2, 'IN_REGION', 'FROM_NATION', 'PLACED') " +
          "YIELD hub, auth " +
          "RETURN toInteger(hub) AS hub, toInteger(auth) AS auth, " +
          "count(*) AS n")),
    // --- node similarity (GDS nodeSimilarity parity): parts similar by
    // the orders they appear in (Jaccard over shared-order sets, top-5
    // per part, sources with >= 2 orders). Histogram of rounded scores —
    // the tie-break (score desc, other-id asc) is deterministic so the
    // top-k cut replays exactly in DuckDB. ---
    "q_algo_nodesim" -> ((s, dir) =>
      graft.algos.GraphAlgorithms.nodeSimilarityEdges(
        s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_partkey").as("src"), col("l_orderkey").as("dst")),
        topK = 5, degreeCutoff = 2)
        .groupBy(round(col("jacc"), 4).as("j"))
        .agg(count(lit(1)).as("n"))),
    // Cosine-metric variant of the same pipeline (GDS similarityMetric).
    "q_algo_nodesim_cosine" -> ((s, dir) =>
      graft.algos.GraphAlgorithms.nodeSimilarityEdges(
        s.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_partkey").as("src"), col("l_orderkey").as("dst")),
        topK = 5, degreeCutoff = 2, metric = "cosine")
        .groupBy(round(col("jacc"), 4).as("j"))
        .agg(count(lit(1)).as("n"))),
    // --- exact closeness centrality (Wasserman-Faust variant) over the
    // IN_REGION star, sources = every Nation and Region — closed-form
    // oracle like q_algo_harmonic: a nation in a k-nation region scores
    // (k/(n-1))·(k/(2k-1)), its region (k/(n-1))·1, everyone else 0. ---
    "q_algo_closeness" -> ((s, dir) => {
      val g = graft.tpch.TpchGraph(s, dir)
      val src = g.nodeScansFor(Seq("Nation"))
        .map(_.df.select(col(graft.graph.PropertyGraph.ID).as("id")))
        .reduce(_.unionByName(_))
        .unionByName(g.nodeScansFor(Seq("Region"))
          .map(_.df.select(col(graft.graph.PropertyGraph.ID).as("id")))
          .reduce(_.unionByName(_)))
      graft.algos.GraphAlgorithms.closenessCentrality(g, src,
          relTypes = Seq("IN_REGION"), wassermanFaust = true)
        .groupBy(round(col("closeness"), 6).as("c"))
        .agg(count(lit(1)).as("n"))
    }),
    // --- eigenvector centrality by power iteration over the UNDIRECTED
    // customer/order/nation/region subgraph (the TPCH graph is a DAG, so
    // the directed scores legitimately collapse to 0 — pinned in
    // AlgosSpec), 3 rounds, L2-normalized per round (oracle unrolls the
    // recurrence). ---
    "q_algo_eigenvector" -> ((s, dir) =>
      graft.algos.GraphAlgorithms.eigenvectorCentrality(
        graft.tpch.TpchGraph(s, dir), iterations = 3,
        relTypes = Seq("IN_REGION", "FROM_NATION", "PLACED"),
        directed = false)
        .groupBy(round(col("score"), 5).as("score"))
        .agg(count(lit(1)).as("n"))),
    // --- local clustering coefficient over the co-order part-pair graph:
    // per-node triangles via the degree-ordered wedge join, lcc histogram.
    "q_algo_lcc" -> ((s, dir) => {
      val lp = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      // No .distinct() here: localClusteringCoefficient canonicalizes and
      // dedups internally — the outer distinct was a second full shuffle
      // of the pair frame for nothing (r14, guide §2.4).
      val pairs = lp.as("x").join(lp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.algos.GraphAlgorithms.localClusteringCoefficient(pairs)
        .groupBy(round(col("lcc"), 4).as("lcc"))
        .agg(count(lit(1)).as("n"))
    }),
    // --- Louvain community detection over the co-order part-pair graph:
    // level-1, two parity-gated sweeps (the deterministic recurrence the
    // oracle unrolls exactly — every modularity-gain double is a sum of
    // integer-valued terms, so the replay is bit-exact). Community-size
    // histogram output. ---
    "q_algo_louvain" -> ((s, dir) => {
      val lp = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      // No .distinct() here: louvain's base canonicalization dedups —
      // the outer distinct was a redundant full pair-frame shuffle (r14).
      val pairs = lp.as("x").join(lp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      graft.algos.GraphAlgorithms.louvain(pairs, levels = 1, sweeps = 2)
        .groupBy(col("community")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n"))
    }),
    // --- deterministic random walks (DeepWalk corpus generation): 4
    // walks of 8 steps from every nation over the undirected
    // customer-nation-region graph with explicit arithmetic node ids;
    // the seeded congruential step choice replays exactly in SQL.
    // Output: visit-count histogram. ---
    "q_algo_randomwalk" -> ((s, dir) => {
      val nation = s.read.parquet(s"$dir/nation.parquet")
      val customer = s.read.parquet(s"$dir/customer.parquet")
      val edges = nation.select(
          col("n_nationkey").cast("long").as("src"),
          (col("n_regionkey") + lit(100)).cast("long").as("dst"))
        .unionByName(customer.select(
          (col("c_custkey") + lit(1000)).cast("long").as("src"),
          col("c_nationkey").cast("long").as("dst")))
      val starts = nation.select(col("n_nationkey").cast("long").as("id"))
      graft.algos.GraphAlgorithms.randomWalks(edges, starts,
          walksPerStart = 4, steps = 8, seed = 42L)
        .groupBy(col("node")).agg(count(lit(1)).as("visits"))
        .groupBy(col("visits")).agg(count(lit(1)).as("n"))
    }))

  /** PageRank oracle: the same 3 damped iterations with uniform dangling-
    * mass redistribution, unrolled as chained CTEs over a string-keyed
    * rebuild of the edge multiset (same trick as the q_call_degrees
    * oracle). Iterating over ALL nodes is equivalent to the engine's
    * connected-only loop + closed-form isolated rank: isolated nodes are
    * dangling, so they only ever receive the uniform missing-mass share. */
  private val pageRankSql: String = {
    def round(k: Int, prev: String) =
      s"""c$k AS (SELECT e.dst AS id, sum($prev.rank / g.d) AS contrib
            FROM edges e JOIN deg g ON e.src = g.src
            JOIN $prev ON $prev.id = e.src GROUP BY e.dst),
          m$k AS (SELECT (nn.n - coalesce((SELECT sum(contrib) FROM c$k), 0)) / nn.n AS miss FROM nn),
          r$k AS (SELECT nodes.id, 0.15 + 0.85 * (coalesce(c$k.contrib, 0) + m$k.miss) AS rank
            FROM nodes LEFT JOIN c$k ON nodes.id = c$k.id CROSS JOIN m$k)"""
    s"""WITH nodes AS (
         SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS id FROM region
         UNION ALL SELECT 'n' || CAST(n_nationkey AS VARCHAR) FROM nation
         UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR) FROM customer
         UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR) FROM supplier
         UNION ALL SELECT 'o' || CAST(o_orderkey AS VARCHAR) FROM orders
         UNION ALL SELECT 'l' || CAST(row_number() OVER () AS VARCHAR) FROM lineitem
         UNION ALL SELECT 'p' || CAST(p_partkey AS VARCHAR) FROM part),
       edges AS (
         SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS src, 'r' || CAST(n_regionkey AS VARCHAR) AS dst FROM nation
         UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR), 'n' || CAST(c_nationkey AS VARCHAR) FROM customer
         UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR), 'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
         UNION ALL SELECT 'c' || CAST(o_custkey AS VARCHAR), 'o' || CAST(o_orderkey AS VARCHAR) FROM orders),
       deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       r0 AS (SELECT id, 1.0 AS rank FROM nodes),
       ${round(1, "r0")},
       ${round(2, "r1")},
       ${round(3, "r2")}
       SELECT round(rank, 5) AS rank, count(*) AS n FROM r3 GROUP BY 1"""
  }

  /** ArticleRank oracle: pageRankSql's graph with the hub-damped
    * normalizer (contrib = rank / (outDeg + avgOutDeg), avgOutDeg =
    * |E| / |connected nodes|), NO dangling-mass redistribution, 3
    * unrolled rounds; isolated nodes read the closed-form 1 − damping. */
  private val articleRankSql: String = {
    def round(k: Int, prev: String) =
      s"""c$k AS (SELECT e.dst AS id, sum($prev.rank / (g.d + st.avgd)) AS contrib
            FROM edges e JOIN deg g ON e.src = g.src
            JOIN $prev ON $prev.id = e.src CROSS JOIN st GROUP BY e.dst),
          r$k AS (SELECT cn.id, 0.15 + 0.85 * coalesce(c$k.contrib, 0) AS rank
            FROM cn LEFT JOIN c$k ON cn.id = c$k.id)"""
    s"""WITH nodes AS (
         SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS id FROM region
         UNION ALL SELECT 'n' || CAST(n_nationkey AS VARCHAR) FROM nation
         UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR) FROM customer
         UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR) FROM supplier
         UNION ALL SELECT 'o' || CAST(o_orderkey AS VARCHAR) FROM orders
         UNION ALL SELECT 'l' || CAST(row_number() OVER () AS VARCHAR) FROM lineitem
         UNION ALL SELECT 'p' || CAST(p_partkey AS VARCHAR) FROM part),
       edges AS (
         SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS src, 'r' || CAST(n_regionkey AS VARCHAR) AS dst FROM nation
         UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR), 'n' || CAST(c_nationkey AS VARCHAR) FROM customer
         UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR), 'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
         UNION ALL SELECT 'c' || CAST(o_custkey AS VARCHAR), 'o' || CAST(o_orderkey AS VARCHAR) FROM orders),
       deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       cn AS (SELECT DISTINCT id FROM (
         SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges) t),
       st AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM edges)
                   / (SELECT count(*) FROM cn) AS avgd),
       r0 AS (SELECT id, 1.0 AS rank FROM cn),
       ${round(1, "r0")},
       ${round(2, "r1")},
       ${round(3, "r2")},
       allr AS (SELECT rank FROM r3
         UNION ALL SELECT 0.15 FROM nodes WHERE id NOT IN (SELECT id FROM cn))
       SELECT round(rank, 5) AS rank, count(*) AS n FROM allr GROUP BY 1"""
  }

  /** Weighted-PageRank oracle: the pageRankSql recurrence with per-edge
    * weights (contrib = rank * w / sum-of-out-weights), 3 unrolled
    * rounds; weights mirror the registry row's type map. */
  private val pageRankWeightedSql: String = {
    def round(k: Int, prev: String) =
      s"""c$k AS (SELECT e.dst AS id, sum($prev.rank * e.w / g.d) AS contrib
            FROM edges e JOIN deg g ON e.src = g.src
            JOIN $prev ON $prev.id = e.src GROUP BY e.dst),
          m$k AS (SELECT (nn.n - coalesce((SELECT sum(contrib) FROM c$k), 0)) / nn.n AS miss FROM nn),
          r$k AS (SELECT nodes.id, 0.15 + 0.85 * (coalesce(c$k.contrib, 0) + m$k.miss) AS rank
            FROM nodes LEFT JOIN c$k ON nodes.id = c$k.id CROSS JOIN m$k)"""
    s"""WITH nodes AS (
         SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS id FROM region
         UNION ALL SELECT 'n' || CAST(n_nationkey AS VARCHAR) FROM nation
         UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR) FROM customer
         UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR) FROM supplier
         UNION ALL SELECT 'o' || CAST(o_orderkey AS VARCHAR) FROM orders
         UNION ALL SELECT 'l' || CAST(row_number() OVER () AS VARCHAR) FROM lineitem
         UNION ALL SELECT 'p' || CAST(p_partkey AS VARCHAR) FROM part),
       edges AS (
         SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS src, 'r' || CAST(n_regionkey AS VARCHAR) AS dst, 1.0 AS w FROM nation
         UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR), 'n' || CAST(c_nationkey AS VARCHAR), 2.0 FROM customer
         UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR), 'n' || CAST(s_nationkey AS VARCHAR), 2.0 FROM supplier
         UNION ALL SELECT 'c' || CAST(o_custkey AS VARCHAR), 'o' || CAST(o_orderkey AS VARCHAR), 3.0 FROM orders),
       deg AS (SELECT src, sum(w) AS d FROM edges GROUP BY src),
       nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       r0 AS (SELECT id, 1.0 AS rank FROM nodes),
       ${round(1, "r0")},
       ${round(2, "r1")},
       ${round(3, "r2")}
       SELECT round(rank, 5) AS rank, count(*) AS n FROM r3 GROUP BY 1"""
  }

  /** Personalized-PageRank oracle: 3 unrolled rounds of
    * r = 0.15·p + 0.85·(contribs + miss·p) over the same string-keyed
    * edge rebuild as [[pageRankSql]], restart mass uniform on customers
    * 1..9; rank > 0 replays the engine's reachable-set filter. */
  private val pprSql: String = {
    def round(j: Int, prev: String) =
      s"""c$j AS (SELECT e.dst AS id, sum($prev.rank / g.d) AS contrib
            FROM edges e JOIN deg g ON e.src = g.src
            JOIN $prev ON $prev.id = e.src GROUP BY e.dst),
          m$j AS (SELECT 1 - coalesce((SELECT sum(contrib) FROM c$j), 0) AS miss),
          r$j AS (SELECT base.id, 0.15 * base.p + 0.85 * (coalesce(c$j.contrib, 0) + m$j.miss * base.p) AS rank
            FROM base LEFT JOIN c$j ON base.id = c$j.id CROSS JOIN m$j)"""
    s"""WITH edges AS (
         SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS src, 'r' || CAST(n_regionkey AS VARCHAR) AS dst FROM nation
         UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR), 'n' || CAST(c_nationkey AS VARCHAR) FROM customer
         UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR), 'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
         UNION ALL SELECT 'c' || CAST(o_custkey AS VARCHAR), 'o' || CAST(o_orderkey AS VARCHAR) FROM orders),
       seeds AS (SELECT 'c' || CAST(c_custkey AS VARCHAR) AS id FROM customer WHERE c_custkey < 10),
       kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM seeds),
       w AS (SELECT DISTINCT id FROM (
         SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
         UNION ALL SELECT id FROM seeds)),
       base AS (SELECT w.id, CASE WHEN s.id IS NULL THEN 0 ELSE 1 / kk.k END AS p
         FROM w LEFT JOIN seeds s ON w.id = s.id CROSS JOIN kk),
       deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
       r0 AS (SELECT id, p AS rank FROM base),
       ${round(1, "r0")},
       ${round(2, "r1")},
       ${round(3, "r2")}
       SELECT round(rank, 5) AS rank, count(*) AS n FROM r3
       WHERE rank > 0 GROUP BY 1"""
  }

  /** JL-projection oracle: replays the derived ±1 sign matrix
    * (multiplicative integer hash, bit 10) and the scaled sums in SQL. */
  private val embedProjectSql: String = {
    val signCols = (0 until 8).map { j =>
      s"""sum(v * (CASE WHEN ((i*2654435761 + $j*2246822519 + 42) % 2147483648 // 1024) % 2 = 0
            THEN 1.0 ELSE -1.0 END)) / sqrt(8) AS s$j"""
    }.mkString(",\n           ")
    val outs = (0 until 8).map(j => s"round(s$j, 4) AS p$j").mkString(", ")
    s"""WITH pos AS (SELECT vec_id, unnest(range(0, len(embedding))) AS i,
             embedding AS emb FROM embeddings),
         pv AS (SELECT vec_id, i, CAST(emb[i+1] AS DOUBLE) AS v FROM pos),
         agg AS (SELECT vec_id,
           $signCols
           FROM pv GROUP BY vec_id)
       SELECT vec_id, $outs FROM agg"""
  }

  /** dHash oracle: each bit compares the sampled byte to its successor;
    * ASCII text makes string substr comparison identical to the engine's
    * unsigned binary comparison. Bits OR together (disjoint powers; |
    * avoids BIGINT overflow on bit 63). */
  private val mediaHashSql: String = {
    val bits = (0 until 64).map { j =>
      val v = if (j == 63) "(-9223372036854775808)::BIGINT"
        else s"CAST(${1L << j} AS BIGINT)"
      s"""(CASE WHEN substr(text, CAST(floor(length(text) * $j / 65) AS BIGINT) + 1, 1)
            > substr(text, CAST(floor(length(text) * $j / 65) AS BIGINT) + 2, 1)
          THEN $v ELSE 0 END)"""
    }.mkString(" |\n           ")
    s"""SELECT doc_id AS media_id,
           $bits AS dhash
         FROM documents"""
  }

  /** k-core oracle: unrolled peeling rounds over the distinct co-order
    * part-pair graph. Peeling is monotone and its fixpoint is unique, so
    * unrolling MORE rounds than the fixpoint needs is exact (post-fixpoint
    * rounds are identities); sf0.01 converges in 1 round, 6 are unrolled
    * for margin. Mirrors kCoreEdges' symmetrized-degree formulation. */
  private val kCoreSql: String = {
    def round(j: Int) = {
      val prev = s"e${j - 1}"
      s"""d$j AS MATERIALIZED (SELECT id, count(*) AS d FROM (
            SELECT a AS id FROM $prev UNION ALL SELECT b FROM $prev) GROUP BY 1),
          e$j AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
            JOIN d$j da ON da.id = e.a JOIN d$j db ON db.id = e.b
            WHERE da.d >= 3 AND db.d >= 3)"""
    }
    val rounds = (1 to 6).map(round).mkString(",\n        ")
    s"""WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        e0 AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
          FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
        $rounds,
        deg AS (SELECT id, count(*) AS degree FROM (
          SELECT a AS id FROM e6 UNION ALL SELECT b FROM e6) GROUP BY 1)
       SELECT degree, count(*) AS n FROM deg GROUP BY 1"""
  }

  /** Label-propagation oracle: exactly 5 unrolled synchronous rounds of
    * neighbor-label mode with min-label ties (the engine's semantic cap;
    * early engine convergence is safe because the fixpoint is stable under
    * further rounds). Node surrogates are tag*1e8 + key with the tag order
    * of TpchGraph's nodeDefs (region 0, nation 1, customer 2, supplier 3,
    * part 4, orders 5, lineitem 6) so the min-label TIE-BREAK order matches
    * the engine's tagged internal ids exactly. */
  private val labelPropSql: String = {
    def round(j: Int) = {
      val prev = s"l${j - 1}"
      s"""c$j AS MATERIALIZED (SELECT s.u AS id, l.label, count(*) AS cnt
            FROM sym s JOIN $prev l ON l.id = s.v GROUP BY 1, 2),
          l$j AS MATERIALIZED (SELECT id, label FROM (
            SELECT id, label,
              row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label) AS rn
            FROM c$j) WHERE rn = 1)"""
    }
    val rounds = (1 to 5).map(round).mkString(",\n        ")
    s"""WITH edges AS (
          SELECT 100000000 + n_nationkey AS u, 0 + n_regionkey AS v FROM nation
          UNION ALL SELECT 200000000 + c_custkey, 100000000 + c_nationkey FROM customer
          UNION ALL SELECT 300000000 + s_suppkey, 100000000 + s_nationkey FROM supplier),
        sym AS (SELECT DISTINCT u, v FROM (
          SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges)),
        l0 AS (SELECT DISTINCT u AS id, u AS label FROM sym),
        $rounds,
        allnodes AS (
          SELECT 0 + r_regionkey AS id FROM region
          UNION ALL SELECT 100000000 + n_nationkey FROM nation
          UNION ALL SELECT 200000000 + c_custkey FROM customer
          UNION ALL SELECT 300000000 + s_suppkey FROM supplier
          UNION ALL SELECT 400000000 + p_partkey FROM part
          UNION ALL SELECT 500000000 + o_orderkey FROM orders
          UNION ALL SELECT 600000000 + row_number() OVER () FROM lineitem),
        sizes AS (SELECT label, count(*) AS sz FROM l5 GROUP BY 1),
        iso AS (SELECT id FROM allnodes WHERE id NOT IN (SELECT id FROM l5))
       SELECT sz, count(*) AS n_communities FROM (
         SELECT sz FROM sizes UNION ALL SELECT 1 AS sz FROM iso) GROUP BY 1"""
  }

  /** k-truss oracle: unrolled support-peeling rounds (support = common
    * neighbors within the surviving edge set; k=4 keeps support >= 2) over
    * the bounded 1-in-10-orders pair graph. Same monotone-fixpoint
    * unrolling argument as [[kCoreSql]]; sf0.01 converges in 4 rounds,
    * 8 are unrolled for margin. */
  private val kTrussSql: String = {
    def round(j: Int) = {
      val prev = s"e${j - 1}"
      s"""y$j AS MATERIALIZED (SELECT a AS u, b AS v FROM $prev
            UNION ALL SELECT b AS u, a AS v FROM $prev),
          s$j AS MATERIALIZED (SELECT e.a, e.b, count(*) AS sup
            FROM $prev e
            JOIN y$j x ON x.u = e.a
            JOIN y$j y ON y.u = e.b AND y.v = x.v
            GROUP BY 1, 2),
          e$j AS MATERIALIZED (SELECT a, b FROM s$j WHERE sup >= 2)"""
    }
    val rounds = (1 to 8).map(round).mkString(",\n        ")
    s"""WITH lp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          FROM lineitem WHERE l_orderkey % 10 = 0),
        e0 AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
          FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
        $rounds
       SELECT count(*) AS n_edges, count(DISTINCT a) AS n_lo,
         count(DISTINCT b) AS n_hi FROM e8"""
  }

  /** k-means oracle: exact unrolled Lloyd replay. Centers live in long
    * form (j, dim, m); each round computes squared-Euclidean distances via
    * a dim-join + sum, assigns by (d2, j) argmin (matching
    * [[Clustering.nearest]]'s first-wins tie-break), and averages assigned
    * points per (cluster, dim) — COALESCE keeps an emptied cluster's
    * previous centroid exactly as the Scala loop does. The engine runs
    * with tol = 0, so both sides do precisely `iters` updates (an exact
    * fixpoint makes the remaining rounds identities on both sides), then
    * one final assignment under the last centers. */
  private def kmeansSql(k: Int = 8, iters: Int = 10): String = {
    def round(i: Int) = {
      val prev = s"c${i - 1}"
      // MATERIALIZED is load-bearing: each c_i is referenced twice
      // downstream, and DuckDB 1.0.0 (the driver's version) inlines
      // non-materialized CTEs, turning the iters-deep chain into ~2^iters
      // recomputations (>15 min vs 0.36 s on 500x64 embeddings).
      s"""d$i AS MATERIALIZED (SELECT p.vec_id, c.j, sum((p.x - c.m) * (p.x - c.m)) AS d2
            FROM pts p JOIN $prev c USING (dim) GROUP BY p.vec_id, c.j),
          a$i AS MATERIALIZED (SELECT vec_id, j FROM (SELECT vec_id, j,
              row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
            FROM d$i) WHERE rn = 1),
          c$i AS MATERIALIZED (SELECT c.j, c.dim, coalesce(u.m, c.m) AS m
            FROM $prev c LEFT JOIN (
              SELECT j, dim, avg(x) AS m FROM a$i JOIN pts USING (vec_id)
              GROUP BY j, dim) u ON u.j = c.j AND u.dim = c.dim)"""
    }
    val rounds = (1 to iters).map(round).mkString(",\n        ")
    val fin = iters + 1
    s"""WITH pts AS MATERIALIZED (
          SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
                 unnest(embedding::DOUBLE[]) AS x
          FROM embeddings),
        seeds AS MATERIALIZED (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $k)),
        c0 AS MATERIALIZED (SELECT j, dim, x AS m FROM seeds JOIN pts USING (vec_id)),
        $rounds,
        d$fin AS MATERIALIZED (SELECT p.vec_id, c.j, sum((p.x - c.m) * (p.x - c.m)) AS d2
          FROM pts p JOIN c$iters c USING (dim) GROUP BY p.vec_id, c.j),
        a$fin AS MATERIALIZED (SELECT vec_id, j FROM (SELECT vec_id, j,
            row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
          FROM d$fin) WHERE rn = 1)
       SELECT CAST(j AS INTEGER) AS cluster, count(*) AS n
       FROM a$fin GROUP BY j"""
  }

  /** Betweenness oracle: exact unrolled k-source Brandes replay of
    * [[graft.algos.GraphAlgorithms.betweenness]] over the same TPCH
    * subset graph (IN_REGION + FROM_NATION + PLACED, undirected, sources
    * = customers 0..19). Node ids are prefix-namespaced text keys (the
    * engine's tagged ids are internal; the output is an id-free score
    * histogram, so only the score MULTISET must match). Forward: `depth`
    * unrolled level-synchronous BFS rounds keyed by source, each a
    * frontier join + visited anti-join + sigma aggregation; backward:
    * the Brandes dependency sweep over the same levels in reverse
    * (delta(v) = sum over DAG successors w of sigma(v)/sigma(w) *
    * (1+delta(w))). Undirected pair contributions halve (scale 0.5).
    * Every round CTE is MATERIALIZED — DuckDB 1.0.0 inlines
    * multi-referenced CTEs exponentially otherwise (the round-9 kmeans
    * lesson). The real BFS depth here is 5; depth=7 leaves two empty
    * guard levels. */
  private def betweennessSql(depth: Int = 7): String = {
    def fwd(k: Int) =
      s"""l$k AS MATERIALIZED (
            SELECT t.s, t.v, sum(t.sigma) AS sigma FROM (
              SELECT l.s AS s, e.dst AS v, l.sigma AS sigma
              FROM l${k - 1} l JOIN e ON l.v = e.src) t
            LEFT JOIN vis${k - 1} x ON x.s = t.s AND x.v = t.v
            WHERE x.v IS NULL GROUP BY t.s, t.v),
          vis$k AS MATERIALIZED (
            SELECT s, v FROM vis${k - 1}
            UNION ALL SELECT s, v FROM l$k)"""
    def bwd(k: Int) =
      s"""d$k AS MATERIALIZED (
            SELECT lk.s, lk.v, coalesce(c.acc, 0.0) AS delta
            FROM l$k lk LEFT JOIN (
              SELECT lk2.s AS s, lk2.v AS v,
                sum(lk2.sigma / u.sigma * (1 + u.delta)) AS acc
              FROM l$k lk2 JOIN e ON lk2.v = e.src
              JOIN (SELECT dk.s, dk.v, dk.delta, lk1.sigma
                    FROM d${k + 1} dk JOIN l${k + 1} lk1
                      ON lk1.s = dk.s AND lk1.v = dk.v) u
                ON u.s = lk2.s AND u.v = e.dst
              GROUP BY lk2.s, lk2.v) c ON c.s = lk.s AND c.v = lk.v)"""
    val fwds = (1 to depth).map(fwd).mkString(",\n        ")
    val bwds = ((depth - 1) to 0 by -1).map(bwd).mkString(",\n        ")
    val deltaUnion = (0 until depth)
      .map(k => s"SELECT s, v, delta FROM d$k").mkString("\n          UNION ALL ")
    s"""WITH e0 AS MATERIALIZED (
          SELECT 'n' || n_nationkey AS src, 'r' || n_regionkey AS dst FROM nation
          UNION ALL SELECT 'c' || c_custkey, 'n' || c_nationkey FROM customer
          UNION ALL SELECT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
          UNION ALL SELECT 'c' || o_custkey, 'o' || o_orderkey FROM orders),
        e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0)),
        srcs AS MATERIALIZED (
          SELECT 'c' || c_custkey AS s FROM customer WHERE c_custkey < 20),
        l0 AS MATERIALIZED (SELECT s, s AS v, 1.0 AS sigma FROM srcs),
        vis0 AS MATERIALIZED (SELECT s, v FROM l0),
        $fwds,
        d$depth AS MATERIALIZED (SELECT s, v, 0.0 AS delta FROM l$depth),
        $bwds,
        bcs AS MATERIALIZED (
          SELECT v, sum(delta) AS b FROM (
          $deltaUnion
          ) dd WHERE v <> s GROUP BY v),
        allnodes AS (SELECT DISTINCT v FROM (
          SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e
          UNION ALL SELECT s AS v FROM srcs))
       SELECT round(0.5 * coalesce(b, 0.0), 4) AS bc, count(*) AS n
       FROM allnodes LEFT JOIN bcs USING (v) GROUP BY 1"""
  }

  /** Node-similarity oracle: replays the Jaccard + deterministic top-k
    * cut (score desc, other-id asc) over the distinct (part, order)
    * bipartite edge set. */
  private val nodeSimSql: String =
    """WITH e AS (SELECT DISTINCT l_partkey AS src, l_orderkey AS dst FROM lineitem),
       deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src HAVING count(*) >= 2),
       ed AS (SELECT e.src, e.dst, deg.dg FROM e JOIN deg ON e.src = deg.src),
       pairs AS (SELECT a.src AS a, b.src AS b, a.dg AS da, b.dg AS db, count(*) AS c
         FROM ed a JOIN ed b ON a.dst = b.dst AND a.src < b.src GROUP BY 1, 2, 3, 4),
       scored AS (SELECT a, b, CAST(c AS DOUBLE) / (da + db - c) AS jacc FROM pairs),
       bothd AS (SELECT a AS id, b AS other, jacc FROM scored
         UNION ALL SELECT b, a, jacc FROM scored),
       rk AS (SELECT id, jacc,
           row_number() OVER (PARTITION BY id ORDER BY jacc DESC, other) AS r
         FROM bothd)
     SELECT round(jacc, 4) AS j, CAST(count(*) AS BIGINT) AS n
     FROM rk WHERE r <= 5 GROUP BY 1"""

  /** Cosine variant of [[nodeSimSql]] (same pipeline, c/sqrt(da*db)). */
  private val nodeSimCosineSql: String =
    nodeSimSql.replace("CAST(c AS DOUBLE) / (da + db - c)",
      "CAST(c AS DOUBLE) / sqrt(CAST(da AS DOUBLE) * db)")

  /** Closeness (Wasserman-Faust) closed form on the per-region IN_REGION
    * stars (each region is its own component): a nation in a k-nation
    * region is reached by its region (d 1) and k-1 siblings (d 2), the
    * region by its k nations (d 1); everyone else scores 0. The
    * expression SHAPE mirrors the engine's (r/(n-1))·(r/sumd) exactly so
    * the rounded doubles agree bit-for-bit. */
  private val closenessSql: String =
    """WITH k AS (SELECT n_regionkey AS rk, CAST(count(*) AS DOUBLE) AS kk FROM nation GROUP BY 1),
       nn AS (SELECT CAST((SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
           + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
           + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)
           + (SELECT count(*) FROM lineitem) AS DOUBLE) AS n),
       rows_ AS (
         SELECT round((kk / (n - 1)) * (kk / (2 * kk - 1)), 6) AS c, CAST(kk AS BIGINT) AS m
         FROM k CROSS JOIN nn
         UNION ALL SELECT round((kk / (n - 1)) * (kk / kk), 6), CAST(1 AS BIGINT)
         FROM k CROSS JOIN nn
         UNION ALL SELECT 0.0,
           (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
           + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)
           + (SELECT count(*) FROM lineitem))
     SELECT c, CAST(sum(m) AS BIGINT) AS n FROM rows_ GROUP BY 1"""

  /** Eigenvector oracle: 3 unrolled power-iteration rounds
    * (x ← A'x / ‖A'x‖₂ from a uniform start over the connected set) on
    * the string-keyed edge rebuild; nodes outside the connected set read
    * the engine's analytic 0. */
  private val eigenvectorSql: String = {
    def round(k: Int, prev: String) =
      s"""c$k AS (SELECT e.dst AS id, sum($prev.score) AS raw
            FROM edges e JOIN $prev ON $prev.id = e.src GROUP BY 1),
          r$k AS (SELECT conn.id, coalesce(c$k.raw, 0.0) AS raw
            FROM conn LEFT JOIN c$k ON conn.id = c$k.id),
          n$k AS (SELECT sqrt(sum(raw * raw)) AS nm FROM r$k),
          x$k AS (SELECT id, raw / nm AS score FROM r$k CROSS JOIN n$k)"""
    s"""WITH dedges AS (
         SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS src, 'r' || CAST(n_regionkey AS VARCHAR) AS dst FROM nation
         UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR), 'n' || CAST(c_nationkey AS VARCHAR) FROM customer
         UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR), 'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
         UNION ALL SELECT 'c' || CAST(o_custkey AS VARCHAR), 'o' || CAST(o_orderkey AS VARCHAR) FROM orders),
       edges AS (SELECT src, dst FROM dedges
         UNION ALL SELECT dst AS src, src AS dst FROM dedges),
       conn AS (SELECT DISTINCT id FROM (
         SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
       total AS (SELECT (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
           + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
           + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)
           + (SELECT count(*) FROM lineitem) AS t),
       x0 AS (SELECT id, 1.0 AS score FROM conn),
       ${round(1, "x0")},
       ${round(2, "x1")},
       ${round(3, "x2")},
       hist AS (
         SELECT round(score, 5) AS score, CAST(count(*) AS BIGINT) AS n FROM x3 GROUP BY 1
         UNION ALL SELECT 0.0, t - (SELECT count(*) FROM conn) FROM total)
     SELECT score, CAST(sum(n) AS BIGINT) AS n FROM hist GROUP BY 1"""
  }

  /** Louvain oracle: the level-1 recurrence unrolled — two parity-gated
    * synchronous sweeps (movers: (id+sweep) even), candidate communities =
    * neighbor communities plus staying put, score = kin − k·(Σtot −
    * [same]·k)/2m with ties to the smaller community id. All sums are of
    * integer-valued doubles, so the replay is bit-exact. */
  private val louvainSql: String = {
    def sweep(s: Int, prev: String) =
      s"""ctot$s AS (SELECT c, sum(k) AS tot FROM $prev JOIN strength USING (id) GROUP BY c),
         mv$s AS (SELECT id AS u, c AS oc FROM $prev WHERE (id + $s) % 2 = 0),
         nbr$s AS (SELECT sym.u, m.oc, c2.c AS nc, sum(sym.w) AS kin
           FROM sym JOIN mv$s m ON sym.u = m.u JOIN $prev c2 ON sym.v = c2.id
           GROUP BY 1, 2, 3),
         cand$s AS (SELECT u, oc, nc, max(kin) AS kin FROM (
             SELECT u, oc, nc, kin FROM nbr$s
             UNION ALL SELECT u, oc, oc AS nc, 0.0 AS kin FROM mv$s)
           GROUP BY 1, 2, 3),
         sc$s AS (SELECT cd.u, cd.nc,
             cd.kin - (1.0 * st.k) * (ct.tot - CASE WHEN cd.nc = cd.oc THEN st.k ELSE 0.0 END) / (SELECT m2 FROM m2t) AS score
           FROM cand$s cd JOIN strength st ON st.id = cd.u
           JOIN ctot$s ct ON ct.c = cd.nc),
         best$s AS (SELECT u AS id, nc AS newc FROM (
             SELECT u, nc, row_number() OVER (PARTITION BY u ORDER BY score DESC, nc) AS rk
             FROM sc$s) WHERE rk = 1),
         comm$s AS (SELECT p.id, coalesce(b.newc, p.c) AS c
           FROM $prev p LEFT JOIN best$s b ON b.id = p.id)"""
    s"""WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       e AS (SELECT DISTINCT x.p AS a, y.p AS b FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
       sym AS (SELECT a AS u, b AS v, 1.0 AS w FROM e
         UNION ALL SELECT b, a, 1.0 FROM e),
       strength AS (SELECT u AS id, CAST(sum(w) AS DOUBLE) AS k FROM sym GROUP BY u),
       m2t AS (SELECT sum(k) AS m2 FROM strength),
       comm0 AS (SELECT id, id AS c FROM strength),
       ${sweep(1, "comm0")},
       ${sweep(2, "comm1")}
     SELECT sz, CAST(count(*) AS BIGINT) AS n FROM (
       SELECT c, CAST(count(*) AS BIGINT) AS sz FROM comm2 GROUP BY c)
     GROUP BY sz"""
  }

  /** Random-walk oracle: the exact seeded congruential step replay —
    * neighbor rank (partition by node, order by neighbor id) and
    * pick = hash(walkId, step, cur) mod degree, all BIGINT arithmetic
    * below 2^63 on both engines. */
  private val randomWalkSql: String = {
    val M = "1000000007"
    def step(t: Int, prev: String) =
      s"""s$t AS (SELECT p.walk_id, nbr.dst AS cur
            FROM $prev p JOIN nbr ON p.cur = nbr.src
            AND nbr.idx = (((p.walk_id % $M) * 31 + $t * 7919 + (p.cur % $M) * 654435747 + 42) % $M) % nbr.deg + 1)"""
    val steps = (1 to 8).map(t => step(t, s"s${t - 1}")).mkString(",\n       ")
    val visitUnion = (1 to 8).map(t => s"UNION ALL SELECT cur FROM s$t").mkString(" ")
    s"""WITH e0 AS (
         SELECT CAST(n_nationkey AS BIGINT) AS src, CAST(n_regionkey + 100 AS BIGINT) AS dst FROM nation
         UNION ALL SELECT CAST(c_custkey + 1000 AS BIGINT), CAST(c_nationkey AS BIGINT) FROM customer),
       ed AS (SELECT DISTINCT src, dst FROM e0),
       sym AS (SELECT DISTINCT src, dst FROM (
         SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed)),
       nbr AS (SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY dst) AS idx,
           count(*) OVER (PARTITION BY src) AS deg FROM sym),
       s0 AS (SELECT CAST(n_nationkey AS BIGINT) * 4 + w.w AS walk_id,
           CAST(n_nationkey AS BIGINT) AS cur
         FROM nation CROSS JOIN (VALUES (0), (1), (2), (3)) AS w(w)),
       $steps,
       visits AS (SELECT cur FROM s0 $visitUnion),
       per AS (SELECT cur, CAST(count(*) AS BIGINT) AS visits FROM visits GROUP BY cur)
     SELECT visits, CAST(count(*) AS BIGINT) AS n FROM per GROUP BY 1"""
  }

  val oracleSql: Map[String, String] = Map(
    "q_algo_nodesim" -> nodeSimSql,
    "q_algo_nodesim_cosine" -> nodeSimCosineSql,
    "q_algo_louvain" -> louvainSql,
    "q_algo_lcc" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         e AS (SELECT DISTINCT x.p AS a, y.p AS b FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
         deg AS (SELECT id, count(*) AS dg FROM (
             SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY id),
         tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                     JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
         pernode AS (SELECT id, count(*) AS t FROM (
             SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
             UNION ALL SELECT z FROM tri) GROUP BY id),
         lcc AS (SELECT deg.id,
             CASE WHEN deg.dg >= 2
                  THEN 2.0 * coalesce(pernode.t, 0) / (deg.dg * (deg.dg - 1))
                  ELSE 0.0 END AS lcc
           FROM deg LEFT JOIN pernode ON deg.id = pernode.id)
       SELECT round(lcc, 4) AS lcc, CAST(count(*) AS BIGINT) AS n
       FROM lcc GROUP BY 1""",
    "q_algo_closeness" -> closenessSql,
    "q_algo_eigenvector" -> eigenvectorSql,
    "q_algo_randomwalk" -> randomWalkSql,
    "q_algo_betweenness" -> betweennessSql(),
    "q_embed_project" -> embedProjectSql,
    "q_cluster_kmeans" -> kmeansSql(),
    "q_media_hash" -> mediaHashSql,
    "q_algo_pagerank" -> pageRankSql,
    "q_algo_articlerank" -> articleRankSql,
    "q_algo_transitivity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           e AS (SELECT DISTINCT x.p AS a, y.p AS b FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
           degs AS (SELECT id, count(*) AS d FROM (
             SELECT a AS id FROM e UNION ALL SELECT b FROM e) t GROUP BY id),
           w AS (SELECT CAST(sum(d * (d - 1)) // 2 AS BIGINT) AS wedges FROM degs),
           t AS (SELECT CAST(count(*) AS BIGINT) AS triangles
             FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                       JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
         SELECT t.triangles, w.wedges,
           CASE WHEN w.wedges = 0 THEN 0.0
                ELSE CAST(3 * t.triangles AS DOUBLE) / w.wedges
           END AS transitivity
         FROM t CROSS JOIN w""",
    // Components partition on the geography subgraph: every edge is
    // intra-component, so d_c = 2·e_c and Q = Σ (e_c/m − (e_c/m)²);
    // the engine's (d_c/2m)² differs only by an exact power-of-two
    // scaling, and round(·,8) absorbs the cross-engine sum order.
    "q_algo_modularity" ->
      """WITH ec AS (
           SELECT n_regionkey AS rk FROM nation
           UNION ALL SELECT n_regionkey FROM customer JOIN nation ON n_nationkey = c_nationkey
           UNION ALL SELECT n_regionkey FROM supplier JOIN nation ON n_nationkey = s_nationkey),
         per AS (SELECT rk, CAST(count(*) AS DOUBLE) AS e_c FROM ec GROUP BY rk),
         mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM ec)
         SELECT CAST(mm.m AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS communities,
           round(sum(e_c / mm.m - (e_c / mm.m) * (e_c / mm.m)), 8) AS modularity
         FROM per CROSS JOIN mm GROUP BY mm.m""",
    "q_algo_pagerank_weighted" -> pageRankWeightedSql,
    "q_algo_ppr" -> pprSql,
    "q_algo_kcore" -> kCoreSql,
    "q_algo_labelprop" -> labelPropSql,
    "q_algo_ktruss" -> kTrussSql,
    // Windows are compared as raw strings here vs 64-bit hashes in the
    // engine (Decontaminate's documented stance: a collision over-marks
    // one position in 2^64).
    "q_dedup_spans" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
           wins AS (SELECT doc_id, array_to_string(tk[i+1:i+20], chr(1)) AS w
             FROM (SELECT doc_id, tk, unnest(range(0, greatest(len(tk)-19, 0))) AS i
                   FROM toks)),
           marks AS (SELECT w, (min(doc_id) <> max(doc_id)) AS dup FROM wins GROUP BY w),
           per AS (SELECT doc_id, count(*) AS nw,
                     sum(CASE WHEN dup THEN 1 ELSE 0 END) AS dw
                   FROM wins JOIN marks USING (w) GROUP BY doc_id)
         SELECT d.doc_id,
           CAST(coalesce(nw, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(dw, 0) AS BIGINT) AS dup_windows,
           round(coalesce(dw::DOUBLE / nullif(nw, 0), 0), 4) AS dup_frac
         FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""",
    // Replays Urls.canonicalize step for step (same RE2 patterns, same
    // order; DuckDB needs the explicit 'g' flag where Spark replaces all).
    "q_url_canonical" ->
      """WITH u AS (SELECT doc_id,
             'HTTPS://WWW.Example' || (doc_id % 7) || '.COM:443//Articles//P' ||
             (doc_id % 50) || '/?id=' || (doc_id % 25) ||
             '&utm_source=news&gclid=abc123#sec' || (doc_id % 5) AS url
           FROM documents),
           s1 AS (SELECT doc_id,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) ||
               regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS url FROM u),
           s2 AS (SELECT doc_id, regexp_replace(
             regexp_replace(url, '^(http://[^/?#]*):80([/?#]|$)', '\1\2'),
             '^(https://[^/?#]*):443([/?#]|$)', '\1\2') AS url FROM s1),
           s3 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS url FROM s2),
           s4 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(url, '&(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '', 'g'),
             '\?(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*&', '?'),
             '\?(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*$', ''),
             '[?&]$', '') AS url FROM s3),
           s5 AS (SELECT doc_id, regexp_replace(url, '([^:/])/{2,}', '\1/', 'g') AS url FROM s4),
           s6 AS (SELECT doc_id, regexp_replace(regexp_replace(url, '/\?', '?'), '/$', '') AS url FROM s5)
         SELECT min(doc_id) AS doc_id, url AS canonical,
           CAST(count(*) AS BIGINT) AS n_dups
         FROM s6 GROUP BY url""",
    // Two unrolled exact-integer HITS rounds over the same string-keyed
    // edge rebuild as the pageRank oracle.
    "q_algo_hits" ->
      """WITH nodes AS (
           SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS id FROM region
           UNION ALL SELECT 'n' || CAST(n_nationkey AS VARCHAR) FROM nation
           UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR) FROM customer
           UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR) FROM supplier
           UNION ALL SELECT 'o' || CAST(o_orderkey AS VARCHAR) FROM orders),
         edges AS (
           SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS src, 'r' || CAST(n_regionkey AS VARCHAR) AS dst FROM nation
           UNION ALL SELECT 'c' || CAST(c_custkey AS VARCHAR), 'n' || CAST(c_nationkey AS VARCHAR) FROM customer
           UNION ALL SELECT 's' || CAST(s_suppkey AS VARCHAR), 'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
           UNION ALL SELECT 'c' || CAST(o_custkey AS VARCHAR), 'o' || CAST(o_orderkey AS VARCHAR) FROM orders),
         h0 AS (SELECT id, 1::HUGEINT AS hub FROM nodes),
         a1 AS (SELECT e.dst AS id, sum(h0.hub) AS auth FROM edges e JOIN h0 ON h0.id = e.src GROUP BY 1),
         a1f AS (SELECT nodes.id, coalesce(a1.auth, 0) AS auth FROM nodes LEFT JOIN a1 USING (id)),
         h1 AS (SELECT e.src AS id, sum(a1f.auth) AS hub FROM edges e JOIN a1f ON a1f.id = e.dst GROUP BY 1),
         h1f AS (SELECT nodes.id, coalesce(h1.hub, 0) AS hub FROM nodes LEFT JOIN h1 USING (id)),
         a2 AS (SELECT e.dst AS id, sum(h1f.hub) AS auth FROM edges e JOIN h1f ON h1f.id = e.src GROUP BY 1),
         a2f AS (SELECT nodes.id, coalesce(a2.auth, 0) AS auth FROM nodes LEFT JOIN a2 USING (id)),
         h2 AS (SELECT e.src AS id, sum(a2f.auth) AS hub FROM edges e JOIN a2f ON a2f.id = e.dst GROUP BY 1),
         h2f AS (SELECT nodes.id, coalesce(h2.hub, 0) AS hub FROM nodes LEFT JOIN h2 USING (id))
         SELECT CAST(h2f.hub AS BIGINT) AS hub, CAST(a2f.auth AS BIGINT) AS auth,
           count(*) AS n
         FROM h2f JOIN a2f USING (id) GROUP BY 1, 2""",
    "q_quality_filter" ->
      """WITH b AS (SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) AS nw,
             length(regexp_replace(text, '\s+', '', 'g')) AS nonspace,
             len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                 x -> regexp_matches(x, '[A-Za-z]'))) AS alphaw,
             length(regexp_replace(text, '[^#]', '', 'g')) +
               len(regexp_extract_all(text, '\.\.\.')) AS sym,
             (CASE WHEN regexp_matches(lower(text), '(^|\s)the(\s|$)') THEN 1 ELSE 0 END +
              CASE WHEN regexp_matches(lower(text), '(^|\s)be(\s|$)') THEN 1 ELSE 0 END +
              CASE WHEN regexp_matches(lower(text), '(^|\s)to(\s|$)') THEN 1 ELSE 0 END +
              CASE WHEN regexp_matches(lower(text), '(^|\s)of(\s|$)') THEN 1 ELSE 0 END +
              CASE WHEN regexp_matches(lower(text), '(^|\s)and(\s|$)') THEN 1 ELSE 0 END +
              CASE WHEN regexp_matches(lower(text), '(^|\s)that(\s|$)') THEN 1 ELSE 0 END +
              CASE WHEN regexp_matches(lower(text), '(^|\s)have(\s|$)') THEN 1 ELSE 0 END +
              CASE WHEN regexp_matches(lower(text), '(^|\s)with(\s|$)') THEN 1 ELSE 0 END) AS sh
           FROM documents)
         SELECT doc_id,
           CAST(nw AS BIGINT) AS n_words,
           round(nonspace::DOUBLE / greatest(nw, 1), 4) AS mean_word_len,
           round(alphaw::DOUBLE / greatest(nw, 1), 4) AS alpha_frac,
           round(sym::DOUBLE / greatest(nw, 1), 4) AS symbol_ratio,
           CAST(sh AS BIGINT) AS stopword_hits,
           (nw BETWEEN 5 AND 100000
             AND nonspace::DOUBLE / greatest(nw, 1) BETWEEN 3.0 AND 10.0
             AND alphaw::DOUBLE / greatest(nw, 1) >= 0.7
             AND sym::DOUBLE / greatest(nw, 1) <= 0.1
             AND sh >= 2) AS keep
         FROM b""",
    "q_cluster_assign" ->
      """WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS c
             FROM embeddings WHERE vec_id < 8),
           sc AS (SELECT e.vec_id, cent.cid,
               list_dot_product(e.embedding::DOUBLE[], cent.c) /
                 (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(cent.c, cent.c))) AS cos
             FROM embeddings e CROSS JOIN cent)
         SELECT vec_id, CAST(cid AS BIGINT) AS cluster, round(cos, 4) AS cosine
         FROM (SELECT vec_id, cid, cos,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
               FROM sc) WHERE rn = 1""",
    "q_text_topngrams" ->
      """WITH toks AS (
           SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
           FROM documents),
         grams AS (
           SELECT array_to_string(t[ix.i:ix.i+2], ' ') AS gram
           FROM toks, LATERAL (
             SELECT unnest(range(1, len(t) - 1)) AS i) ix
           WHERE len(t) >= 3),
         counts AS (SELECT gram, count(*) AS freq FROM grams GROUP BY gram)
         SELECT CAST(row_number() OVER (ORDER BY freq DESC, gram) AS BIGINT) AS rank,
           gram, freq
         FROM counts ORDER BY freq DESC, gram LIMIT 20""",
    "q_text_zipf" ->
      """WITH toks AS (
           SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         counts AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok),
         stats AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size,
                          CAST(sum(freq) AS BIGINT) AS total_tokens FROM counts),
         top AS (SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, tok) AS DOUBLE)) AS x,
                        ln(CAST(freq AS DOUBLE)) AS y
                 FROM counts ORDER BY freq DESC, tok LIMIT 100),
         fit AS (SELECT CAST(count(*) AS DOUBLE) AS k, sum(x) AS sx,
                        sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
                 FROM top)
         SELECT vocab_size, total_tokens,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS zipf_slope
         FROM stats CROSS JOIN fit""",
    "q_text_bm25" ->
      """WITH toks AS (SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         qtf AS (SELECT doc_id, t, count(*) AS tf FROM toks
                 WHERE t IN ('spark', 'vector', 'customer') GROUP BY 1, 2),
         qdf AS (SELECT t, count(*) AS df FROM qtf GROUP BY 1)
         SELECT qtf.doc_id,
           round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1)
             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
         FROM qtf JOIN qdf USING (t) JOIN dl USING (doc_id)
         CROSS JOIN stats GROUP BY 1""",
    "q_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token FROM documents),
           tf AS (SELECT doc_id, token, count(*) AS tf FROM w GROUP BY 1, 2),
           dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
           nq AS (SELECT count(*) AS n FROM documents)
         SELECT doc_id, token, round(tfv, 4) AS tfidf, CAST(rank AS BIGINT) AS rank FROM (
           SELECT tf.doc_id, tf.token, tf.tf * ln(nq.n::DOUBLE / dfq.df) AS tfv,
             row_number() OVER (PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln(nq.n::DOUBLE / dfq.df) DESC, tf.token) AS rank
           FROM tf JOIN dfq USING (token) CROSS JOIN nq) x
         WHERE rank <= 3""",
    "q_chunk" ->
      """WITH s AS (SELECT doc_id, text,
             unnest(generate_series(0, greatest(length(text) - 1, 0)::BIGINT, 48)) AS start
           FROM documents)
         SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_no,
           CAST(start AS BIGINT) AS start, md5(substr(text, start + 1, 64)) AS chunk_md5
         FROM s""",
    "q_semdedup" ->
      """WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS c
             FROM embeddings WHERE vec_id < 8),
           sc AS (SELECT e.vec_id, cent.cid,
               list_dot_product(e.embedding::DOUBLE[], cent.c) /
                 (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(cent.c, cent.c))) AS cos
             FROM embeddings e CROSS JOIN cent),
           asg AS (SELECT vec_id, CAST(cid AS BIGINT) AS cluster
             FROM (SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
                   FROM sc) WHERE rn = 1),
           v AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
           drops AS (SELECT DISTINCT a.vec_id
             FROM asg a JOIN asg b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
             JOIN v va ON va.vec_id = a.vec_id
             JOIN v vb ON vb.vec_id = b.vec_id
             WHERE list_dot_product(va.vv, vb.vv) /
               (sqrt(list_dot_product(va.vv, va.vv)) *
                sqrt(list_dot_product(vb.vv, vb.vv))) >= 0.4)
         SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS keep
         FROM asg a LEFT JOIN drops d ON a.vec_id = d.vec_id""",
    "q_algo_neighborhood" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS u, l_partkey + 10000000 AS v
             FROM lineitem WHERE l_orderkey % 10 = 0),
           sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
           ball AS (
             SELECT u, v FROM sym
             UNION SELECT u, u FROM sym
             UNION SELECT a.u, b.v FROM sym a JOIN sym b ON a.v = b.u),
           sz AS (SELECT u, CAST(count(*) AS BIGINT) AS ball2 FROM ball GROUP BY u)
         SELECT ball2, count(*) AS n FROM sz GROUP BY 1""",
    "q_algo_neighborhood_hll" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_nodes, TRUE AS ok FROM (
           SELECT u AS x FROM (SELECT DISTINCT l_orderkey AS u, l_partkey + 10000000 AS v FROM lineitem) e
           UNION SELECT v FROM (SELECT DISTINCT l_orderkey AS u, l_partkey + 10000000 AS v FROM lineitem) e) t
         WHERE x % 97 = 0""",
    "q_decontaminate_frac" ->
      """WITH t AS (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS s FROM documents),
           g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(0, greatest(length(s)-20, 0)+1), i -> substr(s, i+1, 20)))) AS gram FROM t),
           corpus AS (SELECT doc_id, gram FROM g WHERE doc_id % 47 <> 0),
           probe AS (SELECT DISTINCT gram FROM g WHERE doc_id % 47 = 0),
           hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nh
             FROM corpus JOIN probe USING (gram) GROUP BY 1)
         SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(coalesce(max(h.nh), 0) AS BIGINT) AS n_hits,
           round(coalesce(max(h.nh), 0)::DOUBLE / count(*), 4) AS frac
         FROM corpus c LEFT JOIN hits h USING (doc_id)
         GROUP BY c.doc_id""",
    // Degree assortativity replay: all five moments exact in HUGEINT
    // (mirroring the engine's Decimal(38,0) sums), ONE floating-point
    // expression at the end -> bit-identical doubles on both sides.
    "q_algo_assortativity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           e AS (SELECT DISTINCT x.p AS a, y.p AS b FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p),
           sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
           deg AS (SELECT u AS id, count(*) AS d FROM sym GROUP BY u),
           pairs AS (SELECT da.d AS x, db.d AS y
             FROM sym JOIN deg da ON sym.u = da.id JOIN deg db ON sym.v = db.id),
           s AS (SELECT count(*)::HUGEINT AS n,
               sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
               sum(x*y)::HUGEINT AS sxy, sum(x*x)::HUGEINT AS sxx,
               sum(y*y)::HUGEINT AS syy FROM pairs)
         SELECT round(((n*sxy - sx*sy)::DOUBLE) /
             (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE)), 4)
           AS assortativity
         FROM s""",
    // Longest-path levels of the TPCH DAG, computed per node CLASS (the
    // class structure fixes each node's longest incoming path): customer
    // sources at 0, orders 1, lineitems 2, referenced parts/suppliers 3
    // (unreferenced 0), nations 1 + max over their customers (0) and
    // suppliers (3), regions 1 + max over their nations; node classes
    // with no incoming edge at all sit at 0.
    "q_algo_toposort" ->
      """WITH lvl AS (
           SELECT 0 AS level FROM customer
           UNION ALL SELECT 1 FROM orders
           UNION ALL SELECT 2 FROM lineitem
           UNION ALL SELECT CASE WHEN p_partkey IN (SELECT l_partkey FROM lineitem) THEN 3 ELSE 0 END FROM part
           UNION ALL SELECT CASE WHEN s_suppkey IN (SELECT l_suppkey FROM lineitem) THEN 3 ELSE 0 END FROM supplier
           UNION ALL SELECT 1 + greatest(
               CASE WHEN n_nationkey IN (SELECT c_nationkey FROM customer) THEN 0 ELSE -1 END,
               CASE WHEN n_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)) THEN 3
                    WHEN n_nationkey IN (SELECT s_nationkey FROM supplier) THEN 0 ELSE -1 END,
               -1) FROM nation
           UNION ALL SELECT 1 + coalesce((
               SELECT max(nl.lvl) FROM (
                 SELECT n_regionkey AS rk,
                   1 + greatest(
                     CASE WHEN n_nationkey IN (SELECT c_nationkey FROM customer) THEN 0 ELSE -1 END,
                     CASE WHEN n_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)) THEN 3
                          WHEN n_nationkey IN (SELECT s_nationkey FROM supplier) THEN 0 ELSE -1 END,
                     -1) AS lvl
                 FROM nation) nl WHERE nl.rk = r_regionkey), -1)
             FROM region)
         SELECT CAST(level AS BIGINT) AS level, count(*) AS n
         FROM lvl GROUP BY 1""",
    // The geography subgraph is a DAG: every node (all seven classes) is
    // a singleton SCC.
    "q_algo_scc" ->
      """SELECT CAST(1 AS BIGINT) AS sz,
           (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
           + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
           + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)
           + (SELECT count(*) FROM lineitem) AS n""",
    // Component-size histogram over IN_REGION + FROM_NATION edges: each
    // region anchors one component {region, its nations, their customers
    // and suppliers}; orders/lineitems/parts have no edge of these types
    // and are singletons.
    "q_algo_components" ->
      """WITH members AS (
           SELECT r_regionkey AS rk FROM region
           UNION ALL SELECT n_regionkey FROM nation
           UNION ALL SELECT n_regionkey FROM customer JOIN nation ON n_nationkey = c_nationkey
           UNION ALL SELECT n_regionkey FROM supplier JOIN nation ON n_nationkey = s_nationkey),
         comp AS (SELECT rk, count(*) AS sz FROM members GROUP BY rk),
         singles AS (SELECT (SELECT count(*) FROM orders) + (SELECT count(*) FROM lineitem)
                          + (SELECT count(*) FROM part) AS n1)
         SELECT sz, CAST(count(*) AS BIGINT) AS n_components FROM comp GROUP BY sz
         UNION ALL SELECT CAST(1 AS BIGINT) AS sz, n1 AS n_components FROM singles""",
    // Multimodal stub features are pure byte arithmetic over the utf-8
    // payload; documents are ASCII, so byte k == ascii(char k).
    "q_multimodal_features" ->
      """SELECT doc_id AS media_id,
           CAST(list_sum(bs) % 1920 + 1 AS INTEGER) AS width,
           CAST(list_sum(list_transform(range(1, length(text)+1), i -> i * ascii(text[i]))) % 1080 + 1 AS INTEGER) AS height,
           round(len(list_filter(bs, b -> b % 2 = 1))::DOUBLE / greatest(len(bs), 1), 4) AS f0
         FROM (SELECT doc_id, text,
                 list_transform(range(1, length(text)+1), i -> ascii(text[i])) AS bs
               FROM documents) t""",
    "q_multimodal_frames" ->
      """WITH n AS (SELECT doc_id, text,
           CAST(floor(length(text) / 64) AS INTEGER) AS nf FROM documents),
         f AS (SELECT doc_id, text, unnest(range(0, nf)) AS i
               FROM n WHERE nf >= 1)
         SELECT doc_id AS media_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
             AS BIGINT) AS frame_no,
           md5(substr(text, i * 64 + 1, 64)) AS frame_md5
         FROM f WHERE i % 2 = 0""",
    // Same normalization + 20-gram extraction as Decontaminate.flag; gram
    // equality replayed on the strings themselves (the engine compares
    // xxhash64 of the grams — collision-free at these cardinalities).
    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS s FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(0, greatest(length(s)-20, 0)+1), i -> substr(s, i+1, 20)))) AS gram FROM t),
         probe AS (SELECT DISTINCT gram FROM g WHERE doc_id % 47 = 0)
         SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_hits
         FROM g JOIN probe USING (gram) WHERE g.doc_id % 47 <> 0
         GROUP BY 1 HAVING count(DISTINCT g.gram) >= 1""",
    "q_dsir_weights" ->
      """WITH rawt AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ts FROM documents WHERE doc_id % 7 <> 0),
         tgtt AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ts FROM documents WHERE doc_id % 7 = 0),
         rg AS (SELECT doc_id, unnest(ts) AS g FROM rawt
                UNION ALL
                SELECT doc_id, unnest(list_transform(range(1, greatest(len(ts), 1)), i -> ts[i] || ' ' || ts[i+1])) AS g FROM rawt),
         tg AS (SELECT doc_id, unnest(ts) AS g FROM tgtt
                UNION ALL
                SELECT doc_id, unnest(list_transform(range(1, greatest(len(ts), 1)), i -> ts[i] || ' ' || ts[i+1])) AS g FROM tgtt),
         rc AS (SELECT g, count(*)::DOUBLE AS rc FROM rg GROUP BY 1),
         tc AS (SELECT g, count(*)::DOUBLE AS tc FROM tg GROUP BY 1),
         tot AS (SELECT (SELECT sum(rc) FROM rc) AS rtot,
                        (SELECT count(*) FROM rc)::DOUBLE AS v,
                        coalesce((SELECT sum(tc) FROM tc), 0) AS ttot),
         w AS (SELECT rc.g,
                 ln((coalesce(tc.tc, 0) + 0.5) / (tot.ttot + 0.5 * tot.v)) -
                 ln((rc.rc + 0.5) / (tot.rtot + 0.5 * tot.v)) AS w
               FROM rc LEFT JOIN tc USING (g), tot)
         SELECT rg.doc_id, round(sum(w.w), 6) AS dsir_weight
         FROM rg JOIN w ON rg.g = w.g GROUP BY 1""",
    "q_dsir_sample" ->
      """WITH rawt AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ts FROM documents WHERE doc_id % 7 <> 0),
         tgtt AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ts FROM documents WHERE doc_id % 7 = 0),
         rg AS (SELECT doc_id, unnest(ts) AS g FROM rawt
                UNION ALL
                SELECT doc_id, unnest(list_transform(range(1, greatest(len(ts), 1)), i -> ts[i] || ' ' || ts[i+1])) AS g FROM rawt),
         tg AS (SELECT doc_id, unnest(ts) AS g FROM tgtt
                UNION ALL
                SELECT doc_id, unnest(list_transform(range(1, greatest(len(ts), 1)), i -> ts[i] || ' ' || ts[i+1])) AS g FROM tgtt),
         rc AS (SELECT g, count(*)::DOUBLE AS rc FROM rg GROUP BY 1),
         tc AS (SELECT g, count(*)::DOUBLE AS tc FROM tg GROUP BY 1),
         tot AS (SELECT (SELECT sum(rc) FROM rc) AS rtot,
                        (SELECT count(*) FROM rc)::DOUBLE AS v,
                        coalesce((SELECT sum(tc) FROM tc), 0) AS ttot),
         w AS (SELECT rc.g,
                 ln((coalesce(tc.tc, 0) + 0.5) / (tot.ttot + 0.5 * tot.v)) -
                 ln((rc.rc + 0.5) / (tot.rtot + 0.5 * tot.v)) AS w
               FROM rc LEFT JOIN tc USING (g), tot),
         dw AS (SELECT rg.doc_id, round(sum(w.w), 6) AS dsir_weight
                FROM rg JOIN w ON rg.g = w.g GROUP BY 1)
         SELECT doc_id, dsir_weight FROM (
           SELECT doc_id, dsir_weight,
             round(dsir_weight - ln(-ln((((doc_id * 1103515245 + 12345) % 2048)::DOUBLE + 0.5) / 2048.0)), 6) AS key
           FROM dw) t
         ORDER BY key DESC, doc_id LIMIT 50""",
    "q_epoch_mix" ->
      """SELECT doc_id, source, unnest(range(reps)) AS epoch FROM (
           SELECT doc_id, source,
             (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END
              + CASE WHEN (doc_id * 1103515245 + 12345) % 2048 <
                  (CASE source WHEN 'src0' THEN 1024 ELSE 0 END)
                THEN 1 ELSE 0 END) AS reps
           FROM documents) t""",
    "q_sample_hash" ->
      "SELECT doc_id, lang FROM documents WHERE (doc_id * 1103515245 + 12345) % 2048 < 204",
    "q_sample_stratified" ->
      """SELECT lang, doc_id FROM (
           SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
             ORDER BY (doc_id * 1103515245 + 12345) % 2048, doc_id) AS rk
           FROM documents) t WHERE rk <= 5""",
    "q_sample_weighted" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
             round(ln((((doc_id * 1103515245 + 12345) % 2048)::DOUBLE + 0.5)
               / 2048.0) / length(text), 8) AS key
           FROM documents) t
         ORDER BY key DESC, doc_id LIMIT 50""",
    "q_domain_mix" ->
      """SELECT source, count(*) AS n,
           round(count(*)::DOUBLE / (SELECT count(*) FROM documents), 4) AS frac
         FROM documents GROUP BY source""",
    "q_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
           t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot, sum(pow(n, 0.5)) AS z FROM c),
           tg AS (SELECT source,
               least(n, CAST(floor(round(tot * pow(n, 0.5) / z, 6)) AS BIGINT)) AS target
             FROM c CROSS JOIN t),
           r AS (SELECT d.doc_id, d.source, tg.target,
               row_number() OVER (PARTITION BY d.source
                 ORDER BY (d.doc_id * 1103515245 + 12345) % 2048, d.doc_id) AS rk
             FROM documents d JOIN tg USING (source))
         SELECT doc_id, source, target AS source_target FROM r WHERE rk <= target""",
    "q_pack_budget" ->
      """SELECT doc_id, n_tok,
           CAST(floor((sum(n_tok) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
             / 5000) AS BIGINT) AS shard
         FROM (SELECT doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]'))
                 AS n_tok FROM documents) t""",
    "q_dedup_exact" ->
      "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
    "q_dedup_minhash" -> trueNearDupSql(0.7),
    "q_dedup_simhash" ->
      s"SELECT count(*) AS n_true, TRUE AS ok FROM (${trueNearDupSql(0.7)}) t",
    "q_dedup_embedding_lsh" ->
      """SELECT count(*) AS n_true, TRUE AS ok FROM (
           SELECT 1 FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE a.vec_id < 200 AND b.vec_id < 200
             AND list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.35) t""",
    "q_sim_lsh" ->
      """SELECT count(*) AS k, TRUE AS top1_ok, TRUE AS ok FROM (
           SELECT e.vec_id FROM embeddings e WHERE e.vec_id <> 0
           ORDER BY (SELECT list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])))
             FROM embeddings q WHERE q.vec_id = 0) DESC, e.vec_id
           LIMIT 10) t""",
    "q_sim_ivf" ->
      """SELECT count(*) AS k, TRUE AS top1_ok, TRUE AS ok FROM (
           SELECT e.vec_id FROM embeddings e WHERE e.vec_id <> 0
           ORDER BY (SELECT list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])))
             FROM embeddings q WHERE q.vec_id = 0) DESC, e.vec_id
           LIMIT 10) t""",
    "q_dedup_canonical" ->
      "SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS canonical FROM documents",
    "q_dedup_jaccard" ->
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
           round(len(list_intersect(a.toks, b.toks))::DOUBLE /
             (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) AS jaccard
         FROM (SELECT doc_id, list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) toks FROM documents WHERE doc_id < 100) a
         JOIN (SELECT doc_id, list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) toks FROM documents WHERE doc_id < 100) b
           ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8""",
    "q_dedup_embedding" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cosine
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE a.vec_id < 200 AND b.vec_id < 200
           AND list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.35""",
    "q_hybrid_rrf" ->
      """WITH dense AS (
           SELECT e.vec_id AS id, row_number() OVER (ORDER BY
               list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))) DESC,
               e.vec_id) AS r
           FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
           WHERE e.vec_id <> 0 ORDER BY r LIMIT 20),
         toks AS (SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
           FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         qtf AS (SELECT doc_id, t, count(*) AS tf FROM toks
                 WHERE t IN ('spark', 'vector', 'customer') GROUP BY 1, 2),
         qdf AS (SELECT t, count(*) AS df FROM qtf GROUP BY 1),
         bm AS (SELECT qtf.doc_id,
             round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
           FROM qtf JOIN qdf USING (t) JOIN dl USING (doc_id)
           CROSS JOIN stats GROUP BY 1),
         lex AS (SELECT doc_id AS id, row_number() OVER
             (ORDER BY score DESC, doc_id) AS r
           FROM bm ORDER BY r LIMIT 20),
         u AS (SELECT id, 1.0 / (60 + r) AS rr FROM dense
               UNION ALL SELECT id, 1.0 / (60 + r) AS rr FROM lex)
         SELECT id, round(sum(rr), 6) AS fused FROM u GROUP BY 1
         ORDER BY fused DESC, id LIMIT 15""",
    "q_sim_bruteforce" ->
      """SELECT e.vec_id AS vec_id,
           round(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
              sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))), 4) AS cosine
         FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         WHERE e.vec_id <> 0
         ORDER BY list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
              sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))) DESC, e.vec_id
         LIMIT 10""",
    // Exact kNN join (nProbe = nCells): per-query top-5 by (cosine DESC,
    // neighbor id ASC) replayed as a window rank over the cross product.
    "q_knn_join" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
         c AS (SELECT vec_id AS n_id, embedding FROM embeddings WHERE vec_id % 50 <> 0),
         s AS (SELECT q.q_id, c.n_id,
             list_dot_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
                sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))) AS cos
           FROM q, c),
         r AS (SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
           FROM s)
         SELECT q_id, n_id, round(cos, 4) AS cosine, CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 5""",
    // The recall gate is a 1-row summary; the oracle replays only the
    // exact pair count (the >= 80% verdict is the Spark side's claim and
    // must come back TRUE for the hash to match).
    "q_knn_join_recall" ->
      """SELECT count(*) AS n_pairs, TRUE AS ok FROM (
           WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
           c AS (SELECT vec_id AS n_id, embedding FROM embeddings WHERE vec_id % 50 <> 0),
           s AS (SELECT q.q_id, c.n_id,
               list_dot_product(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))) AS cos
             FROM q, c)
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
           FROM s QUALIFY rank <= 5) t""",
    "q_text_stats" ->
      """SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           round(length(text)::DOUBLE / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 4) AS avg_token_len,
           round(length(regexp_replace(text, '[\w\s]', '', 'g'))::DOUBLE / greatest(length(text), 1), 4) AS punct_ratio,
           round(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / greatest(length(text), 1), 4) AS digit_ratio,
           round(length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE / greatest(length(text), 1), 4) AS upper_ratio
         FROM documents""",
    "q_token_count" ->
      """SELECT doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tok FROM documents""",
    "q_lang_id" ->
      """SELECT doc_id, CASE
           WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
           WHEN regexp_matches(text, '(^|\s)(the|and|of|with|is)(\s|$)') THEN 'en'
           WHEN regexp_matches(text, '(^|\s)(der|und|die|das|mit)(\s|$)') THEN 'de'
           WHEN regexp_matches(text, '(^|\s)(le|la|et|les|des)(\s|$)') THEN 'fr'
           WHEN regexp_matches(text, '(^|\s)(el|los|las|es|una)(\s|$)') THEN 'es'
           ELSE 'und' END AS lang_pred
         FROM documents""",
    "q_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp FROM documents""",
    "q_surprisal" ->
      """WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok FROM documents),
         c AS (SELECT tok, count(*) AS n FROM w GROUP BY 1),
         t AS (SELECT count(*) AS total FROM w)
         SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(c.n::DOUBLE / t.total)), 4) AS avg_surprisal
         FROM w JOIN c USING (tok) CROSS JOIN t
         GROUP BY w.doc_id""",
    "q_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS s FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(0, greatest(length(s)-20, 0)+1), i -> substr(s, i+1, 20)))) AS gram FROM t),
         f AS (SELECT gram, min(doc_id) AS first FROM g GROUP BY 1)
         SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE f.first = g.doc_id) AS BIGINT) AS n_novel,
           round(count(*) FILTER (WHERE f.first = g.doc_id) / CAST(count(*) AS DOUBLE), 4) AS novelty
         FROM g JOIN f USING (gram) GROUP BY 1""",
    "q_pii_flag" ->
      ("WITH d AS (" + plantedPiiSql + ") " +
        """SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
           len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
           len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn
         FROM d"""),
    "q_pii_scrub" ->
      ("WITH d AS (" + plantedPiiSql + ") " +
        """SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
             + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
             + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS n_redacted,
           md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[PII]', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PII]', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[PII]', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '[PII]', 'g')) AS scrub_hash
         FROM d"""),
    "q_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents),
         wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
         a AS (SELECT doc_id, sum(c) AS n, count(*) AS nd, max(c) AS mx FROM wc GROUP BY 1)
         SELECT doc_id, CAST(n AS BIGINT) AS n_words,
           round(1 - nd / CAST(n AS DOUBLE), 4) AS dup_word_frac,
           round(mx / CAST(n AS DOUBLE), 4) AS top_word_frac
         FROM a""",
    "q_repetition_ngram" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         i AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS idx FROM d WHERE len(ws) >= 2),
         g AS (SELECT doc_id, len(ws) AS nw, ws[idx] || ' ' || ws[idx + 1] AS gram FROM i),
         gc AS (SELECT doc_id, nw, gram, count(*) AS c FROM g GROUP BY 1, 2, 3)
         SELECT doc_id, nw AS n_words,
           round(max(c) * 2.0 / nw, 4) AS top_ngram_frac
         FROM gc GROUP BY 1, 2""",
    "q_line_scrub" ->
      """WITH d AS (SELECT doc_id, text || chr(10) || '(c) corpus boilerplate footer' || chr(10) || 'unique line ' || doc_id AS t FROM documents),
         l AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM d),
         c AS (SELECT line, count(*) AS lc FROM l GROUP BY 1)
         SELECT l.doc_id AS doc_id,
           count(*) FILTER (WHERE c.lc >= 10) AS n_scrubbed,
           md5(string_agg(CASE WHEN c.lc < 10 THEN l.line END, chr(10) ORDER BY l.line)) AS kept_hash
         FROM l JOIN c USING (line)
         GROUP BY 1""",
    // Engine windows travel as xxhash64 with min(struct) keeper marking;
    // the oracle replays over raw window strings with first-occurrence
    // window functions (the engine shape avoids global windows on purpose).
    "q_span_scrub" ->
      """WITH toks0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
           tokv AS (SELECT doc_id, unnest(range(0, len(tk))) AS pos, tk FROM toks0),
           tok AS (SELECT doc_id, pos, tk[pos+1] AS tok FROM tokv),
           wins AS (SELECT doc_id, unnest(range(0, greatest(len(tk)-19, 0))) AS i, tk FROM toks0),
           w AS (SELECT doc_id, i, array_to_string(tk[i+1:i+20], chr(1)) AS wn FROM wins),
           marked AS (SELECT doc_id, i,
               row_number() OVER (PARTITION BY wn ORDER BY doc_id, i) AS rn,
               count(*) OVER (PARTITION BY wn) AS occ
             FROM w),
           cov AS (SELECT DISTINCT doc_id, i + u.p AS pos
             FROM marked, unnest(range(0, 20)) AS u(p)
             WHERE occ > 1 AND rn > 1),
           kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
             LEFT JOIN cov ON cov.doc_id = t.doc_id AND cov.pos = t.pos
             WHERE cov.pos IS NULL),
           agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt
             FROM kept GROUP BY 1),
           rem AS (SELECT doc_id, count(*) AS nr FROM cov GROUP BY 1)
         SELECT d.doc_id,
           CAST(coalesce(rem.nr, 0) AS BIGINT) AS n_removed,
           md5(coalesce(agg.txt, '')) AS kept_hash
         FROM documents d
         LEFT JOIN agg ON agg.doc_id = d.doc_id
         LEFT JOIN rem ON rem.doc_id = d.doc_id""",
    // Engine keys paragraphs by xxhash64 and takes min(struct) per hash;
    // the oracle replays over raw strings with a first-occurrence window
    // (the engine shape avoids the global window on purpose).
    "q_para_dedup" ->
      """WITH d AS (SELECT doc_id, text || chr(10) || '(c) corpus boilerplate footer' || chr(10) || 'unique line ' || doc_id AS t FROM documents),
           l0 AS (SELECT doc_id, string_split(t, chr(10)) AS lines FROM d),
           l AS (SELECT doc_id, unnest(range(1, len(lines) + 1)) AS i, lines FROM l0),
           p AS (SELECT doc_id, i, lines[i] AS para FROM l),
           k AS (SELECT doc_id, i, para,
                   row_number() OVER (PARTITION BY para ORDER BY doc_id, i) AS rn
                 FROM p)
         SELECT doc_id,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN para END, chr(10) ORDER BY i), '')) AS kept_hash
         FROM k GROUP BY 1""",
    "q_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n,
           round(sum(value), 4) AS sv
         FROM events GROUP BY 1, 2""",
    "q_events_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS n
         FROM events GROUP BY 1""",
    "q_stream_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
           count(*) AS n, round(sum(value), 4) AS total
         FROM events GROUP BY 1, 2""",
    "q_stream_interval_join" ->
      """SELECT l.event_id AS view_id, r.event_id AS click_id
         FROM events l JOIN events r ON l.user_id = r.user_id
         WHERE l.event_type = 'view' AND r.event_type = 'click'
           AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR""",
    // Only the two on-time slices (the newest 3 hour-aligned hours): if the
    // watermark failed to discard the third (older) micro-batch, the
    // streaming side would aggregate every event and mismatch on rows,
    // counts and sums.
    "q_stream_late_drop" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
           count(*) AS n, round(sum(value), 4) AS total
         FROM events
         WHERE ts >= (SELECT date_trunc('hour', max(ts)) - INTERVAL 3 HOUR
                      FROM events)
         GROUP BY 1, 2""",
    // Every view appears exactly once per matching click, or once
    // null-padded if no click follows within the hour — the watermark
    // probe guarantees every unmatched view's state expired and emitted.
    "q_stream_outer_join" ->
      """SELECT l.event_id AS view_id, r.event_id AS click_id
         FROM (SELECT * FROM events WHERE event_type = 'view') l
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
           ON l.user_id = r.user_id
          AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR""",
    // All gap-based sessions (including each user's last — the probe
    // closed them), keyed by session start. Boundary rule MEASURED and
    // unit-pinned (StreamingSpec "session_window MERGES on an EXACT-gap
    // boundary"; ADVICE r13): Spark merges an event at exactly
    // prev + gap into the running session, so the replay's split is
    // STRICT `diff > gap` — ties merge, matching Spark exactly.
    "q_stream_session_window" ->
      """WITH x AS (SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 43200000000
                  THEN 1 ELSE 0 END AS ns
           FROM events),
         y AS (SELECT user_id, ts, value,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
           FROM x)
         SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS start_ts,
           count(*) AS n_events, round(sum(value), 4) AS tv
         FROM y GROUP BY user_id, sid""",
    "q_stream_enrich" ->
      """SELECT c.c_mktsegment, e.event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 4) AS sv
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1, 2""",
    // The streaming side ingested every event TWICE; equality with the
    // single-copy aggregation proves the dedup state dropped each copy.
    "q_stream_dedup" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sv
         FROM events GROUP BY 1""",
    // Within-watermark copies (batch 1, doubled) dedup to one; the same
    // keys re-ingested after state expiry (batch 3) re-emit — so every
    // event surfaces EXACTLY twice: one histogram row, value-checksummed.
    "q_stream_dedup_wm" ->
      """WITH p AS (SELECT event_id, round(2 * sum(value), 4) AS sv2
           FROM events GROUP BY 1)
         SELECT CAST(2 AS BIGINT) AS n_emits, CAST(count(*) AS BIGINT) AS n_ids,
           round(sum(sv2), 4) AS sv FROM p""",
    "q_stream_sessionize" ->
      """WITH x AS (SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 43200000000
                  THEN 1 ELSE 0 END AS ns
           FROM events),
         y AS (SELECT user_id, ts, value,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
           FROM x),
         sess AS (SELECT user_id, sid, CAST(min(ts) AS TIMESTAMP) AS start_ts,
             CAST(max(ts) AS TIMESTAMP) AS end_ts,
             count(*) AS n_events, round(sum(value), 4) AS tv
           FROM y GROUP BY 1, 2)
         SELECT user_id, start_ts, end_ts, n_events, tv FROM sess s
         WHERE sid < (SELECT max(sid) FROM sess s2 WHERE s2.user_id = s.user_id)""",
    // DuckDB's native ASOF JOIN is the independent formulation of the
    // engine's union-sweep window (inclusive: v.ts <= c.ts). The data has
    // no duplicate (user_id, ts), so the match is unique and event_id-
    // deterministic on both sides.
    "q_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
         SELECT c.event_id AS click_id, v.event_id AS view_id, v.ts AS view_ts
         FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts""",
    "q_sessionize" ->
      """WITH x AS (SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 43200000000
                  THEN 1 ELSE 0 END AS ns
           FROM events),
         y AS (SELECT user_id, ts, value,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
           FROM x)
         SELECT user_id, min(ts) AS session_start,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
           CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS tv
         FROM y GROUP BY user_id, sid""",
    "q_algo_harmonic" ->
      """WITH k AS (SELECT n_regionkey AS rk, count(*) AS kk FROM nation GROUP BY 1),
         rows_ AS (
           SELECT round(1.0 + (kk - 1) / 2.0, 4) AS h, CAST(kk AS BIGINT) AS n FROM k
           UNION ALL SELECT round(CAST(kk AS DOUBLE), 4) AS h, CAST(1 AS BIGINT) FROM k
           UNION ALL SELECT 0.0 AS h,
             (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
             + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)
             + (SELECT count(*) FROM lineitem)
             + (SELECT count(*) FROM region) - (SELECT count(*) FROM k))
         SELECT h, CAST(sum(n) AS BIGINT) AS n FROM rows_ GROUP BY 1""",
    // Weighted SSSP histogram replay: bounded-depth recursive walk over
    // the string-keyed edge rebuild (same trick as q_call_degrees), then
    // min distance per node. The 30.0 bound only prunes non-shortest
    // walks — the true farthest node sits at 23 (verified; worst-case
    // bound over this topology is <= 25), so no shortest path is cut.
    "q_algo_sssp" ->
      """WITH RECURSIVE
           li AS (SELECT row_number() OVER () AS lid, l_orderkey, l_partkey, l_suppkey FROM lineitem),
           e0 AS (
             SELECT 'n' || n_nationkey AS src, 'r' || n_regionkey AS dst, 1.0 AS w FROM nation
             UNION ALL SELECT 'c' || c_custkey, 'n' || c_nationkey, 2.0 FROM customer
             UNION ALL SELECT 's' || s_suppkey, 'n' || s_nationkey, 2.0 FROM supplier
             UNION ALL SELECT 'c' || o_custkey, 'o' || o_orderkey, 3.0 FROM orders
             UNION ALL SELECT 'o' || l_orderkey, 'l' || lid, 4.0 FROM li
             UNION ALL SELECT 'l' || lid, 'p' || l_partkey, 5.0 FROM li
             UNION ALL SELECT 'l' || lid, 's' || l_suppkey, 6.0 FROM li),
           und AS (SELECT src, dst, CAST(w AS DOUBLE) AS w FROM e0
                   UNION ALL SELECT dst, src, CAST(w AS DOUBLE) FROM e0),
           walk(node, d) AS (
             SELECT 'r0', CAST(0 AS DOUBLE)
             UNION
             SELECT u.dst, walk.d + u.w FROM walk JOIN und u ON u.src = walk.node
             WHERE walk.d + u.w < 30.0)
         SELECT CAST(d AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n
         FROM (SELECT node, min(d) AS d FROM walk GROUP BY node) t GROUP BY 1""",
    "q_algo_triangles" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           e AS (SELECT DISTINCT x.p AS a, y.p AS b FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p)
         SELECT CAST(count(*) AS BIGINT) AS triangles
         FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                   JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b""")
}
