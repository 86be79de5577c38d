package graft

import graft.pipeline.{Decontaminate, Dedup, Multimodal, Pack, Sampling, Scrub, Similarity, Temporal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Correctness tests for the pipeline operators whose outputs the DuckDB
  * oracle cannot express (hash-based LSH, stubs): planted near-duplicates
  * must be found, LSH recall must track brute force. */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "in the warm afternoon sun near the old wooden fence"

  lazy val docs = Seq(
    (0L, base),
    (1L, base.replace("lazy", "sleepy")), // near-dup of 0
    (2L, base),                           // exact dup of 0
    (3L, "completely different content about spark dataframes and " +
      "catalyst optimizer rules for distributed query planning"),
    (4L, "yet another unrelated document mentioning minhash locality " +
      "sensitive hashing and jaccard similarity estimation at scale"),
    (5L, base.replace("fox", "wolf").replace("dog", "hound")) // near-dup
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per key") {
    val ids = Dedup.exactIds(docs, "doc_id", Seq("text"))
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(0L, 1L, 3L, 4L, 5L)) // 2 collapsed into 0
    val rows = Dedup.exact(docs, "doc_id", Seq("text"))
    assert(rows.count() === 5)
    assert(rows.columns.toSeq === Seq("doc_id", "text"))
  }

  test("minhash LSH finds planted near-duplicates, skips unrelated") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)), "exact dup must be found")
    assert(pairs.contains((0L, 1L)), "near dup must be found")
    assert(!pairs.contains((3L, 4L)), "unrelated docs must not pair")
  }

  test("minhash LSH works under ANSI mode (xxhash64 derivation fallback)") {
    // r13: the multiply-add hash family wraps longs deliberately and
    // raises ARITHMETIC_OVERFLOW under Spark's default ANSI mode; ANSI
    // sessions must take the xxhash64 derivation and still pass the
    // planted-near-dup recall shape above.
    val key = "spark.sql.ansi.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "true")
    try {
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
          numHashes = 64, bands = 16, shingleSize = 5, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((0L, 2L)), "exact dup must be found under ANSI")
      assert(pairs.contains((0L, 5L)) || pairs.contains((2L, 5L)),
        "near-dup must be found under ANSI")
    } finally spark.conf.set(key, old)
  }

  test("minhash LSH hot-bucket guard bounds the pair blowup from a mega-cluster") {
    // 60 identical boilerplate docs (the web-corpus mega-cluster) would
    // emit C(60,2)=1770 pairs through ONE bucket per band; with the cap at
    // 50 every one of its buckets is hot, so the cluster emits ZERO pairs
    // while the unrelated planted near-dup pair still surfaces through its
    // own (cold) buckets.
    val boiler = (100L until 160L).map(i => (i, "standard cookie consent " +
      "banner text that appears verbatim on every single page of the site"))
    val planted = Seq(
      (1L, base), (2L, base.replace("lazy", "sleepy")),
      (3L, "entirely unrelated article about distributed join strategies"))
    val df = (boiler ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(df, "doc_id", "text", threshold = 0.4,
        maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)), s"got $pairs")
    // the drop figure the guard logs: one hot bucket per band, 60 rows each
    val banded = Dedup.minhashSignatures(df, "doc_id", "text", 64, 5)
      .select(col("_mh_id"),
        posexplode(transform(sequence(lit(0), lit(15)),
          j => xxhash64(slice(col("_mh_sig"), j * 4 + 1, lit(4)), j))))
    val (_, (nHot, hotRows)) = Dedup.splitHotBuckets(
      banded, Seq("pos", "col"), maxBucketSize = 50)
    assert(nHot === 16L, s"one hot bucket per band, got $nHot")
    assert(hotRows === 16L * 60L)
    // without the guard the mega-cluster pairs quadratically
    val unguarded = Dedup.minhashLsh(df, "doc_id", "text", threshold = 0.4)
      .count()
    assert(unguarded === 1770L + 1L)
  }

  test("minhash estimate approximates true jaccard") {
    val est = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.0)
      .filter(col("id1") === 0 && col("id2") === 2)
      .collect().head.getDouble(2)
    assert(est === 1.0, "identical docs estimate 1.0")
  }

  test("simhash pairs exact and near duplicates") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((3L, 4L)))
  }

  test("ngram jaccard exact pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)))
  }

  test("LSH top-k recall tracks brute force") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val vecs = (0L until 200L).map { i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val query = (0 until dim).map(_ => rnd.nextGaussian())
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(vecs, "vec_id", "embedding", query, 10,
        bands = 48, bitsPerBand = 5)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"LSH recall too low: $recall")
  }

  test("IVF top-k recall tracks brute force") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    val vecs = (0L until 300L).map { i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val query = (0 until dim).map(_ => rnd.nextGaussian())
    val exact = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = Similarity.buildIvf(vecs, "vec_id", "embedding", nCells = 6)
    val approx = idx.search(query, 10, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("stored IVF index: second load probes without rebuilding") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val vecs = (0L until 200L).map { i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    withSQLConf("spark.graft.ivf.indexDir" -> tmp) {
      val query = (0 until dim).map(_ => rnd.nextGaussian())
      val built = Similarity.loadOrBuildIvf(vecs, "k1", "vec_id", "embedding",
        nCells = 4)
      val r1 = built.search(query, 5, nProbe = 2).collect().map(_.getLong(0)).toSeq
      val marker = new java.io.File(s"$tmp").listFiles.head.listFiles
        .filter(_.getName == "_INDEXED").head
      val builtAt = marker.lastModified()
      // Second call over the same dataset fingerprint-matches and must take
      // the load path: same centroids, same results, nothing rewritten.
      val loaded = Similarity.loadOrBuildIvf(vecs, "k1", "vec_id", "embedding",
        nCells = 4)
      val r2 = loaded.search(query, 5, nProbe = 2).collect().map(_.getLong(0)).toSeq
      assert(r1 === r2)
      assert(loaded.centers.length === 4)
      assert(marker.lastModified() === builtAt,
        "load path must not rewrite the index")
      // The stored layout is partitioned by cell (file-level probe pruning).
      val cellDirs = new java.io.File(s"$tmp").listFiles.head.listFiles
        .filter(_.getName == "cells").head.listFiles
        .count(_.getName.startsWith("_ivf_cell="))
      assert(cellDirs === 4, s"expected 4 cell partitions, got $cellDirs")
      // A grown dataset fingerprint-mismatches: the stale on-disk index is
      // rebuilt and the new row becomes searchable (an exact-match query
      // must return it first).
      val grown = vecs.union(
        Seq((999L, query.map(_.toFloat))).toDF("vec_id", "embedding"))
      val rebuilt = Similarity.loadOrBuildIvf(grown, "k1", "vec_id",
        "embedding", nCells = 4)
      val top = rebuilt.search(query, 1, nProbe = 2).collect().head.getLong(0)
      assert(top === 999L, "stale index served after the dataset changed")
    }
  }

  test("cosine of identical vectors is 1") {
    val v = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val c = v.select(Similarity.cosine(col("embedding"), col("embedding")))
      .collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-9)
  }

  test("text stats are sane") {
    val row = TextAnalysis.stats(docs.filter(col("doc_id") === 0),
      "doc_id", "text").collect().head
    assert(row.getAs[Long]("n_chars") === base.length.toLong)
    assert(row.getAs[Long]("n_tokens") === base.split("\\s+").length.toLong)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val d = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val fps = d.select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("language id picks marker-matched language") {
    val d = Seq((1L, "the cat and the dog"), (2L, "der Hund und die Katze"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), TextAnalysis.languageId(col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "de")
    assert(got(3L) === "und")
  }

  test("canonicalize collapses transitive near-dup chains to min id") {
    import spark.implicits._
    // Pair graph 1-2, 2-3 (no direct 1-3 pair) plus singleton 4: the
    // cluster must close transitively, which a per-pair min cannot do.
    val ids = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val got = Dedup.canonicalize(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("epochMix repeats by floor plus deterministic fraction; factor 0 drops") {
    import spark.implicits._
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "src")
    val out = Sampling.epochMix(d, "src", "doc_id",
        Map("a" -> 2.0, "b" -> 0.0), defaultFactor = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // a-docs exactly twice (epochs 0,1), b dropped, c once
    assert(out.toSet === Set((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L), (4L, 0L)))
    // fractional factor: repeat count is floor or floor+1, deterministic
    val frac = Sampling.epochMix(d, "src", "doc_id", Map("a" -> 1.5))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L).forall(id => frac(id) == 1L || frac(id) == 2L))
    val again = Sampling.epochMix(d, "src", "doc_id", Map("a" -> 1.5))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frac === again) // reproducible
  }

  test("dsir: target-like raw docs outrank off-target docs; resample is a raw subset") {
    import spark.implicits._
    // target corpus is "cats": raw docs about cats must score higher than
    // raw docs about bolts (their grams are frequent in target, rare for
    // bolts), and the Gumbel top-k must select only raw ids.
    val target = Seq((100L, "the cat sat on the mat"),
      (101L, "a cat and another cat on a mat")).toDF("doc_id", "text")
    val raw = Seq((1L, "the cat sat on the mat today"),
      (2L, "cat on a mat"),
      (3L, "torque bolts with hex wrench sizes"),
      (4L, "wrench torque spec for hex bolts")).toDF("doc_id", "text")
    val w = Sampling.dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet === Set(1L, 2L, 3L, 4L))
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)))
    val picked = Sampling.dsirResample(raw, target, "doc_id", "text", k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(picked.size === 2 && picked.subsetOf(Set(1L, 2L, 3L, 4L)))
  }

  test("canonicalize: diameter-40 pair chain closes in O(log n) rounds") {
    import spark.implicits._
    // A chain of 40 near-dup pairs (diameter 40) — per-hop
    // min-propagation needed 40 rounds and silently returned wrong
    // canonical ids past the cap of 20; the star-contraction delegate
    // closes it inside 7 rounds (and throws, never truncates, at a
    // genuinely too-small cap).
    val ids = (1L to 41L).toDF("doc_id")
    val pairs = (1L to 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.canonicalize(ids, pairs, maxIterations = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === (1L to 41L).toSet)
    assert(got.values.toSet === Set(1L))
    val ex = intercept[IllegalStateException] {
      Dedup.canonicalize(ids, pairs, maxIterations = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("decontamination flags gram overlap with probes, scrub removes it") {
    // probe = doc 0; docs 1/2/5 share 20-char grams with it, 3/4 do not
    val probes = docs.filter(col("doc_id") === 0)
    val corpus = docs.filter(col("doc_id") =!= 0)
    val flagged = Decontaminate.flag(corpus, probes, "doc_id", "text", n = 20)
      .collect().map(_.getLong(0)).toSet
    assert(flagged.contains(1L) && flagged.contains(2L))
    assert(!flagged.contains(3L) && !flagged.contains(4L))
    val clean = Decontaminate.scrub(corpus, probes, "doc_id", "text", n = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean.intersect(flagged).isEmpty)
    assert(clean.contains(3L) && clean.contains(4L))
    // exact dup of the probe has the most contaminated grams
    val hits = Decontaminate.flag(corpus, probes, "doc_id", "text", n = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(2L) >= hits(1L))
  }

  test("decontamination plan broadcasts the probe side, never the corpus") {
    val probes = docs.filter(col("doc_id") === 0)
    val corpus = docs.filter(col("doc_id") =!= 0)
    val plan = Decontaminate.flag(corpus, probes, "doc_id", "text", n = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"probe side should broadcast:\n$plan")
    // the corpus-sized side must not be the build/broadcast side: the only
    // corpus shuffle allowed is the id repartition + hit-count aggregation
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the probe join:\n$plan")
  }

  test("hash sampling is deterministic and repartition-stable") {
    val big = spark.range(0, 10000).toDF("id")
    val s1 = Sampling.hashSample(big, "id", 0.1).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(big.repartition(7), "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    // ~10% with generous tolerance (LCG buckets are near-uniform on a range)
    assert(s1.size > 700 && s1.size < 1300)
  }

  test("stratified sampling keeps k per stratum deterministically") {
    val rows = (0L until 100L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val got = Sampling.stratifiedSample(rows, "grp", "id", k = 4)
    val byGrp = got.collect().groupBy(_.getString(1))
    assert(byGrp("a").length === 4 && byGrp("b").length === 4)
    val again = Sampling.stratifiedSample(rows.repartition(5), "grp", "id", k = 4)
    assert(got.collect().map(_.toSeq).toSet === again.collect().map(_.toSeq).toSet)
  }

  test("weighted sampling is deterministic and biased toward heavy rows") {
    import graft.pipeline.Sampling
    // 200 rows, weight 100x higher for ids < 20: the heavy decile should
    // dominate a k=40 sample, and two runs must agree exactly.
    val d = (0L until 200L).map(i => (i, if (i < 20) 100.0 else 1.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(d, "id", col("w"), k = 40)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSample(d, "id", col("w"), k = 40)
      .collect().map(_.getLong(0)).toSet
    assert(s1 === s2, "weighted sample must be deterministic")
    assert(s1.size === 40)
    val heavy = s1.count(_ < 20)
    assert(heavy >= 15, s"heavy rows underrepresented: $heavy of 20 in sample")
  }

  test("domain mix fractions sum to one") {
    val rows = Seq((1L, "web"), (2L, "web"), (3L, "code"), (4L, "books"))
      .toDF("id", "source")
    val mix = Sampling.domainMix(rows, "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(mix("web") === ((2L, 0.5)))
    assert(math.abs(mix.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("multimodal pipeline: media wrap + stub feature extraction") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "content", "mime", "meta"))
    val feats = Multimodal.extractFeatures(media, dim = 4)
    assert(feats.count() === 6)
    val row = feats.filter(col("media_id") === 0).collect().head
    assert(row.getAs[Seq[Double]]("features").length === 4)
    assert(row.getAs[Int]("width") > 0)
    // determinism: same content -> same features
    val f0 = feats.filter(col("media_id") === 0).collect().head.getSeq[Double](3)
    val f2 = feats.filter(col("media_id") === 2).collect().head.getSeq[Double](3)
    assert(f0 === f2)
  }

  test("unigram surprisal scores rare-token documents higher") {
    val d = Seq(
      (0L, "the the the the"),   // all corpus-common tokens
      (1L, "the the the zebra")  // one rare token
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0L)._1 === 4L)
    // 'the' appears 7 of 8 tokens; 'zebra' once: doc 1 must score higher
    assert(got(1L)._2 > got(0L)._2)
    // exact values: -ln(7/8) for doc 0; (3*-ln(7/8) + -ln(1/8))/4 for doc 1
    assert(math.abs(got(0L)._2 - BigDecimal(-math.log(7.0 / 8))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("ngram novelty attributes grams to the first (smallest-id) document") {
    val d = Seq(
      (0L, "abcdefgh"),    // 4 distinct 5-grams, all first-seen here
      (1L, "abcdefgh"),    // exact dup: zero novel
      (2L, "abcdewvxyz")   // shares only "abcde"; 5 of 6 grams novel
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(d, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) === ((4L, 4L, 1.0)))
    assert(got(1L) === ((4L, 0L, 0.0)))
    assert(got(2L) === ((6L, 5L, 0.8333)))
  }

  test("frame sampling carves complete frames, strides, and drops sub-frame payloads") {
    val media = Multimodal.asMedia(Seq(
      (1L, "a" * 10 + "b" * 10 + "c" * 10 + "d" * 5), // 35 bytes: 3 full frames + tail
      (2L, "x" * 7)                                    // sub-frame: no rows
    ).toDF("doc_id", "text"), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 10, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        new String(r.getAs[Array[Byte]]("frame"), "UTF-8")))
    // frames 0,1,2 exist (tail "d"*5 dropped); stride 2 keeps 0 and 2,
    // renumbered as kept-frame 0 and 1
    assert(frames.toSeq === Seq((1L, 0, "a" * 10), (1L, 1, "c" * 10)))
  }

  test("feature extraction spreads a single-partition input across cores") {
    // Small parquet scans arrive as 1 partition; the mapPartitions byte loop
    // must still run on the full shuffle parallelism.
    val media = Multimodal.asMedia(docs, "doc_id", "text").coalesce(1)
    assert(media.rdd.getNumPartitions === 1)
    val feats = Multimodal.extractFeatures(media, dim = 4)
    assert(feats.rdd.getNumPartitions > 1,
      s"expected repartition before mapPartitions, got ${feats.rdd.getNumPartitions}")
    assert(feats.count() === 6)
  }

  // ------------------------------------------------------------ scrubbing

  lazy val piiDocs = Seq(
    (0L, "mail alice.smith@corp.example.org or bob@x.io today"),
    (1L, "call 555-867-5309 or 555.123.4567 from 192.168.0.1"),
    (2L, "ssn 123-45-6789 plain text without anything else"),
    (3L, "nothing sensitive here at all")
  ).toDF("doc_id", "text")

  test("PII flagging counts each category") {
    val got = Scrub.flagPii(piiDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) === ((2L, 0L, 0L, 0L)), "two emails")
    assert(got(1L) === ((0L, 2L, 1L, 0L)), "two phones, one ip")
    assert(got(2L) === ((0L, 0L, 0L, 1L)), "one ssn")
    assert(got(3L) === ((0L, 0L, 0L, 0L)))
  }

  test("PII scrub redacts matches and counts them") {
    val got = Scrub.scrubPii(piiDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(0L)._1 === "mail [PII] or [PII] today")
    assert(got(0L)._2 === 2L)
    assert(got(1L)._1 === "call [PII] or [PII] from [PII]")
    assert(got(2L)._1 === "ssn [PII] plain text without anything else")
    assert(got(3L) === (("nothing sensitive here at all", 0L)))
  }

  test("repetition stats measure duplicate and top-word fractions") {
    val d = Seq((0L, "a a a b"), (1L, "w x y z")).toDF("doc_id", "text")
    val got = Scrub.repetitionStats(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(0L) === ((4L, 0.5, 0.75))) // 2 distinct of 4; "a" covers 3/4
    assert(got(1L) === ((4L, 0.0, 0.25)))
  }

  test("top n-gram fraction follows the Gopher word-coverage rule") {
    // "a b a b a" bigrams: (a b)x2, (b a)x2 -> top covers 2*2/5 words.
    val d = Seq((0L, "a b a b a"), (1L, "p q")).toDF("doc_id", "text")
    val got = Scrub.topNgramFrac(d, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0L) === ((5L, 0.8)))
    assert(got(1L) === ((2L, 1.0)))
    // a one-word document has no bigrams and emits no row
    val one = Scrub.topNgramFrac(Seq((9L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text", n = 2)
    assert(one.count() === 0)
  }

  test("corpus line scrub drops repeated lines, keeps order") {
    val d = Seq(
      (0L, "unique head\nSHARED FOOTER\nbody zero"),
      (1L, "body one\nSHARED FOOTER\nunique tail"),
      (2L, "SHARED FOOTER\nbody two\nSHARED FOOTER")
    ).toDF("doc_id", "text")
    val got = Scrub.scrubRepeatedLines(d, "doc_id", "text", minCount = 3L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(0L) === (("unique head\nbody zero", 1L)))
    assert(got(1L) === (("body one\nunique tail", 1L)))
    assert(got(2L) === (("body two", 2L)), "both footer copies removed")
    // below the threshold nothing is scrubbed
    val none = Scrub.scrubRepeatedLines(d, "doc_id", "text", minCount = 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(none === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("scrub explode paths spread a single-partition input") {
    val one = docs.coalesce(1)
    assert(Scrub.repetitionStats(one, "doc_id", "text")
      .rdd.getNumPartitions > 1)
    assert(Scrub.scrubRepeatedLines(one, "doc_id", "text", 2L)
      .rdd.getNumPartitions > 1)
  }

  test("token-budget packing matches a sequential prefix sum") {
    val toks = (0L until 200L).map(i => (i, 1L + (i * 7) % 13))
    val df = toks.toDF("id", "n")
    val got = Pack.packByTokenBudget(df, "id", col("n"), budget = 50L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var cum = 0L
    toks.foreach { case (id, n) =>
      assert(got(id) === cum / 50L, s"doc $id")
      cum += n
    }
  }

  test("packing is partition-count-invariant and multi-partition") {
    val df = (0L until 500L).map(i => (i, 1L + i % 29)).toDF("id", "n")
    val a = Pack.packByTokenBudget(df.coalesce(1), "id", col("n"), 100L)
    val b = Pack.packByTokenBudget(df.repartition(17), "id", col("n"), 100L)
    assert(a.collect().map(_.toSeq).toSet === b.collect().map(_.toSeq).toSet)
    // the running-sum stage runs over the range exchange, never one task
    assert(a.rdd.getNumPartitions > 1)
  }

  test("packing survives a downstream coalesce(1) (single-file write path)") {
    // coalesce fuses the narrow chain into one task, so anything keyed on
    // TaskContext partition ids would restart every offset at zero — the
    // first-id-keyed offsets must keep the global prefix sum intact.
    val toks = (0L until 300L).map(i => (i, 40L + i % 11))
    val df = toks.toDF("id", "n")
    val got = Pack.packByTokenBudget(df, "id", col("n"), budget = 1000L)
      .coalesce(1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var cum = 0L
    toks.foreach { case (id, n) =>
      assert(got(id) === cum / 1000L, s"doc $id")
      cum += n
    }
    assert(got.values.max > 5, "multiple shards must be produced")
  }

  test("as-of join picks the latest right row at or before each left ts") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val clicks = Seq((1L, 10L, ts(100)), (2L, 10L, ts(200)),
      (3L, 11L, ts(100)), (4L, 12L, ts(50))).toDF("cid", "uid", "ts")
    val views = Seq((101L, 10L, ts(90)), (102L, 10L, ts(150)),
      (103L, 10L, ts(201)), (104L, 11L, ts(100))).toDF("vid", "uid", "ts")
    val got = Temporal.asofJoin(clicks, views, "uid", "ts", Seq("vid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(1L) === 101L) // 90 <= 100 < 150
    assert(got(2L) === 102L) // 150 <= 200 < 201
    assert(got(3L) === 104L) // equal timestamps match (inclusive)
    assert(got(4L) === -1L)  // no prior view: left-outer null
  }

  test("as-of join matches only within the same key") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val l = Seq((1L, 1L, ts(100))).toDF("cid", "uid", "ts")
    val r = Seq((9L, 2L, ts(50))).toDF("vid", "uid", "ts")
    val got = Temporal.asofJoin(l, r, "uid", "ts", Seq("vid")).collect()
    assert(got.length === 1 && got(0).isNullAt(3))
  }

  test("sessionize splits on gaps and aggregates per session") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: events at 0s, 10s, 1000s (gap 990s > 300s -> 2 sessions);
    // user 2: single event.
    val e = Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(1000), 4.0),
      (2L, ts(5), 8.0)).toDF("uid", "ts", "v")
    val got = Temporal.sessionize(e, "uid", "ts", "v",
        gapUs = 300L * 1000000)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (1L, 0L, 10L * 1000000, 2L, 3.0),   // 2 events, 10s duration
      (1L, 1000L, 0L, 1L, 4.0),
      (2L, 5L, 0L, 1L, 8.0)))
  }

  test("packing shards are contiguous and hold ~budget tokens") {
    val df = (0L until 1000L).map(i => (i, 10L)).toDF("id", "n")
    val rows = Pack.packByTokenBudget(df, "id", col("n"), 200L)
      .collect().sortBy(_.getLong(0))
    // 1000 docs * 10 tokens / 200 budget = 50 shards of exactly 20 docs
    val byShard = rows.groupBy(_.getLong(2))
    assert(byShard.size === 50)
    assert(byShard.values.forall(_.length === 20))
    // shard ids never decrease in doc order (contiguity)
    val seq = rows.map(_.getLong(2))
    assert(seq.zip(seq.tail).forall { case (x, y) => x <= y })
  }

  test("gopher quality filter keeps clean prose, drops degenerate documents") {
    val good = "the quick brown fox jumps over and over again to be first " +
      "in a long line of animals that have been with us for many years now"
    val qdocs = Seq(
      (0L, good),                              // clean -> keep
      (1L, "short text"),                      // < 5 words -> drop
      (2L, ("### " * 40) + good),              // symbol-heavy -> drop
      (3L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa " * 6), // mean len > 10
      (4L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce")
    ).toDF("doc_id", "text")                   // 4: no English stopwords
    val q = TextAnalysis.gopherQuality(qdocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(q === Map(0L -> true, 1L -> false, 2L -> false,
      3L -> false, 4L -> false))
    val row0 = TextAnalysis.gopherQuality(qdocs, "doc_id", "text")
      .filter(col("doc_id") === 0).head()
    assert(row0.getAs[Long]("n_words") === good.split("\\s+").length.toLong)
    assert(row0.getAs[Double]("alpha_frac") === 1.0)
    assert(row0.getAs[Long]("stopword_hits") >= 2L)
  }

  test("contamination overlap fraction: full copy 1.0, unrelated 0.0") {
    val a = "this exact benchmark sentence will appear verbatim inside the " +
      "training corpus and must be attributed with a full overlap fraction"
    val corpus = Seq(
      (1L, a),                                    // exact probe copy
      (2L, a + " plus a long unique suffix that the probe set never saw " +
        "anywhere in its own text at all"),       // partial overlap
      (3L, "entirely unrelated text about catalyst optimizer rules and " +
        "distributed shuffle planning for large clusters")).toDF("doc_id", "text")
    val probes = Seq((100L, a)).toDF("doc_id", "text")
    val got = Decontaminate.overlapFrac(corpus, probes, "doc_id", "text", n = 20)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L)._3 === 1.0)
    assert(got(3L)._3 === 0.0 && got(3L)._2 === 0L)
    assert(got(2L)._3 > 0.0 && got(2L)._3 < 1.0)
    // the flag operator agrees with frac > 0
    val flagged = Decontaminate.flag(corpus, probes, "doc_id", "text", n = 20)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(1L, 2L))
  }

  test("assignCosine puts each vector with its nearest centroid, ties to low id") {
    val vecs = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(0.9f, 0.1f)),  // near centroid 0
      (12L, Seq(0.0f, 1.0f)), (13L, Seq(0.1f, 0.9f)),  // near centroid 1
      (14L, Seq(1.0f, 1.0f))                           // exact tie -> 0
    ).toDF("vec_id", "embedding")
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val got = graft.pipeline.Clustering
      .assignCosine(vecs, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 0L, 11L -> 0L, 12L -> 1L, 13L -> 1L, 14L -> 0L))
  }

  test("kmeans recovers well-separated clusters; deterministic across partitionings") {
    val pts = (0 until 30).map { i =>
      val (cx, cy) = if (i % 3 == 0) (0.0, 0.0)
        else if (i % 3 == 1) (10.0, 10.0) else (-10.0, 8.0)
      (i.toLong, Seq(cx + (i % 5) * 0.1, cy + (i % 7) * 0.1))
    }
    val df = pts.toDF("id", "v")
    val r1 = graft.pipeline.Clustering.kmeans(df, "id", "v", k = 3)
    val groups = r1.assignments.collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy { case (id, _) => id % 3 }
      .view.mapValues(_.map(_._2).toSet).toMap
    // every ground-truth cluster lands in exactly one learned cluster
    assert(groups.values.forall(_.size === 1), s"mixed clusters: $groups")
    assert(groups.values.flatten.toSet.size === 3)
    // partitioning must not change the result (deterministic lowest-id init)
    val r2 = graft.pipeline.Clustering.kmeans(df.repartition(7), "id", "v", k = 3)
    assert(r2.assignments.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      === r1.assignments.collect().map(r => (r.getLong(0), r.getInt(1))).toMap)
  }

  test("writeSharded lays the corpus out one directory per shard, round-trips") {
    val docs = (0L until 40L).map(i => (i, "w " * 25)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    // 25 tokens per doc, budget 100 -> 4 docs per shard -> 10 shards
    val n = graft.pipeline.Pack.writeSharded(docs, "doc_id",
      graft.pipeline.TextAnalysis.tokenCount(col("text")), budget = 100L, dir)
    assert(n === 10L)
    val back = spark.read.parquet(dir)
    assert(back.count() === 40L)
    assert(back.select("shard").distinct().count() === 10L)
    // contiguity: every shard holds a contiguous id range of 4 docs
    val byShard = back.select("shard", "doc_id").collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).groupBy(_._1)
    byShard.foreach { case (s, rows) =>
      val ids = rows.map(_._2).sorted
      assert(ids.length === 4 && ids.last - ids.head === 3,
        s"shard $s has ids ${ids.toSeq}")
    }
  }

  test("bm25 ranks by term frequency with saturation and idf weighting") {
    val corpus = Seq(
      (1L, "spark spark spark filler filler filler"),
      (2L, "spark filler filler filler filler filler"),
      (3L, "vector filler filler filler filler filler"),
      (4L, "filler filler filler filler filler filler"),
      (5L, "filler filler filler filler filler filler")).toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis
      .bm25(corpus, "doc_id", "text", Seq("spark", "vector"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Only matching docs surface; repeated term scores higher than a
    // single hit but saturates (k1) below 3x; the rarer term (df=1)
    // outscores the common one (df=2) at equal tf and length.
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) > got(2L) && got(1L) < 3 * got(2L))
    assert(got(3L) > got(2L))
    assert(got.values.forall(_ > 0))
  }

  test("rrfFuse ranks agreement above either single list") {
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "s")
    val b = Seq((2L, 5.0), (4L, 4.0), (1L, 3.0)).toDF("id", "s")
    val fused = graft.pipeline.Similarity
      .rrfFuse(Seq((a, "id", "s"), (b, "id", "s")), k = 60, topK = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // 1 (ranks 1+3) and 2 (ranks 2+1) appear in both lists and must beat
    // the single-list ids 3 and 4; 2's rank sum wins overall.
    assert(fused.map(_._1).take(2).toSet === Set(1L, 2L))
    assert(fused.head._1 === 2L)
    assert(fused.map(_._1).length === 4)
  }

  test("tfidfTopK ranks distinctive tokens above corpus-wide ones") {
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "cherry shared shared"),
      (3L, "banana cherry shared")).toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis.tfidfTopK(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // doc 1: 'apple' (tf=2, df=1) must outrank everything; 'shared'
    // (df=3) has idf ln(1)=0 so it can never make top-2 over banana
    val d1 = got.filter(_._1 == 1L).sortBy(_._3).map(_._2)
    assert(d1 === Seq("apple", "banana"))
    // every doc gets at most k rows, ranks start at 1
    assert(got.groupBy(_._1).forall(_._2.length <= 2))
    assert(got.filter(_._3 == 1L).length === 3)
  }

  test("chunk covers the text with the declared stride and overlap") {
    val docs = Seq((1L, "a" * 100), (2L, "")).toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis.chunk(docs, "doc_id", "text", 40, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // starts every 30 chars: 0, 30, 60, 90; last chunk is the 10-char tail
    assert(d1.map(_._3) === Seq(0L, 30L, 60L, 90L))
    assert(d1.map(_._4.length) === Seq(40, 40, 40, 10))
    // consecutive chunks overlap by exactly 10 characters
    assert(d1(0)._4.takeRight(10) === d1(1)._4.take(10))
    // empty document: one empty chunk at offset 0
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, "")))
  }

  test("semanticDedup keeps the lowest id per within-cluster near-dup set, across clusters dups survive") {
    // cluster 0 (x-axis): 10 and 11 nearly parallel (cos ~ 1) -> 11 dropped;
    // 15 orthogonal-ish within the cluster threshold? no — distinct direction, kept.
    // cluster 1 (y-axis): 12 and 13 nearly parallel -> 13 dropped.
    // 14 is parallel to 10 but lands in cluster 1 (tie resolution aside,
    // (0.6, 0.8) is closer to y) — cross-cluster, so it survives.
    val vecs = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(0.99f, 0.01f)),
      (12L, Seq(0.0f, 1.0f)), (13L, Seq(0.01f, 0.99f)),
      (14L, Seq(0.6f, 0.8f)), (15L, Seq(0.8f, 0.6f))
    ).toDF("vec_id", "embedding")
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val got = graft.pipeline.Similarity
      .semanticDedup(vecs, "vec_id", "embedding", cents, threshold = 0.98)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(10L) === ((0L, true)))
    assert(got(11L) === ((0L, false)))   // near-dup of lower-id 10 in cluster 0
    assert(got(12L) === ((1L, true)))
    assert(got(13L) === ((1L, false)))   // near-dup of lower-id 12 in cluster 1
    assert(got(14L)._2 === true)         // cluster 1; no lower-id near-dup there
    assert(got(15L)._2 === true)         // cluster 0; cos(15,10) = 0.8 < 0.98
  }

  test("semanticDedup agrees with a driver-side replay on random vectors (seeded)") {
    val rnd = new scala.util.Random(11L)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for (_ <- 1 to 3) {
      // float-round the vectors up front: the engine stores float embeddings,
      // so the replay must see the identical float-rounded doubles or a
      // cosine within float rounding of the threshold could flip the verdict
      val vecs = (0 until 50).map(i =>
        (i.toLong, Seq.fill(4)(rnd.nextGaussian().toFloat.toDouble)))
      val cents = (0 until 3).map(c => c -> Seq.fill(4)(rnd.nextGaussian()))
      val thr = 0.6 + rnd.nextDouble() * 0.3
      // driver replay: argmax-cosine assignment (ties to low cid), then
      // drop i iff some j < i in the same cluster has cos >= thr
      val asg = vecs.map { case (id, v) =>
        id -> cents.minBy { case (cid, c) => (-cos(v, c), cid) }._1
      }.toMap
      val byId = vecs.toMap
      val expected = vecs.map { case (id, v) =>
        val dup = vecs.exists { case (j, w) =>
          j < id && asg(j) == asg(id) && cos(w, v) >= thr }
        id -> ((asg(id).toLong, !dup))
      }.toMap
      val df = vecs.map { case (id, v) => (id, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      val got = graft.pipeline.Similarity
        .semanticDedup(df, "vec_id", "embedding", cents, thr)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(got === expected, s"threshold $thr")
    }
  }

  test("semanticDedup is partitioning-invariant") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Seq((math.cos(i * 0.3)).toFloat, (math.sin(i * 0.3)).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0),
      2 -> Seq(-1.0, 0.0), 3 -> Seq(0.0, -1.0))
    def run(df: org.apache.spark.sql.DataFrame) = graft.pipeline.Similarity
      .semanticDedup(df, "vec_id", "embedding", cents, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(run(vecs) === run(vecs.repartition(13)))
  }

  test("semanticDedup enforces the per-cluster pair budget on a skewed fixture") {
    // every vector lands in cluster 0 (all near the x-axis): the
    // within-cluster join would be all-pairs quadratic — the budget must
    // FAIL the call with a classified error, never launch the join
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq(1.0f, (i * 1e-4).toFloat))).toDF("vec_id", "embedding")
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val ex = intercept[IllegalStateException] {
      graft.pipeline.Similarity.semanticDedup(
        vecs, "vec_id", "embedding", cents, threshold = 0.98,
        maxClusterSize = 10).collect()
    }
    assert(ex.getMessage.contains("maxClusterSize"))
    // the same fixture passes when the budget admits the cluster
    val ok = graft.pipeline.Similarity.semanticDedup(
      vecs, "vec_id", "embedding", cents, threshold = 0.98,
      maxClusterSize = 30).collect()
    assert(ok.length === 30)
  }

  test("semanticDedupAuto derives the cluster count from the corpus") {
    // 40 vectors in two tight direction bundles: auto-k (floored at
    // minK=4) must separate them and keep exactly one representative per
    // near-parallel set at a high threshold
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) (1.0, 0.0) else (0.0, 1.0)
      (i.toLong, Seq((base._1 + i * 1e-5).toFloat, (base._2 + i * 1e-5).toFloat))
    }.toDF("vec_id", "embedding")
    val got = graft.pipeline.Similarity.semanticDedupAuto(
      vecs, "vec_id", "embedding", threshold = 0.9999, clusterFrac = 0.1,
      minK = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got.size === 40)
    // every vector is near-parallel to the lowest id of its bundle unless
    // k-means split a bundle across clusters — keeps are bounded by the
    // cluster count, and at least one per bundle survives
    val keeps = got.count(_._2)
    assert(keeps >= 2 && keeps <= 8, s"keeps=$keeps")
    assert(got(0L) && got(1L)) // bundle minima always survive
  }

  test("duplicateSpanStats marks cross-doc windows, counts per position") {
    // n=3 token windows. doc 10: "a b c d" -> windows [a b c], [b c d].
    // doc 11: "a b c x" -> [a b c], [b c x]. doc 12: "p q r" -> [p q r].
    // [a b c] is cross-doc; everything else unique.
    val d = Seq((10L, "a b c d"), (11L, "a b c x"), (12L, "p q r"),
      (13L, "a b")) // shorter than n: zero windows
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpanStats(d, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      10L -> ((2L, 1L, 0.5)), 11L -> ((2L, 1L, 0.5)),
      12L -> ((1L, 0L, 0.0)), 13L -> ((0L, 0L, 0.0))))
  }

  test("duplicateSpanStats: a window repeated only WITHIN a doc is not dup") {
    val d = Seq((1L, "x y x y x y"), (2L, "u v w"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpanStats(d, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("URL canonicalization: each hazard independently and combined") {
    val cases = Seq(
      // case + default port + fragment
      "HTTP://ExAmple.COM:80/Path#frag" -> "http://example.com/Path",
      // https default port, preserved non-default port
      "https://a.com:443/x" -> "https://a.com/x",
      "https://a.com:8443/x" -> "https://a.com:8443/x",
      // tracking params in every position; legit params survive
      "http://a.com/p?utm_source=x&id=1&utm_campaign=y" -> "http://a.com/p?id=1",
      "http://a.com/p?gclid=z" -> "http://a.com/p",
      "http://a.com/p?fbclid=1&q=2" -> "http://a.com/p?q=2",
      // duplicate path slashes but never the scheme separator
      "http://a.com//x///y" -> "http://a.com/x/y",
      // trailing slash, incl. before the query
      "http://a.com/x/" -> "http://a.com/x",
      "http://a.com/x/?q=1" -> "http://a.com/x?q=1",
      // path/query case is preserved
      "HTTPS://B.org/CaseSensitive?Q=V" -> "https://b.org/CaseSensitive?Q=V")
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), graft.pipeline.Urls.canonicalize(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) === want, s"input $in")
    }
  }

  test("media dHash near-dup finds byte-flipped copies, skips unrelated") {
    val base = ("frame" * 40) // 200 bytes
    val flipped = base.updated(77, 'X') // one byte differs
    val other = ("wholly different payload content " * 6).take(200)
    val media = graft.pipeline.Multimodal.asMedia(
      Seq((1L, base), (2L, flipped), (3L, other)).toDF("doc_id", "text"),
      "doc_id", "text")
    val pairs = graft.pipeline.Multimodal.nearDupMedia(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // identical payloads are hamming 0
    val dup = graft.pipeline.Multimodal.asMedia(
      Seq((1L, base), (9L, base)).toDF("doc_id", "text"), "doc_id", "text")
    val p2 = graft.pipeline.Multimodal.nearDupMedia(dup).collect()
    assert(p2.length === 1 && p2.head.getInt(2) === 0)
  }

  test("temperatureMix flattens the source distribution deterministically") {
    // sources: big 80 rows, small 20. alpha=0.5: q_big = sqrt(80)/Z,
    // q_small = sqrt(20)/Z, Z = sqrt(80)+sqrt(20). Targets: floor(100*q).
    val d = ((0 until 80).map(i => (i.toLong, "big")) ++
      (100 until 120).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val got = graft.pipeline.Sampling
      .temperatureMix(d, "source", alpha = 0.5, "doc_id")
    val bySource = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = math.sqrt(80.0) + math.sqrt(20.0)
    assert(bySource("big") === math.floor(100 * math.sqrt(80.0) / z).toLong)
    assert(bySource("small") === math.min(20L,
      math.floor(100 * math.sqrt(20.0) / z).toLong))
    // deterministic: same rows under repartitioning
    val again = graft.pipeline.Sampling
      .temperatureMix(d.repartition(7), "source", 0.5, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === got.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("temperatureMix: alpha 1 is the identity, alpha 0 is uniform targets") {
    val d = ((0 until 30).map(i => (i.toLong, "a")) ++
      (100 until 110).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    assert(graft.pipeline.Sampling
      .temperatureMix(d, "source", 1.0, "doc_id").count() === 40L)
    val flat = graft.pipeline.Sampling
      .temperatureMix(d, "source", 0.0, "doc_id")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat === Map("a" -> 20L, "b" -> 10L)) // 40/2 each, b capped at 10
  }

  test("randomProjection matches a driver-side replay of the sign matrix") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    def sign(i: Long, j: Int): Double = {
      val h = Math.floorMod(i * 2654435761L + j.toLong * 2246822519L + 42L,
        2147483648L)
      if ((h / 1024L) % 2L == 0L) 1.0 else -1.0
    }
    val expected = vecs.map { case (id, v) =>
      id -> (0 until 4).map(j =>
        v.zipWithIndex.map { case (x, i) => x.toDouble * sign(i, j) }.sum /
          math.sqrt(4.0))
    }.toMap
    val got = graft.pipeline.Similarity.randomProjection(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", outDim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (id, _) =>
      expected(id).zip(got(id)).foreach { case (e, g) =>
        assert(math.abs(e - g) < 1e-9, s"id $id")
      }
    }
  }

  test("randomProjection approximately preserves pairwise distances") {
    // JL with outDim 16 over 40 unit-ish vectors: check the median
    // distortion is modest (this is a sanity property, not a tight bound).
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val proj = graft.pipeline.Similarity.randomProjection(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", outDim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def d(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val orig = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val ratios = for {
      i <- 0L until 40L; j <- (i + 1) until 40L
    } yield d(proj(i), proj(j)) / d(orig(i), orig(j))
    val sorted = ratios.sorted
    val median = sorted(sorted.size / 2)
    assert(median > 0.7 && median < 1.3, s"median distortion $median")
  }

  test("scrubDuplicateSpans cuts later occurrences, keeps the first") {
    // n=3: [a b c] occurs in docs 1 and 2; doc 1 pos 0 is the keeper, so
    // doc 2 loses positions 1..3 (tokens a b c) and keeps "x y".
    val d = Seq((1L, "a b c d e"), (2L, "x a b c y"), (3L, "p q"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.Scrub.scrubDuplicateSpans(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got === Map(
      1L -> (("a b c d e", 0L)),
      2L -> (("x y", 3L)),
      3L -> (("p q", 0L))))
  }

  test("scrubDuplicateSpans: overlapping duplicated windows merge coverage") {
    // doc 20 repeats doc 10's full text; every window duplicates, the
    // whole later copy is cut (positions union, counted once each).
    val d = Seq((10L, "t1 t2 t3 t4 t5"), (20L, "t1 t2 t3 t4 t5"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.Scrub.scrubDuplicateSpans(d, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got === Map(
      10L -> (("t1 t2 t3 t4 t5", 0L)),
      20L -> (("", 5L))))
  }

  test("dedupParagraphsGlobal keeps the first occurrence only, in order") {
    val d = Seq(
      (1L, "alpha\nshared\nbeta"),
      (2L, "shared\ngamma"),      // "shared" first seen in doc 1 pos 1
      (3L, "delta\ndelta\nshared")) // within-doc repeat: second drops too
      .toDF("doc_id", "text")
    val got = graft.pipeline.Scrub
      .dedupParagraphsGlobal(d, "doc_id", "text", sepRegex = "\n", joinSep = "\n")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got === Map(
      1L -> (("alpha\nshared\nbeta", 0L)),
      2L -> (("gamma", 1L)),
      3L -> (("delta", 2L))))
  }

  test("dedupParagraphsGlobal is partitioning-invariant") {
    val d = (0L until 40L).map(i => (i, s"common header\nbody $i\ncommon footer"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) = graft.pipeline.Scrub
      .dedupParagraphsGlobal(df, "doc_id", "text", "\n", "\n")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val a = run(d)
    assert(a === run(d.repartition(17)))
    assert(a(0L) === (("common header\nbody 0\ncommon footer", 0L)))
    assert(a(5L) === (("body 5", 2L)))
  }

  test("dedupByUrl groups by canonical form, keeps min id") {
    val d = Seq(
      (5L, "http://a.com/x?utm_source=1"),
      (3L, "HTTP://A.COM:80/x"),
      (7L, "http://a.com/y"))
      .toDF("doc_id", "url")
    val got = graft.pipeline.Urls.dedupByUrl(d, "doc_id", "url")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((3L, "http://a.com/x", 2L), (7L, "http://a.com/y", 1L)))
  }

  test("topNgrams: counts and lexicographic tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val rows = graft.pipeline.TextAnalysis
      .topNgrams(docs, "doc_id", "text", n = 3, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc1 trigrams: "a b c"x2, "b c a", "c a b"; doc2: "a b c", "b c d"
    assert(rows.toSeq ===
      Seq((1L, "a b c", 3L), (2L, "b c a", 1L), (3L, "b c d", 1L)))
  }

  test("zipfFit: closed-form two-token corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x x x x y y")).toDF("doc_id", "text")
    val r = graft.pipeline.TextAnalysis.zipfFit(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(0) === 2L) // vocab
    assert(r.getLong(1) === 6L) // tokens
    // points: (ln1, ln4), (ln2, ln2) -> slope = (ln2-ln4)/(ln2-ln1) = -1
    assert(math.abs(r.getDouble(2) - (-1.0)) < 1e-9)
  }
}
