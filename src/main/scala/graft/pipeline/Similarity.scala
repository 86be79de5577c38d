package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor / similarity search over embedding columns
  * (`Array[Float]`).
  *
  * The LSH family is signed-random-hyperplane (SimHash for vectors) with
  * multiple independent bands: a pair/query-point is a candidate when it
  * agrees with the target on ALL bits of at least one band. Recall at
  * similarity s is 1 - (1 - p^b)^L with p = 1 - acos(s)/pi, b = bitsPerBand,
  * L = bands — the classic OR-of-ANDs construction. Defaults (L=64, b=6)
  * target >= 0.95 recall down to cosine ~0.35 on the synthetic embeddings;
  * at billions of rows raise bitsPerBand (bucket count 2^b must exceed
  * n/bucket-size) and retune L for the same recall.
  *
  * Signature computation is explode + codegen'd sum aggregates (one shuffle,
  * no interpreted higher-order functions in the per-element hot path — the
  * same shape as Dedup.minhashSignatures and for the same 100-TB reason).
  */
object Similarity {

  /** dot(a, b) via zip_with + aggregate, computed in double. Fine for
    * per-row verification against a handful of candidates; the bulk
    * signature path below deliberately avoids this interpreted form. */
  def dot(a: Column, b: Column): Column =
    F.aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = F.sqrt(dot(a, a))

  /** Cosine similarity — a native codegen'd Catalyst expression (single
    * fused loop; see graft.functions.CosineSimilarity for why the HOF
    * zip_with/aggregate form was replaced). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Brute-force cosine top-k against a constant query vector: one scan,
    * a per-partition top-k then a global top-k (Spark's sort+limit is
    * TakeOrdered — no full sort). The correctness baseline for ANN. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal Rank Fusion over candidate lists from heterogeneous
    * retrievers (BM25 + dense ANN is the classic hybrid-retrieval pair):
    * fused(d) = Σ_lists 1 / (k + rank_list(d)), rank 1-based by
    * (score DESC, id ASC) within each list (Cormack/Clarke/Buettcher
    * 2009; k=60 is their constant). Returns the topK by
    * (fused DESC, id ASC).
    *
    * Scale shape: each input is a retriever's CANDIDATE list (top-N,
    * bounded by construction — never a corpus), so the per-list global
    * rank window and the final top-K sort run on k·|lists| rows, not
    * data-scale rows; the fuse itself is one tiny groupBy. */
  def rrfFuse(lists: Seq[(DataFrame, String, String)], k: Int = 60,
      topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val ranked = lists.map { case (df, idCol, scoreCol) =>
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(idCol).cast(LongType).as("id"),
        (lit(1.0) / (lit(k) + row_number().over(w))).as("_rr"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(round(sum(col("_rr")), 6).as("fused"))
      .orderBy(col("fused").desc, col("id"))
      .limit(topK)
  }

  /** Johnson–Lindenstrauss random projection with ±1 signs: proj[j] =
    * Σ_i v[i]·s(i,j) / √outDim — the standard dimensionality reduction in
    * front of ANN / clustering at scale (Achlioptas 2003 database-friendly
    * projections: ±1 entries preserve pairwise distances with the same JL
    * guarantee as Gaussians). The sign matrix is DERIVED, not stored:
    * s(i,j) = a middle bit of a multiplicative hash of (i, j) — pure
    * integer arithmetic an external SQL oracle replays exactly.
    *
    * Scale shape: explode vector positions once, then `outDim` codegen'd
    * sum aggregates with map-side combine (the minhashSignatures shape) —
    * one shuffle on the id, no interpreted HOFs, no driver-side matrix.
    * Output: (idCol, proj array<double>). */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int, seed: Long = 42L): DataFrame = {
    require(outDim >= 1, "outDim must be >= 1")
    val spark = df.sparkSession
    val exploded = df
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("_i", "_v")))
      .select(col(idCol), col("_i").cast(LongType).as("_i"),
        col("_v").cast(DoubleType).as("_v"))
    def sign(j: Int): Column = {
      // h = (i·2654435761 + j·2246822519 + seed) mod 2^31; bit 10 of h.
      val h = pmod(col("_i") * 2654435761L + lit(j.toLong) * 2246822519L +
        lit(seed), lit(2147483648L))
      when(pmod((h / 1024L).cast(LongType), lit(2L)) === 0L, lit(1.0))
        .otherwise(lit(-1.0))
    }
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val aggs = (0 until outDim).map(j =>
      sum(col("_v") * sign(j)).as(s"_p$j"))
    exploded.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until outDim).map(j => col(s"_p$j") * scale): _*).as("proj"))
  }

  /** The hyperplane matrix for (bands * bitsPerBand) planes — deterministic
    * from the seed so driver-side query hashing and executor-side row
    * hashing agree. */
  private def planes(dim: Int, bands: Int, bitsPerBand: Int,
      seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bands * bitsPerBand)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Band keys for every row via a per-partition dense matrix multiply
    * (mapPartitions): each vector is multiplied by the (bands*bitsPerBand x
    * dim) plane matrix in tight primitive loops, signs assembled into one
    * long key per band with the band index in the high bits (so keys from
    * different bands never collide and the candidate join needs only one
    * equality). A Column formulation needs hundreds of aggregate columns,
    * which exceeds spark.sql.codegen.maxFields and silently drops to
    * interpreted evaluation (~20x slower measured) — dense linear algebra
    * is the documented mapPartitions exception (SURVEY custom-operator
    * preference (d)). Embarrassingly parallel, no shuffle. Output:
    * (_lsh_id, _lsh_keys array<long>). */
  private def bandKeyFrame(df: DataFrame, idCol: String, vecCol: String,
      bands: Int, bitsPerBand: Int, seed: Long, dim: Int): DataFrame = {
    val pl = planes(dim, bands, bitsPerBand, seed)
    val idField = df.schema(idCol)
    val out = StructType(Seq(
      StructField("_lsh_id", idField.dataType, idField.nullable),
      StructField("_lsh_keys", ArrayType(LongType, containsNull = false))))
    val in = df.select(col(idCol),
      col(vecCol).cast(ArrayType(DoubleType)).as("_v"))
    in.mapPartitions { it =>
      it.map { r =>
        val v = r.getSeq[Double](1).toArray
        val n = math.min(v.length, dim)
        val keys = new Array[Long](bands)
        var j = 0
        while (j < bands) {
          var key = j.toLong << bitsPerBand
          var i = 0
          while (i < bitsPerBand) {
            val p = pl(j * bitsPerBand + i)
            var d = 0.0
            var k = 0
            while (k < n) { d += v(k) * p(k); k += 1 }
            if (d > 0) key |= (1L << i)
            i += 1
          }
          keys(j) = key
          j += 1
        }
        org.apache.spark.sql.Row(r.get(0), keys.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(out))
  }

  /** Driver-side band keys of a literal query vector with the same planes. */
  private def queryBandKeys(query: Seq[Double], bands: Int, bitsPerBand: Int,
      seed: Long): Seq[Long] = {
    val pl = planes(query.length, bands, bitsPerBand, seed)
    (0 until bands).map { j =>
      (0 until bitsPerBand).foldLeft(j.toLong << bitsPerBand) { (acc, i) =>
        val d = pl(j * bitsPerBand + i).zip(query)
          .map { case (a, b) => a * b }.sum
        if (d > 0) acc | (1L << i) else acc
      }
    }
  }

  /** Embedding dimensionality: caller-supplied, else probed from the first
    * non-empty row (one cheap driver job). A wrong dim degrades the LSH
    * silently — shorter vectors hash to one bucket, longer ones hash only
    * a prefix. */
  private def probeDim(df: DataFrame, vecCol: String, dim0: Option[Int]): Int =
    dim0.getOrElse(
      df.select(F.size(col(vecCol)).as("_d")).filter(col("_d") > 0)
        .head(1).headOption.map(_.getInt(0)).getOrElse(1))

  /** LSH-bucketed ANN top-k: candidates are rows sharing at least one band
    * key with the query (arrays_overlap against a literal key set — no
    * shuffle, pure scan-side filter), ranked by exact cosine. At 100 TB the
    * band keys are precomputed and bucketed/partitioned, turning this into
    * a bounded multi-bucket lookup instead of a full scan. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, bands: Int = 64, bitsPerBand: Int = 6,
      seed: Long = 42L): DataFrame = {
    val dim = query.length
    val qKeys = queryBandKeys(query, bands, bitsPerBand, seed)
    val cand = bandKeyFrame(df, idCol, vecCol, bands, bitsPerBand, seed, dim)
      .filter(arrays_overlap(col("_lsh_keys"), typedLit(qKeys)))
      .select(col("_lsh_id"))
    df.join(cand, df(idCol) === cand("_lsh_id"), "left_semi")
      .select(col(idCol), cosine(col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) index: k-means partitions the vector space;
    * a query probes only the nProbe nearest cells, turning a full scan
    * into a centroid lookup + bounded cell scan. */
  case class IvfIndex(centers: Array[Array[Double]],
      assigned: DataFrame, idCol: String, vecCol: String) {

    def search(query: Seq[Double], k: Int, nProbe: Int = 2): DataFrame = {
      val qArr = query.toArray
      // Rank probe cells by squared Euclidean distance — the SAME metric
      // k-means assigned rows with. Ranking by cosine here would probe the
      // wrong cells when centroid norms differ (they always do: a mean of
      // unit vectors is inside the sphere).
      def sqDist(c: Array[Double]): Double =
        c.zip(qArr).map { case (a, b) => val d = a - b; d * d }.sum
      val probes = centers.zipWithIndex
        .sortBy { case (c, _) => sqDist(c) }
        .take(nProbe).map(_._2)
      assigned
        .filter(col("_ivf_cell").isin(probes.map(Integer.valueOf): _*))
        .select(col(idCol), cosine(col(vecCol), typedLit(query)).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
    }
  }

  /** Distributed kNN JOIN: for EVERY row of `queries`, the top-k corpus
    * rows by cosine — the batch retrieval shape of a training pipeline
    * (RAG pair mining, cross-dataset near-dup, DSIR-style matching),
    * where [[IvfIndex.search]] answers ONE driver-side query.
    *
    * Scale shape: the corpus side already carries its IVF cell; the query
    * side ranks the (tiny, broadcast) centroid table per row and keeps
    * its nProbe nearest cells — a query with Q rows joins the corpus
    * keyed on cell id, touching |Q| · nProbe/nCells of the corpus
    * instead of |Q| · corpus, and a per-query top-k window cuts the
    * candidates. No all-pairs path exists; `nProbe = nCells` is the
    * exact brute-force baseline (every pair via the cell join, still one
    * keyed shuffle). Returns (qIdCol, corpus idCol, cosine, rank). */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
      index: IvfIndex, k: Int, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = queries.sparkSession
    import spark.implicits._
    val cells = index.centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("_ivf_cell", "_center")
    // Rank cells per query by squared Euclidean distance (the k-means
    // assignment metric — see IvfIndex.search for why not cosine).
    val qd = queries.select(col(qIdCol), col(qVecCol))
    val probed = qd.crossJoin(F.broadcast(cells))
      .withColumn("_d2", F.aggregate(
        F.zip_with(col(qVecCol).cast(ArrayType(DoubleType)), col("_center"),
          (a, b) => (a - b) * (a - b)),
        F.lit(0.0), (acc, x) => acc + x))
      .withColumn("_cellrk", F.row_number().over(
        Window.partitionBy(col(qIdCol)).orderBy(col("_d2"), col("_ivf_cell"))))
      .filter(col("_cellrk") <= nProbe)
      .select(col(qIdCol), col(qVecCol), col("_ivf_cell"))
    val cand = probed.join(
      index.assigned.select(col("_ivf_cell"),
        col(index.idCol).as("_n_id"), col(index.vecCol).as("_n_vec")),
      Seq("_ivf_cell"))
    cand
      .select(col(qIdCol), col("_n_id"),
        cosine(col(qVecCol), col("_n_vec")).as("cosine"))
      .withColumn("rank", F.row_number().over(
        Window.partitionBy(col(qIdCol))
          .orderBy(col("cosine").desc, col("_n_id"))))
      .filter(col("rank") <= k)
      .withColumnRenamed("_n_id", index.idCol)
  }

  /** Build an IVF index over an embedding column (the one-time indexing
    * job; see loadOrBuildIvf for the stored form queries should use). */
  def buildIvf(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = df.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol).cast(ArrayType(DoubleType))).as("_features"))
    val fitted = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("_features").setPredictionCol("_ivf_cell")
      .fit(featured)
    val assigned = graft.impl.Pin(fitted.transform(featured)
      .select(col(idCol), col(vecCol), col("_ivf_cell")))
    IvfIndex(fitted.clusterCenters.map(_.toArray), assigned, idCol, vecCol)
  }

  /** Order-independent dataset fingerprint: (row count, xor of id hashes).
    * One cheap single-column scan — detects rows added, removed, or
    * replaced since an index was built, at a tiny fraction of a rebuild. */
  private def ivfFingerprint(df: DataFrame, idCol: String): String = {
    val r = df.agg(count(lit(1)), expr(s"bit_xor(xxhash64(`$idCol`))")).head()
    s"${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}"
  }

  /** Stored IVF index: centroids and cell assignments persisted as parquet
    * under `spark.graft.ivf.indexDir` (default <tmpdir>/graft_ivf), the
    * assignment table PARTITIONED BY cell so a probe prunes untouched cells
    * at the file level — exactly the artifact a 100 TB deployment would
    * keep on object storage. Build (k-means) runs once per (key, params);
    * every later session, including fresh JVMs, loads and measures only
    * the probe. The on-disk index snapshots the dataset at build time, so
    * the marker file records the dataset fingerprint and a load whose
    * fingerprint mismatches rebuilds instead of silently serving stale
    * cells. */
  def loadOrBuildIvf(df: DataFrame, key: String, idCol: String,
      vecCol: String, nCells: Int = 16, seed: Long = 42L): IvfIndex = {
    val spark = df.sparkSession
    val base = spark.conf.getOption("spark.graft.ivf.indexDir")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_ivf")
    val tag = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        s"$key|$idCol|$vecCol|$nCells|$seed").toLong & 0xffffffffL)
    val dir = s"$base/ivf_$tag"
    val donePath = new org.apache.hadoop.fs.Path(s"$dir/_INDEXED")
    val fs = donePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fp = ivfFingerprint(df, idCol)
    val fresh = fs.exists(donePath) && {
      val in = fs.open(donePath)
      val stored = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      stored == fp
    }
    if (fresh) {
      val centers = spark.read.parquet(s"$dir/centroids").collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1).map(_._2)
      IvfIndex(centers, spark.read.parquet(s"$dir/cells"), idCol, vecCol)
    } else {
      val idx = buildIvf(df, idCol, vecCol, nCells, seed)
      idx.assigned.write.mode("overwrite")
        .partitionBy("_ivf_cell").parquet(s"$dir/cells")
      val rows = idx.centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      spark.createDataFrame(rows.toSeq).toDF("cell", "center")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
      val out = fs.create(donePath, true)
      try out.write(fp.getBytes("UTF-8")) finally out.close()
      idx
    }
  }

  /** Exact all-pairs cosine above a threshold (brute force — bound the
    * input; the scale path is cosineNearDupPairs below). */
  def cosinePairsExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val l = df.select(col(idCol).as("id1"), col(vecCol).as("_v1"))
    val r = df.select(col(idCol).as("id2"), col(vecCol).as("_v2"))
    l.join(r, col("id1") < col("id2"))
      .withColumn("cosine", cosine(col("_v1"), col("_v2")))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** All-pairs cosine above a threshold via banded LSH (embedding-based
    * near-duplicate detection): one equality bucket-join on band keys, then
    * exact-cosine verification — bucketed, never all-pairs. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bands: Int = 64, bitsPerBand: Int = 6,
      seed: Long = 42L, dim0: Option[Int] = None): DataFrame = {
    val dim = probeDim(df, vecCol, dim0)
    val withKeys = df.select(col(idCol).as("_cid"), col(vecCol).as("_cvec"))
      .join(bandKeyFrame(df, idCol, vecCol, bands, bitsPerBand, seed, dim),
        col("_cid") === col("_lsh_id"))
      .select(col("_cid"), col("_cvec"), col("_lsh_keys"))
    val pinnedKeys = graft.impl.Pin(withKeys)
    val banded = pinnedKeys.select(col("_cid"), col("_cvec"),
      explode(col("_lsh_keys")).as("_key"))
    val l = banded.select(col("_key").as("_k1"), col("_cid").as("id1"),
      col("_cvec").as("_v1"))
    val r = banded.select(col("_key").as("_k2"), col("_cid").as("id2"),
      col("_cvec").as("_v2"))
    l.join(r, col("_k1") === col("_k2") && col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("cosine", cosine(col("_v1"), col("_v2")))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering the embedding space and then, WITHIN each
    * cluster, dropping every item whose cosine similarity to a lower-id
    * item of the same cluster reaches `threshold` — the deterministic
    * "keep one representative per semantic neighborhood" policy (the
    * paper keeps a random member; lowest-id is the replayable choice).
    * Returns (idCol, cluster, keep).
    *
    * Scale shape: centroid assignment is a scan-side map with the fixed
    * centroid literals compiled into the plan ([[Clustering.assignCosine]]
    * — zero shuffles); candidate pairs form only WITHIN a cluster via one
    * equality self-join on the cluster id, so the quadratic term is
    * bounded by the largest cluster — and in the paper's regime (cluster
    * count grows with the corpus, cluster size stays roughly constant)
    * the total work is linear. The drop decision is a left-semi join, so
    * no pair set is materialized past the join operator itself.
    *
    * Pair budget: that linearity is CONDITIONAL on enough clusters — with
    * O(1) clusters the self-join degenerates to O(n^2/k). The call
    * therefore enforces `maxClusterSize` (one aggregate over the
    * assignment) and FAILS with a classified error when the largest
    * cluster exceeds it, instead of silently launching a quadratic join;
    * [[semanticDedupAuto]] derives the cluster count from the corpus size
    * so the budget holds by construction. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])], threshold: Double,
      maxClusterSize: Int = 50000): DataFrame = {
    val assigned = graft.impl.Pin(
      Clustering.assignCosine(df, idCol, vecCol, centroids)
        .select(col(idCol), col("cluster")))
    val worst = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("_n")).agg(max(col("_n"))).head()
    val maxSz = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    if (maxSz > maxClusterSize) throw new IllegalStateException(
      s"semanticDedup: largest cluster holds $maxSz items " +
        s"(> maxClusterSize $maxClusterSize); the within-cluster pair " +
        "join is quadratic in cluster size — raise the cluster count " +
        "(SemDeDup uses k ~ 0.1% of n; see semanticDedupAuto) or raise " +
        "maxClusterSize explicitly")
    val withVec = df.select(col(idCol), col(vecCol)).join(assigned, idCol)
    val l = withVec.select(col("cluster").as("_sc"), col(idCol).as("_sid"),
      col(vecCol).as("_sv"))
    val r = withVec.select(col("cluster").as("_tc"), col(idCol).as("_tid"),
      col(vecCol).as("_tv"))
    val dropped = l.join(r,
        col("_sc") === col("_tc") && col("_tid") < col("_sid") &&
          cosine(col("_sv"), col("_tv")) >= threshold, "left_semi")
      .select(col("_sid").as(idCol))
    assigned
      .join(dropped.select(col(idCol), lit(true).as("_dup")), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        not(coalesce(col("_dup"), lit(false))).as("keep"))
  }

  /** [[semanticDedup]] with the cluster count derived from the corpus
    * size — SemDeDup's own regime (Abbas et al. 2023 run ~0.1% of n
    * clusters precisely so the within-cluster join stays linear overall).
    * Runs the DataFrame-native k-means ([[Clustering.kmeans]]: driver
    * state is O(k·dim) centroids only), then dedups against the fitted
    * centroids. `clusterFrac` is the k/n ratio; `minK` floors tiny
    * corpora. */
  def semanticDedupAuto(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, clusterFrac: Double = 0.001, minK: Int = 8,
      kmeansIterations: Int = 10): DataFrame = {
    val n = df.count()
    val k = math.max(minK.toLong, math.ceil(n * clusterFrac).toLong)
    require(k <= Int.MaxValue, s"derived cluster count $k exceeds Int range")
    val centers = Clustering.kmeans(df, idCol, vecCol, k.toInt,
      kmeansIterations).centers
    val centroids = centers.zipWithIndex.map { case (c, i) => i -> c.toSeq }
    semanticDedup(df, idCol, vecCol, centroids.toIndexedSeq, threshold)
  }
}
