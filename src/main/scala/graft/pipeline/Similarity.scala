package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor / similarity search over embedding columns
  * (`Array[Float]`), expressed with Spark higher-order functions so the dot
  * products run inside codegen without UDFs.
  */
object Similarity {

  /** dot(a, b) via zip_with + aggregate, computed in double. */
  def dot(a: Column, b: Column): Column =
    F.aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = F.sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Signed random hyperplane signature (SimHash-for-vectors): bit i is the
    * sign of dot(vec, plane_i). Planes are generated deterministically from
    * the seed driver-side and shipped as literals. */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p.toSeq)) > 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: probe only vectors whose hyperplane signature
    * is within `probeHamming` of the query's, then rank by exact cosine.
    * At 100 TB this turns a full scan into a bucketed lookup; recall is
    * tuned via bits/probeHamming.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, bits: Int = 16, seed: Long = 42L,
      probeHamming: Int = 2): DataFrame = {
    val dim = query.length
    val sigCol = hyperplaneSignature(col(vecCol), dim, bits, seed)
    // Query signature computed with the same planes on a literal vector.
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    var qSig = 0L
    planes.zipWithIndex.foreach { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d > 0) qSig |= (1L << i)
    }
    df.select(col(idCol), col(vecCol), sigCol.as("_sig"))
      .filter(bit_count(col("_sig").bitwiseXOR(lit(qSig))) <= probeHamming)
      .select(col(idCol), cosine(col(vecCol), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) index: k-means partitions the vector space;
    * a query probes only the nProbe nearest cells, turning a full scan
    * into a centroid lookup + bounded cell scan. The assignment frame is
    * persisted — at 100 TB it would be written out partitioned by cell so
    * cell scans prune at the file level. */
  case class IvfIndex(
      model: org.apache.spark.ml.clustering.KMeansModel,
      assigned: DataFrame, idCol: String, vecCol: String) {

    def search(query: Seq[Double], k: Int, nProbe: Int = 2): DataFrame = {
      val qArr = query.toArray
      def cos(c: Array[Double]): Double = {
        val dot = c.zip(qArr).map { case (a, b) => a * b }.sum
        val n1 = math.sqrt(c.map(x => x * x).sum)
        val n2 = math.sqrt(qArr.map(x => x * x).sum)
        if (n1 == 0 || n2 == 0) -1 else dot / (n1 * n2)
      }
      val probes = model.clusterCenters.zipWithIndex
        .sortBy { case (c, _) => -cos(c.toArray) }
        .take(nProbe).map(_._2)
      assigned
        .filter(col("_ivf_cell").isin(probes.map(Integer.valueOf): _*))
        .select(col(idCol), cosine(col(vecCol), typedLit(query)).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol))
        .limit(k)
    }
  }

  /** Build an IVF index over an embedding column. */
  def buildIvf(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = df.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol).cast(ArrayType(DoubleType))).as("_features"))
    val fitted = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("_features").setPredictionCol("_ivf_cell")
      .fit(featured)
    val assigned = fitted.transform(featured)
      .select(col(idCol), col(vecCol), col("_ivf_cell"))
      .persist()
    IvfIndex(fitted, assigned, idCol, vecCol)
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

  /** All-pairs cosine above a threshold via LSH signatures (embedding-based
    * near-duplicate detection): bucket on signature bands, verify by exact
    * cosine. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 16, seed: Long = 42L,
      dim0: Option[Int] = None): DataFrame = {
    // Embedding dimensionality: caller-supplied, else probed from the first
    // row (one cheap driver job). A wrong dim degrades the LSH silently —
    // shorter vectors hash to one bucket, longer ones hash only a prefix.
    val dim = dim0.getOrElse(
      df.select(F.size(col(vecCol)).as("_d")).filter(col("_d") > 0)
        .head(1).headOption.map(_.getInt(0)).getOrElse(1))
    val sig = hyperplaneSignature(col(vecCol), dim, bits, seed)
    val withSig = df.select(col(idCol).as("_cid"), col(vecCol).as("_cvec"),
      sig.as("_csig")).persist()
    // Band on two halves of the signature: pairs agreeing on either half.
    val banded = withSig.select(col("_cid"), col("_cvec"),
      posexplode(F.array(col("_csig").bitwiseAND(0xFF),
        shiftrightunsigned(col("_csig"), 8).bitwiseAND(0xFF))))
    val l = banded.select(col("pos").as("_b1"), col("col").as("_k1"),
      col("_cid").as("id1"), col("_cvec").as("_v1"))
    val r = banded.select(col("pos").as("_b2"), col("col").as("_k2"),
      col("_cid").as("id2"), col("_cvec").as("_v2"))
    l.join(r, col("_b1") === col("_b2") && col("_k1") === col("_k2") &&
        col("id1") < col("id2"))
      .dropDuplicates("id1", "id2")
      .withColumn("cosine", cosine(col("_v1"), col("_v2")))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }
}
