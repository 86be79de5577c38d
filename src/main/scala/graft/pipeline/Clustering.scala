package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-space clustering for corpus curation: topic bucketing,
  * domain-mix balancing, diversity-aware sampling all start from "assign
  * every document vector to a cluster".
  *
  * Two entry points: [[assignCosine]] scores rows against a FIXED
  * centroid set (the serving-time shape — centroids come from a prior
  * training job and broadcast as literals, so assignment is a pure
  * scan-side map with no shuffle), and [[kmeans]] trains centroids with
  * Lloyd's algorithm as a sequence of DataFrame jobs (the index-build
  * shape — same iterative skeleton as [[graft.algos.GraphAlgorithms]]).
  */
object Clustering {

  /** Assign each row to the centroid with the highest cosine similarity
    * (ties -> lowest centroid id). Returns (idCol, cluster, cosine).
    *
    * Scale shape: centroids are literals compiled into the plan — one
    * fused codegen loop per centroid (the native [[graft.functions.CosineSimilarity]]
    * expression), argmax via an array-of-structs max, zero shuffles and
    * zero extra scans. For centroid counts beyond a few hundred, switch
    * to the dense mapPartitions path [[kmeans]] uses internally. */
  def assignCosine(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    require(centroids.nonEmpty, "assignCosine needs >= 1 centroid")
    // struct ordering compares cosine first, then -id: max = highest
    // cosine, ties broken toward the LOWEST centroid id.
    val scored = centroids.map { case (cid, c) =>
      struct(Similarity.cosine(col(vecCol), typedLit(c)).as("c"),
        lit(-cid).as("negid"))
    }
    val best = array_max(F.array(scored: _*))
    df.select(col(idCol),
      (-best.getField("negid")).cast(LongType).as("cluster"),
      round(best.getField("c"), 4).as("cosine"))
  }

  /** Result of [[kmeans]]: final centers (cluster -> vector) and the
    * assignment frame (idCol, cluster). */
  case class KMeansResult(centers: Array[Array[Double]],
      assignments: DataFrame)

  /** Nearest-centroid (squared Euclidean) assignment via a per-partition
    * dense argmin — k*dim multiply-adds per row in tight primitive loops.
    * The Column formulation needs k struct columns and falls out of
    * whole-stage codegen for large k; dense linear algebra is the
    * documented mapPartitions exception (same call as
    * [[Similarity]]'s bandKeyFrame). Embarrassingly parallel, no shuffle.
    * Output: (_km_cluster int, _km_v array<double>). */
  private def assignDense(in: DataFrame, centers: Array[Array[Double]])
      : DataFrame = {
    val out = StructType(Seq(
      StructField("_km_cluster", IntegerType, nullable = false),
      StructField("_km_v", ArrayType(DoubleType), nullable = true)))
    in.mapPartitions { it =>
      it.map { r =>
        val v = r.getSeq[Double](1).toArray
        Row(nearest(v, centers), v.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(out))
  }

  /** Index of the squared-Euclidean-nearest center (first wins on exact
    * ties — deterministic because the center order is). */
  private def nearest(v: Array[Double], centers: Array[Array[Double]]): Int = {
    var bestC = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < centers.length) {
      val c = centers(j)
      val n = math.min(v.length, c.length)
      var d = 0.0
      var i = 0
      while (i < n) { val t = v(i) - c(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; bestC = j }
      j += 1
    }
    bestC
  }

  /** Lloyd's k-means over an embedding column, squared-Euclidean metric,
    * deterministic seeding (the k rows with the smallest ids — stable
    * across partitionings, unlike a sampled init). Stops when no center
    * moves more than `tol` (L2) or after `maxIterations`.
    *
    * Scale shape per iteration: one shuffle-free dense assignment pass
    * (mapPartitions argmin) + one position-explode aggregation whose
    * output is k*dim rows (map-side combined — the full vector set never
    * shuffles), collected to the driver (k*dim doubles, O(kilobytes)).
    * The input is scanned once per iteration from its pinned projection;
    * nothing iterative accumulates lineage. This is the same job shape
    * Spark ML's KMeans runs, kept DataFrame-native so the assignment
    * output composes with the rest of the pipeline (and so the seeding
    * is reproducible for tests). */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIterations: Int = 10, tol: Double = 1e-6): KMeansResult = {
    require(k >= 1, "k >= 1")
    val in = graft.impl.Pin(
      df.select(col(idCol), col(vecCol).cast(ArrayType(DoubleType)).as("_v")))
    var centers: Array[Array[Double]] = in
      .orderBy(col(idCol)).limit(k)
      .select(col("_v")).collect().map(_.getSeq[Double](0).toArray)
    var moved = Double.MaxValue
    var it = 0
    while (moved > tol && it < maxIterations) {
      val sums = assignDense(in, centers)
        .select(col("_km_cluster"), posexplode(col("_km_v")).as(Seq("_p", "_x")))
        .groupBy(col("_km_cluster"), col("_p"))
        .agg(avg(col("_x")).as("_m"))
        .collect()
      val next = centers.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      moved = centers.zip(next).map { case (a, b) =>
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.max
      centers = next
      it += 1
    }
    KMeansResult(centers, finalAssign(in, centers, idCol))
  }

  /** Final (idCol, cluster) frame for a fixed center set — one more
    * shuffle-free dense pass. */
  private def finalAssign(in: DataFrame, centers: Array[Array[Double]],
      idCol: String): DataFrame = {
    val idField = in.schema(idCol)
    val out = StructType(Seq(
      StructField(idCol, idField.dataType, idField.nullable),
      StructField("cluster", IntegerType, nullable = false)))
    in.mapPartitions { it =>
      it.map { r =>
        Row(r.get(0), nearest(r.getSeq[Double](1).toArray, centers))
      }
    }(org.apache.spark.sql.Encoders.row(out))
  }
}
