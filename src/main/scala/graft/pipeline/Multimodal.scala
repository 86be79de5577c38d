package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns plus typed metadata.
  *
  * The Spark-side mechanics (schema, batch shape, partition parallelism,
  * mapPartitions pipeline) are real; the codec step is a clearly marked
  * deterministic STUB because no image/audio libraries ship in this
  * container — swap `decodeStub` for an actual decoder (JNI/javacpp) and
  * everything else stands.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("mime", StringType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Wrap any (id, text) DataFrame into a media-shaped frame (bytes =
    * utf-8 of the text) so the pipeline below is exercisable on the
    * synthetic documents table. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      struct(lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** STUB decode: derives a deterministic fake (width, height, channels)
    * from the byte content — a plain and a position-weighted byte checksum
    * standing in for "parse the header" (chosen to be replayable by the
    * DuckDB oracle, which recomputes them over encode(text)). A real
    * implementation decodes the image header here; signature and batching
    * are what a production decoder needs. */
  private def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    // ??? — real codec goes here; deterministic fake below.
    var sum = 0L
    var wsum = 0L
    var i = 0
    while (i < content.length) {
      val b = (content(i) & 0xFF).toLong
      sum += b
      wsum += (i + 1L) * b
      i += 1
    }
    ((sum % 1920L).toInt + 1, (wsum % 1080L).toInt + 1, 3)
  }

  /** Feature extraction over media rows via mapPartitions: the partition
    * iterator shape lets a real implementation amortize codec/model init
    * per partition (exactly what Python's mapInPandas gives). Emits
    * (media_id, width, height, feature vector). */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Small parquet inputs scan as a single partition; the per-byte feature
    // loop below must not run single-core. Spread rows across the shuffle
    // parallelism first (same trap and fix as Decontaminate's gram explode).
    df.select(col("media_id").cast(LongType), col("content"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("media_id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens once here (codec/model handle)
        rows.map { case (id, content) =>
          val (w, h, _) = decodeStub(content)
          // STUB features: bit-plane densities of the byte stream.
          val feats = Array.tabulate(dim) { i =>
            if (content.isEmpty) 0.0
            else content.iterator.map(b => ((b & 0xFF) >> (i % 8)) & 1)
              .sum.toDouble / content.length
          }
          (id, w, h, feats)
        }
      }
      .toDF("media_id", "width", "height", "features")
  }

  /** 64-bit difference hash (dHash) over the raw payload bytes: bit j
    * compares the sampled byte at position p_j with its successor —
    * the gradient-hash construction image dedup uses, applied to the
    * byte stream since the codec is stubbed (a real pipeline hashes the
    * decoded, downscaled luma plane here; the bucketing/verification
    * machinery below is codec-independent). Pure column expressions:
    * binary substr comparisons are unsigned byte comparisons, so no
    * numeric conversion is needed and an external oracle replays the
    * exact bits. Equal-length payloads with few differing bytes land
    * within a small Hamming distance. */
  def dHash64(content: Column): Column = {
    val len = F.length(content)
    (0 until 64).map { j =>
      val p = (F.floor(len.cast("long") * j / 65) + 1).cast(IntegerType)
      when(content.substr(p, lit(1)) > content.substr(p + 1, lit(1)),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** (media_id, dhash) for a media frame. */
  def mediaHashes(df: DataFrame): DataFrame =
    df.select(col("media_id"), dHash64(col("content")).as("dhash"))

  /** Near-duplicate media pairs within Hamming distance `maxHamming` of
    * their dHash — the image/frame dedup pass. Same 4×16-bit band
    * bucketing as text SimHash (any pair within distance <= 3 agrees on
    * at least one band): one shuffle on (band, bucket), bit_count
    * verification on candidates, never O(n^2). */
  def nearDupMedia(df: DataFrame, maxHamming: Int = 3): DataFrame = {
    val h = mediaHashes(df)
    val banded = h.select(col("media_id"), col("dhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        j => call_function("shiftrightunsigned", col("dhash"), j * 16)
          .bitwiseAND(0xFFFFL))))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bucket")
    val l = banded.select(col("_band").as("_b1"), col("_bucket").as("_k1"),
      col("media_id").as("id1"), col("dhash").as("_h1"))
    val r = banded.select(col("_band").as("_b2"), col("_bucket").as("_k2"),
      col("media_id").as("id2"), col("dhash").as("_h2"))
    l.join(r, col("_b1") === col("_b2") && col("_k1") === col("_k2") &&
        col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("_h1"), col("_h2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("_h1").bitwiseXOR(col("_h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Frame sampling for "video" payloads: carve the byte stream into
    * fixed-size complete frames and keep every `stride`-th — done with
    * array expressions (no UDF) so it distributes and prunes like any
    * column. `frame_no` numbers the KEPT frames 0..k. A payload shorter
    * than one frame yields no rows (guarded: Spark's sequence(0, -1)
    * would otherwise produce a DESCENDING [0, -1] and emit two bogus
    * frames). */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = F.floor(F.length(col("content")) / frameBytes)
      .cast(IntegerType)
    df.select(col("media_id"),
      posexplode(F.filter(
        transform(
          when(nFrames >= 1, sequence(lit(0), nFrames - 1))
            .otherwise(array().cast(ArrayType(IntegerType))),
          i => when(i % stride === 0,
            col("content").substr(i * frameBytes + 1, lit(frameBytes))
          ).otherwise(lit(null).cast(BinaryType))),
        x => x.isNotNull)))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")
  }
}
