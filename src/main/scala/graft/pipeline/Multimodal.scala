package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, functions => F}
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
