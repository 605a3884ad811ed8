package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; per-asset compute runs batched inside `mapPartitions` (the
  * JVM analogue of Arrow-batched pandas UDFs — same batch shape, schema
  * in/schema out).
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED: this container has no image/audio libraries, so `decodeStub`
  * derives deterministic fake dimensions/features from the bytes. The
  * Spark-side contract — schema, batching, partitioning, null handling —
  * is real and tested; swap `decodeStub` for a real codec at deployment.
  */
object Multimodal {

  /** Canonical media-asset schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  /** Rows processed per batch inside mapPartitions — the Arrow-batch
    * analogue; bounds per-task peak memory independent of partition size.
    */
  val BatchSize = 64

  // ====================================================================
  // STUB: deterministic fake decode. A real deployment replaces this with
  // an actual codec (e.g. TwelveMonkeys/JavaCV); everything else stands.
  // ====================================================================
  private[multimodal] def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    if (bytes == null || bytes.isEmpty) return (0, 0)
    var h = 0L
    var i = 0
    while (i < math.min(bytes.length, 256)) {
      h = (h * 31 + (bytes(i) & 0xff)) & 0x7fffffffL
      i += 1
    }
    (16 + (h % 624).toInt, 16 + ((h / 624) % 464).toInt)
  }

  /** Decode pass: fills meta.width/height from the media bytes. Batched
    * mapPartitions; schema (asset_id, media_type, width, height, n_bytes).
    */
  def decodeMeta(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select("asset_id", "media_type", "media")
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val (w, h) = decodeStub(bytes)
            Row(r.getLong(0), r.getString(1), w, h,
              if (bytes == null) 0L else bytes.length.toLong)
          }
        }
      }(enc)
  }

  /** Feature-extract pass: a deterministic 16-bin byte histogram as the
    * "embedding" (stands in for a vision encoder; batch shape is what
    * matters). Output: (asset_id, features array<float>).
    */
  def extractFeatures(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select("asset_id", "media")
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("media")
            val hist = new Array[Float](16)
            if (bytes != null && bytes.nonEmpty) {
              bytes.foreach(b => hist((b & 0xff) / 16) += 1f)
              val n = bytes.length.toFloat
              var i = 0
              while (i < 16) { hist(i) /= n; i += 1 }
            }
            Row(r.getLong(0), hist.toSeq)
          }
        }
      }(enc)
  }

  /** Resize pass (STUB): records the target box; a real impl rescales
    * pixels. Kept as a column transform to show where it plugs in.
    */
  def resize(df: DataFrame, maxW: Int, maxH: Int): DataFrame =
    decodeMeta(df)
      .withColumn("scale",
        least(lit(1.0), lit(maxW) / col("width"), lit(maxH) / col("height")))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))

  /** Frame-sample pass (STUB): every nth "frame" index up to a fake frame
    * count derived from size; real impl samples video frames. Shows the
    * one-to-many explode shape.
    */
  def sampleFrames(df: DataFrame, everyN: Int): DataFrame =
    decodeMeta(df)
      .withColumn("n_frames", (col("n_bytes") / 1024 + 1).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
      .select("asset_id", "frame_idx", "n_frames")
}
