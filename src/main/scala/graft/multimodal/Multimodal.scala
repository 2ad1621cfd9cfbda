package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/
  * video as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / frame-sample operators over them.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in
  * this container): [[StubDecoder]] derives deterministic pseudo
  * features from the bytes. The Spark-side plumbing — schema, binary
  * batching through mapPartitions, per-partition decoder init, output
  * shape — is real and is what a libjpeg/ffmpeg-backed decoder would
  * drop into.
  *
  * Scale posture: binaries never pass through a shuffle (decode is a
  * narrow map); feature vectors, not blobs, flow downstream. Real
  * deployments put blobs behind a lake-house pointer column; the
  * operator contract is unchanged.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),        // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType))))))

  /** Decoder contract: bytes → fixed-width feature vector. Real
    * implementations (JPEG decode + resize + channel stats, PCM frame
    * energies, video keyframes) implement this same trait. */
  trait MediaDecoder extends Serializable {
    def init(): Unit = ()
    def features(kind: String, payload: Array[Byte]): Array[Float]
    def frameCount(kind: String, payload: Array[Byte]): Int
  }

  /** STUB decoder: deterministic byte-statistics pseudo-features.
    * Replace with a codec-backed decoder in production — everything
    * around it (partitioning, init-once, schema) stays identical. */
  final class StubDecoder(dim: Int = 8) extends MediaDecoder {
    override def features(kind: String, payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      if (payload.length > 0) out.indices.foreach(j => out(j) /= payload.length)
      out
    }
    override def frameCount(kind: String, payload: Array[Byte]): Int =
      kind match {
        case "video" => math.max(1, payload.length / 64)
        case "audio" => math.max(1, payload.length / 16)
        case _       => 1
      }
  }

  /** Build a media table from any table with an id and a string
    * column (test fixture: bytes = utf-8 of the text). */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3L)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        concat(lit("application/x-demo-"), col("kind")).as("mime"),
        length(col("payload")).cast("long").as("n_bytes")))

  /** Decode + feature-extract through mapPartitions with one decoder
    * init per partition (the model-inference shape). */
  def extractFeatures(media: DataFrame,
                      make: () => MediaDecoder = () => new StubDecoder()): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType),
      StructField("n_frames", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val idI = media.schema.fieldIndex("media_id")
    val kI  = media.schema.fieldIndex("kind")
    val pI  = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      val dec = make(); dec.init()
      it.map { r =>
        val kind = r.getString(kI)
        val bytes = r.getAs[Array[Byte]](pI)
        Row(r.getLong(idI), kind, bytes.length.toLong,
          dec.frameCount(kind, bytes), dec.features(kind, bytes))
      }
    }(Encoders.row(schema))
  }

  /** Frame sampling for video/audio rows: every `stride`-th frame
    * index up to `maxFrames` (array column, no blob duplication). */
  def sampleFrames(featured: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    featured.withColumn("frame_idx",
      when(col("n_frames") > 1,
        slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames))
        .otherwise(array(lit(0))))
}
