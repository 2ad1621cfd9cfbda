package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/
  * video as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / frame-sample operators over them.
  *
  * IMAGE decode is REAL: payloads are PNG/JPEG bytes produced by the
  * JDK's ImageIO codec, and [[ImageCodec.parseHeader]] recovers
  * width/height/channels from the public file-format structure (PNG
  * IHDR chunk, JPEG SOFn segment) by direct byte parsing. Audio/video
  * decode remains a clearly-marked STUB ([[StubDecoder]], no PCM/
  * ffmpeg in this container) — the mapPartitions plumbing around both
  * is identical and is what a full codec drops into.
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

  /** Real image bytes + header parsing, pure JVM.
    *
    * Encoding uses the JDK's ImageIO (an actual PNG/JPEG codec);
    * parsing reads the public file-format structure directly:
    * PNG — 8-byte signature, then the IHDR chunk (length + "IHDR" +
    * 4-byte BE width, 4-byte BE height, bit depth, color type);
    * JPEG — FFD8 SOI, then marker segments with 2-byte BE lengths,
    * dimensions in the first SOFn frame header (precision, height,
    * width, component count). */
  object ImageCodec {
    def encodePng(w: Int, h: Int, gray: Boolean): Array[Byte] = encode("png", w, h, gray)
    def encodeJpeg(w: Int, h: Int, gray: Boolean): Array[Byte] = encode("jpg", w, h, gray)

    private def encode(fmt: String, w: Int, h: Int, gray: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }

    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    // SOF0–SOF15 carry frame dimensions, except DHT/JPG/DAC (C4/C8/CC)
    private def isSof(m: Int): Boolean =
      m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

    /** (format, width, height, channels); (-1, -1, -1) dims when the
      * bytes are not a parseable PNG/JPEG. */
    def parseHeader(b: Array[Byte]): (String, Int, Int, Int) = {
      if (b.length >= 26 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
          b(2) == 'N' && b(3) == 'G') {
        val w = be32(b, 16); val h = be32(b, 20)
        val channels = (b(25) & 0xff) match {
          case 0 => 1 // grayscale
          case 2 => 3 // truecolor
          case 3 => 1 // palette
          case 4 => 2 // gray + alpha
          case 6 => 4 // truecolor + alpha
          case _ => -1
        }
        ("png", w, h, channels)
      } else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 9 < b.length) {
          if ((b(i) & 0xff) != 0xff) i += 1 // fill bytes between segments
          else {
            val marker = b(i + 1) & 0xff
            if (marker == 0xff) i += 1 // padding FF
            else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
              i += 2 // standalone marker, no length field
            } else if (isSof(marker)) {
              // len(2) precision(1) height(2) width(2) components(1)
              return ("jpeg", be16(b, i + 7), be16(b, i + 5), b(i + 9) & 0xff)
            } else i += 2 + be16(b, i + 2)
          }
        }
        ("jpeg", -1, -1, -1)
      } else ("unknown", -1, -1, -1)
    }
  }

  /** Decoder over REAL image payloads: header-parsed
    * [width, height, channels] features for images, stub features for
    * the (codec-less) audio/video kinds. */
  final class ImageHeaderDecoder(fallback: MediaDecoder = new StubDecoder())
      extends MediaDecoder {
    override def features(kind: String, payload: Array[Byte]): Array[Float] =
      if (kind == "image") {
        val (_, w, h, ch) = ImageCodec.parseHeader(payload)
        Array(w.toFloat, h.toFloat, ch.toFloat)
      } else fallback.features(kind, payload)
    override def frameCount(kind: String, payload: Array[Byte]): Int =
      if (kind == "image") 1 else fallback.frameCount(kind, payload)
  }

  /** Deterministic image-table recipe shared by the builders and the
    * oracles: dims/colorspace/format all derive from the id, so SQL
    * can predict exactly what header parsing must recover. */
  def imgWidth(id: Long): Int = 16 + (id % 17).toInt
  def imgHeight(id: Long): Int = 12 + (id % 13).toInt
  def imgGray(id: Long): Boolean = id % 5 == 0
  def imgPng(id: Long): Boolean = id % 2 == 0

  private def imageBytes(id: Long): Array[Byte] = {
    val (w, h, g) = (imgWidth(id), imgHeight(id), imgGray(id))
    if (imgPng(id)) ImageCodec.encodePng(w, h, g)
    else ImageCodec.encodeJpeg(w, h, g)
  }

  /** Media table with REAL image payloads (ImageIO-encoded PNG/JPEG,
    * one per input id). Narrow map — encode happens executor-side. */
  def imageMedia(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("payload", BinaryType)))
    df.select(col(idCol).cast("long")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, "image", imageBytes(id))
      }
    }(Encoders.row(schema))
  }

  /** Header decode as a standalone per-row operator: (media_id, fmt,
    * width, height, channels) parsed from the payload bytes. */
  def decodeHeaders(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("fmt", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType)))
    val idI = media.schema.fieldIndex("media_id")
    val pI  = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.map { r =>
        val (fmt, w, h, ch) = ImageCodec.parseHeader(r.getAs[Array[Byte]](pI))
        Row(r.getLong(idI), fmt, w, h, ch)
      }
    }(Encoders.row(schema))
  }

  /** Mixed media table: image rows (id ≡ 0 mod 3) carry REAL encoded
    * PNG/JPEG payloads; audio/video rows keep the utf-8 stub payloads
    * (no PCM/video codec in this container). */
  def mixedMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("payload", BinaryType)))
    df.select(col(idCol).cast("long"), col(textCol)).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val payload =
          if (kind == "image") imageBytes(id)
          else r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        Row(id, kind, payload)
      }
    }(Encoders.row(schema))
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
