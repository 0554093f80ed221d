package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract runs as a partition-wise batch operator.
  *
  * IMAGE decode is REAL: `javax.imageio` ships PNG/JPEG/BMP/GIF readers
  * with the JDK, so [[decodeImage]]/[[imageFeatures]] run an actual
  * codec — dimensions, channel count, and a downsampled luma histogram
  * per payload, with bounded per-row work. Audio/video codecs are NOT
  * available in this environment, so for those modalities [[fakeDecode]]
  * remains the documented stand-in: a deterministic content-hash
  * featurizer with the same signature and batch shape a real decoder
  * (ffmpeg behind a JNI or Pandas-UDF bridge) would have.
  */
object Multimodal {

  // no disk-backed ImageIO stream cache on executors (object init runs
  // once per JVM that touches any decode closure)
  javax.imageio.ImageIO.setUseCache(false)

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Wrap a text table into a media table (payload = utf-8 bytes) — the
    * test stand-in for reading real blobs. */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        col(sourceCol).cast("string").as("source")).as("meta"))

  /** STUB DECODER: deterministic fake features from the payload bytes.
    * A real deployment swaps ONLY this function for a codec call; the
    * partition-wise batch loop and output schema stay identical. */
  def fakeDecode(payload: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      out(i % dim) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    // mix the rolling hash into the tail slot so equal-histogram payloads
    // with different byte order still differ
    out(dim - 1) += math.abs(h % 1000L) / 1000.0
    out
  }

  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** Real per-payload image features from the JDK's built-in readers. */
  final case class ImageFeatures(width: Int, height: Int, channels: Int,
      lumaHist: Array[Double])

  /** Decode one image payload with `javax.imageio` (PNG/JPEG/BMP/GIF —
    * the readers bundled with the JDK). Returns None for null/empty or
    * undecodable payloads. Features: pixel dimensions, raster band
    * count, and an ITU-R BT.601 luma histogram over a strided pixel
    * sample capped at ~4096 pixels, so per-row cost is bounded no
    * matter the image size (the 100 TB discipline: no row's decode can
    * stall a task on a pathological payload). */
  def decodeImage(payload: Array[Byte], histBins: Int = 16): Option[ImageFeatures] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val channels = img.getRaster.getNumBands
    val stride = math.max(1, math.sqrt(w.toDouble * h / 4096.0).toInt)
    val hist = new Array[Double](histBins)
    var n = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        val bin = math.min((luma / 256.0 * histBins).toInt, histBins - 1)
        hist(bin) += 1.0
        n += 1
        x += stride
      }
      y += stride
    }
    var i = 0
    while (i < histBins) { hist(i) /= n.toDouble; i += 1 }
    Some(ImageFeatures(w, h, channels, hist))
  }

  val ImageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("luma_hist", ArrayType(DoubleType, containsNull = false))))

  /** Partition-wise REAL image decode over a media table: same streaming
    * batch shape as [[decodeFeatures]], but each payload goes through
    * `javax.imageio`. Undecodable payloads keep their row with
    * decode_ok = false and null features (a dropped row would silently
    * shrink the corpus; a visible flag lets the pipeline route failures). */
  def imageFeatures(media: DataFrame, histBins: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload"),
        col("meta.mime"), col("meta.n_bytes")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          decodeImage(payload, histBins) match {
            case Some(f) =>
              Row(r.getLong(0), r.getString(2), r.getLong(3), true,
                f.width, f.height, f.channels, f.lumaHist.toSeq)
            case None =>
              Row(r.getLong(0), r.getString(2), r.getLong(3), false,
                null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, ImageFeatureSchema)
  }

  /** Deterministic tiny-PNG synthesis from a text column — the test/
    * bench stand-in for a real blob store of images (the environment
    * ships no image corpus). Each doc becomes a (4 + id%13)-wide,
    * (4 + id%7)-tall RGB image whose pixels cycle through the text's
    * utf-8 bytes, PNG-encoded (lossless, so decode features are exact
    * functions of the content). Runs partition-wise like any decode. */
  def synthesizePng(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select(col(idCol).cast("long"), col(textCol).cast("string")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getString(1)).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val w = 4 + (id % 13).toInt
          val h = 4 + (id % 7).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var p = 0
          while (p < w * h) {
            def b(i: Int): Int =
              if (bytes.isEmpty) 0 else bytes(((p * 3 + i) % bytes.length)) & 0xff
            img.setRGB(p % w, p / w, (b(0) << 16) | (b(1) << 8) | b(2))
            p += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          val payload = baos.toByteArray
          Row(id, payload, Row("image/png", payload.length.toLong, "synth"))
        }
      }
    spark.createDataFrame(rdd, MediaSchema)
  }

  /** Partition-wise decode: one batch loop per partition (the Scala
    * analog of `mapInPandas` — rows stream through without collecting
    * the partition). */
  def decodeFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("payload"),
        col("meta.mime"), col("meta.n_bytes")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          Row(r.getLong(0), r.getString(2), r.getLong(3),
            fakeDecode(if (payload == null) Array.empty[Byte] else payload, dim).toSeq)
        }
      }
    spark.createDataFrame(rdd, FeatureSchema)
  }
}
