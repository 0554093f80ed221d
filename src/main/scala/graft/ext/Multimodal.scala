package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract runs as a partition-wise batch operator.
  *
  * The actual media codecs are NOT available in this environment, so
  * `fakeDecode` stands in for the decoder: a deterministic, content-hash
  * driven featurizer with the same signature and batch shape a real
  * decoder (libjpeg / ffmpeg behind a JNI or Pandas-UDF bridge) would
  * have. Everything around it — schema, partition batching, metadata
  * propagation, feature column layout — is real and tested.
  */
object Multimodal {

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
