package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata, processed batch-at-a-time
  * inside partitions. The actual media decode is a clearly-marked stub
  * (this container ships no image/audio codecs) — everything Spark-
  * side (schema, partition-local batching, output shape, metadata
  * propagation) is real and tested.
  *
  * Scale design: payload bytes never pass through a shuffle — the
  * decode/featurize step is `mapPartitions` (narrow, no exchange), and
  * downstream joins/aggregations happen on the extracted fixed-size
  * features, not the blobs. Partition sizing is the reader's
  * `maxPartitionBytes` concern; rows stay self-contained.
  */
object MultimodalOps {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", IntegerType, nullable = false),
      StructField("sha", StringType, nullable = false),
      StructField("mime", StringType, nullable = false))), nullable = false)))

  /** Wrap a text corpus as fake media rows: payload = UTF-8 bytes,
    * metadata derived with native expressions.
    */
  def asMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        length(col(textCol).cast(BinaryType)).as("byte_len"),
        sha2(col(textCol).cast(BinaryType), 256).as("sha"),
        lit("application/octet-stream").as("mime")).as("meta"))

  final case class MediaFeatures(media_id: Long, byte_len: Int, features: Array[Float])

  /** STUB — the real decoder would parse the payload with an image/
    * audio library here. Deterministic fake: 8 features, each the mean
    * of one byte-range octile. Keeps the exact batch shape (bytes in,
    * fixed-size float vector out) a Pandas-UDF/`mapInPandas` decode
    * would have.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val dim = 8
    if (payload == null || payload.isEmpty) return Array.fill(dim)(0f)
    val out = new Array[Float](dim)
    val chunk = math.max(1, payload.length / dim)
    var j = 0
    while (j < dim) {
      val from = j * chunk
      val to = math.min(payload.length, from + chunk)
      var s = 0L; var i = from
      while (i < to) { s += payload(i) & 0xff; i += 1 }
      out(j) = if (to > from) s.toFloat / (to - from) else 0f
      j += 1
    }
    out
  }

  /** Partition-local featurize: the decode boundary runs once per
    * partition over an iterator of rows (batch shape), never on the
    * driver; output is a typed Dataset of fixed-size vectors.
    */
  def featurize(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.byte_len").as("byte_len"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions(_.map { case (id, payload, len) =>
        MediaFeatures(id, len, decodeStub(payload))
      })
  }

  /** "Frame sampling": `n` evenly-spaced fixed-width byte slices of
    * the payload (the video-keyframe access pattern), as a pure
    * column expression over binary. Positions are explicit integer
    * arithmetic (floor division) so the q82 oracle mirrors them
    * exactly.
    */
  def frameSample(payload: org.apache.spark.sql.Column, n: Int, width: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(n - 1)), i => {
      val pos = floor((i * greatest(length(payload) - width, lit(1))) / n)
        .cast("int") + 1
      payload.substr(pos, lit(width))
    })

  /** STUB — "resize": a real implementation decodes, rescales pixels,
    * re-encodes. Deterministic fake with the real op's contract: fixed
    * `targetLen` output regardless of input size, order-preserving
    * even-stride byte sample (content shorter than the target is
    * cycled). Runs in the same partition-local tier as [[decodeStub]].
    */
  def resizeStub(payload: Array[Byte], targetLen: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty) return new Array[Byte](targetLen)
    val out = new Array[Byte](targetLen)
    var j = 0
    while (j < targetLen) {
      out(j) = payload((j.toLong * payload.length / targetLen).toInt % payload.length)
      j += 1
    }
    out
  }

  /** Partition-local resize over media rows: payload replaced by its
    * fixed-size form, metadata re-derived. Same no-shuffle contract as
    * [[featurize]] — blobs never cross an exchange.
    */
  def resize(spark: SparkSession, media: DataFrame, targetLen: Int): DataFrame = {
    import spark.implicits._
    val resized = media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, resizeStub(p, targetLen)) })
      .toDF("media_id", "payload")
    resized.select(
      col("media_id"),
      col("payload"),
      struct(
        length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("sha"),
        lit("application/octet-stream").as("mime")).as("meta"))
  }
}
