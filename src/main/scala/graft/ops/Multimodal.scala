package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, batch-decoded per partition.
  *
  * The decode step is a STUB — image/audio codecs are not in this
  * container — but the Spark-side shape is real and tested: a binary
  * column + metadata struct, a per-partition batch map (the same shape a
  * vectorized/Arrow decode would use), and a typed feature output that
  * downstream similarity/dedup operators consume.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, blob: Array[Byte],
      media_type: String, n_bytes: Int)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      checksum: Long, mean_byte: Double, features: Array[Float])

  /** Wrap a text corpus as a binary "media" table (UTF-8 blobs) with
    * metadata — the schema a real image/audio table would have.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      lit("text/plain;charset=utf-8").as("media_type"),
      length(col("text")).cast("int").as("n_bytes"))

  /** STUB decoder: deterministic features from raw bytes, standing in for
    * a real decode/resize/embed. Keeps the rolling-hash checksum
    * compatible with TextOps.fingerprint so the binary path is
    * oracle-checkable end to end.
    */
  def decodeStub(bytes: Array[Byte]): MediaFeatures = {
    var h = 0L
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % TextOps.FingerprintMod
      sum += bytes(i) & 0xff
      i += 1
    }
    val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    // fake 4-dim "embedding": byte-quartile means (a real decoder would
    // emit a model embedding here)
    val q = bytes.length / 4
    val feats = (0 until 4).map { j =>
      val from = j * q
      val until = if (j == 3) bytes.length else (j + 1) * q
      var s = 0L
      var k = from
      while (k < until) { s += bytes(k) & 0xff; k += 1 }
      if (until > from) (s.toDouble / (until - from)).toFloat else 0f
    }.toArray
    MediaFeatures(-1L, bytes.length, h, mean, feats)
  }

  /** Batch feature extraction: one decode pass per partition (the shape
    * an Arrow-batched decoder needs — stable batching, no driver data).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("blob")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        decodeStub(blob).copy(doc_id = id)
      })
  }
}
