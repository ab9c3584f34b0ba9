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

  final case class VideoFrame(doc_id: Long, frame_idx: Int, ts_ms: Long,
      byte_off: Long, n_px: Int, sum_luma: Long, min_luma: Int, max_luma: Int)

  /** Wrap a text corpus as a video-shaped table: an opaque raw-frame blob
    * plus the metadata a real video column carries (fps, frame geometry).
    * Frames are width×height single-channel "luma" planes over the UTF-8
    * bytes; per-doc fps and width vary so stride math is genuinely
    * metadata-driven row to row.
    */
  def asVideo(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      (lit(12) + (col("doc_id") % 3).cast("int") * 6).as("fps"),
      (lit(8) + (col("doc_id") % 4).cast("int") * 4).as("width"),
      lit(8).as("height"))

  /** Keyframe-style sampling over a video blob: take every `everyNth`
    * frame, emit its timeline position (exact integral ms from fps), the
    * byte offset a real decoder would seek to, and per-frame luma stats.
    * Same per-partition batch-decode dataflow as the audio op: no
    * shuffle, no driver data; only whole frames are emitted.
    */
  def videoFrames(spark: SparkSession, video: DataFrame,
      everyNth: Int): Dataset[VideoFrame] = {
    import spark.implicits._
    video.select(col("doc_id"), col("blob"), col("fps"), col("width"),
        col("height"))
      .as[(Long, Array[Byte], Int, Int, Int)]
      .mapPartitions(_.flatMap { case (id, blob, fps, w, h) =>
        val fsz = w * h
        val nFrames = if (fsz > 0) blob.length / fsz else 0
        (0 until nFrames by math.max(everyNth, 1)).iterator.map { fi =>
          val off = fi.toLong * fsz
          var sum = 0L; var mn = 255; var mx = 0
          var i = fi * fsz
          while (i < fi * fsz + fsz) {
            val v = blob(i) & 0xff
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          VideoFrame(id, fi, fi.toLong * 1000 / fps, off, fsz, sum, mn, mx)
        }
      })
  }

  final case class AudioFrame(doc_id: Long, frame_idx: Int, start_ms: Long,
      n_samples: Int, sum_sq: Long, peak: Int, zero_cross: Int, rms: Double)

  /** Wrap a text corpus as an audio-shaped table: an opaque PCM blob plus
    * the metadata a real audio column carries (sample rate, sample
    * count). The "PCM" is the UTF-8 bytes read as unsigned 8-bit samples
    * centered at 128 — a deterministic stand-in for a decoded waveform
    * (real codecs aren't in this container), with per-doc sample rates so
    * frame geometry genuinely varies row to row.
    */
  def asAudio(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      (lit(8000) + (col("doc_id") % 3).cast("int") * 4000).as("sample_rate"),
      length(col("text")).cast("int").as("n_samples"))

  /** Frame/window sampling over an audio blob: split each waveform into
    * `frameMs`-long frames advanced by `hopMs`, and emit per-frame
    * signal features (energy, peak, zero-crossing count, RMS). Only full
    * frames are emitted; frame length is derived from each row's own
    * sample rate, so the op exercises metadata-driven batch geometry.
    *
    * Dataflow: a pure per-partition map (the Arrow-batch decode shape) —
    * no shuffle, no driver data; output size is input_samples/hop rows.
    * All integer features are exact; rms is a single sqrt over an exact
    * integer ratio, so it is bit-deterministic too.
    */
  def audioFrames(spark: SparkSession, audio: DataFrame,
      frameMs: Int, hopMs: Int): Dataset[AudioFrame] = {
    import spark.implicits._
    audio.select(col("doc_id"), col("blob"), col("sample_rate"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions(_.flatMap { case (id, blob, rate) =>
        val frameLen = rate * frameMs / 1000
        val hop = rate * hopMs / 1000
        val n = blob.length
        if (n < frameLen || frameLen <= 0 || hop <= 0) Iterator.empty
        else (0 to (n - frameLen) / hop).iterator.map { fi =>
          val from = fi * hop
          var sumSq = 0L
          var peak = 0
          var zc = 0
          var i = from
          while (i < from + frameLen) {
            val s = (blob(i) & 0xff) - 128
            sumSq += s.toLong * s
            if (math.abs(s) > peak) peak = math.abs(s)
            if (i > from) {
              val p = (blob(i - 1) & 0xff) - 128
              if (p * s < 0) zc += 1
            }
            i += 1
          }
          AudioFrame(id, fi, fi.toLong * hopMs, frameLen, sumSq, peak, zc,
            math.sqrt(sumSq.toDouble / frameLen))
        }
      })
  }
}
