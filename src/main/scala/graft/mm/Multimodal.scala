package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, plus a batched feature-extraction
  * operator.
  *
  * Decode status: image and PCM containers have REAL from-scratch
  * decoders — [[WavCodec]] (RIFF/WAVE PCM, chunk-walking), [[BmpCodec]]
  * (24-bit BMP, stride-honoring), [[PngCodec]] (full RFC-1951 inflate +
  * unfilter) and [[JpegCodec]] (baseline T.81: markers, Annex K Huffman
  * tables, integer IDCT) — all oracle-gated (`q_wav_decode`,
  * `q_bmp_decode`, `q_png_decode`, `q_jpeg_decode`) and spec-pinned.
  * Only the AUDIO/VIDEO compressed codecs (MP3/H.264) remain behind
  * this stub seam: [[StubDecoder]] is a deterministic fake standing in
  * for the JNI/native decoder a production cluster ships.
  * Everything around it — the schema contract, the per-partition
  * batching, the fixed batch shape a vectorized decoder would need, the
  * resulting feature schema — is real Spark plumbing and is what the
  * tests pin.
  *
  * Scale notes: `mapPartitions` keeps one decoder instance per partition
  * (the expensive init a real decoder has), processes rows in bounded
  * batches (decoder memory stays constant regardless of partition size),
  * and emits a typed Dataset so downstream ops stay columnar. Media blobs
  * never pass through a shuffle here — feature extraction is a narrow map.
  */
object Multimodal {

  /** A media row: opaque payload + the metadata a real pipeline carries. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features: what a vision/audio encoder front-end would emit. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int, // stub: derived dims a real decoder would parse
      height: Int,
      n_frames: Int, // frame-sampling plumbing (video/audio windows)
      mean_byte: Double, // stand-in for a pooled feature
      feature: Array[Float]) // stand-in for an embedding

  val BatchSize = 64
  val FeatureDim = 8

  /** Deterministic fake decoder — replace with a real JNI decoder. Decodes
    * "dims" from the payload header and pools bytes into a feature vector.
    */
  object StubDecoder {
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { r =>
      val b = r.payload
      val len = b.length.toLong
      val w = 1 + (if (b.length > 0) (b(0) & 0xff) else 0) % 64
      val h = 1 + (if (b.length > 1) (b(1) & 0xff) else 0) % 64
      val frames = (b.length + 255) / 256
      val mean = if (b.isEmpty) 0.0 else b.map(_ & 0xff).map(_.toLong).sum.toDouble / b.length
      val feat = Array.tabulate(FeatureDim) { k =>
        var acc = 0L
        var i = k
        while (i < b.length) { acc += (b(i) & 0xff); i += FeatureDim }
        (acc % 1000).toFloat / 1000f
      }
      MediaFeatures(r.media_id, r.kind, len, w, h, frames, mean, feat)
    }
  }

  /** Batched per-partition feature extraction. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one decoder init per partition; bounded batches through it
      rows.grouped(BatchSize).flatMap(batch => StubDecoder.decodeBatch(batch))
    }
  }

  /** Documents → fake media table (text bytes as the opaque payload). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th one — the video/audio windowing primitive. Pure
    * columnar ops (sequence + transform over binary substring), so the
    * sampling itself never leaves codegen; only the kept frames move
    * downstream. */
  def frameSample(media: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col("payload")) / frameBytes.toDouble).cast("int")
    // Empty payload → zero frames (unguarded, sequence(0, -1) would run
    // descending and leak one empty frame through the stride filter).
    media.withColumn(
      "frames",
      when(
        nFrames > 0,
        transform(
          filter(sequence(lit(0), nFrames - 1), i => i % stride === 0),
          i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
        .otherwise(array().cast("array<binary>")))
  }

}
