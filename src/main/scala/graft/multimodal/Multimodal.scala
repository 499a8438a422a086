package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.11): image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / frame-sample run as batched
  * per-partition transforms over typed Datasets (the Scala analogue
  * of `mapInPandas`: an iterator of batches in, an iterator of
  * batches out, executed where the data lives).
  *
  * The IMAGE decode path is real: `javax.imageio` ships PNG/BMP/GIF
  * readers with every JRE, so image payloads are genuinely decoded
  * (dimensions + mean luminance from pixels) inside the batched
  * kernel. Payloads no registered reader understands — e.g. the
  * synthesized text-byte corpora, or audio/video, for which the
  * container has no codecs — fall back to a clearly-marked
  * deterministic byte-level pseudo-decode, so the plumbing stays
  * testable end-to-end and swapping in an audio/video codec changes
  * nothing structurally.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      checksum: Long,
      brightness: Double, // STUB proxy: mean byte value
      n_frames_sampled: Int)

  /** Deterministic fake media derived from the documents table (the
    * harness ships no binary fixtures): payload = UTF-8 bytes of the
    * text, kind cycles by doc_id, metadata derived arithmetically. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") * 10).cast("long").as("duration_ms"))

  /** Decoded-image summary: dimensions and mean luminance (mean of
    * (R+G+B)/3 over all pixels — deterministic integer arithmetic
    * per pixel, so goldens are hand-computable). */
  final case class ImageMeta(width: Int, height: Int, meanLuma: Double)

  /** Real image decode via the pure-JDK `javax.imageio` readers
    * (PNG/BMP/GIF/JPEG are registered in every JRE). None when no
    * reader recognises the payload — corrupt bytes or a non-image
    * format; the caller falls back to the pseudo-decode. The
    * in-memory stream keeps ImageIO away from its disk cache (a
    * per-record temp file would be an executor-local I/O storm at
    * scale — see setUseCache below). */
  def decodeImage(bytes: Array[Byte]): Option[ImageMeta] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageMeta(w, h, if (n == 0) 0.0 else sum.toDouble / (3.0 * n))
        }
    } catch { case _: Exception => None }

  /** Batched decode. Images go through the REAL `javax.imageio`
    * decode (brightness = mean pixel luminance); payloads no codec
    * understands (synthesized text bytes; audio/video — the
    * container ships no codecs, clearly-marked STUB fallback) use a
    * deterministic byte-level pseudo-decode. Batch shape
    * (`batchSize` records per kernel call) mirrors Arrow-batch
    * execution: the codec is amortised over a batch, executed where
    * the data lives. */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64, framesPerVideo: Int = 4): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // === decode kernel: real ImageIO for images, STUB otherwise ===
        batch.iterator.map { m =>
          val bytes = m.payload
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
          val decoded =
            if (m.kind == "image") decodeImage(bytes) else None
          val frames =
            if (m.kind == "video") sampleFrameIndices(m.duration_ms, framesPerVideo).length
            else 0
          MediaFeatures(
            media_id = m.media_id,
            kind = m.kind,
            byte_len = bytes.length,
            checksum = sum,
            brightness = decoded.map(_.meanLuma).getOrElse(
              if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length),
            n_frames_sampled = frames)
        }
      }
    }
  }

  /** Uniform frame-sampling positions over a clip (ms offsets). */
  def sampleFrameIndices(durationMs: Long, n: Int): Seq[Long] =
    if (durationMs <= 0 || n <= 0) Seq.empty
    else (0 until n).map(i => i * durationMs / n)

  /** "Resize": STUB that rewrites metadata only (a codec would
    * transcode payload); keeps schema + nullability intact. */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("width", lit(w)).withColumn("height", lit(h))
}
