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
  * The container has no image/audio codecs, so the decode kernel is
  * a clearly-marked deterministic STUB (byte-level pseudo-decode);
  * everything around it — schema, batch shape, partitioning, the
  * Dataset plumbing — is real and tested, and swapping the stub for
  * a JNI/codec call changes nothing structurally.
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

  /** Batched pseudo-decode. STUB: a real implementation feeds each
    * batch of payloads to a codec (JPEG decode, PCM resample, …);
    * here the "decode" reads bytes deterministically so the
    * plumbing is testable end-to-end. Batch shape (`batchSize`
    * records per kernel call) mirrors Arrow-batch execution. */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64, framesPerVideo: Int = 4): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // === STUB decode kernel (codec would be invoked per batch) ===
        batch.iterator.map { m =>
          val bytes = m.payload
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
          val frames =
            if (m.kind == "video") sampleFrameIndices(m.duration_ms, framesPerVideo).length
            else 0
          MediaFeatures(
            media_id = m.media_id,
            kind = m.kind,
            byte_len = bytes.length,
            checksum = sum,
            brightness = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
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
