package graft

import org.apache.spark.sql.functions.lit

import graft.multimodal.Multimodal

/** Audio fingerprint (audioHash64) invariance and the pair operator:
  * the fingerprint's value is that an identical, gain-scaled, or
  * resampled copy of a clip collides while unrelated audio does not
  * — exactly the dHash contract carried to PCM. */
class AudioFingerprintSpec extends SparkTestBase {
  import spark.implicits._

  /** Mono 16-bit LE PCM WAV from raw sample values. */
  private def wav(samples: Array[Short], rate: Float = 16000f): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** A deterministic "melody": per-window amplitude ramps that give
    * every adjacent-window comparison a decisive winner. */
  private def clip(seed: Int, n: Int = 6500): Array[Short] =
    Array.tabulate(n) { i =>
      val w = i * 65 / n
      val amp = 200 + 150 * (((w * 31 + seed * 17) % 11) - 5)
      (if (i % 2 == 0) amp else -amp).toShort
    }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("identical clip -> identical hash; unrelated clips far apart") {
    val a = Multimodal.audioHash64(wav(clip(1))).get
    val a2 = Multimodal.audioHash64(wav(clip(1))).get
    val b = Multimodal.audioHash64(wav(clip(2))).get
    assert(a == a2)
    assert(hamming(a, b) > 10, s"unrelated clips too close: ${hamming(a, b)}")
  }

  test("uniform gain scaling is hash-invariant (adjacent-mean comparison)") {
    val base = clip(3)
    val half = base.map(s => (s / 2).toShort)
    val loud = base.map(s => (s * 2).toShort) // amps <= 950, no clipping
    val h0 = Multimodal.audioHash64(wav(base)).get
    assert(Multimodal.audioHash64(wav(half)).get == h0)
    assert(Multimodal.audioHash64(wav(loud)).get == h0)
  }

  test("2x resample (sample duplication) is hash-invariant (time-normalized windows)") {
    val base = clip(4)
    val up = base.flatMap(s => Array(s, s))
    val h0 = Multimodal.audioHash64(wav(base)).get
    assert(Multimodal.audioHash64(wav(up, 32000f)).get == h0)
  }

  test("undecodable, short, and oversized payloads return None") {
    assert(Multimodal.audioHash64("not audio".getBytes).isEmpty)
    assert(Multimodal.audioHash64(wav(Array.fill[Short](64)(100))).isEmpty)
  }

  test("audioNearDupPairs finds planted copy pairs and nothing else") {
    val rows = Seq(
      (1L, wav(clip(10))), (2L, wav(clip(10).map(s => (s / 2).toShort))),
      (3L, wav(clip(20))), (4L, wav(clip(20).flatMap(s => Array(s, s)))),
      (5L, wav(clip(30))), (6L, wav(clip(40))))
    val media = rows.toDF("media_id", "payload").withColumn("kind", lit("audio"))
    val got = Multimodal.audioNearDupPairs(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }
}
