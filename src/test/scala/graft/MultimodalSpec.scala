package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media =
    Multimodal.synthesize(Tables.documents(spark, sfDir))

  test("synthesized media schema: binary payload + typed metadata") {
    val f = media.schema.fields.map(x => x.name -> x.dataType.simpleString).toMap
    assert(f("payload") == "binary")
    assert(f("kind") == "string")
    assert(f("duration_ms") == "bigint")
    assert(media.select("kind").distinct().count() == 3)
  }

  test("decodeFeatures: deterministic, one feature row per media row") {
    val feats = Multimodal.decodeFeatures(spark, media).toDF().cache()
    assert(feats.count() == media.count())
    // byte_len equals the document length (ascii corpus)
    val joined = feats.join(Tables.documents(spark, sfDir),
      col("media_id") === col("doc_id"))
    assert(joined.filter(col("byte_len") =!= length(col("text"))).count() == 0)
    // video rows sample 4 frames, others none
    assert(joined.filter(col("kind") === "video" && col("n_frames_sampled") =!= 4)
      .count() == 0)
    assert(joined.filter(col("kind") =!= "video" && col("n_frames_sampled") =!= 0)
      .count() == 0)
    // brightness is checksum/len exactly
    val bad = feats.filter(
      abs(col("brightness") - col("checksum") / col("byte_len")) > 1e-12)
    assert(bad.count() == 0)
  }

  test("batch shape: small batchSize produces identical results") {
    val a = Multimodal.decodeFeatures(spark, media, batchSize = 3)
      .collect().map(f => f.media_id -> f.checksum).toMap
    val b = Multimodal.decodeFeatures(spark, media, batchSize = 512)
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(a == b)
  }

  test("frame sampling positions are uniform and bounded") {
    assert(Multimodal.sampleFrameIndices(1000, 4) == Seq(0L, 250L, 500L, 750L))
    assert(Multimodal.sampleFrameIndices(0, 4).isEmpty)
    assert(Multimodal.sampleFrameIndices(1000, 0).isEmpty)
  }

  test("metadataOnlyResize rewrites metadata, preserves payload") {
    val r = Multimodal.metadataOnlyResize(media, 32, 32)
    assert(r.select("width").distinct().collect().map(_.getInt(0)).toSeq == Seq(32))
    assert(r.agg(sum(length(col("payload")))).collect()(0).getLong(0) ==
      media.agg(sum(length(col("payload")))).collect()(0).getLong(0))
  }

  test("resizeImage: 2x2 PNG upscaled 2x has exactly duplicated pixels (nearest)") {
    // distinct primary colors per quadrant → nearest-neighbor 2× maps
    // pixel (x,y) of the source to the 2×2 block at (2x,2y) exactly
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val resized = Multimodal.resizeImage(out.toByteArray, 4, 4).get
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(dec.getWidth == 4 && dec.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((dec.getRGB(x, y) & 0xffffff) == (img.getRGB(x / 2, y / 2) & 0xffffff),
        s"pixel ($x,$y)")
    // undecodable payloads return None (caller falls back to metadata-only)
    assert(Multimodal.resizeImage("not an image".getBytes("UTF-8"), 4, 4).isEmpty)
  }

  test("resize kernel: image payloads transcode, others keep bytes") {
    val png = testPng() // 4×4 RGB
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", png, 4, 4, 0, 0L),
      Multimodal.MediaRecord(2L, "audio", png, 0, 0, 16000, 1000L))
    val r = Multimodal.resize(spark, rows.toDF(), 8, 8)
      .collect().map(x => x.getAs[Long]("media_id") ->
        (x.getAs[Array[Byte]]("payload"), x.getAs[Int]("width"))).toMap
    // image row: payload really transcoded — decodes at the new size
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r(1L)._1))
    assert(dec.getWidth == 8 && dec.getHeight == 8)
    // mean luminance is preserved exactly by nearest-neighbor 2×
    // upscale of a 4×4 image (every source pixel duplicated 4×)
    assert(Multimodal.decodeImage(r(1L)._1).get.meanLuma == 2816.0 / 48.0)
    // non-image row: bytes untouched, metadata updated
    assert(r(2L)._1.sameElements(png) && r(2L)._2 == 8)
  }

  // --- real javax.imageio decode path --------------------------------

  /** 4×4 RGB PNG with pixel (x,y) = (x*16, y*16, 128), encoded with
    * the JDK's own PNG writer (no fixtures on disk, no new deps). */
  private def testPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, (x * 16 << 16) | (y * 16 << 8) | 128)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImage: real 4x4 PNG matches the hand-computed golden") {
    val meta = Multimodal.decodeImage(testPng()).get
    assert(meta.width == 4 && meta.height == 4)
    // sum of (r+g+b) over pixels: r sums to (0+16+32+48)*4 = 384, g
    // likewise 384, b = 128*16 = 2048 → 2816; mean luma = 2816/(3*16).
    assert(meta.meanLuma == 2816.0 / 48.0)
  }

  test("decodeImage: undecodable payloads return None") {
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    // a PNG magic number with a truncated body must not decode
    assert(Multimodal.decodeImage(testPng().take(12)).isEmpty)
  }

  /** Mono 16-bit LE PCM WAV, 16 samples alternating ±8192 → mean
    * absolute amplitude exactly 8192/32768 = 0.25. */
  private def testWav(): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val pcm = new Array[Byte](32)
    for (i <- 0 until 16) {
      val s: Short = if (i % 2 == 0) 8192 else -8192
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 16)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudio: real 16-sample WAV matches the hand-computed golden") {
    val meta = Multimodal.decodeAudio(testWav()).get
    assert(meta.sampleRate == 16000)
    assert(meta.nFrames == 16)
    assert(meta.meanAbsAmplitude == 0.25)
  }

  test("decodeAudio: undecodable payloads return None") {
    assert(Multimodal.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(testPng()).isEmpty)
    assert(Multimodal.decodeAudio(testWav().take(16)).isEmpty)
  }

  test("decodeFeatures routes audio payloads through the real decoder") {
    val wav = testWav()
    val rows = Seq(Multimodal.MediaRecord(9L, "audio", wav, 0, 0, 16000, 1000L))
    val feats = Multimodal.decodeFeatures(spark, rows.toDF()).collect()
    assert(feats.head.brightness == 0.25)
    assert(feats.head.byte_len == wav.length)
  }

  test("decodeFeatures routes image payloads through the real decoder") {
    val png = testPng()
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", png, 4, 4, 0, 0L),
      Multimodal.MediaRecord(2L, "audio", png, 0, 0, 16000, 1000L))
    val feats = Multimodal.decodeFeatures(spark, rows.toDF())
      .collect().map(f => f.media_id -> f).toMap
    // image row: brightness is the decoded mean luminance
    assert(feats(1L).brightness == 2816.0 / 48.0)
    assert(feats(1L).byte_len == png.length)
    // audio row carries the same bytes but takes the byte-mean
    // fallback (no audio codec in the container) — different value,
    // proving the image row really decoded pixels
    assert(feats(2L).brightness == feats(2L).checksum.toDouble / png.length)
    assert(feats(2L).brightness != feats(1L).brightness)
  }

  /** 2-frame animated GIF written with the JDK's own GIF sequence
    * writer: frame 0 all-red 2×2 (luma (255+0+0)/3 = 85), frame 1
    * all-white 2×2 (luma 255). Solid primary colors survive GIF
    * palette quantization exactly, so the goldens are exact. */
  private def testGif(): Array[Byte] = {
    def frame(rgb: Int) = {
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 2) img.setRGB(x, y, rgb)
      img
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      Seq(frame(0xff0000), frame(0xffffff)).foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  test("decodeVideoFrames: real 2-frame GIF matches hand-computed per-frame luma") {
    // duration 1000 ms, 2 sample offsets (0, 500) → frame indices
    // (0*2/1000=0, 500*2/1000=1): red frame then white frame.
    val offs = Multimodal.sampleFrameIndices(1000L, 2)
    val meta = Multimodal.decodeVideoFrames(testGif(), offs, 1000L).get
    assert(meta.nFrames == 2)
    assert(meta.frameLumas == Seq(85.0, 255.0))
    // oversampling clamps to the last frame rather than failing
    val over = Multimodal.decodeVideoFrames(testGif(),
      Multimodal.sampleFrameIndices(1000L, 4), 1000L).get
    assert(over.frameLumas == Seq(85.0, 85.0, 255.0, 255.0))
  }

  /** Hand-crafted OPTIMIZED animated GIF: frame 0 is a full 4×4 red
    * raster; frame 1 is only a 2×2 white DELTA at offset (1,1) with
    * disposal doNotDispose — the partial-raster shape GIF optimizers
    * emit, which a non-compositing decoder mis-measures. */
  private def partialFrameGif(): Array[Byte] = {
    def solid(w: Int, h: Int, rgb: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val f0 = solid(4, 4, 0xff0000)
      writer.writeToSequence(new javax.imageio.IIOImage(f0, null, null), null)
      val f1 = solid(2, 2, 0xffffff)
      val spec = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(f1)
      val md = writer.getDefaultImageMetadata(spec, null)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = md.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      def child(tag: String): javax.imageio.metadata.IIOMetadataNode = {
        val nodes = root.getElementsByTagName(tag)
        if (nodes.getLength > 0)
          nodes.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        else {
          val n = new javax.imageio.metadata.IIOMetadataNode(tag)
          root.appendChild(n); n
        }
      }
      val desc = child("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", "1")
      desc.setAttribute("imageTopPosition", "1")
      desc.setAttribute("imageWidth", "2")
      desc.setAttribute("imageHeight", "2")
      desc.setAttribute("interlaceFlag", "FALSE")
      val gce = child("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "doNotDispose")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", "0")
      md.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(f1, null, md), null)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  test("decodeVideoFrames composites partial-raster GIF frames (disposal honored)") {
    // Composed frame 1 = 4×4 red with a 2×2 white block at (1,1):
    // luma = (12·255 + 4·765) / (3·16) = 127.5. A non-compositing
    // decoder would report the delta raster alone (255.0).
    val offs = Multimodal.sampleFrameIndices(1000L, 2) // frames 0, 1
    val meta = Multimodal.decodeVideoFrames(partialFrameGif(), offs, 1000L).get
    assert(meta.nFrames == 2)
    assert(meta.frameLumas == Seq(85.0, 127.5),
      s"expected composed lumas, got ${meta.frameLumas}")
  }

  test("decodeVideoFrames: undecodable payloads return None") {
    assert(Multimodal.decodeVideoFrames("not a gif".getBytes("UTF-8"),
      Seq(0L), 1000L).isEmpty)
    assert(Multimodal.decodeVideoFrames(testGif(), Seq.empty, 1000L).isEmpty)
    assert(Multimodal.decodeVideoFrames(testGif(), Seq(0L), 0L).isEmpty)
  }

  test("decodeFeatures routes video payloads through the real frame decoder") {
    val gif = testGif()
    val rows = Seq(
      Multimodal.MediaRecord(1L, "video", gif, 2, 2, 0, 1000L),
      // same bytes, kind=image: single-frame ImageIO read sees frame 0
      Multimodal.MediaRecord(2L, "image", gif, 2, 2, 0, 0L),
      // video with an undecodable payload: byte-mean pseudo-decode,
      // frame count from sampleFrameIndices (the documented fallback)
      Multimodal.MediaRecord(3L, "video", "txt".getBytes("UTF-8"), 0, 0, 0, 1000L))
    val feats = Multimodal.decodeFeatures(spark, rows.toDF(), framesPerVideo = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).brightness == (85.0 + 255.0) / 2)
    assert(feats(1L).n_frames_sampled == 2)
    assert(feats(2L).brightness == 85.0 && feats(2L).n_frames_sampled == 0)
    assert(feats(3L).brightness == feats(3L).checksum.toDouble / 3)
    assert(feats(3L).n_frames_sampled == 2)
  }

  // --- pure-JDK ISO-BMFF (MP4) container parse -----------------------

  /** Hand-built minimal MP4 box sequence (no codec, no fixtures):
    * ftyp(brand) + moov[ mvhd(v0, timescale, duration) + n×trak ].
    * Byte layout follows ISO/IEC 14496-12 §4.2 box framing. */
  private def testMp4(brand: String = "isom", timescale: Int = 1000,
      duration: Int = 5000, nTracks: Int = 2): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(typ.getBytes("US-ASCII")); bb.put(payload)
      bb.array()
    }
    // mvhd v0 payload: version/flags, creation, modification,
    // timescale, duration, then (unparsed) rate/volume/etc padding
    val mvhd = java.nio.ByteBuffer.allocate(100)
    mvhd.putInt(0) // version 0 + flags
    mvhd.putInt(0).putInt(0) // creation, modification
    mvhd.putInt(timescale).putInt(duration)
    val moov = box("mvhd", mvhd.array()) ++
      Array.fill(nTracks)(box("trak", Array.emptyByteArray)).flatten
    box("ftyp", (brand + "mp42").getBytes("US-ASCII")) ++ box("moov", moov)
  }

  test("parseMp4: hand-built box sequence matches the golden") {
    val meta = Multimodal.parseMp4(testMp4()).get
    assert(meta.brand == "isom")
    assert(meta.timescale == 1000L)
    assert(meta.durationMs == 5000L) // 5000 units / 1000 units-per-sec
    assert(meta.nTracks == 2)
    // non-1000 timescale converts: 90000 units/s, 450000 units = 5 s
    val m2 = Multimodal.parseMp4(
      testMp4(brand = "mp41", timescale = 90000, duration = 450000, nTracks = 1)).get
    assert(m2.brand == "mp41" && m2.durationMs == 5000L && m2.nTracks == 1)
  }

  test("parseMp4: malformed or foreign payloads return None") {
    assert(Multimodal.parseMp4("not an mp4 at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseMp4(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseMp4(testMp4().take(20)).isEmpty) // truncated moov
    assert(Multimodal.parseMp4(testPng()).isEmpty) // valid media, wrong format
    assert(Multimodal.parseMp4(testGif()).isEmpty)
  }

  test("containerMeta kernel: video MP4 rows parse, others drop") {
    val mp4 = testMp4()
    val rows = Seq(
      Multimodal.MediaRecord(1L, "video", mp4, 0, 0, 0, 5000L),
      Multimodal.MediaRecord(2L, "video", "opaque".getBytes("UTF-8"), 0, 0, 0, 0L),
      Multimodal.MediaRecord(3L, "image", mp4, 0, 0, 0, 0L)) // wrong kind
    val got = Multimodal.containerMeta(spark, rows.toDF()).collect()
    assert(got.map(_.media_id).toSeq == Seq(1L))
    assert(got.head.brand == "isom" && got.head.duration_ms == 5000L &&
      got.head.n_tracks == 2)
  }

  private def pngOf(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("dhash64 goldens: monotone gradients, scale invariance, grid minimum") {
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // strictly increasing left→right: every left cell < right cell → 0
    val inc = pngOf(9, 8)((x, _) => gray(x * 20))
    assert(Multimodal.dhash64(inc).contains(0L))
    // strictly decreasing: all 64 comparison bits set
    val dec = pngOf(9, 8)((x, _) => gray(160 - x * 20))
    assert(Multimodal.dhash64(dec).contains(-1L))
    // dHash is resolution-invariant on exact upscales (box means scale)
    val incBig = pngOf(36, 32)((x, _) => gray((x / 4) * 20))
    assert(Multimodal.dhash64(incBig) == Multimodal.dhash64(inc))
    // sub-grid frames refuse rather than hash garbage
    assert(Multimodal.dhash64(pngOf(8, 8)((_, _) => 0)).isEmpty)
    assert(Multimodal.dhash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageNearDupPairs: re-encoded/rescaled copy pairs, inverse does not; non-images drop") {
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val base = pngOf(18, 16)((x, y) => gray(((x / 2) * 16 + y) % 256))
    val scaled = pngOf(36, 32)((x, y) => gray(((x / 4) * 16 + y / 2) % 256))
    val inverse = pngOf(18, 16)((x, y) => gray(255 - ((x / 2) * 16 + y) % 256))
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", base, 18, 16, 0, 0L),
      Multimodal.MediaRecord(2L, "image", scaled, 36, 32, 0, 0L),
      Multimodal.MediaRecord(3L, "image", inverse, 18, 16, 0, 0L),
      Multimodal.MediaRecord(4L, "image", "junk".getBytes("UTF-8"), 0, 0, 0, 0L),
      Multimodal.MediaRecord(5L, "audio", base, 0, 0, 16000, 0L))
    val pairs = Multimodal.imageNearDupPairs(spark, rows.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the rescaled copy pair, got ${pairs.toList}")
    assert(pairs.head._3 == 0, "exact rescale must hash identically")
  }

  test("approx_count_distinct within 5% of exact (HLL sanity)") {
    val ev = graft.queries.IngestQueries.events(spark, sfDir)
    val approx = ev.agg(approx_count_distinct(col("user_id")).as("a"))
      .collect()(0).getLong(0)
    val exact = ev.select("user_id").distinct().count()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
