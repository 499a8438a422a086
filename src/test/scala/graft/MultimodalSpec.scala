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

  test("resizeStub rewrites metadata, preserves payload") {
    val r = Multimodal.resizeStub(media, 32, 32)
    assert(r.select("width").distinct().collect().map(_.getInt(0)).toSeq == Seq(32))
    assert(r.agg(sum(length(col("payload")))).collect()(0).getLong(0) ==
      media.agg(sum(length(col("payload")))).collect()(0).getLong(0))
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
