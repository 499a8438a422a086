package graft

import graft.queries.VectorQueries

/** Semantics of the centroid-cosine outlier scan (`q_embed_outliers`):
  * the vector anti-aligned with its label's centroid ranks first, and
  * equal cosines fall back to vec_id order. Axis-aligned unit vectors
  * make every expected cosine exactly ±1 after quantization.
  */
class EmbedOutliersSpec extends SparkTestBase {
  import spark.implicits._

  test("anti-aligned vector is the top outlier; ties break by vec_id") {
    val dir = Fixtures.tempDir("outl").toString
    val x = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val vecs = Seq(
      (0L, x, 0), (1L, x, 0), (2L, x, 0),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 0),
      (10L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (11L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // Label-0 centroid sums to (2000, 0, 0, 0): cos = +1 for docs
    // 0-2, −1 for doc 3; label 1 is two identical vectors at +1.
    val got = VectorQueries.embedOutliers(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toList
    assert(got == List(
      (0, 1, 3L, -1.0),
      (0, 2, 0L, 1.0),
      (0, 3, 1L, 1.0),
      (1, 1, 10L, 1.0),
      (1, 2, 11L, 1.0)))
  }
}
