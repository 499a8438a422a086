package graft

import graft.queries.VectorQueries

/** Semantics of the Lloyd assignment step (`q_kmeans_assign`): nearest
  * of the 5 seed centroids by exact quantized squared distance, ties to
  * the lower centroid id, integer-exact inertia. Fixture floats
  * (±1.0, ±0.5, 0.0) quantize exactly, so every distance is a known
  * integer.
  */
class KmeansAssignSpec extends SparkTestBase {
  import spark.implicits._

  test("nearest-seed assignment with exact inertia; equidistant vector ties to lowest c_id") {
    val dir = Fixtures.tempDir("kma").toString
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // seed c0 at (1000, 0)
      (1L, Array(0.0f, 1.0f)),   // seed c1
      (2L, Array(-1.0f, 0.0f)),  // seed c2
      (3L, Array(0.0f, -1.0f)),  // seed c3
      (4L, Array(1.0f, 1.0f)),   // seed c4
      (5L, Array(0.5f, 0.0f)),   // nearest c0: d2 = 500^2 = 250000
      (6L, Array(0.0f, 0.0f)))   // d2 = 1e6 to c0..c3 (2e6 to c4) -> tie -> c0
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = VectorQueries.kmeansAssign(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List(
      (0L, 3L, 1250000L),
      (1L, 1L, 0L),
      (2L, 1L, 0L),
      (3L, 1L, 0L),
      (4L, 1L, 0L)))
  }
}
