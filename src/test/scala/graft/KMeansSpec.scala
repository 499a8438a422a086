package graft

import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Materializer}

/** Lloyd-iteration semantics for [[graft.operators.KMeans]]: exact
  * integer floor-of-mean centroid updates, fixed-point stability, and
  * Materializer interchangeability (Local vs Reliable must produce
  * identical state — the knob is durability, never semantics).
  * Fixture floats (0.0/0.25/0.75/1.0) quantize exactly.
  */
class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private def blobs = Seq(
    (0L, Array(0.0f, 0.0f)),    // seed c0
    (1L, Array(1.0f, 1.0f)),    // seed c1
    (2L, Array(0.25f, 0.0f)),
    (3L, Array(0.0f, 0.25f)),
    (4L, Array(1.0f, 0.75f)),
    (5L, Array(0.75f, 1.0f)))
    .toDF("vec_id", "embedding")

  // c0 members {(0,0),(250,0),(0,250)}: sums (250,250), n=3 ->
  // floor-mean (83,83); c1 members sum (2750,2750) -> (916,916).
  private val expected = List(
    (0L, Seq(83L, 83L), 3L),
    (1L, Seq(916L, 916L), 3L))

  private def collectFit(rounds: Int, mat: Materializer) =
    KMeans.fit(blobs, k = 2, rounds = rounds, mat = mat)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
      .toList

  test("two blobs converge to exact floor-of-mean centroids in one round") {
    assert(collectFit(1, Materializer.Local) == expected)
  }

  test("converged state is a fixed point: extra rounds do not move centroids") {
    assert(collectFit(3, Materializer.Local) == expected)
  }

  test("Reliable materializer yields identical centroids to Local") {
    val dir = Fixtures.tempDir("kmckpt").toString
    assert(collectFit(2, Materializer.Reliable(dir)) == expected)
  }

  test("seeds are the k LOWEST vec_ids, not an id range: high-id corpora fit") {
    // review r15: the seed was `filter(vec_id < k)` — identical to
    // lowest-k on ids dense from 0, but EMPTY for a frame whose ids
    // all exceed k (a stream's first batch), so the fit silently
    // returned an empty centroid frame and the streamed IVF-PQ seeder
    // froze an empty codebook forever. Same blobs, ids shifted +100:
    // identical centroids, c_ids carrying the shifted seed ids.
    val shifted = blobs.withColumn("vec_id", col("vec_id") + 100L)
    val got = KMeans.fit(shifted, k = 2, rounds = 1, mat = Materializer.Local)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
      .toList
    assert(got == expected.map { case (id, cv, n) => (id + 100L, cv, n) })
  }
}
