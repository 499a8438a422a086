package graft

import graft.queries.VectorQueries

/** Semantics of `q_semantic_dedup` (the SemDeDup shape) on planted
  * fixtures: cluster by nearest seed, order farthest-from-centroid
  * first within a cluster, drop any vector cosine-≥-tau similar to an
  * EARLIER vector of its cluster — keeping the far-from-centroid
  * member of each duplicate group. Fixture floats quantize exactly,
  * so distances are known integers and the planted cosines are exact
  * (1.0 for positive scalings, 0.0 for orthogonal pairs).
  */
class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(vecs: Seq[(Long, Array[Float])], k: Int, tau: Double) =
    VectorQueries.semanticDedupFrom(spark,
        vecs.toDF("vec_id", "embedding"), k, tau)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toList

  test("scaled copies collapse to the farthest-from-centroid member; 45° survives") {
    // k=2: seeds are vec 0 (x-axis) and vec 1 (y-axis).
    // Cluster 0 = {0, 2, 3, 5}: vecs 2 and 3 are positive scalings of
    // (1,0) — cosine exactly 1.0 with each other and with vec 0; vec 5
    // at (1,1) is EQUIDISTANT from both seeds (d2 = 10⁶ each) and the
    // tie rule sends it to the lower c_id, 0. Vec 3 is farthest from
    // the centroid (d2 9×10⁶), ranks first, and is KEPT; 2 and 0 drop
    // against the axis direction; 5's best cosine is cos45° ≈ 0.707 <
    // tau=0.9 — kept. Cluster 1 = {1, 4}: vec 4 (farther, kept) and
    // vec 1 (cosine 1.0 to it — dropped).
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(2.0f, 0.0f)),
      (3L, Array(4.0f, 0.0f)),
      (4L, Array(0.0f, 3.0f)),
      (5L, Array(1.0f, 1.0f)))
    val got = run(vecs, k = 2, tau = 0.9)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(3L)._4 == 0, "farthest scaled copy must be kept")
    assert(byId(3L)._3 == 1, "farthest-from-centroid ranks first")
    assert(byId(2L)._4 == 1 && byId(2L)._5 == 3L, "closer copy drops against the kept far one")
    assert(byId(0L)._4 == 1, "seed itself drops when a kept earlier copy exists")
    assert(byId(5L)._2 == 0L, "equidistant vector ties to the lower centroid id")
    assert(byId(5L)._4 == 0, "45-degree vector is below tau and survives")
    assert(byId(4L)._4 == 0 && byId(4L)._3 == 1, "cluster 1 far member is kept")
    assert(byId(1L)._4 == 1 && byId(1L)._5 == 4L, "seed 1 drops against its kept copy")
  }

  test("dup_of points at the most-similar earlier vector, not merely any collider") {
    // One cluster (k=1, seed vec 0). Order farthest-first:
    // vec 3 (d2 22.25×10⁶), then 2 (13×10⁶), then 1, then 0.
    // vec 1 = (1, 1): cosine 1.0 to vec 2 = (3, 3), cosine ~0.949 to
    // vec 3 = (5, 2.5) — both ≥ tau, but dup_of must name vec 2 (max
    // cos). vec 0's best cosine is ~0.894 (to vec 3) < tau — kept.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 1.0f)),
      (2L, Array(3.0f, 3.0f)),
      (3L, Array(5.0f, 2.5f)))
    val got = run(vecs, k = 1, tau = 0.9)
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(3L)._4 == 0, "first-ranked vector always survives")
    assert(byId(1L)._4 == 1 && byId(1L)._5 == 2L,
      "provenance must be the argmax-cosine earlier vector")
    assert(byId(2L)._4 == 1 && byId(2L)._5 == 3L,
      "vec 2 drops against the earlier vec 3 (cos ~0.949 >= tau)")
    assert(byId(0L)._4 == 0, "best cosine ~0.894 is below tau — kept")
  }

  test("tau=1.01 drops nothing; every vector keeps its cluster assignment") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 5.0f)))
    val got = run(vecs, k = 2, tau = 1.01)
    assert(got.forall(_._4 == 0), "cosine never exceeds 1 so nothing drops")
    assert(got.map(_._1).sorted == List(0L, 1L, 2L, 3L))
  }
}
