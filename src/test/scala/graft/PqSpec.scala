package graft

import scala.util.Random

import graft.queries.VectorQueries

/** Product-quantization exactness and determinism. The load-bearing
  * property: when every corpus vector is itself a codebook entry
  * (corpus size ≤ 16), each subvector encodes to itself with zero
  * quantization error, so ADC estimated distances ARE the exact L2
  * distances and PQ top-k must equal brute-force top-k. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def writeVecs(tag: String, vecs: Seq[(Long, Array[Float])]): String = {
    val dir = Fixtures.tempDir(tag).toString
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("16-vector corpus: ADC distances are exact, PQ top-10 == brute-force L2 top-10") {
    val rnd = new Random(421)
    val vecs = (0L until 16L).map(i =>
      i -> Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val dir = writeVecs("pq16", vecs)
    // exact reference: the query pipeline's quantization (floor(x*1000))
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000).toLong)
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = for {
      qid <- 0L until 8L
      (vid, rnk) <- (0L until 16L).filter(_ != qid)
        .map(v => v -> d2(q(qid), q(v)))
        .sortBy { case (v, d) => (d, v) }
        .take(10).map(_._1).zipWithIndex
    } yield (qid, rnk + 1, vid)
    val got = VectorQueries.annPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === expected)
    // and the reported estimates equal the exact distances
    val est = VectorQueries.annPq(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    for (((qid, vid), e) <- est) assert(e == d2(q(qid), q(vid)))
  }

  test("q_ann_pq over sf0.001: deterministic, dense ranks, 10 hits per query") {
    val a = VectorQueries.annPq(spark, sfDir).collect()
    val b = VectorQueries.annPq(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    for ((_, rows) <- byQ)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 10))
  }

  test("a planted duplicate of a query is its rank-1 hit with d2_est = 0") {
    // vec 12 duplicates query vec 3; both are codebook entries, so
    // both encode identically and the ADC estimate between them is
    // exactly zero — rank 1 for query 3 regardless of the rest.
    val rnd = new Random(7)
    val base = Array.fill(64)(rnd.nextFloat())
    val vecs = (0L until 16L).map(i =>
      if (i == 3L || i == 12L) i -> base.clone()
      else i -> Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val dir = writeVecs("pqdup", vecs)
    val got = VectorQueries.annPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val q3rank1 = got.find { case (qid, rnk, _, _) => qid == 3L && rnk == 1 }.get
    assert(q3rank1._3 == 12L && q3rank1._4 == 0L)
    assert(got.forall { case (qid, _, vid, _) => qid != vid })
  }
}
