package graft

import scala.util.Random

import graft.operators.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  /** Synthetic corpus: 200 random unit-ish vectors plus, for each of
    * the first 5, a planted near-duplicate (tiny noise). */
  private lazy val corpus = {
    val rnd = new Random(7)
    val base = (0 until 200).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    val planted = (0 until 5).map { i =>
      (1000L + i, base(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    (base ++ planted).toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks the planted near-duplicate first") {
    val queries = corpus.filter($"vec_id" < 5)
    val top = Similarity.bruteForceTopK(corpus, queries, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (q <- 0 until 5) assert(top(q.toLong) == 1000L + q,
      s"query $q top-1 should be its planted near-dup")
  }

  test("cosine of a vector with itself is 1") {
    val self = corpus.limit(10)
      .select(Similarity.cosine($"embedding", $"embedding").as("c"))
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("lshTopK finds planted near-duplicates (high-similarity recall)") {
    val queries = corpus.filter($"vec_id" < 5)
    val top = Similarity.lshTopK(corpus, queries, k = 1,
      nPlanes = 16, nBands = 8, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 8 bands of 2 bits: a 0.99+-cosine pair collides in some band
    // with overwhelming probability.
    val hits = (0 until 5).count(q => top.get(q.toLong).contains(1000L + q))
    assert(hits >= 4, s"LSH recall too low: $hits/5")
  }

  test("ivfTopK finds planted near-duplicates (probed-list recall)") {
    val queries = corpus.filter($"vec_id" >= 1000) // the planted copies
    val top = Similarity.ivfTopK(corpus, queries, k = 1,
      nCentroids = 8, nProbe = 8) // nProbe = all lists ⇒ exact
    val got = top.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (i <- 0 until 5) assert(got(1000L + i) == i.toLong,
      s"planted copy ${1000 + i} should rank its original first")
    // with partial probing the planted pair stays found: copy and
    // original quantize to the same centroid at cosine ~0.9999
    val partial = Similarity.ivfTopK(corpus, queries, k = 1,
      nCentroids = 8, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = (0 until 5).count(i => partial.get(1000L + i).contains(i.toLong))
    assert(hits >= 4, s"IVF recall too low: $hits/5")
  }

  test("ivfIndex + ivfProbe composes to exactly the one-shot ivfTopK result") {
    val queries = corpus.filter($"vec_id" >= 1000)
    val oneShot = Similarity.ivfTopK(corpus, queries, k = 3,
      nCentroids = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    // production shape: build once, persist the inverted lists, probe
    // a query batch against the prebuilt index
    val (cents, assigned) = Similarity.ivfIndex(corpus, nCentroids = 8)
    val persisted = assigned.localCheckpoint(true)
    val split = Similarity.ivfProbe(cents, persisted, queries, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(split == oneShot, "prebuilt-index probe must be bit-identical to the one-shot path")
  }

  test("every ann-gate query has >= k band/probe candidates at test SF") {
    // Backs the ann gate's exactly-5 result contract (VectorQueries
    // .annGate): calling the production operators with an unbounded k
    // returns the FULL ranked candidate list, so the per-query counts
    // measured here are exactly what the gate's k=5 cut sees. The
    // gate itself now tolerates candidate starvation (left join from
    // the query ids → structure_ok=false), so this spec is the early
    // warning, not the safety net.
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 8)
    for ((name, res) <- Seq(
        "lsh" -> Similarity.lshTopK(e, q, k = Int.MaxValue),
        "ivf" -> Similarity.ivfTopK(e, q, k = Int.MaxValue))) {
      val counts = res.groupBy("q_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts.size == 8, s"$name: a query produced ZERO candidates")
      val minC = counts.values.min
      info(s"$name per-query candidates: min=$minC max=${counts.values.max}")
      assert(minC >= 5, s"$name min candidates $minC < k=5")
    }
  }

  test("ivfAppend then probe is bit-identical to assigning the full corpus " +
      "against the same frozen centroids") {
    val existing = corpus.filter($"vec_id" < 150)
    val batch = corpus.filter($"vec_id" >= 150)
    val queries = corpus.filter($"vec_id" < 5)
    val (cents, assigned) = Similarity.ivfIndex(existing, nCentroids = 8)
    val merged = Similarity.ivfAppend(cents, assigned, batch)
    val full = Similarity.ivfAssign(cents, corpus)
    // list membership identical: assignment depends only on (centroid, vector)
    val m = merged.select("c_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f = full.select("c_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == f, "append-built lists diverge from full assignment")
    assert(m.size == corpus.count(), "append lost vectors")
    // probe results identical row-for-row
    val a = Similarity.ivfProbe(cents, merged, queries, k = 3, nProbe = 2)
      .collect().map(_.toString).sorted
    val b = Similarity.ivfProbe(cents, full, queries, k = 3, nProbe = 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("lshTopK candidates are a subset re-ranked by exact cosine") {
    val queries = corpus.filter($"vec_id" === 0)
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("c_id", "cosine").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.lshTopK(corpus, queries, k = 5,
      nPlanes = 16, nBands = 8, dim = 16)
      .select("c_id", "cosine").collect()
    // any candidate LSH returns must carry the exact cosine score
    for ((id, c) <- lsh.map(r => r.getLong(0) -> r.getDouble(1)))
      if (brute.contains(id)) assert(math.abs(brute(id) - c) < 1e-12)
  }
}
