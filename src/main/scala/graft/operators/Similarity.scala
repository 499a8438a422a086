package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorOps

/** Similarity search over an embedding column (`Array[Float]`)
  * (SURVEY.md §2.11): brute-force cosine top-k as the exact baseline,
  * and a random-hyperplane LSH-bucketed variant as the scale path.
  *
  * No UDF, no collect; the data never leaves the executors. The
  * DataFrame operators score through the native codegen'd
  * [[graft.functions.DotDouble]] kernel (one JVM loop per row); the
  * standalone Column helpers below keep the declarative
  * `zip_with`/`aggregate` form, which accumulates in the same
  * left-to-right order — both give identical results. */
object Similarity {

  /** Sum of elementwise products, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native-kernel twins used by the DataFrame operators. */
  private def ndot(s: SparkSession, a: Column, b: Column): Column =
    VectorOps.dotDouble(s, a, b)
  private def nnorm(s: SparkSession, a: Column): Column = sqrt(ndot(s, a, a))
  private def ncosine(s: SparkSession, a: Column, b: Column): Column =
    ndot(s, a, b) / (nnorm(s, a) * nnorm(s, b))

  /** Exact brute-force cosine top-k: broadcast the (small) query set
    * against the corpus — each executor scores its corpus slice
    * locally, then one shuffle on query id ranks the top k. This is
    * the O(|Q|·|C|) baseline; use [[lshTopK]] when |Q| is large.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val s = corpus.sparkSession
    val c = corpus.select(col(idCol).as("c_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("c_vec"))
      .withColumn("c_norm", nnorm(s, col("c_vec")))
    val q = queries.select(col(idCol).as("q_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("q_vec"))
      .withColumn("q_norm", nnorm(s, col("q_vec")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cosine",
        ndot(s, col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("c_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "cosine")
  }

  /** Deterministic random hyperplanes (seeded) for signed projections. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Per-band LSH bucket keys: `nBands` keys per vector, each packing
    * `bitsPerBand` hyperplane signs. Vectors sharing any band key are
    * candidates. */
  def bandKeys(s: SparkSession, vec: Column, planes: Seq[Seq[Double]], nBands: Int): Column = {
    val bitsPerBand = planes.size / nBands
    val keys = (0 until nBands).map { b =>
      val bits = (0 until bitsPerBand).map { i =>
        val p = typedlit(planes(b * bitsPerBand + i))
        when(ndot(s, vec, p) > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(b).as("band"), bits.as("bits"))
    }
    array(keys: _*)
  }

  /** IVF(-flat) approximate top-k: a coarse quantizer of `nCentroids`
    * deterministically-sampled corpus vectors partitions the corpus
    * into inverted lists (one assignment pass, centroids broadcast);
    * each query probes its `nProbe` nearest centroids and exact-ranks
    * only those lists. Complement to [[lshTopK]]: IVF adapts to the
    * data distribution where hyperplane LSH is data-oblivious.
    *
    * Scale shape: assignment is a broadcast-join + `max_by` argmax
    * (no shuffle of the corpus beyond the final per-cluster group);
    * probing touches nProbe/nCentroids of the corpus per query. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (centroids, assigned) = ivfIndex(corpus, nCentroids, idCol, vecCol)
    ivfProbe(centroids, assigned, queries, k, nProbe, idCol, vecCol)
  }

  /** BUILD half of the IVF path — the amortizable cost: the coarse
    * quantizer (`(cent_id, cent_vec)`, nCentroids rows) plus the
    * inverted lists (`(cluster, c_id, c_vec)` — every corpus vector
    * assigned to its best centroid). At corpus scale this pair IS the
    * index: persist it (or write it partitioned by `cluster`, so a
    * probe's list reads are partition-pruned scans) and serve every
    * subsequent query batch from it via [[ivfProbe]] — the full-corpus
    * assignment pass is paid ONCE, not per query batch, which is the
    * whole IVF trade (PLANS.md "ANN recall at ~1M vectors": the
    * assignment pass dominates [[ivfTopK]]'s wall at |Q| = 8). */
  def ivfIndex(corpus: DataFrame, nCentroids: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame) = {
    val c = corpus.select(col(idCol).as("c_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("c_vec"))
    // deterministic sample: the nCentroids smallest ids
    val centroids = c.orderBy("c_id").limit(nCentroids)
      .select(col("c_id").as("cent_id"), col("c_vec").as("cent_vec"))
    (centroids, ivfAssign(centroids, corpus, idCol, vecCol))
  }

  /** The ASSIGNMENT half of [[ivfIndex]], parameterized by an
    * existing centroid frame: broadcast-join argmax over the corpus.
    * Exposed so the incremental path can run it over a batch alone. */
  def ivfAssign(centroids: DataFrame, corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val s = corpus.sparkSession
    val c = corpus.select(col(idCol).as("c_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("c_vec"))
    // Lean argmax (r19 — the IvfPq.residuals discipline): aggregate
    // ONLY (score, cent_id) scalars and join the winner back to the
    // vectors; the previous first(c_vec) carried the full vector
    // through the aggregate, multiplying its input volume by
    // nCentroids·|vector| bytes (the documented sort-spill hazard at
    // corpus scale; see IvfPq.residuals).
    val best = c
      .crossJoin(broadcast(centroids))
      .select(col("c_id"), col("cent_id"),
        ncosine(s, col("c_vec"), col("cent_vec")).as("score"))
      .groupBy("c_id")
      .agg(max_by(col("cent_id"), col("score")).as("cluster"))
    best.join(c, Seq("c_id"))
      .select(col("c_id"), col("cluster"), col("c_vec"))
  }

  /** INCREMENTAL index maintenance — the `incrementalPairs` analogue
    * for vectors: an arriving batch joins an existing [[ivfIndex]]
    * WITHOUT a rebuild. Only the batch pays the assignment pass
    * (broadcast argmax against the FROZEN coarse quantizer — the
    * existing corpus is never rescanned), and the merged inverted
    * lists are the union — at scale, an append to the per-cluster
    * partitions the build wrote. Because assignment depends only on
    * (centroids, vector), append-then-probe is BIT-IDENTICAL to
    * assigning the full corpus against the same centroids
    * (spec-pinned); what an append CANNOT do is move the centroids —
    * drift of the data distribution away from the frozen quantizer
    * degrades probe recall, which is the documented rebuild
    * trigger (re-run [[ivfIndex]] when recall gates slip). */
  def ivfAppend(centroids: DataFrame, assigned: DataFrame,
      batch: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    assigned.unionByName(ivfAssign(centroids, batch, idCol, vecCol))

  /** The query→nearest-`nProbe`-lists frame
    * `(q_id, q_vec, cluster)` — the FIRST stage of [[ivfProbe]],
    * shared with [[probedClusters]] so the cluster set a caller
    * prunes its list read to is derived by the exact logic the probe
    * join uses. Cost: |Q|·nCentroids broadcast scores, no shuffle of
    * anything corpus-sized. */
  private def probeFrame(centroids: DataFrame, queries: DataFrame,
      nProbe: Int, idCol: String, vecCol: String): DataFrame = {
    val s = queries.sparkSession
    queries.select(col(idCol).as("q_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("q_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn("score", ncosine(s, col("q_vec"), col("cent_vec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("score").desc, col("cent_id").asc)))
      .filter(col("rnk") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cent_id").as("cluster"))
  }

  /** The ≤ |queries|·nProbe distinct cluster ids [[ivfProbe]] will
    * touch for this query batch — collected to the driver (bounded by
    * the query batch, never the corpus) so a caller holding a
    * cluster-partitioned list store can `isin`-prune its read to
    * exactly the probed lists before handing it to [[ivfProbe]]. */
  def probedClusters(centroids: DataFrame, queries: DataFrame,
      nProbe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Long] =
    probeFrame(centroids, queries, nProbe, idCol, vecCol)
      .select("cluster").distinct()
      .collect().map(_.getLong(0)).toSeq

  /** PROBE half over a prebuilt [[ivfIndex]]: each query scores the
    * broadcast centroid frame, picks its `nProbe` nearest lists, and
    * exact-ranks only those lists' members — per query batch the cost
    * is |Q|·nCentroids centroid scores plus nProbe/nCentroids of the
    * corpus, never a full scan. */
  def ivfProbe(centroids: DataFrame, assigned: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val s = queries.sparkSession
    val probes = probeFrame(centroids, queries, nProbe, idCol, vecCol)
    val scored = probes.join(assigned, "cluster")
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cosine", ncosine(s, col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("c_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "cosine")
  }

  /** Approximate cosine top-k via random-hyperplane LSH: explode each
    * side into its band keys, equi-join on (band, bits) — a plain
    * shuffle join on a compact key instead of |Q|·|C| scoring — then
    * exact-cosine re-rank of the candidates. Tune `nPlanes`/`nBands`
    * for recall vs candidate volume; at 100 TB the band join is the
    * only shuffle and hot buckets are handled by AQE skew splitting.
    */
  /** The CANDIDATE stage of [[lshTopK]], exposed for ablations: the
    * deduplicated `(q_id, q_vec, c_id, c_vec)` pairs sharing at least
    * one band key. Candidate volume is the recall-vs-cost knob's other
    * axis — more bands (fewer bits each) admit more pairs. */
  def lshCandidates(corpus: DataFrame, queries: DataFrame,
      nPlanes: Int = 16, nBands: Int = 4, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val s = corpus.sparkSession
    val planes = hyperplanes(dim, nPlanes)
    val c = corpus.select(col(idCol).as("c_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("c_vec"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("q_vec"))
    // r19 (guide §2.3/§8: shuffle keys, not payloads): the band join
    // and the (q,c) dedup previously carried BOTH full vectors —
    // ×nBands on the corpus side through the join exchange and again
    // through the distinct. Join on (key, id) alone, dedup the id
    // pairs, then attach each side's vector exactly once.
    val ck = c.select(col("c_id"),
      explode(bandKeys(s, col("c_vec"), planes, nBands)).as("key"))
    val qk = q.select(col("q_id"),
      explode(bandKeys(s, col("q_vec"), planes, nBands)).as("key"))
    qk.join(ck, "key")
      .filter(col("c_id") =!= col("q_id"))
      .select("q_id", "c_id")
      .dropDuplicates("q_id", "c_id")
      .join(q, "q_id")
      .join(c, "c_id")
      .select("q_id", "q_vec", "c_id", "c_vec")
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 16, nBands: Int = 4, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val s = corpus.sparkSession
    val cand = lshCandidates(corpus, queries, nPlanes, nBands, dim, idCol, vecCol)
    val scored = cand.withColumn("cosine", ncosine(s, col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("c_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "c_id", "cosine")
  }
}
