package graft
import org.apache.spark.sql.SparkSession
object StressMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stress] $tag%-24s rows=$n%-9d ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    Tables.documents(spark, "/tmp/stress").count() // warm
    if (sys.env.contains("SPARK_GRAFT_STRESS_DOCS")) {
    time("token_count 100k")(queries.TextQueries.tokenCountQ(spark, "/tmp/stress").count())
    time("dedup_exact 100k")(queries.TextQueries.dedupExact(spark, "/tmp/stress").count())
    time("ngram_jaccard 100k")(queries.TextQueries.dedupNgramJaccard(spark, "/tmp/stress").count())
    time("minhash 100k")(queries.DedupQueries.minhashQ(spark, "/tmp/stress").count())
    time("simhash 100k")(queries.DedupQueries.simhashQ(spark, "/tmp/stress").count())
    }
    // embeddings-side stress: 40k vectors = 20x sf0.1, every vector
    // has 19 planted exact duplicates (worst case for banding).
    // Production band geometry: 4 bands x 16 bits (65 536 keys/band)
    // keeps candidates ~= the true-duplicate mass; the oracle query's
    // 32x4 geometry is a recall trade-off for the small noise corpus.
    if (sys.env.contains("SPARK_GRAFT_STRESS_EMB")) {
      import org.apache.spark.sql.functions._
      val embPath = new java.io.File("/tmp/stress/embeddings.parquet")
      if (!embPath.exists) {
        val e = Tables.embeddings(spark, "/root/testdata/sf0.1")
        (0 until 20).map(k => e.select((col("vec_id") + lit(k * 5000L)).as("vec_id"),
            col("embedding"), col("label")))
          .reduce(_ unionByName _).coalesce(8).write.parquet(embPath.toString)
      }
      time("embed_neardup 40k")(queries.VectorQueries.embedNearDupWith(
        spark, "/tmp/stress", nBands = 4, bitsPerBand = 16,
        sampleMod = 1, minCosine = 0.999).count())
      val corpus = Tables.embeddings(spark, "/tmp/stress")
      time("ann_lsh 40k")(operators.Similarity.lshTopK(
        corpus, corpus.filter(col("vec_id") < 8), k = 5,
        nPlanes = 64, nBands = 4).count())
    }
    // events-side stress (2M events, 20x sf0.1; orders copied alongside)
    time("ingest_dedup 2M")(queries.IngestQueries.ingestDedup(spark, "/tmp/stress").count())
    time("sessionize 2M")(queries.AnalyticsQueries.sessionizeQ(spark, "/tmp/stress").count())
    time("funnel 2M")(queries.AnalyticsQueries.funnel(spark, "/tmp/stress").count())
    time("asof_join 2M")(queries.RelationalQueries.asofJoin(spark, "/tmp/stress").count())
    time("cohort 2M")(queries.AnalyticsQueries.cohortRetention(spark, "/tmp/stress").count())
    spark.stop()
  }
}
