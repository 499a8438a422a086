package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.operators.Bm25Index
import graft.queries.CorpusQueries
import graft.streaming.StreamingBm25

/** Streaming BM25 maintenance: after the stream drains, the served
  * ranking must be bit-identical to the direct full-corpus
  * q_rag_retrieve computation (the additive-statistics contract,
  * exercised through the real foreachBatch + AvailableNow + WAL
  * machinery rather than hand-called appendBatch), a restart with no
  * new files must not grow the state, and a restart AFTER new files
  * arrive must fold exactly the new documents. */
class StreamingBm25Spec extends SparkTestBase {

  private val terms = Seq("spark", "vector", "customer")

  private def docs =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private val bucket =
    pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L), lit(100L))

  private def served(state: String): Seq[String] =
    StreamingBm25.retrieve(spark, state, terms)
      .collect().map(_.toString).toSeq

  test("streamed index == direct computation after drain; restarts replay clean") {
    val base = Fixtures.tempDir("sbm25")
    val data = base.resolve("docs").toString
    val state = base.resolve("state").toString
    val ckpt = base.resolve("ckpt").toString
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .parquet(data)
      StreamingBm25.fit(spark, src, state, ckpt).awaitTermination()
    }
    // three doc-disjoint file drops, drained one at a time: each drain
    // must serve the direct computation over exactly the docs so far
    val splits = Seq(docs.filter(bucket < 40),
      docs.filter(bucket >= 40 && bucket < 80),
      docs.filter(bucket >= 80))
    var prefix = splits.head.limit(0)
    for (b <- splits) {
      b.coalesce(1).write.mode("append").parquet(data)
      prefix = prefix.unionByName(b)
      runOnce()
      val ctoks = Bm25Index.chunkTokens(prefix)
      val dl = ctoks.groupBy("doc_id", "chunk_id", "start", "len")
        .agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tok"))
      val tf = ctoks.filter(col("token").isin(terms: _*))
        .groupBy("doc_id", "chunk_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val direct = Bm25Index.score(tf, dfreq, dl, stats, k = 10)
        .collect().map(_.toString).toSeq
      assert(served(state) === direct,
        "stream-maintained index diverged from the direct prefix computation")
    }
    // the full-corpus gate: identical to q_rag_retrieve
    assert(served(state) === CorpusQueries.ragRetrieve(spark, sfDir)
      .collect().map(_.toString).toSeq)
    // a restart with no new files must not grow or change the state
    val dirsBefore = Option(new File(state, "postings").list())
      .getOrElse(Array.empty).sorted.toSeq
    val servedBefore = served(state)
    runOnce()
    assert(Option(new File(state, "postings").list())
      .getOrElse(Array.empty).sorted.toSeq === dirsBefore,
      "an empty drain must not grow the state")
    assert(served(state) === servedBefore)
    // compact between drains (the documented single-writer slot), then
    // keep streaming: served results stay bit-identical throughout
    assert(Bm25Index.compact(spark, state))
    assert(served(state) === servedBefore)
  }
}
