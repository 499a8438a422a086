package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.TokenCount

/** Streaming heavy hitters: exact agreement with the batch counts in
  * the ample-capacity regime (the `q_vocab_topk` cross-check recipe),
  * SpaceSaving's over-estimate/error-bracket guarantees under
  * eviction pressure, bounded state, and restart recovery. */
class StreamingTopKSpec extends SparkTestBase {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[String]], name: String,
      nShards: Int, capacity: Int,
      checkpoint: Option[String] = None): Seq[TokenCount] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = StreamingTopK.topkSummaries(spark, input.toDS(), nShards, capacity)
    val w = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name)
    val q = checkpoint.fold(w)(d => w.option("checkpointLocation", d)).start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[TokenCount].collect().toSeq
  }

  private def trueCounts(batches: Seq[Seq[String]]): Map[String, Long] =
    batches.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("ample capacity: global top-k equals the exact batch counts across micro-batches") {
    val batches = Seq(
      Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma"),
      Seq.fill(4)("alpha") ++ Seq.fill(6)("delta") ++ Seq("beta", "eps"),
      Seq.fill(2)("gamma") ++ Seq.fill(3)("beta"))
    val rows = runStream(batches, "topk_exact", nShards = 4, capacity = 100)
    val got = StreamingTopK.globalTopK(spark.createDataset(rows), 3)
      .map(t => (t.token, t.est, t.err))
    assert(got == Seq(("alpha", 9L, 0L), ("beta", 7L, 0L), ("delta", 6L, 0L)))
  }

  test("tokens route to exactly one shard (disjoint ownership)") {
    val rows = runStream(Seq(Seq("a", "b", "c", "d", "a", "b")), "topk_shard",
      nShards = 3, capacity = 100)
    rows.groupBy(_.token).foreach { case (tok, rs) =>
      assert(rs.map(_.shard).distinct.size == 1, s"token $tok on multiple shards")
    }
  }

  test("eviction pressure: state bounded, never undercounts, err brackets truth") {
    // one shard, capacity 3, 10 distinct tokens with a skewed tail —
    // forces constant SpaceSaving replacement
    val tokens = (1 to 40).map(i => s"t${i % 10}") ++ Seq.fill(25)("hot")
    val batches = tokens.grouped(13).toSeq
    val rows = runStream(batches, "topk_evict", nShards = 1, capacity = 3)
    val truth = trueCounts(batches)
    val finalRows = StreamingTopK.globalTopK(spark.createDataset(rows), 3)
    assert(finalRows.size == 3, "summary emits at most capacity entries")
    finalRows.foreach { t =>
      val actual = truth.getOrElse(t.token, 0L)
      assert(t.est >= actual, s"${t.token}: est ${t.est} under true $actual")
      assert(t.est - t.err <= actual,
        s"${t.token}: est-err ${t.est - t.err} exceeds true $actual")
    }
    // the genuinely frequent token must survive eviction pressure
    assert(finalRows.map(_.token).contains("hot"))
  }

  test("checkpointed restart resumes counts exactly (ample capacity)") {
    // File source + foreachBatch parquet sink: the memory sink cannot
    // resume from a checkpoint (same recipe as the streaming-dedup
    // restart test). Counts accumulated in run 1's state store must
    // carry into run 2 — not reset, not double-counted.
    val base = Fixtures.tempDir("topk_ckpt")
    val data = base.resolve("toks").toString
    val ckpt = base.resolve("ckpt").toString
    val outDir = base.resolve("out").toString
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
        .parquet(data).as[String]
      val q = StreamingTopK.topkSummaries(spark, src, 2, 100)
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[TokenCount], _: Long) =>
          b.write.mode("append").parquet(outDir)
          ()
        }
        .start()
      q.awaitTermination()
    }
    Seq("x", "x", "y").toDF("value").write.mode("append").parquet(data)
    runOnce()
    Seq("x", "z").toDF("value").write.mode("append").parquet(data)
    runOnce()
    val all = spark.read.parquet(outDir).as[TokenCount].collect().toSeq
    val got = StreamingTopK.globalTopK(spark.createDataset(all), 3)
      .map(t => (t.token, t.est)).toMap
    assert(got == Map("x" -> 3L, "y" -> 1L, "z" -> 1L))
  }
}
