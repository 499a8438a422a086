package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingSimHashDedup
import graft.streaming.StreamingSimHashDedup.{Doc, Verdict}

/** Streaming near-dup dedup (VERDICT r7 #4): the continuous simhash
  * band index must agree with the oracle-green BATCH rule
  * ([[graft.operators.SimHashDedup.nearDupPairs]]) on a generated
  * corpus — the same cross-check recipe that validated the stateful
  * sessionizer in r7 — plus the horizon and state-cap contracts the
  * batch form has no analogue for. */
class StreamingSimHashDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = 3600000L
  private def ts(min: Long) = new Timestamp(t0 + min * 60000L)

  /** Deterministic corpus: 60 docs over a 40-word vocabulary, ids in
    * event-time order. Every 4th doc is a near-copy of its
    * predecessor (one token swapped — Hamming a few bits), every 7th
    * an exact copy of an earlier doc; the rest are random and land
    * far apart in simhash space. */
  private def corpus(): Seq[Doc] = {
    val rnd = new scala.util.Random(1234)
    val vocab = (0 until 40).map(i => s"tok$i")
    def randText() = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val texts = new scala.collection.mutable.ArrayBuffer[String]
    (0 until 60).foreach { i =>
      val text =
        if (i % 4 == 1 && i > 0) {
          val toks = texts(i - 1).split(' ')
          toks.updated(rnd.nextInt(toks.length), vocab(rnd.nextInt(vocab.size)))
            .mkString(" ")
        } else if (i % 7 == 2 && i >= 2) texts(i - 2)
        else randText()
      texts += text
    }
    texts.zipWithIndex.map { case (t, i) => Doc(i.toLong, ts(i.toLong), t) }.toSeq
  }

  private def runStream(docs: Seq[Seq[Doc]], name: String,
      horizonMs: Long = 24 * 3600000L, maxPerBand: Int = 200,
      watermarkDelayMs: Long = 10 * 60000L,
      capOverflow: Option[org.apache.spark.util.LongAccumulator] = None)
      : Seq[Verdict] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamingSimHashDedup.verdicts(spark, input.toDS(),
      maxHamming = 3, horizonMs = horizonMs,
      watermarkDelayMs = watermarkDelayMs, maxPerBand = maxPerBand,
      capOverflow = capOverflow)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    docs.foreach { batch => input.addData(batch: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Verdict].collect().toSeq
  }

  test("streaming verdicts equal the batch simhash pair set on a generated corpus") {
    val docs = corpus()
    // three micro-batches in event-time order — near-dup pairs span
    // batch boundaries, so cross-batch state is genuinely exercised
    val streamed = runStream(Seq(docs.take(20), docs.slice(20, 40), docs.drop(40)),
      "simdedup_xcheck")
    val streamPairs = streamed.map(v => (v.dup_of, v.doc_id)).toSet
    val batchPairs = graft.operators.SimHashDedup.nearDupPairs(
        spark, docs.toDF(), "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty, "fixture produced no near-dup pairs — corpus broken")
    assert(streamPairs == batchPairs,
      s"stream pairs (${streamPairs.size}) != batch pairs (${batchPairs.size}): " +
        s"onlyStream=${(streamPairs -- batchPairs).take(5)} " +
        s"onlyBatch=${(batchPairs -- streamPairs).take(5)}")
    // hamming must be the exact batch value, not just ≤ threshold
    val batchHam = graft.operators.SimHashDedup.nearDupPairs(
        spark, docs.toDF(), "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    streamed.foreach { v =>
      assert(batchHam((v.dup_of, v.doc_id)) == v.hamming,
        s"hamming mismatch for (${v.dup_of}, ${v.doc_id})")
    }
  }

  test("event-time horizon: an identical doc beyond the horizon is NOT a dup") {
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val horizon = 30 * 60000L // 30 min
    val docs = Seq(
      Seq(Doc(1L, ts(0), text)),
      Seq(Doc(2L, ts(40), text)), // 40 min later: outside the horizon
      Seq(Doc(3L, ts(45), text))) // 5 min after doc 2: inside
    val got = runStream(docs, "simdedup_horizon", horizonMs = horizon)
      .map(v => (v.dup_of, v.doc_id)).toSet
    assert(got == Set((2L, 3L)),
      s"expected only (2,3) inside the horizon, got $got")
  }

  test("band-index state survives a checkpointed restart (T2 analogue)") {
    // The retained-signature index lives in the streaming state
    // store: a doc indexed in run 1 must still flag a near-dup that
    // arrives in run 2 under the SAME checkpointLocation — the
    // recovery contract a production dedup stream depends on. File
    // source + foreachBatch parquet sink (the memory sink cannot
    // resume from a checkpoint — NOTES.md lesson 8).
    val base = Fixtures.tempDir("ssdr")
    val data = base.resolve("docs").toString
    val ckpt = base.resolve("ckpt").toString
    def runOnce(tag: String): Set[(Long, Long)] = {
      val outDir = base.resolve(s"out_$tag").toString
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
        .parquet(data).as[Doc]
      val q = StreamingSimHashDedup.verdicts(spark, src,
          maxHamming = 3, horizonMs = 24 * 3600000L,
          watermarkDelayMs = 10 * 60000L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Verdict], _: Long) =>
          b.toDF().select("dup_of", "doc_id").write.mode("append").parquet(outDir)
          ()
        }
        .start()
      q.awaitTermination()
      if (!new java.io.File(outDir).exists) Set.empty
      else spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textB = "one two three four five six seven eight nine ten eleven"
    Seq(Doc(1L, ts(0), textA), Doc(2L, ts(1), textB)).toDF()
      .write.mode("append").parquet(data)
    assert(runOnce("r1").isEmpty, "distinct docs must not flag in run 1")
    // run 2, NEW process-side query restored from the checkpoint:
    // doc 3 duplicates doc 1 from run 1 — only recoverable state can
    // link them
    Seq(Doc(3L, ts(5), textA)).toDF().write.mode("append").parquet(data)
    assert(runOnce("r2") == Set((1L, 3L)),
      "restored band index failed to flag the cross-restart duplicate")
  }

  test("maxPerBand cap: overflow docs are verified but not retained, and counted") {
    val text = "one two three four five six seven eight nine ten"
    val docs = Seq(Seq(
      Doc(1L, ts(0), text), Doc(2L, ts(1), text), Doc(3L, ts(2), text)))
    val overflow = spark.sparkContext.longAccumulator("capOverflow")
    val got = runStream(docs, "simdedup_cap", maxPerBand = 1,
        capOverflow = Some(overflow))
      .map(v => (v.dup_of, v.doc_id)).toSet
    // only doc 1 is retained (cap 1): docs 2 and 3 both flag against
    // it; the (2,3) pair is NOT emitted because 2 was never indexed —
    // THE documented blind spot the overflow counter makes visible
    assert(got == Set((1L, 2L), (1L, 3L)), s"got $got")
    // docs 2 and 3 each hit the saturated bucket in all 4 bands
    // (identical text → identical signature → same 4 buckets)
    assert(overflow.value == 8L,
      s"expected 8 verified-not-retained band rows, got ${overflow.value}")
  }

  test("out-of-order arrival: pairs are normalized and the horizon is symmetric") {
    val text = "red orange yellow green blue indigo violet gray"
    val horizon = 5 * 60000L // 5 min
    val delay = 60 * 60000L  // 60 min lateness admitted
    // batch 1 retains doc 10 @ t=30min; batch 2 delivers two LATE docs:
    //  - doc 3 @ t=28min: |gap| = 2min ≤ horizon → pair, normalized to
    //    (dup_of=3, doc_id=10) — the retained doc has the LARGER id, so
    //    unnormalized emission would reverse the batch convention;
    //  - doc 2 @ t=10min: |gap| = 20min > horizon → NO pair (the old
    //    lower-bound-only predicate matched retained docs arbitrarily
    //    far in the arrival's future).
    val docs = Seq(
      Seq(Doc(10L, ts(30), text)),
      Seq(Doc(3L, ts(28), text), Doc(2L, ts(10), text)))
    val got = runStream(docs, "simdedup_ooo", horizonMs = horizon,
        watermarkDelayMs = delay)
      .map(v => (v.dup_of, v.doc_id)).toSet
    assert(got == Set((3L, 10L)),
      s"expected only the normalized (3,10) pair, got $got")
  }
}
