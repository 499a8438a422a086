package graft

import java.io.File

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{IvfPq, ProductQuantizer}
import graft.streaming.StreamingIvfPq

/** Streaming IVF-PQ maintenance: the served code table after ANY
  * stream prefix must be bit-identical to the one-shot
  * [[IvfPq.append]] encode of that prefix against the SAME frozen
  * quantizer pair (id-ordered batches keep the first-batch seed equal
  * to the corpus seed), the stored-state probe must equal the
  * in-memory [[IvfPq.probe]] row for row, replay must no-op, and the
  * r14 loss matrix (manifest + applog + frozen-pair guards) must be
  * loud. Estimator ACCURACY is [[IvfPqSpec]]'s job (exact-residual
  * corpus); this spec owns the state machine. */
class StreamingIvfPqSpec extends SparkTestBase {
  import spark.implicits._

  private val (kc, m, subLen, kCb) = (8, 4, 4, 16)

  /** The StreamingIvfSpec corpus: 200 random 16-dim vectors + 5
    * planted near-duplicates of ids 0-4 at ids 1000-1004. */
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

  private def quantized(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), ProductQuantizer.quantize(col("embedding")).as("qv"))

  private def codeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Long)] =
    df.select("vec_id", "sub", "code", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("streamed codes equal the one-shot encode after every prefix; " +
      "stored-state probe bit-identical to the in-memory probe") {
    val base = Fixtures.tempDir("sivfpq")
    val data = base.resolve("vecs").toString
    val state = base.resolve("state").toString
    val ckpt = base.resolve("ckpt").toString
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .parquet(data)
      StreamingIvfPq.fit(spark, src, state, ckpt, kc, m, subLen, kCb)
        .awaitTermination()
    }
    val splits = Seq(
      corpus.filter($"vec_id" < 80),
      corpus.filter($"vec_id" >= 80 && $"vec_id" < 150),
      corpus.filter($"vec_id" >= 150))
    var prefix = splits.head.limit(0)
    for (b <- splits) {
      b.coalesce(1).write.mode("append").parquet(data)
      prefix = prefix.unionByName(b)
      runOnce()
      val (cents, cbs, codes) = StreamingIvfPq.readIndex(spark, state).get
      // the frozen pair is the FIRST batch's smallest-id seed — which,
      // with id-ordered batches, is the whole prefix's smallest-id
      // seed, so the one-shot twin shares it exactly
      assert(cents.count() === kc && cbs.count() === m * kCb)
      val oneShot = IvfPq.append(spark, quantized(prefix), cents, cbs, m, subLen)
      assert(codeSet(codes) === codeSet(oneShot),
        "streamed code table diverges from the one-shot encode of this prefix")
    }
    // rerun with no new files: committed state untouched
    val before = new File(state, "codes").list().sorted.toSeq
    runOnce()
    assert(new File(state, "codes").list().sorted.toSeq === before)
    // stored-state probe ≡ in-memory probe over the same frames
    val queries = corpus.filter($"vec_id" >= 1000)
    val (cents, cbs, codes) = StreamingIvfPq.readIndex(spark, state).get
    val served = StreamingIvfPq.probe(spark, state, queries, k = 3,
        nProbe = 2, m, subLen)
      .collect().map(_.toString).sorted.toSeq
    val direct = IvfPq.probe(spark, cents, cbs, codes,
        quantized(queries).select(col("vec_id").as("q_id"), col("qv")),
        k = 3, nProbe = 2, m, subLen)
      .collect().map(_.toString).sorted.toSeq
    assert(served === direct && served.nonEmpty,
      "stored-state probe must be bit-identical to the in-memory probe")
  }

  test("appendBatch: replay no-ops; crashed write invisible and completed; empty batch no-op") {
    val base = Fixtures.tempDir("sivfpq-replay")
    val state = base.resolve("state").toString
    val b1 = corpus.filter($"vec_id" < 100)
    assert(StreamingIvfPq.appendBatch(spark, state, b1, kc, m, subLen, kCb, 0L))
    val after1 = codeSet(StreamingIvfPq.readIndex(spark, state).get._3)
    assert(!StreamingIvfPq.appendBatch(spark, state, b1, kc, m, subLen, kCb, 0L))
    assert(codeSet(StreamingIvfPq.readIndex(spark, state).get._3) === after1)
    // true mid-write crash state: no _SUCCESS AND no applog entry
    val b2 = corpus.filter($"vec_id" >= 100)
    assert(StreamingIvfPq.appendBatch(spark, state, b2, kc, m, subLen, kCb, 1L))
    val codesDir = new File(state, "codes")
    assert(new File(new File(codesDir, f"v${1L}%020d"), "_SUCCESS").delete())
    assert(new File(new File(codesDir, "applog"), f"v${1L}%020d").delete())
    assert(codeSet(StreamingIvfPq.readIndex(spark, state).get._3) === after1,
      "a partial write must be invisible to readers")
    assert(StreamingIvfPq.appendBatch(spark, state, b2, kc, m, subLen, kCb, 1L),
      "the WAL replay must complete the crashed batch")
    val (ce, cb, _) = StreamingIvfPq.readIndex(spark, state).get
    assert(codeSet(StreamingIvfPq.readIndex(spark, state).get._3) ===
      codeSet(IvfPq.append(spark, quantized(corpus), ce, cb, m, subLen)))
    assert(!StreamingIvfPq.appendBatch(spark, state, corpus.limit(0),
      kc, m, subLen, kCb, 2L))
  }

  test("compact: one cell-partitioned generation, served identical, probe partition-pruned") {
    val base = Fixtures.tempDir("sivfpq-compact")
    val state = base.resolve("state").toString
    for ((lo, hi, bid) <- Seq((0L, 60L, 0L), (60L, 130L, 1L), (130L, 2000L, 2L)))
      assert(StreamingIvfPq.appendBatch(spark, state,
        corpus.filter($"vec_id" >= lo && $"vec_id" < hi), kc, m, subLen, kCb, bid))
    val before = codeSet(StreamingIvfPq.readIndex(spark, state).get._3)
    val queries = corpus.filter($"vec_id" >= 1000)
    val want = StreamingIvfPq.probe(spark, state, queries, k = 3, nProbe = 2,
      m, subLen).collect().map(_.toString).sorted.toSeq
    def vdirs() = new File(state, "codes").list()
      .filter(_.startsWith("v")).sorted.toSeq
    assert(vdirs().size === 3)
    assert(StreamingIvfPq.compact(spark, state))
    assert(vdirs() === Seq(f"v${2L}%020d"))
    assert(codeSet(StreamingIvfPq.readIndex(spark, state).get._3) === before)
    assert(!StreamingIvfPq.compact(spark, state)) // idempotent no-op
    // physical layout: the compacted generation is partitionBy(cell)
    val gen = new File(new File(state, "codes"), f"v${2L}%020d")
    assert(gen.listFiles().exists(_.getName.startsWith("cell=")),
      s"compacted dir is not cell-partitioned: ${gen.listFiles().toSeq}")
    // the probe plan prunes non-probed cells at the directory level
    val res = StreamingIvfPq.probe(spark, state, queries, k = 3, nProbe = 2,
      m, subLen)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cell")),
      s"code scan is not partition-pruned:\n$plan")
    assert(res.collect().map(_.toString).sorted.toSeq === want)
    // replay of the frontier id still no-ops; appends continue on top
    assert(!StreamingIvfPq.appendBatch(spark, state,
      corpus.filter($"vec_id" >= 130L), kc, m, subLen, kCb, 2L))
    assert(StreamingIvfPq.appendBatch(spark, state,
      corpus.filter($"vec_id" >= 1000), kc, m, subLen, kCb, 3L))
    assert(vdirs().size === 2)
  }

  test("loss matrix: manifest, applog, and frozen-pair loss all fail loudly") {
    val base = Fixtures.tempDir("sivfpq-loss")
    val state = base.resolve("state").toString
    for ((lo, hi, bid) <- Seq((0L, 100L, 0L), (100L, 1000L, 1L)))
      assert(StreamingIvfPq.appendBatch(spark, state,
        corpus.filter($"vec_id" >= lo && $"vec_id" < hi), kc, m, subLen, kCb, bid))
    assert(StreamingIvfPq.compact(spark, state))
    val codes = new File(state, "codes")
    // post-compaction append, then external loss of its dir: loud on
    // read, append (fail-fast), compact — the applog guard
    assert(StreamingIvfPq.appendBatch(spark, state,
      corpus.filter($"vec_id" >= 1000), kc, m, subLen, kCb, 2L))
    val v2 = new File(codes, f"v${2L}%020d")
    val aside = new File(base.toFile, "v2-aside")
    assert(v2.renameTo(aside))
    for (op <- Seq(
        () => StreamingIvfPq.readIndex(spark, state),
        () => StreamingIvfPq.appendBatch(spark, state,
          corpus.filter($"vec_id" < 50), kc, m, subLen, kCb, 3L),
        () => StreamingIvfPq.compact(spark, state))) {
      val e = intercept[IllegalArgumentException] { op() }
      assert(e.getMessage.contains(f"v${2L}%020d") &&
        e.getMessage.contains("removed externally"))
    }
    assert(aside.renameTo(v2)) // the remedy: restore → recovered
    val full = codeSet(StreamingIvfPq.readIndex(spark, state).get._3)
    // manifest-covered loss: fold v2 under the manifest, delete the gen
    assert(StreamingIvfPq.compact(spark, state))
    Fixtures.deleteRec(new File(codes, f"v${2L}%020d"))
    val e2 = intercept[IllegalArgumentException] {
      StreamingIvfPq.readIndex(spark, state)
    }
    assert(e2.getMessage.contains("compaction manifest") &&
      e2.getMessage.contains("removed externally"))
    assert(full.nonEmpty)
  }

  test("q_ann_ivfpq_served over sf0.001 equals the one-shot q_ann_ivfpq row for row") {
    // the fold ≡ one-shot contract end-to-end through the DRIVER
    // queries: the stored-state serving path must reproduce the
    // in-memory build's probe exactly (they share the SQL oracle)
    val served = graft.queries.VectorQueries.annIvfPqServed(spark, sfDir)
      .collect().map(_.toString).toSeq
    val oneShot = graft.queries.VectorQueries.annIvfPq(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(served === oneShot && served.nonEmpty)
  }

  test("frozen-pair loss: half-missing under the commit marker and fully-missing " +
      "both loud, never a re-seed; the seeding crash window re-seeds cleanly") {
    val base = Fixtures.tempDir("sivfpq-pairloss")
    val state = base.resolve("state").toString
    assert(StreamingIvfPq.appendBatch(spark, state, corpus, kc, m, subLen, kCb, 0L))
    // a frame missing UNDER the committed pair marker: certain
    // external loss (the marker is only created after both writes)
    Fixtures.deleteRec(new File(state, "quantizer/codebooks"))
    val e1 = intercept[IllegalArgumentException] {
      StreamingIvfPq.readIndex(spark, state)
    }
    assert(e1.getMessage.contains("partially removed externally"))
    val e2 = intercept[IllegalArgumentException] {
      StreamingIvfPq.appendBatch(spark, state,
        corpus.filter($"vec_id" < 50), kc, m, subLen, kCb, 1L)
    }
    assert(e2.getMessage.contains("partially removed externally"))
    // the whole quantizer gone with codes still committed: loud, not
    // "no index yet" — a silent re-seed would encode future appends
    // against geometry the stored codes were not built with
    Fixtures.deleteRec(new File(state, "quantizer"))
    val e3 = intercept[IllegalArgumentException] {
      StreamingIvfPq.readIndex(spark, state)
    }
    assert(e3.getMessage.contains("quantizer is missing"))
    val e4 = intercept[IllegalArgumentException] {
      StreamingIvfPq.appendBatch(spark, state,
        corpus.filter($"vec_id" < 50), kc, m, subLen, kCb, 1L)
    }
    assert(e4.getMessage.contains("quantizer is missing"))
    // the seeding CRASH WINDOW (review r14 — the case the single
    // marker exists for): frames written, marker not yet created,
    // no codes committed. Must read as "no index yet" and the replay
    // must re-seed identically, NOT wedge as half-loss.
    val state2 = base.resolve("state2").toString
    val b1 = corpus.filter($"vec_id" < 100)
    assert(StreamingIvfPq.appendBatch(spark, state2, b1, kc, m, subLen, kCb, 0L))
    val committed = codeSet(StreamingIvfPq.readIndex(spark, state2).get._3)
    Fixtures.deleteRec(new File(state2, "codes"))
    assert(new File(state2, "quantizer/_SUCCESS").delete())
    assert(StreamingIvfPq.readIndex(spark, state2).isEmpty,
      "the uncommitted quantizer must read as a virgin index")
    assert(StreamingIvfPq.appendBatch(spark, state2, b1, kc, m, subLen, kCb, 0L),
      "the replay must re-seed through the crash window")
    assert(codeSet(StreamingIvfPq.readIndex(spark, state2).get._3) === committed,
      "the re-seeded index must be identical (deterministic seeds)")
  }

  test("compact: a concurrent append between listing and swap aborts loudly; " +
      "the appended generation and its applog marker survive; the next " +
      "clean compact folds it") {
    // VERDICT r14 #1 (the StreamingIvfSpec twin for the IVF-PQ store)
    val base = Fixtures.tempDir("sivfpq-ccg")
    val state = base.resolve("state").toString
    for ((lo, hi, bid) <- Seq((0L, 80L, 0L), (80L, 150L, 1L)))
      assert(StreamingIvfPq.appendBatch(spark, state,
        corpus.filter($"vec_id" >= lo && $"vec_id" < hi),
        kc, m, subLen, kCb, bid))
    val codes = new File(state, "codes")
    def vdirs() = codes.list().filter(_.startsWith("v")).sorted.toSeq
    val e = intercept[RuntimeException] {
      StreamingIvfPq.compactImpl(spark, state, () => {
        assert(StreamingIvfPq.appendBatch(spark, state,
          corpus.filter($"vec_id" >= 150L), kc, m, subLen, kCb, 2L))
      })
    }
    assert(e.getMessage.contains("concurrent writer") &&
      e.getMessage.contains(f"v${2L}%020d"), e.getMessage)
    assert(vdirs() === (0L to 2L).map(i => f"v$i%020d"))
    assert(new File(new File(codes, "applog"), f"v${2L}%020d").exists(),
      "the concurrent append's applog evidence must survive the abort")
    assert(!new File(state, "codes.tmp").exists(),
      "the aborted rewrite must be discarded")
    // nothing lost: the served code table is the one-shot encode of
    // the full corpus against the frozen pair
    val (cents, cbs, served) = StreamingIvfPq.readIndex(spark, state).get
    val want = codeSet(IvfPq.append(spark, quantized(corpus), cents, cbs, m, subLen))
    assert(codeSet(served) === want)
    // the next clean compaction folds all three generations
    assert(StreamingIvfPq.compact(spark, state))
    assert(vdirs() === Seq(f"v${2L}%020d"))
    assert(codeSet(StreamingIvfPq.readIndex(spark, state).get._3) === want)
  }
}
