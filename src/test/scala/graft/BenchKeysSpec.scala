package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-line key compaction (graft.BenchKeys): headroom is
  * pinned at SYNTHETIC entry counts ahead of the real surface
  * (VERDICT r15 #6 — the round-9 and round-10 overflows were both
  * discovered only when the real surface hit them and the whole map
  * fell to the empty fallback for a round), and the r16 stage-6
  * encoding is TOTAL — a future query addition can degrade key
  * readability but never drop per-query data. No Spark needed: the
  * encodings are pure string functions over the registry's keys. */
class BenchKeysSpec extends AnyFunSuite {

  // the real emitted surface: every registry key plus the memoized
  // queries' _cold twins (the Bench.main `memoized` list)
  private val coldKeys = Seq("q_dedup_clusters", "q_dedup_droplist",
    "q_dedup_simhash", "q_rag_incremental", "q_ann_ivfpq",
    "q_ann_ivfpq_incr", "q_ann_ivfpq_served").map(_ + "_cold")
  private val realKeys: Seq[String] =
    SparkEntry.queries.keys.toSeq ++ coldKeys

  /** Render at the MEASURED sf0.1 value-width regime (BENCH_r15: 143
    * of 147 values were 3 chars at 1-decimal emission, max < 10 s —
    * every synthetic value here is the full 3 chars, slightly
    * pessimistic vs the real line's handful of 1-char entries), plus
    * realistic headline numbers. */
  private def lineLen(keys: Seq[String], short: Map[String, String],
      decimals: Int): Int =
    // r19 headline regime (VERDICT r18 #2): lf is the 16-run sample
    // (~4-5 s), so vlf renders ~5 chars (28.05 here) instead of r18's
    // 6 — the widths below stay pessimistic vs the measured line
    BenchKeys.render(short, keys.map(_ -> 6.34).toMap, decimals,
      total = 123.45, n5 = 25, lf = 4.4, lfs = 2.34, lfc = 1.89,
      coldTotal = 34.56, "sf0.1").length

  test("current real surface: a candidate fits the 1850 guard (the r15 " +
      "real line was the 1-decimal stage at 1741 chars — continuity), " +
      "and still does at 148 entries with the r17 vlf and r18 " +
      "lfc/vlfc fields aboard") {
    // the VERDICT r16 #5 / r17 #1 re-check: the sentinel-normalized
    // `vlf` headline costs ~12 chars and the cold-regime `lfc`/`vlfc`
    // pair ~25 more on every candidate; headroom re-pinned at the
    // current surface PLUS one future query
    for (keys <- Seq(realKeys, realKeys :+ "q_future_addition_x")) {
      val coarse = Seq(
        BenchKeys.shorten(keys, BenchKeys.abbrev4),
        BenchKeys.abbrev5(keys),
        Some(BenchKeys.abbrev6(keys))).flatten
      val lens = coarse.map(m => lineLen(keys, m, 1))
      assert(lens.exists(_ <= 1850),
        s"no coarse stage fits at ${keys.size} entries: ${lens.mkString(",")}")
      info(s"coarse lengths at ${keys.size} entries: ${lens.mkString(",")}")
    }
    assert(realKeys.size >= 147, s"surface shrank? ${realKeys.size}")
  }

  test("the emitted line carries the sentinel-normalized totals: " +
      "vlf = value/lf and vlfc = coldTotal/lfc, each -1 when its " +
      "sentinel (or, for vlfc, every cold sample) failed") {
    val keys = Seq("q_a", "q_b")
    val short = keys.map(k => k -> k).toMap
    val line = BenchKeys.render(short, keys.map(_ -> 1.0).toMap, 2,
      total = 24.6, n5 = 1, lf = 1.23, lfs = 2.0, lfc = 2.0,
      coldTotal = 5.0, "sf0.1")
    assert(line.contains("\"vlf\":20"), line)
    assert(line.contains("\"vlfc\":2.5"), line)
    assert(line.contains("\"lfc\":2"), line)
    val noLf = BenchKeys.render(short, keys.map(_ -> 1.0).toMap, 2,
      total = 24.6, n5 = 1, lf = -1.0, lfs = 2.0, lfc = -1.0,
      coldTotal = 5.0, "sf0.1")
    assert(noLf.contains("\"vlf\":-1"), noLf)
    assert(noLf.contains("\"vlfc\":-1"), noLf)
    // no finite cold sample: coldTotal = -1 degrades vlfc even with a
    // healthy lfc — the vlf -1 convention, not a bogus negative ratio
    val noCold = BenchKeys.render(short, keys.map(_ -> 1.0).toMap, 2,
      total = 24.6, n5 = 1, lf = 1.23, lfs = 2.0, lfc = 2.0,
      coldTotal = -1.0, "sf0.1")
    assert(noCold.contains("\"vlfc\":-1"), noCold)
  }

  test("157 synthetic entries: stages 6 and 7 are unique total maps and " +
      "the stage-7 line fits the 1850 guard (the VERDICT r15 #6 " +
      "done-criterion)") {
    // ten plausible future additions on top of the real surface —
    // long names in the existing families, the worst case for the
    // capped stages (they collide into already-occupied short groups)
    val future = Seq("q_ann_ivfpq_rescore", "q_dedup_ngram_weighted",
      "q_rag_rerank_fused", "q_tpch_q23", "q_decon_bloom_sharded",
      "q_embed_cluster_balance", "q_stream_topk_decay",
      "q_quality_score_v2", "q_lang_id_fasttextish", "q_span_surgery_batch")
    val keys = realKeys ++ future
    assert(keys.distinct.size === keys.size, "synthetic keys must be fresh")
    assert(keys.size >= 157, s"synthetic surface too small: ${keys.size}")
    val m6 = BenchKeys.abbrev6(keys)
    val m7 = BenchKeys.abbrev7(keys)
    for ((m, s) <- Seq((m6, "6"), (m7, "7")))
      assert(m.size === keys.size && m.values.toSet.size === keys.size,
        s"stage $s must be a unique total map")
    val len6 = lineLen(keys, m6, 1)
    val len7 = lineLen(keys, m7, 1)
    assert(len7 <= 1850,
      s"stage-7 1-decimal line must fit at ${keys.size} entries, got $len7")
    info(s"1-decimal lengths at ${keys.size} entries: stage-6 $len6, " +
      s"stage-7 $len7")
  }

  test("stage 6 is deterministic, prefix-readable, bounded, and total " +
      "under adversarial collisions") {
    val keys = realKeys
    assert(BenchKeys.abbrev6(keys) === BenchKeys.abbrev6(keys.reverse))
    // same-cap2 group: both keys keep the readable cap-2 prefix and
    // differ only in the deterministic hash suffix
    val pair = Seq("q_data_x", "q_dates_x")
    val mp = BenchKeys.abbrev6(pair)
    assert(mp.values.toSet.size === 2)
    assert(mp.values.forall(_.startsWith("dtx")), mp.toString)
    // totality under mass collision: 60 keys sharing one cap-2 form
    // (stage 5 would fall back to their longer stage-2 forms; stage 6
    // keeps them bounded) plus the stage-2-identical pair
    val nasty = (1 to 60).map(i => s"q_test_alpha$i") ++
      Seq("q_ab_cd", "q_abcd")
    val mn = BenchKeys.abbrev6(nasty)
    assert(mn.values.toSet.size === nasty.size, "must stay unique")
    val maxCap2 = nasty.map(k => BenchKeys.abbrev(k).split('_')
      .map(t => if (t == "tpch") "t" else t.take(2)).mkString.length).max
    assert(mn.values.forall(_.length <= maxCap2 + 13),
      "stage-6 key length must stay bounded regardless of collisions")
  }
}
