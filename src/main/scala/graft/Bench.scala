package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A full untimed pass at
  * the BENCH SF runs first so timings measure steady-state plans:
  * warming at a smaller SF is not enough, because AQE picks different
  * physical plans at different sizes and each distinct plan compiles
  * its own codegen on first run (VERDICT r01 #7 — the driver's cold
  * 100.8 s vs ~35-40 s steady state). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Load-factor sentinel (VERDICT r10 #6 / r11 #4): one FIXED query
    // — q_tpch_q6, a single-stage scan+agg whose plan never changes
    // round to round — timed solo before the suite (one untimed run
    // to compile its codegen, then min of three). Its value moves
    // with the bench host's transient co-tenant load and nothing
    // else, so round-over-round totals can be read against it: if
    // `lf` moved 1.3× between rounds, a 1.3× total move is the host,
    // not the code.
    // NonFatal, not Throwable (ADVICE r12): an OOM/fatal JVM error
    // must abort the bench, not let it keep timing in a corrupted
    // JVM and emit garbage numbers as if nothing happened.
    // `runsPerSample` (VERDICT r18 #2): a sample is the wall time of
    // that many CONSECUTIVE runs — a single sub-second q6 run sits at
    // its own noise floor (lf swung 0.28→0.41 within one afternoon,
    // spanning vlf 1.5× at a flat raw total, too noisy to adjudicate
    // the 1.3× regression it exists to catch), while the ~3 s vlfc
    // sentinel held ±10%. Summing 8 runs lands lf in that same ≥2 s
    // regime (per-run jitter amortizes ~√n) with the protocol
    // unchanged: one untimed codegen run, min of 3 samples. Sized 16
    // after measuring: at 8 runs (~2.1 s samples) a ×3 spread still
    // put vlf at ±14% — the min-of-3 estimator dodges bursty load
    // that the suite total (a sum) absorbs, so the sample must be
    // LONGER than the burst timescale; ~3.5 s samples land in the
    // vlfc sentinel's regime, and the residual ±13% band across RUNS
    // is the single-workload floor on this host (the band moves on a
    // minutes timescale no within-sample averaging reaches — NOTES
    // r19 spread table). COMPARABILITY: from r19 on, lf is ~16×
    // its r18 meaning and vlf ~1/16 (r18 vlf 194 ≈ r19 vlf ~12) —
    // read the pair accordingly.
    def sentinelTime(name: String, runsPerSample: Int = 1): Double =
      if (!SparkEntry.queries.contains(name)) -1.0
      else {
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            var i = 0
            while (i < runsPerSample) {
              SparkEntry.queries(name)(spark, sfDir).count(); i += 1
            }
            (System.nanoTime() - t0) / 1e9
          }.min
        } catch { case NonFatal(_) => -1.0 }
      }
    val lf = sentinelTime("q_tpch_q6", runsPerSample = 16)
    // Shuffle-bound sentinel (VERDICT r13 #4): the scan-bound q6
    // sentinel under-predicts the suite total, whose sf0.1 floor is
    // per-query job/codegen/SHUFFLE overhead (NOTES r13: lf moved
    // 1.4× while the suite moved 1.04×). q_rank_stats — a multi-stage
    // window/aggregate whose plan is all exchange + sort — tracks
    // that regime; same protocol (solo, pre-suite, one untimed
    // codegen run, min of three). Round-over-round totals read
    // against the PAIR: scan regime via lf, shuffle regime via lfs.
    val lfs = sentinelTime("q_rank_stats")
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case NonFatal(_) => () }
    }
    // Three timed passes, per-query minimum: a single pass is at the
    // mercy of transient co-tenant load / GC pauses on the bench host
    // (the round-2 harness run showed unrelated trivial queries 2-3×
    // their steady-state times, and min-of-two still wobbled ±20%
    // per query between rounds 4 and 5 with no code change). The min
    // of three steady-state runs is the lowest-variance estimator of
    // the plan's intrinsic cost that fits the round's time budget.
    // A failed run records +Inf, not its (possibly tiny) elapsed time:
    // a query that starts throwing after warm-up must surface as -1 in
    // the emitted line, never as a bogus fast minimum.
    def timedRun(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case NonFatal(_) => Double.PositiveInfinity }
    }
    def timedPass(): Map[String, Double] =
      SparkEntry.queries.map { case (name, _) => name -> timedRun(name) }
    val passes = Seq(timedPass(), timedPass(), timedPass())
    // The ≥1.5 s shuffle-heavy queries (the dedup family) showed ±18%
    // round-to-round wobble even under min-of-three: their many-stage
    // shuffles are the most exposed to transient co-tenant load, and
    // three samples of a long-tailed distribution under-estimate the
    // true minimum. Two extra timed runs of JUST those queries cost a
    // few seconds total and tighten the min where the variance
    // actually lives.
    val slow = SparkEntry.queries.keys
      .filter(n => passes.map(_(n)).min >= 1.5).toSeq
    val extra: Map[String, Double] = (1 to 2).flatMap { _ =>
      slow.map(name => name -> timedRun(name))
    }.groupMapReduce(_._1)(_._2)(math.min)
    val results = SparkEntry.queries.map { case (name, _) =>
      name -> math.min(passes.map(_(name)).min,
        extra.getOrElse(name, Double.MaxValue))
    }
    // Warm/cold split for the memoized queries (ADVICE r8): clusters
    // and droplist share a session memo of the CC label frame, so the
    // passes above measure the WARM cost — a projection over the
    // memoized frame, which is the real cost in a session that already
    // ran the sibling query, but NOT the standalone pipeline cost. The
    // `_cold` entries time the query with the memo dropped first (min
    // of two samples; excluded from "total", which stays the cost of
    // one session running every query once, memo effects included).
    // q_dedup_canonical rides the same memo but gets no _cold entry:
    // its standalone cost is clusters_cold + its warm join/agg (the
    // two visible numbers bound it), and a third near-duplicate cold
    // key spends ~20 chars of the 1950-char line budget on no new
    // information. q_dedup_simhash joined the list in round 10
    // (ADVICE r9): it rides the round-9 pairMemo, so its warm number
    // is a projection — the _cold entry keeps its standalone
    // signature→band→verify cost comparable with rounds 1-8.
    // q_dup_pagerank shares that pair frame but keeps only its warm
    // entry: its cold cost is bounded by simhash_cold + its own warm
    // rounds, the canonical argument.
    // r15: the stored-state index families ride session memos too
    // (VERDICT r14 #4 — rgin/anivsr/annivfpqincr re-paid their index
    // build + equality gate every timed pass): warm passes now time
    // the SERVE cost, the production shape (build once, serve many);
    // each family's build cost stays visible via one _cold entry.
    // q_ann_ivfpq_rerank/_served-warm bound their siblings (the
    // q_dedup_canonical argument), so no extra keys for them.
    val memoized = Seq("q_dedup_clusters", "q_dedup_droplist", "q_dedup_simhash",
      "q_rag_incremental", "q_ann_ivfpq", "q_ann_ivfpq_incr",
      "q_ann_ivfpq_served")
      .filter(SparkEntry.queries.contains)
    // Cold-regime sentinel (VERDICT r17 #1): lf/lfs bracket the two
    // WARM regimes (scan-bound, shuffle-bound), but the `_cold` keys
    // live in a third — memo-reset iterative REBUILD (many short
    // shuffle stages, per-round materialization, driver GC churn) —
    // and the r17 driver run showed that regime moving 4.1× while
    // every warm number and vlf sat flat, with nothing on the line to
    // attribute it. One PINNED workload, independent of the bench SF:
    // the real ConnectedComponents.minLabels machinery over a fixed
    // synthetic graph (65 536 nodes in 1 024 chains of length 64;
    // pointer jumping converges in ~8 rounds of join+agg+jump-join,
    // each round localCheckpoint-materialized — the exact stage shape
    // of the cold CC rebuilds that moved). Same protocol as lf/lfs
    // (one untimed codegen run, then min of three), timed SOLO
    // immediately before the cold loop so it samples the host in the
    // same window the colds run. Nothing memoizes it, so it is a
    // rebuild by construction — no resetAll needed inside the samples.
    def coldSentinelTime(): Double = {
      import org.apache.spark.sql.functions.{col, sum => fsum}
      def run(): Double = {
        val t0 = System.nanoTime()
        val fwd = spark.range(65536L)
          .filter(col("id") % 64 =!= 63)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
        val edges = operators.Materializer.Local(
          fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst"))))
        val (labels, _) = operators.ConnectedComponents.minLabels(edges)
        labels.agg(fsum("label")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      try { run(); (1 to 3).map(_ => run()).min }
      catch { case NonFatal(_) => -1.0 }
    }
    val lfc = coldSentinelTime()
    val cold: Map[String, Double] = memoized.map { name =>
      (name + "_cold") -> (1 to 2).map { _ =>
        queries.SessionMemo.resetAll(spark)
        timedRun(name)
      }.min
    }.toMap
    // Σ of the cold values, valid only when EVERY cold sample is
    // finite (ADVICE r18): summing just the finite ones would let a
    // cold run that starts failing SHRINK the vlfc numerator and read
    // as a cold-path improvement, with only the per-key -1 on the
    // line revealing it. A partially-failed cold basket is not
    // comparable to a healthy one — degrade the headline to -1 (the
    // vlf convention); the per-key entries still show which cold run
    // failed.
    val coldTotal =
      if (cold.nonEmpty && cold.values.forall(java.lang.Double.isFinite))
        cold.values.sum
      else -1.0
    // Key compaction + line rendering live in graft.BenchKeys (r16:
    // factored out so BenchKeysSpec measures headroom at SYNTHETIC
    // entry counts before the real surface consumes it — the round-9
    // and round-10 overflows were both discovered the hard way). The
    // harness keeps only the LAST ~2000 chars of the run's output and
    // trailing sbt status lines eat ~100 of them, hence the 1850-char
    // guard; the first encoding that fits wins — stage 1 first for
    // key continuity with prior rounds, coarser stages as the surface
    // grows, the stage-6 TOTAL encoding and the 1-decimal precision
    // shave before anything falls to the empty-map fallback. n5 is
    // the 5-sample-set COUNT (ADVICE r7 / round-9: membership is
    // recoverable — a query is in the set iff its value is ≥ 1.5 s).
    val emitted = results ++ cold
    val total = if (results.nonEmpty) results.values.filter(java.lang.Double.isFinite).sum else 0.0
    // sf as basename: the full path spent 15 chars of the line budget
    // restating a constant prefix the driver already knows.
    val sfTag = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val keys = emitted.keys
    def lineAt(decimals: Int)(short: Map[String, String]): String =
      BenchKeys.render(short, emitted, decimals, total, slow.size, lf, lfs,
        lfc, coldTotal, sfTag)
    val fineMaps =
      BenchKeys.shorten(keys, BenchKeys.abbrev) ++
        BenchKeys.shorten(keys, BenchKeys.abbrev2) ++
        BenchKeys.shorten(keys, BenchKeys.abbrev3) ++
        BenchKeys.shorten(keys, BenchKeys.abbrev4) ++
        BenchKeys.abbrev5(keys) ++
        Seq(BenchKeys.abbrev6(keys), BenchKeys.abbrev7(keys)) ++
        BenchKeys.shorten(keys, (k: String) => k.stripPrefix("q_"))
    val coarseMaps =
      BenchKeys.shorten(keys, BenchKeys.abbrev4) ++
        BenchKeys.abbrev5(keys) ++
        Seq(BenchKeys.abbrev6(keys), BenchKeys.abbrev7(keys))
    val candidates =
      fineMaps.map(lineAt(2)).toSeq ++ coarseMaps.map(lineAt(1)).toSeq
    if (sys.env.contains("SPARK_GRAFT_BENCH_DEBUG"))
      System.err.println(s"[bench-debug] candidate lengths: " +
        s"${candidates.map(_.length).mkString(",")}")
    val safe = candidates.find(_.length <= 1850).getOrElse(
      s"""{"metric":"total","value":${BenchKeys.fmt(total)},"unit":"sec","vlf":${BenchKeys.fmt(if (lf > 0) total / lf else -1.0)},"vlfc":${BenchKeys.fmt(if (lfc > 0 && coldTotal >= 0) coldTotal / lfc else -1.0)},"queries":{},"lf":${BenchKeys.fmt(lf)},"lfs":${BenchKeys.fmt(lfs)},"lfc":${BenchKeys.fmt(lfc)},"sf":"$sfTag"}""")
    // Stop Spark BEFORE printing: shutdown logging would otherwise land
    // after the metric line and push it away from the end of the tail
    // window the harness captures.
    spark.stop()
    println(safe)
  }
}
