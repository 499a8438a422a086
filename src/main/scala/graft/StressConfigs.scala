package graft

/** The env-gated [[StressMain]] ablation families' CONFIG CONSTANTS,
  * factored out (VERDICT r18 #1) so the always-on
  * [[graft.StressSmokeSpec]] can execute every family's EXACT
  * seeding/config path at toy scale inside `sbt test`. An env-gated
  * ablation is only as alive as its last actual run: the IVFPQ_STREAM
  * 1M alternation spent rounds 16-18 unrunnable — its r14-era
  * pqRounds=0 seeding had landed in the r16 degeneracy guard's
  * refusal regime — and nothing noticed until a hand re-run. With the
  * constants shared between the 1M harness and the smoke suite, a
  * guard or contract change that strands any ablation config, or an
  * edit that lands a config back in a refusal regime, fails `sbt
  * test` the same day instead of waiting for the next hand re-run.
  *
  * Scale-free knobs (m, subLen, kCb, pqRounds, band geometry, probe
  * counts, iteration counts) are plain constants used verbatim at
  * both scales. The ONE scale-coupled knob — the matched-coarse kc —
  * is expressed as the RULE ([[matchedKcFor]]) rather than the 1M
  * number, so the smoke applies the same rule to its toy corpus. */
object StressConfigs {

  // ---- ANN corpus geometry (StressMain.ensureAnn1m) ----

  /** ensureAnn1m: `ann1mBases` sf0.1 base embeddings × `ann1mVariants`
    * perturbed variants = 1M vectors with exactly `ann1mBases` natural
    * clusters, ids laid out so `vec_id < ann1mBases` is one variant-0
    * vector per cluster (the smallest-id seed rule's matched case). */
  val ann1mBases = 2000
  val ann1mVariants = 500

  /** The matched-coarse rule (the IVFADC assumption, measured at 1M):
    * kc = the corpus's natural cluster count, so the smallest-id seed
    * picks one representative per cluster. Scale-free by construction
    * — the 1M harness passes [[ann1mBases]], the smoke its toy base
    * count; what the degeneracy guard sees is the same geometry. */
  def matchedKcFor(bases: Int): Int = bases

  // ---- SPARK_GRAFT_STRESS_EMB: embedding near-dup band geometry ----

  val embBands = 4
  val embBits = 16
  val embMinCosine = 0.999
  val embLshK = 5

  // ---- text dedup (DOCS / 1M / CKPT / PAGERANK families) ----

  val simhashMaxHamming = 12
  val ccEveryN = 3
  val pagerankRounds = 5

  // ---- SPARK_GRAFT_STRESS_ANN1M / IVF_INCR ----

  val annK = 10
  val lshPlanes = 64
  val lshBands = 4
  /** The bands-knob recall/candidate sweep (VERDICT r9 #4). */
  val lshBandSweep = Seq(8, 16)
  val ivfCentroids = 64
  val ivfNProbe = 8

  // ---- SPARK_GRAFT_STRESS_PQ1M ----

  val pqM = 4
  val pqSubLen = 16
  val pqKCb = 16
  val pqTrainedRounds = 3

  // ---- SPARK_GRAFT_STRESS_IVFPQ1M ----

  /** (tag, kc, coarseRounds, m, subLen, kCb, pqRounds, nProbes). The
    * kc64 arms are the MISMATCHED-coarse cases and run verbatim at any
    * corpus size; the matched arm derives kc from `bases` through
    * [[matchedKcFor]] (1M: kc2000). Every arm's pqRounds ≥ 1 since r18
    * — the matched arm at pqRounds=0 is the degeneracy guard's refusal
    * regime (the TRAINED seed arm pins that refusal deliberately). */
  def ivfpq1mConfigs(
      bases: Int): Seq[(String, Int, Int, Int, Int, Int, Int, Seq[Int])] = Seq(
    ("kc64-m4-cb64", 64, 2, 4, 16, 64, 2, Seq(1, 4)),
    ("kc64-m16-cb256", 64, 2, 16, 4, 256, 2, Seq(4)),
    (s"kc$bases-m4-cb256", matchedKcFor(bases), 0, 4, 16, 256, 2, Seq(1)))

  // ---- the streamed stored-state IVF-PQ configuration, shared by
  //      IVFPQ_INCR / IVFPQ_STREAM / IVFPQ_TRAINED / ALTERNATE / AUTOKC ----

  val streamM = 4
  val streamSubLen = 16
  val streamKCb = 256

  /** pqRounds for every matched-coarse IVF-PQ build/fold path. MUST be
    * ≥ 1: 0 is the degeneracy guard's refusal regime under a matched
    * coarse quantizer — exactly the value the IVFPQ_STREAM ablation
    * rotted on (r16-r18). The smoke suite pins BOTH directions: this
    * value folds successfully, and 0 refuses with the guard's named
    * remedy — so editing this back to 0 fails `sbt test` the same day. */
  val streamPqRounds = 2
  val streamNProbe = 1

  /** IVFPQ_TRAINED arms: the seed arm DELIBERATELY builds the refusal
    * regime and must trip the guard loudly; the trained arm runs. */
  val trainedArms: Seq[(String, Int)] = Seq(("seed", 0), ("trained", 2))

  /** The degeneracy-guard refusal signature (ADVICE r16: the printed
    * claim is verified, not assumed — the match includes the REMEDY
    * text, so a reworded guard that dropped it fails the deliberate-
    * refusal arms). Shared by StressMain's TRAINED seed arm and the
    * smoke suite so both recognize exactly the same refusal. */
  def isDegeneracyRefusal(e: Throwable): Boolean =
    e.isInstanceOf[IllegalArgumentException] && e.getMessage != null &&
      e.getMessage.contains("DEGENERATE") &&
      e.getMessage.contains("pqRounds >= 1")

  // ---- SPARK_GRAFT_STRESS_SIVFC / ALTERNATE streamed IVF ----

  val sivfcCentroids = 256
  val sivfcNProbe = 4

  // ---- SPARK_GRAFT_STRESS_ZORDER ----

  val zBitsCust = 3
  val zBitsDay = 4
  val zBitsTotal = 8
  val zorderFiles = 64

  // ---- SPARK_GRAFT_STRESS_PPJOIN ----

  val ppjoinForceProp = "graft.ppjoin.force"
  val ppjoinModes: Seq[String] = Seq("sparse", "dense")

  // ---- SPARK_GRAFT_STRESS_SCD2 ----

  val scd2Buckets = 1024
}
