package graft

/** The bench-line key-compaction stages and the line renderer,
  * factored out of [[Bench]] (VERDICT r15 #6) so the encoding is
  * testable at SYNTHETIC entry counts — the previous stages lived as
  * local defs inside `Bench.main`, so the only way to measure "does
  * the line still fit at N+10 entries" was to grow the real query
  * surface and watch the emitted line, and twice (rounds 9 and 10)
  * the surface outgrew a stage between measurements and the whole
  * map fell to the empty fallback for a round. BenchKeysSpec now
  * pins headroom at 157 synthetic entries BEFORE the surface gets
  * there.
  *
  * Context (NOTES.md lesson 7): the harness that reads the bench
  * line keeps only the LAST ~2000 chars of the run's output and
  * trailing sbt status lines eat ~100 of them, so every candidate
  * line is checked against a 1850-char guard and the first fitting
  * encoding wins — stage 1 first for key continuity with prior
  * rounds, coarser stages as the surface grows, full keys as a
  * collision-proof fallback. Stage 6 (r16) is the first TOTAL stage:
  * cap-2 tokens with collision groups disambiguated by a short
  * deterministic base-36 hash suffix instead of falling back to the
  * longer uncapped forms — bounded key length regardless of how the
  * query names collide, so a future query addition degrades key
  * READABILITY, never the per-query DATA. */
object BenchKeys {

  /** Stage 1 (round 8): drop the uniform "q_" prefix, then drop
    * vowels after the first character of each underscore token
    * ("dedup_ngram_jaccard" -> "ddp_ngrm_jccrd"). Deterministic,
    * human-decodable. */
  def abbrev(k: String): String =
    k.stripPrefix("q_").split('_').map { t =>
      if (t.matches("q?\\d+")) t
      else t.head +: t.tail.filterNot("aeiou".contains(_))
    }.mkString("_")

  /** Stage 2 (round 9): additionally drop underscores and compact the
    * uniform "tpch" prefix ("ddp_ngrm_jccrd" -> "ddpngrmjccrd",
    * "tpch_q14" -> "tq14"). */
  def abbrev2(k: String): String =
    abbrev(k).split('_').map {
      case "tpch" => "t"
      case t => t
    }.mkString

  /** Stage 3 (round 10): token cap 4. */
  def abbrev3(k: String): String =
    abbrev(k).split('_').map {
      case "tpch" => "t"
      case t => t.take(4)
    }.mkString

  /** Stage 4 (round 10): token cap 3. */
  def abbrev4(k: String): String =
    abbrev(k).split('_').map {
      case "tpch" => "t"
      case t => t.take(3)
    }.mkString

  /** Token capping shared by stages 5-7: "tpch" compacts to "t",
    * digit tokens survive WHOLE (capping "q14"/"q15" to one char
    * would collapse the entire TPC-H family into hash-suffixed
    * keys), the first token keeps `first` chars and later tokens
    * keep `rest`. */
  private def capTokens(k: String, first: Int, rest: Int): String = {
    val ts = abbrev(k).split('_').map {
      case "tpch" => "t"
      case t => t
    }
    def cap(t: String, n: Int): String =
      if (t.matches("q?\\d+")) t else t.take(n)
    (cap(ts.head, first) +: ts.tail.map(cap(_, rest))).mkString
  }

  private def cap2(k: String): String = capTokens(k, 2, 2)

  /** Whole-map uniqueness gate shared by every stage: on any
    * collision the stage is unusable (None) and the next candidate
    * is tried instead — a colliding map would silently merge two
    * queries' timings. */
  def shorten(keys: Iterable[String], f: String => String): Option[Map[String, String]] = {
    val m = keys.map(k => k -> f(k)).toMap
    if (m.values.toSet.size == m.size) Some(m) else None
  }

  /** Stage 5 (round 10): token cap 2, cap-2 collision groups falling
    * back PER KEY to their uncapped stage-2 form (capped fallbacks
    * can still collide — ann_ivf vs ann_ivfpq share every 3-char
    * prefix; the uncapped forms are distinct whenever the full names
    * are). Still partial: a collision among the stage-2 fallbacks
    * themselves yields None. */
  def abbrev5(keys: Iterable[String]): Option[Map[String, String]] = {
    val groups = keys.groupBy(cap2)
    val m: Map[String, String] = groups.iterator.flatMap {
      case (short, ks) =>
        if (ks.size == 1) ks.map(_ -> short)
        else ks.map(k => k -> abbrev2(k))
    }.toMap
    if (m.values.toSet.size == m.size) Some(m) else None
  }

  /** Stage 6 (round 16, VERDICT r15 #6): the TOTAL stage — cap-2
    * tokens, collision groups disambiguated by a deterministic
    * base-36 hash suffix of the FULL key (2 chars, widened together
    * until the whole map is unique; a 64-bit-hash tie between
    * distinct keys sharing a cap-2 form is the only way to exhaust
    * the widening, and then the full keys come back as the
    * collision-proof floor). Key length is bounded by
    * |cap2| + 13 regardless of how query names collide, so the
    * per-query data always survives — unlike stage 5, whose
    * uncapped fallbacks can grow with the colliding NAMES. */
  def abbrev6(keys: Iterable[String]): Map[String, String] =
    hashDisambiguated(keys, cap2)

  /** Stage 7 (round 16): the SHORTER total stage — first token capped
    * at 2 chars, later non-digit tokens at 1 ("ddcl" -> "ddc"), same
    * hash disambiguation. At the measured sf0.1 value widths this is
    * what actually buys the 157-entry headroom the r15 verdict asked
    * for (stage 6 measures ~1878 there; BenchKeysSpec pins both). */
  def abbrev7(keys: Iterable[String]): Map[String, String] =
    hashDisambiguated(keys, capTokens(_, 2, 1))

  private def h36(k: String): String = {
    val h = (k.foldLeft(1125899906842597L)((a, c) => a * 31 + c)
      & Long.MaxValue)
    val s = java.lang.Long.toString(h, 36)
    // left-pad so short hashes still yield suffix-distinct widths
    ("0" * 13 + s).takeRight(13)
  }

  private def hashDisambiguated(keys: Iterable[String],
      f: String => String): Map[String, String] = {
    val groups = keys.groupBy(f)
    (2 to 13).iterator.map { n =>
      groups.iterator.flatMap { case (short, ks) =>
        if (ks.size == 1) ks.map(_ -> short)
        else ks.map(k => k -> (short + h36(k).takeRight(n)))
      }.toMap
    }.find(m => m.values.toSet.size == m.size)
      .getOrElse(keys.map(k => k -> k).toMap)
  }

  /** Two-decimal value format for the headline numbers (and the
    * per-query values at full precision); -1 marks a query that
    * failed every sample. */
  def fmt(v: Double, decimals: Int = 2): String =
    if (!java.lang.Double.isFinite(v)) "-1"
    else java.math.BigDecimal.valueOf(v)
      .setScale(decimals, java.math.RoundingMode.HALF_UP)
      .stripTrailingZeros.toPlainString

  /** The ONE emitted JSON line, factored here so BenchKeysSpec can
    * measure real line lengths at synthetic entry counts (header
    * scaladoc). `decimals` is the per-query precision — 2 normally,
    * 1 for the last-resort precision shave; the headline numbers
    * stay at 2 either way.
    *
    * `vlf` (VERDICT r16 #5) is the sentinel-NORMALIZED total —
    * `value / lf`, dimensionless — emitted beside the raw total so a
    * cross-round comparison needs no manual sentinel arithmetic: the
    * scan-bound host band moves `value` and `lf` together and leaves
    * `vlf` flat, while a genuine code regression moves `vlf` itself.
    * -1 when the sentinel failed. Since r19 (VERDICT r18 #2) an `lf`
    * sample is 16 consecutive q6 runs, so lf reads ~16× its r18 value
    * and vlf ~1/16 (r18's 194 ≈ r19's ~12).
    *
    * `vlfc` (VERDICT r17 #1) is the same verdict for the COLD regime:
    * `coldTotal / lfc`, where `coldTotal` is the sum of the `_cold`
    * values — valid only when EVERY cold sample is finite (ADVICE
    * r18: a partial sum would shrink the numerator when a cold run
    * starts failing and read as an improvement) — and `lfc` is the
    * pinned cold-regime sentinel (a fixed synthetic
    * ConnectedComponents rebuild, timed solo right before the cold
    * loop). The r17 driver run's 4.1× cold move with flat warms could
    * not be attributed from the line; now host pressure on the
    * rebuild regime moves `coldTotal` and `lfc` together and leaves
    * `vlfc` flat, while a cold-path code regression moves `vlfc`
    * itself. -1 when the sentinel failed or ANY cold sample did. */
  def render(short: Map[String, String], emitted: Map[String, Double],
      decimals: Int, total: Double, n5: Int, lf: Double, lfs: Double,
      lfc: Double, coldTotal: Double, sfTag: String): String = {
    val qs = emitted.map { case (k, v) =>
      s"\"" + short(k) + "\":" + fmt(v, decimals)
    }.mkString("{", ",", "}")
    val vlf = if (lf > 0) total / lf else -1.0
    val vlfc = if (lfc > 0 && coldTotal >= 0) coldTotal / lfc else -1.0
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","vlf":${fmt(vlf)},"vlfc":${fmt(vlfc)},"queries":$qs,"n5":$n5,"lf":${fmt(lf)},"lfs":${fmt(lfs)},"lfc":${fmt(lfc)},"sf":"$sfTag"}"""
  }
}
