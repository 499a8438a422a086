package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.TextFunctions._

/** Third tranche of the LLM-data-pipeline surface (SURVEY.md §2.11):
  * collocation extraction (bigram PMI-lift), lexical-diversity
  * scoring (type-token ratio), and deterministic curriculum ordering.
  * All oracle-checked; every ratio is either an exact scaled-integer
  * floor-division or a single IEEE division of exact integer
  * aggregates, so the DuckDB twins match bitwise.
  */
object CurationQueries {

  /** The Knuth multiplicative hash shared with
    * [[TextQueries.consistentSample]] / `q_train_test_split` —
    * engine- and partitioning-independent. */
  private def knuthHash(m: Long): Column =
    pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L), lit(m))

  /** Collocation extraction — top-100 adjacent-token bigrams by
    * PMI-style lift, the phrase-mining pass that feeds tokenizer /
    * vocab decisions (which word pairs behave as one unit). Lift is
    * kept EXACT: `lift_ppm = floor(c_xy · N · 10⁶ / (c_x · c_y))`
    * in int64 (at sf0.1 the worst product is c_xy·N·10⁶ ≈ 10¹⁴, far
    * inside int64; at 100 TB the same expression moves to
    * DecimalType(38,0) — the floor-div is the only change point).
    * log() never appears, so there is no IEEE-tree parity risk.
    *
    * Shapes for 100 TB: bigrams come from one posexplode + one
    * `lead` over the (doc, pos) window — ONE shuffle on doc_id,
    * linear in corpus tokens, never all-pairs. Both count relations
    * are vocab-sized (≪ corpus), so the two enrichment joins
    * broadcast; the corpus-sized work is exactly two
    * map-side-combined aggregations. Final top-100 is
    * TakeOrderedAndProject — distributed heap, no global sort. */
  def collocPmi(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(wsTokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bigrams = toks
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
    val cXY = bigrams.groupBy(col("tok").as("x"), col("nxt").as("y"))
      .agg(count(lit(1)).as("c_xy"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val n = toks.agg(count(lit(1)).as("n_tok"))
    cXY
      .join(broadcast(uni.select(col("tok").as("x"), col("c").as("c_x"))), Seq("x"))
      .join(broadcast(uni.select(col("tok").as("y"), col("c").as("c_y"))), Seq("y"))
      .crossJoin(broadcast(n))
      .filter(col("c_xy") >= 5)
      .withColumn("lift_ppm", expr("(c_xy * n_tok * 1000000) div (c_x * c_y)"))
      .select("x", "y", "c_xy", "lift_ppm")
      .orderBy(col("lift_ppm").desc, col("x"), col("y"))
      .limit(100)
  }

  val collocPmiSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |uni AS (
      |  SELECT tok, COUNT(*) AS c
      |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
      |n AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS n_tok FROM toks),
      |bg AS (
      |  SELECT x, y, COUNT(*) AS c_xy FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS x,
      |      unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS y
      |    FROM toks WHERE len(t) >= 2)
      |  GROUP BY x, y)
      |SELECT bg.x, bg.y, bg.c_xy,
      |  (bg.c_xy * n.n_tok * 1000000) // (ux.c * uy.c) AS lift_ppm
      |FROM bg
      |JOIN uni ux ON ux.tok = bg.x
      |JOIN uni uy ON uy.tok = bg.y
      |CROSS JOIN n
      |WHERE bg.c_xy >= 5
      |ORDER BY lift_ppm DESC, bg.x, bg.y LIMIT 100""".stripMargin

  /** Lexical-diversity rollup — per-document type-token ratio
    * (distinct tokens / total tokens, the classic repetitiveness
    * signal that catches keyword-stuffed or template text), scaled to
    * exact ppm integers per document, then aggregated per source.
    * The only double in the output is ONE IEEE division of two exact
    * integers (`SUM(ttr_ppm)/n_docs`), per parity rule.
    *
    * Shapes for 100 TB: distinct-per-doc goes through a
    * (doc, token) pre-aggregation (map-side combine collapses
    * repeats BEFORE the shuffle — never `countDistinct`'s expand),
    * then one row per (doc, token), then one row per doc, then one
    * row per source. Pure aggregation pipeline, no joins except the
    * doc→source attach which rides the same doc_id grouping. */
  def ttr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), col("source"), explode(wsTokens(col("text"))).as("tok"))
      .groupBy("doc_id", "source", "tok").agg(count(lit(1)).as("tf"))
    val per = tf.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_types"), sum(col("tf")).as("n_tok"))
      .withColumn("ttr_ppm", expr("(n_types * 1000000) div n_tok"))
    per.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        min(col("ttr_ppm")).as("min_ttr_ppm"),
        max(col("ttr_ppm")).as("max_ttr_ppm"),
        (sum(col("ttr_ppm")).cast(DoubleType) / count(lit(1))).as("avg_ttr_ppm"))
      .orderBy("source")
  }

  val ttrSql: String =
    """WITH tf AS (
      |  SELECT doc_id, source, tok, COUNT(*) AS tf
      |  FROM (SELECT doc_id, source,
      |          unnest(string_split_regex(trim(text), '\s+')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, source, tok),
      |per AS (
      |  SELECT doc_id, source,
      |    (COUNT(*) * 1000000) // CAST(SUM(tf) AS BIGINT) AS ttr_ppm
      |  FROM tf GROUP BY doc_id, source)
      |SELECT source, COUNT(*) AS n_docs,
      |  MIN(ttr_ppm) AS min_ttr_ppm, MAX(ttr_ppm) AS max_ttr_ppm,
      |  CAST(CAST(SUM(ttr_ppm) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_ttr_ppm
      |FROM per GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic curriculum schedule head — the first 200 positions
    * of an easy→hard training order: band by document size (exact
    * integer `least(n_chars div 64, 7)`), shuffle WITHIN a band by
    * the Knuth doc_id hash (so same-band order is pseudo-random but
    * reproducible across engines, partitionings and reruns), then
    * global position. This is the curriculum variant of
    * `q_train_test_split`'s determinism contract.
    *
    * Shapes for 100 TB: the head is TakeOrderedAndProject over
    * (band, h, doc_id) — a distributed top-k heap, NOT a global sort
    * or corpus-wide window; the row_number that assigns positions
    * runs over the already-bounded 200-row result. Materializing the
    * FULL schedule at cluster scale is a
    * `repartitionByRange(band, h)` write (range exchange + per-file
    * local sort, positions recoverable as file_offset + row index) —
    * documented here because a corpus-wide row_number window would
    * funnel 100 TB through one task. */
  def curriculum(s: SparkSession, dir: String): DataFrame = {
    val head = Tables.documents(s, dir)
      .select(col("doc_id"),
        least(expr("n_chars div 64"), lit(7L)).as("band"),
        knuthHash(1000000000L).as("h"))
      .orderBy(col("band"), col("h"), col("doc_id"))
      .limit(200)
    head
      .withColumn("pos",
        row_number().over(Window.orderBy(col("band"), col("h"), col("doc_id")))
          .cast(LongType))
      .select("pos", "doc_id", "band", "h")
      .orderBy("pos")
  }

  val curriculumSql: String =
    """WITH d AS (
      |  SELECT doc_id, least(n_chars // 64, 7) AS band,
      |    ((doc_id % 100000000) * 2654435761) % 1000000000 AS h
      |  FROM documents),
      |head AS (
      |  SELECT doc_id, band, h FROM d ORDER BY band, h, doc_id LIMIT 200)
      |SELECT CAST(row_number() OVER (ORDER BY band, h, doc_id) AS BIGINT) AS pos,
      |  doc_id, band, h
      |FROM head ORDER BY pos""".stripMargin

  /** Merge rounds for the BPE queries. Fixed small so the unrolled
    * DuckDB twin stays readable; production vocab sizes (30k-100k
    * merges) change only the loop bound — per-round cost is
    * word-TYPE-table-sized, not corpus-sized (see
    * [[graft.operators.Bpe]]). */
  val BpeRounds = 8

  /** The corpus-scale half of BPE training: ONE scan, one
    * map-side-combining word count. Everything after runs on word
    * TYPES ([[graft.operators.Bpe.learn]]). */
  private def wordCounts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(wsTokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  private val bpeW0 =
    """w0 AS (
      |  SELECT tok AS word, COUNT(*) AS freq FROM (
      |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      |    FROM documents)
      |  WHERE tok <> '' GROUP BY tok)""".stripMargin

  /** BPE tokenizer training — the learned merge table
    * `(merge_rank, left_sym, right_sym, pair_freq)` for
    * [[BpeRounds]] rounds over the corpus word counts. See
    * [[graft.operators.Bpe]] for the iterative shape and the
    * exact-determinism contract the unrolled DuckDB twin relies on. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.learn(wordCounts(s, dir), BpeRounds)._1

  val bpeMergesSql: String =
    s"WITH $bpeW0,\n${graft.operators.Bpe.roundsSql(BpeRounds)}\n" +
      graft.operators.Bpe.mergesSelectSql(BpeRounds)

  /** BPE segmentation census — after applying the [[BpeRounds]]
    * learned merges, the resulting subword vocabulary's corpus
    * occurrence counts (top 30 by mass): the table a tokenizer build
    * inspects to pick a vocab cutoff. Same rounds as [[bpeMerges]];
    * the final fold state is exploded and aggregated once, weighted
    * by word frequency — still zero corpus rescans. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.learn(wordCounts(s, dir), BpeRounds)._2
      .select(explode(col("syms")).as("sym"), col("freq"))
      .groupBy("sym").agg(sum(col("freq")).as("n_occ"))
      .orderBy(col("n_occ").desc, col("sym"))
      .limit(30)

  val bpeEncodeSql: String =
    s"""WITH $bpeW0,
       |${graft.operators.Bpe.roundsSql(BpeRounds)}
       |SELECT sym, CAST(SUM(freq) AS BIGINT) AS n_occ
       |FROM (SELECT unnest(syms) AS sym, freq FROM s$BpeRounds)
       |GROUP BY sym ORDER BY n_occ DESC, sym LIMIT 30""".stripMargin

  /** Hashed-feature buckets for [[dsirLift]]. Bounds the feature
    * tables at any corpus scale; production DSIR uses 10k-65k. */
  val DsirBuckets = 512L

  /** DSIR-shaped data selection (Xie, Santurkar, Ma & Liang, "Data
    * Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every document by how much its hashed
    * bigram features look like a TARGET domain (here the `lang='en'`
    * slice) relative to the raw corpus. DSIR's per-feature
    * log-likelihood ratio is replaced by the exact scaled-integer
    * lift `((tc+1)·S·10⁶) div ((sc+1)·T)` (add-one smoothed; S/T =
    * raw/target occurrence totals) — the same log→integer trade as
    * `q_unigram_score` and `q_colloc_pmi`, so the DuckDB twin matches
    * bitwise; per-doc score is the SUM of its occurrences' lifts and
    * ranks near-identically to the log form for selection cutoffs.
    *
    * Shapes for 100 TB: bigrams come from a per-row array transform —
    * map-only, NO window and no doc_id shuffle on the corpus scan;
    * the feature hash is a codegen'd fold over the bigram's chars
    * (`(h·31+ascii) mod p`, then mod [[DsirBuckets]] — engine- and
    * partitioning-independent); both distribution tables aggregate to
    * ≤ [[DsirBuckets]] rows (map-side combined) and broadcast back;
    * the only corpus-sized shuffle is the final per-doc aggregate,
    * whose partial agg collapses each doc's occurrences before the
    * exchange (explode keeps a doc's rows in one partition). Int64
    * headroom: `(tc+1)·S·10⁶ ≤ S²·10⁶`, inside 2⁶³ up to S ≈ 3·10⁶
    * occurrences; at web scale the expression moves to
    * DecimalType(38,0), the same change point as `q_colloc_pmi`. */
  def dsirLift(s: SparkSession, dir: String): DataFrame = {
    val bucket = expr(
      s"""pmod(aggregate(regexp_extract_all(bg, '.', 0), 0L,
         |  (h, c) -> pmod(h * 31 + ascii(c), 1000000007L)), $DsirBuckets)""".stripMargin)
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), wsTokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val occ = toks
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  j -> concat(element_at(t, j), ' ', element_at(t, j + 1)))""".stripMargin)).as("bg"))
      .select(col("doc_id"), col("lang"), bucket.as("b"))
    // r19 (guide §1.2/§2.4): src, tgt and the totals were three
    // SEPARATE aggregations over `occ`, and with the final join that
    // made FOUR full corpus passes — each re-running the per-char
    // feature-hash fold, the plan's dominant cost. One combined
    // groupBy(b) computes sc and tc together (identical values: tc =
    // conditional count ≡ the filtered count, absent buckets ≡ tc=0
    // via the old LEFT join's coalesce), and the totals reduce over
    // the ≤DsirBuckets-row distribution frame instead of the corpus.
    // Two passes total: one for the distribution, one for scoring.
    // r20 (guide §2.3/§2.4): occurrence rows collapse to
    // (doc, lang, bucket, n) FIRST — the per-char feature-hash fold
    // runs in ONE corpus pass whose (doc_id, lang, b) exchange every
    // downstream consumer (distribution, totals, scoring) reuses; the
    // r19 form re-ran the fold for the distribution pass and again
    // for scoring (dsl driver-regressed 0.81×). Scores become
    // n-weighted sums — identical integers (`n_bg` = Σn = occurrence
    // count; `score_ppm` = Σ n·lift ≡ Σ per-occurrence lift).
    // Measured 3.10 s → 2.07 s at sf0.1 (r19 form; the r18 4-pass
    // form measured 3.20 s on the same protocol).
    val occ2 = occ.groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("n"))
    val dist = occ2.groupBy("b").agg(sum(col("n")).as("sc"),
      sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("tc"))
    val tot = dist.agg(sum(col("sc")).as("s_tot"), sum(col("tc")).as("t_tot"))
    val lift = dist.crossJoin(broadcast(tot))
      .select(col("b"), expr(
        "((tc + 1) * s_tot * 1000000) div ((sc + 1) * t_tot)")
        .as("lift_ppm"))
    occ2.join(broadcast(lift), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_bg"),
        sum(col("n") * col("lift_ppm")).as("score_ppm"))
      .withColumn("mean_lift_ppm", expr("score_ppm div n_bg"))
      .orderBy("doc_id")
  }

  val dsirLiftSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
       |  FROM documents),
       |occ AS (
       |  SELECT doc_id, lang,
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(regexp_extract_all(bg, '.'),
       |          c -> CAST(ascii(c) AS BIGINT))),
       |      (h, c) -> (h * 31 + c) % 1000000007) % $DsirBuckets AS b
       |  FROM (
       |    SELECT doc_id, lang,
       |      unnest(list_transform(range(1, len(t)), j -> t[j] || ' ' || t[j+1])) AS bg
       |    FROM toks WHERE len(t) >= 2)),
       |tgt AS (SELECT b, COUNT(*) AS tc FROM occ WHERE lang = 'en' GROUP BY b),
       |src AS (SELECT b, COUNT(*) AS sc FROM occ GROUP BY b),
       |tot AS (SELECT COUNT(*) AS s_tot,
       |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_tot
       |  FROM occ),
       |lift AS (
       |  SELECT s.b,
       |    ((COALESCE(tc, 0) + 1) * s_tot * 1000000) // ((sc + 1) * t_tot) AS lift_ppm
       |  FROM src s LEFT JOIN tgt USING (b) CROSS JOIN tot)
       |SELECT doc_id, COUNT(*) AS n_bg,
       |  CAST(SUM(lift_ppm) AS BIGINT) AS score_ppm,
       |  CAST(SUM(lift_ppm) AS BIGINT) // COUNT(*) AS mean_lift_ppm
       |FROM occ JOIN lift USING (b)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_colloc_pmi", collocPmi, Some(collocPmiSql)),
    QueryDef("q_ttr", ttr, Some(ttrSql)),
    QueryDef("q_curriculum", curriculum, Some(curriculumSql)),
    QueryDef("q_bpe_merges", bpeMerges, Some(bpeMergesSql)),
    QueryDef("q_bpe_encode", bpeEncode, Some(bpeEncodeSql)),
    QueryDef("q_dsir_lift", dsirLift, Some(dsirLiftSql)))
}
