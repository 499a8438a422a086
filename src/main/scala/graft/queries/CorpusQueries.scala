package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.TextFunctions._

/** Corpus-curation operators over the `documents` table — the second
  * tranche of the LLM-data-pipeline surface (SURVEY.md §2.11): fuzzy
  * n-gram decontamination, inter-document repeated-gram exposure,
  * fixed-token chunking with overlap, temperature-scaled source
  * mixture weights, and OOV-rate against the corpus vocabulary. All
  * oracle-checked; every ratio in an output is a SINGLE IEEE division
  * of exact integer aggregates so the DuckDB twins match bitwise.
  */
object CorpusQueries {

  /** The deterministic Knuth-hash split shared with
    * [[TextQueries.trainTestSplit]] / `q_contamination`: 90/5/5. */
  private def splitCol = {
    val bucket =
      pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L), lit(100L))
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
  }

  /** FUZZY decontamination — the n-gram-collision scan (the GPT-3 /
    * Llama methodology): an eval document is contaminated if ANY of
    * its word-8-grams also occurs in the train split, catching
    * benchmark leakage that survives exact-fingerprint checks
    * (`q_contamination`) via trivial edits. Grams are md5-hashed
    * before the shuffle so the join key is fixed-width (32 chars, not
    * ~50-char raw grams) — the 100 TB shuffle-volume device. Shapes:
    * one token explode + 7 `lead`s over the (doc, pos) window (one
    * shuffle on doc_id), distinct gram set per doc, equi-join against
    * the distinct train-gram set (shuffle on the hash; at 100 TB the
    * eval side is 10% of train and AQE broadcasts nothing — both
    * sides are corpus-scale, which is exactly when hash-partitioned
    * equi-join is the right plan), then two integer aggregations.
    * Never all-pairs. */
  /** Shared 8-gram front for the decontamination scans: one distinct
    * `(doc_id, split, g)` row per word-8-gram occurrence, grams
    * md5-hashed pre-shuffle. */
  private def gramFrame(s: SparkSession, dir: String): DataFrame = {
    val n = 8
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), splitCol.as("split"),
        posexplode(wsTokens(col("text"))).as(Seq("pos", "tok")))
    val leads = (1 until n).map(i => lead(col("tok"), i).over(w).as(s"t$i"))
    toks.select(col("doc_id") +: col("split") +: col("tok") +: leads: _*)
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"), col("split"),
        md5(concat_ws(" ", col("tok") +: (1 until n).map(i => col(s"t$i")): _*)).as("g"))
      .distinct()
  }

  def contaminationNgram(s: SparkSession, dir: String): DataFrame = {
    val grams = gramFrame(s, dir)
    val trainGrams = grams.filter(col("split") === "train")
      .select("g").distinct().withColumn("_hit", lit(1))
    val perDoc = grams.join(trainGrams, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("split") =!= "train" && col("_hit") === 1, 1L)
        .otherwise(0L)).as("n_hits"))
    // Docs shorter than the gram order produce no gram rows — join
    // back to the full doc set so n_docs counts every document, not
    // just the grammable ones.
    Tables.documents(s, dir).select(col("doc_id"), splitCol.as("split"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_contaminated"),
        sum(col("n_hits")).as("tot_hit_grams"))
      .orderBy("split")
  }

  val contaminationNgramSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CASE WHEN ((doc_id % 100000000) * 2654435761) % 100 < 90 THEN 'train'
      |         WHEN ((doc_id % 100000000) * 2654435761) % 100 < 95 THEN 'val'
      |         ELSE 'test' END AS split,
      |    string_split_regex(trim(text), '\s+') AS t
      |  FROM documents),
      |gram_rows AS (
      |  SELECT doc_id, split,
      |    unnest(list_transform(range(1, len(t) - 6),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
      |           t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS gr
      |  FROM toks WHERE len(t) >= 8),
      |grams AS (SELECT DISTINCT doc_id, split, md5(gr) AS g FROM gram_rows),
      |train_grams AS (SELECT DISTINCT g, 1 AS hit FROM grams WHERE split = 'train'),
      |per_doc AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN split <> 'train' AND hit = 1 THEN 1 ELSE 0 END) AS n_hits
      |  FROM grams LEFT JOIN train_grams USING (g)
      |  GROUP BY doc_id),
      |all_docs AS (
      |  SELECT t.doc_id, t.split, COALESCE(p.n_hits, 0) AS n_hits
      |  FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id)
      |SELECT split, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
      |  CAST(SUM(n_hits) AS BIGINT) AS tot_hit_grams
      |FROM all_docs GROUP BY split ORDER BY split""".stripMargin

  /** Reference-LM familiarity scoring (the KenLM-shaped quality /
    * domain-shift signal with the float hazard removed): score every
    * NON-train document by how familiar its token occurrences are to
    * the train split's unigram distribution — `familiar_mass` =
    * Σ train-tf over the doc's occurrences (an OOV occurrence adds 0),
    * `n_oov` = OOV occurrence count, `mean_familiarity` = the integer
    * floor mean. A true log-prob perplexity would rank near-identically
    * but every `ln` is libm-dependent and its SUM is association-order-
    * dependent — integer mass is the cross-engine-exact surrogate
    * (the same trade `q_keyword_topk` makes against log-idf).
    *
    * Shapes at 100 TB: the tf table is VOCABULARY-sized (≪ corpus;
    * built with one map-side-combining count over train occurrences);
    * the eval side is the small split (5-10%); the join key is the
    * token — hash join with AQE free to broadcast a small-vocab tf.
    * Per-doc reduce is one aggregate, map-side combining. No windows,
    * no sorts until the final ORDER BY. */
  def unigramScore(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val occ = Tables.documents(s, dir)
      .select(col("doc_id"), splitCol.as("split"),
        explode(TextFunctions.wsTokens(col("text"))).as("tok"))
    val tf = occ.filter(col("split") === "train")
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    occ.filter(col("split") =!= "train")
      .join(tf, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(coalesce(col("tf"), lit(0L))).as("familiar_mass"),
        sum(when(col("tf").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("mean_familiarity", expr("familiar_mass DIV n_tok"))
      .orderBy("doc_id")
  }

  val unigramScoreSql: String =
    """WITH occ AS (
      |  SELECT doc_id,
      |    CASE WHEN ((doc_id % 100000000) * 2654435761) % 100 < 90 THEN 'train'
      |         WHEN ((doc_id % 100000000) * 2654435761) % 100 < 95 THEN 'val'
      |         ELSE 'test' END AS split,
      |    unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |tf AS (SELECT tok, COUNT(*) AS tf FROM occ WHERE split = 'train' GROUP BY tok)
      |SELECT o.doc_id, COUNT(*) AS n_tok,
      |  CAST(SUM(COALESCE(tf.tf, 0)) AS BIGINT) AS familiar_mass,
      |  CAST(SUM(CASE WHEN tf.tf IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(SUM(COALESCE(tf.tf, 0)) AS BIGINT) // COUNT(*) AS mean_familiarity
      |FROM occ o LEFT JOIN tf ON tf.tok = o.tok
      |WHERE o.split <> 'train'
      |GROUP BY o.doc_id ORDER BY o.doc_id""".stripMargin

  /** TWO-PHASE bloom decontamination — the SAME answer as
    * [[contaminationNgram]] through the 100 TB execution shape: a
    * bloom filter is built over the EVAL gram set (the small side —
    * one distributed aggregate, ~1 MB of bits) and probed as a
    * MAP-SIDE `might_contain` filter over the train grams BEFORE
    * their distinct/shuffle/join, so the non-colliding corpus mass —
    * in practice ~all of it — never reaches an exchange. The bloom
    * has no false negatives, and its false positives are eliminated
    * by the exact equi-join on the survivors, so the output is
    * bit-identical to the exact plan (spec-pinned in BloomDeconSpec;
    * the oracle is literally [[contaminationNgramSql]]) — the filter
    * is pure pruning, never a correctness dependency. Uses Spark's
    * own runtime-filter expressions deliberately installed
    * ([[graft.operators.BloomDecon]]) where Catalyst's automatic
    * injection cannot prove the pattern. */
  def deconBloom(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.BloomDecon
    val grams = gramFrame(s, dir)
    val evalGrams = grams.filter(col("split") =!= "train")
    val bloom = BloomDecon.build(evalGrams.select("g").distinct(), col("g"))
    val trainHit = bloom match {
      case Some(bits) =>
        grams.filter(col("split") === "train")
          .filter(BloomDecon.mightContain(s, bits, col("g")))
          .select("g").distinct().withColumn("_hit", lit(1))
      case None => // no eval grams at all -> nothing can collide
        grams.select("g").limit(0).withColumn("_hit", lit(1))
    }
    val perDoc = evalGrams.join(trainHit, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("_hit") === 1, 1L).otherwise(0L)).as("n_hits"))
    Tables.documents(s, dir).select(col("doc_id"), splitCol.as("split"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_contaminated"),
        sum(col("n_hits")).as("tot_hit_grams"))
      .orderBy("split")
  }

  /** INTER-document repeated-gram exposure, per source — the
    * boilerplate scan behind suffix-style "dedup the repeated spans"
    * passes (Lee et al., Deduplicating Training Data): for each
    * document, the fraction of its word-3-gram occurrences whose gram
    * also appears in at least one OTHER document. Complements
    * `q_repetition_ratio` (INTRA-doc duplicated-gram mass): a
    * template rendered once per doc is invisible there and lights up
    * here. Shapes: the shared [[shingleRows]] front (one shuffle on
    * doc_id), gram document-frequency via distinct + groupBy (shuffle
    * on the gram), equi-join occurrences back to the df≥2 gram set,
    * two integer aggregations. The df set is near-dup-mass-bounded,
    * never corpus-sized after the HAVING. */
  def repeatedGrams(s: SparkSession, dir: String): DataFrame = {
    // round-robin kept after the r20 audit: the doc_id-keyed variant
    // measured flat here (0.36 s vs 0.37 s — the df-set build on the
    // gram key dominates, not the doc-keyed tail).
    val sh = shingleRows(Tables.spread(Tables.documents(s, dir)),
      "doc_id", "text", extra = Seq("source"))
    val shared = sh.select("doc_id", "sh").distinct()
      .groupBy("sh").agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select("sh").withColumn("_shared", lit(1))
    sh.join(shared, Seq("sh"), "left")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("_shared") === 1, 1L).otherwise(0L)).as("n_shared"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).as("tot_sh"),
        sum(col("n_shared")).as("tot_shared"),
        max(col("n_shared").cast(DoubleType) / col("n_sh").cast(DoubleType))
          .as("max_doc_frac"))
      .withColumn("shared_frac",
        col("tot_shared").cast(DoubleType) / col("tot_sh").cast(DoubleType))
      .select("source", "n_docs", "tot_sh", "tot_shared", "shared_frac", "max_doc_frac")
      .orderBy("source")
  }

  val repeatedGramsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, source, unnest(list_transform(range(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM toks WHERE len(t) >= 3),
      |shared AS (
      |  SELECT sh, 1 AS is_shared FROM (SELECT DISTINCT doc_id, sh FROM sh)
      |  GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2),
      |per_doc AS (
      |  SELECT doc_id, source, COUNT(*) AS n_sh,
      |    SUM(CASE WHEN is_shared = 1 THEN 1 ELSE 0 END) AS n_shared
      |  FROM sh LEFT JOIN shared USING (sh)
      |  GROUP BY doc_id, source)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_sh) AS BIGINT) AS tot_sh,
      |  CAST(SUM(n_shared) AS BIGINT) AS tot_shared,
      |  CAST(SUM(n_shared) AS DOUBLE) / CAST(SUM(n_sh) AS DOUBLE) AS shared_frac,
      |  MAX(CAST(n_shared AS DOUBLE) / CAST(n_sh AS DOUBLE)) AS max_doc_frac
      |FROM per_doc GROUP BY source ORDER BY source""".stripMargin

  /** Fixed-token CHUNKING with overlap — the context-window splitter
    * every training/RAG export runs: chunk capacity 32 tokens, stride
    * 24 (8-token overlap), chunks start at multiples of the stride
    * and the final chunk keeps the tail (`n_chunks = 1 +
    * ceil((n_tok − 32) / 24)` via exact integer arithmetic). Emits
    * one row per CHUNK with its exact token extent and an md5
    * fingerprint of the chunk text — the fingerprint pins the precise
    * token content of every chunk in both engines without exporting
    * the text itself. Shapes: pure per-row arithmetic + one
    * `posexplode(sequence(...))` — no shuffle at all until the final
    * ORDER BY; at 100 TB this is a map-only operator feeding a
    * partitioned write. Small capacities keep the sf0.01 fixture
    * multi-chunk; production capacity is a parameter. */
  def chunkDocs(s: SparkSession, dir: String): DataFrame = {
    val cap = 32L
    val stride = 24L
    val t = Tables.documents(s, dir).select(col("doc_id"),
      wsTokens(col("text")).as("toks"),
      tokenCount(col("text")).cast(LongType).as("n_tok"))
    t.withColumn("n_chunks",
        when(col("n_tok") <= cap, lit(1L))
          .otherwise(lit(1L) +
            floor((col("n_tok") - cap + stride - 1) / stride).cast(LongType)))
      .select(col("doc_id"), col("toks"), col("n_tok"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)).as(Seq("_p", "chunk_id")))
      .withColumn("start", col("chunk_id") * stride)
      .withColumn("len", least(lit(cap), col("n_tok") - col("start")))
      .withColumn("chunk_fp",
        md5(concat_ws(" ", slice(col("toks"), (col("start") + 1).cast(IntegerType),
          col("len").cast(IntegerType)))))
      .select("doc_id", "chunk_id", "start", "len", "chunk_fp")
      .orderBy("doc_id", "chunk_id")
  }

  val chunkDocsSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, toks, n_tok,
      |    CASE WHEN n_tok <= 32 THEN 1 ELSE 1 + (n_tok - 32 + 23) // 24 END AS n_chunks
      |  FROM t),
      |c AS (
      |  SELECT doc_id, toks, n_tok,
      |    unnest(range(0, n_chunks)) AS chunk_id
      |  FROM n)
      |SELECT doc_id, chunk_id, chunk_id * 24 AS start,
      |  LEAST(32, n_tok - chunk_id * 24) AS len,
      |  md5(array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + LEAST(32, n_tok - chunk_id * 24)], ' ')) AS chunk_fp
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** Temperature-scaled source MIXTURE weights — the multilingual /
    * multi-source sampling recipe (α = 0.5 square-root smoothing, the
    * mBERT/XLM-R convention): `w_i ∝ sqrt(n_tok_i)`, plus the
    * expected per-source epoch count for a 1M-token draw budget
    * (`epochs_i = budget · w_i / n_tok_i` — how many times source i's
    * data is re-seen, the quantity up-sampling decisions read).
    * DETERMINISM DEVICE: `sqrt` is quantized to fixed-point
    * (`floor(sqrt · 1e6)`, exact BIGINT) BEFORE the normalizing sum —
    * a sum of raw doubles is association-order-dependent (Spark sums
    * in partition order, DuckDB windows use segment trees), while the
    * integer sum is exact in both engines; the weight is then one
    * IEEE division of two < 2^53 integers. Shapes: one groupBy on
    * source (map-side combined), then a broadcast-sized (per-source)
    * frame — the window over it is a few rows regardless of corpus
    * size. */
  def mixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val perSrc = Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text")).cast(LongType)).as("n_tok"))
      .withColumn("s_fx",
        floor(sqrt(col("n_tok").cast(DoubleType)) * lit(1000000.0)).cast(LongType))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perSrc.withColumn("denom_fx", sum(col("s_fx")).over(all))
      .withColumn("weight",
        col("s_fx").cast(DoubleType) / col("denom_fx").cast(DoubleType))
      .withColumn("epochs",
        lit(1000000.0) * col("weight") / col("n_tok").cast(DoubleType))
      .select("source", "n_docs", "n_tok", "weight", "epochs")
      .orderBy("source")
  }

  val mixtureWeightsSql: String =
    """WITH per_src AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tok
      |  FROM documents GROUP BY source),
      |fx AS (
      |  SELECT source, n_docs, n_tok,
      |    CAST(FLOOR(SQRT(CAST(n_tok AS DOUBLE)) * 1000000.0) AS BIGINT) AS s_fx
      |  FROM per_src)
      |SELECT source, n_docs, n_tok,
      |  CAST(s_fx AS DOUBLE) / CAST(SUM(s_fx) OVER () AS DOUBLE) AS weight,
      |  1000000.0 * (CAST(s_fx AS DOUBLE) / CAST(SUM(s_fx) OVER () AS DOUBLE))
      |    / CAST(n_tok AS DOUBLE) AS epochs
      |FROM fx ORDER BY source""".stripMargin

  /** OOV rate per source against the corpus's own top-100
    * document-frequency vocabulary — the tokenizer-coverage check run
    * before committing a vocab: the fraction of token OCCURRENCES not
    * covered by the vocabulary. The vocab is the [[TextQueries
    * .vocabTopk]] df ranking (ties broken by token text, so the
    * cutoff is deterministic), taken via `orderBy(...).limit(100)` —
    * Spark plans a distributed TakeOrdered, NOT a single-task global
    * window, and the resulting 100-row vocab broadcasts into the
    * occurrence join at any corpus scale. Shapes: distinct + groupBy
    * on the token for df, TakeOrdered for the cutoff, broadcast left
    * join, one integer aggregation per source. */
  def oovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), explode(wsTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = toks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc)
      .limit(100)
      .select("tok").withColumn("_in_vocab", lit(1))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_occ"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast(DoubleType) / col("n_occ").cast(DoubleType))
      .orderBy("source")
  }

  val oovRateSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |nz AS (SELECT * FROM toks WHERE tok <> ''),
      |vocab AS (
      |  SELECT tok, 1 AS in_vocab FROM (
      |    SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM nz)
      |    GROUP BY tok ORDER BY df DESC, tok ASC LIMIT 100))
      |SELECT source, COUNT(*) AS n_occ,
      |  CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS oov_rate
      |FROM nz LEFT JOIN vocab USING (tok)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Span-level duplicate-text EXTENTS — the output shape of
    * repeated-span dedup (Lee et al., Deduplicating Training Data:
    * remove the duplicated SPAN, keep the rest of the document):
    * per document, every maximal run of ≥4 consecutive word-3-grams
    * whose gram also occurs in at least one other document, reported
    * as inclusive token extents `[start_tok, end_tok]`. Complements
    * `q_repeated_grams` (which measures exposure but not WHERE): the
    * spans are what a surgical dedup pass actually cuts. Shapes: the
    * position-keeping [[shingleRows]] front (one shuffle on doc_id),
    * gram df≥2 via distinct+groupBy (shuffle on the gram; the shared
    * set is unique per gram so the join back never duplicates rows),
    * then gaps-and-islands — `pos − row_number()` over (doc, pos)
    * groups consecutive flagged positions — and one groupBy per
    * island. All keys are doc- or gram-hashed; never all-pairs, and
    * the island window sorts only within a document's flagged rows. */
  def dupSpans(s: SparkSession, dir: String): DataFrame =
    spanFrame(s, dir)
      .select("doc_id", "start_tok", "end_tok", "n_grams")
      .orderBy("doc_id", "start_tok")

  /** The unordered span set behind [[dupSpans]] and [[spanClean]]:
    * `(doc_id, start_tok, end_tok, n_grams)`, one row per maximal
    * ≥4-gram cross-document duplicated run. Spans of one document
    * never share a gram START position (islands are disjoint), but
    * their TOKEN extents can touch: a gram island ending at pos p and
    * the next starting at p+2 both cover token p+2 — consumers that
    * test token membership must dedupe by position (semi/anti join),
    * not count span matches. */
  private def spanFrame(s: SparkSession, dir: String): DataFrame = {
    // r20: doc_id-KEYED parallelism floor (Tables.spreadBy, guide
    // §2.4) — the spreading exchange doubles as the clustering the
    // (doc_id, sh) distinct and the island window need (the shared-
    // shingle frame broadcasts back onto `sh`, so the doc_id
    // clustering survives the flag join): measured q_dup_spans
    // 1.13 s → 0.68 s, q_span_clean 1.55 s → 1.05 s at sf0.1 vs the
    // r19 round-robin spread.
    val sh = shingleRows(Tables.spreadBy(Tables.documents(s, dir),
      col("doc_id")), "doc_id", "text", keepPos = true)
    val shared = sh.select("doc_id", "sh").distinct()
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select("sh")
    val flagged = sh.join(shared, Seq("sh"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    flagged.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + lit(2)).as("end_tok"),
        count(lit(1)).as("n_grams"))
      .filter(col("n_grams") >= 4)
  }

  val dupSpansSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(unnest(list_transform(range(1, len(t) - 1), i -> i - 1)) AS INTEGER) AS pos,
      |    unnest(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM toks WHERE len(t) >= 3),
      |shared AS (
      |  SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM sh)
      |  GROUP BY sh HAVING COUNT(*) >= 2),
      |fl AS (SELECT doc_id, pos FROM sh JOIN shared USING (sh)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM fl)
      |SELECT doc_id, MIN(pos) AS start_tok, MAX(pos) + 2 AS end_tok,
      |  COUNT(*) AS n_grams
      |FROM isl GROUP BY doc_id, grp HAVING COUNT(*) >= 4
      |ORDER BY doc_id, start_tok""".stripMargin

  /** Per-document TOP-K keyword extraction by tf-idf-style weighting —
    * the topic/keyword tagging pass corpus curation runs before
    * mixture design or topic-balanced sampling. Weight = tf/df
    * (reciprocal document frequency): rationally exact inputs and ONE
    * IEEE division, so the DuckDB twin matches bitwise — log-idf
    * would rank identically (both are strictly decreasing in df) but
    * `ln` is libm-dependent and would break the hash gate. Ties break
    * on token text, so the top-3 set is fully deterministic. Shapes:
    * token explode → (doc, token) tf groupBy (map-side combine; the
    * tf frame is already distinct per doc-token, so df is a groupBy
    * COUNT over it — no second distinct), equi-join tf⋈df on the
    * token (vocab-scale right side; hash join at corpus scale), then
    * a per-doc window for the top-3. The window's sort key set is
    * (doc_id) — partition-local after one shuffle, never global. */
  def keywordTopk(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("token"))
      .withColumn("score", col("tf").cast(DoubleType) / col("df").cast(DoubleType))
    // r19: top-3 per doc via ONE hash aggregation (collect the doc's
    // scored tokens, array_sort, slice 3) instead of a row_number
    // window — same single exchange on doc_id but no partition-wide
    // SORT of every (doc, token) row; per-doc arrays are
    // vocabulary-of-one-doc-sized. Ordering key: (−score ASC, token
    // ASC) ≡ (score DESC, token ASC); IEEE negation is exact, so the
    // tie order is bit-identical to the window form's.
    scored.groupBy("doc_id")
      .agg(slice(array_sort(collect_list(struct(
          (-col("score")).as("ns"), col("token"), col("tf"), col("df"),
          col("score")))), 1, k).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("doc_id"), (col("p") + 1).cast(IntegerType).as("rk"),
        col("t.token").as("token"), col("t.tf").as("tf"),
        col("t.df").as("df"), col("t.score").as("score"))
      .orderBy("doc_id", "rk")
  }

  val keywordTopkSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |nz AS (SELECT * FROM toks WHERE token <> ''),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM nz GROUP BY doc_id, token),
      |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |scored AS (
      |  SELECT doc_id, token, tf, df,
      |    CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score
      |  FROM tf JOIN dfreq USING (token)),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rn
      |  FROM scored)
      |SELECT doc_id, CAST(rn AS INTEGER) AS rk, token, tf, df, score
      |FROM r WHERE rn <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Surgical SPAN REMOVAL — the second half of the Lee et al.
    * repeated-span dedup pass: given [[dupSpans]]' extents, cut those
    * token ranges out of the text and keep the rest. One row per
    * AFFECTED document: `(doc_id, n_cut_tokens, clean_text)` — docs
    * with no spans pass through a real pipeline untouched and are not
    * re-emitted here. Shapes: the span frame (see [[spanFrame]]),
    * then the corpus is SEMI-joined to the affected doc set before
    * any explode — only flagged documents pay tokenization. Token
    * membership in a span is decided by semi/anti joins on
    * `(doc_id, pos BETWEEN start AND end)` — set-semantics joins,
    * immune to the touching-extent double-match [[spanFrame]]
    * documents. Reassembly is an ordered collect per doc (struct
    * array sorted on position) — partition-local after the one
    * shuffle on doc_id; span sets per doc are tiny, so the range
    * condition rides the equi-join on doc_id. */
  def spanClean(s: SparkSession, dir: String): DataFrame = {
    // r19: the span frame is consumed FOUR times below (affected ×2,
    // the n_cut semi-join, the kept anti-join) and the initial plan
    // showed the whole shingle→df→island pipeline duplicated per
    // consumer (58 Exchange nodes, zero reuse). It is duplicated-span
    //-mass-bounded (≪ corpus), so pin it once; consumers then read a
    // LocalRelation-sized checkpoint instead of re-running the front.
    val spans = spanFrame(s, dir)
      .select(col("doc_id").as("sd"), col("start_tok"), col("end_tok"))
      .localCheckpoint(true)
    val affected = spans.select(col("sd").as("doc_id")).distinct()
    val toks = Tables.documents(s, dir)
      .join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(wsTokens(col("text"))).as(Seq("pos", "tok")))
    val inSpan = toks("doc_id") === spans("sd") &&
      col("pos") >= col("start_tok") && col("pos") <= col("end_tok")
    val nCut = toks.join(spans, inSpan, "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_cut_tokens"))
    val kept = toks.join(spans, inSpan, "left_anti")
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok"))).as("clean_text"))
    affected.join(nCut, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_cut_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  val spanCleanSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(unnest(list_transform(range(1, len(t) - 1), i -> i - 1)) AS INTEGER) AS pos,
      |    unnest(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM toks WHERE len(t) >= 3),
      |shared AS (
      |  SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM sh)
      |  GROUP BY sh HAVING COUNT(*) >= 2),
      |fl AS (SELECT doc_id, pos FROM sh JOIN shared USING (sh)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM fl),
      |spans AS (
      |  SELECT doc_id, MIN(pos) AS start_tok, MAX(pos) + 2 AS end_tok
      |  FROM isl GROUP BY doc_id, grp HAVING COUNT(*) >= 4),
      |tr AS (
      |  SELECT doc_id,
      |    CAST(unnest(range(len(t))) AS INTEGER) AS pos,
      |    unnest(t) AS tok
      |  FROM toks WHERE doc_id IN (SELECT doc_id FROM spans)),
      |mk AS (
      |  SELECT tr.doc_id, tr.pos, tr.tok,
      |    EXISTS (SELECT 1 FROM spans s WHERE s.doc_id = tr.doc_id
      |            AND tr.pos BETWEEN s.start_tok AND s.end_tok) AS cut
      |  FROM tr)
      |SELECT doc_id,
      |  CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cut_tokens,
      |  COALESCE(string_agg(CASE WHEN NOT cut THEN tok END, ' ' ORDER BY pos), '')
      |    AS clean_text
      |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Gopher-style QUALITY-RULE filter table — the per-rule pass/fail
    * accounting a curation pipeline reports before dropping documents
    * (Rae et al., Gopher §A1.1 analogues): token-count bounds, mean
    * word length bounds, max single-token repetition share, minimum
    * stopword presence. Output is per-source integer counts — every
    * column is an exact integer, and the rational rule thresholds are
    * evaluated by integer CROSS-MULTIPLICATION (`3·ntok ≤ chars`,
    * `5·max_tf ≤ ntok`), never a float ratio, so the twin matches
    * with zero float hazard. Shapes: one token explode → (doc, tok)
    * tf groupBy (map-side combine) → per-doc aggregate → left join
    * back to the doc set (token-less docs still counted) → per-source
    * aggregate. No windows, no all-pairs; both shuffles are on
    * doc-scale keys. */
  def qualityFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val per = tf.groupBy("doc_id").agg(
      sum(col("tf")).as("ntok"),
      max(col("tf")).as("max_tf"),
      sum(length(col("tok")).cast(LongType) * col("tf")).as("nchars"),
      sum(when(col("tok").isin(stopwords: _*), col("tf")).otherwise(0L)).as("nstop"))
    val rules = docs.select(col("doc_id"), col("source"))
      .join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("ntok", "max_tf", "nchars", "nstop"))
      .withColumn("r_len", col("ntok") >= 30 && col("ntok") <= 100000)
      .withColumn("r_mean",
        lit(3L) * col("ntok") <= col("nchars") && col("nchars") <= lit(10L) * col("ntok"))
      .withColumn("r_rep", lit(5L) * col("max_tf") <= col("ntok"))
      .withColumn("r_stop", col("nstop") >= 2)
    rules.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("r_len"), 1L).otherwise(0L)).as("pass_len"),
      sum(when(col("r_mean"), 1L).otherwise(0L)).as("pass_mean_wordlen"),
      sum(when(col("r_rep"), 1L).otherwise(0L)).as("pass_max_rep"),
      sum(when(col("r_stop"), 1L).otherwise(0L)).as("pass_stopwords"),
      sum(when(col("r_len") && col("r_mean") && col("r_rep") && col("r_stop"),
        1L).otherwise(0L)).as("pass_all"))
      .orderBy("source")
  }

  val qualityFilterSql: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |  FROM documents),
       |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       |       WHERE tok <> '' GROUP BY doc_id, tok),
       |per AS (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS ntok,
       |    CAST(MAX(tf) AS BIGINT) AS max_tf,
       |    CAST(SUM(len(tok) * tf) AS BIGINT) AS nchars,
       |    CAST(SUM(CASE WHEN tok IN ($stopList) THEN tf ELSE 0 END) AS BIGINT) AS nstop
       |  FROM tf GROUP BY doc_id),
       |rules AS (
       |  SELECT d.source,
       |    (COALESCE(ntok, 0) >= 30 AND COALESCE(ntok, 0) <= 100000) AS r_len,
       |    (3 * COALESCE(ntok, 0) <= COALESCE(nchars, 0)
       |     AND COALESCE(nchars, 0) <= 10 * COALESCE(ntok, 0)) AS r_mean,
       |    (5 * COALESCE(max_tf, 0) <= COALESCE(ntok, 0)) AS r_rep,
       |    (COALESCE(nstop, 0) >= 2) AS r_stop
       |  FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN r_len THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
       |  CAST(SUM(CASE WHEN r_mean THEN 1 ELSE 0 END) AS BIGINT) AS pass_mean_wordlen,
       |  CAST(SUM(CASE WHEN r_rep THEN 1 ELSE 0 END) AS BIGINT) AS pass_max_rep,
       |  CAST(SUM(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopwords,
       |  CAST(SUM(CASE WHEN r_len AND r_mean AND r_rep AND r_stop THEN 1 ELSE 0 END)
       |    AS BIGINT) AS pass_all
       |FROM rules GROUP BY source ORDER BY source""".stripMargin
  }

  /** Per-source LOG2 document-length histogram — the length-
    * distribution diagnostic behind chunk-size and packing decisions.
    * Bucket = position of the highest set bit of `n_chars` (i.e.
    * `⌊log2⌋ + 1`), computed as the LENGTH OF THE BINARY STRING in
    * both engines — integer-exact, immune to the `log2(2^k)` IEEE
    * rounds-just-under-k hazard a float log would carry. Pure
    * scan + one map-side-combining aggregate on a tiny key space;
    * the scan reads only (source, n_chars) — projection-pruned. */
  def lengthHist(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"),
        length(bin(col("n_chars"))).as("bucket"),
        col("n_chars"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("tot_chars"))
      .orderBy("source", "bucket")

  val lengthHistSql: String =
    """SELECT source, CAST(length(bin(n_chars)) AS INTEGER) AS bucket,
      |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS tot_chars
      |FROM documents GROUP BY source, bucket
      |ORDER BY source, bucket""".stripMargin

  /** Token-BUDGET selection — the data-mixture step after scoring:
    * given a per-source token budget, keep each source's best
    * documents (quality desc, ties → doc_id) until the budget is
    * exhausted — the greedy prefix knapsack every "top-quality N
    * tokens per domain" curation recipe runs. Selection is a prefix
    * of the quality ordering (`cum_tok ≤ budget`; the cumulative sum
    * is monotone, so the cut is a single contiguous prefix — the
    * deterministic form of the rule). Shapes: one projection-pruned
    * scan computing the oracle-pinned quality double + integer token
    * count, ONE shuffle on `source`, then partition-local window
    * cumsum + rank (the pack_bins discipline: per-source windows,
    * never a global sort). The cumsum is an integer SUM — exact and
    * association-order-free; quality is only ever COMPARED. */
  def budgetSelect(s: SparkSession, dir: String): DataFrame = {
    val budget = 600L
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        qualityScore(col("text")).as("quality"),
        tokenCount(col("text")).cast(LongType).as("ntok"))
    val w = Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id").asc)
    docs
      .withColumn("cum_tok", sum(col("ntok")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("sel_rank", row_number().over(w))
      .filter(col("cum_tok") <= budget)
      .select("source", "sel_rank", "doc_id", "quality", "ntok", "cum_tok")
      .orderBy("source", "sel_rank")
  }

  val budgetSelectSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, source,
       |  ${TextQueries.qualitySqlExpr}
       |    AS quality,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ntok
       |  FROM documents),
       |w AS (
       |  SELECT source, doc_id, quality, ntok,
       |    CAST(SUM(ntok) OVER (PARTITION BY source
       |      ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cum_tok,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY quality DESC, doc_id ASC) AS INTEGER) AS sel_rank
       |  FROM q)
       |SELECT source, sel_rank, doc_id, quality, ntok, cum_tok
       |FROM w WHERE cum_tok <= 600
       |ORDER BY source, sel_rank""".stripMargin

  /** BM25 retrieval top-k in EXACT fixed-point integer arithmetic —
    * the ranked-retrieval primitive behind search-based
    * decontamination and RAG corpus probes, with the cross-engine
    * float hazards designed out: BM25's `log` idf is libm-dependent
    * and its per-term float SUM is association-order-dependent, so
    * this operator computes the UN-logged Robertson idf ratio
    * `(N − df + ½)/(df + ½)` and the k1=6/5, b=3/4 saturation term
    * as one exact integer expression per term —
    * `a = (44·T·tf·10⁶) DIV (20·T·tf + 6·T + 18·N·dl)` (the
    * saturation fraction cleared of rationals by 20·T, scaled 10⁶),
    * `score = (a·(2N−2df+1)) DIV (2df+1)` — and SUMS integers
    * (order-free). Rankings match float BM25 up to fixed-point
    * granularity; both engines match bit-for-bit. Overflow: the
    * widest product is 44·T·tf·10⁶ < 2⁶³ for corpus token mass
    * T·tf ≲ 2×10¹¹ — beyond that drop the 10⁶ scale (both engines
    * take it as a constant, so they move together). Shapes: tf/df/dl
    * are map-side-combining aggregates; df (≤ |terms| rows) and the
    * 1-row (N, T) stats frame broadcast into the scoring join; final
    * top-10 is TakeOrderedAndProject, never a corpus-wide window. */
  def bm25Topk(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "vector", "customer")
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tok"))
    val tf = toks.filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("a", expr(
        "(44 * t_tok * tf * 1000000) DIV (20 * t_tok * tf + 6 * t_tok + 18 * n_docs * dl)"))
      .withColumn("term_score", expr("(a * (2 * n_docs - 2 * df + 1)) DIV (2 * df + 1)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(IntegerType).as("n_terms"),
        sum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select("rnk", "doc_id", "n_terms", "score")
  }

  /** RAG-shaped retrieval: the exact-integer BM25 of [[bm25Topk]]
    * scored over the 32/24 sliding CHUNKS of [[chunkDocs]] instead of
    * whole documents — the unit a retrieval-augmented pipeline
    * actually indexes and returns (a hit inside a long doc ranks on
    * its local passage, and the emitted `(start, len)` extent is the
    * retrievable span). N/T/df/dl all re-ground at the chunk level,
    * so the saturation and idf terms price passage frequency, not
    * document frequency. Same integer-exactness contract as the doc
    * scorer (DIV arithmetic, order-free sums); chunking is the
    * map-only explode; tf/df/dl are map-side-combining aggregates;
    * the final top-10 is TakeOrderedAndProject. */
  def ragRetrieve(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bm25Index
    // Chunking/tokenization and the scoring tail live in Bm25Index
    // (chunkTokens / score), SHARED with the stored-state index so
    // the direct query and q_rag_incremental cannot drift.
    val terms = Seq("spark", "vector", "customer")
    val ctoks = Bm25Index.chunkTokens(Tables.documents(s, dir))
    val dl = ctoks.groupBy("doc_id", "chunk_id", "start", "len")
      .agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tok"))
    val tf = ctoks.filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "chunk_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    Bm25Index.score(tf, dfreq, dl, stats, k = 10)
  }

  /** STORED-STATE retrieval — `q_rag_retrieve` served from the
    * incremental [[graft.operators.Bm25Index]] instead of the raw
    * text: the corpus folds in as two doc-disjoint batches (the
    * Knuth-hash 90/10 split), each paying tokenization exactly once,
    * and the query probes the persisted tf/df/dl/N state. Because
    * every BM25 statistic is an additive integer aggregate over
    * doc-disjoint batches, the served result is BIT-IDENTICAL to the
    * full-corpus computation — so the oracle is simply
    * [[ragRetrieveSql]], the strongest possible gate for an
    * incremental path. In-query the state lives in a temp dir
    * (driver queries are standalone); the production swap-in point is
    * the `stateDir` argument of `Bm25Index.appendBatch`/`retrieve`. */
  /** Session memo for the in-query BM25 state dir (VERDICT r14 #4):
    * the fold is built ONCE per (session, dir) and served from on
    * every later call — the production cost model (an index is built
    * once, served many times), and it stops the bench re-paying the
    * two-batch tokenize+merge per timed pass. The `_cold` bench entry
    * reports the standalone build+serve cost via
    * [[SessionMemo.resetAll]]. The dir is a `file://` URI (ADVICE
    * r14: a schemeless path resolves through the Hadoop DEFAULT
    * filesystem — under an hdfs:// default the scratch state would
    * land there while local-file cleanup misses it). Cleanup: the
    * memo's eviction callback deletes the dir; [[SessionMemo
    * .trackTempDir]] pins it for JVM-exit as the backstop. */
  private val bm25StateMemo =
    new SessionMemo.Memo[String](SessionMemo.deleteTempDir)

  def ragIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bm25Index
    val state = bm25StateMemo(s, dir) {
      val bucket =
        pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L), lit(100L))
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-bm25-idx")
      SessionMemo.trackTempDir(tmp.toFile)
      val tmpUri = tmp.toUri.toString
      Bm25Index.appendBatch(s, tmpUri, docs.filter(bucket < 90), 0L)
      Bm25Index.appendBatch(s, tmpUri, docs.filter(bucket >= 90), 1L)
      tmpUri
    }
    val res = Bm25Index.retrieve(s, state,
      Seq("spark", "vector", "customer"), k = 10)
    // The result is <= k rows: pin it on the DRIVER so the frame's
    // recomputation path never reaches into the state dir after a
    // memo eviction deletes it. localCheckpoint alone leaves that
    // path live if an executor holding checkpoint blocks is lost —
    // fine in local mode, wrong on a cluster (ADVICE r11).
    s.createDataFrame(
        java.util.Arrays.asList(res.collect(): _*), res.schema)
      .orderBy("rnk")
  }

  val ragRetrieveSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, toks, n_tok,
      |    CASE WHEN n_tok <= 32 THEN 1 ELSE 1 + (n_tok - 32 + 23) // 24 END AS n_chunks
      |  FROM t),
      |c AS (
      |  SELECT doc_id, toks, n_tok, unnest(range(0, n_chunks)) AS chunk_id
      |  FROM n),
      |ch AS (
      |  SELECT doc_id, chunk_id, toks, chunk_id * 24 AS start,
      |    LEAST(32, n_tok - chunk_id * 24) AS len
      |  FROM c),
      |ct AS (
      |  SELECT doc_id, chunk_id,
      |    unnest(toks[start + 1 : start + len]) AS token
      |  FROM ch),
      |nz AS (SELECT * FROM ct WHERE token <> ''),
      |dl AS (SELECT doc_id, chunk_id, COUNT(*) AS dl FROM nz GROUP BY 1, 2),
      |stats AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS t_tok FROM dl),
      |tf AS (
      |  SELECT doc_id, chunk_id, token, COUNT(*) AS tf FROM nz
      |  WHERE token IN ('spark', 'vector', 'customer')
      |  GROUP BY 1, 2, 3),
      |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |sc AS (
      |  SELECT t.doc_id, t.chunk_id, f.df, s.n_docs,
      |    (44 * s.t_tok * t.tf * 1000000)
      |      // (20 * s.t_tok * t.tf + 6 * s.t_tok + 18 * s.n_docs * d.dl) AS a
      |  FROM tf t JOIN dfreq f USING (token)
      |  JOIN dl d USING (doc_id, chunk_id)
      |  CROSS JOIN stats s),
      |ts AS (
      |  SELECT doc_id, chunk_id,
      |    (a * (2 * n_docs - 2 * df + 1)) // (2 * df + 1) AS term_score
      |  FROM sc),
      |agg AS (
      |  SELECT doc_id, chunk_id, CAST(COUNT(*) AS INTEGER) AS n_terms,
      |    CAST(SUM(term_score) AS BIGINT) AS score
      |  FROM ts GROUP BY 1, 2)
      |SELECT CAST(ROW_NUMBER() OVER (
      |    ORDER BY a.score DESC, a.doc_id ASC, a.chunk_id ASC) AS INTEGER) AS rnk,
      |  a.doc_id, a.chunk_id, h.start, h.len, a.n_terms, a.score
      |FROM agg a JOIN ch h USING (doc_id, chunk_id)
      |ORDER BY a.score DESC, a.doc_id ASC, a.chunk_id ASC LIMIT 10""".stripMargin

  val bm25TopkSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents),
      |nz AS (SELECT * FROM toks WHERE token <> ''),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM nz GROUP BY doc_id),
      |stats AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS t_tok FROM dl),
      |tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM nz
      |  WHERE token IN ('spark', 'vector', 'customer')
      |  GROUP BY doc_id, token),
      |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      |sc AS (
      |  SELECT t.doc_id, f.df, s.n_docs,
      |    (44 * s.t_tok * t.tf * 1000000)
      |      // (20 * s.t_tok * t.tf + 6 * s.t_tok + 18 * s.n_docs * d.dl) AS a
      |  FROM tf t JOIN dfreq f USING (token) JOIN dl d USING (doc_id)
      |  CROSS JOIN stats s),
      |ts AS (
      |  SELECT doc_id,
      |    (a * (2 * n_docs - 2 * df + 1)) // (2 * df + 1) AS term_score
      |  FROM sc),
      |agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_terms,
      |    CAST(SUM(term_score) AS BIGINT) AS score
      |  FROM ts GROUP BY doc_id)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rnk,
      |  doc_id, n_terms, score
      |FROM agg ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_budget_select", budgetSelect, Some(budgetSelectSql)),
    QueryDef("q_bm25_topk", bm25Topk, Some(bm25TopkSql)),
    QueryDef("q_rag_retrieve", ragRetrieve, Some(ragRetrieveSql)),
    QueryDef("q_rag_incremental", ragIncremental, Some(ragRetrieveSql)),
    QueryDef("q_contamination_ngram", contaminationNgram, Some(contaminationNgramSql)),
    QueryDef("q_decon_bloom", deconBloom, Some(contaminationNgramSql)),
    QueryDef("q_repeated_grams", repeatedGrams, Some(repeatedGramsSql)),
    QueryDef("q_chunk_docs", chunkDocs, Some(chunkDocsSql)),
    QueryDef("q_mixture_weights", mixtureWeights, Some(mixtureWeightsSql)),
    QueryDef("q_oov_rate", oovRate, Some(oovRateSql)),
    QueryDef("q_unigram_score", unigramScore, Some(unigramScoreSql)),
    QueryDef("q_keyword_topk", keywordTopk, Some(keywordTopkSql)),
    QueryDef("q_dup_spans", dupSpans, Some(dupSpansSql)),
    QueryDef("q_span_clean", spanClean, Some(spanCleanSql)),
    QueryDef("q_quality_filter", qualityFilter, Some(qualityFilterSql)),
    QueryDef("q_length_hist", lengthHist, Some(lengthHistSql)))
}
