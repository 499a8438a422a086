package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis building blocks for the LLM-data-pipeline surface
  * (SURVEY.md §2.11): tokenization, quality scoring, language-ID
  * voting, fingerprinting. All are pure `Column` compositions of
  * codegen'd built-ins — no UDFs — so they stay inside whole-stage
  * codegen and push down/prune like any other expression.
  *
  * Every function here has an exact DuckDB-SQL equivalent (used by
  * the oracle queries in [[graft.queries.TextQueries]]); arithmetic
  * on counts is integer-exact, ratios are single IEEE divisions.
  */
object TextFunctions {

  /** Whitespace tokens of the trimmed text (reference-style split,
    * `src/s3_processor.py:166` analogue). */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish subword units: word bodies or single non-space symbols —
    * the classic pre-tokenizer regex. */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0))

  def bpeishCount(c: Column): Column = size(bpeishTokens(c))

  /** Punctuation/symbol character count. */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^\\w\\s]"), lit(0)))

  /** English-ish stopwords present in the synthetic corpus. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Count of stopword tokens. */
  def stopwordCount(c: Column): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(wsTokens(c), t => array_contains(stops, t)))
  }

  /** Heuristic quality score in [0,1]: length saturation, low
    * punctuation density, stopword presence. The exact expression
    * tree (parenthesization, operand order) is mirrored in the
    * oracle SQL — double arithmetic is order-sensitive. */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast(DoubleType)
    val nTok = tokenCount(c).cast(DoubleType)
    val lenScore = least(nChars, lit(500.0)) / lit(500.0)
    val punctRatio = punctCount(c).cast(DoubleType) / greatest(nChars, lit(1.0))
    val stopRatio = stopwordCount(c).cast(DoubleType) / greatest(nTok, lit(1.0))
    lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - punctRatio) + lit(0.3) * stopRatio
  }

  /** Marker words per language for the voting language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is"),
    "de" -> Seq("der", "und", "ist"),
    "es" -> Seq("el", "los", "es"),
    "fr" -> Seq("le", "les", "est"),
    "zh" -> Seq("de", "shi", "le"))

  /** Votes for one language = number of tokens matching its markers. */
  def langVotes(c: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    val pattern = "\\b(" + markers.mkString("|") + ")\\b"
    size(regexp_extract_all(c, lit(pattern), lit(0)))
  }

  /** Voted language: argmax of marker votes, fixed priority order on
    * ties, 'und' when no marker fires. */
  def langId(c: Column): Column = {
    val votes = langMarkers.map { case (l, _) => l -> langVotes(c, l) }
    val mx = greatest(votes.map(_._2): _*)
    votes.foldRight(lit("und")) { case ((l, v), acc) =>
      when(mx > 0 && v === mx, lit(l)).otherwise(acc)
    }
  }

  /** Content fingerprints: md5 + sha256 over the raw text — the
    * hash-groupBy key for exact dedup at scale (group 100 TB by a
    * 16-byte key, not by the document body). */
  def fingerprintMd5(c: Column): Column = md5(c)
  def fingerprintSha256(c: Column): Column = sha2(c, 256)

  /** Word n-gram shingles (n consecutive whitespace tokens joined by
    * one space); the near-dup unit for Jaccard/MinHash. */
  def shingles(c: Column, n: Int): Column = {
    val toks = wsTokens(c)
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Ordered word-3-gram shingle array (duplicates kept, one entry
    * per token position): the native one-pass [[WordShingles]]
    * expression over the tokenized text. NOT a `transform(sequence…)`
    * lambda — in a pure-Project pipeline CollapseProject/filter
    * pushdown inline the tokenizer into the lambda body and the
    * split re-runs per iteration, O(tokens²) (the [[Trigrams]]
    * lesson; re-measured in r19: q_dedup_minhash 10.2 s vs 2.3 s). */
  private def shingleArrOf(spark: org.apache.spark.sql.SparkSession,
      t: Column): Column =
    WordShingles.wordShingles3(spark, t)

  /** Distinct word-n-gram shingle sets per document, as a DataFrame
    * transform: (idCol, textCol) → (doc_id, sh: array<string>), docs
    * with <3 tokens omitted (as before the r19 rewrite).
    *
    * Performance-critical form for the dedup operators, rewritten in
    * r19 to be fully map-side: tokenize once per row, assemble the
    * shingle array with the native one-pass [[WordShingles]] kernel
    * and take `array_distinct` in place — ZERO shuffles, where the
    * previous form paid a posexplode + window(`lead`×2) sort shuffle
    * plus a collect_set aggregation per call (guide §2.4: remove
    * shuffles outright). Set ORDER differs from the old collect_set
    * (first-occurrence vs arrival order); every consumer is
    * order-insensitive (explode / array_intersect / size). */
  def shingleSets(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    require(n == 3, "one-pass shingling is written for n=3")
    docs.select(col(idCol).as("doc_id"),
        array_distinct(shingleArrOf(docs.sparkSession,
          wsTokens(col(textCol)))).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** Per-document shingle counts computed IN PLACE on the row's
    * shingle array — `(doc_id, <extra…>, n_sh, nd)` where `n_sh` is
    * the total 3-gram occurrence count and `nd` the distinct count:
    * no explode, no shuffle, one projection (r19; guide §2.4). Docs
    * with <3 tokens surface with n_sh = 0 — callers that previously
    * relied on such docs producing no exploded rows filter them. */
  def shingleCounts(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, extra: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    // `_sh` is referenced twice below; inlining duplicates the (native,
    // linear) shingle kernel per row — a constant factor, not the
    // quadratic the lambda form risked.
    val sh = shingleArrOf(docs.sparkSession, wsTokens(col(textCol)))
    docs.select(col(idCol).as("doc_id") +: extra.map(col) :+ sh.as("_sh"): _*)
      .select(Seq(col("doc_id")) ++ extra.map(col) ++ Seq(
        size(col("_sh")).cast(LongType).as("n_sh"),
        size(array_distinct(col("_sh"))).cast(LongType).as("nd")): _*)
  }

  /** Exploded word-3-gram rows `(doc_id, <extra…>, sh)` — the shared
    * shingling front of the occurrence-level consumers (repetition
    * ratio, span extraction): split once per row, build the shingle
    * array in place ([[shingleArrOf]]) and posexplode it — map-only,
    * NO window and no shuffle (the pre-r19 form paid a full
    * posexplode + two-`lead` window sort per call). `extra` columns
    * (constant per doc, e.g. `lang`) are carried through the explode.
    * `keepPos` retains the gram's token position (the first token's
    * 0-based index, identical to the old posexplode numbering) for
    * position-sensitive consumers like span extraction. */
  def shingleRows(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, extra: Seq[String] = Nil,
      n: Int = 3, keepPos: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(n == 3, "one-pass shingling is written for n=3")
    val exploded = docs.select(col(idCol).as("doc_id") +: extra.map(col) :+
      posexplode(shingleArrOf(docs.sparkSession,
        wsTokens(col(textCol)))).as(Seq("pos", "sh")): _*)
    val posCols = if (keepPos) Seq(col("pos")) else Nil
    exploded.select(Seq(col("doc_id")) ++ posCols ++ extra.map(col) :+
      col("sh"): _*)
  }
}
