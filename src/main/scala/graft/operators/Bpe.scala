package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — the tokenizer-training pass of an LLM data pipeline,
  * re-expressed as a Spark iterative operator in the
  * [[Materializer]] family (with [[PageRank]], [[ConnectedComponents]]
  * and [[KMeans]]).
  *
  * The 100 TB decomposition is the one every production BPE trainer
  * uses (subword-nmt, SentencePiece): the CORPUS-scale work is a
  * single word-count — one scan, one map-side-combining groupBy —
  * and every merge round runs over the word-TYPE table (vocabulary-
  * sized, ≪ corpus; ~10⁷ types for a 10¹¹-token web corpus), with
  * each type carrying its corpus frequency as a weight. No round
  * ever touches the corpus again.
  *
  * Per round, over `(word, freq, syms)`:
  *  1. pair counts — explode adjacent symbol pairs weighted by
  *     `freq`, ONE map-side-combining aggregation (pair-type-sized
  *     shuffle);
  *  2. winner — the (count DESC, left ASC, right ASC) top-1 via
  *     `orderBy.limit(1)`: TakeOrderedAndProject, a distributed
  *     heap, never a global sort;
  *  3. merge application — a per-row `aggregate` fold over the
  *     symbol list (greedy leftmost non-overlapping, the BPE
  *     contract: "a a a" under pair (a,a) → ["aa","a"]), with the
  *     1-row winner attached by broadcast cross-join so no driver
  *     collect exists anywhere in the loop.
  * Rounds materialize through `mat` (the shared
  * `GRAFT_ITER_CHECKPOINT_DIR`/`_EVERY` knobs), bounding lineage.
  *
  * Determinism: pair counts are exact integer sums; the only
  * ordering decision is the winner's, tie-broken lexicographically —
  * so the merge table is engine- and partitioning-independent, and
  * the DuckDB twin ([[roundsSql]]) reproduces it bit-for-bit via
  * `list_reduce` (whose first-element seeding matches the fold's
  * `array(syms[0])` init exactly).
  *
  * Exhaustion semantics: once every word is a single symbol the pair
  * frame is empty, the winner is empty, and the broadcast cross-join
  * empties the state — later rounds contribute no merges and the
  * merge table simply stops short of `rounds` rows. The twin's
  * `CROSS JOIN m_i` has the identical fixpoint.
  */
object Bpe {

  /** End-of-word marker appended to every symbol sequence (standard
    * BPE: merges never cross a word boundary, and word-final units
    * stay distinct from word-internal ones). */
  val Marker = "</w>"

  /** Initial symbol sequence of a word: its characters plus
    * [[Marker]]. */
  private def initSyms = expr(
    s"concat(regexp_extract_all(word, '.', 0), array('$Marker'))")

  /** Adjacent-pair counts of the current state, weighted by word
    * frequency: `(l, r, c)`. */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  j -> struct(element_at(syms, j) AS l,
          |              element_at(syms, j + 1) AS r))""".stripMargin)).as("p"))
      .select(col("p.l"), col("p.r"), col("freq"))
      .groupBy("l", "r").agg(sum(col("freq")).as("c"))

  /** Greedy leftmost non-overlapping application of the row's
    * (`l`, `r`) merge to `syms` — a linear fold, exactly DuckDB's
    * `list_reduce` over singleton-wrapped elements. */
  private def mergeApply = expr(
    """aggregate(
      |  slice(syms, 2, size(syms) - 1),
      |  array(element_at(syms, 1)),
      |  (acc, x) -> CASE
      |    WHEN element_at(acc, -1) = l AND x = r
      |    THEN concat(slice(acc, 1, size(acc) - 1),
      |                array(concat(element_at(acc, -1), x)))
      |    ELSE concat(acc, array(x)) END)""".stripMargin)

  /** Learn `rounds` merges over a `(word, freq)` word-type frame.
    *
    * @return (merge table `(merge_rank, left_sym, right_sym,
    *         pair_freq)` ordered by rank — possibly shorter than
    *         `rounds` on exhaustion — , final state
    *         `(word, freq, syms)` after all merges).
    */
  def learn(wordCounts: DataFrame, rounds: Int,
      mat: Materializer = Materializer.fromEnv()): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = wordCounts.sparkSession
    var words = mat(wordCounts
      .select(col("word"), col("freq"))
      .withColumn("syms", initSyms))
    var merges = Vector.empty[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= rounds && !exhausted) {
      // The winner is AT MOST ONE row by construction (limit 1): a
      // bounded driver collect, cheaper than the previous
      // mat + isEmpty + broadcast-cross-join trio — per round this
      // runs ONE job (the TakeOrderedAndProject aggregate) instead of
      // three (r19; the merge attaches as lit() columns, so no
      // broadcast build job either). Merge exhaustion: every word a
      // single symbol → no pair → empty winner; fixpoint semantics
      // unchanged (state stays as-is, merge table stops growing).
      val winRows = pairCounts(words)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (winRows.isEmpty) exhausted = true
      else {
        val w = winRows(0)
        merges :+= ((i, w.getString(0), w.getString(1), w.getLong(2)))
        words = mat(words
          .withColumn("l", lit(w.getString(0)))
          .withColumn("r", lit(w.getString(1)))
          .select(col("word"), col("freq"), mergeApply.as("syms")))
      }
      i += 1
    }
    val mergeTable =
      if (merges.nonEmpty) {
        import spark.implicits._
        merges.toDF("merge_rank", "left_sym", "right_sym", "pair_freq")
          .orderBy("merge_rank")
      } else pairCounts(words).limit(0).select(
        lit(0).as("merge_rank"), col("l").as("left_sym"),
        col("r").as("right_sym"), col("c").as("pair_freq"))
    (mergeTable, words)
  }

  /** DuckDB twin: CTE chain `s0 → p1 → m1 → s1 → … → s<rounds>` over
    * a `w0(word, freq)` CTE the caller provides upstream (no WITH
    * keyword). `m$i(left-as-l, r, c)` holds round i's winner with `c`
    * already BIGINT-cast (parity rule #2: DuckDB `SUM(BIGINT)` is
    * HUGEINT); `s$i` is the state after applying it. `list_reduce`
    * over `[x]`-wrapped symbols seeds the accumulator with the first
    * element — identical to the Spark fold's `array(syms[0])` init —
    * and `acc[:-2]` is DuckDB slice-speak for "all but the last". */
  def roundsSql(rounds: Int): String = {
    val s0 =
      s"""s0 AS (
         |  SELECT word, CAST(freq AS BIGINT) AS freq,
         |    regexp_extract_all(word, '.') || ['$Marker'] AS syms
         |  FROM w0)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""p$i AS (SELECT l, r, SUM(freq) AS c FROM (
         |  SELECT freq,
         |    unnest(list_transform(range(1, len(syms)), j -> syms[j])) AS l,
         |    unnest(list_transform(range(1, len(syms)), j -> syms[j+1])) AS r
         |  FROM s${i - 1}) GROUP BY l, r),
         |m$i AS (SELECT l, r, CAST(c AS BIGINT) AS c FROM p$i
         |  ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |s$i AS (SELECT word, freq,
         |  list_reduce(list_transform(syms, x -> [x]),
         |    (acc, xx) -> CASE WHEN acc[-1] = m.l AND xx[1] = m.r
         |      THEN acc[:-2] || [acc[-1] || xx[1]]
         |      ELSE acc || xx END) AS syms
         |  FROM s${i - 1} LEFT JOIN m$i m ON TRUE)""".stripMargin
    }
    (s0 +: steps).mkString(",\n")
  }

  /** The twin's merge-table SELECT over [[roundsSql]]'s `m1..m<n>`. */
  def mergesSelectSql(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""SELECT $i AS merge_rank, l AS left_sym, r AS right_sym,
         |  c AS pair_freq FROM m$i""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY merge_rank"
}
