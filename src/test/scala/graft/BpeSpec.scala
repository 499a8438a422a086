package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Materializer}

/** Hand-computed BPE merge learning on the classic Sennrich corpus,
  * plus the greedy-fold and exhaustion edge semantics the DuckDB twin
  * must mirror. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def wc(pairs: (String, Long)*) =
    pairs.toDF("word", "freq")

  test("Sennrich corpus: first merges are (e,s)@9, (es,t)@9, (est,</w>)@9, (l,o)@7") {
    // low*5  lower*2  newest*6  widest*3 — the worked example from the
    // BPE paper. Pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9 tie
    // at 9 → lexicographic left-then-right tie-break picks (e,s).
    val (merges, state) = Bpe.learn(
      wc("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 4,
      Materializer.Local)
    val got = merges.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L)))
    val syms = state.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(syms("newest") === Seq("n", "e", "w", "est</w>"))
    assert(syms("widest") === Seq("w", "i", "d", "est</w>"))
    assert(syms("low") === Seq("lo", "w", "</w>"))
    assert(syms("lower") === Seq("lo", "w", "e", "r", "</w>"))
  }

  test("greedy leftmost fold: 'aaaa' under merge (a,a) becomes [aa, aa, </w>]") {
    // Runs must merge non-overlapping left-to-right — the contract
    // both Spark's aggregate() fold and DuckDB's list_reduce satisfy.
    val (merges, state) = Bpe.learn(wc("aaaa" -> 3L), 1, Materializer.Local)
    assert(merges.collect().map(r => (r.getString(1), r.getString(2))).toSeq
      === Seq(("a", "a")))
    assert(state.select("syms").as[Seq[String]].head()
      === Seq("aa", "aa", "</w>"))
  }

  test("exhaustion: merge table stops short once every word is one symbol") {
    // "ab"*1 has pairs (a,b) then (ab,</w>) then nothing: round 3's
    // winner is empty. The fixpoint contract: the merge table carries
    // 2 rows, not 5, AND the state keeps the fully-merged words — an
    // empty winner must not empty the state via the cross join (the
    // bpeEncode census reads it).
    val (merges, state) = Bpe.learn(wc("ab" -> 1L), 5, Materializer.Local)
    val got = merges.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((1, "a", "b"), (2, "ab", "</w>")))
    val st = state.select("word", "syms").as[(String, Seq[String])].collect()
    assert(st.toSeq === Seq(("ab", Seq("ab</w>"))),
      "exhaustion must preserve the fully-merged state, not empty it")
  }

  test("exhaustion before any merge: empty merge table, schema intact") {
    // An empty word-count frame is exhausted at round 1: the merge
    // table must come back EMPTY but correctly typed (the
    // reduce-over-empty guard), and the state must stay an empty
    // frame with the syms column, not throw.
    val (m0, s0) = Bpe.learn(wc(), 3, Materializer.Local)
    assert(m0.isEmpty)
    assert(m0.columns.toSeq ===
      Seq("merge_rank", "left_sym", "right_sym", "pair_freq"))
    assert(s0.isEmpty && s0.columns.contains("syms"))
  }

  test("q_bpe_merges over sf0.001 is deterministic across two runs and ranks densely") {
    val a = queries.CurationQueries.bpeMerges(spark, sfDir).collect()
    val b = queries.CurationQueries.bpeMerges(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.getInt(0)).toSeq === (1 to a.length))
    assert(a.nonEmpty)
  }

  test("q_bpe_encode mass conservation: vocab occurrences cover the corpus tokens") {
    // Every token occurrence contributes exactly its symbol count; the
    // top-30 cut can only lose mass, so sum(n_occ) <= total symbols
    // and > 0. With the sf0.001 ~40-word vocabulary, 30 rows is the
    // whole table minus a tail.
    val enc = queries.CurationQueries.bpeEncode(spark, sfDir).collect()
    assert(enc.nonEmpty && enc.length <= 30)
    val occs = enc.map(_.getLong(1))
    assert(occs.sameElements(occs.sorted.reverse), "ordered by mass desc")
  }
}
