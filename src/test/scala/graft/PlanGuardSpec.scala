package graft

/** Physical-plan regression guard over EVERY registered query: the
  * scale-killers the round audits hunt for must not reappear.
  *
  *  - `CartesianProduct` (a non-broadcast cross join — O(n·m) shuffle
  *    materialization) is allowed nowhere: even the deliberate tiny
  *    cross joins must plan as broadcast nested-loop, never a
  *    shuffled cartesian.
  *  - `BroadcastNestedLoopJoin` is allowed only where one side is
  *    constant-size by construction (documented allowlist below);
  *    anywhere else it means an equi-join degraded to an O(n·m) scan
  *    — at 100 TB, a cluster-killer.
  *
  * Plans are inspected at sf0.001; operator CHOICE between
  * equi-join strategies (broadcast-hash vs sort-merge) is AQE's and
  * deliberately unguarded — only the structurally quadratic
  * operators are.
  */
class PlanGuardSpec extends SparkTestBase {

  /** Queries where a BroadcastNestedLoopJoin is the intended plan,
    * with the bounded side in parentheses: */
  private val bnljAllowed: Set[String] = Set(
    "q_cross_join",     // deliberate tiny cross join (25×5 rows)
    "q_fuzzy_match",    // levenshtein threshold join (tiny dims)
    "q_range_join",     // band predicate vs 8 derived bands
    "q_ann_ivf",        // 16-centroid assignment + probe (constants)
    "q_ann_ivf_incr",   // same constants, existing/batch split + append
    "q_ann_ivfpq",      // 8 broadcast coarse centroids (assign + probe)
    "q_ann_ivfpq_incr", // same constants + 1-row append_ok gate broadcast
    "q_ann_ivfpq_rerank", // same constants; rerank joins are equi-joins
    // q_ann_ivfpq_served is NOT here: like q_rag_incremental it
    // returns a driver-pinned local frame (its builds/probes run as
    // side effects), so its visible plan carries no BNLJ
    "q_ann_lsh",        // in-query brute-force baseline (8 queries)
    "q_knn_bruteforce", // 8 broadcast query vectors
    "q_kmeans_assign",  // k=5 broadcast seed centroids
    "q_semantic_dedup", // k=5 broadcast seed centroids (SemDeDup assign)
    "q_bm25_topk",      // 1-row corpus-stats (N, T) scalar broadcast
    "q_rag_retrieve",   // same 1-row chunk-stats scalar broadcast
    "q_colloc_pmi",     // 1-row total-token-count scalar broadcast
    "q_dsir_lift",      // 1-row corpus-totals scalar broadcast
    "q_tpch_q22",       // scalar avg-balance broadcast
    "q_retention_window", // 1-row high-water-mark scalar broadcast
    "q_watermark_dedup") // 1-row horizon-cut scalar broadcast

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name plans without unexpected quadratic joins") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a shuffled CartesianProduct")
      if (!bnljAllowed.contains(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin but is not allowlisted")
    }
  }

  test("BNLJ allowlist has no rot: every entry still plans a BNLJ") {
    // The inverse guard: an allowlist entry whose query no longer
    // plans a BroadcastNestedLoopJoin is stale and would silently
    // permit a future BNLJ REGRESSION in that query to pass (this is
    // exactly how the q_tpch_q11 entry rotted when q11 was rewritten
    // to TakeOrderedAndProject) — force the allowlist to shrink with
    // the plans.
    val stale = bnljAllowed.toSeq.sorted.filterNot { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty,
      s"allowlist entries no longer planning a BNLJ (remove them): $stale")
  }
}
