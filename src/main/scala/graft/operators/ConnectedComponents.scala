package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.Log

/** Distributed connected components by min-label propagation with
  * POINTER JUMPING — the iteration schedule that makes component
  * labeling safe on long-chain graphs at 100 TB scale.
  *
  * Plain min-label propagation moves a label one hop per round, so a
  * component converges in `diameter` rounds: a pathological chain of
  * pairwise near-dups (doc₁≈doc₂≈…≈docₙ, each within the Hamming
  * threshold of its neighbors only) needs n-1 rounds — quadratic
  * total work, and any fixed round cap silently splits the component.
  * Each round here therefore runs TWO label-shrinking steps:
  *
  *  1. edge step — `label(v) ← min(label(v), min over neighbors u of
  *     label(u))`: one equi-join (edges ⋈ labels) + one partial-agg
  *     min groupBy;
  *  2. pointer jump — `label(v) ← label(label(v))`: labels joined
  *     with itself on `label = node`. Every label value is a node id
  *     of the same component (initial labels are node ids and both
  *     steps take mins over existing labels), so the self-join is
  *     total, and `label(u) ≤ u` makes the jump monotone.
  *
  * The jump roughly doubles the distance a minimum has traveled, so
  * convergence takes O(log diameter) rounds (measured: a planted
  * 1000-node chain, diameter 999, converges in 11 rounds —
  * ConnectedComponentsSpec / PLANS.md "Long-chain components").
  * This is the hash-to-min / pointer-doubling family of PRAM-style
  * CC algorithms expressed as Spark joins.
  *
  * Per round the label frame is eagerly materialized through the
  * caller-chosen [[Materializer]]: it is small (bounded by
  * nodes-with-edges, never corpus-sized here) and the materialization
  * severs the otherwise-exponentially-deep lineage — the textbook
  * Spark iterative-algorithm shape. [[Materializer.Local]] (default)
  * is executor-resident and right for `local[32]`;
  * [[Materializer.Reliable]] writes each round to a reliable store so
  * executor loss on a real cluster costs a task retry, not the job. Convergence is the
  * label-sum fixpoint: both steps only ever decrease labels, so the
  * DECIMAL(38,0) total strictly decreases until the combined step is
  * a no-op, and a combined-step fixpoint means every edge has equal
  * labels on both ends — components are uniformly labeled. A round
  * that exhausts `maxIter` without reaching the fixpoint THROWS
  * (IllegalStateException) instead of returning silently-wrong
  * labels: with pointer jumping maxIter=50 covers diameters up to
  * ~2^50, so a trip here means a logic bug, not a big graph.
  */
object ConnectedComponents {

  private val log = Log("graft.operators.ConnectedComponents")

  /** Labels for every node that appears in `edges`.
    *
    * @param edges SYMMETRIC edge list with long columns (`src`,
    *              `dst`) — callers emit each undirected pair in both
    *              directions. Assumed already materialized
    *              (checkpointed/persisted) by the caller: it is
    *              re-consumed every round, and a lazy view here is
    *              re-planned per round (measured 2.6× slower on the
    *              7.5M-edge stress — PLANS.md). On a real cluster
    *              with a multi-TB edge list, materialize it with the
    *              same [[Materializer.Reliable]] passed as `mat`.
    * @param mat   per-round state materializer — [[Materializer.Local]]
    *              (default) for single-JVM/local runs,
    *              [[Materializer.Reliable]] for cluster runs where
    *              executor loss must not kill the iteration
    *              (`GRAFT_ITER_CHECKPOINT_DIR` selects it via
    *              [[Materializer.fromEnv]]).
    * @return (labels frame `(node, label)` where `label` is the
    *         smallest node id in the component, rounds executed)
    */
  def minLabels(edges: DataFrame, maxIter: Int = 50,
      mat: Materializer = Materializer.Local): (DataFrame, Int) = {
    var labels = mat(edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    // Empty graph: zero rounds, empty (node, label) frame — without
    // this, the first sum aggregate returns NULL and the fixpoint
    // test can never pass.
    if (labels.isEmpty) return (labels, 0)
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // 1. edge step: pull the neighbors' labels one hop.
      val viaEdge = edges.join(labels, col("dst") === col("node"))
        .select(col("src").as("node"), col("label"))
      val hopped = labels.unionByName(viaEdge)
        .groupBy("node").agg(min(col("label")).as("label"))
      // 2. pointer jump: label(v) ← label(label(v)). Inner join is
      // total (label values are node ids of the label frame itself).
      val jump = hopped.select(col("node").as("jnode"), col("label").as("jlabel"))
      val next = mat(hopped
        .join(jump, col("label") === col("jnode"))
        .select(col("node"), col("jlabel").as("label")))
      val s = next.agg(sum(col("label").cast(DecimalType(38, 0))).as("s"))
        .collect()(0).getDecimal(0)
      // A NULL sum means DECIMAL(38,0) overflow (> 10^38 total — needs
      // astronomically large id sums, but ids are caller-supplied):
      // fail with the real cause instead of an NPE in compareTo.
      if (s == null)
        throw new IllegalStateException(
          "connected-components convergence sum overflowed DECIMAL(38,0) — " +
            "node ids too large for the label-sum fixpoint test")
      converged = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected-components did not converge in $maxIter rounds — " +
          "pointer-jumped min-label should need only O(log diameter); " +
          "this is a bug, not a large graph")
    log.info(s"connected components converged in $iter rounds")
    (labels, iter)
  }
}
