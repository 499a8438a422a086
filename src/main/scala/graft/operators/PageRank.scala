package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank over a directed edge frame, in EXACT fixed-point
  * integer arithmetic — the third iterative operator sharing the
  * [[Materializer]] state discipline (with [[ConnectedComponents]] and
  * [[KMeans]]), and like them bit-reproducible across engines: every
  * round is integer sums and floor divisions of non-negative values
  * (`DIV` in Spark ≡ `//` in DuckDB for non-negatives), so an
  * unrolled-rounds SQL twin produces the identical Long ranks — no
  * float accumulation order to diverge on.
  *
  * Semantics (damping d = 0.85, rank mass scaled by [[Scale]]):
  *   pr₀(v)    = Scale
  *   contrib(v) = pr(v) DIV outdeg(v)          // exact floor division
  *   prᵢ₊₁(v)  = (15·Scale) DIV 100 + (85 · Σ_{u→v} contrib(u)) DIV 100
  * Floor-division rank mass is not exactly conserved (each division
  * discards a sub-ulp remainder ≤ outdeg−1); at Scale = 10⁹ the drift
  * is ≤ 10⁻⁹ of a node's rank per round — far below any ranking
  * decision — and determinism is what the cross-engine gate needs.
  *
  * Scale shape: each round is ONE equi-join of the (node, pr) state
  * against the edge frame plus a map-side-combining sum on `dst` —
  * both sides hash-partitioned on the join key, state is 2 columns ×
  * |nodes|, edges stream from their materialized frame. Rounds
  * materialize through `mat` (the same `GRAFT_ITER_CHECKPOINT_DIR` /
  * `_EVERY` knobs as CC), bounding lineage and enabling reliable
  * restarts. Overflow bound: a node's incoming contribution sum is <
  * total rank mass = |V|·Scale, so 85·sum stays inside Int64 for
  * |V| < ~10⁸ at Scale 10⁹; beyond that drop Scale (the twin takes
  * the scale as a constant, so both engines move together).
  *
  * Dangling nodes (outdeg 0, possible in a general directed graph)
  * contribute nothing — their rank mass exits the system rather than
  * being redistributed, the common simplification when the graph is
  * symmetrized (every node then has outdeg ≥ 1, so no mass is lost;
  * the near-dup graph queries use exactly that shape).
  */
object PageRank {

  val Scale: Long = 1000000000L

  /** `(node, pr)` after `rounds` full iterations over `edges`
    * (`src`, `dst` columns). Node set = every endpoint of `edges`. */
  def ranks(edges: DataFrame, rounds: Int,
      mat: Materializer = Materializer.fromEnv()): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // r20 round-shape rework (guide §2.4, the ConnectedComponents
    // twin): the edge frame is hash-clustered on `src` and SORTED
    // once, pinned through the materializer — the per-round
    // contribution join previously re-exchanged the edges EVERY
    // round. The degree table and the rank state ride node-clustered,
    // node-sorted materializations, so each round plans exactly ONE
    // exchange: the map-side-combined contribution sum on `dst`.
    val e = mat.pin(edges.select(col("src"), col("dst"))
      .repartition(col("src")).sortWithinPartitions("src"))
    // nodes + out-degrees, computed once and reused every round;
    // `deg` also enumerates the node set (symmetrized graphs) —
    // nodes reachable only via dst are unioned in so the operator
    // stays correct on general directed graphs.
    val deg = mat.pin(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
        .unionByName(
          e.select(col("dst").as("node")).except(e.select(col("src").as("node")))
            .withColumn("outdeg", lit(0L)))
        .repartition(col("node")).sortWithinPartitions("node"))
    var pr = mat(deg.select(col("node"), lit(Scale).as("pr")))
    for (_ <- 1 to rounds) {
      val contrib = pr.join(deg, "node")
        .filter(col("outdeg") > 0)
        .select(col("node").as("src"), expr("pr DIV outdeg").as("c"))
      val summed = e.join(contrib, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("s"))
      val next = deg.select(col("node"))
        .join(summed, Seq("node"), "left")
        .select(col("node"),
          (lit(15L * Scale / 100L) +
            expr(s"(85 * coalesce(s, 0L)) DIV 100")).as("pr"))
      pr = mat(next)
    }
    pr
  }

  /** Unrolled-rounds SQL twin body (DuckDB dialect): CTE chain
    * `deg → r0 → c1 → r1 → … → r<rounds>` over an `edges(src, dst)`
    * CTE the caller provides upstream. The final CTE is
    * `r<rounds>(node, pr)`. Division is `//` (floor for the
    * non-negative operands used here — identical to Spark's `DIV`). */
  def roundsSql(rounds: Int): String = {
    val base =
      s"""deg AS (
         |  SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src
         |  UNION ALL
         |  SELECT dst AS node, 0 AS outdeg FROM (
         |    SELECT DISTINCT dst FROM edges
         |    EXCEPT SELECT DISTINCT src FROM edges)),
         |r0 AS (SELECT node, CAST($Scale AS BIGINT) AS pr FROM deg)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS s
         |  FROM edges e
         |  JOIN r${i - 1} p ON p.node = e.src
         |  JOIN deg d ON d.node = e.src AND d.outdeg > 0
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT d.node,
         |    CAST(${15L * Scale / 100L}
         |      + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM (SELECT DISTINCT node FROM deg) d
         |  LEFT JOIN c$i c ON c.node = d.node)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }
}
