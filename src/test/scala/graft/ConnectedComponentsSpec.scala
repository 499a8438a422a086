package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Iteration-schedule stress for the pointer-jumped connected
  * components (VERDICT r6 #1): the planted long-chain graph is the
  * adversarial case for plain min-label propagation (it needs
  * `diameter` rounds and any fixed cap silently splits the
  * component); pointer jumping must collapse it in O(log diameter)
  * rounds — see PLANS.md "Long-chain components". */
class ConnectedComponentsSpec extends SparkTestBase {

  private def symmetric(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    val df = pairs.toDF("src", "dst")
    df.union(df.select(col("dst"), col("src"))).localCheckpoint(true)
  }

  test("planted 1000-node chain (diameter 999) converges in O(log d) rounds") {
    // doc i near-dups ONLY doc i+1 — the >25-diameter chain the r6
    // 25-round cap would have silently split into ~40 components.
    val chain = symmetric((0L until 999L).map(i => (i, i + 1)))
    val (labels, rounds) = ConnectedComponents.minLabels(chain)
    val byLabel = labels.groupBy("label").count().collect()
    assert(byLabel.length == 1, s"expected ONE component, got ${byLabel.length}")
    assert(byLabel(0).getLong(0) == 0L && byLabel(0).getLong(1) == 1000L)
    // log2(999) ≈ 10; one extra fixpoint-confirmation round. Bound at
    // 15 (≪ 999) so a regression to one-hop propagation fails loudly.
    assert(rounds <= 15, s"took $rounds rounds — pointer jumping regressed?")
  }

  test("mixed components + singleton-free node set") {
    val edges = symmetric(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)))
    val (labels, _) = ConnectedComponents.minLabels(edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("empty edge set short-circuits to zero rounds") {
    val (labels, rounds) = ConnectedComponents.minLabels(symmetric(Seq.empty))
    assert(labels.isEmpty && rounds == 0)
    assert(labels.columns.toSeq == Seq("node", "label"))
  }
}
