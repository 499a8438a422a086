package graft

import org.apache.spark.sql.functions._

import graft.operators.{Materializer, PageRank}

/** Exact fixed-point PageRank: hand-computed integer ranks on planted
  * graphs (every assertion is Long equality — there is no tolerance,
  * because the operator's contract IS bit-determinism), dangling-node
  * semantics, and Local ≡ Reliable materializer state equality. */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private val S = PageRank.Scale

  private def ranksMap(edges: Seq[(Long, Long)], rounds: Int,
      mat: Materializer = Materializer.Local): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), rounds, mat)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two hand-computed rounds on the symmetrized path 1-2-3") {
    // outdeg: 1→1, 2→2, 3→1.  Round 1: s(1)=S/2, s(2)=2S, s(3)=S/2
    //   pr1 = (575000000, 1850000000, 575000000)
    // Round 2: contrib (575000000, 925000000, 575000000)
    //   s = (925000000, 1150000000, 925000000)
    //   pr2 = (936250000, 1127500000, 936250000)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    assert(ranksMap(edges, 1) ==
      Map(1L -> 575000000L, 2L -> 1850000000L, 3L -> 575000000L))
    assert(ranksMap(edges, 2) ==
      Map(1L -> 936250000L, 2L -> 1127500000L, 3L -> 936250000L))
  }

  test("dangling node keeps only the teleport mass; sink collects the source's") {
    // 1→2 only: node 2 has outdeg 0 (its mass exits the system).
    // pr1(1) = 15% of S (no incoming); pr1(2) = 15%·S + 85%·S = S.
    assert(ranksMap(Seq((1L, 2L)), 1) == Map(1L -> S * 15L / 100L, 2L -> S))
    // Round 2: node 2 contributes nothing (dangling), node 1 sends
    // its whole round-1 rank: pr2(2) = 15%·S + 85%·pr1(1).
    assert(ranksMap(Seq((1L, 2L)), 2) ==
      Map(1L -> S * 15L / 100L, 2L -> (S * 15L / 100L + 85L * (S * 15L / 100L) / 100L)))
  }

  test("hub outranks fringe on a star, symmetric nodes tie exactly") {
    // star: 0 connected to 1..6, symmetrized.
    val edges = (1L to 6L).flatMap(i => Seq((0L, i), (i, 0L)))
    val r = ranksMap(edges, 5)
    assert(r(0L) > r(1L), "hub must outrank fringe")
    assert((1L to 6L).map(r).distinct.size == 1, "symmetric fringe nodes must tie bitwise")
  }

  test("Local and Reliable(everyN=2) materializers produce bit-identical ranks") {
    val edges = (0L until 40L).flatMap(i => Seq((i, (i + 1) % 40), ((i + 1) % 40, i))) ++
      Seq((0L, 20L), (20L, 0L))
    val dir = Fixtures.tempDir("prckpt").toString
    val local = ranksMap(edges, 5)
    val rel = ranksMap(edges, 5, Materializer.Reliable(dir, everyN = 2))
    assert(local == rel)
  }

  test("query over the corpus ranks within components and twin SQL round count agrees") {
    val df = graft.queries.DedupQueries.pagerankQ(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every ranked doc appears in the near-dup graph exactly once
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // the emitted twin unrolls exactly 5 rounds
    assert(graft.queries.DedupQueries.pagerankSql.contains("r5"))
    assert(!graft.queries.DedupQueries.pagerankSql.contains("r6"))
  }
}
