package graft

import graft.queries.DedupQueries

/** Triangle counting / clustering coefficient on planted graphs: the
  * operator's reason to exist is telling duplicate CLIQUES
  * (coefficient 1) from collision CHAINS (coefficient 0), so the spec
  * plants exactly those shapes and checks every count. */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Option[Double])] =
    DedupQueries.triangleStats(edges.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap

  test("4-clique: every vertex sees 3 triangles, coefficient 1.0") {
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val m = stats(clique)
    for (v <- 1L to 4L) assert(m(v) == ((3L, 3L, Some(1.0))))
  }

  test("5-chain: zero triangles everywhere, interior coefficient 0, endpoints NULL") {
    val chain = (1L to 4L).map(i => (i, i + 1))
    val m = stats(chain)
    for (v <- 2L to 4L) assert(m(v) == ((2L, 0L, Some(0.0))))
    assert(m(1L) == ((1L, 0L, None)) && m(5L) == ((1L, 0L, None)))
  }

  test("clique + chain + bridge: counts are exact, not merely shaped") {
    // 4-clique {1..4}, chain 5-6-7, bridge 4-5. Triangles: the 4
    // clique triangles only; vertex 4 gains degree from the bridge
    // (deg 4) but no new triangle -> coefficient drops to 3/6.
    val edges = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)) ++
      Seq((5L, 6L), (6L, 7L), (4L, 5L))
    val m = stats(edges)
    assert(m(4L) == ((4L, 3L, Some(0.5))))
    assert(m(1L) == ((3L, 3L, Some(1.0))))
    assert(m(5L) == ((2L, 0L, Some(0.0))))
    assert(m.values.map(_._2).sum == 12L) // 4 triangles x 3 vertices
  }

  test("hub-heavy star plus one closing edge: exactly one triangle, counted once") {
    // Star center 10 with leaves 1..8 (deg 8); one leaf pair closed.
    val edges = (1L to 8L).map(l => (l, 10L)) ++ Seq((1L, 2L))
    val m = stats(edges)
    assert(m(10L)._2 == 1L && m(1L)._2 == 1L && m(2L)._2 == 1L)
    assert(m.values.map(_._2).sum == 3L)
    for (l <- 3L to 8L) assert(m(l)._2 == 0L)
  }

  test("q_dup_triangles over sf0.001: deterministic, rows for every graph vertex") {
    val a = DedupQueries.trianglesQ(spark, sfDir).collect()
    assert(a.nonEmpty)
    val b = DedupQueries.trianglesQ(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
  }
}
