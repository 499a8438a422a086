package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.AdvancedQueries
import graft.sink.Scd2Sink

/** SCD2 sink semantics. The core property: applying the change log in
  * in-order batches reproduces EXACTLY the history `q_scd2_history`
  * rebuilds from the full log — sink and query share one compression
  * definition and must not drift. Plus the merge contract rows: late
  * events quarantine without touching state, replays are silent
  * no-ops, unchanged attrs compress away. */
class Scd2SinkSpec extends SparkTestBase {
  import spark.implicits._

  private def changeLog: DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_custkey").as("key"),
      col("o_orderstatus").as("attr"),
      col("o_orderdate").cast("date").as("eff_date"),
      col("o_orderkey").as("seq"))

  private def snap(sink: Scd2Sink): Seq[(Long, Int, String, Date, Option[Date])] =
    sink.read().collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getString(1), r.getDate(2),
        Option(r.getDate(3))))
      .sortBy(t => (t._1, t._2)).toSeq

  test("in-order incremental batches == q_scd2_history rebuild of the full log") {
    val dir = Fixtures.tempDir("scd2-incr").toString
    val sink = new Scd2Sink(spark, s"$dir/state")
    val log = changeLog.persist()
    try {
      val cuts = Seq("1995-06-01", "1997-01-01")
      val batches = Seq(
        log.filter(col("eff_date") < cuts.head),
        log.filter(col("eff_date") >= cuts.head && col("eff_date") < cuts(1)),
        log.filter(col("eff_date") >= cuts(1)))
      for (b <- batches) {
        val late = sink.applyBatch(b)
        assert(late.isEmpty, "in-order batches must not produce late rows")
      }
      val expected = AdvancedQueries.scd2History(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDate(3),
          Option(r.getDate(4))))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(snap(sink) === expected)
    } finally { log.unpersist(); () }
  }

  test("late event quarantines with a reason and leaves state untouched") {
    val dir = Fixtures.tempDir("scd2-late").toString
    val sink = new Scd2Sink(spark, s"$dir/state")
    val b1 = Seq((1L, "A", "2024-01-01", 1L), (1L, "B", "2024-03-01", 2L))
      .toDF("key", "attr", "eff_date", "seq")
    assert(sink.applyBatch(b1).isEmpty)
    val before = snap(sink)
    val lateB = Seq((1L, "C", "2024-02-01", 3L))
      .toDF("key", "attr", "eff_date", "seq")
    val late = sink.applyBatch(lateB).collect()
    assert(late.length == 1 && late(0).getString(3) == "behind_frontier")
    assert(snap(sink) === before)
  }

  test("replaying an applied batch is a silent no-op (idempotent retry)") {
    val dir = Fixtures.tempDir("scd2-replay").toString
    val sink = new Scd2Sink(spark, s"$dir/state")
    val b = Seq((7L, "A", "2024-01-01", 1L), (7L, "B", "2024-02-01", 2L),
      (8L, "X", "2024-01-15", 3L)).toDF("key", "attr", "eff_date", "seq")
    assert(sink.applyBatch(b).isEmpty)
    val before = snap(sink)
    assert(sink.applyBatch(b).isEmpty, "replay must not be flagged late")
    assert(snap(sink) === before)
  }

  test("unchanged attr compresses away; changed attr closes and opens versions") {
    val dir = Fixtures.tempDir("scd2-comp").toString
    val sink = new Scd2Sink(spark, s"$dir/state")
    sink.applyBatch(Seq((5L, "A", "2024-01-01", 1L))
      .toDF("key", "attr", "eff_date", "seq")).count()
    sink.applyBatch(Seq((5L, "A", "2024-02-01", 2L))
      .toDF("key", "attr", "eff_date", "seq")).count()
    assert(snap(sink) ===
      Seq((5L, 1, "A", Date.valueOf("2024-01-01"), None)))
    sink.applyBatch(Seq((5L, "B", "2024-03-01", 3L))
      .toDF("key", "attr", "eff_date", "seq")).count()
    assert(snap(sink) === Seq(
      (5L, 1, "A", Date.valueOf("2024-01-01"), Some(Date.valueOf("2024-03-01"))),
      (5L, 2, "B", Date.valueOf("2024-03-01"), None)))
  }

  test("replay is a no-op even for events that compressed away") {
    // The hard replay case: within one batch, an accepted-but-
    // compressed-away event (attr unchanged → no version row) is
    // followed by an event that advances the key's frontier. An
    // exact-version-row replay check would misfile the first event's
    // replay as 'behind_frontier'; the in-effect-attr rule must keep
    // it a silent no-op (it compresses away in a full-log rebuild
    // too, so state correctness and replay purity agree).
    val dir = Fixtures.tempDir("scd2-replay-comp").toString
    val sink = new Scd2Sink(spark, s"$dir/state")
    sink.applyBatch(Seq((11L, "A", "2024-01-01", 1L))
      .toDF("key", "attr", "eff_date", "seq")).count()
    val b2 = Seq(
      (11L, "A", "2024-02-01", 2L), // accepted, compresses away
      (11L, "B", "2024-03-01", 3L)  // advances frontier past it
    ).toDF("key", "attr", "eff_date", "seq")
    assert(sink.applyBatch(b2).isEmpty, "first run must be clean")
    val before = snap(sink)
    assert(sink.applyBatch(b2).isEmpty,
      "crash-replay must not quarantine the compressed-away event")
    assert(snap(sink) === before, "replay must leave state unchanged")
    // Wider contract: ANY event matching the attr in effect at its
    // eff_date is a no-op, even if never part of an applied batch —
    // it would compress away in the full-log rebuild as well.
    val echo = Seq((11L, "A", "2024-01-20", 9L))
      .toDF("key", "attr", "eff_date", "seq")
    assert(sink.applyBatch(echo).isEmpty, "in-effect echo is a no-op")
    assert(snap(sink) === before)
    // ...but a CONFLICTING behind-frontier event still quarantines.
    val conflict = Seq((11L, "C", "2024-01-20", 10L))
      .toDF("key", "attr", "eff_date", "seq")
    assert(sink.applyBatch(conflict).collect()
      .map(_.getString(3)).toSeq === Seq("behind_frontier"))
  }

  test("same-day collision resolves by greatest seq, deterministically") {
    val dir = Fixtures.tempDir("scd2-tie").toString
    val sink = new Scd2Sink(spark, s"$dir/state")
    val b = Seq((9L, "A", "2024-01-01", 1L), (9L, "B", "2024-01-01", 5L),
      (9L, "C", "2024-01-01", 3L)).toDF("key", "attr", "eff_date", "seq")
    assert(sink.applyBatch(b).isEmpty)
    assert(snap(sink) === Seq((9L, 1, "B", Date.valueOf("2024-01-01"), None)))
  }
}
