package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame

import graft.sink.Scd2Sink
import graft.streaming.Scd2Stream

/** Streaming SCD2 fold: in-order micro-batches reproduce the batch
  * rebuild, late events quarantine durably per batch id, and the
  * kill-and-restart replay window neither double-counts state nor
  * double-appends the quarantine. */
class Scd2StreamSpec extends SparkTestBase {
  import spark.implicits._

  private def events(rows: (Long, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("key", "attr", "eff_date", "seq")
      .withColumn("eff_date",
        org.apache.spark.sql.functions.col("eff_date").cast("date"))

  private def snap(dir: String): Seq[(Long, Int, String, Date, Option[Date])] =
    new Scd2Sink(spark, dir).read().collect()
      .map(r => (r.getLong(0), r.getInt(4), r.getString(1), r.getDate(2),
        Option(r.getDate(3))))
      .sortBy(t => (t._1, t._2)).toSeq

  test("AvailableNow fold over two files == direct sink merges; idle rerun is a no-op") {
    val base = Fixtures.tempDir("scd2s")
    val data = base.resolve("events").toString
    val state = base.resolve("state").toString
    val lateD = base.resolve("late").toString
    val ckpt = base.resolve("ckpt").toString
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("key BIGINT, attr STRING, eff_date DATE, seq BIGINT")
        .parquet(data)
      Scd2Stream.start(spark, src, state, lateD, ckpt).awaitTermination()
    }
    events((1L, "A", "2024-01-01", 1L), (2L, "X", "2024-01-02", 2L))
      .coalesce(1).write.mode("append").parquet(data)
    runOnce()
    events((1L, "B", "2024-02-01", 3L), (2L, "X", "2024-02-02", 4L))
      .coalesce(1).write.mode("append").parquet(data)
    runOnce()
    runOnce() // no new files: nothing may change
    assert(snap(state) === Seq(
      (1L, 1, "A", Date.valueOf("2024-01-01"), Some(Date.valueOf("2024-02-01"))),
      (1L, 2, "B", Date.valueOf("2024-02-01"), None),
      (2L, 1, "X", Date.valueOf("2024-01-02"), None)))
    assert(Scd2Stream.lateRegistry(spark, lateD).isEmpty)
  }

  test("late event quarantines under its batch_id; state untouched") {
    val base = Fixtures.tempDir("scd2sl")
    val data = base.resolve("events").toString
    val state = base.resolve("state").toString
    val lateD = base.resolve("late").toString
    val ckpt = base.resolve("ckpt").toString
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("key BIGINT, attr STRING, eff_date DATE, seq BIGINT")
        .parquet(data)
      Scd2Stream.start(spark, src, state, lateD, ckpt).awaitTermination()
    }
    events((1L, "A", "2024-01-01", 1L), (1L, "B", "2024-03-01", 2L))
      .coalesce(1).write.mode("append").parquet(data)
    runOnce()
    val before = snap(state)
    events((1L, "C", "2024-02-01", 3L)) // behind the 03-01 frontier
      .coalesce(1).write.mode("append").parquet(data)
    runOnce()
    assert(snap(state) === before)
    val late = Scd2Stream.lateRegistry(spark, lateD).collect()
    assert(late.length == 1)
    assert(late(0).getAs[String]("reason") == "behind_frontier")
    assert(late(0).getAs[Long]("key") == 1L)
  }

  test("kill-and-restart: replayed batch neither double-counts state nor duplicates quarantine") {
    val base = Fixtures.tempDir("scd2sr")
    val data = base.resolve("events").toString
    val state = base.resolve("state").toString
    val lateD = base.resolve("late").toString
    val ckpt = base.resolve("ckpt").toString
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("key BIGINT, attr STRING, eff_date DATE, seq BIGINT")
        .parquet(data)
      Scd2Stream.start(spark, src, state, lateD, ckpt).awaitTermination()
    }
    events((1L, "A", "2024-01-01", 1L), (1L, "B", "2024-03-01", 2L))
      .coalesce(1).write.mode("append").parquet(data)
    runOnce()
    // batch 1: one applied change + one late event
    events((1L, "D", "2024-04-01", 3L), (1L, "C", "2024-02-01", 4L))
      .coalesce(1).write.mode("append").parquet(data)
    runOnce()
    val stateAfter = snap(state)
    val lateAfter = Scd2Stream.lateRegistry(spark, lateD).collect().length
    // crash window: state + quarantine durable, WAL commit lost
    val commits = new java.io.File(ckpt, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists) { crc.delete(); () }
    runOnce() // replays the last batch
    assert(snap(state) === stateAfter)
    assert(Scd2Stream.lateRegistry(spark, lateD).collect().length == lateAfter)
  }
}
