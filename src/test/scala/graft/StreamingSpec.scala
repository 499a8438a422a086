package graft

import org.apache.spark.sql.functions._

import graft.streaming.IngestStream

/** Structured Streaming pipeline (T1-T6): file source over the
  * fixture layout, AvailableNow trigger, foreachBatch keyed upsert,
  * checkpointed incremental restart, windowed rollup. */
class StreamingSpec extends SparkTestBase {

  test("streaming upsert: ingests all days, restart is incremental (T1/T2/T5)") {
    val base = Fixtures.tempDir("stream")
    val data = base.resolve("data")
    Fixtures.writeLayout(data)
    val target = base.resolve("table").toString
    val ckpt = base.resolve("ckpt").toString

    val q1 = IngestStream.startUpsert(spark, data.toString, target, ckpt)
    q1.awaitTermination()
    val t1 = spark.read.parquet(target)
    assert(t1.count() == 29) // same final state as the batch pipeline
    assert(t1.filter(col("client_id") === "CLI010")
      .collect()(0).getAs[Long]("total_consumed_tokens") == 0L)

    // restart with no new files: offsets WAL says nothing to do
    val q2 = IngestStream.startUpsert(spark, data.toString, target, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(target).count() == 29)

    // a late file arrives (out of date order — T3: no registry needed)
    Fixtures.writeDay(data, "2025_04_28",
      Seq(Fixtures.clientRow("2025-04-28", 1, "Late", "42")))
    val q3 = IngestStream.startUpsert(spark, data.toString, target, ckpt)
    q3.awaitTermination()
    val t3 = spark.read.parquet(target)
    assert(t3.count() == 30)
    assert(t3.filter(col("date") === "2025-04-28").count() == 1)
  }

  test("streaming upsert: cross-file conflict resolves by file mtime, not layout (T5)") {
    val base = Fixtures.tempDir("streamorder")
    val data = base.resolve("data")
    // Conflicting key in two files of ONE micro-batch. The newer file is
    // lexicographically SMALLER, so path/listing order disagrees with
    // mtime order — last-writer-wins must follow mtime (the batch
    // path's _file_order), not partition/file layout.
    Fixtures.writeDay(data, "2025_05_01",
      Seq(Fixtures.clientRow("2025-05-01", 1, "Old", "999")), "z-first.csv")
    Thread.sleep(1100) // cross fs mtime granularity
    Fixtures.writeDay(data, "2025_05_01",
      Seq(Fixtures.clientRow("2025-05-01", 1, "New", "7")), "a-second.csv")
    val target = base.resolve("table").toString
    val q = IngestStream.startUpsert(spark, data.toString, target,
      base.resolve("ckpt").toString)
    q.awaitTermination()
    val rows = spark.read.parquet(target).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("total_consumed_tokens") == 7L,
      "newer-mtime file must win the keyed upsert")
  }

  test("streaming exact dedup within watermark bounds state") {
    val base = Fixtures.tempDir("sdedup")
    val data = base.resolve("data")
    // same (date, client) key appears twice within one day's files
    Fixtures.writeDay(data, "2025_05_01",
      Seq(Fixtures.clientRow("2025-05-01", 1, "A", "1"),
        Fixtures.clientRow("2025-05-01", 1, "B", "2"),
        Fixtures.clientRow("2025-05-01", 2, "C", "3")))
    val q = IngestStream.dedupStream(spark, data.toString)
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_t")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("sdedup_t")
    assert(out.count() == 2) // CLI001 deduped, CLI002 kept
    assert(out.filter(col("client_id") === "CLI001").count() == 1)
  }

  test("windowed daily rollup with 30-day watermark (T4)") {
    val base = Fixtures.tempDir("rollup")
    val data = base.resolve("data")
    Fixtures.writeLayout(data)
    IngestStream.runRollupOnce(spark, data.toString, "rollup_t",
      base.resolve("ckpt").toString)
    val out = spark.table("rollup_t")
    // CLI001: one window per day, tokens = 100/110/120
    val cli1 = out.filter(col("client_id") === "CLI001")
      .orderBy("date").collect()
    assert(cli1.map(_.getAs[Long]("daily_tokens")).toSeq == Seq(100L, 110L, 120L))
    assert(cli1.map(_.getAs[java.sql.Date]("date").toString).toSeq ==
      Seq("2025-05-01", "2025-05-02", "2025-05-03"))
  }
}
