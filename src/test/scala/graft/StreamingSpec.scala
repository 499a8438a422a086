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

  test("watermarked dedup: stream agrees with the batch first-seen-within-horizon rule") {
    // Cross-check of the T4 semantics against its BATCH TWIN (the
    // q_watermark_dedup rule): keys kept by the stream across two
    // micro-batch runs — the second carrying one too-late file and
    // one in-horizon file — must equal the batch rule's key set
    // (rows within 30 days of the max observed event time, one per
    // key) computed over the same CSV fixture.
    val base = Fixtures.tempDir("wmdedup")
    val data = base.resolve("data")
    val ckpt = base.resolve("ckpt").toString
    // foreachBatch sink: the memory sink cannot RESUME from a
    // checkpoint, and this test's whole point is the watermark
    // surviving the restart between run 1 and run 2
    def runOnce(tag: String): Set[(String, String)] = {
      val outDir = base.resolve(s"out_$tag").toString
      val q = IngestStream.dedupStream(spark, data.toString)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("date", "client_id").write.mode("append").parquet(outDir)
          ()
        }
        .start()
      q.awaitTermination()
      if (!new java.io.File(outDir).exists) Set.empty
      else spark.read.parquet(outDir).collect()
        .map(r => (r.get(0).toString, r.getString(1))).toSet
    }
    // run 1: recent days (incl. an in-batch duplicate key) — advances
    // the persisted watermark to 2025-05-02 minus 30 days
    Fixtures.writeDay(data, "2025_05_01",
      Seq(Fixtures.clientRow("2025-05-01", 1, "A", "1"),
        Fixtures.clientRow("2025-05-01", 1, "B", "2")))
    Fixtures.writeDay(data, "2025_05_02",
      Seq(Fixtures.clientRow("2025-05-02", 2, "C", "3")))
    val kept1 = runOnce("wmdedup_t1")
    // run 2: a 62-days-late file (behind the restored watermark →
    // dropped) plus an in-horizon file (kept)
    Fixtures.writeDay(data, "2025_03_01",
      Seq(Fixtures.clientRow("2025-03-01", 3, "D", "4")))
    Fixtures.writeDay(data, "2025_04_15",
      Seq(Fixtures.clientRow("2025-04-15", 4, "E", "5")))
    val kept2 = runOnce("wmdedup_t2")

    // batch twin over the SAME files: horizon filter then one row per
    // key — the exact rule q_watermark_dedup hash-gates on events
    val parsed = graft.ingest.CsvIngest.parse(
        spark.read.option("header", "true")
          .schema(graft.model.Consumption.rawSchema)
          .csv(s"$data/consumption_*"))
      .filter(col("date").isNotNull)
    val cut = parsed.agg(date_sub(max(col("date")), 30).as("cut"))
    val expected = parsed.crossJoin(broadcast(cut))
      .filter(col("date") >= col("cut"))
      .select("date", "client_id").distinct()
      .collect().map(r => (r.get(0).toString, r.getString(1))).toSet

    assert(!(kept1 ++ kept2).exists(_._2 == "CLI003"), "late row must be dropped")
    assert(kept2.exists(_._2 == "CLI004"), "in-horizon row must be kept")
    assert(kept1 ++ kept2 == expected,
      s"stream keys ${kept1 ++ kept2} != batch-rule keys $expected")
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
