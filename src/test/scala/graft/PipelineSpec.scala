package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.ingest.Pipeline

/** End-to-end batch pipeline against the reference's fixture scenario
  * (SURVEY.md §5.2 "Pipeline end-to-end"): 3-day layout → run →
  * final-table assertions; second run is a no-op; a late-arriving
  * file for a missed date is picked up via the registry. */
class PipelineSpec extends SparkTestBase {

  /** Collect engine log lines emitted while `body` runs. */
  private def capturingLogs[A](body: => A): (A, Seq[(String, String)]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val h = graft.util.Log.addListener((lvl, _, msg) => buf.synchronized { buf += lvl -> msg; () })
    try (body, { val r = buf.synchronized(buf.toSeq); r }) finally h.close()
  }

  private def cfg(base: java.nio.file.Path, today: String) = Pipeline.Config(
    prefix = base.resolve("data").toString,
    checkpointDir = base.resolve("ckpt").toString,
    registryDir = base.resolve("registry").toString,
    targetDir = base.resolve("table").toString,
    defaultDate = "2025_04_30",
    today = LocalDate.parse(today))

  test("full ingest: upserts, churn, mixed formats, null coercion") {
    val base = Fixtures.tempDir("e2e")
    Fixtures.writeLayout(base.resolve("data"))
    val c = cfg(base, "2025-05-04")

    val r1 = Pipeline.run(spark, c)
    assert(r1.processedDates.map(_.toString) ==
      Seq("2025-05-01", "2025-05-02", "2025-05-03"))

    val table = spark.read.parquet(c.targetDir)
    // 8 stable clients x 3 days + CLI009, CLI010 (day1) + CLI011 (day2)
    // + CLI012, CLI013 (day3): distinct (date, client) keys
    assert(table.count() == 29)
    // null tokens coerced to 0 (CLI010, day 1, dd-MMM-yy date row)
    val cli10 = table.filter(col("client_id") === "CLI010").collect()
    assert(cli10.length == 1)
    assert(cli10(0).getAs[Long]("total_consumed_tokens") == 0L)
    assert(cli10(0).getAs[java.sql.Date]("date").toString == "2025-05-01")
    // slash-format date parsed (CLI011 day 2)
    assert(table.filter(col("client_id") === "CLI011")
      .collect()(0).getAs[java.sql.Date]("date").toString == "2025-05-02")
    // distinct dates never collide: CLI001 has one row per day
    assert(table.filter(col("client_id") === "CLI001").count() == 3)
    // audit columns present and active
    assert(table.filter(!col("is_active")).count() == 0)

    // second run: no new files, state unchanged — and the run says so
    // in the log, like the reference (`lambda_handler.py:83`)
    val (r2, logs) = capturingLogs(Pipeline.run(spark, c))
    assert(r2.message == "No new files to process")
    assert(r2.rowsInTable == 29)
    assert(logs.exists { case (lvl, m) => lvl == "INFO" && m == "No new files to process" })
    assert(logs.exists { case (_, m) => m.startsWith("Last processed date: 2025_05_03") })
  }

  test("handle() wraps runs in the reference's response envelope") {
    val base = Fixtures.tempDir("envelope")
    Fixtures.writeLayout(base.resolve("data"))
    // a second file on day 1: the envelope counts FILES and keeps the
    // duplicate date, like the reference's processed_files list
    Fixtures.writeDay(base.resolve("data"), "2025_05_01",
      Seq(Fixtures.clientRow("2025-05-01", 99, "Z", "9")), "part-1.csv")
    val c = cfg(base, "2025-05-04")

    val ok = Pipeline.handle(spark, c)
    assert(ok.statusCode == 200)
    assert(ok.body.contains("\"message\": \"Successfully processed 4 files\""))
    assert(ok.body.contains(
      "\"processed_dates\": [\"2025_05_01\", \"2025_05_01\", \"2025_05_02\", \"2025_05_03\"]"))

    val noop = Pipeline.handle(spark, c)
    assert(noop == Pipeline.Response(200, "\"No new files to process\""))

    // a run that throws (unparseable default date) → 500 error envelope
    val (bad, logs) = capturingLogs(
      Pipeline.handle(spark, c.copy(checkpointDir = base.resolve("ck2").toString,
        defaultDate = "garbage")))
    assert(bad.statusCode == 500)
    assert(bad.body.contains("\"errorType\": \"DateTimeParseException\""))
    assert(logs.exists { case (lvl, m) => lvl == "ERROR" && m.startsWith("Error in pipeline handler:") })
  }

  test("late-arriving file is remembered and ingested when it shows up") {
    val base = Fixtures.tempDir("late")
    val data = base.resolve("data")
    Fixtures.writeDay(data, "2025_05_01", Seq(Fixtures.clientRow("2025-05-01", 1, "A", "1")))
    // 05-02 absent; 05-03 present
    Fixtures.writeDay(data, "2025_05_03", Seq(Fixtures.clientRow("2025-05-03", 1, "A", "3")))
    val c = cfg(base, "2025-05-04")

    val r1 = Pipeline.run(spark, c)
    assert(r1.processedDates.map(_.toString) == Seq("2025-05-01", "2025-05-03"))
    assert(new graft.ingest.LateRegistry(spark, c.registryDir).read()
      .map(_.toString) == Set("2025-05-02", "2025-05-04"))

    // the missing day's file arrives late
    Fixtures.writeDay(data, "2025_05_02", Seq(Fixtures.clientRow("2025-05-02", 1, "A", "2")))
    val r2 = Pipeline.run(spark, c)
    assert(r2.processedDates.map(_.toString) == Seq("2025-05-02"))
    assert(!new graft.ingest.LateRegistry(spark, c.registryDir).read()
      .map(_.toString).contains("2025-05-02"))
    val table = spark.read.parquet(c.targetDir)
    assert(table.count() == 3)
  }

  test("schema-invalid file halts the run; checkpoint covers clean prefix only") {
    val base = Fixtures.tempDir("halt")
    val data = base.resolve("data")
    Fixtures.writeDay(data, "2025_05_01", Seq(Fixtures.clientRow("2025-05-01", 1, "A", "1")))
    // day 2's file is missing required columns
    val dir = data.resolve("consumption_2025_05_02")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("bad.csv"),
      "date,wrong_col\n2025-05-02,oops")
    Fixtures.writeDay(data, "2025_05_03", Seq(Fixtures.clientRow("2025-05-03", 1, "A", "3")))
    val c = cfg(base, "2025-05-04")

    val (r, logs) = capturingLogs(Pipeline.run(spark, c))
    assert(r.processedDates.map(_.toString) == Seq("2025-05-01"))
    assert(r.skippedDates.map(_.toString) == Seq("2025-05-02"))
    assert(logs.exists { case (lvl, m) =>
      lvl == "ERROR" && m.startsWith("Schema violation on 2025-05-02, halting run") })
    assert(logs.exists { case (lvl, m) =>
      lvl == "INFO" && m.startsWith("Processed date 2025-05-01") })
    // halted: 05-03 not processed, checkpoint stuck at 05-01
    val ck = new graft.ingest.Checkpoint(spark, c.checkpointDir, c.defaultDate)
    assert(ck.read().toString == "2025-05-01")
  }

  test("checkpoint is monotonic") {
    val base = Fixtures.tempDir("mono")
    val ck = new graft.ingest.Checkpoint(spark, base.resolve("ck").toString, "2025_04_30")
    assert(ck.read().toString == "2025-04-30")
    assert(ck.advance(LocalDate.parse("2025-05-02")))
    assert(!ck.advance(LocalDate.parse("2025-05-01"))) // stale: refused
    assert(!ck.advance(LocalDate.parse("2025-05-02"))) // equal: refused
    assert(ck.read().toString == "2025-05-02")
    assert(ck.advance(LocalDate.parse("2025-05-03")))
    assert(ck.read().toString == "2025-05-03")
  }

  test("registry expires dates beyond the 30-day horizon on commit") {
    val base = Fixtures.tempDir("hz")
    val reg = new graft.ingest.LateRegistry(spark, base.resolve("r").toString)
    reg.add(Set(LocalDate.parse("2025-03-01"), LocalDate.parse("2025-04-20")))
    val left = reg.commit(Set.empty, LocalDate.parse("2025-05-01"))
    assert(left.map(_.toString) == Set("2025-04-20"))
  }
}
