package graft.ingest

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sink.UpsertSink

/** Batch orchestration of the full reference pipeline (SURVEY.md §3:
  * `lambda_handler` → discover → process → checkpoint), one run =
  * one incremental scan (the reference's polling trigger T1).
  *
  * Error semantics follow SURVEY.md §2.10's spec-vs-bug decisions:
  *  - unreadable file → skipped, date NOT processed, run continues (E1/E3);
  *  - schema-invalid file → halt the remainder of the run (E2's
  *    intent, without its tuple-unpack accident);
  *  - per-date-group merge is all-or-nothing (E4);
  *  - late-registry entries are removed only after their date's merge
  *    commits (E6 fixed);
  *  - checkpoint advances to max(processed), monotonic (A2), only
  *    when every earlier candidate date succeeded (T6 prefix
  *    invariant: a failed date blocks the checkpoint from skipping
  *    past it).
  */
object Pipeline {

  final case class Config(
      prefix: String,
      checkpointDir: String,
      registryDir: String,
      targetDir: String,
      defaultDate: String,
      today: LocalDate,
      horizonDays: Int = 30)

  final case class RunResult(
      message: String,
      processedDates: Seq[LocalDate],
      skippedDates: Seq[LocalDate],
      rowsInTable: Long)

  def run(spark: SparkSession, cfg: Config): RunResult = {
    val checkpoint = new Checkpoint(spark, cfg.checkpointDir, cfg.defaultDate)
    val registry = new LateRegistry(spark, cfg.registryDir, cfg.horizonDays)
    val sink = new UpsertSink(spark, cfg.targetDir)

    val ckpt = checkpoint.read()
    val late = registry.read()
    val disc = Discovery.discover(spark, cfg.prefix, ckpt, cfg.today, late)
    registry.add(disc.missingDates)

    if (disc.files.isEmpty)
      return RunResult("No new files to process", Nil, Nil, sink.read().count())

    val byDate = disc.files.groupBy(_.date).toSeq.sortBy(_._1)
    var processed = Vector.empty[LocalDate]
    var skipped = Vector.empty[LocalDate]
    var halted = false
    var rows = 0L
    for ((date, files) <- byDate if !halted) {
      try {
        val batch = CsvIngest.ingestWithProvenance(spark, files.map(_.path))
        rows = sink.merge(sink.dedupBatch(batch, "_file_order").drop("_file_order"))
        processed :+= date
      } catch {
        case _: CsvIngest.SchemaViolation =>
          // E2 intent: schema-invalid file halts the rest of the run.
          skipped :+= date
          halted = true
        case _: Exception =>
          // E1/E3: unreadable file — skip this date, continue.
          skipped :+= date
      }
    }

    // T6: checkpoint covers only the clean prefix of candidate dates —
    // a skipped date caps how far the checkpoint may advance.
    val firstSkipped = skipped.sorted.headOption
    val advanceTo = firstSkipped match {
      case Some(bad) => processed.filter(_.isBefore(bad)).sorted.lastOption
      case None => processed.sorted.lastOption
    }
    advanceTo.foreach(checkpoint.advance)
    registry.commit(processed.toSet, cfg.today)

    RunResult(s"Processed ${processed.size} date(s)", processed, skipped, rows)
  }
}
