package graft

import java.nio.file.{Files, Path, Paths}

/** Reproduction of the reference's fixture scenario (FIXTURES.md §1-2):
  * three daily directories `consumption_YYYY_MM_DD/part-0.csv`, stable
  * keys CLI001-CLI008 across days (upsert path), churn keys per day
  * (insert path), mixed date formats exercising the parse chain. */
object Fixtures {

  val header = "date,client_id,client_name,service_name,total_consumed_tokens"

  def clientRow(date: String, id: Int, service: String, tokens: String): String =
    f"$date,CLI$id%03d,Client $id%d,$service,$tokens"

  /** day → rows (date strings deliberately vary in format). */
  def days: Seq[(String, Seq[String])] = Seq(
    "2025_05_01" -> (
      (1 to 8).map(i => clientRow("2025-05-01", i, "API Gateway", (i * 100).toString)) ++
        Seq(clientRow("2025-05-01", 9, "Chatbot Service", "901"),
          clientRow("01-May-25", 10, "Search", ""))), // dd-MMM-yy + null tokens
    "2025_05_02" -> (
      (1 to 8).map(i => clientRow("2025-05-02", i, "Chatbot Service", (i * 110).toString)) ++
        Seq(clientRow("2025/05/02", 11, "Search", "1101"))), // slash format
    "2025_05_03" -> (
      (1 to 8).map(i => clientRow("2025-05-03", i, "API Gateway", (i * 120).toString)) ++
        Seq(clientRow("2025-05-03", 12, "Search", "1201"),
          clientRow("2025-05-03", 13, "Vision", "1301"))))

  /** Write the standard 3-day layout under `base`; returns base. */
  def writeLayout(base: Path): Path = {
    for ((day, rows) <- days) writeDay(base, day, rows)
    base
  }

  def writeDay(base: Path, day: String, rows: Seq[String],
      fileName: String = "part-0.csv"): Unit = {
    val dir = base.resolve(s"consumption_$day")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(fileName), (header +: rows).mkString("\n"))
  }

  def tempDir(tag: String): Path =
    Files.createTempDirectory(s"graft-$tag-")

  /** Recursive delete / copy for crash-state fabrication — commons-io
    * (already on the Spark classpath) instead of the hand-rolled tree
    * walks that had been copy-pasted per spec (review r13). */
  def deleteRec(f: java.io.File): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    ()
  }

  def copyRec(src: java.io.File, dst: java.io.File): Unit =
    org.apache.commons.io.FileUtils.copyDirectory(src, dst)
}
