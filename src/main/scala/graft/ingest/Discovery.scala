package graft.ingest

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Incremental date-partitioned file discovery (SURVEY.md §2.1 S1-S3,
  * §2.6 O1): candidate dates from checkpoint+1 to `today`, union the
  * late registry, probe `prefix/consumption_YYYY_MM_DD/` per date,
  * keep `*.csv`, ascending date order (so the checkpoint only ever
  * covers a clean prefix — reference `src/s3_processor.py:10-80`).
  *
  * The reference's `MaxKeys=10` listing cap silently truncates >10
  * files/day (SURVEY.md §2.6 O2); deliberately NOT reproduced.
  *
  * At scale, the streaming path replaces all of this with the file
  * source's input log ([[graft.stream.IngestStream]]); this batch
  * variant exists for reference parity and for backfills, where the
  * per-date directory probe is exactly a partition-pruned scan.
  */
object Discovery {
  private val fmt = DateTimeFormatter.ofPattern("yyyy_MM_dd")

  final case class FileInfo(path: String, date: LocalDate, size: Long, lastModified: Long)
  final case class Result(files: Seq[FileInfo], foundDates: Set[LocalDate],
      missingDates: Set[LocalDate])

  def candidateDates(from: LocalDate, to: LocalDate, extra: Set[LocalDate]): Seq[LocalDate] = {
    val range = Iterator.iterate(from.plusDays(1))(_.plusDays(1))
      .takeWhile(!_.isAfter(to)).toSeq
    (range ++ extra).distinct.sorted
  }

  /** Probe each candidate date's directory; a date with no readable
    * CSV goes to `missingDates` (the reference's late registry feed,
    * `src/s3_processor.py:69-72`). */
  def discover(spark: SparkSession, prefix: String, checkpoint: LocalDate,
      today: LocalDate, lateDates: Set[LocalDate]): Result = {
    val base = new Path(prefix)
    val fs: FileSystem = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dates = candidateDates(checkpoint, today, lateDates)
    val files = Seq.newBuilder[FileInfo]
    val found = Set.newBuilder[LocalDate]
    val missing = Set.newBuilder[LocalDate]
    for (d <- dates) {
      val dir = new Path(base, s"consumption_${d.format(fmt)}")
      // Only a genuinely ABSENT directory means "date missing"; any
      // other listing fault (permissions, transient store error) must
      // PROPAGATE — classifying it as missing would park the date in
      // the late registry, where the 30-day horizon can expire it in
      // the same run: silent permanent data loss.
      val listed =
        try fs.listStatus(dir).toSeq.filter(st =>
          st.isFile && st.getPath.getName.endsWith(".csv"))
        catch { case _: java.io.FileNotFoundException => Seq.empty }
      if (listed.isEmpty) missing += d
      else {
        found += d
        files ++= listed.map(st =>
          FileInfo(st.getPath.toString, d, st.getLen, st.getModificationTime))
      }
    }
    Result(files.result().sortBy(_.date), found.result(), missing.result())
  }
}
