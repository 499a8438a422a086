package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** P4 multi-format date parsing (SURVEY.md §2.2, reference
  * `src/s3_processor.py:94-104`), incl. the `dd-MMM-yy` first-choice
  * format whose 2-digit year Spark's CORRECTED parser windows to
  * 2000-2099 (documented divergence from pandas/DuckDB — SURVEY.md
  * §7.5). */
class DateParseSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(s: String): Option[java.sql.Date] = {
    val out = Seq(s).toDF("raw").select(
      coalesce(
        expr("try_to_timestamp(raw, 'dd-MMM-yy')"),
        expr("try_to_timestamp(raw, 'yyyy-MM-dd')"),
        expr("try_to_timestamp(raw, 'yyyy/MM/dd')")).cast(DateType).as("d"))
      .collect()(0)
    Option(out.getDate(0))
  }

  test("dd-MMM-yy parses (reference sample format '01-May-25')") {
    assert(parse("01-May-25").contains(java.sql.Date.valueOf("2025-05-01")))
  }

  test("two-digit years window to 2000-2099 under CORRECTED parser") {
    assert(parse("15-Jan-97").contains(java.sql.Date.valueOf("2097-01-15")))
  }

  test("ISO fallback branch (reference fixtures use ISO dates)") {
    assert(parse("2025-05-03").contains(java.sql.Date.valueOf("2025-05-03")))
  }

  test("slash format fallback") {
    assert(parse("2024/12/31").contains(java.sql.Date.valueOf("2024-12-31")))
  }

  test("unparseable stays null (reference logs a warning and keeps the row)") {
    assert(parse("not-a-date").isEmpty)
  }
}
