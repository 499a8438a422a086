package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.sink.{JdbcUpsertWriter, PartitionedWriter}

object SinksSpec {
  val captured = new java.util.concurrent.ConcurrentLinkedQueue[JdbcUpsertWriter.Batch]()
}

class SinksSpec extends SparkTestBase {
  import spark.implicits._

  private def batch(rows: (String, String, Long)*) =
    rows.map { case (d, c, t) => (Date.valueOf(d), c, s"N$c", "svc", t) }
      .toDF("date", "client_id", "client_name", "service_name",
        "total_consumed_tokens")

  test("jdbc writer batches rows and binds the expected parameters") {
    SinksSpec.captured.clear()
    val df = batch((1 to 7).map(i => ("2025-05-01", s"C$i", i.toLong)): _*)
      .coalesce(1)
    // executor-side closures are serialized even in local mode, so the
    // capture goes through the JVM-static companion queue
    val n = JdbcUpsertWriter.write(df, b => SinksSpec.captured.add(b), batchSize = 3)
    assert(n == 7)
    val batches = SinksSpec.captured.toArray(Array.empty[JdbcUpsertWriter.Batch])
    assert(batches.map(_.statements.size).sorted.toSeq == Seq(1, 3, 3))
    val allBinds = batches.flatMap(_.statements)
    assert(allBinds.forall(_.size == 5))
    assert(allBinds.map(_(1)).toSet == (1 to 7).map(i => s"C$i").toSet)
    assert(JdbcUpsertWriter.upsertSql.contains("ON CONFLICT (date, client_id)"))
  }

  test("partitioned layout: per-date dirs, pruning, idempotent day rewrite") {
    val dir = Fixtures.tempDir("gold").resolve("t").toString
    PartitionedWriter.write(
      batch(("2025-05-01", "A", 1L), ("2025-05-02", "B", 2L)), dir)
    // Hive-style directories exist
    val d1 = new java.io.File(s"$dir/date=2025-05-01")
    assert(d1.isDirectory)
    // predicate on the partition column prunes to one partition
    val pruned = PartitionedWriter.read(spark, dir)
      .filter(col("date") === "2025-05-01")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || pruned.count() == 1)
    assert(pruned.count() == 1)
    // dynamic overwrite: rewriting day 1 leaves day 2 untouched
    PartitionedWriter.write(batch(("2025-05-01", "A", 99L)), dir)
    val all = PartitionedWriter.read(spark, dir).collect()
      .map(r => r.getAs[String]("client_id") ->
        r.getAs[Long]("total_consumed_tokens")).toMap
    assert(all == Map("A" -> 99L, "B" -> 2L))
  }
}
