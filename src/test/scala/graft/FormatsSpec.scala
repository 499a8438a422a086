package graft

import org.apache.spark.sql.functions._

/** Source/sink format matrix beyond parquet+CSV: ORC (ships in
  * spark-sql — scan pushdown + Hive-layout partition pruning must
  * hold exactly as for parquet) and JSON-lines (schema'd PERMISSIVE
  * read with corrupt-record capture, the CsvIngest error contract on
  * a second format). Avro is NOT claimed: the spark-avro DataSource
  * jar is absent from /opt/spark/jars (checked round 10). */
class FormatsSpec extends SparkTestBase {

  private def lineitems = Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")

  test("ORC round-trip is value-identical to the parquet source") {
    val dir = Fixtures.tempDir("orc-rt").toString
    lineitems.coalesce(2).write.mode("overwrite").orc(s"$dir/li.orc")
    val back = spark.read.orc(s"$dir/li.orc")
    val a = lineitems.orderBy("l_orderkey", "l_partkey", "l_quantity").collect()
    val b = back.orderBy("l_orderkey", "l_partkey", "l_quantity").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("ORC scan pushes filters and prunes columns (the parquet contract, second format)") {
    val dir = Fixtures.tempDir("orc-push").toString
    lineitems.coalesce(2).write.mode("overwrite").orc(s"$dir/li.orc")
    val q = spark.read.orc(s"$dir/li.orc")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan orc")).mkString
    assert(scan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      s"filter not pushed to the ORC scan: $scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity"),
      s"column pruning missing from the ORC scan: $scan")
    assert(!scan.contains("l_partkey"), "pruned column still read")
  }

  test("ORC Hive-layout partition pruning reads only the selected partition") {
    val dir = Fixtures.tempDir("orc-part").toString
    lineitems.withColumn("flag", col("l_returnflag"))
      .write.mode("overwrite").partitionBy("flag").orc(s"$dir/li.orc")
    val q = spark.read.orc(s"$dir/li.orc").filter(col("flag") === "R")
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan orc")).mkString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.matches(".*PartitionFilters: \\[[^\\]]*flag[^\\]]*\\].*"), scan)
    val expected = lineitems.filter(col("l_returnflag") === "R").count()
    assert(q.count() == expected)
  }

  test("JSON-lines: schema'd PERMISSIVE read captures corrupt records like CsvIngest") {
    val dir = Fixtures.tempDir("jsonl").toString
    val p = java.nio.file.Paths.get(dir, "rows.jsonl")
    java.nio.file.Files.writeString(p,
      """{"id": 1, "v": 10.5}
        |{"id": 2, "v": 20.25}
        |{broken json
        |{"id": "not_a_number", "v": 1.0}
        |""".stripMargin)
    val df = spark.read
      .schema("id BIGINT, v DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(p.toString)
      .cache() // SPARK-21610: corrupt-record column needs a materialized frame
    try {
      val ok = df.filter(col("_corrupt_record").isNull)
        .select("id", "v").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(ok.toSet == Set((1L, 10.5), (2L, 20.25)))
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
    } finally { df.unpersist(); () }
  }

  test("cross-format equality: parquet, ORC and JSON round-trips agree row-for-row") {
    val dir = Fixtures.tempDir("xfmt").toString
    val src = lineitems.limit(500)
      .withColumn("l_quantity", col("l_quantity").cast("double"))
    src.coalesce(1).write.mode("overwrite").parquet(s"$dir/p")
    src.coalesce(1).write.mode("overwrite").orc(s"$dir/o")
    src.coalesce(1).write.mode("overwrite").json(s"$dir/j")
    val key = Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    val p = spark.read.parquet(s"$dir/p").select(key.map(col): _*).orderBy(key.map(col): _*).collect()
    val o = spark.read.orc(s"$dir/o").select(key.map(col): _*).orderBy(key.map(col): _*).collect()
    val j = spark.read.schema(spark.read.parquet(s"$dir/p").schema)
      .json(s"$dir/j").select(key.map(col): _*).orderBy(key.map(col): _*).collect()
    assert(p.toSeq === o.toSeq)
    assert(p.toSeq === j.toSeq)
  }
}
