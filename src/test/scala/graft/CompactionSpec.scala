package graft

import org.apache.spark.sql.functions._

import graft.sink.Compactor

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("compaction: many small files → few, data identical") {
    val dir = Fixtures.tempDir("compact").resolve("t").toString
    // simulate 40 tiny incremental loads
    (1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(40).write.parquet(dir)
    assert(Compactor.fileCount(spark, dir) >= 10) // AQE may coalesce some
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted

    val n = Compactor.compact(spark, dir, targetRowsPerFile = 20)
    assert(n == 2, s"expected 2 files, got $n")
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq)
  }

  test("compaction preserves Hive partition layout") {
    val dir = Fixtures.tempDir("compactpart").resolve("t").toString
    (1 to 100).map(i => (s"2025-05-${"%02d".format(i % 4 + 1)}", i.toLong))
      .toDF("date", "id")
      .repartition(20).write.partitionBy("date").parquet(dir)
    assert(Compactor.fileCount(spark, dir) > 4) // recursive count sees them
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted

    Compactor.compact(spark, dir, targetRowsPerFile = 50,
      partitionBy = Seq("date"))
    // date= directories survive and partition discovery still works
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    assert(dirs.count(_.startsWith("date=")) == 4, dirs.mkString(","))
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq)
  }

  test("cluster-by compaction sorts within files for stats pruning") {
    val dir = Fixtures.tempDir("cluster").resolve("t").toString
    val rnd = new scala.util.Random(3)
    (1 to 1000).map(_ => (rnd.nextInt(1000).toLong, "x")).toDF("k", "v")
      .repartition(10).write.parquet(dir)
    Compactor.compact(spark, dir, targetRowsPerFile = 500, clusterBy = Seq("k"))
    // range partitioning: per-file key ranges must not overlap
    val ranges = spark.read.parquet(dir)
      .select(col("k"), input_file_name().as("f"))
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    for (Seq((_, hi1), (lo2, _)) <- ranges.toSeq.sliding(2))
      assert(hi1 <= lo2, s"file ranges overlap: $ranges")
  }

  test("crash windows: mid-swap, stale .bak, orphan .tmp all heal at the next compact") {
    // VERDICT r12 #2: Compactor previously hand-rolled the two-rename
    // swap — a crash between rename-aside and rename-in left NO live
    // directory and no repair path. Now it rides StateFs: healWriter
    // at every compact entry restores/cleans each window.
    import java.io.File
    val dir = Fixtures.tempDir("compactcrash").resolve("t").toString
    (1 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(40).write.parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq

    // window 1 — between rename-aside and rename-in: live is GONE,
    // the data survives only under .bak (the exact state the old code
    // could not recover from)
    val live = new File(dir)
    val bak = new File(dir + ".bak")
    assert(live.renameTo(bak) && !live.exists())
    assert(Compactor.compact(spark, dir, targetRowsPerFile = 20) === 2)
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq === before)
    assert(!bak.exists())

    // window 2 — completed swap whose .bak cleanup crashed, plus an
    // orphan .tmp from an unfinished rewrite: both dropped, live wins
    new File(dir + ".bak/junk").mkdirs()
    new File(dir + ".tmp/junk").mkdirs()
    assert(Compactor.compact(spark, dir, targetRowsPerFile = 40) === 1)
    assert(!new File(dir + ".bak").exists() && !new File(dir + ".tmp").exists())
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq === before)

    // reader path on the mid-swap crash state: Compactor.read heals
    // (bak -> live) and returns the rows where a bare
    // spark.read.parquet would throw path-not-found; the writer-owned
    // .tmp is left alone
    assert(live.renameTo(bak) && !live.exists())
    new File(dir + ".tmp/junk2").mkdirs()
    assert(Compactor.read(spark, dir).collect().map(_.toString).sorted.toSeq === before)
    assert(new File(dir + ".tmp/junk2").exists(),
      "a reader must not delete the writer-owned .tmp")
    assert(!bak.exists())

    // window 3 — mid-swap crash, then an OUT-OF-BAND writer (a plain
    // ingest job) recreates live before any repair runs: live and .bak
    // now BOTH exist and live is not a compactor rewrite (no marker) —
    // the entry heal must refuse to drop the .bak, which holds the
    // only full pre-crash copy, instead of silently deleting history
    assert(live.renameTo(bak) && !live.exists())
    Seq((999L, "out-of-band")).toDF("id", "v").write.parquet(dir)
    val e = intercept[RuntimeException] {
      Compactor.compact(spark, dir, targetRowsPerFile = 40)
    }
    assert(e.getMessage.contains("out-of-band"))
    assert(bak.exists(), "the .bak (full pre-crash table) must survive")
  }

  test("schema evolution: mergeSchema unions batch schemas") {
    val dir = Fixtures.tempDir("evolve").resolve("t").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir + "/b1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(dir + "/b2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(dir + "/b1", dir + "/b2")
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old batch: null
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }
}
