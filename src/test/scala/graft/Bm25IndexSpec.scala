package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Bm25Index
import graft.queries.CorpusQueries

/** Incremental BM25 index: batch-fold must equal full rebuild
  * statistic-for-statistic (the Scd2Sink rebuild==incremental
  * pattern), serving from stored state must reproduce the direct
  * q_rag_retrieve computation row-for-row, replays must no-op, and a
  * half-committed batch must stay invisible until its replay
  * completes the merge. */
class Bm25IndexSpec extends SparkTestBase {

  private def docs: DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private val bucket =
    pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L), lit(100L))

  private def dfMap(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("two-batch fold == full rebuild for every stored statistic") {
    val state = Fixtures.tempDir("bm25-fold").resolve("state").toString
    assert(Bm25Index.appendBatch(spark, state, docs.filter(bucket < 90), 0L))
    assert(Bm25Index.appendBatch(spark, state, docs.filter(bucket >= 90), 1L))
    val (postings, dl, dfreq, stats) = Bm25Index.readState(spark, state).get
    // rebuild the same statistics in one pass over the full corpus
    val ctoks = Bm25Index.chunkTokens(docs)
    val rDl = ctoks.groupBy("doc_id", "chunk_id", "start", "len")
      .agg(count(lit(1)).as("dl"))
    val rPost = ctoks.groupBy("doc_id", "chunk_id", "token")
      .agg(count(lit(1)).as("tf"))
    assert(dfMap(dfreq) === dfMap(rPost.groupBy("token")
      .agg(count(lit(1)).as("df"))), "df diverged")
    val st = stats.select("n_docs", "t_tok").head()
    val rSt = rDl.agg(count(lit(1)), sum(col("dl"))).head()
    assert((st.getLong(0), st.getLong(1)) === (rSt.getLong(0), rSt.getLong(1)),
      "corpus stats diverged")
    def key3(df: DataFrame): Set[(Long, Long, String, Long)] =
      df.select("doc_id", "chunk_id", "token", "tf").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(key3(postings) === key3(rPost), "postings diverged")
    assert(dl.count() === rDl.count())
  }

  test("retrieve from stored state == direct q_rag_retrieve, row for row") {
    val state = Fixtures.tempDir("bm25-serve").resolve("state").toString
    Bm25Index.appendBatch(spark, state, docs.filter(bucket < 50), 0L)
    Bm25Index.appendBatch(spark, state, docs.filter(bucket >= 50), 1L)
    val served = Bm25Index.retrieve(spark, state,
        Seq("spark", "vector", "customer"), k = 10)
      .collect().map(_.toString).toSeq
    val direct = CorpusQueries.ragRetrieve(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(served === direct,
      "index-served retrieval must be bit-identical to the direct query")
  }

  test("replay no-ops; a half-committed batch is invisible, then healed") {
    val state = Fixtures.tempDir("bm25-replay").resolve("state").toString
    val b1 = docs.filter(bucket < 50)
    val b2 = docs.filter(bucket >= 50)
    assert(Bm25Index.appendBatch(spark, state, b1, 0L))
    val after1 = Bm25Index.readState(spark, state).get._4
      .select("n_docs", "t_tok", "last_batch").head().toSeq
    // replay of a committed batch id: skipped, stats unchanged
    assert(!Bm25Index.appendBatch(spark, state, b1, 0L))
    assert(Bm25Index.readState(spark, state).get._4
      .select("n_docs", "t_tok", "last_batch").head().toSeq === after1)
    // crash window: batch 1's appends land but the merged swap never
    // happens — emulate by applying batch 1 then rolling the merged
    // state back to generation 0
    val gen0 = new File(new File(state, "merged"), "CURRENT")
    val v0 = new String(java.nio.file.Files.readAllBytes(gen0.toPath)).trim
    assert(Bm25Index.appendBatch(spark, state, b2, 1L))
    // roll the pointer back (the crash left the old generation live;
    // GC'd dirs mean we simulate by rewriting the pointer BEFORE GC
    // would have run — so rebuild generation 0 instead)
    val state2 = Fixtures.tempDir("bm25-crash").resolve("state").toString
    Bm25Index.appendBatch(spark, state2, b1, 0L)
    // write batch 2's APPENDS only (what a crash before commit leaves)
    val ctoks = Bm25Index.chunkTokens(b2)
    ctoks.groupBy("doc_id", "chunk_id", "token").agg(count(lit(1)).as("tf"))
      .withColumn("tkb", pmod(xxhash64(col("token")), lit(64L)))
      .write.mode("overwrite").partitionBy("tkb")
      .parquet(new File(new File(state2, "postings"), f"v${1L}%020d").getPath)
    ctoks.groupBy("doc_id", "chunk_id", "start", "len").agg(count(lit(1)).as("dl"))
      .write.mode("overwrite")
      .parquet(new File(new File(state2, "dl"), f"v${1L}%020d").getPath)
    // the orphaned appends are invisible: served state == batch-1-only
    val (p2, _, _, st2) = Bm25Index.readState(spark, state2).get
    assert(st2.select("last_batch").head().getLong(0) === 0L)
    assert(p2.select("doc_id").distinct().count() ===
      b1.select("doc_id").distinct().count(),
      "orphaned postings must not be served")
    // the WAL re-delivers batch 1 → replay recomputes + commits
    assert(Bm25Index.appendBatch(spark, state2, b2, 1L))
    val healedStats = Bm25Index.readState(spark, state2).get._4
      .select("n_docs", "t_tok").head()
    val fullStats = Bm25Index.readState(spark, state).get._4
      .select("n_docs", "t_tok").head()
    assert(healedStats.toSeq === fullStats.toSeq, "healed state diverged")
    assert(v0.nonEmpty) // silence unused warning; generation sanity
  }

  private def versionDirs(state: String, sub: String): Seq[String] =
    Option(new File(state, sub).listFiles()).getOrElse(Array.empty).toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("v"))
      .map(_.getName).sorted

  test("compact: N append dirs become one, served content identical, appends continue") {
    val state = Fixtures.tempDir("bm25-compact").resolve("state").toString
    val terms = Seq("spark", "vector", "customer")
    for (i <- 0 until 3)
      assert(Bm25Index.appendBatch(spark, state,
        docs.filter(bucket >= i * 25 && bucket < (i + 1) * 25), i.toLong))
    val before = Bm25Index.retrieve(spark, state, terms)
      .collect().map(_.toString).toSeq
    val (p0, d0, _, _) = Bm25Index.readState(spark, state).get
    val pBefore = p0.collect().map(_.toString).sorted.toSeq
    val dBefore = d0.collect().map(_.toString).sorted.toSeq
    assert(versionDirs(state, "postings").size === 3)
    assert(Bm25Index.compact(spark, state))
    // one generation per family, named at the committed frontier
    assert(versionDirs(state, "postings") === Seq(f"v${2L}%020d"))
    assert(versionDirs(state, "dl") === Seq(f"v${2L}%020d"))
    // served content is identical row-for-row (postings keep tkb)
    val (p1, d1, _, st1) = Bm25Index.readState(spark, state).get
    assert(p1.collect().map(_.toString).sorted.toSeq === pBefore)
    assert(d1.collect().map(_.toString).sorted.toSeq === dBefore)
    assert(st1.select("last_batch").head().getLong(0) === 2L)
    assert(Bm25Index.retrieve(spark, state, terms)
      .collect().map(_.toString).toSeq === before)
    // compacting a compacted index is a no-op
    assert(!Bm25Index.compact(spark, state))
    // appends keep folding on top of the compacted generation, and the
    // final served ranking equals the direct full-corpus computation
    assert(Bm25Index.appendBatch(spark, state, docs.filter(bucket >= 75), 3L))
    assert(versionDirs(state, "postings").size === 2)
    val full = CorpusQueries.ragRetrieve(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(Bm25Index.retrieve(spark, state, terms)
      .collect().map(_.toString).toSeq === full)
  }

  test("compact crash windows heal: mid-swap by readers, stale bak/tmp by writers only") {
    val state = Fixtures.tempDir("bm25-cheal").resolve("state").toString
    Bm25Index.appendBatch(spark, state, docs.filter(bucket < 50), 0L)
    Bm25Index.appendBatch(spark, state, docs.filter(bucket >= 50), 1L)
    val want = Bm25Index.retrieve(spark, state, Seq("spark", "vector"))
      .collect().map(_.toString).toSeq
    // crash between the swap's two renames: live gone, backup present —
    // the ONE repair a reader performs (it must, to see data at all)
    val live = new File(state, "postings")
    val bak = new File(state, "postings.bak")
    assert(live.renameTo(bak))
    assert(Bm25Index.retrieve(spark, state, Seq("spark", "vector"))
      .collect().map(_.toString).toSeq === want, "heal must restore the backup")
    assert(live.exists() && !bak.exists())
    // crash after the swap, before cleanup: stale backup next to live
    val staleBak = new File(state, "dl.bak")
    assert(staleBak.mkdirs())
    // crash mid-rewrite: an orphaned tmp tree
    val orphan = new File(new File(state, "postings.tmp"), "vjunk")
    assert(orphan.mkdirs())
    // a READ leaves both alone (deleting the tmp would race an
    // in-flight compaction on another session — review r12) and still
    // serves the committed generation
    assert(Bm25Index.retrieve(spark, state, Seq("spark", "vector"))
      .collect().map(_.toString).toSeq === want)
    assert(staleBak.exists() && new File(state, "postings.tmp").exists(),
      "a reader must not delete writer-owned .bak/.tmp dirs")
    // the next WRITER entry cleans both
    assert(Bm25Index.compact(spark, state))
    assert(!staleBak.exists() && !new File(state, "postings.tmp").exists())
    assert(Bm25Index.retrieve(spark, state, Seq("spark", "vector"))
      .collect().map(_.toString).toSeq === want)
  }

  test("crash between compact's swap and its manifest re-commit: served, then completed") {
    // ADVICE r12 (high): the old flow destroyed the pre-compaction
    // generations inside the swap BEFORE the manifest re-commit — a
    // crash in between left the committed manifest naming dirs that no
    // longer existed, every read failed the consistency check, and
    // re-running compact threw on the missing paths: wedged with all
    // data present. Now the compacted generation carries a _COMPACTED
    // marker of the folded names; readers serve it in place of the
    // missing manifest entries and the next compact() completes the
    // interrupted manifest commit.
    val state = Fixtures.tempDir("bm25-cwedge").resolve("state").toString
    val terms = Seq("spark", "vector", "customer")
    for (i <- 0 until 3)
      assert(Bm25Index.appendBatch(spark, state,
        docs.filter(bucket >= i * 25 && bucket < (i + 1) * 25), i.toLong))
    val want = Bm25Index.retrieve(spark, state, terms)
      .collect().map(_.toString).toSeq
    val nPost = Bm25Index.readState(spark, state).get._1.count()
    // snapshot merged/, compact, then restore the snapshot — exactly
    // the on-disk state of a crash after both family swaps (and the
    // bak cleanup) but before commitMerged rewrote the manifest
    val merged = new File(state, "merged")
    val saved = new File(state, "merged_saved")
    Fixtures.copyRec(merged, saved)
    assert(Bm25Index.compact(spark, state))
    Fixtures.deleteRec(merged)
    assert(saved.renameTo(merged))
    // the compacted generation carries the folded-dirs marker
    val gen = new File(new File(state, "postings"), f"v${2L}%020d")
    assert(new File(gen, "_COMPACTED").exists())
    // reads serve the FULL corpus through the fallback, not a failure
    // and not a silently smaller index
    val (pC, _, _, _) = Bm25Index.readState(spark, state).get
    assert(pC.count() === nPost, "fallback must serve the whole corpus")
    assert(Bm25Index.retrieve(spark, state, terms)
      .collect().map(_.toString).toSeq === want)
    // re-running compact completes the interrupted manifest commit
    // (true = state changed) instead of throwing on missing paths
    assert(Bm25Index.compact(spark, state))
    assert(!Bm25Index.compact(spark, state), "second run is the no-op")
    assert(Bm25Index.retrieve(spark, state, terms)
      .collect().map(_.toString).toSeq === want)
    // genuine external loss of the compacted generation stays LOUD
    Fixtures.deleteRec(gen)
    val e = intercept[IllegalArgumentException] {
      Bm25Index.readState(spark, state)
    }
    assert(e.getMessage.contains(f"v${2L}%020d") &&
      e.getMessage.contains("removed externally"))
  }

  test("append on a crash-interrupted compaction completes the manifest instead of failing") {
    import spark.implicits._
    // the r13 loud-loss gate at appendBatch entry must NOT fire on the
    // legitimate crash state (manifest names folded into the committed
    // frontier generation) — the append goes through, and its commit
    // IS the manifest completion the interrupted compaction needed
    val state = Fixtures.tempDir("bm25-cappend").resolve("state").toString
    for (i <- 0 until 2)
      assert(Bm25Index.appendBatch(spark, state,
        docs.filter(bucket >= i * 50 && bucket < (i + 1) * 50), i.toLong))
    val nDocs0 = Bm25Index.readState(spark, state).get._4
      .select("n_docs").head().getLong(0)
    val merged = new File(state, "merged")
    val saved = new File(state, "merged_saved")
    Fixtures.copyRec(merged, saved)
    assert(Bm25Index.compact(spark, state))
    Fixtures.deleteRec(merged)
    assert(saved.renameTo(merged)) // manifest now names the folded dirs
    val extra = Seq((900001L, "spark vector extra doc"),
      (900002L, "customer extra doc")).toDF("doc_id", "text")
    assert(Bm25Index.appendBatch(spark, state, extra, 2L))
    val st = Bm25Index.readState(spark, state).get._4.head()
    val pDirs = st.getSeq[String](st.fieldIndex("p_dirs"))
    assert(pDirs.contains(f"v${1L}%020d") && !pDirs.contains(f"v${0L}%020d"),
      s"the new manifest must name the compacted generation, got $pDirs")
    assert(st.getLong(st.fieldIndex("n_docs")) === nDocs0 + 2)
    assert(Bm25Index.retrieve(spark, state,
      Seq("spark", "vector", "customer")).count() > 0)
    // and the state compacts cleanly from there
    assert(Bm25Index.compact(spark, state))
    assert(Bm25Index.retrieve(spark, state,
      Seq("spark", "vector", "customer")).count() > 0)
  }

  test("external loss of the merged stats with live append dirs fails loudly, not as a fresh index") {
    import spark.implicits._
    // merged/ gone while ≥2 committed append generations remain: a
    // read returning None ("no index yet") is total silent amnesia,
    // and the next append would commit BATCH-ONLY df/n_docs/t_tok
    // under a manifest naming ALL surviving dirs — the whole corpus
    // scored against one batch's statistics (review r13)
    val state = Fixtures.tempDir("bm25-mergedloss").resolve("state").toString
    for (i <- 0 until 2)
      assert(Bm25Index.appendBatch(spark, state,
        docs.filter(bucket >= i * 50 && bucket < (i + 1) * 50), i.toLong))
    Fixtures.deleteRec(new File(state, "merged"))
    val e = intercept[IllegalArgumentException] {
      Bm25Index.readState(spark, state)
    }
    assert(e.getMessage.contains("merged state was removed externally"))
    val e2 = intercept[IllegalArgumentException] {
      Bm25Index.appendBatch(spark, state,
        Seq((900001L, "spark extra")).toDF("doc_id", "text"), 2L)
    }
    assert(e2.getMessage.contains("merged state was removed externally"))
    // boundary, pinned: a SINGLE uncompacted generation without merged
    // stats is indistinguishable from the legitimate first-batch crash
    // window (appends land before the stats commit) — reads stay
    // quiet (None) and the replay of THAT batch id is allowed through
    val state2 = Fixtures.tempDir("bm25-mergedloss1").resolve("state").toString
    val b0 = docs.filter(bucket < 50)
    assert(Bm25Index.appendBatch(spark, state2, b0, 0L))
    Fixtures.deleteRec(new File(state2, "merged"))
    assert(Bm25Index.readState(spark, state2).isEmpty)
    assert(Bm25Index.appendBatch(spark, state2, b0, 0L)) // replay completes
    assert(Bm25Index.readState(spark, state2).get._4
      .select("last_batch").head().getLong(0) === 0L)
    // ...but a COMPACTED generation is not excused even under its own
    // batch id (review r13 second pass): it is named at the frontier —
    // the one id the WAL can re-deliver — and carries the union of ALL
    // batches; letting the replay through would overwrite that union
    // with the frontier batch alone and commit batch-only stats
    val state3 = Fixtures.tempDir("bm25-mergedloss2").resolve("state").toString
    for (i <- 0 until 2)
      assert(Bm25Index.appendBatch(spark, state3,
        docs.filter(bucket >= i * 50 && bucket < (i + 1) * 50), i.toLong))
    assert(Bm25Index.compact(spark, state3))
    Fixtures.deleteRec(new File(state3, "merged"))
    val e3 = intercept[IllegalArgumentException] {
      Bm25Index.appendBatch(spark, state3,
        docs.filter(bucket >= 50), 1L) // the frontier id, replayed
    }
    assert(e3.getMessage.contains("merged state was removed externally") &&
      e3.getMessage.contains(f"v${1L}%020d"))
    // the read-side twin already catches this state (compacted ⇒ a
    // merged commit once existed)
    val e4 = intercept[IllegalArgumentException] {
      Bm25Index.readState(spark, state3)
    }
    assert(e4.getMessage.contains("merged state was removed externally"))
  }

  test("zero-token batch: rejected before it can brick the partitioned layout") {
    import spark.implicits._
    val state = Fixtures.tempDir("bm25-zero").resolve("state").toString
    val blank = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    // on an empty index: nothing committed at all
    assert(!Bm25Index.appendBatch(spark, state, blank, 0L))
    assert(Bm25Index.readState(spark, state).isEmpty)
    // on a live index: state byte-identical, the batch id NOT consumed
    assert(Bm25Index.appendBatch(spark, state, docs.filter(bucket < 50), 0L))
    val st0 = Bm25Index.readState(spark, state).get._4
      .select("n_docs", "t_tok", "last_batch").head().toSeq
    assert(!Bm25Index.appendBatch(spark, state, blank, 1L))
    assert(Bm25Index.readState(spark, state).get._4
      .select("n_docs", "t_tok", "last_batch").head().toSeq === st0)
    // ...so the real batch 1 still lands under its id
    assert(Bm25Index.appendBatch(spark, state, docs.filter(bucket >= 50), 1L))
  }

  test("retrieve prunes the dl read to candidate doc-hash buckets at the partition level") {
    val state = Fixtures.tempDir("bm25-dhb").resolve("state").toString
    Bm25Index.appendBatch(spark, state, docs.filter(bucket < 50), 0L)
    Bm25Index.appendBatch(spark, state, docs.filter(bucket >= 50), 1L)
    val res = Bm25Index.retrieve(spark, state, Seq("spark", "vector", "customer"))
    // the dl arm of the executed plan must carry a dhb partition
    // filter — the scan skips non-candidate buckets at the directory
    // level, it does not read-then-discard
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("dhb")),
      s"dl scan is not partition-pruned:\n$plan")
    // and pruning changed nothing: still identical to the direct query
    assert(res.collect().map(_.toString).toSeq ===
      CorpusQueries.ragRetrieve(spark, sfDir).collect().map(_.toString).toSeq)
  }

  test("externally GC'd append dirs fail loudly, not as silently-empty results") {
    val state = Fixtures.tempDir("bm25-gc").resolve("state").toString
    Bm25Index.appendBatch(spark, state, docs.filter(bucket < 50), 0L)
    def nuke(sub: String): Unit = {
      val t = new File(sub)
      Fixtures.deleteRec(if (t.isAbsolute) t else new File(state, sub))
    }
    // PARTIAL loss first: merged manifest expects both batches'
    // dirs; deleting only batch 0's postings dir must fail naming the
    // missing dir — the listing-based check caught only TOTAL loss
    // and would have served half the corpus against full-corpus
    // df/N/T (review r12)
    Bm25Index.appendBatch(spark, state, docs.filter(bucket >= 50), 1L)
    nuke(new File(state, "postings") + f"/v${0L}%020d")
    val ePartial = intercept[IllegalArgumentException] {
      Bm25Index.readState(spark, state)
    }
    assert(ePartial.getMessage.contains(f"v${0L}%020d") &&
      ePartial.getMessage.contains("removed externally"))
    // the APPEND path must fail the same way (review r13): its commit
    // rebuilds the manifest from the on-disk listing, so an append
    // here would bake the hole into a fresh manifest whose stats
    // still count the lost docs — wrong rankings forever after, with
    // every later read passing the manifest check
    val eAppend = intercept[IllegalArgumentException] {
      Bm25Index.appendBatch(spark, state, docs.filter(bucket < 10), 2L)
    }
    assert(eAppend.getMessage.contains(f"v${0L}%020d") &&
      eAppend.getMessage.contains("removed externally"))
    // TOTAL loss: same contract
    nuke("postings"); nuke("dl")
    val e = intercept[IllegalArgumentException] {
      Bm25Index.readState(spark, state)
    }
    assert(e.getMessage.contains("missing") &&
      e.getMessage.contains("removed externally"))
    val e2 = intercept[IllegalArgumentException] {
      Bm25Index.retrieve(spark, state, Seq("spark")).count()
    }
    assert(e2.getMessage.contains("rebuild"))
  }

  test("pre-dhb dl generations read via back-compat and compact() migrates them") {
    val state = Fixtures.tempDir("bm25-predhb").resolve("state").toString
    Bm25Index.appendBatch(spark, state, docs.filter(bucket < 50), 0L)
    Bm25Index.appendBatch(spark, state, docs.filter(bucket >= 50), 1L)
    val want = Bm25Index.retrieve(spark, state, Seq("spark", "vector", "customer"))
      .collect().map(_.toString).toSeq
    // rewrite both dl generations the way the pre-r12 layout wrote
    // them: unpartitioned, no dhb column
    for (v <- Seq(0L, 1L)) {
      val d = new File(new File(state, "dl"), f"v$v%020d").getPath
      val old = spark.read.parquet(d)
        .select("doc_id", "chunk_id", "start", "len", "dl")
        .localCheckpoint(true)
      Fixtures.deleteRec(new File(d))
      old.write.mode("overwrite").parquet(d)
    }
    // reads synthesize dhb (no partition pruning on these dirs, but
    // results identical — a stored index from the previous layout is
    // NOT bricked by the upgrade)
    assert(Bm25Index.retrieve(spark, state, Seq("spark", "vector", "customer"))
      .collect().map(_.toString).toSeq === want)
    // compaction migrates to the bucketed layout
    assert(Bm25Index.compact(spark, state))
    val gen = new File(new File(state, "dl"), f"v${1L}%020d")
    assert(gen.listFiles().exists(_.getName.startsWith("dhb=")),
      "compact must rewrite pre-dhb dl into the bucketed layout")
    assert(Bm25Index.retrieve(spark, state, Seq("spark", "vector", "customer"))
      .collect().map(_.toString).toSeq === want)
  }

  test("pointer mode: family compaction publishes via one PTR rewrite per " +
      "family; retrieval identical to rename mode; a crash before the " +
      "manifest re-commit serves through the fallback; the concurrency " +
      "guard discards only the staged generations") {
    // VERDICT r15 #1: the object-store-safe swap mode (the
    // StreamingIvfSpec pointer-mode template) adopted for the BM25
    // family stores — with it, NO directory rename anywhere in this
    // index is load-bearing. A rename-mode TWIN is fed the same
    // batches so mode transparency is checked at every step.
    import spark.implicits._
    val baseDir = Fixtures.tempDir("bm25-ptr")
    val state = baseDir.resolve("state").toString
    val twin = baseDir.resolve("twin").toString // rename mode
    val terms = Seq("spark", "vector", "customer")
    Bm25Index.enablePointerMode(spark, state)
    for (i <- 0 until 3; st <- Seq(state, twin))
      assert(Bm25Index.appendBatch(spark, st,
        docs.filter(bucket >= i * 25 && bucket < (i + 1) * 25), i.toLong))
    def ptrOf(sub: String): String = java.nio.file.Files.readString(
      new File(new File(state, sub), "PTR").toPath).trim
    def genDirs(sub: String, g: String): Seq[String] =
      Option(new File(new File(state, sub), g).list()).getOrElse(Array.empty)
        .filter(_.startsWith("v")).sorted.toSeq
    def serve(st: String): Seq[String] =
      Bm25Index.retrieve(spark, st, terms).collect().map(_.toString).toSeq
    // appends land inside the g0 generation of both families
    assert(ptrOf("postings") === "g0" && ptrOf("dl") === "g0")
    assert(genDirs("postings", "g0") === (0L to 2L).map(i => f"v$i%020d"))
    val want = serve(twin)
    assert(serve(state) === want, "pointer mode must be serving-transparent")
    // a stale partial target from a crashed compaction is invisible
    // (readers follow PTR) and falls to the next compact entry's GC
    assert(new File(new File(new File(state, "postings"), "g1"), "junk").mkdirs())
    assert(serve(state) === want)
    // compact both modes: pointer mode publishes each family with ONE
    // atomic PTR rewrite; the superseded g0 is KEPT (in-flight-reader
    // grace window) and falls to the next writer-entry GC
    assert(Bm25Index.compact(spark, state))
    assert(Bm25Index.compact(spark, twin))
    assert(ptrOf("postings") === "g1" && ptrOf("dl") === "g1")
    assert(new File(new File(state, "postings"), "g0").exists(),
      "the superseded generation must survive the swap (reader grace window)")
    assert(genDirs("postings", "g1") === Seq(f"v${2L}%020d"))
    assert(genDirs("dl", "g1") === Seq(f"v${2L}%020d"))
    assert(serve(state) === serve(twin))
    val st1 = Bm25Index.readState(spark, state).get._4.head()
    assert(st1.getSeq[String](st1.fieldIndex("p_dirs")) === Seq(f"v${2L}%020d"),
      "the manifest must name the compacted generation")
    // appends continue into the published generation; replays no-op
    for (st <- Seq(state, twin))
      assert(Bm25Index.appendBatch(spark, st, docs.filter(bucket >= 75), 3L))
    assert(!Bm25Index.appendBatch(spark, state, docs.filter(bucket >= 75), 3L))
    assert(genDirs("postings", "g1") === (2L to 3L).map(i => f"v$i%020d"))
    val full = serve(twin)
    assert(serve(state) === full)
    // crash between the family PTR swaps and the manifest re-commit
    // (the bm25-cwedge drill in pointer mode): snapshot merged/,
    // compact, restore — reads serve the full corpus via the
    // folded-dirs fallback, and the next compact completes the
    // interrupted manifest commit instead of wedging
    val merged = new File(state, "merged")
    val saved = new File(state, "merged_saved")
    Fixtures.copyRec(merged, saved)
    assert(Bm25Index.compact(spark, state))
    Fixtures.deleteRec(merged)
    assert(saved.renameTo(merged))
    assert(ptrOf("postings") === "g2")
    assert(serve(state) === full, "fallback must serve the whole corpus")
    assert(Bm25Index.compact(spark, state), "completion commit")
    assert(!Bm25Index.compact(spark, state), "then the no-op")
    assert(serve(state) === full)
    // the concurrency guard in pointer mode: the abort discards ONLY
    // the staged target generations; neither family PTR moves; the
    // concurrent batch — its v-dirs AND its merged-pointer move —
    // survives intact
    assert(Bm25Index.appendBatch(spark, state,
      Seq((900001L, "spark vector pointer doc")).toDF("doc_id", "text"), 4L))
    val e = intercept[RuntimeException] {
      Bm25Index.compactImpl(spark, state, () =>
        assert(Bm25Index.appendBatch(spark, state,
          Seq((900002L, "customer concurrent doc")).toDF("doc_id", "text"), 5L)))
    }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    assert(ptrOf("postings") === "g2" && ptrOf("dl") === "g2")
    assert(!new File(new File(state, "postings"), "g3").exists(),
      "the aborted target generation must be discarded")
    val st2 = Bm25Index.readState(spark, state).get._4.head()
    assert(st2.getLong(st2.fieldIndex("last_batch")) === 5L,
      "the concurrent batch's manifest commit must survive the abort")
    // the next clean compaction folds everything and advances to g3,
    // leaving g2 as the new grace window and GC'ing everything older
    assert(Bm25Index.compact(spark, state))
    assert(ptrOf("postings") === "g3" && ptrOf("dl") === "g3")
    assert(genDirs("postings", "g3") === Seq(f"v${5L}%020d"))
    assert(new File(new File(state, "postings"), "g2").exists(),
      "the superseded generation must survive the swap (reader grace window)")
    assert(!new File(new File(state, "postings"), "g1").exists() &&
      !new File(new File(state, "postings"), "g0").exists(),
      "older generations must have fallen to the writer-entry GC")
    // still serving the union of every applied batch
    assert(Bm25Index.retrieve(spark, state, terms).count() > 0)
    // converting a LIVE rename-mode index in place is refused loudly
    val e2 = intercept[IllegalArgumentException] {
      Bm25Index.enablePointerMode(spark, twin)
    }
    assert(e2.getMessage.contains("VIRGIN"), e2.getMessage)
  }

  test("compact: a concurrent batch between listing and swap aborts loudly; " +
      "the batch's dirs, applog... pointer move survive; the next clean " +
      "compact folds it") {
    // VERDICT r14 #1 (the Compactor guard ported to the BM25 store):
    // a concurrent appendBatch commits postings/dl v-dirs AND moves
    // the merged CURRENT pointer — the family swaps would destroy the
    // dirs and the completion re-commit would clobber the pointer (a
    // lost manifest update). Injected through the pre-swap seam.
    val state = Fixtures.tempDir("bm25-ccg").resolve("state").toString
    val terms = Seq("spark", "vector", "customer")
    for (i <- 0 until 2)
      assert(Bm25Index.appendBatch(spark, state,
        docs.filter(bucket >= i * 25 && bucket < (i + 1) * 25), i.toLong))
    val e = intercept[RuntimeException] {
      Bm25Index.compactImpl(spark, state, () => {
        assert(Bm25Index.appendBatch(spark, state,
          docs.filter(bucket >= 50 && bucket < 75), 2L))
      })
    }
    assert(e.getMessage.contains("concurrent writer") &&
      e.getMessage.contains(f"v${2L}%020d"), e.getMessage)
    // live intact: three generations per family, the concurrent
    // batch's pointer move preserved, no staged rewrite left behind
    assert(versionDirs(state, "postings") === (0L to 2L).map(i => f"v$i%020d"))
    assert(versionDirs(state, "dl") === (0L to 2L).map(i => f"v$i%020d"))
    assert(!new File(state, "postings.tmp").exists() &&
      !new File(state, "dl.tmp").exists(),
      "the aborted rewrites must be discarded")
    val (_, _, _, st) = Bm25Index.readState(spark, state).get
    assert(st.select("last_batch").head().getLong(0) === 2L,
      "the concurrent batch's manifest commit must survive the abort")
    // nothing lost: served ranking covers all three batches
    val before = Bm25Index.retrieve(spark, state, terms)
      .collect().map(_.toString).toSeq
    // the next clean compaction folds all three
    assert(Bm25Index.compact(spark, state))
    assert(versionDirs(state, "postings") === Seq(f"v${2L}%020d"))
    assert(Bm25Index.retrieve(spark, state, terms)
      .collect().map(_.toString).toSeq === before)
  }

  test("randomized append/compact/crash/loss walk: served ranking always equals " +
      "a plain twin fed the same batches, or fails loudly naming the loss") {
    bm25FuzzWalk(ptrMode = false)
  }

  test("randomized append/compact/crash/loss walk in POINTER mode: same walk, " +
      "same seed — crash states are the pointer-mode ones (stale unpublished " +
      "family targets, kept-predecessor grace windows, entry GC)") {
    bm25FuzzWalk(ptrMode = true)
  }

  test("randomized walk with a MID-WALK in-place rename->pointer migration " +
      "at a SEED-DERIVED step: served ranking stays equal to the rename-mode " +
      "twin across the flip of both families; pointer crash states compose " +
      "after it") {
    // VERDICT r16 #1: the migration composed into the hardest state
    // machine (two families + the merged stats store) — rename-mode
    // states first, the in-place flip mid-walk against an unmigrated
    // twin, pointer-mode states over the migrated store after. The
    // step is drawn from the walk seed (VERDICT r17 #5; the r17
    // one-off probe at step 20 ran green and was reverted) so rotating
    // the seed rotates the flip point continuously, and the fired-set
    // coverage check gains a migration case.
    bm25FuzzWalk(ptrMode = false, migrate = true)
  }

  /** The composition fuzz the vector indexes already have
    * (StreamingIvfSpec/StreamingIvfPqSpec), applied to the BM25 state
    * machine — harder here because TWO append families plus the
    * merged df/stats store must stay mutually consistent through
    * every interleaving. The directed cases above pin each crash
    * window once; 30 seeded steps interleave appends, crashed
    * appends (partial family v-dirs), frontier replays, compactions
    * (pointer mode: a third of them over a planted stale target),
    * the between-swaps-and-manifest-recommit crash, and move-aside
    * external loss of random committed family generations — asserting
    * after EVERY step that the served ranking is row-identical to a
    * plain rename-mode TWIN fed the same batches (mode AND state-
    * machine transparency in one gate), and that an unrestored loss
    * is loud on read, append, and compact, naming the missing dir. */
  private def bm25FuzzWalk(ptrMode: Boolean, migrate: Boolean = false): Unit = {
    val base = Fixtures.tempDir(
      if (migrate) "bm25-fuzz-mig"
      else if (ptrMode) "bm25-fuzz-ptr" else "bm25-fuzz")
    val state = base.resolve("state").toString
    val twin = base.resolve("twin").toString
    val terms = Seq("spark", "vector", "customer")
    if (ptrMode) Bm25Index.enablePointerMode(spark, state)
    // the swap mode can flip MID-WALK (the migrateAt step); every
    // mode-sensitive branch reads this var, not the entry parameter
    var ptr = ptrMode
    // the walk's file-level drills target each family's LIVE tree —
    // the family dir itself in rename mode, the PTR-named generation
    // in pointer mode (re-resolved each use: compactions move it)
    def fam(sub: String): File = {
      val f = new File(state, sub)
      if (ptr) new File(f, java.nio.file.Files.readString(
        new File(f, "PTR").toPath).trim)
      else f
    }
    // width-2 bucket slices: 50 disjoint 10-doc batches (sf0.001 has
    // exactly 5 docs in every bucket), more than the walk's
    // worst-case append count, so the union stays duplicate-free by
    // construction; batch id == slice id keeps the WAL frontier
    // monotone
    def batchOf(id: Long) =
      docs.filter(bucket >= id * 2 && bucket < (id + 1) * 2)
    def checkServed(): Unit = {
      val got = Bm25Index.retrieve(spark, state, terms)
        .collect().map(_.toString).toSeq
      val want = Bm25Index.retrieve(spark, twin, terms)
        .collect().map(_.toString).toSeq
      assert(got === want, "served ranking diverges from the plain twin")
    }
    def appendBoth(id: Long): Unit = {
      assert(Bm25Index.appendBatch(spark, state, batchOf(id), id))
      assert(Bm25Index.appendBatch(spark, twin, batchOf(id), id))
    }
    appendBoth(0L)
    var nextId = 1L
    val rnd = new scala.util.Random(20260816)
    // seed-derived migration step (VERDICT r17 #5): [2, 29], rotates
    // with the walk seed — see StreamingIvfSpec.fuzzWalk
    val migrateAt = if (migrate) 2 + rnd.nextInt(28) else -1
    // coverage self-check: a later seed/step change must not silently
    // hollow the walk into one that never fires a drill — case 6 is
    // "the migration fired" (VERDICT r17 #5)
    val fired = scala.collection.mutable.Set.empty[Int]
    for (step <- 1 to 30) {
      if (step == migrateAt) {
        // in-place rename->pointer migration mid-walk (VERDICT r16 #1):
        // both family trees ride into their g0 generations; the served
        // ranking must not move against the still-rename-mode TWIN,
        // and the remaining steps run the pointer-mode states over the
        // migrated store
        Bm25Index.migrateToPointerMode(spark, state)
        ptr = true
        fired += 6
        for (sub <- Seq("postings", "dl"))
          assert(new File(new File(state, sub), "PTRMODE").exists() &&
            fam(sub).getName == "g0", s"step $step: migration did not publish")
        checkServed()
      }
      val c = rnd.nextInt(6)
      fired += c
      c match {
        case 0 => // plain append
          appendBoth(nextId); nextId += 1
        case 1 => // crashed append: a partial v-dir in ONE family (no
                  // merged commit) is invisible, then the WAL replay
                  // of the same id completes it
          val sub = if (rnd.nextBoolean()) "postings" else "dl"
          val d = new File(fam(sub), f"v$nextId%020d")
          d.mkdirs()
          assert(new File(d, "part-junk").createNewFile())
          checkServed() // the partial is invisible
          appendBoth(nextId); nextId += 1
        case 2 => // replay of the frontier id: no-op (the only id the
                  // WAL can re-deliver)
          assert(!Bm25Index.appendBatch(spark, state,
            batchOf(nextId - 1), nextId - 1))
        case 3 => // compaction. Pointer mode: a third of the time,
                  // first plant a crashed earlier compaction's partial
                  // unpublished target in one family — invisible to
                  // reads, clobbered by the entry GC
          if (ptr && rnd.nextInt(3) == 0) {
            val sub = if (rnd.nextBoolean()) "postings" else "dl"
            val next = new File(new File(state, sub),
              "g" + (fam(sub).getName.drop(1).toLong + 1))
            assert(new File(next, "junk-partial").mkdirs())
            checkServed() // the stale target is invisible
          }
          Bm25Index.compact(spark, state)
        case 4 => // external loss of a RANDOM committed generation in
                  // a RANDOM family: loud everywhere (read, append,
                  // compact) naming it; restore recovers
          val sub = if (rnd.nextBoolean()) "postings" else "dl"
          val gens = Option(fam(sub).listFiles()).getOrElse(Array.empty)
            .filter(f => f.isDirectory && f.getName.startsWith("v"))
          val victim = gens(rnd.nextInt(gens.length))
          val aside = new File(base.toFile, s"aside-$step")
          assert(victim.renameTo(aside))
          for (op <- Seq(
              () => Bm25Index.readState(spark, state),
              () => Bm25Index.appendBatch(spark, state, batchOf(nextId), nextId),
              () => Bm25Index.compact(spark, state))) {
            val e = intercept[IllegalArgumentException] { op() }
            assert(e.getMessage.contains(victim.getName) &&
              e.getMessage.contains("removed externally"),
              s"step $step: loss of $sub/${victim.getName} not loud: ${e.getMessage}")
          }
          assert(aside.renameTo(victim))
        case 5 => // crash between the family swaps and the manifest
                  // re-commit: the stale manifest's missing names fall
                  // inside the frontier generation's _COMPACTED list,
                  // so reads serve through the fallback and the next
                  // compact completes the interrupted commit
          val merged = new File(state, "merged")
          val saved = new File(base.toFile, s"msave-$step")
          Fixtures.copyRec(merged, saved)
          if (Bm25Index.compact(spark, state)) {
            Fixtures.deleteRec(merged)
            assert(saved.renameTo(merged))
            checkServed() // served via the fallback
            assert(Bm25Index.compact(spark, state), "completion commit")
          } else Fixtures.deleteRec(saved)
      }
      checkServed()
    }
    val want = Set(0, 1, 2, 3, 4, 5) ++ (if (migrate) Set(6) else Set.empty)
    assert(fired === want,
      s"the seed must exercise every walk case (6 = migration fired, " +
        s"derived step $migrateAt), got $fired — rotate it")
    // tail composition: one clean compact + append on whatever the
    // walk left, then the pointer-mode grace-window/GC contract on
    // the final state (rename mode's tail windows are the directed
    // crash-heal cases above)
    if (Bm25Index.compact(spark, state)) checkServed()
    appendBoth(nextId)
    checkServed()
    if (ptr) {
      val liveGen = fam("postings").getName
      assert(Bm25Index.compact(spark, state))
      assert(new File(new File(state, "postings"), liveGen).exists(),
        s"$liveGen must survive the swap as the reader grace window")
      assert(fam("postings").getName != liveGen,
        "the swap must publish a new generation")
      checkServed()
    }
  }
}
