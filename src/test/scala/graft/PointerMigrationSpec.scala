package graft

import java.io.File

import scala.util.Random

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Bm25Index
import graft.sink.Compactor
import graft.streaming.{StreamingIvf, StreamingIvfPq}
import graft.util.StateFs

/** In-place rename→pointer migration (VERDICT r16 #1): a LIVE
  * rename-mode store adopts the object-store-safe pointer layout
  * without a rebuild, and a crash at ANY seam leaves either the
  * untouched rename-mode store or a fully-published pointer one —
  * pinned first on the raw [[StateFs]] protocol (crash seams,
  * concurrent-writer abort, refusal matrix, GC completion), then as
  * served-content twins per store: Bm25Index's two families,
  * StreamingIvf lists, StreamingIvfPq codes, and a Compactor table
  * (whose plain-parquet read path additionally needs the staged-junk
  * tolerance the index stores get for free from their v-dir
  * filters). */
class PointerMigrationSpec extends SparkTestBase {
  import spark.implicits._

  private def fsOf(p: Path) = StateFs.fs(spark, p)

  private def put(f: File, s: String): Unit = {
    f.getParentFile.mkdirs()
    val w = new java.io.FileWriter(f)
    try w.write(s) finally w.close()
  }

  // ---- the raw protocol ----

  test("core: migration stages a copy as g0, flips the mode with one marker " +
      "create, GCs the old layout, and is idempotent") {
    val dir = new File(Fixtures.tempDir("mig-core").resolve("st").toString)
    put(new File(dir, "v1/data.txt"), "a")
    put(new File(dir, "v1/_SUCCESS"), "")
    put(new File(dir, "MANIFEST"), "v1")
    val p = new Path(dir.toString)
    val f = fsOf(p)
    StateFs.migrateToPointerMode(spark, p)
    assert(StateFs.pointerMode(f, p))
    assert(StateFs.resolveLive(f, p).getName === "g0")
    assert(new File(dir, "g0/v1/data.txt").exists())
    assert(new File(dir, "g0/MANIFEST").exists())
    assert(!new File(dir, "v1").exists() && !new File(dir, "MANIFEST").exists(),
      "the superseded rename-mode layout must be collected")
    assert(!new File(dir, "_MIGRATING").exists())
    StateFs.migrateToPointerMode(spark, p) // idempotent
    assert(new File(dir, "g0/v1/data.txt").exists())
  }

  test("core: a crash at either staging seam leaves the UNTOUCHED rename-mode " +
      "store; a rerun completes the migration") {
    for (seam <- Seq("stage", "ptr")) {
      val dir = new File(
        Fixtures.tempDir(s"mig-crash-$seam").resolve("st").toString)
      put(new File(dir, "v1/data.txt"), "a")
      val p = new Path(dir.toString)
      val f = fsOf(p)
      val e = intercept[RuntimeException] {
        StateFs.migrateToPointerModeImpl(spark, p,
          afterStage = () => if (seam == "stage") sys.error("injected crash"),
          afterPtr = () => if (seam == "ptr") sys.error("injected crash"))
      }
      assert(e.getMessage.contains("injected crash"))
      // before the PTRMODE create the store still reads as rename mode
      // and the live tree is byte-untouched (copy-only staging)
      assert(!StateFs.pointerMode(f, p))
      assert(StateFs.resolveLive(f, p) === p)
      assert(new File(dir, "v1/data.txt").exists())
      StateFs.migrateToPointerMode(spark, p) // rerun completes
      assert(StateFs.pointerMode(f, p))
      assert(new File(dir, "g0/v1/data.txt").exists())
      assert(!new File(dir, "v1").exists())
    }
  }

  test("core: a crash during the final GC is finished by the next writer " +
      "entry's gcStaleGens, behind the _MIGRATING sentinel") {
    val dir = new File(Fixtures.tempDir("mig-gc").resolve("st").toString)
    put(new File(dir, "v1/data.txt"), "a")
    val p = new Path(dir.toString)
    val f = fsOf(p)
    StateFs.migrateToPointerMode(spark, p)
    // re-plant the crashed-GC state: an uncollected old-layout child
    // plus an EMPTY sentinel — the pre-r19 layout (no persisted
    // snapshot), which is also the operator's documented acceptance of
    // one unguarded finish; the snapshot-guarded finisher is pinned by
    // the dedicated cases below (VERDICT r18 #3)
    put(new File(dir, "v1/data.txt"), "a")
    put(new File(dir, "oldfile.parquet"), "x")
    put(new File(dir, "_MIGRATING"), "")
    StateFs.gcStaleGens(f, p, "g0")
    assert(!new File(dir, "v1").exists() &&
      !new File(dir, "oldfile.parquet").exists() &&
      !new File(dir, "_MIGRATING").exists(),
      "writer-entry GC must finish a crashed migration's cleanup")
    assert(new File(dir, "g0/v1/data.txt").exists() &&
      new File(dir, "PTR").exists() && new File(dir, "PTRMODE").exists(),
      "the published pointer layout must survive that GC")
  }

  test("core: a concurrent writer mid-copy aborts loudly with the staging " +
      "discarded and the rename-mode store (the write included) intact") {
    val dir = new File(Fixtures.tempDir("mig-conc").resolve("st").toString)
    put(new File(dir, "v1/data.txt"), "a")
    val p = new Path(dir.toString)
    val f = fsOf(p)
    val e = intercept[RuntimeException] {
      StateFs.migrateToPointerModeImpl(spark, p,
        afterStage = () => put(new File(dir, "v2/data.txt"), "b"),
        afterPtr = () => ())
    }
    assert(e.getMessage.contains("changed during the staging copy"))
    assert(!StateFs.pointerMode(f, p))
    assert(!new File(dir, "g0").exists() && !new File(dir, "PTR").exists() &&
      !new File(dir, "_MIGRATING").exists(), "staging must be discarded whole")
    assert(new File(dir, "v1/data.txt").exists() &&
      new File(dir, "v2/data.txt").exists())
    StateFs.migrateToPointerMode(spark, p) // clean rerun carries the write
    assert(new File(dir, "g0/v1/data.txt").exists() &&
      new File(dir, "g0/v2/data.txt").exists())
  }

  test("core: a writer landing between the pre-flip re-check and the mode " +
      "flip is caught by the POST-flip re-check — GC skipped, BOTH layouts " +
      "preserved behind _MIGRATING for reconciliation (ADVICE r17)") {
    val dir = new File(Fixtures.tempDir("mig-postflip").resolve("st").toString)
    put(new File(dir, "v1/data.txt"), "a")
    val p = new Path(dir.toString)
    val f = fsOf(p)
    val e = intercept[RuntimeException] {
      StateFs.migrateToPointerModeImpl(spark, p,
        afterStage = () => (), afterPtr = () => (),
        afterFlip = () => put(new File(dir, "v2/data.txt"), "b"))
    }
    assert(e.getMessage.contains("GC skipped"), e.getMessage)
    // the pointer store is published and servable...
    assert(StateFs.pointerMode(f, p))
    assert(StateFs.resolveLive(f, p).getName === "g0")
    assert(new File(dir, "g0/v1/data.txt").exists())
    // ...and the orphaned concurrent write is PRESERVED, not GC'd
    // silently — the ADVICE r17 hardening over the r17 behavior
    assert(new File(dir, "v2/data.txt").exists(),
      "the concurrent write must survive behind the sentinel")
    assert(new File(dir, "v1/data.txt").exists())
    assert(new File(dir, "_MIGRATING").exists())
    // after the operator reconciles (here: moves the orphan aside), a
    // rerun finishes the interrupted GC
    assert(new File(dir, "v2/data.txt").delete())
    StateFs.migrateToPointerMode(spark, p)
    assert(!new File(dir, "v1").exists() &&
      !new File(dir, "_MIGRATING").exists())
    assert(new File(dir, "g0/v1/data.txt").exists())
  }

  test("core: a crash BETWEEN the mode flip and the post-flip re-check — the " +
      "former residual (b) — no longer hands an orphaned concurrent write " +
      "to a blind finisher: gcStaleGens re-checks against the snapshot " +
      "persisted in _MIGRATING and REFUSES the GC (VERDICT r18 #3)") {
    val dir = new File(Fixtures.tempDir("mig-finisher").resolve("st").toString)
    put(new File(dir, "v1/data.txt"), "a")
    val p = new Path(dir.toString)
    val f = fsOf(p)
    val e = intercept[RuntimeException] {
      StateFs.migrateToPointerModeImpl(spark, p,
        afterStage = () => (), afterPtr = () => (),
        afterFlip = () => {
          // the blind-window writer, then the crash BEFORE the
          // migration's own post-flip re-check can see it
          put(new File(dir, "v2/data.txt"), "b")
          sys.error("injected crash")
        })
    }
    assert(e.getMessage.contains("injected crash"))
    assert(StateFs.pointerMode(f, p) &&
      new File(dir, "g0/v1/data.txt").exists(),
      "the pointer store is published and servable")
    // the next writer entry's gcStaleGens IS the finisher: it must
    // refuse loudly and collect nothing — pre-r19 it deleted v2 here
    val g = intercept[RuntimeException] { StateFs.gcStaleGens(f, p, "g0") }
    assert(g.getMessage.contains("migration finish refused"), g.getMessage)
    assert(g.getMessage.contains("v2/data.txt"), g.getMessage)
    assert(new File(dir, "v2/data.txt").exists(),
      "the orphaned write must survive the refused finisher")
    assert(new File(dir, "v1/data.txt").exists() &&
      new File(dir, "_MIGRATING").exists())
    // the natural operator reaction — rerunning the migration (ADVICE
    // r18) — routes through the same guard: refuse, don't collect
    val r = intercept[RuntimeException] {
      StateFs.migrateToPointerMode(spark, p)
    }
    assert(r.getMessage.contains("migration finish refused"))
    assert(new File(dir, "v2/data.txt").exists())
    // reconcile per the error text: copy the orphan aside (modeled),
    // remove it so the layout matches the staged snapshot — the next
    // writer entry then finishes the interrupted GC
    assert(new File(dir, "v2/data.txt").delete())
    assert(new File(dir, "v2").delete())
    StateFs.gcStaleGens(f, p, "g0")
    assert(!new File(dir, "v1").exists() &&
      !new File(dir, "_MIGRATING").exists())
    assert(new File(dir, "g0/v1/data.txt").exists())
  }

  test("core: an in-place rewrite in the blind window makes the snapshot " +
      "unmatchable — the finisher refuses until the operator truncates the " +
      "sentinel to empty, the documented unguarded-finish acceptance") {
    val dir = new File(Fixtures.tempDir("mig-unmatch").resolve("st").toString)
    put(new File(dir, "v1/data.txt"), "a")
    val p = new Path(dir.toString)
    val f = fsOf(p)
    intercept[RuntimeException] {
      StateFs.migrateToPointerModeImpl(spark, p,
        afterStage = () => (), afterPtr = () => (),
        afterFlip = () => {
          put(new File(dir, "v1/data.txt"), "rewritten-longer") // len moves
          sys.error("injected crash")
        })
    }
    val g = intercept[RuntimeException] { StateFs.gcStaleGens(f, p, "g0") }
    assert(g.getMessage.contains("migration finish refused"))
    assert(g.getMessage.contains("truncate"), "the unblock must be named")
    // the orphaned rewrite cannot be un-rewritten: copy it aside, then
    // accept one unguarded finish by truncating the sentinel
    put(new File(dir, "_MIGRATING"), "")
    StateFs.gcStaleGens(f, p, "g0")
    assert(!new File(dir, "v1").exists() &&
      !new File(dir, "_MIGRATING").exists())
    assert(new File(dir, "g0/v1/data.txt").exists())
  }

  test("core: refusal matrix — missing base, unresolved .bak, and foreign " +
      "children under reserved pointer-layout names") {
    val base = Fixtures.tempDir("mig-refuse")
    val e0 = intercept[IllegalArgumentException] {
      StateFs.migrateToPointerMode(spark, new Path(base.resolve("nope").toString))
    }
    assert(e0.getMessage.contains("enablePointerMode"))
    val d1 = new File(base.resolve("bak/st").toString)
    put(new File(d1, "v1/data.txt"), "a")
    put(new File(base.resolve("bak/st.bak/v0/data.txt").toString), "old")
    val e1 = intercept[IllegalArgumentException] {
      StateFs.migrateToPointerMode(spark, new Path(d1.toString))
    }
    assert(e1.getMessage.contains("writer-entry repair"))
    val d2 = new File(base.resolve("foreign/st").toString)
    put(new File(d2, "v1/data.txt"), "a")
    assert(new File(d2, "g0").mkdirs()) // reserved name, no sentinel
    val e2 = intercept[IllegalArgumentException] {
      StateFs.migrateToPointerMode(spark, new Path(d2.toString))
    }
    assert(e2.getMessage.contains("reserved"))
  }

  test("core: gcStaleGens retainPredecessors deepens the reader grace window " +
      "(the pointerSwap contract knob); default keeps the one-compaction " +
      "contract") {
    val dir = new File(Fixtures.tempDir("mig-retain").resolve("st").toString)
    for (g <- 0 to 4) put(new File(dir, s"g$g/data.txt"), s"g$g")
    put(new File(dir, "PTRMODE"), "")
    put(new File(dir, "PTR"), "g3")
    val p = new Path(dir.toString)
    val f = fsOf(p)
    StateFs.gcStaleGens(f, p, "g3", retainPredecessors = 2)
    assert(new File(dir, "g3").exists() && new File(dir, "g2").exists() &&
      new File(dir, "g1").exists(), "the 2 newest predecessors must survive")
    assert(!new File(dir, "g0").exists(), "older predecessors are stale")
    assert(!new File(dir, "g4").exists(),
      "a crashed target ABOVE the live generation is always collected")
    StateFs.gcStaleGens(f, p, "g3")
    assert(!new File(dir, "g1").exists() && !new File(dir, "g2").exists() &&
      new File(dir, "g3").exists(), "default retention keeps only the live gen")
  }

  // ---- store twins: served content identical across the migration,
  //      and the store keeps working (appends + compactions) after it ----

  private def bm25Docs =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
  private val bm25Bucket =
    pmod(pmod(col("doc_id"), lit(100000000L)) * lit(2654435761L), lit(100L))

  test("bm25: a live two-family index migrates in place — served ranking " +
      "identical to the rename-mode twin before and after, appends and " +
      "compaction continue in pointer mode") {
    val base = Fixtures.tempDir("mig-bm25")
    val state = base.resolve("state").toString
    val twin = base.resolve("twin").toString
    val terms = Seq("spark", "vector", "customer")
    def served(s: String) =
      Bm25Index.retrieve(spark, s, terms).collect().map(_.toString).toSeq
    def appendBoth(id: Long, lo: Int, hi: Int): Unit =
      for (s <- Seq(state, twin))
        assert(Bm25Index.appendBatch(spark, s,
          bm25Docs.filter(bm25Bucket >= lo && bm25Bucket < hi), id))
    appendBoth(0L, 0, 40)
    appendBoth(1L, 40, 70)
    // some compacted history pre-migration, so g0 carries a _COMPACTED
    // generation + manifest state too
    assert(Bm25Index.compact(spark, state))
    assert(Bm25Index.compact(spark, twin))
    Bm25Index.migrateToPointerMode(spark, state)
    for (sub <- Seq("postings", "dl")) {
      assert(new File(new File(state, sub), "PTRMODE").exists())
      assert(java.nio.file.Files.readString(
        new File(new File(state, sub), "PTR").toPath).trim === "g0")
    }
    assert(served(state) === served(twin), "migration changed the ranking")
    appendBoth(2L, 70, 100)
    assert(served(state) === served(twin))
    assert(Bm25Index.compact(spark, state))
    assert(Bm25Index.compact(spark, twin))
    assert(served(state) === served(twin))
    // the post-migration compaction published via the pointer
    assert(java.nio.file.Files.readString(
      new File(new File(state, "postings"), "PTR").toPath).trim === "g1")
    Bm25Index.migrateToPointerMode(spark, state) // idempotent on pointer mode
    assert(served(state) === served(twin))
  }

  test("bm25: the mixed per-family crash state (postings migrated, dl not) " +
      "serves correctly — swap mode is resolved per family — and a rerun " +
      "completes the flip") {
    val base = Fixtures.tempDir("mig-bm25-mixed")
    val state = base.resolve("state").toString
    val twin = base.resolve("twin").toString
    val terms = Seq("spark", "vector", "customer")
    def served(s: String) =
      Bm25Index.retrieve(spark, s, terms).collect().map(_.toString).toSeq
    for (s <- Seq(state, twin)) {
      assert(Bm25Index.appendBatch(spark, s,
        bm25Docs.filter(bm25Bucket < 50), 0L))
      assert(Bm25Index.appendBatch(spark, s,
        bm25Docs.filter(bm25Bucket >= 50), 1L))
    }
    // the wrapper migrates postings first, dl second — crash between
    // the two is this state, constructed directly
    StateFs.migrateToPointerMode(spark, new Path(new File(state, "postings").toString))
    assert(new File(new File(state, "postings"), "PTRMODE").exists() &&
      !new File(new File(state, "dl"), "PTRMODE").exists())
    assert(served(state) === served(twin),
      "a half-migrated index must serve through per-family resolution")
    // appends and compaction work in the mixed state too
    Bm25Index.migrateToPointerMode(spark, state) // rerun completes dl
    assert(new File(new File(state, "dl"), "PTRMODE").exists())
    assert(served(state) === served(twin))
    assert(Bm25Index.compact(spark, state))
    assert(Bm25Index.compact(spark, twin))
    assert(served(state) === served(twin))
  }

  private lazy val vecCorpus = {
    val rnd = new Random(7)
    (0 until 120).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("ivf: a live lists store migrates in place — assignments identical to " +
      "the rename-mode twin, appends and compaction continue in pointer mode") {
    val base = Fixtures.tempDir("mig-ivf")
    val state = base.resolve("state").toString
    val twin = base.resolve("twin").toString
    def slice(id: Long) =
      vecCorpus.filter($"vec_id" >= id * 30 && $"vec_id" < (id + 1) * 30)
    def assigned(s: String) =
      StreamingIvf.readIndex(spark, s).get._2
        .select("c_id", "cluster").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def appendBoth(id: Long): Unit =
      for (s <- Seq(state, twin))
        assert(StreamingIvf.appendBatch(spark, s, slice(id), 4, id))
    appendBoth(0L); appendBoth(1L)
    StreamingIvf.migrateToPointerMode(spark, state)
    assert(new File(new File(state, "lists"), "PTRMODE").exists())
    assert(assigned(state) === assigned(twin), "migration changed the lists")
    appendBoth(2L)
    assert(assigned(state) === assigned(twin))
    assert(StreamingIvf.compact(spark, state))
    assert(StreamingIvf.compact(spark, twin))
    assert(assigned(state) === assigned(twin))
    assert(java.nio.file.Files.readString(
      new File(new File(state, "lists"), "PTR").toPath).trim === "g1",
      "post-migration compaction must publish via the pointer")
    // the witness files rode into g0 with the tree: the applog/FRONTIER
    // machinery keeps working (a loss drill still fires loudly)
    val live = new File(new File(state, "lists"), "g1")
    val gens = live.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("v"))
    val victim = gens.maxBy(_.getName)
    val aside = new File(base.toFile, "aside")
    // the newest generation is the compacted one (manifest-covered)
    assert(victim.renameTo(aside))
    val e = intercept[Exception] { StreamingIvf.readIndex(spark, state) }
    assert(e.getMessage.contains("removed externally") ||
      e.getMessage.contains(victim.getName))
    assert(aside.renameTo(victim))
    assert(assigned(state) === assigned(twin))
  }

  test("ivfpq: a live codes store migrates in place — codes identical to the " +
      "rename-mode twin, appends and compaction continue in pointer mode") {
    val (kc, m, subLen, kCb) = (8, 4, 4, 16)
    val base = Fixtures.tempDir("mig-ivfpq")
    val state = base.resolve("state").toString
    val twin = base.resolve("twin").toString
    def slice(id: Long) =
      vecCorpus.filter($"vec_id" >= id * 30 && $"vec_id" < (id + 1) * 30)
    def codes(s: String) =
      StreamingIvfPq.readIndex(spark, s).get._3
        .collect().map(_.toString).sorted.toSeq
    def appendBoth(id: Long): Unit =
      for (s <- Seq(state, twin))
        assert(StreamingIvfPq.appendBatch(spark, s, slice(id),
          kc, m, subLen, kCb, id))
    appendBoth(0L); appendBoth(1L)
    StreamingIvfPq.migrateToPointerMode(spark, state)
    assert(new File(new File(state, "codes"), "PTRMODE").exists())
    assert(codes(state) === codes(twin), "migration changed the code table")
    appendBoth(2L)
    assert(codes(state) === codes(twin))
    assert(StreamingIvfPq.compact(spark, state))
    assert(StreamingIvfPq.compact(spark, twin))
    assert(codes(state) === codes(twin))
    assert(java.nio.file.Files.readString(
      new File(new File(state, "codes"), "PTR").toPath).trim === "g1")
  }

  test("compactor: a PARTITIONED table serves through a crashed migration " +
      "(partition dirs survive the staged-junk filter) and migrates whole") {
    val dir = Fixtures.tempDir("mig-part").resolve("t").toString
    Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p")
      .write.partitionBy("p").mode("append").parquet(dir)
    val before = Compactor.read(spark, dir).select("id", "v", "p")
      .collect().map(_.toString).sorted.toSeq
    intercept[RuntimeException] {
      StateFs.migrateToPointerModeImpl(spark, new Path(dir),
        afterStage = () => (), afterPtr = () => sys.error("injected crash"))
    }
    assert(Compactor.read(spark, dir).select("id", "v", "p")
      .collect().map(_.toString).sorted.toSeq === before,
      "the partitioned live table must serve through the crash window " +
        "with its partition columns intact")
    Compactor.migrateToPointerMode(spark, dir)
    assert(Compactor.read(spark, dir).select("id", "v", "p")
      .collect().map(_.toString).sorted.toSeq === before)
    // the Hive layout survived the copy: partition pruning still works
    val pruned = Compactor.read(spark, dir).filter(col("p") === "x")
    assert(pruned.count() === 1)
  }

  test("compactor: a live plain-layout table migrates in place; a crashed " +
      "migration keeps the table served (read/fileCount) while compact " +
      "refuses with the rerun remedy") {
    val dir = Fixtures.tempDir("mig-table").resolve("t").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    val before = Compactor.read(spark, dir).collect().map(_.toString).sorted.toSeq
    val files = Compactor.fileCount(spark, dir)
    // crash AFTER the full staging (worst junk: complete g0 + PTR):
    // the rename-mode table stays served straight through it
    intercept[RuntimeException] {
      StateFs.migrateToPointerModeImpl(spark, new Path(dir),
        afterStage = () => (), afterPtr = () => sys.error("injected crash"))
    }
    assert(Compactor.read(spark, dir).collect().map(_.toString).sorted.toSeq
      === before, "a crashed migration must not change what read serves")
    assert(Compactor.fileCount(spark, dir) === files,
      "fileCount must not count the staged copy")
    val e = intercept[RuntimeException] {
      Compactor.compact(spark, dir, targetRowsPerFile = 1000)
    }
    assert(e.getMessage.contains("migrateToPointerMode"),
      s"compact must refuse with the remedy, got: ${e.getMessage}")
    // rerun completes; the table serves identically in pointer mode
    Compactor.migrateToPointerMode(spark, dir)
    assert(Compactor.read(spark, dir).collect().map(_.toString).sorted.toSeq
      === before)
    assert(Compactor.writeDir(spark, dir).endsWith("g0"))
    // out-of-band appends + pointer-mode compaction continue
    Seq((4L, "d")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(Compactor.writeDir(spark, dir))
    assert(Compactor.compact(spark, dir, targetRowsPerFile = 1000) === 1)
    assert(java.nio.file.Files.readString(
      new java.io.File(dir, "PTR").toPath).trim === "g1")
    assert(Compactor.read(spark, dir).collect().map(_.toString).sorted.toSeq
      === (before :+ "[4,d]").sorted)
    Compactor.migrateToPointerMode(spark, dir) // idempotent
  }
}
