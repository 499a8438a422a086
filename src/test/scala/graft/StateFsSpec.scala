package graft

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import graft.util.StateFs

/** Direct unit coverage of the shared swap/heal primitives — until now
  * they were exercised only THROUGH the operators (Bm25IndexSpec /
  * StreamingIvfSpec / CompactionSpec crash windows). Two things only a
  * direct spec can pin:
  *
  *  1. the Hadoop behavior the race guards are BUILT ON:
  *     `FileSystem.rename(src, existingDstDir)` NESTS src inside dst
  *     instead of failing (verified against hadoop-client 3.4.2 when
  *     the guards were written — if a Hadoop upgrade ever changes
  *     this, the guards' un-nest re-checks become dead code and the
  *     abort contract silently shifts; this spec makes that upgrade
  *     fail loudly here instead);
  *  2. each primitive's contract in isolation, so an operator-spec
  *     failure can be bisected to "operator logic" vs "swap/heal
  *     machinery".
  */
class StateFsSpec extends SparkTestBase {

  private def fsFor(p: Path) = StateFs.fs(spark, p)

  private def mk(p: Path): Path = {
    val fs = fsFor(p)
    fs.mkdirs(p); p
  }

  private def touch(dir: Path, name: String, content: String = ""): Unit = {
    val fs = fsFor(dir)
    val out = fs.create(new Path(dir, name), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  test("ASSUMPTION PIN: Hadoop rename into an existing NON-EMPTY directory NESTS instead of failing") {
    val base = new Path(Fixtures.tempDir("statefs-nest").toString)
    val fs = fsFor(base)
    val src = mk(new Path(base, "src")); touch(src, "f", "x")
    val dst = mk(new Path(base, "dst")); touch(dst, "g", "y")
    // java.io.File.renameTo fails here with ENOTEMPTY; Hadoop
    // "succeeds" by nesting — the exact trap swapIn/healReader re-check
    // for after their renames. The realistic race destinations (a
    // restored live generation, an installed rewrite) are always
    // non-empty, so this is the case the guards protect.
    assert(fs.rename(src, dst), "rename into existing non-empty dir was " +
      "refused — Hadoop semantics changed; revisit the un-nest guards in StateFs")
    assert(!fs.exists(src))
    assert(fs.exists(new Path(dst, "src/f")), "src was not nested inside dst")
    assert(fs.exists(new Path(dst, "g")), "dst's own content was lost")
  }

  test("ASSUMPTION PIN: LOCAL-fs rename onto an existing EMPTY directory REPLACES it") {
    val base = new Path(Fixtures.tempDir("statefs-replace").toString)
    val fs = fsFor(base)
    val src = mk(new Path(base, "src")); touch(src, "f", "x")
    mk(new Path(base, "dst"))
    // POSIX rename(2) over an empty directory succeeds by replacing it
    // — so the nesting guard sees nothing for an empty-dir destination
    // and the rename quietly does the right thing (installs src's
    // contents at dst). Pinned so the two regimes' boundary is
    // explicit. LOCAL-FS-SPECIFIC (ADVICE r13): this replace regime is
    // RawLocalFileSystem delegating to rename(2); HDFS nests src into
    // an existing dst directory regardless of emptiness — the STRICTER
    // regime, which the swapIn/healReader nesting re-checks already
    // cover, so the guards transfer to hdfs:// while this pin does not.
    assert(fs.rename(new Path(base, "src"), new Path(base, "dst")))
    assert(fs.exists(new Path(base, "dst/f")) &&
      !fs.exists(new Path(base, "dst/src")))
  }

  test("swapIn installs tmp as live and drops the backup") {
    val base = new Path(Fixtures.tempDir("statefs-swap").toString)
    val fs = fsFor(base)
    val live = mk(new Path(base, "t")); touch(live, "old")
    val tmp = mk(StateFs.tmpOf(live)); touch(tmp, "new")
    StateFs.swapIn(fs, live, tmp)
    assert(fs.exists(new Path(live, "new")) && !fs.exists(new Path(live, "old")))
    assert(!fs.exists(tmp) && !fs.exists(new Path(base, "t.bak")))
  }

  test("swapInKeepBak leaves the old generation under .bak until dropBak") {
    val base = new Path(Fixtures.tempDir("statefs-keepbak").toString)
    val fs = fsFor(base)
    val live = mk(new Path(base, "t")); touch(live, "old")
    val tmp = mk(StateFs.tmpOf(live)); touch(tmp, "new")
    StateFs.swapInKeepBak(fs, live, tmp)
    val bak = new Path(base, "t.bak")
    assert(fs.exists(new Path(live, "new")))
    assert(fs.exists(new Path(bak, "old")),
      "the pre-swap generation must survive until the caller's metadata commit")
    StateFs.dropBak(fs, live)
    assert(!fs.exists(bak))
  }

  test("healReader restores a mid-swap crash from .bak and touches nothing else") {
    val base = new Path(Fixtures.tempDir("statefs-healr").toString)
    val fs = fsFor(base)
    // crash state: live gone, data under .bak, an in-flight .tmp present
    val bak = mk(new Path(base, "t.bak")); touch(bak, "data")
    val tmp = mk(new Path(base, "t.tmp")); touch(tmp, "half")
    val live = new Path(base, "t")
    StateFs.healReader(fs, live)
    assert(fs.exists(new Path(live, "data")) && !fs.exists(bak))
    assert(fs.exists(new Path(tmp, "half")),
      "a reader heal must never delete the writer-owned .tmp")
    // idempotent / no-op when live exists: a later .bak belongs to the writer
    val bak2 = mk(new Path(base, "t.bak")); touch(bak2, "stale")
    StateFs.healReader(fs, live)
    assert(fs.exists(new Path(bak2, "stale")),
      "a reader heal must never delete a stale .bak when live exists")
  }

  test("healWriter restores, then drops stale .bak and orphan .tmp") {
    val base = new Path(Fixtures.tempDir("statefs-healw").toString)
    val fs = fsFor(base)
    val bak = mk(new Path(base, "t.bak")); touch(bak, "data")
    val tmp = mk(new Path(base, "t.tmp")); touch(tmp, "half")
    val live = new Path(base, "t")
    StateFs.healWriter(fs, live)
    assert(fs.exists(new Path(live, "data")))
    assert(!fs.exists(bak) && !fs.exists(tmp))
  }

  test("committedVDirs: only _SUCCESS-committed v* child dirs, name-sorted") {
    val base = new Path(Fixtures.tempDir("statefs-vdirs").toString)
    val fs = fsFor(base)
    val v1 = mk(new Path(base, "v00000000000000000001")); touch(v1, "_SUCCESS")
    val v0 = mk(new Path(base, "v00000000000000000000")); touch(v0, "_SUCCESS")
    mk(new Path(base, "v00000000000000000002")) // uncommitted: no _SUCCESS
    mk(new Path(base, "other"))                 // non-v dir
    touch(base, "MANIFEST", "v00000000000000000001") // plain file ignored
    assert(StateFs.committedVDirs(fs, base).map(_.getName) ===
      Seq("v00000000000000000000", "v00000000000000000001"))
    assert(StateFs.committedVDirs(fs, new Path(base, "absent")).isEmpty)
  }

  test("writeFolded/readFolded roundtrip; plain generations read as None") {
    val base = new Path(Fixtures.tempDir("statefs-folded").toString)
    val fs = fsFor(base)
    val gen = mk(new Path(base, "v0"))
    StateFs.writeFolded(fs, gen, Seq("a", "b", "c"))
    assert(StateFs.readFolded(fs, gen) === Some(Seq("a", "b", "c")))
    assert(StateFs.readFolded(fs, mk(new Path(base, "v1"))) === None)
  }

  test("writeFileAtomic overwrites an existing target in place") {
    val base = new Path(Fixtures.tempDir("statefs-atomic").toString)
    val fs = fsFor(base)
    mk(base)
    val target = new Path(base, "CURRENT")
    StateFs.writeFileAtomic(spark, target, "v1")
    assert(StateFs.readString(fs, target) === "v1")
    StateFs.writeFileAtomic(spark, target, "v2") // plain rename cannot overwrite
    assert(StateFs.readString(fs, target) === "v2")
    assert(!fs.exists(new Path(base, "CURRENT.tmp")))
  }

  test("randomized crash/heal sequences never lose, roll back, or mix a generation") {
    // 200 seeded iterations of the swap state machine, each crashing
    // at a uniformly chosen point inside swapIn's three steps (orphan
    // tmp / after rename-aside / before the .bak drop / no crash),
    // followed by the reader heal. Invariants checked EVERY iteration:
    // the healed live dir exists, holds a COMPLETE single generation
    // (all three files, one generation id — a mixed dir would mean a
    // partial swap leaked through), and that generation is exactly the
    // newest one whose install step ran (crashes before the install
    // keep the previous generation — never an older one, never a
    // skipped one). This is the whole-lifecycle composition the
    // single-window tests above cannot cover: stale .baks and orphan
    // .tmps from iteration k feed iteration k+1's entry heal.
    val base = new Path(Fixtures.tempDir("statefs-fuzz").toString)
    val fs = fsFor(base)
    val live = new Path(base, "t")
    def writeGen(dir: Path, g: Int): Unit = {
      fs.mkdirs(dir)
      for (i <- 0 until 3) touch(dir, s"f$i", s"$g")
    }
    def genOf(dir: Path): Int = {
      val vals = (0 until 3).map(i =>
        StateFs.readString(fs, new Path(dir, s"f$i")))
      assert(vals.distinct.size == 1, s"MIXED generation in $dir: $vals")
      vals.head.toInt
    }
    writeGen(live, 0)
    var committed = 0
    val rnd = new scala.util.Random(42)
    for (g <- 1 to 200) {
      // writer entry heal (as compact/appendBatch do), then the rewrite
      StateFs.healWriter(fs, live)
      val tmp = StateFs.tmpOf(live)
      writeGen(tmp, g)
      rnd.nextInt(4) match {
        case 0 => () // crash before any rename: orphan tmp only
        case 1 => // crash between rename-aside and rename-in
          StateFs.deleteRec(fs, StateFs.bakOf(live))
          assert(fs.rename(live, StateFs.bakOf(live)))
        case 2 => // crash after the install, before the .bak drop
          StateFs.deleteRec(fs, StateFs.bakOf(live))
          assert(fs.rename(live, StateFs.bakOf(live)))
          assert(fs.rename(tmp, live))
          committed = g
        case 3 => // clean swap
          StateFs.swapIn(fs, live, tmp)
          committed = g
      }
      StateFs.healReader(fs, live)
      assert(fs.exists(live), s"iteration $g: live missing after reader heal")
      assert(genOf(live) == committed,
        s"iteration $g: live serves generation ${genOf(live)}, " +
          s"expected $committed")
    }
  }

  test("pointer mode: enable/resolve; virgin-only conversion; the swap is " +
      "one PTR rewrite and every crash state is read-safe with zero repair") {
    // VERDICT r14 #2: the object-store-safe twin of the rename-aside
    // swap cases — no directory rename is load-bearing, so the crash
    // matrix needs no heals: a partial unpublished target serves the
    // old generation, a published pointer with an undeleted previous
    // generation serves the new one, stale generations fall to the
    // writer-entry GC.
    val base = new Path(Fixtures.tempDir("statefs-ptr").resolve("s").toString)
    val fs = fsFor(base)
    // rename mode by default; enabling flips resolution to g0
    assert(!StateFs.pointerMode(fs, base))
    assert(StateFs.resolveLive(fs, base) === base)
    StateFs.enablePointerMode(spark, base)
    assert(StateFs.pointerMode(fs, base))
    StateFs.enablePointerMode(spark, base) // idempotent
    val g0 = new Path(base, "g0")
    assert(StateFs.resolveLive(fs, base) === g0)
    // a "stream" writes a committed generation into the live tree
    mk(g0); val v0 = mk(new Path(g0, "v0")); touch(v0, "_SUCCESS"); touch(v0, "data", "a")
    // crash state 1: a compaction staged the next generation but died
    // before publishing — readers still resolve the old one
    val g1 = mk(new Path(base, "g1")); touch(g1, "partial", "junk")
    assert(StateFs.resolveLive(fs, base) === g0)
    // writer-entry GC collects the stale target
    StateFs.gcStaleGens(fs, base, "g0")
    assert(!fs.exists(g1) && fs.exists(new Path(v0, "data")))
    // a clean pointer swap: stage g1, publish — the previous
    // generation is KEPT as the in-flight-reader grace window
    // (ADVICE r15: an inline delete yanked files out from under a
    // reader that resolved g0 just before the swap) and falls to the
    // next writer-entry GC
    val g1b = mk(new Path(base, "g1"))
    val v1 = mk(new Path(g1b, "v1")); touch(v1, "_SUCCESS"); touch(v1, "data", "b")
    StateFs.pointerSwap(spark, base, g0, g1b)
    assert(StateFs.resolveLive(fs, base) === g1b)
    assert(fs.exists(new Path(v0, "data")),
      "the superseded generation must survive the swap (reader grace window)")
    StateFs.gcStaleGens(fs, base, "g1")
    assert(!fs.exists(g0) && fs.exists(new Path(v1, "data")))
    // crash state 2: pointer moved manually (the swap-without-GC shape
    // is now also the NORMAL post-swap state) — readers follow the
    // pointer; the stale prev is GC'd at the next writer entry
    val g2 = mk(new Path(base, "g2"))
    val v2 = mk(new Path(g2, "v2")); touch(v2, "_SUCCESS"); touch(v2, "data", "c")
    StateFs.writeFileAtomic(spark, new Path(base, "PTR"), "g2") // swap w/o delete
    assert(StateFs.resolveLive(fs, base) === g2)
    // ...and an orphan PTR.tmp from a crashed atomic write is cleaned
    // by the same GC (ADVICE r15: nothing else ever removed it)
    touch(base, "PTR.tmp", "orphan")
    StateFs.gcStaleGens(fs, base, "g2")
    assert(!fs.exists(g1b) && fs.exists(new Path(v2, "data")))
    assert(!fs.exists(new Path(base, "PTR.tmp")),
      "writer-entry GC must drop orphan .tmp files under the base")
    // EXTERNAL LOSS OF PTR with later generations present is loud
    // (review r15): defaulting to g0 would serve an empty index and
    // the next compaction's GC would delete the real live generation
    assert(fs.delete(new Path(base, "PTR"), false))
    val eLoss = intercept[IllegalArgumentException] {
      StateFs.resolveLive(fs, base)
    }
    assert(eLoss.getMessage.contains("version pointer was removed externally")
      && eLoss.getMessage.contains("g2"), eLoss.getMessage)
    // the one-line repair the message prescribes recovers
    StateFs.writeFileAtomic(spark, new Path(base, "PTR"), "g2")
    assert(StateFs.resolveLive(fs, base) === g2)
    // ...while marker-without-PTR on a VIRGIN dir (the enable crash
    // window — the marker is written first) safely defaults to g0
    val virgin = new Path(Fixtures.tempDir("statefs-ptr3").resolve("s").toString)
    val vfs = fsFor(virgin)
    vfs.mkdirs(virgin); touch(virgin, "PTRMODE", "")
    assert(StateFs.resolveLive(vfs, virgin) === new Path(virgin, "g0"))
    // conversion of a LIVE rename-mode dir is refused (the generations
    // would become invisible to pointer-mode readers)
    val renameBase = new Path(Fixtures.tempDir("statefs-ptr2").resolve("s").toString)
    val rv = mk(new Path(renameBase, "v0")); touch(rv, "_SUCCESS")
    val e = intercept[IllegalArgumentException] {
      StateFs.enablePointerMode(spark, renameBase)
    }
    assert(e.getMessage.contains("VIRGIN state dir"))
  }

  test("witness write order (r16): FRONTIER strictly precedes GENESIS, so " +
      "the crash between them is quiet and the inverse state is loud") {
    import graft.util.StateFs
    val base = mk(new Path(Fixtures.tempDir("statefs-witness").resolve("d").toString))
    val fs = StateFs.fs(spark, base)
    val v0 = mk(new Path(base, f"v${0L}%020d"))
    touch(v0, "_SUCCESS"); touch(v0, "data", "a")
    StateFs.logAppend(fs, base, v0.getName)
    assert(fs.exists(StateFs.frontierFile(base)) &&
      fs.exists(StateFs.genesisFile(base)))
    // the benign crash window: FRONTIER written, GENESIS not yet —
    // the dense check is skipped (no GENESIS), the frontier check
    // passes, listings stay quiet; the same id's WAL replay
    // (logAppend again) completes the pair
    assert(fs.delete(StateFs.genesisFile(base), false))
    assert(StateFs.checkedVDirs(fs, base, "T").map(_.getName) === Seq(v0.getName))
    StateFs.logAppend(fs, base, v0.getName)
    assert(fs.exists(StateFs.genesisFile(base)),
      "the replay must complete the missing GENESIS")
    // the inverse — GENESIS present, FRONTIER gone — cannot arise
    // benignly under the r16 order, so it is certain external removal
    // of the witness and every listing refuses it naming the repair
    assert(fs.delete(StateFs.frontierFile(base), false))
    val e = intercept[IllegalArgumentException] {
      StateFs.checkedVDirs(fs, base, "T")
    }
    assert(e.getMessage.contains("FRONTIER") &&
      e.getMessage.contains("GENESIS exists"), e.getMessage)
  }

  test("gcVersions deletes every v* generation except keep, committed or partial") {
    val base = new Path(Fixtures.tempDir("statefs-gc").toString)
    val fs = fsFor(base)
    val keep = mk(new Path(base, "v2")); touch(keep, "_SUCCESS")
    val old = mk(new Path(base, "v1")); touch(old, "_SUCCESS")
    mk(new Path(base, "v0")) // crashed half-commit, no _SUCCESS
    val other = mk(new Path(base, "other")); touch(other, "f")
    StateFs.gcVersions(fs, base, "v2")
    assert(fs.exists(keep) && !fs.exists(old) && !fs.exists(new Path(base, "v0")))
    assert(fs.exists(new Path(other, "f")), "gc must not touch non-v dirs")
  }
}
