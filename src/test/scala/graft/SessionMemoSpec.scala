package graft

import graft.queries.SessionMemo

/** The session-memo device (graft.queries.SessionMemo): the ADVICE
  * r15 fixes pinned — single-oldest FIFO eviction instead of a
  * whole-map clear, and eviction callbacks deferred to the next safe
  * point (an explicit drop/resetAll) — plus the review-r16 refinement
  * that the pending-eviction queue is PER SESSION, so one session's
  * drop can never run the delete callbacks on state another session
  * may still be querying. */
class SessionMemoSpec extends SparkTestBase {

  private def newMemo(evicted: scala.collection.mutable.Buffer[String]) =
    new SessionMemo.Memo[String](v => { evicted += v; () })

  test("computes once per (session, key); resetAll forces the rebuild") {
    val evicted = scala.collection.mutable.Buffer.empty[String]
    val memo = newMemo(evicted)
    var computes = 0
    def get(k: String): String = memo(spark, k) { computes += 1; s"v-$k" }
    assert(get("a") === "v-a" && get("a") === "v-a" && computes === 1)
    SessionMemo.resetAll(spark)
    assert(evicted === Seq("v-a"), "drop must run the eviction callback")
    assert(get("a") === "v-a" && computes === 2)
    SessionMemo.resetAll(spark)
  }

  test("size bound evicts ONE oldest entry, not the whole map; the evicted " +
      "value's callback is deferred to the next safe point") {
    // ADVICE r15: perSession.clear() dropped all 8 hot entries at once
    // (alternating >8 keys rebuilt everything every time) and for
    // dir-valued memos the evicted dirs leaked until JVM exit.
    val evicted = scala.collection.mutable.Buffer.empty[String]
    val memo = newMemo(evicted)
    var computes = 0
    def get(k: String): String = memo(spark, k) { computes += 1; s"v-$k" }
    for (i <- 1 to 10) get(s"k$i") // the 10th insert evicts k1 (oldest)
    assert(computes === 10)
    assert(evicted.isEmpty,
      "the eviction callback must NOT run at eviction time — a query of " +
        "this session may be in flight against the evicted state")
    // the surviving entries are all still hot — no recompute
    for (i <- 2 to 10) get(s"k$i")
    assert(computes === 10, "surviving entries must stay memoized")
    // only the evicted oldest recomputes
    get("k1")
    assert(computes === 11)
    // the safe point flushes the deferred callback (k1's ORIGINAL
    // value) along with the live entries'
    SessionMemo.resetAll(spark)
    assert(evicted.count(_ === "v-k1") >= 1,
      s"the deferred eviction callback must run at the safe point: $evicted")
  }

  test("a cleared-reference recompute of an EXISTING key does not evict " +
      "the oldest entry (the map is not growing)") {
    // review r16: the size check ran on every miss, but a miss can be
    // a SoftReference-cleared EXISTING key whose re-put keeps the map
    // at the same size — evicting the oldest for it dropped a hot
    // entry (and queued its delete) for no capacity gain. The cleared
    // ref is planted deterministically through the test seam.
    val evicted = scala.collection.mutable.Buffer.empty[String]
    val memo = newMemo(evicted)
    var computes = 0
    // fill to the 9-entry high-water mark (one past the >8 bound)
    for (i <- 1 to 10) memo(spark, s"k$i") { computes += 1; s"v-k$i" }
    assert(computes === 10) // k1 was evicted at the 10th insert
    // recompute an existing key repeatedly as the GC would force it:
    // nothing may be size-evicted — the map is not growing
    for (n <- 1 to 5) {
      memo.clearRefForTest(spark, "k5")
      memo(spark, "k5") { computes += 1; s"v$n-k5" }
    }
    assert(computes === 15)
    // the oldest surviving entry (k2) must still be memoized — under
    // the pre-fix code each k5 recompute evicted the head, so this
    // would recompute
    memo(spark, "k2") { computes += 1; "recomputed-k2" }
    assert(computes === 15,
      "existing-key recomputes must not have evicted the oldest entry")
    // a genuinely NEW key at the bound still evicts the oldest (k2)
    memo(spark, "k11") { computes += 1; "v-k11" }
    assert(computes === 16)
    memo(spark, "k3") { computes += 1; "recomputed-k3" }
    assert(computes === 16, "k3 must have survived the k11 eviction")
    memo.drop(spark)
    assert(evicted.contains("v-k2"),
      s"the new key's eviction must have queued the oldest (k2): $evicted")
  }

  test("the pending-eviction queue is per session: dropping one session " +
      "never runs another session's deferred callbacks") {
    // review r16: with a global queue, session B's drop flushed the
    // values size-evicted under session A — deleting state dirs A
    // could still be querying, the exact race the deferral exists to
    // prevent.
    val evicted = scala.collection.mutable.Buffer.empty[String]
    val memo = newMemo(evicted)
    val other = spark.newSession()
    for (i <- 1 to 10) memo(spark, s"k$i") { s"a-k$i" } // evicts a-k1 → pending
    memo(other, "x") { "b-x" }
    assert(evicted.isEmpty)
    memo.drop(other)
    assert(evicted === Seq("b-x"),
      s"dropping the other session must not flush this session's queue: $evicted")
    memo.drop(spark)
    assert(evicted.contains("a-k1"),
      s"this session's drop must flush its own queue: $evicted")
  }
}
