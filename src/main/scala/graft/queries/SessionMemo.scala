package graft.queries

import org.apache.spark.sql.SparkSession

/** The session-memo device, extracted from DedupQueries (rounds 7-10)
  * so every query family can share expensive intermediates: a
  * `WeakHashMap[SparkSession, Map[key, SoftReference[V]]]` keyed by
  * data dir, holding MATERIALIZED values (checkpointed frames, or
  * built on-disk index state) that sibling driver queries — and
  * repeated benchmark passes — reuse instead of re-paying the build.
  * This is also the production-faithful cost model for the
  * stored-state index queries: an index is built once and served many
  * times, so a session's warm cost is the serve path and the build
  * cost appears once (the bench reports it separately via `_cold`
  * entries that call [[resetAll]] first).
  *
  * Reachability (ADVICE r8, inherited): a DataFrame strongly
  * references its session, so a strong map value would pin the
  * WeakHashMap key forever — values are SoftReferences. A stopped
  * session's values survive at most until memory pressure; a cleared
  * ref in a live session merely recomputes (the memo is a cache,
  * never a correctness dependency). Bounded: beyond 8 keys the OLDEST
  * entry is evicted (FIFO), its delete callback deferred to the next
  * explicit drop/resetAll — the safe point where no query can be in
  * flight against the evicted state (ADVICE r15).
  *
  * Locking (ADVICE r8, inherited): the global monitor guards only map
  * access; `compute` runs under the PER-SESSION monitor, so
  * concurrent sessions never serialize on each other — only
  * same-session same-key callers wait, and then reuse the one result.
  *
  * Values that are ON-DISK state (a temp index dir) register an
  * eviction callback so [[resetAll]] and size-eviction delete the
  * directory; [[trackTempDir]] additionally pins every such dir for
  * JVM-exit cleanup, covering the SoftReference-cleared case where no
  * callback can run. */
private[graft] object SessionMemo {

  private val registry =
    scala.collection.mutable.ArrayBuffer.empty[Memo[_ <: AnyRef]]

  /** Drop every memoized entry for `s` across every registered memo,
    * running eviction callbacks (temp-state deletion). The bench
    * cold-cost hook: after this, the next call of any memoized query
    * pays its full standalone pipeline. */
  def resetAll(s: SparkSession): Unit =
    registry.synchronized { registry.toSeq }.foreach(_.drop(s))

  final class Memo[V <: AnyRef](onEvict: V => Unit = (_: AnyRef) => ()) {
    // insertion-ordered (LinkedHashMap) so size-bound eviction can
    // drop the OLDEST entry — FIFO, deliberately not LRU: re-ordering
    // on every hit buys nothing for the bench/driver access pattern
    private val memo = new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.LinkedHashMap[String, java.lang.ref.SoftReference[V]]]()

    // values evicted by the size bound, awaiting their onEvict at the
    // next SAFE POINT (an explicit drop/resetAll, whose contract is
    // "no in-flight queries") — the callback must not run at eviction
    // time because another thread of the same session may be mid-query
    // against the evicted state dir (review r15). PER SESSION (review
    // r16): the safe-point contract is a property of the session being
    // dropped — a global queue let session B's drop run the callbacks
    // on values session A was still querying.
    private val pending = new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ArrayBuffer[V]]()

    // registration is the LAST initializer (ADVICE r15): publishing
    // `this` before the fields above exist let a concurrent resetAll()
    // NPE inside drop() during the construction window
    registry.synchronized { registry += this; () }

    /** The memoized value for `(s, key)`, computing and caching on a
      * miss. `compute` must return a value safe to re-consume across
      * actions (a checkpointed frame, a committed state dir). */
    def apply(s: SparkSession, key: String)(compute: => V): V = {
      val perSession = memo.synchronized {
        Option(memo.get(s)).getOrElse {
          val m = scala.collection.mutable.LinkedHashMap
            .empty[String, java.lang.ref.SoftReference[V]]
          memo.put(s, m)
          m
        }
      }
      perSession.synchronized {
        perSession.get(key).flatMap(r => Option(r.get())) match {
          case Some(v) => v
          case None =>
            // Size-bound eviction drops ONE entry — the oldest — not
            // the whole map (ADVICE r15: clear() threw away all 8 hot
            // entries at once, so alternating >8 keys rebuilt
            // everything every time). The evicted value's delete
            // callback does NOT run here: another thread of the same
            // session may be mid-query against the evicted state dir
            // (review r15) — it is queued and runs at the next safe
            // point (an explicit [[drop]]/[[SessionMemo.resetAll]],
            // whose contract is "no in-flight queries"), with the
            // JVM-exit hook as the backstop for dirs never dropped.
            // ...and only for a NEW key (review r16): a cleared
            // SoftReference recompute re-puts an EXISTING key, the
            // map does not grow, and evicting the oldest for it would
            // needlessly drop a hot entry
            if (perSession.size > 8 && !perSession.contains(key)) {
              val (oldKey, oldRef) = perSession.head
              perSession.remove(oldKey)
              Option(oldRef.get()).foreach { v =>
                pending.synchronized {
                  Option(pending.get(s)).getOrElse {
                    val b = scala.collection.mutable.ArrayBuffer.empty[V]
                    pending.put(s, b)
                    b
                  } += v
                }
                ()
              }
            }
            val v = compute
            perSession.put(key, new java.lang.ref.SoftReference(v))
            v
        }
      }
    }

    /** Test seam: clear `key`'s SoftReference IN PLACE (what the GC
      * does under memory pressure) without changing the map's shape —
      * lets the spec drive the existing-key-recompute miss path
      * deterministically. */
    private[graft] def clearRefForTest(s: SparkSession, key: String): Unit = {
      val perSession = memo.synchronized { Option(memo.get(s)) }
      perSession.foreach(m => m.synchronized {
        if (m.contains(key))
          m.update(key,
            new java.lang.ref.SoftReference[V](null.asInstanceOf[V]))
        ()
      })
    }

    /** Drop `s`'s entries, running the eviction callback on each
      * still-live value. Callers must not race in-flight queries of
      * the same session (the callback may delete on-disk state a
      * running scan is reading). */
    def drop(s: SparkSession): Unit = {
      val perSession = memo.synchronized { Option(memo.remove(s)) }
      perSession.foreach(m => m.synchronized {
        m.values.flatMap(r => Option(r.get())).foreach(onEvict)
        m.clear()
      })
      // the safe point for THIS session's size-bound evictions queued
      // by apply() (same no-in-flight-queries contract as the entries
      // above; other sessions' queues are untouched — review r16)
      val flushed = pending.synchronized {
        Option(pending.remove(s)).map(_.toSeq).getOrElse(Seq.empty)
      }
      flushed.foreach(onEvict)
    }
  }

  // ---- temp-state-dir tracking ----

  private lazy val tracked = {
    val set = java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      set.forEach(f => { org.apache.commons.io.FileUtils.deleteQuietly(f); () })
    }))
    set
  }

  /** Pin a memoized temp state dir for JVM-exit cleanup — the
    * backstop for dirs whose SoftReference was cleared before any
    * eviction callback could delete them. */
  def trackTempDir(f: java.io.File): java.io.File = { tracked.add(f); f }

  /** The eviction callback for `file://`-URI-valued memos: delete the
    * state dir now and un-pin it from the exit hook. */
  def deleteTempDir(uri: String): Unit = {
    val f = new java.io.File(java.net.URI.create(uri))
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    tracked.remove(f)
    ()
  }
}
