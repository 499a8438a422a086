package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.TextFunctions._
import graft.util.StateFs

/** Incremental BM25 retrieval index — the `incrementalPairs` /
  * [[graft.streaming.StreamingIvf]] analogue for ranked retrieval:
  * the corpus is tokenized and chunked ONCE, the per-chunk statistics
  * BM25 needs (`tf`, `dl`, `df`, corpus `N`/`T`) persist as stored
  * state, and an arriving document batch folds in WITHOUT
  * re-tokenizing anything already indexed. Serving reads the
  * maintained state and reproduces `q_rag_retrieve` EXACTLY — every
  * statistic is an additive integer aggregate over doc-disjoint
  * batches (tf/dl are per-chunk, df/N/T are sums), so batch-fold ≡
  * full rebuild bit-for-bit (spec-pinned, and the `q_rag_incremental`
  * driver query hashes against the full-rebuild oracle).
  *
  * Chunking/tokenization and the fixed-point scoring arithmetic are
  * SHARED with [[graft.queries.CorpusQueries.ragRetrieve]]
  * ([[chunkTokens]] / [[score]]) so index and direct query cannot
  * drift — the Scd2Sink/compress discipline.
  *
  * Storage layout under `stateDir` (plain parquet, no table format):
  *
  *  - `postings/v<batchId>/` — `(doc_id, chunk_id, token, tf)`,
  *    append-only, PARTITIONED BY a 64-way token-hash bucket `tkb` so
  *    a query-term probe is a partition-pruned read (the 100 TB
  *    device: a 3-term query touches ≤3/64 of the posting mass).
  *  - `dl/v<batchId>/` — `(doc_id, chunk_id, start, len, dl)`,
  *    append-only, PARTITIONED BY a 64-way doc-hash bucket `dhb`:
  *    after the postings filter has named the candidate docs, the dl
  *    join reads only their hash buckets (≤64 values collected from
  *    the already-pruned postings slice) — the `tkb` device applied
  *    to the length table, closing the one unpruned scan the r11
  *    audit flagged.
  *  - `merged/v<batchId>/{df,stats}` + `merged/CURRENT` pointer —
  *    the two frames that must MERGE rather than append: `df` is
  *    vocabulary-sized (token → containing-chunk count) and `stats`
  *    is one row `(n_docs, t_tok, last_batch)`; each batch writes a
  *    new version and atomically swaps the pointer (the
  *    StreamingKMeans state discipline).
  *
  * Crash/replay contract: `last_batch` in the committed stats row is
  * the ONLY replay marker, and it commits LAST — a crash after the
  * postings/dl appends but before the merged swap leaves
  * `last_batch` behind, so the replay recomputes the batch,
  * overwrites the same append directories (idempotent — same docs,
  * same bytes), and completes the merge. Readers only see append
  * directories `<= last_batch`, so the half-committed batch is
  * invisible until its merge lands.
  *
  * Assumption (documented, asserted nowhere cheaper than ingest):
  * batches are DOC-DISJOINT — the upstream keyed-upsert/dedup ingest
  * guarantees each doc_id arrives once. Re-indexing a changed
  * document is a rebuild-class operation, as in every inverted-index
  * store.
  *
  * At 100 TB: the per-batch append dirs are the compaction unit —
  * [[compact]] rewrites the visible dirs of each family into one
  * generation (tkb layout preserved) behind a heal-able rename-aside
  * swap, so N-batch read fan-in is a maintenance knob, not a decay
  * curve; `df` merge cost is vocabulary-scale, not corpus-scale;
  * `dl` probes join on (doc_id, chunk_id) after the postings filter
  * has already shrunk the left side to matching chunks only.
  */
object Bm25Index {

  private val Cap = 32L
  private val Stride = 24L
  private val TkBuckets = 64
  private val DhBuckets = 64L

  /** Tokenize + 32/24 sliding-window chunk one document frame into
    * `(doc_id, chunk_id, start, len, token)` rows (empty tokens
    * dropped) — the exact front of `q_rag_retrieve`, factored out so
    * the direct query and this index share one definition. */
  def chunkTokens(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"),
      wsTokens(col("text")).as("toks"),
      tokenCount(col("text")).cast(LongType).as("n_tok"))
    t.withColumn("n_chunks",
        when(col("n_tok") <= Cap, lit(1L))
          .otherwise(lit(1L) +
            floor((col("n_tok") - Cap + Stride - 1) / Stride).cast(LongType)))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)).as(Seq("_p", "chunk_id")),
        col("n_tok"))
      .withColumn("start", col("chunk_id") * Stride)
      .withColumn("len", least(lit(Cap), col("n_tok") - col("start")))
      .select(col("doc_id"), col("chunk_id"), col("start"), col("len"),
        explode(slice(col("toks"), (col("start") + 1).cast(IntegerType),
          col("len").cast(IntegerType))).as("token"))
      .filter(col("token") =!= "")
  }

  /** Fixed-point integer BM25 over chunk-grounded statistics — the
    * exact scoring tail of `q_rag_retrieve` (see
    * [[graft.queries.CorpusQueries.bm25Topk]] for the arithmetic
    * derivation). `tf`: `(doc_id, chunk_id, token, tf)` already
    * filtered to the query terms; `dfreq`: `(token, df)` for those
    * terms; `dl`: `(doc_id, chunk_id, start, len, dl)`; `stats`: one
    * row `(n_docs, t_tok)`. */
  def score(tf: DataFrame, dfreq: DataFrame, dl: DataFrame,
      stats: DataFrame, k: Int = 10): DataFrame =
    tf.join(broadcast(dfreq), "token")
      .join(dl, Seq("doc_id", "chunk_id"))
      .crossJoin(broadcast(stats.select("n_docs", "t_tok")))
      .withColumn("a", expr(
        "(44 * t_tok * tf * 1000000) DIV (20 * t_tok * tf + 6 * t_tok + 18 * n_docs * dl)"))
      .withColumn("term_score", expr("(a * (2 * n_docs - 2 * df + 1)) DIV (2 * df + 1)"))
      .groupBy("doc_id", "chunk_id", "start", "len")
      .agg(count(lit(1)).cast(IntegerType).as("n_terms"),
        sum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc, col("chunk_id").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc, col("chunk_id").asc)))
      .select("rnk", "doc_id", "chunk_id", "start", "len", "n_terms", "score")

  // ---- stored state ----

  // All state I/O goes through the Hadoop FileSystem API
  // (graft.util.StateFs) so a stateDir on file:// and hdfs:// behave
  // identically — java.io.File would silently confine the index to
  // the driver's local disk (review r12).
  private def mergedDir(stateDir: String) = new Path(stateDir, "merged")

  /** The committed merged version name, or None before the first
    * fully-committed batch. A version is served only if the pointer
    * names it AND both its frames finished writing. */
  private def currentVersion(spark: SparkSession, stateDir: String): Option[String] = {
    val md = mergedDir(stateDir)
    val fs = StateFs.fs(spark, md)
    val cur = new Path(md, "CURRENT")
    if (!fs.exists(cur)) None
    else {
      val v = StateFs.readString(fs, cur)
      val d = new Path(md, v)
      if (StateFs.committed(fs, new Path(d, "df")) &&
          StateFs.committed(fs, new Path(d, "stats")))
        Some(v)
      else None
    }
  }

  /** `(df, stats)` of the current committed generation. */
  def readMerged(spark: SparkSession, stateDir: String): Option[(DataFrame, DataFrame)] =
    currentVersion(spark, stateDir).map { v =>
      val d = new Path(mergedDir(stateDir), v)
      (spark.read.parquet(new Path(d, "df").toString),
        spark.read.parquet(new Path(d, "stats").toString))
    }

  /** Append dirs visible at the committed frontier: `v<bid>` with
    * `_SUCCESS`, bid <= the merged state's last_batch (dirs from a
    * half-committed batch exist but are NOT served). */
  private def visibleAppendDirs(spark: SparkSession, stateDir: String,
      sub: String, lastBatch: Long): Seq[String] = {
    val frontier = f"v$lastBatch%020d"
    val dir = new Path(stateDir, sub)
    StateFs.committedVDirs(StateFs.fs(spark, dir), dir)
      .filter(_.getName <= frontier).map(_.toString)
  }

  /** The full served state `(postings, dl, df, stats)` after every
    * committed batch, or None before the first. */
  def readState(spark: SparkSession, stateDir: String)
      : Option[(DataFrame, DataFrame, DataFrame, DataFrame)] = {
    healReaderAll(spark, stateDir)
    readMerged(spark, stateDir).map { case (dfreq, stats) =>
      val st = stats.select("last_batch", "n_docs").head()
      val last = st.getLong(0)
      // one read per version dir, each rooted at its own basePath so
      // the tkb= partition layout resolves; the union is append-only
      // file metadata, and a tkb filter pushes through it into every
      // arm's partition pruning. Zero visible dirs is EMPTY only when
      // the merged stats agree nothing is indexed; dirs gone while
      // n_docs > 0 is data loss (external GC of the append dirs) and
      // fails with the remedy instead of serving silently-empty
      // results indistinguishable from "no matches" (review r12;
      // supersedes the ADVICE-r11 silent empty-frame fallback).
      def familyDirs(sub: String): Seq[String] = {
        val dirs = visibleAppendDirs(spark, stateDir, sub, last)
        require(dirs.nonEmpty || st.getLong(1) == 0L,
          s"BM25 state inconsistent: merged stats claim n_docs=${st.getLong(1)} " +
            s"but no committed $sub/v* dirs are visible under $stateDir — " +
            "append dirs were removed externally; restore them or rebuild " +
            "the index from the raw documents")
        dirs
      }
      // dhb back-compat: dl generations written before the doc-hash
      // bucketing carry no dhb column — synthesize it (row-level, no
      // partition pruning on those dirs; compact() migrates them to
      // the bucketed layout).
      val pDirs = familyDirs("postings")
      val postings =
        if (pDirs.isEmpty) emptyPostings(spark)
        else pDirs.map(d => spark.read.option("basePath", d).parquet(d))
          .reduce(_ unionByName _)
      val dlDirs = familyDirs("dl")
      val dl =
        if (dlDirs.isEmpty) emptyDl(spark)
        else dlDirs.map { d =>
          val f = spark.read.option("basePath", d).parquet(d)
          if (f.columns.contains("dhb")) f
          else f.withColumn("dhb", pmod(xxhash64(col("doc_id")), lit(DhBuckets)))
        }.reduce(_ unionByName _)
      (postings, dl, dfreq, stats)
    }
  }

  private def emptyPostings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, String, Long, Long)]
      .toDF("doc_id", "chunk_id", "token", "tf", "tkb")
  }

  private def emptyDl(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long, Long, Long)]
      .toDF("doc_id", "chunk_id", "start", "len", "dl", "dhb")
  }

  /** Fold one document batch `(doc_id, text)` into the index. Only
    * the batch pays tokenization; postings/dl append, df/stats merge.
    * Returns true iff applied (false = replay of a committed batch id
    * or empty batch). */
  def appendBatch(spark: SparkSession, stateDir: String, docs: DataFrame,
      batchId: Long): Boolean = {
    healWriterAll(spark, stateDir)
    val cur = readMerged(spark, stateDir)
    val last = cur.map(_._2.select("last_batch").head().getLong(0))
    if (last.exists(_ >= batchId)) return false // replay
    if (docs.isEmpty) return false
    val vname = f"v$batchId%020d"
    val ctoks = chunkTokens(docs)
    val postings = ctoks
      .groupBy("doc_id", "chunk_id", "token").agg(count(lit(1)).as("tf"))
      .withColumn("tkb", pmod(xxhash64(col("token")), lit(TkBuckets.toLong)))
      .persist()
    // A non-empty doc batch can still tokenize to ZERO rows (all
    // whitespace/empty texts): writing it would leave a partitioned
    // dir with _SUCCESS but no part files, and every later read would
    // fail schema inference on it — treat as an empty batch instead
    // (ADVICE r11). The batch id is NOT consumed: no state changed.
    if (postings.isEmpty) { postings.unpersist(); return false }
    try {
      val dl = ctoks.groupBy("doc_id", "chunk_id", "start", "len")
        .agg(count(lit(1)).as("dl"))
        .withColumn("dhb", pmod(xxhash64(col("doc_id")), lit(DhBuckets)))
        .persist()
      try {
        // Shuffle-align to the bucket key before the partitioned
        // write: without it every upstream task writes a file into
        // every bucket dir it touches — up to tasks×64 tiny files per
        // batch (measured: q_rag_incremental's two in-query batches
        // paid seconds of file-open overhead at bench scale). One
        // hash exchange of the thin frame lands each bucket in one
        // task → ≤64 files, the layout the partition-pruned probe
        // wants at any scale.
        postings.repartition(col("tkb"))
          .write.mode("overwrite").partitionBy("tkb")
          .parquet(new Path(new Path(stateDir, "postings"), vname).toString)
        dl.repartition(col("dhb"))
          .write.mode("overwrite").partitionBy("dhb")
          .parquet(new Path(new Path(stateDir, "dl"), vname).toString)
        val bDf = postings.groupBy("token").agg(count(lit(1)).as("df"))
        val bStats = dl.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("dl")), lit(0L)).as("t_tok"))
        val (nDf, nStats) = cur match {
          case None => (bDf, bStats)
          case Some((pDf, pStats)) =>
            (pDf.unionByName(bDf).groupBy("token")
              .agg(sum(col("df")).as("df")),
              pStats.select("n_docs", "t_tok").unionByName(bStats)
                .agg(sum(col("n_docs")).as("n_docs"),
                  sum(col("t_tok")).as("t_tok")))
        }
        commitMerged(spark, stateDir, vname,
          nDf.localCheckpoint(true),
          nStats.withColumn("last_batch", lit(batchId)).localCheckpoint(true))
        true
      } finally { dl.unpersist(); () }
    } finally { postings.unpersist(); () }
  }

  /** Write-new-version + atomic pointer swap + GC (the
    * StreamingKMeans commit). The localCheckpoints upstream severed
    * lineage from the generation being collected. */
  private def commitMerged(spark: SparkSession, stateDir: String,
      vname: String, dfreq: DataFrame, stats: DataFrame): Unit = {
    val md = mergedDir(stateDir)
    val d = new Path(md, vname)
    dfreq.coalesce(1).write.mode("overwrite").parquet(new Path(d, "df").toString)
    stats.coalesce(1).write.mode("overwrite").parquet(new Path(d, "stats").toString)
    StateFs.writePointer(spark, md, vname)
    // GC every generation the pointer left behind, committed or
    // partial (a crashed earlier commit's half-written dir included)
    val fs = StateFs.fs(spark, md)
    fs.listStatus(md).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v") &&
        s.getPath.getName != vname)
      .foreach(s => StateFs.deleteRec(fs, s.getPath))
  }

  /** Crash-window repair, split by caller role (graft.util.StateFs):
    * readers only restore a mid-swap-crashed family so its data is
    * visible; writers additionally drop stale `.bak`/orphan `.tmp`
    * dirs. Readers running the full destructive heal could delete a
    * live compaction's `.tmp` out from under it (review r12). */
  private def healReaderAll(spark: SparkSession, stateDir: String): Unit =
    for (sub <- Seq("postings", "dl")) {
      val live = new Path(stateDir, sub)
      StateFs.healReader(StateFs.fs(spark, live), live)
    }

  private def healWriterAll(spark: SparkSession, stateDir: String): Unit =
    for (sub <- Seq("postings", "dl")) {
      val live = new Path(stateDir, sub)
      StateFs.healWriter(StateFs.fs(spark, live), live)
    }

  /** Background compaction — the coalesce the scaladoc above promised:
    * rewrite the visible postings/dl append dirs into ONE generation
    * each (named at the committed frontier, so readers' `<= frontier`
    * rule picks it up and later appends sort after it). Served content
    * is IDENTICAL before and after (spec-pinned); the postings rewrite
    * keeps the `tkb` partition layout, and each family swaps
    * independently — a crash between the two swaps leaves one family
    * compacted and the other not, which readers cannot distinguish
    * from content (union semantics). The merged `df`/`stats`
    * generation is untouched: it is already one frame. Run this when
    * no writer is active (single-writer discipline, as with every
    * file-layout compactor); concurrent READERS on another session
    * see either generation, never half of one, thanks to the
    * rename-aside windows being healable and `_SUCCESS`-gated.
    * Returns true iff a rewrite happened (false = nothing to merge). */
  def compact(spark: SparkSession, stateDir: String): Boolean = {
    healWriterAll(spark, stateDir)
    val cur = readMerged(spark, stateDir)
    if (cur.isEmpty) return false
    val last = cur.get._2.select("last_batch").head().getLong(0)
    val vname = f"v$last%020d"
    val pDirs = visibleAppendDirs(spark, stateDir, "postings", last)
    val dlDirs = visibleAppendDirs(spark, stateDir, "dl", last)
    if (pDirs.size <= 1 && dlDirs.size <= 1) return false
    if (pDirs.nonEmpty) {
      val live = new Path(stateDir, "postings")
      val pTmp = StateFs.tmpOf(live)
      pDirs.map(d => spark.read.option("basePath", d).parquet(d))
        .reduce(_ unionByName _)
        .repartition(col("tkb")) // bucket-aligned: ≤64 files, not tasks×64
        .write.mode("overwrite").partitionBy("tkb")
        .parquet(new Path(pTmp, vname).toString)
      StateFs.swapIn(StateFs.fs(spark, live), live, pTmp)
    }
    if (dlDirs.nonEmpty) {
      val live = new Path(stateDir, "dl")
      val dlTmp = StateFs.tmpOf(live)
      dlDirs.map { d =>
          val f = spark.read.option("basePath", d).parquet(d)
          // migrate pre-dhb generations into the bucketed layout
          if (f.columns.contains("dhb")) f
          else f.withColumn("dhb", pmod(xxhash64(col("doc_id")), lit(DhBuckets)))
        }
        .reduce(_ unionByName _)
        .repartition(col("dhb"))
        .write.mode("overwrite").partitionBy("dhb")
        .parquet(new Path(dlTmp, vname).toString)
      StateFs.swapIn(StateFs.fs(spark, live), live, dlTmp)
    }
    true
  }

  /** Serve a term query from the maintained index — identical output
    * to running `q_rag_retrieve`'s direct computation over every
    * indexed document, without touching their text. The postings read
    * is partition-pruned to the query terms' token-hash buckets; the
    * dl read is then pruned to the CANDIDATE DOCS' hash buckets —
    * the matching tf slice is materialized once (it feeds both the
    * bucket collection and the scorer), its ≤64 distinct `dhb` values
    * cost one map-side-combined mini-aggregate over the already-
    * pruned slice, and the dl scan skips every other bucket at the
    * partition level. */
  def retrieve(spark: SparkSession, stateDir: String, terms: Seq[String],
      k: Int = 10): DataFrame = {
    val (postings, dl, dfreq, stats) = readState(spark, stateDir).getOrElse(
      sys.error(s"no committed BM25 index under $stateDir"))
    import spark.implicits._
    val buckets = terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(TkBuckets.toLong))).as[Long]
      .collect().distinct.toSeq
    val tf = postings
      .filter(col("tkb").isin(buckets: _*))
      .filter(col("token").isin(terms: _*))
      .select("doc_id", "chunk_id", "token", "tf")
      .localCheckpoint(true)
    val docBuckets = tf
      .select(pmod(xxhash64(col("doc_id")), lit(DhBuckets)).as("dhb"))
      .distinct().as[Long].collect().toSeq
    val dlPruned = dl.filter(col("dhb").isin(docBuckets: _*))
      .select("doc_id", "chunk_id", "start", "len", "dl")
    score(tf, dfreq.filter(col("token").isin(terms: _*)), dlPruned, stats, k)
  }
}
