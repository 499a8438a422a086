package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{SimHash, TextFunctions}

/** STREAMING near-duplicate detection — the continuous form of the
  * batch [[graft.operators.SimHashDedup]] rule (SURVEY.md §2.11): as
  * documents arrive, each is flagged against the recently-seen corpus
  * with the SAME signature, banding, and Hamming-verification
  * semantics the oracle-checked `q_dedup_simhash` uses. The semantic
  * anchor is the reference's late-data handling
  * (`/root/reference/src/s3_processor.py:179-180`): bounded lookback,
  * then records age out.
  *
  * Shape: one codegen'd [[SimHash]] projection per document, a ×4
  * band explode, then `flatMapGroupsWithState` keyed by
  * `(band, bits)` — the stream-side analogue of the batch band
  * groupBy. State per band bucket is the retained
  * `(doc_id, sig, ts)` index inside the event-time horizon; an
  * incoming document is verified (exact `bitCount(xor)` ≤
  * `maxHamming`) against the bucket's retained signatures and emits
  * one [[StreamingSimHashDedup.Verdict]] per (matching retained doc,
  * colliding band) — the distinct `(dup_of, doc_id)` set is exactly
  * the batch pair set over the same horizon, which is what the
  * stream-vs-batch cross-check asserts (consumers `distinct` on
  * `(doc_id, dup_of)`; a pair can collide in up to 4 bands).
  *
  * 100 TB bounds, in order of defense:
  *  - the HORIZON is semantic: a match requires the retained doc
  *    within `horizonMs` of the new doc's EVENT time (same contract
  *    as the batch `q_watermark_dedup` twin) — not wall clock, so
  *    replays are deterministic;
  *  - state is GC'd by watermark: entries older than
  *    `watermark − horizon − delay` can never satisfy the match
  *    predicate for any admissible future event (events later than
  *    `watermark − delay` are gone per the watermark contract), so
  *    eviction never changes results, only bounds memory;
  *  - event-time timeout removes idle buckets entirely;
  *  - `maxPerBand` caps a pathological bucket (mass duplicates —
  *    same failure mode the batch `maxBucket` cap handles): beyond
  *    the cap new signatures are still VERIFIED against the retained
  *    index (so they still get verdicts) but are not added to it.
  *    Retained-oldest wins: the earliest docs are the canonical
  *    representatives a dedup keeps.
  *
  * Within one micro-batch a bucket's rows are buffered and sorted in
  * the state function (deterministic event-time order), so transient
  * memory per (band, bits) task is bounded by that bucket's mass in
  * the CURRENT batch, not by history. A stream of mass exact
  * duplicates concentrates batch rows in few buckets — run exact
  * dedup upstream first (the same sequencing the batch pipeline
  * documents) and the near-dup tail stays small.
  */
object StreamingSimHashDedup {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** One flagged (newer doc, retained doc) collision: `doc_id` is the
    * arriving near-duplicate, `dup_of` a retained doc within
    * `maxHamming` that shares this band. */
  final case class Verdict(doc_id: Long, band: Int, dup_of: Long, hamming: Int)

  final case class BandRow(band: Int, bits: Long, doc_id: Long, sig: Long,
      ts: Timestamp)

  /** Retained per-bucket index: (doc_id, sig, event-time millis). */
  final case class BandIndex(entries: List[(Long, Long, Long)])

  /** @param horizonMs        lookback: a doc is a dup only of docs within
    *                         this many ms of its event time
    * @param watermarkDelayMs max lateness admitted by the stream
    * @param maxPerBand       retained-signature cap per band bucket */
  def verdicts(spark: SparkSession, docs: Dataset[Doc],
      maxHamming: Int = 3, horizonMs: Long = 60 * 60000L,
      watermarkDelayMs: Long = 10 * 60000L,
      maxPerBand: Int = 200): Dataset[Verdict] = {
    import spark.implicits._
    SimHash.register(spark)
    val banded = docs.toDF()
      .withColumn("sig",
        call_function("simhash", TextFunctions.wsTokens(col("text"))))
      .select(col("doc_id"), col("sig"), col("ts"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), b * 16)
              .bitwiseAND(lit(0xffffL)).as("bits"))
        }: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bits").as("bits"),
        col("doc_id"), col("sig"), col("ts"))
      .withWatermark("ts", s"$watermarkDelayMs milliseconds")
      .as[BandRow]

    banded.groupByKey(r => (r.band, r.bits))
      .flatMapGroupsWithState[BandIndex, Verdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[BandIndex]) =>
          val wm = state.getCurrentWatermarkMs()
          // GC bound (see scaladoc): provably non-matching entries only.
          def live(es: List[(Long, Long, Long)]) =
            es.filter(_._3 >= wm - horizonMs - watermarkDelayMs)
          def park(es: List[(Long, Long, Long)]): Unit =
            if (es.isEmpty) state.remove()
            else {
              state.update(BandIndex(es))
              state.setTimeoutTimestamp(
                es.map(_._3).max + horizonMs + watermarkDelayMs + 1)
            }
          if (state.hasTimedOut) {
            park(live(state.getOption.map(_.entries).getOrElse(Nil)))
            Iterator.empty
          } else {
            var entries = live(state.getOption.map(_.entries).getOrElse(Nil))
            val out = List.newBuilder[Verdict]
            // deterministic within-batch order: event time, then id —
            // same-batch near-dups resolve exactly like cross-batch ones
            rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
              val t = r.ts.getTime
              val matches = entries.filter { case (_, sig, ets) =>
                java.lang.Long.bitCount(sig ^ r.sig) <= maxHamming &&
                  ets >= t - horizonMs
              }
              matches.foreach { case (mid, msig, _) =>
                out += Verdict(r.doc_id, key._1, mid,
                  java.lang.Long.bitCount(msig ^ r.sig))
              }
              if (entries.size < maxPerBand)
                entries = (r.doc_id, r.sig, t) :: entries
            }
            park(entries)
            out.result().iterator
          }
      }
  }
}
