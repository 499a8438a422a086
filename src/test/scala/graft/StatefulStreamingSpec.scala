package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StatefulSessionizer
import graft.streaming.StatefulSessionizer.{ClosedSession, Event}

class StatefulStreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600000L + min * 60000L)

  test("stream-stream interval join matches within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = graft.streaming.IngestStream.intervalJoin(
      clicks.toDF().toDF("uid", "click_ts"),
      buys.toDF().toDF("uid", "buy_ts"),
      key = "uid", leftTime = "click_ts", rightTime = "buy_ts",
      tolerance = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_t").start()
    clicks.addData((1L, ts(0)), (2L, ts(0)), (3L, ts(0)))
    buys.addData((1L, ts(5)), (2L, ts(30)), (3L, ts(8)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjoin_t").collect()
      .map(r => r.getLong(0)).sorted.toSeq
    // users 1 and 3 bought within 10 min of the click; user 2 too late
    assert(got == Seq(1L, 3L))
  }

  test("sessionizer: out-of-order merge lowers start; far straggler isolated") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StatefulSessionizer.sessionize(spark, input.toDS(),
      gapMs = 5 * 60000L)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_ooo").start()
    input.addData(Event(7L, ts(30), 1.0)) // open session [30, 30]
    q.processAllAvailable()
    // batch 2, watermark = ts(20): ts(28) is within the 5-min gap
    // BEFORE the session start → merges backward (start drops to 28);
    // ts(22) is > gap before start → its own single-event session.
    input.addData(Event(7L, ts(28), 2.0), Event(7L, ts(22), 0.5))
    q.processAllAvailable()
    input.addData(Event(7L, ts(60), 9.0)) // gap-split closes [28, 30]
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_ooo").as[ClosedSession].collect()
      .map(s => (s.start, s.end, s.n_events, s.total_value)).toSet
    assert(got == Set(
      (ts(22), ts(22), 1L, 0.5),
      (ts(28), ts(30), 2L, 3.0)))
  }

  test("sessionizer: adjacent stragglers in one batch merge into one session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StatefulSessionizer.sessionize(spark, input.toDS(),
      gapMs = 5 * 60000L)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_chain").start()
    input.addData(Event(9L, ts(30), 1.0)) // open session [30, 30]
    q.processAllAvailable()
    // batch 2, watermark = ts(20): two stragglers > gap before the
    // session but within gap of EACH OTHER (ts(21), ts(24)) → ONE
    // merged 2-event session, not two singletons.
    input.addData(Event(9L, ts(21), 1.0), Event(9L, ts(24), 2.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_chain").as[ClosedSession].collect()
      .map(s => (s.start, s.end, s.n_events, s.total_value)).toSet
    assert(got == Set((ts(21), ts(24), 2L, 3.0)))
  }

  test("sessionizer agrees with the batch gaps-and-islands rule on a generated corpus") {
    // Cross-check against the BATCH twin (the oracle-green
    // q_sessionize shape): 200 deterministic events over 5 users,
    // delivered in ONE micro-batch (so no straggler semantics are in
    // play), then flushed via watermark timeout — the closed-session
    // set must equal the gaps-and-islands computation over the same
    // rows. Values are small integers so double sums are exact and
    // order-independent across the two engines.
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 5 * 60000L
    val rnd = new scala.util.Random(42)
    var clock = Map.empty[Long, Long].withDefaultValue(3600000L)
    val events = (1 to 200).map { i =>
      val u = (i % 5) + 1L
      // inter-event gaps straddle the 5-min threshold: 0-9 minutes
      clock += u -> (clock(u) + rnd.nextInt(10) * 60000L)
      Event(u, new Timestamp(clock(u)), (i % 7).toDouble)
    }
    val input = MemoryStream[Event]
    val sessions = StatefulSessionizer.sessionize(spark, input.toDS(), gapMs)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_xcheck").start()
    input.addData(events: _*)
    q.processAllAvailable()
    // two far-future batches for a dummy user: the first advances the
    // watermark past every open session + gap, the second lets the
    // event-time timeouts fire and emit them
    input.addData(Event(99L, new Timestamp(clock.values.max + 86400000L), 0.0))
    q.processAllAvailable()
    input.addData(Event(99L, new Timestamp(clock.values.max + 86400001L), 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_xcheck").as[ClosedSession].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.user_id, s.start.getTime, s.end.getTime, s.n_events, s.total_value))
      .toSet

    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy("ts")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = events.toDF()
      .withColumn("ms", col("ts").cast("long") * 1000)
      .withColumn("gap", col("ms") - lag(col("ms"), 1).over(w))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > gapMs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .groupBy("user_id", "sid")
      .agg(min(col("ms")).as("start"), max(col("ms")).as("end"),
        count(lit(1)).as("n"), sum(col("value")).as("total"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSet
    assert(streamed == expected,
      s"stream sessions (${streamed.size}) != batch rule (${expected.size})")
  }

  test("flatMapGroupsWithState sessionizer: gap split + watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StatefulSessionizer.sessionize(spark, input.toDS(),
      gapMs = 5 * 60000L) // 5-minute gap
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_t").start()

    // batch 1: user 1 has two events 2min apart (one session), then a
    // 10-min silence and another event → first session closes inline.
    input.addData(
      Event(1L, ts(0), 1.0), Event(1L, ts(2), 2.0), Event(1L, ts(12), 4.0),
      Event(2L, ts(1), 8.0))
    q.processAllAvailable()
    val afterB1 = spark.table("sessions_t").as[ClosedSession].collect()
    assert(afterB1.map(s => (s.user_id, s.n_events, s.total_value)).toSet ==
      Set((1L, 2L, 3.0)))

    // batch 2: advance the watermark far past everything → timeouts
    // close the open sessions of user 1 (the 12-min event) and user 2.
    input.addData(Event(3L, ts(120), 0.5))
    q.processAllAvailable()
    input.addData(Event(3L, ts(121), 0.5)) // one more batch so timeouts fire
    q.processAllAvailable()
    val all = spark.table("sessions_t").as[ClosedSession].collect()
    q.stop()
    val byUser = all.groupBy(_.user_id)
    assert(byUser(1L).map(s => (s.n_events, s.total_value)).toSet ==
      Set((2L, 3.0), (1L, 4.0)))
    assert(byUser(2L).map(s => (s.n_events, s.total_value)).toSet ==
      Set((1L, 8.0)))
  }
}
