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
