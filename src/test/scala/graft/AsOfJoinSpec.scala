package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks latest right row at-or-before left time") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")), // exactly at right time: inclusive
      (3L, 10L, ts("2023-12-31 00:00:00")), // before any right row: null
      (4L, 20L, ts("2024-01-10 00:00:00")) // before key-20's only right row: null
    ).toDF("id", "key", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100L, 1.0),
      (10L, ts("2024-01-04 00:00:00"), 101L, 2.0),
      (20L, ts("2024-01-15 00:00:00"), 200L, 3.0)
    ).toDF("key", "rt", "rid", "payload")

    val out = AsOfJoin.backward(left, right, key = "key",
      leftTime = "t", rightTime = "rt", rightTieBreak = "rid",
      payload = Seq("rid", "payload"))
      .select("id", "rid", "payload").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out(1L) == (Some(101L), Some(2.0)))
    assert(out(2L) == (Some(100L), Some(1.0)))
    assert(out(3L) == (None, None))
    assert(out(4L) == (None, None))
  }

  test("NULL payload field in the matched right row stays NULL (no leak from older rows)") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("id", "key", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100L, Some(1.0)),
      (10L, ts("2024-01-04 00:00:00"), 101L, None) // matched row: payload NULL
    ).toDF("key", "rt", "rid", "payload")
    val out = AsOfJoin.backward(left, right, "key", "t", "rt", "rid",
      Seq("rid", "payload")).select("rid", "payload").collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 101L)
    assert(out(0).isNullAt(1),
      "matched row's NULL payload must not be replaced by an older row's value")
  }

  test("forward as-of join picks earliest right row at-or-after left time") {
    val left = Seq(
      (1L, 10L, ts("2024-01-02 00:00:00")), // next right is 01-04
      (2L, 10L, ts("2024-01-04 00:00:00")), // exactly at right time: inclusive
      (3L, 10L, ts("2024-01-05 00:00:00"))  // after all right rows: null
    ).toDF("id", "key", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100L, 1.0),
      (10L, ts("2024-01-04 00:00:00"), 101L, 2.0)
    ).toDF("key", "rt", "rid", "payload")
    val out = AsOfJoin.forward(left, right, "key", "t", "rt", "rid",
      Seq("rid", "payload"))
      .select("id", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(101L))
    assert(out(2L) == Some(101L))
    assert(out(3L) == None)
  }

  test("forward equal-time duplicates resolve to smallest tiebreak") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:00:00"))).toDF("id", "key", "t")
    val right = Seq(
      (5L, ts("2024-01-02 00:00:00"), 9L, 1.0),
      (5L, ts("2024-01-02 00:00:00"), 7L, 2.0)
    ).toDF("key", "rt", "rid", "payload")
    val out = AsOfJoin.forward(left, right, "key", "t", "rt", "rid",
      Seq("rid", "payload")).select("rid").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("equal-time right duplicates resolve to greatest tiebreak") {
    val left = Seq((1L, 5L, ts("2024-01-02 00:00:00"))).toDF("id", "key", "t")
    val right = Seq(
      (5L, ts("2024-01-01 00:00:00"), 7L, 1.0),
      (5L, ts("2024-01-01 00:00:00"), 9L, 2.0)
    ).toDF("key", "rt", "rid", "payload")
    val out = AsOfJoin.backward(left, right, "key", "t", "rt", "rid",
      Seq("rid", "payload")).select("rid").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("NULL times never match: null right rows dropped, null left rows unmatched") {
    // right row with NULL time must not donate its payload to anyone
    val left = Seq((1L, 5L, ts("2024-01-02 00:00:00")),
      (2L, 5L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "key", "t")
    val right = Seq(
      (5L, null.asInstanceOf[java.sql.Timestamp], 99L, 9.9),
      (5L, ts("2024-01-01 00:00:00"), 7L, 1.0)
    ).toDF("key", "rt", "rid", "payload")
    val back = AsOfJoin.backward(left, right, "key", "t", "rt", "rid",
      Seq("rid", "payload")).select("id", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(back(1L) == Some(7L))  // real match, not the null-time row
    assert(back(2L) == None)      // null left time: no match
    val fwd = AsOfJoin.forward(left, right, "key", "t", "rt", "rid",
      Seq("rid", "payload")).select("id", "rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fwd(1L) == None)       // no future right row
    assert(fwd(2L) == None)       // null left time: no match
  }
}
