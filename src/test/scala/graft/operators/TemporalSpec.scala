package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin takes the most recent right row at or before left time") {
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 900L),
      (1L, ts("2024-01-01 11:00:00"), 901L),
      (1L, ts("2024-01-01 13:00:00"), 902L)).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoin(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"))
      .orderBy("event_id").select("event_id", "click_id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((100L, 900L), (101L, 901L)))
  }

  test("asOfJoin matches a right row at the EXACT same timestamp (inclusive)") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts("2024-01-01 10:00:00"), 55L)).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_id")).collect()
    assert(out(0).getAs[Long]("click_id") == 55L)
  }

  test("asOfJoin yields null carry when no prior right row exists") {
    val left = Seq((1L, 7L, ts("2024-01-01 08:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts("2024-01-01 09:00:00"), 55L)).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_id")).collect()
    assert(out(0).isNullAt(out(0).fieldIndex("click_id")))
  }

  test("asOfJoin keys partition the match space") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((2L, ts("2024-01-01 09:00:00"), 99L)).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_id")).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("click_id")))
  }

  test("asOfJoin forward direction takes the next right row at-or-after") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 09:00:00"), 900L),
      (7L, ts("2024-01-01 11:00:00"), 901L)).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_id"), direction = "forward").collect()
    assert(out(0).getAs[Long]("click_id") == 901L)
  }

  test("asOfJoin tolerance voids matches outside the window") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts("2024-01-01 09:30:00"), 55L)).toDF("user_id", "ts", "click_id")
    val out = Temporal.asOfJoin(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), toleranceUs = Some(3600L * 1000000L))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("click_id") == 55L)   // 30 min back: within 1h
    assert(out(1).isNullAt(out(1).fieldIndex("click_id"))) // 2.5h back: voided
  }

  test("rangeJoinBinned equals the naive theta join, incl. boundary points") {
    val points = Seq((1L, 100L), (2L, 500L), (3L, 1000L), (4L, 1500L),
      (5L, 2500L)).toDF("pid", "ts_us")
    val iv = Seq((10L, 100L, 1000L), (20L, 900L, 1600L), (30L, 3000L, 4000L))
      .toDF("ivid", "start_us", "end_us")
    val binned = Temporal.rangeJoinBinned(points, "ts_us", iv,
        "start_us", "end_us", binSizeUs = 700L)
      .select("pid", "ivid").as[(Long, Long)].collect().toSet
    val naive = points.join(iv,
        $"ts_us".between($"start_us", $"end_us"))
      .select("pid", "ivid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(binned == Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 20L), (4L, 20L)))
  }

  test("sessionize starts a new session when the gap exceeds the threshold") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),  // 600s gap, within 1800
      (1L, ts("2024-01-01 11:00:00")),  // 3000s gap -> new session
      (2L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val out = Temporal.sessionize(ev, Seq("user_id"), "ts", 1800L)
      .orderBy("user_id", "ts")
      .select("user_id", "session_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L), (1L, 0L), (1L, 1L), (2L, 0L)))
  }

  test("sessionize gap is strictly-greater: exactly the gap stays in-session") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00"))).toDF("user_id", "ts") // exactly 1800s
    val out = Temporal.sessionize(ev, Seq("user_id"), "ts", 1800L)
      .select("session_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L))
  }
}
