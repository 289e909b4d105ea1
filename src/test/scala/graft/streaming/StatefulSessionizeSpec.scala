package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class StatefulSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    val tmp = Files.createTempDirectory("graft_w_").toString + "/out"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(java.nio.file.Paths.get(dest).getParent)
    Files.move(part.toPath, java.nio.file.Paths.get(dest))
  }

  test("sessions continue across micro-batch boundaries via the state store") {
    val root = Files.createTempDirectory("graft_ss_").toString
    val src = s"$root/src"
    // file 1: two events 10 min apart (same session at 30-min gap)
    writeFile(Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 10:10:00"))).toDF("user_id", "ts"),
      s"$src/a_f1.parquet")
    // file 2 (separate micro-batch): one event 5 min later -> SAME session,
    // then one 2 hours later -> new session
    writeFile(Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:15:00")),
      (1L, Timestamp.valueOf("2024-01-01 12:30:00"))).toDF("user_id", "ts"),
      s"$src/b_f2.parquet")
    val schema = spark.read.parquet(src).schema
    StatefulSessionize.runAvailableNow(spark, src, schema,
      s"$root/table", s"$root/ckpt", gapSeconds = 1800L)
    val got = spark.read.parquet(s"$root/table")
      .orderBy("ts_us").select("session_id").as[Long].collect().toSeq
    // state carried 10:10 across the batch boundary: 10:15 joins session 0
    assert(got == Seq(0L, 0L, 0L, 1L))
  }

  test("stateful result equals the batch window sessionize on one batch") {
    val root = Files.createTempDirectory("graft_ss2_").toString
    val src = s"$root/src"
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 11:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 10:20:00"))).toDF("user_id", "ts")
    writeFile(ev, s"$src/f1.parquet")
    val schema = spark.read.parquet(src).schema
    StatefulSessionize.runAvailableNow(spark, src, schema,
      s"$root/table", s"$root/ckpt", gapSeconds = 1800L)
    val streaming = spark.read.parquet(s"$root/table")
      .orderBy("user_id", "ts_us")
      .select("user_id", "session_id").as[(Long, Long)].collect().toSeq
    val batch = graft.operators.Temporal.sessionize(ev, Seq("user_id"), "ts", 1800L)
      .orderBy("user_id", "ts")
      .select("user_id", "session_id").as[(Long, Long)].collect().toSeq
    assert(streaming == batch)
  }
}
