package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The round-8 postmortem, as a regression test: a query that THROWS must
  * be loudly visible in both harness artifacts — an `errors.json` entry
  * from the Verify dump, and a `null` timing + `failed` entry in the
  * Bench JSON line — never a silent absence or an elapsed-to-throw
  * "timing".
  */
class HarnessFailureSpec extends SparkSpec {
  import spark.implicits._

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }
  private val boom: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("deliberately broken")

  test("Verify.dumpQueries records a thrown query in errors.json") {
    val out = Files.createTempDirectory("graft_vfail_").toString
    val errors = Verify.dumpQueries(spark, "unused", out,
      Seq("q_ok" -> good, "q_dead" -> boom))
    assert(errors.map(_._1) == Seq("q_dead"))
    assert(errors.head._2.contains("deliberately broken"))
    // the good query still materialized
    assert(spark.read.parquet(s"$out/q_ok").count() == 3)
    val errJson = Files.readString(java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errJson.contains("q_dead") && errJson.contains("deliberately broken"))
    assert(!errJson.contains("q_ok"))
  }

  test("Verify.dumpQueries writes an empty errors.json when all pass") {
    val out = Files.createTempDirectory("graft_vok_").toString
    assert(Verify.dumpQueries(spark, "unused", out, Seq("q_ok" -> good)).isEmpty)
    assert(Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json")).trim == "{}")
  }

  test("Bench reports a thrown query as null + failed, not a timing") {
    val results = Seq(
      "q_ok" -> Bench.benchOne(spark, "unused", "q_ok", good),
      "q_dead" -> Bench.benchOne(spark, "unused", "q_dead", boom))
    val (coldOk, repsOk) = results.head._2
    assert(coldOk.exists(_ > 0) && Bench.median(repsOk).exists(_ > 0))
    assert(repsOk.length == 3 && repsOk.forall(_.exists(_ > 0)))
    assert(results(1)._2 == ((None, Seq.empty)))
    val json = Bench.renderJson(results, "sfX")
    assert(json.contains("\"q_dead\":null"))
    assert(json.contains("\"failures\":1"))
    assert(json.contains("\"failed\":[\"q_dead\"]"))
    assert(!json.contains("\"q_ok\":null"))
  }

  test("Bench flags a stalled rep as spread, and keeps reps off the line") {
    // one rep 12× its siblings — the r12 driver-stall signature
    val stalled = Seq(Some(0.5), Some(6.0), Some(0.52))
    val tight = Seq(Some(0.50), Some(0.55), Some(0.52))
    assert(Bench.spreadFlag(stalled))
    assert(!Bench.spreadFlag(tight))
    // sub-threshold absolute jitter on a tiny query never flags, even at 3×
    assert(!Bench.spreadFlag(Seq(Some(0.05), Some(0.15), Some(0.06))))
    // the median still reports (the flag annotates, not censors)
    assert(Bench.median(stalled).contains(0.52))
    val results = Seq("q_stall" -> ((Option(1.0), stalled)),
      "q_fine" -> ((Option(1.0), tight)))
    val line = Bench.renderJson(results, "sfX")
    assert(line.contains("\"spread_flagged\":1"))
    assert(line.contains("\"spread\":[\"q_stall\"]"))
    assert(!line.contains("\"reps\"")) // per-rep arrays are file-only
    val file = Bench.renderJson(results, "sfX", withReps = true)
    assert(file.contains("\"reps\":{"))
    assert(file.contains("\"q_stall\":[500,6000,520]"))
    val full = Bench.renderJsonFull(results, "sfX")
    assert(full.contains("\"reps\":[0.5,6.0,0.52]"))
    assert(full.contains("\"spread_flag\":true"))
    assert(full.contains("\"spread_flag\":false"))
  }

  test("idRangeBacklog: loud on empty input, overflow-safe boundaries") {
    import org.apache.spark.sql.functions.col
    // empty frame → a named require, not an opaque NPE on max(doc_id)
    val e = intercept[IllegalArgumentException] {
      SparkEntry.idRangeBacklog(spark,
        Files.createTempDirectory("graft_irb0_").toString,
        Seq.empty[Long].toDF("doc_id"))
    }
    assert(e.getMessage.contains("non-empty"))
    // ids near Long.MaxValue: the old maxId * i boundary math overflowed
    // negative and silently dropped rows from the slices
    val big = Seq(3L, Long.MaxValue / 2, Long.MaxValue - 1).toDF("doc_id")
    val (src, _) = SparkEntry.idRangeBacklog(spark,
      Files.createTempDirectory("graft_irb1_").toString, big, nFiles = 3)
    val got = spark.read.parquet(src).select(col("doc_id"))
      .as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, Long.MaxValue / 2, Long.MaxValue - 1))
  }

  test("Bench JSON fits the driver capture: short keys, int ms, summary first") {
    assert(Bench.shortKey("q118_stream_ann_index") == "q118")
    assert(Bench.shortKey("q79b_pipeline_excise") == "q79b")
    assert(Bench.shortKey("q_dead") == "q_dead") // no qNN prefix → whole name
    // registry-wide: short keys stay unique (a collision would silently
    // merge two queries' timings in the driver artifact)
    val keys = SparkEntry.queries.keys.toSeq.map(Bench.shortKey)
    assert(keys.distinct.size == keys.size)
    // a full-suite-sized line must fit the driver's ~2.2 KB capture
    // (BENCH_r08/r09 were unparseable at ~5 KB — VERDICT r9 #2)
    val fake = SparkEntry.queries.keys.toSeq.sorted
      .map(k => k -> ((Some(12.345678901): Option[Double],
        Seq.fill(3)(Some(98.765432109): Option[Double]))))
    val line = Bench.renderJson(fake, "/root/testdata/sf0.1")
    assert(line.length < 2200, s"bench line is ${line.length} B — driver " +
      "capture is ~2.2 KB; shorten keys or values")
    assert(line.indexOf("\"failures\":") < line.indexOf("\"queries\":"))
    assert(line.contains(":98765")) // integer milliseconds
    // the sidecar keeps full fidelity
    val full = Bench.renderJsonFull(fake.take(1), "sfX")
    assert(full.contains(fake.head._1) && full.contains("98.765432109") &&
      full.contains("\"cold\":12.345678901"))
  }
}
