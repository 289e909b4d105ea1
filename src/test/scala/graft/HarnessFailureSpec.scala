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
    val (coldOk, steadyOk) = results.head._2
    assert(coldOk.exists(_ > 0) && steadyOk.exists(_ > 0))
    assert(results(1)._2 == (None, None))
    val json = Bench.renderJson(results, "sfX")
    assert(json.contains("\"q_dead\":null"))
    assert(json.contains("\"failures\":1"))
    assert(json.contains("\"failed\":[\"q_dead\"]"))
    assert(!json.contains("\"q_ok\":null"))
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
      .map(k => k -> (Some(12.345678901): Option[Double],
        Some(98.765432109): Option[Double]))
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
