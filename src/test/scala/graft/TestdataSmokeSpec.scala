package graft

import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.TimestampType

/** Guards against driver-testdata schema drift — the class of break that
  * killed round 8: `events.ts` changed physical parquet type
  * (INT64-nanos → TIMESTAMP_NTZ micros) and every synthetic-fixture test
  * stayed green while 21 driver queries died at analysis. These tests run
  * the REAL testdata through the same loader the driver queries use, so
  * the next drift fails `sbt test` instead of silently zeroing the round's
  * correctness rows. Skipped (assume) on machines without `/root/testdata`.
  */
class TestdataSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def present = new java.io.File(sfDir).isDirectory

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every testdata table loads and analyzes through the shared loader") {
    assume(present, s"$sfDir not present")
    for (name <- tables) {
      val df = SparkEntry.t(spark, sfDir, name)
      assert(df.limit(1).count() == 1L, s"table $name is empty")
    }
  }

  test("events.ts normalizes to a session-TZ timestamp usable downstream") {
    assume(present, s"$sfDir not present")
    val df = SparkEntry.t(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // the r8 break died exactly at this analysis step
    assert(df.select(expr("unix_micros(ts)")).limit(1).count() == 1L)
  }

  test("entry (driver t1 smoke gate) returns rows on sf0.001") {
    assume(present, s"$sfDir not present")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // one query per table family — catches schema drift the bare loader
  // pass can't (a changed props JSON type, an embedding element type
  // drift, a date column becoming a string all die HERE, not in the
  // driver run). Picks are cheap at sf0.001.
  private val representatives = Seq(
    "q01_pruned_scan", // lineitem: dates, decimals
    "q55_profile", // orders: profile over every column class
    "q30_dedup_exact", // documents: text kernels
    "q38_sim_bruteforce", // embeddings: float-array vector ops
    "q48_json_extract") // events: ts + props JSON

  test("one representative query per table family runs on sf0.001") {
    assume(present, s"$sfDir not present")
    for (name <- representatives) {
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
