package graft.pipeline

import java.nio.file.Files
import java.sql.Date

import graft.SparkSpec

class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lake = {
    val root = Files.createTempDirectory("graft_lake_").toString
    Seq(
      (Date.valueOf("2024-01-01"), "EURUSD", 1.1),
      (Date.valueOf("2024-01-02"), "EURUSD", 1.2),
      (Date.valueOf("2024-01-02"), "USDJPY", 150.0),
      (Date.valueOf("2024-01-03"), "USDJPY", 151.0))
      .toDF("date_stamp", "symbol", "close")
      .write.parquet(s"$root/price_history/fx")
    root
  }

  test("column selection prunes; date range filters; both push to the scan") {
    val df = Extract.fromLake(spark, lake, "price_history", "fx",
      columns = Some(Seq("date_stamp", "symbol")),
      dateRange = Some((Date.valueOf("2024-01-02"), Date.valueOf("2024-01-03"))))
    assert(df.columns.toSeq == Seq("date_stamp", "symbol"))
    assert(df.count() == 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(date_stamp"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("close"), s"close not pruned: $readSchema")
  }

  test("symbolsOnly reduces to the distinct universe") {
    assert(Extract.symbolUniverse(spark, lake, "price_history", "fx") ==
      Seq("EURUSD", "USDJPY"))
  }
}
