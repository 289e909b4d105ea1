package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.types._

/** Reader for the reference's raw wide-price CSV fixtures
  * (tests/data/raw_{fx,sp500}_prices.csv): pandas
  * `read_csv(header=[0,1], index_col=[0], parse_dates=True)` layout —
  *
  * ```
  * Price,Open,High,...        <- header row 1: field per column
  * Ticker,JPY=X,JPY=X,...     <- header row 2: ticker per column
  * Date,,,,                   <- pandas index-name row (optional)
  * 2000-01-03 00:00:00+00:00,110.68,...
  * ```
  *
  * Spark has no column MultiIndex, so the two header rows flatten to
  * `Field_Ticker` names — the shape `PriceTransforms.transformPrices`
  * consumes (extra fields like `Adj Close` flow through, matching pandera
  * strict=False). Only the header lines are read on the driver; the data
  * loads distributed with an explicit schema (no inference pass).
  */
object WideCsv {

  def read(spark: SparkSession, path: String): DataFrame = {
    val head = spark.read.textFile(path).limit(3).collect()
    require(head.length >= 2, s"expected a multi-row header in $path")
    val fields = head(0).split(",", -1)
    val tickers = head(1).split(",", -1)
    require(fields.length == tickers.length, "header rows must have equal arity")
    // pandas writes an index-name row ("Date,,,...") after the header pair
    val indexNameRow = head.length > 2 &&
      head(2).split(",", -1).drop(1).forall(_.isEmpty)
    val skip = if (indexNameRow) 3 else 2

    // column 0 is the datetime index (its header cells are the level
    // names "Price"/"Ticker", not data) — the rest flatten to Field_Ticker
    val names = "Date" +: fields.zip(tickers).drop(1).map {
      case (f, t) => s"${f}_$t"
    }.toSeq
    val schema = StructType(
      StructField("Date", TimestampType, nullable = false) +:
        names.drop(1).map { n =>
          if (n.startsWith("Volume_")) StructField(n, LongType, nullable = true)
          else StructField(n, DoubleType, nullable = true)
        })

    // drop the header lines, then parse distributed with the schema
    val lines = spark.sparkContext.textFile(path)
      .zipWithIndex().filter(_._2 >= skip).map(_._1)
    val ds: Dataset[String] = spark.createDataset(lines)(Encoders.STRING)
    spark.read
      .schema(schema)
      .option("header", "false")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssXXX")
      .option("mode", "FAILFAST")
      .csv(ds)
  }
}
