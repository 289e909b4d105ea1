package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's dbt models as `DataFrame => DataFrame` functions
  * (reference: dw_transformer/models/; `ref()` = function composition,
  * the warehouse engine's planner role is played by Catalyst).
  *
  * Scale notes:
  *  - ffill's window shuffles ONCE by `symbol` then sorts each partition by
  *    `date_stamp`; all four CASE columns share the same WindowSpec so
  *    Catalyst plans a single WindowExec (one shuffle + one sort total).
  *    Symbol cardinality (~1.5k in the reference, unbounded in general)
  *    distributes evenly; a pathological single-symbol skew would need
  *    range-chunked ffill, which the daily grain never hits.
  *  - unions are shuffle-free (UnionExec just concatenates partitions).
  */
object Models {

  /** `ffill_candles(partition_column)` macro
    * (dw_transformer/macros/ffill_candles.sql:1-19).
    *
    * EXACT semantics: a null open/high/low/close takes
    * `last_value(close) over (partition by p order by date_stamp
    *  rows between unbounded preceding and 1 preceding)` — the PREVIOUS
    * ROW'S RAW close, with NO ignore-nulls. Two consecutive all-null days
    * fill the first day and leave the second null (the previous row's close
    * is itself null). Do not "improve" to ignoreNulls=true — the oracle and
    * the reference's fixtures pin this (SURVEY.md §2.6 trap).
    * Null volume → 0.
    */
  def ffillCandles(df: DataFrame, partitionCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy("date_stamp")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevClose = last(col("close"), ignoreNulls = false).over(w)
    def patch(c: String): Column =
      when(col(c).isNull, prevClose).otherwise(col(c)).as(c)
    df.select(
      col("date_stamp"), col(partitionCol),
      patch("open"), patch("high"), patch("low"), patch("close"),
      when(col("volume").isNull, lit(0L)).otherwise(col("volume")).as("volume"))
  }

  /** Incremental ffill for dates ≥ `fromDate` WITHOUT rescanning history:
    * the frame is `rows between unbounded preceding and 1 preceding` with
    * `last(close, ignoreNulls=false)` — i.e. each row depends ONLY on the
    * previous row's raw close — so seeding the window with the single
    * latest pre-`fromDate` row per symbol reproduces the full computation
    * exactly. A daily warehouse increment therefore reads 1 day + 1 seed
    * row per symbol instead of the whole history; pinned equal to the
    * full recomputation in ModelsSpec.
    */
  def ffillCandlesIncremental(df: DataFrame, partitionCol: String,
      fromDate: java.sql.Date): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(col("date_stamp").desc)
    val seed = df.where(col("date_stamp") < fromDate)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val seeded = seed.unionByName(df.where(col("date_stamp") >= fromDate))
    ffillCandles(seeded, partitionCol).where(col("date_stamp") >= fromDate)
  }

  /** Conditional round used by stg_fx_prices (P12): USDJPY quotes carry 3dp,
    * everything else 5dp (models/staging/stg_fx_prices.sql:5-20).
    */
  private def fxRound(c: String): Column =
    when(col("symbol") === "USDJPY", round(col(c).cast(DecimalType(38, 9)), 3))
      .otherwise(round(col(c).cast(DecimalType(38, 9)), 5))
      .cast(DoubleType).as(c)

  /** stg_fx_prices (models/staging/stg_fx_prices.sql). */
  def stgFxPrices(priceHistoryFx: DataFrame): DataFrame = {
    val base = priceHistoryFx.select(
      col("date_stamp").cast(DateType).as("date_stamp"),
      col("symbol"),
      fxRound("open"), fxRound("high"), fxRound("low"), fxRound("close"),
      col("volume").cast(LongType).as("volume"))
    ffillCandles(base, "symbol")
  }

  /** stg_stock_prices (models/staging/stg_stock_prices.sql): 2dp round. */
  def stgStockPrices(priceHistoryStocks: DataFrame): DataFrame = {
    def r2(c: String): Column =
      round(col(c).cast(DecimalType(38, 9)), 2).cast(DoubleType).as(c)
    val base = priceHistoryStocks.select(
      col("date_stamp").cast(DateType).as("date_stamp"),
      col("symbol"),
      r2("open"), r2("high"), r2("low"), r2("close"),
      col("volume").cast(LongType).as("volume"))
    ffillCandles(base, "symbol")
  }

  /** stg_fx_symbols (models/staging/stg_fx_symbols.sql): the FX symbol dim
    * derived `select distinct symbol` from price history, with typed null /
    * literal attribute columns.
    */
  def stgFxSymbols(priceHistoryFx: DataFrame): DataFrame =
    priceHistoryFx.select("symbol").distinct().select(
      col("symbol"),
      lit(null).cast(StringType).as("name"),
      lit(null).cast(StringType).as("sector"),
      lit(null).cast(StringType).as("industry"),
      lit("FX").as("asset_type"),
      lit(false).as("in_sp400"),
      lit(false).as("in_sp500"),
      lit(false).as("in_sp600"),
      lit(null).cast(DateType).as("date_stamp"))

  /** stg_stock_symbols (models/staging/stg_stock_symbols.sql). */
  def stgStockSymbols(symbolsSpStocks: DataFrame): DataFrame =
    symbolsSpStocks.select(
      col("symbol"), col("name"), col("sector"), col("industry"),
      lit("Stock").as("asset_type"),
      col("in_sp400"), col("in_sp500"), col("in_sp600"),
      col("date_stamp").cast(DateType).as("date_stamp"))

  /** dim_symbols (models/core/dim_symbols.sql): UNION ALL of the two
    * staging symbol models.
    */
  def dimSymbols(stgFx: DataFrame, stgStock: DataFrame): DataFrame =
    stgFx.unionByName(stgStock)

  /** fct_prices (models/core/fct_prices.sql): UNION ALL of the two staging
    * price models.
    */
  def fctPrices(stgFx: DataFrame, stgStock: DataFrame): DataFrame = {
    val cols = Seq("date_stamp", "symbol", "open", "high", "low", "close", "volume")
    stgFx.select(cols.map(col): _*).unionByName(stgStock.select(cols.map(col): _*))
  }
}
