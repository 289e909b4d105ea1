package graft.transform

import java.sql.Date

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas
import graft.validate.Validator

/** The reference's transform layer as pure `DataFrame => DataFrame`
  * functions (reference: py_pipeline/transform.py). All narrow, shuffle-free
  * projections — Catalyst fuses the whole chain into one codegen stage, so
  * these cost one pass over the data regardless of how many steps compose.
  */
object SymbolTransforms {

  /** transform_stocks_symbol_df (py_pipeline/transform.py:29-63):
    * validate → lowercase names → rename map → literal '.'→'-' symbol fix
    * (BRK.B→BRK-B) → null fills → bool cast → date stamp → 8-col projection.
    */
  def transformStockSymbols(df: DataFrame, dateStamp: Date): DataFrame = {
    val validated = Validator.validateOrThrow(df, Schemas.rawStockSymbols)
    validated
      .toDF(validated.columns.map(_.toLowerCase).toSeq: _*)
      .withColumnsRenamed(Map(
        "security" -> "name",
        "gics sector" -> "sector",
        "gics sub-industry" -> "industry",
      ))
      // literal (non-regex) replace, matching pandas str.replace(".", "-")
      .withColumn("symbol", translate(col("symbol"), ".", "-"))
      .withColumn("sector", coalesce(col("sector"), lit("Missing")))
      .withColumn("industry", coalesce(col("industry"), lit("Missing")))
      .withColumn("in_sp400", coalesce(col("in_sp400"), lit(false)).cast(BooleanType))
      .withColumn("in_sp500", coalesce(col("in_sp500"), lit(false)).cast(BooleanType))
      .withColumn("in_sp600", coalesce(col("in_sp600"), lit(false)).cast(BooleanType))
      .withColumn("date_stamp", lit(dateStamp))
      .select("symbol", "name", "sector", "industry",
        "in_sp400", "in_sp500", "in_sp600", "date_stamp")
  }

  /** transform_fx_symbol_df (py_pipeline/transform.py:66-69). */
  def transformFxSymbols(df: DataFrame): DataFrame = {
    val validated = Validator.validateOrThrow(df, Schemas.rawFxSymbols)
    validated.toDF(validated.columns.map(_.toLowerCase).toSeq: _*)
  }
}

object PriceTransforms {

  private val fields = Seq("Open", "High", "Low", "Close", "Volume")

  /** FX symbol normalization (py_pipeline/transform.py:84-89): strip the
    * Yahoo "=X" suffix, then remap the three USD-base quotes that Yahoo
    * abbreviates. The pandas `Series.replace` is a WHOLE-VALUE map (not a
    * substring replace) — hence when/otherwise, not regexp_replace.
    */
  def normalizeFxSymbol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val stripped = regexp_replace(c, "=X$", "")
    when(stripped === "CHF", "USDCHF")
      .when(stripped === "CAD", "USDCAD")
      .when(stripped === "JPY", "USDJPY")
      .otherwise(stripped)
  }

  /** transform_price_df (py_pipeline/transform.py:72-90).
    *
    * Input: the wide frame flattened to columns `Date, Field_Ticker...`
    * (SURVEY.md §1.1 — Spark has no column MultiIndex).
    * Steps: empty guard → validate (regex patterns + index) → drop
    * all-null columns (failed tickers) → wide→long unpivot via a generated
    * SQL `stack()` → lowercase/rename → timestamp→date → optional FX
    * symbol normalization.
    *
    * The unpivot keeps all-null rows (pandas `future_stack=True`,
    * transform.py:80) — absent days survive as null OHLCV and are
    * forward-filled later in staging.
    *
    * Scale: stack() is a narrow per-row expansion (no shuffle); the
    * all-null-column scan is ONE aggregate pass (the single unavoidable
    * action — the projection is data-dependent, SURVEY.md §2.3 P16).
    */
  def transformPrices(df: DataFrame, assetCategory: String): DataFrame = {
    if (df.head(1).isEmpty) return df // empty-input guard (transform.py:73-74)

    val validated = Validator
      .validateWide(df, Schemas.rawPricePatterns, Schemas.rawPriceIndex)
      .fold(vs => throw Validator.SchemaValidationException(vs), identity)

    // P16: drop columns that are entirely null (failed tickers). count()
    // ignores nulls, so one agg row gives every column's non-null count.
    val dataCols = validated.columns.filter(_ != "Date")
    val aggs = dataCols.map(c => F.count(col(c)).as(c)).toSeq
    val counts = validated.agg(aggs.head, aggs.tail: _*).head()
    val dead = dataCols.zipWithIndex
      .filter { case (_, i) => counts.getLong(i) == 0L }.map(_._1).toSet
    val live = validated.drop(dead.toSeq: _*)

    // R1: wide→long. Tickers = union of suffixes across field columns;
    // fields = union of prefixes — extra fields beyond OHLCV (e.g.
    // "Adj Close") survive the stack exactly like pandas df.stack does
    // (pandera strict=False lets them through validation).
    val liveCols = live.columns.filter(_ != "Date")
    val tickers = liveCols.map(_.split("_", 2)(1)).distinct.sorted
    val present = liveCols.map(_.split("_", 2)(0)).distinct
    val orderedFields =
      fields.filter(present.contains) ++
        present.filterNot(fields.contains).sorted
    def cellExpr(field: String, t: String): String =
      if (live.columns.contains(s"${field}_$t"))
        s"cast(`${field}_$t` as ${if (field == "Volume") "bigint" else "double"})"
      else if (field == "Volume") "cast(null as bigint)"
      else "cast(null as double)"
    val outNames = orderedFields.map(f => s"`${f.toLowerCase}`")
    val stackArgs = tickers.map { t =>
      (s"'$t'" +: orderedFields.map(f => cellExpr(f, t))).mkString(", ")
    }.mkString(", ")
    val stacked = live.select(
      col("Date"),
      expr(s"stack(${tickers.length}, $stackArgs) as " +
        s"(symbol, ${outNames.mkString(", ")})"))

    val longDf = stacked
      .withColumn("date_stamp", to_date(col("Date")))
      .drop("Date")
      .select(col("date_stamp") +: col("symbol") +:
        orderedFields.map(f => col(s"`${f.toLowerCase}`")): _*)

    if (assetCategory == "fx")
      longDf.withColumn("symbol", normalizeFxSymbol(col("symbol")))
    else longDf
  }

  /** Per-group winsorization: clip `valueCol` to its group's exact
    * [lo, hi] quantiles — the standard outlier treatment before
    * statistics on heavy-tailed financial series (a fat-finger print
    * stops dominating a daily mean without dropping the row). Quantiles
    * are sort-based EXACT percentiles with linear interpolation — the
    * same definition as DuckDB's quantile_cont, parity pinned by q74 —
    * so the clip is engine-portable. Null values pass through null.
    *
    * Scale shape: the bounds frame is one row per group (symbol
    * cardinality — dim-sized) and broadcasts to the clip join, so the
    * data is scanned twice but never shuffled; drop the broadcast hint if
    * the group count is genuinely corpus-scale.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi,
      "quantile bounds must satisfy 0 <= lo <= hi <= 1")
    val bounds = df.groupBy(groupCol).agg(
      expr(s"percentile($valueCol, $lo)").as("__wlo"),
      expr(s"percentile($valueCol, $hi)").as("__whi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(valueCol,
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol).cast("double"),
            col("__wlo")), col("__whi"))))
      .drop("__wlo", "__whi")
  }
}
