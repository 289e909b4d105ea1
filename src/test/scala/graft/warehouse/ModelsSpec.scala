package graft.warehouse

import java.sql.Date

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Pins the ffill_candles window semantics, including the reference's own
  * dbt unit-test rows (dw_transformer/models/properties.yml:172-198) and
  * the SURVEY.md §2.6 trap: NO ignore-nulls, so two consecutive all-null
  * days fill the first gap day and leave the second null.
  */
class ModelsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private def ph(rows: (String, String, Option[Double], Option[Double],
      Option[Double], Option[Double], Option[Long])*) =
    rows.toSeq.map { case (ds, sym, o, h, l, c, v) =>
      (d(ds), sym, o, h, l, c, v)
    }.toDF("date_stamp", "symbol", "open", "high", "low", "close", "volume")

  test("ffill fills a single all-null day with the previous raw close") {
    // the dbt unit-test shape: day 2 entirely null -> takes day 1's close
    val in = ph(
      ("2024-01-01", "A", Some(1.0), Some(2.0), Some(0.5), Some(1.5), Some(10L)),
      ("2024-01-02", "A", None, None, None, None, None),
      ("2024-01-03", "A", Some(2.0), Some(3.0), Some(1.0), Some(2.5), Some(5L)))
    val out = Models.ffillCandles(in, "symbol")
      .orderBy("date_stamp")
      .collect()
    assert(out(1).getDouble(2) == 1.5) // open <- prev close
    assert(out(1).getDouble(3) == 1.5) // high
    assert(out(1).getDouble(4) == 1.5) // low
    assert(out(1).getDouble(5) == 1.5) // close
    assert(out(1).getLong(6) == 0L)    // null volume -> 0
  }

  test("two consecutive all-null days: first fills, second stays null") {
    val in = ph(
      ("2024-01-01", "A", Some(1.0), Some(2.0), Some(0.5), Some(1.5), Some(10L)),
      ("2024-01-02", "A", None, None, None, None, None),
      ("2024-01-03", "A", None, None, None, None, None))
    val out = Models.ffillCandles(in, "symbol").orderBy("date_stamp").collect()
    assert(out(1).getDouble(5) == 1.5)
    // day 3's previous row's raw close is null -> stays null (no ignoreNulls)
    assert(out(2).isNullAt(5))
    assert(out(2).isNullAt(2))
  }

  test("ffill partitions by symbol: no bleed across symbols") {
    val in = ph(
      ("2024-01-01", "A", Some(1.0), Some(1.0), Some(1.0), Some(9.0), Some(1L)),
      ("2024-01-02", "B", None, None, None, None, None))
    val out = Models.ffillCandles(in, "symbol")
      .orderBy("symbol", "date_stamp").collect()
    assert(out(1).isNullAt(5)) // B has no prior row; A's close must not leak
  }

  test("stgFxPrices: USDJPY rounds to 3dp, others 5dp") {
    val in = ph(
      ("2024-01-01", "USDJPY", Some(1.23456789), Some(1.0), Some(1.0),
        Some(1.98765432), Some(1L)),
      ("2024-01-01", "EURUSD", Some(1.23456789), Some(1.0), Some(1.0),
        Some(1.98765432), Some(1L)))
    val out = Models.stgFxPrices(in).orderBy("symbol").collect()
    val eur = out(0); val jpy = out(1)
    assert(jpy.getDouble(2) == 1.235)
    assert(eur.getDouble(2) == 1.23457)
  }

  test("reference dbt unit test: forward_fill_nulls_fx_prices, verbatim rows") {
    // given rows from dw_transformer/models/properties.yml:172-185;
    // expected from dw_transformer/tests/fixtures/stg_fx_prices_expected.sql
    val in = ph(
      ("2025-01-01", "P1", Some(1.10), Some(1.12), Some(1.09), Some(1.11), Some(1000L)),
      ("2025-01-02", "P1", None, None, None, None, None),
      ("2025-01-01", "P2", Some(1.20), Some(1.22), Some(1.19), Some(1.21), Some(1000L)),
      ("2025-01-02", "P2", None, None, None, None, None))
    val out = Models.stgFxPrices(in).orderBy("symbol", "date_stamp")
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    assert(out == Seq(
      ("2025-01-01", "P1", 1.10, 1.12, 1.09, 1.11, 1000L),
      ("2025-01-02", "P1", 1.11, 1.11, 1.11, 1.11, 0L),
      ("2025-01-01", "P2", 1.20, 1.22, 1.19, 1.21, 1000L),
      ("2025-01-02", "P2", 1.21, 1.21, 1.21, 1.21, 0L)))
  }

  test("reference dbt unit test: forward_fill_nulls_stock_prices, verbatim rows") {
    // given rows from dw_transformer/models/properties.yml:187-198;
    // expected from dw_transformer/tests/fixtures/stg_stock_prices_expected.sql
    val in = ph(
      ("2025-01-01", "S1", Some(100.00), Some(102.05), Some(99.98), Some(100.01), Some(1000L)),
      ("2025-01-02", "S1", None, None, None, None, None),
      ("2025-01-01", "S2", Some(180.15), Some(189.25), Some(178.95), Some(179.80), Some(1000L)),
      ("2025-01-02", "S2", None, None, None, None, None))
    val out = Models.stgStockPrices(in).orderBy("symbol", "date_stamp")
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    assert(out == Seq(
      ("2025-01-01", "S1", 100.00, 102.05, 99.98, 100.01, 1000L),
      ("2025-01-02", "S1", 100.01, 100.01, 100.01, 100.01, 0L),
      ("2025-01-01", "S2", 180.15, 189.25, 178.95, 179.80, 1000L),
      ("2025-01-02", "S2", 179.80, 179.80, 179.80, 179.80, 0L)))
  }

  test("incremental ffill equals full recomputation on the increment range") {
    // history with nulls straddling the increment boundary — including a
    // null seed row (the two-consecutive-null trap across the boundary)
    val in = ph(
      ("2024-01-01", "A", Some(1.0), Some(2.0), Some(0.5), Some(1.5), Some(10L)),
      ("2024-01-02", "A", None, None, None, None, None),
      ("2024-01-03", "A", None, None, None, None, Some(3L)),   // seed row: null close
      ("2024-01-04", "A", None, None, None, None, None),       // must STAY null
      ("2024-01-05", "A", Some(9.0), Some(9.0), Some(9.0), Some(9.5), None),
      ("2024-01-06", "A", None, None, None, None, Some(2L)),   // fills with 9.5
      ("2024-01-03", "B", Some(5.0), Some(5.0), Some(5.0), Some(5.5), Some(1L)),
      ("2024-01-04", "B", None, None, None, None, None))
    val from = d("2024-01-04")
    val full = Models.ffillCandles(in, "symbol")
      .where(col("date_stamp") >= from)
      .orderBy("symbol", "date_stamp").collect().toSeq
    val inc = Models.ffillCandlesIncremental(in, "symbol", from)
      .orderBy("symbol", "date_stamp").collect().toSeq
    assert(inc == full)
    // and the trap held: 01-04 for A is null (seed row's raw close is null)
    assert(inc.head.isNullAt(5))
  }

  test("fctPrices is a positional-safe UNION ALL of both staging models") {
    val fx = ph(("2024-01-01", "EURUSD", Some(1.0), Some(1.0), Some(1.0),
      Some(1.0), Some(1L)))
    val st = ph(("2024-01-02", "AAPL", Some(2.0), Some(2.0), Some(2.0),
      Some(2.0), Some(2L)))
    val out = Models.fctPrices(fx, st)
    assert(out.count() == 2)
    assert(out.columns.toSeq ==
      Seq("date_stamp", "symbol", "open", "high", "low", "close", "volume"))
  }
}
