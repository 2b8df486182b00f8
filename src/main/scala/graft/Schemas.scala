package graft

import org.apache.spark.sql.types._

/** Canonical warehouse schemas — the engine-side contract for the
  * reference's data model (SURVEY §1.1/§1.2). Dates are real DateType
  * (the reference stores ISO strings and leans on lexicographic order;
  * formatting back to `yyyy-MM-dd` happens only at sink/report edges,
  * which preserves that ordering contract). Volumes are LongType — US
  * daily volumes overflow Int32.
  */
object Schemas {

  /** Fact table, logical PK (date, symbol) — reference stock_prices DDL
    * (downloader_tw.py:21-24, identical ×6). `market` is the coarse
    * partition key (one DB per market in the reference → a partition
    * column here); `version` is the ingest batch ordinal that makes the
    * keep-latest MERGE deterministic.
    */
  val stockPrices: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("market", StringType),
    StructField("version", LongType)))

  /** Dimension table, PK symbol, SCD-1 overwrite — reference stock_info
    * DDL (downloader_tw.py:25-26, identical ×6).
    */
  val stockInfo: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("name", StringType),
    StructField("sector", StringType),
    StructField("market", StringType),
    StructField("updated_at", TimestampType)))

  /** Derived period bars (weekly/monthly/yearly) with lag-based return —
    * reference WMY parquet columns (downloader_wmy.py:29-33,57),
    * anglicized.
    */
  val periodBars: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("period", DateType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("return", DoubleType)))

  /** Append-only audit log — reference wmy_conversion_audit
    * (downloader_wmy.py:66-74); AUTOINCREMENT id becomes a run UUID
    * (uniqueness, not density, is the contract).
    */
  val audit: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("market_id", StringType),
    StructField("total_symbols", LongType),
    StructField("success_count", LongType),
    StructField("skip_count", LongType),
    StructField("success_rate", DoubleType),
    StructField("execution_time", TimestampType)))

  /** Run-summary record — the report row (main.py:129-134). */
  val runSummary: StructType = StructType(Seq(
    StructField("market", StringType),
    StructField("expected", LongType),
    StructField("success", LongType),
    StructField("coverage", DoubleType),
    StructField("end_date", DateType),
    StructField("total_rows", LongType),
    StructField("status", StringType)))

  /** Typed fact row for Dataset[PriceBar] pipelines. */
  final case class PriceBar(date: java.sql.Date, symbol: String,
                            open: Double, high: Double, low: Double,
                            close: Double, volume: Long)
}
