package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator family from SURVEY §2 on
  * the driver's synthetic warehouse (TESTDATA.md): `lineitem` plays the
  * stock_prices fact (l_partkey≙symbol, l_shipdate≙date,
  * l_extendedprice≙price, l_quantity≙volume), `part`/`customer`/`nation`/
  * `region` play stock_info-style dimensions, `events` plays the intraday
  * feed, `documents`/`embeddings` drive the training-data-pipeline ops.
  *
  * `oracleSql` holds the DuckDB-equivalent SQL; column aliases match the
  * Spark output exactly (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  // ---- shared building blocks -------------------------------------------

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** lineitem projected as a bar series: symbol/date/px/vol plus a unique
    * monotone ordinal for deterministic first/last (SURVEY §2.5 A1).
    */
  private def bars(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.select(
      col("l_partkey").as("symbol"),
      to_date(col("l_shipdate")).as("d"),
      col("l_extendedprice").as("px"),
      col("l_quantity").as("vol"),
      Resample.ordinal(to_date(col("l_shipdate")),
        col("l_orderkey") * 10 + col("l_linenumber")).as("ord"))
  }

  /** DuckDB rendering of the same projection (kept in lockstep with bars). */
  private val barsSql =
    """SELECT l_partkey AS symbol, CAST(l_shipdate AS DATE) AS d,
      |  l_extendedprice AS px, l_quantity AS vol,
      |  date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) * 100000000
      |    + l_orderkey * 10 + l_linenumber AS ord
      |FROM lineitem""".stripMargin

  /** DuckDB week-end-Friday: smallest Friday >= d (isodow: Mon=1..Sun=7). */
  private val weekEndSqlFn = "d + CAST((5 - isodow(d) + 7) % 7 AS INTEGER)"

  private def ohlcSql(bucketExpr: String): String =
    s"""SELECT symbol, $bucketExpr AS period,
       |  arg_min(px, ord) AS open, max(px) AS high, min(px) AS low,
       |  arg_max(px, ord) AS close, round(sum(vol), 2) AS volume
       |FROM ($barsSql) GROUP BY symbol, period""".stripMargin

  // ---- the query inventory ----------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/W3: flagship calendar resample, Friday-anchored weeks.
    "q01_weekly_bars" -> ((s, dir) =>
      Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.weekEndFri(col("d")), col("px"), col("vol"), col("ord"))),

    "q02_monthly_bars" -> ((s, dir) =>
      Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.monthEnd(col("d")), col("px"), col("vol"), col("ord"))),

    "q03_yearly_bars" -> ((s, dir) =>
      Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.yearStart(col("d")), col("px"), col("vol"), col("ord"))),

    // W1: lag-based period return over monthly closes.
    "q04_period_return" -> ((s, dir) => {
      val monthly = Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.monthEnd(col("d")), col("px"), col("vol"), col("ord"))
      Resample.periodReturn(monthly)
        .select("symbol", "period", "close", "return")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_weekly_bars" -> ohlcSql(weekEndSqlFn),
    "q02_monthly_bars" -> ohlcSql("last_day(d)"),
    "q03_yearly_bars" -> ohlcSql("CAST(date_trunc('year', d) AS DATE)"),
    "q04_period_return" ->
      s"""SELECT symbol, period, close,
         |  round(close / lag(close) OVER (PARTITION BY symbol ORDER BY period) - 1, 4) AS "return"
         |FROM (${ohlcSql("last_day(d)")})""".stripMargin
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_weekly_bars")(spark, "/root/testdata/sf0.001")
}
