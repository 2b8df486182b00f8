package graft

import graft.ops.Lifecycle
import graft.ops.Lifecycle.MarketConfig

class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(dir: java.io.File, name: String, rows: Seq[String]): Unit = {
    dir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(dir, name))
    try { w.println("date,open,high,low,close,volume"); rows.foreach(w.println) }
    finally w.close()
  }

  test("two markets through the full loop: ingest, merge, periods, one report") {
    withTempDir { tmp =>
      val twDir = new java.io.File(tmp, "tw"); val hkDir = new java.io.File(tmp, "hk")
      writeCsv(twDir, "2330_day.csv", Seq(
        "2024-01-02,10,12,9,11,100", "2024-01-03,11,13,10,12,100",
        "2024-01-04,12,14,11,13,100"))
      writeCsv(twDir, "badp_day.csv", Seq("2024-01-02,10,12,9,-5,100"))
      writeCsv(hkDir, "00700_day.csv", Seq(
        "2024-01-02,300,310,295,305,1000", "2024-01-03,305,312,300,308,1000"))
      val root = tmp.getAbsolutePath + "/wh"
      val cfgs = Seq(
        MarketConfig("tw", twDir.getAbsolutePath, root, expectedMinSymbols = 1,
          asOf = "2024-01-05"),
        MarketConfig("hk", hkDir.getAbsolutePath, root, expectedMinSymbols = 2,
          asOf = "2024-01-05"))

      val (summaries, report) = Lifecycle.run(spark, cfgs)

      val tw = summaries.find(_.market == "TW").get
      assert(tw.ranSync && tw.success == 1 && tw.totalRows == 3 &&
        tw.nRejected == 1 && tw.status == "OK" && tw.endDate == "2024-01-04")
      val hk = summaries.find(_.market == "HK").get
      assert(hk.ranSync && hk.success == 1 && hk.coverage == 50.0 &&
        hk.status == "LOW")

      // period outputs exist per market; rejected symbols excluded
      val weekly = spark.read.parquet(s"$root/tw/weekly")
      assert(weekly.filter($"symbol" === "BADP").count() == 0)
      assert(weekly.filter($"symbol" === "2330").count() == 1)
      assert(spark.read.parquet(s"$root/hk/weekly").count() == 1)

      // the fleet report carries both markets and the TW rejection
      assert(report.contains("market=TW") && report.contains("market=HK"))
      assert(report.contains("TW:BADP:invalid_price"))
    }
  }

  test("backfill window: startDate/endDate clamp the ingest scan (hot vs cold)") {
    withTempDir { tmp =>
      val dir = new java.io.File(tmp, "csv")
      writeCsv(dir, "2330_day.csv", Seq(
        "2022-12-28,8,9,7,8.5,100", // pre-hot-epoch history
        "2023-01-03,9,10,8,9.5,100",
        "2024-01-02,10,12,9,11,100",
        "2024-01-03,11,13,10,12,100"))
      def cfg(root: String, start: Option[String], end: Option[String]) =
        MarketConfig("tw", dir.getAbsolutePath, root, 1, asOf = "2024-01-05",
          startDate = start, endDate = end)

      // hot run: scoped to the hot epoch — pre-2023 rows never ingested
      val rootHot = tmp.getAbsolutePath + "/hot"
      val (hot, _) = Lifecycle.runMarket(spark,
        cfg(rootHot, Some("2023-01-01"), None))
      assert(hot.ranSync && hot.totalRows == 3)
      val hotDates = spark.read.parquet(s"$rootHot/tw/prices")
        .select($"date".cast("string")).as[String].collect().toSet
      assert(hotDates == Set("2023-01-03", "2024-01-02", "2024-01-03"))

      // cold backfill: unbounded window picks up the full history
      val rootCold = tmp.getAbsolutePath + "/cold"
      val (cold, _) = Lifecycle.runMarket(spark, cfg(rootCold, None, None))
      assert(cold.totalRows == 4)

      // a bounded historical slice clamps both ends
      val rootSlice = tmp.getAbsolutePath + "/slice"
      val (slice, _) = Lifecycle.runMarket(spark,
        cfg(rootSlice, Some("2023-01-01"), Some("2023-12-31")))
      val sliceDates = spark.read.parquet(s"$rootSlice/tw/prices")
        .select($"date".cast("string")).as[String].collect().toSet
      assert(slice.totalRows == 1 && sliceDates == Set("2023-01-03"))
    }
  }

  test("snapshot-backed lifecycle: atomic merges, versioned store, same summaries") {
    withTempDir { tmp =>
      val dir = new java.io.File(tmp, "csv")
      writeCsv(dir, "2330_day.csv", Seq(
        "2024-01-02,10,12,9,11,100", "2024-01-03,11,13,10,12,100"))
      val root = tmp.getAbsolutePath + "/wh"
      def cfg(asOf: String) = MarketConfig("tw", dir.getAbsolutePath, root, 1,
        asOf, useSnapshot = true)

      val (first, _) = Lifecycle.runMarket(spark, cfg("2024-01-03"))
      assert(first.ranSync && first.totalRows == 2 && first.success == 1)
      val prices = Lifecycle.pricesPath(cfg("2024-01-03"))
      assert(graft.sources.Snapshot.latestVersion(prices).contains(1L))

      // up-to-date -> gate skips, no new snapshot version
      val (second, _) = Lifecycle.runMarket(spark, cfg("2024-01-03"))
      assert(!second.ranSync)
      assert(graft.sources.Snapshot.latestVersion(prices).contains(1L))

      // newer asOf -> idempotent re-merge publishes version 2, same rows
      val (third, _) = Lifecycle.runMarket(spark, cfg("2024-01-05"))
      assert(third.ranSync && third.totalRows == 2)
      assert(graft.sources.Snapshot.latestVersion(prices).contains(2L))
    }
  }

  test("freshness gate: an up-to-date store skips sync; a newer asOf re-runs idempotently") {
    withTempDir { tmp =>
      val dir = new java.io.File(tmp, "csv")
      writeCsv(dir, "aapl_day.csv", Seq(
        "2024-01-02,10,12,9,11,100", "2024-01-03,11,13,10,12,100"))
      val root = tmp.getAbsolutePath + "/wh"
      def cfg(asOf: String) = MarketConfig("us", dir.getAbsolutePath, root, 1, asOf)

      val (first, _) = Lifecycle.runMarket(spark, cfg("2024-01-03"))
      assert(first.ranSync && first.totalRows == 2)

      // store max date == asOf -> no sync, same summary
      val (second, _) = Lifecycle.runMarket(spark, cfg("2024-01-03"))
      assert(!second.ranSync && second.totalRows == 2)

      // later asOf -> sync runs again; the merge is idempotent (same rows)
      val (third, _) = Lifecycle.runMarket(spark, cfg("2024-01-05"))
      assert(third.ranSync && third.totalRows == 2 && third.success == 1)
    }
  }
}
