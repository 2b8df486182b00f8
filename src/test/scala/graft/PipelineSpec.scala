package graft

import org.apache.spark.sql.functions._
import graft.ops.{Merge, Pipeline}
import org.apache.spark.sql.types._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeCsv(dir: java.io.File, name: String, rows: Seq[String]): Unit = {
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f)
    try { w.println("date,open,high,low,close,volume"); rows.foreach(w.println) }
    finally w.close()
  }

  test("ingestCsvDir derives the symbol from the file name") {
    withTempDir { dir =>
      writeCsv(dir, "aapl_day.csv", Seq("2024-01-02,10,12,9,11,100"))
      writeCsv(dir, "msft_day.csv", Seq("2024-01-02,20,22,19,21,200"))
      val got = Pipeline.ingestCsvDir(spark, dir.getAbsolutePath)
        .select($"symbol", $"close").as[(String, Double)].collect().toSet
      assert(got == Set(("AAPL", 11.0), ("MSFT", 21.0)))
    }
  }

  test("dailySlice end-to-end: resample + returns + atomic rejection") {
    withTempDir { dir =>
      // GOOD: two full weeks (Mon-Fri) of bars
      val week1 = Seq(
        "2024-01-01,10,12,9,11,100", "2024-01-02,11,13,10,12,100",
        "2024-01-03,12,14,11,13,100", "2024-01-04,13,15,12,14,100",
        "2024-01-05,14,16,13,15,100")
      val week2 = Seq(
        "2024-01-08,15,17,14,16,100", "2024-01-09,16,18,15,17,100",
        "2024-01-10,17,19,16,18,100", "2024-01-11,18,20,17,19,100",
        "2024-01-12,19,21,18,20,100")
      writeCsv(dir, "good_day.csv", week1 ++ week2)
      // BADPRICE: a non-positive close -> invalid_price
      writeCsv(dir, "badprice_day.csv",
        Seq("2024-01-02,10,12,9,-1,100", "2024-01-03,10,12,9,11,100"))
      // GAPPY: a 20-day hole after the window start -> gap_20d
      writeCsv(dir, "gappy_day.csv",
        Seq("2024-01-02,10,12,9,11,100", "2024-01-22,10,12,9,11,100"))

      val out = Pipeline.dailySlice(
        Pipeline.ingestCsvDir(spark, dir.getAbsolutePath))

      val rej = out.rejections.as[(String, String)].collect().toMap
      assert(rej == Map("BADPRICE" -> "invalid_price", "GAPPY" -> "gap_20d"))

      // rejected symbols appear in NO period output
      for (df <- Seq(out.weekly, out.monthly, out.yearly))
        assert(df.filter($"symbol" =!= "GOOD").count() == 0)

      val wk = out.weekly.orderBy($"period")
        .select($"period".cast("string"), $"open", $"high", $"low", $"close",
          $"volume", $"return")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      assert(wk.toSeq == Seq(
        ("2024-01-05", 10.0, 16.0, 9.0, 15.0, 500L, None),
        ("2024-01-12", 15.0, 21.0, 14.0, 20.0, 500L, Some(0.3333))))

      val mo = out.monthly.select($"period".cast("string"), $"open", $"close")
        .as[(String, Double, Double)].collect().toSeq
      assert(mo == Seq(("2024-01-31", 10.0, 20.0)))

      val sm = out.summary
        .select($"n_symbols", $"total_rows", $"n_rejected")
        .as[(Long, Long, Long)].head()
      assert(sm == ((1L, 10L, 2L)))
    }
  }

  test("multi-gate failure resolves to the reference's first-gate reason, every run") {
    withTempDir { dir =>
      // BOTH gates fail: a non-positive close AND a 20-day hole. The
      // reference checks price before continuity (downloader_wmy.py:98-107)
      // so the reported reason must be invalid_price — deterministically,
      // not whichever union branch an unordered first() saw.
      writeCsv(dir, "both_day.csv",
        Seq("2024-01-02,10,12,9,-1,100", "2024-01-22,10,12,9,11,100"))
      val reasons = (1 to 5).map { _ =>
        Pipeline.dailySlice(Pipeline.ingestCsvDir(spark, dir.getAbsolutePath))
          .rejections.as[(String, String)].collect().toSeq
      }
      assert(reasons.forall(_ == Seq(("BOTH", "invalid_price"))), reasons)
    }
  }

  test("dailySlice rejects OHLC-invariant violations on resampled bars") {
    withTempDir { dir =>
      // close of the last day exceeds every high -> weekly close > max(high)
      writeCsv(dir, "weird_day.csv",
        Seq("2024-01-02,10,12,9,11,100", "2024-01-03,10,12,9,99,100"))
      val out = Pipeline.dailySlice(
        Pipeline.ingestCsvDir(spark, dir.getAbsolutePath))
      // close 99 > high 12 on the resampled week -> ohlc_logic_error
      assert(out.rejections.as[(String, String)].collect().toSet ==
        Set(("WEIRD", "ohlc_logic_error")))
      assert(out.weekly.count() == 0 && out.monthly.count() == 0)
    }
  }

  test("writeSlice persists periods and an audit row") {
    withTempDir { dir =>
      writeCsv(dir, "ok_day.csv",
        Seq("2024-01-02,10,12,9,11,100", "2024-01-03,10,12,9,12,100"))
      val root = dir.getAbsolutePath + "/wh"
      val out = Pipeline.dailySlice(
        Pipeline.ingestCsvDir(spark, dir.getAbsolutePath))
      Pipeline.writeSlice(out, root, "test")
      assert(spark.read.parquet(s"$root/weekly").count() == 1)
      val audit = spark.read.parquet(s"$root/audit")
        .select($"market_id", $"success_count", $"skip_count", $"success_rate")
        .as[(String, Long, Long, Double)].head()
      assert(audit == (("test", 1L, 0L, 100.0)))
    }
  }

  test("reconcileSchema adds missing typed columns idempotently") {
    val target = StructType(Seq(
      StructField("symbol", StringType), StructField("name", StringType),
      StructField("sector", StringType), StructField("market", StringType)))
    val legacy = Seq(("A", "Acme")).toDF("symbol", "name")
    val once = Pipeline.reconcileSchema(legacy, target)
    assert(once.schema.fieldNames.toSeq ==
      Seq("symbol", "name", "sector", "market"))
    val twice = Pipeline.reconcileSchema(once, target)
    assert(twice.schema == once.schema && twice.count() == 1)
    assert(once.filter($"sector".isNull && $"market".isNull).count() == 1)
  }

  test("compact rewrites to a bounded file count") {
    withTempDir { dir =>
      val path = dir.getAbsolutePath + "/t"
      spark.range(1000).repartition(8).write.parquet(path)
      assert(new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet")) == 8)
      val out = dir.getAbsolutePath + "/compacted"
      Merge.compact(spark.read.parquet(path), 2, out)
      assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet")) == 2)
      assert(spark.read.parquet(out).count() == 1000)
    }
  }
}
