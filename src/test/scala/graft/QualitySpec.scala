package graft

import org.apache.spark.sql.functions._
import graft.ops.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("invalidPriceKeys: any close <= 0 rejects the whole key") {
    val df = Seq(("A", 10.0), ("A", -1.0), ("B", 5.0)).toDF("symbol", "close")
    val r = Quality.invalidPriceKeys(df, $"symbol", $"close")
      .as[(String, String)].collect().toSet
    assert(r == Set(("A", "invalid_price")))
  }

  test("gapKeys: boundary — gap of exactly maxGapDays passes, one more rejects") {
    val mk = (sym: String, dates: Seq[String]) => dates.map(d => (sym, d))
    val df = (mk("ok14", Seq("2024-01-01", "2024-01-15")) ++  // gap 14 -> pass
      mk("bad15", Seq("2024-01-01", "2024-01-16")) ++          // gap 15 -> reject
      mk("pre", Seq("2023-01-01", "2023-06-01", "2024-02-01", "2024-02-02")))
      .toDF("symbol", "s").select($"symbol", to_date($"s").as("d"))
    val r = Quality.gapKeys(df, $"symbol", $"d", 14, "2024-01-01")
      .as[(String, String)].collect().toSet
    // "pre": the 2023 gap is outside the window; inside it the gap is 1d
    assert(r == Set(("bad15", "gap_15d")))
  }

  test("ohlcViolationKeys + excludeRejected: rejected keys vanish atomically") {
    val bars = Seq(("A", 9.0, 10.0, 12.0), ("B", 9.0, 13.0, 12.0), ("C", 11.5, 11.0, 12.0))
      .toDF("symbol", "low", "close", "high")
    val bad = Quality.ohlcViolationKeys(bars, $"symbol", $"low", $"close", $"high")
    assert(bad.as[(String, String)].collect().toSet ==
      Set(("B", "ohlc_logic_error"), ("C", "ohlc_logic_error")))
    val clean = Quality.excludeRejected(bars, $"symbol", bad)
    assert(clean.select("symbol").as[String].collect().toSeq == Seq("A"))
  }
}
