package graft

import org.apache.spark.sql.functions._
import graft.ops.Resample
import java.sql.Date

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("weekEndFri maps every day to its Friday-or-later week end") {
    val dates = Seq(
      "2024-01-01" -> "2024-01-05", // Monday -> that week's Friday
      "2024-01-05" -> "2024-01-05", // Friday maps to itself
      "2024-01-06" -> "2024-01-12", // Saturday starts the next W-FRI bucket
      "2024-01-07" -> "2024-01-12", // Sunday too
      "2023-12-30" -> "2024-01-05", // year straddle: Sat into next year's Friday
      "2024-02-29" -> "2024-03-01"  // leap day (Thursday) -> next day Friday
    )
    val got = dates.map(_._1).toDF("s")
      .select(Resample.weekEndFri(to_date($"s")).cast("string").as("we"))
      .as[String].collect().toSeq
    assert(got == dates.map(_._2))
  }

  test("monthEnd and yearStart labels") {
    val got = Seq("2024-02-15", "2024-12-31", "2023-01-01").toDF("s")
      .select(Resample.monthEnd(to_date($"s")).cast("string"),
        Resample.yearStart(to_date($"s")).cast("string"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("2024-02-29", "2024-01-01"),
      ("2024-12-31", "2024-01-01"), ("2023-01-31", "2023-01-01")))
  }

  test("ohlc picks ordered first/last and aggregates high/low/volume") {
    // one symbol, one W-FRI bucket (Mon..Fri), deliberately shuffled rows
    val bars = Seq(
      ("A", "2024-01-03", 12.0, 300L, 3L),
      ("A", "2024-01-01", 10.0, 100L, 1L), // first by ord -> open
      ("A", "2024-01-05", 11.0, 500L, 5L), // last by ord -> close
      ("A", "2024-01-02", 15.0, 200L, 2L), // high
      ("A", "2024-01-04", 9.0, 400L, 4L)   // low
    ).toDF("symbol", "s", "px", "vol", "tb")
      .select($"symbol", to_date($"s").as("d"), $"px", $"vol",
        Resample.ordinal(to_date($"s"), $"tb").as("ord"))
    val out = Resample.ohlc(bars, $"symbol", Resample.weekEndFri($"d"),
      $"px", $"vol", $"ord")
    val r = out.select($"period".cast("string"), $"open", $"high", $"low",
      $"close", $"volume").as[(String, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(r == Seq(("2024-01-05", 10.0, 15.0, 9.0, 11.0, 1500.0)))
  }

  test("periodReturn: pct_change parity — first row null, round 4") {
    val bars = Seq(("A", "2024-01-31", 100.0), ("A", "2024-02-29", 103.0),
      ("A", "2024-03-31", 101.0), ("B", "2024-01-31", 50.0))
      .toDF("symbol", "period", "close")
    val r = Resample.periodReturn(bars)
      .select($"symbol", $"period", $"return")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(r == Set(
      ("A", "2024-01-31", None),
      ("A", "2024-02-29", Some(0.03)),
      ("A", "2024-03-31", Some(-0.0194)),
      ("B", "2024-01-31", None)))
  }

  test("gapFillForward: per-series day grid, carried values flagged, " +
      "spans independent per series") {
    val d = java.sql.Date.valueOf(_: String)
    val bars = Seq(
      ("A", d("2024-01-01"), 100L),
      ("A", d("2024-01-04"), 107L), // 2nd/3rd filled with 100
      ("B", d("2024-02-10"), 50L)) // single-day span: no fill
      .toDF("symbol", "dt", "px_c")
    val out = Resample.gapFillForward(bars, $"symbol", $"dt", $"px_c")
      .as[(String, java.sql.Date, Long, Boolean)].collect()
      .map(r => (r._1, r._2.toString) -> ((r._3, r._4))).toMap
    assert(out == Map(
      ("A", "2024-01-01") -> ((100L, false)),
      ("A", "2024-01-02") -> ((100L, true)),
      ("A", "2024-01-03") -> ((100L, true)),
      ("A", "2024-01-04") -> ((107L, false)),
      ("B", "2024-02-10") -> ((50L, false))))
    // B's grid never bleeds into A's span — 5 rows total, not 41+1
    assert(out.size == 5)
  }

  test("acf: alternating series pins lag parity, constant series " +
      "yields null, symbols stay isolated") {
    // A alternates 100/200: lag1 = perfect anti-correlation, lag2 =
    // perfect correlation, lag3 = anti again; pair counts 5/4/3
    val a = (0 to 5).map(i => ("A", i.toLong,
      if (i % 2 == 0) 100L else 200L))
    val b = (0 to 4).map(i => ("B", i.toLong, 100L)) // constant
    val out = Resample.acf((a ++ b).toDF("s", "o", "v"),
        $"s", $"o", $"v", 3)
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("A", 1)) == ((5L, Some(-1.0))))
    assert(out(("A", 2)) == ((4L, Some(1.0))))
    assert(out(("A", 3)) == ((3L, Some(-1.0))))
    assert(out(("B", 1)) == ((4L, None)),
      "constant series: zero variance, null not a division error")
    assert(out.size == 6)
    // duplicate (series, ord) rows now RAISE in-plan instead of
    // returning an order-dependent correlogram (pre-collapse contract)
    intercept[Exception] {
      Resample.acf(
        Seq(("A", 1L, 100L), ("A", 1L, 200L), ("A", 2L, 150L))
          .toDF("s", "o", "v"), $"s", $"o", $"v", 1).collect()
    }
  }

  test("maxDrawdown: deepest running-max fall in exact cents") {
    import org.apache.spark.sql.functions.col
    // series: 100, 120, 80, 110, 60 -> runmax 100,120,120,120,120;
    // dd 0,0,40,10,60 -> maxdd 60, rel = 60e6 // 120 = 500000
    val bars = Seq(("A", 1L, 100L), ("A", 2L, 120L), ("A", 3L, 80L),
      ("A", 4L, 110L), ("A", 5L, 60L)).toDF("k", "o", "c")
    val r = Resample.maxDrawdown(bars, col("k"), col("o"), col("c"))
      .as[(String, Long, Long, Long, Long)].head()
    assert(r == (("A", 5L, 120L, 60L, 500000L)))
  }

  test("rollingVariance: full windows only, exact (nQ-S^2)/n^2 floor") {
    import org.apache.spark.sql.functions.col
    // w=2 over 10, 10, 16: windows (10,10) var 0; (10,16) var 9
    val bars = Seq(("A", 1L, 10L), ("A", 2L, 10L), ("A", 3L, 16L))
      .toDF("k", "o", "c")
    val r = Resample.rollingVariance(bars, col("k"), col("o"),
      col("c"), 2).as[(String, Long, Long)].head()
    assert(r == (("A", 2L, 9L)),
      "(2*356 - 26^2)/4 = 9 cents^2 exactly at the peak window")
  }

  test("maseBacktest: naive-1 MAE over seasonal MAE as one " +
    "cross-multiplied floor") {
    val series = Seq(10L, 12L, 11L, 15L, 13L, 14L).zipWithIndex
      .map { case (v, i) => ("s", i.toLong, v) }.toDF("k", "o", "v")
    val r = Resample.maseBacktest(series, col("k"), col("o"),
        col("v"), 2)
      .as[(String, Long, Long, Long, Long, Option[Long])].head()
    // e1 = 2,1,4,2,1 (n 5, sum 10); e2 = 1,3,2,1 (n 4, sum 7)
    assert(r == (("s", 5L, 4L, 10L, 7L, Some(40000000L / 35L))))
    // constant series: zero seasonal mass -> null MASE, not a crash
    val const = Seq.fill(6)(5L).zipWithIndex
      .map { case (v, i) => ("c", i.toLong, v) }.toDF("k", "o", "v")
    assert(Resample.maseBacktest(const, col("k"), col("o"), col("v"),
      2).as[(String, Long, Long, Long, Long, Option[Long])]
      .head()._6.isEmpty)
  }

}
