package graft

import org.apache.spark.sql.functions._
import graft.ops.{Normalize, Report}

class NormalizeReportSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).as[String].head()

  test("code canonicalization column pipelines") {
    assert(one(Normalize.zfill(lit(42), 6)) == "000042")
    assert(one(Normalize.digitsOnly(lit("a1b2-3"))) == "123")
    assert(one(Normalize.excelIntFix(lit("7203.0"))) == "7203")
    assert(one(Normalize.canonSymbol(lit("  aapl "))) == "AAPL")
    assert(one(Normalize.hkAltCode(lit("00700"))) == "700")
    assert(one(Normalize.cnRoute(lit("600519"))) == "600519.SS")
    assert(one(Normalize.cnRoute(lit("000001"))) == "000001.SZ")
  }

  test("validity predicates") {
    val checks = Seq(
      ("2330", true), ("23", false), ("A1B2C", true), ("60-1", false)
    ).toDF("code", "want")
    assert(checks.filter(Normalize.validSymbol($"code") =!= $"want").count() == 0)
    assert(one(Normalize.isDerivativeName(lit("Acme ETF Trust"))) == "true")
    assert(one(Normalize.isDerivativeName(lit("Acme Industries"))) == "false")
    assert(one(Normalize.normalizeSector(lit(" N/A "))) == "Unknown")
    assert(one(Normalize.normalizeSector(lit("Tech"))) == "Tech")
  }

  test("coverage SLA boundary: exactly 80% is OK") {
    val counts = Seq(("m1", 8L), ("m2", 7L)).toDF("market", "actual")
    val r = Report.coverage(counts, $"actual", lit(10))
      .select($"market", $"status").as[(String, String)].collect().toSet
    assert(r == Set(("m1", "OK"), ("m2", "LOW")))
  }

  test("staleKeys flags symbols behind the global max date") {
    val df = Seq(("A", "2024-03-01"), ("B", "2023-12-01"), ("B", "2023-11-01"))
      .toDF("symbol", "s").select($"symbol", to_date($"s").as("d"))
    val r = Report.staleKeys(df, $"symbol", $"d", 60)
      .select($"key").as[String].collect().toSeq
    assert(r == Seq("B"))
  }
}
