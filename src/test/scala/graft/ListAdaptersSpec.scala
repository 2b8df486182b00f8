package graft

import graft.sources.ListAdapters

class ListAdaptersSpec extends SparkSpec {
  import spark.implicits._

  private val nbsp = ' '

  test("parseHtmlTables strips markup, decodes entities, tolerates attributes") {
    val html =
      s"""<html><body><p>noise</p>
         |<TABLE class="h4" style="x">
         |  <tr><th>有價證券代號</th><th>有價證券名稱</th><th>產業別</th></tr>
         |  <tr><td><b>2330</b></td><td>T&amp;SMC&nbsp;</td><td>半導體</td></tr>
         |  <tr><td>123</td><td>short code</td><td></td></tr>
         |</TABLE></body></html>""".stripMargin
    val tables = ListAdapters.parseHtmlTables(html)
    assert(tables.size == 1)
    assert(tables.head == Seq(
      Seq("有價證券代號", "有價證券名稱", "產業別"),
      Seq("2330", "T&SMC", "半導體"),
      Seq("123", "short code", "")))
  }

  test("twStockList filters validity and routes the market suffix") {
    val html =
      """<table>
        |<tr><th>有價證券代號</th><th>有價證券名稱</th><th>產業別</th></tr>
        |<tr><td>2330</td><td>TSMC</td><td>半導體</td></tr>
        |<tr><td>12</td><td>too short</td><td>x</td></tr>
        |<tr><td>00X!</td><td>not alnum</td><td>x</td></tr>
        |<tr><td>00632R</td><td>ETF6</td><td>nan</td></tr>
        |</table>""".stripMargin
    val df = ListAdapters.htmlTableDf(spark, html)
    val got = ListAdapters.twStockList(df, ".TW")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("2330.TW", "TSMC", "半導體"),
      ("00632R.TW", "ETF6", "Unknown")))
  }

  test("hkStockList: offset header row, nbsp-padded headers, zfill-5 codes") {
    // the sheet starts with banner/preamble rows; the real header sits at
    // index 2 and its cells are padded with non-breaking spaces
    val rows = Seq(
      Seq("Securities Using Standard Transfer Form"),
      Seq("", "as of 2026"),
      Seq(s"Stock${nbsp}Code", s"${nbsp}Short Name$nbsp", "Category"),
      Seq("1", s"CKH${nbsp}HOLDINGS", "Equity"),       // zfill -> 00001
      // digit-strip parity with the reference: str(700.0) -> "7000" ->
      // "07000" (re.sub(r"\D","") keeps the mantissa digit)
      Seq("700.0", "TENCENT", "Equity"),
      Seq("123456", "OUT OF RANGE", "Equity"),         // 123456 > 99999 -> drop
      Seq("abc", "NO DIGITS", "Equity"),               // no digits -> drop
      Seq("005936", "PADDED6", "Equity"))              // value 5936 valid, zfill keeps len 6
    val got = ListAdapters.hkStockList(spark, rows)
      .select($"symbol", $"name", $"sector", $"market")
      .as[(String, String, String, String)].collect().toSet
    assert(got == Set(
      ("00001", "CKH HOLDINGS", "HK-Share", "HKEX"),
      ("07000", "TENCENT", "HK-Share", "HKEX"),
      ("005936", "PADDED6", "HK-Share", "HKEX")))
  }

  test("discoverHeaderRow only probes the leading rows") {
    val rows = (0 until 30).map(i => Seq(s"noise$i")) ++
      Seq(Seq("Stock Code", "Short Name"))
    assert(ListAdapters.discoverHeaderRow(rows, Seq("Stock Code", "Short Name")).isEmpty)
  }

  test("jpStockList: excel-float fix, 4-digit common stock only, ETF drop") {
    val df = Seq(
      ("7203.0", "TOYOTA MOTOR", "Prime (Domestic)", "Transportation Equipment"),
      ("1305.0", "ETF FUND", "ETFs/ ETNs", "-"),
      ("135A0", "NOT 4 DIGIT", "Growth (Domestic)", "-"),
      (null, "NULL CODE", "Prime", "-"),
      ("8035.0", "TOKYO ELECTRON", "Prime (Domestic)", null))
      .toDF("Local Code", "Name (English)", "Section/Products", "33 Sector(name)")
    val got = ListAdapters.jpStockList(df)
      .as[(String, String, String, String)].collect().toSet
    assert(got == Set(
      ("7203.T", "TOYOTA MOTOR", "Transportation Equipment", "Prime (Domestic)"),
      ("8035.T", "TOKYO ELECTRON", "Unknown", "Prime (Domestic)")))
  }

  test("kindIndustryMap zero-pads codes to 6") {
    val df = Seq(("5930", "전기전자"), ("105560", "금융")).toDF("종목코드", "업종")
    val got = ListAdapters.kindIndustryMap(df)
      .as[(String, String)].collect().toSet
    assert(got == Set(("005930", "전기전자"), ("105560", "금융")))
  }

  test("twStockLists skips warrant categories before parsing and dedups symbols") {
    val html =
      """<table><tr><th>有價證券代號</th><th>有價證券名稱</th></tr>
        |<tr><td>2330</td><td>TSMC</td></tr></table>""".stripMargin
    val got = ListAdapters.twStockLists(spark, Seq(
      ("listed", ".TW", html),
      ("warrant_call", ".TW", "<not even html"), // must never be parsed
      ("etf", ".TW", html)))                      // duplicate symbol -> dedup
      .select($"symbol", $"name").as[(String, String)].collect().toSeq
    assert(got == Seq(("2330.TW", "TSMC")))
  }

  test("fromCells pads ragged rows and disambiguates duplicate headers") {
    val df = ListAdapters.fromCells(spark,
      Seq("a", "a", ""), Seq(Seq("1", "2", "3"), Seq("only")))
    assert(df.columns.toSeq == Seq("a", "a_1", "_c2"))
    val got = df.collect().map(r => (0 until 3).map(i =>
      Option(r.getString(i)).getOrElse("∅")).mkString(",")).toSet
    assert(got == Set("1,2,3", "only,∅,∅"))
  }
}
