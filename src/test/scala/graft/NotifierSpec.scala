package graft

import graft.ops.Notifier
import graft.ops.Lifecycle.MarketSummary

class NotifierSpec extends SparkSpec {

  private val tw = MarketSummary("TW", expected = 1000, success = 950,
    coverage = 95.0, status = "OK", endDate = "2026-08-11",
    totalRows = 1234567L, nRejected = 2, ranSync = true)
  private val hk = MarketSummary("HK", expected = 2000, success = 900,
    coverage = 45.0, status = "LOW", endDate = "2026-08-10",
    totalRows = 890L, nRejected = 0, ranSync = false)

  test("fail summary caps at 20 with a count suffix") {
    assert(Notifier.failSummary(Nil) == "none")
    assert(Notifier.failSummary(Seq("A", "B")) == "A, B")
    val many = (1 to 25).map(i => s"S$i")
    val s = Notifier.failSummary(many)
    assert(s.endsWith("...and 5 more") && s.contains("S20") && !s.contains("S21,"))
  }

  test("telegram brief: per-market blocks joined by separators, counts inline") {
    val msg = Notifier.renderTelegram(Seq((tw, Seq("2330", "2454")), (hk, Nil)))
    assert(msg.startsWith("<b>Global warehouse sync summary</b>"))
    assert(msg.contains("[TW report]") && msg.contains("[HK report]"))
    assert(msg.contains("coverage: <b>95.0%</b>"))
    assert(msg.contains("success: <code>950</code> / <code>1000</code>"))
    assert(msg.contains("failures: <code>2</code>"))
    assert(msg.split("\n\n---\n\n").length == 2)
  }

  test("email html: status colors, 1-decimal rate, grouped thousands") {
    val html = Notifier.renderEmailHtml(
      Seq((tw, Seq("2330")), (hk, Nil)), "2026-08-12 09:00:00")
    assert(html.contains("report time: 2026-08-12 09:00:00"))
    assert(html.contains("#28a745")) // OK market colored green
    assert(html.contains("#dc3545")) // LOW market colored red
    assert(html.contains("950 / 1000 (95.0%)"))
    assert(html.contains("900 / 2000 (45.0%)"))
    assert(html.contains("1,234,567"))
    assert(html.contains("<b>failures:</b> 2330"))
    assert(html.contains("<b>failures:</b> none"))
  }
}
