package graft

import org.apache.spark.sql.functions._
import graft.ops.Web

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Web.canonicalizeUrl($"url")).as[String]
      .collect().toSeq

  test("canonicalizeUrl collapses every noise axis to one form") {
    val variants = Seq(
      "HTTPS://www.cdn.a-site.net:443/p/12/?utm_source=feed&id=12&ref=rss#sec",
      "http://cdn.a-site.net/p/12?id=12",
      "https://CDN.a-site.net:80/p/12/?id=12&utm_campaign=x",
      "cdn.a-site.net/p/12?fbclid=abc&id=12")
    assert(canon(variants: _*).distinct == Seq("cdn.a-site.net/p/12?id=12"))
  }

  test("canonicalizeUrl: param order sorts, non-tracking params survive, " +
      "path case preserved, bare host stable") {
    assert(canon("http://x.com/A/B?z=1&a=2") == Seq("x.com/A/B?a=2&z=1"))
    assert(canon("http://x.com") == Seq("x.com"))
    assert(canon("x.com/p?utm_a=1&utm_b=2") == Seq("x.com/p"))
    // idempotent: canonicalizing a canonical form is the identity
    val once = canon("HTTPS://www.x.com:443/p/?b=2&a=1#f").head
    assert(canon(once) == Seq(once))
  }

  test("registeredDomain keeps the last two labels") {
    val d = Seq("https://a.b.example.com/x", "http://example.com/y")
      .toDF("url").select(Web.registeredDomain($"url")).as[String]
      .collect().toSeq
    assert(d == Seq("example.com", "example.com"))
  }

  test("registeredDomainsPsl: longest suffix wins, wildcards match one " +
      "extra label, no-match falls back to two labels, a bare public " +
      "suffix yields null") {
    val psl = Seq("co.uk", "github.io", "*.compute.example")
      .toDF("suffix")
    val urls = Seq(
      (1L, "https://shop.some-corp.co.uk/x"),      // 3-label under co.uk
      (2L, "http://a.b.github.io/y"),              // deep under github.io
      (3L, "https://www.plain.net/z"),             // no PSL → 2-label rule
      (4L, "http://co.uk/"),                       // host IS a suffix
      (5L, "https://vm1.eu1.compute.example/q"),   // wildcard: eu1 public
      (6L, "http://localhost/p"))                  // single label
      .toDF("doc_id", "url")
    val out = Web.registeredDomainsPsl(urls, "doc_id", $"url", psl)
      .as[(Long, String, Option[String])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out(1L) == Some("some-corp.co.uk"))
    assert(out(2L) == Some("b.github.io"))
    assert(out(3L) == Some("plain.net"))
    assert(out(4L) == None, "a public suffix has no registered domain")
    // "*.compute.example" makes eu1.compute.example public → one more
    // label is the registered domain
    assert(out(5L) == Some("vm1.eu1.compute.example"))
    assert(out(6L) == None, "single label under the default rule")
  }

  test("dedupByCanonicalUrl keeps the smallest ord (longest doc) per group") {
    val df = Seq(
      (1L, "http://x.com/p?id=1", 5),
      (2L, "HTTPS://www.x.com/p/?id=1&utm_source=a", 9),
      (3L, "http://x.com/q", 2)).toDF("doc_id", "url", "len")
    val r = Web.dedupByCanonicalUrl(df, $"doc_id", $"url", -$"len")
      .orderBy($"canonical_url")
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("x.com/p?id=1", 2L, 2L), ("x.com/q", 3L, 1L)))
  }

  test("urlNoveltyByDomain: noise-only re-crawls count zero novelty, " +
      "unseen canonicals count once per distinct URL") {
    val corpus = Seq(
      (1L, "http://x.com/a"), (2L, "http://x.com/b"),
      (3L, "http://y.com/a")).toDF("doc_id", "url")
    val inc = Seq(
      // x.com/a again under noise → not novel
      (10L, "HTTPS://www.x.com/a/?utm_source=z"),
      // x.com/c twice with different noise → ONE novel canonical
      (11L, "http://x.com/c?id=1"),
      (12L, "https://x.com/c/?id=1&fbclid=q"),
      // z.com entirely new
      (13L, "http://z.com/a")).toDF("doc_id", "url")
    val out = Web.urlNoveltyByDomain(corpus, inc, $"url")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      "x.com" -> ((2L, 1L, 0.5)), // {x.com/a, x.com/c?id=1}, c novel
      "z.com" -> ((1L, 1L, 1.0))))
  }

  test("domainQualityGate flags only domains with mean below the floor") {
    val df = Seq(
      (1L, "http://good.com/a", 0.9), (2L, "http://good.com/b", 0.7),
      (3L, "http://bad.com/a", 0.2), (4L, "http://bad.com/b", 0.3))
      .toDF("doc_id", "url", "q")
    val r = Web.domainQualityGate(df, $"url", $"q", 0.5)
      .orderBy($"domain")
      .select($"domain", $"n_docs", $"mean_quality", $"flagged")
      .as[(String, Long, Double, Boolean)].collect().toSeq
    assert(r == Seq(("bad.com", 2L, 0.25, true), ("good.com", 2L, 0.8, false)))
  }

  test("mirrorMatrix: drift = same canon different fp; mirror = same fp across domains") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "http://a.com/x", "F1"),
      (2L, "https://A.COM/x/", "F2"),   // same canonical as d1
      (3L, "http://b.com/y", "F3"),
      (4L, "http://c.com/z", "F3"))     // F3 spans b.com and c.com
      .toDF("id", "url", "fp")
    val r = Web.mirrorMatrix(docs, col("id"), col("url"), col("fp"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((4L, 3L, 1L, 2L, 1L, 2L)))
  }
}
