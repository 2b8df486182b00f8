package graft

import org.apache.spark.sql.functions._
import graft.ops.Text

/** Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003):
  * brute-force parity, the detection guarantee, density, and the
  * short-document degradation path.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Reference 60-bit md5 hash — Dedup.hashLong parity. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Driver-side tokenizer — Text.tokens parity. */
  private def tokensOf(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  /** Driver-side reference winnowing over one token sequence. */
  private def refWinnow(toks: Seq[String], k: Int, w: Int): Set[(Long, Int)] = {
    val hs = toks.sliding(k).filter(_.size == k)
      .map(g => h60(g.mkString(" "))).toVector
    if (hs.isEmpty) Set.empty
    else if (hs.size < w) {
      // single global window, rightmost min
      val m = hs.min
      Set((m, hs.lastIndexOf(m)))
    } else {
      (0 to hs.size - w).map { s =>
        val win = hs.slice(s, s + w)
        val m = win.min
        (m, s + win.lastIndexOf(m))
      }.toSet
    }
  }

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "a completely different sentence with the quick brown fox jumps over the lazy dog inside it"),
    (2L, "short doc here now"),
    (3L, "tiny one"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (5L, ""))

  test("winnowing matches the driver-side reference selection exactly") {
    val got = Text.winnowingFingerprints(corpus.toDF("doc_id", "text"),
        $"doc_id", $"text", 4, 4)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (id, r) => id -> r.map(x => (x._2, x._3)).toSet }
    val want = corpus.map { case (id, text) =>
      id -> refWinnow(tokensOf(text), 4, 4)
    }.filter(_._2.nonEmpty).toMap
    assert(got == want)
  }

  test("detection guarantee: a shared run of >= w+k-1 tokens collides") {
    // docs 0 and 1 share the 9-token run "the quick ... lazy dog"
    // (>= w+k-1 = 7), so they MUST share at least one fingerprint hash
    val fps = Text.winnowingFingerprints(corpus.toDF("doc_id", "text"),
        $"doc_id", $"text", 4, 4)
      .select($"id", $"h").distinct()
    val shared = fps.as("a").join(fps.as("b"),
      $"a.h" === $"b.h" && $"a.id" === 0L && $"b.id" === 1L).count()
    assert(shared >= 1)
  }

  test("short docs (< w grams) keep exactly one fingerprint; empty none") {
    val fps = Text.winnowingFingerprints(corpus.toDF("doc_id", "text"),
        $"doc_id", $"text", 4, 4)
      .groupBy($"id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(fps(2L) == 1L) // 4 tokens -> 1 gram < w: one global min
    assert(!fps.contains(3L)) // 2 tokens < k: no grams at all
    assert(!fps.contains(5L)) // empty text: no grams, absent
  }

  test("density: selected count stays near 2/(w+1) of the gram stream") {
    val text = (1 to 400).map(i => s"tok${i % 97}x${(i * 31) % 53}").mkString(" ")
    val fps = Text.winnowingFingerprints(Seq((9L, text)).toDF("doc_id", "text"),
        $"doc_id", $"text", 4, 8)
      .count()
    val grams = 400 - 3
    // expected 2/(w+1) = 2/9 ~ 0.22; allow [0.1, 0.45]
    assert(fps >= grams / 10 && fps <= grams * 45 / 100,
      s"density off: $fps of $grams")
  }
}
