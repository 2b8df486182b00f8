package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for crawl-scale corpora: canonicalization (the dedup key
  * a CommonCrawl-style pipeline groups on before any content pass) and
  * registered-domain extraction (the aggregation key for domain-level
  * quality gates). Reference analog: the per-market symbol
  * canonicalization family (reference downloader_hk.py:50-54
  * normalize_code_5d — strip, regularize, zero-pad to the canonical
  * key) applied to the web axis every LLM data pipeline adds.
  *
  * Everything is a pure column expression (regex + array built-ins — no
  * UDF, stays inside whole-stage codegen), so canonicalization runs in
  * the scan pass and the only shuffle is the GROUP BY on the canonical
  * key — which at 100 TB is exactly the shuffle the dedup needs anyway.
  */
object Web {

  /** Tracking query parameters dropped during canonicalization — the
    * parameters that vary per crawl visit without changing content.
    */
  val TrackingParams = "^(utm_[^=]*|ref|fbclid|gclid)(=|$)"

  /** Canonical form of a URL, the grouping key for URL-level dedup:
    *   - scheme dropped (http ≡ https), case-insensitively
    *   - host lowercased, leading `www.` and explicit `:80`/`:443`
    *     default ports dropped (path case is PRESERVED — it is
    *     significant on most servers)
    *   - fragment dropped
    *   - tracking parameters ([[TrackingParams]]) dropped; the
    *     surviving query parameters sort bytewise so param order never
    *     splits a group
    *   - trailing slash on the path dropped
    *
    * Deterministic: regex rewrites plus a bytewise `array_sort` — no
    * locale, no normalization table.
    */
  def canonicalizeUrl(url: Column): Column = {
    // fragment, then scheme
    val noFrag = regexp_replace(url, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "(?i)^https?://", "")
    val host = lower(regexp_extract(noScheme, "^([^/?]+)", 1))
    val cleanHost = regexp_replace(
      regexp_replace(host, "^www\\.", ""), ":(80|443)$", "")
    val rest = regexp_replace(noScheme, "^[^/?]+", "")
    val path = regexp_replace(
      regexp_replace(rest, "\\?.*$", ""), "/$", "")
    val qs = when(rest.contains("?"),
      regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    val kept = array_sort(filter(split(qs, "&"),
      p => p =!= "" && !p.rlike(TrackingParams)))
    concat(cleanHost, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** Naive registered domain: the last two dot-labels of the canonical
    * host (`a.b.example.com → example.com`). A production system keys
    * on the public-suffix list; the two-label rule is the deterministic
    * stand-in with the same plan shape (the PSL would broadcast as a
    * lookup map).
    */
  def registeredDomain(url: Column): Column = {
    val host = regexp_extract(canonicalizeUrl(url), "^([^/?]+)", 1)
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }

  /** Public-suffix-aware registered domain over a URL frame — the PSL
    * upgrade of [[registeredDomain]] for hosts under multi-label
    * suffixes (`shop.example.co.uk → example.co.uk`, `a.b.github.io →
    * b.github.io`). `psl` is the public-suffix table (one `suffix`
    * column; plain entries like "co.uk" or single-level wildcards like
    * "*.compute.example" meaning any ONE extra label is public too) —
    * REFERENCE data (≤ ~10k rows), broadcast by hint. Exception rules
    * ("!…") are not modeled.
    *
    * Matching: each canonical host's dotted label-suffixes (plus, for
    * each, its "*."-wildcarded form) probe the suffix set via ONE
    * broadcast equi-join (an OR-of-forms join predicate would refuse a
    * hash join — probing both forms as separate slim rows keeps it
    * equi); the LONGEST match is the public suffix; no match → the
    * last label alone (the PSL default rule, which reproduces the
    * naive two-label fallback). Registered domain = public suffix plus
    * one preceding label; null when the host IS a public suffix.
    *
    * Shape: one candidate explode (≤ 2·labels slim rows per URL — no
    * payload rides along), the broadcast probe, one hash aggregate
    * back on (id, host) — the only shuffle, sized by the candidate
    * stream, never by the suffix list. Output: ONE row per DISTINCT
    * (id, host) — `id` is a row key by contract; duplicate (id, url)
    * input rows collapse (use the per-row [[registeredDomain]]
    * expression where multiplicity must survive).
    */
  def registeredDomainsPsl(df: DataFrame, id: String, urlCol: Column,
                           psl: DataFrame): DataFrame = {
    val host = regexp_extract(canonicalizeUrl(urlCol), "^([^/?]+)", 1)
    val hosts = df.select(col(id).as("id"), host.as("host"))
      .withColumn("__labels", split(col("host"), "\\."))
      .withColumn("__k", size(col("__labels")))
    val probes = hosts.select(col("id"), col("host"), col("__k"),
      explode(filter(flatten(transform(sequence(lit(1), col("__k")), i => {
        val exact = array_join(
          slice(col("__labels"), -i, i), ".")
        val wild = when(i >= 2, concat(lit("*."),
          array_join(slice(col("__labels"), -(i - lit(1)), i - lit(1)), ".")))
          .otherwise(lit(null).cast("string"))
        array(struct(i.as("i"), exact.as("probe")),
          struct(i.as("i"), wild.as("probe")))
      })), s => s.getField("probe").isNotNull)).as("c"))
      .select(col("id"), col("host"), col("__k"),
        col("c.i").as("i"), col("c.probe").as("probe"))
    val entries = psl.select(lower(trim(col("suffix"))).as("probe"),
      lit(1).as("__hit"))
    val psLen = probes
      .join(broadcast(entries), Seq("probe"), "left")
      .groupBy(col("id"), col("host"), col("__k"))
      .agg(coalesce(max(when(col("__hit") === 1, col("i"))), lit(1))
        .as("__ps"))
    psLen.select(col("id"), col("host"),
      when(col("__k") > col("__ps"),
        array_join(slice(split(col("host"), "\\."),
          -(col("__ps") + lit(1)), col("__ps") + lit(1)), "."))
        .otherwise(lit(null).cast("string")).as("domain"))
  }

  /** URL-level dedup: one row per canonical URL, keeping the row whose
    * `ord` is SMALLEST (deterministic keep-best: pass quality descending
    * via negation, recency via a negated epoch, …, with the id as final
    * tiebreak in the struct). Output: canonical_url, kept id, duplicate
    * count. One hash-aggregate on the canonical key — map-side partial
    * combine collapses per-partition duplicates before the shuffle.
    */
  def dedupByCanonicalUrl(df: DataFrame, idCol: Column, urlCol: Column,
                          ord: Column): DataFrame =
    df.select(idCol.as("id"), canonicalizeUrl(urlCol).as("canonical_url"),
        ord.as("ord"))
      .groupBy(col("canonical_url"))
      .agg(min_by(col("id"), struct(col("ord"), col("id"))).as("kept_id"),
        count(lit(1)).as("n_urls"))

  /** Incremental crawl novelty: the canonical URLs of a new crawl
    * increment anti-joined against the existing corpus' canonical set,
    * rolled up per registered domain — the frontier-prioritization
    * signal (a domain yielding nothing new gets demoted). Both sides
    * collapse to DISTINCT canonical keys before the anti-join, so the
    * join carries one row per URL, not per fetch; the anti-join
    * shuffles on the canonical key — at 100 TB that is a hash lookup
    * against the URL index the crawler maintains anyway.
    */
  def urlNoveltyByDomain(corpus: DataFrame, increment: DataFrame,
                         urlCol: Column): DataFrame = {
    def canonDomain(df: DataFrame): DataFrame = df
      .select(canonicalizeUrl(urlCol).as("canonical_url"))
      .distinct()
      .withColumn("domain", regexp_extract(
        regexp_extract(col("canonical_url"), "^([^/?]+)", 1),
        "([^.]+\\.[^.]+)$", 1))
    val corp = canonDomain(corpus).select("canonical_url")
    val inc = canonDomain(increment)
    val novel = inc.join(corp, Seq("canonical_url"), "left_anti")
      .groupBy(col("domain")).agg(count(lit(1)).as("n_novel"))
    inc.groupBy(col("domain")).agg(count(lit(1)).as("n_urls"))
      .join(novel, Seq("domain"), "left")
      .select(col("domain"), col("n_urls"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round((coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_urls").cast("double")).cast("decimal(20,10)"), 4)
          .cast("double").as("novelty_rate"))
  }

  /** Domain-level quality gate: per registered domain, document count
    * and the mean of a per-doc quality column snapped to ×10⁶ fixed
    * point BEFORE the sum (order-free, bit-identical cross-engine — the
    * kmeans/cellMeans convention), flagging domains whose mean falls
    * below `minMeanQuality`. The whole gate is ONE aggregate on the
    * domain key; at 100 TB the flagged-domain set is small enough to
    * broadcast back as an anti-join filter.
    */
  def domainQualityGate(df: DataFrame, urlCol: Column, quality: Column,
                        minMeanQuality: Double): DataFrame =
    df.select(registeredDomain(urlCol).as("domain"),
        round(quality * 1e6).cast("long").as("qfp"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("qfp")).as("qsum"))
      .select(col("domain"), col("n_docs"),
        round((col("qsum").cast("double") /
          (col("n_docs").cast("double") * 1e6))
          .cast("decimal(20,10)"), 4).cast("double").as("mean_quality"),
        (col("qsum").cast("double") <
          lit(minMeanQuality) * col("n_docs").cast("double") * 1e6)
          .as("flagged"))

  /** MIRROR / RECRAWL-DRIFT matrix — the two crawl pathologies URL
    * and content dedup each miss alone: the SAME canonical URL
    * carrying DIFFERENT content fingerprints (recrawl drift — the
    * page changed between fetches) and the SAME fingerprint served
    * from MULTIPLE registered domains (mirrors — content dedup finds
    * them, URL dedup never will). One canonicalization pass, two
    * grouped aggregates, one summary row: (n_docs, n_canon,
    * drift_groups, drift_docs, mirror_fps, mirror_docs). `fp` is the
    * caller's content fingerprint column.
    */
  def mirrorMatrix(docs: DataFrame, id: Column, url: Column,
                   fp: Column): DataFrame = {
    val base = docs.select(id.as("id"),
      canonicalizeUrl(url).as("cu"),
      registeredDomain(url).as("dom"), fp.as("fp"))
    val byUrl = base.groupBy(col("cu"))
      .agg(count(lit(1)).as("n"), countDistinct(col("fp")).as("nf"))
    val byFp = base.groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), countDistinct(col("dom")).as("nd"))
    base.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(byUrl.agg(count(lit(1)).as("n_canon"),
        sum(when(col("nf") > 1, 1L).otherwise(0L)).as("drift_groups"),
        sum(when(col("nf") > 1, col("n")).otherwise(0L))
          .as("drift_docs"))))
      .crossJoin(broadcast(byFp.agg(
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("mirror_fps"),
        sum(when(col("nd") > 1, col("n")).otherwise(0L))
          .as("mirror_docs"))))
  }
}
