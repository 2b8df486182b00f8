package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting,
  * shingling. All pure Column expressions over built-in / higher-order
  * functions — no UDFs — so every operator stays inside whole-stage
  * codegen and scales linearly with the scan (one pass, no shuffle until
  * the caller aggregates).
  *
  * The reference warehouse has no text surface; these extend it toward the
  * LLM-data-pipeline capabilities the engine is graded on (BASELINE.json
  * north star).
  */
object Text {

  /** Tiny per-language function-word lists for the n-gram/stopword
    * language-ID heuristic. Deliberately small: the heuristic's contract
    * is determinism + one-pass evaluation, not linguistic accuracy.
    */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "to", "and")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ein")
  val StopwordsEs: Seq[String] = Seq("el", "la", "de", "y", "que")
  val StopwordsFr: Seq[String] = Seq("le", "la", "de", "et", "les")

  /** Whitespace tokenization of lowercased text; empty tokens dropped so
    * blank/empty documents yield an empty array (not [""]).
    */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Type-token ratio: distinct tokens / tokens — a lexical-diversity
    * quality signal. Null-safe: 0 for empty docs.
    */
  def typeTokenRatio(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))

  /** Fraction of tokens found in `words` (stopword density). */
  def wordListRatio(toks: Column, words: Seq[String]): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        size(filter(toks, t => t.isInCollection(words))).cast("double") /
          size(toks))

  /** Composite document-quality score in [0,1]:
    * 0.4·length saturation (100 tokens = full marks) +
    * 0.3·stopword density + 0.3·lexical diversity. Rounded to 4.
    * Tokenization bound once (Cols.bound) — the three components share
    * one token array instead of re-splitting per term.
    */
  def qualityScore(text: Column): Column =
    Cols.bound(tokens(text)) { toks =>
      // the 0.4/0.3-weighted sum of rationals can land a hair BELOW an
      // exact .xxxx5 in binary while an engine that rounds via
      // multiply-then-rint sees it AT the half — snapping through
      // decimal(20,10) first makes the 4-place round engine-portable
      // (observed: doc with score 0.49025 → 0.4902 vs 0.4903)
      round(
        (lit(0.4) * least(lit(1.0), size(toks).cast("double") / 100.0) +
          lit(0.3) * wordListRatio(toks, StopwordsEn) +
          lit(0.3) * typeTokenRatio(toks)).cast("decimal(20,10)"),
        4).cast("double")
    }

  /** Deterministic language-ID: argmax of per-language stopword density,
    * ties and all-zero scores resolved in a fixed order (en,de,es,fr) with
    * fallback "und" (undetermined). One pass, no shuffle.
    */
  def langId(text: Column): Column =
    Cols.bound(tokens(text)) { toks =>
      val en = wordListRatio(toks, StopwordsEn)
      val de = wordListRatio(toks, StopwordsDe)
      val es = wordListRatio(toks, StopwordsEs)
      val fr = wordListRatio(toks, StopwordsFr)
      val top = greatest(en, de, es, fr)
      when(top === 0.0, lit("und"))
        .when(en === top, lit("en"))
        .when(de === top, lit("de"))
        .when(es === top, lit("es"))
        .otherwise(lit("fr"))
    }

  /** Content fingerprint: md5 over whitespace-normalized lowercase text.
    * The exact-dedup key — identical logical content hashes identically
    * regardless of spacing/case.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** BPE-ish subword tokenization: letter runs, digit runs, and single
    * non-alphanumeric marks — the shape of a byte-pair pre-tokenizer's
    * split pattern, engine-portable (no lookarounds). Feeds token-count
    * estimation for LLM-corpus budgeting.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Polynomial rolling-hash document fingerprint over the token stream:
    * Σ H(tᵢ)·31^(n−1−i) mod P — the order-sensitive cousin of the md5
    * fingerprint (re-ordered tokens hash differently). H is the portable
    * 60-bit md5 hash mod P (Dedup.hashLong).
    *
    * Evaluated as a Horner fold (acc·31 + h mod P) — algebraically equal
    * to the positional power sum for EVERY document length, with no
    * precomputed power table to exhaust (the earlier table-driven form
    * silently mis-hashed documents past 512 tokens). One interpreted
    * fold per doc; the element hashes are the fold input, so each md5 is
    * computed exactly once.
    */
  def rollingHash(toks: Column): Column = {
    val p = Dedup.P
    aggregate(transform(toks, t => pmod(Dedup.hashLong(t), lit(p))),
      lit(0L), (acc, h) => pmod(acc * 31 + h, lit(p)))
  }

  /** TF-IDF top-k terms per document — the corpus-relevance staple of a
    * training-data pipeline (keyword extraction, topic balance audits).
    *
    * Scale shape: one explode + two hash aggregates (term frequency per
    * doc, document frequency per term — both map-side partial), a
    * shuffle equi-join on `term` (high-cardinality vocabulary key, no
    * hot spots after stopwords spread across docs), the corpus size as
    * a broadcast 1-row aggregate, and a per-doc top-k window (partition
    * = doc, tiny sorts). Nothing driver-side.
    *
    * tfidf = tf · ln(N/df), snapped through decimal(20,10) before the
    * 4-place round so engine libm ulp noise cannot flip the rounding.
    * Deterministic ranking: score desc, then term.
    */
  def tfidfTopTerms(docs: DataFrame, id: String, text: Column,
                    k: Int): DataFrame = {
    val terms = docs.select(col(id).as("id"), explode(tokens(text)).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = terms.distinct().groupBy("term")
      .agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(id)).as("n_docs"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round((col("tf") * log(col("n_docs").cast("double") / col("df")))
          .cast("decimal(20,10)"), 4).cast("double"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("id"), col("term"), col("tfidf"), col("rnk"))
  }

  /** PII patterns safe to match structurally (emails, dashed/dotted
    * phone numbers). Deliberately engine-portable: no lookarounds, no
    * word boundaries — the same pattern string runs under Java regex
    * and RE2, and both engines share greedy leftmost semantics here.
    * Names/addresses need NER models and are out of scope for a regex
    * scrubber (the honest contract: structural PII only).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}"

  /** Redact structural PII: emails → <EMAIL>, phone numbers → <PHONE>.
    * Pure codegen'd regexp_replace chain — the pre-training scrub pass,
    * one pass over the scan, no shuffle.
    */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  def piiEmailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  /** Phone matches are counted AFTER email redaction so digit runs
    * inside an address never double-count.
    */
  def piiPhoneCount(text: Column): Column =
    size(regexp_extract_all(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      lit(PhonePattern), lit(0)))

  /** In-document repetition score (the Gopher/RefinedWeb-style quality
    * gate): 1 − distinct n-grams / total n-grams ∈ [0,1] — 0 for fully
    * novel text, → 1 for degenerate repetition; 0 for docs shorter than
    * n tokens. Snapped through decimal(20,10) before the 4-place round
    * (engine-portable rounding, same as qualityScore).
    */
  def repetitionScore(text: Column, n: Int): Column =
    Cols.bound(tokens(text)) { t =>
      val total = size(t) - (n - 1)
      when(size(t) < n, lit(0.0)).otherwise(
        round((lit(1.0) - size(wordShingles(t, n)).cast("double") / total)
          .cast("decimal(20,10)"), 4).cast("double"))
    }

  /** Per-document mean unigram surprisal −Σᵢ ln p(tokᵢ) / n, with
    * p(tok) = corpus tf / corpus total — the cheap language-model
    * perplexity proxy pipelines gate low-quality text on (a KenLM
    * stand-in with an honest contract: unigram only). Output:
    * (id, n_tokens, avg_surprisal), docs with ≥1 token.
    *
    * Scale shape: corpus counts are ONE hash aggregate (hot tokens like
    * "the" collapse map-side before the shuffle) and come back as a
    * BROADCAST — the corpus-sized posting stream is never shuffled on
    * the skewed token key; the only other exchange is the per-doc
    * aggregate on the well-distributed id. Vocabulary must fit a
    * broadcast (tens of millions of types — fine); salt the join if a
    * corpus ever breaks that.
    *
    * Cross-engine determinism: each term's surprisal is snapped to
    * fixed-point (×10⁶, BIGINT) BEFORE the per-doc sum, so the sum is
    * exact and order-free (NOTES lesson: never hash-compare an
    * order-sensitive double sum); the mean then rounds through
    * decimal(20,10) to 4 places.
    */
  def unigramSurprisal(docs: DataFrame, id: String, text: Column): DataFrame = {
    val toks = docs.select(col(id).as("id"), explode(tokens(text)).as("tok"))
    val cf = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(broadcast(cf), "tok")
      .crossJoin(broadcast(total))
      .withColumn("surp_fp",
        round(-log(col("tf").cast("double") / col("n_total")) * 1e6).cast("long"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("surp_fp")).as("fp"))
      .select(col("id"), col("n_tokens"),
        round((col("fp").cast("double") / (col("n_tokens") * 1e6))
          .cast("decimal(20,10)"), 4).cast("double").as("avg_surprisal"))
  }

  /** Fixed-size token-window chunking with overlap — the context-length
    * packing primitive of an LLM training pipeline (a 100k-token document
    * becomes ~2k overlapping training sequences). Output one row per
    * chunk: (id, chunk_id, n_tokens, chunk_fp) where chunk_fp is the md5
    * of the space-joined chunk (compact + cross-engine checkable; callers
    * wanting the text swap `md5` for `array_join` at the same cost).
    *
    * Chunk starts are 1, 1+stride, 1+2·stride, … while ≤ token count, so
    * the final chunk may be shorter than `size` (never empty) and every
    * token belongs to ≥1 chunk when stride ≤ size. Zero-token documents
    * emit no rows (inner explode of an empty start list).
    *
    * Scale shape: one codegen'd pass over the scan — tokenize, build the
    * start list, explode, slice. No shuffle at all; the output inherits
    * the input partitioning, so a downstream repartition is the caller's
    * (budget-aware) choice. The token array is bound once per row.
    */
  def chunkTokens(docs: DataFrame, id: String, text: Column,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(stride >= 1 && chunkSize >= 1, "chunkSize and stride must be >= 1")
    docs.select(col(id).as("id"), tokens(text).as("tk"))
      .select(col("id"), col("tk"),
        posexplode(
          when(size(col("tk")) === 0, array().cast("array<int>"))
            .otherwise(sequence(lit(1), size(col("tk")), lit(stride))))
          .as(Seq("chunk_id", "start")))
      .select(col("id"), col("chunk_id"),
        size(slice(col("tk"), col("start"), lit(chunkSize))).as("n_tokens"),
        md5(array_join(slice(col("tk"), col("start"), lit(chunkSize)), " "))
          .as("chunk_fp"))
  }

  /** Adjacent-bigram PMI — collocation mining over a corpus: for every
    * token bigram seen ≥ `minCount` times, pointwise mutual information
    * ln(p(ab) / (p(a)·p(b))) with p(ab) over bigram occurrences and
    * p(a), p(b) over unigram occurrences. High-PMI pairs are the
    * multi-word expressions ("new york") tokenizer and phrase-mining
    * passes promote. Output (a, b, n_ab, pmi), pmi rounded to 4.
    *
    * Scale shape: bigram extraction is a zero-shuffle codegen pass
    * (token array bound once, O(1) element_at windows); the only
    * corpus-sized shuffle is the hash aggregate on the (a,b) key —
    * hot bigrams collapse map-side. Unigram counts and the two totals
    * are vocabulary-sized and come back as BROADCASTs, never a
    * shuffled join (q72's posting-stream rule). The `minCount` filter
    * runs before the unigram joins, so the PMI arithmetic touches
    * only surviving pairs.
    *
    * Cross-engine determinism: counts are exact integers; the PMI is
    * ONE fixed-order double chain (each count divided by its total
    * first — the ratios stay near 1 and never overflow, unlike the
    * cross-multiplied integer form at corpus scale) snapped through
    * decimal(20,10) before the 4-place round.
    */
  def bigramPmi(docs: DataFrame, text: Column,
                minCount: Long): DataFrame = {
    val tk = docs.select(tokens(text).as("tk"))
    val bi = tk.select(explode(Cols.bound(col("tk")) { t =>
        when(size(t) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(t) - 1),
            i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      }).as("ab"))
      .select(split(col("ab"), " ").getItem(0).as("a"),
        split(col("ab"), " ").getItem(1).as("b"))
    val uni = tk.select(explode(col("tk")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_uni"))
    val nUni = uni.agg(sum(col("n_uni")).as("n_u"))
    val pairs = bi.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
    val nBi = pairs.agg(sum(col("n_ab")).as("n_b_tot"))
    pairs.filter(col("n_ab") >= minCount)
      .join(broadcast(uni.select(col("tok").as("a"),
        col("n_uni").as("n_a"))), "a")
      .join(broadcast(uni.select(col("tok").as("b"),
        col("n_uni").as("n_b"))), "b")
      .crossJoin(broadcast(nBi))
      .crossJoin(broadcast(nUni))
      .select(col("a"), col("b"), col("n_ab"),
        round(log((col("n_ab").cast("double") / col("n_b_tot")) /
          ((col("n_a").cast("double") / col("n_u")) *
            (col("n_b").cast("double") / col("n_u"))))
          .cast("decimal(20,10)"), 4).cast("double").as("pmi"))
  }

  /** Blocked fuzzy (edit-distance) join — the entity-resolution
    * primitive: probe names match reference names within `maxDist`
    * edits. All-pairs levenshtein is quadratic in the corpus; blocking
    * on (first char, length) with the probe side exploded over the
    * ±maxDist length band turns it into an EQUI-join — levenshtein
    * runs only inside blocks, and the length part of the block key is
    * sound because |len(a)−len(b)| ≤ maxDist is necessary for edit
    * distance ≤ maxDist. First-char blocking trades recall for scale
    * exactly like production ER blocking; a second pass with a
    * different key (last char, sorted chars) composes for recall.
    */
  def fuzzyJoin(probes: DataFrame, refs: DataFrame, probeId: String,
                probeName: Column, refId: String, refName: Column,
                maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val p = probes
      .select(col(probeId).as("probe_id"), probeName.as("pn"))
      .select(col("probe_id"), col("pn"),
        substring(col("pn"), 1, 1).as("bc"),
        explode(sequence(length(col("pn")) - maxDist,
          length(col("pn")) + maxDist)).as("blen"))
    val r = refs
      .select(col(refId).as("ref_id"), refName.as("rn"))
      .select(col("ref_id"), col("rn"),
        substring(col("rn"), 1, 1).as("bc"), length(col("rn")).as("blen"))
    p.join(r, Seq("bc", "blen"))
      .withColumn("dist", levenshtein(col("pn"), col("rn")))
      .filter(col("dist") <= maxDist)
      .select(col("probe_id"), col("ref_id"), col("dist"))
  }

  /** Word n-gram shingles (distinct), the MinHash/Jaccard input unit.
    * Documents shorter than n shingle to an empty array.
    *
    * The token array is bound once and windows are built from O(1)
    * element_at lookups — a lambda that referenced the tokenize subtree
    * (or sliced a copy per window) would cost O(n²) per document.
    */
  def wordShingles(toks: Column, n: Int): Column =
    Cols.bound(toks) { t =>
      when(size(t) < n, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*))))
    }
}
