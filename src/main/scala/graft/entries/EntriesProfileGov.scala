package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

/** Query surface + DuckDB oracles: profiling, privacy, schema/layout governance.
  *
  * Split from the SparkEntry monolith (r14 verdict: 22.9k lines,
  * +25% per round) — entries and their oracles move TOGETHER, are
  * aggregated into the driver contract by [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]], and EntrySpec pins key parity across
  * the family objects. Shared fixtures/CTE builders stay on
  * [[SparkEntry]] (private[graft]).
  */
private[graft] object EntriesProfileGov {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Quality: EXPECTATIONS SUITE — a declarative battery of data
    // contracts (null rate, domain membership, range bounds, positive
    // amounts) evaluated in ONE aggregate pass over the fact table and
    // melted to a (check, n_violations, passed) report: the
    // Great-Expectations shape without a pass per check.
    "q169_expectations" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def viol(name: String, bad: Column) =
        struct(lit(name).as("check"),
          sum(when(bad, 1L).otherwise(0L)).as("n_violations"))
      li.agg(count(lit(1)).as("n_rows"),
          array(
            viol("quantity_in_1_50",
              col("l_quantity") < 1 || col("l_quantity") > 50),
            viol("price_positive", col("l_extendedprice") <= 0),
            viol("returnflag_domain",
              !col("l_returnflag").isin("A", "N", "R")),
            viol("shipdate_not_null", col("l_shipdate").isNull),
            viol("discount_in_0_1",
              col("l_discount") < 0 || col("l_discount") > 1))
            .as("checks"))
        .select(col("n_rows"), explode(col("checks")).as("c"))
        .select(col("c.check").as("check"),
          col("n_rows"), col("c.n_violations").as("n_violations"),
          (col("c.n_violations") === 0).as("passed"))
    }),
    // Privacy governance: DP BUDGET ACCOUNTANT — md5 (ε, δ) ledger
    // over 7 analysts × 12 disjoint partitions; exact sequential
    // sums, parallel (max-over-partitions) composition, caps chosen
    // so both flag axes fire on some analysts and not others.
    "q495_dp_accountant" -> ((s, dir) => {
      import graft.ops.Dedup.hashLong
      def h(tag: String, m: Long): Column =
        pmod(hashLong(concat(lit(tag),
          col("event_id").cast("string"))), lit(m))
      Profile.dpBudgetAccountant(
        t(s, dir, "events").select(
          concat(lit("a"), (col("user_id") % 7).cast("string"))
            .as("an"),
          (col("event_id") % 12).as("pt"),
          (lit(1000L) + h("dp", 9000L)).as("e"),
          h("dd", 1000L).as("d")),
        col("an"), col("pt"), col("e"), col("d"),
        8000000L, 800000L)
    }),
    // Privacy: K-ANONYMITY generalization ladder over customer
    // quasi-identifiers (nation, segment, balance bucket) — for each
    // balance generalization width (cents; 0 drops the column), the
    // re-identifiable row count and whether k=5 holds: the
    // release-gating sweep in ONE exploded shuffle.
    "q171_k_anonymity" -> ((s, dir) =>
      Profile.kAnonymityLadder(t(s, dir, "customer"),
          Seq(col("c_nationkey"), col("c_mktsegment")),
          round(col("c_acctbal") * 100).cast("long"),
          Seq(100L, 10000L, 1000000L, 0L), 5)
        .orderBy(col("width"))),
    // Sampling/scale: RANGE-PARTITION boundary planning — the
    // deterministic bottom-k-by-md5 sample → integer-rank boundaries →
    // per-part row counts/extents audit of how a global sort would
    // partition o_totalprice into 8 ranges.
    "q173_range_bounds" -> ((s, dir) =>
      Sampling.rangePartitionAudit(t(s, dir, "orders"),
          col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"),
          8, 200)
        .orderBy(col("part"))),
    // Profiling: per-source DATASET CARD — the one-pass summary a
    // corpus release ships per source: docs, token mass, quality mean
    // (×1e4-snapped scores summed exactly, one division per source),
    // language share, and within-source exact-dup count (docs minus
    // distinct fingerprints). One scan, one hash aggregate.
    "q197_dataset_card" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("source"), col("lang"),
          Text.tokenCount(col("text")).cast("long").as("ntok"),
          round(Text.qualityScore(col("text")) * 1e4).cast("long")
            .as("qfp"),
          Text.fingerprint(col("text")).as("fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("n_tokens"),
          round((sum(col("qfp")).cast("double") /
            count(lit(1)).cast("double") / lit(1e4))
            .cast("decimal(20,10)"), 4).cast("double").as("avg_quality"),
          round((sum(when(col("lang") === "en", 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("pct_en"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"))
        .orderBy(col("source"))),
    // Curation: DISTRIBUTION-MATCHING downsample — thin every source
    // so its length profile matches the pooled corpus profile over a
    // 32-bin grid (the static DoReMi-style rebalance; q250 MEASURES
    // the drift, this one REMOVES it). Per-(source, bin) keep ratio
    // min(1, t_b·n_g/n_gb) applied as an exact integer cross-multiply
    // on a per-row md5 micro-draw — no RNG; the ratio table broadcasts
    // onto the rows so the thinning pass filters map-side.
    "q251_profile_match" -> ((s, dir) =>
      Sampling.profileMatchThinning(t(s, dir, "documents"),
          col("source"), col("n_chars"), col("doc_id"), 32)
        .withColumnRenamed("g", "source")),
    // Stats/profile: SKEWNESS + EXCESS KURTOSIS of log doc length
    // per source — the distribution-SHAPE diagnostic the moment
    // profiler stops short of (lognormal corpora read skew ≈ 0 here;
    // heavy tails push kurtosis up). The n-powers cancel: with
    // A2 = nΣx² − S², A3 = n²Σx³ − 3nSΣx² + 2S³, A4 = n³Σx⁴ −
    // 4n²SΣx³ + 6nS²Σx² − 3S⁴ all EXACT DECIMAL(38,0) on ×1e3-
    // snapped ln values, skew = A3/(A2√A2) and kurt = A4/A2² − 3
    // need no n at all — two divisions, one sqrt. (The ×1e3 snap
    // keeps n³Σx⁴ inside 38 digits for groups to ~10⁵ rows; larger
    // groups lower the snap.)
    "q307_shape_profile" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val rows = t(s, dir, "documents")
        .select(col("source"),
          round(log(col("n_chars").cast("double")) * 1e3)
            .cast("long").as("x"))
      val g = rows.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(d38(col("x"))).as("s1"),
          sum(d38(col("x")) * col("x")).as("s2"),
          sum(d38(col("x")) * col("x") * col("x")).as("s3"),
          sum(d38(col("x")) * col("x") * col("x") * col("x")).as("s4"))
      val a2 = d38(col("n")) * col("s2") - col("s1") * col("s1")
      val a3 = d38(col("n")) * col("n") * col("s3") -
        d38(lit(3L)) * col("n") * col("s1") * col("s2") +
        d38(lit(2L)) * col("s1") * col("s1") * col("s1")
      val a4 = d38(col("n")) * col("n") * col("n") * col("s4") -
        d38(lit(4L)) * col("n") * col("n") * col("s1") * col("s3") +
        d38(lit(6L)) * col("n") * col("s1") * col("s1") * col("s2") -
        d38(lit(3L)) * col("s1") * col("s1") * col("s1") * col("s1")
      g.select(col("source"), col("n"),
        when(a2 === 0, lit(null)).otherwise(
          round((a3.cast("double") /
            (a2.cast("double") * sqrt(a2.cast("double"))))
            .cast("decimal(20,10)"), 4).cast("double")).as("skewness"),
        when(a2 === 0, lit(null)).otherwise(
          round((a4.cast("double") /
            (a2.cast("double") * a2.cast("double")) - lit(3.0))
            .cast("decimal(20,10)"), 4).cast("double"))
          .as("excess_kurtosis"))
    }),
    // Governance: K-ANONYMITY + L-DIVERSITY audit over the
    // quasi-identifier (source, length-bucket) with lang as the
    // sensitive attribute — the release screen run before any corpus
    // leaves the warehouse. One groupBy; exact counts.
    "q366_k_anonymity" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"),
          expr("n_chars DIV 100").as("len_bucket"))
        .agg(count(lit(1)).as("group_n"),
          countDistinct(col("lang")).as("l_diversity"))
        .select(col("source"), col("len_bucket"), col("group_n"),
          (col("group_n") >= 5).as("k_anonymous"),
          col("l_diversity"))),
    // Planning: BROADCAST ADVISOR — row counts from two snapshot
    // manifests, smaller side under the threshold broadcasts.
    "q466_broadcast_advisor" -> ((s, dir) => {
      import graft.sources.Snapshot
      val base = gateTempDir("q466")
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      Snapshot.commit(docs, base + "/a")
      Snapshot.commit(docs.filter(col("doc_id") % 50 === 0),
        base + "/b")
      Joins.broadcastAdvisor(s, base + "/a", base + "/b", 100L)
    }),
    // Contracts: DEEQU-STYLE INFERENCE — per column null/distinct
    // profile with suggested not_null/unique rules; lang_sparse
    // plants nulls (en → null) so the suggestions differentiate.
    "q444_infer_contract" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        col("lang"), col("source"),
        when(col("lang") === "en", lit(null).cast("string"))
          .otherwise(col("lang")).as("lang_sparse"))
      Profile.inferContract(d,
        Seq("doc_id", "lang", "source", "lang_sparse"))
    }),
    // Warehouse: RECONCILIATION — per-order cent totals vs a feed
    // with planted +3/+100 perturbations, dropped and phantom keys;
    // exact integer classification at tolerance 5.
    "q439_reconcile" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
      val b = base.filter(col("l_orderkey") % 107 =!= 0)
        .select(col("l_orderkey"),
          (col("cents") + when(col("l_orderkey") % 101 === 0, 3L)
            .when(col("l_orderkey") % 103 === 0, 100L)
            .otherwise(0L)).as("cents"))
        .unionByName(base.filter(col("l_orderkey") % 109 === 0)
          .select((col("l_orderkey") + 1000000000L).as("l_orderkey"),
            col("cents")))
      Merge.reconcile(base, b, Seq("l_orderkey"), "cents", 5L)
    }),
    // Privacy: L-DIVERSITY ladder — the k-anonymity sibling: per
    // (lang, 500-char band) class the distinct-source diversity,
    // rungs 1..5 report classes/rows below each l.
    "q416_l_diversity" -> ((s, dir) =>
      Profile.lDiversity(t(s, dir, "documents"),
        Seq(col("lang"),
          (floor(col("n_chars") / 500) * 500).cast("long").as("band")),
        col("source"), 5)),
    // Privacy: t-CLOSENESS — the third rung of the ladder: per lang
    // class, the exact unit-ground EMD between its 500-char-band
    // distribution and the corpus's, in pure integer cross products
    // (one floor per class).
    "q485_t_closeness" -> ((s, dir) =>
      Profile.tCloseness(t(s, dir, "documents"), col("lang"),
        floor(col("n_chars") / 500).cast("long"))),
    // Curation/provenance: LICENSE PROPAGATION through duplicate
    // clusters — a document inherits the MOST RESTRICTIVE tier in
    // its exact-dup cluster (the license-contamination rule: one
    // copyleft copy taints every mirror): tier from a deterministic
    // source policy map, cluster max joined back, upgraded docs
    // flagged. The q50 fingerprint clusters carrying a policy
    // aggregate instead of a keep-rule.
    "q294_license_propagation" -> ((s, dir) => {
      val tier = pmod(
        Dedup.hashLong(concat(lit("lic"), col("source"))), lit(3L))
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          Text.fingerprint(col("text")).as("fp"), tier.as("tier"))
      val mx = d.groupBy(col("fp"))
        .agg(max(col("tier")).as("cluster_tier"),
          count(lit(1)).as("n_members"))
      d.join(mx, "fp")
        .groupBy(col("source"), col("tier").as("own_tier"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("cluster_tier") > col("tier"), 1L)
            .otherwise(0L)).as("n_upgraded"),
          max(col("cluster_tier")).as("max_seen_tier"))
    }),
    // Privacy: DP CONTRIBUTION-BOUNDING audit — per event type, the
    // USER-LEVEL sensitivity a differentially-private release must
    // calibrate to: Δcount = max events one user contributes,
    // Δsum = max value mass, the p99 contribution as the suggested
    // clip bound (q178's exact below·100 ÷ N rank rule), and the
    // mass share clipping at p99 would discard. k-anonymity (q171)
    // asks who is identifiable; this asks how LOUD one user can be —
    // the number the Laplace/Gaussian scale divides by. Exact
    // integers end to end; one (user, type) aggregate.
    "q277_dp_sensitivity" -> ((s, dir) => {
      val ut = t(s, dir, "events")
        .groupBy(col("event_type").as("t"), col("user_id").as("u"))
        .agg(count(lit(1)).as("nu"),
          sum(round(col("value") * 100).cast("long")).as("vu"))
      val byV = ut.groupBy(col("t"), col("nu").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val ranked = Ranks.withRunningBelowBy(byV, "t", "v", 64L,
        Seq("cnt"))
      val ng = ut.groupBy(col("t")).agg(count(lit(1)).as("n_users"),
        max(col("nu")).as("delta_count"), max(col("vu")).as("delta_sum"),
        sum(col("nu")).as("n_events"))
      // p99 clip: the smallest per-user count whose inclusive rank
      // reaches ceil(0.99·n_users)
      val c99 = ranked.join(ng.select(col("t"), col("n_users")), "t")
        .filter((col("cnt_below") + col("cnt")) * 100 >=
          col("n_users") * 99)
        .groupBy(col("t")).agg(min(col("v")).as("clip99"))
      val clipped = ut.join(broadcast(c99), "t")
        .groupBy(col("t"))
        .agg(sum(least(col("nu"), col("clip99"))).as("kept"))
      ng.join(c99, "t").join(clipped, "t")
        .select(col("t").as("event_type"), col("n_users"),
          col("delta_count"), col("delta_sum"), col("clip99"),
          round(((col("n_events") - col("kept")).cast("double") /
            col("n_events").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("share_clipped"))
    }),
    // Scale/skew: the q195 diagnose→mitigate loop CLOSED — the
    // key-skew report on a manufactured hot key (every 10th orderkey
    // collapses to 0 → ~10% share → salt factor ⌈0.1·32⌉ = 4) picks
    // the salt factor and the salted equi-join runs with it; the
    // result is identical to the plain join, which IS the oracle —
    // only the shuffle layout changes.
    "q199_auto_salted_join" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").select(
        when(col("l_orderkey") % 10 === 0, 0L)
          .otherwise(col("l_orderkey")).as("k"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
      val small = s.range(0, 2000)
        .select(col("id").as("k"), (col("id") % 7).as("grp"))
      Skew.autoSaltedJoin(big, small, Seq("k"),
        s.sessionState.conf.numShufflePartitions, 16L)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("pc")).as("price_c"))
    }),
    // Profiling/scale: JOIN-KEY SKEW report — rows-per-key
    // concentration for the lineitem join key (hottest share + exact
    // Gini via the grouped closed form on the shared rank kernel):
    // what a plan reads before choosing salting or AQE skew handling.
    "q195_key_skew" -> ((s, dir) =>
      Profile.keySkewReport(t(s, dir, "lineitem"), col("l_orderkey"),
        10L)),
    // Quality: referential integrity — orphan fact rows whose order key
    // has no parent; one anti-join, two exact counts.
    "q87_ri_orphans" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").select(col("o_orderkey"))
      l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphan_rows"),
          countDistinct(col("l_orderkey")).as("n_orphan_keys"))
    }),
    // Beyond-reference: one-job column profiler (ANALYZE) — per-column
    // row/null/distinct counts + numeric min/max via a single melt +
    // aggregate, not a job per column.
    "q57_profile" -> ((s, dir) =>
      Profile.profile(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))),
    // Skew: the complete salted JOIN — hot user keys spread over
    // (key, salt) reducers, result provably equal to the plain join
    // (the oracle IS the plain join). Disable broadcast for the salted
    // side via hint-free shapes at real scale; here correctness is the
    // checked contract.
    "q65_salted_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val profile = e.groupBy(col("user_id"))
        .agg(round(avg(col("value")), 4).as("user_avg"))
      Skew.saltedJoin(e.select(col("user_id"), col("event_type"), col("value")),
          profile, Seq("user_id"), 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value") - col("user_avg")), 2).as("dev_sum"))
    }),
    // Skew: two-stage salted aggregation over a 3-value (maximally hot)
    // grouping key — results must equal the plain aggregate exactly.
    "q47_salted_agg" -> ((s, dir) =>
      Skew.saltedSumCount(t(s, dir, "lineitem"),
          col("l_returnflag"), col("l_quantity"), 8)
        .select(col("key"), round(col("sum"), 2).as("qty_sum"),
          col("count").as("n")))
  )

  val oracleSql: Map[String, String] = Map(

    // The same five contracts as conditional counts in one pass.
    "q169_expectations" ->
      """WITH agg AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(sum(CASE WHEN l_extendedprice <= 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |    CAST(sum(CASE WHEN l_shipdate IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v4,
        |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v5
        |  FROM lineitem)
        |SELECT r['c'] AS "check", n_rows,
        |  r['v'] AS n_violations, r['v'] = 0 AS passed
        |FROM (SELECT n_rows, unnest([
        |    {'c': 'quantity_in_1_50', 'v': v1},
        |    {'c': 'price_positive', 'v': v2},
        |    {'c': 'returnflag_domain', 'v': v3},
        |    {'c': 'shipdate_not_null', 'v': v4},
        |    {'c': 'discount_in_0_1', 'v': v5}]) AS r
        |  FROM agg)""".stripMargin,
    // Same exploded widths, same pmod floor-division bucket, same
    // group-size gates.
    "q171_k_anonymity" ->
      """WITH lv AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v, width
        |  FROM customer
        |  CROSS JOIN (SELECT unnest([CAST(100 AS BIGINT),
        |    CAST(10000 AS BIGINT), CAST(1000000 AS BIGINT),
        |    CAST(0 AS BIGINT)]) AS width)),
        |g AS (SELECT width, c_nationkey, c_mktsegment,
        |    CASE WHEN width = 0 THEN CAST(-1 AS BIGINT)
        |      ELSE (v - ((v % width) + width) % width) / width END AS gb,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lv GROUP BY 1, 2, 3, 4)
        |SELECT width, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_risky_groups,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_risky_rows,
        |  sum(CASE WHEN n < 5 THEN n ELSE 0 END) = 0 AS meets_k
        |FROM g GROUP BY 1 ORDER BY width""".stripMargin,
    // Same md5 bottom-k sample, same ⌈i·n/p⌉ integer ranks, same
    // strictly-below part assignment.
    "q173_range_bounds" ->
      """WITH r AS (SELECT md5(CAST(o_orderkey AS VARCHAR)) AS h,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |smp AS (SELECT v FROM r ORDER BY h LIMIT 200),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM smp),
        |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM smp),
        |b AS (SELECT rk.v AS bv
        |  FROM range(1, 8) t(i) CROSS JOIN nn
        |  JOIN rk ON rk.rn = (i * nn.n + 7) // 8),
        |pt AS (SELECT r.v,
        |    (SELECT count(*) FROM b WHERE b.bv < r.v) AS part
        |  FROM r)
        |SELECT CAST(part AS INTEGER) AS part,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(v) AS min_c, max(v) AS max_c
        |FROM pt GROUP BY 1 ORDER BY part""".stripMargin,
    // Same one-pass reductions: q24's score ×1e4 summed exactly, lang
    // share and dup counts as exact integers.
    "q197_dataset_card" ->
      s"""WITH d AS (SELECT source, lang,
         |    CAST(len(tk) AS BIGINT) AS ntok,
         |    CAST(round(CAST(round(CAST(0.4 * least(1.0, len(tk) / 100.0)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_filter(tk,
         |            t -> t IN ('the','a','of','to','and'))) * 1.0
         |            / len(tk) END)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_distinct(tk)) * 1.0 / len(tk) END)
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) * 10000) AS BIGINT)
         |      AS qfp,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         |      AS fp
         |  FROM (SELECT source, lang, text, $tokSql AS tk
         |    FROM documents))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |  CAST(round(CAST(CAST(sum(qfp) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) / 1e4 AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS avg_quality,
         |  CAST(round(CAST(CAST(sum(CASE WHEN lang = 'en' THEN 1
         |      ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS pct_en,
         |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups
         |FROM d GROUP BY 1 ORDER BY source""".stripMargin,
    // Same 32-bin integer grid, same exact HUGEINT cross-multiply keep
    // rule draw·N·n_gb < 1e6·n_b·n_g on the identical md5 micro-draw.
    "q251_profile_match" ->
      s"""WITH r AS (SELECT source AS g, n_chars AS v,
         |    CAST(doc_id AS VARCHAR) AS k FROM documents),
         |ext AS (SELECT min(v) AS vmin,
         |    (max(v) - min(v)) // 32 + 1 AS w FROM r),
         |b AS (SELECT g, k, (v - vmin) // w AS bin
         |  FROM r CROSS JOIN ext),
         |gb AS (SELECT g, bin, CAST(count(*) AS BIGINT) AS n_gb
         |  FROM b GROUP BY 1, 2),
         |bt AS (SELECT bin, CAST(sum(n_gb) AS BIGINT) AS n_b
         |  FROM gb GROUP BY 1),
         |gs AS (SELECT g, CAST(sum(n_gb) AS BIGINT) AS n_g
         |  FROM gb GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_tot FROM gs),
         |st AS (SELECT g, bin, n_gb,
         |    CAST(1000000 AS HUGEINT) * n_b * n_g AS num,
         |    CAST(n_tot AS HUGEINT) * n_gb AS den
         |  FROM gb JOIN bt USING (bin) JOIN gs USING (g)
         |  CROSS JOIN tot),
         |kp AS (SELECT b.g, b.bin, CAST(count(*) AS BIGINT) AS n_kept
         |  FROM b JOIN st ON st.g = b.g AND st.bin = b.bin
         |  WHERE CAST(${h60("'dm' || k")} % 1000000 AS HUGEINT) * den
         |    < num
         |  GROUP BY 1, 2)
         |SELECT st.g AS source, st.bin, st.n_gb,
         |  CAST(least(1000000, num // den) AS BIGINT) AS a_micro,
         |  CAST(coalesce(kp.n_kept, 0) AS BIGINT) AS n_kept
         |FROM st LEFT JOIN kp
         |  ON kp.g = st.g AND kp.bin = st.bin""".stripMargin,
    // Same ×1e3 ln snap and exact n-free moment identities.
    "q307_shape_profile" ->
      """WITH r AS (SELECT source,
        |    CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1e3) AS BIGINT)
        |      AS x
        |  FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS s1,
        |    sum(CAST(x AS HUGEINT) * x) AS s2,
        |    sum(CAST(x AS HUGEINT) * x * x) AS s3,
        |    sum(CAST(x AS HUGEINT) * x * x * x) AS s4
        |  FROM r GROUP BY 1),
        |aa AS (SELECT source, n,
        |    CAST(n AS HUGEINT) * s2 - s1 * s1 AS a2,
        |    CAST(n AS HUGEINT) * n * s3
        |      - 3 * CAST(n AS HUGEINT) * s1 * s2
        |      + 2 * s1 * s1 * s1 AS a3,
        |    CAST(n AS HUGEINT) * n * n * s4
        |      - 4 * CAST(n AS HUGEINT) * n * s1 * s3
        |      + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
        |      - 3 * s1 * s1 * s1 * s1 AS a4
        |  FROM g)
        |SELECT source, n,
        |  CASE WHEN a2 = 0 THEN NULL ELSE
        |    CAST(round(CAST(CAST(a3 AS DOUBLE)
        |      / (CAST(a2 AS DOUBLE) * sqrt(CAST(a2 AS DOUBLE)))
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS skewness,
        |  CASE WHEN a2 = 0 THEN NULL ELSE
        |    CAST(round(CAST(CAST(a4 AS DOUBLE)
        |      / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE))
        |      - CAST(3.0 AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE)
        |    END AS excess_kurtosis
        |FROM aa""".stripMargin,
    // Same quasi-identifier grouping, exact counts.
    "q366_k_anonymity" ->
      """SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS group_n,
        |  count(*) >= 5 AS k_anonymous,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS l_diversity
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // Manifest row counts; the %50 side fits under 100 rows.
    "q466_broadcast_advisor" ->
      """WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) FILTER (doc_id % 50 = 0) AS BIGINT) AS nb
        |  FROM documents)
        |SELECT n AS rows_a, nb AS rows_b, n + nb AS shuffle_rows,
        |  'broadcast_b' AS strategy FROM c""".stripMargin,
    // Per-column exact null/distinct counts, one branch per column.
    "q444_infer_contract" -> {
      def branch(c: String): String =
        s"""SELECT '$c' AS "column", n.n AS n_rows,
           |  CAST(n.n - (SELECT count($c) FROM d) AS BIGINT)
           |    AS n_nulls,
           |  (SELECT CAST(count(DISTINCT $c) AS BIGINT) FROM d)
           |    AS n_distinct,
           |  CAST(((n.n - (SELECT count($c) FROM d)) * 1000000)
           |    // greatest(n.n, 1) AS BIGINT) AS null_micro,
           |  n.n = (SELECT count($c) FROM d) AS suggest_not_null,
           |  (SELECT count(DISTINCT $c) FROM d) =
           |    (SELECT count($c) FROM d) AS suggest_unique
           |FROM n""".stripMargin
      s"""WITH d AS (SELECT doc_id, lang, source,
         |    CASE WHEN lang = 'en' THEN NULL ELSE lang END
         |      AS lang_sparse FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
         |${branch("doc_id")}
         |UNION ALL ${branch("lang")}
         |UNION ALL ${branch("source")}
         |UNION ALL ${branch("lang_sparse")}""".stripMargin
    },
    // Same cent totals, the same planted perturbation matrix, exact
    // integer classification.
    "q439_reconcile" ->
      """WITH base AS (SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT l_orderkey, cents
        |    + CASE WHEN l_orderkey % 101 = 0 THEN 3
        |      WHEN l_orderkey % 103 = 0 THEN 100 ELSE 0 END AS cents
        |  FROM base WHERE l_orderkey % 107 <> 0
        |  UNION ALL SELECT l_orderkey + 1000000000, cents FROM base
        |  WHERE l_orderkey % 109 = 0),
        |j AS (SELECT CASE WHEN vb IS NULL THEN 'missing_in_b'
        |      WHEN va IS NULL THEN 'missing_in_a'
        |      WHEN va = vb THEN 'equal'
        |      WHEN abs(va - vb) <= 5 THEN 'within_tol'
        |      ELSE 'mismatch' END AS status,
        |    coalesce(abs(va - vb), 0) AS d
        |  FROM (SELECT l_orderkey, cents AS va FROM base) x
        |  FULL OUTER JOIN (SELECT l_orderkey, cents AS vb FROM b) y
        |    USING (l_orderkey))
        |SELECT status, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(d) AS BIGINT) AS drift_cents
        |FROM j GROUP BY 1""".stripMargin,
    // Class table once, rungs over the tiny class table; bounds and
    // verdict ride every rung row exactly like the Spark output.
    "q416_l_diversity" ->
      """WITH cls AS (SELECT lang, (n_chars // 500) * 500 AS band,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT source) AS BIGINT) AS ldist
        |  FROM documents GROUP BY 1, 2),
        |b AS (SELECT CAST(min(ldist) AS BIGINT) AS min_l,
        |    CAST(max(ldist) AS BIGINT) AS max_l FROM cls),
        |r AS (SELECT unnest([1, 2, 3, 4, 5]) AS l)
        |SELECT CAST(r.l AS INT) AS l,
        |  CAST(coalesce(sum(CASE WHEN cls.ldist < r.l THEN 1 END), 0)
        |    AS BIGINT) AS n_groups_below,
        |  CAST(coalesce(sum(CASE WHEN cls.ldist < r.l THEN cls.n END),
        |    0) AS BIGINT) AS n_rows_below,
        |  b.min_l, b.max_l,
        |  coalesce(sum(CASE WHEN cls.ldist < r.l THEN cls.n END), 0)
        |    = 0 AS meets_l
        |FROM r CROSS JOIN cls CROSS JOIN b
        |GROUP BY 1, b.min_l, b.max_l""".stripMargin,
    // Same md5 ledger; exact sums per (analyst, partition), the
    // analyst rollup with max-over-partitions, cap compares (shared
    // with the q510 streaming-ledger gate — SparkEntry val).
    "q495_dp_accountant" -> dpOracleSql,

    // The full lang × band grid (absent cells 0), per-group window
    // cumsums, the same integer cross-product gaps and one floor.
    "q485_t_closeness" ->
      """WITH b AS (SELECT lang AS grp, n_chars // 500 AS v
        |  FROM documents),
        |gv AS (SELECT grp, v, CAST(count(*) AS HUGEINT) AS c
        |  FROM b GROUP BY 1, 2),
        |va AS (SELECT v, CAST(count(*) AS HUGEINT) AS c_all
        |  FROM b GROUP BY 1),
        |g AS (SELECT grp, sum(c) AS t_g FROM gv GROUP BY 1),
        |mt AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |    sum(c_all) AS t FROM va),
        |grid AS (SELECT g.grp, g.t_g, va.v, va.c_all,
        |    coalesce(gv.c, 0) AS c
        |  FROM g CROSS JOIN va
        |  LEFT JOIN gv ON gv.grp = g.grp AND gv.v = va.v),
        |cm AS (SELECT grp, t_g,
        |    sum(c) OVER (PARTITION BY grp ORDER BY v) AS cum_g,
        |    sum(c_all) OVER (PARTITION BY grp ORDER BY v) AS cum_all
        |  FROM grid),
        |gp AS (SELECT grp, t_g,
        |    sum(abs(cum_g * t - cum_all * t_g)) AS gap, max(m) AS m,
        |    max(t) AS t
        |  FROM cm CROSS JOIN mt GROUP BY 1, 2)
        |SELECT grp, CAST(t_g AS BIGINT) AS n_rows, m AS m_values,
        |  CASE WHEN m <= 1 THEN NULL ELSE
        |    CAST((gap * 1000000) // ((m - 1) * t_g * t) AS BIGINT)
        |  END AS emd_micro
        |FROM gp""".stripMargin,

    // Same deterministic policy tiers and cluster-max inheritance.
    "q294_license_propagation" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         |      AS fp,
         |    ${h60("'lic' || source")} % 3 AS tier FROM documents),
         |mx AS (SELECT fp, CAST(max(tier) AS BIGINT) AS cluster_tier
         |  FROM d GROUP BY 1)
         |SELECT source, CAST(tier AS BIGINT) AS own_tier,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN cluster_tier > tier THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_upgraded,
         |  CAST(max(cluster_tier) AS BIGINT) AS max_seen_tier
         |FROM d JOIN mx USING (fp) GROUP BY 1, 2""".stripMargin,
    // Same (user, type) contribution table, same exact p99 rank rule
    // and clip algebra.
    "q277_dp_sensitivity" ->
      """WITH ut AS (SELECT event_type AS t, user_id AS u,
        |    CAST(count(*) AS BIGINT) AS nu,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100)
        |      AS BIGINT)) AS BIGINT) AS vu
        |  FROM events GROUP BY 1, 2),
        |bv AS (SELECT t, nu AS v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM ut GROUP BY 1, 2),
        |bl AS (SELECT t, v, cnt, CAST(coalesce(sum(cnt) OVER (
        |    PARTITION BY t ORDER BY v ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cnt_below
        |  FROM bv),
        |ng AS (SELECT t, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(max(nu) AS BIGINT) AS delta_count,
        |    CAST(max(vu) AS BIGINT) AS delta_sum,
        |    CAST(sum(nu) AS BIGINT) AS n_events
        |  FROM ut GROUP BY 1),
        |c99 AS (SELECT t, CAST(min(v) AS BIGINT) AS clip99
        |  FROM bl JOIN ng USING (t)
        |  WHERE (cnt_below + cnt) * 100 >= n_users * 99 GROUP BY 1),
        |cl AS (SELECT t, CAST(sum(least(nu, clip99)) AS BIGINT)
        |    AS kept
        |  FROM ut JOIN c99 USING (t) GROUP BY 1)
        |SELECT ng.t AS event_type, n_users, delta_count, delta_sum,
        |  clip99,
        |  CAST(round(CAST(CAST(n_events - kept AS DOUBLE) / n_events
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS share_clipped
        |FROM ng JOIN c99 USING (t) JOIN cl USING (t)""".stripMargin,
    // The PLAIN join + aggregate — salting must be invisible in the
    // values.
    "q199_auto_salted_join" ->
      """WITH big AS (SELECT CASE WHEN l_orderkey % 10 = 0 THEN 0
        |      ELSE l_orderkey END AS k,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem),
        |small AS (SELECT CAST(range AS BIGINT) AS k,
        |    CAST(range % 7 AS BIGINT) AS grp FROM range(0, 2000))
        |SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(pc) AS BIGINT) AS price_c
        |FROM big JOIN small USING (k) GROUP BY 1""".stripMargin,
    // Same (load, #keys) collapse, same exclusive running key count,
    // same grouped position-sum B and one-double-chain Gini.
    "q195_key_skew" ->
      """WITH pk AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS v
        |  FROM lineitem GROUP BY 1),
        |bv AS (SELECT v, CAST(count(*) AS BIGINT) AS c
        |  FROM pk GROUP BY 1),
        |rb AS (SELECT v, c,
        |    COALESCE(CAST(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS kb
        |  FROM bv),
        |m AS (SELECT CAST(sum(c) AS BIGINT) AS n_keys,
        |    CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s,
        |    max(v) AS vmax,
        |    CAST(sum(CAST(v AS HUGEINT) * (CAST(c AS HUGEINT) * kb
        |      + (c * (c + 1)) // 2)) AS HUGEINT) AS b
        |  FROM rb)
        |SELECT n_keys, CAST(s AS BIGINT) AS n_rows,
        |  CAST(round(CAST(CAST(vmax AS DOUBLE) / CAST(s AS DOUBLE)
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS max_key_share,
        |  CAST(round(CAST(CAST(2.0 AS DOUBLE) * CAST(b AS DOUBLE)
        |    / (CAST(n_keys AS DOUBLE) * CAST(s AS DOUBLE))
        |    - CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE)
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS gini
        |FROM m""".stripMargin,
    "q87_ri_orphans" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_orphan_rows,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orphan_keys
        |FROM lineitem WHERE l_orderkey NOT IN
        |  (SELECT o_orderkey FROM orders)""".stripMargin,
    "q57_profile" -> {
      def one(c: String, numeric: Boolean) = {
        val mn = if (numeric) s"min(CAST($c AS DOUBLE))" else "CAST(NULL AS DOUBLE)"
        val mx = if (numeric) s"max(CAST($c AS DOUBLE))" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  count(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
           |  $mn AS min_num, $mx AS max_num
           |FROM documents""".stripMargin
      }
      Seq(one("doc_id", true), one("lang", false), one("source", false),
        one("n_chars", true)).mkString("\nUNION ALL\n")
    },
    // The oracle is the PLAIN join — the salted formulation must be
    // indistinguishable in value.
    "q65_salted_join" ->
      """WITH profile AS (
        |  SELECT user_id, round(avg(value), 4) AS user_avg
        |  FROM events GROUP BY 1)
        |SELECT event_type, count(*) AS n,
        |  round(sum(value - user_avg), 2) AS dev_sum
        |FROM events JOIN profile USING (user_id)
        |GROUP BY 1""".stripMargin,
    "q47_salted_agg" ->
      """SELECT l_returnflag AS key, round(sum(l_quantity), 2) AS qty_sum,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin
  )
}
