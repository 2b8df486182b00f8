package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator family from SURVEY §2 on
  * the driver's synthetic warehouse (TESTDATA.md): `lineitem` plays the
  * stock_prices fact (l_partkey≙symbol, l_shipdate≙date,
  * l_extendedprice≙price, l_quantity≙volume), `part`/`customer`/`nation`/
  * `region` play stock_info-style dimensions, `events` plays the intraday
  * feed, `documents`/`embeddings` drive the training-data-pipeline ops.
  *
  * `oracleSql` holds the DuckDB-equivalent SQL; column aliases match the
  * Spark output exactly (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  // ---- shared building blocks -------------------------------------------

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** q130/q131's crawl-URL corpus: documents with an in-query URL whose
    * noise axes (scheme case, www, default port, tracking params, param
    * order slot, trailing slash, fragment) all collapse under
    * [[Web.canonicalizeUrl]] — doc_ids sharing (source, doc_id%50, an
    * id param) land on one canonical URL, giving real dedup groups.
    */
  private def crawlUrl(id: Column, source: Column): Column =
    concat(
      when(id % 2 === 0, lit("HTTPS://www.")).otherwise(lit("http://")),
      lit("cdn."), source, lit("-site.net"),
      when(id % 7 === 0, lit(":443")).otherwise(lit("")),
      lit("/p/"), (id % 50).cast("string"),
      when(id % 4 === 0, lit("/")).otherwise(lit("")),
      when(id % 3 === 0,
        concat(lit("?utm_source=feed&id="),
          (id % 50).cast("string"), lit("&ref=rss")))
        .otherwise(when(id % 5 === 0,
          concat(lit("?id="), (id % 50).cast("string")))
          .otherwise(lit(""))),
      when(id % 6 === 0, lit("#sec")).otherwise(lit("")))

  private[graft] def docUrls(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("text"),
      crawlUrl(col("doc_id"), col("source")).as("url"))

  /** q133/q134's crawl increment: every 4th doc rehosted on an unseen
    * domain (`sourcex`), the rest re-crawled URL noise over known
    * content.
    */
  private[graft] def incUrls(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select((col("doc_id") + 1000000000).as("nid"),
        when(col("doc_id") % 4 === 0, concat(col("source"), lit("x")))
          .otherwise(col("source")).as("src"))
      .select(crawlUrl(col("nid"), col("src")).as("url"))

  /** q135/q136's synthetic link graph: every doc links to its 3
    * computed neighbors (doc_id·7 + k·13 mod N) — deterministic,
    * self-loops possible and mirrored in the oracle.
    */
  private[graft] def docLinkEdges(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"))
    val nc = docs.agg(count(lit(1)).as("nn"))
    // NOT persisted: the graph queries reference this subtree 6–12×
    // per plan, but a persist here was MEASURED SLOWER at sf0.1
    // (q136 3.0→5.3 s, q142 1.1→1.8 s, q135 1.3→1.6 s) — the
    // InMemoryRelation's columnar round-trip costs more than the
    // recomputed 3-rows/doc projection chain (NOTES lesson 23 again).
    docs.crossJoin(broadcast(nc))
      .select(col("doc_id").as("src"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("k"), col("nn"))
      .select(col("src"),
        ((col("src") * 7 + col("k") * 13) % col("nn")).as("dst"))
  }

  /** q123's vector corpus: embeddings plus a first-dimension-perturbed
    * copy (the planted near-dup population).
    */
  private[graft] def q123Vectors(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
    val pert = t(s, dir, "embeddings").select((col("vec_id") + 1000000000).as("id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x.cast("double") + 0.5).otherwise(x.cast("double"))).as("vec"))
    e.unionByName(pert)
  }

  /** q123's PIPELINE leg — the pair set that feeds cluster dedup. This
    * MUST stay on the ANN-blocked cell kernel; the exact O(n²) kernel
    * appears in q123 only as recall ground truth. Exposed so
    * PhysicalPlanSpec can pin the leg's plan (the full query hides it
    * behind dedupByClusters' checkpoint): no object ops, candidates
    * equi-joined on the cell key.
    */
  private[graft] def q123BlockedPairs(s: SparkSession, dir: String): DataFrame = {
    val all = q123Vectors(s, dir)
    val centroids = all.filter(col("id") < 16)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    Similarity.cosineNearDupPairsCellBlocked(all, centroids, 0.9, nprobe = 2)
      .select(col("id_a"), col("id_b"))
  }

  /** lineitem projected as a bar series: symbol/date/px/vol plus a unique
    * monotone ordinal for deterministic first/last (SURVEY §2.5 A1).
    */
  private def bars(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.select(
      col("l_partkey").as("symbol"),
      to_date(col("l_shipdate")).as("d"),
      col("l_extendedprice").as("px"),
      col("l_quantity").as("vol"),
      Resample.ordinal(to_date(col("l_shipdate")),
        col("l_orderkey") * 10 + col("l_linenumber")).as("ord"))
  }

  /** Write `batches` as ONE parquet file each under base/in with strictly
    * increasing modification times, so a file-source stream with
    * maxFilesPerTrigger=1 replays them as deterministic micro-batches
    * 0..n-1 (FileStreamSource orders pending files by mtime; the
    * zero-padded names break any residual tie the same way). Returns the
    * input directory path. This is how the q322/q324 gate queries make a
    * streaming pipeline's MULTI-batch incremental semantics
    * oracle-checkable: the batch split is part of the query definition,
    * so the SQL oracle can replay batch 0's survivors before batch 1.
    */
  /** Run-scoped root for the stream/storage gate queries' scratch
    * tables and checkpoints: every gate allocates under ONE directory
    * that a JVM shutdown hook deletes recursively, so repeated
    * bench/verify runs don't accumulate /tmp data and a re-run never
    * resumes from a stale checkpoint (r12 advisor finding — the ~30
    * gate queries leaked ~2 dirs per pass each).
    */
  private lazy val gateTmpRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-gates-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val fs = f.listFiles(); if (fs != null) fs.foreach(rm)
        f.delete(): Unit
      }
      rm(root.toFile)
    }))
    root
  }

  /** A fresh scratch directory under [[gateTmpRoot]] (absolute path). */
  private def gateTempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(gateTmpRoot, tag)
      .toFile.getAbsolutePath

  private[graft] def writeStreamBatches(batches: Seq[DataFrame],
                                        base: String): String = {
    val in = new java.io.File(base, "in"); in.mkdirs()
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = new java.io.File(base, s"b$i")
      b.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      // batch ordering is LOAD-BEARING (FileStreamSource replays by
      // mtime): name the missing part file instead of an opaque
      // NoSuchElementException, and fail loudly if the filesystem
      // refuses the mtime (Files.setLastModifiedTime throws; the
      // boolean-returning File.setLastModified would fall back to
      // incidental creation mtimes silently) — r12 advisor finding.
      val part = tmp.listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(
          s"writeStreamBatches: no part-*.parquet under ${tmp.getPath}; " +
            s"found ${tmp.listFiles().map(_.getName).mkString(", ")}"))
      val dst = new java.io.File(in, f"$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      java.nio.file.Files.setLastModifiedTime(dst.toPath,
        java.nio.file.attribute.FileTime.fromMillis(1000000L * (i + 1)))
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
    in.getPath
  }

  /** Run `body` with spark.sql.shuffle.partitions scoped to `n`,
    * restoring the previous value after. Stateful streaming queries
    * keep state-store instances PER shuffle partition per micro-batch;
    * at the session's 32 partitions the state machinery (not data)
    * dominates a small gate query's cost — measured 13 s -> 5 s on
    * q346 at 8 partitions. The suffix-array gates (q356–q358) scope
    * too: ~50 tiny shuffle stages across 7 doubling rounds + the LCP
    * descent pay per-task overhead, not data — a gate-economics knob
    * that reverses at production scale exactly like the streaming
    * one. Other batch queries never use this.
    *
    * CONTRACT (the r13 verdict ask, spelled out): the pinned values in
    * this file are FIXTURE-SIZED gate economics, never library policy.
    * No operator under `graft.ops`/`graft.streaming`/`graft.sources`
    * sets or assumes a shuffle-partition count — every kernel plans
    * against whatever the session provides, so a production caller
    * owns the knob (set `spark.sql.shuffle.partitions` / AQE advisory
    * sizes for the cluster; at 100 TB that is thousands, not 8). A
    * gate query pinning `n` here states "this fixture's stage graph
    * pays per-task overhead, not data" — the economics reverse at
    * scale and the pin must NOT be copied into production configs.
    */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** DuckDB rendering of the same projection (kept in lockstep with bars). */
  private val barsSql =
    """SELECT l_partkey AS symbol, CAST(l_shipdate AS DATE) AS d,
      |  l_extendedprice AS px, l_quantity AS vol,
      |  date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) * 100000000
      |    + l_orderkey * 10 + l_linenumber AS ord
      |FROM lineitem""".stripMargin

  /** DuckDB week-end-Friday: smallest Friday >= d (isodow: Mon=1..Sun=7). */
  private val weekEndSqlFn = "d + CAST((5 - isodow(d) + 7) % 7 AS INTEGER)"

  private def ohlcSql(bucketExpr: String): String =
    s"""SELECT symbol, $bucketExpr AS period,
       |  arg_min(px, ord) AS open, max(px) AS high, min(px) AS low,
       |  arg_max(px, ord) AS close, round(sum(vol), 2) AS volume
       |FROM ($barsSql) GROUP BY symbol, period""".stripMargin

  /** documents ∪ planted near-duplicates (two extra tokens appended) —
    * the dedup-operator test bed: every base doc has one known near-dup.
    */
  private def docsDup(s: SparkSession, dir: String): DataFrame = {
    // The documents scan is a single parquet task at bench scale while
    // every consumer of this helper runs per-row md5 shingling /
    // sketching — spread the TEXT across the cluster before the heavy
    // projections (NOTES round-6 lesson: output-heavy stages need an
    // explicit spread; this is one small shuffle of raw text, measured
    // ~-30% on the prefix-join family).
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .repartition(s.sessionState.conf.numShufflePartitions)
    d.unionByName(d.select((col("doc_id") + 1000000000).as("doc_id"),
      concat(col("text"), lit(" zz9 qq8")).as("text")))
  }

  private val docsDupSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 1000000000 AS doc_id, text || ' zz9 qq8' AS text
      |FROM documents""".stripMargin

  /** DuckDB tokenization in lockstep with Text.tokens. */
  private val tokSql =
    """list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t <> '')"""

  /** DuckDB CTE chain replaying the suffix-array semantics for the
    * q356–q358 oracles: the SA order over sentinel-terminated docs
    * equals sorting chr(1)-joined doc-local suffix strings (chr(1)
    * sorts below every corpus char) with doc_id as the exact-tie
    * break; adjacent-pair LCP is the first token mismatch over the
    * exploded token table (doc-local by the same sentinel argument).
    * Terminal CTEs: sa(doc_id, p, l, r), lc(doc_a, pos_a, doc_b,
    * pos_b, lcp). `docFilter` is a WHERE tail on documents.
    */
  /** DuckDB CTE chain replaying LinearModel.logisticGd's 3-iteration
    * trajectory over embeddings with the iterations unrolled (same
    * ×1e6 feature/bias snap, exact HUGEINT margins/gradients, sigmoid
    * snapped ×1e6 — iteration 1's p is exactly 500000 at w = 0 — and
    * round-half-away-from-zero updates). Terminal CTEs: x (id, dim,
    * xi), y (id, ymu), nn, w3 (dim, w) — shared by the q361 weight
    * pin and the q379 calibration scorer.
    */
  private val logisticGdCtes: String = {
    def iter(i: Int): String =
      s"""m$i AS (SELECT x.id, sum(CAST(x.xi AS HUGEINT) * w${i - 1}.w)
         |    AS m12 FROM x JOIN w${i - 1} USING (dim) GROUP BY 1),
         |p$i AS (SELECT id, CAST(round(1e6 / (1 + exp(
         |    -(CAST(m12 AS DOUBLE) / 1e12)))) AS BIGINT) AS pmu
         |  FROM m$i),
         |g$i AS (SELECT x.dim, sum(CAST(x.xi AS HUGEINT)
         |    * (y.ymu - p$i.pmu)) AS g
         |  FROM x JOIN y USING (id) JOIN p$i USING (id) GROUP BY 1),
         |w$i AS (SELECT w${i - 1}.dim, w${i - 1}.w
         |    + CAST(round(CAST(g$i.g AS DOUBLE) / (nn.n * 1e6))
         |      AS BIGINT) AS w
         |  FROM w${i - 1} JOIN g$i USING (dim), nn)""".stripMargin
    s"""x AS (SELECT vec_id AS id,
       |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
       |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6)
       |      AS BIGINT) AS xi FROM embeddings
       |  UNION ALL SELECT vec_id, CAST(-1 AS INT),
       |    CAST(1000000 AS BIGINT) FROM embeddings),
       |y AS (SELECT vec_id AS id, CAST(CASE WHEN label = 0
       |    THEN 1000000 ELSE 0 END AS BIGINT) AS ymu
       |  FROM embeddings),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
       |g1 AS (SELECT x.dim, sum(CAST(x.xi AS HUGEINT)
       |    * (y.ymu - 500000)) AS g
       |  FROM x JOIN y USING (id) GROUP BY 1),
       |w1 AS (SELECT dim, CAST(round(CAST(g AS DOUBLE)
       |    / (nn.n * 1e6)) AS BIGINT) AS w FROM g1, nn),
       |${iter(2)},
       |${iter(3)}""".stripMargin
  }

  /** DuckDB CTE chain replaying gramianFixedPoint(scale 1e3) +
    * topEigenFixedPoint over embeddings: exact HUGEINT Gramian cells,
    * `iters` unrolled power steps (u = G·v exact; us = u // 1e9 floor;
    * norm = sqrt(double(Σus²)); v′ = round(double(us)/norm·1e6)) —
    * every double op correctly rounded in the same order the engine
    * applies it. Terminal CTEs: g0(i, j, g) and v$iters(dim, vm).
    */
  private def powerIterCtes(iters: Int): String = {
    def step(k: Int): String =
      s"""u$k AS (SELECT g0.i, sum(g0.g * v${k - 1}.vm) AS u
         |  FROM g0 JOIN v${k - 1} ON v${k - 1}.dim = g0.j GROUP BY 1),
         |us$k AS (SELECT i, u // 1000000000 AS us FROM u$k),
         |n$k AS (SELECT sqrt(CAST(sum(us * us) AS DOUBLE)) AS nrm
         |  FROM us$k),
         |v$k AS (SELECT i AS dim, CAST(round(CAST(us AS DOUBLE)
         |    / nrm * 1e6) AS BIGINT) AS vm FROM us$k, n$k)""".stripMargin
    s"""c AS (SELECT list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS c
       |  FROM embeddings),
       |ii AS (SELECT c, unnest(range(1, len(c) + 1)) AS i FROM c),
       |pp AS (SELECT i, c[i] AS ci, unnest(range(1, len(c) + 1)) AS j, c
       |  FROM ii),
       |g0 AS (SELECT CAST(i - 1 AS INTEGER) AS i,
       |    CAST(j - 1 AS INTEGER) AS j,
       |    CAST(sum(ci * c[j]) AS HUGEINT) AS g
       |  FROM pp GROUP BY 1, 2),
       |v0 AS (SELECT i AS dim, CAST(1000000 AS BIGINT) AS vm
       |  FROM (SELECT DISTINCT i FROM g0)),
       |${(1 to iters).map(step).mkString(",\n")}""".stripMargin
  }

  /** DuckDB CTE chain replaying Text.naiveBayesEval (train/holdout
    * split, +1-smoothed log weights snapped *1e6, argmax with
    * deterministic class ties) — terminal CTE pr(id, y, pred).
    * Shared by the q255 confusion pin and the q396 macro-F1.
    */
  private val naiveBayesCtes: String =
    s"""tg AS (SELECT doc_id AS id, lang AS y, $tokSql AS tk,
       |    ${h60("CAST(doc_id AS VARCHAR)")} % 4 <> 0 AS is_train
       |  FROM documents),
       |occ AS (SELECT id, y, is_train, unnest(tk) AS tok FROM tg),
       |cw AS (SELECT y AS c, tok, CAST(count(*) AS BIGINT) AS cnt
       |  FROM occ WHERE is_train GROUP BY 1, 2),
       |nc AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS n_c
       |  FROM cw GROUP BY 1),
       |vd AS (SELECT DISTINCT tok FROM cw),
       |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vd),
       |dc AS (SELECT y AS c, CAST(count(*) AS BIGINT) AS nd_c
       |  FROM tg WHERE is_train GROUP BY 1),
       |nd AS (SELECT CAST(sum(nd_c) AS BIGINT) AS nd FROM dc),
       |cls AS (SELECT c,
       |    CAST(round(ln(CAST(nd_c AS DOUBLE) / nd) * 1000000)
       |      AS BIGINT) AS prior_m,
       |    CAST(round(ln(CAST(1.0 AS DOUBLE) / (n_c + v)) * 1000000)
       |      AS BIGINT) AS def_m
       |  FROM nc JOIN dc USING (c) CROSS JOIN nd CROSS JOIN vv),
       |w AS (SELECT cw.c, cw.tok,
       |    CAST(round(ln(CAST(cnt + 1 AS DOUBLE) / (n_c + v))
       |      * 1000000) AS BIGINT) AS w_m
       |  FROM cw JOIN nc USING (c) CROSS JOIN vv),
       |ho AS (SELECT id, tok FROM occ WHERE NOT is_train),
       |seen AS (SELECT ho.id, w.c, CAST(sum(w.w_m) AS BIGINT)
       |    AS s_seen, CAST(count(*) AS BIGINT) AS n_seen
       |  FROM ho JOIN w ON w.tok = ho.tok GROUP BY 1, 2),
       |niv AS (SELECT ho.id, CAST(count(*) AS BIGINT) AS n_iv
       |  FROM ho JOIN vd ON vd.tok = ho.tok GROUP BY 1),
       |uns AS (SELECT ho.id, CAST(count(*) AS BIGINT) AS n_unseen
       |  FROM ho LEFT JOIN vd ON vd.tok = ho.tok
       |  WHERE vd.tok IS NULL GROUP BY 1),
       |hd AS (SELECT id, y FROM tg WHERE NOT is_train),
       |sc AS (SELECT hd.id, hd.y, cls.c,
       |    cls.prior_m + coalesce(seen.s_seen, 0)
       |      + (coalesce(niv.n_iv, 0) - coalesce(seen.n_seen, 0))
       |        * cls.def_m
       |      + coalesce(uns.n_unseen, 0) * cls.def_m AS score
       |  FROM hd CROSS JOIN cls
       |  LEFT JOIN seen ON seen.id = hd.id AND seen.c = cls.c
       |  LEFT JOIN niv ON niv.id = hd.id
       |  LEFT JOIN uns ON uns.id = hd.id),
       |pr AS (SELECT id, y, c AS pred FROM (SELECT id, y, c,
       |    row_number() OVER (PARTITION BY id
       |      ORDER BY score DESC, c) AS rn FROM sc) WHERE rn = 1)""".stripMargin

  private def saCteSql(docFilter: String): String =
    saCteSqlFrom(s"SELECT doc_id, text FROM documents WHERE $docFilter")

  /** The nearest-train-neighbor replay shared by the decontamination
    * oracles (q360/q373/q380): on top of [[saCteSqlFrom]]'s `sa`/`et`
    * CTEs, split by `isTrSql` (a boolean over doc_id), walk each eval
    * suffix to its nearest train suffix above/below in SA order,
    * compute both LCPs via the exploded first-mismatch, and roll up
    * per eval doc. Terminal CTE: ag(doc_id, longest_train_match,
    * contaminated_starts ≥ 8).
    */
  private def saCrossMatchCtes(isTrSql: String): String =
    s"""sa2 AS (SELECT doc_id, p, l, r, ($isTrSql) AS is_tr
       |  FROM sa),
       |nb AS (SELECT doc_id, p, l, r, is_tr,
       |    max(CASE WHEN is_tr THEN r END) OVER (ORDER BY r
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
       |    min(CASE WHEN is_tr THEN r END) OVER (ORDER BY r
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
       |  FROM sa2),
       |ev AS (SELECT * FROM nb WHERE NOT is_tr),
       |pr AS (SELECT e.doc_id AS doc_a, e.p AS pos_a,
       |    s2.doc_id AS doc_b, s2.p AS pos_b, e.r AS er, 'p' AS side,
       |    least(e.l - e.p, s2.l - s2.p) AS mx
       |  FROM ev e JOIN sa s2 ON s2.r = e.pt
       |  UNION ALL SELECT e.doc_id, e.p, s3.doc_id, s3.p, e.r, 'n',
       |    least(e.l - e.p, s3.l - s3.p)
       |  FROM ev e JOIN sa s3 ON s3.r = e.nt),
       |mm2 AS (SELECT pr.er, pr.side, min(ea.i - pr.pos_a) AS fm
       |  FROM pr
       |  JOIN et ea ON ea.doc_id = pr.doc_a AND ea.i > pr.pos_a
       |    AND ea.i <= pr.pos_a + pr.mx
       |  JOIN et eb ON eb.doc_id = pr.doc_b
       |    AND eb.i = pr.pos_b + (ea.i - pr.pos_a)
       |  WHERE ea.tok <> eb.tok GROUP BY 1, 2),
       |bp AS (SELECT pr.doc_a AS doc_id, pr.pos_a AS pos, pr.er,
       |    CAST(coalesce(mm2.fm - 1, pr.mx) AS BIGINT) AS lcp
       |  FROM pr LEFT JOIN mm2 ON mm2.er = pr.er
       |    AND mm2.side = pr.side),
       |bst AS (SELECT doc_id, pos, max(lcp) AS best
       |  FROM bp GROUP BY 1, 2),
       |ag AS (SELECT doc_id,
       |    CAST(max(best) AS BIGINT) AS longest_train_match,
       |    CAST(count(*) FILTER (best >= 8) AS BIGINT)
       |      AS contaminated_starts
       |  FROM bst GROUP BY 1)""".stripMargin

  /** [[saCteSql]] over an arbitrary (doc_id, text) source SQL — the
    * incremental gates corpus train ∪ planted-increment unions.
    */
  private def saCteSqlFrom(src: String): String =
    s"""tk AS (SELECT doc_id, $tokSql AS tk
       |  FROM ($src)),
       |pos AS (SELECT doc_id, tk, unnest(range(len(tk))) AS p FROM tk),
       |sfx AS (SELECT doc_id, p, len(tk) AS l,
       |    array_to_string(list_slice(tk, p + 1, len(tk)), chr(1)) AS s
       |  FROM pos),
       |sa AS (SELECT doc_id, p, l,
       |    row_number() OVER (ORDER BY s, doc_id) - 1 AS r FROM sfx),
       |et AS (SELECT doc_id, generate_subscripts(tk, 1) AS i,
       |    unnest(tk) AS tok FROM tk),
       |adj AS (SELECT a.doc_id AS doc_a, a.p AS pos_a,
       |    b.doc_id AS doc_b, b.p AS pos_b,
       |    least(a.l - a.p, b.l - b.p) AS mx
       |  FROM sa a JOIN sa b ON b.r = a.r + 1),
       |mm AS (SELECT adj.doc_a, adj.pos_a, adj.doc_b, adj.pos_b,
       |    min(ea.i - adj.pos_a) AS fm
       |  FROM adj
       |  JOIN et ea ON ea.doc_id = adj.doc_a AND ea.i > adj.pos_a
       |    AND ea.i <= adj.pos_a + adj.mx
       |  JOIN et eb ON eb.doc_id = adj.doc_b
       |    AND eb.i = adj.pos_b + (ea.i - adj.pos_a)
       |  WHERE ea.tok <> eb.tok GROUP BY 1, 2, 3, 4),
       |lc AS (SELECT adj.doc_a, adj.pos_a, adj.doc_b, adj.pos_b,
       |    CAST(coalesce(mm.fm - 1, adj.mx) AS BIGINT) AS lcp
       |  FROM adj LEFT JOIN mm USING (doc_a, pos_a, doc_b, pos_b))""".stripMargin

  /** DuckDB crawl-URL expression — SparkEntry.crawlUrl parity over an
    * id expression and a source expression.
    */
  private def urlSql(id: String, src: String): String =
    s"""((CASE WHEN $id % 2 = 0 THEN 'HTTPS://www.' ELSE 'http://' END) ||
       |    'cdn.' || $src || '-site.net' ||
       |    (CASE WHEN $id % 7 = 0 THEN ':443' ELSE '' END) ||
       |    '/p/' || CAST($id % 50 AS VARCHAR) ||
       |    (CASE WHEN $id % 4 = 0 THEN '/' ELSE '' END) ||
       |    (CASE WHEN $id % 3 = 0
       |          THEN '?utm_source=feed&id=' || CAST($id % 50 AS VARCHAR) ||
       |            '&ref=rss'
       |        WHEN $id % 5 = 0 THEN '?id=' || CAST($id % 50 AS VARCHAR)
       |        ELSE '' END) ||
       |    (CASE WHEN $id % 6 = 0 THEN '#sec' ELSE '' END))""".stripMargin

  /** DuckDB CTE chain applying Web.canonicalizeUrl to the rows of
    * `fromSql` (must yield doc_id, text, url) — terminal CTE
    * `${tag}cu(doc_id, text, host, canonical_url)`. `tag` prefixes every
    * CTE name so two chains (corpus + increment) can share one WITH.
    */
  private def urlChainSql(tag: String, fromSql: String): String =
    s"""${tag}u AS ($fromSql),
       |${tag}s1 AS (SELECT doc_id, text,
       |    regexp_replace(regexp_replace(url, '#.*$$', ''),
       |      '(?i)^https?://', '') AS ns
       |  FROM ${tag}u),
       |${tag}s2 AS (SELECT doc_id, text,
       |    regexp_replace(regexp_replace(
       |      lower(regexp_extract(ns, '^([^/?]+)', 1)),
       |      '^www\\.', ''), ':(80|443)$$', '') AS host,
       |    regexp_replace(ns, '^[^/?]+', '') AS rest FROM ${tag}s1),
       |${tag}s3 AS (SELECT doc_id, text, host,
       |    regexp_replace(regexp_replace(rest, '\\?.*$$', ''), '/$$', '')
       |      AS path,
       |    CASE WHEN contains(rest, '?')
       |      THEN regexp_replace(rest, '^[^?]*\\?', '') ELSE '' END AS qs
       |  FROM ${tag}s2),
       |${tag}cu AS (SELECT doc_id, text, host,
       |    host || path || CASE WHEN len(kept) > 0
       |      THEN '?' || array_to_string(kept, '&') ELSE '' END
       |      AS canonical_url
       |  FROM (SELECT *, list_sort(list_filter(string_split(qs, '&'),
       |      p -> p <> '' AND NOT regexp_matches(p,
       |        '^(utm_[^=]*|ref|fbclid|gclid)(=|$$)'))) AS kept
       |    FROM ${tag}s3))""".stripMargin

  /** The q130/q131 corpus chain: crawl URLs over documents, terminal
    * CTE `cu`.
    */
  private val urlCanonCtes: String = urlChainSql("",
    s"""SELECT doc_id, text,
       |    ${urlSql("doc_id", "source")} AS url
       |  FROM documents""".stripMargin)

  /** One DuckDB PageRank iteration from CTE `prev` into CTEs
    * `${tag}c`/`$tag` — Graph.pageRank parity: per-edge contribution
    * snapped ×1e9 pre-sum, damped update in the same association.
    * Expects CTEs e(src, dst), od(src, outdeg), nodes(id), nc(nn).
    */
  private def prIterSql(prev: String, tag: String): String =
    s"""${tag}c AS (SELECT dst,
       |    sum(CAST(round(pr / CAST(outdeg AS DOUBLE) * 1e9) AS BIGINT))
       |      AS s
       |  FROM e JOIN $prev p ON e.src = p.id JOIN od USING (src)
       |  GROUP BY 1),
       |$tag AS (SELECT nodes.id,
       |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
       |      / CAST(nn AS DOUBLE)
       |    + CAST(0.85 AS DOUBLE)
       |      * (CAST(coalesce(s, 0) AS DOUBLE) / 1e9) AS pr
       |  FROM nodes CROSS JOIN nc
       |  LEFT JOIN ${tag}c ON nodes.id = ${tag}c.dst)""".stripMargin

  /** One DuckDB HITS iteration from hub CTE `hubPrev` into CTEs
    * `${tag}a` (auth) and `${tag}h` (hub) — Graph.hits parity: ×1e9
    * snapped contributions, L1 normalization by the exact integer
    * total. Expects CTEs e(src, dst) and nodes(id).
    */
  private def hitsIterSql(hubPrev: String, tag: String): String =
    s"""${tag}ac AS (SELECT dst,
       |    sum(CAST(round(hub * 1e9) AS BIGINT)) AS s
       |  FROM e JOIN $hubPrev hp ON e.src = hp.id GROUP BY 1),
       |${tag}at AS (SELECT CAST(sum(s) AS BIGINT) AS t FROM ${tag}ac),
       |${tag}a AS (SELECT nodes.id,
       |    CAST(coalesce(s, 0) AS DOUBLE) / CAST(t AS DOUBLE) AS auth
       |  FROM nodes CROSS JOIN ${tag}at
       |  LEFT JOIN ${tag}ac ON nodes.id = ${tag}ac.dst),
       |${tag}hc AS (SELECT src,
       |    sum(CAST(round(auth * 1e9) AS BIGINT)) AS s
       |  FROM e JOIN ${tag}a ap ON e.dst = ap.id GROUP BY 1),
       |${tag}ht AS (SELECT CAST(sum(s) AS BIGINT) AS t FROM ${tag}hc),
       |${tag}h AS (SELECT nodes.id,
       |    CAST(coalesce(s, 0) AS DOUBLE) / CAST(t AS DOUBLE) AS hub
       |  FROM nodes CROSS JOIN ${tag}ht
       |  LEFT JOIN ${tag}hc ON nodes.id = ${tag}hc.src)""".stripMargin

  /** q144's complete BM25 oracle statement, parameterized by the top-k
    * cutoff so the RRF fusion (q154) reuses the IDENTICAL ranking at a
    * different depth. Every float literal forced DOUBLE, k1+1 computed,
    * per-term ×1e6 snap, ranking on the exact integer sum.
    */
  private def bm25OracleSql(k: Int): String =
    s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
       |lens AS (SELECT doc_id, CAST(len(tk) AS INT) AS dl FROM tk),
       |corpus AS (SELECT CAST(count(*) AS BIGINT) AS nn,
       |    CAST(sum(dl) AS BIGINT) AS dlt FROM lens),
       |dfall AS (SELECT token, CAST(count(*) AS BIGINT) AS dfw FROM
       |  (SELECT DISTINCT doc_id, unnest(tk) AS token FROM tk)
       |  GROUP BY 1),
       |q AS (SELECT token, dfw FROM dfall ORDER BY dfw DESC, token
       |  LIMIT 3),
       |occ AS (SELECT doc_id, unnest(tk) AS token FROM tk),
       |tf AS (SELECT o.doc_id, o.token, CAST(count(*) AS BIGINT) AS tf
       |  FROM occ o JOIN q ON o.token = q.token GROUP BY 1, 2),
       |terms AS (SELECT tf.doc_id,
       |    CAST(round(
       |      ln(CAST(1.0 AS DOUBLE) + (nn - dfw + CAST(0.5 AS DOUBLE))
       |        / (dfw + CAST(0.5 AS DOUBLE)))
       |      * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
       |      / (tf + CAST(1.2 AS DOUBLE) * ((CAST(1.0 AS DOUBLE)
       |          - CAST(0.75 AS DOUBLE))
       |        + CAST(0.75 AS DOUBLE) * dl * CAST(nn AS DOUBLE)
       |          / CAST(dlt AS DOUBLE)))
       |      * 1e6) AS BIGINT) AS sfp
       |  FROM tf JOIN q USING (token) JOIN lens USING (doc_id)
       |  CROSS JOIN corpus),
       |sc AS (SELECT doc_id, CAST(sum(sfp) AS BIGINT) AS sfp,
       |    CAST(count(*) AS BIGINT) AS n_terms
       |  FROM terms GROUP BY 1)
       |SELECT doc_id, n_terms,
       |  CAST(round(CAST(CAST(sfp AS DOUBLE) / 1e6
       |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS score,
       |  row_number() OVER (ORDER BY sfp DESC, doc_id) AS "rank"
       |FROM sc ORDER BY sfp DESC, doc_id LIMIT $k""".stripMargin

  /** One DuckDB personalized-PageRank iteration (Graph
    * .personalizedPageRank parity): seed-concentrated base term,
    * ×1e9 snapped contributions. Expects CTEs e(src, dst),
    * od(src, outdeg) and tg(id, is_seed, ns).
    */
  private def pprIterSql(prev: String, tag: String): String =
    s"""${tag}c AS (SELECT dst,
       |    sum(CAST(round(pr / CAST(outdeg AS DOUBLE) * 1e9) AS BIGINT))
       |      AS s
       |  FROM e JOIN $prev p ON e.src = p.id JOIN od USING (src)
       |  GROUP BY 1),
       |$tag AS (SELECT tg.id,
       |    (CASE WHEN tg.is_seed THEN
       |        (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
       |          / CAST(tg.ns AS DOUBLE)
       |      ELSE CAST(0.0 AS DOUBLE) END
       |    + CAST(0.85 AS DOUBLE)
       |      * (CAST(coalesce(s, 0) AS DOUBLE) / 1e9)) AS pr
       |  FROM tg LEFT JOIN ${tag}c ON tg.id = ${tag}c.dst)""".stripMargin

  /** One DuckDB temporal-BFS round (Graph.temporalEarliestArrival
    * parity): candidates from time-respecting expansion, merge by
    * min arrival. Expects CTE e(src, dst, ts); full expansion each
    * round (≡ the engine's frontier-only form — see the scaladoc).
    */
  private def tbfsIterSql(prev: String, tag: String): String =
    s"""${tag}c AS (SELECT e.dst AS id, CAST(min(e.ts) AS BIGINT)
       |    AS arrival
       |  FROM $prev JOIN e ON $prev.id = e.src AND e.ts >= $prev.arrival
       |  GROUP BY 1),
       |$tag AS (SELECT id, min(arrival) AS arrival FROM (
       |    SELECT id, arrival FROM $prev
       |    UNION ALL SELECT id, arrival FROM ${tag}c) GROUP BY 1)"""
      .stripMargin

  /** One DuckDB label-propagation iteration (Graph.labelPropagation
    * parity): neighbor-majority vote, ties to the smallest label,
    * isolated nodes keep their own. Expects CTE eu(src, dst) holding
    * BOTH directions of each undirected edge, self-loops removed.
    */
  private def lpaIterSql(prev: String, tag: String): String =
    s"""${tag}v AS (SELECT eu.dst AS id, p.lbl, count(*) AS c
       |  FROM eu JOIN $prev p ON eu.src = p.id GROUP BY 1, 2),
       |${tag}w AS (SELECT id, lbl AS new_lbl FROM (
       |  SELECT id, lbl, row_number() OVER (PARTITION BY id
       |    ORDER BY c DESC, lbl ASC) AS rn FROM ${tag}v) WHERE rn = 1),
       |$tag AS (SELECT p.id, coalesce(w.new_lbl, p.lbl) AS lbl
       |  FROM $prev p LEFT JOIN ${tag}w w ON p.id = w.id)""".stripMargin

  /** DuckDB HLL estimate CTE pair over a register CTE `regCte`
    * (Sketch.hllEstimate parity at bHex = 3): emits `${out}g`
    * (grouped register sums) and `$out` ($keys, est). The q166 window
    * chain generalized to any group keys.
    */
  private def hllEstSql(regCte: String, keys: String, out: String): String =
    s"""${out}g AS (SELECT $keys, count(*) AS nb,
       |    CAST(sum(CAST(floor(power(CAST(2.0 AS DOUBLE), 50 - rho))
       |      AS BIGINT)) AS BIGINT) AS sum_fp
       |  FROM $regCte GROUP BY $keys),
       |$out AS (SELECT $keys,
       |    CAST(round(CAST(CASE WHEN raw <= CAST(10240.0 AS DOUBLE)
       |        AND v > 0
       |        THEN ln(CAST(4096.0 AS DOUBLE) / v) * CAST(4096.0 AS DOUBLE)
       |        ELSE raw END AS DECIMAL(20,10)), 2) AS DOUBLE) AS est
       |  FROM (SELECT $keys,
       |      (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
       |         + CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))
       |        * CAST(4096.0 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
       |        * power(CAST(2.0 AS DOUBLE), 50)
       |        / (sum_fp + (4096 - nb) * (CAST(1 AS BIGINT) << 50)) AS raw,
       |      CAST(4096 - nb AS DOUBLE) AS v
       |    FROM ${out}g))""".stripMargin

  /** DuckDB equal-count bin-map CTE (Profile.equalCountBinMap parity
    * for the q188 RFM chains): value-level exclusive running counts
    * over CTE `pu`'s column `metric`, bin = ⌊below·bins/nn⌋. Expects
    * CTE nn(nn). Emits `${out}v`, `${out}b`, `$out(v, bin)`.
    */
  private def rfmBinSql(metric: String, bins: Int, out: String): String =
    s"""${out}v AS (SELECT $metric AS v, CAST(count(*) AS BIGINT) AS c
       |  FROM pu GROUP BY 1),
       |${out}b AS (SELECT v,
       |    COALESCE(CAST(sum(c) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS BIGINT), 0) AS below
       |  FROM ${out}v),
       |$out AS (SELECT v, CAST((below * $bins) // nn AS INTEGER) AS bin
       |  FROM ${out}b CROSS JOIN nn)""".stripMargin

  /** One DuckDB BPE merge-learning round (Text.bpeLearnMerges parity):
    * count adjacent symbol pairs weighted by word count, pick the
    * (count desc, a, b) best, fuse it in every word via the literal
    * paren-framed replace. `prev` holds (w, cnt) with w framed as
    * "(c1)(c2)…"; exposes ${tag}b (a, b, pc) and $tag (w, cnt).
    */
  private def bpeIterSql(prev: String, tag: String): String =
    s"""${tag}s AS (SELECT string_split(w[2:-2], ')(') AS s, cnt
       |  FROM $prev),
       |${tag}i AS (SELECT s, cnt, unnest(range(1, len(s))) AS i
       |  FROM ${tag}s),
       |${tag}c AS (SELECT s[i] AS a, s[i+1] AS b,
       |    CAST(sum(cnt) AS BIGINT) AS pc
       |  FROM ${tag}i GROUP BY 1, 2),
       |${tag}b AS (SELECT a, b, pc FROM ${tag}c
       |  ORDER BY pc DESC, a, b LIMIT 1),
       |$tag AS (SELECT replace(w, '(' || a || ')(' || b || ')',
       |    '(' || a || b || ')') AS w, cnt
       |  FROM $prev CROSS JOIN ${tag}b)""".stripMargin

  /** DuckDB word-3-gram distinct shingles over a token list column tk. */
  private val shingleSql =
    """list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])"""

  /** DuckDB portable 60-bit md5 hash of a string expr (Dedup.hashLong). */
  private def h60(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** RBO (q238) per-match contribution constants, micro-units:
    * geometric weights via the exact integer recurrence w_1 = 10⁶,
    * w_d = round(0.9·w_{d−1}); cfp(m) = round(Σ_{d=m..k} w_d/d) —
    * computed ONCE here and inlined as literals on both engines so
    * no cross-engine pow() ever runs.
    */
  private def rboCfp(k: Int): IndexedSeq[Long] = {
    val ws = new Array[Long](k)
    ws(0) = 1000000L
    for (d <- 1 until k) ws(d) = math.round(ws(d - 1) * 0.9)
    (1 to k).map(m =>
      math.round((m to k).map(d => ws(d - 1).toDouble / d).sum))
  }

  /** DuckDB MinHash signature over shingle list `sh` (Dedup.minhashSignature). */
  private def minhashSql(k: Int): String =
    s"""[coalesce(list_min(list_transform(sh,
       |    s -> ((2*i+1) * (${h60("s")} % 2147483647) + 7 + 13*i) % 2147483647)),
       |  2147483647) for i in range(0, $k)]""".stripMargin

  /** DuckDB cosine between two FLOAT[] exprs, double precision
    * (Similarity.cosine parity: cast-then-multiply, sequential sum).
    */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b),
       |    q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)))
       |  / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |   * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin

  /** DuckDB squared L2 between two FLOAT[] exprs, double precision
    * (Similarity.sqDist parity: cast-then-subtract, sequential sum).
    */
  private def sqdSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       |  q -> (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))
       |     * (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))))""".stripMargin

  /** DuckDB L2 corpus assignment CTE body under centroid CTE `cent`:
    * rn=1 argmin by (rounded squared L2 asc, cid) over embeddings —
    * Similarity.ivfAssignL2Scored parity, keeping the winning cd.
    */
  private def l2aSql(cent: String): String =
    s"""SELECT id, vec, cell, cd FROM (
       |  SELECT e.vec_id AS id, e.embedding AS vec, c.cid AS cell,
       |    round(${sqdSql("e.embedding", "c.cvec")}, 6) AS cd,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(${sqdSql("e.embedding", "c.cvec")}, 6), c.cid)
       |      AS rn
       |  FROM embeddings e CROSS JOIN $cent c)
       |  WHERE rn = 1""".stripMargin

  /** DuckDB fixed-point per-dim cell means over assignment CTE
    * `assign` (id, vec, cell) — the exact Lloyd update
    * (Similarity.cellMeans parity: ×1e6 snap BEFORE the sum).
    */
  private def l2MeanSql(assign: String): String =
    s"""SELECT cell AS cid, list(m ORDER BY pos) AS cvec FROM (
       |  SELECT cell, pos,
       |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS m FROM (
       |    SELECT cell, pos, sum(xfp) AS s, count(*) AS n FROM (
       |      SELECT cell, generate_subscripts(vec, 1) - 1 AS pos,
       |        CAST(round(CAST(unnest(vec) AS DOUBLE) * 1e6) AS BIGINT)
       |          AS xfp
       |      FROM $assign)
       |    GROUP BY 1, 2))
       |  GROUP BY 1""".stripMargin

  private val AnnPlanes = Similarity.planeComponents(8, 64)

  /** DuckDB LSH bucket with the identical plane literals. */
  private val bucketSql: String = AnnPlanes.zipWithIndex.map { case (pl, p) =>
    s"""(CASE WHEN list_sum(list_transform(list_zip(embedding, [${pl.mkString(",")}]),
       |  q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE))) > 0
       |  THEN ${1L << p} ELSE 0 END)""".stripMargin
  }.mkString("(", " + ", ")")

  // ---- the query inventory ----------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/W3: flagship calendar resample, Friday-anchored weeks.
    "q01_weekly_bars" -> ((s, dir) =>
      Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.weekEndFri(col("d")), col("px"), col("vol"), col("ord"))),

    "q02_monthly_bars" -> ((s, dir) =>
      Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.monthEnd(col("d")), col("px"), col("vol"), col("ord"))),

    "q03_yearly_bars" -> ((s, dir) =>
      Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.yearStart(col("d")), col("px"), col("vol"), col("ord"))),

    // W1: lag-based period return over monthly closes.
    "q04_period_return" -> ((s, dir) => {
      val monthly = Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.monthEnd(col("d")), col("px"), col("vol"), col("ord"))
      Resample.periodReturn(monthly)
        .select("symbol", "period", "close", "return")
    }),

    // W2/V2: continuity gate — keys whose sorted dates have a gap > 14d.
    "q05_gap_detect" -> ((s, dir) =>
      Quality.gapKeys(bars(s, dir), col("symbol"), col("d"), 14, "1996-01-01")),

    // K1/U3: keep-latest dedup per (symbol, date) — the upsert read path.
    // The synthetic lineitem carries duplicate (orderkey, linenumber)
    // pairs, so `ord` alone can collide: content tiebreaks (px, vol) make
    // the kept row deterministic across engines.
    "q06_dedup_keep_latest" -> ((s, dir) =>
      Merge.keepLatest(bars(s, dir), Seq("symbol", "d"),
        struct(col("ord"), col("px"), col("vol")))
        .groupBy("symbol")
        .agg(count(lit(1)).as("n_rows"), round(sum("px"), 2).as("px_sum"))),

    // K1: two-batch MERGE — newer batch wins per key, older rows survive.
    "q07_upsert_batches" -> ((s, dir) => {
      val b = bars(s, dir)
      val existing = b.withColumn("version", lit(0L))
      val incoming = b.filter(pmod(col("ord"), lit(7)) === 0)
        .withColumn("px", col("px") * 2)
        .withColumn("version", lit(1L))
      Merge.upsert(existing, incoming, Seq("ord"), "version",
        col("px"), col("symbol"), col("d"), col("vol"))
        .groupBy("symbol")
        .agg(count(lit(1)).as("n_rows"), round(sum("px"), 2).as("px_sum"))
    }),

    // J2: fact x dim star join — revenue per region (broadcast dims).
    "q08_region_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }),

    // J1: enrichment lookup with coalesce fallback (KR sector join parity).
    "q09_sector_coalesce" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation").filter(col("n_regionkey") < 3)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
        .select(coalesce(col("n_name"), lit("Other/Unknown")).as("sector"))
        .groupBy("sector").agg(count(lit(1)).as("n_customers"))
    }),

    // P6/P8: symbol-validity + derivative-exclusion predicates.
    "q10_symbol_filters" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(length(col("p_name")) >= 4)
        .filter(!col("p_name").rlike("(?i)widget|gear"))
        .filter(col("p_type").rlike("^[A-Za-z0-9]+$"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))),

    // P12/P14: code canonicalization projections.
    "q11_canonicalize" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      sup.select(
        Normalize.zfill(col("s_suppkey"), 6).as("code"),
        Normalize.canonSymbol(col("s_name")).as("uname"),
        Normalize.digitsOnly(col("s_name")).as("digits"),
        Normalize.hkAltCode(Normalize.zfill(col("s_suppkey"), 6)).as("alt_code"))
    }),

    // P10/P11: board-prefix whitelist + exchange routing.
    "q12_route" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(Normalize.zfill(col("c_custkey"), 6).as("code"))
      c.filter(Normalize.cnBoardOk(col("code")))
        .select(col("code"),
          Normalize.cnRoute(Normalize.hkAltCode(col("code"))).as("symbol"))
    }),

    // P9: null-ish category normalization.
    "q13_null_normalize" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(Normalize.normalizeSector(col("lang")).as("lang_norm"))
        .groupBy("lang_norm").agg(count(lit(1)).as("n_docs"))),

    // A2: warehouse summary stats.
    "q14_summary_stats" -> ((s, dir) =>
      Report.summaryStats(bars(s, dir), col("symbol"), col("d"))),

    // A6/V6: coverage SLA per nation.
    "q15_coverage" -> ((s, dir) => {
      val counts = t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("market"))
        .agg(count(lit(1)).as("actual"))
      Report.coverage(counts, col("actual"), lit(8))
    }),

    // U1: multi-source union then aggregate.
    "q16_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      Seq("F", "O", "P")
        .map(st => o.filter(col("o_orderstatus") === st))
        .reduce(_.unionByName(_))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    }),

    // O2: deterministic top-k.
    "q17_topk" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("symbol"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("symbol"))
        .limit(10)),

    // V1/V5: validation gates with reason taxonomy over the event feed.
    "q18_validation_rejects" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(col("value")).as("min_v"), count(lit(1)).as("n"))
        .withColumn("reason",
          when(col("min_v") <= 0.5, Quality.ReasonInvalidPrice)
            .when(col("n") < 5, Quality.ReasonEmpty))
        .filter(col("reason").isNotNull)
        .select("user_id", "reason")),

    // A5: freshness — stale symbols vs the global max date.
    "q19_freshness" -> ((s, dir) =>
      Report.staleKeys(bars(s, dir), col("symbol"), col("d"), 60)),

    // S2/§2.9: JSON field extraction + event-type rollup.
    "q20_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(col("k")), 2).as("avg_k"),
          max(col("k")).as("max_k"), round(sum(col("value")), 2).as("value_sum"))),

    // A1-streaming-shape: tumbling hourly rollup of the event feed.
    "q21_hourly_rollup" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))),

    // W-extension: rank within group (beyond the reference's lag-only shape).
    "q22_window_rank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
          row_number().over(w).as("rnk"))
    }),

    // ---- training-data-pipeline operators ------------------------------

    // Text: token counting + corpus stats per language.
    "q23_text_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(Text.tokenCount(col("text"))), 2).as("avg_tokens"),
          round(avg(length(col("text"))), 2).as("avg_chars"),
          sum(Text.tokenCount(col("text"))).cast("long").as("total_tokens"))),

    // Text: per-document quality scoring (length/stopword/diversity mix).
    "q24_doc_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val toks = Text.tokens(col("text"))
      d.select(col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        round(Text.typeTokenRatio(toks), 4).as("ttr"),
        round(Text.wordListRatio(toks, Text.StopwordsEn), 4).as("stop_ratio"),
        Text.qualityScore(col("text")).as("score"))
    }),

    // Text: heuristic language-ID vs the labeled lang (confusion counts).
    "q25_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"), Text.langId(col("text")).as("predicted"))
        .agg(count(lit(1)).as("n"))),

    // Text: structural-PII scrub — emails/phones planted on every 5th
    // doc, redacted with a codegen'd regexp chain; the fingerprint of
    // the redacted text proves the rewrite byte-exact cross-engine.
    "q69_pii_redact" -> ((s, dir) => {
      val seeded = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"),
            lit(" contact alice.smith@example.com or 555-123-4567 now")))
          .otherwise(col("text")).as("text"))
      seeded.select(col("doc_id"),
        Text.piiEmailCount(col("text")).as("n_emails"),
        Text.piiPhoneCount(col("text")).as("n_phones"),
        Text.fingerprint(Text.piiRedact(col("text"))).as("clean_fp"))
    }),

    // Dedup/eval hygiene: benchmark-contamination check — every 10th
    // doc poses as the eval set; per corpus doc, how many of its
    // distinct 3-gram shingles the benchmark contains (broadcast
    // benchmark shingle set, no corpus-sized shuffle).
    "q70_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
      Dedup.contaminationOverlap(docs, "doc_id", "hs",
        docs.filter(col("doc_id") % 10 === 0), "hs")
        .withColumnRenamed("id", "doc_id")
    }),

    // Text: in-document repetition (Gopher-style quality gate) —
    // 1 − distinct/total 3-grams per doc.
    "q71_repetition" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        greatest(Text.tokenCount(col("text")) - 2, lit(0)).as("n_grams"),
        Text.repetitionScore(col("text"), 3).as("repetition"))),

    // Text: mean unigram surprisal per doc (LM-perplexity proxy) —
    // corpus counts broadcast, per-term fixed-point snap so the sum is
    // order-free cross-engine.
    "q72_unigram_surprisal" -> ((s, dir) =>
      Text.unigramSurprisal(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", col("text"))
        .withColumnRenamed("id", "doc_id")),

    // Text: fixed-size token-window chunking with overlap (the
    // context-length packing step of a training pipeline) — one
    // codegen'd pass over the scan, zero shuffle; chunk_fp keeps the
    // output compact and cross-engine checkable.
    "q74_chunk_tokens" -> ((s, dir) =>
      Text.chunkTokens(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", col("text"), 64, 48)
        .withColumnRenamed("id", "doc_id")),

    // Sampling: sequential token-budget shard packing — a global
    // running sum realized as the two-level distributed prefix sum
    // (bucketed window + broadcast per-bucket offsets); no stage runs
    // a single-reducer window over the data.
    "q75_pack_shards" -> ((s, dir) =>
      Sampling.packByBudget(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        col("doc_id"), Text.tokenCount(col("text")), 2000L, 64L)),

    // Sampling: temperature-scaled multilingual rebalancing (α = 0.5,
    // the mC4/XLM-R rule) — stratum histogram broadcast back,
    // fixed-point weight snap before the normalizing sum, keep
    // decision via the deterministic hash bucket.
    "q76_temperature_sample" -> ((s, dir) =>
      Sampling.temperatureSample(t(s, dir, "documents"),
        col("doc_id"), col("lang"), 1, 2, 100)),

    // Sampling: weighted WITHOUT-replacement draw (Efraimidis–Spirakis
    // priorities from deterministic hash uniforms) — quality-weighted
    // subcorpus selection: 20 docs per language, weight = token count,
    // so long documents win proportionally more often, reproducibly on
    // any engine.
    "q126_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(t(s, dir, "documents"),
          col("lang"), col("doc_id"), Text.tokenCount(col("text")), 20, 42L)
        .select(col("stratum").as("lang"), col("id").as("doc_id"),
          col("priority"))),

    // Dedup: line-level boilerplate scrub (CCNet/RefinedWeb cleaning) —
    // multi-line docs are built in-query (a headline line + the body;
    // every 2nd doc carries a planted cookie-banner line), then every
    // line appearing in ≥ 20 distinct docs is dropped corpus-wide. The
    // clean-text md5 proves the rewrite byte-exact cross-engine.
    "q127_boilerplate_scrub" -> ((s, dir) => {
      val toks = Text.tokens(col("text"))
      val headline = array_join(slice(toks, 1, 5), " ")
      val lined = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat_ws("\n", headline,
            lit("ACCEPT COOKIES TO CONTINUE"), col("text")))
          .otherwise(concat_ws("\n", headline, col("text"))).as("t"))
      Dedup.scrubBoilerplateLines(lined, "doc_id", col("t"), 20)
        .withColumnRenamed("id", "doc_id")
    }),

    // Web: URL-level dedup — canonicalize crawl URLs (scheme/www/port/
    // fragment/tracking-param/param-order/trailing-slash noise all
    // collapse) and keep ONE doc per canonical URL, longest-first. The
    // entire canonicalization is codegen'd string expressions in the
    // scan pass; the only shuffle is the hash-aggregate on the
    // canonical key — the shuffle the dedup needs anyway at 100 TB.
    "q130_url_dedup" -> ((s, dir) => {
      val u = docUrls(s, dir)
      Web.dedupByCanonicalUrl(u, col("doc_id"), col("url"),
        -Text.tokenCount(col("text")))
    }),

    // Web: DOMAIN-level quality gate — per registered domain, doc count
    // and fixed-point mean quality score, flagging domains whose mean
    // sits below 0.5 (the spam-domain drop list a crawl pipeline
    // anti-joins against). ONE aggregate on the domain key; the flag
    // compares exact integers scaled by the count, no float division.
    "q131_domain_quality" -> ((s, dir) => {
      val u = docUrls(s, dir)
      Web.domainQualityGate(u, col("url"),
        Text.qualityScore(col("text")), 0.5)
    }),

    // Events: within-session event-type TRANSITION MATRIX (the Markov
    // summary a behavior-sequence pipeline trains on) — consecutive
    // pairs inside 30-min sessions, session boundaries hard (last event
    // of a session never pairs into the next), per-from-type
    // probability on the aggregated |types|² matrix, not the events.
    "q132_session_transitions" -> ((s, dir) =>
      Events.sessionTransitions(t(s, dir, "events"), col("user_id"),
        col("ts"), col("event_id"), col("event_type"), 1800L)),

    // Events: LAST-TOUCH ATTRIBUTION — every purchase credits the
    // user's most recent preceding click/view (ts then event_id
    // tiebreak via a struct-max running window — deterministic, no
    // join back); purchases with no preceding touch land in 'none'.
    // One shuffle on the user key; the rollup runs on the 3-row
    // attributed_type domain.
    "q140_last_touch_attribution" -> ((s, dir) =>
      Events.lastTouchAttribution(t(s, dir, "events"), col("user_id"),
        col("ts"), col("event_id"), col("event_type"), col("value"),
        Seq("click", "view"), "purchase")),

    // Web: incremental crawl NOVELTY per domain — a new increment
    // (every 4th doc rehosted on an unseen domain; the rest re-crawled
    // URL noise over known content) anti-joined on the canonical key
    // against the existing corpus, the frontier-prioritization signal.
    "q133_url_novelty" -> ((s, dir) =>
      Web.urlNoveltyByDomain(docUrls(s, dir), incUrls(s, dir), col("url"))),

    // Graph: PAGERANK over a deterministic synthetic link graph (every
    // doc links to 3 computed neighbors) — 3 damped iterations, the
    // per-edge contribution snapped ×1e9 pre-sum so ranks are
    // bit-identical cross-engine; top-20 by (rounded rank desc, id)
    // via sort+limit (TakeOrderedAndProject — per-partition top-k,
    // never a single-partition global sort).
    "q135_pagerank" -> ((s, dir) =>
      Graph.pageRank(docLinkEdges(s, dir), 3)
        .select(col("id").as("doc_id"),
          round(col("pr").cast("decimal(20,10)"), 8).cast("double")
            .as("pr"))
        .orderBy(col("pr").desc, col("doc_id")).limit(20)),

    // Graph: HITS hubs/authorities (2 iterations) on the same link
    // graph — the L1 normalizer is a one-row broadcast aggregate and
    // every normalized score is a ratio of two EXACT ×1e9 integers, so
    // scores are bit-identical cross-engine; top-20 authorities via
    // sort+limit.
    "q136_hits" -> ((s, dir) =>
      Graph.hits(docLinkEdges(s, dir), 2)
        .select(col("id").as("doc_id"),
          round(col("hub").cast("decimal(20,10)"), 8).cast("double")
            .as("hub"),
          round(col("auth").cast("decimal(20,10)"), 8).cast("double")
            .as("auth"))
        .orderBy(col("auth").desc, col("doc_id")).limit(20)),

    // Text: BIGRAM-LM quality scoring — the corpus trains an add-one
    // bigram model in-query and every doc scores its mean negative
    // log-likelihood (the perplexity filter of LLM data pipelines);
    // per-occurrence terms snap ×1e6 pre-sum so the mean is a ratio of
    // exact integers.
    "q138_bigram_nll" -> ((s, dir) =>
      Text.bigramNll(t(s, dir, "documents"), "doc_id", col("text"))
        .withColumnRenamed("id", "doc_id")),

    // Text/IR: POSITIONAL PHRASE SEARCH — build the inverted index
    // (token, doc, pos), derive the corpus' top bigram in-query, and
    // find its exact-phrase occurrences via the (id, pos+1) adjacency
    // equi-join; posting sides prune to the phrase's own tokens via a
    // broadcast semi-join first, so only those postings shuffle.
    "q141_phrase_search" -> ((s, dir) => {
      val post = Text.postings(t(s, dir, "documents"), "doc_id",
        col("text"))
      val top = post.as("x")
        .join(post.as("y"),
          col("x.id") === col("y.id") && col("y.pos") === col("x.pos") + 1)
        .groupBy(col("x.token").as("a"), col("y.token").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b")).limit(1)
        .select(col("a"), col("b"))
      Text.bigramPhraseMatches(post, top)
        .withColumnRenamed("id", "doc_id")
    }),

    // Multimodal×Dedup: PERCEPTUAL image near-dup — every doc renders
    // to a real 8×7 BMP (every 5th doc also plants a copy with 3 low
    // bits of one red channel flipped), payloads decode through the
    // real parser inside mapPartitions (bytes never shuffle), each
    // image fingerprints to a 56-bit integer average-hash, and pairs
    // at hamming ≤ 2 surface via 4×14-bit banding — recall-COMPLETE
    // for ≤ 2 differing bits by pigeonhole (≥ 2 of 4 bands intact), so
    // the banded engine result equals the oracle's all-pairs truth.
    "q137_image_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.flatMap { case (id, text0) =>
        val tx = if (text0.isEmpty) "x" else text0
        def px(perturb: Boolean) = Array.tabulate(56) { i =>
          val cp = tx.charAt(i % tx.length).toInt
          val r0 = cp % 256
          val r = if (perturb && i == 0) r0 ^ 7 else r0
          (r << 16) | (((cp * 7) % 256) << 8) | ((cp * 13) % 256)
        }
        val base = (id, Multimodal.bmpBytes(8, 7, px(perturb = false)))
        if (id % 5 == 0)
          Seq(base, (id + 2000000000, Multimodal.bmpBytes(8, 7, px(perturb = true))))
        else Seq(base)
      }
      // the hash table feeds both sides of the banded self-join (q29)
      val hs = Multimodal.imageHashesBatched(media).persist()
      val bands = hs.select(col("id"), col("hash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("hash"), 14 * b).bitwiseAND(lit(0x3FFFL))): _*))
          .as(Seq("band", "bval")))
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          Dedup.hamming(col("a.hash"), col("b.hash")).as("hamming"))
        .filter(col("hamming") <= 2)
        .distinct()
    }),

    // Graph: per-node TRIANGLE counts on the undirected link graph —
    // degree-ordered orientation bounds wedge enumeration by the
    // oriented out-degree (O(√m) on any graph), each triangle found
    // once via a pure equi-join closure check; per-node credit is an
    // explode of the 3 corners + one hash aggregate.
    "q142_triangles" -> ((s, dir) =>
      Graph.triangleCounts(docLinkEdges(s, dir))
        .withColumnRenamed("id", "doc_id")),

    // Graph: multi-source BFS hop counts (≤ 3 hops from the seed set
    // doc_id % 97 = 0) — per round ONE frontier×edges equi-join + one
    // min-aggregate; settled nodes never re-expand, so each edge is
    // walked at most once per round it borders the frontier.
    "q143_bfs_reach" -> ((s, dir) => {
      val seeds = t(s, dir, "documents")
        .filter(col("doc_id") % 97 === 0).select(col("doc_id").as("id"))
      Graph.shortestHops(docLinkEdges(s, dir), seeds, 3)
        .withColumnRenamed("id", "doc_id")
    }),

    // Text/IR: Okapi BM25 top-20 — the query is data-derived (the 3
    // highest-df tokens, df desc then token); only the query terms'
    // postings ever shuffle (broadcast semi-join prune), per-term
    // scores snap ×1e6 pre-sum so the ranking cutoff is exact, and the
    // top-k is TakeOrderedAndProject.
    "q144_bm25" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val q = docs
        .select(explode(array_distinct(Text.tokens(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token")).limit(3)
        .select(col("token"))
      Text.bm25(docs, "doc_id", col("text"), q, 20)
        .withColumnRenamed("id", "doc_id")
    }),

    // Events: TIME-TO-CONVERSION percentiles per weekly cohort — first
    // view → first at-or-after purchase lag, exact integer micros until
    // the final seconds division; the percentile sort-agg runs on one
    // row per CONVERTED user, never on raw events.
    "q145_conversion_lag" -> ((s, dir) =>
      Events.conversionLag(t(s, dir, "events"), col("user_id"), col("ts"),
        col("event_type"), "view", "purchase")),

    // Events: top behavior TRIGRAMS within sessions (the
    // sequence-mining summary) — one user-key shuffle covers
    // sessionize + both leads; count aggregates on the ≤|types|³ 3-gram
    // key; top-20 via sort+limit.
    "q146_path_trigrams" -> ((s, dir) =>
      Events.sessionPathTrigrams(t(s, dir, "events"), col("user_id"),
        col("ts"), col("event_id"), col("event_type"), 1800L, 20)),

    // Profiling: per-group WINSORIZED stats — exact interpolated
    // p01/p99 bounds rounded to the cents fixed point, clamp + count +
    // mean all in exact integer arithmetic (the winsorized mean is a
    // ratio of exact integers; no float accumulates).
    "q147_winsorized_stats" -> ((s, dir) =>
      Profile.winsorizedStats(t(s, dir, "lineitem"), col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long"), 0.01, 0.99)
        .withColumnRenamed("g", "l_returnflag")),

    // Text: all-pairs sparse TF-IDF cosine ≥ 0.6 — the lexical
    // similarity primitive next to the embedding family; ubiquitous
    // terms (df > N/5) pruned from the similarity domain up front
    // (declared stopword economics — bounds posting-join work at Σdf²),
    // every weight and dot product an exact fixed-point integer.
    "q148_sparse_cosine" -> ((s, dir) =>
      Text.sparseCosinePairs(
        t(s, dir, "documents").select(col("doc_id"), col("text"))
          .repartition(s.sessionState.conf.numShufflePartitions),
        "doc_id", col("text"), 0.6, 1, 5)),

    // Resample: calendar densification + forward fill over the daily
    // bar series (symbols ≤ 50) — per-symbol day grid from sequence(),
    // fill via last(ignoreNulls) in the series window; the rollup
    // checksums the filled values so every carried cell is verified
    // without shipping span-many rows.
    "q149_gap_fill" -> ((s, dir) => {
      val daily = bars(s, dir).filter(col("symbol") <= 50)
        .groupBy(col("symbol"), col("d"))
        .agg(max(round(col("px") * 100).cast("long")).as("px_c"))
      Resample.gapFillForward(daily, col("symbol"), col("d"), col("px_c"))
        .groupBy(col("s").as("symbol"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("is_filled"), 1L).otherwise(0L)).as("n_filled"),
          round(sum(col("value_c")).cast("double") / 100.0, 2)
            .as("filled_sum"))
    }),

    // Join: interval×interval OVERLAP join — urgent-order windows
    // [d, d+3] × high-priority windows [d, d+2] on the 4-day grid;
    // each true pair meets once in the cell of max(lo_a, lo_b), so no
    // post-join dedup shuffle exists. Rolled up per urgent order.
    "q150_interval_overlap" -> ((s, dir) => {
      val epoch = lit("1970-01-01").cast("date")
      val o = t(s, dir, "orders")
      def iv(prio: String, span: Int, p: String) =
        o.filter(col("o_orderpriority") === prio)
          .select(col("o_orderkey").as(s"${p}_key"),
            datediff(to_date(col("o_orderdate")), epoch).as(s"${p}_lo"),
            (datediff(to_date(col("o_orderdate")), epoch) + span)
              .as(s"${p}_hi"))
      Joins.intervalOverlapJoin(iv("1-URGENT", 3, "a"), "a_lo", "a_hi",
          iv("2-HIGH", 2, "b"), "b_lo", "b_hi", 4L)
        .groupBy(col("a_key").as("o_orderkey"))
        .agg(count(lit(1)).as("n_overlaps"),
          min(col("b_key")).as("first_b"))
    }),

    // Quality: exact two-sample KOLMOGOROV–SMIRNOV drift statistic
    // (returned-vs-normal price distributions) — distributed-exact
    // ECDFs via the two-level prefix sum, the sup as a max over exact
    // DECIMAL cross-products, one double division at the end.
    "q151_ks_drift" -> ((s, dir) =>
      Quality.ksStatistic(
        t(s, dir, "lineitem").filter(col("l_returnflag").isin("R", "N"))
          .select((col("l_returnflag") === "R").as("t"),
            round(col("l_extendedprice") * 100).cast("long").as("vc")),
        col("t"), col("vc"), 100000L)),

    // Profiling: per-symbol OLS TREND (slope + Pearson r of price over
    // time) — five exact DECIMAL moment sums in one aggregate pass,
    // normal equations on exact integers, one double division per
    // output; degenerate series yield null, not ±∞.
    "q152_ols_trend" -> ((s, dir) =>
      Profile.olsTrend(
        bars(s, dir).filter(col("symbol") <= 200)
          .select(col("symbol"),
            datediff(col("d"), lit("1970-01-01").cast("date")).as("xd"),
            round(col("px") * 100).cast("long").as("yc")),
        col("symbol"), col("xd"), col("yc"))
        .withColumnRenamed("g", "symbol")),

    // Graph: PERSONALIZED PageRank (TrustRank) from the q143 seed set —
    // teleport mass concentrates on the trusted seeds, so ranks measure
    // seed proximity (the crawl-prioritization / spam-demotion signal);
    // same ×1e9 pre-sum snap and iteration shape as q135.
    "q153_trustrank" -> ((s, dir) => {
      val seeds = t(s, dir, "documents")
        .filter(col("doc_id") % 97 === 0).select(col("doc_id").as("id"))
      Graph.personalizedPageRank(docLinkEdges(s, dir), seeds, 3)
        .select(col("id").as("doc_id"),
          round(col("pr").cast("decimal(20,10)"), 8).cast("double")
            .as("ppr"))
        .orderBy(col("ppr").desc, col("doc_id")).limit(20)
    }),

    // Text: cross-source VOCABULARY OVERLAP — Jaccard of the token
    // sets of every source pair (the corpus-comparison signal behind
    // mixture planning): (source, token) distincts self-join on the
    // token key, so work is Σ_token (#sources containing it)² — bounded
    // by the source count squared, never corpus²; top-15 pairs by
    // overlap.
    "q168_vocab_overlap" -> ((s, dir) => {
      val st = t(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
        .distinct()
      val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n_tok"))
      val inter = st.as("x").join(st.as("y"),
          col("x.tok") === col("y.tok") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("a"), col("y.source").as("b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.select(col("source").as("a"),
          col("n_tok").as("n_a"))), "a")
        .join(broadcast(sizes.select(col("source").as("b"),
          col("n_tok").as("n_b"))), "b")
        .select(col("a"), col("b"), col("n_inter"),
          round((col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("jaccard"))
        .orderBy(col("jaccard").desc, col("a"), col("b")).limit(15)
    }),

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

    // Sketch: SLIDING-WINDOW distinct users via mergeable HLL — raw
    // events fold to per-hour registers ONCE; each hour's registers
    // serve every 3-hour window containing it (explode 3 offsets +
    // per-bucket max — the sketch-union sliding-window pattern, events
    // never re-scanned per window). Exact distincts ride along as the
    // in-query error audit.
    "q166_sliding_distinct" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(date_trunc("hour", col("ts")).as("h"), col("user_id"))
      val offs = explode(array(lit(0), lit(1), lit(2))).as("off")
      val wcol = (col("h") + expr("make_interval(0,0,0,0,off,0,0)")).as("w")
      val winReg = Sketch.hllRegisters(ev, Seq("h"), col("user_id"))
        .select(col("h"), col("bucket"), col("rho"), offs)
        .select(wcol, col("bucket"), col("rho"))
        .groupBy(col("w"), col("bucket")).agg(max(col("rho")).as("rho"))
      val approx = Sketch.hllEstimate(winReg, Seq("w"))
      val exact = ev.select(col("h"), col("user_id"), offs)
        .select(wcol, col("user_id"))
        .groupBy(col("w"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(approx, "w")
    }),

    // Stats: exact WEIGHTED MEDIAN per group — smallest value whose
    // running weight reaches half the total, all in exact integer
    // arithmetic (2·cum ≥ total, no division): the robust center a
    // quantity-weighted price summary needs. Values aggregate to one
    // row per distinct value before the window.
    "q167_weighted_median" -> ((s, dir) => {
      val rows = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100).cast("long").as("v"),
        round(col("l_quantity") * 100).cast("long").as("wt"))
      val byV = rows.groupBy(col("g"), col("v"))
        .agg(sum(col("wt")).as("wsum"))
      val W = org.apache.spark.sql.expressions.Window
      val cum = sum(col("wsum")).over(
        W.partitionBy(col("g")).orderBy(col("v"))
          .rowsBetween(W.unboundedPreceding, W.currentRow))
      val tot = byV.groupBy(col("g")).agg(sum(col("wsum")).as("tw"))
      byV.withColumn("cum", cum)
        .join(broadcast(tot), "g")
        .filter(col("cum") * 2 >= col("tw"))
        .groupBy(col("g"), col("tw"))
        .agg(min(col("v")).as("mv"))
        .select(col("g").as("l_returnflag"), col("tw").as("total_w"),
          round(col("mv").cast("double") / 100.0, 2).as("w_median"))
    }),

    // Stats: 2-D PARETO FRONTIER (skyline) — parts undominated on
    // (cheaper price, bigger size): on DISTINCT value pairs sorted
    // (price asc, size desc), every earlier row is strictly better in
    // one dimension, so frontier membership is an EXCLUSIVE prefix max
    // — computed two-level (per-cost collapse, bucket-partitioned
    // running max, broadcast bucket offsets), never a dominance
    // self-join; inputs are integral by contract (cents / sizes).
    "q164_pareto_frontier" -> ((s, dir) =>
      Profile.paretoFrontier2D(t(s, dir, "part"),
          round(col("p_retailprice") * 100).cast("long"), col("p_size"))
        .select(col("cost").as("price_c"), col("gain").as("p_size"),
          col("n_rows").as("n_parts"))),

    // Stats: A/B CONVERSION z-test — users split by id parity, per-arm
    // distinct users and converters in one pass, two-proportion z on
    // exact integer counts with one double chain (identical op order
    // in the oracle).
    "q165_ab_test" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("converted"))
        .select((col("user_id") % 2).as("arm"), col("converted"))
      val arms = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
      val a = arms.filter(col("arm") === 0)
        .select(col("n").as("n_a"), col("conv").as("conv_a"))
      val b = arms.filter(col("arm") === 1)
        .select(col("n").as("n_b"), col("conv").as("conv_b"))
      a.crossJoin(b).select(col("n_a"), col("conv_a"), col("n_b"),
        col("conv_b"),
        // degenerate pools (nobody or everybody converted) have a zero
        // denominator — report null, not an ANSI division error
        when(col("conv_a") + col("conv_b") === 0 ||
            col("conv_a") + col("conv_b") === col("n_a") + col("n_b"),
          lit(null))
          .otherwise(
            round((((col("conv_a").cast("double") /
              col("n_a").cast("double")) -
              (col("conv_b").cast("double") / col("n_b").cast("double"))) /
              sqrt(((col("conv_a") + col("conv_b")).cast("double") /
                (col("n_a") + col("n_b")).cast("double")) *
                (lit(1.0) -
                  (col("conv_a") + col("conv_b")).cast("double") /
                    (col("n_a") + col("n_b")).cast("double")) *
                (lit(1.0) / col("n_a").cast("double") +
                  lit(1.0) / col("n_b").cast("double"))))
              .cast("decimal(20,10)"), 4).cast("double")).as("z"))
    }),

    // Stats/eval: exact ROC AUC (ties-aware Mann–Whitney) of the event
    // value as a purchase predictor — the scorer-quality summary of a
    // filtering pipeline, via the KS two-level prefix sum (no
    // single-partition sort of the score domain) and an exact-integer
    // rank-sum numerator; one double division at the end.
    "q170_auc" -> ((s, dir) =>
      Profile.aucExact(t(s, dir, "events"),
        col("event_type") === "purchase",
        round(col("value") * 100).cast("long"), 1000L)),

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

    // Joins/scale: BLOOM-FILTERED runtime join — the semi-join
    // reduction a 100 TB fact×dim join wants: the selective dim side
    // folds to ≤ k·m bloom cells (broadcastable at any dim size), the
    // probe side prefilters map-side with zero false negatives, and
    // the exact join touches only survivors. The false-positive count
    // and the surviving-key revenue are audited in-query.
    "q172_bloom_join" -> ((s, dir) => {
      val dim = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("1995-06-01").cast("date"))
        .select(col("o_orderkey"))
      val reg = Sketch.bloomRegisters(dim, col("o_orderkey"))
      val probes = t(s, dir, "lineitem").select(col("l_orderkey")).distinct()
      val pass = Sketch.bloomMightContain(reg, probes, "l_orderkey")
        .filter(col("might_contain")).select(col("l_orderkey"))
      val matched = pass
        .join(dim, pass("l_orderkey") === dim("o_orderkey"))
        .select(col("l_orderkey"))
      val rev = t(s, dir, "lineitem")
        .join(matched, "l_orderkey", "left_semi")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .cast("long").as("rev_c"))
      val counts = probes.agg(count(lit(1)).as("n_probe_keys"))
        .crossJoin(pass.agg(count(lit(1)).as("n_pass")))
        .crossJoin(matched.agg(count(lit(1)).as("n_match")))
      counts.crossJoin(rev)
        .select(col("n_probe_keys"), col("n_pass"), col("n_match"),
          (col("n_pass") - col("n_match")).as("n_false_pos"), col("rev_c"))
    }),

    // Sampling/scale: RANGE-PARTITION boundary planning — the
    // deterministic bottom-k-by-md5 sample → integer-rank boundaries →
    // per-part row counts/extents audit of how a global sort would
    // partition o_totalprice into 8 ranges.
    "q173_range_bounds" -> ((s, dir) =>
      Sampling.rangePartitionAudit(t(s, dir, "orders"),
          col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"),
          8, 200)
        .orderBy(col("part"))),

    // Text/tokenizer: BPE MERGE LEARNING — three greedy merge rounds
    // over the corpus vocabulary (distinct words with counts collapse
    // FIRST, so per-round work is vocabulary-sized): the distributed
    // core of tokenizer training, with the paren-framed literal-replace
    // trick making merge application engine-exact.
    "q175_bpe_train" -> ((s, dir) => {
      val wc = t(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("w"))
        .filter(col("w").rlike("^[a-z0-9]+$"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      Text.bpeLearnMerges(wc, 3).orderBy(col("round"))
    }),

    // Similarity/PCA: exact fixed-point GRAMIAN of the embedding
    // corpus — the distributed half of tall-skinny PCA/whitening
    // (compute XᵀX in one map-side-combinable pass, eigen-solve the
    // d² matrix locally); cells are exact integers, so the moment
    // matrix is bit-identical on any engine.
    "q176_gramian" -> ((s, dir) =>
      Similarity.gramianFixedPoint(t(s, dir, "embeddings"),
          col("embedding"), 1000)
        .select(col("i"), col("j"), col("g").cast("double").as("g"))),

    // Text/mixture: pairwise source KL DIVERGENCE — add-one-smoothed
    // token distributions compared over the union vocabulary; work is
    // |pairs|·|vocab|, never corpus²; per-term ×1e9 snap keeps the sum
    // order-free.
    "q177_source_kl" -> ((s, dir) =>
      Text.sourceKlDivergence(t(s, dir, "documents"),
          col("source"), col("text"))
        .orderBy(col("kl").desc, col("source_a"), col("source_b"))
        .limit(25)),

    // Stats/eval: exact equal-count CALIBRATION bins — conversion rate
    // per score decile with the bin assignment from exact global ranks
    // (the aucExact two-level prefix sum), ties never straddle a
    // boundary.
    "q178_calibration" -> ((s, dir) =>
      Profile.calibrationBins(t(s, dir, "events"),
          col("event_type") === "purchase",
          round(col("value") * 100).cast("long"), 10, 1000L)
        .orderBy(col("bin"))),

    // Events: TIME-DECAY attribution — completes the attribution
    // family (last-touch q140, linear q158): per-pair 2^(−Δt/7d)
    // weights snapped ×1e6 pre-sum, bounded per-user pair join.
    "q179_decay_attribution" -> ((s, dir) =>
      Events.timeDecayAttribution(t(s, dir, "events"), col("user_id"),
        col("ts"), col("event_id"), col("event_type"), col("value"),
        Seq("click", "view"), "purchase", 7.0)),

    // Sketch/mixture: SKETCHED vocabulary overlap — per-source HLL
    // registers built ONCE serve every pair: pair-union distincts come
    // from per-bucket register max (the mergeable-sketch property, the
    // q166 trick on the source axis) and intersections from
    // inclusion-exclusion. State is ≤ m registers/source at ANY corpus
    // size — the scale path where q168's exact token self-join becomes
    // the audit.
    "q180_sketched_overlap" -> ((s, dir) => {
      val st = t(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text"))).as("tok"))
      val reg = Sketch.hllRegisters(st, Seq("source"), col("tok"))
      val singles = Sketch.hllEstimate(reg, Seq("source"))
      val pairs = singles.as("x").join(singles.as("y"),
          col("x.source") < col("y.source"))
        .select(col("x.source").as("a"), col("x.n_approx").as("n_a"),
          col("y.source").as("b"), col("y.n_approx").as("n_b"))
      val members = pairs.select(col("a"), col("b"),
        explode(array(col("a"), col("b"))).as("source"))
      val uReg = members.join(reg, Seq("source"))
        .groupBy(col("a"), col("b"), col("bucket"))
        .agg(max(col("rho")).as("rho"))
      val uEst = Sketch.hllEstimate(uReg, Seq("a", "b"))
        .withColumnRenamed("n_approx", "n_union")
      pairs.join(uEst, Seq("a", "b"))
        .select(col("a"), col("b"), col("n_a"), col("n_b"), col("n_union"),
          round((col("n_a") + col("n_b") - col("n_union"))
            .cast("decimal(20,10)"), 2).cast("double").as("n_inter_est"))
        .orderBy(col("n_inter_est").desc, col("a"), col("b")).limit(15)
    }),

    // Dedup/leakage: CROSS-SOURCE span-contamination matrix — which
    // source pairs share verbatim 8-token spans: distinct (source, fp)
    // first, so the fp self-join is Σ_fp (#sources)² work; top-15
    // most-contaminated pairs.
    "q181_cross_contamination" -> ((s, dir) =>
      Dedup.crossSourceSpanMatrix(t(s, dir, "documents"), "doc_id",
          col("source"), col("text"), 8)
        .orderBy(col("n_shared_spans").desc, col("source_a"),
          col("source_b"))
        .limit(15)),

    // Stats: THEIL-SEN robust trend per symbol — the median of
    // pairwise slopes shrugs off the outliers that drag q152's OLS:
    // series pre-collapse to monthly last-price points (bounding the
    // per-group pair count), slopes snap ×1e6 pre-median, the median
    // is the exact q167 integer crossing.
    "q182_theil_sen" -> ((s, dir) => {
      val m = bars(s, dir).filter(col("symbol") <= 100)
        .select(col("symbol"),
          (year(col("d")) * 12 + month(col("d")) - 1).as("xm"),
          round(col("px") * 100).cast("long").as("pxc"),
          col("d"), col("ord"))
      val monthly = m.groupBy(col("symbol"), col("xm"))
        .agg(max_by(col("pxc"),
          struct(col("d"), col("ord"), col("pxc"))).as("yc"))
      Profile.theilSenTrend(monthly, col("symbol"), col("xm"), col("yc"))
        .withColumnRenamed("g", "symbol")
    }),

    // Multimodal: image PATCHIFY — 8×4 synthesized BMPs decode through
    // the real parser and split into a 2×2 grid of 4×2 tiles, one
    // exact integer brightness sum per tile (the patch-embedding prep
    // shape; tiles, never payloads, cross the shuffle).
    "q183_image_patches" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        // pad short texts with spaces so charAt never throws on a
        // sub-32-char document (the oracle rpads identically)
        val t32 = if (text.length >= 32) text else (text + " " * 32)
        val pixels = Array.tabulate(32) { i =>
          val cp = t32.charAt(i).toInt
          ((cp % 256) << 16) | (((cp * 7) % 256) << 8) | ((cp * 13) % 256)
        }
        (id, Multimodal.bmpBytes(8, 4, pixels))
      }
      Multimodal.patchBrightness(media, 4, 2)
    }),

    // Stats/rigor: delete-one-block JACKKNIFE standard error of the
    // mean price — uncertainty for a corpus metric without resampling
    // rows: B=20 deterministic hash blocks, leave-one-out means snap
    // ×1e6, variance from exact integer moments.
    "q184_block_jackknife" -> ((s, dir) =>
      Profile.blockJackknifeMean(t(s, dir, "lineitem"),
        col("l_orderkey") * 10 + col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long"), 20)),

    // Profiling: BENFORD first-digit audit — the fabricated-data
    // smell test: first significant digit of price cents (exact via
    // the integer's string head) vs log10(1+1/d), with per-digit χ²
    // contributions.
    "q185_benford" -> ((s, dir) => {
      val v = t(s, dir, "lineitem")
        .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
        .filter(col("v") > 0)
      val counts = v
        .select(substring(col("v").cast("string"), 1, 1).cast("int")
          .as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("nn"))
      val expd = log(10.0,
        lit(1.0) + lit(1.0) / col("digit").cast("double"))
      counts.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round((col("n").cast("double") / col("nn").cast("double"))
            .cast("decimal(20,10)"), 6).cast("double").as("obs_share"),
          round(expd.cast("decimal(20,10)"), 6).cast("double")
            .as("benford_share"),
          round((((col("n").cast("double") -
            col("nn").cast("double") * expd) *
            (col("n").cast("double") -
              col("nn").cast("double") * expd)) /
            (col("nn").cast("double") * expd))
            .cast("decimal(20,10)"), 4).cast("double").as("chi2"))
        .orderBy(col("digit"))
    }),

    // Text/tokenizer: BPE COMPRESSION CURVE — total corpus symbols
    // after each learned merge (round 0 = character baseline): the
    // sequence-length-per-vocabulary-size trade a tokenizer budget
    // decision reads.
    "q186_bpe_compression" -> ((s, dir) => {
      val wc = t(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("w"))
        .filter(col("w").rlike("^[a-z0-9]+$"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      Text.bpeCompressionCurve(wc, 3).orderBy(col("round"))
    }),

    // Similarity/QA: EMBEDDING CENTROID DRIFT — per label, the cosine
    // between the centroids of two deterministic hash halves of the
    // corpus (the self-consistency audit an embedding refresh runs:
    // a healthy label's halves agree, cos ≈ 1). Cosine is
    // scale-invariant, so it computes directly on the ×1000-snapped
    // per-dim SUM vectors — counts never divide, everything is exact
    // integers until one double chain per label.
    "q187_centroid_drift" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("label"),
          Sampling.hashBucket(col("vec_id"), 2).as("half"),
          posexplode(transform(col("embedding"),
            x => round(x.cast("double") * 1000).cast("long")))
            .as(Seq("d", "c")))
      val byDim = e.groupBy(col("label"), col("half"), col("d"))
        .agg(sum(col("c")).as("s"))
      val j = byDim.filter(col("half") === 0)
        .select(col("label"), col("d"), col("s").as("sa"))
        .join(byDim.filter(col("half") === 1)
          .select(col("label"), col("d"), col("s").as("sb")),
          Seq("label", "d"))
      val cos = j.groupBy(col("label"))
        .agg(sum(col("sa").cast("decimal(38,0)") * col("sb")).as("dot"),
          sum(col("sa").cast("decimal(38,0)") * col("sa")).as("na2"),
          sum(col("sb").cast("decimal(38,0)") * col("sb")).as("nb2"))
        .select(col("label"),
          round((col("dot").cast("double") /
            sqrt(col("na2").cast("double") * col("nb2").cast("double")))
            .cast("decimal(20,10)"), 6).cast("double").as("cos_halves"))
      val counts = t(s, dir, "embeddings")
        .select(col("label"), Sampling.hashBucket(col("vec_id"), 2).as("half"))
        .groupBy(col("label"))
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_b"))
      counts.join(cos, Seq("label")).orderBy(col("label"))
    }),

    // Events/segmentation: RFM QUINTILES — per-user recency/frequency/
    // monetary scores binned by exact global quantiles (three uses of
    // the shared Ranks kernel; the (v, bin) maps come back broadcast),
    // segments reported with exact-integer monetary means.
    "q188_rfm" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val maxD = ev.agg(max(to_date(col("ts"))).as("d0"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(max(to_date(col("ts"))).as("last_d"),
          count(lit(1)).as("freq"),
          sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L))
            .as("mon"))
        .crossJoin(broadcast(maxD))
        .select(col("user_id"),
          datediff(col("d0"), col("last_d")).cast("long").as("rec"),
          col("freq"), col("mon"))
      def binJoin(df: DataFrame, c: String, w: Long, out: String) =
        df.join(broadcast(Profile.equalCountBinMap(
            perUser.select(col(c)), col(c), 5, w)
          .select(col("v").as(c), col("bin").as(out))), Seq(c))
      val binned = binJoin(binJoin(binJoin(perUser,
        "rec", 10L, "r_bin"), "freq", 10L, "f_bin"), "mon", 10000L, "m_bin")
      binned.groupBy(col("r_bin"), col("f_bin"), col("m_bin"))
        .agg(count(lit(1)).as("n_users"),
          round((sum(col("mon")).cast("double") /
            count(lit(1)).cast("double") / lit(100.0))
            .cast("decimal(20,10)"), 2).cast("double").as("avg_monetary"))
        .orderBy(col("r_bin"), col("f_bin"), col("m_bin"))
    }),

    // Sampling/planning: DATA-SELECTION CURVE — "keep the top X% by
    // quality: how many tokens do I get?": docs bin into exact quality
    // deciles (best = bin 0, via the shared equal-count kernel on the
    // negated score), each bin reports its token mass and the running
    // cumulative share — the curve a quality-threshold decision reads.
    "q189_selection_curve" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        round(Text.qualityScore(col("text")) * 1e4).cast("long").as("sfp"),
        Text.tokenCount(col("text")).cast("long").as("ntok"))
      val neg = docs.select((-col("sfp")).as("nv"), col("ntok"))
      val bm = Profile.equalCountBinMap(neg.select(col("nv")),
        col("nv"), 10, 100L)
      val per = neg
        .join(broadcast(bm.select(col("v").as("nv"), col("bin"))), Seq("nv"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(Cols.onePartitionKey(col("bin"))).orderBy(col("bin"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val tot = per.agg(sum(col("tokens")).as("tt"))
      per.withColumn("cum_tokens", sum(col("tokens")).over(w))
        .crossJoin(broadcast(tot))
        .select(col("bin"), col("n_docs"), col("tokens"),
          col("cum_tokens"),
          round((col("cum_tokens").cast("double") / col("tt").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("cum_share"))
        .orderBy(col("bin"))
    }),

    // Text/LM: HELD-OUT bigram perplexity with back-off — train on one
    // hash half, score the other: unseen bigrams genuinely back off to
    // smoothed unigrams (λ = 0.7), the real LM-based quality gate.
    "q190_heldout_perplexity" -> ((s, dir) =>
      Text.heldoutBigramNll(t(s, dir, "documents"), "doc_id",
        col("text"), 0.7)),

    // Dedup: CONTENT-DEFINED chunking stats — boundaries fall after
    // hash-selected tokens (mod 8), so chunk fingerprints survive
    // local insertions where fixed-stride spans re-align; corpus-level
    // cross-doc duplication mass.
    "q191_cdc_chunks" -> ((s, dir) =>
      Dedup.cdcChunkStats(t(s, dir, "documents"), "doc_id",
        col("text"), 8)),

    // Dedup/pipeline: the DEDUP CASCADE survivors report — how many
    // docs each successive deterministic dedup stage keeps (exact
    // fingerprint → template skeleton → canonical URL), each stage
    // keeping the min doc_id of its group: the shrinkage audit a
    // pipeline publishes with every corpus build.
    "q192_dedup_cascade" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      def keepMin(df: DataFrame, key: Column) =
        df.groupBy(key.as("__k"))
          .agg(min_by(struct(col("doc_id"), col("text"), col("source")),
            col("doc_id")).as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
            col("r.source").as("source"))
      val s1 = keepMin(base, Text.fingerprint(col("text")))
      val s2 = keepMin(s1, md5(Dedup.templateSkeleton(col("text"))))
      val s3 = keepMin(s2,
        Web.canonicalizeUrl(crawlUrl(col("doc_id"), col("source"))))
      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_surviving"))
          .select(lit(name).as("stage"), col("n_surviving"))
      stage("0_input", base).unionByName(stage("1_exact", s1))
        .unionByName(stage("2_template", s2))
        .unionByName(stage("3_url", s3))
        .orderBy(col("stage"))
    }),

    // Series: ROLLING REGRESSION — per-symbol OLS slope over the
    // trailing 30 daily observations, reported at each series' end:
    // moment sums ride ONE partitioned window (exact DECIMAL(38,0)
    // from integer day×cent inputs, q152's algebra windowed), the
    // series pre-collapses to one row per (symbol, day) so the window
    // order is total and the trailing frame deterministic.
    "q196_rolling_beta" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val daily = bars(s, dir).filter(col("symbol") <= 100)
        .select(col("symbol"), col("d"), col("ord"),
          round(col("px") * 100).cast("long").as("y"))
        .groupBy(col("symbol"), col("d"))
        .agg(max_by(col("y"), struct(col("ord"), col("y"))).as("y"))
        .withColumn("x",
          datediff(col("d"), lit("1970-01-01").cast("date")).cast("long"))
      val w = W.partitionBy(col("symbol")).orderBy(col("d"))
        .rowsBetween(-29, 0)
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val rolled = daily.select(col("symbol"), col("d"),
        count(lit(1)).over(w).as("n"),
        sum(d38(col("x"))).over(w).as("sx"),
        sum(d38(col("y"))).over(w).as("sy"),
        sum(d38(col("x")) * d38(col("x"))).over(w).as("sxx"),
        sum(d38(col("x")) * d38(col("y"))).over(w).as("sxy"))
      val last = rolled.groupBy(col("symbol"))
        .agg(max_by(struct(col("n"), col("sx"), col("sy"), col("sxx"),
          col("sxy")), col("d")).as("r"))
        .select(col("symbol"), col("r.n").as("n_window"),
          col("r.sx").as("sx"), col("r.sy").as("sy"),
          col("r.sxx").as("sxx"), col("r.sxy").as("sxy"))
      val num = last("n_window") * col("sxy") - col("sx") * col("sy")
      val den = last("n_window") * col("sxx") - col("sx") * col("sx")
      last.select(col("symbol"), col("n_window"),
          when(den === 0, lit(null))
            .otherwise(round((num.cast("double") / den.cast("double"))
              .cast("decimal(20,10)"), 6).cast("double")).as("beta"))
        .orderBy(col("symbol"))
    }),

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

    // Dedup: COUNT-PRESERVING dedup — canonical per cluster + the
    // cluster multiplicity as a weight column, so weighted token mass
    // equals the raw corpus total (exact-dup clusters; the invariant
    // the oracle recomputes from fingerprint groups) instead of
    // silently down-weighting popular content.
    "q200_dedup_weights" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      // three consumers (fingerprint chain, weight count, payload
      // re-attach) re-derive the tripled corpus — cache it once (q67's
      // convention)
      val dup = d
        .unionByName(d.select((col("doc_id") + 1000000000).as("doc_id"),
          col("text"), col("lang")))
        .unionByName(d.select((col("doc_id") + 2000000000).as("doc_id"),
          col("text"), col("lang")))
        .persist()
      val fp = dup.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy("doc_id")
      val edges = fp.withColumn("prev", lag(col("doc_id"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("id_a"), col("doc_id").as("id_b"))
      Dedup.dedupWithWeights(dup, "doc_id", edges)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("weight")).cast("long").as("n_represented"),
          sum(col("weight") * Text.tokenCount(col("text")))
            .cast("long").as("weighted_tokens"))
    }),

    // Stats: exact tie-aware SPEARMAN rank correlation of price vs
    // quantity — quantity's tiny integer domain is almost ALL ties, so
    // the doubled mid-rank (2·below + count + 1, exact integers from
    // the shared two-level kernel) is what makes the answer
    // well-defined; Pearson's exact moment algebra runs on the ranks.
    "q201_spearman" -> ((s, dir) =>
      Profile.spearmanExact(t(s, dir, "lineitem"),
        round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"), 100000L)),

    // Stats: CHI-SQUARE independence of lang × source — the
    // composition-drift gate; cells via one hash aggregate, each term
    // through the division-free (n·o − rt·ct)²/(n·rt·ct) identity on
    // exact DECIMAL integers, ×1e6 snap pre-sum.
    "q202_chi2_independence" -> ((s, dir) =>
      Profile.chiSquareIndependence(t(s, dir, "documents"),
        col("lang"), col("source"))),

    // Stats: MUTUAL INFORMATION lang↔source — how many nats of one
    // field the other carries (the cross-field number a "which
    // metadata predicts what" ranking compares); observed cells only,
    // ×1e9 term snaps, normalized MI rides along.
    "q212_mutual_information" -> ((s, dir) =>
      Profile.mutualInformation(t(s, dir, "documents"),
        col("lang"), col("source"))),

    // Stats: KAPLAN–MEIER time-to-first-purchase — per-user durations
    // (hours from first event; no purchase = right-censored at the
    // last event) in ONE user-key aggregate, then the survival curve
    // from two passes of the shared rank kernel (at-risk counts +
    // the ×1e6-snapped ln-hazard running sum).
    "q203_kaplan_meier" -> ((s, dir) => {
      val perUser = t(s, dir, "events").groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("tp"))
      val obs = perUser.select(
        expr("(coalesce(tp, t1) - t0) div 3600000000").as("dur_h"),
        col("tp").isNotNull.as("ev"))
      Profile.kaplanMeier(obs, col("dur_h"), col("ev"), 24L)
    }),

    // Text/ER: SORTED-NEIGHBORHOOD blocking — part names plus their
    // single-deletion variants rank once (two-level prefix ranking on
    // the name vocabulary), names within 8 positions pair, the banded
    // lev kernel verifies. The third blocking family next to
    // first-char (q85) and segments (q109); |vocab|·window candidates,
    // hot-block-proof by construction.
    "q205_sorted_neighborhood" -> ((s, dir) => {
      val parts = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      val len = length(col("p_name"))
      val k = (col("p_partkey") % len).cast("int")
      val names = parts.select(col("p_name").as("nm"))
        .unionByName(parts.select(
          concat(col("p_name").substr(lit(1), k),
            col("p_name").substr(k + 2, len)).as("nm")))
      Text.sortedNeighborhoodPairs(names, col("nm"), 8, 2)
    }),

    // Dedup/planning: MinHash-LSH PARAMETER PLANNER — every (b, r)
    // split of a 16-hash signature scored on an observed LABELED pair
    // sample (planted near-dups = true, shifted-neighbor pairs =
    // false): expected recall vs expected wasted-verify rate, the two
    // numbers a 100 TB banding choice trades. Pair sims are exact
    // |∩|/|∪| ratios via the native sorted-merge intersect.
    "q206_lsh_plan" -> ((s, dir) => {
      val d = docsDup(s, dir).select(col("doc_id").as("id"),
        Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
        .filter(size(col("hs")) > 0)
        .persist() // three consumers: base, planted probe, neighbor probe
      val base = d.filter(col("id") < 1000000000)
      val planted = d.filter(col("id") >= 1000000000)
        .select((col("id") - 1000000000).as("id"), col("hs").as("hs_b"))
      val neigh = base.select((col("id") - 1).as("id"),
        col("hs").as("hs_b"))
      val truePairs = base.join(planted, Seq("id"))
        .select(Dedup.jaccardHashed(col("hs"), col("hs_b")).as("s"),
          lit(true).as("tp"))
      val falsePairs = base.join(neigh, Seq("id"))
        .select(Dedup.jaccardHashed(col("hs"), col("hs_b")).as("s"),
          lit(false).as("tp"))
      Dedup.lshPlan(truePairs.unionByName(falsePairs), col("s"),
        col("tp"), 16)
    }),

    // Text: DISTINGUISHING TERMS per source (log-odds, informative
    // Dirichlet prior, Monroe et al. 2008) — top-5 tokens whose
    // prior-smoothed z marks them as over-represented vs the REST of
    // the corpus; the "what is this source made of" curation read.
    "q207_log_odds_terms" -> ((s, dir) =>
      Text.logOddsTerms(t(s, dir, "documents"), col("source"),
        col("text"), 5)),

    // Text/stats: ZIPF rank-frequency fit — is this corpus shaped like
    // natural language (slope ≈ −1) or like generated/templated spam?
    // The vocabulary aggregates once (hash agg on the token key), the
    // head cut is sort+limit (TakeOrderedAndProject — never a global
    // sort), and the 100-row head ranks under one explicit constant
    // partition; ln(rank)/ln(count) snap ×1e6 so the regression runs
    // on olsTrend's exact DECIMAL moment algebra.
    "q209_zipf_fit" -> ((s, dir) =>
      Text.zipfFit(t(s, dir, "documents"), col("text"), 100)),

    // Text/stats: HEAPS' LAW vocabulary-growth fit over 10 doc-range
    // checkpoints — how much new vocabulary does another 10× of this
    // source buy? Units are word 3-SHINGLES (the synthetic token
    // vocabulary saturates in bucket 0; the n-gram vocabulary keeps
    // growing, so the curve stays informative). Cumulative distinct
    // via each unit's first bucket, never a distinct-in-window.
    "q220_heaps_fit" -> ((s, dir) =>
      Text.heapsFit(t(s, dir, "documents"), col("doc_id"),
        Text.wordShingles(Text.tokens(col("text")), 3), 10)),

    // Text/stats: HILL TAIL-INDEX of the 3-shingle document-frequency
    // distribution (k = 50) — zipfFit reads the head's slope, Hill
    // reads how heavy the extreme tail is: α ≤ 2 says
    // occurrence-weighted sampling has unbounded variance and needs
    // frequency caps. Units are word 3-shingles (q220's convention —
    // the 31-token synthetic vocabulary is too narrow to have a
    // tail). One hash aggregate + a (k+1)-row TakeOrdered head; ln
    // terms snap ×1e6.
    "q225_hill_tail" -> ((s, dir) =>
      Text.hillTailIndex(t(s, dir, "documents"),
        Text.wordShingles(Text.tokens(col("text")), 3), 50)),

    // Text/dedup: WINNOWING fingerprint overlap (Schleimer et al.,
    // SIGMOD 2003 — the MOSS kernel): per doc the rightmost-min hash
    // of every 4-window over positional 4-gram hashes, then the
    // top-20 doc pairs by shared selected hashes. The sketch stores
    // ~2/(w+1) of the gram stream yet GUARANTEES any shared run of
    // ≥ w+k−1 tokens collides — the span-level near-dup audit a
    // 100 TB corpus runs without ever joining full shingle sets.
    // Ubiquitous fingerprints (df > 16) are dropped before pairing —
    // the same df guard every MOSS deployment applies to boilerplate.
    "q221_winnowing" -> ((s, dir) => {
      val fps = Text.winnowingFingerprints(t(s, dir, "documents"),
          col("doc_id"), col("text"), 4, 4)
        .select(col("id"), col("h")).distinct()
      val nf = fps.groupBy(col("id")).agg(count(lit(1)).as("nfp"))
      val kept = fps.join(
        fps.groupBy(col("h")).agg(count(lit(1)).as("dfh"))
          .filter(col("dfh") <= 16).select(col("h")), "h")
      val pairs = kept.as("a")
        .join(kept.as("b"), col("a.h") === col("b.h") &&
          col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
      pairs
        .join(nf.select(col("id").as("doc_a"), col("nfp").as("nfp_a")), "doc_a")
        .join(nf.select(col("id").as("doc_b"), col("nfp").as("nfp_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("n_shared"),
          col("nfp_a"), col("nfp_b"),
          round((col("n_shared").cast("double") /
            least(col("nfp_a"), col("nfp_b")).cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("containment"))
        .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
        .limit(20)
    }),

    // Similarity/eval: CENTROID SEPARATION matrix — pairwise cosine
    // between per-label embedding centroids (the embedding-space
    // drift/slice-separation read; q34 emits the centroid components,
    // this the geometry between them). Cosine is scale-invariant, so
    // it runs on the EXACT ×1e6-snapped per-dim integer sum vectors —
    // no float mean ever aggregates; DECIMAL(38,0) dot/norms through
    // two sqrts and one division. One data-sized posexplode aggregate
    // (map-side combine to labels×dims rows); everything after is
    // labels×dims-sized.
    "q246_centroid_separation" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val dims = t(s, dir, "embeddings")
        .select(col("label").cast("long").as("g"),
          posexplode(col("embedding")))
        .groupBy(col("g"), col("pos"))
        .agg(sum(round(col("col").cast("double") * 1e6).cast("long"))
          .as("sv"), count(lit(1)).as("nn"))
      val norms = dims.groupBy(col("g"))
        .agg(sum(d38(col("sv")) * col("sv")).as("nrm2"),
          max(col("nn")).as("n"))
      val dots = dims.as("a").join(dims.as("b"),
          col("a.pos") === col("b.pos") && col("a.g") < col("b.g"))
        .groupBy(col("a.g").as("la"), col("b.g").as("lb"))
        .agg(sum(d38(col("a.sv")) * col("b.sv")).as("dt"))
      dots
        .join(broadcast(norms.select(col("g").as("la"),
          col("nrm2").as("na2"), col("n").as("n_a"))), "la")
        .join(broadcast(norms.select(col("g").as("lb"),
          col("nrm2").as("nb2"), col("n").as("n_b"))), "lb")
        .select(col("la").as("label_a"), col("lb").as("label_b"),
          col("n_a"), col("n_b"),
          when(col("na2") === 0 || col("nb2") === 0, lit(null))
            .otherwise(round((col("dt").cast("double") /
              (sqrt(col("na2").cast("double")) *
                sqrt(col("nb2").cast("double"))))
              .cast("decimal(20,10)"), 4).cast("double")).as("cos_ab"))
    }),

    // Text: SKIP-GRAM windowed co-occurrence PMI (±3 tokens) — the
    // word-embedding co-occurrence matrix where q100 sees only
    // adjacent bigrams. Pairs come straight off each token array in
    // one projection (≤ window·tokens rows, NO position self-join),
    // unordered (least, greatest) canonical form, vocab margins
    // broadcast onto the ≥25-count survivors.
    "q245_skipgram_pmi" -> ((s, dir) =>
      Text.skipgramPmi(t(s, dir, "documents"), col("text"), 3, 25L)),

    // Text/graph: TEXTRANK keyword scores (Mihalcea & Tarau 2004) —
    // unweighted PageRank over the ±2-token co-occurrence word graph,
    // the graph-centrality keyword extractor beside the frequency
    // (q38) and log-odds (q212) term scores. Pairs ride q245's
    // single-projection generator (no position self-join); the ≥25
    // count threshold bounds the graph to the heavy vocab before any
    // iteration; 3 damped rounds of the q135 kernel (×1e9 snapped
    // contributions, bit-identical cross-engine); top-20 keywords via
    // sort+limit (TakeOrderedAndProject, never a global sort).
    "q247_textrank" -> ((s, dir) => {
      val pairs = Text.skipgramPairs(t(s, dir, "documents"),
          col("text"), 2)
        .filter(col("a") =!= col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 25)
      // materialize the tiny thresholded edge table ONCE: pageRank's
      // plan references its edges ~6× (nodes, outdeg, one join per
      // round) and each reference would otherwise re-run the
      // corpus-sized pair aggregation (measured 18.9 s cold → 2.4 s)
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"),
          col("a").as("dst")))
        .localCheckpoint(true)
      Graph.pageRank(edges, 3)
        .select(col("id").as("token"),
          round(col("pr").cast("decimal(20,10)"), 8).cast("double")
            .as("score"))
        .orderBy(col("score").desc, col("token")).limit(20)
    }),

    // Reporting: CUBE corpus profile — all four (source × lang)
    // grouping sets of the doc-count/char-mass profile in ONE pass
    // (Spark's Expand: 4 set-tagged copies feed one partially-
    // aggregated shuffle, never four scans), grouping flags
    // disambiguate rolled-up cells from data NULLs. The multi-level
    // rollup every corpus dashboard wants without re-scanning 100 TB
    // per level.
    "q248_cube_profile" -> ((s, dir) =>
      t(s, dir, "documents")
        .cube(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          grouping(col("source")).cast("int").as("g_source"),
          grouping(col("lang")).cast("int").as("g_lang"))),

    // Reporting: PIVOT — event-type × weekday count matrix as ONE
    // wide aggregate (Spark's pivot with an EXPLICIT value list stays
    // a single groupBy — no distinct-scan to discover columns, the
    // scale contract); absent cells coalesce to 0 on both engines.
    "q249_pivot_weekday" -> ((s, dir) => {
      val p = t(s, dir, "events")
        .select(col("event_type"), dayofweek(col("ts")).as("dow"))
        .groupBy(col("event_type"))
        .pivot("dow", (1 to 7).map(i => i: Any))
        .agg(count(lit(1)))
      p.select(col("event_type") +:
        (1 to 7).map(i =>
          coalesce(col(s"`$i`"), lit(0L)).as(s"d$i")): _*)
    }),

    // Stats: 1-D WASSERSTEIN drift — each source's length distribution
    // vs the rest over a 64-bin grid, the transport-cost companion to
    // PSI/KL (q86/q185: how much mass disagrees) and KS (q90: max CDF
    // gap): W1 integrates |ΔCDF| so it also sees HOW FAR the mass
    // moved. One data-sized (source, bin) aggregate; the CDF algebra
    // runs on the sources×64 grid in exact DECIMAL(38,0)
    // cross-multiples.
    "q250_wasserstein_drift" -> ((s, dir) =>
      Profile.wassersteinVsRest(t(s, dir, "documents"), col("source"),
          col("n_chars"), 64)
        .withColumnRenamed("g", "source")),

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

    // Stats: SIGN-FLIP randomization test — does a user's purchase
    // value sit above their click value? Paired per-user mean diffs
    // (µ-snapped longs), 64 deterministic md5-parity flip replicates
    // manufacture the exchangeable null, add-one p-value. The exact-
    // null companion to q171's parametric z-test; zero RNG, so the
    // verdict is reproducible on any engine or cluster layout.
    "q252_signflip_test" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("user_id"),
          col("event_type"),
          round(col("value") * 1e6).cast("long").as("vu"))
      val pu = ev.groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", col("vu")))
            .as("sp"),
          count(when(col("event_type") === "purchase", lit(1)))
            .as("np"),
          sum(when(col("event_type") === "click", col("vu"))).as("sc"),
          count(when(col("event_type") === "click", lit(1))).as("nc"))
        .filter(col("np") > 0 && col("nc") > 0)
        .select(col("user_id"),
          round((col("sp").cast("double") / col("np").cast("double") -
            col("sc").cast("double") / col("nc").cast("double"))
            .cast("decimal(20,10)"), 0).cast("long").as("dm"))
      Profile.signFlipTest(pu, col("user_id"), col("dm"), 64)
    }),

    // ER: GOLDEN-RECORD fusion (survivorship) — after clustering, a
    // master record per cluster: modal attribute vote with the
    // (count desc, value asc) tie rule, max char count, min id as the
    // canonical key. The duplicated corpus plants attribute NOISE
    // (mirror copies relabel source, every 3rd/5th doc's lang flips)
    // so the vote genuinely fuses — including 3-way count ties on
    // doc_id % 15 docs. Clusters ride the exact-fingerprint partition
    // (≤ handful rows per fp window); the modal votes are per-cluster
    // row_number over the tiny (cluster, attr) count table.
    "q253_golden_record" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val c0 = d.select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      val c1 = d.select((col("doc_id") + 1000000000).as("doc_id"),
        col("text"),
        when(col("doc_id") % 3 === 0, lit("yy")).otherwise(col("lang"))
          .as("lang"),
        lit("mirror").as("source"),
        (col("n_chars") + 2).as("n_chars"))
      val c2 = d.select((col("doc_id") + 2000000000).as("doc_id"),
        col("text"),
        when(col("doc_id") % 5 === 0, lit("xx")).otherwise(col("lang"))
          .as("lang"),
        col("source"), col("n_chars"))
      val cl = c0.unionByName(c1).unionByName(c2)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), Text.fingerprint(col("text")).as("fp"))
        .withColumn("cluster", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      def modal(attr: String): DataFrame =
        cl.groupBy(col("cluster"), col(attr))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("cluster").orderBy(col("n").desc, col(attr))))
          .filter(col("rn") === 1).select(col("cluster"), col(attr))
      cl.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"),
          max(col("n_chars")).as("n_chars_max"))
        .join(modal("lang"), "cluster")
        .join(modal("source"), "cluster")
        .select(col("cluster"), col("n_members"), col("lang"),
          col("source"), col("n_chars_max"))
    }),

    // Similarity/IR: MMR DIVERSIFIED re-ranking — greedy top-5 from
    // each query's 20-candidate brute pool at λ = 0.7, the
    // redundancy-penalized result page beside the pure-relevance
    // top-k (q31). All-integer micro scoring (7·rel − 3·maxsim), 5
    // driver-coordinated rounds with a ≤10-row collect each (the
    // greedy q239 precedent).
    "q254_mmr_rerank" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.mmrRerank(e.filter(col("id") < 10), e, 20, 5)
    }),

    // Text/ML: MULTINOMIAL NAIVE BAYES lang classifier — 3:1 hash
    // split, add-one token likelihoods fit on train, held-out docs
    // argmax-scored, confusion counts out. The supervised baseline
    // beside q25's heuristic langId and q138's bigram LM; ×1e6
    // integer log-weights keep every score an exact sum.
    "q255_naive_bayes" -> ((s, dir) =>
      Text.naiveBayesEval(t(s, dir, "documents"), "doc_id",
          col("lang"), col("text"))
        .withColumnRenamed("y", "lang")),

    // Text/eval: CORPUS-OVERLAP precision (the self-BLEU corpus
    // redundancy read): per source, the CLIPPED share of its bigram
    // occurrences already covered by the rest of the corpus —
    // Σ min(own_g, rest_g) / Σ own_g. High overlap = the source adds
    // little content the pool doesn't have; the diversity dial a
    // data-mixture tuner reads beside q88's token mixing. Two hash
    // aggregates + one equi-join on the bigram key, exact integer
    // clipping.
    "q256_corpus_overlap" -> ((s, dir) => {
      val tk = t(s, dir, "documents")
        .select(col("source"), Text.tokens(col("text")).as("tk"))
      val bg = tk.select(col("source"),
        explode(when(size(col("tk")) < 2,
            array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat(element_at(col("tk"), i), lit(" "),
              element_at(col("tk"), i + 1))))).as("g"))
      val sb = bg.groupBy(col("source"), col("g"))
        .agg(count(lit(1)).as("own"))
      val tb = sb.groupBy(col("g")).agg(sum(col("own")).as("tot"))
      sb.join(tb, "g")
        .groupBy(col("source"))
        .agg(sum(col("own")).as("n_bigrams"),
          round((sum(least(col("own"), col("tot") - col("own")))
            .cast("double") / sum(col("own")).cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("overlap"))
    }),

    // Stats/text: JENSEN–SHANNON divergence per source vs rest — the
    // symmetric ln2-bounded drift read beside the directional KL
    // (q185) and the binned PSI/W1 (q86/q250): mixture-referenced, no
    // smoothing, 0·ln0 terms drop exactly. Vocabulary×sources term
    // grid off one (source, token) aggregate, ×1e9 term snaps.
    "q257_js_divergence" -> ((s, dir) =>
      Text.sourceJsVsRest(t(s, dir, "documents"), col("source"),
        col("text"))),

    // Series: LEAD-LAG cross-correlation — Pearson r between the
    // daily view series and the purchase series shifted by −3..+3
    // days; the argmax lag says which stream LEADS (q83 correlates
    // only at lag 0). One data-sized (day, type) aggregate; the lag
    // sweep is a 7-way shifted equi-join on the tiny day grid, exact
    // DECIMAL(38,0) moment algebra, one sqrt + one division per lag.
    "q258_lead_lag" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val dd = t(s, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val v = dd.filter(col("event_type") === "view")
        .select(col("d"), col("n").as("x"))
      val p = dd.filter(col("event_type") === "purchase")
        .select(col("d").as("pd"), col("n").as("y"))
      val lags = s.range(-3, 4).toDF("lag")
        .select(col("lag").cast("int").as("lag"))
      v.crossJoin(broadcast(lags))
        .join(p, expr("pd = date_add(d, lag)"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_days"),
          sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
          sum(d38(col("x")) * col("y")).as("sxy"),
          sum(d38(col("x")) * col("x")).as("sxx"),
          sum(d38(col("y")) * col("y")).as("syy"))
        .select(col("lag"), col("n_days"),
          when(d38(col("n_days")) * col("sxx") === col("sx") * col("sx")
            || d38(col("n_days")) * col("syy") === col("sy") * col("sy"),
            lit(null))
            .otherwise(round(
              ((d38(col("n_days")) * col("sxy") - col("sx") * col("sy"))
                .cast("double") /
                (sqrt((d38(col("n_days")) * col("sxx") -
                  col("sx") * col("sx")).cast("double")) *
                 sqrt((d38(col("n_days")) * col("syy") -
                  col("sy") * col("sy")).cast("double"))))
              .cast("decimal(20,10)"), 4).cast("double")).as("r"))
    }),

    // Stats: SIMPSON'S PARADOX audit — the OLS slope of value-cents
    // on hour-of-day, pooled vs per-event-type: a stratum whose slope
    // SIGN disagrees with the pooled slope is the aggregation-bias
    // red flag (the pooled trend would mislead). Exact integer moment
    // algebra (the q147 OLS shape), ×1e6 slope snap, sign from the
    // exact integers — never from the rounded double.
    "q259_simpson_audit" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val rows = t(s, dir, "events")
        .select(col("event_type").as("g"),
          hour(col("ts")).cast("long").as("x"),
          round(col("value") * 100).cast("long").as("y"))
      def moments(df: DataFrame, keys: Seq[Column]): DataFrame =
        df.groupBy(keys: _*)
          .agg(count(lit(1)).as("n"),
            sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
            sum(d38(col("x")) * col("y")).as("sxy"),
            sum(d38(col("x")) * col("x")).as("sxx"))
          .withColumn("num", d38(col("n")) * col("sxy") -
            col("sx") * col("sy"))
          .withColumn("den", d38(col("n")) * col("sxx") -
            col("sx") * col("sx"))
      val pooled = moments(rows.withColumn("g", lit("_all")),
          Seq(col("g")))
        .select(col("num").as("pnum"), col("den").as("pden"))
      val strata = moments(rows, Seq(col("g")))
      // sign off the EXACT decimal — a >2^53 numerator cast to double
      // could round a hair past zero
      def sgn(c: Column): Column =
        when(c > 0, lit(1)).when(c < 0, lit(-1)).otherwise(lit(0))
      strata.crossJoin(broadcast(pooled))
        .select(col("g"), col("n"),
          round((col("num").cast("double") / col("den").cast("double")
            * 1e6).cast("decimal(20,10)"), 0).cast("long")
            .as("slope_micro"),
          sgn(col("num")).as("sign"),
          sgn(col("pnum")).as("pooled_sign"),
          (sgn(col("num")) =!= sgn(col("pnum"))).as("flip"))
    }),

    // Stats/eval: BRIER (Murphy) DECOMPOSITION — an hour-of-day
    // purchase-rate predictor fit on a hash half, held-out Brier
    // split into reliability − resolution + uncertainty over the
    // constant-prediction groups (the WHY behind q178's calibration
    // curve: miscalibration vs missing discrimination).
    "q260_brier_decomposition" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(hour(col("ts")).as("h"),
          (col("event_type") === "purchase").cast("long").as("y"),
          Sampling.hashBucket(col("event_id"), 2).as("b"))
      val tr = ev.filter(col("b") === 0).groupBy(col("h"))
        .agg(count(lit(1)).as("nh"), sum(col("y")).as("ph"))
        .select(col("h"),
          round((col("ph").cast("double") / col("nh").cast("double")
            * 1e6).cast("decimal(20,10)")).cast("long").as("p"))
      Profile.brierDecomposition(
        ev.filter(col("b") =!= 0).join(broadcast(tr), "h"),
        col("p"), col("y"))
    }),

    // Text/stats: YULE'S K vocabulary-richness characteristic per
    // source — K = 10⁴·(Σ_r r²V_r − N)/N², which collapses to the
    // frequency-spectrum-free 10⁴·(Σc² − N)/N² over the (source,
    // token) counts: length-robust repetitiveness beside Heaps'
    // growth (q220), Zipf slope (q209) and Good–Turing mass (q241).
    // One (source, token) aggregate + one per-source rollup, exact
    // DECIMAL(38,0) moments, one snapped division.
    "q261_yules_k" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      t(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text")))
          .as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(d38(col("c")) * col("c")).as("m2"))
        .select(col("source"), col("n_tokens"), col("vocab"),
          round((lit(1e4) * (col("m2") - col("n_tokens")).cast("double")
            / (d38(col("n_tokens")) * col("n_tokens")).cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("yules_k"))
    }),

    // Events/curation: RFM SEGMENTATION — every user scored 1–5 on
    // recency (5 = most recent), frequency and monetary by EXACT
    // quintile ranks (q178's below·5 ÷ N rule on the two-level prefix
    // kernel — ties never straddle a boundary, no data-sized sort
    // partition), then the ≤125-cell segment table with exact
    // monetary means. The classic audience/cohort cut for any
    // engagement warehouse.
    "q262_rfm_segments" -> ((s, dir) => {
      def floorDiv(a: Column, b: Column): Column =
        ((a - pmod(a, b)) / b).cast("long")
      val ev = t(s, dir, "events").select(col("user_id").as("u"),
        to_date(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("vc"))
      val mx = ev.agg(max(col("d")).as("dmax"))
      val usr = ev.crossJoin(broadcast(mx))
        .groupBy(col("u"))
        .agg(min(datediff(col("dmax"), col("d"))).cast("long").as("rec"),
          count(lit(1)).as("freq"), sum(col("vc")).as("mon"))
      val nn = usr.agg(count(lit(1)).as("n"))
      def qscore(vcol: String): DataFrame = {
        val byV = usr.groupBy(col(vcol).cast("long").as("v"))
          .agg(count(lit(1)).as("cnt"))
        Ranks.withRunningBelow(byV, "v", 64L, Seq("cnt"))
          .crossJoin(broadcast(nn))
          .select(col("v"),
            (floorDiv(col("cnt_below") * 5, col("n")) + 1).cast("int")
              .as("q"))
      }
      val r = qscore("rec")
        .select(col("v").as("rec"), (lit(6) - col("q")).as("r_score"))
      val f = qscore("freq")
        .select(col("v").as("freq"), col("q").as("f_score"))
      val m = qscore("mon")
        .select(col("v").as("mon"), col("q").as("m_score"))
      usr.join(broadcast(r), "rec").join(broadcast(f), "freq")
        .join(m, "mon")
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"),
          round((sum(col("mon")).cast("double") /
            count(lit(1)).cast("double") / lit(100.0))
            .cast("decimal(20,10)"), 2).cast("double")
            .as("avg_monetary"))
    }),

    // Events/mining: pairwise ASSOCIATION RULES over per-user
    // event-type baskets — support, confidence and lift for every
    // ordered item pair (the market-basket classic; lift > 1 = the
    // pair co-occurs beyond independence). One distinct (user, item)
    // shuffle, pair generation is a per-basket self-join bounded by
    // the item vocabulary (the 100 TB contract: baskets are small,
    // the user key is the only data-sized shuffle), exact integer
    // ratios snapped 4dp.
    "q263_association_rules" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val ut = t(s, dir, "events")
        .select(col("user_id").as("u"), col("event_type").as("it"))
        .distinct()
      val pairs = ut.as("x").join(ut.as("y"),
          col("x.u") === col("y.u") && col("x.it") =!= col("y.it"))
        .groupBy(col("x.it").as("a"), col("y.it").as("b"))
        .agg(count(lit(1)).as("n_ab"))
      val items = ut.groupBy(col("it")).agg(count(lit(1)).as("n_i"))
      val nn = ut.select(col("u")).distinct().agg(count(lit(1)).as("n"))
      pairs
        .join(broadcast(items.select(col("it").as("a"),
          col("n_i").as("n_a"))), "a")
        .join(broadcast(items.select(col("it").as("b"),
          col("n_i").as("n_b"))), "b")
        .crossJoin(broadcast(nn))
        .select(col("a"), col("b"), col("n_a"), col("n_b"), col("n_ab"),
          round((col("n_ab").cast("double") / col("n").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("support"),
          round((col("n_ab").cast("double") / col("n_a").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("confidence"),
          round(((d38(col("n")) * col("n_ab")).cast("double") /
            (d38(col("n_a")) * col("n_b")).cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("lift"))
    }),

    // Curation: MIXTURE-WEIGHT GRID SEARCH — held-out NLL of the
    // interpolated unigram LM α·P_src0 + (1−α)·P_rest on src0's own
    // held-out half, swept over α = 0%..100% in 10% steps: the
    // in-engine answer to "how much in-domain mix helps" (the 1-D
    // DoReMi sweep; read the argmin row off the 11-row curve). One
    // (token, class) train aggregate; the held-out occurrence stream
    // fans ×11 against a broadcast alpha grid and collapses in one
    // map-side-combined aggregate; −ln terms snap ×1e6 pre-sum.
    "q264_mixture_grid" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"),
        Text.tokens(col("text")).as("tk"),
        (Sampling.hashBucket(col("doc_id"), 2) === 0).as("tr"))
      val occ = d.select(col("source"), col("tr"),
        explode(col("tk")).as("tok"))
      val cnt = occ.filter(col("tr")).groupBy(col("tok"))
        .agg(sum(when(col("source") === "src0", 1L).otherwise(0L))
            .as("c0"),
          sum(when(col("source") =!= "src0", 1L).otherwise(0L))
            .as("cr"))
      val tots = cnt.agg(sum(col("c0")).as("n0"),
        sum(col("cr")).as("nr"), count(lit(1)).as("v"))
      val alphas = s.range(0, 11)
        .select((col("id") * 10).cast("int").as("alpha_pct"))
      val a = col("alpha_pct").cast("double") / lit(100.0)
      occ.filter(!col("tr") && col("source") === "src0")
        .select(col("tok"))
        .join(cnt, Seq("tok"), "left")
        .select(coalesce(col("c0"), lit(0L)).as("c0"),
          coalesce(col("cr"), lit(0L)).as("cr"))
        .crossJoin(broadcast(tots))
        .crossJoin(broadcast(alphas))
        .select(col("alpha_pct"),
          round(-log(a * ((col("c0") + 1).cast("double") /
              (col("n0") + col("v")).cast("double")) +
            (lit(1.0) - a) * ((col("cr") + 1).cast("double") /
              (col("nr") + col("v")).cast("double"))) * lit(1e6))
            .cast("long").as("tf"))
        .groupBy(col("alpha_pct"))
        .agg(count(lit(1)).as("n_terms"),
          round((sum(col("tf")).cast("double") /
            (count(lit(1)).cast("double") * lit(1e6)))
            .cast("decimal(20,10)"), 4).cast("double").as("avg_nll"))
    }),

    // Warehouse: SCD TYPE-2 dimension history — the slowly-changing-
    // dimension op the reference's SCD-1 upsert (K2/q06) can't
    // express: each symbol's price band becomes validity INTERVALS
    // (valid_from, valid_to = day before the next change, open +
    // is_current for the live row). Run boundaries by lag-compare →
    // prefix-sum run ids → one aggregate per run; everything rides
    // the ONE symbol-key window exchange, run-table windows are
    // per-symbol and tiny.
    "q265_scd2_history" -> ((s, dir) => {
      def floorDiv(a: Column, b: Column): Column =
        ((a - pmod(a, b)) / b).cast("long")
      val W = org.apache.spark.sql.expressions.Window
      val b = Merge.keepLatestInSeries(
          bars(s, dir).filter(col("symbol") <= 500), Seq("symbol"),
          Seq("d"), struct(col("ord"), col("px"), col("vol")))
        .select(col("symbol"), col("d"),
          floorDiv(round(col("px") * 100).cast("long"), lit(2000L))
            .as("band"))
      val w = W.partitionBy("symbol").orderBy("d")
      val runs = b
        .withColumn("prev", lag(col("band"), 1).over(w))
        .withColumn("chg", when(col("prev").isNull ||
          col("prev") =!= col("band"), 1L).otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(
          w.rowsBetween(W.unboundedPreceding, W.currentRow)))
      runs.groupBy(col("symbol"), col("run_id"), col("band"))
        .agg(min(col("d")).as("valid_from"),
          count(lit(1)).as("n_days"))
        .withColumn("nxt", lead(col("valid_from"), 1).over(
          W.partitionBy("symbol").orderBy("run_id")))
        .select(col("symbol"), col("band"), col("valid_from"),
          coalesce(date_sub(col("nxt"), 1),
            lit("9999-12-31").cast("date")).as("valid_to"),
          col("n_days"), col("nxt").isNull.as("is_current"))
    }),

    // Reporting: UNPIVOT (melt) — the wide per-user type×cents matrix
    // (q54's pivot shape) melted back to long via Spark's native
    // unpivot operator; null cells (type never seen for the user)
    // drop, so pivot→unpivot is exactly the direct (user, type)
    // aggregate — the oracle IS that identity. Completes the
    // reshaping surface: cube (q248), pivot (q249), unpivot here.
    "q268_unpivot" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val wide = t(s, dir, "events").groupBy(col("user_id"))
        .pivot("event_type", types.map(x => x: Any))
        .agg(sum(round(col("value") * 100).cast("long")))
      wide.unpivot(Array(col("user_id")),
          types.map(x => col(s"`$x`")).toArray,
          "event_type", "cents")
        .filter(col("cents").isNotNull)
    }),

    // Stats/causal: CLUSTER-ROBUST standard error — value-cents mean
    // per cohort with the naive iid SE beside the USER-clustered SE
    // (events of one user correlate; iid SEs overstate precision —
    // the q171/q272 readings are honest only at the cluster-robust
    // width). CR0 sandwich on exact per-user residual sums:
    // Var_cl = Σ_u(s_u − n_u·m)²/N², design effect = Var_cl/Var_iid.
    // One (cohort, user) aggregate; residual algebra in DECIMAL(38,0)
    // cross-multiples (×N keeps it integer), two snapped divisions.
    "q287_cluster_robust_se" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val ug = t(s, dir, "events")
        .select((col("user_id") % 2 === 0).as("tr"), col("user_id"),
          round(col("value") * 100).cast("long").as("vc"))
        .groupBy(col("tr"), col("user_id"))
        .agg(count(lit(1)).as("nu"), sum(col("vc")).as("su"),
          sum(d38(col("vc")) * col("vc")).as("ssu"))
      val tot = ug.groupBy(col("tr"))
        .agg(count(lit(1)).as("n_users"), sum(col("nu")).as("n"),
          sum(col("su")).as("sv"), sum(col("ssu")).as("ssv"))
      // Σ_u (N·s_u − n_u·S)² — the ×N-scaled clustered residual mass,
      // exact because every factor is an integer
      val crm = ug.join(broadcast(tot), "tr")
        .select(col("tr"),
          ((d38(col("n")) * col("su") - d38(col("nu")) * col("sv")) *
            (d38(col("n")) * col("su") - d38(col("nu")) * col("sv")))
            .as("r2"))
        .groupBy(col("tr")).agg(sum(col("r2")).as("crm"))
      val xiid = d38(col("n")) * col("ssv") - col("sv") * col("sv")
      tot.join(crm, "tr")
        .select(col("tr").as("treat_cohort"), col("n_users"), col("n"),
          round((col("sv").cast("double") / col("n").cast("double") /
            lit(100.0)).cast("decimal(20,10)"), 2).cast("double")
            .as("mean_value"),
          round((sqrt(xiid.cast("double") /
            (d38(col("n")) * col("n") * col("n")).cast("double")) /
            lit(100.0)).cast("decimal(20,10)"), 4).cast("double")
            .as("se_iid"),
          round((sqrt(col("crm").cast("double") /
            (d38(col("n")) * col("n") * col("n") * col("n"))
              .cast("double")) / lit(100.0)).cast("decimal(20,10)"), 4)
            .cast("double").as("se_cluster"),
          round((col("crm").cast("double") /
            (d38(col("n")) * xiid).cast("double"))
            .cast("decimal(20,10)"), 2).cast("double")
            .as("design_effect"))
    }),

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

    // Storage: the SNAPSHOT layer inside the correctness gate — two
    // MERGE batches (fresh table commit, then a partial overwrite)
    // land in a real on-disk snapshot table, and the query reads the
    // committed state back through Snapshot.read. The oracle replays
    // the same keep-latest-by-version algebra in SQL, so a regression
    // in commit/merge/read/manifest resolution now fails the round
    // artifact, not just the spec suite (round-10 verdict gap).
    "q308_snapshot_upsert" -> ((s, dir) => {
      import graft.sources.Snapshot
      // gate on a 1/16 symbol slice: the merge/commit/read/manifest
      // algebra is identical per partition, so the slice proves the
      // same keep-latest-by-version semantics at a fraction of the
      // I/O (r11 verdict: the unbounded version cost 28.5 s — 7.5% of
      // the whole bench — moving full volume a gate doesn't need).
      // The filter sits BEFORE the collapse groupBy, so the dedup
      // shuffle shrinks with the slice too.
      val uniq = bars(s, dir).filter(col("symbol") % 16 === 0)
        .groupBy(col("symbol"), col("d"))
        .agg(max(struct(col("ord"), col("px"), col("vol"))).as("w"))
        .select(col("symbol"), col("d"),
          col("w.px").as("px"), col("w.vol").as("vol"),
          date_format(col("d"), "yyyy-MM").as("m"))
      val b0 = uniq.withColumn("version", lit(0L))
      val b1 = uniq.filter(col("symbol") % 3 === 0)
        .withColumn("px", col("px") * 2)
        .withColumn("version", lit(1L))
      val tbl = gateTempDir("q308") + "/t"
      Snapshot.merge(b0, tbl, Seq("symbol", "d"), "version", "m")
      Snapshot.merge(b1, tbl, Seq("symbol", "d"), "version", "m")
      Snapshot.read(s, tbl)
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n_rows"), round(sum(col("px")), 2)
          .as("px_sum"))
    }),

    // Streaming: the foreachBatch → Snapshot pipeline inside the
    // correctness gate — profileThinStream replays the documents
    // table as an AvailableNow stream through the distribution-match
    // thinning rule into a snapshot table; the oracle computes the
    // batch kept-set (q251's kp algebra) per (source, bin). The
    // stream/batch parity StreamingSpec pins is now also driver-
    // visible: a silent streaming regression fails CORRECTNESS_rN.
    "q309_stream_profile_thin" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val stats = Sampling.profileMatchStats(docs, col("source"),
        col("n_chars"), 32)
      val tmp = gateTempDir("q309")
      docs.select(col("source").as("g"), col("n_chars").as("v"),
          col("doc_id").cast("string").as("k"))
        .write.parquet(tmp + "/in")
      val schema = s.read.parquet(tmp + "/in").schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.profileThinStream(
          s.readStream.schema(schema).parquet(tmp + "/in"), stats, 32,
          tmp + "/t", tmp + "/ck")
      }
      graft.sources.Snapshot.read(s, tmp + "/t")
        .groupBy(col("g").as("source"), col("bin"))
        .agg(count(lit(1)).as("n_kept"))
    }),

    // Annotation QA: KRIPPENDORFF'S ALPHA (nominal) over three
    // synthetic raters of the language label (rater 1 = the gold
    // lang; raters 2/3 flip every 7th/11th doc to a noise code) —
    // the multi-rater agreement gate a labeling pipeline runs before
    // trusting a batch (q226's kappa stops at two raters). With
    // m_u = 3 codings per unit the whole estimator is exact integer
    // algebra: per-unit disagreeing ordered pairs D_u = 6 − Σ_c
    // n_uc(n_uc−1), α = 1 − (n−1)·ΣD_u / (2·((Σn_c)² − Σn_c²)) —
    // one (unit, code) aggregate + two tiny rollups, one double
    // division at the end.
    "q310_krippendorff" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val codes = d.select(col("doc_id").as("unit"),
          col("lang").as("code"))
        .unionByName(d.select(col("doc_id").as("unit"),
          when(col("doc_id") % 7 === 0, lit("xx"))
            .otherwise(col("lang")).as("code")))
        .unionByName(d.select(col("doc_id").as("unit"),
          when(col("doc_id") % 11 === 0, lit("xx"))
            .otherwise(col("lang")).as("code")))
      val nuc = codes.groupBy(col("unit"), col("code"))
        .agg(count(lit(1)).as("m"))
      val du = nuc.groupBy(col("unit"))
        .agg((lit(6L) - sum(col("m") * (col("m") - 1))).as("d2"))
        .agg(sum(col("d2")).as("d2"), count(lit(1)).as("nu"))
      val marg = nuc.groupBy(col("code")).agg(sum(col("m")).as("nc"))
        .agg(sum(col("nc")).as("ntot"),
          sum(col("nc") * col("nc")).as("nc2"))
      du.crossJoin(broadcast(marg))
        .select(col("nu").as("n_units"), col("ntot").as("n_codings"),
          round((lit(1.0) -
            ((col("ntot") - 1) * col("d2")).cast("double") /
            (lit(2L) * (col("ntot") * col("ntot") - col("nc2")))
              .cast("double")).cast("decimal(20,10)"), 6)
            .cast("double").as("alpha"))
    }),

    // Attribution: MARKOV REMOVAL EFFECT — the data-driven
    // multi-touch model (vs q140 last-touch / q158 linear / q179
    // decay, which are positional heuristics): session journeys →
    // absorbing-chain transition counts → P(conv) from START with
    // each channel's inbound edges cut; credit ∝ removal effect.
    // Eight ×1e9-snapped unrolled value-iteration steps on
    // |channels|·|states|-row frames (see Events.markovRemovalEffect).
    "q311_removal_effect" -> ((s, dir) =>
      Events.markovRemovalEffect(
        Events.journeyTransitions(t(s, dir, "events"),
          col("user_id"), col("ts"), col("event_id"),
          col("event_type"), 1800L, "purchase"))),

    // Stats: TWO-REGRESSOR OLS by exact normal equations — the
    // hedonic price model p_retailprice ~ p_size + len(p_name),
    // solved by Cramer's rule on EXACT centered DECIMAL(38,0)
    // moment sums (q152's single-regressor trend can't untangle
    // correlated features; the centered 2×2 system stays inside 38
    // digits where the raw 3×3 would overflow). Betas, intercept,
    // and R² leave integerland in one deterministic double division
    // each.
    "q312_multi_ols" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val r = t(s, dir, "part").select(
        round(col("p_retailprice") * 100).cast("long").as("y"),
        col("p_size").cast("long").as("a"),
        length(col("p_name")).cast("long").as("b"))
      val g = r.agg(count(lit(1)).as("n"),
        sum(d38(col("a"))).as("sa"), sum(d38(col("b"))).as("sb"),
        sum(d38(col("y"))).as("sy"),
        sum(d38(col("a")) * col("a")).as("saa"),
        sum(d38(col("a")) * col("b")).as("sab"),
        sum(d38(col("b")) * col("b")).as("sbb"),
        sum(d38(col("a")) * col("y")).as("say"),
        sum(d38(col("b")) * col("y")).as("sby"),
        sum(d38(col("y")) * col("y")).as("syy"))
      val c = g.select(col("n"), col("sa"), col("sb"), col("sy"),
        (d38(col("n")) * col("saa") - col("sa") * col("sa")).as("caa"),
        (d38(col("n")) * col("sab") - col("sa") * col("sb")).as("cab"),
        (d38(col("n")) * col("sbb") - col("sb") * col("sb")).as("cbb"),
        (d38(col("n")) * col("say") - col("sa") * col("sy")).as("cay"),
        (d38(col("n")) * col("sby") - col("sb") * col("sy")).as("cby"),
        (d38(col("n")) * col("syy") - col("sy") * col("sy")).as("cyy"))
      // degenerate designs (constant regressor → det = 0; constant
      // response → cyy = 0) yield null, never a NaN→null-by-cast
      // divergence from the SQL oracle (ADVICE r11, the q313 guard)
      val detX = col("caa") * col("cbb") - col("cab") * col("cab")
      val det = detX.cast("double")
      val ba = (col("cay") * col("cbb") - col("cby") * col("cab"))
        .cast("double") / det
      val bb = (col("cby") * col("caa") - col("cay") * col("cab"))
        .cast("double") / det
      c.select(col("n"),
        when(detX === 0, lit(null)).otherwise(
          round((ba / lit(100.0)).cast("decimal(20,10)"), 6)
            .cast("double")).as("beta_size"),
        when(detX === 0, lit(null)).otherwise(
          round((bb / lit(100.0)).cast("decimal(20,10)"), 6)
            .cast("double")).as("beta_namelen"),
        when(detX === 0, lit(null)).otherwise(
          round(((col("sy").cast("double") - ba * col("sa").cast("double")
              - bb * col("sb").cast("double")) / col("n").cast("double")
              / lit(100.0)).cast("decimal(20,10)"), 4)
            .cast("double")).as("intercept"),
        when(detX === 0 || col("cyy") === 0, lit(null)).otherwise(
          round(((ba * col("cay").cast("double") +
              bb * col("cby").cast("double")) / col("cyy").cast("double"))
              .cast("decimal(20,10)"), 6)
            .cast("double")).as("r2"))
    }),

    // Experimentation: CUPED variance reduction — the pre-period
    // covariate adjustment every mature A/B platform applies before
    // reading a metric (q165's z-test reads the raw delta). Users
    // split at the time midpoint into pre (X) / post (Y) cent sums;
    // θ = cov(X,Y)/var(X) from EXACT centered DECIMAL(38,0) moments,
    // per-arm adjusted mean = (ΣY − θ(ΣX − n·mean X))/n, and the
    // variance-reduction share θ·Sxy/Syy (= ρ²) — each leaving
    // integerland in one deterministic double chain.
    "q313_cuped" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val ev = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("vc"))
      val ext = ev.agg(floor((min(col("us")) + max(col("us"))) / 2)
        .cast("long").as("mid"))
      val pu = ev.crossJoin(broadcast(ext))
        .groupBy(col("user_id"))
        .agg(sum(when(col("us") <= col("mid"), col("vc"))
            .otherwise(0L)).as("x"),
          sum(when(col("us") > col("mid"), col("vc"))
            .otherwise(0L)).as("y"))
        .select((col("user_id") % 2).as("arm"), col("x"), col("y"))
      val tot = pu.agg(count(lit(1)).as("n"),
          sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
          sum(d38(col("x")) * col("x")).as("sxx"),
          sum(d38(col("x")) * col("y")).as("sxy"),
          sum(d38(col("y")) * col("y")).as("syy"))
        .select(col("n"), col("sx"),
          (d38(col("n")) * col("sxx") - col("sx") * col("sx"))
            .as("cxx"),
          (d38(col("n")) * col("sxy") - col("sx") * col("sy"))
            .as("cxy"),
          (d38(col("n")) * col("syy") - col("sy") * col("sy"))
            .as("cyy"))
      val arms = pu.groupBy(col("arm")).agg(count(lit(1)).as("ng"),
        sum(d38(col("x"))).as("sxg"), sum(d38(col("y"))).as("syg"))
      val theta = col("cxy").cast("double") / col("cxx").cast("double")
      val meanx = col("sx").cast("double") / col("n").cast("double")
      arms.crossJoin(broadcast(tot))
        .select(col("arm"), col("ng").as("n_users"),
          round((col("syg").cast("double") / col("ng").cast("double") /
            lit(100.0)).cast("decimal(20,10)"), 4).cast("double")
            .as("mean_y"),
          when(col("cxx") === 0, lit(null)).otherwise(
            round(((col("syg").cast("double") - theta *
              (col("sxg").cast("double") -
                col("ng").cast("double") * meanx)) /
              col("ng").cast("double") / lit(100.0))
              .cast("decimal(20,10)"), 4).cast("double"))
            .as("mean_y_cuped"),
          when(col("cxx") === 0 || col("cyy") === 0, lit(null))
            .otherwise(round((theta * col("cxy").cast("double") /
              col("cyy").cast("double")).cast("decimal(20,10)"), 6)
              .cast("double")).as("var_reduction"))
    }),

    // PII audit: LUHN-VALID NUMBER GATE — candidate digit runs of
    // 13–16 digits checked against the Luhn checksum (q69's regex
    // redaction can't tell a card number from a tracking id; the
    // checksum can). Deterministic plants (a known-valid and a
    // known-invalid test number on every 37th/41st doc) give the gate
    // known positives. The checksum is a per-row array fold — pure
    // codegen, no UDF, no shuffle beyond the source-key rollup.
    "q314_luhn_gate" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("source"),
        concat(col("text"),
          when(col("doc_id") % 37 === 0,
            lit(" pay 4532015112830366")).otherwise(lit("")),
          when(col("doc_id") % 41 === 0,
            lit(" ref 4532015112830367")).otherwise(lit("")))
          .as("text"))
      val cands = planted.select(col("source"),
          explode(expr("regexp_extract_all(text, '[0-9]+', 0)"))
            .as("c"))
        .filter(length(col("c")).between(13, 16))
      val dsum = cands.withColumn("s",
        aggregate(transform(sequence(lit(1), length(col("c"))),
          j => {
            val d = col("c").substr(j, lit(1)).cast("int")
            when(pmod(length(col("c")) - j, lit(2)) === 1,
              when(d > 4, d * 2 - 9).otherwise(d * 2)).otherwise(d)
          }),
          lit(0), (acc, x) => acc + x))
      dsum.groupBy(col("source")).agg(
        count(lit(1)).as("n_candidates"),
        sum(when(pmod(col("s"), lit(10)) === 0, 1L).otherwise(0L))
          .as("n_luhn_valid"))
        .withColumn("valid_share",
          round((col("n_luhn_valid").cast("double") /
            col("n_candidates").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double"))
    }),

    // Feature engineering: WEIGHT OF EVIDENCE + INFORMATION VALUE of
    // order-value deciles against the urgent-priority label — the
    // credit-scoring-style predictive-power read a feature store runs
    // before training (q233's lift curve ranks by score; WoE/IV bins
    // a FEATURE). Exact rank deciles via the two-level prefix kernel
    // (no global sort), exact bin counts, one ln per bin.
    "q315_woe_iv" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        round(col("o_totalprice") * 100).cast("long").as("v"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("pos"))
      val byV = o.groupBy(col("v"))
        .agg(count(lit(1)).as("tot"), sum(col("pos")).as("p"))
      val rk = Ranks.withRunningBelow(byV, "v", 1000000L, Seq("tot"))
      val nn = byV.agg(sum(col("tot")).as("n"), sum(col("p"))
        .as("npos"))
      val t10 = col("tot_below") * 10
      val bins = rk.crossJoin(broadcast(nn))
        .select(((t10 - pmod(t10, col("n"))) / col("n")).cast("long")
            .as("decile"), col("tot"), col("p"), col("n"), col("npos"))
        .groupBy(col("decile"))
        .agg(sum(col("tot")).as("n_d"), sum(col("p")).as("pos_d"),
          max(col("n")).as("n"), max(col("npos")).as("npos"))
        .select(col("decile"), col("n_d"), col("pos_d"),
          (col("n_d") - col("pos_d")).as("neg_d"),
          col("npos"), (col("n") - col("npos")).as("nneg"))
      bins.select(col("decile"), col("n_d").as("n"),
        col("pos_d").as("n_pos"),
        when(col("pos_d") === 0 || col("neg_d") === 0 ||
            col("npos") === 0 || col("nneg") === 0, lit(null))
          .otherwise(round(log((col("pos_d") * col("nneg"))
              .cast("double") / (col("neg_d") * col("npos"))
              .cast("double")).cast("decimal(20,10)"), 4)
            .cast("double")).as("woe"),
        when(col("pos_d") === 0 || col("neg_d") === 0 ||
            col("npos") === 0 || col("nneg") === 0, lit(null))
          .otherwise(round(((col("pos_d").cast("double") /
              col("npos").cast("double") -
              col("neg_d").cast("double") /
              col("nneg").cast("double")) *
              log((col("pos_d") * col("nneg")).cast("double") /
                (col("neg_d") * col("npos")).cast("double")))
              .cast("decimal(20,10)"), 6).cast("double"))
          .as("iv_term"))
    }),

    // Inequality: GINI CONCENTRATION of per-user activity by event
    // type — how concentrated is each action in few power users (the
    // bot/whale diagnostic; q284's cache curve reads the same skew
    // but not as a single comparable index). Tie-invariant exact
    // integer form on the value histogram: num = Σ_v v·cnt_v·
    // (2·below_v + cnt_v − n), G = num/(n·Σvx) — ranks from the
    // grouped two-level prefix kernel, no global sort, one division.
    "q316_gini_activity" -> ((s, dir) => {
      val pu = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("x"))
      val byV = pu.groupBy(col("event_type"), col("x"))
        .agg(count(lit(1)).as("cnt"))
      val rk = Ranks.withRunningBelowBy(byV, "event_type", "x", 100L,
        Seq("cnt"))
      val tot = byV.groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("n"),
          sum(col("x") * col("cnt")).as("sx"))
      rk.join(tot, "event_type")
        .groupBy(col("event_type"), col("n"), col("sx"))
        .agg(sum(col("x") * col("cnt") *
          (lit(2L) * col("cnt_below") + col("cnt") - col("n")))
          .as("num"))
        .select(col("event_type"), col("n").as("n_users"),
          col("sx").as("n_events"),
          round((col("num").cast("double") /
            (col("n") * col("sx")).cast("double"))
            .cast("decimal(20,10)"), 6).cast("double").as("gini"))
    }),

    // Inequality: THEIL T DECOMPOSITION of document length across
    // sources — T = between + Σ share·within, the additive split a
    // corpus-balance audit wants (is length inequality a few bloated
    // SOURCES, or bloat inside each source?). Terms take one ln per
    // DISTINCT (source, length) value, ×1e9-snapped pre-sum; the
    // mass ratios stay exact integer products inside the ln.
    "q317_theil_decomposition" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"), col("n_chars").as("x"))
        .filter(col("x") >= 1)
      val bySrcV = d.groupBy(col("source"), col("x"))
        .agg(count(lit(1)).as("cnt"))
      val grp = bySrcV.groupBy(col("source"))
        .agg(sum(col("cnt")).as("ng"),
          sum(col("x") * col("cnt")).as("sg"))
      val glob = grp.agg(sum(col("ng")).as("nn"), sum(col("sg"))
        .as("ss"))
      val p = (col("x") * col("ng")).cast("double") /
        col("sg").cast("double")
      val within = bySrcV.join(grp, "source")
        .select(col("source"), col("ng"), col("sg"),
          (round(p * log(p) * 1e9).cast("long") * col("cnt")).as("t9"))
        .groupBy(col("source"), col("ng"), col("sg"))
        .agg(sum(col("t9")).as("t9"))
      within.crossJoin(broadcast(glob))
        .select(col("source"), col("ng").as("n_docs"),
          round((col("sg").cast("double") / col("ss").cast("double"))
            .cast("decimal(20,10)"), 6).cast("double")
            .as("mass_share"),
          round((col("t9").cast("double") / lit(1e9) /
            col("ng").cast("double")).cast("decimal(20,10)"), 6)
            .cast("double").as("t_within"),
          round(((col("sg").cast("double") / col("ss").cast("double"))
            * log((col("sg") * col("nn")).cast("double") /
              (col("ss") * col("ng")).cast("double")))
            .cast("decimal(20,10)"), 6).cast("double")
            .as("between_term"))
    }),

    // Stylometry: BURROWS' DELTA between sources — mean |Δz| of the
    // 30 corpus-wide most-frequent tokens' relative frequencies,
    // z-scored across sources (the authorship/provenance distance;
    // q305's containment reads vocabulary OVERLAP, Delta reads USAGE
    // RATES). Frequencies snap ×1e9 before any cross-source moment,
    // so variances are exact integers and |z_a−z_b| = k·|Δf9|/√V
    // takes one sqrt per token; 20 closest pairs.
    "q318_burrows_delta" -> ((s, dir) => {
      val st = t(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(col("text")))
          .as("tok"))
      val cnts = st.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val stot = st.groupBy(col("source")).agg(count(lit(1)).as("tt"))
      val top = cnts.groupBy(col("tok")).agg(sum(col("c")).as("gc"))
        .orderBy(col("gc").desc, col("tok")).limit(30)
      // 30·|sources| rows; checkpoint so the token explode runs in
      // ONE job instead of once per downstream reference
      val dense = stot.crossJoin(broadcast(top.select(col("tok"))))
        .join(cnts, Seq("source", "tok"), "left")
        .select(col("source"), col("tok"),
          round(coalesce(col("c"), lit(0L)).cast("double") /
            col("tt").cast("double") * 1e9).cast("long").as("f9"))
        .localCheckpoint(true)
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val vt = dense.groupBy(col("tok"))
        .agg(count(lit(1)).as("k"), sum(d38(col("f9"))).as("sf"),
          sum(d38(col("f9")) * col("f9")).as("sff"))
        .select(col("tok").as("vtok"), col("k"),
          (d38(col("k")) * col("sff") - col("sf") * col("sf"))
            .as("v"))
      val diffs = dense.as("a").join(dense.as("b"),
          col("a.tok") === col("b.tok") &&
            col("a.source") < col("b.source"))
        .select(col("a.source").as("source_a"),
          col("b.source").as("source_b"), col("a.tok").as("tok"),
          abs(col("a.f9") - col("b.f9")).as("adf"))
      diffs.join(broadcast(vt), col("tok") === col("vtok"))
        .select(col("source_a"), col("source_b"),
          when(col("v") === 0, lit(0L)).otherwise(
            round(col("adf").cast("double") * col("k").cast("double")
              / sqrt(col("v").cast("double")) * 1e6).cast("long"))
            .as("t6"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(sum(col("t6")).as("s6"), count(lit(1)).as("m"))
        .select(col("source_a"), col("source_b"),
          round((col("s6").cast("double") / lit(1e6) /
            col("m").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("delta"))
        .orderBy(col("delta"), col("source_a"), col("source_b"))
        .limit(20)
    }),

    // Recommender: ITEM-ITEM COLLABORATIVE SIMILARITY — cosine on
    // the binary order×part matrix via the per-basket self-join
    // (work bounded by Σ basket², the inverted-index shape — never
    // items²): co(i,j)/√(n_i·n_j), support ≥ 3, top-20. The
    // co-purchase neighborhood a retrieval/recs pipeline precomputes
    // (q161's lift is directional confidence; cosine is symmetric
    // degree-normalized).
    "q319_item_cf" -> ((s, dir) => {
      val bi = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("i"))
        .distinct()
      val ni = bi.groupBy(col("i")).agg(count(lit(1)).as("n"))
      val co = bi.as("a").join(bi.as("b"),
          col("a.o") === col("b.o") && col("a.i") < col("b.i"))
        .groupBy(col("a.i").as("part_a"), col("b.i").as("part_b"))
        .agg(count(lit(1)).as("co"))
        .filter(col("co") >= 3)
      co.join(ni.select(col("i").as("part_a"), col("n").as("na")),
          "part_a")
        .join(ni.select(col("i").as("part_b"), col("n").as("nb")),
          "part_b")
        .select(col("part_a"), col("part_b"), col("co"),
          round((col("co").cast("double") /
            sqrt((col("na") * col("nb")).cast("double")))
            .cast("decimal(20,10)"), 4).cast("double").as("cosine"))
        .orderBy(col("cosine").desc, col("part_a"), col("part_b"))
        .limit(20)
    }),

    // Finance: VWAP vs TWAP per symbol-month — the execution-quality
    // pair every fills pipeline reports (q01's bars keep OHLC shape;
    // VWAP weighs price by traded size, TWAP by time). Exact integer
    // cent·unit numerators, two divisions per group at the end.
    "q320_vwap" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      bars(s, dir)
        .select(col("symbol"), date_format(col("d"), "yyyy-MM")
            .as("m"),
          round(col("px") * 100).cast("long").as("pxc"),
          round(col("vol")).cast("long").as("q"))
        .groupBy(col("symbol"), col("m"))
        .agg(count(lit(1)).as("n_fills"), sum(col("q")).as("qty"),
          sum(d38(col("pxc")) * col("q")).as("pv"),
          sum(d38(col("pxc"))).as("sp"))
        .select(col("symbol"), col("m"), col("n_fills"), col("qty"),
          // qty = 0 (an all-zero-volume month) yields null, not a
          // NaN→null-by-cast oracle divergence (ADVICE r11)
          when(col("qty") === 0, lit(null)).otherwise(
            round((col("pv").cast("double") / col("qty").cast("double")
              / lit(100.0)).cast("decimal(20,10)"), 4).cast("double"))
            .as("vwap"),
          round((col("sp").cast("double") /
            col("n_fills").cast("double") / lit(100.0))
            .cast("decimal(20,10)"), 4).cast("double").as("twap"))
    }),

    // Series mining: SAX MOTIFS — weekly mean prices z-scored per
    // symbol and mapped to a 4-letter alphabet at the N(0,1)
    // quartile breakpoints, then 3-week words counted corpus-wide
    // (the discretized shape vocabulary behind motif/novelty
    // detection). The z comparison is cross-multiplied —
    // m·v − Σv vs ±0.6745·√(mΣv²−(Σv)²) — so the only doubles are
    // one sqrt per symbol and the comparison itself; ties and
    // windows stay on the symbol key.
    "q321_sax_motifs" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val wk = bars(s, dir)
        .select(col("symbol"), date_trunc("week", col("d"))
            .cast("date").as("w"),
          round(col("px") * 100).cast("long").as("pxc"))
        .groupBy(col("symbol"), col("w"))
        .agg(round(sum(col("pxc")).cast("double") / count(lit(1)) *
          1e4).cast("long").as("v9"))
      val mom = wk.groupBy(col("symbol"))
        .agg(count(lit(1)).as("mw"), sum(d38(col("v9"))).as("sv"),
          sum(d38(col("v9")) * col("v9")).as("svv"))
        .filter(col("mw") >= 8)
        .select(col("symbol"), col("mw"), col("sv"),
          (d38(col("mw")) * col("svv") - col("sv") * col("sv"))
            .as("vm"))
        .filter(col("vm") > 0)
      val lhs = (d38(col("mw")) * col("v9") - col("sv"))
        .cast("double")
      val thr = lit(0.6745) * sqrt(col("vm").cast("double"))
      val lettered = wk.join(mom, "symbol")
        .select(col("symbol"), col("w"),
          when(lhs < -thr, lit("a")).when(lhs < 0, lit("b"))
            .when(lhs < thr, lit("c")).otherwise(lit("d")).as("cls"))
      val ww = Window.partitionBy(col("symbol")).orderBy(col("w"))
      lettered
        .select(concat(col("cls"), lead(col("cls"), 1).over(ww),
          lead(col("cls"), 2).over(ww)).as("word"))
        .filter(col("word").isNotNull)
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    }),

    // Streaming gate (r11 verdict task 3): the PERSISTENT-LSH-INDEX
    // dedup stream replayed over a DETERMINISTIC two-batch split of
    // the near-dup corpus (evens then odds; the split is part of the
    // query definition, so the oracle replays batch 0's survivors
    // before batch 1). Exercises the whole incremental contract that
    // was spec-only: fresh postings probe the STORED index (history
    // wins at any id order) ∪ earlier-id own-batch postings,
    // candidates verify by exact Jaccard ≥ 0.5 against point-lookup
    // corpus reads, survivors commit per-batch. A regression in
    // banding, index merge, readForKeys pruning, or the keep-first
    // asymmetry now fails CORRECTNESS_rN, not just StreamingSpec.
    "q322_lsh_dedup_stream" -> ((s, dir) => {
      val dd = docsDup(s, dir)
      val tmp = gateTempDir("q322")
      val in = writeStreamBatches(Seq(
        dd.filter(col("doc_id") % 2 === 0),
        dd.filter(col("doc_id") % 2 === 1)), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.lshDedupStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in),
          tmp + "/t", tmp + "/idx", tmp + "/ck", threshold = 0.5,
          bands = 4, rowsPerBand = 4)
      }
      graft.sources.Snapshot.read(s, tmp + "/t")
        .groupBy(col("ingest_batch"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("id_sum"))
    }),

    // Storage gate (r11 verdict task 3): TIME TRAVEL + CDC DIFF +
    // transactional DELETE inside the correctness gate. Three
    // committed versions — v1 = fresh table, v2 = merge of updates
    // (symbol%3: px doubled, version 1) and inserts (symbol%7
    // mirrored to -symbol), v3 = DELETE WHERE symbol%5=0 — then the
    // result reads v1 via time travel, v3 live, and the v1→v3
    // semantic diff (added/changed/removed keys). The oracle replays
    // the same keep-latest + delete algebra in SQL, so manifest
    // version resolution, the diff fingerprint, and partition-scoped
    // delete rewrites are all driver-visible.
    "q323_snapshot_timetravel" -> ((s, dir) => {
      import graft.sources.Snapshot
      // year-grain partitions (~7 dirs, vs q308's month grain): the
      // partition-scoped commit/merge/delete semantics gate identically
      // and the 3-commit fixed cost stops scaling with dir count
      val uniq = bars(s, dir).filter(col("symbol") % 64 === 1)
        .groupBy(col("symbol"), col("d"))
        .agg(max(struct(col("ord"), col("px"), col("vol"))).as("w"))
        .select(col("symbol"), col("d"),
          col("w.px").as("px"), col("w.vol").as("vol"),
          date_format(col("d"), "yyyy").as("m"))
      val tbl = gateTempDir("q323") + "/t"
      val v1 = Snapshot.merge(uniq.withColumn("version", lit(0L)),
        tbl, Seq("symbol", "d"), "version", "m")
      val upd = uniq.filter(col("symbol") % 3 === 0)
        .withColumn("px", col("px") * 2).withColumn("version", lit(1L))
      val ins = uniq.filter(col("symbol") % 7 === 0)
        .select((-col("symbol")).as("symbol"), col("d"), col("px"),
          col("vol"), col("m")).withColumn("version", lit(1L))
      Snapshot.merge(upd.unionByName(ins), tbl,
        Seq("symbol", "d"), "version", "m")
      val v3 = Snapshot.deleteWhere(s, tbl, col("symbol") % 5 === 0)
      val d13 = Snapshot.diff(s, tbl, v1, v3, Seq("symbol", "d"))
        .groupBy(col("change_type")).agg(count(lit(1)).as("n"))
        .select(concat(lit("diff:"), col("change_type")).as("facet"),
          col("n"), lit(null).cast("double").as("px_sum"))
      def snap(v: Long, name: String) = Snapshot.read(s, tbl, Some(v))
        .agg(count(lit(1)).as("n"), round(sum(col("px")), 2).as("px_sum"))
        .select(lit(name).as("facet"), col("n"), col("px_sum"))
      d13.unionByName(snap(v1, "v1")).unionByName(snap(v3, "v3"))
    }),

    // Streaming gate (r11 verdict task 3): ENTITY RESOLUTION stream
    // replayed over a deterministic two-batch split — batch 0 the
    // base names, batch 1 one-char-deleted variants. Every variant
    // must resolve to its committed entity (or an earlier-id record
    // of its own batch) within 1 edit and be absorbed; novel records
    // commit per batch. The recall-complete segment blocking, the
    // vsOld/vsNew incremental asymmetry, and the snapshot append all
    // gate here (erStream was spec-only before this).
    "q324_er_stream" -> ((s, dir) => {
      val base = t(s, dir, "part").filter(col("p_partkey") % 4 === 0)
        .select(col("p_partkey").as("rec_id"), col("p_name").as("name"))
      val len = length(col("name"))
      val k = (col("rec_id") % len).cast("int")
      val variants = base.select((col("rec_id") + 2000000000).as("rec_id"),
        concat(col("name").substr(lit(1), k),
          col("name").substr(k + 2, len)).as("name"))
      val tmp = gateTempDir("q324")
      val in = writeStreamBatches(Seq(base, variants), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.erStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in),
          tmp + "/t", tmp + "/ck", maxDist = 1)
      }
      graft.sources.Snapshot.read(s, tmp + "/t")
        .groupBy(col("ingest_batch"))
        .agg(count(lit(1)).as("n_entities"),
          sum(col("rec_id")).cast("long").as("id_sum"))
    }),

    // Graph: HARMONIC CENTRALITY from landmark seeds (every 100th
    // doc) truncated at 4 hops — the disconnected-safe closeness over
    // the q135 link graph. maxHops=4 exceeds the checkpoint cadence,
    // so the seed-keyed BFS runs its lineage-truncation path (ADVICE
    // r11: shortestHopsPerSeed was caller-less and un-truncated). The
    // reciprocal sum rides ×lcm(1..4)=12 exact integers; one double
    // division per seed at the end.
    "q325_harmonic_centrality" -> ((s, dir) =>
      Graph.harmonicCentrality(docLinkEdges(s, dir),
        t(s, dir, "documents").filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("id")), 4)),

    // Streaming gate: EVENT-TIME WATERMARK late-data semantics — the
    // first gate query where the WATERMARK ITSELF decides rows (q309/
    // q322/q324 replay content-idempotent pipelines the watermark
    // never touches). THREE micro-batches split at the time
    // terciles; batch 2 re-delivers every 13th FIRST-TERCILE event
    // as late data. Spark's contract, mirrored µs-exactly by the
    // oracle: late events filter against the PREVIOUS batch's
    // watermark while eviction uses the current one (SPARK-40925 —
    // an empirical find: with only two batches nothing ever drops,
    // because batch 1's late-filter watermark is still 0). So a
    // batch-2 row drops iff its hour-window end ≤ (ms-truncated max
    // batch-0 event time − 72h) — the watermark that was CURRENT
    // during batch 1 — survivors double-count, and the final no-data
    // flush emits exactly the windows whose end ≤ the final
    // watermark.
    "q326_stream_watermark" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("ts"), col("event_type"),
        col("value"), col("event_id"), unix_micros(col("ts")).as("us"))
      val ext = ev.agg(min(col("us")).as("t0"), max(col("us")).as("t3"))
        .select(
          (col("t0") + floor((col("t3") - col("t0")) / 3).cast("long"))
            .as("t1"),
          (col("t0") + floor((col("t3") - col("t0")) * 2 / 3)
            .cast("long")).as("t2"))
      val evm = ev.crossJoin(broadcast(ext))
      val pick = (c: Column) => evm.filter(c)
        .select(col("ts"), col("event_type"), col("value"))
      val b0 = pick(col("us") <= col("t1"))
      val b1 = pick(col("us") > col("t1") && col("us") <= col("t2"))
      val b2 = pick(col("us") > col("t2"))
        .unionByName(pick(col("us") <= col("t1") &&
          col("event_id") % 13 === 0))
      val tmp = gateTempDir("q326")
      val in = writeStreamBatches(Seq(b0, b1, b2), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams.hourlyRollup(
            s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
              .parquet(in), watermark = "72 hours"),
          tmp + "/out", tmp + "/ck")
      }
      s.read.parquet(tmp + "/out")
    }),

    // Storage gate: CONCURRENT WRITER CONTENTION — two threads merge
    // key-disjoint updates into the SAME partitions of one snapshot
    // table at once; optimistic concurrency gives exactly one of each
    // racing pair the manifest, the loser re-merges on the winner via
    // mergeRetrying (Snapshot.scala manifest CAS). The final state is
    // commit-order-independent because the writers' key sets are
    // disjoint, so the oracle replays both updates unconditionally —
    // lost updates, double-applies, or a swallowed retry all fail the
    // round artifact now (the race was spec-only before).
    "q327_merge_contention" -> ((s, dir) => {
      import graft.sources.Snapshot
      val uniq = bars(s, dir).filter(col("symbol") % 64 === 2)
        .groupBy(col("symbol"), col("d"))
        .agg(max(struct(col("ord"), col("px"), col("vol"))).as("w"))
        .select(col("symbol"), col("d"),
          col("w.px").as("px"), col("w.vol").as("vol"),
          date_format(col("d"), "yyyy").as("m"))
      val tbl = gateTempDir("q327") + "/t"
      Snapshot.merge(uniq.withColumn("version", lit(0L)), tbl,
        Seq("symbol", "d"), "version", "m")
      val wA = uniq.filter(col("symbol") % 128 === 2)
        .withColumn("px", col("px") * 2).withColumn("version", lit(1L))
      val wB = uniq.filter(col("symbol") % 128 === 66)
        .withColumn("px", col("px") * 3).withColumn("version", lit(1L))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ths = Seq(wA, wB).map(df => new Thread(() =>
        try { Snapshot.mergeRetrying(df, tbl,
          Seq("symbol", "d"), "version", "m"); () }
        catch { case e: Throwable => errs.add(e); () }))
      ths.foreach(_.start()); ths.foreach(_.join())
      if (!errs.isEmpty) throw errs.peek()
      Snapshot.read(s, tbl).groupBy(col("m"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("px")), 2).as("px_sum"),
          sum(col("version")).cast("long").as("version_sum"))
    }),

    // Streaming gate: CRAWL-FRONTIER URL dedup replayed over the
    // even/odd two-batch split — batch 1 URLs whose canonical form the
    // committed frontier already holds are absorbed; within a batch
    // the smallest doc_id per canonical key wins. Canonicalization is
    // the codegen'd q130 chain; the anti-join runs against the
    // frontier SNAPSHOT (urlDedupStream was spec-only).
    "q328_url_dedup_stream" -> ((s, dir) => {
      val du = docUrls(s, dir).select(col("doc_id"), col("url"))
      val tmp = gateTempDir("q328")
      val in = writeStreamBatches(Seq(
        du.filter(col("doc_id") % 2 === 0),
        du.filter(col("doc_id") % 2 === 1)), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.urlDedupStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), tmp + "/t", tmp + "/ck")
      }
      graft.sources.Snapshot.read(s, tmp + "/t")
        .groupBy(col("ingest_batch"))
        .agg(count(lit(1)).as("n_urls"),
          sum(col("doc_id")).cast("long").as("id_sum"))
    }),

    // Streaming gate: HLL REGISTER stream — per-batch registers fold
    // into the running table via the crash-atomic two-rename swap;
    // because per-bucket max is associative+commutative, the final
    // registers (and so the estimate) must equal the single-pass batch
    // sketch, which is exactly what the oracle computes (q56's SQL
    // register machinery). Gates sketchStream's merge + swap protocol
    // end-to-end (was spec-only).
    "q329_sketch_stream" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("user_id"), col("event_id"))
      val tmp = gateTempDir("q329")
      val in = writeStreamBatches(Seq(
        ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1)), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.sketchStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), tmp + "/reg", tmp + "/ck",
          Seq("event_type"), col("user_id"))
      }
      Sketch.hllEstimate(s.read.parquet(tmp + "/reg"),
        Seq("event_type"))
    }),

    // Streaming gate: the CORPUS-GROWING prefix-kernel dedup stream
    // (dedupStream — the recall-COMPLETE sibling of q322's LSH path):
    // because the prefix index is exact, the oracle needs no banding —
    // batch-0 drops are earlier-id own-batch Jaccard ≥ 0.5 matches,
    // batch-1 drops match batch-0 SURVIVORS at any id order or
    // earlier-id own-batch rows.
    "q330_dedup_stream" -> ((s, dir) => {
      // third-corpus subset keyed on the BASE id so each planted
      // near-dup pair survives or drops atomically (q213's audit
      // economics): the gate proves the same incremental contract at
      // ~1/9 the pair-join cost
      val dd = docsDup(s, dir).filter((col("doc_id") % 1000000000) % 3 === 0)
      val tmp = gateTempDir("q330")
      val in = writeStreamBatches(Seq(
        dd.filter(col("doc_id") % 2 === 0),
        dd.filter(col("doc_id") % 2 === 1)), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.dedupStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), tmp + "/t", tmp + "/ck", threshold = 0.5)
      }
      graft.sources.Snapshot.read(s, tmp + "/t")
        .groupBy(col("ingest_batch"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("id_sum"))
    }),

    // Streaming gate: the VECTOR-modality dedup stream over the frozen
    // IVF coarse model (annDedupStream): the first batch's 16
    // lowest-id vectors seed the centroids; candidates are same-cell
    // members of the committed corpus (any id order) ∪ earlier-id
    // own-batch; exact double cosine ≥ 0.99 verifies. The oracle
    // replays the frozen-seed assignment and both batch rounds.
    "q331_ann_dedup_stream" -> ((s, dir) => {
      // base-id-keyed third subset: planted (base, perturbed) pairs
      // stay atomic, same-cell pair cost drops ~9x (q213 economics)
      val vecs = q123Vectors(s, dir)
        .filter((col("id") % 1000000000) % 3 === 0)
        .select(col("id").as("doc_id"),
          transform(col("vec"), _.cast("float")).as("vec"))
      val tmp = gateTempDir("q331")
      val in = writeStreamBatches(Seq(
        vecs.filter(col("doc_id") % 2 === 0),
        vecs.filter(col("doc_id") % 2 === 1)), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.annDedupStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), tmp + "/t", tmp + "/model", tmp + "/ck",
          threshold = 0.9, centroidsK = 16)
      }
      graft.sources.Snapshot.read(s, tmp + "/t")
        .groupBy(col("ingest_batch"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("id_sum"))
    }),

    // Storage gate: TAG PINNING through VACUUM — v1 is tagged, two
    // more versions commit, then vacuum(keep=1) deletes every
    // untagged old version. The tagged snapshot must stay readable
    // (its data dirs pinned), the dropped middle version must be
    // GONE, and the live head must read correctly. Facets: the tag
    // read-back, the live read, and the retained version count.
    "q332_snapshot_tags_vacuum" -> ((s, dir) => {
      import graft.sources.Snapshot
      val uniq = bars(s, dir).filter(col("symbol") % 64 === 3)
        .groupBy(col("symbol"), col("d"))
        .agg(max(struct(col("ord"), col("px"), col("vol"))).as("w"))
        .select(col("symbol"), col("d"),
          col("w.px").as("px"), col("w.vol").as("vol"),
          date_format(col("d"), "yyyy").as("m"))
      val tbl = gateTempDir("q332") + "/t"
      Snapshot.merge(uniq.withColumn("version", lit(0L)), tbl,
        Seq("symbol", "d"), "version", "m")
      Snapshot.tag(tbl, "baseline")
      Snapshot.merge(uniq.filter(col("symbol") % 3 === 0)
          .withColumn("px", col("px") * 2)
          .withColumn("version", lit(1L)),
        tbl, Seq("symbol", "d"), "version", "m")
      Snapshot.merge(uniq.filter(col("symbol") % 3 === 1)
          .withColumn("px", col("px") * 3)
          .withColumn("version", lit(2L)),
        tbl, Seq("symbol", "d"), "version", "m")
      Snapshot.vacuum(tbl, keepVersions = 1, orphanAgeMs = 0L)
      val facet = (df: DataFrame, name: String) => df
        .agg(count(lit(1)).as("n"), round(sum(col("px")), 2)
          .as("px_sum"))
        .select(lit(name).as("facet"), col("n"), col("px_sum"))
      facet(Snapshot.readTag(s, tbl, "baseline"), "tagged")
        .unionByName(facet(Snapshot.read(s, tbl), "live"))
        .unionByName(s.range(1).toDF("i")
          .select(lit("versions").as("facet"),
            lit(Snapshot.versions(tbl).size.toLong).as("n"),
            lit(null).cast("double").as("px_sum")))
    }),

    // Storage gate: POINT-LOOKUP reads through footer-stats pruning —
    // the doc_id-clustered commit keeps per-file key ranges disjoint,
    // readForKeys opens only files whose range can hold a probed key,
    // and the result (exact-filtered) must equal a plain WHERE IN.
    // Gates the stats harvest + range intersection logic that q322/
    // q331's verification reads rely on (was spec-only).
    "q333_point_lookup" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val tbl = gateTempDir("q333") + "/t"
      Snapshot.commit(docs, tbl, clusterBy = Some("doc_id"),
        clusterFiles = 16)
      val keys = (0L until 4000L by 97L).map(_.toString)
      Snapshot.readForKeys(s, tbl, "doc_id", keys)
        .filter(col("doc_id") % 97 === 0 && col("doc_id") < 4000)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("chars_sum"))
    }),

    // Generation eval: CORPUS BLEU-4 — candidate = each doc with every
    // 7th token dropped, reference = the doc itself (known-overlap
    // fixture; the brevity penalty branch c < r is always live). All
    // clipped n-gram counts are EXACT integers (per-(doc, gram)
    // min(cand, ref) summed corpus-wide); the only doubles are the
    // four ln ratios in one FIXED association + the BP exp — both
    // engines run the identical IEEE chain.
    "q334_bleu_eval" -> ((s, dir) => {
      val pair = t(s, dir, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("ref"))
        .withColumn("cand",
          filter(col("ref"), (_, i) => (i + 1) % 7 =!= 0))
        .persist()
      def grams(c: Column, n: Int): Column =
        when(size(c) >= n,
          transform(sequence(lit(1), size(c) - (n - 1)),
            i => concat_ws(" ", slice(c, i, lit(n)))))
          .otherwise(array().cast("array<string>"))
      def counts(side: String, n: Int, as: String) = pair
        .select(col("doc_id"), explode(grams(col(side), n)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as(as))
      val perN = (1 to 4).map { n =>
        counts("cand", n, "cc")
          .join(counts("ref", n, "rc"), Seq("doc_id", "g"), "left")
          .agg(sum(col("cc")).cast("long").as("total"),
            sum(least(col("cc"), coalesce(col("rc"), lit(0L))))
              .cast("long").as("matched"))
          .select(lit(n).as("n"), col("matched"), col("total"))
      }.reduce(_ unionByName _)
      val wide = perN.groupBy()
        .pivot("n", Seq(1, 2, 3, 4))
        .agg(first(col("matched")).as("m"), first(col("total")).as("t"))
      val lens = pair.agg(sum(size(col("cand"))).cast("long").as("c_len"),
        sum(size(col("ref"))).cast("long").as("r_len"))
      val p = (x: Int) => log(col(s"${x}_m").cast("double") /
        col(s"${x}_t").cast("double"))
      wide.crossJoin(lens)
        .select(col("c_len"), col("r_len"),
          col("1_m").as("matched_1"), col("1_t").as("total_1"),
          col("2_m").as("matched_2"), col("2_t").as("total_2"),
          col("3_m").as("matched_3"), col("3_t").as("total_3"),
          col("4_m").as("matched_4"), col("4_t").as("total_4"),
          when(col("1_m") === 0 || col("2_m") === 0 ||
              col("3_m") === 0 || col("4_m") === 0 ||
              col("c_len") === 0, lit(null)).otherwise(
            round((when(col("c_len") < col("r_len"),
                exp(lit(1.0) - col("r_len").cast("double") /
                  col("c_len").cast("double"))).otherwise(lit(1.0)) *
              exp((p(1) + p(2) + p(3) + p(4)) / lit(4.0)))
              .cast("decimal(20,10)"), 6).cast("double")).as("bleu"))
    }),

    // Storage gate: SCHEMA EVOLUTION through MERGE — the second batch
    // carries a NEW column (src) and doubled px for symbol%3=0; rows
    // predating the column must null-fill at read time (untouched
    // dirs are never rewritten). Gates the evolved-manifest read path
    // q308/q323 never exercise.
    "q335_schema_evolution" -> ((s, dir) => {
      import graft.sources.Snapshot
      val uniq = bars(s, dir).filter(col("symbol") % 64 === 4)
        .groupBy(col("symbol"), col("d"))
        .agg(max(struct(col("ord"), col("px"), col("vol"))).as("w"))
        .select(col("symbol"), col("d"),
          col("w.px").as("px"), col("w.vol").as("vol"),
          date_format(col("d"), "yyyy").as("m"))
      val tbl = gateTempDir("q335") + "/t"
      Snapshot.merge(uniq.withColumn("version", lit(0L)), tbl,
        Seq("symbol", "d"), "version", "m")
      Snapshot.merge(uniq.filter(col("symbol") % 3 === 0)
          .withColumn("px", col("px") * 2)
          .withColumn("version", lit(1L))
          .withColumn("src", lit("late")),
        tbl, Seq("symbol", "d"), "version", "m")
      Snapshot.read(s, tbl)
        .groupBy(coalesce(col("src"), lit("base")).as("src"))
        .agg(count(lit(1)).as("n"), round(sum(col("px")), 2)
          .as("px_sum"))
    }),

    // Storage gate: COMPACTION — four ingest-tagged partition dirs
    // collapse into ONE (compactInto, symbol-clustered) with content
    // byte-identical; the manifest dir count rides along as a column
    // so a compaction that silently keeps extra dirs fails the gate.
    "q336_snapshot_compaction" -> ((s, dir) => {
      import graft.sources.Snapshot
      val uniq = bars(s, dir).filter(col("symbol") % 64 === 5)
        .groupBy(col("symbol"), col("d"))
        .agg(max(struct(col("ord"), col("px"), col("vol"))).as("w"))
        .select(col("symbol"), col("d"),
          col("w.px").as("px"), col("w.vol").as("vol"))
      val tbl = gateTempDir("q336") + "/t"
      for (i <- 0 to 3)
        Snapshot.merge(uniq.filter(col("symbol") % 4 === i)
            .withColumn("p", lit(i.toLong))
            .withColumn("version", lit(0L)),
          tbl, Seq("symbol", "d"), "version", "p")
      Snapshot.compactInto(s, tbl, lit(9L), targetFiles = 1,
        clusterBy = Some("symbol"))
      val nDirs = Snapshot.readManifest(tbl,
        Snapshot.latestVersion(tbl).get).dirs.size.toLong
      Snapshot.read(s, tbl).groupBy(col("p"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("px")), 2).as("px_sum"))
        .withColumn("n_dirs", lit(nDirs))
    }),

    // Storage gate: Z-ORDER + stats-pruned scan — the Morton-key
    // commit makes per-file [min,max] tight on BOTH doc_id and
    // n_chars at once; readStatsPruned on the n_chars range must
    // return a superset that exact-filters to the plain WHERE-BETWEEN
    // answer (pruning must never lose a row).
    "q337_zorder_pruning" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val tbl = gateTempDir("q337") + "/t"
      Snapshot.commit(docs, tbl,
        clusterByKey = Some(Snapshot.zorderKey(
          Seq(col("doc_id"), col("n_chars").cast("long")), 13)),
        clusterFiles = 16)
      Snapshot.readStatsPruned(s, tbl, "n_chars",
          Some("150"), Some("300"))
        .filter(col("n_chars").between(150, 300))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("doc_id")).cast("long").as("id_sum"))
    }),

    // Streaming gate: the CORPUS-HYGIENE router — per-batch quality /
    // repetition / contamination scoring against a static benchmark
    // shingle set, first-failing-gate reason taxonomy (V5 order:
    // quality → repetition → contamination), accepts and rejects
    // appended to separate sinks. Routing is per-row, so the batch
    // split cannot change the answer — the gate proves the streamed
    // scoring chain and the reason precedence (hygieneStream was
    // spec-only). minQuality=0.35 puts ~a quarter of the corpus in
    // the low_quality facet so the precedence rule is exercised.
    "q338_hygiene_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val tmp = gateTempDir("q338")
      val in = writeStreamBatches(Seq(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1)), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.hygieneStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), bench, tmp + "/acc", tmp + "/rej", tmp + "/ck",
          minQuality = 0.35)
      }
      s.read.parquet(tmp + "/rej")
        .groupBy(col("reason").as("facet")).agg(count(lit(1)).as("n"))
        .unionByName(s.read.parquet(tmp + "/acc")
          .agg(count(lit(1)).as("n"))
          .select(lit("accepted").as("facet"), col("n")))
    }),

    // Streaming gate: the DISTRIBUTION-DRIFT monitor — per-batch
    // histograms commit to a snapshot keyed by (epoch, content
    // fingerprint) and the CUMULATIVE histogram PSI-scores against a
    // static reference after every batch; one alarm row per batch.
    // The oracle replays both cumulative PSIs and the exact md5-sum
    // batch fingerprints (values ride as cent-integers so the
    // string-cast inside the fingerprint is engine-portable).
    "q339_drift_stream" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"),
        round(col("value") * 100).cast("long").as("v"))
      val ref = ev.filter(col("event_id") % 2 === 0)
        .groupBy(floor(col("v") / 500.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_r"))
      val tmp = gateTempDir("q339")
      val in = writeStreamBatches(Seq(
        ev.filter(col("event_id") % 4 === 1).select(col("v")),
        ev.filter(col("event_id") % 4 === 3).select(col("v"))), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.driftStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), col("v"), 500.0, ref,
          tmp + "/reg", tmp + "/alarms", tmp + "/ck")
      }
      s.read.parquet(tmp + "/alarms")
    }),

    // Streaming gate: the PLAIN-PARQUET upsert stream (mergeStream →
    // Merge.upsertIntoPath with dynamic partition overwrite — the
    // non-transactional warehouse writer, vs q308/q309's snapshot
    // path): batch 1's version-1 rows overwrite batch 0's committed
    // version-0 rows per (symbol, d) key, touched partitions only.
    "q340_merge_stream" -> ((s, dir) => {
      val uniq = bars(s, dir).filter(col("symbol") % 64 === 6)
        .groupBy(col("symbol"), col("d"))
        .agg(max(struct(col("ord"), col("px"), col("vol"))).as("w"))
        .select(col("symbol"), col("d"),
          col("w.px").as("px"), col("w.vol").as("vol"),
          date_format(col("d"), "yyyy").as("m"))
      val b0 = uniq.withColumn("version", lit(0L))
      val b1 = uniq.filter(col("symbol") % 3 === 0)
        .withColumn("px", col("px") * 2).withColumn("version", lit(1L))
      val tmp = gateTempDir("q340")
      val in = writeStreamBatches(Seq(b0, b1), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.mergeStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), tmp + "/t", tmp + "/ck",
          Seq("symbol", "d"), "version", "m")
      }
      s.read.parquet(tmp + "/t").groupBy(col("symbol"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("px")), 2).as("px_sum"))
    }),

    // Storage gate: CHANGE DATA FEED with VALUES (the Delta-CDF
    // semantic q323's key-only diff can't serve): inserts/deletes
    // carry their rows, every changed key emits update_preimage (v1
    // values) + update_postimage (v2 values). The same three-version
    // fixture as q323 on its own slice; the oracle replays all four
    // change classes with their px payloads.
    "q342_cdc_feed" -> ((s, dir) => {
      import graft.sources.Snapshot
      val uniq = bars(s, dir).filter(col("symbol") % 64 === 7)
        .groupBy(col("symbol"), col("d"))
        .agg(max(struct(col("ord"), col("px"), col("vol"))).as("w"))
        .select(col("symbol"), col("d"),
          col("w.px").as("px"), col("w.vol").as("vol"),
          date_format(col("d"), "yyyy").as("m"))
      val tbl = gateTempDir("q342") + "/t"
      val v1 = Snapshot.merge(uniq.withColumn("version", lit(0L)), tbl,
        Seq("symbol", "d"), "version", "m")
      Snapshot.merge(
        uniq.filter(col("symbol") % 3 === 0)
          .withColumn("px", col("px") * 2)
          .withColumn("version", lit(1L))
          .unionByName(uniq.filter(col("symbol") % 7 === 0)
            .select((-col("symbol")).as("symbol"), col("d"), col("px"),
              col("vol"), col("m")).withColumn("version", lit(1L))),
        tbl, Seq("symbol", "d"), "version", "m")
      val v3 = Snapshot.deleteWhere(s, tbl, col("symbol") % 5 === 0)
      Snapshot.cdf(s, tbl, v1, v3, Seq("symbol", "d"))
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("px")), 2)
          .as("px_sum"))
    }),

    // Storage gate: INCREMENTAL VIEW MAINTENANCE off the change feed —
    // the 100 TB pattern CDC exists for: the v1 per-symbol aggregate
    // plus the CDF deltas (postimage/insert add, preimage/delete
    // retract, exact integer cents so retraction can't drift) must
    // equal the direct v3 aggregate, which is what the oracle
    // computes. History is never rescanned; only the feed is.
    "q343_cdc_view_maintenance" -> ((s, dir) => {
      import graft.sources.Snapshot
      val uniq = bars(s, dir).filter(col("symbol") % 64 === 8)
        .groupBy(col("symbol"), col("d"))
        .agg(max(struct(col("ord"), col("px"), col("vol"))).as("w"))
        .select(col("symbol"), col("d"),
          col("w.px").as("px"), col("w.vol").as("vol"),
          date_format(col("d"), "yyyy").as("m"))
      val tbl = gateTempDir("q343") + "/t"
      val v1 = Snapshot.merge(uniq.withColumn("version", lit(0L)), tbl,
        Seq("symbol", "d"), "version", "m")
      Snapshot.merge(
        uniq.filter(col("symbol") % 3 === 0)
          .withColumn("px", col("px") * 2)
          .withColumn("version", lit(1L))
          .unionByName(uniq.filter(col("symbol") % 7 === 0)
            .select((-col("symbol")).as("symbol"), col("d"), col("px"),
              col("vol"), col("m")).withColumn("version", lit(1L))),
        tbl, Seq("symbol", "d"), "version", "m")
      val v3 = Snapshot.deleteWhere(s, tbl, col("symbol") % 5 === 0)
      val aggV1 = Snapshot.read(s, tbl, Some(v1))
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("px") * 100).cast("long")).as("pxc"))
      val deltas = Snapshot.cdf(s, tbl, v1, v3, Seq("symbol", "d"))
        .select(col("symbol"),
          when(col("_change_type").isin("insert", "update_postimage"),
            lit(1L)).otherwise(lit(-1L)).as("sgn"),
          round(col("px") * 100).cast("long").as("pxc"))
        .groupBy(col("symbol"))
        .agg(sum(col("sgn")).as("dn"),
          sum(col("sgn") * col("pxc")).as("dpxc"))
      aggV1.join(deltas, Seq("symbol"), "full_outer")
        .select(col("symbol"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_rows"),
          (coalesce(col("pxc"), lit(0L)) +
            coalesce(col("dpxc"), lit(0L))).as("pxc"))
        .filter(col("n_rows") > 0)
        .select(col("symbol"), col("n_rows"),
          round((col("pxc").cast("double") / 100.0)
            .cast("decimal(20,10)"), 2).cast("double").as("px_sum"))
    }),

    // Streaming gate: PER-KEY RUNNING STATE (mapGroupsWithState,
    // NoTimeout) — each micro-batch emits the UPDATED cumulative state
    // for exactly the symbols that received data in it, so the sink
    // holds one row per (batch, active symbol) with counts/max-date/
    // min-close over everything seen SO FAR. Gates custom-state
    // persistence across batches (symbolRunningState was spec-only);
    // all three state fields are order-free (count, max, min), so the
    // unsorted per-group iterator cannot perturb the result.
    "q344_running_state_stream" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.OutputMode
      val b = bars(s, dir).filter(col("symbol") % 64 === 9)
        .select(col("symbol").cast("string").as("symbol"),
          col("d").as("date"), col("px").as("close"),
          unix_date(col("d")).as("dd"))
      val ext = b.agg(floor((min(col("dd")) + max(col("dd"))) / 2)
        .cast("long").as("mid"))
      val bm = b.crossJoin(broadcast(ext))
      val tmp = gateTempDir("q344")
      val in = writeStreamBatches(Seq(
        bm.filter(col("dd") <= col("mid"))
          .select(col("symbol"), col("date"), col("close")),
        bm.filter(col("dd") > col("mid"))
          .select(col("symbol"), col("date"), col("close"))), tmp)
      val schema = s.read.parquet(in).schema
      val states = graft.streaming.Streams.symbolRunningState(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(in)
          .as[graft.streaming.Streams.BarEvent](
            org.apache.spark.sql.Encoders.product[
              graft.streaming.Streams.BarEvent]))
      withShufflePartitions(s, 8) {
        val q = states.toDF().writeStream
          .outputMode(OutputMode.Update)
          .option("checkpointLocation", tmp + "/ck")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              batch.write.mode("append").parquet(tmp + "/out")
          }.start()
        q.awaitTermination()
      }
      s.read.parquet(tmp + "/out")
        .groupBy(col("symbol").cast("long").as("symbol"))
        .agg(count(lit(1)).as("n_updates"),
          max(col("nRows")).as("n_rows_final"),
          max(col("lastDate")).cast("string").as("last_date"),
          round(min(col("minClose")), 2).as("min_close"))
    }),

    // Streaming gate: EVENT-TIME-TIMEOUT sessions
    // (flatMapGroupsWithState + Append) — a session row EXISTS only
    // because a state timeout fired, so a broken timeout path empties
    // the output. Two ts-ordered batches (no late data, so only the
    // timeout machinery is under test): users going quiet before the
    // first tercile emit mid-stream, the rest at the final no-data
    // flush — and the OUTPUT collapses to a split-independent rule
    // (emit iff last-event-ms + gap < final watermark, with cumulative
    // stats), which is exactly what the oracle computes. Values ride
    // as integer-valued doubles so the unsorted per-group fold stays
    // exact.
    "q345_expiring_sessions" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id").as("userId"),
        col("ts"), round(col("value")).as("value"),
        unix_micros(col("ts")).as("us"))
      val ext = ev.agg(floor((min(col("us")) + max(col("us"))) / 2)
        .cast("long").as("mid"))
      val em = ev.crossJoin(broadcast(ext))
      val tmp = gateTempDir("q345")
      val in = writeStreamBatches(Seq(
        em.filter(col("us") <= col("mid"))
          .select(col("userId"), col("ts"), col("value")),
        em.filter(col("us") > col("mid"))
          .select(col("userId"), col("ts"), col("value"))), tmp)
      val schema = s.read.parquet(in).schema
      val out = graft.streaming.Streams.expiringSessions(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(in)
          .as[graft.streaming.Streams.SessionEvent](
            org.apache.spark.sql.Encoders.product[
              graft.streaming.Streams.SessionEvent]),
        watermark = "0 seconds", gapMs = 1800000L)
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.runAvailableNow(out.toDF(),
          tmp + "/out", tmp + "/ck")
      }
      s.read.parquet(tmp + "/out")
        .select(col("userId").as("user_id"), col("n"),
          col("valueSum").cast("long").as("value_sum"))
    }),

    // Streaming gate: STREAM-STREAM INTERVAL JOIN — both sides replay
    // as midpoint-aligned two-batch file streams; with in-order data
    // the inner interval join's state retention (derived by Spark from
    // the join bounds + watermark) must find EVERY cross-batch pair,
    // so the streamed result equals the batch join (q48's shape on its
    // own slice), which is what the oracle computes.
    "q346_stream_interval_join" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("user_id") % 16 === 0)
        .select(col("user_id"), col("ts"), col("value"),
          unix_micros(col("ts")).as("us"))
      val ext = e.agg(floor((min(col("us")) + max(col("us"))) / 2)
        .cast("long").as("mid"))
      val em = e.crossJoin(broadcast(ext))
      val tmp = gateTempDir("q346")
      val inL = writeStreamBatches(Seq(
        em.filter(col("us") <= col("mid"))
          .select(col("user_id"), col("ts").as("lts")),
        em.filter(col("us") > col("mid"))
          .select(col("user_id"), col("ts").as("lts"))), tmp + "/L")
      val inR = writeStreamBatches(Seq(
        em.filter(col("us") <= col("mid"))
          .select(col("user_id"), col("ts").as("rts"), col("value")),
        em.filter(col("us") > col("mid"))
          .select(col("user_id"), col("ts").as("rts"), col("value"))),
        tmp + "/R")
      val l = s.readStream.schema(s.read.parquet(inL).schema)
        .option("maxFilesPerTrigger", 1).parquet(inL)
      val r = s.readStream.schema(s.read.parquet(inR).schema)
        .option("maxFilesPerTrigger", 1).parquet(inR)
      val joined = graft.streaming.Streams.intervalJoin(l, r, "user_id",
          "lts", "rts", watermark = "0 seconds", within = "10 minutes")
        .filter(col("rts") < col("lts"))
        .select(col("l.user_id").as("user_id"), col("value"))
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.runAvailableNow(joined,
          tmp + "/out", tmp + "/ck")
      }
      s.read.parquet(tmp + "/out").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("value")), 2).as("pred_value_sum"))
    }),

    // Streaming gate: BUILT-IN SESSION WINDOWS with a watermark —
    // sessions merge across the two batches in state and emit once the
    // watermark passes the session end (last event + gap), so the
    // output is the q43 gaps-and-islands session set FILTERED to
    // sessions ending at or below the final watermark (ms-truncated
    // max event time) — the still-open tail stays in state forever.
    "q347_stream_session_windows" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("user_id") % 4 === 1)
        .select(col("user_id"), col("ts"), col("value"),
          unix_micros(col("ts")).as("us"))
      val ext = e.agg(floor((min(col("us")) + max(col("us"))) / 2)
        .cast("long").as("mid"))
      val em = e.crossJoin(broadcast(ext))
      val tmp = gateTempDir("q347")
      val in = writeStreamBatches(Seq(
        em.filter(col("us") <= col("mid"))
          .select(col("user_id"), col("ts"), col("value")),
        em.filter(col("us") > col("mid"))
          .select(col("user_id"), col("ts"), col("value"))), tmp)
      val schema = s.read.parquet(in).schema
      val sess = graft.streaming.Streams.sessionRollup(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(in), "user_id", "30 minutes",
        watermark = Some("0 seconds"))
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.runAvailableNow(sess,
          tmp + "/out", tmp + "/ck")
      }
      s.read.parquet(tmp + "/out").select(
        unix_timestamp(col("session_start")).as("s_start"),
        unix_timestamp(col("session_end")).as("s_end"),
        col("user_id"), col("n"), col("value_sum"))
    }),

    // Streaming gate: WATERMARKED EXACTLY-ONCE KEY DEDUP — batch 1
    // re-delivers every 13th batch-0 event byte-identically; the
    // (event_id, ts) state must absorb all of them (the keys are still
    // live: eviction uses the current watermark, and re-deliveries
    // arrive one batch after the originals), so the output equals the
    // plain one-copy aggregate.
    "q348_stream_dedup_keys" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("user_id") % 4 === 2)
        .select(col("event_id"), col("ts"), col("user_id"),
          round(col("value")).as("value"),
          unix_micros(col("ts")).as("us"))
      val ext = e.agg(floor((min(col("us")) + max(col("us"))) / 2)
        .cast("long").as("mid"))
      val em = e.crossJoin(broadcast(ext))
      val pick = (c: Column) => em.filter(c)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val tmp = gateTempDir("q348")
      val in = writeStreamBatches(Seq(
        pick(col("us") <= col("mid")),
        pick(col("us") > col("mid"))
          .unionByName(pick(col("us") <= col("mid") &&
            col("event_id") % 13 === 0))), tmp)
      val schema = s.read.parquet(in).schema
      val deduped = graft.streaming.Streams.dedupByKey(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(in), "ts", "0 seconds", Seq("event_id"))
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.runAvailableNow(deduped,
          tmp + "/out", tmp + "/ck")
      }
      s.read.parquet(tmp + "/out")
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("value")).cast("long").as("value_sum"))
    }),

    // Sampling: WEIGHTED sampling WITHOUT replacement (Efraimidis-
    // Spirakis A-ES) — the reservoir that q126's independent Bernoulli
    // rates can't express (exactly k rows, inclusion ∝ weight): each
    // item draws the deterministic md5-uniform u ∈ (0,1] and ranks by
    // ln(u)/weight (the monotone log form of u^(1/w)); the top-k by
    // that key IS the weighted sample. Zero RNG — the draw is the
    // repo's md5 convention, the ln snaps ×1e6 (q72's proven-portable
    // pattern) before the order, ties break on doc_id.
    "q349_weighted_reservoir" -> ((s, dir) => {
      val h = Dedup.hashLong(concat(lit("ws"),
        col("doc_id").cast("string")))
      val u = (h + 1).cast("double") /
        lit(1152921504606846976L).cast("double")
      t(s, dir, "documents")
        // positivity guard (r12 advisor): a zero-length doc would put
        // -Inf/0 into the key — engines disagree on the cast; weight
        // needs n_chars >= 1, identical filter in the oracle
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          round(log(u) / col("n_chars").cast("double") * 1e6)
            .cast("long").as("key6"))
        .orderBy(col("key6").desc, col("doc_id"))
        .limit(20)
    }),

    // Storage gate: MANIFEST-ONLY count(*) — countStar answers from
    // footer row counts without opening a data file; it must equal
    // the scanned count, and both ride in the output so a stats
    // harvest bug fails the round artifact (countStar was spec-only).
    "q350_manifest_count" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val tbl = gateTempDir("q350") + "/t"
      Snapshot.commit(docs, tbl, Some("lang"))
      val fromManifest = Snapshot.countStar(tbl).getOrElse(-1L)
      Snapshot.read(s, tbl)
        .agg(count(lit(1)).as("n_scanned"),
          sum(col("n_chars")).cast("long").as("chars_sum"))
        .select(lit(fromManifest).as("n_manifest"), col("n_scanned"),
          col("chars_sum"))
    }),

    // Storage gate: MANIFEST-SIDE PARTITION PRUNING — readPruned keeps
    // only the directories whose partition value passes the predicate
    // (the scan never opens the rest), and because the partition
    // column IS the filter column the pruned read is exactly the
    // WHERE-IN answer (readPruned was spec-only).
    "q351_partition_pruned_read" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val tbl = gateTempDir("q351") + "/t"
      Snapshot.commit(docs, tbl, Some("lang"))
      Snapshot.readPruned(s, tbl, v => v == "en" || v == "de")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("chars_sum"))
    }),

    // ANN scale-contract gate (r12 verdict task 1): the k-CHOOSER.
    // The cell-blocked ANN family pins k only for oracle determinism
    // (q123's 16); this gate runs Similarity.chooseK (k = ceil sqrt n,
    // the cost-balanced point of assignment n*k vs verify n^2/k) and
    // chooseNProbe (4, the measured recall knee) on the SAME
    // planted-near-dup corpus at scale 1 and a 10x in-query verbatim
    // replication (copy ids offset by i*1e8, perturbed twins at +1e9 —
    // collision-free by construction), emitting the planted-pair
    // recall at both scales: the contract is recall stays FLAT when k
    // grows with the corpus. (The r11/r12 10x probe's "frozen-k recall
    // 0.93->0.77" adjudicated as the +10000 id-collision artifact —
    // NOTES r13; with clean ids the chooser's real job is cost, and
    // nprobe=4 is what holds recall once k grows.)
    "q352_ann_k_chooser" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val nEmb = e.count()
      def scaleRow(scale: Int): DataFrame = {
        val copies = s.range(scale).select(col("id").as("copy"))
        val base = e.crossJoin(broadcast(copies))
          .select((col("vec_id") + col("copy") * 100000000L).as("id"),
            col("vec"))
        val all = base.unionByName(base.select(
          (col("id") + 1000000000L).as("id"),
          transform(col("vec"), (x, i) =>
            when(i === 0, x + 0.5).otherwise(x)).as("vec")))
        val n = 2L * scale * nEmb
        val k = Similarity.chooseK(n)
        val npb = Similarity.chooseNProbe(k)
        // vec_id is contiguous from 0, so the k lowest ids are the
        // copy-0 ids < k — the same deterministic seed rule the
        // streaming refresh uses (lowest-id corpus vectors)
        val centroids = all.filter(col("id") < k)
          .select(col("id").as("cid"), col("vec").as("cvec"))
        val planted = all.filter(col("id") < 1000000000L)
          .select(col("id"), col("vec").as("va"))
          .join(all.select((col("id") - 1000000000L).as("id"),
            col("vec").as("vb")), Seq("id"))
          .filter(round(Similarity.cosine(col("va"), col("vb")), 6)
            >= 0.9)
          .select(col("id"))
          .persist()
        // recall only consults the PLANTED pairs' probe cells, so the
        // probe pass runs on those ids (base + twin), not the whole
        // corpus — ~3x less probe work at the 10x scale, same result
        // by construction (found ⊆ planted; oracle restricts alike)
        val probeIds = planted
          .unionByName(planted.select((col("id") + 1000000000L)
            .as("id")))
        val probes = Similarity.ivfProbeCells(
            all.join(probeIds, Seq("id")), centroids, npb)
          .select(col("qid"), col("cell"))
        val found = planted
          .join(probes.select(col("qid").as("id"), col("cell")),
            Seq("id"))
          .join(probes.select((col("qid") - 1000000000L).as("id"),
            col("cell")), Seq("id", "cell"))
          .select(col("id")).distinct()
        planted.agg(count(lit(1)).as("n_planted"))
          .crossJoin(found.agg(count(lit(1)).as("n_found")))
          .select(lit(scale).as("scale"), lit(n).as("n_vecs"),
            lit(k).as("k"), lit(npb).as("nprobe"),
            col("n_planted"), col("n_found"),
            round((col("n_found").cast("double") /
              col("n_planted").cast("double"))
              .cast("decimal(20,10)"), 4).cast("double").as("recall"))
      }
      scaleRow(1).unionByName(scaleRow(10))
    }),

    // Streaming gate: ANN dedup model REFRESH (the k-chooser's
    // streaming half — annDedupStream froze its first-batch centroids
    // forever, the r12 verdict's one live scale defect). Three batches
    // sized so the trigger fires exactly once: batch 0 (8 vecs) seeds
    // k = chooseK(8) = 4; batch 1 (192) grows the corpus past the
    // refreshFactor=2 bound; before batch 2 the model retrains to
    // chooseK(|corpus|) lowest-id corpus vectors and the stored cells
    // re-assign in one clustered rewrite; batch 2 (the rest + planted
    // +1e9 near-dup twins of batch-1 members) dedups against the
    // REFRESHED cells. The oracle replays seed, trigger arithmetic,
    // refresh, and all three candidate rounds; the -1 facet pins the
    // refreshed model itself (k and centroid-id sum).
    "q353_ann_refresh_stream" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"),
          col("embedding").cast("array<float>").as("vec"))
      val twins = vecs.filter(col("doc_id") >= 8 && col("doc_id") < 200)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          transform(col("vec"), (x, i) =>
            when(i === 0, (x.cast("double") + 0.5).cast("float"))
              .otherwise(x)).as("vec"))
      val tmp = gateTempDir("q353")
      val in = writeStreamBatches(Seq(
        vecs.filter(col("doc_id") < 8),
        vecs.filter(col("doc_id") >= 8 && col("doc_id") < 200),
        vecs.filter(col("doc_id") >= 200).unionByName(twins)), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.annDedupStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), tmp + "/t", tmp + "/model", tmp + "/ck",
          threshold = 0.9, refreshFactor = 2.0)
      }
      graft.sources.Snapshot.read(s, tmp + "/t")
        .groupBy(col("ingest_batch"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .unionByName(graft.sources.Snapshot.read(s, tmp + "/model")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("cid")).cast("long").as("id_sum"))
          .select(lit(-1L).as("ingest_batch"), col("n_docs"),
            col("id_sum")))
    }),

    // Storage gate: HASH-BUCKETED snapshot layout — both join sides
    // commit through Snapshot.commitBucketed (Spark-native bucketed
    // parquet under the manifest), the join reads them back as
    // bucketed catalog tables, and the big×big equi-join runs with
    // ZERO shuffle exchange on either side (SnapshotSpec pins the
    // plan; this gate pins the rows). Revenue rides as exact cents.
    "q354_bucketed_join" -> ((s, dir) => {
      import graft.sources.Snapshot
      val li = t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
        .select(col("l_partkey").as("k"),
          round(col("l_extendedprice") *
            (lit(1).cast("double") - col("l_discount")) * 100)
            .cast("long").as("rev_cents"))
      val pt = t(s, dir, "part").filter(col("p_partkey") % 4 === 0)
        .select(col("p_partkey").as("k"), col("p_brand"))
      val base = gateTempDir("q354")
      Snapshot.commitBucketed(li, base + "/fact", "k", 8)
      Snapshot.commitBucketed(pt, base + "/dim", "k", 8)
      val f = Snapshot.readBucketed(s, base + "/fact", "graft_q354_fact")
      val d = Snapshot.readBucketed(s, base + "/dim", "graft_q354_dim")
      f.join(d, Seq("k"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("rev_cents")).cast("long").as("rev_sum_cents"))
    }),

    // Similarity: the declarative IVF COST/OCCUPANCY ADVISOR (r12
    // verdict next #6b) — for k in {kStar/2, kStar, 2·kStar} around
    // the chooser's pick, one row of the quantities the k decision
    // trades: used-cell count, max occupancy (the skew/straggler
    // signal), Σ occupancy² (same-cell verify cost), n·k (assignment
    // cost), and their total — advised marks chooseK's balance point.
    // Exact integer arithmetic end to end.
    "q355_ivf_cost_advisor" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      val n = e.count()
      val kStar = Similarity.chooseK(n)
      val cands = Seq(math.max(4, kStar / 2), kStar,
        math.min(65536, kStar * 2)).distinct
      cands.map { k =>
        val cen = e.filter(col("id") < k)
          .select(col("id").as("cid"), col("vec").as("cvec"))
        Similarity.ivfAssign(e, cen)
          .groupBy(col("cell")).agg(count(lit(1)).as("occ"))
          .agg(count(lit(1)).as("n_cells"),
            max(col("occ")).as("max_occ"),
            sum(col("occ") * col("occ")).cast("long").as("occ_sq_sum"))
          .select(lit(k).as("k_cand"), col("n_cells"), col("max_occ"),
            col("occ_sq_sum"),
            lit(n * k).as("assign_cost"),
            (col("occ_sq_sum") + lit(n * k)).cast("long")
              .as("total_cost"),
            lit(k == kStar).as("advised"))
      }.reduce(_ unionByName _)
    }),

    // Dedup/exact: distributed token SUFFIX ARRAY (prefix doubling,
    // Manber–Myers; the Lee et al. 2022 exact-substring-dedup kernel)
    // — gated on a 1/4 doc slice. Per-doc rank aggregates verify the
    // COMPLETE array through exact integer sums: any single rank
    // off-by-one shifts its doc's sum. Round count is ⌈log₂ max doc
    // slots⌉ (sentinel-uniqueness bound), not log₂ corpus — the scale
    // contract that keeps the shuffle-round count flat at 100 TB.
    "q356_suffix_array" -> ((s, dir) => withShufflePartitions(s, 8) {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 4 === 0)
      val c = SuffixArray.corpus(docs, col("doc_id"), col("text"))
      val b = SuffixArray.build(c)
      b.sa.filter(!col("sent"))
        .select(col("doc_id"), (col("rank") - c.numDocs).as("r"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("r")).as("sum_rank"),
          min(col("r")).as("min_rank"), max(col("r")).as("max_rank"))
    }),

    // Dedup/exact: SA-adjacent LCP — every repeated token run ≥ 8
    // PROVEN with its exact length and both locations (winnowing
    // q221 only bounds these probabilistically), top-40 by length.
    // LCP via rank-table descent: O(log maxDoc) join rounds over the
    // N−1 adjacent pairs, never a quadratic compare.
    "q357_repeated_spans" -> ((s, dir) => withShufflePartitions(s, 8) {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
      val c = SuffixArray.corpus(docs, col("doc_id"), col("text"))
      val b = SuffixArray.build(c)
      // materialize the descent INSIDE the partition scope (the gate
      // queries' deferred action would otherwise run it at the
      // session's 32)
      val lcps = SuffixArray.adjacentLcp(b, c.numDocs)
        .filter(col("lcp") >= 8).localCheckpoint(true)
      val tk = docs.select(col("doc_id").as("doc_a"),
        Text.tokens(col("text")).as("tk"))
      lcps.join(tk, "doc_a")
        .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"),
          col("lcp"), concat_ws(" ", slice(col("tk"),
            (col("pos_a") + 1).cast("int"), col("lcp").cast("int")))
            .as("span_text"))
        .orderBy(col("lcp").desc, col("doc_a"), col("pos_a"),
          col("doc_b"))
        .limit(40)
    }),

    // Dedup/exact: Lee et al.'s DEDUP-MASS statistic — per doc, how
    // many suffix positions start a repeated run ≥ 8 (max of the two
    // SA-neighbor LCPs = longest match anywhere else in the corpus)
    // and the token coverage of the UNION of those runs: the number
    // that decides how aggressive span-level dedup should be before
    // anyone deletes a byte. Interval union per doc, never global.
    "q358_dup_span_coverage" -> ((s, dir) => withShufflePartitions(s, 8) {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 3 === 0)
      val c = SuffixArray.corpus(docs, col("doc_id"), col("text"))
      val b = SuffixArray.build(c)
      // descent materialized inside the partition scope (see q357)
      val lcps = SuffixArray.adjacentLcp(b, c.numDocs)
        .localCheckpoint(true)
      val nTok = docs.select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      SuffixArray.dupSpanCoverage(lcps, nTok, 8L)
    }),

    // Dedup/exact: REPEATED n-GRAM FAMILIES — the "most duplicated
    // substrings" census. Maximal SA runs with adjacent LCP ≥ 8 ARE
    // the 8-gram equivalence classes, so block size = exact corpus
    // occurrence count — derived from N−1 adjacent LCPs, never an
    // n-gram explosion. The ORACLE counts grams brute-force: two
    // unrelated algorithms must emit identical rows.
    "q359_repeat_families" -> ((s, dir) => withShufflePartitions(s, 8) {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 3 === 0)
      val c = SuffixArray.corpus(docs, col("doc_id"), col("text"))
      val b = SuffixArray.build(c)
      val lcps = SuffixArray.adjacentLcp(b, c.numDocs)
        .localCheckpoint(true)
      val fams = SuffixArray.repeatFamilies(lcps, 8L)
      val tk = docs.select(col("doc_id").as("rep_doc"),
        Text.tokens(col("text")).as("tk"))
      fams.join(tk, "rep_doc")
        .select(concat_ws(" ", slice(col("tk"),
          (col("rep_pos") + 1).cast("int"), lit(8))).as("gram"),
          col("occurrences"), col("n_docs"))
        .orderBy(col("occurrences").desc, col("gram"))
        .limit(30)
    }),

    // Dedup/exact: EXACT-SPAN DECONTAMINATION of an eval split
    // against a train split (the 13-gram-style screen frontier labs
    // run, with exact maximal span lengths instead of a fixed-L hash
    // hit): longest train-side token match per eval position via the
    // nearest-train-neighbor segmented scans, rolled up per eval doc.
    // Full corpus, leakage-safe parity split.
    "q360_decontaminate" -> ((s, dir) => withShufflePartitions(s, 8) {
      val docs = t(s, dir, "documents")
      val c = SuffixArray.corpus(docs, col("doc_id"), col("text"))
      val b = SuffixArray.build(c)
      val m = SuffixArray.longestCrossMatch(b, c.numDocs,
        d => d % 2 === 0).localCheckpoint(true)
      val nTok = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      m.groupBy(col("doc_id"))
        .agg(max(col("train_match")).as("longest_train_match"),
          sum(when(col("train_match") >= 8, lit(1L)).otherwise(lit(0L)))
            .as("contaminated_starts"))
        .join(nTok, "doc_id")
        .filter(col("longest_train_match") >= 8)
        .select(col("doc_id"), col("n_tokens"),
          col("longest_train_match"), col("contaminated_starts"))
        .orderBy(col("longest_train_match").desc, col("doc_id"))
        .limit(50)
    }),

    // ML/curation: LOGISTIC-REGRESSION quality classifier TRAINED in
    // the engine — 3 full-batch gradient steps over the embedding
    // corpus (y = label 0 one-vs-rest), the supervised tier above
    // Naive Bayes q255 and kNN q295. Every margin/gradient is an
    // exact ×1e6/×1e12 integer sum, the sigmoid snaps ×1e6 at
    // evaluation, updates round half-away-from-zero — so the oracle
    // replays the ENTIRE training trajectory with the iterations
    // unrolled and the output pins all 65 final weights exactly.
    "q361_logistic_gd" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      LinearModel.logisticGd(
        e.select(col("vec_id").as("id"), col("embedding").as("x")),
        e.select(col("vec_id").as("id"),
          when(col("label") === 0, 1L).otherwise(0L).as("y")),
        3)
    }),

    // Storage: WRITE–AUDIT–PUBLISH (the Iceberg wap.id pattern) —
    // the missing piece between commit and merge for a pipeline that
    // must QUARANTINE a batch until its audit passes: stage a batch
    // with planted bad rows (invisible to main readers — proven by
    // reading main mid-audit), fail the audit, discard; re-stage the
    // clean batch, audit 0 bad, publish atomically as the next
    // version. Every emitted count is a pure function of the fixture,
    // so the oracle needs no storage at all.
    "q362_wap_publish" -> ((s, dir) => {
      import graft.sources.Snapshot
      val tbl = gateTempDir("q362") + "/t"
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val bad = col("doc_id") % 10 === 1
      Snapshot.commit(docs.filter(col("doc_id") % 2 === 0), tbl)
      val incoming = docs.filter(col("doc_id") % 2 === 1)
      Snapshot.commitStaged(incoming, tbl, "wap1")
      val auditBad = Snapshot.readStaged(s, tbl, "wap1")
        .filter(bad).count()
      val mainDuring = Snapshot.read(s, tbl).count()
      // audit rejects (planted bad rows exist) -> discard, re-stage
      Snapshot.discardStaged(tbl, "wap1")
      Snapshot.commitStaged(incoming.filter(!bad), tbl, "wap2")
      val auditBad2 = Snapshot.readStaged(s, tbl, "wap2")
        .filter(bad).count()
      val v = Snapshot.publish(tbl, "wap2")
      val stagedLeft = Snapshot.stagedNames(tbl).size
      Snapshot.read(s, tbl)
        .agg(count(lit(1)).as("final_rows"),
          sum(when(bad, lit(1L)).otherwise(lit(0L))).as("final_bad"))
        .select(lit(mainDuring).as("main_rows_during_audit"),
          lit(auditBad).as("staged_bad_rows"),
          lit(auditBad2).as("clean_stage_bad_rows"),
          lit(v).as("published_version"),
          col("final_rows"), col("final_bad"),
          lit(stagedLeft.toLong).as("staged_left"))
    }),

    // Packing: CONCAT-AND-CHUNK sequence layout (the GPT-style
    // zero-padding packer): docs concatenate in id order, the stream
    // cuts into 512-token sequences, docs may straddle cuts. Pure
    // prefix-sum arithmetic — offsets from the two-level kernel —
    // so the layout is exact and embarrassingly parallel at 100 TB.
    "q363_sequence_packing" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n"))
      Packing.sequencePacking(docs, 512L)
    }),

    // Packing: WHOLE-DOC striped bin packing — (len desc, id) rank
    // striped mod ⌈total/cap⌉ bins, the deterministic shuffle-free
    // stand-in for first-fit-decreasing (inherently sequential); the
    // overflow column MEASURES the heuristic's waste instead of
    // hiding it.
    "q364_striped_packing" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n"))
      Packing.stripedBinPacking(docs, 512L)
    }),

    // Similarity/training: HARD-NEGATIVE TRIPLET MINING for embedding
    // model training — per anchor (a bounded id%50 panel, the
    // bruteForceTopK broadcast contract) the nearest SAME-label
    // neighbor (positive) and nearest DIFFERENT-label neighbor (the
    // hard negative), cosine ×1e6 micro ints so the margin is an
    // exact integer; ties (cos desc, id).
    "q365_triplet_mining" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id").as("id"),
        col("embedding").as("vec"), col("label"))
      val a = e.filter(col("id") % 50 === 0)
        .select(col("id").as("aid"), col("vec").as("av"),
          col("label").as("al"))
      val joined = broadcast(a)
        .join(e.select(col("id").as("cid"), col("vec").as("cv"),
          col("label").as("cl")), col("aid") =!= col("cid"))
        .withColumn("same", col("al") === col("cl"))
        .withColumn("cm", round(Similarity.cosine(col("av"), col("cv"))
          * 1e6).cast("long"))
      val w = Window.partitionBy(col("aid"), col("same"))
        .orderBy(col("cm").desc, col("cid"))
      val best = joined.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      best.filter(col("same"))
        .select(col("aid"), col("al").as("label"),
          col("cid").as("pos_id"), col("cm").as("pos_cos_micro"))
        .join(best.filter(!col("same")).select(col("aid"),
          col("cid").as("neg_id"), col("cm").as("neg_cos_micro")),
          "aid")
        .select(col("aid").as("anchor_id"), col("label"),
          col("pos_id"), col("pos_cos_micro"), col("neg_id"),
          col("neg_cos_micro"),
          (col("pos_cos_micro") - col("neg_cos_micro"))
            .as("margin_micro"))
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

    // Text/filtering: BLOCKLIST PHRASE SPANS — multi-token phrase
    // matching against a broadcast blocklist (the profanity/banned-
    // content screen): grams of each blocklist length equi-join the
    // tiny phrase set, per (doc, phrase) hit counts + first position.
    // One gram explosion per phrase LENGTH (2 here), never per
    // phrase — a 10⁵-phrase list still costs two gram streams.
    "q367_blocklist_spans" -> ((s, dir) => {
      import s.implicits._
      val phrases = Seq("merge sort", "batch batch batch",
        "spark join stream")
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      val grams = phrases.map(_.split(" ").length).distinct.sorted
        .map { l =>
          toks.filter(size(col("tk")) >= l)
            .select(col("doc_id"), posexplode(
              transform(sequence(lit(1), size(col("tk")) - (l - 1)),
                i => concat_ws(" ", slice(col("tk"), i, lit(l)))))
              .as(Seq("p0", "gram")))
            .select(col("doc_id"), col("p0").cast("long").as("pos"),
              col("gram"))
        }.reduce(_ unionByName _)
      grams.join(broadcast(phrases.toDF("gram")), "gram")
        .groupBy(col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
        .select(col("doc_id"), col("gram").as("phrase"), col("n_hits"),
          col("first_pos"))
    }),

    // Provenance: MERKLE-ROOT dataset attestation — one tamper-
    // evident hash over the whole table (leaves = canonical row md5,
    // sorted; ⌈log₂ n⌉ pairwise levels, work 2n, shuffle halving per
    // level). Any consumer re-derives the root; membership of any
    // row is provable with a log-depth path. The sequential chain
    // hash this replaces cannot be parallelized at all.
    "q368_merkle_root" -> ((s, dir) =>
      Provenance.merkleRoot(t(s, dir, "documents"),
        Seq(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")))),

    // Provenance: MERKLE INCLUSION PROOF — the log-depth membership
    // path for one row (doc 42), each level's (side, sibling, running
    // digest), the digest RE-FOLDED on the driver exactly as a
    // consumer would verify it; the last acc equals the tree root.
    // Completes q368: root = attestation, proof = row membership.
    "q369_merkle_proof" -> ((s, dir) =>
      Provenance.merkleProof(t(s, dir, "documents"),
        Seq(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")), col("doc_id") === 42)),

    // Streaming gate: WRITE–AUDIT–PUBLISH per micro-batch — batch 2
    // carries the planted bad rows and vanishes WHOLE (its candidate
    // stages, audits dirty through the staged read face, discards);
    // batches 1/3 publish atomically as versions 1/2. Main readers
    // never see an unaudited row; every emitted count is fixture
    // arithmetic.
    "q370_wap_stream" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val bad = col("doc_id") % 10 === 1
      val tmp = gateTempDir("q370")
      val tbl = tmp + "/t"
      val in = writeStreamBatches(Seq(
        docs.filter(col("doc_id") % 3 === 0 && !bad),
        docs.filter(col("doc_id") % 3 === 1),
        docs.filter(col("doc_id") % 3 === 2 && !bad)), tmp)
      val schema = s.read.parquet(in).schema
      withShufflePartitions(s, 8) {
        graft.streaming.Streams.wapStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), tbl, tmp + "/ck", bad)
      }
      Snapshot.read(s, tbl)
        .agg(count(lit(1)).as("published_rows"),
          sum(when(bad, lit(1L)).otherwise(lit(0L)))
            .as("published_bad"))
        .select(col("published_rows"), col("published_bad"),
          lit(Snapshot.latestVersion(tbl).getOrElse(0L)).as("versions"),
          lit(Snapshot.stagedNames(tbl).size.toLong).as("staged_left"))
    }),

    // Storage: DESCRIBE HISTORY — the version-audit table (who/what
    // per retained snapshot: dir count, manifest-stat row counts, tag
    // pins, latest flag) over a 3-commit + tag lifecycle; every value
    // is fixture arithmetic for the oracle, and n_rows comes from
    // manifest stats ALONE (the countStar identity — no data scan).
    "q371_describe_history" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val tbl = gateTempDir("q371") + "/t"
      Snapshot.commit(docs.filter(col("doc_id") % 3 === 0), tbl)
      Snapshot.commit(docs.filter(col("doc_id") % 3 <= 1), tbl)
      Snapshot.tag(tbl, "audited", Some(2L))
      Snapshot.commit(docs, tbl)
      Snapshot.history(s, tbl)
    }),

    // Storage: RETENTION by AGE — the policy face next to q371's
    // DESCRIBE HISTORY: "expire everything older than 7 days, keep
    // every tagged release and the latest". Three commits with
    // planted manifest stamps (v1/v2 ten days old, v3 one hour);
    // expiry drops v1 ONLY — v2 survives via its tag pin, v3 as
    // latest — and v2 stays time-travel readable afterwards. Every
    // emitted value is fixture arithmetic for the oracle.
    "q376_retention_expire" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val tbl = gateTempDir("q376") + "/t"
      Snapshot.commit(docs.filter(col("doc_id") % 3 === 0), tbl)
      Snapshot.commit(docs.filter(col("doc_id") % 3 <= 1), tbl)
      Snapshot.tag(tbl, "audited", Some(2L))
      Snapshot.commit(docs, tbl)
      val now = 1700000000000L
      Snapshot.stampVersion(tbl, 1L, now - 10L * 86400000L)
      Snapshot.stampVersion(tbl, 2L, now - 10L * 86400000L)
      Snapshot.stampVersion(tbl, 3L, now - 3600000L)
      val dropped = Snapshot.expireByAge(tbl, 7L * 86400000L, now)
      val v2rows = Snapshot.read(s, tbl, Some(2L)).count()
      Snapshot.history(s, tbl)
        .select(col("version"), col("n_rows"), col("tags"),
          col("is_latest"),
          lit(dropped.mkString(",")).as("dropped_versions"),
          lit(v2rows).as("v2_readable_rows"))
    }),

    // Storage: ROLLBACK — the undo face next to q376's retention: a
    // bad commit (doubled n_chars) restores to the prior content as a
    // NEW version by manifest reference (zero copy), the bad version
    // stays time-travel inspectable, and the content checksum proves
    // v3 ≡ v1 byte-for-byte while v2 still reads as the bad state.
    "q378_rollback" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val tbl = gateTempDir("q378") + "/t"
      Snapshot.commit(docs, tbl)
      Snapshot.commit(docs.withColumn("n_chars", col("n_chars") * 2), tbl)
      val restored = Snapshot.rollback(tbl, 1L)
      val v1 = Snapshot.read(s, tbl, Some(1L))
        .agg(sum(col("n_chars")).as("s")).head().getLong(0)
      val v2 = Snapshot.read(s, tbl, Some(2L))
        .agg(sum(col("n_chars")).as("s")).head().getLong(0)
      Snapshot.read(s, tbl)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_chars")).as("restored_chars"))
        .select(lit(restored).as("restored_version"), col("n_rows"),
          col("restored_chars"), lit(v1).as("v1_chars"),
          lit(v2).as("v2_chars"))
    }),

    // Text: UNICODE NORMALIZATION (native codegen'd expression; Spark
    // ships none) — the step exact dedup needs FIRST: composed é
    // (U+00E9) and decomposed e+U+0301 are different bytes with
    // identical rendering, so a mirror crawl in NFD never fingerprint-
    // matches its NFC twin until normalized. Plant an NFD twin per
    // doc: raw md5 groups match nothing, NFC-normalized groups pair
    // every doc with its twin; DuckDB's nfc_normalize is the oracle.
    "q377_unicode_nfc_dedup" -> ((s, dir) => {
      import graft.functions.NativeFunctions
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val all = base
        .select(col("doc_id"),
          concat(col("text"), lit(" caf\u00e9 na\u00efve")).as("text"))
        .unionByName(base.select(
          (col("doc_id") + 1000000000L).as("doc_id"),
          concat(col("text"), lit(" cafe\u0301 nai\u0308ve")).as("text")))
      val scored = all.select(col("doc_id"), col("text"),
        NativeFunctions.unicodeNorm(col("text"), "NFC").as("nfc"))
        .localCheckpoint(true)
      val rawG = scored.groupBy(md5(col("text"))).count()
        .filter(col("count") >= 2).count()
      val nfcG = scored.groupBy(md5(col("nfc"))).count()
        .filter(col("count") >= 2).count()
      scored.agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("nfc") =!= col("text"), 1L).otherwise(0L))
          .as("docs_rewritten"))
        .select(col("n_docs"), col("docs_rewritten"),
          lit(rawG).as("raw_dup_groups"), lit(nfcG).as("nfc_dup_groups"))
    }),

    // Similarity/eval: HUBNESS — the kNN-graph health read: exact
    // k-occurrence (in-degree) moments, max hub, anti-hub count over
    // the brute k=5 graph; Σd = n·k is the built-in invariant. The
    // %2 slice bounds the B² kernel at bench scale.
    "q395_hubness" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
        .filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.hubnessStats(vecs, 5)
    }),

    // Similarity/compression: JL SIGNED RANDOM PROJECTION distortion
    // audit — 64→16 dims via the md5-derived ±1 matrix, every pair of
    // a %10 probe slice scored in both spaces (micro cosines, exact
    // integer projections). The read before a pipeline swaps its
    // embedding column for the sketch.
    "q401_random_projection" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings")
        .filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.projectionDistortion(vecs, col("id"), col("vec"),
        16, 64, 1000)
    }),

    // Dedup/linkage: FELLEGI–SUNTER match weights — m/u estimated
    // from labeled pairs (planted near-copies = matches, id-adjacent
    // docs = non-matches), per-field ln weights snapped per term,
    // pair scores exact integer sums banded match/possible/nonmatch.
    "q402_fellegi_sunter" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val a = d.select(col("doc_id").as("id_a"), col("lang").as("la"),
        col("source").as("sa"), col("n_chars").as("ca"))
      val mp = a.select(col("id_a"),
        (col("id_a") + 1000000000L).as("id_b"), lit(true).as("y"),
        (col("la") === when(col("id_a") % 5 === 0, lit("xx"))
          .otherwise(col("la"))).as("ag_lang"),
        lit(true).as("ag_src"),
        (abs(lit(-8L)) <= 10).as("ag_len"))
      val b = d.select((col("doc_id") - 1).as("id_a"),
        col("doc_id").as("id_b"), col("lang").as("lb"),
        col("source").as("sb"), col("n_chars").as("cb"))
      val np = a.join(b, Seq("id_a"))
        .select(col("id_a"), col("id_b"), lit(false).as("y"),
          (col("la") === col("lb")).as("ag_lang"),
          (col("sa") === col("sb")).as("ag_src"),
          (abs(col("ca") - col("cb")) <= 10).as("ag_len"))
      Dedup.fellegiSunter(mp.unionByName(np), col("id_a"), col("id_b"),
        col("y"), Seq("lang" -> col("ag_lang"), "src" -> col("ag_src"),
          "len" -> col("ag_len")), 3000000L, -1000000L)
    }),

    // Similarity/mining: MARGIN-BASED BITEXT MINING (the LASER
    // criterion) — parity-split the embedding corpus into two "sides",
    // per left vector its best right candidate rescaled by both k-NN
    // neighborhoods; exact micro cosines, DuckDB-`//`-parity division.
    "q403_bitext_margin" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val left = e.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val right = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.marginMining(left, right, 4)
    }),

    // Text/tokenizer: FERTILITY per language — tokens-per-word and
    // bytes-per-token under the BPE-ish regex tokenizer; the
    // vocabulary-equity read of a multilingual corpus.
    "q404_token_fertility" -> ((s, dir) =>
      Text.tokenFertility(t(s, dir, "documents"), col("lang"),
        col("text"))),

    // Text/curation: CCNet PERPLEXITY BUCKETS (Wenzek et al. 2020) —
    // per language, its OWN bigram-LM score ranks docs into
    // head/middle/tail thirds (rank-within-language — the portable
    // criterion; cross-language perplexities don't compare). Exact
    // integer NLLs and rank arithmetic; the oracle replays per-lang.
    "q398_ccnet_buckets" -> ((s, dir) => withShufflePartitions(s, 8) {
      Text.perplexityBuckets(t(s, dir, "documents"), col("doc_id"),
        col("text"), col("lang"), 3)
    }),

    // Text/curation: the GOPHER rule set (Rae et al. 2021) — the named
    // MassiveText heuristic screen, every rule a cross-multiplied
    // integer comparison (never a float ratio). Planted tails exercise
    // the bullet/ellipsis/symbol/stopword rules the base fixture
    // wouldn't touch.
    "q399_gopher_rules" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 13 === 0,
            lit("\n- buy one\n- buy two\nplain tail...")).otherwise(lit("")),
          when(col("doc_id") % 17 === 0,
            lit(" ## ... ## end")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit(" be to of and that have with")).otherwise(lit("")))
          .as("text"))
      Text.gopherRules(d, col("doc_id"), col("text"))
    }),

    // Storage: DELETION VECTORS — the zero-rewrite row-level delete
    // (Delta DVs / Iceberg equality-deletes): the delete publishes a
    // key sidecar, data dirs carry unchanged (pinned), readers
    // anti-join it, countStar admits it doesn't know, and compact
    // materializes back to a DV-free snapshot with the same content.
    "q400_delete_vectors" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val tbl = gateTempDir("q400") + "/t"
      Snapshot.commit(docs, tbl)
      val m1 = Snapshot.readManifest(tbl, 1L)
      val v2 = Snapshot.deleteVectored(s, tbl, "doc_id",
        col("lang") === "de")
      val m2 = Snapshot.readManifest(tbl, v2)
      val zeroRewrite = m2.dirs == m1.dirs && m2.dvDirs.nonEmpty
      val unknownCount = Snapshot.countStar(tbl).isEmpty
      val v1Rows = Snapshot.read(s, tbl, Some(1L)).count()
      val v3 = Snapshot.compact(s, tbl)
      val materialized = Snapshot.readManifest(tbl, v3).dvDirs.isEmpty
      Snapshot.read(s, tbl)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .select(lit(v2).as("dv_version"),
          lit(zeroRewrite).as("zero_rewrite"),
          lit(unknownCount).as("count_unknown"),
          lit(materialized).as("materialized"),
          lit(v1Rows).as("v1_rows"), col("n_rows"), col("sum_chars"),
          col("n_langs"))
    }),

    // Sampling/curation: DSIR importance selection (Xie et al. 2023) —
    // score raw-pool docs by the hashed-n-gram log-likelihood ratio
    // against a target corpus (here: the English slice) and keep the
    // top-100. Per-bucket λ snaps per term; doc weights are exact
    // integer sums; the top-k is TakeOrdered, never a global sort.
    "q397_dsir_select" -> ((s, dir) =>
      Sampling.dsirSelect(t(s, dir, "documents"), col("doc_id"),
        col("text"), col("lang") === "en", 4096, 100)),

    // Quality/eval: MACRO-F1 over the Naive-Bayes confusion (q255's
    // table): per true class one exact floored F1 (2tp/(2tp+fp+fn) —
    // never a precision/recall chain), macro over true classes.
    "q396_macro_f1" -> ((s, dir) => {
      val conf = Text.naiveBayesEval(t(s, dir, "documents"), "doc_id",
        col("lang"), col("text"))
      Quality.macroF1(conf, col("y"), col("pred"), col("n"))
    }),

    // Dedup/graph: DUP-GRAPH HEALTH — the read before any cluster
    // collapse ships: the component-SIZE distribution and the giant
    // component's corpus share. A giant component is the classic
    // over-aggressive-threshold symptom (one transitive blob swallows
    // the corpus and "keep one per cluster" deletes it); the oracle
    // recomputes components by recursive closure.
    "q394_dup_graph_health" -> ((s, dir) => withShufflePartitions(s, 8) {
      val dd0 = docsDup(s, dir)
        .filter((col("doc_id") % 1000000000) % 5 === 0)
      // a SECOND variant for 1-in-25 base docs: transitive size-3
      // components next to the pair floor — the distribution must
      // show real structure, not one size
      val dd = dd0.unionByName(dd0
        .filter(col("doc_id") < 1000000000L && col("doc_id") % 25 === 0)
        .select((col("doc_id") + 2000000000L).as("doc_id"),
          concat(col("text"), lit(" qq7 vv6")).as("text")))
      val hs = dd.select(col("doc_id").as("id"),
        Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
      val pairs = Dedup.jaccardPairsHashed(hs, "id", "hs", 0.5)
      val cl = Dedup.duplicateClusters(pairs)
      val n = dd.count()
      val sizes = cl.groupBy(col("component"))
        .agg(count(lit(1)).as("size")).localCheckpoint(true)
      val giant = sizes.agg(max(col("size"))).head().getLong(0)
      sizes.groupBy(col("size")).agg(count(lit(1)).as("n_components"))
        .select(col("size"), col("n_components"),
          lit(giant).as("giant_size"),
          lit(giant * 1000000L / n).as("giant_share_micro"))
    }),

    // ML/curation: EXPECTED CALIBRATION ERROR — the model-card number
    // over q379's exact bin masses: one floored division over exact
    // gap sums (no lossy per-bin rates), plus the worst bin's gap.
    "q392_calibration_ece" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val vecs = e.select(col("vec_id").as("id"), col("embedding").as("x"))
      val labels = e.select(col("vec_id").as("id"),
        when(col("label") === 0, 1L).otherwise(0L).as("y"))
      val w = LinearModel.logisticGd(vecs, labels, 3)
      LinearModel.expectedCalibrationError(
        LinearModel.calibrationBins(
          LinearModel.scoreLogistic(vecs, w), labels, 1000))
    }),

    // Storage: SCHEMA HISTORY — the DDL audit beside q371's DESCRIBE
    // HISTORY: per version the columns added/removed vs the previous
    // one, manifest-only. Three commits evolve add→remove.
    "q393_schema_history" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
      val tbl = gateTempDir("q393") + "/t"
      Snapshot.commit(docs.select(col("doc_id"), col("n_chars")), tbl)
      Snapshot.commit(docs.select(col("doc_id"), col("n_chars"),
        col("lang")), tbl)
      Snapshot.commit(docs.select(col("doc_id"), col("lang")), tbl)
      Snapshot.schemaHistory(s, tbl)
    }),

    // Storage: SHALLOW CLONE — the dev/test sandbox face (Delta's
    // CLONE): a new table whose v1 re-references the source's files
    // (zero copy, plan-pinned by manifest-dir equality), then
    // DIVERGES with its own commit while the source stays intact.
    "q390_shallow_clone" -> ((s, dir) => {
      import graft.sources.Snapshot
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val base = gateTempDir("q390")
      val (src, dst) = (base + "/src", base + "/clone")
      Snapshot.commit(docs, src)
      val v = Snapshot.cloneTable(src, dst)
      Snapshot.commit(Snapshot.read(s, dst)
        .withColumn("n_chars", col("n_chars") * 2), dst)
      val zeroCopy = Snapshot.readManifest(dst, 1L).dirs ==
        Snapshot.readManifest(src, 1L).dirs
      val srcChars = Snapshot.read(s, src)
        .agg(sum(col("n_chars"))).head().getLong(0)
      val cloneV1 = Snapshot.read(s, dst, Some(1L))
        .agg(sum(col("n_chars"))).head().getLong(0)
      Snapshot.read(s, dst)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_chars")).as("clone_v2_chars"))
        .select(lit(v).as("clone_version"), lit(zeroCopy).as("zero_copy"),
          col("n_rows"), lit(srcChars).as("src_chars"),
          lit(cloneV1).as("clone_v1_chars"), col("clone_v2_chars"))
    }),

    // Text/quality: LANGUAGE CONSISTENCY — the mixed-language screen
    // doc-level langid can't see: 16-token segments classify
    // independently; planted German tails on 1-in-7 docs force mixed
    // documents whose dominant language and segment splits the oracle
    // recomputes with its own stopword ratios.
    "q391_lang_consistency" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"),
          lit(" der die das und ein der die das und ein" +
            " der die das und ein")))
          .otherwise(col("text")).as("text"))
      Text.langConsistency(docs, col("doc_id"), col("text"), 16)
    }),

    // Similarity/PCA: ALL-BUT-THE-TOP rewrite — the step after q383
    // says yes: subtract each vector's top-component projection in
    // the exact snap space and pin the REWRITE by its invariants per
    // label: Σ r·v (orthogonality witness, ≈ 0 up to truncation),
    // Σ‖r‖², and the projection range. The oracle replays gramian +
    // power steps + the per-dim subtraction.
    "q387_remove_top_component" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val g = Similarity.gramianFixedPoint(e, col("embedding"), 1000)
      val v = Similarity.topEigenFixedPoint(g, 4)
      Similarity.removeTopComponent(e, col("vec_id"), col("embedding"),
          v, 1000)
        .join(e.select(col("vec_id").as("id"), col("label")), "id")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("r_dot_v")).as("r_dot_v_sum"),
          sum(col("r_energy")).as("r_energy_sum"),
          min(col("p")).as("p_min"), max(col("p")).as("p_max"))
    }),

    // Text/format: FILL-IN-THE-MIDDLE transform — the infill training
    // format: per doc two deterministic hash cuts (no RNG state),
    // prefix/middle/suffix re-rendered as <PRE>/<SUF>/<MID>, the PSM
    // string pinned byte-exactly by md5. Degenerate docs flow through
    // with empty segments.
    "q388_fim_split" -> ((s, dir) =>
      Text.fimSplit(t(s, dir, "documents"), col("doc_id"), col("text"))),

    // Sampling/mixture: EXPONENTIATED-GRADIENT domain reweighting —
    // the DoReMi-style update from per-source losses (here: exact
    // floored mean tokens per doc) to the next mixture: snapped exp
    // factors, floor + largest-remainder normalization summing to
    // EXACTLY 1e6 micro.
    "q389_eg_reweight" -> ((s, dir) => {
      val losses = t(s, dir, "documents")
        .select(col("source"),
          Text.tokenCount(col("text")).cast("long").as("n"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("sn"), count(lit(1)).as("c"))
        .select(col("source"),
          ((col("sn") * 1000000L - pmod(col("sn") * 1000000L, col("c")))
            / col("c")).cast("long").as("loss_micro"))
      Sampling.egReweight(losses, 100000L)
    }),

    // Stats/eval: DETERMINISTIC BOOTSTRAP CI on the mean doc length —
    // the error bar an eval report carries, with no RNG state: every
    // draw is md5(rep:j) mod n (the hashLong convention), 200
    // resamples, exact ×1e6 floored means, CI = order statistics at
    // 2.5/97.5% basis-point indexes. Two engines replay the identical
    // resample universe.
    "q386_bootstrap_ci" -> ((s, dir) =>
      Sampling.bootstrapCiMean(
        t(s, dir, "documents")
          .select(col("doc_id"), Text.tokenCount(col("text")).as("v")),
        col("doc_id"), col("v"), 200, 250, 9750)),

    // Quality/labels: COHEN'S KAPPA between the annotator (label 0)
    // and the trained classifier at a fixed operating point — the
    // chance-corrected agreement behind any "model matches the
    // labeler" claim, exact fixed-point (kappa can be negative;
    // truncation matches SQL integer division). The oracle replays
    // training, scoring, thresholding AND the kappa arithmetic.
    "q385_cohen_kappa" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val vecs = e.select(col("vec_id").as("id"), col("embedding").as("x"))
      val labels = e.select(col("vec_id").as("id"),
        when(col("label") === 0, 1L).otherwise(0L).as("y"))
      val w = LinearModel.logisticGd(vecs, labels, 3)
      val scored = LinearModel.scoreLogistic(vecs, w)
        .join(labels, "id")
      Quality.cohenKappa(scored, col("y") === 1L,
        col("pmu") >= 282000L)
    }),

    // Text/dedup: the full crawl CANONICALIZER — NFC + invisible
    // strip + whitespace collapse + lowercase, the chain that turns
    // two renders of one page (NFD, zero-width-injected, re-wrapped,
    // case-shifted) into ONE dedup key. Twins planted per doc differ
    // in all four ways; raw md5 pairs nothing, canonical md5 pairs
    // every twin. Per-stage rewrite counts localize which class of
    // mangling the corpus actually carries.
    "q384_canonical_dedup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val all = base
        .select(col("doc_id"),
          concat(lit(" "), col("text"), lit(" Caf\u00e9 X")).as("text"))
        .unionByName(base.select(
          (col("doc_id") + 1000000000L).as("doc_id"),
          concat(lit(" \u200B"), col("text"),
            lit("  cafe\u0301  x")).as("text")))
      val st = all
        .select(col("doc_id"), col("text"),
          graft.functions.NativeFunctions.unicodeNorm(col("text"), "NFC")
            .as("s1"))
        .withColumn("s2", Text.stripInvisible(col("s1")))
        .withColumn("s3", Text.collapseWhitespace(col("s2")))
        .withColumn("canon", lower(col("s3")))
        .localCheckpoint(true)
      val groups = st.groupBy(md5(col("canon"))).count()
        .filter(col("count") >= 2).count()
      val rawGroups = st.groupBy(md5(col("text"))).count()
        .filter(col("count") >= 2).count()
      st.agg(count(lit(1)).as("n_docs"),
          sum(when(col("s1") =!= col("text"), 1L).otherwise(0L))
            .as("changed_nfc"),
          sum(when(col("s2") =!= col("s1"), 1L).otherwise(0L))
            .as("changed_invisible"),
          sum(when(col("s3") =!= col("s2"), 1L).otherwise(0L))
            .as("changed_ws"))
        .select(col("n_docs"), col("changed_nfc"),
          col("changed_invisible"), col("changed_ws"),
          lit(rawGroups).as("raw_dup_groups"),
          lit(groups).as("canonical_dup_groups"))
    }),

    // Sampling/mixture: TARGET-WEIGHTED MIXTURE PLAN — the arithmetic
    // run before any sampling: per weighted source the exact target
    // (⌊budget·w/Σw⌋ at an odd budget to exercise every floor),
    // whole-pass upsample epochs, per-pass inclusion rate, planned
    // mass and shortfall; a weighted-but-absent source surfaces with
    // zero availability and its whole target as shortfall (the
    // full-outer contract), unweighted sources plan to zero.
    "q381_mixture_plan" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Sampling.mixturePlan(docs, col("source"),
        Text.tokenCount(col("text")),
        Seq("src1" -> 500000L, "src3" -> 300000L, "src5" -> 150000L,
          "synthetic_src" -> 50000L),
        777777L)
    }),

    // Similarity/PCA: TOP EIGENVECTOR of the corpus Gramian by
    // fixed-point power iteration — the local eigen-solve of the
    // tall-skinny PCA split made ORACLE-REPLAYABLE: exact decimal
    // matrix-vector products, floor shifts, one correctly-rounded
    // sqrt/divide per step (the logisticGd determinism contract
    // applied to PCA). Four iterations from all-ones; the output pins
    // the entire trajectory, all 64 micro components.
    "q382_top_eigenvector" -> ((s, dir) => {
      val g = Similarity.gramianFixedPoint(t(s, dir, "embeddings"),
        col("embedding"), 1000)
      Similarity.topEigenFixedPoint(g, 4)
    }),

    // Similarity/PCA: TOP-COMPONENT ENERGY per label — the
    // "all-but-the-top" (Arora et al.) decision read: how much of
    // each class's embedding energy lies along the corpus-dominant
    // direction, as EXACT integer masses (projection in the ×1e3
    // snap space, floor via the pmod identity). The oracle replays
    // gramian + 4 power steps + the mass rollup end to end.
    "q383_top_component_mass" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val g = Similarity.gramianFixedPoint(e, col("embedding"), 1000)
      val v = Similarity.topEigenFixedPoint(g, 4)
      Similarity.topComponentMass(e, col("embedding"), col("label"),
        v, 1000)
    }),

    // Streaming gate: CONTINUOUS decontamination against a FIXED
    // train index — q373's increment contract as a stream: the train
    // SA probe faces persist once, then three micro-batches of
    // planted near-copies (1-in-10 of train, id lanes by batch) each
    // rank-descend + diagonal-chain and MERGE their per-doc verdicts
    // (replay-idempotent by key). The index never rebuilds mid-stream;
    // per-batch cost tracks the batch. The oracle rebuilds the full
    // combined SA — the stream must land exactly the batch-rebuild
    // truth.
    "q380_decontamination_stream" -> ((s, dir) => {
      val train = t(s, dir, "documents").filter(col("doc_id") % 24 === 0)
        .select(col("doc_id"), col("text"))
      def inc(b: Int): DataFrame = train
        .filter(col("doc_id") % 240 === b * 120)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          concat(col("text"), lit(" zz9 qq8")).as("text"))
      val tmp = gateTempDir("q380")
      val idx = tmp + "/sa_index"
      withShufflePartitions(s, 8) {
        val c = SuffixArray.corpus(train, col("doc_id"), col("text"))
        val b = SuffixArray.buildTo(c, 8L)
        SuffixArray.persistProbeIndex(c, b, idx, 8L)
        val in = writeStreamBatches(Seq(inc(0), inc(1)), tmp)
        val schema = s.read.parquet(in).schema
        graft.streaming.Streams.decontaminationStream(
          s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(in), idx, tmp + "/t", tmp + "/ck", 8L)
      }
      graft.sources.Snapshot.read(s, tmp + "/t")
        .select(col("doc_id"), col("n_tokens"),
          col("longest_train_match"), col("contaminated_starts"),
          col("ingest_batch"))
    }),

    // ML/curation: CALIBRATION of the trained quality classifier —
    // before q361's scores gate any data, the reliability masses:
    // train the same 3-step trajectory, score every row with the
    // final weights (same snapped forward pass), bin by predicted
    // probability (1000 equal widths — per-mille, because a 3-step
    // model's scores cluster tightly around σ(0); top edge clamped)
    // and emit EXACT integer masses per bin — row count, positives,
    // ×1e6 predicted mass. The oracle replays training AND scoring
    // AND binning.
    "q379_calibration_bins" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val vecs = e.select(col("vec_id").as("id"), col("embedding").as("x"))
      val labels = e.select(col("vec_id").as("id"),
        when(col("label") === 0, 1L).otherwise(0L).as("y"))
      val w = LinearModel.logisticGd(vecs, labels, 3)
      LinearModel.calibrationBins(
        LinearModel.scoreLogistic(vecs, w), labels, 1000)
    }),

    // Dedup/exact: duplicate-span EXCISION — the rewrite a dedup user
    // actually runs after the q357/q358 census: every token inside a
    // repeated run ≥ 8 (also occurring elsewhere in the corpus) is
    // cut; overlapping spans coalesce through the per-doc running-max
    // pass before any token is removed, and clean_fp pins the rewrite
    // BYTE-EXACTLY (the scrubBoilerplateLines convention). The oracle
    // recomputes removal from brute-force 8-gram counts — two
    // unrelated algorithms must emit identical hashes.
    "q372_excise_spans" -> ((s, dir) => withShufflePartitions(s, 8) {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 3 === 0)
      val c = SuffixArray.corpus(docs, col("doc_id"), col("text"))
      val b = SuffixArray.build(c)
      // descent materialized inside the partition scope (see q357)
      val lcps = SuffixArray.adjacentLcp(b, c.numDocs)
        .localCheckpoint(true)
      val toks = docs.select(col("doc_id"),
        Text.tokens(col("text")).as("tk"))
      SuffixArray.exciseDuplicateSpans(lcps, toks, 8L)
    }),

    // Dedup/exact: INCREMENTAL decontamination — the q114/q119
    // increment contract at the exact-substring tier. The TRAIN
    // corpus's suffix-array probe faces (vocab + doubling maps + the
    // 8-window occurrence table) persist through Snapshot ONCE; a new
    // batch (planted near-copies of 1-in-10 train docs, the docsDup
    // convention) rank-descends its 8-grams against them (3 inner
    // joins; an absent pair proves the window never occurs in train)
    // and DIAGONAL-CHAINS the hits: consecutive positions hitting one
    // (train doc, alignment) diagonal are ONE contiguous match of
    // exactly run+8 tokens — the full-rebuild longestCrossMatch value
    // for every match ≥ 8, with NO rebuild and cost tracking the
    // increment, never the corpus. The oracle rebuilds the FULL
    // combined SA, so the gate IS that equality.
    "q373_decontaminate_increment" -> ((s, dir) =>
      withShufflePartitions(s, 8) {
        val train = t(s, dir, "documents")
          .filter(col("doc_id") % 6 === 0)
          .select(col("doc_id"), col("text"))
        val inc = train.filter(col("doc_id") % 60 === 0)
          .select((col("doc_id") + 1000000000L).as("doc_id"),
            concat(col("text"), lit(" zz9 qq8")).as("text"))
        val idx = gateTempDir("q373") + "/sa_index"
        val c = SuffixArray.corpus(train, col("doc_id"), col("text"))
        val b = SuffixArray.buildTo(c, 8L)
        SuffixArray.persistProbeIndex(c, b, idx, 8L)
        val m = SuffixArray.decontaminateIncrement(s, idx, inc, 8L)
          .localCheckpoint(true)
        val nTok = inc.select(col("doc_id"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens"))
        m.groupBy(col("doc_id"))
          .agg(max(col("train_match")).as("longest_train_match"),
            sum(when(col("train_match") >= 8, lit(1L)).otherwise(lit(0L)))
              .as("contaminated_starts"))
          .join(nTok, "doc_id")
          .filter(col("longest_train_match") >= 8)
          .select(col("doc_id"), col("n_tokens"),
            col("longest_train_match"), col("contaminated_starts"))
          .orderBy(col("longest_train_match").desc, col("doc_id"))
          .limit(50)
      }),

    // Multimodal: REAL PNG decode through the javax.imageio tier —
    // each doc's text paints a 5×5 TYPE_INT_RGB image written as an
    // actual PNG (zlib-compressed scanlines, a codec the pure-JVM BMP
    // arithmetic never touches) and the default FormatDecoder sniffs
    // the 8-byte signature and truly INFLATES it back to pixels. The
    // oracle recomputes the features from the construction arithmetic
    // (the q113 convention); the container byte LENGTH is an encoder
    // detail and is deliberately NOT projected — pixel features only.
    "q374_png_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val pixels = Array.tabulate(25) { i =>
          val cp = text.charAt(i).toInt
          (((cp * 11) % 256) << 16) | (((cp * 5) % 256) << 8) |
            ((cp * 2) % 256)
        }
        (id, Multimodal.pngBytes(5, 5, pixels))
      }
      Multimodal.decodeFeaturesBatched(media).toDF()
        .select(col("doc_id"), col("checksum"), col("first_byte"))
    }),

    // Tokenizer/packing: BPE APPLIED AT CORPUS SCALE — q175 learns
    // merges, q186 scores compression, this runs the step a training
    // pipeline actually ships: apply the learned 4-round merge table
    // to every word (vocabulary-sized replaces, corpus joins by
    // word), roll BPE token counts up per doc, and feed them STRAIGHT
    // into q363's concat-and-chunk packer — the learn→tokenize→pack
    // chain end-to-end, every value exact.
    "q375_bpe_apply_pack" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
        .filter(col("w").rlike("^[a-z0-9]+$"))
      val wc = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .persist() // cross-action reuse: learner rounds + apply + join
      val merges = Text.bpeLearnMerges(wc, 4)
      val applied = Text.bpeApplyMerges(wc, merges)
      val perDoc = toks
        .join(applied.select(col("w"), col("n_symbols")), "w")
        .groupBy(col("doc_id")).agg(sum(col("n_symbols")).as("n"))
      Packing.sequencePacking(perDoc, 512L)
    }),

    // Generation eval: DISTINCT-N DIVERSITY — corpus-wide distinct
    // n-gram counts and ratios for n=1..4 (the mode-collapse screen
    // run beside q334's BLEU; a self-repetitive generator shows low
    // distinct-2/3 long before quality scores move). Exact integer
    // counts, one double ratio each.
    "q341_distinct_ngrams" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
        .persist()
      def grams(n: Int): Column =
        when(size(col("tk")) >= n,
          transform(sequence(lit(1), size(col("tk")) - (n - 1)),
            i => concat_ws(" ", slice(col("tk"), i, lit(n)))))
          .otherwise(array().cast("array<string>"))
      (1 to 4).map { n =>
        toks.select(explode(grams(n)).as("g"))
          .agg(count(lit(1)).as("total"),
            countDistinct(col("g")).as("distinct"))
          .select(lit(n).as("n"), col("total"), col("distinct"),
            when(col("total") === 0, lit(null)).otherwise(
              round((col("distinct").cast("double") /
                col("total").cast("double")).cast("decimal(20,10)"), 6)
                .cast("double")).as("distinct_ratio"))
      }.reduce(_ unionByName _)
    }),

    // Text/provenance: WEIGHTED VOCAB CONTAINMENT — directional
    // C(A⊂B) = Σ_{t∈A∩B} idf_t / Σ_{t∈A} idf_t per source pair
    // (q168's Jaccard is symmetric and unweighted; containment says
    // who SUBSUMES whom, idf stops stopwords from faking overlap):
    // idf ×1e6-snapped per term so the masses are exact integer sums,
    // one (source, token) distinct + a vocab-keyed pair join.
    "q305_vocab_containment" -> ((s, dir) => {
      val st = t(s, dir, "documents")
        .select(col("source"), explode(array_distinct(
          Text.tokens(col("text")))).as("tok"))
        .distinct()
      val dfq = t(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(
          Text.tokens(col("text")))).as("tok"))
        .distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nd = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val w = dfq.crossJoin(broadcast(nd))
        .select(col("tok"),
          round(log(col("n_docs").cast("double") /
            col("df").cast("double")) * 1e6).cast("long").as("wm"))
      val sw = st.join(w, "tok")
      val tot = sw.groupBy(col("source")).agg(sum(col("wm")).as("tw"))
      val inter = sw.as("a").join(sw.as("b"),
          col("a.tok") === col("b.tok") &&
            col("a.source") =!= col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(sum(col("a.wm")).as("iw"))
      inter.join(tot.select(col("source").as("source_a"),
          col("tw").as("tw_a")), "source_a")
        .select(col("source_a"), col("source_b"),
          round((col("iw").cast("double") / col("tw_a").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double")
            .as("containment"))
        .orderBy(col("containment").desc, col("source_a"),
          col("source_b")).limit(30)
    }),

    // Events/LM: MARKOV STATIONARY MIX — three power-iteration steps
    // of the session transition matrix from the uniform start (the
    // "where do sessions settle" long-run read over q132's
    // transitions; q237 predicts one step, this iterates): per-step
    // contributions snap ×1e9 pre-sum (the q135 discipline), the
    // |Σ|-row distribution joins the |Σ|²-cell matrix per step.
    "q306_markov_stationary" -> ((s, dir) => {
      val tr = Events.sessionTransitions(t(s, dir, "events"),
          col("user_id"), col("ts"), col("event_id"),
          col("event_type"), 1800L)
        .select(col("from_type"), col("to_type"), col("n"))
      val rowTot = tr.groupBy(col("from_type"))
        .agg(sum(col("n")).as("rt"))
      val p = tr.join(rowTot, "from_type")
      val states = rowTot.select(col("from_type").as("st"))
      val n0 = states.crossJoin(broadcast(
        states.agg(count(lit(1)).as("k"))))
        .select(col("st"), (lit(1.0) / col("k").cast("double"))
          .as("pi"))
      def step(cur: DataFrame): DataFrame =
        p.join(cur.select(col("st").as("from_type"), col("pi")),
            "from_type")
          .select(col("to_type").as("st"),
            round(col("pi") * (col("n").cast("double") /
              col("rt").cast("double")) * lit(1e9)).cast("long")
              .as("c"))
          .groupBy(col("st")).agg((sum(col("c")).cast("double") /
            lit(1e9)).as("pi"))
      val pi3 = step(step(step(n0)))
      pi3.select(col("st").as("state"),
        round(col("pi").cast("decimal(20,10)"), 6).cast("double")
          .as("pi"))
    }),

    // Events/robust: FUNNEL LATENCY BANDS — p25/p50/p75 of each
    // user's first-view → first-subsequent-purchase lag (q145's mean
    // hides the skew; the robust read is the quartile spread): one
    // user-key aggregate pairs the firsts, the ungrouped prefix
    // kernel ranks the exact second-valued lags, band = smallest lag
    // at ⌈q·n⌉ inclusive rank.
    "q303_funnel_latency_bands" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val fv = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
      val lags = ev.filter(col("event_type") === "purchase")
        .join(fv, "user_id")
        .filter(col("ts") >= col("tv"))
        .groupBy(col("user_id"))
        // exact MICROSECOND lags: per-second truncation before the
        // subtract would disagree cross-engine on sub-second stamps
        .agg(min(unix_micros(col("ts")) -
          unix_micros(col("tv"))).as("lag_us"))
      val byV = lags.groupBy(col("lag_us").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val rk = Ranks.withRunningBelow(byV, "v", 1000000000000L,
        Seq("cnt"))
      val nn = byV.agg(sum(col("cnt")).as("n"))
      def band(q: Int): Column =
        round((min(when((col("cnt_below") + col("cnt")) * 100 >=
          col("n") * q, col("v"))).cast("double") / lit(1e6))
          .cast("decimal(20,10)"), 2).cast("double")
      rk.crossJoin(broadcast(nn))
        .groupBy(col("n").as("n_users"))
        .agg(band(25).as("p25_s"), band(50).as("p50_s"),
          band(75).as("p75_s"))
    }),

    // Graph: RECIPROCITY — the share of directed edges whose reverse
    // also exists (the mutual-follow/backlink rate; high reciprocity
    // changes every diffusion estimate on the graph): one self
    // equi-join of the distinct directed edge set against its own
    // transpose, exact ratio.
    "q304_reciprocity" -> ((s, dir) => {
      val e = docLinkEdges(s, dir)
        .filter(col("src") =!= col("dst")).distinct()
      val mut = e.as("a").join(e.as("b"),
          col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
        .select(col("a.src"), col("a.dst"))
      val nE = e.agg(count(lit(1)).as("n_edges"))
      val nM = mut.agg(count(lit(1)).as("n_mutual"))
      nE.crossJoin(nM)
        .select(col("n_edges"), col("n_mutual"),
          round((col("n_mutual").cast("double") /
            col("n_edges").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("reciprocity"))
    }),

    // Series/monitoring: DAILY QUANTILE BANDS — p10/p50/p90 of value
    // cents per day by EXACT grouped ranks (the monitoring band every
    // latency/value dashboard draws; approximate sketches drift,
    // these are the true order statistics): the grouped two-level
    // prefix kernel attaches per-day exclusive ranks, each band is
    // the smallest value whose inclusive rank reaches ⌈q·n⌉ — one
    // (day, value) aggregate, never a per-day sort partition of raw
    // rows.
    "q301_daily_bands" -> ((s, dir) => {
      val byV = t(s, dir, "events")
        .select(to_date(col("ts")).as("d"),
          round(col("value") * 100).cast("long").as("v"))
        .groupBy(col("d"), col("v")).agg(count(lit(1)).as("cnt"))
      val rk = Ranks.withRunningBelowBy(byV, "d", "v", 1000L,
          Seq("cnt"))
        .join(byV.groupBy(col("d")).agg(sum(col("cnt")).as("n")), "d")
      def band(q: Int, out: String): Column =
        (min(when((col("cnt_below") + col("cnt")) * 100 >=
          col("n") * q, col("v"))).cast("double") / 100.0)
          .cast("decimal(20,10)")
      rk.groupBy(col("d"), col("n"))
        .agg(round(band(10, "p10"), 2).cast("double").as("p10"),
          round(band(50, "p50"), 2).cast("double").as("p50"),
          round(band(90, "p90"), 2).cast("double").as("p90"))
        .select(col("d"), col("n").as("n_events"), col("p10"),
          col("p50"), col("p90"))
    }),

    // Reporting/privacy: K-SUPPRESSED heatmap — the weekday × hour
    // activity matrix with cells under k = 20 users SUPPRESSED (the
    // small-cell rule every published dashboard applies; q171
    // measures identifiability, this enforces the release policy):
    // suppressed cells survive as rows with null counts so the
    // consumer sees WHAT was withheld, never the value.
    "q302_suppressed_heatmap" -> ((s, dir) => {
      val cell = t(s, dir, "events")
        .select(dayofweek(col("ts")).as("dow"),
          hour(col("ts")).as("h"), col("user_id"))
        .groupBy(col("dow"), col("h"))
        .agg(count(lit(1)).as("n_events_raw"),
          countDistinct(col("user_id")).as("n_users_raw"))
      cell.select(col("dow"), col("h"),
        (col("n_users_raw") >= 20).as("released"),
        when(col("n_users_raw") >= 20, col("n_events_raw"))
          .as("n_events"),
        when(col("n_users_raw") >= 20, col("n_users_raw"))
          .as("n_users"))
    }),

    // Stats/guardrail: SAMPLE-RATIO MISMATCH (SRM) check — the first
    // A/B hygiene alarm: per day, χ²₁ = (n_t − n_c)²/(n_t + n_c)
    // against the designed 50/50 split; a crossed day means broken
    // RANDOMIZATION, and every effect estimate downstream of it is
    // void (run before q171/q272/q286 ever get read). Pure integer
    // numerator, one division, 3.84 = χ²₁ @ 95%.
    "q299_srm_check" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L))
            .as("n_t"),
          sum(when(col("user_id") % 2 =!= 0, 1L).otherwise(0L))
            .as("n_c"))
      val chi2 = round((((d38(col("n_t")) - col("n_c")) *
        (d38(col("n_t")) - col("n_c"))).cast("double") /
        (col("n_t") + col("n_c")).cast("double"))
        .cast("decimal(20,10)"), 4).cast("double")
      daily.select(col("d"), col("n_t"), col("n_c"),
        chi2.as("chi2"), (chi2 > 3.84).as("srm_alarm"))
    }),

    // Quality/meta: GATE REDUNDANCY matrix — pairwise overlap of the
    // three cheap quality gates' REJECT sets (too-short, high
    // repetition-proxy, blocklist-heavy): near-identical reject sets
    // mean a gate adds cost, not filtering (the ablation read before
    // adding filter #7 to a pipeline). One scan derives all three
    // flags; the matrix is 3×3 over exact counts with Jaccard 4dp.
    "q300_gate_overlap" -> ((s, dir) => {
      // bound token subtree: three gate expressions share ONE
      // tokenization per row (the Cols.bound interpreted-lambda
      // lesson)
      val fl = t(s, dir, "documents")
        .select((col("n_chars") < 250).as("gs"),
          Cols.bound(Text.tokens(col("text"))) { t0 =>
            struct(
              (size(array_distinct(t0)) * 3 < size(t0)).as("gr"),
              (size(filter(t0, x => x.isin("the", "of", "and"))) * 5
                >= size(t0)).as("gb"))
          }.as("m"))
        .select(col("gs"), col("m.gr").as("gr"), col("m.gb").as("gb"))
      def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
      // one aggregate computes all six masses; the 3-row matrix then
      // reads the checkpointed one-row frame (no re-scan per pair)
      val a = fl.agg(cnt(col("gs")).as("ns"), cnt(col("gr")).as("nr"),
          cnt(col("gb")).as("nb"),
          cnt(col("gs") && col("gr")).as("nsr"),
          cnt(col("gs") && col("gb")).as("nsb"),
          cnt(col("gr") && col("gb")).as("nrb"))
        .localCheckpoint(true)
      def row(ga: String, gb: String, na: Column, nb: Column,
              both: Column): DataFrame =
        a.select(lit(ga).as("gate_a"), lit(gb).as("gate_b"),
          na.as("n_a"), nb.as("n_b"), both.as("n_both"))
      row("g_block", "g_repeat", col("nb"), col("nr"), col("nrb"))
        .unionByName(row("g_block", "g_short", col("nb"), col("ns"),
          col("nsb")))
        .unionByName(row("g_repeat", "g_short", col("nr"), col("ns"),
          col("nsr")))
        .select(col("gate_a"), col("gate_b"), col("n_a"), col("n_b"),
          col("n_both"),
          when(col("n_a") + col("n_b") - col("n_both") === 0,
            lit(null))
            .otherwise(round((col("n_both").cast("double") /
              (col("n_a") + col("n_b") - col("n_both"))
                .cast("double")).cast("decimal(20,10)"), 4)
              .cast("double")).as("jaccard"))
    }),

    // Curation/fairness: DEDUP BIAS audit — keep-lowest-id exact
    // dedup on the mirrored corpus (q293's), measured as each
    // source's share BEFORE vs AFTER: position-biased keep rules
    // silently starve late/mirrored sources (mirrors lose every
    // duel to their originals here — the worst case made visible).
    // One fingerprint min-aggregate + two share tables.
    "q298_dedup_bias" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val corpus = base
        .unionByName(base.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 3000000000L).as("doc_id"),
            lit("mirror1").as("source"), col("text")))
        .unionByName(base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 4000000000L).as("doc_id"),
            lit("mirror2").as("source"), col("text")))
        .select(col("doc_id"), col("source"),
          Text.fingerprint(col("text")).as("fp"))
      val keep = corpus.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"))
      val before = corpus.groupBy(col("source"))
        .agg(count(lit(1)).as("n_before"))
      val after = corpus.join(keep,
          corpus("fp") === keep("fp") &&
            corpus("doc_id") === keep("keep_id"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_after"))
      val tots = before.agg(sum(col("n_before")).as("tb"))
        .crossJoin(after.agg(sum(col("n_after")).as("ta")))
      before.join(after, Seq("source"), "left")
        .na.fill(0L, Seq("n_after"))
        .crossJoin(broadcast(tots))
        .select(col("source"), col("n_before"), col("n_after"),
          round((col("n_before").cast("double") /
            col("tb").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("share_before"),
          round((col("n_after").cast("double") /
            col("ta").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("share_after"))
    }),

    // Dedup/trend: INCREMENTAL NOVELTY curve — treating doc_id as
    // crawl order, the share of each arrival's shingles NEVER SEEN in
    // any earlier doc, pooled per id-decile: the "is the crawl still
    // finding new content" decay read (q134 asks it of URLs; this of
    // CONTENT mass). First-seen is one min-aggregate on the shingle
    // key; deciles are exact integer floor-division — no rank pass.
    "q296_novelty_curve" -> ((s, dir) => {
      def floorDiv(a: Column, b: Column): Column =
        ((a - pmod(a, b)) / b).cast("long")
      val ds = t(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(
          Dedup.hashedShingles(Text.tokens(col("text")), 3)))
          .as("sh"))
      val fs = ds.groupBy(col("sh")).agg(min(col("doc_id")).as("fid"))
      val per = ds.join(fs, "sh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("fid") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
      val mx = t(s, dir, "documents").agg(max(col("doc_id")).as("mid"))
      per.crossJoin(broadcast(mx))
        .groupBy(floorDiv(col("doc_id") * 10, col("mid") + 1)
          .as("decile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_sh")).as("n_sh"),
          sum(col("n_novel")).as("n_novel"))
        .select(col("decile"), col("n_docs"), col("n_sh"),
          col("n_novel"),
          round((col("n_novel").cast("double") /
            col("n_sh").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("novelty"))
    }),

    // Similarity/eval: EMBEDDING-QUALITY AUC — over a 200-vector hash
    // panel's pairs, can COSINE separate same-label from diff-label?
    // The metric-learning eval in one number (q232/q295 ask it via
    // clustering/kNN; this is threshold-free): snapped micro cosines
    // as scores, label-equality as truth, the exact two-level-prefix
    // AUC kernel — never the n² comparisons AUC is defined over
    // (pairs here are panel-bounded; the kernel is what scales).
    "q297_embedding_auc" -> ((s, dir) => {
      val panel = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          col("label").cast("long").as("lb"),
          Dedup.hashLong(concat(lit("ea"),
            col("vec_id").cast("string"))).as("h"))
        .orderBy(col("h"), col("id")).limit(200)
        .select(col("id"), col("vec"), col("lb"))
      val pairs = panel.as("a").join(panel.as("b"),
          col("a.id") < col("b.id"))
        .select((col("a.lb") === col("b.lb")).as("y"),
          round(round(Similarity.cosine(col("a.vec"), col("b.vec")), 6)
            .cast("decimal(20,10)") * 1000000).cast("long").as("sm"))
      Profile.aucExact(pairs, col("y"), col("sm"), 1000000L)
    }),

    // Similarity/ML: kNN CLASSIFIER eval — 5-NN majority vote over
    // the labeled embeddings for a 100-query hash panel, confusion
    // counts out: the zero-training baseline any embedding-space
    // classifier must beat (and the direct read on whether labels
    // are SEPARABLE in the space — q232/q228 ask it of clusters,
    // this of neighborhoods). Brute candidates on the bounded panel
    // (swap ivfSearch at corpus scale); vote ties break on label.
    "q295_knn_classifier" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          col("label").cast("long").as("lb"))
      val e = emb.select(col("id"), col("vec"))
      val qs = emb.select(col("id"), col("vec"), col("lb"),
          Dedup.hashLong(concat(lit("kc"), col("id").cast("string")))
            .as("h"))
        .orderBy(col("h"), col("id")).limit(100)
      val nn = Similarity.bruteForceTopK(
          qs.select(col("id"), col("vec")), e, 5)
        .join(emb.select(col("id").as("neighbor_id"),
          col("lb").as("nl")), "neighbor_id")
      val vote = nn.groupBy(col("query_id"), col("nl"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("c").desc, col("nl"))))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("nl").as("pred"))
      qs.select(col("id").as("query_id"), col("lb").as("true_label"))
        .join(vote, "query_id")
        .groupBy(col("true_label"), col("pred"))
        .agg(count(lit(1)).as("n"))
    }),

    // Dedup/provenance: CROSS-SOURCE DUPLICATION matrix — exact-
    // fingerprint duplicate pairs bucketed by (source_a, source_b):
    // WHO mirrors WHOM, the provenance read behind dedup priorities
    // (q181 asks it of spans; this of whole documents). Per-
    // fingerprint per-source counts keep the pair algebra n·(n−1)/2
    // on the tiny (fp, source) groups — the corpus never self-joins.
    "q293_dup_source_matrix" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      // the crawl-mirror scenario: every 3rd doc re-hosted verbatim
      // on mirror1, every 7th on mirror2 (raw texts are unique, so
      // the cross-source structure is planted and known)
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val corpus = base.select(col("source"), col("text"))
        .unionByName(base.filter(col("doc_id") % 3 === 0)
          .select(lit("mirror1").as("source"), col("text")))
        .unionByName(base.filter(col("doc_id") % 7 === 0)
          .select(lit("mirror2").as("source"), col("text")))
      val fp = corpus
        .select(col("source"), Text.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp"), col("source"))
        .agg(count(lit(1)).as("c"))
      val within = fp.filter(col("c") > 1)
        .groupBy(col("source").as("source_a"))
        .agg(sum(d38(col("c")) * (col("c") - 1) / 2).cast("long")
          .as("n_pairs"))
        .select(col("source_a"), col("source_a").as("source_b"),
          col("n_pairs"))
      val across = fp.as("x").join(fp.as("y"),
          col("x.fp") === col("y.fp") &&
            col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("source_a"),
          col("y.source").as("source_b"))
        .agg(sum(d38(col("x.c")) * col("y.c")).cast("long")
          .as("n_pairs"))
      within.unionByName(across).filter(col("n_pairs") > 0)
    }),

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

    // Text/preprocess: AUTOMATIC STOPWORD discovery — rank tokens by
    // document-frequency share × cross-source distribution FLATNESS
    // (normalized source entropy): a true stopword is everywhere and
    // belongs to no one (q212's log-odds finds the opposite — the
    // owned terms). Entropy terms snap ×1e9 pre-sum (q230), the
    // composite score snaps 6dp BEFORE ranking so the cut is
    // engine-stable.
    "q291_stopword_discovery" -> ((s, dir) => {
      val occ = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(Text.tokens(col("text"))).as("tok"))
      val ts = occ.groupBy(col("tok"), col("source"))
        .agg(count(lit(1)).as("c"))
      val tt = ts.groupBy(col("tok")).agg(sum(col("c")).as("ct"))
      val hh = ts.join(tt, "tok")
        .select(col("tok"),
          round(-(col("c").cast("double") / col("ct").cast("double")) *
            log(col("c").cast("double") / col("ct").cast("double")) *
            lit(1e9)).cast("long").as("tf"))
        .groupBy(col("tok")).agg(sum(col("tf")).as("sh"))
      val dfreq = occ.select(col("tok"), col("doc_id")).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nd = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val flat = (col("sh").cast("double") / lit(1e9)) /
        log(lit(20.0))
      val dshare = col("df").cast("double") / col("n_docs").cast("double")
      tt.join(hh, "tok").join(dfreq, "tok").crossJoin(broadcast(nd))
        .select(col("tok").as("token"), col("df"), col("ct").as("n_occ"),
          round(flat.cast("decimal(20,10)"), 4).cast("double")
            .as("flatness"),
          round((dshare * flat).cast("decimal(20,10)"), 6)
            .cast("double").as("score"))
        .orderBy(col("score").desc, col("token")).limit(20)
    }),

    // Systems/curation: SHUFFLE-QUALITY audit of plain hash ordering
    // — per source, the positional-gap dispersion index (var/mean)
    // in the md5-rank global order: the check that "ORDER BY hash"
    // actually interleaves sources (clumped gaps starve a training
    // run of diversity mid-epoch; q243's round-robin is the
    // constructive fix, gaps exactly k by design). Global ranks ride
    // the bucketed prefix kernel over the hash domain; gaps are a
    // per-source window; moments exact.
    "q292_shuffle_quality" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val rated = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          Dedup.hashLong(concat(lit("sq"),
            col("doc_id").cast("string"))).as("h"))
      val byV = rated.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      val rk = Ranks.withRunningBelow(byV, "h", 1000000000000000L,
        Seq("cnt"))
      val pos = rated.join(rk.select(col("h"), col("cnt_below")), "h")
        .select(col("source"),
          (col("cnt_below") + 1).as("pos"))
      val gaps = pos.withColumn("g",
          col("pos") - lag(col("pos"), 1).over(
            Window.partitionBy(col("source")).orderBy(col("pos"))))
        .filter(col("g").isNotNull)
      gaps.groupBy(col("source"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sg"),
          sum(d38(col("g")) * col("g")).as("sgg"))
        .select(col("source"), col("n_gaps"),
          round((col("sg").cast("double") /
            col("n_gaps").cast("double")).cast("decimal(20,10)"), 2)
            .cast("double").as("mean_gap"),
          round(((d38(col("n_gaps")) * col("sgg") -
            col("sg") * col("sg")).cast("double") /
            (d38(col("n_gaps")) * col("n_gaps")).cast("double") /
            (col("sg").cast("double") / col("n_gaps").cast("double")))
            .cast("decimal(20,10)"), 4).cast("double")
            .as("dispersion"))
    }),

    // Text/trend: EPOCH TRENDING TERMS — log-odds shift of every
    // ≥25-count token between the two hash epochs (the q207
    // "fightin' words" kernel pointed at TIME instead of source):
    // the top risers are what changed in the corpus between crawls.
    // One (epoch, token) aggregate, ×1e4 ln snap, top-20 by
    // (shift desc, token).
    "q289_trending_terms" -> ((s, dir) => {
      val occ = t(s, dir, "documents")
        .select(Sampling.hashBucket(col("doc_id"), 2).as("ep"),
          explode(Text.tokens(col("text"))).as("tok"))
      val g = occ.groupBy(col("tok"))
        .agg(sum(when(col("ep") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("ep") === 1, 1L).otherwise(0L)).as("c1"))
        .filter(col("c0") + col("c1") >= 25)
      val tots = g.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
      g.crossJoin(broadcast(tots))
        .select(col("tok").as("token"), col("c0"), col("c1"),
          round((log((col("c1") + 1).cast("double") /
              (col("n1") - col("c1") + 1).cast("double")) -
            log((col("c0") + 1).cast("double") /
              (col("n0") - col("c0") + 1).cast("double")))
            .cast("decimal(20,10)"), 4).cast("double").as("log_odds"))
        .orderBy(col("log_odds").desc, col("token")).limit(20)
    }),

    // Similarity/eval: RECALL@n CURVE — where in the IVF ranking the
    // TRUE nearest neighbor actually sits, cumulated over n ∈ {1, 2,
    // 5, 10, 20} (q108 reports recall at one k per nprobe; tuning
    // reads the whole curve to pick the rerank depth). First-hit
    // rank via one (query, neighbor) equi-join of truth@1 against
    // the k=20 nprobe=2 ranking.
    "q290_recall_curve" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val centroids = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      val truth1 = Similarity.bruteForceTopK(qs, e, 1)
        .select(col("query_id"), col("neighbor_id"))
      val assigned = Similarity.ivfAssign(e, centroids)
      val approx = Similarity.ivfSearch(qs, assigned, centroids, 20,
        nprobe = 2, preAssigned = true)
      val fh = truth1.join(approx.select(col("query_id"),
        col("neighbor_id"), col("rank")), Seq("query_id",
        "neighbor_id"))
      val grid = {
        import s.implicits._
        Seq(1, 2, 5, 10, 20).toDF("n_at")
      }
      val nq = qs.agg(count(lit(1)).as("n_queries"))
      grid.join(fh, col("rank") <= col("n_at"), "left")
        .groupBy(col("n_at"))
        .agg(count(col("query_id")).as("n_hit"))
        .crossJoin(broadcast(nq))
        .select(col("n_at"), col("n_hit"), col("n_queries"),
          round((col("n_hit").cast("double") /
            col("n_queries").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("recall"))
    }),

    // Stats/eval: EXPECTED + MAXIMUM CALIBRATION ERROR — the two
    // headline calibration numbers (ECE = Σ n_k|p̄_k − ō_k|/N, MCE =
    // max_k gap) over q260's constant-prediction groups: ECE's
    // numerator is the PURE INTEGER Σ|p·n_k − 10⁶·s_k| (one exact
    // aggregate, one division); MCE snaps each group's gap ×1e9
    // before the max.
    "q288_calibration_error" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val ev = t(s, dir, "events")
        .select(hour(col("ts")).as("h"),
          (col("event_type") === "purchase").cast("long").as("y"),
          Sampling.hashBucket(col("event_id"), 2).as("b"))
      val tr = ev.filter(col("b") === 0).groupBy(col("h"))
        .agg(count(lit(1)).as("nh"), sum(col("y")).as("ph"))
        .select(col("h"),
          round((col("ph").cast("double") / col("nh").cast("double")
            * 1e6).cast("decimal(20,10)")).cast("long").as("p"))
      val g = ev.filter(col("b") =!= 0).join(broadcast(tr), "h")
        .groupBy(col("p"))
        .agg(count(lit(1)).as("nk"), sum(col("y")).as("sk"))
        .withColumn("dl", abs(d38(col("p")) * col("nk")
          - d38(lit(1000000L)) * col("sk")))
      g.agg(sum(col("nk")).as("n"), sum(col("dl")).as("sdl"),
          max(round(col("dl").cast("double") /
            col("nk").cast("double") / lit(1e6) * lit(1e9))
            .cast("long")).as("mx"))
        .select(col("n"),
          round((col("sdl").cast("double") /
            (col("n").cast("double") * lit(1e6)))
            .cast("decimal(20,10)"), 6).cast("double").as("ece"),
          round((col("mx").cast("double") / lit(1e9))
            .cast("decimal(20,10)"), 6).cast("double").as("mce"))
    }),

    // Stats/causal: COVARIATE-BALANCE audit (standardized mean
    // difference) — before reading q272's DiD as causal, check the
    // hash cohorts are actually exchangeable: per covariate,
    // SMD = (m_t − m_c)/√((v_t+v_c)/2), |SMD| < 0.1 = balanced (the
    // propensity-matching diagnostic). One melt (Expand) + one
    // (covariate, cohort) aggregate; moments exact, one snapped
    // division.
    "q285_covariate_balance" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val ev = t(s, dir, "events")
        .select((col("user_id") % 2 === 0).as("tr"),
          explode(array(
            struct(lit("hour").as("cov"),
              hour(col("ts")).cast("long").as("x")),
            struct(lit("dow").as("cov"),
              dayofweek(col("ts")).cast("long").as("x")),
            struct(lit("value_cents").as("cov"),
              round(col("value") * 100).cast("long").as("x"))))
            .as("m"))
        .select(col("tr"), col("m.cov").as("cov"), col("m.x").as("x"))
      val g = ev.groupBy(col("cov"), col("tr"))
        .agg(count(lit(1)).as("n"), sum(d38(col("x"))).as("sx"),
          sum(d38(col("x")) * col("x")).as("ss"))
      def side(t0: Boolean, c: String, out: String): Column =
        max(when(col("tr") === t0, col(c))).as(out)
      val wide = g.groupBy(col("cov"))
        .agg(side(true, "n", "n_t"), side(true, "sx", "s_t"),
          side(true, "ss", "ss_t"), side(false, "n", "n_c"),
          side(false, "sx", "s_c"), side(false, "ss", "ss_c"))
      def mean(sx: String, n: String): Column =
        col(sx).cast("double") / col(n).cast("double")
      def variance(n: String, sx: String, ss: String): Column =
        (d38(col(n)) * col(ss) - col(sx) * col(sx)).cast("double") /
          (d38(col(n)) * col(n)).cast("double")
      val vsum = variance("n_t", "s_t", "ss_t") +
        variance("n_c", "s_c", "ss_c")
      wide.select(col("cov").as("covariate"), col("n_t"), col("n_c"),
        when(vsum === 0.0, lit(null)).otherwise(
          round(((mean("s_t", "n_t") - mean("s_c", "n_c")) /
            sqrt(vsum / lit(2.0))).cast("decimal(20,10)"), 4)
            .cast("double")).as("smd"))
    }),

    // Stats/eval: SEQUENTIAL PEEKING curve — the cumulative two-
    // proportion z between the hash cohorts after each day: the
    // methodological trap made visible (a fixed-horizon test "peeked"
    // daily crosses 1.96 by chance long before the horizon — compare
    // the crossed flags against the final day's verdict). Cumulative
    // counts ride per-cohort windows over the tiny day grid; z is
    // exact integers through one division + sqrt.
    "q286_peeking_curve" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select((col("user_id") % 2 === 0).as("tr"),
          to_date(col("ts")).as("d"),
          (col("event_type") === "purchase").cast("long").as("y"))
        .groupBy(col("tr"), col("d"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("cv"))
      val w = Window.partitionBy(col("tr")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = daily
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("cc", sum(col("cv")).over(w))
      def sideCol(t0: Boolean, c: String, out: String): Column =
        max(when(col("tr") === t0, col(c))).as(out)
      val wide = cum.groupBy(col("d"))
        .agg(sideCol(true, "cn", "n_t"), sideCol(true, "cc", "c_t"),
          sideCol(false, "cn", "n_c"), sideCol(false, "cc", "c_c"))
        .filter(col("n_t").isNotNull && col("n_c").isNotNull)
      val pt = col("c_t").cast("double") / col("n_t").cast("double")
      val pc = col("c_c").cast("double") / col("n_c").cast("double")
      val pb = (col("c_t") + col("c_c")).cast("double") /
        (col("n_t") + col("n_c")).cast("double")
      val z = (pt - pc) / sqrt(pb * (lit(1.0) - pb) *
        (lit(1.0) / col("n_t").cast("double") +
          lit(1.0) / col("n_c").cast("double")))
      wide.select(col("d"), col("n_t"), col("n_c"),
        when(col("c_t") + col("c_c") === 0 ||
          col("c_t") + col("c_c") === col("n_t") + col("n_c"),
          lit(null))
          .otherwise(round(z.cast("decimal(20,10)"), 4)
            .cast("double")).as("z"),
        when(col("c_t") + col("c_c") === 0 ||
          col("c_t") + col("c_c") === col("n_t") + col("n_c"),
          lit(null))
          .otherwise(abs(round(z.cast("decimal(20,10)"), 4)) >= 1.96)
          .as("crossed"))
    }),

    // Systems: CACHE-PLANNING curve — the hit rate a perfect N-entry
    // LFU would achieve on the user-access stream, for N ∈ {1, 10,
    // 100, 1000}: top-N mass read off the FREQUENCY-OF-FREQUENCY
    // histogram (distinct-count domain, tiny) with exact partial-
    // bucket algebra c·min(k, N − k_before) — never a global sort of
    // the key table. The "how much memory buys how many hits" sizing
    // read behind every hot-key mitigation (q94/q195 find the keys;
    // this prices the cache).
    "q284_cache_curve" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val hc = t(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .groupBy(col("n").as("c")).agg(count(lit(1)).as("k"))
      val w = Window.partitionBy(Cols.onePartitionKey(col("c")))
        .orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hc
        .withColumn("k_before", coalesce(sum(col("k")).over(w),
          lit(0L)))
        .withColumn("m_before",
          coalesce(sum(d38(col("c")) * col("k")).over(w),
            lit(0).cast("decimal(38,0)")))
      val tot = hc.agg(sum(d38(col("c")) * col("k")).as("m_tot"),
        sum(col("k")).as("n_keys"))
      val grid = {
        import s.implicits._
        Seq(1L, 10L, 100L, 1000L).toDF("n_cache")
      }
      grid.join(cum, col("k_before") < col("n_cache"))
        .groupBy(col("n_cache"))
        .agg(sum(d38(col("c")) *
          least(col("k"), col("n_cache") - col("k_before")))
          .as("m_hit"))
        .crossJoin(broadcast(tot))
        .select(col("n_cache"), col("n_keys"),
          round((col("m_hit").cast("double") /
            col("m_tot").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("hit_rate"))
    }),

    // Dedup/tuning: THRESHOLD SWEEP — the dedup-aggressiveness curve
    // in ONE pass: pairs generate once at the loosest threshold
    // (0.5, the recall-complete prefix kernel), then every 0.05-step
    // threshold reads its pair count and droppable-doc count off the
    // same stream (snapped ×1e4 integer jaccard vs th·500 — no float
    // boundary ambiguity). The "how much does 0.8 vs 0.7 actually
    // delete" question answered without re-running the join per
    // candidate threshold.
    "q281_threshold_sweep" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairsPrefixHashed(
        docsDup(s, dir).select(col("doc_id").as("id"),
          Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs")),
        "id", "hs", 0.5)
        .select(col("id_a"), col("id_b"),
          round(col("jac") * 10000).cast("long").as("jm"))
        // persist IS right here despite the one-output-plan rule of
        // thumb: the two consumers aggregate on DIFFERENT keys (jm vs
        // id_b), so no exchange is identical and ReusedExchange can't
        // dedup the pair generation (measured: 10.3 s without the
        // persist, 4.4 s with — the divergent-consumer exception the
        // NOTES item-80 lesson names)
        .persist()
      // collapse BEFORE the sweep: a pair-count histogram over the
      // <=5001-value jm domain and a per-doc MAX-jm histogram (a doc
      // is droppable at th iff its best pair reaches th) — the 9-way
      // grid then joins two tiny frames, never the pair stream
      val hist = pairs.groupBy(col("jm")).agg(count(lit(1)).as("np"))
      val hb = pairs.groupBy(col("id_b")).agg(max(col("jm")).as("mj"))
        .groupBy(col("mj")).agg(count(lit(1)).as("nb"))
      val grid = s.range(10, 19)
        .select((col("id") * 5).cast("int").as("th_pct"))
      val np = grid.join(hist, col("jm") >= col("th_pct") * 100)
        .groupBy(col("th_pct")).agg(sum(col("np")).as("n_pairs"))
      val nd = grid.join(hb, col("mj") >= col("th_pct") * 100)
        .groupBy(col("th_pct")).agg(sum(col("nb")).as("n_droppable"))
      np.join(nd, "th_pct")
        .select(col("th_pct"), col("n_pairs"), col("n_droppable"))
    }),

    // Systems: MERKLE DIFF localization — the walk q276's tree
    // exists for: a replica whose every 503rd doc drifted (n_chars
    // off by one) diffs against the base tree; ONLY the changed
    // buckets' leaves and their log-depth ancestor paths surface.
    // Emits the differing (level, idx) nodes of both trees — a dozen
    // leaves localize in ~7·k nodes instead of a 64-bucket rescan.
    "q282_merkle_diff" -> ((s, dir) => {
      def floorDiv(a: Column, b: Column): Column =
        ((a - pmod(a, b)) / b).cast("long")
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      def treeOf(leaves: DataFrame): DataFrame = {
        var out = leaves.select(lit(0).as("level"), col("idx"),
          col("h"))
        var cur = leaves
        for (lvl <- 1 to 6) {
          cur = cur.groupBy(floorDiv(col("idx"), lit(2L)).as("idx"))
            .agg(md5(concat(min_by(col("h"), col("idx")),
              max_by(col("h"), col("idx")))).as("h"))
          out = out.unionByName(
            cur.select(lit(lvl).as("level"), col("idx"), col("h")))
        }
        out
      }
      // ONE corpus scan computes BOTH row hashes; one aggregate
      // yields both trees' leaf sums (the drifted replica is the
      // same rows with every 503rd doc's n_chars off by one)
      def rh(nch: Column): Column =
        Dedup.hashLong(concat_ws("|", col("doc_id"), col("source"),
          col("lang"), nch))
      val sums = t(s, dir, "documents").select(
          Sampling.hashBucket(concat(lit("mk"),
            col("doc_id").cast("string")), 64).as("bkt"),
          rh(col("n_chars")).as("rb"),
          rh(when(col("doc_id") % 503 === 0, col("n_chars") + 1)
            .otherwise(col("n_chars"))).as("rd"))
        .groupBy(col("bkt").as("idx"))
        .agg(sum(d38(col("rb"))).as("sb"), sum(d38(col("rd"))).as("sd"))
      val dense = s.range(0, 64).toDF("idx")
        .join(sums, Seq("idx"), "left")
        .localCheckpoint(true) // 64 rows; both tree folds read it
      def leaf(c: String): DataFrame = dense.select(col("idx"),
        md5(coalesce(col(c).cast("string"), lit("empty"))).as("h"))
      treeOf(leaf("sb")).as("a")
        .join(treeOf(leaf("sd")).as("b"),
          col("a.level") === col("b.level") &&
            col("a.idx") === col("b.idx"))
        .filter(col("a.h") =!= col("b.h"))
        .select(col("a.level").as("level"), col("a.idx").as("idx"),
          col("a.h").as("h_base"), col("b.h").as("h_drift"))
    }),

    // Events/product: DAU / trailing-7-day WAU stickiness per day —
    // the engagement-intensity ratio every product dashboard tracks:
    // exact sliding DISTINCT via the (user, day) pair stream fanned
    // ×7 onto its covered window days (q166 solves the same shape
    // with mergeable HLL registers at scale; this is the exact
    // small-window face). One distinct + one ×7 aggregate.
    "q283_dau_wau" -> ((s, dir) => {
      val ud = t(s, dir, "events")
        .select(col("user_id").as("u"), to_date(col("ts")).as("d"))
        .distinct()
      val dau = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      val cover = ud.select(col("u"),
          explode(sequence(lit(0), lit(6))).as("k"), col("d"))
        .select(col("u"), date_add(col("d"), col("k")).as("d"))
        .distinct()
      val wau = cover.groupBy(col("d")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "d")
        .select(col("d"), col("dau"), col("wau"),
          round((col("dau").cast("double") / col("wau").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double")
            .as("stickiness"))
    }),

    // Graph: EDGE EMBEDDEDNESS / weak-tie audit (Granovetter) — per
    // undirected edge, the number of COMMON neighbors (its triangle
    // support): support-0 edges are the weak ties/bridges information
    // actually crosses, dense-support edges sit inside communities.
    // The per-EDGE face of q142's per-node triangle counts — same
    // wedge equi-join kernel, grouped on the edge; distribution out.
    "q279_edge_embeddedness" -> ((s, dir) => {
      val e = docLinkEdges(s, dir)
      val und = e.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")).distinct()
      val adj = und.select(col("u").as("a"), col("v").as("b"))
        .unionByName(und.select(col("v").as("a"), col("u").as("b")))
      val sup = und.as("e")
        .join(adj.as("x"), col("e.u") === col("x.a"))
        .join(adj.as("y"),
          col("e.v") === col("y.a") && col("x.b") === col("y.b"))
        .groupBy(col("e.u").as("u"), col("e.v").as("v"))
        .agg(count(lit(1)).as("support"))
      val full = und.join(sup, Seq("u", "v"), "left")
        .na.fill(0L, Seq("support"))
      val tot = full.agg(count(lit(1)).as("n_und"))
      full.groupBy(col("support")).agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(tot))
        .select(col("support"), col("n_edges"),
          round((col("n_edges").cast("double") /
            col("n_und").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("share"))
    }),

    // Graph: TARGETED-ATTACK ROBUSTNESS — the 3-hop reach of the %97
    // seed set before vs after removing the top-8 degree hubs (edges
    // AND seeds touching a hub drop): the scale-free-network fragility
    // read (Albert-Barabási) — random failures barely dent reach,
    // hub removal craters it. Two runs of the q143 BFS kernel; hubs
    // are an 8-row broadcast anti-join.
    "q280_attack_robustness" -> ((s, dir) => {
      val edges = docLinkEdges(s, dir)
      val deg = edges.select(col("src").as("id"))
        .unionByName(edges.select(col("dst").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("dg"))
      val hubs = deg.orderBy(col("dg").desc, col("id")).limit(8)
        .select(col("id"))
      val seeds = t(s, dir, "documents")
        .filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("id"))
      val before = Graph.shortestHops(edges, seeds, 3)
        .agg(count(lit(1)).as("reach_before"))
      val e2 = edges
        .join(broadcast(hubs.withColumnRenamed("id", "src")),
          Seq("src"), "left_anti")
        .join(broadcast(hubs.withColumnRenamed("id", "dst")),
          Seq("dst"), "left_anti")
      val s2 = seeds.join(broadcast(hubs), Seq("id"), "left_anti")
      val after = Graph.shortestHops(e2, s2, 3)
        .agg(count(lit(1)).as("reach_after"))
      val nn = deg.agg(count(lit(1)).as("n_nodes"))
      nn.crossJoin(before).crossJoin(after)
        .select(col("n_nodes"), col("reach_before"), col("reach_after"),
          round(((col("reach_before") - col("reach_after"))
            .cast("double") / col("reach_before").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double")
            .as("drop_share"))
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

    // Text/featurize: HASHING-TRICK collision audit — tokens hashed
    // into 256 feature buckets (the feature-hashing featurizer);
    // report the collision structure the trick trades for
    // boundlessness: distinct tokens per bucket, share of colliding
    // buckets, and the OCCURRENCE-mass share landing in colliding
    // buckets (what actually blurs the features). Two aggregates on
    // the (token) and (bucket) domains.
    "q278_feature_hash_audit" -> ((s, dir) => {
      val tokc = t(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .withColumn("b", Sampling.hashBucket(concat(lit("fh"),
          col("tok")), 256))
      val bk = tokc.groupBy(col("b"))
        .agg(count(lit(1)).as("n_toks"), sum(col("c")).as("mass"))
      bk.agg(count(lit(1)).as("n_buckets_used"),
          sum(col("n_toks")).as("vocab"),
          sum(when(col("n_toks") > 1, 1L).otherwise(0L))
            .as("n_colliding"),
          sum(when(col("n_toks") > 1, col("mass")).otherwise(0L))
            .as("mass_colliding"),
          sum(col("mass")).as("mass_total"))
        .select(col("n_buckets_used"), col("vocab"),
          col("n_colliding"),
          round((col("n_colliding").cast("double") /
            col("n_buckets_used").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double")
            .as("bucket_collision_rate"),
          round((col("mass_colliding").cast("double") /
            col("mass_total").cast("double")).cast("decimal(20,10)"),
            4).cast("double").as("mass_collision_share"))
    }),

    // Systems: MERKLE PARTITION TREE over the corpus — 64 hash-bucket
    // leaves (order-free exact integer content sums → md5), parents
    // md5(left || right) up to the root: two replicas compare roots,
    // then walk ONE diverging path to localize the bad bucket in
    // log₂(64) = 6 probes instead of a full diff (q159's single
    // checksum says only THAT they differ). One data-sized bucket
    // aggregate; the tree build is 6 rounds over ≤64 rows.
    "q276_merkle_tree" -> ((s, dir) => {
      def floorDiv(a: Column, b: Column): Column =
        ((a - pmod(a, b)) / b).cast("long")
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val rows = t(s, dir, "documents").select(
        Sampling.hashBucket(concat(lit("mk"),
          col("doc_id").cast("string")), 64).as("bkt"),
        Dedup.hashLong(concat_ws("|", col("doc_id"), col("source"),
          col("lang"), col("n_chars"))).as("rh"))
      val leaves = s.range(0, 64).toDF("idx")
        .join(rows.groupBy(col("bkt").as("idx"))
          .agg(sum(d38(col("rh"))).as("sx")), Seq("idx"), "left")
        .select(col("idx"),
          md5(coalesce(col("sx").cast("string"), lit("empty")))
            .as("h"))
      var out = leaves.select(lit(0).as("level"), col("idx"), col("h"))
      var cur = leaves
      for (lvl <- 1 to 6) {
        cur = cur.groupBy(floorDiv(col("idx"), lit(2L)).as("idx"))
          .agg(md5(concat(min_by(col("h"), col("idx")),
            max_by(col("h"), col("idx")))).as("h"))
        out = out.unionByName(
          cur.select(lit(lvl).as("level"), col("idx"), col("h")))
      }
      out
    }),

    // Stats/preference: BRADLEY-TERRY strength fit — sources duel on
    // 64 hash panels (a beats b on a panel iff its mean doc length
    // wins by exact cross-multiply), two unrolled minorization
    // iterations π' = W/Σ n_ab/(π_a+π_b) from π⁰ = 1 — the pairwise-
    // preference → scalar-strength model behind ranking/reward
    // pipelines, with q135's fixed-iteration determinism discipline:
    // per-term ×1e9 snaps make every denominator an exact integer
    // sum, shares renormalize on ×1e6-snapped strengths. The
    // data-sized stage is one (source, panel) aggregate; everything
    // after lives on the sources×sources duel table.
    "q275_bradley_terry" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val sp = t(s, dir, "documents")
        .select(col("source").as("g"),
          Sampling.hashBucket(col("doc_id"), 64).as("p"),
          col("n_chars").as("v"))
        .groupBy(col("g"), col("p"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val duel = sp.as("x").join(sp.as("y"),
          col("x.p") === col("y.p") && col("x.g") =!= col("y.g"))
        .select(col("x.g").as("a"), col("y.g").as("b"),
          (d38(col("x.sv")) * col("y.n") >
            d38(col("y.sv")) * col("x.n")).as("win"))
      val w = duel.groupBy(col("a"), col("b"))
        .agg(sum(when(col("win"), 1L).otherwise(0L)).as("w"))
      val m = w.as("u").join(w.as("v"),
          col("u.a") === col("v.b") && col("u.b") === col("v.a"))
        .select(col("u.a").as("a"), col("u.b").as("b"),
          col("u.w").as("w_ab"), (col("u.w") + col("v.w")).as("n_ab"))
        .filter(col("n_ab") > 0)
      val wa = m.groupBy(col("a")).agg(sum(col("w_ab")).as("w_tot"))
      def iter(pi: DataFrame): DataFrame = {
        val terms = m
          .join(pi.select(col("g").as("a"), col("pi").as("pa")), "a")
          .join(pi.select(col("g").as("b"), col("pi").as("pb")), "b")
          .select(col("a"),
            round(lit(1e9) * col("n_ab").cast("double") /
              (col("pa") + col("pb"))).cast("long").as("t"))
          .groupBy(col("a")).agg(sum(col("t")).as("den"))
        wa.join(terms, "a")
          .select(col("a").as("g"),
            (col("w_tot").cast("double") * lit(1e9) /
              col("den").cast("double")).as("pi"))
      }
      val pi0 = wa.select(col("a").as("g"), lit(1.0).as("pi"))
      val pi2 = iter(iter(pi0))
      val pm = pi2.select(col("g"),
        round(col("pi").cast("decimal(20,10)") * 1000000).cast("long")
          .as("pm"))
      val tot = pm.agg(sum(col("pm")).as("tot"))
      pm.crossJoin(broadcast(tot))
        .join(wa.select(col("a").as("g"), col("w_tot")), "g")
        .select(col("g").as("source"), col("w_tot"),
          round((col("pm").cast("double") / lit(1e6))
            .cast("decimal(20,10)"), 4).cast("double").as("bt_pi"),
          round((col("pm").cast("double") / col("tot").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("share"))
    }),

    // Text/LM: KNESER-NEY CONTINUATION counts — for each head-of-
    // vocab token, how many DISTINCT left contexts it follows vs its
    // raw frequency: the KN insight ("Francisco" is frequent but
    // follows only "San", so its unigram back-off weight should be
    // tiny) as a corpus diagnostic beside the add-one/back-off LMs
    // (q138/q190). One ordered-bigram distinct + two aggregates;
    // p_raw and p_cont are exact integer ratios snapped 6dp.
    "q273_kn_continuation" -> ((s, dir) => {
      val tk = t(s, dir, "documents")
        .select(Text.tokens(col("text")).as("tk"))
      val bg = tk.select(explode(when(size(col("tk")) < 2,
          array().cast("array<struct<a:string,b:string>>"))
        .otherwise(transform(sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("a"),
            element_at(col("tk"), i + 1).as("b"))))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val dist = bg.distinct()
      val cont = dist.groupBy(col("b").as("token"))
        .agg(count(lit(1)).as("n_contexts"))
      val dd = dist.agg(count(lit(1)).as("d"))
      val uni = tk.select(explode(col("tk")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("c"))
      val nn = uni.agg(sum(col("c")).as("n"))
      uni.join(cont, Seq("token"), "left")
        .na.fill(0L, Seq("n_contexts"))
        .crossJoin(broadcast(dd)).crossJoin(broadcast(nn))
        .select(col("token"), col("c"), col("n_contexts"),
          round((col("c").cast("double") / col("n").cast("double"))
            .cast("decimal(20,10)"), 6).cast("double").as("p_raw"),
          round((col("n_contexts").cast("double") /
            col("d").cast("double")).cast("decimal(20,10)"), 6)
            .cast("double").as("p_cont"))
        .orderBy(col("c").desc, col("token")).limit(50)
    }),

    // Text/IR: PROXIMITY search — the general Boolean-retrieval
    // within-k operator (q141's phrase search demands ADJACENCY):
    // docs where the corpus' two most frequent tokens co-occur
    // within ≤ 3 positions, with the window count and closest gap.
    // Postings prune to the two probe tokens via broadcast semi-join
    // BEFORE any shuffle (the q141 contract), then one (doc) x
    // (doc) equi-join over the pruned streams.
    "q274_proximity_search" -> ((s, dir) => {
      val post = Text.postings(t(s, dir, "documents"), "doc_id",
        col("text"))
      val top2 = post.groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(2)
        .select(col("token"),
          row_number().over(Window
            .partitionBy(Cols.onePartitionKey(col("token")))
            .orderBy(col("n").desc, col("token"))).as("r"))
      val p1 = post.join(broadcast(top2.filter(col("r") === 1)
        .select(col("token"))), "token")
      val p2 = post.join(broadcast(top2.filter(col("r") === 2)
        .select(col("token"))), "token")
      p1.as("x").join(p2.as("y"),
          col("x.id") === col("y.id") &&
            abs(col("x.pos") - col("y.pos")) <= 3)
        .groupBy(col("x.id").as("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          min(abs(col("x.pos") - col("y.pos"))).cast("long")
            .as("min_gap"))
    }),

    // Stats/robust: DETERMINISTIC RANSAC line fit — tokens vs chars
    // per doc with 16 hash-drawn candidate pairs (two md5 argmins per
    // candidate, zero RNG), inliers counted by the PURE INTEGER band
    // test |dy·(x−x1) − dx·(y−y1)| ≤ tol·|dx|, winner by (inliers
    // desc, candidate id). The breakdown-resistant fit beside OLS
    // (q147, pulled by outliers) and Theil-Sen (q182, exact but
    // pair-quadratic): candidate scoring is points×16 through one
    // aggregate — linear, broadcast-only.
    "q270_ransac_fit" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val pts = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").as("x"),
          size(Text.tokens(col("text"))).cast("long").as("y"))
      val cands = pts
        .crossJoin(broadcast(s.range(1, 17).toDF("ci")))
        .groupBy(col("ci"))
        .agg(
          min_by(struct(col("x").as("x1"), col("y").as("y1")),
            Dedup.hashLong(concat(lit("ra"), col("ci").cast("string"),
              lit(":"), col("doc_id").cast("string")))).as("pa"),
          min_by(struct(col("x").as("x2"), col("y").as("y2")),
            Dedup.hashLong(concat(lit("rb"), col("ci").cast("string"),
              lit(":"), col("doc_id").cast("string")))).as("pb"))
        .select(col("ci"), col("pa.x1").as("x1"), col("pa.y1").as("y1"),
          (col("pb.x2") - col("pa.x1")).as("dx"),
          (col("pb.y2") - col("pa.y1")).as("dy"))
        .filter(col("dx") =!= 0)
      val scored = pts.crossJoin(broadcast(cands))
        .filter(abs(d38(col("dy")) * (col("x") - col("x1")) -
          d38(col("dx")) * (col("y") - col("y1"))) <=
          d38(lit(5L)) * abs(col("dx")))
        .groupBy(col("ci"), col("dx"), col("dy"))
        .agg(count(lit(1)).as("n_inliers"))
      val nTot = pts.agg(count(lit(1)).as("n_points"))
      scored.crossJoin(broadcast(nTot))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(Cols.onePartitionKey(col("ci")))
            .orderBy(col("n_inliers").desc, col("ci"))))
        .filter(col("rn") === 1)
        .select(col("ci").cast("long").as("cand_id"), col("n_inliers"),
          col("n_points"),
          round((col("dy").cast("double") / col("dx").cast("double")
            * 1e6).cast("decimal(20,10)"), 0).cast("long")
            .as("slope_micro"),
          round((col("n_inliers").cast("double") /
            col("n_points").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("inlier_share"))
    }),

    // Stats/eval: K-FOLD CROSS-VALIDATION of the hour-rate predictor
    // (q260's model under the proper protocol) — 4 hash folds, each
    // scored by the model fit on the OTHER three. The complement
    // trick makes it ONE pass: per-(fold, hour) counts roll up to
    // hour totals, and fold f's training stats are totals MINUS fold
    // f — no per-fold rescan. Per-(fold, hour) Brier cells in exact
    // DECIMAL(38,0), ×1e9 term snaps (q260's convention), 4-row
    // fold table out.
    "q271_kfold_cv" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val fh = t(s, dir, "events")
        .select(hour(col("ts")).as("h"),
          (col("event_type") === "purchase").cast("long").as("y"),
          Sampling.hashBucket(col("event_id"), 4).as("f"))
        .groupBy(col("f"), col("h"))
        .agg(count(lit(1)).as("n_fh"), sum(col("y")).as("pos_fh"))
      val hh = fh.groupBy(col("h"))
        .agg(sum(col("n_fh")).as("n_h"), sum(col("pos_fh")).as("pos_h"))
      val j = fh.join(hh, "h").filter(col("n_h") > col("n_fh"))
        .withColumn("p",
          round(((col("pos_h") - col("pos_fh")).cast("double") /
            (col("n_h") - col("n_fh")).cast("double") * 1e6)
            .cast("decimal(20,10)")).cast("long"))
        .withColumn("bs", d38(col("n_fh")) * col("p") * col("p")
          - d38(lit(2L)) * col("p") * lit(1000000L) * col("pos_fh")
          + d38(lit(1000000L)) * lit(1000000L) * col("pos_fh"))
      val nf = j.groupBy(col("f")).agg(sum(col("n_fh")).as("n_f"))
      j.join(nf, "f")
        .select(col("f"), col("n_f"),
          round(col("bs").cast("double") / col("n_f").cast("double")
            / lit(1e12) * lit(1e9)).cast("long").as("tb"))
        .groupBy(col("f").as("fold"), col("n_f").as("n_scored"))
        .agg(round((sum(col("tb")).cast("double") / lit(1e9))
          .cast("decimal(20,10)"), 6).cast("double").as("brier"))
    }),

    // Stats/causal: DIFF-IN-DIFFERENCES — the 2×2 (treat × post)
    // panel estimate (ȳ₁₁−ȳ₁₀)−(ȳ₀₁−ȳ₀₀) over value cents, hash
    // cohort × calendar split: the causal-read companion to q171's
    // raw A/B z (DiD nets out both the cohort baseline and the
    // secular time trend). One 4-cell aggregate; means are exact
    // integer ratios, the estimate one snapped double expression.
    "q272_diff_in_diff" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        (col("user_id") % 2 === 0).as("tr"),
        (dayofmonth(col("ts")) >= 16).as("po"),
        round(col("value") * 100).cast("long").as("vc"))
      def cell(t0: Boolean, p0: Boolean, c: Column): Column =
        sum(when(col("tr") === t0 && col("po") === p0, c))
      val m = (s0: Column, n0: Column) =>
        s0.cast("double") / n0.cast("double")
      ev.agg(
          cell(true, true, lit(1L)).as("n11"),
          cell(true, true, col("vc")).as("s11"),
          cell(true, false, lit(1L)).as("n10"),
          cell(true, false, col("vc")).as("s10"),
          cell(false, true, lit(1L)).as("n01"),
          cell(false, true, col("vc")).as("s01"),
          cell(false, false, lit(1L)).as("n00"),
          cell(false, false, col("vc")).as("s00"))
        .select(col("n11"), col("n10"), col("n01"), col("n00"),
          round((m(col("s11"), col("n11")) / 100.0)
            .cast("decimal(20,10)"), 4).cast("double").as("mean_tp"),
          round((m(col("s10"), col("n10")) / 100.0)
            .cast("decimal(20,10)"), 4).cast("double").as("mean_tb"),
          round((m(col("s01"), col("n01")) / 100.0)
            .cast("decimal(20,10)"), 4).cast("double").as("mean_cp"),
          round((m(col("s00"), col("n00")) / 100.0)
            .cast("decimal(20,10)"), 4).cast("double").as("mean_cb"),
          round(((m(col("s11"), col("n11")) - m(col("s10"), col("n10"))
            - (m(col("s01"), col("n01")) - m(col("s00"), col("n00"))))
            / 100.0).cast("decimal(20,10)"), 4).cast("double")
            .as("did"))
    }),

    // Series/quality: SEASONALITY-ADJUSTED anomaly days — daily event
    // volume vs its weekday's mean, flagged when the residual exceeds
    // 2σ of that weekday (a Monday is judged against Mondays; raw
    // thresholds would flag every weekend). The flag is the PURE
    // INTEGER inequality (c·n − S)² > 4·(n·ΣC² − S²) — resid and σ
    // never materialize as floats, so the verdict is exact on any
    // engine. One day aggregate + a 7-row broadcast.
    "q269_seasonal_anomaly" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
        .withColumn("dow", dayofweek(col("d")))
      val g = daily.groupBy(col("dow"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
          sum(d38(col("c")) * col("c")).as("m2"))
      daily.join(broadcast(g), "dow")
        .select(col("d"), col("dow"), col("c").as("n_events"),
          round((col("sc").cast("double") / col("n").cast("double"))
            .cast("decimal(20,10)"), 2).cast("double").as("expected"),
          ((d38(col("c")) * col("n") - col("sc")) *
            (d38(col("c")) * col("n") - col("sc")) >
            (d38(col("n")) * col("m2") - d38(col("sc")) * col("sc"))
              * 4).as("is_anomaly"))
    }),

    // ER: JARO-WINKLER name resolution — the prefix-boosted,
    // transposition-tolerant score record linkage prefers for NAMES
    // (Levenshtein over-penalizes swapped syllables, under-rewards
    // shared prefixes; q85 thresholds a distance, this RANKS in
    // [0, 1]). A native codegen'd Catalyst expression pinned to
    // DuckDB's jaro_winkler_similarity semantics (integer
    // transposition floor, > 0.7 boost gate); first-char + ±2 length
    // blocking keeps the verify join equi-shaped, ×1e6 micro snap,
    // ≥ 0.9 gate, best match by (score desc, ref asc).
    "q267_jaro_winkler" -> ((s, dir) => {
      val parts = t(s, dir, "part").select(col("p_partkey"),
        col("p_name"))
      val len = length(col("p_name"))
      val k = (col("p_partkey") % len).cast("int")
      // probes are the INCREMENT slice (every 10th part) — the ER
      // deployment shape: resolve new arrivals against the full
      // reference, not the corpus against itself (TPC-H color-word
      // names are so mutually similar that an all-vs-all jw >= 0.9
      // join yields ~7M pairs at sf0.1 — real work, wrong question)
      val probes = parts.filter(col("p_partkey") % 10 === 0)
        .select(
          (col("p_partkey") + 2000000000).as("probe_id"),
          concat(col("p_name").substr(lit(1), k),
            col("p_name").substr(k + 2, len)).as("pn"))
        .withColumn("sg", graft.functions.NativeFunctions
          .fuzzySig(col("pn")))
      val refs = parts.withColumn("sgr",
        graft.functions.NativeFunctions.fuzzySig(col("p_name")))
      // SOUND sig prefilter for the jw >= 0.9 gate: jw >= 0.9 forces
      // jaro >= 5/6 (the boost adds at most 0.4·(1−jaro)), hence
      // matches m >= 3·la·lb/(2(la+lb)) and multiset-character L1
      // <= la + lb − 2m =: X; the clamped signature L1 only shrinks
      // (sig_bound = ceil(L1c/2)), so 2·sig_bound − 1 <= L1c <= L1
      // <= X on every true positive — the filter is recall-complete
      // and kills the overwhelming share of blocked candidates before
      // the O(len·win) verifier runs (35 s → ~3 s at sf0.1).
      val la = length(col("pn"))
      val lbn = length(col("p_name"))
      val ceilM = {
        val tq = la * lbn * 3
        val bq = (la + lbn) * 2
        val tb = tq + bq - 1
        ((tb - pmod(tb, bq)) / bq).cast("int")
      }
      // EQUI-join on (first char, exact ref length) with the probe
      // exploded over its ±2 length band — the fuzzyJoin block shape:
      // a bare first-char key leaves ~26 giant blocks (one straggler
      // task per letter, measured 32 s); (char, length) keys spread
      // the same pair set across ~10³ balanced partitions.
      // spread first: the part scan is one small file → one input
      // partition, and a broadcast join would run the whole 41M-pair
      // verify in a single task (measured 28 s; 3.4 s spread)
      val probeX = probes
        .repartition(s.sessionState.conf.numShufflePartitions)
        .withColumn("bl",
          explode(sequence(length(col("pn")) - 2,
            length(col("pn")) + 2)))
      val cand = probeX.join(refs,
          substring(col("pn"), 1, 1) === substring(col("p_name"), 1, 1)
            && col("bl") === lbn
            && graft.functions.NativeFunctions
              .sigBound(col("sg"), col("sgr")) * 2 - 1 <=
              la + lbn - ceilM * 2)
        .withColumn("jw",
          round(graft.functions.NativeFunctions
            .jaroWinkler(col("pn"), col("p_name"))
            .cast("decimal(20,10)") * 1000000).cast("long"))
        .filter(col("jw") >= 900000)
      probes.select(col("probe_id"))
        .join(cand.groupBy(col("probe_id"))
          .agg(count(lit(1)).as("n_cand"),
            min(struct((lit(1000000L) - col("jw")).as("nj"),
              col("p_partkey").cast("long").as("r"))).as("bk")),
          Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(lit(1000000L) - col("bk.nj"), lit(-1L))
            .as("best_jw_micro"),
          coalesce(col("bk.r"), lit(-1L)).as("best_ref"))
    }),

    // Events/mining: SEQUENTIAL PATTERN support (PrefixSpan-lite) —
    // user support of every gap-allowed ORDERED pattern a>b and
    // a>b>c over event-type sequences (q146's trigrams demand
    // contiguity; funnels demand fixed steps — this is the general
    // subsequence mine). The order-theoretic trick keeps it linear:
    // a>b holds iff first(a) < last(b), and a>b>c iff SOME b
    // occurrence sits strictly between first(a) and last(c) — so
    // pairs need only the per-(user, type) extremes table (≤|Σ| rows
    // per user) and triples one alphabet-bounded ×|Σ|² fan of the
    // event stream. One user-key window exchange feeds everything.
    "q266_sequence_patterns" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val pos = t(s, dir, "events")
        .select(col("user_id").as("u"), col("event_type").as("ty"),
          col("ts"), col("event_id"))
        .withColumn("pos", row_number().over(
          W.partitionBy("u").orderBy(col("ts"), col("event_id"))))
      val ext = pos.groupBy(col("u"), col("ty"))
        .agg(min(col("pos")).as("fp"), max(col("pos")).as("lp"))
      val nn = ext.select(col("u")).distinct()
        .agg(count(lit(1)).as("n"))
      val pairs = ext.as("a").join(ext.as("b"),
          col("a.u") === col("b.u") && col("a.fp") < col("b.lp"))
        .groupBy(concat(col("a.ty"), lit(">"), col("b.ty")).as("pattern"))
        .agg(count(lit(1)).as("n_users"))
      val triples = pos.select(col("u"), col("ty").as("bt"), col("pos"))
        .join(ext.select(col("u"), col("ty").as("at"), col("fp")), "u")
        .join(ext.select(col("u"), col("ty").as("ct"), col("lp")), "u")
        .filter(col("pos") > col("fp") && col("pos") < col("lp"))
        .select(col("u"), col("at"), col("bt"), col("ct")).distinct()
        .groupBy(concat(col("at"), lit(">"), col("bt"), lit(">"),
          col("ct")).as("pattern"))
        .agg(count(lit(1)).as("n_users"))
      pairs.unionByName(triples).crossJoin(broadcast(nn))
        .select(col("pattern"), col("n_users"),
          round((col("n_users").cast("double") / col("n").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("support"))
    }),

    // Stats: MANN–WHITNEY U, each source's doc-length distribution vs
    // the rest of the pool — the nonparametric location-shift screen
    // beside the KS shape test. Exact tie-corrected midrank algebra on
    // the distinct length domain (two-level prefix kernel, one
    // (source, length) hash aggregate — never the n² pairs U is
    // defined over); z and the rank-biserial effect size snap from
    // exact DECIMAL(38,0) integers through one division + sqrt.
    "q244_mann_whitney" -> ((s, dir) =>
      Profile.mannWhitneyVsRest(t(s, dir, "documents"),
          col("source"), col("n_chars"))
        .withColumnRenamed("g", "source")),

    // Sampling/curation: CURRICULUM INTERLEAVE — a global training
    // order where consecutive positions round-robin across the three
    // length tiers (every mini-batch sees every tier), shuffled
    // within tier by hash: order = in-tier-rank·3 + tier. The in-tier
    // rank rides the GROUPED two-level prefix kernel on the hash
    // domain — no global sort and no data-sized window partition
    // anywhere; the final cut is a TakeOrdered head. The "stream
    // diverse batches without a shuffle pass per epoch" primitive.
    "q243_curriculum_interleave" -> ((s, dir) => {
      val rated = t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("n_chars") < 250, 0L).when(col("n_chars") < 400, 1L)
            .otherwise(2L).as("tier"),
          Dedup.hashLong(concat(lit("c"),
            col("doc_id").cast("string"))).as("h"))
      val byV = rated.groupBy(col("tier"), col("h"))
        .agg(count(lit(1)).as("cnt"))
      val rk = Ranks.withRunningBelowBy(byV, "tier", "h",
        1000000000000000L, Seq("cnt"))
      rated.join(rk, Seq("tier", "h"))
        .withColumn("rwithin", row_number().over(
          Window.partitionBy(col("tier"), col("h"))
            .orderBy(col("doc_id"))))
        .select(((col("cnt_below") + col("rwithin") - 1) * 3 +
          col("tier")).as("order_idx"), col("doc_id"), col("tier"))
        .orderBy(col("order_idx")).limit(30)
    }),

    // Systems/placement: CONSISTENT-HASHING ring audit — route every
    // doc to 8 workers (32 vnodes each), then add a 9th and measure
    // who moved: per worker its load share and the share of its keys
    // that LEFT when w8 joined — the ≈1/9 stability property that
    // justifies consistent hashing over mod-n for shard/cache
    // placement. Ring tables broadcast; keys never meet keys.
    "q242_consistent_hash" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val w8 = (0 until 8).map(i => s"w$i")
      val o8 = Skew.consistentHashOwners(docs, col("doc_id"), w8, 32)
        .withColumnRenamed("owner", "o8")
      val o9 = Skew.consistentHashOwners(docs, col("doc_id"),
          w8 :+ "w8", 32)
        .withColumnRenamed("owner", "o9")
      val n = docs.agg(count(lit(1)).as("n_total"))
      def snap4(num: Column, den: Column): Column =
        round((num.cast("double") / den.cast("double"))
          .cast("decimal(20,10)"), 4).cast("double")
      o8.join(o9, "k")
        .groupBy(col("o8").as("worker"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("o8") =!= col("o9"), 1L).otherwise(0L))
            .as("n_moved_out"))
        .crossJoin(broadcast(n))
        .select(col("worker"), col("n_docs"),
          snap4(col("n_docs"), col("n_total")).as("share"),
          col("n_moved_out"),
          snap4(col("n_moved_out"), col("n_docs")).as("moved_share"))
    }),

    // Text/stats: GOOD–TURING unseen-mass estimate per source — the
    // missing-species read Heaps' fit (q220) approaches from growth:
    // P(next unit is NEW) ≈ n₁/N from the singleton count, plus the
    // discounted r*(1) = 2·n₂/n₁ that a smoothed LM would assign
    // singletons. Units are word 3-gram OCCURRENCES (positional, not
    // per-doc-distinct — GT is an occurrence-count statistic; the
    // 31-token synthetic vocabulary has no singletons). Two hash
    // aggregates: unit counts, then count-of-counts; exact integer
    // ratios snapped 4dp.
    "q241_good_turing" -> ((s, dir) => {
      val grams = Cols.bound(Text.tokens(col("text"))) { tk =>
        when(size(tk) < 3, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(tk) - 2),
            i => concat_ws(" ", element_at(tk, i),
              element_at(tk, i + 1), element_at(tk, i + 2))))
      }
      val units = t(s, dir, "documents")
        .select(col("source"), explode(grams).as("u"))
      val vf = units.groupBy(col("source"), col("u"))
        .agg(count(lit(1)).as("r"))
      def snap4(num: Column, den: Column): Column =
        round((num.cast("double") / den.cast("double"))
          .cast("decimal(20,10)"), 4).cast("double")
      vf.groupBy(col("source"))
        .agg(sum(col("r")).as("n_units"),
          count(lit(1)).as("vocab"),
          sum(when(col("r") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("r") === 2, 1L).otherwise(0L)).as("n2"))
        .select(col("source"), col("n_units"), col("vocab"),
          col("n1"), col("n2"),
          snap4(col("n1"), col("n_units")).as("p_unseen"),
          when(col("n1") === 0, lit(null))
            .otherwise(snap4(col("n2") * 2, col("n1")))
            .as("r_star_1"))
    }),

    // Text/dedup: WINNOWING SPAN ALIGNMENT — q221 finds WHICH pairs
    // overlap; this finds WHERE: matched fingerprint positions vote
    // on the positional offset pos_a − pos_b, and the modal offset
    // with its support is the alignment a span-level dedup/quote
    // detector acts on (a high aligned_share means one contiguous
    // lifted span, a flat vote means scattered boilerplate). Same
    // df ≤ 16 guard; only the top-10 pairs (≥ 3 shared) align.
    "q240_winnow_align" -> ((s, dir) => {
      val fps = Text.winnowingFingerprints(t(s, dir, "documents"),
        col("doc_id"), col("text"), 4, 4)
      val fph = fps.select(col("id"), col("h")).distinct()
      val hOk = fph.groupBy(col("h")).agg(count(lit(1)).as("dfh"))
        .filter(col("dfh") <= 16).select(col("h"))
      val kept = fph.join(hOk, "h")
      val pairs = kept.as("a")
        .join(kept.as("b"), col("a.h") === col("b.h") &&
          col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
        .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
        .limit(10)
      val fpsOk = fps.join(hOk, "h")
      val votes = broadcast(pairs)
        .join(fpsOk.as("x"), col("x.id") === col("doc_a"))
        .join(fpsOk.as("y"), col("y.id") === col("doc_b") &&
          col("x.h") === col("y.h"))
        .groupBy(col("doc_a"), col("doc_b"), col("n_shared"),
          (col("x.fpos") - col("y.fpos")).as("d"))
        .agg(count(lit(1)).as("nv"))
      votes
        .withColumn("n_matches", sum(col("nv")).over(
          Window.partitionBy(col("doc_a"), col("doc_b"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_a"), col("doc_b"))
            .orderBy(col("nv").desc, col("d"))))
        .filter(col("rn") === 1)
        .select(col("doc_a"), col("doc_b"), col("n_shared"),
          col("n_matches"), col("d").as("offset_mode"),
          col("nv").as("offset_support"),
          round((col("nv").cast("double") /
            col("n_matches").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("aligned_share"))
    }),

    // Sampling/curation: GREEDY SET COVER — which 3 sources together
    // buy the most 3-shingle vocabulary? The classic 1−1/e
    // maximum-coverage greedy, driver-coordinated over 3 single-row
    // argmax rounds (anti-join against the covered set each round);
    // the answer to "we can only license/ingest k sources — which".
    "q239_set_cover" -> ((s, dir) =>
      Sampling.greedySetCover(t(s, dir, "documents"), col("source"),
          Text.wordShingles(Text.tokens(col("text")), 3), 3)
        .withColumnRenamed("grp", "source")),

    // Similarity/IR-eval: RANK-BIASED OVERLAP (Webber et al. 2010)
    // between the nprobe=2 IVF ranking and exact L2 truth at k=10 —
    // recall@k (q125) counts set hits; RBO weights agreement
    // top-heavily (p=0.9), the right read when only the first
    // results matter. The geometric weights are an exact integer
    // recurrence w_d = round(0.9·w_{d−1}) in micro-units and each
    // match contributes the PRECOMPUTED Σ_{d≥max(ra,rb)} w_d/d
    // constant — no cross-engine pow() drift, one equi-join on
    // (query, neighbor).
    "q238_rbo" -> ((s, dir) => {
      val k = 10
      val cfp = rboCfp(k)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val c1 = Similarity.kmeansTrainL2(e, c0, 1)
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      val truth = Similarity.bruteForceTopKL2(qs, e, k)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").as("rb"))
      val approx = Similarity.ivfSearchL2(qs, e, c1, k, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").as("ra"))
      val contrib = truth.join(approx, Seq("query_id", "neighbor_id"))
        .select(col("query_id"),
          element_at(array(cfp.map(lit(_)): _*),
            greatest(col("ra"), col("rb")).cast("int")).as("cfp"))
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_common"), sum(col("cfp")).as("rbofp"))
      qs.select(col("id").as("query_id"))
        .join(contrib, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          round((coalesce(col("rbofp"), lit(0L)).cast("double") /
            lit(1e7)).cast("decimal(20,10)"), 4).cast("double")
            .as("rbo"))
    }),

    // Events/eval: HELD-OUT next-event prediction — the full
    // train/fit/eval protocol natively: users hash-split 3:1, the
    // train side fits the majority-next-state Markov table (q132's
    // transition kernel), the held-out side scores it. Per state:
    // weighted accuracy of the argmax rule; states unseen in
    // training stay null — the coverage-vs-accuracy read any
    // sequence-model baseline quotes.
    "q237_markov_eval" -> ((s, dir) => {
      val split = pmod(Dedup.hashLong(
        concat(lit("m"), col("user_id").cast("string"))), lit(4L))
      def trans(df: DataFrame) =
        Events.sessionTransitions(df, col("user_id"), col("ts"),
          col("event_id"), col("event_type"), 1800L)
          .select(col("from_type"), col("to_type"), col("n"))
      val ev = t(s, dir, "events")
      val model = trans(ev.filter(split =!= 0))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("from_type"))
            .orderBy(col("n").desc, col("to_type"))))
        .filter(col("rn") === 1)
        .select(col("from_type"), col("to_type").as("pred"))
      trans(ev.filter(split === 0))
        .join(model, Seq("from_type"), "left")
        .groupBy(col("from_type"))
        .agg(max(col("pred")).as("pred"),
          sum(col("n")).as("n_test"),
          sum(when(col("to_type") === col("pred"), col("n"))
            .otherwise(0L)).as("n_correct"))
        .select(col("from_type"), col("pred"), col("n_test"),
          col("n_correct"),
          when(col("pred").isNull, lit(null)).otherwise(
            round((col("n_correct").cast("double") /
              col("n_test").cast("double")).cast("decimal(20,10)"), 4)
              .cast("double")).as("accuracy"))
    }),

    // Sampling: NEYMAN-ALLOCATED stratified sample of event values by
    // type — the design-optimal n_h ∝ N_h·σ_h budget split
    // (proportional allocation wastes budget on low-variance strata),
    // exact largest-remainder rounding on ×1e6 integer micro-shares,
    // then the deterministic per-stratum bottom-alloc md5 draw with
    // its sample-mean receipt.
    "q236_neyman" -> ((s, dir) =>
      Sampling.neymanAllocation(t(s, dir, "events"),
        col("event_type"), round(col("value") * 100).cast("long"),
        col("event_id"), 500)),

    // Graph: GLOBAL TRANSITIVITY + average LOCAL clustering
    // coefficient — q142 counts per-node triangles; this closes them
    // into the two canonical one-number reads: C = 3Δ/wedges
    // (transitivity) and the Watts–Strogatz mean of per-node
    // 2·tri/(deg·(deg−1)) over deg ≥ 2 nodes (×1e9 snaps pre-sum).
    // Wedge mass is a degree aggregate — no extra join beyond the
    // triangle kernel.
    "q235_transitivity" -> ((s, dir) => {
      val ue = docLinkEdges(s, dir).filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct()
      val deg = ue.select(col("u").as("id"))
        .unionByName(ue.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val nd = deg.join(Graph.triangleCounts(docLinkEdges(s, dir)),
          Seq("id"), "left")
        .na.fill(0L, Seq("n_triangles"))
      val ag = nd.agg(count(lit(1)).as("n_nodes"),
        sum(col("n_triangles")).as("s3"),
        sum(col("deg") * (col("deg") - 1)).as("w2"))
      val ne = ue.agg(count(lit(1)).as("n_edges"))
      val lc = nd.filter(col("deg") >= 2)
        .select(round(col("n_triangles").cast("double") * lit(2e9) /
          (col("deg") * (col("deg") - 1)).cast("double")).cast("long")
          .as("cfp"))
        .agg(count(lit(1)).as("n2"), sum(col("cfp")).as("scfp"))
      def m6(c: Column): Column =
        round(c.cast("decimal(20,10)"), 6).cast("double")
      ag.crossJoin(broadcast(ne)).crossJoin(broadcast(lc))
        .select(col("n_nodes"), col("n_edges"),
          ((col("s3") - pmod(col("s3"), lit(3L))).cast("double") / 3)
            .cast("long").as("n_triangles"),
          ((col("w2") - pmod(col("w2"), lit(2L))).cast("double") / 2)
            .cast("long").as("n_wedges"),
          when(col("w2") === 0, lit(null)).otherwise(
            m6((col("s3") * 2).cast("double") /
              col("w2").cast("double"))).as("transitivity"),
          when(col("n2") === 0, lit(null)).otherwise(
            m6(col("scfp").cast("double") /
              (col("n2").cast("double") * lit(1e9)))).as("avg_local"))
    }),

    // Text/eval: CLASSIFICATION REPORT for the language-ID heuristic
    // vs the declared lang — q25 gives the raw confusion counts; this
    // derives the per-class report over the UNION of truth/predicted
    // classes (full-outer margins: 'zh' is never predicted → null
    // precision; 'und' has no truth support → null recall). F1 uses
    // the exact identity 2·TP/(pred+support) — never composed from
    // two already-rounded ratios.
    "q234_langid_report" -> ((s, dir) => {
      val rows = t(s, dir, "documents")
        .filter(size(Text.tokens(col("text"))) > 0)
        .select(col("lang").as("truth"),
          Text.langId(col("text")).as("pred"))
      val cells = rows.groupBy(col("truth"), col("pred"))
        .agg(count(lit(1)).as("o"))
      val sup = cells.groupBy(col("truth").as("cls"))
        .agg(sum(col("o")).as("support"))
      val prd = cells.groupBy(col("pred").as("cls"))
        .agg(sum(col("o")).as("predicted"))
      val diag = cells.filter(col("truth") === col("pred"))
        .select(col("truth").as("cls"), col("o").as("tp"))
      def snap4(num: Column, den: Column): Column =
        round((num.cast("double") / den.cast("double"))
          .cast("decimal(20,10)"), 4).cast("double")
      sup.join(prd, Seq("cls"), "full_outer")
        .join(diag, Seq("cls"), "left")
        .na.fill(0L, Seq("support", "predicted", "tp"))
        .select(col("cls"), col("support"), col("predicted"), col("tp"),
          when(col("predicted") === 0, lit(null))
            .otherwise(snap4(col("tp"), col("predicted"))).as("precision"),
          when(col("support") === 0, lit(null))
            .otherwise(snap4(col("tp"), col("support"))).as("recall"),
          snap4(col("tp") * 2, col("predicted") + col("support"))
            .as("f1"))
    }),

    // Stats/eval: DECILE LIFT table — event value as a purchase
    // score: what do the top-d deciles actually capture vs the base
    // rate? AUC (q182) summarizes the ranking; this is the acting
    // read. Distinct scores rank on the two-level prefix kernel,
    // tied scores take their worst decile (can't split — order-
    // invariant), the cumulative walk runs on the 10-row tile table.
    "q233_decile_lift" -> ((s, dir) =>
      Profile.decileLift(t(s, dir, "events"),
        round(col("value") * 100).cast("long"),
        col("event_type") === "purchase", 10, 1024L)),

    // Events: BURSTINESS of inter-event times per user (Goh–Barabási
    // B = (σ−μ)/(σ+μ)): −1 = metronome, 0 = Poisson, →1 = heavy
    // bursts — the temporal signature separating scripted/bot traffic
    // from organic sessions. Gaps are exact integer µs off ONE
    // user-key window; n cancels, so B = (√(nΣg²−(Σg)²) − Σg) /
    // (√(nΣg²−(Σg)²) + Σg) on exact DECIMAL moments with one sqrt.
    // Users need ≥ 4 gaps; an all-zero-gap user is null (declared).
    "q231_burstiness" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val um = unix_micros(col("ts"))
      val gaps = t(s, dir, "events")
        .select(col("user_id"), (um - lag(um, 1).over(w)).as("g"))
        .filter(col("g").isNotNull)
      val r = sqrt((d38(col("n_gaps")) * col("sxx") -
        col("sx") * col("sx")).cast("double"))
      gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"), sum(d38(col("g"))).as("sx"),
          sum(d38(col("g")) * col("g")).as("sxx"))
        .filter(col("n_gaps") >= 4)
        .select(col("user_id"), col("n_gaps"),
          when(r + col("sx").cast("double") === 0.0, lit(null))
            .otherwise(round(((r - col("sx").cast("double")) /
              (r + col("sx").cast("double"))).cast("decimal(20,10)"), 4)
              .cast("double")).as("b"))
    }),

    // Events: TRANSITION ENTROPY per state — how predictable is the
    // next action given the current one? H(next|cur) per from-state
    // over the session transition counts (q132's kernel reused, same
    // one user-key shuffle); ×1e9 ln snaps pre-sum. States with
    // entropy near ln(|types|) are noise, near-0 states are script
    // steps — the sequence-mining read behind curriculum/session
    // filtering.
    "q230_transition_entropy" -> ((s, dir) => {
      val tr = Events.sessionTransitions(t(s, dir, "events"),
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        1800L)
      val nf = tr.groupBy(col("from_type"))
        .agg(sum(col("n")).as("n_out"), count(lit(1)).as("n_next"))
      tr.join(nf, "from_type")
        .select(col("from_type"), col("n_out"), col("n_next"),
          round(col("n").cast("double") / col("n_out").cast("double") *
            log(col("n").cast("double") / col("n_out").cast("double")) *
            lit(1e9)).cast("long").as("tfp"))
        .groupBy(col("from_type"), col("n_out"), col("n_next"))
        .agg((-sum(col("tfp"))).as("efp"))
        .select(col("from_type"), col("n_out"), col("n_next"),
          round((col("efp").cast("double") / lit(1e9))
            .cast("decimal(20,10)"), 6).cast("double").as("entropy"))
    }),

    // Stats/ML: optimal DECISION-STUMP split — which event value
    // threshold best separates purchases from everything else, by
    // Gini impurity reduction over EVERY distinct cent value as a
    // candidate. Both running label counts ride one two-level prefix
    // pass; the argmax is a TakeOrdered head. The supervised
    // counterpart of q222's unsupervised change-point.
    "q229_gini_stump" -> ((s, dir) =>
      Profile.giniSplitStump(t(s, dir, "events"),
        round(col("value") * 100).cast("long"),
        col("event_type") === "purchase", 1024L)),

    // Stats: deterministic BLOCK BOOTSTRAP percentile CI for the mean
    // event value — users hash into 50 blocks (within-user dependence
    // stays intact), 200 replicates redraw blocks with replacement
    // via hashed (replicate, draw) selection — no RNG state, same
    // answer on any engine/partitioning. One data-sized aggregate;
    // everything after is bounded by reps×m. The jackknife (q170)
    // gives the SE; this gives the full resampling distribution's
    // exact 2.5/97.5 order statistics.
    "q227_block_bootstrap" -> ((s, dir) =>
      Profile.blockBootstrapMean(t(s, dir, "events"),
        col("user_id"), round(col("value") * 100).cast("long"),
        50, 200)),

    // Stats/curation: COHEN'S KAPPA between two quality gates — does
    // the cheap length tier agree with the lexical-diversity tier
    // beyond chance? Both raters are pure column expressions (length
    // <250/<400 vs type-token-ratio ×1000 <400/<550, exact
    // subtract-mod floor-div); κ's integer algebra runs on the
    // observed 3×3 cell grid. The audit a pipeline runs before
    // swapping one labeling heuristic for another.
    "q226_kappa" -> ((s, dir) => {
      val tk = Text.tokens(col("text"))
      val d = size(array_distinct(tk)).cast("long") * 1000L
      val tot = size(tk).cast("long")
      val rfp = when(tot === 0L, 0L)
        .otherwise(((d - pmod(d, tot)) / tot).cast("long"))
      val rated = t(s, dir, "documents").select(
        when(col("n_chars") < 250, 0L).when(col("n_chars") < 400, 1L)
          .otherwise(2L).as("len_tier"),
        when(rfp < 400L, 0L).when(rfp < 550L, 1L).otherwise(2L)
          .as("ttr_tier"))
      Profile.cohenKappa(rated, col("len_tier"), col("ttr_tier"))
    }),

    // Stats/curation: QUANTILE NORMALIZATION of doc lengths across
    // sources — every source's length distribution maps onto the
    // pooled reference through a 100-bin quantile grid, the
    // cross-source score-calibration step before any global quality
    // threshold. Ranks ride the grouped/ungrouped two-level prefix
    // kernels; only the 100-row grid ever broadcasts. Report: per
    // source the row count, mean before/after, how many rows moved,
    // and the normalized range.
    "q223_quantile_norm" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      def m4(num: Column, den: Column): Column =
        round((num.cast("double") / den.cast("double"))
          .cast("decimal(20,10)"), 4).cast("double")
      Profile.quantileNormalize(t(s, dir, "documents"),
          col("source"), col("n_chars"), 100, 64L)
        .groupBy(col("g"))
        .agg(sum(col("cnt")).as("n"),
          sum(d38(col("v")) * col("cnt")).as("sb"),
          sum(d38(col("v_norm")) * col("cnt")).as("sa"),
          sum(when(col("v") =!= col("v_norm"), col("cnt"))
            .otherwise(0L)).as("n_changed"),
          min(col("v_norm")).as("norm_min"),
          max(col("v_norm")).as("norm_max"))
        .select(col("g").as("source"), col("n"),
          m4(col("sb"), col("n")).as("mean_before"),
          m4(col("sa"), col("n")).as("mean_after"),
          col("n_changed"), col("norm_min"), col("norm_max"))
    }),

    // Stats/series: single CHANGE-POINT localization per order
    // priority — daily revenue pre-collapses to the bounded (grp, day)
    // grid (the q196 contract), then ONE prefix-sum window scores
    // every split's between-segment SSE reduction and the argmax
    // names the day the regime changed. CUSUM (q80) screens "did it
    // drift"; this answers "WHERE did it break" — the localization
    // read a 100 TB ingest-quality monitor runs after the screen
    // fires.
    "q222_changepoint" -> ((s, dir) =>
      Profile.changePointSSE(
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("grp"),
            col("o_orderdate").cast("date").as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("vc")),
        col("grp"), col("day"), col("vc"))),

    // Text/ER: BLOCKING-RECALL scorecard — the three blocking families
    // (PassJoin segments = recall-complete truth, first-char
    // equi-blocks, sorted-neighborhood window 8) run over ONE shared
    // distinct name vocabulary; per family the canonical matched-pair
    // count and its recall vs truth. The eval a pipeline runs BEFORE
    // committing a blocking key to a 100 TB ER job — q206's planner
    // read, for the edit-distance family.
    "q211_blocking_recall" -> ((s, dir) => {
      // a deterministic quarter of parts: the scorecard's recall read
      // is population-stable, and the truth family's complete pair
      // set is the expensive leg — sample the vocabulary, not the op
      val parts = t(s, dir, "part")
        .filter(col("p_partkey") % 4 === 0)
        .select(col("p_partkey"), col("p_name"))
      val len = length(col("p_name"))
      val kk = (col("p_partkey") % len).cast("int")
      // all consumers live in ONE plan — ReusedExchange dedups the
      // shared vocabulary/truth subtrees; persist() would block it
      // (the q108/q210 lesson)
      val names = parts.select(col("p_name").as("nm"))
        .unionByName(parts.select(
          concat(col("p_name").substr(lit(1), kk),
            col("p_name").substr(kk + 2, len)).as("nm")))
        .distinct()
      val ids = names.select(col("nm").as("id"), col("nm"))
      def canon(df: DataFrame): DataFrame =
        df.filter(col("probe_id") < col("ref_id"))
          .select(col("probe_id").as("a"), col("ref_id").as("b"))
          .distinct()
      val truth = canon(Text.fuzzyJoinSegments(ids, ids, "id",
        col("nm"), "id", col("nm"), 2))
      val firstChar = canon(Text.fuzzyJoin(ids, ids, "id", col("nm"),
        "id", col("nm"), 2))
      val sn = Text.sortedNeighborhoodPairs(names, col("nm"), 8, 2)
        .select(col("name_a").as("a"), col("name_b").as("b")).distinct()
      def cnt(df: DataFrame, fam: String): DataFrame =
        df.agg(count(lit(1)).as("n_pairs"))
          .select(lit(fam).as("family"), col("n_pairs"))
      val counts = cnt(truth, "segments")
        .unionByName(cnt(firstChar, "first_char"))
        .unionByName(cnt(sn, "sorted_neighborhood"))
      counts.crossJoin(broadcast(
          truth.agg(count(lit(1)).as("n_truth"))))
        .select(col("family"), col("n_pairs"),
          round((col("n_pairs").cast("double") /
            col("n_truth").cast("double")).cast("decimal(20,10)"), 6)
            .cast("double").as("recall"))
    }),

    // Stats: per-source KENDALL τ-b between token count and char
    // length — pairwise order agreement under heavy ties (many docs
    // share a token count), on the distinct (x, y) cell grid, never
    // row pairs. Length enters in 16-char buckets: kendallTauB's work
    // is Σ|cells|², so the CALLER bounds the value domains (the
    // theilSenTrend pre-collapse contract) — raw char length is
    // near-unique per doc and would re-inflate the grid to row pairs.
    "q210_kendall_tau" -> ((s, dir) =>
      Profile.kendallTauB(t(s, dir, "documents"), col("source"),
        Text.tokenCount(col("text")),
        floor(length(col("text")) / lit(16)))
        .withColumnRenamed("g", "source")),

    // Series: per-symbol AUTOCORRELATION at lags 1–3 — the series
    // pre-collapses to one exact-cents row per (symbol, day) (q196's
    // total-order lesson), all three lags ride one ordered window,
    // correlations on exact DECIMAL moments.
    "q204_acf" -> ((s, dir) => {
      val series = bars(s, dir)
        .groupBy(col("symbol"), col("d"))
        .agg(sum(round(col("px") * 100).cast("long")).as("px_c"))
      Resample.acf(series, col("symbol"), col("d"), col("px_c"), 3)
        .select(col("series").as("symbol"), col("lag"), col("n"),
          col("acf"))
    }),

    // Web/PSL: public-suffix-aware registered domains — each host's
    // label-suffixes probe the broadcast PSL via ONE equi-join, the
    // longest match is the public suffix (no match → last-label default
    // = the two-label fallback), rolled up to per-domain doc counts.
    "q198_psl_domains" -> ((s, dir) => {
      import s.implicits._
      val psl = Seq("co.uk", "github.io", "ca.us").toDF("suffix")
      val urls = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("https://"),
          when(col("doc_id") % 4 === 0,
            concat(lit("app-"), col("source"), lit(".github.io")))
            .when(col("doc_id") % 4 === 1,
              concat(lit("www."), col("source"), lit("-ltd.co.uk")))
            .when(col("doc_id") % 4 === 2,
              concat(lit("cdn."), col("source"), lit("-site.net")))
            .otherwise(concat(lit("mail."), col("source"), lit(".ca.us"))),
          lit("/p/"), (col("doc_id") % 7).cast("string")).as("url"))
      Web.registeredDomainsPsl(urls, "doc_id", col("url"), psl)
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"))
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

    // Graph: TIME-RESPECTING earliest arrival — temporal BFS where
    // every hop departs no earlier than the previous arrived; improved
    // nodes only re-expand (frontier economics), merge = min-arrival.
    "q193_temporal_bfs" -> ((s, dir) => {
      val e = docLinkEdges(s, dir)
        .withColumn("ts", (col("src") * 31 + col("dst") * 17) % 1000)
      val seeds = t(s, dir, "documents")
        .filter(col("doc_id") % 97 === 0).select(col("doc_id").as("id"))
      Graph.temporalEarliestArrival(e, seeds, 3)
        .orderBy(col("arrival"), col("id")).limit(25)
        .select(col("id").as("doc_id"), col("arrival"))
    }),

    // Graph: degree ASSORTATIVITY — do hubs link to hubs? Pearson r of
    // endpoint degrees over the symmetrized edge list, on olsTrend's
    // exact moment algebra.
    "q194_assortativity" -> ((s, dir) =>
      Graph.degreeAssortativity(docLinkEdges(s, dir))),

    // Graph: LABEL-PROPAGATION communities over the doc-link graph —
    // two synchronous neighbor-majority sweeps (deterministic LPA:
    // id-seeded labels, min-label tiebreak), reported as the top-20
    // communities by size. Per round one edge equi-join + one (node,
    // label) count — PageRank economics, no transitive closure.
    "q174_label_prop" -> ((s, dir) =>
      Graph.labelPropagation(docLinkEdges(s, dir), 2)
        .groupBy(col("community")).agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("community")).limit(20)),

    // Graph/eval: MODULARITY of the q174 label-propagation communities
    // — did LPA find real structure? Q = Σ_c (e_c/m − (d_c/2m)²) on
    // exact integers: per-community intra-edge counts and degree sums
    // over the canonical distinct undirected edge set, numerator
    // Σ(4m·e_c − d_c²) in DECIMAL, ONE double division by 4m².
    "q219_modularity" -> ((s, dir) => {
      val edges = docLinkEdges(s, dir)
      // persisted: three consumers join the label table on DIFFERENT
      // keys (a, b, id), so no shared exchange exists for
      // ReusedExchange to dedup — without the persist the whole
      // 2-round LPA chain re-runs per consumer (measured 3.4 → 2.9 s).
      // The canonical edge set is NOT persisted: its distinct's
      // exchange IS shared, and persisting it re-measured slower.
      val lab = Graph.labelPropagation(edges, 2).persist()
      val ue = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val e2 = ue
        .join(lab.select(col("id").as("a"), col("community").as("ca")),
          Seq("a"))
        .join(lab.select(col("id").as("b"), col("community").as("cb")),
          Seq("b"))
      val ec = e2.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(count(lit(1)).as("e_c"))
      val dc = ue.select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        .join(lab, Seq("id"))
        .groupBy(col("community").as("c")).agg(sum(col("deg")).as("d_c"))
      val m = ue.agg(count(lit(1)).as("m_edges"))
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      dc.join(ec, Seq("c"), "left")
        .withColumn("e_c", coalesce(col("e_c"), lit(0L)))
        .crossJoin(broadcast(m))
        .select(col("m_edges"),
          (d38(lit(4)) * col("m_edges") * col("e_c") -
            d38(col("d_c")) * col("d_c")).as("num"))
        .groupBy(col("m_edges"))
        .agg(count(lit(1)).as("n_comms"), sum(col("num")).as("s_num"))
        .select(col("m_edges"), col("n_comms"),
          round((col("s_num").cast("double") /
            (d38(lit(4)) * col("m_edges") * col("m_edges"))
              .cast("double")).cast("decimal(20,10)"), 6)
            .cast("double").as("modularity"))
    }),

    // Graph: TWO-HOP reach per node on the doc-link graph, rolled up
    // as a (n_1hop, n_2hop) histogram with an id-sum fingerprint —
    // the friend-of-friend feature at Σdeg² wedge cost.
    "q217_two_hop" -> ((s, dir) =>
      Graph.twoHopNeighborhood(docLinkEdges(s, dir))
        .groupBy(col("n_1hop"), col("n_2hop"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(col("id")).cast("long").as("id_sum"))),

    // Graph: K-CORE (k=6) after 3 synchronous peel rounds — the
    // backbone/fringe split on the doc-link graph; per-round induced
    // degrees via endpoint semi-joins, the fixed-unroll contract of
    // the other iterative graph ops.
    "q216_kcore" -> ((s, dir) =>
      Graph.kCoreRounds(docLinkEdges(s, dir), 6, 3)
        .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"),
          sum(col("id")).cast("long").as("id_sum"))),

    // Text/safety: BLOCKLIST GATE — per-doc occurrence and distinct-term
    // counts against a broadcast-literal blocklist, flag at ≥ 2
    // occurrences: the safety-filtering pass of a training pipeline as
    // one codegen'd scan projection, zero shuffle.
    "q162_blocklist_gate" -> ((s, dir) => {
      val bl = array(lit("the"), lit("of"), lit("and"))
      t(s, dir, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          size(filter(col("tk"), t => array_contains(bl, t)))
            .as("n_occurrences"),
          size(array_intersect(array_distinct(col("tk")), bl))
            .as("n_terms"))
        .withColumn("blocked", col("n_occurrences") >= 2)
    }),

    // Sampling: WATERFILLING token-budget allocation across sources —
    // the corpus-mixture planning step: every source below the water
    // level contributes everything, the rest cap at the level L chosen
    // so the total hits the budget. Closed form on the SORTED m-row
    // source table (prefix sums + the first feasible level), so the
    // only data-sized work is the token aggregate; allocation per
    // source = min(n, L) with one double division for L.
    "q163_waterfill_mix" -> ((s, dir) => {
      val srcs = t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(Text.tokenCount(col("text")).cast("long")).as("n_tok"))
      Sampling.waterfillAllocation(srcs, col("source"), col("n_tok"), 2, 5)
    }),

    // Events: CUMULATIVE UNIQUE USERS per day — running countDistinct
    // without a distinct-in-window: each user reduces to a first-seen
    // day (one hash agg on the user key), days aggregate to new-user
    // counts, and the running sum walks the tiny day-count table. The
    // growth-curve query at any event volume.
    "q160_cumulative_uniques" -> ((s, dir) => {
      val firstSeen = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("d0"))
      val perDay = firstSeen.groupBy(col("d0").as("d"))
        .agg(count(lit(1)).as("new_users"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(Cols.onePartitionKey(col("d"))).orderBy(col("d"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      perDay.withColumn("cum_users", sum(col("new_users")).over(w))
    }),

    // Joins/stats: MARKET-BASKET lift — suppliers co-occurring in an
    // order (the association-rule mining shape): per-order item set
    // self-joins on the order key (work Σ k², k = items/order — never
    // corpus²), pair supports aggregate on the (a, b) key, and lift =
    // n·n_ab/(n_a·n_b) computes on exact integers with one double
    // division. Top-20 by (lift, pair) among pairs with support ≥ 5.
    "q161_basket_lift" -> ((s, dir) => {
      val items = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("pk"))
        .distinct()
      val n = t(s, dir, "orders").agg(count(lit(1)).as("n_orders"))
      val supp = items.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
      val pairs = items.as("x").join(items.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
      pairs
        .join(supp.select(col("pk").as("a"), col("n_item").as("n_a")), "a")
        .join(supp.select(col("pk").as("b"), col("n_item").as("n_b")), "b")
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("n_ab"),
          round(((col("n_orders") * col("n_ab")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("lift"))
        .orderBy(col("lift").desc, col("a"), col("b")).limit(20)
    }),

    // Events: LINEAR multi-touch attribution — each purchase splits its
    // value equally across ALL preceding touches (vs q140's last-touch
    // winner-take-all): per-conversion share snapped ×1e6, distributed
    // via the per-user suffix-sum window; no-touch purchases report as
    // 'none'. Two windows, one user shuffle.
    "q158_linear_attribution" -> ((s, dir) =>
      Events.linearAttribution(t(s, dir, "events"), col("user_id"),
        col("ts"), col("event_id"), col("event_type"), col("value"),
        Seq("click", "view"), "purchase")),

    // Quality/storage: order-free TABLE CHECKSUM — the replica
    // reconciliation primitive: XOR of portable 60-bit row hashes +
    // count; a reshuffled, reordered, repartitioned copy of the same
    // content must produce the identical pair (audited in-query).
    "q159_table_checksum" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "qc")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_linenumber"), col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("qc"))
      val a = Quality.tableChecksum(li, cols)
      val shuffled = li.repartition(7, col("l_orderkey"))
      val replica = shuffled.filter(col("l_orderkey") % 2 === 0)
        .unionByName(shuffled.filter(col("l_orderkey") % 2 =!= 0))
      val b = Quality.tableChecksum(replica, cols)
        .select(col("n_rows").as("nb"), col("checksum").as("cb"))
      a.crossJoin(b)
        .select(col("n_rows"), col("checksum"),
          (col("n_rows") === col("nb") && col("checksum") === col("cb"))
            .as("replica_matches"))
    }),

    // Similarity: contrastive HARD-NEGATIVE mining over the planted-dup
    // corpus — per query, the 5 most-similar candidates BELOW the 0.9
    // dup threshold (the q123 near-dup gate): planted duplicates are
    // false negatives and never mined; rank k is the k-th non-dup.
    "q155_hard_negatives" -> ((s, dir) => {
      val all = q123Vectors(s, dir)
      Similarity.hardNegatives(all.filter(col("id") < 10), all, 0.9, 5)
    }),

    // Dedup: TEMPLATE-SKELETON collapse — generated numeric variants
    // ("order 123 total 45" vs "order 999 total 7") share a skeleton
    // after digit runs fold to '#'; one hash-aggregate on the skeleton
    // fingerprint finds every template family, keep = min id.
    "q156_template_dedup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
      val docs = base.select(col("doc_id"),
          concat(col("text"), lit(" order 123 total 45")).as("t"))
        .unionByName(base.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 2000000000).as("doc_id"),
            concat(col("text"), lit(" order 999 total 7")).as("t")))
      docs.groupBy(md5(Dedup.templateSkeleton(col("t"))).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("kept_id"))
        .filter(col("n_docs") >= 2)
    }),

    // Storage/agg: INCREMENTAL AGGREGATE MAINTENANCE — yesterday's
    // aggregate snapshot + today's increment re-aggregate to the
    // up-to-date state without rescanning history (count/sum are
    // mergeable partials; the full-rescan truth rides along as an
    // in-query audit column). The incremental-warehouse contract every
    // daily 100 TB rollup depends on.
    "q157_incremental_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
        to_date(col("l_shipdate")).as("d"),
        round(col("l_quantity") * 100).cast("long").as("qc"))
      val cutoff = lit("1998-06-01").cast("date")
      def part(df: DataFrame) = df.groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("qc")).as("qsum"))
      val merged = part(li.filter(col("d") < cutoff))
        .unionByName(part(li.filter(col("d") >= cutoff)))
        .groupBy(col("g"))
        .agg(sum(col("n")).as("n"), sum(col("qsum")).as("qsum"))
      val full = part(li)
        .select(col("g"), col("n").as("fn"), col("qsum").as("fq"))
      merged.join(full, Seq("g"))
        .select(col("g").as("l_returnflag"), col("n"),
          round(col("qsum").cast("double") / 100.0, 2).as("qty_sum"),
          (col("n") === col("fn") && col("qsum") === col("fq"))
            .as("matches_full"))
    }),

    // IR: HYBRID RETRIEVAL via reciprocal-rank fusion — the lexical
    // leg (BM25 top-50, q144's ranking) and the semantic leg (exact
    // cosine top-50 from query vector 0) fuse as
    // Σ round(1e9/(60+rank)): exact integer scores, full-outer so
    // single-leg hits rank too, top-20 via sort+limit. The RAG-stack
    // retrieval pattern as one relational plan.
    "q154_rrf_fusion" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val qterms = docs
        .select(explode(array_distinct(Text.tokens(col("text")))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token")).limit(3)
        .select(col("token"))
      val lex = Text.bm25(docs, "doc_id", col("text"), qterms, 50)
        .select(col("id"), col("rank").as("rt"))
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val sem = Similarity.bruteForceTopK(e.filter(col("id") === 0), e, 50)
        .select(col("neighbor_id").as("id"), col("rank").as("rv"))
      lex.join(sem, Seq("id"), "full_outer")
        .select(col("id").as("doc_id"), col("rt"), col("rv"),
          (coalesce(round(lit(1e9) / (lit(60) + col("rt"))).cast("long"),
            lit(0L)) +
           coalesce(round(lit(1e9) / (lit(60) + col("rv"))).cast("long"),
             lit(0L))).as("sfp"))
        .orderBy(col("sfp").desc, col("doc_id")).limit(20)
        .select(col("doc_id"), col("rt"), col("rv"),
          round((col("sfp").cast("double") / lit(1e9))
            .cast("decimal(20,10)"), 6).cast("double").as("rrf"))
    }),

    // Web/Sketch: BLOOM-GATED crawl novelty — the q133 signal at
    // sketch cost: the corpus canonical set folds into k·m bloom cells
    // (state independent of corpus size; at 100 TB the exact URL index
    // no longer broadcasts, the bloom does), the increment probes it,
    // and the exact anti-join rides along as in-query truth so the
    // false-positive cost of the sketch (novel URLs the bloom thinks
    // it has seen) is measured, not assumed. Zero false negatives by
    // construction: n_novel_bloom <= n_novel_exact always.
    "q134_bloom_url_novelty" -> ((s, dir) => {
      val corpus = docUrls(s, dir)
        .select(Web.canonicalizeUrl(col("url")).as("cu")).distinct()
      val inc = incUrls(s, dir)
        .select(Web.canonicalizeUrl(col("url")).as("cu")).distinct()
        .withColumn("domain", regexp_extract(
          regexp_extract(col("cu"), "^([^/?]+)", 1),
          "([^.]+\\.[^.]+)$", 1))
      val reg = Sketch.bloomRegisters(corpus, col("cu"))
      val bloom = Sketch.bloomMightContain(reg, inc.select(col("cu")), "cu")
      val exact = inc.join(corpus, Seq("cu"), "left_anti")
        .select(col("cu"), lit(1L).as("novel_exact"))
      inc.join(bloom, Seq("cu"))
        .join(exact, Seq("cu"), "left")
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_urls"),
          sum(coalesce(col("novel_exact"), lit(0L))).as("n_novel_exact"),
          sum(when(!col("might_contain"), lit(1L)).otherwise(lit(0L)))
            .as("n_novel_bloom"))
    }),

    // Dedup: INCREMENTAL near-dup — a new crawl increment (half exact
    // re-crawls, half token-sorted novel texts) probed against the
    // existing corpus; old×old is never paired. Output per new doc:
    // match count and the first (keep-first) match, -1 when novel.
    "q82_incremental_dedup" -> ((s, dir) => {
      // spread the 1-task text scan before the per-row shingling
      // (docsDup's fan-out lesson; both derived sides inherit it)
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
      val inc = base.select((col("doc_id") + 1000000000).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(array_join(sort_array(Text.tokens(col("text"))), " "))
          .as("text"))
      def sh(df: DataFrame) = df.select(col("doc_id"),
        Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
      val pairs = Dedup.jaccardPairsIncremental(sh(base), sh(inc),
        "doc_id", "hs", 0.5)
      inc.select(col("doc_id"))
        .join(pairs.groupBy(col("id_new").as("doc_id"))
          .agg(count(lit(1)).as("n_dups"), min(col("id_match")).as("first_dup")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          coalesce(col("first_dup"), lit(-1L)).as("first_dup"))
    }),

    // Sampling: leakage-safe train/val/test split — exact-duplicate
    // pairs → clusters → split by hash of the CANONICAL id, so no
    // duplicate pair straddles a split boundary. The oracle's closure
    // of same-fingerprint pairs is the fingerprint group, so canonical
    // reduces to a window min — no recursion needed.
    "q81_leakage_split" -> ((s, dir) => {
      val d = docsDup(s, dir)
      val fp = d.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      val pairs = fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      Sampling.leakageSafeSplit(d.select(col("doc_id")), "doc_id", pairs,
          Seq(("train", 80), ("val", 90), ("test", 100)), 100)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("canonical")).as("n_clusters"))
    }),

    // Sampling: token-weighted corpus mixing — per-source keep rates
    // steering each source to an equal token share, pure integer
    // arithmetic end-to-end (no float snap anywhere).
    "q88_mix_corpora" -> ((s, dir) =>
      Sampling.mixUniformByTokens(t(s, dir, "documents"), col("doc_id"),
        col("source"), Text.tokenCount(col("text")), 100)),

    // Sketch: join-size estimate from two count-min register tables —
    // the AMS inner-product bound (min over rows of Σ cntA·cntB), next
    // to the exact join size it upper-bounds. No join executed on the
    // sketch path; all-integer registers keep it deterministic.
    "q91_join_size_sketch" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("k"))
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"))
      Sketch.cmJoinSizeEstimate(
          Sketch.cmRegisters(l, col("k")), Sketch.cmRegisters(o, col("k")))
        .crossJoin(l.join(o, "k").agg(count(lit(1)).as("n_exact")))
    }),

    // Join: point-in-interval range join via grid blocking — urgent
    // orders' [orderdate, +3d] windows × lineitem ship days. A bare
    // BETWEEN join is a BroadcastNestedLoopJoin (dead at scale); the
    // 4-day grid makes it an equi-join on the cell id. The aggregate
    // is distributive, so the point side pre-collapses to one partial
    // row per DISTINCT day (~2.5k) before the join — pairs scale with
    // intervals×span, not facts×span; partials sum in exact integer
    // cents so the collapse can't reassociate a float sum.
    "q92_range_join" -> ((s, dir) => {
      val epoch = lit("1970-01-01").cast("date")
      val pts = t(s, dir, "lineitem")
        .groupBy(datediff(to_date(col("l_shipdate")), epoch).as("pt_day"))
        .agg(count(lit(1)).as("d_n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("d_qty_c"))
      val iv = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), epoch).as("lo_day"),
          (datediff(to_date(col("o_orderdate")), epoch) + 3).as("hi_day"))
      Joins.rangeJoin(pts, "pt_day", iv, "lo_day", "hi_day", 4L)
        .groupBy(col("o_orderkey"))
        .agg(sum(col("d_n")).as("n_pts"),
          round(sum(col("d_qty_c")).cast("double") / 100.0, 2).as("qty_sum"))
    }),

    // Dedup: exact duplicate-span (substring-level) detection — the
    // Lee-et-al boilerplate scrub over the planted-dup corpus; 8-token
    // non-overlapping spans, corpus frequency ≥2 flags a span.
    "q93_dup_spans" -> ((s, dir) =>
      Dedup.duplicateSpans(docsDup(s, dir), "doc_id", col("text"), 8)
        .withColumnRenamed("id", "doc_id")),

    // Frequent: exact heavy hitters (freq ≥ 1/50) over corpus tokens —
    // two-pass Misra-Gries candidates + broadcast-verified exact
    // counts; the oracle is the plain groupBy-having it must equal.
    "q94_heavy_hitters" -> ((s, dir) =>
      Frequent.heavyHitters(
        t(s, dir, "documents")
          .select(explode(Text.tokens(col("text"))).as("tok")),
        col("tok"), 1, 50)),

    // Series: exponentially time-decayed revenue per return flag,
    // 90-day half-life anchored at the corpus max ship date — each
    // term snaps to integer cents so the sum is exact and order-free.
    "q95_decayed_sum" -> ((s, dir) =>
      Resample.decayedSum(t(s, dir, "lineitem"), col("l_returnflag"),
        to_date(col("l_shipdate")), col("l_extendedprice"),
        lit("2001-11-04").cast("date"), 90)),

    // Relational set ops: EXCEPT / INTERSECT customer segments between
    // two order years — Catalyst plans these as anti/semi joins on the
    // distinct sets, never a materialized set difference.
    "q96_set_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def cust(yr: Int) = o
        .filter(year(to_date(col("o_orderdate"))) === yr)
        .select(col("o_custkey")).distinct()
      val c95 = cust(1995)
      val c96 = cust(1996)
      c95.except(c96).select(lit("only_1995").as("segment"), col("o_custkey"))
        .unionByName(c96.except(c95)
          .select(lit("only_1996").as("segment"), col("o_custkey")))
        .unionByName(c95.intersect(c96)
          .select(lit("both").as("segment"), col("o_custkey")))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // Profiling: exact interpolated percentiles per group (median/p90)
    // — one sort-aggregate per group key; snapped through
    // decimal(20,10) so the interpolation rounds identically.
    "q97_group_percentiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(percentile(col("o_totalprice"), lit(0.5))
            .cast("decimal(20,10)"), 4).cast("double").as("p50"),
          round(percentile(col("o_totalprice"), lit(0.9))
            .cast("decimal(20,10)"), 4).cast("double").as("p90"))),

    // Sampling: deterministic bottom-k — the k distinct docs with the
    // smallest portable content-key hash form a reproducible uniform
    // sample on any engine; orderBy+limit plans as
    // TakeOrderedAndProject (per-partition top-k, no global sort).
    "q98_bottomk_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          Dedup.hashLong(col("doc_id").cast("string")).as("h"))
        .orderBy(col("h"), col("doc_id")).limit(25)),

    // Series: day-of-week seasonality — per-symbol DOW mean price vs
    // the symbol's overall mean, every mean an exact integer-cents
    // rational, ONE double division at the end (engine-proof; dow is
    // epoch-day mod 7 so no engine's week-start convention leaks in).
    "q99_dow_seasonality" -> ((s, dir) => {
      val b = bars(s, dir).select(col("symbol"),
        pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7))
          .as("dow"),
        round(col("px") * 100).cast("long").as("px_c"))
      val byDow = b.groupBy(col("symbol"), col("dow"))
        .agg(count(lit(1)).as("n_dow"), sum(col("px_c")).as("s_dow"))
      val bySym = b.groupBy(col("symbol"))
        .agg(count(lit(1)).as("n_all"), sum(col("px_c")).as("s_all"))
      byDow.join(bySym, Seq("symbol"))
        .filter(col("symbol") <= 50)
        .select(col("symbol"), col("dow"), col("n_dow"),
          round(((col("s_dow") * col("n_all")).cast("double") /
            (col("n_dow") * col("s_all")).cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("ratio"))
    }),

    // Text: END-TO-END entity resolution — corrupted variants probe the
    // CLEAN reference names ASYMMETRICALLY (q85's shape): each variant
    // resolves to its best clean match (min dist, then min ref id, one
    // exact lexicographic min over a (dist, id) struct — domain-safe
    // for any id range, unlike arithmetic packing), canonical = ref;
    // unmatched records stay their own entity. One cluster per true
    // entity — symmetric clean∪variant self-pairing + transitive
    // closure chains near-identical names into mega-clusters and goes
    // quadratic in corpus density (round-5 verdict: 12M edges, 65
    // clusters for 40k entities, 115 s); the asymmetric probe is both
    // the meaningful ER output and the 100×-scale shape. Blocking is
    // the RECALL-COMPLETE segment pigeonhole (the corruption deletes
    // exactly one character, so every variant's true source sits at
    // distance exactly 1 — first-char blocking provably lost every
    // variant whose LEADING character was the one deleted, and q107
    // existed to measure that loss); the oracle therefore uses NO
    // block predicate at all: plain all-pairs levenshtein <= 1 truth.
    // The density guard is ARMED (50M pairs/block) so a pathological
    // vocabulary fails loudly instead of silently blowing up.
    "q102_entity_resolution" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
      val len = length(col("name"))
      val k = (col("id") % len).cast("int")
      val variants = parts.select((col("id") + 2000000000).as("id"),
        concat(col("name").substr(lit(1), k),
          col("name").substr(k + 2, len)).as("name"))
      // fused resolve-to-best: the per-probe lexicographic min runs at
      // string level inside the operator, so the copy-level pair set
      // (6.4M rows on this duplicate-heavy corpus) never materializes
      val best = Text.fuzzyResolveBest(variants, parts, "id", col("name"),
        "id", col("name"), 1, maxBlockPairs = 50000000L)
      val assigned = parts.select(col("id"), col("id").as("canonical"))
        .unionByName(variants.select(col("id"))
          .join(best.select(col("probe_id"), col("ref_id").cast("long")),
            col("id") === col("probe_id"), "left")
          .select(col("id"),
            coalesce(col("ref_id"), col("id")).as("canonical")))
      assigned.groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_members"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"))
    }),

    // Dedup: asymmetric containment join — 12-token excerpts probe the
    // full corpus for the documents that CONTAIN them (quote/excerpt
    // detection, where Jaccard is blind); probe prefixes rarity-sorted
    // by target df, targets fully indexed.
    "q101_containment" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val tgt = d.select(col("doc_id"),
        Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
      val probes = d.select((col("doc_id") + 2000000000).as("pid"),
        Dedup.hashedShingles(slice(Text.tokens(col("text")), 1, 12), 3)
          .as("hs"))
      Dedup.containmentJoin(probes, "pid", "hs", tgt, "doc_id", "hs", 0.8)
    }),

    // Text: per-doc out-of-vocabulary rate against the corpus-induced
    // vocabulary (q94's exact heavy hitters ARE the vocab) — the
    // tokenizer-health gate; vocab rides back broadcast.
    "q103_oov_rate" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      val vocab = Frequent.heavyHitters(toks, col("tok"), 1, 50)
        .select(col("item").as("tok"), lit(1).as("iv"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          round((col("n_oov").cast("double") / col("n_tokens"))
            .cast("decimal(20,10)"), 4).cast("double").as("oov_rate"))
    }),

    // Sampling: windowed revisit throttling — keep one bar per symbol
    // per 30-day window, walking the day-sorted series with an exact
    // packed-integer fold (the crawl re-visit rate limiter).
    "q104_throttle_window" -> ((s, dir) =>
      Sampling.throttleByWindow(
        bars(s, dir).select(col("symbol"),
          datediff(col("d"), lit("1970-01-01").cast("date")).as("day")),
        col("symbol"), col("day"), 30)
        .withColumnRenamed("k", "symbol")),

    // Text: MULTI-PASS blocked fuzzy match — probes corrupted at the
    // ANCHOR positions (first char deleted for even keys, last char for
    // odd), so each single-key blocking pass misses half the corpus and
    // only the (first-char ∪ last-char) composition recovers them; at
    // maxDist=1 the two passes are provably recall-complete
    // (FuzzyJoinSpec pins against all-pairs ground truth).
    "q105_fuzzy_multiblock" -> ((s, dir) => {
      val parts = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      val len = length(col("p_name"))
      val probes = parts.select((col("p_partkey") + 2000000000).as("probe_id"),
        when(pmod(col("p_partkey"), lit(2)) === 0,
            col("p_name").substr(lit(2), len))
          .otherwise(col("p_name").substr(lit(1), len - 1)).as("pn"))
      val m = Text.fuzzyJoinMultiBlock(probes, parts, "probe_id", col("pn"),
        "p_partkey", col("p_name"), 1)
      probes.select(col("probe_id"))
        .join(m.groupBy(col("probe_id"))
          .agg(count(lit(1)).as("n_matches"),
            min(struct(col("dist").cast("long").as("d"),
              col("ref_id").cast("long").as("r"))).as("bk")),
          Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          coalesce(col("bk.d"), lit(-1L))
            .as("best_dist"),
          coalesce(col("bk.r"), lit(-1L)).as("best_ref"))
    }),

    // Text: INCREMENTAL entity resolution — the daily-ingest shape: a
    // corrupted batch probes the accumulated clean snapshot plus its
    // own earlier rows; old×old is never re-paired, so per-ingest cost
    // is |batch|·blockDensity instead of |corpus|². Matches split by
    // side (snapshot vs within-batch), best ref BIGINT-packed.
    "q106_incremental_er" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
      val len = length(col("name"))
      val k = (col("id") % len).cast("int")
      val batch = parts.select((col("id") + 2000000000).as("id"),
        concat(col("name").substr(lit(1), k),
          col("name").substr(k + 2, len)).as("name"))
      val inc = Text.fuzzyJoinIncremental(parts, batch, "id", col("name"), 1)
      batch.select(col("id").as("probe_id"))
        .join(inc.groupBy(col("probe_id")).agg(
            sum(when(col("ref_id") < 2000000000, 1L).otherwise(0L)).as("n_old"),
            sum(when(col("ref_id") >= 2000000000, 1L).otherwise(0L)).as("n_new"),
            min(struct(col("dist").cast("long").as("d"),
              col("ref_id").cast("long").as("r"))).as("bk")),
          Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("n_old"), lit(0L)).as("n_old"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("bk.r"), lit(-1L)).as("best_ref"))
    }),

    // Text: blocking-recall ESTIMATOR — the pre-flight that decides
    // whether a CHEAP single-anchor blocking suffices before paying
    // for the recall-complete segment path: all-pairs ground truth is
    // unaffordable on the corpus but cheap on a deterministic sample
    // (sample² work), so the blocked join's recall is measured there.
    // It audits first-char blocking exactly because that scheme is
    // lossy (q102 itself moved to segments after this estimator
    // quantified the loss). Blocked output is a subset of truth by
    // construction (same verify), so recall = blocked/truth.
    "q107_blocking_recall" -> ((s, dir) => {
      // fixed-SIZE deterministic sample (bottom-500 by md5, q98's
      // kernel) — a fixed FRACTION would make the sample² audit
      // O(corpus²/1600); bottom-k keeps the truth side constant work
      // at any corpus size
      val sample = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"),
          Dedup.hashLong(col("p_partkey").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(500)
        .select(col("id"), col("name"))
      val len = length(col("name"))
      val k = (col("id") % len).cast("int")
      val probes = sample.select((col("id") + 2000000000).as("id"),
        concat(col("name").substr(lit(1), k),
          col("name").substr(k + 2, len)).as("name"))
      val blocked = Text.fuzzyJoin(probes, sample, "id", col("name"),
        "id", col("name"), 1)
      val truth = probes.select(col("id").as("pid"), col("name").as("pn"))
        .crossJoin(sample.select(col("id").as("rid"), col("name").as("rn")))
        .filter(levenshtein(col("pn"), col("rn")) <= 1)
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(broadcast(blocked.agg(count(lit(1)).as("n_blocked"))))
        .select(col("n_true"), col("n_blocked"),
          round((col("n_blocked").cast("double") / col("n_true"))
            .cast("decimal(20,10)"), 4).cast("double").as("recall"))
    }),

    // Text: segment-blocked fuzzy match (PassJoin blocking) — q85's
    // exact corruption (one deletion at a key-determined position,
    // FIRST char included), but the k+1 segment pigeonhole is
    // recall-complete at any maxDist where q85's first-char blocking
    // provably loses the k=0 deletions; the ORACLE proves completeness
    // by using NO block predicate at all: plain all-pairs
    // levenshtein <= 1 truth.
    "q109_fuzzy_segments" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
      val len = length(col("name"))
      val k1 = (col("id") % len).cast("int")
      val probes = parts.select((col("id") + 2000000000).as("probe_id"),
        concat(col("name").substr(lit(1), k1),
          col("name").substr(k1 + 2, len)).as("pn"))
      // fused resolve-to-best (see q102): n_matches is still the
      // copy-level pair count, aggregated from per-name multiplicities
      val m = Text.fuzzyResolveBest(probes, parts, "probe_id", col("pn"),
        "id", col("name"), 1)
      probes.select(col("probe_id"))
        .join(m, Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          coalesce(col("dist").cast("long"), lit(-1L))
            .as("best_dist"),
          coalesce(col("ref_id").cast("long"), lit(-1L)).as("best_ref"))
    }),

    // Similarity: ANN recall ESTIMATOR — recall@5 of the multi-probe
    // IVF scale path against brute-force ground truth, per nprobe ∈
    // {1,2,4} (monotone by candidate nesting). The query set is a
    // fixed-SIZE bottom-100-by-md5 sample, so the brute-truth
    // broadcast and the audit cost are constant at any corpus size,
    // and the probe filter lives INSIDE ivfSearch — only sampled
    // queries are ever ranked (round-6 ranked the full corpus and
    // discarded 9/10 of it).
    "q108_ivf_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val centroids = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      // truth/assigned are consumed once per nprobe tier (3×) but must
      // NOT be persisted: within one plan Spark's ReusedExchange already
      // computes each identical subtree once, while an InMemoryRelation
      // would BLOCK that reuse and pay columnar cache-compression of the
      // vector columns (measured: persist made this query 3× slower)
      val truth = Similarity.bruteForceTopK(qs, e, 5)
      val assigned = Similarity.ivfAssign(e, centroids)
      val hits = Seq(1, 2, 4).map { np =>
        val approx = Similarity.ivfSearch(qs, assigned, centroids, 5,
          nprobe = np, preAssigned = true)
        truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
          .withColumn("nprobe", lit(np))
      }.reduce(_.unionByName(_))
      qs.select(col("id").as("query_id"))
        .withColumn("nprobe", explode(array(lit(1), lit(2), lit(4))))
        .join(hits, Seq("query_id", "nprobe"), "left")
        .select(col("query_id"), col("nprobe"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round((coalesce(col("n_hit"), lit(0L)).cast("double") / 5)
            .cast("decimal(20,10)"), 4).cast("double").as("recall_at_5"))
    }),

    // Similarity: IVF centroid TRAINING (Lloyd's lite) — per-cell
    // occupancy + the ×1e6 fixed-point spherical-kmeans objective
    // under the seed centroids (iter 1) and under the once-trained
    // per-dim means (iter 2). The means snap components to fixed point
    // BEFORE summing, so the trained centroid values — and hence the
    // iter-2 assignment — are bit-identical on any engine.
    "q110_kmeans" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val c1 = Similarity.kmeansStep(e, c0)
      Similarity.ivfCellStats(e, c0).withColumn("iter", lit(1))
        .unionByName(
          Similarity.ivfCellStats(e, c1).withColumn("iter", lit(2)))
        .select(col("iter"), col("cell").as("cid"), col("n_members"),
          col("obj_fp"))
    }),

    // Similarity: the COMPLETE ANN story end-to-end — train centroids
    // in-engine (one exact fixed-point Lloyd step from the id<16
    // seed), then measure recall@5 of multi-probe IVF (nprobe=2) on
    // the fixed 100-query sample under the SEED vs the TRAINED
    // centroids. Everything composes the audited kernels: kmeansTrain
    // (q110), ivfSearch with the probe filter inside (q108),
    // bruteForceTopK's bounded-sample truth. Trained centroids ride
    // the same broadcast path as the seed; audit cost stays constant
    // in corpus size (fixed-size sample, fixed centroid count).
    "q112_ivf_trained_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val c1 = Similarity.kmeansTrain(e, c0, 1)
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      // no persist on truth: ReusedExchange shares the subtree across
      // both centroid-set branches of this one plan (see q108)
      val truth = Similarity.bruteForceTopK(qs, e, 5)
      val hits = Seq(0 -> c0, 1 -> c1).map { case (tag, c) =>
        val approx = Similarity.ivfSearch(qs, e, c, 5, nprobe = 2)
        truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
          .withColumn("trained", lit(tag))
      }.reduce(_.unionByName(_))
      qs.select(col("id").as("query_id"))
        .withColumn("trained", explode(array(lit(0), lit(1))))
        .join(hits, Seq("query_id", "trained"), "left")
        .select(col("query_id"), col("trained"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round((coalesce(col("n_hit"), lit(0L)).cast("double") / 5)
            .cast("decimal(20,10)"), 4).cast("double").as("recall_at_5"))
    }),

    // Similarity: PRODUCT QUANTIZATION (IVF-PQ's memory half) — the
    // 64-dim embeddings split into m=8 subspaces, a per-subspace
    // codebook (16 codewords, id<16 seed) takes one exact fixed-point
    // Lloyd step, the corpus PQ-encodes to 8 code bytes per vector
    // (the 100 TB resident-index story: bytes instead of floats), and
    // the fixed 100-query sample ranks by asymmetric distance — per-
    // subspace LUT sums over codes only, corpus floats never touched
    // after encode. Output: recall@5 of ADC vs exact-L2 truth.
    "q117_pq_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val sv = Similarity.subVectors(e, 8)
      val cb1 = Similarity.pqTrainStep(sv, Similarity.pqSeedCodebook(e, 8, 16))
      val codes = Similarity.pqAssign(sv, cb1)
        .select(col("id"), col("sub"), col("code"))
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      // cb1 feeds both the encode and the LUT: ReusedExchange computes
      // the training aggregate once per execution — no persist (lesson
      // 23; persisting measured slower on the q108/q112 siblings)
      val truth = Similarity.bruteForceTopKL2(qs, e, 5)
      val approx = Similarity.pqAdcTopK(qs, codes, cb1, 8, 5)
      val hits = truth.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      qs.select(col("id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round((coalesce(col("n_hit"), lit(0L)).cast("double") / 5)
            .cast("decimal(20,10)"), 4).cast("double").as("recall_at_5"))
    }),

    // Similarity: IVF-PQ END TO END — q117's trained PQ codebook under
    // an L2 coarse quantizer: the corpus routes to 16 cells, encodes to
    // 8 code bytes, and the fixed 100-query sample probes nprobe ∈
    // {2, 4} cells, ranking only those cells' members by LUT-summed
    // asymmetric distance. recall@5 vs exact-L2 truth, per nprobe —
    // monotone by candidate nesting; per-query cost = probed occupancy
    // × 8 lookups, independent of corpus size once assigned+encoded.
    "q118_ivfpq_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val sv = Similarity.subVectors(e, 8)
      val cb1 = Similarity.pqTrainStep(sv, Similarity.pqSeedCodebook(e, 8, 16))
      val ivfC = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      val truth = Similarity.bruteForceTopKL2(qs, e, 5)
      // BOTH tiers from one assign/encode/ADC pass (candidate nesting:
      // tier np = probe-rank ≤ np) — the per-tier loop recomputed the
      // heavy subtrees once per tier and measured 4× the single-tier
      // q117 on the same kernels
      val approx = Similarity.ivfPqSearchTiered(qs, e, ivfC, cb1, 8, 5,
        Seq(2, 4))
      val hits = approx
        .join(truth.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id"), col("nprobe"))
        .agg(count(lit(1)).as("n_hit"))
      qs.select(col("id").as("query_id"))
        .withColumn("nprobe", explode(array(lit(2), lit(4))))
        .join(hits, Seq("query_id", "nprobe"), "left")
        .select(col("query_id"), col("nprobe"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round((coalesce(col("n_hit"), lit(0L)).cast("double") / 5)
            .cast("decimal(20,10)"), 4).cast("double").as("recall_at_5"))
    }),

    // Similarity: RESIDUAL IVF-PQ (the canonical form) — the coarse
    // tier takes one exact L2 Lloyd step (means are the within-cell
    // variance minimizers — the step that makes residuals SMALL), PQ
    // codebooks train on vec − centroid(cell) residuals so codewords
    // spend their bits on within-cell spread, per-cell query residuals
    // build the LUT, and the ADC join on (cell, sub, code) restricts
    // candidates to probed cells with no separate candidate join.
    // recall@5 at nprobe=2 vs exact-L2 truth: 0.16 vs q118's 0.134
    // non-residual tier at the same nprobe — the residual win, which
    // INVERTS to 0.08 if the coarse tier stays untrained (loose cells
    // ⇒ residual variance ≈ 2× raw; measured, see NOTES).
    "q121_ivfpq_residual" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val ivfC = Similarity.kmeansStepL2(e, c0).localCheckpoint(true)
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      val truth = Similarity.bruteForceTopKL2(qs, e, 5)
      val approx = Similarity.ivfPqSearchResidual(qs, e, ivfC, 8, 16, 5, 2,
        seedFrom = 16L)
      val hits = truth.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      qs.select(col("id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round((coalesce(col("n_hit"), lit(0L)).cast("double") / 5)
            .cast("decimal(20,10)"), 4).cast("double").as("recall_at_5"))
    }),

    // Similarity: MULTI-ITERATION Euclidean k-means — per-cell
    // occupancy and the ×1e6 fixed-point SSE objective under the seed
    // (iter 0), after one Lloyd step (iter 1), and after three
    // (iter 3). Lloyd guarantees the total SSE is non-increasing
    // (assignment argmins, the mean minimizes within-cell SSE) — a
    // spec pins it; the oracle unrolls the exact fixed-point steps.
    // c3 continues FROM c1 (two more steps), so training cost is 3
    // corpus aggregates, not 4.
    "q124_kmeans_l2_train" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val c1 = Similarity.kmeansTrainL2(e, c0, 1)
      val c3 = Similarity.kmeansTrainL2(e, c1, 2)
      Seq(0 -> c0, 1 -> c1, 3 -> c3).map { case (i, c) =>
        Similarity.ivfCellStatsL2(e, c).withColumn("iter", lit(i))
      }.reduce(_.unionByName(_))
        .select(col("iter"), col("cell").as("cid"), col("n_members"),
          col("sse_fp"))
    }),

    // Similarity/eval: SIMPLIFIED SILHOUETTE of the trained clustering
    // — q124 proves SSE falls; this scores how SEPARATED the result
    // is, per cell (the number an embedding-space "is k right" sweep
    // compares). Same 2-iteration training as q124's c2 tier.
    "q215_silhouette" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      Similarity.silhouetteSimplified(e,
        Similarity.kmeansTrainL2(e, c0, 2))
    }),

    // Similarity/eval: ADJUSTED RAND INDEX between two differently
    // seeded k-means runs — the clustering STABILITY read (purity
    // judges against labels; ARI judges the clustering against
    // itself under seed perturbation: chance-corrected pair
    // agreement). All pair counts collapse to the contingency-cell
    // grid — Σn_ij(n_ij−1) algebra, never the n² point pairs; exact
    // DECIMAL integers into one snapped division. den = 0 (both
    // runs a single cluster) is null.
    "q232_ari" -> ((s, dir) => {
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      def assignFrom(lo: Long, hi: Long) =
        Similarity.ivfAssignL2Scored(e,
            Similarity.kmeansTrainL2(e,
              e.filter(col("id") >= lo && col("id") < hi)
                .select(col("id").as("cid"), col("vec").as("cvec")), 2))
          .select(col("id"), col("cell"))
      val cells = assignFrom(0, 16)
        .join(assignFrom(100, 116).withColumnRenamed("cell", "cellb"),
          "id")
        .groupBy(col("cell"), col("cellb")).agg(count(lit(1)).as("nij"))
      val av = cells.groupBy(col("cell")).agg(sum(col("nij")).as("ai"))
        .agg(sum(d38(col("ai")) * (col("ai") - 1)).as("a2"),
          count(lit(1)).as("ka"))
      val bv = cells.groupBy(col("cellb")).agg(sum(col("nij")).as("bi"))
        .agg(sum(d38(col("bi")) * (col("bi") - 1)).as("b2"),
          count(lit(1)).as("kb"))
      val cv = cells.agg(sum(d38(col("nij")) * (col("nij") - 1)).as("c2"),
        sum(col("nij")).as("n"))
      val t2 = d38(col("n")) * (col("n") - 1)
      val den = t2 * (col("a2") + col("b2")) -
        lit(2) * col("a2") * col("b2")
      cv.crossJoin(broadcast(av)).crossJoin(broadcast(bv))
        .select(col("n"), col("ka"), col("kb"),
          when(den === 0, lit(null)).otherwise(
            round(((lit(2) * t2 * col("c2") -
              lit(2) * col("a2") * col("b2")).cast("double") /
              den.cast("double")).cast("decimal(20,10)"), 6)
              .cast("double")).as("ari"))
    }),

    // Similarity/eval: CLUSTER PURITY + label-entropy scorecard — the
    // external-validity companion to q215's silhouette (geometry):
    // the trained IVF cells judged against the ground-truth labels.
    // Per cell its majority label, purity share, and the label
    // entropy (×1e9 ln snaps pre-sum); one broadcast-centroid
    // assignment pass, one cell×label hash aggregate (never corpus²).
    "q228_cluster_purity" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val assign = Similarity.ivfAssignL2Scored(e,
        Similarity.kmeansTrainL2(e, c0, 2)).select(col("id"), col("cell"))
      val cl = assign.join(t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("label")), "id")
        .groupBy(col("cell"), col("label")).agg(count(lit(1)).as("o"))
      val nc = cl.groupBy(col("cell")).agg(sum(col("o")).as("n"))
      val top = cl.withColumn("rn", row_number().over(
          Window.partitionBy(col("cell"))
            .orderBy(col("o").desc, col("label"))))
        .filter(col("rn") === 1)
        .select(col("cell"), col("label").as("top_label"),
          col("o").as("n_top"))
      val ent = cl.join(nc, "cell")
        .select(col("cell"),
          round(col("o").cast("double") / col("n").cast("double") *
            log(col("o").cast("double") / col("n").cast("double")) *
            lit(1e9)).cast("long").as("tfp"))
        .groupBy(col("cell")).agg((-sum(col("tfp"))).as("efp"))
      nc.join(top, "cell").join(ent, "cell")
        .select(col("cell").as("cid"), col("n"), col("top_label"),
          col("n_top"),
          round((col("n_top").cast("double") / col("n").cast("double"))
            .cast("decimal(20,10)"), 4).cast("double").as("purity"),
          round((col("efp").cast("double") / lit(1e9))
            .cast("decimal(20,10)"), 6).cast("double").as("entropy"))
    }),

    // Similarity/graph: MUTUAL-kNN reciprocity per label over the
    // CELL-BLOCKED kNN graph — neighbors rank within each trained IVF
    // cell (Σ|cell|² work, the 100 TB bound; a corpus-wide brute
    // self-kNN was MEASURED 12.4 s at sf0.1 vs 3.8 s blocked), then
    // each directed edge checks for its reverse via ONE leftsemi
    // self-join (ReusedExchange dedups the shared kNN subtree — no
    // persist, the q210/q216 lesson). Reciprocity is the standard
    // manifold-quality read: mutual edges survive into mutual-kNN
    // clustering, one-way edges mark hubness/boundary points.
    // Singleton-cell nodes have no edges and drop out (declared).
    "q224_mutual_knn" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val assign = Similarity.ivfAssignL2Scored(e,
          Similarity.kmeansTrainL2(e, c0, 1))
        .select(col("id"), col("vec"), col("cell"))
      val knn = assign.as("a").join(assign.as("b"),
          col("a.cell") === col("b.cell") && col("a.id") =!= col("b.id"))
        .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
          round(Similarity.cosine(col("a.vec"), col("b.vec")), 6)
            .as("sim"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("sim").desc, col("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"))
      val mutual = knn.join(
        knn.select(col("query_id").as("neighbor_id"),
          col("neighbor_id").as("query_id")),
        Seq("query_id", "neighbor_id"), "leftsemi")
      val perNode = knn.groupBy(col("query_id"))
        .agg(count(lit(1)).as("deg"))
        .join(mutual.groupBy(col("query_id"))
          .agg(count(lit(1)).as("mdeg")), Seq("query_id"), "left")
        .na.fill(0L, Seq("mdeg"))
      perNode
        .join(t(s, dir, "embeddings")
          .select(col("vec_id").as("query_id"), col("label")), "query_id")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(col("deg")).as("n_edges"),
          sum(col("mdeg")).as("n_mutual"))
        .select(col("label"), col("n_nodes"), col("n_edges"),
          col("n_mutual"),
          round((col("n_mutual").cast("double") /
            col("n_edges").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double").as("reciprocity"))
    }),

    // Similarity/sampling: COVERAGE (diversity) downsample — one
    // representative per trained IVF cell (closest to centroid, id
    // tiebreak) plus the cell's occupancy and coverage RADIUS (max
    // member distance, ×1e6): the k-center-flavored "keep the corpus'
    // spread, not its density" reduction, and the radius is the
    // quality bound a coverage-sampled training set quotes. One
    // broadcast-centroid assignment pass, one cell aggregate.
    "q218_coverage_sample" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      Similarity.ivfAssignL2Scored(e, Similarity.kmeansTrainL2(e, c0, 1))
        .groupBy(col("cell"))
        .agg(min_by(col("id"), struct(col("cd"), col("id"))).as("rep_id"),
          count(lit(1)).as("n_members"),
          max(round(col("cd") * 1e6).cast("long")).as("radius_fp"))
    }),

    // Similarity: plain-IVF L2 recall under 1 vs 3 trained Lloyd
    // steps — q112's trained-recall audit under the Euclidean metric
    // (bruteForceTopKL2 truth on the fixed 100-query sample,
    // ivfSearchL2 at nprobe=2 under each centroid set). Reports the
    // recall a better-trained coarse tier buys; the SSE guarantee
    // lives in q124, recall itself is measured, not promised.
    "q125_ivf_l2_trained_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val c0 = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      val c1 = Similarity.kmeansTrainL2(e, c0, 1)
      val c3 = Similarity.kmeansTrainL2(e, c1, 2)
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      // no persist on truth: ReusedExchange shares the subtree across
      // both centroid-set branches of this one plan (see q108)
      val truth = Similarity.bruteForceTopKL2(qs, e, 5)
      val hits = Seq(1 -> c1, 3 -> c3).map { case (tag, c) =>
        val approx = Similarity.ivfSearchL2(qs, e, c, 5, nprobe = 2)
        truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
          .withColumn("iters", lit(tag))
      }.reduce(_.unionByName(_))
      qs.select(col("id").as("query_id"))
        .withColumn("iters", explode(array(lit(1), lit(3))))
        .join(hits, Seq("query_id", "iters"), "left")
        .select(col("query_id"), col("iters"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round((coalesce(col("n_hit"), lit(0L)).cast("double") / 5)
            .cast("decimal(20,10)"), 4).cast("double").as("recall_at_5"))
    }),

    // Similarity: SCALAR QUANTIZATION (SQ8) — the compression tier
    // between raw floats and PQ codes: one per-dim min/max pass (d-row
    // aggregate, broadcast back), every vector snaps to d 8-bit bin
    // indices (4× resident-index compression), and the fixed 100-query
    // sample ranks corpus rows by exact-query-vs-reconstruction squared
    // L2 — the scan touches only the codes plus the one stats row.
    // Output: recall@5 of the SQ8 scan vs exact-L2 truth.
    "q128_sq8_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val st = Similarity.sqStats(e)
      val codes = Similarity.sqEncode(e, st)
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      // no persist: the stats row is a ReusedExchange across the encode
      // and decode consumers of this one plan (see q108)
      val truth = Similarity.bruteForceTopKL2(qs, e, 5)
      val approx = Similarity.sqTopK(qs, codes, st, 5)
      val hits = truth.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      qs.select(col("id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round((coalesce(col("n_hit"), lit(0L)).cast("double") / 5)
            .cast("decimal(20,10)"), 4).cast("double").as("recall_at_5"))
    }),

    // Similarity: TRUNCATED-DIMENSION retrieval cascade (matryoshka) —
    // stage 1 shortlists per query by cosine over only the FIRST 16 of
    // 64 dims (at scale: a 4× cheaper scan, the prefix laid out as its
    // own column), stage 2 reranks the shortlist by full-dim cosine.
    // Both shortlist tiers (10, 30) share ONE stage-1 ranking — tier
    // membership is just prank <= R, the q108 multi-probe trick — so
    // recall-vs-cost is measured from a single pass. Output: recall@5
    // per query per shortlist depth vs exact cosine truth.
    "q129_matryoshka_rerank" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      val cand = Similarity.truncatedCandidates(qs, e, 16, 30)
      val truth = Similarity.bruteForceTopK(qs, e, 5)
      val hits = Seq(10, 30).map { r =>
        val approx = Similarity.rerankExact(qs, e,
          cand.filter(col("prank") <= r), 5)
        truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
          .withColumn("shortlist", lit(r))
      }.reduce(_.unionByName(_))
      qs.select(col("id").as("query_id"))
        .withColumn("shortlist", explode(array(lit(10), lit(30))))
        .join(hits, Seq("query_id", "shortlist"), "left")
        .select(col("query_id"), col("shortlist"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round((coalesce(col("n_hit"), lit(0L)).cast("double") / 5)
            .cast("decimal(20,10)"), 4).cast("double").as("recall_at_5"))
    }),

    // Similarity: retrieval SCORECARD — RR and NDCG@5 of the
    // matryoshka cascade (shortlist 10) against exact cosine truth,
    // per query: the rank-sensitive metrics recall@k can't see.
    // Discount terms 1e6/log2(rank+1) snap to integers pre-sum, so
    // every NDCG is a ratio of exact integers.
    "q139_ann_ranking_metrics" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val qs = e.select(col("id"), col("vec"),
          Dedup.hashLong(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(100)
        .select(col("id"), col("vec"))
      val truth = Similarity.bruteForceTopK(qs, e, 5)
      val approx = Similarity.rerankExact(qs, e,
        Similarity.truncatedCandidates(qs, e, 16, 10), 5)
      Similarity.rankingMetrics(truth, approx)
        .withColumnRenamed("ndcg", "ndcg_at_5")
    }),

    // Similarity/Quality: embedding OUTLIER gate — vectors whose cell
    // affinity is > 2σ below their cell's mean (the "belongs nowhere"
    // rows a pipeline drops before training). The z-test runs on exact
    // integers (×1e6 affinities, decimal(38,0) moments, D² vs
    // 4(nΣ²−Σ²)) — no float mean/σ, so the flag is bit-identical on
    // any engine; per-cell stats broadcast back over one assignment
    // shuffle.
    "q120_embedding_outliers" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val centroids = e.filter(col("id") < 16)
        .select(col("id").as("cid"), col("vec").as("cvec"))
      Similarity.cellOutliers(e, centroids)
    }),

    // Similarity: INCREMENTAL exact embedding near-dup — the q82/q114
    // asymmetry on the cosine modality, completing the incremental
    // family (jaccard q82, LSH q114, fuzzy q106): an increment (half
    // exact copies, half reversed-vector strangers) scans old ∪ new
    // with the blocked pair kernel, old×old never computed. Work is
    // |new|·|corpus| dots across Bn·Ba bounded-memory block tasks.
    "q119_incremental_cosine" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val inc = e.select((col("id") + 1000000000).as("id"),
        when(pmod(col("id"), lit(2)) === 0, col("vec"))
          .otherwise(reverse(col("vec"))).as("vec"))
      Similarity.cosineNearDupPairsIncremental(e, inc, 0.95, 16)
    }),

    // Dedup: INCREMENTAL MinHash+LSH — q82's crawl-increment scenario
    // on the LSH path: only new docs probe the band-bucket index over
    // old ∪ new (old×old never pairs), candidates verified with exact
    // Jaccard on the hashed shingle sets. The production shape when
    // the corpus is banded once and increments arrive forever.
    "q114_incremental_lsh" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
      val inc = base.select((col("doc_id") + 1000000000).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(array_join(sort_array(Text.tokens(col("text"))), " "))
          .as("text"))
      // persist: each signature table feeds the banded join and a
      // verification join (divergent consumers — the q27 rationale)
      def sg(df: DataFrame) = df.select(col("doc_id").as("id"),
          Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
        .select(col("id"), col("hs"),
          Dedup.minhashSignatureNative(col("hs"), 16).as("sig"))
        .persist()
      val so = sg(base); val sn = sg(inc)
      val both = so.unionByName(sn)
      Dedup.lshCandidatePairsIncremental(so, sn, "id", "sig", 4, 4)
        .join(sn.select(col("id").as("id_new"), col("hs").as("hsa")),
          Seq("id_new"))
        .join(both.select(col("id").as("id_match"), col("hs").as("hsb")),
          Seq("id_match"))
        .select(col("id_new"), col("id_match"),
          round(Dedup.jaccardHashed(col("hsa"), col("hsb")), 4).as("jac"))
    }),

    // Multimodal: the IMAGE sibling of q111 — each doc's text paints a
    // real 7×4 24-bit BMP (odd width, so every row carries 3 pad
    // bytes; written bottom-up as the format demands), and the default
    // FormatDecoder sniffs 'BM' and truly parses it: pixel features
    // only match the oracle if the parser un-flips rows, skips
    // padding, and reads BGR in order. Same no-shuffle payload
    // lifecycle as q111.
    "q113_bmp_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val pixels = Array.tabulate(28) { i =>
          val cp = text.charAt(i).toInt
          ((cp % 256) << 16) | (((cp * 7) % 256) << 8) | ((cp * 13) % 256)
        }
        (id, Multimodal.bmpBytes(7, 4, pixels))
      }
      Multimodal.decodeFeaturesBatched(media).toDF()
    }),

    // Multimodal: REAL format decode through the Decoder seam — each
    // doc's text synthesizes an actual RIFF/WAVE PCM16 payload
    // (samples are a fixed arithmetic function of the doc's code
    // points) executor-side, and the default FormatDecoder sniffs the
    // magic bytes and REALLY parses the container (chunk walk, fmt +
    // data, little-endian PCM16) — the oracle recomputes the decoded
    // sample features from the same construction arithmetic, so a
    // parse that misreads any header field or sample byte hash-fails.
    // Payloads are born and decoded inside one mapPartitions chain:
    // no shuffle ever carries the binary column.
    "q111_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val n = math.min(text.length, 64)
        val samples = Array.tabulate(n)(i =>
          (((text.charAt(i).toInt * 37 + i) % 4096) - 2048).toShort)
        (id, Multimodal.wavBytes(samples))
      }
      Multimodal.decodeFeaturesBatched(media).toDF()
    }),

    // Multimodal: image RESIZE stage — q113's 7×4 BMP payloads run the
    // full decode → nearest-neighbor 3×2 downsample → re-encode →
    // re-decode round trip (two independent parses of two different
    // real BMP layouts: the 7-wide input rows carry 3 pad bytes, the
    // re-encoded 3-wide rows carry 3 again). Features come from the
    // RESIZED pixels, so the oracle's integer source-index map (x·7/3,
    // y·4/2) must match the engine's resampler exactly.
    "q115_bmp_resize" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val pixels = Array.tabulate(28) { i =>
          val cp = text.charAt(i).toInt
          ((cp % 256) << 16) | (((cp * 7) % 256) << 8) | ((cp * 13) % 256)
        }
        (id, Multimodal.bmpBytes(7, 4, pixels))
      }
      Multimodal.decodeFeaturesBatched(
        Multimodal.resizeImagesBatched(media, 3, 2)).toDF()
    }),

    // Multimodal: audio FRAME features — q111's WAV payloads decoded and
    // split into fixed 16-sample frames (trailing partial dropped), one
    // integer feature row per frame: zero-crossing count + Σ|sample|
    // energy. The frame-sample + feature-extract stages of an audio
    // training pipeline, fused with the decode in one mapPartitions —
    // only (doc, frame, int, long) rows ever leave the scan stage.
    "q116_wav_frames" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val n = math.min(text.length, 64)
        val samples = Array.tabulate(n)(i =>
          (((text.charAt(i).toInt * 37 + i) % 4096) - 2048).toShort)
        (id, Multimodal.wavBytes(samples))
      }
      Multimodal.wavFrameFeaturesBatched(media, 16).toDF()
    }),

    // Multimodal: Walsh–Hadamard SEQUENCY energy — q111's WAV payloads
    // decoded, framed (16 samples), and transformed against the ±1
    // square-wave bases entirely in integer arithmetic; per (doc, k)
    // one Σc_k² energy row. The spectral-feature stage of an audio
    // pipeline with none of FFT's cross-engine float drift; the oracle
    // recomputes every coefficient from the definition
    // c_k = Σ_j s_j·(−1)^popcount(k AND j).
    "q208_wht_energy" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val n = math.min(text.length, 64)
        val samples = Array.tabulate(n)(i =>
          (((text.charAt(i).toInt * 37 + i) % 4096) - 2048).toShort)
        (id, Multimodal.wavBytes(samples))
      }
      Multimodal.wavSequencyEnergyBatched(media, 16).toDF()
    }),

    // Multimodal: VIDEO frame-sampling — each doc's text paints a
    // 4-frame 7×4 "video" (an MBMP container: length-prefixed real BMP
    // frames, MJPEG's shape), and the sampler walks the container,
    // pixel-decodes ONLY every 2nd frame (frames 0 and 2 — un-sampled
    // frames are never parsed), and emits the decoded features per
    // sampled frame. Frame f's pixels derive from the text with an
    // f-offset, so a sampler that miscounts offsets, strides, or
    // decodes the wrong frame hash-fails.
    "q122_video_frames" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[(Long, String)]
      val media = docs.map { case (id, text) =>
        val frames = (0 until 4).map { f =>
          val pixels = Array.tabulate(28) { i =>
            val cp = text.charAt(i).toInt
            (((cp + f) % 256) << 16) | (((cp * 7 + f) % 256) << 8) |
              ((cp * 13 + f) % 256)
          }
          Multimodal.bmpBytes(7, 4, pixels)
        }
        (id, Multimodal.mbmpBytes(frames))
      }
      Multimodal.videoFrameSampleBatched(media, 2).toDF()
    }),

    // Text: adjacent-bigram PMI collocations — the phrase-mining pass;
    // bigram extraction is zero-shuffle, the (a,b) aggregate is the
    // only corpus-sized exchange, unigrams ride back broadcast.
    "q100_bigram_pmi" -> ((s, dir) =>
      Text.bigramPmi(t(s, dir, "documents"), col("text"), 10L)),

    // Quality: PSI distribution drift between two order populations —
    // fixed bins, exact integer histograms, each (p−q)·ln(p/q) term
    // snapped to ×1e6 BIGINT before the sum (order-free, the q72
    // pattern); bins counted only where BOTH sides have mass.
    "q90_psi_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def hist(par: Int, as: String) =
        o.filter(pmod(col("o_orderkey"), lit(2)) === par)
          .groupBy(floor(col("o_totalprice") / 20000).cast("long").as("bin"))
          .agg(count(lit(1)).as(as))
      Quality.psiBetween(hist(0, "n_r"), hist(1, "n_c"))
    }),

    // Quality: CUSUM drift per symbol (sequential ingest monitor) —
    // integer-cent values, exact integer mean, fold state packed as
    // S·2^20 + alarms so the whole recursion is bit-identical integer
    // arithmetic on any engine.
    "q86_cusum_drift" -> ((s, dir) => {
      val b = Merge.keepLatestInSeries(bars(s, dir), Seq("symbol"), Seq("d"),
        struct(col("ord"), col("px"), col("vol")))
      Quality.cusumDrift(b, col("symbol"), col("d"),
        round(col("px") * 100).cast("long"), 50L, 500L)
        .withColumnRenamed("series", "symbol")
    }),

    // Quality: referential integrity — orphan fact rows whose order key
    // has no parent; one anti-join, two exact counts.
    "q87_ri_orphans" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").select(col("o_orderkey"))
      l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphan_rows"),
          countDistinct(col("l_orderkey")).as("n_orphan_keys"))
    }),

    // Text: blocked fuzzy match (entity resolution) — part names with
    // one char deleted at a key-determined position probe the clean
    // names through the (first char, ±2 length) equi-join blocking;
    // best match = min((dist, id)) struct: one exact lexicographic min,
    // valid for any id domain (arithmetic dist·K+id packing silently
    // corrupts once ids reach K — ruled out by construction here).
    "q85_fuzzy_match" -> ((s, dir) => {
      val parts = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      val len = length(col("p_name"))
      val k = (col("p_partkey") % len).cast("int")
      val probes = parts.select((col("p_partkey") + 2000000000).as("probe_id"),
        concat(col("p_name").substr(lit(1), k),
          col("p_name").substr(k + 2, len)).as("pn"))
      val m = Text.fuzzyJoin(probes, parts, "probe_id", col("pn"),
        "p_partkey", col("p_name"), 2)
      probes.select(col("probe_id"))
        .join(m.groupBy(col("probe_id"))
          .agg(count(lit(1)).as("n_matches"),
            min(struct(col("dist").cast("long").as("d"),
              col("ref_id").cast("long").as("r"))).as("bk")),
          Seq("probe_id"), "left")
        .select(col("probe_id"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          coalesce(col("bk.d"), lit(-1L))
            .as("best_dist"),
          coalesce(col("bk.r"), lit(-1L)).as("best_ref"))
    }),

    // Series: RANGE-frame rolling window — a 7-CALENDAR-DAY mean per
    // symbol (range ≠ rows when dates gap or repeat). Prices snap to
    // integer cents before the frame sum, so the windowed aggregate is
    // exact and order-free on any engine.
    "q83_range_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("symbol")).orderBy(col("day"))
        .rangeBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
      bars(s, dir)
        .withColumn("day", datediff(col("d"), lit("1970-01-01").cast("date")))
        .withColumn("px_c", round(col("px") * 100).cast("long"))
        .select(col("symbol"), col("d"),
          count(lit(1)).over(w).as("n_win"),
          round((sum(col("px_c")).over(w).cast("double") / 100.0 /
            count(lit(1)).over(w)).cast("decimal(20,10)"), 4)
            .cast("double").as("avg7"))
    }),

    // Reshape: dense-rank top-3 per group — ties keep ALL rows at a
    // rank (the output set is deterministic even when row_number would
    // not be), one shuffle on the grouping key.
    "q84_topn_per_group" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"),
          dense_rank().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").desc)).as("rk"))
        .filter(col("rk") <= 3)),

    // Events: strict ordered funnel view → click → purchase — deepest
    // step per user via a fold over the time-sorted encoded sequence;
    // one shuffle on user, histogram-then-join for the cumulative.
    "q77_funnel" -> ((s, dir) =>
      Events.funnelCounts(t(s, dir, "events"), col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))),

    // Events: conversion-window funnel — steps count only within 24h
    // of the user's first view (first-touch anchor); the fold packs
    // (anchor_us, reached) into one BIGINT decoded by bit shifts, so
    // the recursion is exact integer arithmetic on both engines.
    "q89_windowed_funnel" -> ((s, dir) =>
      Events.funnelCountsWithin(t(s, dir, "events"), col("user_id"),
        col("ts"), col("event_type"), Seq("view", "click", "purchase"),
        86400L)),

    // Events: 30-minute-gap sessionization (lag marker + running sum
    // sharing one window spec → one exchange, one sort), aggregated per
    // session. Session extent is reported via exact event ids, NOT raw
    // epoch micros: the testdata's ns timestamps truncate to µs
    // differently per engine (±1µs), which is harmless against the
    // 1800s gap but would leak into a duration column.
    "q78_sessionize" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events"), col("user_id"), col("ts"),
        col("event_id"), 1800L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("value_sum"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))),

    // Events: weekly cohort retention triangle — first-event cohort via
    // an unordered min window (no join back), distinct activity weeks.
    "q79_cohort_retention" -> ((s, dir) =>
      Events.cohortRetention(t(s, dir, "events"), col("user_id"), col("ts"))),

    // Profiling: robust median/MAD outlier gate per order priority —
    // the estimator outliers can't drag; multiply-form flag, no
    // division, stats broadcast back between the two passes.
    "q80_robust_outliers" -> ((s, dir) =>
      Profile.robustOutliers(t(s, dir, "orders"),
        col("o_orderpriority"), col("o_totalprice"), 3.0)
        .select(col("g"), col("n"),
          round(col("med").cast("decimal(20,10)"), 4).cast("double").as("med"),
          round(col("mad").cast("decimal(20,10)"), 4).cast("double").as("mad"),
          col("n_outliers"))),

    // Dedup: exact (fingerprint hash-groupBy) over a corpus with planted
    // exact duplicates — keep-first semantics.
    "q26_exact_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val dup = d.unionByName(
        d.select((col("doc_id") + 1000000000).as("doc_id"), col("text")))
      dup.groupBy(Text.fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
    }),

    // Dedup: MinHash(16) + LSH(4 bands × 4 rows) candidate pairs with
    // verified Jaccard — finds the planted near-dups without n² compares.
    // Shingling, hashing and the signature are the native expressions
    // (one JVM pass per doc); verification intersects HASH sets, exact
    // up to md5-60-bit collisions like the inverted Jaccard join.
    "q27_minhash_lsh" -> ((s, dir) => {
      // persist: the signature table feeds the LSH self-join and both
      // verification joins — without it the tokenize+shingle+hash chain
      // re-runs once per reference (4 scans at sf0.1).
      val sig = docsDup(s, dir).select(col("doc_id").as("id"),
          Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
        .select(col("id"), col("hs"),
          Dedup.minhashSignatureNative(col("hs"), 16).as("sig"))
        .persist()
      Dedup.lshCandidatePairs(sig, "id", "sig", 4, 4)
        .join(sig.select(col("id").as("ia"), col("hs").as("hsa")), col("id_a") === col("ia"))
        .join(sig.select(col("id").as("ib"), col("hs").as("hsb")), col("id_b") === col("ib"))
        .select(col("id_a"), col("id_b"),
          round(Dedup.jaccardHashed(col("hsa"), col("hsb")), 4).as("jac"))
    }),

    // Dedup/eval: EMPIRICAL LSH audit — q206 plans a banding from the
    // analytic S-curve; this MEASURES the production 4×4 banding on a
    // deterministic half-corpus: candidate pairs vs exact-Jaccard
    // truth (the recall-complete prefix kernel), empirical recall and
    // wasted-verify rate. The sample is keyed on the BASE id so each
    // planted near-dup pair survives or drops atomically — recall on
    // a pair sample is unbiased, the standard audit economics at
    // corpus scales where exact truth over everything is unaffordable.
    "q213_lsh_audit" -> ((s, dir) => {
      val d = docsDup(s, dir)
        .filter((col("doc_id") % 1000000000) % 4 === 0)
        .select(col("doc_id").as("id"),
          Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs"))
        .filter(size(col("hs")) > 0)
        .persist() // feeds the signature chain AND the exact kernel
      val sig = d.select(col("id"),
        Dedup.minhashSignatureNative(col("hs"), 16).as("sig"))
      val truth = Dedup.jaccardPairsPrefixHashed(d, "id", "hs", 0.5)
        .select(col("id_a"), col("id_b"))
      val cand = Dedup.lshCandidatePairs(sig, "id", "sig", 4, 4)
      // one full-outer pair-key join carries all three counts into a
      // single aggregate — no semi-join pass, no per-count crossJoins
      cand.withColumn("is_cand", lit(1L))
        .join(truth.withColumn("is_true", lit(1L)),
          Seq("id_a", "id_b"), "full")
        .agg(sum(coalesce(col("is_true"), lit(0L))).as("n_truth"),
          sum(coalesce(col("is_cand"), lit(0L))).as("n_cand"),
          sum(when(col("is_cand").isNotNull && col("is_true").isNotNull,
            1L).otherwise(0L)).as("n_hits"))
        .select(lit(4).as("bands"), lit(4).as("rows_per_band"),
          col("n_truth"), col("n_cand"), col("n_hits"),
          when(col("n_truth") === 0, lit(null)).otherwise(
            round((col("n_hits").cast("double") /
              col("n_truth").cast("double")).cast("decimal(20,10)"), 6)
              .cast("double")).as("recall"),
          when(col("n_cand") === 0, lit(null)).otherwise(
            round(((col("n_cand") - col("n_hits")).cast("double") /
              col("n_cand").cast("double")).cast("decimal(20,10)"), 6)
              .cast("double")).as("waste_rate"))
    }),

    // Quality/stats: per-source drift screen under FDR CONTROL — every
    // source's quality distribution KS-tested against the rest of the
    // corpus (leave-one-out, grid-derived rest ECDF — one pass, no
    // m× corpus replication), Smirnov asymptotic p = 2e^(−2D²n₁n₂/n),
    // then Benjamini–Hochberg at α=0.05 decides WHICH sources to flag
    // — the multiple-testing gate 20 simultaneous screens need.
    "q214_drift_fdr" -> ((s, dir) => {
      val ks = Quality.ksLeaveOneOut(
        t(s, dir, "documents").select(col("source"), col("text")),
        col("source"),
        round(Text.qualityScore(col("text")) * 1e4).cast("long"),
        1000L)
      val tests = ks.withColumn("p",
        least(lit(1.0), round((lit(2.0) *
          exp(lit(-2.0) * col("ks") * col("ks") *
            col("n1").cast("double") * col("n2").cast("double") /
            (col("n1") + col("n2")).cast("double")))
          .cast("decimal(20,10)"), 6).cast("double")))
      Profile.bhFdr(tests, col("p"), 0.05, col("g"))
        .withColumnRenamed("g", "source")
    }),

    // Dedup: n-gram Jaccard near-dup pairs via PPJoin-style prefix
    // filtering over the hashed shingle index — the skew-proof path
    // (hot shingles never make a prefix, so no C(df,2) blowup; output
    // identical to the plain inverted join, TextDedupSpec asserts it).
    "q28_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairsPrefixHashed(
        docsDup(s, dir).select(col("doc_id").as("id"),
          Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs")),
        "id", "hs", 0.5)),

    // Dedup: SimHash(32) near-dup pairs, banded join (exact for d<=3 by
    // pigeonhole over 4 byte-bands).
    "q29_simhash" -> ((s, dir) => {
      val sk = docsDup(s, dir).select(col("doc_id").as("id"),
        Dedup.simhash(Text.tokens(col("text")), 32).as("sk"))
        .persist() // sketch table feeds the banded self-join twice
      val bands = sk.select(col("id"), col("sk"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("sk"), 8 * b).bitwiseAND(255)): _*)).as(Seq("band", "bval")))
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          Dedup.hamming(col("a.sk"), col("b.sk")).as("hamming"))
        // hamming is already known per band-collision: filtering BEFORE
        // the distinct shrinks the dedup exchange to only the true
        // near-dup pairs (~50× fewer rows than distinct-then-filter)
        .filter(col("hamming") <= 3)
        .distinct()
    }),

    // Dedup: embedding-cosine near-dup pairs (planted perturbed copies).
    "q30_embed_neardup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val pert = e.select((col("id") + 1000000000).as("id"),
        transform(col("vec"), (x, i) =>
          when(i === 0, x.cast("double") + 0.5).otherwise(x.cast("double"))).as("vec"))
      Similarity.cosineNearDupPairsExact(
        e.select(col("id"), transform(col("vec"), x => x.cast("double")).as("vec"))
          .unionByName(pert), 0.9)
    }),

    // Dedup: semantic dedup AUDIT variant — embedding-cosine near-dup
    // pairs via q30's blocked EXACT kernel (intrinsically all-pairs;
    // the ground-truth role) → duplicate clusters → keep the min-id
    // canonical per cluster. The scale PIPELINE path is q123, which
    // swaps in the IVF-cell-blocked candidate kernel and measures its
    // recall against this exact truth. The oracle recomputes clusters
    // via recursive transitive closure (q67 pattern); the 1-row
    // aggregate fingerprints the surviving set.
    "q73_semantic_dedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      val pert = t(s, dir, "embeddings").select((col("vec_id") + 1000000000).as("id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x.cast("double") + 0.5).otherwise(x.cast("double"))).as("vec"))
      val all = e.unionByName(pert)
      val pairs = Similarity.cosineNearDupPairsExact(all, 0.9)
        .select(col("id_a"), col("id_b"))
      Dedup.dedupByClusters(all.select(col("id")), "id", pairs)
        .agg(count(lit(1)).as("n_kept"),
          sum(col("id")).cast("long").as("id_sum"))
    }),

    // Dedup: semantic dedup PIPELINE path — the ANN-blocked batch
    // kernel (IVF multi-probe cells → same-cell candidate equi-join →
    // exact cosine verify; Σ occupancy² work, no packed-block cross
    // join) feeds the cluster dedup, and the q73/q30 exact kernel
    // runs alongside as ground truth for a measured pair-recall
    // column. One audit row: surviving-set fingerprint under the
    // blocked pairs + blocked/exact pair counts + recall.
    "q123_semantic_dedup_ann" -> ((s, dir) => {
      val all = q123Vectors(s, dir)
      // persist: the blocked pair set feeds BOTH the cluster dedup
      // (evaluated eagerly inside duplicateClusters' checkpoint loop,
      // which leaves ownership with us) and the n_pairs_blocked audit
      // column — without the cache the whole probe+join+verify pipeline
      // runs twice; the harnesses clear caches per query
      val blocked = q123BlockedPairs(s, dir).persist()
      val exact = Similarity.cosineNearDupPairsExact(all, 0.9)
        .select(col("id_a"), col("id_b"))
      Dedup.dedupByClusters(all.select(col("id")), "id", blocked)
        .agg(count(lit(1)).as("n_kept"),
          sum(col("id")).cast("long").as("id_sum"))
        .crossJoin(blocked.agg(count(lit(1)).as("n_pairs_blocked")))
        .crossJoin(exact.agg(count(lit(1)).as("n_pairs_exact")))
        .withColumn("pair_recall",
          round((col("n_pairs_blocked").cast("double") /
            col("n_pairs_exact").cast("double")).cast("decimal(20,10)"), 4)
            .cast("double"))
    }),

    // Similarity: brute-force cosine top-5 neighbors for a query batch.
    "q31_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.bruteForceTopK(e.filter(col("id") < 20), e, 5)
    }),

    // Similarity: LSH-bucketed ANN (8 hyperplanes → 256 buckets).
    "q32_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      Similarity.lshTopK(e, AnnPlanes, 5)
    }),

    // Multimodal: binary payload plumbing — metadata sniff + frame
    // sampling + per-frame stub feature, all without decoding.
    "q33_multimodal" -> ((s, dir) => {
      val blob = col("text").cast("binary")
      val frames = Multimodal.sampleFrames(blob, 64, 32)
      // per-row hex/frame extraction on a 1-task scan — spread first
      Multimodal.withBlobMetadata(
          t(s, dir, "documents").select(col("doc_id"), col("text"))
            .repartition(s.sessionState.conf.numShufflePartitions), blob)
        .withColumn("n_frames", size(frames))
        .withColumn("f0_checksum",
          when(size(frames) > 0,
            Multimodal.frameChecksum(element_at(frames, 1), 32)))
        .select("doc_id", "n_bytes", "header_hex", "n_frames", "f0_checksum")
    }),

    // Embedding stats: per-label per-dimension centroids (posexplode →
    // (label, dim) hash-agg; the vector-column group-aggregate shape).
    "q34_embed_centroids" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("x").cast("double")), 6).as("avg_val"),
          count(lit(1)).as("n"))),

    // A9/O2: failure accumulation with truncated sample list — the
    // reference's fail_list[:N] report shape (collect_list + sort + slice).
    "q35_fail_list" -> ((s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_acctbal") < 0)
        .groupBy(col("c_nationkey").as("market"))
        .agg(count(lit(1)).as("n_fails"),
          concat_ws(",",
            slice(sort_array(collect_list(col("c_name"))), 1, 5)).as("sample"))),

    // S8: the dual SQL surface — tables registered as views, the query
    // expressed in ANSI SQL via spark.sql (identical text to the oracle).
    "q36_sql_surface" -> ((s, dir) => {
      Tables.registerViews(s, dir, Seq("customer", "nation", "orders"))
      s.sql(
        """SELECT n_name, count(*) AS n_orders,
          |  round(sum(o_totalprice), 2) AS total
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin)
    }),

    // Aggregate extension: hierarchical ROLLUP totals (subtotal rows
    // carry NULL group keys, matching ANSI GROUP BY ROLLUP).
    "q40_rollup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .rollup(col("c_nationkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // Aggregate extension: exact interpolated quantiles per group.
    "q41_quantiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"),
          count(lit(1)).as("n"))),

    // Similarity: IVF-bucketed ANN (16 data-derived centroids, nprobe=1).
    "q37_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("vec_id"), col("embedding").as("vec"))
      val centroids = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("vec").as("cvec"))
      Similarity.ivfTopK(e.select(col("id"), col("vec")), centroids, 5)
    }),

    // Text: BPE-ish subword token counting vs whitespace words — the
    // LLM-corpus budgeting measure.
    "q38_bpe_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          sum(Text.bpeTokenCount(col("text"))).cast("long").as("total_bpe"),
          sum(Text.tokenCount(col("text"))).cast("long").as("total_words"),
          round(avg(Text.bpeTokenCount(col("text"))), 2).as("avg_bpe"))),

    // Text: order-sensitive rolling-hash document fingerprint.
    "q39_rolling_hash" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Text.rollingHash(Text.tokens(col("text"))).as("rh"))),

    // V3: the OHLC-invariant gate on resampled bars — closes inflated
    // 1.5x for every 7th symbol so the violation set is non-trivial.
    "q42_ohlc_gate" -> ((s, dir) => {
      val weekly = Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.weekEndFri(col("d")), col("px"), col("vol"), col("ord"))
        .withColumn("close",
          when(pmod(col("symbol"), lit(7)) === 0, col("close") * 1.5)
            .otherwise(col("close")))
      Quality.ohlcViolationKeys(weekly, col("symbol"), col("low"),
        col("close"), col("high"))
    }),

    // Streaming surface in batch clothing: session windows (30-minute
    // inactivity gap) over the event feed — the same sessionRollup the
    // streaming deployment runs, goldened against gaps-and-islands SQL.
    "q43_session_windows" -> ((s, dir) => {
      val sess = graft.streaming.Streams.sessionRollup(
        t(s, dir, "events"), "user_id", "30 minutes")
      sess.select(
        unix_timestamp(col("session_start")).as("s_start"),
        unix_timestamp(col("session_end")).as("s_end"),
        col("user_id"), col("n"), col("value_sum"))
    }),

    // §2.12 typed-Aggregator surface: ordered first/last per symbol via
    // the Dataset API. The (symbol, ord) pre-aggregate makes the winner
    // unique before the typed fold (the synthetic lineitem has colliding
    // ordinals — FIXTURES.md), so both engines pick identical rows.
    "q44_typed_agg" -> ((s, dir) => {
      import s.implicits._
      val uniq = bars(s, dir).groupBy(col("symbol"), col("ord"))
        .agg(max(col("px")).as("px"))
      uniq.select(col("symbol"), col("ord"), col("px"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues(r => graft.functions.TypedAggs.OrdVal(r._2, r._3))
        .agg(graft.functions.TypedAggs.firstByOrd.toColumn.name("first_px"),
          graft.functions.TypedAggs.lastByOrd.toColumn.name("last_px"))
        .toDF("symbol", "first_px", "last_px")
    }),

    // A7: per-market success-rate audit row (round(rate, 2) parity with
    // the run-audit formula, downloader audit + Pipeline.writeSlice).
    "q45_success_rate" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("market"))
        .agg(
          count(lit(1)).as("total"),
          sum(when(col("c_acctbal") >= 0, 1).otherwise(0)).as("success"))
        .withColumn("rate",
          round(col("success") * lit(100.0) / col("total"), 2))),

    // Dedup: cluster formation — connected components over a chained
    // exact-dup pair stream (3 copies per doc, edges chain consecutive
    // ids, so components need MULTI-HOP label propagation); component
    // id = min member = the canonical representative to keep.
    "q50_dup_clusters" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val dup = d
        .unionByName(d.select((col("doc_id") + 1000000000).as("doc_id"), col("text")))
        .unionByName(d.select((col("doc_id") + 2000000000).as("doc_id"), col("text")))
      val fp = dup.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy("doc_id")
      val edges = fp.withColumn("prev", lag(col("doc_id"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("id_a"), col("doc_id").as("id_b"))
      Dedup.duplicateClusters(edges)
    }),

    // Beyond-reference: backward as-of join — the latest 'view' at or
    // before each 'purchase' per user (union-and-window: ONE shuffle on
    // the key, no range-join candidate explosion). Oracle: DuckDB's
    // native ASOF LEFT JOIN.
    "q52_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val trades = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("trade_v"))
      val quotes = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value").as("quote_v"))
      Asof.joinAsOf(trades, quotes, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("user_id"), col("trade_v"),
          col("quote_v"))
    }),

    // Beyond-reference: rolling per-symbol indicators over the daily
    // series — 20-bar moving average, 10-bar rate of change, running-max
    // drawdown. One window partitioning serves all three frames; only
    // exactly-reproducible aggregates (avg/max/lag), snapped through
    // decimal(20,10) before the 4-place round.
    "q53_rolling_indicators" -> ((s, dir) => {
      // dedup INSIDE the symbol partitioning (keepLatestInSeries): the
      // dedup and all three indicator windows share one exchange
      val b = Merge.keepLatestInSeries(bars(s, dir), Seq("symbol"), Seq("d"),
        struct(col("ord"), col("px"), col("vol")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy("d")
      val w20 = w.rowsBetween(-19, 0)
      val wRun = w.rowsBetween(Long.MinValue, 0)
      b.select(col("symbol"), col("d"),
        round(avg(col("px")).over(w20).cast("decimal(20,10)"), 4)
          .cast("double").as("sma20"),
        round((col("px") / lag(col("px"), 10).over(w) - 1)
          .cast("decimal(20,10)"), 4).cast("double").as("roc10"),
        round((col("px") / max(col("px")).over(wRun) - 1)
          .cast("decimal(20,10)"), 4).cast("double").as("drawdown"))
    }),

    // Beyond-reference: pivot the event feed to one column per event
    // type (explicit value list — a single pass, no values-discovery
    // job; each cell a rounded sum).
    "q54_event_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(round(sum(col("value")), 2))),

    // Beyond-reference: per-vector int8 quantization of the embedding
    // column (symmetric, scale = 127/max|x|) — the storage-halving step
    // of a large-scale ANN pipeline. floor(x+0.5) not round(): floor is
    // exact in IEEE so both engines pick identical integers.
    "q55_embed_quantize" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          Cols.bound(array_max(transform(col("embedding"),
            x => abs(x))).cast("double")) { amax =>
            when(amax === 0d, array_repeat(lit(0L), size(col("embedding"))))
              .otherwise(transform(col("embedding"),
                x => floor(x.cast("double") * (lit(127.0) / amax) + 0.5)
                  .cast("long")))
          }.as("q"))
        .select(col("vec_id"),
          array_min(col("q")).as("q_min"), array_max(col("q")).as("q_max"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          size(filter(col("q"), x => abs(x) === 127L)).as("n_sat"))),

    // Beyond-reference: engine-portable HyperLogLog — approximate
    // distinct parts per return flag next to the exact count. The
    // register table is the shuffled payload (≤ m tiny rows per group),
    // never the raw values; registers are md5-derived so any engine
    // reproduces the estimate to the rounded digit.
    "q56_hll_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_partkey"))
      val approx = Sketch.hllDistinct(li, Seq("flag"), col("l_partkey"))
      val exact = li.groupBy("flag")
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      exact.join(approx, "flag")
    }),

    // Beyond-reference: one-job column profiler (ANALYZE) — per-column
    // row/null/distinct counts + numeric min/max via a single melt +
    // aggregate, not a job per column.
    "q57_profile" -> ((s, dir) =>
      Profile.profile(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))),

    // Beyond-reference: the profile-at-every-ingest variant of q57 —
    // same melt + single aggregate, but distinct cardinality from the
    // mergeable HLL sketch (no (col,value) distinct shuffle; state is
    // ≤ cols × 4096 registers). The oracle recomputes the identical
    // register table and estimate arithmetic in DuckDB (q56 lockstep).
    "q68_profile_sketched" -> ((s, dir) =>
      Profile.profileSketched(t(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))),

    // Beyond-reference: per-symbol EMA(α=0.1) — the recursive indicator
    // no window frame expresses. One hash-collect per symbol, one
    // ordered fold; identical fold order on both engines makes the
    // doubles bit-identical with NO rounding. Scale: state is one
    // array per symbol (bounded series), shuffle on the symbol key.
    "q58_ema" -> ((s, dir) => {
      val b = Merge.keepLatestInSeries(bars(s, dir), Seq("symbol"), Seq("d"),
        struct(col("ord"), col("px"), col("vol")))
      b.groupBy(col("symbol"))
        .agg(sort_array(collect_list(struct(col("d"), col("px")))).as("ser"))
        .select(col("symbol"), size(col("ser")).as("n_days"),
          Cols.bound(transform(col("ser"), r => r("px"))) { px =>
            aggregate(slice(px, lit(2), size(px) - 1), element_at(px, 1),
              (acc, x) => lit(0.1) * x + lit(0.9) * acc)
          }.as("ema"))
    }),

    // Beyond-reference: CUBE over (nation, order status) — all four
    // grouping-set combinations in one pass (q40 covers ROLLUP).
    "q59_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .cube(col("c_nationkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))),

    // The dedup pipeline END-TO-END: pair stream → connected components
    // → drop non-canonical members (anti-join) → corpus stats. The
    // oracle derives survivors independently (min doc per fingerprint
    // group), so the whole clusters+anti-join chain is value-checked,
    // not just the cluster labels (q50).
    "q60_dedup_pipeline" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
      val dup = d
        .unionByName(d.select((col("doc_id") + 1000000000).as("doc_id"),
          col("text"), col("lang")))
        .unionByName(d.select((col("doc_id") + 2000000000).as("doc_id"),
          col("text"), col("lang")))
      val fp = dup.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy("doc_id")
      val edges = fp.withColumn("prev", lag(col("doc_id"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("prev").as("id_a"), col("doc_id").as("id_b"))
      Dedup.dedupByClusters(dup, "doc_id", edges)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(Text.tokenCount(col("text"))).cast("long").as("total_tokens"))
    }),

    // Beyond-reference: pairwise monthly-return correlation over the
    // top-20 symbols by volume — the quant correlation matrix. Pearson
    // from RAW SUMS (not the Welford-based corr() builtin, whose
    // update order differs per engine); with returns ≤ |0.5| over ~70
    // periods the sum noise is ~1e-15, far under the decimal snap.
    "q61_return_corr" -> ((s, dir) => {
      val monthly = Resample.ohlc(bars(s, dir), col("symbol"),
        Resample.monthEnd(col("d")), col("px"), col("vol"), col("ord"))
      val rets = Resample.periodReturn(monthly)
        .filter(col("return").isNotNull)
        .select(col("symbol"), col("period"), col("return").as("ret"))
      // Top-20 via orderBy+limit → TakeOrderedAndProject: every partition
      // computes its own top-20 and only those reach the driver-side
      // merge — fully parallel. (A row_number over a global Window here
      // funnels ALL per-symbol aggregates through ONE task; it was the
      // codebase's only unpartitioned window.) Tiebreak (v desc, symbol)
      // keeps the selection deterministic.
      val top = bars(s, dir).groupBy(col("symbol"))
        .agg(round(sum(col("vol")), 2).as("v"))
        .orderBy(col("v").desc, col("symbol"))
        .limit(20).select(col("symbol"))
      val r = rets.join(broadcast(top), "symbol")
      val pairs = r.as("a").join(r.as("b"),
          col("a.period") === col("b.period") &&
            col("a.symbol") < col("b.symbol"))
        .select(col("a.symbol").as("s1"), col("b.symbol").as("s2"),
          col("a.ret").as("x"), col("b.ret").as("y"))
      pairs.groupBy(col("s1"), col("s2"))
        .agg(count(lit(1)).as("n_periods"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("s1"), col("s2"), col("n_periods"),
          Cols.bound(col("n_periods").cast("double")) { n =>
            Cols.bound(sqrt(n * col("sxx") - col("sx") * col("sx")) *
              sqrt(n * col("syy") - col("sy") * col("sy"))) { den =>
              when(den > 0,
                round(((n * col("sxy") - col("sx") * col("sy")) / den)
                  .cast("decimal(20,10)"), 4).cast("double"))
            }
          }.as("corr"))
    }),

    // Sampling: per-stratum deterministic rates — downsample dominant
    // languages, keep the tail whole (corpus rebalancing).
    "q62_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedHashSample(t(s, dir, "documents"), col("doc_id"),
        col("lang"), Map("en" -> 20, "zh" -> 50), 100)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(Text.tokenCount(col("text"))).cast("long").as("total_tokens"))),

    // Beyond-reference: engine-portable count-min sketch — point
    // frequencies of probe terms from a d×w register table of exact
    // integer sums (state ≤ d·w cells regardless of stream size,
    // mergeable cellwise; never underestimates). Next to each estimate:
    // the exact count it upper-bounds.
    "q63_cm_frequencies" -> ((s, dir) => {
      val terms = t(s, dir, "documents")
        .select(explode(Text.tokens(col("text"))).as("term"))
      val probes = s.createDataFrame(
        Seq(Tuple1("the"), Tuple1("data"), Tuple1("market"), Tuple1("zzznope")))
        .toDF("term")
      val est = Sketch.cmEstimate(Sketch.cmRegisters(terms, col("term")),
        probes, "term")
      val exact = probes.join(terms.groupBy(col("term"))
          .agg(count(lit(1)).as("cnt")), Seq("term"), "left")
        .select(col("term"), coalesce(col("cnt"), lit(0L)).as("n_exact"))
      est.join(exact, "term")
    }),

    // Beyond-reference: mergeable histogram quantiles — the one-pass
    // percentile path for 100 TB (exact percentiles need a full sort;
    // q41 keeps the exact face). Registers are exact integer counts, so
    // the interpolated estimate is deterministic on any engine.
    "q64_hist_quantiles" -> ((s, dir) =>
      Sketch.histQuantiles(
        Sketch.histRegisters(t(s, dir, "orders"), Seq("o_orderstatus"),
          col("o_totalprice"), 1000.0),
        Seq("o_orderstatus"), 1000.0, Seq(0.5, 0.95))),

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

    // Beyond-reference: Bloom-filter membership — pre-filter probes
    // against a set too large to broadcast exactly, zero false
    // negatives (the cheap side of an ingest-dedup anti-join).
    "q66_bloom_membership" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val reg = Sketch.bloomRegisters(ids, col("doc_id"))
      val probes = s.range(0, 1200).select(col("id").as("doc_id"))
      Sketch.bloomMightContain(reg, probes, "doc_id")
        .groupBy(col("might_contain"))
        .agg(count(lit(1)).as("n"))
    }),

    // Beyond-reference: keep-BEST dedup — per near-dup cluster keep the
    // member with the most BPE tokens (the planted near-dups carry two
    // extra tokens, so they beat their base copies), ties to smaller
    // id. The oracle recomputes clusters independently via a recursive
    // transitive closure and picks winners with a window.
    "q67_dedup_keep_best" -> ((s, dir) => {
      // three consumers re-derive the doubled corpus (shingling, the
      // winner join, the survivor semi-join) — cache the raw text once
      val dup = docsDup(s, dir).persist()
      val pairs = Dedup.jaccardPairsPrefixHashed(
        dup.select(col("doc_id").as("id"),
          Dedup.hashedShingles(Text.tokens(col("text")), 3).as("hs")),
        "id", "hs", 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.dedupByClustersBest(dup, "doc_id", pairs,
        Text.bpeTokenCount(col("text")))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("id_sum"))
    }),

    // Sampling: deterministic 30% hash sample (pure function of the
    // key — same rows on every run/engine), aggregated per language.
    "q51_hash_sample" -> ((s, dir) =>
      Sampling.hashSample(t(s, dir, "documents"), col("doc_id"), 30, 100)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(Text.tokenCount(col("text"))).cast("long").as("total_tokens"))),

    // Text: TF-IDF top-5 terms per document (explode -> tf/df hash
    // aggs -> term join -> broadcast corpus size -> per-doc top-k).
    "q49_tfidf" -> ((s, dir) =>
      Text.tfidfTopTerms(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", col("text"), 5)
        .withColumnRenamed("id", "doc_id")),

    // Stream-stream interval join in batch clothing: for every event,
    // count same-user events in the preceding 10 minutes (exclusive of
    // self) — the same intervalJoin the streaming deployment runs.
    "q48_interval_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val l = e.select(col("user_id"), col("ts").as("lts"))
      val r = e.select(col("user_id"), col("ts").as("rts"), col("value"))
      graft.streaming.Streams.intervalJoin(l, r, "user_id", "lts", "rts",
          watermark = "0 seconds", within = "10 minutes")
        .filter(col("rts") < col("lts")) // strict predecessors only
        .groupBy(col("l.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("value")), 2).as("pred_value_sum"))
    }),

    // Skew: two-stage salted aggregation over a 3-value (maximally hot)
    // grouping key — results must equal the plain aggregate exactly.
    "q47_salted_agg" -> ((s, dir) =>
      Skew.saltedSumCount(t(s, dir, "lineitem"),
          col("l_returnflag"), col("l_quantity"), 8)
        .select(col("key"), round(col("sum"), 2).as("qty_sum"),
          col("count").as("n"))),

    // P-dynamic: schema reconciliation on load — missing column appears
    // as typed null, drifted type casts back, target order projected.
    "q46_schema_reconcile" -> ((s, dir) => {
      val target = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("source_file",
          org.apache.spark.sql.types.StringType)))
      val drifted = t(s, dir, "events")
        .select(col("user_id").cast("int").as("user_id"),
          col("value").cast("string").as("value"))
      // count of null source_file proves the backfilled column exists
      // while keeping the aggregate hash-based (max(string) would force
      // a SortAggregate — needless sort at scale)
      Pipeline.reconcileSchema(drifted, target)
        .groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("value_sum"),
          sum(when(col("source_file").isNull, 1).otherwise(0)).as("n_null_sf"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_weekly_bars" -> ohlcSql(weekEndSqlFn),
    "q02_monthly_bars" -> ohlcSql("last_day(d)"),
    "q03_yearly_bars" -> ohlcSql("CAST(date_trunc('year', d) AS DATE)"),
    // `+ 0` normalizes IEEE -0.0 to +0.0: DuckDB's round preserves the
    // sign bit on a negative return that rounds to zero, Spark's
    // BigDecimal round does not — values compare equal but the driver's
    // byte-level hash diverges without the normalization.
    "q04_period_return" ->
      s"""SELECT symbol, period, close,
         |  round(close / lag(close) OVER (PARTITION BY symbol ORDER BY period) - 1, 4) + 0 AS "return"
         |FROM (${ohlcSql("last_day(d)")})""".stripMargin,

    "q05_gap_detect" ->
      s"""SELECT key, 'gap_' || CAST(max_gap AS VARCHAR) || 'd' AS reason FROM (
         |  SELECT symbol AS key, max(gap) AS max_gap FROM (
         |    SELECT symbol, date_diff('day',
         |      lag(d) OVER (PARTITION BY symbol ORDER BY d), d) AS gap
         |    FROM ($barsSql) WHERE d >= DATE '1996-01-01')
         |  GROUP BY symbol)
         |WHERE max_gap > 14""".stripMargin,

    "q06_dedup_keep_latest" ->
      s"""SELECT symbol, count(*) AS n_rows, round(sum(px), 2) AS px_sum FROM (
         |  SELECT * FROM (SELECT *, row_number() OVER (
         |    PARTITION BY symbol, d ORDER BY ord DESC, px DESC, vol DESC)
         |    AS rn FROM ($barsSql))
         |  WHERE rn = 1)
         |GROUP BY symbol""".stripMargin,

    "q07_upsert_batches" ->
      s"""WITH u AS (
         |  SELECT symbol, d, px, vol, ord, 0 AS version FROM ($barsSql)
         |  UNION ALL
         |  SELECT symbol, d, px * 2 AS px, vol, ord, 1 AS version
         |  FROM ($barsSql) WHERE ord % 7 = 0)
         |SELECT symbol, count(*) AS n_rows, round(sum(px), 2) AS px_sum FROM (
         |  SELECT * FROM (SELECT *, row_number() OVER (
         |    PARTITION BY ord ORDER BY version DESC, px DESC, symbol DESC,
         |      d DESC, vol DESC) AS rn FROM u) WHERE rn = 1)
         |GROUP BY symbol""".stripMargin,

    "q08_region_revenue" ->
      """SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q09_sector_coalesce" ->
      """SELECT coalesce(n_name, 'Other/Unknown') AS sector,
        |  count(*) AS n_customers
        |FROM customer LEFT JOIN
        |  (SELECT * FROM nation WHERE n_regionkey < 3) n
        |  ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    "q10_symbol_filters" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
        |WHERE length(p_name) >= 4
        |  AND NOT regexp_matches(p_name, '(?i)widget|gear')
        |  AND regexp_matches(p_type, '^[A-Za-z0-9]+$')
        |GROUP BY p_brand""".stripMargin,

    "q11_canonicalize" ->
      """SELECT lpad(CAST(s_suppkey AS VARCHAR), 6, '0') AS code,
        |  upper(trim(s_name)) AS uname,
        |  regexp_replace(s_name, '\D', '', 'g') AS digits,
        |  regexp_replace(lpad(CAST(s_suppkey AS VARCHAR), 6, '0'), '^0+', '') AS alt_code
        |FROM supplier""".stripMargin,

    "q12_route" ->
      """SELECT code,
        |  CASE WHEN starts_with(alt, '6') THEN alt || '.SS' ELSE alt || '.SZ' END AS symbol
        |FROM (
        |  SELECT code, regexp_replace(code, '^0+', '') AS alt FROM (
        |    SELECT lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS code FROM customer)
        |  WHERE substr(code, 1, 3) IN
        |    ('000','001','002','003','300','301','600','601','603','605','688'))""".stripMargin,

    "q13_null_normalize" ->
      """SELECT CASE WHEN lang IS NULL OR lower(trim(lang)) IN ('nan','n/a','')
        |  THEN 'Unknown' ELSE lang END AS lang_norm, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,

    "q14_summary_stats" ->
      s"""SELECT count(DISTINCT symbol) AS n_symbols, max(d) AS end_date,
         |  count(*) AS total_rows FROM ($barsSql)""".stripMargin,

    "q15_coverage" ->
      """SELECT market, actual, round(actual * 100.0 / 8, 2) AS coverage,
        |  CASE WHEN round(actual * 100.0 / 8, 2) >= 80 THEN 'OK' ELSE 'LOW' END AS status
        |FROM (SELECT c_nationkey AS market, count(*) AS actual
        |      FROM customer GROUP BY 1)""".stripMargin,

    "q16_union" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM (
        |  SELECT * FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL SELECT * FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL SELECT * FROM orders WHERE o_orderstatus = 'P')
        |GROUP BY o_orderstatus""".stripMargin,

    "q17_topk" ->
      """SELECT l_partkey AS symbol,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem GROUP BY 1
        |ORDER BY revenue DESC, symbol LIMIT 10""".stripMargin,

    "q18_validation_rejects" ->
      """SELECT user_id, CASE WHEN min_v <= 0.5 THEN 'invalid_price'
        |  WHEN n < 5 THEN 'empty_file' END AS reason
        |FROM (SELECT user_id, min(value) AS min_v, count(*) AS n
        |      FROM events GROUP BY 1)
        |WHERE min_v <= 0.5 OR n < 5""".stripMargin,

    "q19_freshness" ->
      s"""SELECT key, last_date FROM (
         |  SELECT symbol AS key, max(d) AS last_date FROM ($barsSql) GROUP BY 1)
         |WHERE last_date < (SELECT max(d) FROM ($barsSql)) - 60""".stripMargin,

    "q20_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  round(avg(k), 2) AS avg_k, max(k) AS max_k,
        |  round(sum(value), 2) AS value_sum
        |FROM (SELECT event_type, value,
        |        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,

    "q21_hourly_rollup" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q22_window_rank" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal,
        |  row_number() OVER (PARTITION BY s_nationkey
        |    ORDER BY s_acctbal DESC, s_suppkey) AS rnk
        |FROM supplier""".stripMargin,

    "q23_text_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  round(avg(ntok), 2) AS avg_tokens,
         |  round(avg(nch), 2) AS avg_chars,
         |  CAST(sum(ntok) AS BIGINT) AS total_tokens
         |FROM (SELECT lang, len($tokSql) AS ntok, length(text) AS nch
         |      FROM documents)
         |GROUP BY lang""".stripMargin,

    "q24_doc_quality" ->
      s"""SELECT doc_id, len(tk) AS n_tokens,
         |  round(CASE WHEN len(tk) = 0 THEN 0.0
         |    ELSE len(list_distinct(tk)) * 1.0 / len(tk) END, 4) AS ttr,
         |  round(CASE WHEN len(tk) = 0 THEN 0.0
         |    ELSE len(list_filter(tk, t -> t IN ('the','a','of','to','and'))) * 1.0 / len(tk) END, 4) AS stop_ratio,
         |  CAST(round(CAST(0.4 * least(1.0, len(tk) / 100.0)
         |    + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |        ELSE len(list_filter(tk, t -> t IN ('the','a','of','to','and'))) * 1.0 / len(tk) END)
         |    + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |        ELSE len(list_distinct(tk)) * 1.0 / len(tk) END)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS score
         |FROM (SELECT doc_id, $tokSql AS tk FROM documents)""".stripMargin,

    "q25_langid" ->
      s"""WITH sc AS (
         |  SELECT lang,
         |    len(list_filter(tk, t -> t IN ('the','a','of','to','and'))) * 1.0 / len(tk) AS s_en,
         |    len(list_filter(tk, t -> t IN ('der','die','das','und','ein'))) * 1.0 / len(tk) AS s_de,
         |    len(list_filter(tk, t -> t IN ('el','la','de','y','que'))) * 1.0 / len(tk) AS s_es,
         |    len(list_filter(tk, t -> t IN ('le','la','de','et','les'))) * 1.0 / len(tk) AS s_fr
         |  FROM (SELECT lang, $tokSql AS tk FROM documents) WHERE len(tk) > 0)
         |SELECT lang,
         |  CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |    WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |    WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |    WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |    ELSE 'fr' END AS predicted,
         |  count(*) AS n
         |FROM sc GROUP BY 1, 2""".stripMargin,

    // Same seeded PII, same patterns (portable Java-regex/RE2 subset),
    // same redact-then-count order; the fingerprint of the redacted
    // text pins the rewrite byte-exact.
    "q69_pii_redact" -> {
      val e = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val p = """[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}"""
      s"""WITH seeded AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0
         |      THEN text || ' contact alice.smith@example.com or 555-123-4567 now'
         |      ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$e')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(
         |    regexp_replace(text, '$e', '<EMAIL>', 'g'), '$p')) AS INT) AS n_phones,
         |  md5(regexp_replace(trim(lower(
         |    regexp_replace(regexp_replace(text, '$e', '<EMAIL>', 'g'),
         |      '$p', '<PHONE>', 'g'))), '\\s+', ' ', 'g')) AS clean_fp
         |FROM seeded""".stripMargin
    },

    // Contamination on STRING shingles (hash-free: counts agree with the
    // 60-bit-hash engine path absent md5 collisions); docs too short to
    // shingle report 0/0 via the left join.
    "q70_contamination" ->
      s"""WITH tokd AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |sh AS (SELECT doc_id, unnest($shingleSql) AS s FROM tokd),
         |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
         |shared AS (
         |  SELECT doc_id, count(*) AS n_shared
         |  FROM sh JOIN bench USING (s) GROUP BY 1)
         |SELECT t.doc_id, CAST(len($shingleSql) AS INT) AS n_shingles,
         |  CAST(coalesce(sh2.n_shared, 0) AS BIGINT) AS n_shared
         |FROM tokd t LEFT JOIN shared sh2 ON t.doc_id = sh2.doc_id""".stripMargin,

    // Identical fixed-point term snap (×1e6 BIGINT) before the per-doc
    // sum → exact, order-free; same broadcast-free relational shape.
    "q72_unigram_surprisal" ->
      s"""WITH toks AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |cf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY 1),
         |tot AS (SELECT count(*) AS n_total FROM toks)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(round(CAST(
         |    CAST(sum(CAST(round(-ln(CAST(tf AS DOUBLE) / n_total)
         |        * CAST(1000000.0 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
         |      / (count(*) * CAST(1000000.0 AS DOUBLE))
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS avg_surprisal
         |FROM toks JOIN cf USING (tok) CROSS JOIN tot
         |GROUP BY doc_id""".stripMargin,

    // All (non-distinct) 3-grams via the same 1-based inclusive-slice
    // comprehension, minus list_distinct; decimal-snapped round.
    "q71_repetition" ->
      s"""SELECT doc_id,
         |  CAST(greatest(len(tk) - 2, 0) AS INT) AS n_grams,
         |  CASE WHEN len(tk) < 3 THEN 0.0
         |    ELSE CAST(round(CAST(CAST(1.0 AS DOUBLE)
         |      - CAST(len(list_distinct([array_to_string(tk[i:i+2], ' ')
         |          for i in range(1, len(tk) - 1)])) AS DOUBLE)
         |        / (len(tk) - 2) AS DECIMAL(20,10)), 4) AS DOUBLE)
         |  END AS repetition
         |FROM (SELECT doc_id, $tokSql AS tk FROM documents)""".stripMargin,

    // Same 1-based slice windows: Spark sequence(1,len,stride) ==
    // DuckDB range(1,len+1,stride) (inclusive vs exclusive stop);
    // chunk_id = (start-1)/stride matches posexplode's 0-based pos.
    "q74_chunk_tokens" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |st AS (SELECT doc_id, tk,
         |         unnest(range(1, len(tk) + 1, 48)) AS start FROM tk)
         |SELECT doc_id, CAST((start - 1) // 48 AS INT) AS chunk_id,
         |  CAST(len(tk[start : start + 63]) AS INT) AS n_tokens,
         |  md5(array_to_string(tk[start : start + 63], ' ')) AS chunk_fp
         |FROM st""".stripMargin,

    // The oracle is the textbook single-window prefix sum; the engine
    // path's two-level decomposition must agree exactly (BIGINT token
    // weights, double division exact below 2^53).
    "q75_pack_shards" ->
      s"""WITH w AS (SELECT doc_id, CAST(len($tokSql) AS BIGINT) AS w
         |           FROM documents)
         |SELECT doc_id AS id, w AS weight,
         |  CAST(floor((sum(w) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w)
         |    / 2000) AS BIGINT) AS shard
         |FROM w""".stripMargin,

    // Identical fixed-point sqrt snap (×1e6 BIGINT) before the
    // normalizing sum; the remaining double chain is written in the
    // same left-assoc order as the engine path so floor() agrees.
    "q76_temperature_sample" ->
      s"""WITH c AS (
         |  SELECT lang AS stratum, count(*) AS n_rows,
         |    CAST(round(sqrt(CAST(count(*) AS DOUBLE))
         |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS w_fp
         |  FROM documents GROUP BY 1),
         |tot AS (SELECT sum(n_rows) AS n_total, sum(w_fp) AS w_total FROM c),
         |r AS (SELECT stratum, n_rows,
         |    least(CAST(100 AS BIGINT), CAST(floor(
         |      CAST(n_total * 1 AS DOUBLE) / 2 * w_fp / w_total / n_rows
         |        * 100) AS BIGINT)) AS keep_buckets
         |  FROM c CROSS JOIN tot)
         |SELECT d.lang AS stratum, r.n_rows, r.keep_buckets,
         |  CAST(sum(CASE WHEN ${h60("CAST(doc_id AS VARCHAR)")} % 100
         |      < r.keep_buckets THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM documents d JOIN r ON d.lang = r.stratum
         |GROUP BY 1, 2, 3""".stripMargin,

    // Brute-force new×(old ∪ earlier-new) on STRING shingles (q28
    // pattern); the engine's prefix-index path must find exactly the
    // same matches.
    "q82_incremental_dedup" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |oldsh AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh FROM tk),
         |newtk AS (SELECT doc_id + 1000000000 AS doc_id,
         |    CASE WHEN doc_id % 2 = 0 THEN tk ELSE list_sort(tk) END AS tk
         |  FROM tk),
         |newsh AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh FROM newtk),
         |pairs AS (
         |  SELECT n.doc_id AS id_new, o.doc_id AS id_match
         |  FROM newsh n JOIN oldsh o ON
         |    round(len(list_intersect(n.sh, o.sh)) * 1.0 /
         |      (len(n.sh) + len(o.sh) - len(list_intersect(n.sh, o.sh))), 4)
         |      >= 0.5
         |  UNION ALL
         |  SELECT a.doc_id AS id_new, b.doc_id AS id_match
         |  FROM newsh a JOIN newsh b ON a.doc_id > b.doc_id AND
         |    round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
         |      >= 0.5)
         |SELECT n.doc_id,
         |  CAST(coalesce(p.n_dups, 0) AS BIGINT) AS n_dups,
         |  CAST(coalesce(p.first_dup, -1) AS BIGINT) AS first_dup
         |FROM newsh n LEFT JOIN (
         |  SELECT id_new, count(*) AS n_dups, min(id_match) AS first_dup
         |  FROM pairs GROUP BY 1) p ON n.doc_id = p.id_new""".stripMargin,

    // The naive BETWEEN join the engine's grid blocking must equal.
    "q92_range_join" ->
      """SELECT o_orderkey, count(*) AS n_pts,
        |  round(sum(l_quantity), 2) AS qty_sum
        |FROM orders JOIN lineitem
        |  ON CAST(l_shipdate AS DATE)
        |    BETWEEN CAST(o_orderdate AS DATE)
        |    AND CAST(o_orderdate AS DATE) + 3
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,

    // q74's chunk windows at stride=size=8 over the planted-dup
    // corpus; a span is duplicated iff its fingerprint count ≥ 2.
    "q93_dup_spans" ->
      s"""WITH d AS ($docsDupSql),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM d),
         |st AS (SELECT doc_id, tk,
         |    unnest(range(1, len(tk) + 1, 8)) AS start FROM tk),
         |ch AS (SELECT doc_id,
         |    md5(array_to_string(tk[start : start + 7], ' ')) AS fp
         |  FROM st),
         |fr AS (SELECT fp, count(*) AS fp_n FROM ch GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN fp_n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_spans,
         |  CAST(round(CAST(CAST(sum(CASE WHEN fp_n >= 2 THEN 1 ELSE 0 END)
         |      AS DOUBLE) / count(*) AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    AS dup_ratio
         |FROM ch JOIN fr USING (fp) GROUP BY 1""".stripMargin,

    // The one-pass groupBy-having the two-pass MG path must equal.
    "q94_heavy_hitters" ->
      s"""WITH it AS (SELECT unnest($tokSql) AS item FROM documents),
         |c AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt
         |  FROM it WHERE item IS NOT NULL GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c)
         |SELECT item, cnt FROM c CROSS JOIN tot
         |WHERE cnt * 50 >= n * 1""".stripMargin,

    // Same per-term arithmetic order: cents (exact) × one double pow,
    // rounded to BIGINT before the sum.
    "q95_decayed_sum" ->
      """WITH f AS (SELECT l_returnflag AS grp,
        |    date_diff('day', CAST(l_shipdate AS DATE),
        |      DATE '2001-11-04') AS delta,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(cents * power(CAST(0.5 AS DOUBLE),
        |      CAST(delta AS DOUBLE) / 90)) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS decayed_sum
        |FROM f WHERE delta >= 0 AND delta <= 1800
        |GROUP BY 1""".stripMargin,

    // q94's vocabulary CTE; OOV = token missing from it; same decimal
    // snap on the rate.
    "q103_oov_rate" ->
      s"""WITH it AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |c AS (SELECT tok AS item, count(*) AS cnt FROM it GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
         |vocab AS (SELECT item FROM c CROSS JOIN tot WHERE cnt * 50 >= n)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN v.item IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  CAST(round(CAST(CAST(sum(CASE WHEN v.item IS NULL THEN 1 ELSE 0
         |      END) AS DOUBLE) / count(*) AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    AS oov_rate
         |FROM it LEFT JOIN vocab v ON it.tok = v.item
         |GROUP BY 1""".stripMargin,

    // Identical packed-state fold ((last+1)·2²¹ + kept); list_reduce
    // supplies the explicit 0 init Spark's aggregate() has.
    "q104_throttle_window" ->
      s"""WITH b AS (SELECT symbol,
         |    date_diff('day', DATE '1970-01-01', d) AS day
         |  FROM ($barsSql)),
         |g AS (SELECT symbol, CAST(count(*) AS BIGINT) AS n_obs,
         |    list_sort(list(CAST(day AS BIGINT))) AS ds FROM b GROUP BY 1),
         |f AS (SELECT symbol, n_obs,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), ds), (acc, d) ->
         |      CASE WHEN acc // 2097152 = 0
         |          OR d - (acc // 2097152 - 1) > 30
         |        THEN (d + 1) * 2097152 + acc % 2097152 + 1
         |        ELSE acc END) AS packed
         |  FROM g)
         |SELECT symbol, n_obs,
         |  CAST(packed % 2097152 AS BIGINT) AS n_kept,
         |  CAST(packed // 2097152 - 1 AS BIGINT) AS last_kept_day
         |FROM f""".stripMargin,

    // The union of the two blocking passes IS the OR of their block
    // predicates (pair-deduped); same ±1 band, thresholded verify,
    // BIGINT best-key packing as q85.
    "q105_fuzzy_multiblock" ->
      """WITH probes AS (SELECT p_partkey + 2000000000 AS probe_id,
        |    CASE WHEN p_partkey % 2 = 0 THEN substr(p_name, 2)
        |      ELSE substr(p_name, 1, length(p_name) - 1) END AS pn
        |  FROM part),
        |m AS (SELECT probe_id,
        |    count(*) AS n_matches,
        |    min({'d': CAST(levenshtein(pn, p_name) AS BIGINT),
        |        'r': CAST(p_partkey AS BIGINT)}) AS bk
        |  FROM probes JOIN part ON
        |    (substr(pn, 1, 1) = substr(p_name, 1, 1)
        |     OR substr(pn, length(pn)) = substr(p_name, length(p_name)))
        |    AND abs(length(pn) - length(p_name)) <= 1
        |    AND levenshtein(pn, p_name) <= 1
        |  GROUP BY 1)
        |SELECT p.probe_id,
        |  CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,
        |  coalesce((m.bk).d, -1) AS best_dist,
        |  coalesce((m.bk).r, -1) AS best_ref
        |FROM probes p LEFT JOIN m ON p.probe_id = m.probe_id""".stripMargin,

    // Batch probes snapshot ∪ earlier-batch rows: the ref side is old
    // (id < 2000000000) OR a smaller batch id — old×old pairs never form.
    "q106_incremental_er" ->
      """WITH p0 AS (SELECT p_partkey AS id, p_name AS name FROM part),
        |b AS (SELECT id + 2000000000 AS id,
        |    substr(name, 1, CAST(id % length(name) AS INT))
        |      || substr(name, CAST(id % length(name) AS INT) + 2) AS name
        |  FROM p0),
        |u AS (SELECT * FROM p0 UNION ALL SELECT * FROM b),
        |pairs AS (SELECT b.id AS probe_id, u.id AS ref_id,
        |    levenshtein(b.name, u.name) AS dist
        |  FROM b JOIN u ON substr(b.name, 1, 1) = substr(u.name, 1, 1)
        |    AND abs(length(b.name) - length(u.name)) <= 1
        |    AND levenshtein(b.name, u.name) <= 1
        |    AND (u.id < 2000000000 OR u.id < b.id)),
        |m AS (SELECT probe_id,
        |    sum(CASE WHEN ref_id < 2000000000 THEN 1 ELSE 0 END) AS n_old,
        |    sum(CASE WHEN ref_id >= 2000000000 THEN 1 ELSE 0 END) AS n_new,
        |    min({'d': CAST(dist AS BIGINT), 'r': CAST(ref_id AS BIGINT)}) AS bk
        |  FROM pairs GROUP BY 1)
        |SELECT b.id AS probe_id,
        |  CAST(coalesce(m.n_old, 0) AS BIGINT) AS n_old,
        |  CAST(coalesce(m.n_new, 0) AS BIGINT) AS n_new,
        |  coalesce((m.bk).r, -1) AS best_ref
        |FROM b LEFT JOIN m ON b.id = m.probe_id""".stripMargin,

    // Truth = all-pairs lev<=1 on the sample; blocked = the engine's
    // block predicate over the same pairs; blocked ⊆ truth.
    "q107_blocking_recall" ->
      s"""WITH s AS (SELECT p_partkey AS id, p_name AS name FROM part
        |           ORDER BY ${h60("CAST(p_partkey AS VARCHAR)")}, p_partkey
        |           LIMIT 500),
        |pr AS (SELECT id + 2000000000 AS id,
        |    substr(name, 1, CAST(id % length(name) AS INT))
        |      || substr(name, CAST(id % length(name) AS INT) + 2) AS name
        |  FROM s),
        |tr AS (SELECT count(*) AS n_true FROM pr, s
        |       WHERE levenshtein(pr.name, s.name) <= 1),
        |bl AS (SELECT count(*) AS n_blocked FROM pr JOIN s
        |  ON substr(pr.name, 1, 1) = substr(s.name, 1, 1)
        |    AND abs(length(pr.name) - length(s.name)) <= 1
        |    AND levenshtein(pr.name, s.name) <= 1)
        |SELECT CAST(n_true AS BIGINT) AS n_true,
        |  CAST(n_blocked AS BIGINT) AS n_blocked,
        |  CAST(round(CAST(CAST(n_blocked AS DOUBLE) / n_true
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall
        |FROM tr, bl""".stripMargin,

    // NO blocking predicate: plain all-pairs truth — recall-complete
    // blocking means the engine's blocked result must equal it exactly.
    "q109_fuzzy_segments" ->
      """WITH p0 AS (SELECT p_partkey AS id, p_name AS name FROM part),
        |probes AS (SELECT id + 2000000000 AS probe_id,
        |    substr(name, 1, CAST(id % length(name) AS INT))
        |      || substr(name, CAST(id % length(name) AS INT) + 2) AS pn
        |  FROM p0),
        |m AS (SELECT probe_id,
        |    count(*) AS n_matches,
        |    min({'d': CAST(levenshtein(pn, name) AS BIGINT), 'r': CAST(id AS BIGINT)}) AS bk
        |  FROM probes JOIN p0 ON levenshtein(pn, name) <= 1
        |  GROUP BY 1)
        |SELECT p.probe_id,
        |  CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,
        |  coalesce((m.bk).d, -1) AS best_dist,
        |  coalesce((m.bk).r, -1) AS best_ref
        |FROM probes p LEFT JOIN m ON p.probe_id = m.probe_id""".stripMargin,

    // Multi-probe IVF vs q31's brute truth on the fixed bottom-100
    // sample: corpus assigned to one cell each (rn = 1), queries fan
    // out to pr <= 4 cells ONCE, and each nprobe tier re-ranks the
    // nested candidate subset; identical rounded-sim/id tiebreaks.
    "q108_ivf_recall" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |           WHERE vec_id < 16),
         |q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |assigned AS (
         |  SELECT id, vec, cid AS cell FROM (
         |    SELECT e.vec_id AS id, e.embedding AS vec, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${cosSql("e.embedding", "c.cvec")}, 6) DESC, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN c)
         |  WHERE rn = 1),
         |qc AS (SELECT qid, qv, cell, pr FROM (
         |  SELECT q.id AS qid, q.vec AS qv, c.cid AS cell,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c.cvec")}, 6) DESC, c.cid) AS pr
         |  FROM q CROSS JOIN c)
         |  WHERE pr <= 4),
         |cand AS (
         |  SELECT qc.qid, a.id AS nid,
         |    round(${cosSql("qc.qv", "a.vec")}, 6) AS sim, qc.pr
         |  FROM qc JOIN assigned a ON qc.cell = a.cell AND qc.qid != a.id),
         |approx AS (
         |  SELECT 1 AS nprobe, qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, nid) AS rnk FROM cand WHERE pr <= 1)
         |    WHERE rnk <= 5
         |  UNION ALL
         |  SELECT 2 AS nprobe, qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, nid) AS rnk FROM cand WHERE pr <= 2)
         |    WHERE rnk <= 5
         |  UNION ALL
         |  SELECT 4 AS nprobe, qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, nid) AS rnk FROM cand WHERE pr <= 4)
         |    WHERE rnk <= 5),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, c2.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c2.embedding")}, 6) DESC, c2.vec_id) AS rnk
         |  FROM q JOIN embeddings c2 ON q.id != c2.vec_id)
         |  WHERE rnk <= 5),
         |h AS (SELECT a.nprobe, t.query_id, count(*) AS n_hit
         |  FROM truth t JOIN approx a
         |    ON t.query_id = a.qid AND t.neighbor_id = a.nid
         |  GROUP BY 1, 2),
         |np AS (SELECT unnest([1, 2, 4]) AS nprobe)
         |SELECT q.id AS query_id, np.nprobe,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall_at_5
         |FROM q CROSS JOIN np
         |LEFT JOIN h ON q.id = h.query_id AND np.nprobe = h.nprobe""".stripMargin,

    // Lloyd unrolled once in CTEs: a0 = assignment under the seeds,
    // c1 = per-dim fixed-point means, a1 = assignment under c1; both
    // stats tiers from the same rounded-sim/id tiebreaks as the engine.
    "q110_kmeans" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a0 AS (SELECT id, vec, cell, csim FROM (
         |  SELECT e.vec_id AS id, e.embedding AS vec, c.cid AS cell,
         |    round(${cosSql("e.embedding", "c.cvec")}, 6) AS csim,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.embedding", "c.cvec")}, 6) DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN c0 c)
         |  WHERE rn = 1),
         |c1 AS (SELECT cell AS cid, list(m ORDER BY pos) AS cvec FROM (
         |  SELECT cell, pos,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS m FROM (
         |    SELECT cell, pos, sum(xfp) AS s, count(*) AS n FROM (
         |      SELECT cell, generate_subscripts(vec, 1) - 1 AS pos,
         |        CAST(round(CAST(unnest(vec) AS DOUBLE) * 1e6) AS BIGINT)
         |          AS xfp
         |      FROM a0)
         |    GROUP BY 1, 2))
         |  GROUP BY 1),
         |a1 AS (SELECT id, cell, csim FROM (
         |  SELECT e.vec_id AS id, c.cid AS cell,
         |    round(${cosSql("e.embedding", "c.cvec")}, 6) AS csim,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.embedding", "c.cvec")}, 6) DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN c1 c)
         |  WHERE rn = 1)
         |SELECT 1 AS iter, cell AS cid, count(*) AS n_members,
         |  CAST(sum(CAST(round(csim * 1e6) AS BIGINT)) AS BIGINT) AS obj_fp
         |FROM a0 GROUP BY 2
         |UNION ALL
         |SELECT 2 AS iter, cell AS cid, count(*) AS n_members,
         |  CAST(sum(CAST(round(csim * 1e6) AS BIGINT)) AS BIGINT) AS obj_fp
         |FROM a1 GROUP BY 2""".stripMargin,

    // q110's trained-centroid CTE (one exact fixed-point Lloyd step)
    // composed with q108's multi-probe search machinery, at nprobe=2,
    // under both centroid sets; identical rounded-sim/id tiebreaks.
    "q112_ivf_trained_recall" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a0 AS (SELECT id, vec, cell FROM (
         |  SELECT e.vec_id AS id, e.embedding AS vec, c.cid AS cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.embedding", "c.cvec")}, 6) DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN c0 c)
         |  WHERE rn = 1),
         |c1 AS (SELECT cell AS cid, list(m ORDER BY pos) AS cvec FROM (
         |  SELECT cell, pos,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS m FROM (
         |    SELECT cell, pos, sum(xfp) AS s, count(*) AS n FROM (
         |      SELECT cell, generate_subscripts(vec, 1) - 1 AS pos,
         |        CAST(round(CAST(unnest(vec) AS DOUBLE) * 1e6) AS BIGINT)
         |          AS xfp
         |      FROM a0)
         |    GROUP BY 1, 2))
         |  GROUP BY 1),
         |a1 AS (SELECT id, vec, cell FROM (
         |  SELECT e.vec_id AS id, e.embedding AS vec, c.cid AS cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.embedding", "c.cvec")}, 6) DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN c1 c)
         |  WHERE rn = 1),
         |q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |qc0 AS (SELECT qid, qv, cell FROM (
         |  SELECT q.id AS qid, q.vec AS qv, c.cid AS cell,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c.cvec")}, 6) DESC, c.cid) AS pr
         |  FROM q CROSS JOIN c0 c)
         |  WHERE pr <= 2),
         |qc1 AS (SELECT qid, qv, cell FROM (
         |  SELECT q.id AS qid, q.vec AS qv, c.cid AS cell,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c.cvec")}, 6) DESC, c.cid) AS pr
         |  FROM q CROSS JOIN c1 c)
         |  WHERE pr <= 2),
         |approx AS (
         |  SELECT 0 AS trained, qid, nid FROM (
         |    SELECT qc.qid, a.id AS nid, row_number() OVER (PARTITION BY qc.qid
         |      ORDER BY round(${cosSql("qc.qv", "a.vec")}, 6) DESC, a.id) AS rnk
         |    FROM qc0 qc JOIN a0 a ON qc.cell = a.cell AND qc.qid != a.id)
         |    WHERE rnk <= 5
         |  UNION ALL
         |  SELECT 1 AS trained, qid, nid FROM (
         |    SELECT qc.qid, a.id AS nid, row_number() OVER (PARTITION BY qc.qid
         |      ORDER BY round(${cosSql("qc.qv", "a.vec")}, 6) DESC, a.id) AS rnk
         |    FROM qc1 qc JOIN a1 a ON qc.cell = a.cell AND qc.qid != a.id)
         |    WHERE rnk <= 5),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, c2.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c2.embedding")}, 6) DESC, c2.vec_id) AS rnk
         |  FROM q JOIN embeddings c2 ON q.id != c2.vec_id)
         |  WHERE rnk <= 5),
         |h AS (SELECT a.trained, t.query_id, count(*) AS n_hit
         |  FROM truth t JOIN approx a
         |    ON t.query_id = a.qid AND t.neighbor_id = a.nid
         |  GROUP BY 1, 2),
         |tr AS (SELECT unnest([0, 1]) AS trained)
         |SELECT q.id AS query_id, tr.trained,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall_at_5
         |FROM q CROSS JOIN tr
         |LEFT JOIN h ON q.id = h.query_id AND tr.trained = h.trained""".stripMargin,

    // Unrolls the whole PQ pipeline in CTEs: subvector slices, seed
    // codebook (id<8), one keyed fixed-point Lloyd step (q110's c1
    // pattern with the subspace in the key), re-assignment = codes,
    // per-query LUT (distances snapped to ×1e6 BIGINT — the m-term ADC
    // sum is then order-free), rank by (adc, id), recall vs exact-L2
    // truth. Identical rounding and tiebreaks to the engine throughout.
    "q117_pq_recall" ->
      s"""WITH subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS sub),
         |sv AS (SELECT e.vec_id AS id, s.sub,
         |    e.embedding[CAST(s.sub * 8 + 1 AS INT):CAST((s.sub + 1) * 8 AS INT)]
         |      AS svec
         |  FROM embeddings e CROSS JOIN subs s),
         |cb0 AS (SELECT sub, id AS cid, svec AS cvec FROM sv WHERE id < 16),
         |a0 AS (SELECT id, sub, svec, code FROM (
         |  SELECT v.id, v.sub, v.svec, c.cid AS code,
         |    row_number() OVER (PARTITION BY v.id, v.sub
         |      ORDER BY round(${sqdSql("v.svec", "c.cvec")}, 6), c.cid) AS rn
         |  FROM sv v JOIN cb0 c ON v.sub = c.sub)
         |  WHERE rn = 1),
         |cb1 AS (SELECT sub, code AS cid, list(m ORDER BY pos) AS cvec FROM (
         |  SELECT sub, code, pos,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS m FROM (
         |    SELECT sub, code, pos, sum(xfp) AS s, count(*) AS n FROM (
         |      SELECT sub, code, generate_subscripts(svec, 1) - 1 AS pos,
         |        CAST(round(CAST(unnest(svec) AS DOUBLE) * 1e6) AS BIGINT)
         |          AS xfp
         |      FROM a0)
         |    GROUP BY 1, 2, 3))
         |  GROUP BY 1, 2),
         |codes AS (SELECT id, sub, code FROM (
         |  SELECT v.id, v.sub, c.cid AS code,
         |    row_number() OVER (PARTITION BY v.id, v.sub
         |      ORDER BY round(${sqdSql("v.svec", "c.cvec")}, 6), c.cid) AS rn
         |  FROM sv v JOIN cb1 c ON v.sub = c.sub)
         |  WHERE rn = 1),
         |q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |qsv AS (SELECT q.id AS qid, s.sub,
         |    q.vec[CAST(s.sub * 8 + 1 AS INT):CAST((s.sub + 1) * 8 AS INT)]
         |      AS svec
         |  FROM q CROSS JOIN subs s),
         |lut AS (SELECT v.qid, v.sub, c.cid,
         |    CAST(round(round(${sqdSql("v.svec", "c.cvec")}, 6) * 1e6) AS BIGINT)
         |      AS dfp
         |  FROM qsv v JOIN cb1 c ON v.sub = c.sub),
         |ad AS (SELECT l.qid, k.id, sum(l.dfp) AS adist
         |  FROM codes k JOIN lut l ON k.sub = l.sub AND k.code = l.cid
         |  WHERE l.qid != k.id
         |  GROUP BY 1, 2),
         |approx AS (SELECT qid, id FROM (
         |  SELECT qid, id,
         |    row_number() OVER (PARTITION BY qid ORDER BY adist, id) AS rnk
         |  FROM ad)
         |  WHERE rnk <= 5),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, e.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${sqdSql("q.vec", "e.embedding")}, 6), e.vec_id)
         |      AS rnk
         |  FROM q JOIN embeddings e ON q.id != e.vec_id)
         |  WHERE rnk <= 5),
         |h AS (SELECT t.query_id, count(*) AS n_hit
         |  FROM truth t JOIN approx a
         |    ON t.query_id = a.qid AND t.neighbor_id = a.id
         |  GROUP BY 1)
         |SELECT q.id AS query_id,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall_at_5
         |FROM q LEFT JOIN h ON q.id = h.query_id""".stripMargin,

    // Residual chain in SQL: L2 cell assignment → residual lists
    // (double-exact float subtract) → sliced residual subvectors →
    // seed/trained residual codebooks (the keyed fixed-point Lloyd
    // CTE) → codes WITH cell → per-probed-cell query residual LUT →
    // ADC join on (cell, sub, code) → rank → recall vs exact truth.
    "q121_ivfpq_residual" ->
      s"""WITH subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS sub),
         |c0 AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |       WHERE vec_id < 16),
         |acell0 AS (SELECT id, vec, cell FROM (
         |  SELECT e.vec_id AS id, e.embedding AS vec, c.cid AS cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${sqdSql("e.embedding", "c.cvec")}, 6), c.cid)
         |      AS rn
         |  FROM embeddings e CROSS JOIN c0 c)
         |  WHERE rn = 1),
         |ivfc AS (SELECT cell AS cid, list(m ORDER BY pos) AS cvec FROM (
         |  SELECT cell, pos,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS m FROM (
         |    SELECT cell, pos, sum(xfp) AS s, count(*) AS n FROM (
         |      SELECT cell, generate_subscripts(vec, 1) - 1 AS pos,
         |        CAST(round(CAST(unnest(vec) AS DOUBLE) * 1e6) AS BIGINT)
         |          AS xfp
         |      FROM acell0)
         |    GROUP BY 1, 2))
         |  GROUP BY 1),
         |acell AS (SELECT id, cell FROM (
         |  SELECT e.vec_id AS id, c.cid AS cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${sqdSql("e.embedding", "c.cvec")}, 6), c.cid)
         |      AS rn
         |  FROM embeddings e CROSS JOIN ivfc c)
         |  WHERE rn = 1),
         |r AS (SELECT a.id, a.cell,
         |    list_transform(list_zip(e.embedding, c.cvec),
         |      p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) AS vec
         |  FROM acell a JOIN embeddings e ON a.id = e.vec_id
         |  JOIN ivfc c ON a.cell = c.cid),
         |sv AS (SELECT r.id, s.sub,
         |    r.vec[CAST(s.sub * 8 + 1 AS INT):CAST((s.sub + 1) * 8 AS INT)]
         |      AS svec
         |  FROM r CROSS JOIN subs s),
         |cb0 AS (SELECT sub, id - 16 AS cid, svec AS cvec FROM sv
         |        WHERE id >= 16 AND id < 32),
         |a0 AS (SELECT id, sub, svec, code FROM (
         |  SELECT v.id, v.sub, v.svec, c.cid AS code,
         |    row_number() OVER (PARTITION BY v.id, v.sub
         |      ORDER BY round(${sqdSql("v.svec", "c.cvec")}, 6), c.cid) AS rn
         |  FROM sv v JOIN cb0 c ON v.sub = c.sub)
         |  WHERE rn = 1),
         |cb1 AS (SELECT sub, code AS cid, list(m ORDER BY pos) AS cvec FROM (
         |  SELECT sub, code, pos,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS m FROM (
         |    SELECT sub, code, pos, sum(xfp) AS s, count(*) AS n FROM (
         |      SELECT sub, code, generate_subscripts(svec, 1) - 1 AS pos,
         |        CAST(round(CAST(unnest(svec) AS DOUBLE) * 1e6) AS BIGINT)
         |          AS xfp
         |      FROM a0)
         |    GROUP BY 1, 2, 3))
         |  GROUP BY 1, 2),
         |codes AS (SELECT k.id, k.sub, k.code, a.cell FROM (
         |  SELECT id, sub, code FROM (
         |    SELECT v.id, v.sub, c.cid AS code,
         |      row_number() OVER (PARTITION BY v.id, v.sub
         |        ORDER BY round(${sqdSql("v.svec", "c.cvec")}, 6), c.cid) AS rn
         |    FROM sv v JOIN cb1 c ON v.sub = c.sub)
         |    WHERE rn = 1) k
         |  JOIN acell a ON k.id = a.id),
         |q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |qc AS (SELECT qid, cell FROM (
         |  SELECT q.id AS qid, c.cid AS cell,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${sqdSql("q.vec", "c.cvec")}, 6), c.cid) AS pr
         |  FROM q CROSS JOIN ivfc c)
         |  WHERE pr <= 2),
         |qr AS (SELECT qc.qid, qc.cell,
         |    list_transform(list_zip(q.vec, c.cvec),
         |      p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) AS vec
         |  FROM qc JOIN q ON qc.qid = q.id
         |  JOIN ivfc c ON qc.cell = c.cid),
         |qsv AS (SELECT qr.qid, qr.cell, s.sub,
         |    qr.vec[CAST(s.sub * 8 + 1 AS INT):CAST((s.sub + 1) * 8 AS INT)]
         |      AS svec
         |  FROM qr CROSS JOIN subs s),
         |lut AS (SELECT v.qid, v.cell, v.sub, c.cid,
         |    CAST(round(round(${sqdSql("v.svec", "c.cvec")}, 6) * 1e6) AS BIGINT)
         |      AS dfp
         |  FROM qsv v JOIN cb1 c ON v.sub = c.sub),
         |ad AS (SELECT l.qid, k.id, sum(l.dfp) AS adist
         |  FROM codes k JOIN lut l
         |    ON k.cell = l.cell AND k.sub = l.sub AND k.code = l.cid
         |  WHERE l.qid != k.id
         |  GROUP BY 1, 2),
         |approx AS (SELECT qid, id FROM (
         |  SELECT qid, id,
         |    row_number() OVER (PARTITION BY qid ORDER BY adist, id) AS rnk
         |  FROM ad)
         |  WHERE rnk <= 5),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, e.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${sqdSql("q.vec", "e.embedding")}, 6), e.vec_id)
         |      AS rnk
         |  FROM q JOIN embeddings e ON q.id != e.vec_id)
         |  WHERE rnk <= 5),
         |h AS (SELECT t.query_id, count(*) AS n_hit
         |  FROM truth t JOIN approx a
         |    ON t.query_id = a.qid AND t.neighbor_id = a.id
         |  GROUP BY 1)
         |SELECT q.id AS query_id,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall_at_5
         |FROM q LEFT JOIN h ON q.id = h.query_id""".stripMargin,

    // Three exact fixed-point L2 Lloyd steps unrolled in CTEs
    // (assignment aN under cN, mean cN+1 from aN); per-cell stats from
    // the kept winning distance cd under iters 0, 1, 3 — identical
    // rounding/tiebreaks to ivfAssignL2Scored / ivfCellStatsL2.
    "q124_kmeans_l2_train" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a0 AS (${l2aSql("c0")}),
         |c1 AS (${l2MeanSql("a0")}),
         |a1 AS (${l2aSql("c1")}),
         |c2 AS (${l2MeanSql("a1")}),
         |a2 AS (${l2aSql("c2")}),
         |c3 AS (${l2MeanSql("a2")}),
         |a3 AS (${l2aSql("c3")})
         |SELECT 0 AS iter, cell AS cid, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(CAST(round(cd * 1e6) AS BIGINT)) AS BIGINT) AS sse_fp
         |FROM a0 GROUP BY 2
         |UNION ALL
         |SELECT 1 AS iter, cell AS cid, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(CAST(round(cd * 1e6) AS BIGINT)) AS BIGINT) AS sse_fp
         |FROM a1 GROUP BY 2
         |UNION ALL
         |SELECT 3 AS iter, cell AS cid, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(CAST(round(cd * 1e6) AS BIGINT)) AS BIGINT) AS sse_fp
         |FROM a3 GROUP BY 2""".stripMargin,

    // One unrolled Lloyd iteration, struct-min representative pick
    // (q102's arg-min pattern), exact ×1e6 radius.
    "q218_coverage_sample" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a0 AS (${l2aSql("c0")}),
         |c1 AS (${l2MeanSql("a0")}),
         |a1 AS (${l2aSql("c1")})
         |SELECT cell, CAST((min({'d': cd, 'i': id})).i AS BIGINT)
         |    AS rep_id,
         |  CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(max(CAST(round(cd * 1e6) AS BIGINT)) AS BIGINT)
         |    AS radius_fp
         |FROM a1 GROUP BY 1""".stripMargin,

    // q124's unrolled two-iteration training CTEs; both centroid
    // distances per point via the ranked cross join, the same
    // (b−a)/max snap, per-cell exact integer means.
    "q215_silhouette" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a0 AS (${l2aSql("c0")}),
         |c1 AS (${l2MeanSql("a0")}),
         |a1 AS (${l2aSql("c1")}),
         |c2 AS (${l2MeanSql("a1")}),
         |cds AS (SELECT e.vec_id AS id, c.cid,
         |    round(${sqdSql("e.embedding", "c.cvec")}, 6) AS cd,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${sqdSql("e.embedding", "c.cvec")}, 6),
         |        c.cid) AS rnk
         |  FROM embeddings e CROSS JOIN c2 c),
         |ab AS (SELECT a.id, a.cid AS cell, sqrt(a.cd) AS da,
         |    sqrt(b.cd) AS db
         |  FROM cds a JOIN cds b ON a.id = b.id
         |    AND a.rnk = 1 AND b.rnk = 2),
         |sfp AS (SELECT cell, CAST(round(1e6 *
         |    (CASE WHEN greatest(da, db) = 0 THEN CAST(0 AS DOUBLE)
         |      ELSE (db - da) / greatest(da, db) END)) AS BIGINT)
         |    AS sfp
         |  FROM ab)
         |SELECT cell AS cid, CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(round(CAST(CAST(sum(sfp) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) / 1e6
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS mean_silhouette
         |FROM sfp GROUP BY 1""".stripMargin,

    // q124's unrolled training CTEs feeding q112's recall audit under
    // the Euclidean metric: probe 2 L2-nearest cells per sampled
    // query, rank same-cell corpus members by rounded squared L2
    // (asc, id), hits against the brute-force L2 truth.
    "q125_ivf_l2_trained_recall" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a0 AS (${l2aSql("c0")}),
         |c1 AS (${l2MeanSql("a0")}),
         |a1 AS (${l2aSql("c1")}),
         |c2 AS (${l2MeanSql("a1")}),
         |a2 AS (${l2aSql("c2")}),
         |c3 AS (${l2MeanSql("a2")}),
         |a3 AS (${l2aSql("c3")}),
         |q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |s1 AS (SELECT qid, nid FROM (
         |  SELECT qc.qid, a.id AS nid,
         |    row_number() OVER (PARTITION BY qc.qid
         |      ORDER BY round(${sqdSql("qc.qv", "a.vec")}, 6), a.id) AS rnk
         |  FROM (SELECT qid, qv, cell FROM (
         |    SELECT q.id AS qid, q.vec AS qv, c.cid AS cell,
         |      row_number() OVER (PARTITION BY q.id
         |        ORDER BY round(${sqdSql("q.vec", "c.cvec")}, 6), c.cid) AS pr
         |    FROM q CROSS JOIN c1 c) WHERE pr <= 2) qc
         |  JOIN a1 a ON qc.cell = a.cell AND qc.qid != a.id)
         |  WHERE rnk <= 5),
         |s3 AS (SELECT qid, nid FROM (
         |  SELECT qc.qid, a.id AS nid,
         |    row_number() OVER (PARTITION BY qc.qid
         |      ORDER BY round(${sqdSql("qc.qv", "a.vec")}, 6), a.id) AS rnk
         |  FROM (SELECT qid, qv, cell FROM (
         |    SELECT q.id AS qid, q.vec AS qv, c.cid AS cell,
         |      row_number() OVER (PARTITION BY q.id
         |        ORDER BY round(${sqdSql("q.vec", "c.cvec")}, 6), c.cid) AS pr
         |    FROM q CROSS JOIN c3 c) WHERE pr <= 2) qc
         |  JOIN a3 a ON qc.cell = a.cell AND qc.qid != a.id)
         |  WHERE rnk <= 5),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, c2.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${sqdSql("q.vec", "c2.embedding")}, 6),
         |        c2.vec_id) AS rnk
         |  FROM q JOIN embeddings c2 ON q.id != c2.vec_id)
         |  WHERE rnk <= 5),
         |h AS (
         |  SELECT 1 AS iters, t.query_id, count(*) AS n_hit
         |  FROM truth t JOIN s1 ON t.query_id = s1.qid
         |    AND t.neighbor_id = s1.nid
         |  GROUP BY 2
         |  UNION ALL
         |  SELECT 3 AS iters, t.query_id, count(*) AS n_hit
         |  FROM truth t JOIN s3 ON t.query_id = s3.qid
         |    AND t.neighbor_id = s3.nid
         |  GROUP BY 2),
         |it AS (SELECT unnest([1, 3]) AS iters)
         |SELECT q.id AS query_id, it.iters,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall_at_5
         |FROM q CROSS JOIN it
         |LEFT JOIN h ON q.id = h.query_id AND it.iters = h.iters""".stripMargin,

    // SQ8 unrolled in CTEs: per-dim min/max lists, codes via the same
    // fixed-association ((x−mn)/(mx−mn))·255 snap, reconstruction
    // mn + (code/255)·(mx−mn), rank by rounded squared L2 to the
    // reconstruction (asc, id) against brute-force L2 truth.
    "q128_sq8_recall" ->
      s"""WITH st AS (
         |  SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs
         |  FROM (
         |    SELECT pos, min(x) AS mn, max(x) AS mx FROM (
         |      SELECT generate_subscripts(embedding, 1) AS pos,
         |        CAST(unnest(embedding) AS DOUBLE) AS x
         |      FROM embeddings)
         |    GROUP BY 1)),
         |dec AS (
         |  SELECT e.vec_id AS id,
         |    list_transform(
         |      list_zip(list_transform(list_zip(e.embedding, st.mns, st.mxs),
         |        q -> CASE WHEN q[3] > q[2]
         |          THEN CAST(round((CAST(q[1] AS DOUBLE) - q[2])
         |            / (q[3] - q[2]) * 255.0) AS INT)
         |          ELSE 0 END), st.mns, st.mxs),
         |      q -> q[2] + CAST(q[1] AS DOUBLE) / 255.0 * (q[3] - q[2]))
         |      AS dv
         |  FROM embeddings e CROSS JOIN st),
         |q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |approx AS (SELECT qid, nid FROM (
         |  SELECT q.id AS qid, d.id AS nid,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${sqdSql("q.vec", "d.dv")}, 6), d.id) AS rnk
         |  FROM q JOIN dec d ON q.id != d.id)
         |  WHERE rnk <= 5),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, c2.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${sqdSql("q.vec", "c2.embedding")}, 6),
         |        c2.vec_id) AS rnk
         |  FROM q JOIN embeddings c2 ON q.id != c2.vec_id)
         |  WHERE rnk <= 5),
         |h AS (SELECT t.query_id, count(*) AS n_hit
         |  FROM truth t JOIN approx a
         |    ON t.query_id = a.qid AND t.neighbor_id = a.nid
         |  GROUP BY 1)
         |SELECT q.id AS query_id,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall_at_5
         |FROM q LEFT JOIN h ON q.id = h.query_id""".stripMargin,

    // Matryoshka cascade in CTEs: ONE prefix-cosine ranking (first 16
    // list elements, same rounded-sim/id tiebreaks), tier membership is
    // prank <= R, each tier reranks by full-dim cosine, hits against
    // the full-dim cosine truth.
    "q129_matryoshka_rerank" ->
      s"""WITH q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |cand AS (SELECT qid, nid, prank FROM (
         |  SELECT q.id AS qid, e.vec_id AS nid,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec[1:16]", "e.embedding[1:16]")}, 6)
         |        DESC, e.vec_id) AS prank
         |  FROM q JOIN embeddings e ON q.id != e.vec_id)
         |  WHERE prank <= 30),
         |rr AS (
         |  SELECT 10 AS shortlist, qid, nid FROM (
         |    SELECT c.qid, c.nid, row_number() OVER (PARTITION BY c.qid
         |      ORDER BY round(${cosSql("q.vec", "e.embedding")}, 6) DESC,
         |        c.nid) AS rnk
         |    FROM cand c JOIN q ON q.id = c.qid
         |      JOIN embeddings e ON e.vec_id = c.nid
         |    WHERE c.prank <= 10)
         |    WHERE rnk <= 5
         |  UNION ALL
         |  SELECT 30 AS shortlist, qid, nid FROM (
         |    SELECT c.qid, c.nid, row_number() OVER (PARTITION BY c.qid
         |      ORDER BY round(${cosSql("q.vec", "e.embedding")}, 6) DESC,
         |        c.nid) AS rnk
         |    FROM cand c JOIN q ON q.id = c.qid
         |      JOIN embeddings e ON e.vec_id = c.nid
         |    WHERE c.prank <= 30)
         |    WHERE rnk <= 5),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, c2.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c2.embedding")}, 6) DESC,
         |        c2.vec_id) AS rnk
         |  FROM q JOIN embeddings c2 ON q.id != c2.vec_id)
         |  WHERE rnk <= 5),
         |h AS (SELECT a.shortlist, t.query_id, count(*) AS n_hit
         |  FROM truth t JOIN rr a
         |    ON t.query_id = a.qid AND t.neighbor_id = a.nid
         |  GROUP BY 1, 2),
         |sl AS (SELECT unnest([10, 30]) AS shortlist)
         |SELECT q.id AS query_id, sl.shortlist,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall_at_5
         |FROM q CROSS JOIN sl
         |LEFT JOIN h ON q.id = h.query_id AND sl.shortlist = h.shortlist""".stripMargin,

    // q129's shortlist-10 rerank with ranks kept, truth with ranks
    // kept; RR and NDCG from the same 1e6/log2 integer discounts.
    "q139_ann_ranking_metrics" ->
      s"""WITH q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |cand AS (SELECT qid, nid FROM (
         |  SELECT q.id AS qid, e.vec_id AS nid,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec[1:16]", "e.embedding[1:16]")}, 6)
         |        DESC, e.vec_id) AS prank
         |  FROM q JOIN embeddings e ON q.id != e.vec_id)
         |  WHERE prank <= 10),
         |ap AS (SELECT qid, nid, rnk FROM (
         |  SELECT c.qid, c.nid, row_number() OVER (PARTITION BY c.qid
         |    ORDER BY round(${cosSql("q.vec", "e.embedding")}, 6) DESC,
         |      c.nid) AS rnk
         |  FROM cand c JOIN q ON q.id = c.qid
         |    JOIN embeddings e ON e.vec_id = c.nid)
         |  WHERE rnk <= 5),
         |truth AS (SELECT query_id, neighbor_id, rnk FROM (
         |  SELECT q.id AS query_id, c2.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c2.embedding")}, 6) DESC,
         |        c2.vec_id) AS rnk
         |  FROM q JOIN embeddings c2 ON q.id != c2.vec_id)
         |  WHERE rnk <= 5),
         |per AS (SELECT a.qid, min(a.rnk) AS first_rel,
         |    CAST(sum(CAST(round(1e6 / log2(a.rnk + 1)) AS BIGINT))
         |      AS BIGINT) AS dcg_fp
         |  FROM ap a JOIN truth t
         |    ON a.qid = t.query_id AND a.nid = t.neighbor_id
         |  GROUP BY 1),
         |ideal AS (SELECT query_id,
         |    CAST(sum(CAST(round(1e6 / log2(rnk + 1)) AS BIGINT))
         |      AS BIGINT) AS idcg_fp
         |  FROM truth GROUP BY 1)
         |SELECT ideal.query_id,
         |  CAST(round(CAST(
         |    coalesce(round(1e6 / CAST(first_rel AS DOUBLE)), 0) / 1e6
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS rr,
         |  CAST(round(CAST(CAST(coalesce(dcg_fp, 0) AS DOUBLE)
         |    / CAST(idcg_fp AS DOUBLE)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS ndcg_at_5
         |FROM ideal LEFT JOIN per ON ideal.query_id = per.qid""".stripMargin,

    // The identical integer z-test in SQL: HUGEINT moments per cell
    // (exact), D = Σ − n·fp, flag iff D > 0 AND D² > 4(n·Σ² − Σ²);
    // assignment tiebreaks as everywhere (rounded cosine desc, cid).
    "q120_embedding_outliers" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a AS (SELECT id, cell, csim FROM (
         |  SELECT e.vec_id AS id, c.cid AS cell,
         |    round(${cosSql("e.embedding", "c.cvec")}, 6) AS csim,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.embedding", "c.cvec")}, 6) DESC,
         |        c.cid) AS rn
         |  FROM embeddings e CROSS JOIN c0 c)
         |  WHERE rn = 1),
         |f AS (SELECT id, cell, CAST(round(csim * 1e6) AS BIGINT) AS fp
         |  FROM a),
         |g AS (SELECT cell, CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(fp) AS HUGEINT) AS s,
         |    CAST(sum(CAST(fp AS HUGEINT) * fp) AS HUGEINT) AS ss
         |  FROM f GROUP BY 1)
         |SELECT f.id, f.cell, CAST(f.fp AS DOUBLE) / 1e6 AS csim,
         |  CASE WHEN (g.s - g.n * f.fp) > 0
         |        AND (g.s - g.n * f.fp) * (g.s - g.n * f.fp)
         |          > 4 * (g.n * g.ss - g.s * g.s)
         |       THEN 1 ELSE 0 END AS is_outlier
         |FROM f JOIN g USING (cell)""".stripMargin,

    // The incremental asymmetry in SQL: new side joins old ∪ new with
    // new×old always emitted (new on the left) and new×new once
    // (id_new < id_match); same double cosine and round-to-6 filter.
    "q119_incremental_cosine" ->
      s"""WITH o AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         |n AS (SELECT vec_id + 1000000000 AS id,
         |    CASE WHEN vec_id % 2 = 0 THEN embedding
         |         ELSE list_reverse(embedding) END AS vec
         |  FROM embeddings),
         |allv AS (SELECT id, vec, 0 AS isn FROM o
         |         UNION ALL SELECT id, vec, 1 AS isn FROM n)
         |SELECT a.id AS id_new, b.id AS id_match,
         |  round(${cosSql("a.vec", "b.vec")}, 6) AS cos
         |FROM n a JOIN allv b
         |  ON a.id != b.id AND (b.isn = 0 OR a.id < b.id)
         |WHERE round(${cosSql("a.vec", "b.vec")}, 6) >= CAST(0.95 AS DOUBLE)"""
        .stripMargin,

    // q117's PQ CTE chain under an L2 coarse tier: cell assignment and
    // query probes by round(sqdist,6) asc with cid tiebreaks, candidates
    // restricted to probed cells, ADC rank by (fixed-point LUT sum, id),
    // recall vs the exact-L2 truth — per nprobe ∈ {2,4}.
    "q118_ivfpq_recall" ->
      s"""WITH subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS sub),
         |sv AS (SELECT e.vec_id AS id, s.sub,
         |    e.embedding[CAST(s.sub * 8 + 1 AS INT):CAST((s.sub + 1) * 8 AS INT)]
         |      AS svec
         |  FROM embeddings e CROSS JOIN subs s),
         |cb0 AS (SELECT sub, id AS cid, svec AS cvec FROM sv WHERE id < 16),
         |a0 AS (SELECT id, sub, svec, code FROM (
         |  SELECT v.id, v.sub, v.svec, c.cid AS code,
         |    row_number() OVER (PARTITION BY v.id, v.sub
         |      ORDER BY round(${sqdSql("v.svec", "c.cvec")}, 6), c.cid) AS rn
         |  FROM sv v JOIN cb0 c ON v.sub = c.sub)
         |  WHERE rn = 1),
         |cb1 AS (SELECT sub, code AS cid, list(m ORDER BY pos) AS cvec FROM (
         |  SELECT sub, code, pos,
         |    CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS m FROM (
         |    SELECT sub, code, pos, sum(xfp) AS s, count(*) AS n FROM (
         |      SELECT sub, code, generate_subscripts(svec, 1) - 1 AS pos,
         |        CAST(round(CAST(unnest(svec) AS DOUBLE) * 1e6) AS BIGINT)
         |          AS xfp
         |      FROM a0)
         |    GROUP BY 1, 2, 3))
         |  GROUP BY 1, 2),
         |codes AS (SELECT id, sub, code FROM (
         |  SELECT v.id, v.sub, c.cid AS code,
         |    row_number() OVER (PARTITION BY v.id, v.sub
         |      ORDER BY round(${sqdSql("v.svec", "c.cvec")}, 6), c.cid) AS rn
         |  FROM sv v JOIN cb1 c ON v.sub = c.sub)
         |  WHERE rn = 1),
         |ivfc AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |         WHERE vec_id < 16),
         |acell AS (SELECT id, cell FROM (
         |  SELECT e.vec_id AS id, c.cid AS cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${sqdSql("e.embedding", "c.cvec")}, 6), c.cid)
         |      AS rn
         |  FROM embeddings e CROSS JOIN ivfc c)
         |  WHERE rn = 1),
         |q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |qsv AS (SELECT q.id AS qid, s.sub,
         |    q.vec[CAST(s.sub * 8 + 1 AS INT):CAST((s.sub + 1) * 8 AS INT)]
         |      AS svec
         |  FROM q CROSS JOIN subs s),
         |lut AS (SELECT v.qid, v.sub, c.cid,
         |    CAST(round(round(${sqdSql("v.svec", "c.cvec")}, 6) * 1e6) AS BIGINT)
         |      AS dfp
         |  FROM qsv v JOIN cb1 c ON v.sub = c.sub),
         |np AS (SELECT unnest([2, 4]) AS nprobe),
         |qc AS (SELECT n.nprobe, x.qid, x.cell FROM np n, (
         |  SELECT q.id AS qid, c.cid AS cell,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${sqdSql("q.vec", "c.cvec")}, 6), c.cid) AS pr
         |  FROM q CROSS JOIN ivfc c) x
         |  WHERE x.pr <= n.nprobe),
         |ad AS (SELECT qc.nprobe, qc.qid, a.id, sum(l.dfp) AS adist
         |  FROM qc JOIN acell a ON qc.cell = a.cell AND qc.qid != a.id
         |  JOIN codes k ON k.id = a.id
         |  JOIN lut l ON l.qid = qc.qid AND l.sub = k.sub AND l.cid = k.code
         |  GROUP BY 1, 2, 3),
         |approx AS (SELECT nprobe, qid, id FROM (
         |  SELECT nprobe, qid, id,
         |    row_number() OVER (PARTITION BY nprobe, qid
         |      ORDER BY adist, id) AS rnk
         |  FROM ad)
         |  WHERE rnk <= 5),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, e.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${sqdSql("q.vec", "e.embedding")}, 6), e.vec_id)
         |      AS rnk
         |  FROM q JOIN embeddings e ON q.id != e.vec_id)
         |  WHERE rnk <= 5),
         |h AS (SELECT a.nprobe, t.query_id, count(*) AS n_hit
         |  FROM truth t JOIN approx a
         |    ON t.query_id = a.qid AND t.neighbor_id = a.id
         |  GROUP BY 1, 2)
         |SELECT q.id AS query_id, CAST(n.nprobe AS INT) AS nprobe,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(round(CAST(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall_at_5
         |FROM q CROSS JOIN np n
         |LEFT JOIN h ON q.id = h.query_id AND n.nprobe = h.nprobe""".stripMargin,

    // Slice-equality banding (md5-bucket equality ≡ slice equality, the
    // q27 transparency argument) with the incremental asymmetry: new
    // probes old ∪ earlier-new; exact Jaccard on string shingles.
    "q114_incremental_lsh" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |oldsh AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh FROM tk),
         |newtk AS (SELECT doc_id + 1000000000 AS doc_id,
         |    CASE WHEN doc_id % 2 = 0 THEN tk ELSE list_sort(tk) END AS tk
         |  FROM tk),
         |newsh AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh FROM newtk),
         |sigo AS (SELECT doc_id, sh, ${minhashSql(16)} AS sig, 0 AS is_new
         |  FROM oldsh),
         |sign AS (SELECT doc_id, sh, ${minhashSql(16)} AS sig, 1 AS is_new
         |  FROM newsh),
         |allsig AS (SELECT * FROM sigo UNION ALL SELECT * FROM sign)
         |SELECT a.doc_id AS id_new, b.doc_id AS id_match,
         |  round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4)
         |    AS jac
         |FROM sign a JOIN allsig b
         |  ON (b.is_new = 0 OR b.doc_id < a.doc_id)
         |  AND (a.sig[1:4] = b.sig[1:4] OR a.sig[5:8] = b.sig[5:8]
         |    OR a.sig[9:12] = b.sig[9:12] OR a.sig[13:16] = b.sig[13:16])""".stripMargin,

    // Recomputes the decoded PIXEL features from the construction
    // arithmetic: n_bytes = 54-byte headers + 4 rows × (21 + 3 pad);
    // checksum = Σ (r+g+b) over the 28 pixels; first_byte = top-left
    // red channel. The engine must round-trip through real padded
    // bottom-up BMP bytes to match.
    "q113_bmp_decode" ->
      """WITH s AS (SELECT doc_id,
        |    list_transform(range(1, 29), i ->
        |      (unicode(substr(text, CAST(i AS INT), 1)) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 7) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 13) % 256)) AS ch,
        |    unicode(substr(text, 1, 1)) % 256 AS r0
        |  FROM documents)
        |SELECT doc_id, CAST(54 + 4 * 24 AS INT) AS n_bytes,
        |  CAST(list_sum(ch) AS BIGINT) AS checksum,
        |  CAST(r0 AS INT) AS first_byte
        |FROM s""".stripMargin,

    // Recomputes the SAMPLED frames' decoded features from the
    // construction arithmetic: frames {0, 2} of 4 at stride 2; frame
    // f's checksum = Σ_i ((cp+f)%256 + (cp·7+f)%256 + (cp·13+f)%256),
    // first_byte = (cp_1+f)%256 — per (doc, frame) row.
    "q122_video_frames" ->
      """WITH f AS (SELECT doc_id, text,
        |    CAST(unnest([0, 2]) AS INT) AS frame FROM documents)
        |SELECT doc_id, frame,
        |  CAST(list_sum(list_transform(range(1, 29), i ->
        |    ((unicode(substr(text, CAST(i AS INT), 1)) + frame) % 256)
        |    + ((unicode(substr(text, CAST(i AS INT), 1)) * 7 + frame) % 256)
        |    + ((unicode(substr(text, CAST(i AS INT), 1)) * 13 + frame) % 256)))
        |    AS BIGINT) AS checksum,
        |  CAST((unicode(substr(text, 1, 1)) + frame) % 256 AS INT)
        |    AS first_byte
        |FROM f""".stripMargin,

    // Recomputes the RESIZED pixel features from the construction
    // arithmetic plus the nearest-neighbor index map: output (x,y) of
    // the 3×2 target reads source (x·7/3, y·4/2) — flat 1-based index
    // 14·(y·4/2 ≠ 0) + x·7/3 + 1 → {1,3,5,15,17,19}; n_bytes is the
    // re-encoded 3×2 BMP (54 + 2 rows × (9 + 3 pad) = 78); first_byte
    // the resized top-left red channel (= source pixel 1's red).
    "q115_bmp_resize" ->
      """WITH s AS (SELECT doc_id,
        |    list_transform(range(1, 29), i ->
        |      (unicode(substr(text, CAST(i AS INT), 1)) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 7) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 13) % 256)) AS ch,
        |    unicode(substr(text, 1, 1)) % 256 AS r0
        |  FROM documents)
        |SELECT doc_id, CAST(78 AS INT) AS n_bytes,
        |  CAST(list_sum(list_transform(range(0, 6), i ->
        |    ch[CAST((i // 3) * 2 * 7 + ((i % 3) * 7) // 3 + 1 AS INT)]))
        |    AS BIGINT) AS checksum,
        |  CAST(r0 AS INT) AS first_byte
        |FROM s""".stripMargin,

    // Recomputes the per-FRAME features from the sample-construction
    // arithmetic: samples s_i = ((cp_{i+1}·37 + i) % 4096) − 2048 split
    // into 16-sample frames (partial tail dropped); zero_cross counts
    // sign flips between consecutive samples inside the frame (zero is
    // non-negative), energy = Σ|s| — all integer-exact on both engines.
    "q116_wav_frames" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST(least(length(text), 64) AS INT) AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(1, n + 1), i ->
        |      ((unicode(substr(text, CAST(i AS INT), 1)) * 37 + (i - 1))
        |        % 4096) - 2048) AS smp
        |  FROM d),
        |f AS (SELECT doc_id, CAST(unnest(range(0, n // 16)) AS INT)
        |    AS frame, smp FROM s)
        |SELECT doc_id, frame,
        |  CAST(len([i for i in range(2, 17)
        |    IF (smp[frame * 16 + i - 1] < 0) != (smp[frame * 16 + i] < 0)])
        |    AS INT) AS zero_cross,
        |  CAST(list_sum(list_transform(smp[frame * 16 + 1 : frame * 16 + 16],
        |    x -> abs(x))) AS BIGINT) AS energy
        |FROM f""".stripMargin,

    // Recomputes every WHT coefficient from the definition (popcount
    // parity sign over the k AND j grid) on the same synthesized
    // sample lists, squares and sums across frames — the engine's
    // butterfly must land on identical integers.
    "q208_wht_energy" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST(least(length(text), 64) AS INT) AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(1, n + 1), i ->
        |      ((unicode(substr(text, CAST(i AS INT), 1)) * 37 + (i - 1))
        |        % 4096) - 2048) AS smp
        |  FROM d),
        |f AS (SELECT doc_id, CAST(unnest(range(0, n // 16)) AS INT)
        |    AS frame, smp FROM s),
        |ks AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS k),
        |c AS (SELECT doc_id, frame, k,
        |    CAST(list_sum(list_transform(range(0, 16), j ->
        |      smp[frame * 16 + CAST(j AS INT) + 1]
        |        * (1 - 2 * (bit_count(CAST(k AS BIGINT)
        |            & CAST(j AS BIGINT)) % 2)))) AS BIGINT) AS coef
        |  FROM f CROSS JOIN ks)
        |SELECT doc_id, k, CAST(sum(coef * coef) AS BIGINT) AS energy
        |FROM c GROUP BY 1, 2""".stripMargin,

    // Recomputes the DECODED features from the payload-construction
    // arithmetic: n_bytes = 44-byte canonical WAV header + 2 bytes per
    // PCM16 sample; checksum = sum of the signed sample values;
    // first_byte = the first sample. The engine must round-trip the
    // same numbers through real RIFF bytes to match.
    "q111_wav_decode" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST(least(length(text), 64) AS INT) AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |    list_transform(range(1, n + 1), i ->
        |      ((unicode(substr(text, CAST(i AS INT), 1)) * 37 + (i - 1))
        |        % 4096) - 2048) AS smp
        |  FROM d)
        |SELECT doc_id, CAST(44 + 2 * n AS INT) AS n_bytes,
        |  CAST(coalesce(list_sum(smp), 0) AS BIGINT) AS checksum,
        |  CAST(coalesce(smp[1], -1) AS INT) AS first_byte
        |FROM s""".stripMargin,

    // NO blocking predicate (the engine's segment blocking is
    // recall-complete, so blocked must equal unblocked truth):
    // all-pairs levenshtein ≤ 1, asymmetric variants→clean probe,
    // struct-min best match, singletons via the left join.
    "q102_entity_resolution" ->
      """WITH p0 AS (SELECT p_partkey AS id, p_name AS name FROM part),
        |pr AS (SELECT id + 2000000000 AS id,
        |    substr(name, 1, CAST(id % length(name) AS INT))
        |      || substr(name, CAST(id % length(name) AS INT) + 2) AS name
        |  FROM p0),
        |m AS (SELECT pr.id AS vid,
        |    min({'d': CAST(levenshtein(pr.name, p0.name) AS BIGINT),
        |        'r': CAST(p0.id AS BIGINT)}) AS bk
        |  FROM pr JOIN p0 ON levenshtein(pr.name, p0.name) <= 1
        |  GROUP BY 1),
        |assigned AS (
        |  SELECT id, id AS canonical FROM p0
        |  UNION ALL
        |  SELECT pr.id, coalesce((m.bk).r, pr.id) AS canonical
        |  FROM pr LEFT JOIN m ON pr.id = m.vid)
        |SELECT canonical, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(min(id) AS BIGINT) AS min_id,
        |  CAST(max(id) AS BIGINT) AS max_id
        |FROM assigned GROUP BY 1""".stripMargin,

    // Brute-force all-pairs containment on STRING shingles (q28's
    // hash-transparency argument); same round-then-threshold order.
    "q101_containment" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |tgt AS (SELECT doc_id AS id_t, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh FROM tk),
         |ptk AS (SELECT doc_id + 2000000000 AS id_p, tk[1 : 12] AS tk FROM tk),
         |prb AS (SELECT id_p, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh FROM ptk)
         |SELECT id_p, id_t, cont FROM (
         |  SELECT id_p, id_t,
         |    round(len(list_intersect(p.sh, t.sh)) * 1.0 / len(p.sh), 4)
         |      AS cont
         |  FROM prb p CROSS JOIN tgt t WHERE len(p.sh) > 0)
         |WHERE cont >= 0.8""".stripMargin,

    // Same fixed-order double chain: each count divided by its own
    // total first, then ln, then the decimal snap.
    "q100_bigram_pmi" ->
      s"""WITH tk AS (SELECT $tokSql AS tk FROM documents),
         |bi AS (SELECT tk[i] AS a, tk[i + 1] AS b
         |  FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM tk)),
         |uni AS (SELECT unnest(tk) AS tok FROM tk),
         |u AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_uni
         |  FROM uni GROUP BY 1),
         |nu AS (SELECT CAST(sum(n_uni) AS BIGINT) AS n_u FROM u),
         |p AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
         |  FROM bi GROUP BY 1, 2),
         |nb AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_b_tot FROM p)
         |SELECT a, b, n_ab,
         |  CAST(round(CAST(ln((CAST(n_ab AS DOUBLE) / n_b_tot)
         |    / ((CAST(ua.n_uni AS DOUBLE) / n_u)
         |      * (CAST(ub.n_uni AS DOUBLE) / n_u))) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS pmi
         |FROM p JOIN u ua ON p.a = ua.tok JOIN u ub ON p.b = ub.tok
         |CROSS JOIN nu CROSS JOIN nb
         |WHERE n_ab >= 10""".stripMargin,

    // Native EXCEPT/INTERSECT — Catalyst's anti/semi-join plans must
    // produce the same distinct sets.
    "q96_set_ops" ->
      """WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
        |    WHERE year(CAST(o_orderdate AS DATE)) = 1995),
        |c96 AS (SELECT DISTINCT o_custkey FROM orders
        |    WHERE year(CAST(o_orderdate AS DATE)) = 1996),
        |seg AS (
        |  SELECT 'only_1995' AS segment, o_custkey
        |  FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)
        |  UNION ALL
        |  SELECT 'only_1996' AS segment, o_custkey
        |  FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c95)
        |  UNION ALL
        |  SELECT 'both' AS segment, o_custkey
        |  FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96))
        |SELECT segment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM seg GROUP BY 1""".stripMargin,

    // quantile_cont uses the same h=(n-1)p interpolation as Spark's
    // percentile; both sides snap through DECIMAL(20,10) before the
    // 4-place round.
    "q97_group_percentiles" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(CAST(quantile_cont(o_totalprice,
        |    CAST(0.5 AS DOUBLE)) AS DECIMAL(20,10)), 4) AS DOUBLE) AS p50,
        |  CAST(round(CAST(quantile_cont(o_totalprice,
        |    CAST(0.9 AS DOUBLE)) AS DECIMAL(20,10)), 4) AS DOUBLE) AS p90
        |FROM orders GROUP BY 1""".stripMargin,

    // Same portable 60-bit md5 key; ties impossible (hash of distinct
    // ids), doc_id tiebreak kept anyway.
    "q98_bottomk_sample" ->
      s"""SELECT doc_id, ${h60("CAST(doc_id AS VARCHAR)")} AS h
         |FROM documents ORDER BY h, doc_id LIMIT 25""".stripMargin,

    // Same line construction, same trimmed-line md5 document
    // frequency, same ordered reassembly (parallel unnest zips the
    // line list with its subscripts in DuckDB).
    "q127_boilerplate_scrub" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 2 = 0
         |      THEN l1 || chr(10) || 'ACCEPT COOKIES TO CONTINUE'
         |        || chr(10) || text
         |      ELSE l1 || chr(10) || text END AS t
         |  FROM (SELECT doc_id, text,
         |      array_to_string(($tokSql)[1:5], ' ') AS l1
         |    FROM documents)),
         |ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM d),
         |ln AS (
         |  SELECT doc_id, unnest(l) AS line,
         |    unnest(range(1, len(l) + 1)) AS pos
         |  FROM ls),
         |fr AS (
         |  SELECT md5(trim(line)) AS lfp,
         |    count(DISTINCT doc_id) AS line_df
         |  FROM ln GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN line_df >= 20 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dropped,
         |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
         |    FILTER (WHERE line_df < 20), '')) AS clean_fp
         |FROM ln JOIN fr ON fr.lfp = md5(trim(ln.line))
         |GROUP BY doc_id""".stripMargin,

    // The same canonicalization chain as the engine (shared CTE block),
    // keep-longest via DuckDB struct-min ≙ Spark min_by(struct) — the
    // (-token-count, id) lexicographic winner.
    "q130_url_dedup" ->
      s"""WITH $urlCanonCtes,
         |tk AS (SELECT doc_id, canonical_url,
         |    len($tokSql) AS n_tok FROM cu)
         |SELECT canonical_url,
         |  (min({'o': -n_tok, 'i': doc_id})).i AS kept_id,
         |  CAST(count(*) AS BIGINT) AS n_urls
         |FROM tk GROUP BY 1""".stripMargin,

    // Registered domain = last two host labels; the q24 quality score
    // snapped ×1e6 to BIGINT per doc BEFORE the sum, so the domain mean
    // and the flag compare exact integers on both engines.
    "q131_domain_quality" ->
      s"""WITH $urlCanonCtes,
         |sc AS (SELECT regexp_extract(host, '([^.]+\\.[^.]+)$$', 1)
         |      AS domain,
         |    CAST(round(CAST(round(CAST(
         |      0.4 * least(1.0, len(tk) / 100.0)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_filter(tk,
         |            t -> t IN ('the','a','of','to','and'))) * 1.0 / len(tk)
         |          END)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_distinct(tk)) * 1.0 / len(tk) END)
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) * 1e6) AS BIGINT) AS qfp
         |  FROM (SELECT host, $tokSql AS tk FROM cu)),
         |g AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(qfp) AS BIGINT) AS qsum
         |  FROM sc GROUP BY 1)
         |SELECT domain, n_docs,
         |  CAST(round(CAST(CAST(qsum AS DOUBLE)
         |    / (CAST(n_docs AS DOUBLE) * 1e6)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS mean_quality,
         |  CAST(qsum AS DOUBLE)
         |    < CAST(0.5 AS DOUBLE) * CAST(n_docs AS DOUBLE) * 1e6 AS flagged
         |FROM g""".stripMargin,

    // The same struct-max running window (ROWS … 1 PRECEDING) — DuckDB
    // struct comparison is field-order lexicographic like Spark's.
    "q140_last_touch_attribution" ->
      """WITH m AS (SELECT event_type, value,
        |    max(CASE WHEN event_type IN ('click', 'view')
        |      THEN {'tts': ts, 'tid': event_id, 'ttype': event_type}
        |      END) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch
        |  FROM events)
        |SELECT coalesce((touch).ttype, 'none') AS attributed_type,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  round(sum(value), 2) AS value_sum
        |FROM m WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin,

    // q78's session CTE + a lead within (user, session): boundaries are
    // hard because the lead window partitions on the session id; the
    // probability normalizes on the aggregated matrix.
    "q132_session_transitions" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |        > 1800 * 1000000 THEN 1
        |      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |      ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_id, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM m),
        |pr AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id, session_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM s),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(round(CAST(CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS p
        |FROM c""".stripMargin,

    // Corpus and increment each run the shared canonicalization chain
    // (tags c/i); novelty = distinct increment canonicals NOT IN the
    // corpus canonical set, rolled up on the registered domain.
    "q133_url_novelty" ->
      s"""WITH ${urlChainSql("c",
              s"""SELECT doc_id, text,
                 |    ${urlSql("doc_id", "source")} AS url
                 |  FROM documents""".stripMargin)},
         |${urlChainSql("i",
              s"""SELECT nid AS doc_id, text,
                 |    ${urlSql("nid", "src")} AS url
                 |  FROM (SELECT doc_id + 1000000000 AS nid, text,
                 |      CASE WHEN doc_id % 4 = 0 THEN source || 'x'
                 |        ELSE source END AS src
                 |    FROM documents)""".stripMargin)},
         |cd AS (SELECT DISTINCT canonical_url FROM ccu),
         |ci AS (SELECT canonical_url, regexp_extract(
         |      regexp_extract(canonical_url, '^([^/?]+)', 1),
         |      '([^.]+\\.[^.]+)$$', 1) AS domain
         |  FROM (SELECT DISTINCT canonical_url FROM icu)),
         |nv AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_novel
         |  FROM ci WHERE canonical_url NOT IN
         |    (SELECT canonical_url FROM cd)
         |  GROUP BY 1),
         |al AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_urls
         |  FROM ci GROUP BY 1)
         |SELECT al.domain, al.n_urls,
         |  CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel,
         |  CAST(round(CAST(CAST(coalesce(nv.n_novel, 0) AS DOUBLE)
         |    / CAST(al.n_urls AS DOUBLE)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS novelty_rate
         |FROM al LEFT JOIN nv ON al.domain = nv.domain""".stripMargin,

    // Three unrolled Lloyd-style CTE iterations of the damped update;
    // (1.0 − 0.85) is COMPUTED on both sides (an 0.15 literal is not
    // the same double), contributions snap ×1e9 pre-sum.
    "q135_pagerank" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
         |  FROM e GROUP BY 1),
         |p0 AS (SELECT id, CAST(1.0 AS DOUBLE) / CAST(nn AS DOUBLE) AS pr
         |  FROM nodes CROSS JOIN nc),
         |${prIterSql("p0", "p1")},
         |${prIterSql("p1", "p2")},
         |${prIterSql("p2", "p3")}
         |SELECT id AS doc_id,
         |  CAST(round(CAST(pr AS DECIMAL(20,10)), 8) AS DOUBLE) AS pr
         |FROM p3
         |ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin,

    // Two unrolled HITS iterations; hub then auth both from the LAST
    // iteration, same sort+limit cutoff as the engine.
    "q136_hits" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS hub FROM nodes),
         |${hitsIterSql("h0", "i1")},
         |${hitsIterSql("i1h", "i2")}
         |SELECT i2h.id AS doc_id,
         |  CAST(round(CAST(hub AS DECIMAL(20,10)), 8) AS DOUBLE) AS hub,
         |  CAST(round(CAST(auth AS DECIMAL(20,10)), 8) AS DOUBLE) AS auth
         |FROM i2h JOIN i2a ON i2h.id = i2a.id
         |ORDER BY 3 DESC, 1 LIMIT 20""".stripMargin,

    // The same index: postings from generate_subscripts, top bigram
    // from the comprehension (consecutive-pair enumeration — identical
    // pair set to the engine's adjacency self-join), same (n desc, a,
    // b) tie-break, same (doc, pos+1) adjacency.
    "q141_phrase_search" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |pg AS (SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos,
         |    unnest(tk) AS token FROM tk),
         |bgc AS (SELECT r['a'] AS a, r['b'] AS b, count(*) AS n FROM (
         |  SELECT unnest([{'a': tk[i + 1], 'b': tk[i + 2]}
         |      for i in range(0, len(tk) - 1)]) AS r
         |  FROM tk) GROUP BY 1, 2),
         |top AS (SELECT a, b FROM bgc ORDER BY n DESC, a, b LIMIT 1),
         |m AS (SELECT top.a, top.b, p1.doc_id, p1.pos
         |  FROM pg p1 JOIN top ON p1.token = top.a
         |  JOIN pg p2 ON p2.doc_id = p1.doc_id
         |    AND p2.pos = p1.pos + 1 AND p2.token = top.b)
         |SELECT a, b, doc_id, CAST(count(*) AS BIGINT) AS n_matches,
         |  CAST(min(pos) AS INT) AS first_pos
         |FROM m GROUP BY 1, 2, 3""".stripMargin,

    // The same in-query bigram model: counts and V are exact integers,
    // each occurrence's -ln term snapped x1e6 pre-sum (q126's ln
    // convention), mean through the DECIMAL(20,10) snap.
    "q138_bigram_nll" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |bg AS (SELECT doc_id, r['a'] AS a, r['b'] AS b FROM (
         |  SELECT doc_id, unnest([{'a': tk[i + 1], 'b': tk[i + 2]}
         |      for i in range(0, len(tk) - 1)]) AS r
         |  FROM tk)),
         |cb AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2),
         |ca AS (SELECT a, count(*) AS ca FROM bg GROUP BY 1),
         |v AS (SELECT count(DISTINCT w) AS v FROM
         |  (SELECT unnest(tk) AS w FROM tk)),
         |terms AS (SELECT bg.doc_id,
         |    CAST(round(-ln(CAST(cab + 1 AS DOUBLE)
         |      / CAST(ca + v AS DOUBLE)) * 1e6) AS BIGINT) AS tfp
         |  FROM bg JOIN cb USING (a, b) JOIN ca USING (a) CROSS JOIN v)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(round(CAST(CAST(sum(tfp) AS DOUBLE)
         |    / (CAST(count(*) AS DOUBLE) * 1e6)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS avg_nll
         |FROM terms GROUP BY 1""".stripMargin,

    // The aHash recomputed from the CONSTRUCTION arithmetic (q113's
    // convention — the oracle never parses BMP bytes): same integer
    // gray/mean/threshold chain, perturbed copy flips 3 red bits of
    // pixel 0; truth is the all-pairs hamming ≤ 2 scan, which the
    // engine's recall-complete 4-band blocking must equal exactly.
    "q137_image_phash_dedup" ->
      s"""WITH base AS (SELECT doc_id,
         |    CASE WHEN length(text) = 0 THEN 'x' ELSE text END AS t
         |  FROM documents),
         |cps AS (SELECT doc_id,
         |    list_transform(range(0, 56), i -> unicode(substr(t,
         |      CAST(i % length(t) AS INT) + 1, 1))) AS cp
         |  FROM base),
         |gs AS (
         |  SELECT doc_id,
         |    list_transform(cp, c ->
         |      ((c % 256) + ((c * 7) % 256) + ((c * 13) % 256)) // 3) AS g
         |  FROM cps
         |  UNION ALL
         |  SELECT doc_id + 2000000000 AS doc_id,
         |    [((xor(cp[1] % 256, 7)) + ((cp[1] * 7) % 256)
         |       + ((cp[1] * 13) % 256)) // 3] ||
         |      list_transform(cp[2:56], c ->
         |        ((c % 256) + ((c * 7) % 256) + ((c * 13) % 256)) // 3) AS g
         |  FROM cps WHERE doc_id % 5 = 0),
         |hs AS (SELECT doc_id,
         |    CAST(list_sum([CASE WHEN g[i + 1] > (list_sum(g) // 56)
         |        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
         |      for i in range(0, 56)]) AS BIGINT) AS h
         |  FROM gs)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.h, b.h)) AS hamming
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.h, b.h)) <= 2""".stripMargin,

    // All-pairs truth: the undirected a<b<c triple join finds each
    // triangle once; per-node credit unions the 3 corners. The engine's
    // degree-ordered orientation must reproduce this set exactly.
    "q142_triangles" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
        |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
        |  FROM docs CROSS JOIN nc
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
        |ue AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e WHERE src <> dst),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM ue e1 JOIN ue e2 ON e2.u = e1.v
        |  JOIN ue e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |GROUP BY 1""".stripMargin,

    // Three unrolled frontier expansions; the min-fold per round keeps
    // hops minimal exactly like the engine's groupBy-min.
    "q143_bfs_reach" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
        |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
        |  FROM docs CROSS JOIN nc
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
        |d0 AS (SELECT doc_id AS id, 0 AS hops FROM documents
        |  WHERE doc_id % 97 = 0),
        |f1 AS (SELECT e.dst AS id, 1 AS hops FROM e
        |  JOIN d0 ON e.src = d0.id),
        |d1 AS (SELECT id, min(hops) AS hops FROM
        |  (SELECT * FROM d0 UNION ALL SELECT * FROM f1) GROUP BY 1),
        |f2 AS (SELECT e.dst AS id, 2 AS hops FROM e
        |  JOIN (SELECT id FROM d1 WHERE hops = 1) f ON e.src = f.id),
        |d2 AS (SELECT id, min(hops) AS hops FROM
        |  (SELECT * FROM d1 UNION ALL SELECT * FROM f2) GROUP BY 1),
        |f3 AS (SELECT e.dst AS id, 3 AS hops FROM e
        |  JOIN (SELECT id FROM d2 WHERE hops = 2) f ON e.src = f.id),
        |d3 AS (SELECT id, min(hops) AS hops FROM
        |  (SELECT * FROM d2 UNION ALL SELECT * FROM f3) GROUP BY 1)
        |SELECT id AS doc_id, CAST(hops AS INT) AS hops FROM d3""".stripMargin,

    // Same df-derived query terms, same BM25 chain with every literal
    // forced DOUBLE and k1+1 COMPUTED (a 2.2 literal is not the same
    // double as 1.2+1.0); per-term snap ×1e6 pre-sum, top-k on the
    // exact integer score.
    "q144_bm25" -> bm25OracleSql(20),

    // Same unordered-min first-view anchor, same at-or-after first
    // purchase, quantile_cont over exact integer micros.
    "q145_conversion_lag" ->
      """WITH a AS (SELECT user_id, event_type, epoch_us(ts) AS tus,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id) AS first_from
        |  FROM events),
        |pu AS (SELECT user_id, first_from, min(tus) AS first_to
        |  FROM a WHERE event_type = 'purchase'
        |    AND first_from IS NOT NULL AND tus >= first_from
        |  GROUP BY 1, 2),
        |l AS (SELECT make_timestamp(first_from) AS ft,
        |    first_to - first_from AS lag_us FROM pu)
        |SELECT CAST(date_trunc('week', ft) AS DATE) AS cohort_week,
        |  CAST(count(*) AS BIGINT) AS n_converted,
        |  CAST(round(CAST(quantile_cont(lag_us, CAST(0.5 AS DOUBLE))
        |    / 1e6 AS DECIMAL(20,10)), 4) AS DOUBLE) AS p50_s,
        |  CAST(round(CAST(quantile_cont(lag_us, CAST(0.9 AS DOUBLE))
        |    / 1e6 AS DECIMAL(20,10)), 4) AS DOUBLE) AS p90_s
        |FROM l GROUP BY 1""".stripMargin,

    // q132's session CTE + two leads inside (user, session); same
    // (n desc, e1, e2, e3) cutoff.
    "q146_path_trigrams" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |        > 1800 * 1000000 THEN 1
        |      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |      ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_id, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM m),
        |tg AS (SELECT event_type AS e1,
        |    lead(event_type, 1) OVER w2 AS e2,
        |    lead(event_type, 2) OVER w2 AS e3
        |  FROM s WINDOW w2 AS (PARTITION BY user_id, session_id
        |    ORDER BY ts, event_id)),
        |c AS (SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        |  FROM tg WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |  GROUP BY 1, 2, 3)
        |SELECT e1, e2, e3, n FROM c
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    // Same cents fixed point: percentile bounds round to cents, clamp
    // and sum in exact integers, mean through the DECIMAL snap.
    "q147_winsorized_stats" ->
      """WITH r AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS vc
        |  FROM lineitem),
        |b AS (SELECT g,
        |    CAST(round(quantile_cont(vc, CAST(0.01 AS DOUBLE)))
        |      AS BIGINT) AS lo_c,
        |    CAST(round(quantile_cont(vc, CAST(0.99 AS DOUBLE)))
        |      AS BIGINT) AS hi_c
        |  FROM r GROUP BY 1)
        |SELECT g AS l_returnflag, lo_c, hi_c,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN vc < lo_c THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(sum(CASE WHEN vc > hi_c THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi,
        |  CAST(round(CAST(
        |    CAST(sum(least(greatest(vc, lo_c), hi_c)) AS DOUBLE)
        |    / (CAST(count(*) AS DOUBLE) * 100.0)
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS win_mean
        |FROM r JOIN b USING (g) GROUP BY 1, 2, 3""".stripMargin,

    // Same fixed-point chain: ×1e6 weight snap, exact 128-bit square
    // sum under the norm, ×1e6 re-snap, integer ×1e12 dot product and
    // integer threshold — the df > N/5 stopword prune via the exact
    // integer cross-multiply on both sides.
    "q148_sparse_cosine" ->
      s"""WITH tf AS (SELECT id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id AS id, unnest($tokSql) AS term
         |    FROM documents) GROUP BY 1, 2),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |  FROM tf GROUP BY 1),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |w AS (SELECT id, term, CAST(round(tf
         |      * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1e6)
         |    AS BIGINT) AS wfp
         |  FROM tf JOIN dfq USING (term) CROSS JOIN nd
         |  WHERE df * 5 <= n_docs * 1),
         |norms AS (SELECT id, sqrt(CAST(sum(wfp * wfp) AS DOUBLE)) AS norm
         |  FROM w GROUP BY 1),
         |nw AS (SELECT id, term,
         |    CAST(round(CAST(wfp AS DOUBLE) / norm * 1e6) AS BIGINT)
         |      AS nwfp
         |  FROM w JOIN norms USING (id)),
         |p AS (SELECT a.id AS id_a, b.id AS id_b,
         |    CAST(sum(a.nwfp * b.nwfp) AS BIGINT) AS sfp
         |  FROM nw a JOIN nw b ON a.term = b.term AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  CAST(round(CAST(CAST(sfp AS DOUBLE) / 1e12
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS sim
         |FROM p WHERE sfp >= 600000000000""".stripMargin,

    // Same per-symbol grid (generate_series ≙ sequence) and the same
    // IGNORE NULLS forward-fill window; the checksum divides the exact
    // cent sum once.
    "q149_gap_fill" ->
      s"""WITH obs AS (SELECT symbol, d,
         |    max(CAST(round(px * 100) AS BIGINT)) AS vc
         |  FROM ($barsSql) WHERE symbol <= 50 GROUP BY 1, 2),
         |span AS (SELECT symbol, min(d) AS d0, max(d) AS d1
         |  FROM obs GROUP BY 1),
         |grid AS (SELECT symbol,
         |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
         |  FROM span),
         |f AS (SELECT g.symbol, g.d, o.vc,
         |    last_value(o.vc IGNORE NULLS) OVER (PARTITION BY g.symbol
         |      ORDER BY g.d ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS value_c
         |  FROM grid g LEFT JOIN obs o
         |    ON o.symbol = g.symbol AND o.d = g.d)
         |SELECT symbol, CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(sum(CASE WHEN vc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_filled,
         |  round(CAST(sum(value_c) AS DOUBLE) / 100.0, 2) AS filled_sum
         |FROM f GROUP BY 1""".stripMargin,

    // Truth is the plain inequality join (DuckDB's IEJoin handles it);
    // the engine's grid blocking + canonical-cell dedup must reproduce
    // the pair set exactly.
    "q150_interval_overlap" ->
      """WITH a AS (SELECT o_orderkey AS a_key,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS a_lo,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      + 3 AS a_hi
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |b AS (SELECT o_orderkey AS b_key,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS b_lo,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      + 2 AS b_hi
        |  FROM orders WHERE o_orderpriority = '2-HIGH')
        |SELECT a_key AS o_orderkey, CAST(count(*) AS BIGINT) AS n_overlaps,
        |  min(b_key) AS first_b
        |FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi
        |GROUP BY 1""".stripMargin,

    // The pooled-ECDF sup over one ordered window (single-threaded
    // truth ≙ the engine's two-level prefix sum); the cross-products
    // stay exact (HUGEINT ≙ DECIMAL(38,0)), one double division.
    "q151_ks_drift" ->
      """WITH r AS (SELECT l_returnflag = 'R' AS t,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |n AS (SELECT
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM r),
        |bv AS (SELECT v,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM r GROUP BY 1),
        |c AS (SELECT sum(c1) OVER (ORDER BY v) AS cum1,
        |    sum(c2) OVER (ORDER BY v) AS cum2 FROM bv)
        |SELECT n1, n2,
        |  CAST(round(CAST(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS ks
        |FROM c CROSS JOIN n GROUP BY 1, 2""".stripMargin,

    // Same five HUGEINT moment sums (≙ DECIMAL(38,0)), same normal-
    // equation integers, same single double division / sqrt chain.
    "q152_ols_trend" ->
      s"""WITH b AS (SELECT symbol,
         |    date_diff('day', DATE '1970-01-01', d) AS x,
         |    CAST(round(px * 100) AS BIGINT) AS y
         |  FROM ($barsSql) WHERE symbol <= 200),
         |m AS (SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
         |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
         |  FROM b GROUP BY 1)
         |SELECT symbol, n,
         |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
         |      / CAST(n * sxx - sx * sx AS DOUBLE)
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS slope,
         |  CASE WHEN n * sxx - sx * sx = 0
         |      OR n * syy - sy * sy = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
         |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
         |        * CAST(n * syy - sy * sy AS DOUBLE))
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS r
         |FROM m""".stripMargin,

    // Three unrolled personalized iterations; the seed-concentrated
    // base is a CASE inside the update, (1.0 − 0.85) computed on both
    // sides, ×1e9 snapped contributions.
    "q153_trustrank" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
         |  FROM e GROUP BY 1),
         |sd AS (SELECT doc_id AS id FROM documents WHERE doc_id % 97 = 0),
         |scnt AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM sd),
         |tg AS (SELECT nodes.id, sd.id IS NOT NULL AS is_seed, ns
         |  FROM nodes CROSS JOIN scnt LEFT JOIN sd ON nodes.id = sd.id),
         |pp0 AS (SELECT id, CASE WHEN is_seed
         |    THEN CAST(1.0 AS DOUBLE) / CAST(ns AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS pr FROM tg),
         |${pprIterSql("pp0", "pp1")},
         |${pprIterSql("pp1", "pp2")},
         |${pprIterSql("pp2", "pp3")}
         |SELECT id AS doc_id,
         |  CAST(round(CAST(pr AS DECIMAL(20,10)), 8) AS DOUBLE) AS ppr
         |FROM pp3
         |ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin,

    // Same distinct (source, token) sets, same a<b intersection join,
    // same (jaccard desc, a, b) cutoff.
    "q168_vocab_overlap" ->
      s"""WITH st AS (SELECT DISTINCT source, unnest(tk) AS tok
         |  FROM (SELECT source, $tokSql AS tk FROM documents)),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tok
         |  FROM st GROUP BY 1),
         |inter AS (SELECT x.source AS a, y.source AS b,
         |    CAST(count(*) AS BIGINT) AS n_inter
         |  FROM st x JOIN st y
         |    ON x.tok = y.tok AND x.source < y.source
         |  GROUP BY 1, 2)
         |SELECT a, b, n_inter,
         |  CAST(round(CAST(CAST(n_inter AS DOUBLE)
         |    / CAST(sa.n_tok + sb.n_tok - n_inter AS DOUBLE)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS jaccard
         |FROM inter
         |JOIN sz sa ON inter.a = sa.source
         |JOIN sz sb ON inter.b = sb.source
         |ORDER BY jaccard DESC, a, b LIMIT 15""".stripMargin,

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

    // q56's register chain grouped by the exploded window label; the
    // exact side explodes the same 3 offsets.
    "q166_sliding_distinct" ->
      """WITH ev AS (SELECT date_trunc('hour', ts) AS h, user_id
        |  FROM events),
        |hh AS (SELECT h, md5(CAST(user_id AS VARCHAR)) AS hx FROM ev),
        |parts AS (SELECT h, hx, substr(hx, 4, 29) AS rest,
        |    ltrim(substr(hx, 4, 29), '0') AS st
        |  FROM hh),
        |reg AS (SELECT h,
        |    CAST('0x' || substr(hx, 1, 3) AS BIGINT) AS bucket,
        |    max(CASE WHEN length(st) = 0 THEN 117
        |        ELSE (length(rest) - length(st)) * 4 +
        |          (CASE WHEN substr(st, 1, 1) = '1' THEN 3
        |                WHEN substr(st, 1, 1) IN ('2','3') THEN 2
        |                WHEN substr(st, 1, 1) IN ('4','5','6','7') THEN 1
        |                ELSE 0 END) + 1 END) AS rho
        |  FROM parts GROUP BY 1, 2),
        |winreg AS (SELECT h + off * INTERVAL 1 HOUR AS w, bucket,
        |    max(rho) AS rho
        |  FROM reg CROSS JOIN (SELECT unnest([0, 1, 2]) AS off)
        |  GROUP BY 1, 2),
        |agg AS (SELECT w, count(*) AS nb,
        |    CAST(sum(CAST(floor(power(CAST(2.0 AS DOUBLE), 50 - rho))
        |      AS BIGINT)) AS BIGINT) AS sum_fp
        |  FROM winreg GROUP BY 1),
        |est AS (SELECT w,
        |    CAST(round(CAST(CASE WHEN raw <= CAST(10240.0 AS DOUBLE)
        |        AND v > 0
        |        THEN ln(CAST(4096.0 AS DOUBLE) / v) * CAST(4096.0 AS DOUBLE)
        |        ELSE raw END AS DECIMAL(20,10)), 2) AS DOUBLE) AS n_approx
        |  FROM (SELECT w,
        |      (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
        |         + CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))
        |        * CAST(4096.0 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
        |        * power(CAST(2.0 AS DOUBLE), 50)
        |        / (sum_fp + (4096 - nb) * (CAST(1 AS BIGINT) << 50)) AS raw,
        |      CAST(4096 - nb AS DOUBLE) AS v
        |    FROM agg)),
        |ex AS (SELECT h + off * INTERVAL 1 HOUR AS w,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM ev CROSS JOIN (SELECT unnest([0, 1, 2]) AS off)
        |  GROUP BY 1)
        |SELECT ex.w, ex.n_exact, est.n_approx
        |FROM ex JOIN est ON ex.w = est.w""".stripMargin,

    // Same distinct-value cumulative weights, same integer 2·cum ≥
    // total crossing.
    "q167_weighted_median" ->
      """WITH r AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS wt
        |  FROM lineitem),
        |bv AS (SELECT g, v, CAST(sum(wt) AS BIGINT) AS wsum
        |  FROM r GROUP BY 1, 2),
        |t AS (SELECT g, CAST(sum(wsum) AS BIGINT) AS tw
        |  FROM bv GROUP BY 1),
        |c AS (SELECT g, v,
        |    CAST(sum(wsum) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM bv)
        |SELECT c.g AS l_returnflag, t.tw AS total_w,
        |  round(CAST(min(c.v) AS DOUBLE) / 100.0, 2) AS w_median
        |FROM c JOIN t ON c.g = t.g
        |WHERE c.cum * 2 >= t.tw
        |GROUP BY 1, 2""".stripMargin,

    // Same distinct-pair running-max window (ROWS frame over the same
    // two-key sort).
    "q164_pareto_frontier" ->
      """WITH pts AS (SELECT CAST(round(p_retailprice * 100) AS BIGINT)
        |    AS price_c, p_size, CAST(count(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1, 2),
        |m AS (SELECT price_c, p_size, n_parts,
        |    max(p_size) OVER (ORDER BY price_c ASC, p_size DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxs
        |  FROM pts)
        |SELECT price_c, p_size, n_parts FROM m
        |WHERE maxs IS NULL OR p_size > maxs""".stripMargin,

    // Same per-user conversion reduction and the identical double op
    // order in the z chain.
    "q165_ab_test" ->
      """WITH pu AS (SELECT user_id % 2 AS arm,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY user_id),
        |arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(converted) AS BIGINT) AS conv
        |  FROM pu GROUP BY 1),
        |a AS (SELECT n AS n_a, conv AS conv_a FROM arms WHERE arm = 0),
        |b AS (SELECT n AS n_b, conv AS conv_b FROM arms WHERE arm = 1)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
        |    THEN NULL ELSE
        |  CAST(round(CAST(
        |    ((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |      - (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |    / sqrt((CAST(conv_a + conv_b AS DOUBLE)
        |        / CAST(n_a + n_b AS DOUBLE))
        |      * (CAST(1.0 AS DOUBLE) - CAST(conv_a + conv_b AS DOUBLE)
        |        / CAST(n_a + n_b AS DOUBLE))
        |      * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) END AS z
        |FROM a CROSS JOIN b""".stripMargin,

    // Same distinct-score counts, same exclusive running negative
    // count (the single ordered window IS the two-level sum's value),
    // same exact-integer rank-sum numerator and final division.
    "q170_auc" ->
      """WITH r AS (SELECT (event_type = 'purchase') AS y,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |bv AS (SELECT v,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS q
        |  FROM r GROUP BY 1),
        |c AS (SELECT p, q,
        |    COALESCE(CAST(sum(q) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS nb
        |  FROM bv)
        |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
        |  CAST(sum(q) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(p) = 0 OR sum(q) = 0 THEN NULL ELSE
        |    CAST(round(CAST(CAST(sum(CAST(p AS HUGEINT)
        |        * (2 * nb + q)) AS DOUBLE)
        |      / (CAST(2.0 AS DOUBLE) * CAST(sum(p) AS DOUBLE)
        |        * CAST(sum(q) AS DOUBLE))
        |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS auc
        |FROM c""".stripMargin,

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

    // Same md5 bloom cells (q66's chain) over the filtered dim keys,
    // same pass/match/fp splits, revenue in exact cents.
    "q172_bloom_join" -> {
      val dimBkt = s"CAST(${h60("CAST(i AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)")} % 8192 AS BIGINT)"
      val prbBkt = s"CAST(${h60("CAST(i AS VARCHAR) || '|' || CAST(l_orderkey AS VARCHAR)")} % 8192 AS BIGINT)"
      s"""WITH dim AS (SELECT o_orderkey FROM orders
         |  WHERE o_orderpriority = '1-URGENT'
         |    AND CAST(o_orderdate AS DATE) >= DATE '1995-06-01'),
         |reg AS (SELECT DISTINCT i, $dimBkt AS bucket
         |  FROM dim, range(5) r(i)),
         |probes AS (SELECT DISTINCT l_orderkey FROM lineitem),
         |pb AS (SELECT l_orderkey, i, $prbBkt AS bucket
         |  FROM probes, range(5) r(i)),
         |m AS (SELECT l_orderkey,
         |    sum(CASE WHEN hit IS NULL THEN 0 ELSE 1 END) = 5 AS mc
         |  FROM pb LEFT JOIN (SELECT i, bucket, 1 AS hit FROM reg)
         |    USING (i, bucket)
         |  GROUP BY 1),
         |pass AS (SELECT l_orderkey FROM m WHERE mc),
         |mt AS (SELECT l_orderkey FROM pass
         |  JOIN dim ON l_orderkey = o_orderkey),
         |rev AS (SELECT CAST(sum(CAST(round(l_extendedprice * 100)
         |    AS BIGINT)) AS BIGINT) AS rev_c
         |  FROM lineitem WHERE l_orderkey IN (SELECT l_orderkey FROM mt))
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM probes) AS n_probe_keys,
         |  (SELECT CAST(count(*) AS BIGINT) FROM pass) AS n_pass,
         |  (SELECT CAST(count(*) AS BIGINT) FROM mt) AS n_match,
         |  (SELECT CAST(count(*) AS BIGINT) FROM pass)
         |    - (SELECT CAST(count(*) AS BIGINT) FROM mt) AS n_false_pos,
         |  rev_c
         |FROM rev""".stripMargin
    },

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

    // Same collapsed vocabulary, same paren framing, three unrolled
    // merge rounds with the identical (pc desc, a, b) greedy pick.
    "q175_bpe_train" ->
      s"""WITH wc AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest($tokSql) AS tok FROM documents)
         |  WHERE regexp_matches(tok, '^[a-z0-9]+${"$"}')
         |  GROUP BY 1),
         |w0 AS (SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS w, cnt
         |  FROM wc),
         |${bpeIterSql("w0", "w1")},
         |${bpeIterSql("w1", "w2")},
         |${bpeIterSql("w2", "w3")}
         |SELECT 1 AS round, a AS sym_a, b AS sym_b, pc AS pair_count
         |  FROM w1b
         |UNION ALL SELECT 2, a, b, pc FROM w2b
         |UNION ALL SELECT 3, a, b, pc FROM w3b
         |ORDER BY round""".stripMargin,

    // Same ×1000 snap (double-cast first), same per-row outer-product
    // enumeration, exact integer cells cast to double at the end.
    "q176_gramian" ->
      """WITH c AS (SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS c
        |  FROM embeddings),
        |ii AS (SELECT c, unnest(range(1, len(c) + 1)) AS i FROM c),
        |p AS (SELECT i, c[i] AS ci, unnest(range(1, len(c) + 1)) AS j, c
        |  FROM ii)
        |SELECT CAST(i - 1 AS INTEGER) AS i, CAST(j - 1 AS INTEGER) AS j,
        |  CAST(CAST(sum(ci * c[j]) AS HUGEINT) AS DOUBLE) AS g
        |FROM p GROUP BY 1, 2""".stripMargin,

    // Same smoothed probabilities (identical double op order), same
    // per-term ×1e9 snap, same (kl desc, a, b) cutoff.
    "q177_source_kl" ->
      s"""WITH tk AS (SELECT source, unnest($tokSql) AS tok
         |  FROM documents),
         |cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM tk GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
         |  FROM cnt GROUP BY 1),
         |voc AS (SELECT DISTINCT tok FROM cnt),
         |vc AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
         |pr AS (SELECT x.source AS sa, x.n AS na, y.source AS sb,
         |    y.n AS nb
         |  FROM tot x JOIN tot y ON x.source <> y.source),
         |sup AS (SELECT sa, na, sb, nb, tok, v
         |  FROM pr CROSS JOIN voc CROSS JOIN vc),
         |j AS (SELECT sa, sb,
         |    CAST(coalesce(a.c, 0) + 1 AS DOUBLE)
         |      / CAST(na + v AS DOUBLE) AS pa,
         |    CAST(coalesce(b.c, 0) + 1 AS DOUBLE)
         |      / CAST(nb + v AS DOUBLE) AS pb
         |  FROM sup
         |  LEFT JOIN cnt a ON a.source = sup.sa AND a.tok = sup.tok
         |  LEFT JOIN cnt b ON b.source = sup.sb AND b.tok = sup.tok),
         |t AS (SELECT sa, sb,
         |    CAST(round(pa * ln(pa / pb) * 1e9) AS BIGINT) AS tf
         |  FROM j)
         |SELECT sa AS source_a, sb AS source_b,
         |  CAST(round(CAST(CAST(sum(tf) AS DOUBLE) / 1e9
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS kl
         |FROM t GROUP BY 1, 2
         |ORDER BY kl DESC, source_a, source_b LIMIT 25""".stripMargin,

    // Same distinct-value counts, same exclusive running count, same
    // ⌊below·bins/N⌋ integer bin, one rate division per bin.
    "q178_calibration" ->
      """WITH r AS (SELECT (event_type = 'purchase') AS y,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |bv AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM r GROUP BY 1),
        |cb AS (SELECT v, c, pos,
        |    COALESCE(CAST(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS below
        |  FROM bv),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r)
        |SELECT CAST((below * 10) // n AS INTEGER) AS bin,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  CAST(sum(pos) AS BIGINT) AS n_pos,
        |  CAST(round(CAST(CAST(sum(pos) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE)
        |    AS rate,
        |  min(v) AS lo_c, max(v) AS hi_c
        |FROM cb CROSS JOIN nn GROUP BY 1 ORDER BY bin""".stripMargin,

    // Same pair join (strict (ts, id) order), same ×1e6 weight snap
    // before the per-conversion total, same ×1e4 per-pair credit snap.
    "q179_decay_attribution" ->
      """WITH tch AS (SELECT user_id AS u, event_type AS tt,
        |    epoch_us(ts) AS tus, event_id AS tord
        |  FROM events WHERE event_type IN ('click', 'view')),
        |cv AS (SELECT user_id AS u, epoch_us(ts) AS cus,
        |    event_id AS cord, CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE event_type = 'purchase'),
        |pr AS (SELECT cv.u, cv.cus, cv.cord, cv.vc, tch.tt, tch.tus
        |  FROM cv JOIN tch ON cv.u = tch.u
        |  WHERE tch.tus < cv.cus
        |    OR (tch.tus = cv.cus AND tch.tord < cv.cord)),
        |pw AS (SELECT *, greatest(CAST(round(pow(CAST(0.5 AS DOUBLE),
        |      CAST(cus - tus AS DOUBLE) / CAST(86400000000 AS DOUBLE)
        |        / CAST(7.0 AS DOUBLE)) * 1e6) AS BIGINT), 1) AS w_fp
        |  FROM pr),
        |sw AS (SELECT u, cus, cord, CAST(sum(w_fp) AS BIGINT) AS sw_fp
        |  FROM pw GROUP BY 1, 2, 3),
        |cr AS (SELECT pw.tt,
        |    CAST(round(CAST(vc AS DOUBLE) * CAST(w_fp AS DOUBLE)
        |      / CAST(sw_fp AS DOUBLE) * 1e4) AS BIGINT) AS credit_fp
        |  FROM pw JOIN sw ON pw.u = sw.u AND pw.cus = sw.cus
        |    AND pw.cord = sw.cord),
        |bt AS (SELECT tt AS touch_type,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(round(CAST(CAST(sum(credit_fp) AS DOUBLE) / 1e6
        |      AS DECIMAL(20,10)), 2) AS DOUBLE) AS credit
        |  FROM cr GROUP BY 1),
        |orp AS (SELECT 'none' AS touch_type,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    coalesce(CAST(round(CAST(CAST(sum(vc) AS DOUBLE)
        |      / CAST(100.0 AS DOUBLE) AS DECIMAL(20,10)), 2) AS DOUBLE),
        |      CAST(0.0 AS DOUBLE)) AS credit
        |  FROM cv WHERE NOT EXISTS (SELECT 1 FROM pr
        |    WHERE pr.u = cv.u AND pr.cus = cv.cus AND pr.cord = cv.cord))
        |SELECT * FROM bt UNION ALL SELECT * FROM orp""".stripMargin,

    // Same per-source registers (q166's md5 chain keyed by source),
    // same pair-union bucket max, same estimate formula both levels.
    "q180_sketched_overlap" ->
      s"""WITH st AS (SELECT source, unnest($tokSql) AS tok
         |  FROM documents),
         |hh AS (SELECT source, md5(tok) AS hx FROM st),
         |parts AS (SELECT source, hx, substr(hx, 4, 29) AS rest,
         |    ltrim(substr(hx, 4, 29), '0') AS st
         |  FROM hh),
         |reg AS (SELECT source,
         |    CAST('0x' || substr(hx, 1, 3) AS BIGINT) AS bucket,
         |    max(CASE WHEN length(st) = 0 THEN 117
         |        ELSE (length(rest) - length(st)) * 4 +
         |          (CASE WHEN substr(st, 1, 1) = '1' THEN 3
         |                WHEN substr(st, 1, 1) IN ('2','3') THEN 2
         |                WHEN substr(st, 1, 1) IN ('4','5','6','7') THEN 1
         |                ELSE 0 END) + 1 END) AS rho
         |  FROM parts GROUP BY 1, 2),
         |${hllEstSql("reg", "source", "se")},
         |pr AS (SELECT x.source AS a, x.est AS n_a,
         |    y.source AS b, y.est AS n_b
         |  FROM se x JOIN se y ON x.source < y.source),
         |mem AS (SELECT a, b, a AS source FROM pr
         |  UNION ALL SELECT a, b, b FROM pr),
         |ureg AS (SELECT a, b, bucket, max(rho) AS rho
         |  FROM mem JOIN reg USING (source) GROUP BY 1, 2, 3),
         |${hllEstSql("ureg", "a, b", "ue")}
         |SELECT pr.a, pr.b, n_a, n_b, ue.est AS n_union,
         |  CAST(round(CAST(n_a + n_b - ue.est AS DECIMAL(20,10)), 2)
         |    AS DOUBLE) AS n_inter_est
         |FROM pr JOIN ue ON pr.a = ue.a AND pr.b = ue.b
         |ORDER BY n_inter_est DESC, pr.a, pr.b LIMIT 15""".stripMargin,

    // q93's chunk chain with the source attached; distinct (source,
    // fp) before the self-join, same (n desc, a, b) cutoff.
    "q181_cross_contamination" ->
      s"""WITH tk AS (SELECT doc_id, source, $tokSql AS tk
         |  FROM documents),
         |st AS (SELECT doc_id, source, tk,
         |    unnest(range(1, len(tk) + 1, 8)) AS start FROM tk),
         |ch AS (SELECT DISTINCT source,
         |    md5(array_to_string(tk[start : start + 7], ' ')) AS fp
         |  FROM st),
         |pr AS (SELECT x.source AS source_a, y.source AS source_b,
         |    CAST(count(*) AS BIGINT) AS n_shared_spans
         |  FROM ch x JOIN ch y
         |    ON x.fp = y.fp AND x.source < y.source
         |  GROUP BY 1, 2)
         |SELECT * FROM pr
         |ORDER BY n_shared_spans DESC, source_a, source_b
         |LIMIT 15""".stripMargin,

    // Same monthly-last collapse (full (d, ord, px) tiebreak), same
    // ×1e6 slope snap, same exact integer median crossing.
    "q182_theil_sen" ->
      s"""WITH b AS ($barsSql),
         |m AS (SELECT symbol, year(d) * 12 + month(d) - 1 AS xm,
         |    CAST(round(px * 100) AS BIGINT) AS pxc, d, ord
         |  FROM b WHERE symbol <= 100),
         |mm AS (SELECT symbol, xm, pxc AS yc FROM (
         |    SELECT symbol, xm, pxc, row_number() OVER (
         |      PARTITION BY symbol, xm
         |      ORDER BY d DESC, ord DESC, pxc DESC) AS rn FROM m)
         |  WHERE rn = 1),
         |pr AS (SELECT a.symbol AS g,
         |    CAST(round((CAST(b2.yc - a.yc AS DOUBLE)
         |      / CAST(b2.xm - a.xm AS DOUBLE)) * 1e6) AS BIGINT) AS s_fp
         |  FROM mm a JOIN mm b2
         |    ON a.symbol = b2.symbol AND a.xm < b2.xm),
         |bv AS (SELECT g, s_fp, CAST(count(*) AS BIGINT) AS c
         |  FROM pr GROUP BY 1, 2),
         |t AS (SELECT g, CAST(sum(c) AS BIGINT) AS tw FROM bv GROUP BY 1),
         |cc AS (SELECT g, s_fp,
         |    CAST(sum(c) OVER (PARTITION BY g ORDER BY s_fp
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM bv)
         |SELECT cc.g AS symbol, t.tw AS n_pairs,
         |  CAST(round(CAST(CAST(min(cc.s_fp) AS DOUBLE) / 1e6
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS ts_slope
         |FROM cc JOIN t USING (g) WHERE cc.cum * 2 >= t.tw
         |GROUP BY 1, 2""".stripMargin,

    // Recomputes each tile's brightness sum from the construction
    // arithmetic (the q113 convention — a decode that misreads any
    // header field, row flip, or padding byte hash-fails): per-pixel
    // brightness keyed by the top-down row-major index, grouped by
    // the ⌊r/2⌋, ⌊c/4⌋ tile.
    "q183_image_patches" ->
      """WITH px AS (SELECT doc_id, rpad(text, 32, ' ') AS text,
        |    CAST(unnest(range(0, 32)) AS INT) AS i FROM documents),
        |v AS (SELECT doc_id, i // 8 AS r, i % 8 AS c,
        |    (unicode(substr(text, CAST(i + 1 AS INT), 1)) % 256)
        |    + ((unicode(substr(text, CAST(i + 1 AS INT), 1)) * 7) % 256)
        |    + ((unicode(substr(text, CAST(i + 1 AS INT), 1)) * 13) % 256)
        |      AS br
        |  FROM px)
        |SELECT doc_id, CAST(r // 2 AS INT) AS tile_r,
        |  CAST(c // 4 AS INT) AS tile_c,
        |  CAST(sum(br) AS BIGINT) AS px_sum
        |FROM v GROUP BY 1, 2, 3""".stripMargin,

    // Same md5 hash blocks, same ×1e6 leave-one-out snap, same exact
    // integer moment algebra, same final double chain.
    "q184_block_jackknife" -> {
      val keySql = "CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)"
      s"""WITH r AS (SELECT ${h60(keySql)} % 20 AS b,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
         |  FROM lineitem),
         |pb AS (SELECT b, CAST(count(*) AS BIGINT) AS nb,
         |    CAST(sum(v) AS BIGINT) AS sb
         |  FROM r GROUP BY 1),
         |t AS (SELECT CAST(sum(nb) AS BIGINT) AS n,
         |    CAST(sum(sb) AS BIGINT) AS s,
         |    CAST(count(*) AS BIGINT) AS bb FROM pb),
         |m AS (SELECT n, s, bb,
         |    CAST(round(CAST(s - sb AS DOUBLE) / CAST(n - nb AS DOUBLE)
         |      * 1e6) AS BIGINT) AS m_fp
         |  FROM pb CROSS JOIN t WHERE nb < n),
         |a AS (SELECT n, s, bb,
         |    CAST(sum(CAST(m_fp AS HUGEINT)) AS HUGEINT) AS sm,
         |    CAST(sum(CAST(m_fp AS HUGEINT) * CAST(m_fp AS HUGEINT))
         |      AS HUGEINT) AS sm2
         |  FROM m GROUP BY 1, 2, 3)
         |SELECT n AS n_rows, bb AS n_blocks,
         |  CAST(round(CAST(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
         |    / CAST(100.0 AS DOUBLE) AS DECIMAL(20,10)), 6) AS DOUBLE)
         |    AS mean,
         |  CAST(round(CAST(sqrt(CAST(bb - 1 AS DOUBLE)
         |      * CAST(bb * sm2 - sm * sm AS DOUBLE)
         |      / CAST(bb * bb AS DOUBLE) / 1e12)
         |    / CAST(100.0 AS DOUBLE) AS DECIMAL(20,10)), 6) AS DOUBLE)
         |    AS se
         |FROM a""".stripMargin
    },

    // Same first-digit-of-cents-string extraction, same log10
    // expected share, same χ² op order.
    "q185_benford" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
        |    AS v FROM lineitem
        |  WHERE CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
        |c AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT)
        |    AS digit, CAST(count(*) AS BIGINT) AS n
        |  FROM v GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c)
        |SELECT digit, n,
        |  CAST(round(CAST(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS obs_share,
        |  CAST(round(CAST(log(CAST(1.0 AS DOUBLE)
        |    + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE))
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS benford_share,
        |  CAST(round(CAST(
        |    ((CAST(n AS DOUBLE) - CAST(nn AS DOUBLE)
        |       * log(CAST(1.0 AS DOUBLE)
        |         + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
        |     * (CAST(n AS DOUBLE) - CAST(nn AS DOUBLE)
        |       * log(CAST(1.0 AS DOUBLE)
        |         + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE))))
        |    / (CAST(nn AS DOUBLE) * log(CAST(1.0 AS DOUBLE)
        |       + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS chi2
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin,

    // The q175 unrolled merge chain, with per-round total symbol
    // counts read off each words CTE.
    "q186_bpe_compression" ->
      s"""WITH wc AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest($tokSql) AS tok FROM documents)
         |  WHERE regexp_matches(tok, '^[a-z0-9]+${"$"}')
         |  GROUP BY 1),
         |w0 AS (SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS w, cnt
         |  FROM wc),
         |${bpeIterSql("w0", "w1")},
         |${bpeIterSql("w1", "w2")},
         |${bpeIterSql("w2", "w3")}
         |SELECT 0 AS round, CAST(sum(cnt *
         |    len(string_split(w[2:-2], ')('))) AS BIGINT)
         |    AS total_symbols FROM w0
         |UNION ALL SELECT 1, CAST(sum(cnt *
         |    len(string_split(w[2:-2], ')('))) AS BIGINT) FROM w1
         |UNION ALL SELECT 2, CAST(sum(cnt *
         |    len(string_split(w[2:-2], ')('))) AS BIGINT) FROM w2
         |UNION ALL SELECT 3, CAST(sum(cnt *
         |    len(string_split(w[2:-2], ')('))) AS BIGINT) FROM w3
         |ORDER BY round""".stripMargin,

    // Same md5 halves, same snapped per-dim sums, same exact-integer
    // dot/norm algebra with one double chain per label.
    "q187_centroid_drift" -> {
      val halfSql = s"${h60("CAST(vec_id AS VARCHAR)")} % 2"
      s"""WITH ex AS (SELECT label, vec_id, embedding,
         |    unnest(range(1, len(embedding) + 1)) AS i
         |  FROM embeddings),
         |e AS (SELECT label, $halfSql AS half, i,
         |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
         |      AS c
         |  FROM ex),
         |bd AS (SELECT label, half, i, CAST(sum(c) AS BIGINT) AS s
         |  FROM e GROUP BY 1, 2, 3),
         |j AS (SELECT a.label, a.s AS sa, b.s AS sb
         |  FROM bd a JOIN bd b
         |    ON a.label = b.label AND a.i = b.i
         |   AND a.half = 0 AND b.half = 1),
         |p AS (SELECT label,
         |    CAST(sum(CAST(sa AS HUGEINT) * sb) AS HUGEINT) AS dot,
         |    CAST(sum(CAST(sa AS HUGEINT) * sa) AS HUGEINT) AS na2,
         |    CAST(sum(CAST(sb AS HUGEINT) * sb) AS HUGEINT) AS nb2
         |  FROM j GROUP BY 1),
         |cn AS (SELECT label,
         |    CAST(sum(CASE WHEN $halfSql = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN $halfSql = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_b
         |  FROM embeddings GROUP BY 1)
         |SELECT cn.label AS label, n_a, n_b,
         |  CAST(round(CAST(CAST(dot AS DOUBLE)
         |    / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE))
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS cos_halves
         |FROM cn JOIN p ON cn.label = p.label
         |ORDER BY label""".stripMargin
    },

    // Same per-user reductions, same three exclusive-running-count bin
    // maps, same exact-integer monetary means.
    "q188_rfm" ->
      s"""WITH mx AS (SELECT max(CAST(ts AS DATE)) AS d0 FROM events),
         |pu AS (SELECT user_id,
         |    CAST(date_diff('day', max(CAST(ts AS DATE)),
         |      (SELECT d0 FROM mx)) AS BIGINT) AS rec,
         |    CAST(count(*) AS BIGINT) AS freq,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(round(value * 100) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS mon
         |  FROM events GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM pu),
         |${rfmBinSql("rec", 5, "rb")},
         |${rfmBinSql("freq", 5, "fb")},
         |${rfmBinSql("mon", 5, "mb")}
         |SELECT rb.bin AS r_bin, fb.bin AS f_bin, mb.bin AS m_bin,
         |  CAST(count(*) AS BIGINT) AS n_users,
         |  CAST(round(CAST(CAST(sum(mon) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) / CAST(100.0 AS DOUBLE)
         |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS avg_monetary
         |FROM pu
         |JOIN rb ON pu.rec = rb.v
         |JOIN fb ON pu.freq = fb.v
         |JOIN mb ON pu.mon = mb.v
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // q24's score snapped ×1e4, negated into the q188 bin-map CTE
    // (best docs = bin 0), same running token shares.
    "q189_selection_curve" ->
      s"""WITH sc AS (SELECT
         |    CAST(round(CAST(round(CAST(0.4 * least(1.0, len(tk) / 100.0)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_filter(tk,
         |            t -> t IN ('the','a','of','to','and'))) * 1.0
         |            / len(tk) END)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_distinct(tk)) * 1.0 / len(tk) END)
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) * 10000) AS BIGINT)
         |      AS sfp,
         |    CAST(len(tk) AS BIGINT) AS ntok
         |  FROM (SELECT $tokSql AS tk FROM documents)),
         |pu AS (SELECT -sfp AS nv, ntok FROM sc),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM pu),
         |${rfmBinSql("nv", 10, "qb")},
         |per AS (SELECT qb.bin, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(ntok) AS BIGINT) AS tokens
         |  FROM pu JOIN qb ON pu.nv = qb.v GROUP BY 1),
         |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM per)
         |SELECT bin, n_docs, tokens,
         |  CAST(sum(tokens) OVER (ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum_tokens,
         |  CAST(round(CAST(CAST(sum(tokens) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS DOUBLE) / CAST(tt AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS cum_share
         |FROM per CROSS JOIN t ORDER BY bin""".stripMargin,

    // Same md5 halves, same train-side counts, same interpolated
    // λ·p₂ + (1−λ)·p₁ chain with the ×1e6 per-term snap.
    "q190_heldout_perplexity" -> {
      val half = s"${h60("CAST(doc_id AS VARCHAR)")} % 2"
      s"""WITH tg AS (SELECT doc_id, $tokSql AS tk, $half = 0 AS tr
         |  FROM documents),
         |bgx AS (SELECT doc_id, tr, tk,
         |    unnest(range(1, len(tk))) AS i FROM tg),
         |bg AS (SELECT doc_id, tr, tk[i] AS a, tk[i+1] AS b FROM bgx),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
         |  FROM (SELECT unnest(tk) AS w FROM tg WHERE tr) GROUP BY 1),
         |tv AS (SELECT CAST(sum(cw) AS BIGINT) AS tt,
         |    CAST(count(*) AS BIGINT) AS v FROM uni),
         |cb AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cab
         |  FROM bg WHERE tr GROUP BY 1, 2),
         |ca2 AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca
         |  FROM cb GROUP BY 1),
         |nd AS (SELECT
         |    CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_train_docs,
         |    CAST(sum(CASE WHEN tr THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_heldout_docs
         |  FROM tg),
         |terms AS (SELECT
         |    CAST(round(-ln(CAST(0.7 AS DOUBLE)
         |      * (CASE WHEN cab IS NULL OR ca IS NULL
         |          THEN CAST(0.0 AS DOUBLE)
         |          ELSE CAST(cab AS DOUBLE) / CAST(ca AS DOUBLE) END)
         |      + CAST(0.3 AS DOUBLE)
         |      * (CAST(coalesce(u.cw, 0) + 1 AS DOUBLE)
         |        / CAST(tt + v AS DOUBLE))) * 1e6) AS BIGINT) AS tfp,
         |    CASE WHEN cab IS NULL THEN 1 ELSE 0 END AS bo
         |  FROM (SELECT * FROM bg WHERE NOT tr) h
         |  LEFT JOIN cb USING (a, b)
         |  LEFT JOIN ca2 USING (a)
         |  LEFT JOIN uni u ON u.w = h.b
         |  CROSS JOIN tv)
         |SELECT n_train_docs, n_heldout_docs,
         |  CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(round(CAST(CAST(sum(tfp) AS DOUBLE)
         |    / (CAST(count(*) AS DOUBLE) * 1e6) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS avg_nll,
         |  CAST(round(CAST(CAST(sum(bo) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS backoff_rate
         |FROM terms CROSS JOIN nd
         |GROUP BY 1, 2""".stripMargin
    },

    // Same hash-selected cut tokens, same strictly-before chunk ids,
    // same ordered chunk-text fingerprints and cross-doc splits.
    "q191_cdc_chunks" ->
      s"""WITH tx AS (SELECT doc_id, i, tk[i] AS tok
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i
         |    FROM (SELECT doc_id, $tokSql AS tk FROM documents))),
         |ct AS (SELECT doc_id, i, tok,
         |    CASE WHEN ${h60("tok")} % 8 = 0 THEN 1 ELSE 0 END AS is_cut
         |  FROM tx),
         |ch AS (SELECT doc_id, i, tok,
         |    COALESCE(sum(is_cut) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS chunk
         |  FROM ct),
         |cg AS (SELECT doc_id, chunk, CAST(count(*) AS BIGINT) AS n_tok,
         |    md5(string_agg(tok, ' ' ORDER BY i)) AS fp
         |  FROM ch GROUP BY 1, 2),
         |bf AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_occ,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS tok_mass
         |  FROM cg GROUP BY 1)
         |SELECT CAST(sum(n_occ) AS BIGINT) AS n_chunks,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_crossdoc_fp,
         |  CAST(round(CAST(CAST(sum(CASE WHEN n_docs >= 2
         |      THEN tok_mass ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(tok_mass) AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS dup_token_share
         |FROM bf""".stripMargin,

    // Same three keep-min stages (exact fp, digit-folded skeleton fp,
    // canonical URL via the q130 chain over stage-2 survivors).
    "q192_dedup_cascade" ->
      s"""WITH b AS (SELECT doc_id, text, source FROM documents),
         |s1 AS (SELECT doc_id, text, source FROM (
         |    SELECT *, row_number() OVER (PARTITION BY
         |      md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn FROM b) WHERE rn = 1),
         |s2 AS (SELECT doc_id, text, source FROM (
         |    SELECT *, row_number() OVER (PARTITION BY
         |      md5(regexp_replace(regexp_replace(trim(lower(text)),
         |        '\\s+', ' ', 'g'), '[0-9]+', '#', 'g'))
         |      ORDER BY doc_id) AS rn FROM s1) WHERE rn = 1),
         |${urlChainSql("cas",
           s"""SELECT doc_id, text,
              |    ${urlSql("doc_id", "source")} AS url FROM s2""".stripMargin)}
         |SELECT '0_input' AS stage, CAST(count(*) AS BIGINT)
         |    AS n_surviving FROM b
         |UNION ALL SELECT '1_exact', CAST(count(*) AS BIGINT) FROM s1
         |UNION ALL SELECT '2_template', CAST(count(*) AS BIGINT) FROM s2
         |UNION ALL SELECT '3_url',
         |  CAST(count(DISTINCT canonical_url) AS BIGINT) FROM cascu
         |ORDER BY stage""".stripMargin,

    // Same daily collapse (full (ord, y) tiebreak), same windowed
    // moment sums, same end-of-series pick and normal-equation chain.
    "q196_rolling_beta" ->
      s"""WITH b AS ($barsSql),
         |f AS (SELECT symbol, d, ord,
         |    CAST(round(px * 100) AS BIGINT) AS y
         |  FROM b WHERE symbol <= 100),
         |daily AS (SELECT symbol, d, y,
         |    CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS x
         |  FROM (SELECT symbol, d, y, row_number() OVER (
         |      PARTITION BY symbol, d ORDER BY ord DESC, y DESC) AS rn
         |    FROM f) WHERE rn = 1),
         |r AS (SELECT symbol, d,
         |    CAST(count(*) OVER win AS BIGINT) AS n,
         |    CAST(sum(CAST(x AS HUGEINT)) OVER win AS HUGEINT) AS sx,
         |    CAST(sum(CAST(y AS HUGEINT)) OVER win AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) OVER win AS HUGEINT)
         |      AS sxx,
         |    CAST(sum(CAST(x AS HUGEINT) * y) OVER win AS HUGEINT)
         |      AS sxy
         |  FROM daily
         |  WINDOW win AS (PARTITION BY symbol ORDER BY d
         |    ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)),
         |l AS (SELECT symbol, n, sx, sy, sxx, sxy, row_number() OVER (
         |    PARTITION BY symbol ORDER BY d DESC) AS rn FROM r)
         |SELECT symbol, n AS n_window,
         |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
         |      / CAST(n * sxx - sx * sx AS DOUBLE)
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS beta
         |FROM l WHERE rn = 1 ORDER BY symbol""".stripMargin,

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

    // Independent reconstruction from fingerprint groups: canonical =
    // min id, weight = group size; weighted token mass must equal the
    // raw tripled-corpus totals.
    "q200_dedup_weights" ->
      s"""WITH dup AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL SELECT doc_id + 1000000000, text, lang FROM documents
         |  UNION ALL SELECT doc_id + 2000000000, text, lang FROM documents),
         |fp AS (SELECT doc_id, lang, text,
         |  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM dup),
         |grp AS (SELECT fp, min(doc_id) AS doc_id,
         |    CAST(count(*) AS BIGINT) AS weight
         |  FROM fp GROUP BY fp)
         |SELECT lang, count(*) AS n_kept,
         |  CAST(sum(weight) AS BIGINT) AS n_represented,
         |  CAST(sum(weight * len($tokSql)) AS BIGINT) AS weighted_tokens
         |FROM fp JOIN grp USING (doc_id, fp)
         |GROUP BY lang""".stripMargin,

    // Independent double-rank construction (window rank + tie count),
    // same HUGEINT moments and one-double chain as q194.
    "q201_spearman" ->
      """WITH r AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
        |    AS x, CAST(l_quantity AS BIGINT) AS y FROM lineitem),
        |bx AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1),
        |rx AS (SELECT x, 2 * COALESCE(CAST(sum(c) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS BIGINT), 0) + c + 1 AS drx FROM bx),
        |by_ AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1),
        |ry AS (SELECT y, 2 * COALESCE(CAST(sum(c) OVER (ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS BIGINT), 0) + c + 1 AS dry FROM by_),
        |j AS (SELECT drx, dry FROM r JOIN rx USING (x) JOIN ry USING (y)),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(drx AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(dry AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(drx AS HUGEINT) * drx) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(dry AS HUGEINT) * dry) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(drx AS HUGEINT) * dry) AS HUGEINT) AS sxy
        |  FROM j)
        |SELECT n,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
        |    THEN NULL ELSE
        |    CAST(round(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |        * CAST(n * syy - sy * sy AS DOUBLE))
        |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS spearman
        |FROM m""".stripMargin,

    // Same division-free per-cell identity, same ×1e6 snap; the grid
    // is the margins' cross product so EMPTY cells contribute e.
    "q202_chi2_independence" ->
      """WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt
        |  FROM cells GROUP BY 1),
        |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS na,
        |    CAST(count(DISTINCT source) AS BIGINT) AS nb FROM cells),
        |grid AS (SELECT lang, source, rt, ct, COALESCE(o, 0) AS o
        |  FROM rt CROSS JOIN ct LEFT JOIN cells USING (lang, source)),
        |terms AS (SELECT nn, na, nb,
        |    CAST(round(1e6 * CAST((CAST(nn AS HUGEINT) * o
        |        - CAST(rt AS HUGEINT) * ct)
        |        * (CAST(nn AS HUGEINT) * o - CAST(rt AS HUGEINT) * ct)
        |        AS DOUBLE)
        |      / CAST(CAST(nn AS HUGEINT) * rt * ct AS DOUBLE))
        |      AS BIGINT) AS term_fp
        |  FROM grid CROSS JOIN tot)
        |SELECT nn AS n, na AS n_a, nb AS n_b,
        |  (na - 1) * (nb - 1) AS dof,
        |  CAST(round(CAST(CAST(sum(term_fp) AS DOUBLE) / 1e6
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS chi2
        |FROM terms GROUP BY 1, 2, 3, 4""".stripMargin,

    // Observed cells only (o·ln(0) = 0 convention — the opposite of
    // chi2's empty-cell grid), same ×1e9 per-cell snap, MI and the
    // ln(min(|A|,|B|))-normalized coefficient off one exact term sum.
    "q212_mutual_information" ->
      """WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt
        |  FROM cells GROUP BY 1),
        |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS na,
        |    CAST(count(DISTINCT source) AS BIGINT) AS nb FROM cells),
        |terms AS (SELECT nn, na, nb,
        |    CAST(round(1e9 * CAST(o AS DOUBLE)
        |      * ln(CAST(CAST(nn AS HUGEINT) * o AS DOUBLE)
        |        / CAST(CAST(rt AS HUGEINT) * ct AS DOUBLE)))
        |      AS BIGINT) AS term_fp
        |  FROM cells JOIN rt USING (lang) JOIN ct USING (source)
        |  CROSS JOIN tot)
        |SELECT nn AS n, na AS n_a, nb AS n_b,
        |  CAST(round(CAST(CAST(sum(term_fp) AS DOUBLE) / nn / 1e9
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS mi,
        |  CASE WHEN least(na, nb) <= 1 THEN NULL ELSE
        |    CAST(round(CAST(CAST(sum(term_fp) AS DOUBLE) / nn / 1e9
        |      / ln(CAST(least(na, nb) AS DOUBLE))
        |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS nmi
        |FROM terms GROUP BY 1, 2, 3""".stripMargin,

    // Independent KM: window prefix count for at-risk, running ln-sum
    // for the product; same −1e8 sentinel where everyone at risk fails.
    "q203_kaplan_meier" ->
      """WITH pu AS (SELECT user_id, min(epoch_us(ts)) AS t0,
        |    max(epoch_us(ts)) AS t1,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts)
        |      END) AS tp
        |  FROM events GROUP BY 1),
        |obs AS (SELECT (COALESCE(tp, t1) - t0) // 3600000000 AS t,
        |    (tp IS NOT NULL) AS e FROM pu),
        |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM obs GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM obs),
        |rk AS (SELECT t, c, d, COALESCE(CAST(sum(c) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS BIGINT), 0) AS cb FROM byt),
        |ev AS (SELECT t, n - cb AS n_risk, d,
        |    CASE WHEN d = n - cb THEN CAST(-100000000 AS BIGINT)
        |      ELSE CAST(round(1e6 * ln(CAST(n - cb - d AS DOUBLE)
        |        / CAST(n - cb AS DOUBLE))) AS BIGINT) END AS lf
        |  FROM rk CROSS JOIN nn WHERE d > 0)
        |SELECT t, n_risk, d AS n_events,
        |  CAST(round(CAST(exp(CAST(sum(lf) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) / 1e6) AS DECIMAL(20,10)), 4) AS DOUBLE)
        |    AS survival
        |FROM ev""".stripMargin,

    // Independent SN construction: ONE global row_number over the
    // distinct name vocabulary (the engine's two-level ranking must
    // equal it exactly), rank-distance range join, real levenshtein.
    "q205_sorted_neighborhood" ->
      """WITH vars AS (SELECT p_name AS nm FROM part
        |  UNION ALL SELECT
        |    substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
        |      || substr(p_name,
        |        CAST(p_partkey % length(p_name) AS INT) + 2) AS nm
        |  FROM part),
        |nm AS (SELECT DISTINCT nm FROM vars),
        |rk AS (SELECT nm, row_number() OVER (ORDER BY nm) - 1 AS rk
        |  FROM nm),
        |c AS (SELECT a.nm AS name_a, b.nm AS name_b,
        |    CAST(b.rk - a.rk AS BIGINT) AS rank_gap,
        |    CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
        |  FROM rk a JOIN rk b ON b.rk > a.rk AND b.rk - a.rk <= 7)
        |SELECT name_a, name_b, rank_gap, dist FROM c
        |WHERE dist <= 2""".stripMargin,

    // Same labeled pair population (planted +10000 near-dups true,
    // +1-neighbor pairs false), exact |∩|/|∪| over the same 60-bit
    // hashed shingles, same S-curve and ×1e6 snap.
    "q206_lsh_plan" ->
      s"""WITH d2 AS ($docsDupSql),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM d2),
         |shl AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh
         |  FROM tk),
         |hs AS (SELECT doc_id,
         |    list_transform(sh, s -> ${h60("s")}) AS hs
         |  FROM shl WHERE len(sh) > 0),
         |tp AS (SELECT a.hs AS ha, b.hs AS hb, TRUE AS tp
         |  FROM hs a JOIN hs b ON b.doc_id = a.doc_id + 1000000000
         |  WHERE a.doc_id < 1000000000),
         |fp AS (SELECT a.hs AS ha, b.hs AS hb, FALSE AS tp
         |  FROM hs a JOIN hs b ON b.doc_id = a.doc_id + 1
         |  WHERE a.doc_id < 1000000000 AND b.doc_id < 1000000000),
         |prs AS (SELECT CAST(len(list_intersect(ha, hb)) AS BIGINT)
         |    AS inter, CAST(len(ha) AS BIGINT) AS la,
         |    CAST(len(hb) AS BIGINT) AS lb, tp
         |  FROM (SELECT * FROM tp UNION ALL SELECT * FROM fp)),
         |sims AS (SELECT CAST(inter AS DOUBLE) / (la + lb - inter)
         |    AS s, tp FROM prs),
         |cfg AS (SELECT unnest([1, 2, 4, 8, 16]) AS r),
         |terms AS (SELECT CAST(16 // r AS INT) AS bands,
         |    CAST(r AS INT) AS rows_per_band, tp,
         |    CAST(round(1e6 * (CAST(1 AS DOUBLE)
         |      - power(CAST(1 AS DOUBLE) - power(s, r), 16 // r)))
         |      AS BIGINT) AS p_fp
         |  FROM sims CROSS JOIN cfg)
         |SELECT bands, rows_per_band,
         |  CAST(sum(CASE WHEN tp THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_true,
         |  CAST(sum(CASE WHEN tp THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_false,
         |  CAST(round(CAST(CAST(sum(CASE WHEN tp THEN p_fp END)
         |      AS DOUBLE)
         |    / CAST(sum(CASE WHEN tp THEN 1 ELSE 0 END) AS DOUBLE)
         |    / 1e6 AS DECIMAL(20,10)), 6) AS DOUBLE) AS exp_recall,
         |  CAST(round(CAST(CAST(sum(CASE WHEN tp THEN NULL ELSE p_fp
         |      END) AS DOUBLE)
         |    / CAST(sum(CASE WHEN tp THEN 0 ELSE 1 END) AS DOUBLE)
         |    / 1e6 AS DECIMAL(20,10)), 6) AS DOUBLE) AS exp_fp_rate
         |FROM terms GROUP BY 1, 2""".stripMargin,

    // Independent log-odds chain: same add-one Dirichlet smoothing,
    // same (1e6·δ/√var) snap, same (z desc, term) top-5 cut.
    "q207_log_odds_terms" ->
      s"""WITH tok AS (SELECT source AS src, unnest($tokSql) AS tok
         |  FROM documents),
         |ysw AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS ysw
         |  FROM tok GROUP BY 1, 2),
         |yw AS (SELECT tok, CAST(sum(ysw) AS BIGINT) AS yw
         |  FROM ysw GROUP BY 1),
         |ns AS (SELECT src, CAST(sum(ysw) AS BIGINT) AS ns
         |  FROM ysw GROUP BY 1),
         |tot AS (SELECT CAST(sum(ysw) AS BIGINT) AS n,
         |    CAST(count(DISTINCT tok) AS BIGINT) AS v FROM ysw),
         |sc AS (SELECT src, tok, ysw,
         |    ln(CAST(ysw + 1 AS DOUBLE)
         |        / CAST(ns + v - ysw - 1 AS DOUBLE))
         |      - ln(CAST(yw - ysw + 1 AS DOUBLE)
         |        / CAST(n - ns + v - (yw - ysw) - 1 AS DOUBLE))
         |      AS delta,
         |    CAST(1 AS DOUBLE) / CAST(ysw + 1 AS DOUBLE)
         |      + CAST(1 AS DOUBLE) / CAST(yw - ysw + 1 AS DOUBLE)
         |      AS var
         |  FROM ysw JOIN yw USING (tok) JOIN ns USING (src)
         |  CROSS JOIN tot),
         |zf AS (SELECT src, tok, ysw,
         |    CAST(round(1e6 * delta / sqrt(var)) AS BIGINT) AS z_fp
         |  FROM sc),
         |rkd AS (SELECT src, tok, ysw, z_fp, row_number() OVER
         |    (PARTITION BY src ORDER BY z_fp DESC, tok) AS rnk
         |  FROM zf)
         |SELECT src AS source, CAST(rnk AS INT) AS rnk, tok AS term,
         |  ysw AS n_in_source,
         |  CAST(round(CAST(CAST(z_fp AS DOUBLE) / 1e6
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS z
         |FROM rkd WHERE rnk <= 5""".stripMargin,

    // Same floor-bucketing, first-bucket-per-token cumulative vocab,
    // window running sums, the q152 moment/rounding chain on the
    // ×1e6 ln points.
    "q220_heaps_fit" ->
      s"""WITH nn AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS mx
         |  FROM documents),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |shl AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh
         |  FROM tk),
         |tok AS (SELECT least(9, CAST(floor(doc_id * 10 / mx) AS INT))
         |    AS bkt, unnest(sh) AS tok
         |  FROM shl CROSS JOIN nn),
         |pb AS (SELECT bkt, CAST(count(*) AS BIGINT) AS tc
         |  FROM tok GROUP BY 1),
         |fv AS (SELECT bkt, CAST(count(*) AS BIGINT) AS vc FROM (
         |  SELECT tok, min(bkt) AS bkt FROM tok GROUP BY 1)
         |  GROUP BY 1),
         |pts AS (SELECT
         |    sum(tc) OVER (ORDER BY bkt) AS n,
         |    sum(coalesce(vc, 0)) OVER (ORDER BY bkt) AS v
         |  FROM pb LEFT JOIN fv USING (bkt)),
         |pp AS (SELECT
         |    CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT) AS x,
         |    CAST(round(1e6 * ln(CAST(v AS DOUBLE))) AS BIGINT) AS y
         |  FROM pts WHERE n > 0 AND v > 0),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
         |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
         |  FROM pp),
         |tot AS (SELECT CAST(max(n) AS BIGINT) AS n_units,
         |    CAST(max(v) AS BIGINT) AS vocab FROM pts
         |  WHERE n > 0 AND v > 0)
         |SELECT m.n AS n_checkpoints, tot.n_units, tot.vocab,
         |  CASE WHEN m.n * sxx - sx * sx = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(m.n * sxy - sx * sy AS DOUBLE)
         |      / CAST(m.n * sxx - sx * sx AS DOUBLE)
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS beta,
         |  CASE WHEN m.n * sxx - sx * sx = 0
         |      OR m.n * syy - sy * sy = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(m.n * sxy - sx * sy AS DOUBLE)
         |      / sqrt(CAST(m.n * sxx - sx * sx AS DOUBLE)
         |        * CAST(m.n * syy - sy * sy AS DOUBLE))
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS r
         |FROM m CROSS JOIN tot""".stripMargin,

    // Same positional 4-gram hashes, full-window starts (short docs
    // degrade to one global window at pos 0), rightmost-min via
    // (h asc, pos desc) row_number, df ≤ 16 guard, same top-20 cut.
    "q221_winnowing" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |gr AS (SELECT doc_id, r['p'] AS pos,
         |    ${h60("r['g']")} AS h FROM (
         |  SELECT doc_id, unnest([{'p': i,
         |      'g': array_to_string(tk[i+1:i+4], ' ')}
         |      for i in range(0, len(tk) - 3)]) AS r FROM tk)),
         |n AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY 1),
         |st AS (SELECT gr.doc_id, gr.pos AS ws
         |  FROM gr JOIN n USING (doc_id)
         |  WHERE gr.pos <= n.n - 4 OR (n.n < 4 AND gr.pos = 0)),
         |sel AS (SELECT doc_id, h FROM (
         |  SELECT st.doc_id, g2.h,
         |    row_number() OVER (PARTITION BY st.doc_id, st.ws
         |      ORDER BY g2.h ASC, g2.pos DESC) AS rn
         |  FROM st JOIN gr g2 ON g2.doc_id = st.doc_id
         |    AND g2.pos BETWEEN st.ws AND st.ws + 3)
         |  WHERE rn = 1),
         |fp AS (SELECT DISTINCT doc_id, h FROM sel),
         |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
         |  FROM fp GROUP BY 1),
         |dfh AS (SELECT h FROM fp GROUP BY h HAVING count(*) <= 16),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM fp a JOIN dfh USING (h) JOIN fp b USING (h)
         |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_shared, na.nfp AS nfp_a,
         |  nb.nfp AS nfp_b,
         |  CAST(round(CAST(CAST(n_shared AS DOUBLE)
         |    / CAST(least(na.nfp, nb.nfp) AS DOUBLE)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS containment
         |FROM pr JOIN nf na ON na.doc_id = pr.doc_a
         |JOIN nf nb ON nb.doc_id = pr.doc_b
         |ORDER BY n_shared DESC, doc_a, doc_b LIMIT 20""".stripMargin,

    // Same ×1e6 per-component snap pre-sum; cosine on the integer sum
    // vectors in HUGEINT, the identical two-sqrt one-division tail.
    "q246_centroid_separation" ->
      """WITH dm AS (SELECT g, pos, CAST(sum(sv) AS BIGINT) AS sv,
        |    CAST(count(*) AS BIGINT) AS nn
        |  FROM (SELECT label AS g,
        |      generate_subscripts(embedding, 1) - 1 AS pos,
        |      CAST(round(CAST(unnest(embedding) AS DOUBLE)
        |        * CAST(1e6 AS DOUBLE)) AS BIGINT) AS sv
        |    FROM embeddings) GROUP BY 1, 2),
        |nr AS (SELECT g, sum(CAST(sv AS HUGEINT) * sv) AS nrm2,
        |    max(nn) AS n FROM dm GROUP BY 1),
        |dt AS (SELECT a.g AS la, b.g AS lb,
        |    sum(CAST(a.sv AS HUGEINT) * b.sv) AS dt
        |  FROM dm a JOIN dm b ON a.pos = b.pos AND a.g < b.g
        |  GROUP BY 1, 2)
        |SELECT CAST(la AS BIGINT) AS label_a,
        |  CAST(lb AS BIGINT) AS label_b,
        |  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
        |  CASE WHEN na.nrm2 = 0 OR nb.nrm2 = 0 THEN NULL ELSE
        |    CAST(round(CAST(CAST(dt.dt AS DOUBLE) /
        |      (sqrt(CAST(na.nrm2 AS DOUBLE)) * sqrt(CAST(nb.nrm2 AS DOUBLE)))
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS cos_ab
        |FROM dt JOIN nr na ON na.g = dt.la JOIN nr nb ON nb.g = dt.lb""".stripMargin,

    // Same pair stream as three distance-d passes (d = 1..3) unioned
    // by a VALUES cross join, same (least, greatest) canonical form
    // and q100-style ln snap.
    "q245_skipgram_pmi" ->
      s"""WITH tk AS (SELECT $tokSql AS tk FROM documents),
         |pr AS (SELECT least(tk[i], tk[i + d]) AS a,
         |    greatest(tk[i], tk[i + d]) AS b
         |  FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM tk)
         |  CROSS JOIN (VALUES (1), (2), (3)) dd(d)
         |  WHERE i + d <= len(tk)),
         |uni AS (SELECT unnest(tk) AS tok FROM tk),
         |u AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_uni
         |  FROM uni GROUP BY 1),
         |nu AS (SELECT CAST(sum(n_uni) AS BIGINT) AS n_u FROM u),
         |p AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
         |  FROM pr GROUP BY 1, 2),
         |np AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n_p_tot FROM p)
         |SELECT a, b, n_ab,
         |  CAST(round(CAST(ln((CAST(n_ab AS DOUBLE) / n_p_tot)
         |    / ((CAST(ua.n_uni AS DOUBLE) / n_u)
         |      * (CAST(ub.n_uni AS DOUBLE) / n_u))) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS pmi
         |FROM p JOIN u ua ON p.a = ua.tok JOIN u ub ON p.b = ub.tok
         |CROSS JOIN nu CROSS JOIN np
         |WHERE n_ab >= 25""".stripMargin,

    // q245's pair generator at window 2, self-pairs dropped, ≥25
    // survivors symmetrized into a directed edge list, then three
    // unrolled q135 PageRank iterations (string node ids join the same
    // way), identical sort+limit cutoff.
    "q247_textrank" ->
      s"""WITH tk AS (SELECT $tokSql AS tk FROM documents),
         |pr0 AS (SELECT least(tk[i], tk[i + d]) AS a,
         |    greatest(tk[i], tk[i + d]) AS b
         |  FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM tk)
         |  CROSS JOIN (VALUES (1), (2)) dd(d)
         |  WHERE i + d <= len(tk)),
         |p AS (SELECT a, b FROM pr0 WHERE a <> b
         |  GROUP BY 1, 2 HAVING count(*) >= 25),
         |e AS (SELECT a AS src, b AS dst FROM p
         |  UNION ALL SELECT b, a FROM p),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM nodes),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
         |  FROM e GROUP BY 1),
         |p0 AS (SELECT id, CAST(1.0 AS DOUBLE) / CAST(nn AS DOUBLE) AS pr
         |  FROM nodes CROSS JOIN nc),
         |${prIterSql("p0", "p1")},
         |${prIterSql("p1", "p2")},
         |${prIterSql("p2", "p3")}
         |SELECT id AS token,
         |  CAST(round(CAST(pr AS DECIMAL(20,10)), 8) AS DOUBLE) AS score
         |FROM p3
         |ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin,

    // GROUP BY CUBE with GROUPING() flags — same four grouping sets,
    // same flag semantics (1 = rolled up).
    "q248_cube_profile" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(GROUPING(source) AS INT) AS g_source,
        |  CAST(GROUPING(lang) AS INT) AS g_lang
        |FROM documents GROUP BY CUBE (source, lang)""".stripMargin,

    // Manual CASE pivot; DuckDB dayofweek is Sunday=0, Spark's is
    // Sunday=1 — the +1 aligns them.
    "q249_pivot_weekday" ->
      """WITH d AS (SELECT event_type, dayofweek(ts) + 1 AS dow
        |  FROM events)
        |SELECT event_type,
        |  CAST(count(*) FILTER (WHERE dow = 1) AS BIGINT) AS d1,
        |  CAST(count(*) FILTER (WHERE dow = 2) AS BIGINT) AS d2,
        |  CAST(count(*) FILTER (WHERE dow = 3) AS BIGINT) AS d3,
        |  CAST(count(*) FILTER (WHERE dow = 4) AS BIGINT) AS d4,
        |  CAST(count(*) FILTER (WHERE dow = 5) AS BIGINT) AS d5,
        |  CAST(count(*) FILTER (WHERE dow = 6) AS BIGINT) AS d6,
        |  CAST(count(*) FILTER (WHERE dow = 7) AS BIGINT) AS d7
        |FROM d GROUP BY 1""".stripMargin,

    // Same integer bin width floor((max-min)/64)+1, dense 64-bin grid
    // per source, HUGEINT CDF cross-multiples, one division at the
    // end.
    "q250_wasserstein_drift" ->
      """WITH r AS (SELECT source AS g, n_chars AS v FROM documents),
        |ext AS (SELECT min(v) AS vmin,
        |    (max(v) - min(v)) // 64 + 1 AS w FROM r),
        |gb AS (SELECT g, (v - vmin) // w AS bin,
        |    CAST(count(*) AS BIGINT) AS n_gb
        |  FROM r CROSS JOIN ext GROUP BY 1, 2),
        |gs AS (SELECT g, CAST(sum(n_gb) AS BIGINT) AS n_g
        |  FROM gb GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_tot FROM gs),
        |grid AS (SELECT g, n_g, b AS bin FROM gs
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS b)),
        |dg AS (SELECT grid.g, grid.n_g, grid.bin,
        |    coalesce(gb.n_gb, 0) AS n_gb
        |  FROM grid LEFT JOIN gb
        |    ON gb.g = grid.g AND gb.bin = grid.bin),
        |cg AS (SELECT g, n_g, bin, CAST(sum(n_gb) OVER (PARTITION BY g
        |    ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
        |    ROW) AS BIGINT) AS cum_g FROM dg),
        |bt AS (SELECT b AS bin, CAST(coalesce(t.n_b, 0) AS BIGINT)
        |    AS n_b
        |  FROM (SELECT unnest(range(0, 64)) AS b)
        |  LEFT JOIN (SELECT bin, sum(n_gb) AS n_b FROM gb GROUP BY 1) t
        |    ON t.bin = b),
        |ct AS (SELECT bin, CAST(sum(n_b) OVER (ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_t FROM bt)
        |SELECT g AS source, n_g,
        |  CASE WHEN n_tot = n_g THEN NULL ELSE
        |    CAST(round(CAST(CAST(sum(abs(
        |        CAST(cum_g AS HUGEINT) * (n_tot - n_g)
        |        - CAST(cum_t - cum_g AS HUGEINT) * n_g)) AS DOUBLE)
        |      / CAST(CAST(n_g AS HUGEINT) * (n_tot - n_g) AS DOUBLE)
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS w1
        |FROM cg JOIN ct USING (bin) CROSS JOIN tot
        |GROUP BY g, n_g, n_tot""".stripMargin,

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

    // Same µ-snapped paired diffs, same md5-parity flips over
    // range(1, 65), identical add-one p.
    "q252_signflip_test" ->
      s"""WITH ev AS (SELECT user_id, event_type,
         |    CAST(round(CAST(value AS DOUBLE) * CAST(1e6 AS DOUBLE))
         |      AS BIGINT) AS vu
         |  FROM events WHERE event_type IN ('purchase', 'click')),
         |pu AS (SELECT user_id,
         |    CAST(sum(vu) FILTER (WHERE event_type = 'purchase')
         |      AS BIGINT) AS sp,
         |    CAST(count(*) FILTER (WHERE event_type = 'purchase')
         |      AS BIGINT) AS np,
         |    CAST(sum(vu) FILTER (WHERE event_type = 'click')
         |      AS BIGINT) AS sc,
         |    CAST(count(*) FILTER (WHERE event_type = 'click')
         |      AS BIGINT) AS nc
         |  FROM ev GROUP BY 1 HAVING np > 0 AND nc > 0),
         |d AS (SELECT CAST(user_id AS VARCHAR) AS u,
         |    CAST(round(CAST(CAST(sp AS DOUBLE) / np
         |      - CAST(sc AS DOUBLE) / nc AS DECIMAL(20,10)), 0)
         |      AS BIGINT) AS dm
         |  FROM pu),
         |obs AS (SELECT CAST(sum(dm) AS BIGINT) AS t_obs,
         |    CAST(count(*) AS BIGINT) AS n_units FROM d),
         |fl AS (SELECT r, CAST(sum(CASE WHEN
         |      ${h60("'sf' || u || ':' || CAST(r AS VARCHAR)")} % 2 = 0
         |      THEN dm ELSE -dm END) AS BIGINT) AS t_r
         |  FROM d CROSS JOIN (SELECT unnest(range(1, 65)) AS r)
         |  GROUP BY 1)
         |SELECT n_units, t_obs, CAST(count(*) AS BIGINT) AS m,
         |  CAST(count(*) FILTER (WHERE abs(t_r) >= abs(t_obs))
         |    AS BIGINT) AS n_extreme,
         |  CAST(round(CAST(
         |    CAST(1 + count(*) FILTER (WHERE abs(t_r) >= abs(t_obs))
         |      AS DOUBLE) / (count(*) + 1) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS p_value
         |FROM fl CROSS JOIN obs GROUP BY 1, 2""".stripMargin,

    // Same planted attribute noise (inner subqueries keep the CASE on
    // the ORIGINAL doc_id — DuckDB lateral aliases would otherwise
    // shadow it), same fingerprint clusters, same (n desc, value asc)
    // modal vote.
    "q253_golden_record" ->
      """WITH c1s AS (SELECT doc_id, text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'yy' ELSE lang END AS lang2,
        |    n_chars FROM documents),
        |c2s AS (SELECT doc_id, text,
        |    CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS lang2,
        |    source, n_chars FROM documents),
        |dup AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  UNION ALL SELECT doc_id + 1000000000, text, lang2, 'mirror',
        |    n_chars + 2 FROM c1s
        |  UNION ALL SELECT doc_id + 2000000000, text, lang2, source,
        |    n_chars FROM c2s),
        |cl AS (SELECT doc_id, lang, source, n_chars,
        |    min(doc_id) OVER (PARTITION BY fp) AS cluster
        |  FROM (SELECT *,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |      AS fp FROM dup)),
        |mlc AS (SELECT cluster, lang, CAST(count(*) AS BIGINT) AS n
        |  FROM cl GROUP BY 1, 2),
        |ml AS (SELECT cluster, lang FROM (SELECT cluster, lang,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY n DESC, lang) AS rn FROM mlc) WHERE rn = 1),
        |msc AS (SELECT cluster, source, CAST(count(*) AS BIGINT) AS n
        |  FROM cl GROUP BY 1, 2),
        |ms AS (SELECT cluster, source FROM (SELECT cluster, source,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY n DESC, source) AS rn FROM msc) WHERE rn = 1),
        |b AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(max(n_chars) AS BIGINT) AS n_chars_max
        |  FROM cl GROUP BY 1)
        |SELECT b.cluster, b.n_members, ml.lang, ms.source,
        |  b.n_chars_max
        |FROM b JOIN ml USING (cluster) JOIN ms USING (cluster)""".stripMargin,

    // Same ×1e6 micro snap on the 6dp cosines, same integer
    // 7·rel − 3·maxsim score, greedy rounds 2..5 unrolled (selu_r =
    // picks so far, ms_r = per-candidate max sim to them, s_r = the
    // round's (score desc, cid) argmax over the anti-joined rest).
    "q254_mmr_rerank" -> {
      def roundSql(r: Int): String = {
        val pu = if (r == 2) "SELECT qid, cid FROM s1"
        else s"SELECT * FROM selu${r - 1} UNION ALL SELECT qid, cid FROM s${r - 1}"
        s"""selu$r AS ($pu),
           |ms$r AS (SELECT sm.sqid, sm.a, CAST(max(sm.sim_m) AS BIGINT) AS m
           |  FROM sims sm JOIN selu$r su
           |    ON su.qid = sm.sqid AND su.cid = sm.b
           |  GROUP BY 1, 2),
           |s$r AS (SELECT qid, cid, rel_m, score FROM (
           |  SELECT r0.qid, r0.cid, r0.rel_m,
           |    7 * r0.rel_m - 3 * m.m AS score,
           |    row_number() OVER (PARTITION BY r0.qid
           |      ORDER BY 7 * r0.rel_m - 3 * m.m DESC, r0.cid) AS rn
           |  FROM rel r0
           |  JOIN ms$r m ON m.sqid = r0.qid AND m.a = r0.cid
           |  LEFT JOIN selu$r su ON su.qid = r0.qid AND su.cid = r0.cid
           |  WHERE su.cid IS NULL) WHERE rn = 1)""".stripMargin
      }
      s"""WITH e AS (SELECT vec_id AS id, embedding AS vec
         |  FROM embeddings),
         |rel AS (SELECT qid, cid,
         |    CAST(round(CAST(c AS DECIMAL(20,10)) * 1000000) AS BIGINT)
         |      AS rel_m
         |  FROM (SELECT q.id AS qid, c.id AS cid,
         |      round(${cosSql("q.vec", "c.vec")}, 6) AS c,
         |      row_number() OVER (PARTITION BY q.id
         |        ORDER BY round(${cosSql("q.vec", "c.vec")}, 6) DESC,
         |          c.id) AS rn
         |    FROM e q JOIN e c ON q.id != c.id WHERE q.id < 10)
         |  WHERE rn <= 20),
         |pool AS (SELECT rel.qid, rel.cid, e.vec
         |  FROM rel JOIN e ON e.id = rel.cid),
         |sims AS (SELECT a.qid AS sqid, a.cid AS a, b.cid AS b,
         |    CAST(round(CAST(round(${cosSql("a.vec", "b.vec")}, 6)
         |      AS DECIMAL(20,10)) * 1000000) AS BIGINT) AS sim_m
         |  FROM pool a JOIN pool b
         |    ON a.qid = b.qid AND a.cid != b.cid),
         |s1 AS (SELECT qid, cid, rel_m, 7 * rel_m AS score FROM (
         |  SELECT qid, cid, rel_m, row_number() OVER (PARTITION BY qid
         |    ORDER BY rel_m DESC, cid) AS rn FROM rel) WHERE rn = 1),
         |${(2 to 5).map(roundSql).mkString(",\n")}
         |SELECT qid AS query_id, CAST(pick_rank AS INT) AS pick_rank,
         |  cid AS cand_id, rel_m AS rel_micro, score AS score_micro
         |FROM (
         |  SELECT qid, cid, rel_m, score, 1 AS pick_rank FROM s1
         |  UNION ALL SELECT qid, cid, rel_m, score, 2 FROM s2
         |  UNION ALL SELECT qid, cid, rel_m, score, 3 FROM s3
         |  UNION ALL SELECT qid, cid, rel_m, score, 4 FROM s4
         |  UNION ALL SELECT qid, cid, rel_m, score, 5 FROM s5)""".stripMargin
    },

    // Same 3:1 md5 split, same add-one ×1e6 integer log-weights,
    // same seen/unseen score decomposition and (score desc, c) argmax.
    "q255_naive_bayes" ->
      s"""WITH $naiveBayesCtes
         |SELECT y AS lang, pred, CAST(count(*) AS BIGINT) AS n
         |FROM pr GROUP BY 1, 2""".stripMargin,

    // Same adjacent-bigram stream (list comprehension ≡ the engine's
    // transform), same exact integer clip.
    "q256_corpus_overlap" ->
      s"""WITH tk AS (SELECT source, $tokSql AS tk FROM documents),
         |bg AS (SELECT source,
         |    unnest([tk[i + 1] || ' ' || tk[i + 2]
         |      for i in range(0, len(tk) - 1)]) AS g
         |  FROM tk),
         |sb AS (SELECT source, g, CAST(count(*) AS BIGINT) AS own
         |  FROM bg GROUP BY 1, 2),
         |tb AS (SELECT g, CAST(sum(own) AS BIGINT) AS tot
         |  FROM sb GROUP BY 1)
         |SELECT source, CAST(sum(own) AS BIGINT) AS n_bigrams,
         |  CAST(round(CAST(
         |    CAST(sum(least(own, tot - own)) AS DOUBLE) /
         |    CAST(sum(own) AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS overlap
         |FROM sb JOIN tb USING (g) GROUP BY 1""".stripMargin,

    // Same union-support grid, same ×1e9 half-terms with 0·ln0
    // dropped by the CASE guards, every constant forced DOUBLE.
    "q257_js_divergence" ->
      s"""WITH tok AS (SELECT source, unnest($tokSql) AS tok
         |  FROM documents),
         |cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY 1, 2),
         |tt AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct
         |  FROM cnt GROUP BY 1),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_g
         |  FROM cnt GROUP BY 1),
         |na AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_tot FROM ns),
         |grid AS (SELECT ns.source, ns.n_g,
         |    coalesce(cnt.c, 0) AS cg,
         |    tt.ct - coalesce(cnt.c, 0) AS cr,
         |    na.n_tot - ns.n_g AS n_r
         |  FROM tt CROSS JOIN ns CROSS JOIN na
         |  LEFT JOIN cnt ON cnt.source = ns.source
         |    AND cnt.tok = tt.tok),
         |tf AS (SELECT source, n_g,
         |    CAST(round((
         |      CASE WHEN cg > 0 THEN
         |        (CAST(cg AS DOUBLE) / n_g) * ln((CAST(cg AS DOUBLE)
         |          / n_g) / ((CAST(cg AS DOUBLE) / n_g
         |          + CAST(cr AS DOUBLE) / n_r) / CAST(2.0 AS DOUBLE)))
         |        ELSE CAST(0.0 AS DOUBLE) END
         |      + CASE WHEN cr > 0 THEN
         |        (CAST(cr AS DOUBLE) / n_r) * ln((CAST(cr AS DOUBLE)
         |          / n_r) / ((CAST(cg AS DOUBLE) / n_g
         |          + CAST(cr AS DOUBLE) / n_r) / CAST(2.0 AS DOUBLE)))
         |        ELSE CAST(0.0 AS DOUBLE) END)
         |      * CAST(0.5 AS DOUBLE) * CAST(1e9 AS DOUBLE)) AS BIGINT)
         |      AS tf
         |  FROM grid)
         |SELECT source, n_g AS n_tokens,
         |  CAST(round(CAST(CAST(sum(tf) AS DOUBLE)
         |    / CAST(1e9 AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    AS js
         |FROM tf GROUP BY 1, 2""".stripMargin,

    // DuckDB date + integer adds days; same exact HUGEINT moment
    // algebra per lag, same degenerate-variance null guard.
    "q258_lead_lag" ->
      """WITH dd AS (SELECT CAST(ts AS DATE) AS d, event_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1, 2),
        |v AS (SELECT d, n AS x FROM dd WHERE event_type = 'view'),
        |p AS (SELECT d AS pd, n AS y FROM dd
        |  WHERE event_type = 'purchase'),
        |j AS (SELECT lag, x, y FROM v
        |  CROSS JOIN (SELECT CAST(unnest(range(-3, 4)) AS INT) AS lag)
        |  JOIN p ON pd = d + lag),
        |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM j GROUP BY 1)
        |SELECT lag, n_days,
        |  CASE WHEN n_days * sxx = sx * sx OR n_days * syy = sy * sy
        |    THEN NULL ELSE
        |    CAST(round(CAST(CAST(n_days * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
        |        * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE)))
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS r
        |FROM m""".stripMargin,

    // Same cents snap, same exact-integer slope sign (never the
    // rounded double's), pooled row via the '_all' relabel.
    "q259_simpson_audit" ->
      """WITH rows_ AS (SELECT event_type AS g,
        |    CAST(hour(ts) AS BIGINT) AS x,
        |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS y
        |  FROM events),
        |ms AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM rows_ GROUP BY 1),
        |mm AS (SELECT g, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS den FROM ms),
        |mp AS (SELECT CAST(sum(n) AS BIGINT) AS n,
        |    sum(sx) AS sx, sum(sy) AS sy, sum(sxy) AS sxy,
        |    sum(sxx) AS sxx FROM ms),
        |pp AS (SELECT n * sxy - sx * sy AS pnum FROM mp)
        |SELECT g, n,
        |  CAST(round(CAST(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
        |    * CAST(1e6 AS DOUBLE) AS DECIMAL(20,10)), 0) AS BIGINT)
        |    AS slope_micro,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0
        |    END AS INT) AS sign,
        |  CAST(CASE WHEN pnum > 0 THEN 1 WHEN pnum < 0 THEN -1 ELSE 0
        |    END AS INT) AS pooled_sign,
        |  (CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END)
        |    <> (CASE WHEN pnum > 0 THEN 1 WHEN pnum < 0 THEN -1
        |      ELSE 0 END) AS flip
        |FROM mm CROSS JOIN pp""".stripMargin,

    // Same hash split, same ×1e6 rate snap, same per-group HUGEINT
    // cross-multiples and ×1e9 term snaps before the tiny sum.
    "q260_brier_decomposition" ->
      s"""WITH ev AS (SELECT hour(ts) AS h,
         |    CAST(event_type = 'purchase' AS BIGINT) AS y,
         |    ${h60("CAST(event_id AS VARCHAR)")} % 2 AS b
         |  FROM events),
         |trn AS (SELECT h, CAST(round(CAST(CAST(sum(y) AS DOUBLE)
         |    / count(*) * CAST(1e6 AS DOUBLE) AS DECIMAL(20,10)))
         |    AS BIGINT) AS p
         |  FROM ev WHERE b = 0 GROUP BY 1),
         |ho AS (SELECT trn.p, ev.y FROM ev JOIN trn USING (h)
         |  WHERE ev.b <> 0),
         |g AS (SELECT p, CAST(count(*) AS BIGINT) AS nk,
         |    CAST(sum(y) AS BIGINT) AS sk FROM ho GROUP BY 1),
         |tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
         |    CAST(sum(sk) AS BIGINT) AS s1 FROM g),
         |p0 AS (SELECT n, s1, nk,
         |    CAST(nk AS HUGEINT) * p * p
         |      - 2 * CAST(p AS HUGEINT) * 1000000 * sk
         |      + CAST(1000000 AS HUGEINT) * 1000000 * sk AS bs,
         |    CAST(p AS HUGEINT) * nk
         |      - CAST(1000000 AS HUGEINT) * sk AS dl,
         |    CAST(sk AS HUGEINT) * n
         |      - CAST(s1 AS HUGEINT) * nk AS dr
         |  FROM g CROSS JOIN tot),
         |per AS (SELECT n, s1,
         |    CAST(round(CAST(bs AS DOUBLE) / n / 1e12 * 1e9)
         |      AS BIGINT) AS tb,
         |    CAST(round(CAST(dl * dl AS DOUBLE)
         |      / CAST(CAST(nk AS HUGEINT) * n AS DOUBLE)
         |      / 1e12 * 1e9) AS BIGINT) AS tl,
         |    CAST(round(CAST(dr * dr AS DOUBLE)
         |      / CAST(CAST(nk AS HUGEINT) * n * n * n AS DOUBLE)
         |      * 1e9) AS BIGINT) AS tr2
         |  FROM p0)
         |SELECT n,
         |  CAST(round(CAST(CAST(sum(tb) AS DOUBLE) / 1e9
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS brier,
         |  CAST(round(CAST(CAST(sum(tl) AS DOUBLE) / 1e9
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS reliability,
         |  CAST(round(CAST(CAST(sum(tr2) AS DOUBLE) / 1e9
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS resolution,
         |  CAST(round(CAST(CAST(CAST(s1 AS HUGEINT) * (n - s1)
         |      AS DOUBLE) / CAST(CAST(n AS HUGEINT) * n AS DOUBLE)
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS uncertainty
         |FROM per GROUP BY n, s1""".stripMargin,

    // Same Σc²-collapsed spectrum identity, HUGEINT moments.
    "q261_yules_k" ->
      s"""WITH cnt AS (SELECT source, tok,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT source, unnest($tokSql) AS tok FROM documents)
         |  GROUP BY 1, 2)
         |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS vocab,
         |  CAST(round(CAST(CAST(1e4 AS DOUBLE)
         |    * CAST(sum(CAST(c AS HUGEINT) * c) - sum(c) AS DOUBLE)
         |    / CAST(CAST(sum(c) AS HUGEINT) * CAST(sum(c) AS HUGEINT)
         |      AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE) AS yules_k
         |FROM cnt GROUP BY 1""".stripMargin,

    // Same exact below·5 ÷ N quintile rule (the oracle may sort the
    // distinct domains globally — the engine must not), same cents
    // snap and date-difference recency.
    "q262_rfm_segments" ->
      """WITH ev AS (SELECT user_id AS u, CAST(ts AS DATE) AS d,
        |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS vc
        |  FROM events),
        |mx AS (SELECT max(d) AS dmax FROM ev),
        |usr AS (SELECT u, CAST(min(dmax - d) AS BIGINT) AS rec,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(vc) AS BIGINT) AS mon
        |  FROM ev CROSS JOIN mx GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM usr),
        |rq AS (SELECT v, CAST(6 - (below * 5 // n + 1) AS INT)
        |    AS r_score
        |  FROM (SELECT v, CAST(coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below
        |    FROM (SELECT rec AS v, CAST(count(*) AS BIGINT) AS cnt
        |      FROM usr GROUP BY 1)) CROSS JOIN nn),
        |fq AS (SELECT v, CAST(below * 5 // n + 1 AS INT) AS f_score
        |  FROM (SELECT v, CAST(coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below
        |    FROM (SELECT freq AS v, CAST(count(*) AS BIGINT) AS cnt
        |      FROM usr GROUP BY 1)) CROSS JOIN nn),
        |mq AS (SELECT v, CAST(below * 5 // n + 1 AS INT) AS m_score
        |  FROM (SELECT v, CAST(coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below
        |    FROM (SELECT mon AS v, CAST(count(*) AS BIGINT) AS cnt
        |      FROM usr GROUP BY 1)) CROSS JOIN nn)
        |SELECT rq.r_score, fq.f_score, mq.m_score,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(round(CAST(CAST(sum(usr.mon) AS DOUBLE) / count(*)
        |    / CAST(100.0 AS DOUBLE) AS DECIMAL(20,10)), 2) AS DOUBLE)
        |    AS avg_monetary
        |FROM usr JOIN rq ON rq.v = usr.rec JOIN fq ON fq.v = usr.freq
        |JOIN mq ON mq.v = usr.mon
        |GROUP BY 1, 2, 3""".stripMargin,

    // Same distinct-basket pair join and exact HUGEINT lift ratio.
    "q263_association_rules" ->
      """WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS it
        |  FROM events),
        |pr AS (SELECT x.it AS a, y.it AS b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM ut x JOIN ut y ON x.u = y.u AND x.it <> y.it
        |  GROUP BY 1, 2),
        |im AS (SELECT it, CAST(count(*) AS BIGINT) AS n_i
        |  FROM ut GROUP BY 1),
        |nn AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n FROM ut)
        |SELECT a, b, ia.n_i AS n_a, ib.n_i AS n_b, n_ab,
        |  CAST(round(CAST(CAST(n_ab AS DOUBLE) / n AS DECIMAL(20,10)),
        |    4) AS DOUBLE) AS support,
        |  CAST(round(CAST(CAST(n_ab AS DOUBLE) / ia.n_i
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS confidence,
        |  CAST(round(CAST(CAST(CAST(n AS HUGEINT) * n_ab AS DOUBLE)
        |    / CAST(CAST(ia.n_i AS HUGEINT) * ib.n_i AS DOUBLE)
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS lift
        |FROM pr JOIN im ia ON ia.it = pr.a JOIN im ib ON ib.it = pr.b
        |CROSS JOIN nn""".stripMargin,

    // Same split/models/alpha grid, identical double shape per term.
    "q264_mixture_grid" ->
      s"""WITH d AS (SELECT source, $tokSql AS tk,
         |    ${h60("CAST(doc_id AS VARCHAR)")} % 2 = 0 AS tr
         |  FROM documents),
         |occ AS (SELECT source, tr, unnest(tk) AS tok FROM d),
         |cnt AS (SELECT tok,
         |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c0,
         |    CAST(sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cr
         |  FROM occ WHERE tr GROUP BY 1),
         |tots AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
         |    CAST(sum(cr) AS BIGINT) AS nr,
         |    CAST(count(*) AS BIGINT) AS v FROM cnt),
         |ho AS (SELECT tok FROM occ
         |  WHERE NOT tr AND source = 'src0'),
         |tf AS (SELECT alpha_pct, CAST(round(-ln(
         |      CAST(alpha_pct AS DOUBLE) / CAST(100.0 AS DOUBLE)
         |        * (CAST(coalesce(c0, 0) + 1 AS DOUBLE) / (n0 + v))
         |      + (CAST(1.0 AS DOUBLE) - CAST(alpha_pct AS DOUBLE)
         |          / CAST(100.0 AS DOUBLE))
         |        * (CAST(coalesce(cr, 0) + 1 AS DOUBLE) / (nr + v)))
         |    * CAST(1e6 AS DOUBLE)) AS BIGINT) AS tf
         |  FROM ho LEFT JOIN cnt USING (tok)
         |  CROSS JOIN tots
         |  CROSS JOIN (SELECT CAST(unnest(range(0, 11)) * 10 AS INT)
         |    AS alpha_pct))
         |SELECT alpha_pct, CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(round(CAST(CAST(sum(tf) AS DOUBLE)
         |    / (count(*) * CAST(1e6 AS DOUBLE)) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS avg_nll
         |FROM tf GROUP BY 1""".stripMargin,

    // Same keep-latest dedup (q53's rn rule), same 20-unit band, same
    // lag-compare runs and lead(valid_from) − 1 day interval close.
    "q265_scd2_history" ->
      s"""WITH b AS (SELECT symbol, d,
         |    CAST(round(CAST(px AS DOUBLE) * 100) AS BIGINT) // 2000
         |      AS band
         |  FROM (SELECT *, row_number() OVER (
         |    PARTITION BY symbol, d ORDER BY ord DESC, px DESC, vol
         |    DESC) AS rn FROM ($barsSql) WHERE symbol <= 500)
         |    WHERE rn = 1),
         |r AS (SELECT symbol, d, band,
         |    CASE WHEN lag(band) OVER w IS NULL
         |      OR lag(band) OVER w <> band THEN 1 ELSE 0 END AS chg
         |  FROM b WINDOW w AS (PARTITION BY symbol ORDER BY d)),
         |ri AS (SELECT symbol, d, band,
         |    CAST(sum(chg) OVER (PARTITION BY symbol ORDER BY d
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS run_id FROM r),
         |iv AS (SELECT symbol, run_id, band, min(d) AS valid_from,
         |    CAST(count(*) AS BIGINT) AS n_days
         |  FROM ri GROUP BY 1, 2, 3),
         |nx AS (SELECT *, lead(valid_from) OVER (PARTITION BY symbol
         |    ORDER BY run_id) AS nxt FROM iv)
         |SELECT symbol, CAST(band AS BIGINT) AS band, valid_from,
         |  coalesce(nxt - 1, DATE '9999-12-31') AS valid_to, n_days,
         |  nxt IS NULL AS is_current
         |FROM nx""".stripMargin,

    // Same 2×2 cells, identical double shape for means and the
    // estimate.
    "q272_diff_in_diff" ->
      """WITH ev AS (SELECT user_id % 2 = 0 AS tr,
        |    day(ts) >= 16 AS po,
        |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS vc
        |  FROM events),
        |c AS (SELECT
        |    CAST(count(*) FILTER (WHERE tr AND po) AS BIGINT) AS n11,
        |    CAST(sum(vc) FILTER (WHERE tr AND po) AS BIGINT) AS s11,
        |    CAST(count(*) FILTER (WHERE tr AND NOT po) AS BIGINT)
        |      AS n10,
        |    CAST(sum(vc) FILTER (WHERE tr AND NOT po) AS BIGINT)
        |      AS s10,
        |    CAST(count(*) FILTER (WHERE NOT tr AND po) AS BIGINT)
        |      AS n01,
        |    CAST(sum(vc) FILTER (WHERE NOT tr AND po) AS BIGINT)
        |      AS s01,
        |    CAST(count(*) FILTER (WHERE NOT tr AND NOT po) AS BIGINT)
        |      AS n00,
        |    CAST(sum(vc) FILTER (WHERE NOT tr AND NOT po) AS BIGINT)
        |      AS s00
        |  FROM ev)
        |SELECT n11, n10, n01, n00,
        |  CAST(round(CAST(CAST(s11 AS DOUBLE) / n11 / 100.0
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS mean_tp,
        |  CAST(round(CAST(CAST(s10 AS DOUBLE) / n10 / 100.0
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS mean_tb,
        |  CAST(round(CAST(CAST(s01 AS DOUBLE) / n01 / 100.0
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS mean_cp,
        |  CAST(round(CAST(CAST(s00 AS DOUBLE) / n00 / 100.0
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS mean_cb,
        |  CAST(round(CAST((CAST(s11 AS DOUBLE) / n11
        |    - CAST(s10 AS DOUBLE) / n10
        |    - (CAST(s01 AS DOUBLE) / n01 - CAST(s00 AS DOUBLE) / n00))
        |    / 100.0 AS DECIMAL(20,10)), 4) AS DOUBLE) AS did
        |FROM c""".stripMargin,

    // Same complement-trick training stats, same ×1e6 rate snap and
    // ×1e9 Brier term snaps.
    "q271_kfold_cv" ->
      s"""WITH fh AS (SELECT hour(ts) AS h,
         |    ${h60("CAST(event_id AS VARCHAR)")} % 4 AS f,
         |    CAST(count(*) AS BIGINT) AS n_fh,
         |    CAST(sum(CAST(event_type = 'purchase' AS BIGINT))
         |      AS BIGINT) AS pos_fh
         |  FROM events GROUP BY 1, 2),
         |hh AS (SELECT h, CAST(sum(n_fh) AS BIGINT) AS n_h,
         |    CAST(sum(pos_fh) AS BIGINT) AS pos_h FROM fh GROUP BY 1),
         |j AS (SELECT f, n_fh, pos_fh,
         |    CAST(round(CAST(CAST(pos_h - pos_fh AS DOUBLE)
         |      / (n_h - n_fh) * CAST(1e6 AS DOUBLE)
         |      AS DECIMAL(20,10))) AS BIGINT) AS p
         |  FROM fh JOIN hh USING (h) WHERE n_h > n_fh),
         |jb AS (SELECT f, n_fh,
         |    CAST(n_fh AS HUGEINT) * p * p
         |      - 2 * CAST(p AS HUGEINT) * 1000000 * pos_fh
         |      + CAST(1000000 AS HUGEINT) * 1000000 * pos_fh AS bs
         |  FROM j),
         |nf AS (SELECT f, CAST(sum(n_fh) AS BIGINT) AS n_f
         |  FROM jb GROUP BY 1)
         |SELECT f AS fold, n_f AS n_scored,
         |  CAST(round(CAST(CAST(sum(CAST(round(CAST(bs AS DOUBLE)
         |    / n_f / 1e12 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS brier
         |FROM jb JOIN nf USING (f) GROUP BY 1, 2""".stripMargin,

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

    // The snapshot table's committed state replayed as SQL: the same
    // per-key collapse, then version-1 rows overwrite version-0 rows.
    "q308_snapshot_upsert" ->
      s"""WITH uniq AS (SELECT symbol, d, px, vol FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY ord DESC, px DESC, vol DESC) AS rn
         |    FROM ($barsSql) WHERE symbol % 16 = 0) WHERE rn = 1),
         |u AS (
         |  SELECT symbol, d, px, 0 AS version FROM uniq
         |  UNION ALL
         |  SELECT symbol, d, px * 2 AS px, 1 AS version FROM uniq
         |  WHERE symbol % 3 = 0),
         |f AS (SELECT * FROM (SELECT *, row_number() OVER (
         |    PARTITION BY symbol, d ORDER BY version DESC) AS rn
         |  FROM u) WHERE rn = 1)
         |SELECT symbol, CAST(count(*) AS BIGINT) AS n_rows,
         |  round(sum(px), 2) AS px_sum
         |FROM f GROUP BY symbol""".stripMargin,

    // The streamed thinning's survivors per cell = q251's kp algebra
    // (same integer cross-multiply draw, same md5 row key).
    "q309_stream_profile_thin" ->
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
         |st AS (SELECT g, bin,
         |    CAST(1000000 AS HUGEINT) * n_b * n_g AS num,
         |    CAST(n_tot AS HUGEINT) * n_gb AS den
         |  FROM gb JOIN bt USING (bin) JOIN gs USING (g)
         |  CROSS JOIN tot)
         |SELECT b.g AS source, CAST(b.bin AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_kept
         |FROM b JOIN st ON st.g = b.g AND st.bin = b.bin
         |WHERE CAST(${h60("'dm' || k")} % 1000000 AS HUGEINT) * den
         |  < num
         |GROUP BY 1, 2""".stripMargin,

    // Same midpoint split, exact centered HUGEINT moments, identical
    // double chains for theta/means.
    "q313_cuped" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS vc FROM events),
        |ext AS (SELECT CAST(floor((min(us) + max(us)) / 2) AS BIGINT)
        |    AS mid FROM ev),
        |pu AS (SELECT user_id % 2 AS arm,
        |    CAST(sum(CASE WHEN us <= mid THEN vc ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN us > mid THEN vc ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM ev CROSS JOIN ext GROUP BY user_id, user_id % 2),
        |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT))
        |      AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM pu),
        |c AS (SELECT n, sx, n * sxx - sx * sx AS cxx,
        |    n * sxy - sx * sy AS cxy, n * syy - sy * sy AS cyy
        |  FROM g),
        |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS ng,
        |    sum(CAST(x AS HUGEINT)) AS sxg,
        |    sum(CAST(y AS HUGEINT)) AS syg
        |  FROM pu GROUP BY 1)
        |SELECT arm, ng AS n_users,
        |  CAST(round(CAST(CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE)
        |    / 100.0 AS DECIMAL(20,10)), 4) AS DOUBLE) AS mean_y,
        |  CASE WHEN cxx = 0 THEN NULL ELSE
        |    CAST(round(CAST((CAST(syg AS DOUBLE)
        |      - (CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE))
        |        * (CAST(sxg AS DOUBLE) - CAST(ng AS DOUBLE)
        |          * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))
        |      / CAST(ng AS DOUBLE) / 100.0 AS DECIMAL(20,10)), 4)
        |      AS DOUBLE) END AS mean_y_cuped,
        |  CASE WHEN cxx = 0 OR cyy = 0 THEN NULL ELSE
        |    CAST(round(CAST(CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE)
        |      * CAST(cxy AS DOUBLE) / CAST(cyy AS DOUBLE)
        |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS var_reduction
        |FROM a CROSS JOIN c""".stripMargin,

    // Same plants, same digit-run extraction, same fold.
    "q314_luhn_gate" ->
      """WITH pl AS (SELECT source, text ||
        |    CASE WHEN doc_id % 37 = 0 THEN ' pay 4532015112830366'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 41 = 0 THEN ' ref 4532015112830367'
        |      ELSE '' END AS text
        |  FROM documents),
        |cd AS (SELECT source,
        |    unnest(regexp_extract_all(text, '[0-9]+')) AS c FROM pl),
        |ok AS (SELECT source, c FROM cd
        |  WHERE length(c) BETWEEN 13 AND 16),
        |sc AS (SELECT source, CAST(list_sum([
        |    CASE WHEN (length(c) - j) % 2 = 1 THEN
        |      CASE WHEN CAST(c[j] AS INT) > 4
        |        THEN CAST(c[j] AS INT) * 2 - 9
        |        ELSE CAST(c[j] AS INT) * 2 END
        |    ELSE CAST(c[j] AS INT) END
        |    FOR j IN range(1, length(c) + 1)]) AS BIGINT) AS s
        |  FROM ok)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_luhn_valid,
        |  CAST(round(CAST(CAST(sum(CASE WHEN s % 10 = 0 THEN 1
        |    ELSE 0 END) AS DOUBLE) / count(*) AS DECIMAL(20,10)), 4)
        |    AS DOUBLE) AS valid_share
        |FROM sc GROUP BY 1""".stripMargin,

    // Same exact rank deciles (running-below prefix), same single-ln
    // WoE and iv-term double chain.
    "q315_woe_iv" ->
      """WITH r AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
        |      AS v,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS pos
        |  FROM orders),
        |bv AS (SELECT v, CAST(count(*) AS BIGINT) AS tot,
        |    CAST(sum(pos) AS BIGINT) AS p FROM r GROUP BY 1),
        |rk AS (SELECT v, tot, p,
        |    CAST(coalesce(sum(tot) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tot_below FROM bv),
        |nn AS (SELECT CAST(sum(tot) AS BIGINT) AS n,
        |    CAST(sum(p) AS BIGINT) AS npos FROM bv),
        |bn AS (SELECT (tot_below * 10) // n AS decile, tot, p, n,
        |    npos
        |  FROM rk CROSS JOIN nn),
        |ag AS (SELECT decile, CAST(sum(tot) AS BIGINT) AS n_d,
        |    CAST(sum(p) AS BIGINT) AS pos_d,
        |    CAST(max(n) AS BIGINT) AS n,
        |    CAST(max(npos) AS BIGINT) AS npos
        |  FROM bn GROUP BY 1),
        |fn AS (SELECT decile, n_d, pos_d, n_d - pos_d AS neg_d,
        |    npos, n - npos AS nneg FROM ag)
        |SELECT CAST(decile AS BIGINT) AS decile, n_d AS n,
        |  pos_d AS n_pos,
        |  CASE WHEN pos_d = 0 OR neg_d = 0 OR npos = 0 OR nneg = 0
        |    THEN NULL ELSE
        |    CAST(round(CAST(ln(CAST(pos_d * nneg AS DOUBLE)
        |      / CAST(neg_d * npos AS DOUBLE)) AS DECIMAL(20,10)), 4)
        |      AS DOUBLE) END AS woe,
        |  CASE WHEN pos_d = 0 OR neg_d = 0 OR npos = 0 OR nneg = 0
        |    THEN NULL ELSE
        |    CAST(round(CAST((CAST(pos_d AS DOUBLE)
        |        / CAST(npos AS DOUBLE)
        |      - CAST(neg_d AS DOUBLE) / CAST(nneg AS DOUBLE))
        |      * ln(CAST(pos_d * nneg AS DOUBLE)
        |        / CAST(neg_d * npos AS DOUBLE))
        |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS iv_term
        |FROM fn""".stripMargin,

    // Same distinct basket matrix, per-order pair join, support
    // gate, one sqrt per surviving pair.
    "q319_item_cf" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
        |  FROM lineitem),
        |ni AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM bi
        |  GROUP BY 1),
        |co AS (SELECT a.i AS part_a, b.i AS part_b,
        |    CAST(count(*) AS BIGINT) AS co
        |  FROM bi a JOIN bi b ON a.o = b.o AND a.i < b.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT part_a, part_b, co,
        |  CAST(round(CAST(CAST(co AS DOUBLE)
        |    / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS DECIMAL(20,10)),
        |    4) AS DOUBLE) AS cosine
        |FROM co JOIN ni na ON na.i = part_a
        |JOIN ni nb ON nb.i = part_b
        |ORDER BY 4 DESC, 1, 2 LIMIT 20""".stripMargin,

    // Same cent·unit integer numerators and per-group divisions.
    "q320_vwap" -> {
      s"""WITH b AS (SELECT symbol, strftime(d, '%Y-%m') AS m,
         |    CAST(round(px * 100) AS BIGINT) AS pxc,
         |    CAST(round(vol) AS BIGINT) AS q
         |  FROM ($barsSql))
         |SELECT symbol, m, CAST(count(*) AS BIGINT) AS n_fills,
         |  CAST(sum(q) AS BIGINT) AS qty,
         |  CASE WHEN sum(q) = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(sum(CAST(pxc AS HUGEINT) * q)
         |      AS DOUBLE) / CAST(sum(q) AS DOUBLE) / 100.0
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS vwap,
         |  CAST(round(CAST(CAST(sum(CAST(pxc AS HUGEINT)) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) / 100.0
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS twap
         |FROM b GROUP BY 1, 2""".stripMargin
    },

    // Same ×1e4 weekly snap, cross-multiplied z breakpoints, 3-week
    // lead words.
    "q321_sax_motifs" -> {
      s"""WITH wk AS (SELECT symbol, date_trunc('week', d) AS w,
         |    CAST(round(CAST(sum(CAST(round(px * 100) AS BIGINT))
         |      AS DOUBLE) / count(*) * 1e4) AS BIGINT) AS v9
         |  FROM ($barsSql) GROUP BY 1, 2),
         |mom AS (SELECT symbol, mw, sv,
         |    CAST(mw AS HUGEINT) * svv - sv * sv AS vm
         |  FROM (SELECT symbol, CAST(count(*) AS BIGINT) AS mw,
         |      sum(CAST(v9 AS HUGEINT)) AS sv,
         |      sum(CAST(v9 AS HUGEINT) * v9) AS svv
         |    FROM wk GROUP BY 1)
         |  WHERE mw >= 8),
         |lt AS (SELECT wk.symbol, wk.w,
         |    CASE
         |      WHEN CAST(mw * wk.v9 - sv AS DOUBLE)
         |        < -(0.6745 * sqrt(CAST(vm AS DOUBLE))) THEN 'a'
         |      WHEN CAST(mw * wk.v9 - sv AS DOUBLE) < 0 THEN 'b'
         |      WHEN CAST(mw * wk.v9 - sv AS DOUBLE)
         |        < 0.6745 * sqrt(CAST(vm AS DOUBLE)) THEN 'c'
         |      ELSE 'd' END AS cls
         |  FROM wk JOIN mom USING (symbol) WHERE vm > 0),
         |wd AS (SELECT cls || lead(cls, 1) OVER ws
         |      || lead(cls, 2) OVER ws AS word
         |  FROM lt WINDOW ws AS (PARTITION BY symbol ORDER BY w))
         |SELECT word, CAST(count(*) AS BIGINT) AS n FROM wd
         |WHERE word IS NOT NULL
         |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin
    },

    // The streaming LSH-index dedup replayed batch-by-batch in SQL:
    // batch 0 (evens) drops vs earlier-id own-batch band collisions,
    // batch 1 (odds) drops vs batch-0 SURVIVORS (any id order — the
    // stored-index postings) ∪ earlier-id own-batch, both verified by
    // the q27 exact-Jaccard round ≥ 0.5 rule on the same 4×4 banding.
    "q322_lsh_dedup_stream" -> {
      val bandEq =
        """(a.sig[1:4] = b.sig[1:4] OR a.sig[5:8] = b.sig[5:8]
          |    OR a.sig[9:12] = b.sig[9:12]
          |    OR a.sig[13:16] = b.sig[13:16])""".stripMargin
      val jacGe =
        """round(len(list_intersect(a.sh, b.sh)) * 1.0 /
          |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
          |    4) >= 0.5""".stripMargin
      s"""WITH u AS ($docsDupSql),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM u),
         |sh AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh
         |  FROM tk),
         |sig AS (SELECT doc_id, doc_id % 2 AS bt, sh,
         |    ${minhashSql(16)} AS sig FROM sh),
         |p0 AS (SELECT DISTINCT a.doc_id FROM sig a JOIN sig b
         |  ON a.bt = 0 AND b.bt = 0 AND a.doc_id > b.doc_id
         |  AND $bandEq
         |  WHERE $jacGe),
         |s0 AS (SELECT * FROM sig WHERE bt = 0
         |  AND doc_id NOT IN (SELECT doc_id FROM p0)),
         |cand1 AS (SELECT doc_id, sh, sig, FALSE AS isnew FROM s0
         |  UNION ALL SELECT doc_id, sh, sig, TRUE FROM sig
         |  WHERE bt = 1),
         |p1 AS (SELECT DISTINCT a.doc_id FROM sig a JOIN cand1 b
         |  ON a.bt = 1 AND a.doc_id <> b.doc_id
         |  AND (NOT b.isnew OR a.doc_id > b.doc_id)
         |  AND $bandEq
         |  WHERE $jacGe),
         |s1 AS (SELECT * FROM sig WHERE bt = 1
         |  AND doc_id NOT IN (SELECT doc_id FROM p1))
         |SELECT CAST(0 AS BIGINT) AS ingest_batch,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum FROM s0
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
         |  CAST(sum(doc_id) AS BIGINT) FROM s1""".stripMargin
    },

    // Same keep-latest-by-version algebra as q308's oracle plus the
    // insert/delete facets; the diff replays as a FULL OUTER join of
    // the v1 set against the post-delete keep-latest set.
    "q323_snapshot_timetravel" ->
      s"""WITH uniq AS (SELECT symbol, d, px, vol FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY ord DESC, px DESC, vol DESC) AS rn
         |    FROM ($barsSql) WHERE symbol % 64 = 1) WHERE rn = 1),
         |v1 AS (SELECT symbol, d, px, vol, 0 AS version FROM uniq),
         |u AS (SELECT * FROM v1
         |  UNION ALL SELECT symbol, d, px * 2, vol, 1 FROM uniq
         |    WHERE symbol % 3 = 0
         |  UNION ALL SELECT -symbol, d, px, vol, 1 FROM uniq
         |    WHERE symbol % 7 = 0),
         |v2 AS (SELECT symbol, d, px, vol, version FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY version DESC) AS rn FROM u) WHERE rn = 1),
         |v3 AS (SELECT * FROM v2 WHERE symbol % 5 <> 0),
         |dd AS (SELECT CASE WHEN a.symbol IS NULL THEN 'added'
         |      WHEN b.symbol IS NULL THEN 'removed'
         |      WHEN a.px <> b.px OR a.vol <> b.vol
         |        OR a.version <> b.version THEN 'changed' END AS ct
         |  FROM v1 a FULL JOIN v3 b
         |    ON a.symbol = b.symbol AND a.d = b.d)
         |SELECT 'diff:' || ct AS facet, CAST(count(*) AS BIGINT) AS n,
         |  CAST(NULL AS DOUBLE) AS px_sum
         |FROM dd WHERE ct IS NOT NULL GROUP BY 1
         |UNION ALL SELECT 'v1', CAST(count(*) AS BIGINT),
         |  round(sum(px), 2) FROM v1
         |UNION ALL SELECT 'v3', CAST(count(*) AS BIGINT),
         |  round(sum(px), 2) FROM v3""".stripMargin,

    // The ER stream replayed batch-by-batch: batch 0 keeps the
    // smallest-id representative of every ≤1-edit family, batch 1
    // records match batch-0 SURVIVORS or earlier-id own-batch records
    // (q102's variant construction, q324's incremental rule).
    "q324_er_stream" ->
      """WITH b0 AS (SELECT p_partkey AS rec_id, p_name AS name
        |  FROM part WHERE p_partkey % 4 = 0),
        |b1 AS (SELECT rec_id + 2000000000 AS rec_id,
        |    substr(name, 1, CAST(rec_id % length(name) AS INT))
        |      || substr(name, CAST(rec_id % length(name) AS INT) + 2)
        |      AS name
        |  FROM b0),
        |m0 AS (SELECT DISTINCT a.rec_id FROM b0 a JOIN b0 s
        |  ON s.rec_id < a.rec_id
        |  AND levenshtein(a.name, s.name) <= 1),
        |n0 AS (SELECT * FROM b0
        |  WHERE rec_id NOT IN (SELECT rec_id FROM m0)),
        |m1 AS (SELECT DISTINCT a.rec_id FROM b1 a
        |  WHERE EXISTS (SELECT 1 FROM n0 e
        |      WHERE levenshtein(a.name, e.name) <= 1)
        |    OR EXISTS (SELECT 1 FROM b1 s
        |      WHERE s.rec_id < a.rec_id
        |        AND levenshtein(a.name, s.name) <= 1)),
        |n1 AS (SELECT * FROM b1
        |  WHERE rec_id NOT IN (SELECT rec_id FROM m1))
        |SELECT CAST(0 AS BIGINT) AS ingest_batch,
        |  CAST(count(*) AS BIGINT) AS n_entities,
        |  CAST(sum(rec_id) AS BIGINT) AS id_sum FROM n0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(rec_id) AS BIGINT) FROM n1""".stripMargin,

    // Same q135 link graph; seed-keyed BFS unrolled 4 hops with the
    // same union+min-group step; reciprocal sum ×12 exact.
    "q325_harmonic_centrality" -> {
      def bfs(prev: String, tag: String, h: Int): String =
        s"""$tag AS (SELECT seed, id, min(hops) AS hops FROM (
           |  SELECT seed, id, hops FROM $prev
           |  UNION ALL SELECT d.seed, e.dst AS id, d.hops + 1 AS hops
           |  FROM $prev d JOIN e ON d.id = e.src
           |  WHERE d.hops = ${h - 1}) GROUP BY 1, 2)""".stripMargin
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |d0 AS (SELECT doc_id AS seed, doc_id AS id, 0 AS hops
         |  FROM documents WHERE doc_id % 100 = 0),
         |${bfs("d0", "d1", 1)},
         |${bfs("d1", "d2", 2)},
         |${bfs("d2", "d3", 3)},
         |${bfs("d3", "d4", 4)}
         |SELECT CAST(seed AS BIGINT) AS seed,
         |  CAST(count(*) AS BIGINT) AS n_reached,
         |  CAST(round(CAST(CAST(CAST(sum(12 / hops) AS BIGINT)
         |    AS DOUBLE) / 12.0 AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    AS harmonic
         |FROM d4 WHERE hops >= 1 GROUP BY 1""".stripMargin
    },

    // Spark's watermark algebra µs-exact: batch-2 rows drop iff their
    // hour-window end ≤ the watermark that was CURRENT during batch 1
    // = (ms-truncated max batch-0 event time − 72h)·1000 (late filter
    // lags eviction by one batch, SPARK-40925); windows emit iff end
    // ≤ the final watermark.
    "q326_stream_watermark" ->
      """WITH ev AS (SELECT ts, event_type, value, event_id,
        |    epoch_us(ts) AS us FROM events),
        |ext AS (SELECT
        |    min(us) + CAST(floor((max(us) - min(us)) / 3) AS BIGINT)
        |      AS t1,
        |    min(us) + CAST(floor((max(us) - min(us)) * 2 / 3)
        |      AS BIGINT) AS t2,
        |    max(us) AS gmax FROM ev),
        |b0 AS (SELECT ts, event_type, value, us FROM ev
        |  CROSS JOIN ext WHERE us <= t1),
        |w1 AS (SELECT (max(us) // 1000 - 259200000) * 1000 AS wm1
        |  FROM b0),
        |wf AS (SELECT (gmax // 1000 - 259200000) * 1000 AS wmf
        |  FROM ext),
        |b1 AS (SELECT ts, event_type, value FROM ev CROSS JOIN ext
        |  WHERE us > t1 AND us <= t2),
        |b2 AS (SELECT ts, event_type, value FROM ev CROSS JOIN ext
        |    WHERE us > t2
        |  UNION ALL SELECT ts, event_type, value FROM ev CROSS JOIN ext
        |    WHERE us <= t1 AND event_id % 13 = 0),
        |acc AS (SELECT ts, event_type, value FROM b0
        |  UNION ALL SELECT ts, event_type, value FROM b1
        |  UNION ALL SELECT b2.ts, b2.event_type, b2.value
        |  FROM b2 CROSS JOIN w1
        |  WHERE epoch_us(date_trunc('hour', b2.ts) + INTERVAL 1 HOUR)
        |    > wm1),
        |agg AS (SELECT date_trunc('hour', ts) AS hour_start,
        |    event_type, CAST(count(*) AS BIGINT) AS n,
        |    round(sum(value), 2) AS value_sum
        |  FROM acc GROUP BY 1, 2)
        |SELECT hour_start, event_type, n, value_sum
        |FROM agg CROSS JOIN wf
        |WHERE epoch_us(hour_start + INTERVAL 1 HOUR) <= wmf"""
        .stripMargin,

    // The frontier replay: smallest doc_id per canonical key within a
    // batch, batch-1 keys already in batch 0's committed frontier are
    // absorbed.
    "q328_url_dedup_stream" -> {
      s"""WITH ${urlChainSql("a",
              s"""SELECT doc_id, text,
                 |    ${urlSql("doc_id", "source")} AS url
                 |  FROM documents""".stripMargin)},
         |b0 AS (SELECT canonical_url, CAST(min(doc_id) AS BIGINT)
         |    AS doc_id
         |  FROM acu WHERE doc_id % 2 = 0 GROUP BY 1),
         |b1 AS (SELECT canonical_url, CAST(min(doc_id) AS BIGINT)
         |    AS doc_id
         |  FROM acu WHERE doc_id % 2 = 1 GROUP BY 1),
         |n1 AS (SELECT * FROM b1 WHERE canonical_url NOT IN
         |  (SELECT canonical_url FROM b0))
         |SELECT CAST(0 AS BIGINT) AS ingest_batch,
         |  CAST(count(*) AS BIGINT) AS n_urls,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum FROM b0
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
         |  CAST(sum(doc_id) AS BIGINT) FROM n1""".stripMargin
    },

    // Max is associative+commutative, so the streamed per-batch
    // register folds equal the single-pass batch sketch — q56's exact
    // SQL register machinery over (event_type, user_id).
    "q329_sketch_stream" ->
      s"""WITH h AS (SELECT event_type,
         |    md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
         |parts AS (SELECT event_type, hx, substr(hx, 4, 29) AS rest,
         |    ltrim(substr(hx, 4, 29), '0') AS st FROM h),
         |reg AS (SELECT event_type,
         |    CAST('0x' || substr(hx, 1, 3) AS BIGINT) AS bucket,
         |    max(CASE WHEN length(st) = 0 THEN 117
         |        ELSE (length(rest) - length(st)) * 4 +
         |          (CASE WHEN substr(st, 1, 1) = '1' THEN 3
         |                WHEN substr(st, 1, 1) IN ('2','3') THEN 2
         |                WHEN substr(st, 1, 1) IN ('4','5','6','7')
         |                  THEN 1
         |                ELSE 0 END) + 1 END) AS rho
         |  FROM parts GROUP BY 1, 2),
         |${hllEstSql("reg", "event_type", "est")}
         |SELECT event_type, est AS n_approx FROM est""".stripMargin,

    // Recall-complete prefix kernel ⇒ the oracle is the bare Jaccard
    // predicate: batch-0 drops vs earlier-id own-batch, batch-1 drops
    // vs batch-0 survivors (any id order) ∪ earlier-id own-batch.
    "q330_dedup_stream" -> {
      val jacGe =
        """round(len(list_intersect(a.sh, b.sh)) * 1.0 /
          |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
          |    4) >= 0.5""".stripMargin
      s"""WITH u AS (SELECT * FROM ($docsDupSql)
         |  WHERE (doc_id % 1000000000) % 3 = 0),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM u),
         |shl AS (SELECT doc_id, doc_id % 2 AS bt,
         |    CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
         |      ELSE $shingleSql END AS sh FROM tk),
         |p0 AS (SELECT DISTINCT a.doc_id FROM shl a JOIN shl b
         |  ON a.bt = 0 AND b.bt = 0 AND a.doc_id > b.doc_id
         |  WHERE $jacGe),
         |s0 AS (SELECT * FROM shl WHERE bt = 0
         |  AND doc_id NOT IN (SELECT doc_id FROM p0)),
         |cand1 AS (SELECT doc_id, sh, FALSE AS isnew FROM s0
         |  UNION ALL SELECT doc_id, sh, TRUE FROM shl WHERE bt = 1),
         |p1 AS (SELECT DISTINCT a.doc_id FROM shl a JOIN cand1 b
         |  ON a.bt = 1 AND a.doc_id <> b.doc_id
         |  AND (NOT b.isnew OR a.doc_id > b.doc_id)
         |  WHERE $jacGe),
         |s1 AS (SELECT * FROM shl WHERE bt = 1
         |  AND doc_id NOT IN (SELECT doc_id FROM p1))
         |SELECT CAST(0 AS BIGINT) AS ingest_batch,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum FROM s0
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
         |  CAST(sum(doc_id) AS BIGINT) FROM s1""".stripMargin
    },

    // Frozen-seed IVF assignment (16 lowest EVEN ids — batch 0 seeds
    // the model), same-cell candidates with the incremental id-order
    // rule, exact double cosine ≥ 0.9 round 6.
    "q331_ann_dedup_stream" -> {
      val cell =
        s"""SELECT v.id, v.vec, ct.cid AS cell,
           |    row_number() OVER (PARTITION BY v.id
           |      ORDER BY round(${sqdSql("v.vec", "ct.cvec")}, 6),
           |        ct.cid) AS pr
           |  FROM e v CROSS JOIN ct""".stripMargin
      s"""WITH e AS (SELECT * FROM (
         |  SELECT vec_id AS id, embedding AS vec FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000 AS id,
         |    [CASE WHEN i = 1
         |       THEN CAST(CAST(embedding[i] AS DOUBLE) + 0.5 AS FLOAT)
         |       ELSE embedding[i] END
         |     for i in range(1, len(embedding) + 1)] AS vec
         |  FROM embeddings) WHERE (id % 1000000000) % 3 = 0),
         |ct AS (SELECT id AS cid, vec AS cvec FROM e
         |  WHERE id % 2 = 0 ORDER BY id LIMIT 16),
         |asg AS (SELECT id, vec, cell FROM ($cell) WHERE pr = 1),
         |p0 AS (SELECT DISTINCT a.id FROM asg a JOIN asg b
         |  ON a.id % 2 = 0 AND b.id % 2 = 0 AND a.cell = b.cell
         |  AND a.id > b.id
         |  WHERE round(${cosSql("a.vec", "b.vec")}, 6) >= 0.9),
         |s0 AS (SELECT * FROM asg WHERE id % 2 = 0
         |  AND id NOT IN (SELECT id FROM p0)),
         |cand1 AS (SELECT id, vec, cell, FALSE AS isnew FROM s0
         |  UNION ALL SELECT id, vec, cell, TRUE FROM asg
         |  WHERE id % 2 = 1),
         |p1 AS (SELECT DISTINCT a.id FROM asg a JOIN cand1 b
         |  ON a.id % 2 = 1 AND a.cell = b.cell AND a.id <> b.id
         |  AND (NOT b.isnew OR a.id > b.id)
         |  WHERE round(${cosSql("a.vec", "b.vec")}, 6) >= 0.9),
         |s1 AS (SELECT * FROM asg WHERE id % 2 = 1
         |  AND id NOT IN (SELECT id FROM p1))
         |SELECT CAST(0 AS BIGINT) AS ingest_batch,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(id) AS BIGINT) AS id_sum FROM s0
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
         |  CAST(sum(id) AS BIGINT) FROM s1""".stripMargin
    },

    // The tagged v1 must survive vacuum(keep=1) untouched, the live
    // head is the two-update keep-latest, and exactly two manifests
    // remain (the pinned tag + the head).
    "q332_snapshot_tags_vacuum" ->
      s"""WITH uniq AS (SELECT symbol, d, px, vol FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY ord DESC, px DESC, vol DESC) AS rn
         |    FROM ($barsSql) WHERE symbol % 64 = 3) WHERE rn = 1),
         |live AS (SELECT symbol, d,
         |    CASE WHEN symbol % 3 = 1 THEN px * 3
         |      WHEN symbol % 3 = 0 THEN px * 2 ELSE px END AS px
         |  FROM uniq)
         |SELECT 'tagged' AS facet, CAST(count(*) AS BIGINT) AS n,
         |  round(sum(px), 2) AS px_sum FROM uniq
         |UNION ALL SELECT 'live', CAST(count(*) AS BIGINT),
         |  round(sum(px), 2) FROM live
         |UNION ALL SELECT 'versions', CAST(2 AS BIGINT),
         |  CAST(NULL AS DOUBLE)""".stripMargin,

    // Point lookups are semantically a plain key filter — the pruning
    // must never lose a key.
    "q333_point_lookup" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM documents WHERE doc_id % 97 = 0 AND doc_id < 4000
        |GROUP BY 1""".stripMargin,

    // Same exact clipped counts (per-(doc, gram) least summed
    // corpus-wide) and the identical fixed-association double chain.
    "q334_bleu_eval" -> {
      def gramsSql(src: String, n: Int): String =
        if (n == 1) src
        else s"""CASE WHEN len($src) >= $n
                |  THEN [array_to_string($src[i:i+${n - 1}], ' ')
                |    for i in range(1, len($src) - ${n - 2})]
                |  ELSE CAST([] AS VARCHAR[]) END""".stripMargin
      def cntSql(side: String, n: Int, out: String): String =
        s"""$out AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT doc_id, unnest(${gramsSql(side, n)}) AS g
           |    FROM pair) GROUP BY 1, 2)""".stripMargin
      def nSql(n: Int): String =
        s"""${cntSql("cand", n, s"c$n")},
           |${cntSql("ref", n, s"r$n")},
           |p$n AS (SELECT CAST(sum(c$n.c) AS BIGINT) AS total,
           |    CAST(sum(least(c$n.c, coalesce(r$n.c, 0))) AS BIGINT)
           |      AS matched
           |  FROM c$n LEFT JOIN r$n USING (doc_id, g))""".stripMargin
      s"""WITH tk AS (SELECT doc_id, $tokSql AS ref FROM documents),
         |pair AS (SELECT doc_id, ref,
         |    [ref[i] for i in range(1, len(ref) + 1) if i % 7 != 0]
         |      AS cand
         |  FROM tk),
         |${nSql(1)},
         |${nSql(2)},
         |${nSql(3)},
         |${nSql(4)},
         |lens AS (SELECT CAST(sum(len(cand)) AS BIGINT) AS c_len,
         |    CAST(sum(len(ref)) AS BIGINT) AS r_len FROM pair)
         |SELECT c_len, r_len,
         |  p1.matched AS matched_1, p1.total AS total_1,
         |  p2.matched AS matched_2, p2.total AS total_2,
         |  p3.matched AS matched_3, p3.total AS total_3,
         |  p4.matched AS matched_4, p4.total AS total_4,
         |  CASE WHEN p1.matched = 0 OR p2.matched = 0
         |      OR p3.matched = 0 OR p4.matched = 0 OR c_len = 0
         |    THEN NULL ELSE
         |    CAST(round(CAST(
         |      (CASE WHEN c_len < r_len
         |        THEN exp(CAST(1.0 AS DOUBLE)
         |          - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE))
         |        ELSE CAST(1.0 AS DOUBLE) END)
         |      * exp((ln(CAST(p1.matched AS DOUBLE)
         |            / CAST(p1.total AS DOUBLE))
         |          + ln(CAST(p2.matched AS DOUBLE)
         |            / CAST(p2.total AS DOUBLE))
         |          + ln(CAST(p3.matched AS DOUBLE)
         |            / CAST(p3.total AS DOUBLE))
         |          + ln(CAST(p4.matched AS DOUBLE)
         |            / CAST(p4.total AS DOUBLE)))
         |        / CAST(4.0 AS DOUBLE))
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS bleu
         |FROM p1, p2, p3, p4, lens""".stripMargin
    },

    // Rows overwritten by the evolved batch carry src='late' and
    // doubled px; every pre-evolution row null-fills to 'base'.
    "q335_schema_evolution" ->
      s"""WITH uniq AS (SELECT symbol, d, px, vol FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY ord DESC, px DESC, vol DESC) AS rn
         |    FROM ($barsSql) WHERE symbol % 64 = 4) WHERE rn = 1),
         |f AS (SELECT CASE WHEN symbol % 3 = 0 THEN 'late'
         |      ELSE 'base' END AS src,
         |    CASE WHEN symbol % 3 = 0 THEN px * 2 ELSE px END AS px
         |  FROM uniq)
         |SELECT src, CAST(count(*) AS BIGINT) AS n,
         |  round(sum(px), 2) AS px_sum
         |FROM f GROUP BY 1""".stripMargin,

    // Content survives compaction byte-identically under the single
    // retag partition value; exactly one dir remains.
    "q336_snapshot_compaction" ->
      s"""WITH uniq AS (SELECT symbol, d, px, vol FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY ord DESC, px DESC, vol DESC) AS rn
         |    FROM ($barsSql) WHERE symbol % 64 = 5) WHERE rn = 1)
         |SELECT CAST(9 AS BIGINT) AS p,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  round(sum(px), 2) AS px_sum,
         |  CAST(1 AS BIGINT) AS n_dirs
         |FROM uniq""".stripMargin,

    // Pruned scan + exact filter ≡ plain WHERE BETWEEN.
    "q337_zorder_pruning" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents WHERE n_chars BETWEEN 150 AND 300
        |GROUP BY 1""".stripMargin,

    // Routing is per-row: first failing gate wins in the q24/q71/q70
    // expression algebra; batch split can't change the answer.
    "q338_hygiene_stream" ->
      s"""WITH tkd AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |sc AS (SELECT doc_id,
         |    CAST(round(CAST(0.4 * least(1.0, len(tk) / 100.0)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_filter(tk,
         |            t -> t IN ('the','a','of','to','and'))) * 1.0
         |            / len(tk) END)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_distinct(tk)) * 1.0 / len(tk) END)
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) AS quality,
         |    CASE WHEN len(tk) < 3 THEN 0.0
         |      ELSE CAST(round(CAST(CAST(1.0 AS DOUBLE)
         |        - CAST(len(list_distinct(
         |            [array_to_string(tk[i:i+2], ' ')
         |             for i in range(1, len(tk) - 1)])) AS DOUBLE)
         |          / (len(tk) - 2) AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    END AS repetition
         |  FROM tkd),
         |shq AS (SELECT doc_id, unnest($shingleSql) AS s FROM tkd),
         |bench AS (SELECT DISTINCT s FROM shq WHERE doc_id % 10 = 0),
         |shared AS (SELECT doc_id, CAST(count(*) AS BIGINT)
         |    AS n_shared
         |  FROM shq JOIN bench USING (s) GROUP BY 1),
         |r AS (SELECT sc.doc_id,
         |    CASE WHEN quality < 0.35 THEN 'low_quality'
         |      WHEN repetition > 0.5 THEN 'repetitive'
         |      WHEN coalesce(n_shared, 0) > 0 THEN 'contaminated'
         |      END AS reason
         |  FROM sc LEFT JOIN shared USING (doc_id))
         |SELECT reason AS facet, CAST(count(*) AS BIGINT) AS n
         |FROM r WHERE reason IS NOT NULL GROUP BY 1
         |UNION ALL
         |SELECT 'accepted', CAST(count(*) AS BIGINT)
         |FROM r WHERE reason IS NULL""".stripMargin,

    // Two cumulative PSIs (q90's ×1e6 term snap) + the exact md5-sum
    // batch fingerprints over cent-integer value strings.
    "q339_drift_stream" -> {
      def fpSql(pred: String): String =
        s"""'_' || CAST(CAST(sum(CAST(${h60("CAST(v AS VARCHAR)")}
           |  AS HUGEINT)) % 1152921504606846976 AS BIGINT) AS VARCHAR)"""
          .stripMargin
      def psiSql(curCte: String, out: String): String =
        s"""${out}tc AS (SELECT CAST(sum(n_c) AS BIGINT) AS t_c
           |  FROM $curCte),
           |${out}terms AS (SELECT
           |    CAST(round((CAST(n_r AS DOUBLE) / t_r
           |        - CAST(n_c AS DOUBLE) / t_c)
           |      * ln((CAST(n_r AS DOUBLE) / t_r)
           |        / (CAST(n_c AS DOUBLE) / t_c))
           |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS term_fp
           |  FROM ref JOIN $curCte USING (bin)
           |  CROSS JOIN tr CROSS JOIN ${out}tc),
           |$out AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
           |    CAST(round(CAST(CAST(sum(term_fp) AS DOUBLE)
           |      / CAST(1000000.0 AS DOUBLE) AS DECIMAL(20,10)), 4)
           |      AS DOUBLE) AS psi
           |  FROM ${out}terms)""".stripMargin
      s"""WITH ev AS (SELECT event_id,
         |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
         |ref AS (SELECT CAST(floor(v / CAST(500 AS DOUBLE)) AS BIGINT)
         |      AS bin, CAST(count(*) AS BIGINT) AS n_r
         |  FROM ev WHERE event_id % 2 = 0 GROUP BY 1),
         |tr AS (SELECT CAST(sum(n_r) AS BIGINT) AS t_r FROM ref),
         |b1 AS (SELECT v FROM ev WHERE event_id % 4 = 1),
         |b2 AS (SELECT v FROM ev WHERE event_id % 4 = 3),
         |h1 AS (SELECT CAST(floor(v / CAST(500 AS DOUBLE)) AS BIGINT)
         |      AS bin, CAST(count(*) AS BIGINT) AS n_c
         |  FROM b1 GROUP BY 1),
         |h12 AS (SELECT CAST(floor(v / CAST(500 AS DOUBLE)) AS BIGINT)
         |      AS bin, CAST(count(*) AS BIGINT) AS n_c
         |  FROM (SELECT v FROM b1 UNION ALL SELECT v FROM b2)
         |  GROUP BY 1),
         |${psiSql("h1", "s1")},
         |${psiSql("h12", "s2")},
         |f1 AS (SELECT 'b0' || ${fpSql("")} AS batch_fp,
         |    CAST(count(*) AS BIGINT) AS n_rows FROM b1),
         |f2 AS (SELECT 'b1' || ${fpSql("")} AS batch_fp,
         |    CAST(count(*) AS BIGINT) AS n_rows FROM b2)
         |SELECT batch_fp, n_rows, n_bins, psi,
         |  (n_bins = 0 OR psi >= CAST(0.2 AS DOUBLE)) AS alarm
         |FROM f1 CROSS JOIN s1
         |UNION ALL
         |SELECT batch_fp, n_rows, n_bins, psi,
         |  (n_bins = 0 OR psi >= CAST(0.2 AS DOUBLE)) AS alarm
         |FROM f2 CROSS JOIN s2""".stripMargin
    },

    // q308's keep-latest-by-version algebra on the %64=6 slice.
    "q340_merge_stream" ->
      s"""WITH uniq AS (SELECT symbol, d, px, vol FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY ord DESC, px DESC, vol DESC) AS rn
         |    FROM ($barsSql) WHERE symbol % 64 = 6) WHERE rn = 1),
         |u AS (SELECT symbol, d, px, 0 AS version FROM uniq
         |  UNION ALL SELECT symbol, d, px * 2, 1 FROM uniq
         |  WHERE symbol % 3 = 0),
         |f AS (SELECT * FROM (SELECT *, row_number() OVER (
         |    PARTITION BY symbol, d ORDER BY version DESC) AS rn
         |  FROM u) WHERE rn = 1)
         |SELECT symbol, CAST(count(*) AS BIGINT) AS n_rows,
         |  round(sum(px), 2) AS px_sum
         |FROM f GROUP BY 1""".stripMargin,

    // All four change classes replayed with px payloads: inserts are
    // the surviving mirrored keys (original px), deletes the %5 keys
    // at v1 values, updates emit v1 and v2 rows per changed key.
    "q342_cdc_feed" ->
      s"""WITH uniq AS (SELECT symbol, d, px, vol FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY ord DESC, px DESC, vol DESC) AS rn
         |    FROM ($barsSql) WHERE symbol % 64 = 7) WHERE rn = 1)
         |SELECT 'insert' AS _change_type, CAST(count(*) AS BIGINT)
         |    AS n, round(sum(px), 2) AS px_sum
         |  FROM uniq WHERE symbol % 7 = 0 AND symbol % 5 <> 0
         |  HAVING count(*) > 0
         |UNION ALL
         |SELECT 'delete', CAST(count(*) AS BIGINT), round(sum(px), 2)
         |  FROM uniq WHERE symbol % 5 = 0 HAVING count(*) > 0
         |UNION ALL
         |SELECT 'update_preimage', CAST(count(*) AS BIGINT),
         |    round(sum(px), 2)
         |  FROM uniq WHERE symbol % 3 = 0 AND symbol % 5 <> 0
         |  HAVING count(*) > 0
         |UNION ALL
         |SELECT 'update_postimage', CAST(count(*) AS BIGINT),
         |    round(sum(px * 2), 2)
         |  FROM uniq WHERE symbol % 3 = 0 AND symbol % 5 <> 0
         |  HAVING count(*) > 0"""
        .stripMargin,

    // The maintained view must equal the direct v3 aggregate (cent
    // integers end-to-end, one double division at the end).
    "q343_cdc_view_maintenance" ->
      s"""WITH uniq AS (SELECT symbol, d, px, vol FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY ord DESC, px DESC, vol DESC) AS rn
         |    FROM ($barsSql) WHERE symbol % 64 = 8) WHERE rn = 1),
         |u AS (SELECT symbol, d, px, 0 AS version FROM uniq
         |  UNION ALL SELECT symbol, d, px * 2, 1 FROM uniq
         |    WHERE symbol % 3 = 0
         |  UNION ALL SELECT -symbol, d, px, 1 FROM uniq
         |    WHERE symbol % 7 = 0),
         |v2 AS (SELECT symbol, d, px FROM (
         |    SELECT symbol, d, px, row_number() OVER (
         |      PARTITION BY symbol, d ORDER BY version DESC) AS rn
         |    FROM u)
         |  WHERE rn = 1),
         |v3 AS (SELECT * FROM v2 WHERE symbol % 5 <> 0)
         |SELECT symbol, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(round(CAST(CAST(sum(CAST(round(px * 100) AS BIGINT))
         |    AS DOUBLE) / 100.0 AS DECIMAL(20,10)), 2) AS DOUBLE)
         |    AS px_sum
         |FROM v3 GROUP BY 1""".stripMargin,

    // Per-batch cumulative states for exactly the symbols active in
    // each batch: n_updates = batches with data, finals = cumulative
    // count/max/min (the last update carries the totals).
    "q344_running_state_stream" ->
      s"""WITH b AS (SELECT symbol, d, px,
         |    date_diff('day', DATE '1970-01-01', d) AS dd
         |  FROM ($barsSql) WHERE symbol % 64 = 9),
         |ext AS (SELECT CAST(floor((min(dd) + max(dd)) / 2) AS BIGINT)
         |    AS mid FROM b),
         |g AS (SELECT symbol,
         |    CAST(max(CASE WHEN dd <= mid THEN 1 ELSE 0 END)
         |      + max(CASE WHEN dd > mid THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_updates,
         |    CAST(count(*) AS BIGINT) AS n_rows_final,
         |    CAST(max(d) AS VARCHAR) AS last_date,
         |    round(min(px), 2) AS min_close
         |  FROM b CROSS JOIN ext GROUP BY 1)
         |SELECT symbol, n_updates, n_rows_final, last_date, min_close
         |FROM g""".stripMargin,

    // The streamed inner interval join equals the batch join (q48's
    // algebra on the %4=0 slice).
    "q346_stream_interval_join" ->
      """SELECT l.user_id AS user_id, count(*) AS n_pairs,
        |  round(sum(r.value), 2) AS pred_value_sum
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        |  AND r.ts >= l.ts - INTERVAL 10 MINUTE
        |  AND r.ts < l.ts
        |WHERE l.user_id % 16 = 0 AND r.user_id % 16 = 0
        |GROUP BY 1""".stripMargin,

    // q43's gaps-and-islands sessions filtered to those whose end
    // (last event + 30 min) is at or below the ms-truncated final
    // watermark.
    "q347_stream_session_windows" ->
      """WITH ev AS (SELECT user_id, ts, value FROM events
        |  WHERE user_id % 4 = 1),
        |wm AS (SELECT (max(epoch_us(ts)) // 1000) * 1000 AS wmf
        |  FROM ev),
        |m AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m),
        |g AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS s_start,
        |    CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT)
        |      AS s_end,
        |    epoch_us(max(ts) + INTERVAL 30 MINUTE) AS end_us,
        |    user_id, CAST(count(*) AS BIGINT) AS n,
        |    round(sum(value), 2) AS value_sum
        |  FROM sess GROUP BY user_id, sid)
        |SELECT s_start, s_end, user_id, n, value_sum
        |FROM g CROSS JOIN wm WHERE end_us <= wmf""".stripMargin,

    // Re-deliveries absorb to exactly one copy: the plain aggregate.
    "q348_stream_dedup_keys" ->
      """SELECT user_id % 10 AS bucket, CAST(count(*) AS BIGINT)
        |    AS n_rows,
        |  CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT)
        |    AS value_sum
        |FROM events WHERE user_id % 4 = 2 GROUP BY 1""".stripMargin,

    // Split-independent emission rule: a session row exists iff the
    // user's last-event millisecond + 30 min gap sits strictly below
    // the final watermark; stats are cumulative over all their events.
    "q345_expiring_sessions" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us,
        |    CAST(round(value) AS BIGINT) AS v FROM events),
        |g AS (SELECT user_id, max(us) // 1000 AS lms,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS value_sum
        |  FROM ev GROUP BY 1),
        |wmf AS (SELECT max(us) // 1000 AS w FROM ev)
        |SELECT user_id, n, value_sum FROM g CROSS JOIN wmf
        |WHERE lms + 1800000 < w""".stripMargin,

    // Same md5-uniform draw, same ×1e6 ln snap, same tie order.
    "q349_weighted_reservoir" ->
      s"""SELECT doc_id, n_chars,
         |  CAST(round(ln(CAST(${h60("'ws' || CAST(doc_id AS VARCHAR)")}
         |      + 1 AS DOUBLE)
         |      / CAST(1152921504606846976 AS DOUBLE))
         |    / CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS key6
         |FROM documents WHERE n_chars > 0
         |ORDER BY key6 DESC, doc_id LIMIT 20""".stripMargin,

    // Partition pruning on the partition column IS the filter.
    "q351_partition_pruned_read" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM documents WHERE lang IN ('en', 'de')
        |GROUP BY 1""".stripMargin,

    // The chooser replayed in SQL: k = clamp(ceil(sqrt n)) from the
    // corpus count, centroids = the k lowest ids, nprobe=4 probe
    // ranking mirrors ivfProbeCells (rounded-cos desc, cid), a planted
    // pair counts as found when its two sides share a probed cell.
    "q352_ann_k_chooser" ->
      s"""WITH e0 AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |  FROM embeddings),
         |sc AS (SELECT unnest([1, 10]) AS scale),
         |base AS (SELECT s.scale, e.vec_id + i.i * 100000000 AS id,
         |    e.vec
         |  FROM e0 e CROSS JOIN sc s
         |  JOIN (SELECT unnest(range(10)) AS i) i ON i.i < s.scale),
         |allv AS (SELECT scale, id, vec FROM base
         |  UNION ALL
         |  SELECT scale, id + 1000000000,
         |    [CASE WHEN j = 1 THEN vec[j] + CAST(0.5 AS DOUBLE)
         |      ELSE vec[j] END for j in range(1, len(vec) + 1)]
         |  FROM base),
         |params AS (SELECT scale, CAST(count(*) AS BIGINT) AS n,
         |    GREATEST(4, LEAST(65536,
         |      CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS INT))) AS k
         |  FROM allv GROUP BY 1),
         |ct AS (SELECT a.scale, a.id AS cid, a.vec AS cvec
         |  FROM allv a JOIN params p
         |    ON a.scale = p.scale AND a.id < p.k),
         |planted AS (SELECT a.scale, a.id
         |  FROM allv a JOIN allv b ON a.scale = b.scale
         |    AND b.id = a.id + 1000000000
         |  WHERE a.id < 1000000000
         |    AND round(${cosSql("a.vec", "b.vec")}, 6)
         |      >= CAST(0.9 AS DOUBLE)),
         |pids AS (SELECT scale, id FROM planted
         |  UNION ALL SELECT scale, id + 1000000000 FROM planted),
         |pc AS (SELECT scale, qid, cell FROM (
         |  SELECT v.scale, v.id AS qid, c.cid AS cell,
         |    row_number() OVER (PARTITION BY v.scale, v.id
         |      ORDER BY round(${cosSql("v.vec", "c.cvec")}, 6) DESC,
         |        c.cid) AS pr
         |  FROM (SELECT a.* FROM allv a JOIN pids
         |    ON a.scale = pids.scale AND a.id = pids.id) v
         |  JOIN ct c ON v.scale = c.scale) WHERE pr <= 4),
         |found AS (SELECT DISTINCT pl.scale, pl.id
         |  FROM planted pl
         |  JOIN pc x ON x.scale = pl.scale AND x.qid = pl.id
         |  JOIN pc y ON y.scale = pl.scale
         |    AND y.qid = pl.id + 1000000000 AND y.cell = x.cell),
         |pagg AS (SELECT scale, CAST(count(*) AS BIGINT) AS n_planted
         |  FROM planted GROUP BY 1),
         |fagg AS (SELECT scale, CAST(count(*) AS BIGINT) AS n_found
         |  FROM found GROUP BY 1)
         |SELECT CAST(pa.scale AS INT) AS scale, pr.n AS n_vecs,
         |  CAST(pr.k AS INT) AS k, CAST(4 AS INT) AS nprobe,
         |  pa.n_planted,
         |  CAST(coalesce(fa.n_found, 0) AS BIGINT) AS n_found,
         |  CAST(round(CAST(CAST(coalesce(fa.n_found, 0) AS DOUBLE)
         |    / CAST(pa.n_planted AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS recall
         |FROM pagg pa JOIN params pr ON pa.scale = pr.scale
         |LEFT JOIN fagg fa ON fa.scale = pa.scale""".stripMargin,

    // The refresh replayed in SQL: seed = 4 lowest ids of batch 0
    // (chooseK(8)=4), batches 0/1 dedup under those cells, then the
    // retrained centroid set = chooseK(|survivors|) lowest-id
    // survivors, corpus re-assigned, and batch 2 dedups under the new
    // cells. The -1 row is the refreshed model itself.
    "q353_ann_refresh_stream" -> {
      def asg(src: String, ct: String): String =
        s"""SELECT id, vec, cell FROM (
           |  SELECT x.id, x.vec, c.cid AS cell,
           |    row_number() OVER (PARTITION BY x.id
           |      ORDER BY round(${sqdSql("x.vec", "c.cvec")}, 6),
           |        c.cid) AS pr
           |  FROM ($src) x CROSS JOIN $ct c) WHERE pr = 1""".stripMargin
      s"""WITH v AS (SELECT vec_id AS id, embedding AS vec
         |  FROM embeddings),
         |tw AS (SELECT id + 1000000000 AS id,
         |    [CASE WHEN j = 1
         |       THEN CAST(CAST(vec[j] AS DOUBLE) + 0.5 AS FLOAT)
         |       ELSE vec[j] END for j in range(1, len(vec) + 1)] AS vec
         |  FROM v WHERE id >= 8 AND id < 200),
         |b01 AS (SELECT id, vec FROM v WHERE id < 200),
         |b2 AS (SELECT id, vec FROM v WHERE id >= 200
         |  UNION ALL SELECT id, vec FROM tw),
         |ct0 AS (SELECT id AS cid, vec AS cvec FROM v
         |  WHERE id < 8 ORDER BY id LIMIT 4),
         |a01 AS (${asg("SELECT * FROM b01", "ct0")}),
         |p0 AS (SELECT DISTINCT a.id FROM a01 a JOIN a01 b
         |  ON a.id < 8 AND b.id < 8 AND a.cell = b.cell AND a.id > b.id
         |  WHERE round(${cosSql("a.vec", "b.vec")}, 6)
         |    >= CAST(0.9 AS DOUBLE)),
         |s0 AS (SELECT id, vec FROM a01 WHERE id < 8
         |  AND id NOT IN (SELECT id FROM p0)),
         |cand1 AS (SELECT id, vec, cell, FALSE AS isnew FROM a01
         |    WHERE id < 8 AND id NOT IN (SELECT id FROM p0)
         |  UNION ALL SELECT id, vec, cell, TRUE FROM a01 WHERE id >= 8),
         |p1 AS (SELECT DISTINCT a.id FROM a01 a JOIN cand1 b
         |  ON a.id >= 8 AND a.cell = b.cell AND a.id <> b.id
         |  AND (NOT b.isnew OR a.id > b.id)
         |  WHERE round(${cosSql("a.vec", "b.vec")}, 6)
         |    >= CAST(0.9 AS DOUBLE)),
         |s1 AS (SELECT id, vec FROM a01 WHERE id >= 8 AND id < 200
         |  AND id NOT IN (SELECT id FROM p1)),
         |surv01 AS (SELECT id, vec FROM s0
         |  UNION ALL SELECT id, vec FROM s1),
         |kk AS (SELECT GREATEST(4, LEAST(65536,
         |    CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS INT))) AS k
         |  FROM surv01),
         |ct1 AS (SELECT cid, cvec FROM (
         |  SELECT id AS cid, vec AS cvec,
         |    row_number() OVER (ORDER BY id) AS rn FROM surv01)
         |  WHERE rn <= (SELECT k FROM kk)),
         |a2 AS (${asg("SELECT id, vec FROM surv01" +
             " UNION ALL SELECT id, vec FROM b2", "ct1")}),
         |cand2 AS (SELECT a2.id, a2.vec, a2.cell,
         |    a2.id IN (SELECT id FROM b2) AS isnew FROM a2),
         |p2 AS (SELECT DISTINCT a.id FROM cand2 a JOIN cand2 b
         |  ON a.isnew AND a.cell = b.cell AND a.id <> b.id
         |  AND (NOT b.isnew OR a.id > b.id)
         |  WHERE round(${cosSql("a.vec", "b.vec")}, 6)
         |    >= CAST(0.9 AS DOUBLE)),
         |s2 AS (SELECT id FROM b2 WHERE id NOT IN (SELECT id FROM p2))
         |SELECT CAST(0 AS BIGINT) AS ingest_batch,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(id) AS BIGINT) AS id_sum FROM s0
         |UNION ALL SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
         |  CAST(sum(id) AS BIGINT) FROM s1
         |UNION ALL SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
         |  CAST(sum(id) AS BIGINT) FROM s2
         |UNION ALL SELECT CAST(-1 AS BIGINT),
         |  (SELECT CAST(count(*) AS BIGINT) FROM ct1),
         |  (SELECT CAST(sum(cid) AS BIGINT) FROM ct1)""".stripMargin
    },

    // The bucketed layout changes the PLAN, never the rows: a plain
    // equi-join + group is the whole truth.
    "q354_bucketed_join" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice
        |    * (CAST(1 AS DOUBLE) - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS rev_sum_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_partkey % 4 = 0
        |GROUP BY 1""".stripMargin,

    // The advisor replayed: same chooser arithmetic, same argmax
    // assignment (rounded-cos desc, cid), exact integer costs.
    "q355_ivf_cost_advisor" ->
      s"""WITH e AS (SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
         |  FROM embeddings),
         |p AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    GREATEST(4, LEAST(65536,
         |      CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS INT))) AS k
         |  FROM e),
         |cands AS (SELECT DISTINCT kc FROM (SELECT unnest([
         |    GREATEST(4, k // 2), k, LEAST(65536, k * 2)]) AS kc
         |  FROM p)),
         |asg AS (SELECT kc, id, cell FROM (
         |  SELECT c.kc, v.id, ct.cid AS cell,
         |    row_number() OVER (PARTITION BY c.kc, v.id
         |      ORDER BY round(${cosSql("v.vec", "ct.cvec")}, 6) DESC,
         |        ct.cid) AS pr
         |  FROM e v CROSS JOIN cands c
         |  JOIN (SELECT id AS cid, vec AS cvec FROM e) ct
         |    ON ct.cid < c.kc) WHERE pr = 1),
         |occ AS (SELECT kc, cell, CAST(count(*) AS BIGINT) AS o
         |  FROM asg GROUP BY 1, 2),
         |st AS (SELECT kc, CAST(count(*) AS BIGINT) AS n_cells,
         |    CAST(max(o) AS BIGINT) AS max_occ,
         |    CAST(sum(o * o) AS BIGINT) AS occ_sq_sum
         |  FROM occ GROUP BY 1)
         |SELECT CAST(st.kc AS INT) AS k_cand, st.n_cells, st.max_occ,
         |  st.occ_sq_sum, CAST(p.n * st.kc AS BIGINT) AS assign_cost,
         |  CAST(st.occ_sq_sum + p.n * st.kc AS BIGINT) AS total_cost,
         |  st.kc = p.k AS advised
         |FROM st, p""".stripMargin,

    // The SA replayed as a sort of chr(1)-joined doc-local suffix
    // strings (sentinel semantics — see saCteSql), same slice, same
    // per-doc exact rank sums.
    "q356_suffix_array" ->
      s"""WITH ${saCteSql("doc_id % 4 = 0")}
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(r) AS BIGINT) AS sum_rank,
         |  CAST(min(r) AS BIGINT) AS min_rank,
         |  CAST(max(r) AS BIGINT) AS max_rank
         |FROM sa GROUP BY 1""".stripMargin,

    // Adjacent-pair LCP via the exploded first-mismatch, same ≥ 8
    // floor, same (lcp desc, doc_a, pos_a, doc_b) top-40 cut, span
    // text sliced from the left doc's tokens.
    "q357_repeated_spans" ->
      s"""WITH ${saCteSql("doc_id % 2 = 0")}
         |SELECT lc.doc_a, lc.pos_a, lc.doc_b, lc.pos_b, lc.lcp,
         |  array_to_string(list_slice(tk.tk, lc.pos_a + 1,
         |    lc.pos_a + lc.lcp), ' ') AS span_text
         |FROM lc JOIN tk ON tk.doc_id = lc.doc_a
         |WHERE lc.lcp >= 8
         |ORDER BY lc.lcp DESC, lc.doc_a, lc.pos_a, lc.doc_b
         |LIMIT 40""".stripMargin,

    // Same per-position max-neighbor-LCP spans, same per-doc interval
    // union via the running max of previous span ends.
    "q358_dup_span_coverage" ->
      s"""WITH ${saCteSql("doc_id % 3 = 0")},
         |sp0 AS (SELECT doc_a AS doc_id, pos_a AS pos, lcp
         |    FROM lc WHERE lcp >= 8
         |  UNION ALL SELECT doc_b, pos_b, lcp FROM lc WHERE lcp >= 8),
         |sp AS (SELECT doc_id, pos, max(lcp) AS l
         |  FROM sp0 GROUP BY 1, 2),
         |cv AS (SELECT doc_id, pos, l,
         |    max(pos + l) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS prev_end FROM sp),
         |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_starts,
         |    CAST(sum(greatest(0, pos + l
         |      - greatest(coalesce(prev_end, pos), pos))) AS BIGINT)
         |      AS covered_tokens
         |  FROM cv GROUP BY 1)
         |SELECT tk.doc_id, CAST(len(tk.tk) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(ag.dup_starts, 0) AS BIGINT) AS dup_starts,
         |  CAST(coalesce(ag.covered_tokens, 0) AS BIGINT)
         |    AS covered_tokens,
         |  CASE WHEN len(tk.tk) = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(coalesce(ag.covered_tokens, 0)
         |      AS DOUBLE) / CAST(len(tk.tk) AS DOUBLE)
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS covered_ratio
         |FROM tk LEFT JOIN ag ON ag.doc_id = tk.doc_id""".stripMargin,

    // INDEPENDENT verification: the engine derives families from SA
    // islands; the oracle brute-counts every 8-gram — identical rows
    // only if the suffix array is right everywhere.
    "q359_repeat_families" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk
         |  FROM documents WHERE doc_id % 3 = 0),
         |g AS (SELECT doc_id, array_to_string(tk[i:i+7], ' ') AS gram
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
         |    FROM tk))
         |SELECT gram, CAST(count(*) AS BIGINT) AS occurrences,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM g GROUP BY 1 HAVING count(*) >= 2
         |ORDER BY occurrences DESC, gram LIMIT 30""".stripMargin,

    // Nearest-train-neighbor replay: prev/next train suffix by SA
    // order (aggregate-as-window max/min skips the eval rows), direct
    // LCP against those two via the exploded first-mismatch, same
    // per-doc rollup and ≥ 8 floor.
    "q360_decontaminate" ->
      s"""WITH ${saCteSql("1 = 1")},
         |${saCrossMatchCtes("doc_id % 2 = 0")}
         |SELECT ag.doc_id, CAST(len(tk.tk) AS BIGINT) AS n_tokens,
         |  ag.longest_train_match, ag.contaminated_starts
         |FROM ag JOIN tk ON tk.doc_id = ag.doc_id
         |WHERE ag.longest_train_match >= 8
         |ORDER BY ag.longest_train_match DESC, ag.doc_id
         |LIMIT 50""".stripMargin,

    // The full training trajectory replayed with iterations unrolled:
    // same ×1e6 feature/bias snap, exact integer margins/gradients,
    // sigmoid snapped ×1e6 (iteration 1's p is exactly 500000 — w=0),
    // same round-half-away-from-zero updates.
    "q361_logistic_gd" ->
      s"""WITH $logisticGdCtes
         |SELECT dim, w AS w_micro FROM w3""".stripMargin,

    // Scoring replays the forward pass with w3 (one more m/p stage),
    // bins by integer floor with the top edge clamped, and the masses
    // are exact integer sums — train, score, AND bin must all agree.
    "q379_calibration_bins" ->
      s"""WITH $logisticGdCtes,
         |m4 AS (SELECT x.id, sum(CAST(x.xi AS HUGEINT) * w3.w) AS m12
         |  FROM x JOIN w3 USING (dim) GROUP BY 1),
         |p4 AS (SELECT id, CAST(round(1e6 / (1 + exp(
         |    -(CAST(m12 AS DOUBLE) / 1e12)))) AS BIGINT) AS pmu
         |  FROM m4),
         |b AS (SELECT least((p4.pmu * 1000) // 1000000, 999) AS bin,
         |    p4.pmu, y.ymu
         |  FROM p4 JOIN y USING (id))
         |SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) FILTER (ymu = 1000000) AS BIGINT) AS positives,
         |  CAST(sum(pmu) AS BIGINT) AS pmu_mass
         |FROM b GROUP BY 1""".stripMargin,

    // Every count is a pure function of the fixture: the base (even
    // ids) is what main readers must see mid-audit, the staged batch
    // (odd ids) plants doc_id%10=1 bad rows, the publish lands the
    // clean remainder as version 2 on top of the base commit.
    "q362_wap_publish" ->
      """WITH b AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 2 = 0),
        |i AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 2 = 1),
        |ib AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 2 = 1 AND doc_id % 10 = 1)
        |SELECT b.c AS main_rows_during_audit,
        |  ib.c AS staged_bad_rows,
        |  CAST(0 AS BIGINT) AS clean_stage_bad_rows,
        |  CAST(2 AS BIGINT) AS published_version,
        |  i.c - ib.c AS final_rows,
        |  CAST(0 AS BIGINT) AS final_bad,
        |  CAST(0 AS BIGINT) AS staged_left
        |FROM b, i, ib""".stripMargin,

    // Same concat-and-chunk arithmetic from a window cumsum.
    "q363_sequence_packing" ->
      s"""WITH tk AS (SELECT doc_id, len($tokSql) AS n FROM documents),
         |o AS (SELECT doc_id, n,
         |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS off FROM tk),
         |l AS (SELECT doc_id, n, off, off // 512 AS s,
         |    (off + n - 1) // 512 AS e FROM o WHERE n > 0),
         |tt AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM tk),
         |tc AS (SELECT doc_id, s AS start_seq,
         |    unnest(range(s, e + 1)) AS seq_id FROM l)
         |SELECT CAST(seq_id AS BIGINT) AS seq_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (start_seq = seq_id) AS BIGINT)
         |    AS n_docs_starting,
         |  CAST(min(doc_id) AS BIGINT) AS first_doc,
         |  CAST(least(512, tt.total - seq_id * 512) AS BIGINT)
         |    AS tokens_filled
         |FROM tc, tt GROUP BY seq_id, tt.total""".stripMargin,

    // Same (len desc, id) striping replayed with row_number.
    "q364_striped_packing" ->
      s"""WITH tk AS (SELECT doc_id, len($tokSql) AS n FROM documents),
         |r AS (SELECT doc_id, n,
         |    row_number() OVER (ORDER BY n DESC, doc_id) - 1 AS r
         |  FROM tk),
         |b AS (SELECT CAST(ceil(CAST(sum(n) AS DOUBLE) / 512)
         |    AS BIGINT) AS nb FROM tk)
         |SELECT CAST(r.r % b.nb AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n) AS BIGINT) AS tokens,
         |  CAST(greatest(0, sum(n) - 512) AS BIGINT) AS overflow
         |FROM r, b GROUP BY 1""".stripMargin,

    // Same panel, same ×1e6 cosine micro ints, same (cos desc, id)
    // argmax per side.
    "q365_triplet_mining" ->
      s"""WITH e AS (SELECT vec_id AS id, embedding AS v, label
         |    FROM embeddings),
         |a AS (SELECT * FROM e WHERE id % 50 = 0),
         |p AS (SELECT a.id AS aid, a.label AS al, c.id AS cid,
         |    (a.label = c.label) AS same,
         |    CAST(round(${cosSql("a.v", "c.v")} * 1e6) AS BIGINT) AS cm
         |  FROM a JOIN e c ON c.id <> a.id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY aid, same
         |    ORDER BY cm DESC, cid) AS rn FROM p),
         |pos AS (SELECT aid, al, cid AS pos_id, cm AS pos_cos_micro
         |  FROM r WHERE same AND rn = 1),
         |neg AS (SELECT aid, cid AS neg_id, cm AS neg_cos_micro
         |  FROM r WHERE NOT same AND rn = 1)
         |SELECT pos.aid AS anchor_id, CAST(pos.al AS INT) AS label,
         |  pos.pos_id, pos.pos_cos_micro, neg.neg_id,
         |  neg.neg_cos_micro,
         |  pos.pos_cos_micro - neg.neg_cos_micro AS margin_micro
         |FROM pos JOIN neg USING (aid)""".stripMargin,

    // Same quasi-identifier grouping, exact counts.
    "q366_k_anonymity" ->
      """SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS group_n,
        |  count(*) >= 5 AS k_anonymous,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS l_diversity
        |FROM documents GROUP BY 1, 2""".stripMargin,

    // Same per-length gram streams (q221's 0-based struct
    // comprehension), VALUES blocklist, same per-(doc, phrase)
    // rollup.
    "q367_blocklist_spans" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |g AS (SELECT doc_id, r['p'] AS pos, r['g'] AS gram FROM (
         |    SELECT doc_id, unnest([{'p': i,
         |        'g': array_to_string(tk[i+1:i+2], ' ')}
         |        for i in range(0, len(tk) - 1)]) AS r FROM tk)
         |  UNION ALL SELECT doc_id, r['p'], r['g'] FROM (
         |    SELECT doc_id, unnest([{'p': i,
         |        'g': array_to_string(tk[i+1:i+3], ' ')}
         |        for i in range(0, len(tk) - 2)]) AS r FROM tk)),
         |bl(phrase) AS (VALUES ('merge sort'), ('batch batch batch'),
         |  ('spark join stream'))
         |SELECT doc_id, bl.phrase, CAST(count(*) AS BIGINT) AS n_hits,
         |  CAST(min(pos) AS BIGINT) AS first_pos
         |FROM g JOIN bl ON g.gram = bl.phrase GROUP BY 1, 2""".stripMargin,

    // The tree replayed with 16 unrolled halving levels (valid to
    // 2^16 leaves; sf0.01 has 500 — 9 real levels, the rest pass the
    // root through unchanged, the same 1-node rule as odd tails).
    "q368_merkle_root" -> {
      def lvl(k: Int): String =
        s"""t$k AS (SELECT r // 2 AS r, CASE WHEN count(*) = 2
           |  THEN md5(arg_min(h, r) || arg_max(h, r))
           |  ELSE arg_min(h, r) END AS h FROM t${k - 1} GROUP BY 1)"""
          .stripMargin
      s"""WITH l0 AS (SELECT md5(CAST(doc_id AS VARCHAR) || chr(1)
         |    || text || chr(1) || lang || chr(1) || source || chr(1)
         |    || CAST(n_chars AS VARCHAR)) AS h FROM documents),
         |t0 AS (SELECT h, row_number() OVER (ORDER BY h) - 1 AS r
         |  FROM l0),
         |${(1 to 16).map(lvl).mkString(",\n")},
         |nl AS (SELECT CAST(count(*) AS BIGINT) AS n_leaves FROM l0)
         |SELECT nl.n_leaves,
         |  CAST(CASE WHEN nl.n_leaves <= 1 THEN 0 ELSE
         |    ceil(log2(CAST(nl.n_leaves AS DOUBLE))) END AS BIGINT)
         |    AS levels,
         |  (SELECT h FROM t16 WHERE r = 0) AS root
         |FROM nl""".stripMargin
    },

    // The path replayed: target rank chains through the same 16
    // unrolled levels, sibling = the other member of the rank pair,
    // acc folds by side; emit only the real levels.
    "q369_merkle_proof" -> {
      def lvl(k: Int): String =
        s"""t$k AS (SELECT r // 2 AS r, CASE WHEN count(*) = 2
           |  THEN md5(arg_min(h, r) || arg_max(h, r))
           |  ELSE arg_min(h, r) END AS h FROM t${k - 1} GROUP BY 1)"""
          .stripMargin
      def stp(k: Int): String =
        s"""s$k AS (SELECT CAST($k AS BIGINT) AS level,
           |    CAST(tg.r % 2 AS BIGINT) AS side, sib.h AS sibling,
           |    CASE WHEN sib.h IS NULL THEN tg.acc
           |      WHEN tg.r % 2 = 0 THEN md5(tg.acc || sib.h)
           |      ELSE md5(sib.h || tg.acc) END AS acc,
           |    tg.r // 2 AS r
           |  FROM s${k - 1} tg LEFT JOIN t${k - 1} sib
           |    ON sib.r // 2 = tg.r // 2 AND sib.r <> tg.r)"""
          .stripMargin
      s"""WITH l0 AS (SELECT md5(CAST(doc_id AS VARCHAR) || chr(1)
         |    || text || chr(1) || lang || chr(1) || source || chr(1)
         |    || CAST(n_chars AS VARCHAR)) AS h FROM documents),
         |t0 AS (SELECT h, row_number() OVER (ORDER BY h) - 1 AS r
         |  FROM l0),
         |${(1 to 16).map(lvl).mkString(",\n")},
         |nl AS (SELECT CAST(count(*) AS BIGINT) AS n FROM l0),
         |lv AS (SELECT CAST(CASE WHEN nl.n <= 1 THEN 0 ELSE
         |    ceil(log2(CAST(nl.n AS DOUBLE))) END AS BIGINT) AS levels
         |  FROM nl),
         |th AS (SELECT md5(CAST(doc_id AS VARCHAR) || chr(1) || text
         |    || chr(1) || lang || chr(1) || source || chr(1)
         |    || CAST(n_chars AS VARCHAR)) AS h
         |  FROM documents WHERE doc_id = 42),
         |s0 AS (SELECT min(t0.r) AS r, th.h AS acc FROM t0, th
         |  WHERE t0.h = th.h GROUP BY th.h),
         |${(1 to 16).map(stp).mkString(",\n")},
         |rt AS (SELECT h AS root FROM t16 WHERE r = 0)
         |SELECT u.level, u.side, u.sibling, u.acc, rt.root
         |FROM (${(1 to 16).map(k =>
                s"SELECT level, side, sibling, acc FROM s$k")
                .mkString(" UNION ALL ")}) u, rt, lv
         |WHERE u.level <= lv.levels""".stripMargin
    },

    // Fixture arithmetic: batches 1/3 publish their clean rows,
    // batch 2 (ids ≡ 1 mod 3, which contains every id ≡ 1 mod 30)
    // discards whole.
    "q370_wap_stream" ->
      """WITH p AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 3 = 0 AND doc_id % 10 <> 1),
        |q AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 3 = 2 AND doc_id % 10 <> 1)
        |SELECT p.c + q.c AS published_rows,
        |  CAST(0 AS BIGINT) AS published_bad,
        |  CAST(2 AS BIGINT) AS versions,
        |  CAST(0 AS BIGINT) AS staged_left
        |FROM p, q""".stripMargin,

    // The three-version lifecycle replayed as arithmetic: slice
    // counts per version, tag on v2, latest on v3, one dir each.
    "q371_describe_history" ->
      """WITH c1 AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 3 = 0),
        |c2 AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 3 <= 1),
        |c3 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents)
        |SELECT CAST(1 AS BIGINT) AS version, CAST(1 AS INT) AS n_dirs,
        |  c1.c AS n_rows, '' AS tags, FALSE AS is_latest FROM c1
        |UNION ALL SELECT CAST(2 AS BIGINT), CAST(1 AS INT), c2.c,
        |  'audited', FALSE FROM c2
        |UNION ALL SELECT CAST(3 AS BIGINT), CAST(1 AS INT), c3.c,
        |  '', TRUE FROM c3""".stripMargin,

    // Retention is pure fixture arithmetic: v1 alone crosses the 7-day
    // fence unpinned; the tag saves v2, latest saves v3, and the
    // surviving history (with v2 still readable) is exactly q371's
    // tail two rows.
    "q376_retention_expire" ->
      """WITH c2 AS (SELECT CAST(count(*) AS BIGINT) AS c
        |    FROM documents WHERE doc_id % 3 <= 1),
        |c3 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents)
        |SELECT CAST(2 AS BIGINT) AS version, c2.c AS n_rows,
        |  'audited' AS tags, FALSE AS is_latest,
        |  '1' AS dropped_versions, c2.c AS v2_readable_rows FROM c2
        |UNION ALL SELECT CAST(3 AS BIGINT), c3.c, '', TRUE, '1', c2.c
        |FROM c3, c2""".stripMargin,

    // Rollback is pure fixture arithmetic: v3 re-references v1's
    // files, so the restored sum is the plain scan sum while v2 (the
    // doubled commit) still time-travels to exactly 2×.
    "q378_rollback" ->
      """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS c FROM documents)
        |SELECT CAST(3 AS BIGINT) AS restored_version, s.n AS n_rows,
        |  s.c AS restored_chars, s.c AS v1_chars,
        |  s.c * 2 AS v2_chars FROM s""".stripMargin,

    // The oracle runs DuckDB's OWN nfc_normalize over the same
    // composed/decomposed twins — two independent Unicode
    // implementations must agree on every rewrite and every
    // fingerprint group.
    "q377_unicode_nfc_dedup" ->
      """WITH a AS (SELECT doc_id,
        |    text || ' caf' || chr(233) || ' na' || chr(239) || 've'
        |      AS text FROM documents
        |  UNION ALL SELECT doc_id + 1000000000,
        |    text || ' cafe' || chr(769) || ' nai' || chr(776) || 've'
        |  FROM documents),
        |s AS (SELECT doc_id, text, nfc_normalize(text) AS nfc FROM a),
        |rg AS (SELECT CAST(count(*) AS BIGINT) AS c FROM
        |  (SELECT md5(text) FROM s GROUP BY 1 HAVING count(*) >= 2)),
        |ng AS (SELECT CAST(count(*) AS BIGINT) AS c FROM
        |  (SELECT md5(nfc) FROM s GROUP BY 1 HAVING count(*) >= 2))
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (nfc <> text) AS BIGINT)
        |    AS docs_rewritten,
        |  rg.c AS raw_dup_groups, ng.c AS nfc_dup_groups
        |FROM s, rg, ng GROUP BY rg.c, ng.c""".stripMargin,

    // INDEPENDENT verification of the rewrite: the engine cuts the
    // interval union of SA max-neighbor-LCP spans; the oracle removes
    // every token inside some duplicated 8-gram (brute counts) and
    // re-hashes the kept tokens in order — identical clean_fp only if
    // the two formulations coincide everywhere (they are provably
    // equal; see SuffixArray.exciseDuplicateSpans).
    "q372_excise_spans" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk
         |  FROM documents WHERE doc_id % 3 = 0),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS s,
         |    array_to_string(tk[i:i+7], ' ') AS gram
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
         |    FROM tk)),
         |dupg AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 2),
         |cov AS (SELECT DISTINCT g.doc_id, g.s + CAST(o.o AS BIGINT) AS p
         |  FROM g JOIN dupg USING (gram),
         |    (SELECT unnest(range(0, 8)) AS o) o),
         |et AS (SELECT doc_id, CAST(generate_subscripts(tk, 1) AS BIGINT)
         |    AS p, unnest(tk) AS tok FROM tk),
         |kept AS (SELECT et.doc_id, et.p, et.tok FROM et
         |  LEFT JOIN cov ON cov.doc_id = et.doc_id AND cov.p = et.p
         |  WHERE cov.p IS NULL),
         |fp AS (SELECT doc_id,
         |    md5(coalesce(string_agg(tok, ' ' ORDER BY p), ''))
         |      AS clean_fp
         |  FROM kept GROUP BY 1),
         |rm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
         |  FROM cov GROUP BY 1)
         |SELECT tk.doc_id, CAST(len(tk.tk) AS BIGINT) AS n_tokens,
         |  coalesce(rm.n_removed, 0) AS n_removed,
         |  coalesce(fp.clean_fp, md5('')) AS clean_fp
         |FROM tk LEFT JOIN rm ON rm.doc_id = tk.doc_id
         |LEFT JOIN fp ON fp.doc_id = tk.doc_id""".stripMargin,

    // The q360 nearest-train-neighbor replay over train ∪ increment:
    // the oracle knows nothing about the index/probe split — it
    // rebuilds the FULL combined suffix array, so the gate is exactly
    // the claim "increment-probe ≡ full rebuild at the ≥ 8 threshold".
    "q373_decontaminate_increment" ->
      s"""WITH ${saCteSqlFrom(
             """SELECT doc_id, text FROM documents WHERE doc_id % 6 = 0
               |    UNION ALL SELECT doc_id + 1000000000 AS doc_id,
               |      text || ' zz9 qq8' AS text
               |    FROM documents WHERE doc_id % 60 = 0""".stripMargin)},
         |${saCrossMatchCtes("doc_id < 1000000000")}
         |SELECT ag.doc_id, CAST(len(tk.tk) AS BIGINT) AS n_tokens,
         |  ag.longest_train_match, ag.contaminated_starts
         |FROM ag JOIN tk ON tk.doc_id = ag.doc_id
         |WHERE ag.longest_train_match >= 8
         |ORDER BY ag.longest_train_match DESC, ag.doc_id
         |LIMIT 50""".stripMargin,

    // The same rounded-cosine rank order (ties by neighbor id), the
    // same exact integer moments; zero-degree vectors re-enter via
    // the left join.
    "q395_hubness" -> {
      val cos = cosSql("q.embedding", "c.embedding")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE vec_id % 2 = 0),
         |tk AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round($cos, 6) DESC, c.vec_id) AS rnk
         |  FROM e q JOIN e c ON q.vec_id <> c.vec_id)
         |  WHERE rnk <= 5),
         |ind AS (SELECT e.vec_id,
         |    CAST(coalesce(d.d, 0) AS BIGINT) AS d
         |  FROM e LEFT JOIN (SELECT neighbor_id, count(*) AS d
         |    FROM tk GROUP BY 1) d ON d.neighbor_id = e.vec_id)
         |SELECT CAST(count(*) AS BIGINT) AS n, CAST(5 AS BIGINT) AS k,
         |  CAST(max(d) AS BIGINT) AS max_in_degree,
         |  CAST(count(*) FILTER (d = 0) AS BIGINT) AS n_antihubs,
         |  CAST(sum(d) AS BIGINT) AS sum_d,
         |  CAST(sum(d * d) AS BIGINT) AS sum_d2,
         |  CAST(sum(d * d * d) AS BIGINT) AS sum_d3
         |FROM ind""".stripMargin
    },

    // The NB chain's confusion feeds the same one-division F1s and
    // the floored macro mean.
    // The same md5 ±1 sign matrix, exact integer projections, the
    // same 6dp→decimal→micro cosine snap in both spaces.
    "q401_random_projection" ->
      s"""WITH v AS (SELECT vec_id AS id, embedding FROM embeddings
         |  WHERE vec_id % 10 = 0),
         |x AS (SELECT id, generate_subscripts(embedding, 1) - 1 AS d,
         |    unnest(list_transform(embedding,
         |      e -> CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT)))
         |      AS xv FROM v),
         |jj AS (SELECT unnest([j for j in range(0, 16)]) AS j),
         |sg AS (SELECT dd.d, jj.j,
         |    CASE WHEN CAST('0x' || substr(md5('rp:' || dd.d || ':'
         |        || jj.j), 1, 15) AS BIGINT) % 2 = 0
         |      THEN 1 ELSE -1 END AS s
         |  FROM (SELECT DISTINCT d FROM x) dd CROSS JOIN jj),
         |y AS (SELECT x.id, sg.j, CAST(sum(x.xv * sg.s) AS BIGINT) AS yv
         |  FROM x JOIN sg USING (d) GROUP BY 1, 2),
         |n2 AS (SELECT id, CAST(sum(yv * yv) AS BIGINT) AS nn
         |  FROM y GROUP BY 1),
         |pd AS (SELECT a.id AS id_a, b.id AS id_b,
         |    CAST(sum(a.yv * b.yv) AS BIGINT) AS dot
         |  FROM y a JOIN y b ON a.j = b.j AND a.id < b.id GROUP BY 1, 2),
         |pc AS (SELECT pd.id_a, pd.id_b,
         |    CAST(round(CAST(round(CAST(pd.dot AS DOUBLE)
         |      / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))),
         |      6) AS DECIMAL(20,10)) * 1000000) AS BIGINT)
         |      AS cos_proj_micro
         |  FROM pd JOIN n2 na ON na.id = pd.id_a
         |    JOIN n2 nb ON nb.id = pd.id_b),
         |oc AS (SELECT a.id AS id_a, b.id AS id_b,
         |    CAST(round(CAST(round(
         |      ${cosSql("a.embedding", "b.embedding")}, 6)
         |      AS DECIMAL(20,10)) * 1000000) AS BIGINT) AS cos_orig_micro
         |  FROM v a JOIN v b ON a.id < b.id)
         |SELECT oc.id_a, oc.id_b, oc.cos_orig_micro, pc.cos_proj_micro,
         |  abs(oc.cos_orig_micro - pc.cos_proj_micro) AS err_micro
         |FROM oc JOIN pc ON oc.id_a = pc.id_a AND oc.id_b = pc.id_b"""
        .stripMargin,

    // Same planted pair construction, the same add-1/add-2 smoothed
    // m/u counts, per-term ln snaps, integer score sums and bands.
    "q402_fellegi_sunter" -> {
      def snp(n: String, d: String): String =
        s"CAST(round(ln(CAST($n AS DOUBLE) / CAST($d AS DOUBLE)) " +
          s"* 1e6) AS BIGINT)"
      def w(f: String): String =
        s"""CASE WHEN ag_$f
           |  THEN ${snp(s"am_$f + 1", "nm + 2")} - ${snp(s"au_$f + 1", "nu + 2")}
           |  ELSE ${snp(s"nm - am_$f + 1", "nm + 2")} - ${snp(s"nu - au_$f + 1", "nu + 2")}
           |END""".stripMargin
      s"""WITH a AS (SELECT doc_id AS id_a, lang AS la, source AS sa,
         |    n_chars AS ca FROM documents),
         |mp AS (SELECT id_a, id_a + 1000000000 AS id_b, true AS y,
         |    la = (CASE WHEN id_a % 5 = 0 THEN 'xx' ELSE la END)
         |      AS ag_lang,
         |    true AS ag_src, abs(-8) <= 10 AS ag_len
         |  FROM a),
         |np AS (SELECT a.id_a, b.doc_id AS id_b, false AS y,
         |    a.la = b.lang AS ag_lang, a.sa = b.source AS ag_src,
         |    abs(a.ca - b.n_chars) <= 10 AS ag_len
         |  FROM a JOIN documents b ON b.doc_id = a.id_a + 1),
         |p AS (SELECT * FROM mp UNION ALL SELECT * FROM np),
         |st AS (SELECT
         |    count(*) FILTER (y) AS nm, count(*) FILTER (NOT y) AS nu,
         |    count(*) FILTER (y AND ag_lang) AS am_lang,
         |    count(*) FILTER (NOT y AND ag_lang) AS au_lang,
         |    count(*) FILTER (y AND ag_src) AS am_src,
         |    count(*) FILTER (NOT y AND ag_src) AS au_src,
         |    count(*) FILTER (y AND ag_len) AS am_len,
         |    count(*) FILTER (NOT y AND ag_len) AS au_len FROM p),
         |sc AS (SELECT p.id_a, p.id_b, p.y,
         |    (${w("lang")}) + (${w("src")}) + (${w("len")})
         |      AS score_micro
         |  FROM p, st)
         |SELECT id_a, id_b, y, score_micro,
         |  CASE WHEN score_micro >= 3000000 THEN 'match'
         |    WHEN score_micro <= -1000000 THEN 'nonmatch'
         |    ELSE 'possible' END AS band
         |FROM sc""".stripMargin
    },

    // Brute-force k-NN on each side, micro-snapped sims, truncating
    // `//` means and margin (the engine divides double-then-casts —
    // the documented `//` parity).
    "q403_bitext_margin" ->
      s"""WITH l AS (SELECT vec_id AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |r AS (SELECT vec_id AS id, embedding AS vec
         |  FROM embeddings WHERE vec_id % 2 = 1),
         |lr AS (SELECT l.id AS ql, r.id AS nr,
         |    round(${cosSql("l.vec", "r.vec")}, 6) AS sim
         |  FROM l CROSS JOIN r),
         |lrk AS (SELECT *, row_number() OVER (PARTITION BY ql
         |    ORDER BY sim DESC, nr) AS rk FROM lr),
         |rl AS (SELECT r.id AS qr, l.id AS nl,
         |    round(${cosSql("r.vec", "l.vec")}, 6) AS sim
         |  FROM r CROSS JOIN l),
         |rlk AS (SELECT *, row_number() OVER (PARTITION BY qr
         |    ORDER BY sim DESC, nl) AS rk FROM rl),
         |ml AS (SELECT ql AS id_l,
         |    CAST(sum(CAST(round(CAST(sim AS DECIMAL(20,10)) * 1000000)
         |      AS BIGINT)) // count(*) AS BIGINT) AS ml
         |  FROM lrk WHERE rk <= 4 GROUP BY 1),
         |mr AS (SELECT qr AS id_r,
         |    CAST(sum(CAST(round(CAST(sim AS DECIMAL(20,10)) * 1000000)
         |      AS BIGINT)) // count(*) AS BIGINT) AS mr
         |  FROM rlk WHERE rk <= 4 GROUP BY 1),
         |best AS (SELECT ql AS id_l, nr AS id_r,
         |    CAST(round(CAST(sim AS DECIMAL(20,10)) * 1000000) AS BIGINT)
         |      AS cos_micro
         |  FROM lrk WHERE rk = 1)
         |SELECT b.id_l, b.id_r, b.cos_micro,
         |  CAST((b.cos_micro * 2000000) // (ml.ml + mr.mr) AS BIGINT)
         |    AS margin_micro
         |FROM best b JOIN ml ON ml.id_l = b.id_l
         |  JOIN mr ON mr.id_r = b.id_r""".stripMargin,

    // The q38 tokenizers (whitespace + BPE-ish regex), byte lengths,
    // two floored micro ratios.
    "q404_token_fertility" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nw) AS BIGINT) AS total_words,
         |  CAST(sum(nb) AS BIGINT) AS total_bpe,
         |  CAST(sum(nby) AS BIGINT) AS total_bytes,
         |  CAST((CAST(sum(nb) AS HUGEINT) * 1000000) // sum(nw)
         |    AS BIGINT) AS fertility_micro,
         |  CAST((CAST(sum(nby) AS HUGEINT) * 1000000) // sum(nb)
         |    AS BIGINT) AS bytes_per_token_micro
         |FROM (SELECT lang, len($tokSql) AS nw,
         |    len(regexp_extract_all(lower(text),
         |      '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS nb,
         |    strlen(text) AS nby FROM documents)
         |GROUP BY 1""".stripMargin,

    // Per-language bigram model (the q138 chain keyed by lang), the
    // same per-term ln snap and floored mean, rank/band arithmetic in
    // plain window functions.
    "q398_ccnet_buckets" ->
      s"""WITH tk AS (SELECT doc_id, lang, $tokSql AS tk FROM documents),
         |bg AS (SELECT doc_id, lang, r['a'] AS a, r['b'] AS b FROM (
         |  SELECT doc_id, lang, unnest([{'a': tk[i + 1], 'b': tk[i + 2]}
         |      for i in range(0, len(tk) - 1)]) AS r FROM tk)),
         |cb AS (SELECT lang, a, b, count(*) AS cab FROM bg
         |  GROUP BY 1, 2, 3),
         |ca AS (SELECT lang, a, count(*) AS ca FROM bg GROUP BY 1, 2),
         |v AS (SELECT lang, count(DISTINCT w) AS v FROM
         |  (SELECT lang, unnest(tk) AS w FROM tk) GROUP BY 1),
         |d AS (SELECT bg.doc_id, bg.lang,
         |    CAST(sum(CAST(round(-ln(CAST(cab + 1 AS DOUBLE)
         |        / CAST(ca + v AS DOUBLE)) * 1e6) AS BIGINT))
         |      // count(*) AS BIGINT) AS nll_micro
         |  FROM bg JOIN cb USING (lang, a, b) JOIN ca USING (lang, a)
         |    JOIN v USING (lang)
         |  GROUP BY 1, 2),
         |r AS (SELECT lang, nll_micro,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY nll_micro, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY lang) AS nl FROM d)
         |SELECT lang, CAST(((rn - 1) * 3) // nl AS INT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  min(nll_micro) AS nll_min_micro,
         |  max(nll_micro) AS nll_max_micro
         |FROM r GROUP BY 1, 2""".stripMargin,

    // The same planted tails, every rule the same cross-multiplied
    // integer comparison over the same token/line counts.
    "q399_gopher_rules" ->
      s"""WITH d AS (SELECT doc_id, text
         |    || CASE WHEN doc_id % 13 = 0 THEN chr(10) || '- buy one'
         |        || chr(10) || '- buy two' || chr(10) || 'plain tail...'
         |      ELSE '' END
         |    || CASE WHEN doc_id % 17 = 0 THEN ' ## ... ## end'
         |      ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0
         |      THEN ' be to of and that have with' ELSE '' END AS text
         |  FROM documents),
         |x AS (SELECT doc_id, text AS t, $tokSql AS tk,
         |    string_split(text, chr(10)) AS ls FROM d),
         |y AS (SELECT doc_id,
         |    CAST(len(tk) AS BIGINT) AS nw,
         |    CAST(coalesce(list_sum(list_transform(tk, s -> len(s))), 0)
         |      AS BIGINT) AS sum_len,
         |    CAST(len(t) - len(replace(t, '#', ''))
         |      + (len(t) - len(replace(t, '...', ''))) // 3
         |      AS BIGINT) AS symbols,
         |    CAST(len(list_filter(ls,
         |      s -> regexp_matches(ltrim(s), '^[-*•]'))) AS BIGINT)
         |      AS bullets,
         |    CAST(len(ls) AS BIGINT) AS nl,
         |    CAST(len(list_filter(ls,
         |      s -> regexp_matches(rtrim(s), '\\.\\.\\.$$'))) AS BIGINT)
         |      AS ell,
         |    CAST(len(list_filter(tk,
         |      s -> regexp_matches(s, '[a-z]'))) AS BIGINT) AS alpha_words,
         |    CAST(len(list_intersect(list_distinct(tk),
         |      ['the','be','to','of','and','that','have','with']))
         |      AS BIGINT) AS stop_hits
         |  FROM x)
         |SELECT doc_id AS id, nw AS n_words,
         |  nw >= 50 AND nw <= 100000 AS r_word_count,
         |  3 * nw <= sum_len AND sum_len <= 10 * nw AS r_mean_word_len,
         |  10 * symbols <= nw AS r_symbol_ratio,
         |  10 * bullets <= nl AS r_bullet_lines,
         |  10 * ell <= 3 * nl AS r_ellipsis_lines,
         |  5 * alpha_words >= 4 * nw AS r_alpha_words,
         |  stop_hits >= 2 AS r_stopwords,
         |  (nw >= 50 AND nw <= 100000)
         |    AND (3 * nw <= sum_len AND sum_len <= 10 * nw)
         |    AND 10 * symbols <= nw AND 10 * bullets <= nl
         |    AND 10 * ell <= 3 * nl AND 5 * alpha_words >= 4 * nw
         |    AND stop_hits >= 2 AS pass
         |FROM y""".stripMargin,

    // The storage flags are pinned by the engine (zero-rewrite,
    // unknown count, materialization); content arithmetic replays as
    // a plain DELETE.
    "q400_delete_vectors" ->
      """SELECT CAST(2 AS BIGINT) AS dv_version, true AS zero_rewrite,
        |  true AS count_unknown, true AS materialized,
        |  (SELECT count(*) FROM documents) AS v1_rows,
        |  count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents WHERE lang <> 'de'""".stripMargin,

    // Same hashed unigram∪bigram buckets (60-bit md5 mod 4096), the
    // same per-term ln snap, exact integer doc weights, the same
    // (w desc, id) top-100.
    "q397_dsir_select" ->
      s"""WITH d AS (SELECT doc_id, lang = 'en' AS is_target,
         |    $tokSql AS tk FROM documents),
         |f0 AS (SELECT doc_id, is_target, unnest(tk) AS f FROM d
         |  UNION ALL
         |  SELECT doc_id, is_target,
         |    unnest([tk[i + 1] || ' ' || tk[i + 2]
         |      for i in range(0, len(tk) - 1)]) AS f FROM d),
         |fb AS (SELECT doc_id, is_target,
         |    CAST('0x' || substr(md5(f), 1, 15) AS BIGINT) % 4096 AS b
         |  FROM f0),
         |c AS (SELECT b, count(*) FILTER (is_target) AS ct,
         |    count(*) FILTER (NOT is_target) AS cr FROM fb GROUP BY 1),
         |tt AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM c),
         |lam AS (SELECT b,
         |    CAST(round(ln(CAST(ct + 1 AS DOUBLE)
         |      / CAST(nt + 4096 AS DOUBLE)) * 1e6) AS BIGINT)
         |    - CAST(round(ln(CAST(cr + 1 AS DOUBLE)
         |      / CAST(nr + 4096 AS DOUBLE)) * 1e6) AS BIGINT) AS lam
         |  FROM c CROSS JOIN tt),
         |w AS (SELECT fb.doc_id, count(*) AS n_feats,
         |    sum(lam.lam) AS w FROM fb JOIN lam USING (b) GROUP BY 1),
         |aw AS (SELECT d.doc_id AS id, d.is_target,
         |    CAST(coalesce(w.n_feats, 0) AS BIGINT) AS n_feats,
         |    CAST(coalesce(w.w, 0) AS BIGINT) AS w_micro
         |  FROM d LEFT JOIN w ON d.doc_id = w.doc_id),
         |top AS (SELECT id FROM aw WHERE NOT is_target
         |  ORDER BY w_micro DESC, id LIMIT 100)
         |SELECT a.id, a.is_target, a.n_feats, a.w_micro,
         |  a.id IN (SELECT id FROM top) AS selected
         |FROM aw a""".stripMargin,

    "q396_macro_f1" ->
      s"""WITH $naiveBayesCtes,
         |cf AS (SELECT y, pred, CAST(count(*) AS BIGINT) AS n
         |  FROM pr GROUP BY 1, 2),
         |sup AS (SELECT y AS cls, CAST(sum(n) AS BIGINT) AS support
         |  FROM cf GROUP BY 1),
         |pp AS (SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS predicted
         |  FROM cf GROUP BY 1),
         |tp AS (SELECT y AS cls, CAST(n AS BIGINT) AS tp FROM cf
         |  WHERE y = pred),
         |per AS (SELECT sup.cls, sup.support,
         |    coalesce(tp.tp, 0) AS tp,
         |    coalesce(pp.predicted, 0) - coalesce(tp.tp, 0) AS fp,
         |    sup.support - coalesce(tp.tp, 0) AS fn
         |  FROM sup LEFT JOIN tp USING (cls) LEFT JOIN pp USING (cls)),
         |f AS (SELECT *, CAST((CAST(tp AS HUGEINT) * 2000000)
         |    // (tp * 2 + fp + fn) AS BIGINT) AS f1_micro FROM per),
         |m AS (SELECT CAST(sum(f1_micro) // count(*) AS BIGINT)
         |    AS macro_f1_micro FROM f)
         |SELECT f.cls, f.support, f.tp, f.fp, f.fn, f.f1_micro,
         |  m.macro_f1_micro
         |FROM f, m""".stripMargin,

    // Components by recursive closure (the q67 convention), sizes per
    // component, the same floored giant share.
    "q394_dup_graph_health" ->
      s"""WITH RECURSIVE
         |u0 AS (SELECT * FROM ($docsDupSql)
         |  WHERE (doc_id % 1000000000) % 5 = 0),
         |u AS (SELECT * FROM u0
         |  UNION ALL SELECT doc_id + 2000000000, text || ' qq7 vv6'
         |  FROM u0 WHERE doc_id < 1000000000 AND doc_id % 25 = 0),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM u),
         |sh AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[])
         |    ELSE $shingleSql END AS sh FROM tk),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |      round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
         |        4) AS jac
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |  WHERE jac >= 0.5),
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |comp AS (
         |  SELECT v.s AS doc_id, least(v.s, mn.mn) AS c
         |  FROM (SELECT DISTINCT s FROM edges) v
         |  JOIN (SELECT s, min(d) AS mn FROM reach GROUP BY 1) mn
         |    USING (s)),
         |sz AS (SELECT c, CAST(count(*) AS BIGINT) AS size
         |  FROM comp GROUP BY 1),
         |g AS (SELECT max(size) AS giant FROM sz),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u)
         |SELECT sz.size, CAST(count(*) AS BIGINT) AS n_components,
         |  g.giant AS giant_size,
         |  CAST((CAST(g.giant AS HUGEINT) * 1000000) // nn.n AS BIGINT)
         |    AS giant_share_micro
         |FROM sz, g, nn GROUP BY sz.size, g.giant, nn.n""".stripMargin,

    // Training + scoring + binning via the shared chain, then the
    // same exact gap sums and floored divisions.
    "q392_calibration_ece" ->
      s"""WITH $logisticGdCtes,
         |m4 AS (SELECT x.id, sum(CAST(x.xi AS HUGEINT) * w3.w) AS m12
         |  FROM x JOIN w3 USING (dim) GROUP BY 1),
         |p4 AS (SELECT id, CAST(round(1e6 / (1 + exp(
         |    -(CAST(m12 AS DOUBLE) / 1e12)))) AS BIGINT) AS pmu
         |  FROM m4),
         |b AS (SELECT least((p4.pmu * 1000) // 1000000, 999) AS bin,
         |    p4.pmu, y.ymu
         |  FROM p4 JOIN y USING (id)),
         |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |    abs(CAST(count(*) FILTER (ymu = 1000000) AS HUGEINT)
         |      * 1000000 - sum(pmu)) AS gap12
         |  FROM b GROUP BY 1)
         |SELECT CAST(sum(n) AS BIGINT) AS n,
         |  CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(gap12) // sum(n) AS BIGINT) AS ece_micro,
         |  CAST(max(gap12 // n) AS BIGINT) AS max_bin_gap_micro
         |FROM g""".stripMargin,

    // Pure fixture arithmetic over the three planted schemas.
    "q393_schema_history" ->
      """SELECT CAST(1 AS BIGINT) AS version, CAST(2 AS INT) AS n_cols,
        |  'doc_id,n_chars' AS added_cols, '' AS removed_cols
        |UNION ALL SELECT 2, 3, 'lang', ''
        |UNION ALL SELECT 3, 2, '', 'n_chars'""".stripMargin,

    // Every value is fixture arithmetic: the clone re-references the
    // source's bytes (zero_copy pinned engine-side by manifest-dir
    // equality) and the divergence doubles exactly.
    "q390_shallow_clone" ->
      """SELECT CAST(1 AS BIGINT) AS clone_version, TRUE AS zero_copy,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS src_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS clone_v1_chars,
        |  CAST(sum(n_chars) AS BIGINT) * 2 AS clone_v2_chars
        |FROM documents""".stripMargin,

    // Segment starts, stopword-family ratios, the same tie rules, the
    // same (count desc, lang) mode — replayed per 16-token window.
    "q391_lang_consistency" -> {
      val de = "' der die das und ein der die das und ein" +
        " der die das und ein'"
      s"""WITH t0 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0
         |    THEN text || $de ELSE text END AS text FROM documents),
         |t2 AS (SELECT doc_id, $tokSql AS tk FROM t0),
         |sg AS (SELECT doc_id, tk,
         |    unnest(range(1, len(tk) + 1, 16)) AS st
         |  FROM t2 WHERE len(tk) > 0),
         |seg AS (SELECT doc_id, tk[CAST(st AS INT):CAST(st + 15 AS INT)]
         |    AS s FROM sg),
         |sc AS (SELECT doc_id,
         |    len(list_filter(s, t -> t IN ('the','a','of','to','and')))
         |      * 1.0 / len(s) AS s_en,
         |    len(list_filter(s, t -> t IN ('der','die','das','und','ein')))
         |      * 1.0 / len(s) AS s_de,
         |    len(list_filter(s, t -> t IN ('el','la','de','y','que')))
         |      * 1.0 / len(s) AS s_es,
         |    len(list_filter(s, t -> t IN ('le','la','de','et','les')))
         |      * 1.0 / len(s) AS s_fr
         |  FROM seg),
         |lg AS (SELECT doc_id,
         |    CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |      WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |      WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |      WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |      ELSE 'fr' END AS lang
         |  FROM sc),
         |cnt AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS c
         |  FROM lg GROUP BY 1, 2),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY c DESC, lang) AS rn FROM cnt)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_segments,
         |  max(CASE WHEN rn = 1 THEN lang END) AS dominant_lang,
         |  CAST(max(CASE WHEN rn = 1 THEN c END) AS BIGINT)
         |    AS dominant_segments,
         |  CAST(count(*) AS BIGINT) AS distinct_langs
         |FROM rk GROUP BY 1""".stripMargin
    },

    // Gramian + power steps + the per-dim subtraction with the same
    // truncating integer divisions; invariants roll up per label.
    "q387_remove_top_component" ->
      s"""WITH ${powerIterCtes(4)},
         |x3 AS (SELECT label, vec_id,
         |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
         |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000)
         |      AS BIGINT) AS x3 FROM embeddings),
         |pv AS (SELECT label, vec_id, sum(x3.x3 * v4.vm) AS pn
         |  FROM x3 JOIN v4 ON v4.dim = x3.dim GROUP BY 1, 2),
         |pq AS (SELECT label, vec_id, pn // 1000000 AS p FROM pv),
         |rr AS (SELECT x3.label, x3.vec_id, pq.p,
         |    x3.x3 - (pq.p * v4.vm) // 1000000 AS r, v4.vm
         |  FROM x3 JOIN v4 ON v4.dim = x3.dim
         |  JOIN pq ON pq.vec_id = x3.vec_id),
         |pv2 AS (SELECT label, vec_id, any_value(p) AS p,
         |    sum(r * vm) AS rdv, sum(r * r) AS ren
         |  FROM rr GROUP BY 1, 2)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(rdv) AS BIGINT) AS r_dot_v_sum,
         |  CAST(sum(ren) AS BIGINT) AS r_energy_sum,
         |  CAST(min(p) AS BIGINT) AS p_min,
         |  CAST(max(p) AS BIGINT) AS p_max
         |FROM pv2 GROUP BY 1""".stripMargin,

    // Same hash cuts, 1-based-inclusive list slices, byte-identical
    // PSM render.
    "q388_fim_split" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |b AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':a'),
         |      1, 15) AS BIGINT) % (len(tk) + 1) AS c1,
         |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':b'),
         |      1, 15) AS BIGINT) % (len(tk) + 1) AS c2
         |  FROM tk),
         |s AS (SELECT doc_id, tk, n,
         |    CAST(least(c1, c2) AS BIGINT) AS lo,
         |    CAST(greatest(c1, c2) AS BIGINT) AS hi FROM b)
         |SELECT doc_id, n AS n_tokens, lo, hi,
         |  md5('<PRE> '
         |    || coalesce(array_to_string(tk[1:CAST(lo AS INT)], ' '), '')
         |    || ' <SUF> '
         |    || coalesce(array_to_string(
         |      tk[CAST(hi + 1 AS INT):CAST(n AS INT)], ' '), '')
         |    || ' <MID> '
         |    || coalesce(array_to_string(
         |      tk[CAST(lo + 1 AS INT):CAST(hi AS INT)], ' '), ''))
         |    AS psm_fp
         |FROM s""".stripMargin,

    // Losses, the snapped exp factors, and the floor +
    // largest-remainder normalization replayed with // truncation.
    "q389_eg_reweight" ->
      s"""WITH tk AS (SELECT source, CAST(len($tokSql) AS BIGINT) AS n
         |  FROM documents),
         |ls AS (SELECT source, CAST((sum(n) * 1000000) // count(*)
         |    AS BIGINT) AS loss_micro FROM tk GROUP BY 1),
         |mn AS (SELECT CAST(sum(loss_micro) // count(*) AS BIGINT)
         |    AS m FROM ls),
         |fz AS (SELECT source, loss_micro,
         |    CAST(round(1e6 * exp(CAST((loss_micro - mn.m) * 100000
         |      AS DOUBLE) / 1e12)) AS BIGINT) AS factor_micro
         |  FROM ls, mn),
         |dn AS (SELECT CAST(sum(factor_micro) AS BIGINT) AS den FROM fz),
         |pb AS (SELECT source, loss_micro, factor_micro,
         |    CAST((CAST(factor_micro AS HUGEINT) * 1000000) // dn.den
         |      AS BIGINT) AS w_base,
         |    CAST((CAST(factor_micro AS HUGEINT) * 1000000) % dn.den
         |      AS BIGINT) AS rem FROM fz, dn),
         |df AS (SELECT CAST(1000000 - sum(w_base) AS BIGINT)
         |    AS deficit FROM pb),
         |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source)
         |    AS rnk FROM pb)
         |SELECT source, loss_micro, factor_micro,
         |  w_base + CASE WHEN rnk <= df.deficit THEN 1 ELSE 0 END
         |    AS weight_micro
         |FROM rk, df""".stripMargin,

    // The identical resample universe: md5(rep:j) mod n draws, exact
    // floored means, the same order-statistic indexes.
    "q386_bootstrap_ci" -> {
      val (bb, loIdx, hiIdx) = (200L, (250L * 199) / 10000,
        (9750L * 199) / 10000)
      s"""WITH tk AS (SELECT doc_id, CAST(len($tokSql) AS BIGINT) AS v
         |  FROM documents),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk),
         |rk AS (SELECT v, row_number() OVER (ORDER BY doc_id) - 1
         |    AS idx FROM tk),
         |dr AS (SELECT CAST(r.range AS BIGINT) AS rep,
         |    CAST('0x' || substr(md5(CAST(r.range AS VARCHAR) || ':' ||
         |      CAST(rk.idx AS VARCHAR)), 1, 15) AS BIGINT) % nn.n
         |      AS idx
         |  FROM range($bb) r CROSS JOIN rk, nn),
         |mm AS (SELECT dr.rep,
         |    CAST((CAST(sum(rv.v) AS HUGEINT) * 1000000) // nn.n
         |      AS BIGINT) AS m
         |  FROM dr JOIN rk rv ON rv.idx = dr.idx, nn
         |  GROUP BY dr.rep, nn.n),
         |o AS (SELECT m, row_number() OVER (ORDER BY m) - 1 AS r
         |  FROM mm),
         |ci AS (SELECT max(CASE WHEN r = $loIdx THEN m END)
         |    AS ci_lo_micro,
         |  max(CASE WHEN r = $hiIdx THEN m END) AS ci_hi_micro FROM o),
         |pt AS (SELECT CAST((CAST(sum(v) AS HUGEINT) * 1000000) // nn.n
         |    AS BIGINT) AS mean_micro FROM tk, nn GROUP BY nn.n)
         |SELECT nn.n, CAST($bb AS BIGINT) AS b, pt.mean_micro,
         |  ci.ci_lo_micro, ci.ci_hi_micro
         |FROM nn, pt, ci""".stripMargin
    },

    // Training + scoring via the shared chain, then the same
    // fixed-point kappa with // truncation on the signed step.
    "q385_cohen_kappa" ->
      s"""WITH $logisticGdCtes,
         |m4 AS (SELECT x.id, sum(CAST(x.xi AS HUGEINT) * w3.w) AS m12
         |  FROM x JOIN w3 USING (dim) GROUP BY 1),
         |p4 AS (SELECT id, CAST(round(1e6 / (1 + exp(
         |    -(CAST(m12 AS DOUBLE) / 1e12)))) AS BIGINT) AS pmu
         |  FROM m4),
         |r AS (SELECT (y.ymu = 1000000) AS a, (p4.pmu >= 282000) AS b
         |  FROM p4 JOIN y USING (id)),
         |cts AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(*) FILTER (a) AS BIGINT) AS a_yes,
         |    CAST(count(*) FILTER (b) AS BIGINT) AS b_yes,
         |    CAST(count(*) FILTER (a = b) AS BIGINT) AS agree
         |  FROM r),
         |p AS (SELECT *,
         |    CAST((CAST(agree AS HUGEINT) * 1000000) // n AS BIGINT)
         |      AS po_micro,
         |    CAST((CAST(a_yes AS HUGEINT) * b_yes * 1000000
         |      + CAST(n - a_yes AS HUGEINT) * (n - b_yes) * 1000000)
         |      // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_micro
         |  FROM cts)
         |SELECT n, a_yes, b_yes, agree, po_micro, pe_micro,
         |  CASE WHEN pe_micro = 1000000 THEN NULL
         |    ELSE CAST((CAST(po_micro - pe_micro AS HUGEINT) * 1000000)
         |      // (1000000 - pe_micro) AS BIGINT) END AS kappa_micro
         |FROM p""".stripMargin,

    // DuckDB replays the chain with its OWN Unicode machinery
    // (nfc_normalize + RE2 with explicit \x classes — \s differs
    // between Java and RE2 on vertical tab, so neither side uses it).
    "q384_canonical_dedup" ->
      """WITH a AS (SELECT doc_id,
        |    ' ' || text || ' Caf' || chr(233) || ' X' AS text
        |  FROM documents
        |  UNION ALL SELECT doc_id + 1000000000,
        |    ' ' || chr(8203) || text || '  cafe' || chr(769) || '  x'
        |  FROM documents),
        |st AS (SELECT doc_id, text, nfc_normalize(text) AS s1 FROM a),
        |s2t AS (SELECT *, regexp_replace(s1,
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}]', '', 'g')
        |    AS s2 FROM st),
        |s3t AS (SELECT *, trim(regexp_replace(s2,
        |    '[ \t\n\r\f]+', ' ', 'g')) AS s3 FROM s2t),
        |c AS (SELECT *, lower(s3) AS canon FROM s3t),
        |rg AS (SELECT CAST(count(*) AS BIGINT) AS c FROM
        |  (SELECT md5(text) FROM c GROUP BY 1 HAVING count(*) >= 2)),
        |cg AS (SELECT CAST(count(*) AS BIGINT) AS c FROM
        |  (SELECT md5(canon) FROM c GROUP BY 1 HAVING count(*) >= 2))
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (s1 <> text) AS BIGINT) AS changed_nfc,
        |  CAST(count(*) FILTER (s2 <> s1) AS BIGINT)
        |    AS changed_invisible,
        |  CAST(count(*) FILTER (s3 <> s2) AS BIGINT) AS changed_ws,
        |  rg.c AS raw_dup_groups, cg.c AS canonical_dup_groups
        |FROM c, rg, cg GROUP BY rg.c, cg.c""".stripMargin,

    // Same floors on HUGEINT (all quantities nonnegative, so // ≡ the
    // engine's pmod floor), same full-outer weight join.
    "q381_mixture_plan" ->
      s"""WITH tk AS (SELECT source, CAST(len($tokSql) AS BIGINT) AS n
         |  FROM documents),
         |av AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n) AS BIGINT) AS avail FROM tk GROUP BY 1),
         |w(wsource, wm) AS (VALUES ('src1', 500000), ('src3', 300000),
         |  ('src5', 150000), ('synthetic_src', 50000)),
         |j AS (SELECT coalesce(av.source, w.wsource) AS source,
         |    coalesce(n_docs, 0) AS n_docs,
         |    coalesce(avail, 0) AS avail,
         |    CAST(coalesce(wm, 0) AS BIGINT) AS weight_micro
         |  FROM av FULL OUTER JOIN w ON av.source = w.wsource),
         |tt AS (SELECT *, CAST((CAST(777777 AS HUGEINT) * weight_micro)
         |    // 1000000 AS BIGINT) AS target FROM j),
         |e AS (SELECT *, CASE WHEN avail > 0 AND target > 0
         |    THEN (target + avail - 1) // avail ELSE 0 END AS epochs
         |  FROM tt),
         |r AS (SELECT *, CASE WHEN epochs > 0
         |    THEN CAST((CAST(target AS HUGEINT) * 1000000)
         |      // (CAST(avail AS HUGEINT) * epochs) AS BIGINT)
         |    ELSE 0 END AS rate FROM e)
         |SELECT source, n_docs, avail AS available_tokens,
         |  weight_micro, target AS target_tokens,
         |  CAST(epochs AS BIGINT) AS repeat_epochs,
         |  rate AS sample_rate_micro,
         |  CAST((CAST(rate AS HUGEINT) * avail * epochs) // 1000000
         |    AS BIGINT) AS planned_tokens,
         |  target - CAST((CAST(rate AS HUGEINT) * avail * epochs)
         |    // 1000000 AS BIGINT) AS shortfall
         |FROM r""".stripMargin,

    // Four power steps replayed exactly: HUGEINT matrix-vector
    // products, floor shifts, the same correctly-rounded
    // sqrt/divide/round chain per step.
    "q382_top_eigenvector" ->
      s"""WITH ${powerIterCtes(4)}
         |SELECT CAST(dim AS INT) AS dim, vm AS v_micro FROM v4""".stripMargin,

    // Same chain + the projection masses: p = (Σ x₃·vm) // 1e6 per
    // vector (floor ≡ the engine's pmod identity), exact integer
    // energy sums per label.
    "q383_top_component_mass" ->
      s"""WITH ${powerIterCtes(4)},
         |x3 AS (SELECT label, vec_id,
         |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
         |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000)
         |      AS BIGINT) AS x3 FROM embeddings),
         |pv AS (SELECT label, vec_id, sum(x3.x3 * v4.vm) AS pn,
         |    sum(x3.x3 * x3.x3) AS tot
         |  FROM x3 JOIN v4 ON v4.dim = x3.dim GROUP BY 1, 2),
         |pf AS (SELECT label, pn // 1000000 AS p, tot FROM pv)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(p * p) AS BIGINT) AS explained_mass,
         |  CAST(sum(tot) AS BIGINT) AS total_mass
         |FROM pf GROUP BY 1""".stripMargin,

    // The streaming face replays identically: the oracle rebuilds the
    // FULL combined SA over train ∪ every batch's increments; the
    // batch id is arithmetic on the planted id lanes.
    "q380_decontamination_stream" ->
      s"""WITH ${saCteSqlFrom(
             """SELECT doc_id, text FROM documents WHERE doc_id % 24 = 0
               |    UNION ALL SELECT doc_id + 1000000000 AS doc_id,
               |      text || ' zz9 qq8' AS text
               |    FROM documents WHERE doc_id % 120 = 0""".stripMargin)},
         |${saCrossMatchCtes("doc_id < 1000000000")}
         |SELECT ag.doc_id, CAST(len(tk.tk) AS BIGINT) AS n_tokens,
         |  ag.longest_train_match, ag.contaminated_starts,
         |  CAST(((ag.doc_id - 1000000000) % 240) // 120 AS BIGINT)
         |    AS ingest_batch
         |FROM ag JOIN tk ON tk.doc_id = ag.doc_id
         |WHERE ag.longest_train_match >= 8""".stripMargin,

    // The decoded-pixel features recomputed from the construction
    // arithmetic — a decode that misreads any scanline, filter byte,
    // or channel order hash-fails; n_bytes is an encoder detail and
    // not compared.
    "q374_png_decode" ->
      """WITH s AS (SELECT doc_id,
        |    list_transform(range(1, 26), i ->
        |      ((unicode(substr(text, CAST(i AS INT), 1)) * 11) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 5) % 256)
        |      + ((unicode(substr(text, CAST(i AS INT), 1)) * 2) % 256))
        |      AS ch,
        |    (unicode(substr(text, 1, 1)) * 11) % 256 AS r0
        |  FROM documents)
        |SELECT doc_id, CAST(list_sum(ch) AS BIGINT) AS checksum,
        |  CAST(r0 AS INT) AS first_byte
        |FROM s""".stripMargin,

    // The q175 unrolled learning chain drives an APPLICATION pass the
    // engine never sees: the oracle re-fuses the four learned pairs
    // into an (original word, framed) table, counts symbols per word,
    // rolls up per doc, and replays q363's window-cumsum packing —
    // identical sequences only if learn, apply, and pack all agree.
    "q375_bpe_apply_pack" ->
      s"""WITH wc AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest($tokSql) AS tok FROM documents)
         |  WHERE regexp_matches(tok, '^[a-z0-9]+${"$"}')
         |  GROUP BY 1),
         |w0 AS (SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS w, cnt
         |  FROM wc),
         |${bpeIterSql("w0", "w1")},
         |${bpeIterSql("w1", "w2")},
         |${bpeIterSql("w2", "w3")},
         |${bpeIterSql("w3", "w4")},
         |ap0 AS (SELECT w AS ow,
         |    regexp_replace(w, '(.)', '(\\1)', 'g') AS fw FROM wc),
         |${(1 to 4).map(k =>
              s"""ap$k AS (SELECT ow, replace(fw,
                 |    '(' || w${k}b.a || ')(' || w${k}b.b || ')',
                 |    '(' || w${k}b.a || w${k}b.b || ')') AS fw
                 |  FROM ap${k - 1} CROSS JOIN w${k}b)""".stripMargin)
            .mkString(",\n")},
         |sym AS (SELECT ow, CAST(len(string_split(fw[2:-2], ')('))
         |    AS BIGINT) AS ns FROM ap4),
         |et AS (SELECT doc_id, unnest($tokSql) AS tok FROM documents),
         |dn AS (SELECT doc_id, CAST(sum(ns) AS BIGINT) AS n
         |  FROM et JOIN sym ON sym.ow = et.tok GROUP BY 1),
         |o AS (SELECT doc_id, n,
         |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS off FROM dn),
         |l AS (SELECT doc_id, n, off, off // 512 AS s,
         |    (off + n - 1) // 512 AS e FROM o WHERE n > 0),
         |tt AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM dn),
         |tc AS (SELECT doc_id, s AS start_seq,
         |    unnest(range(s, e + 1)) AS seq_id FROM l)
         |SELECT CAST(seq_id AS BIGINT) AS seq_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (start_seq = seq_id) AS BIGINT)
         |    AS n_docs_starting,
         |  CAST(min(doc_id) AS BIGINT) AS first_doc,
         |  CAST(least(512, tt.total - seq_id * 512) AS BIGINT)
         |    AS tokens_filled
         |FROM tc, tt GROUP BY seq_id, tt.total""".stripMargin,

    // Both counts are the plain scan truth.
    "q350_manifest_count" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_manifest,
        |  CAST(count(*) AS BIGINT) AS n_scanned,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM documents""".stripMargin,

    // Same per-n corpus gram totals and one double ratio each.
    "q341_distinct_ngrams" -> {
      def nSql(n: Int): String = {
        val g = if (n == 1) "tk"
        else s"""CASE WHEN len(tk) >= $n
                |  THEN [array_to_string(tk[i:i+${n - 1}], ' ')
                |    for i in range(1, len(tk) - ${n - 2})]
                |  ELSE CAST([] AS VARCHAR[]) END""".stripMargin
        s"""SELECT CAST($n AS INT) AS n,
           |  CAST(count(*) AS BIGINT) AS total,
           |  CAST(count(DISTINCT g) AS BIGINT) AS "distinct",
           |  CASE WHEN count(*) = 0 THEN NULL ELSE
           |    CAST(round(CAST(CAST(count(DISTINCT g) AS DOUBLE)
           |      / CAST(count(*) AS DOUBLE) AS DECIMAL(20,10)), 6)
           |      AS DOUBLE) END AS distinct_ratio
           |FROM (SELECT unnest($g) AS g
           |  FROM (SELECT $tokSql AS tk FROM documents))""".stripMargin
      }
      s"""${nSql(1)}
         |UNION ALL ${nSql(2)}
         |UNION ALL ${nSql(3)}
         |UNION ALL ${nSql(4)}""".stripMargin
    },

    // Both writers' key-disjoint updates apply unconditionally — the
    // committed state is commit-order-independent by construction.
    "q327_merge_contention" ->
      s"""WITH uniq AS (SELECT symbol, d, px, vol FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, d
         |      ORDER BY ord DESC, px DESC, vol DESC) AS rn
         |    FROM ($barsSql) WHERE symbol % 64 = 2) WHERE rn = 1),
         |f AS (SELECT symbol, d,
         |    CASE WHEN symbol % 128 = 2 THEN px * 2
         |      WHEN symbol % 128 = 66 THEN px * 3 ELSE px END AS px,
         |    CASE WHEN symbol % 128 = 2 OR symbol % 128 = 66
         |      THEN 1 ELSE 0 END AS version
         |  FROM uniq)
         |SELECT strftime(d, '%Y') AS m,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  round(sum(px), 2) AS px_sum,
         |  CAST(sum(version) AS BIGINT) AS version_sum
         |FROM f GROUP BY 1""".stripMargin,

    // Same grouped running-below ranks and exact integer numerator.
    "q316_gini_activity" ->
      """WITH pu AS (SELECT event_type, user_id,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |bv AS (SELECT event_type, x, CAST(count(*) AS BIGINT) AS cnt
        |  FROM pu GROUP BY 1, 2),
        |rk AS (SELECT event_type, x, cnt,
        |    CAST(coalesce(sum(cnt) OVER (PARTITION BY event_type
        |      ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      1 PRECEDING), 0) AS BIGINT) AS cnt_below FROM bv),
        |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n,
        |    CAST(sum(x * cnt) AS BIGINT) AS sx FROM bv GROUP BY 1)
        |SELECT r.event_type, n AS n_users, sx AS n_events,
        |  CAST(round(CAST(
        |    CAST(sum(x * cnt * (2 * cnt_below + cnt - n)) AS DOUBLE)
        |    / CAST(n * sx AS DOUBLE) AS DECIMAL(20,10)), 6)
        |    AS DOUBLE) AS gini
        |FROM rk r JOIN tot t USING (event_type)
        |GROUP BY 1, 2, 3""".stripMargin,

    // Same ×1e9 p·ln(p) snaps per distinct value and exact mass
    // ratios inside the ln.
    "q317_theil_decomposition" ->
      """WITH d AS (SELECT source, n_chars AS x FROM documents
        |  WHERE n_chars >= 1),
        |bsv AS (SELECT source, x, CAST(count(*) AS BIGINT) AS cnt
        |  FROM d GROUP BY 1, 2),
        |grp AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS ng,
        |    CAST(sum(x * cnt) AS BIGINT) AS sg FROM bsv GROUP BY 1),
        |gl AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
        |    CAST(sum(sg) AS BIGINT) AS ss FROM grp),
        |wi AS (SELECT b.source, g.ng, g.sg,
        |    CAST(sum(CAST(round(
        |      (CAST(b.x * g.ng AS DOUBLE) / g.sg)
        |      * ln(CAST(b.x * g.ng AS DOUBLE) / g.sg) * 1e9)
        |      AS BIGINT) * b.cnt) AS BIGINT) AS t9
        |  FROM bsv b JOIN grp g USING (source) GROUP BY 1, 2, 3)
        |SELECT source, ng AS n_docs,
        |  CAST(round(CAST(CAST(sg AS DOUBLE) / ss
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS mass_share,
        |  CAST(round(CAST(CAST(t9 AS DOUBLE) / 1e9 / ng
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS t_within,
        |  CAST(round(CAST((CAST(sg AS DOUBLE) / ss)
        |    * ln(CAST(sg * nn AS DOUBLE) / CAST(ss * ng AS DOUBLE))
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS between_term
        |FROM wi CROSS JOIN gl""".stripMargin,

    // Same ×1e9 frequency snaps, exact HUGEINT variances, one sqrt
    // per token, same 20-closest ordering.
    "q318_burrows_delta" ->
      s"""WITH st AS (SELECT source, unnest($tokSql) AS tok
         |  FROM documents),
         |cnts AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM st GROUP BY 1, 2),
         |stot AS (SELECT source, CAST(count(*) AS BIGINT) AS tt
         |  FROM st GROUP BY 1),
         |top AS (SELECT tok FROM (SELECT tok,
         |    CAST(sum(c) AS BIGINT) AS gc FROM cnts GROUP BY 1)
         |  ORDER BY gc DESC, tok LIMIT 30),
         |dense AS (SELECT s.source, t.tok,
         |    CAST(round(CAST(coalesce(c.c, 0) AS DOUBLE) / s.tt * 1e9)
         |      AS BIGINT) AS f9
         |  FROM stot s CROSS JOIN top t
         |  LEFT JOIN cnts c ON c.source = s.source AND c.tok = t.tok),
         |vt AS (SELECT tok, CAST(count(*) AS BIGINT) AS k,
         |    CAST(count(*) AS HUGEINT)
         |      * sum(CAST(f9 AS HUGEINT) * f9)
         |      - sum(CAST(f9 AS HUGEINT)) * sum(CAST(f9 AS HUGEINT))
         |      AS v
         |  FROM dense GROUP BY 1),
         |df AS (SELECT a.source AS source_a, b.source AS source_b,
         |    a.tok, abs(a.f9 - b.f9) AS adf
         |  FROM dense a JOIN dense b
         |    ON a.tok = b.tok AND a.source < b.source),
         |tm AS (SELECT source_a, source_b,
         |    CASE WHEN v = 0 THEN 0 ELSE
         |      CAST(round(CAST(adf AS DOUBLE) * CAST(k AS DOUBLE)
         |        / sqrt(CAST(v AS DOUBLE)) * 1e6) AS BIGINT) END
         |      AS t6
         |  FROM df JOIN vt USING (tok))
         |SELECT source_a, source_b,
         |  CAST(round(CAST(CAST(sum(t6) AS DOUBLE) / 1e6 / count(*)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS delta
         |FROM tm GROUP BY 1, 2
         |ORDER BY 3, 1, 2 LIMIT 20""".stripMargin,

    // Same per-unit disagreeing-pair counts and exact integer alpha.
    "q310_krippendorff" ->
      """WITH codes AS (
        |  SELECT doc_id AS unit, lang AS code FROM documents
        |  UNION ALL SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END
        |  FROM documents
        |  UNION ALL SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END
        |  FROM documents),
        |nuc AS (SELECT unit, code, CAST(count(*) AS BIGINT) AS m
        |  FROM codes GROUP BY 1, 2),
        |du AS (SELECT CAST(sum(d2) AS BIGINT) AS d2,
        |    CAST(count(*) AS BIGINT) AS nu FROM
        |  (SELECT unit, 6 - sum(m * (m - 1)) AS d2
        |   FROM nuc GROUP BY 1)),
        |marg AS (SELECT CAST(sum(nc) AS BIGINT) AS ntot,
        |    CAST(sum(nc * nc) AS BIGINT) AS nc2 FROM
        |  (SELECT code, sum(m) AS nc FROM nuc GROUP BY 1))
        |SELECT nu AS n_units, ntot AS n_codings,
        |  CAST(round(CAST(1.0 - CAST((ntot - 1) * d2 AS DOUBLE)
        |    / (2 * (ntot * ntot - nc2)) AS DECIMAL(20,10)), 6)
        |    AS DOUBLE) AS alpha
        |FROM du CROSS JOIN marg""".stripMargin,

    // q306's sessionize chain; journeys cut at the first purchase,
    // then the same 8 ×1e9-snapped value-iteration steps with each
    // channel's inbound edges removed.
    "q311_removal_effect" -> {
      def stepSql(prev: String, tag: String): String =
        s"""$tag AS (SELECT i.rm, i.st, i.pc9,
           |  i.pc9 + coalesce(s.sc, 0) AS v9
           |  FROM init i LEFT JOIN (
           |    SELECT v.rm, e.from_s AS st,
           |      CAST(sum(CAST(round(e.pd * v.v9) AS BIGINT))
           |        AS BIGINT) AS sc
           |    FROM edges e JOIN $prev v
           |      ON v.st = e.to_s AND e.to_s <> v.rm
           |    GROUP BY 1, 2) s ON s.rm = i.rm AND s.st = i.st)"""
          .stripMargin
      s"""WITH m AS (SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
         |        > 1800 * 1000000 THEN 1
         |      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
         |      ELSE 0 END AS new_s
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sx AS (SELECT user_id, ts, event_id, event_type,
         |    sum(new_s) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS session_id
         |  FROM m),
         |fp AS (SELECT user_id, session_id, ts AS fts,
         |    event_id AS fid FROM
         |  (SELECT *, row_number() OVER (PARTITION BY user_id,
         |      session_id ORDER BY ts, event_id) AS rn
         |   FROM sx WHERE event_type = 'purchase') WHERE rn = 1),
         |tch AS (SELECT s.user_id, s.session_id, s.ts, s.event_id,
         |    s.event_type, fp.fts IS NOT NULL AS conv
         |  FROM sx s LEFT JOIN fp USING (user_id, session_id)
         |  WHERE s.event_type <> 'purchase'
         |    AND (fp.fts IS NULL OR s.ts < fp.fts
         |      OR (s.ts = fp.fts AND s.event_id < fp.fid))),
         |sq AS (SELECT user_id, session_id, event_type, conv,
         |    row_number() OVER wt AS rn, lead(event_type) OVER wt
         |      AS nxt
         |  FROM tch WINDOW wt AS (PARTITION BY user_id, session_id
         |    ORDER BY ts, event_id)),
         |tr AS (SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS n
         |  FROM (
         |    SELECT event_type AS from_s, coalesce(nxt, CASE WHEN conv
         |      THEN 'CONV' ELSE 'DROP' END) AS to_s FROM sq
         |    UNION ALL SELECT 'START', event_type FROM sq WHERE rn = 1
         |    UNION ALL SELECT 'START', 'CONV' FROM fp
         |    WHERE NOT EXISTS (SELECT 1 FROM tch t
         |      WHERE t.user_id = fp.user_id
         |        AND t.session_id = fp.session_id))
         |  GROUP BY 1, 2),
         |rt AS (SELECT from_s, CAST(sum(n) AS BIGINT) AS rt
         |  FROM tr GROUP BY 1),
         |pc AS (SELECT r.from_s AS st,
         |    CAST(round(CAST(coalesce(c.n, 0) AS DOUBLE) / r.rt * 1e9)
         |      AS BIGINT) AS pc9
         |  FROM rt r LEFT JOIN (SELECT from_s, n FROM tr
         |    WHERE to_s = 'CONV') c USING (from_s)),
         |edges AS (SELECT t.from_s, t.to_s,
         |    CAST(t.n AS DOUBLE) / r.rt AS pd
         |  FROM tr t JOIN rt r USING (from_s)
         |  WHERE t.to_s NOT IN ('CONV', 'DROP')),
         |rms AS (SELECT DISTINCT rm FROM (
         |  SELECT from_s AS rm FROM tr WHERE from_s <> 'START'
         |  UNION ALL SELECT to_s FROM tr
         |    WHERE to_s NOT IN ('CONV', 'DROP')
         |  UNION ALL SELECT '__none')),
         |init AS (SELECT rm, st, pc9 FROM rms CROSS JOIN pc),
         |v1 AS (SELECT rm, st, pc9, pc9 AS v9 FROM init),
         |${stepSql("v1", "v2")},
         |${stepSql("v2", "v3")},
         |${stepSql("v3", "v4")},
         |${stepSql("v4", "v5")},
         |${stepSql("v5", "v6")},
         |${stepSql("v6", "v7")},
         |${stepSql("v7", "v8")},
         |pst AS (SELECT rm, v9 AS p9 FROM v8 WHERE st = 'START'),
         |base AS (SELECT p9 AS b9 FROM pst WHERE rm = '__none'),
         |re AS (SELECT rm AS channel, greatest(0, b9 - p9) AS re9, b9
         |  FROM pst CROSS JOIN base WHERE rm <> '__none'),
         |tt AS (SELECT CAST(sum(re9) AS BIGINT) AS ret FROM re)
         |SELECT channel,
         |  CASE WHEN b9 = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(re9 AS DOUBLE) / b9
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS removal_effect,
         |  CASE WHEN ret = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(re9 AS DOUBLE) / ret
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) END
         |    AS attribution_share
         |FROM re CROSS JOIN tt""".stripMargin
    },

    // Same exact centered HUGEINT moments and Cramer solve.
    "q312_multi_ols" ->
      """WITH r AS (SELECT
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS y,
        |    CAST(p_size AS BIGINT) AS a,
        |    CAST(length(p_name) AS BIGINT) AS b FROM part),
        |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    sum(CAST(a AS HUGEINT)) AS sa,
        |    sum(CAST(b AS HUGEINT)) AS sb,
        |    sum(CAST(y AS HUGEINT)) AS sy,
        |    sum(CAST(a AS HUGEINT) * a) AS saa,
        |    sum(CAST(a AS HUGEINT) * b) AS sab,
        |    sum(CAST(b AS HUGEINT) * b) AS sbb,
        |    sum(CAST(a AS HUGEINT) * y) AS say,
        |    sum(CAST(b AS HUGEINT) * y) AS sby,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM r),
        |c AS (SELECT n, sa, sb, sy,
        |    n * saa - sa * sa AS caa, n * sab - sa * sb AS cab,
        |    n * sbb - sb * sb AS cbb, n * say - sa * sy AS cay,
        |    n * sby - sb * sy AS cby, n * syy - sy * sy AS cyy
        |  FROM g),
        |s AS (SELECT n, sa, sb, sy, cay, cby, cyy,
        |    caa * cbb - cab * cab AS det,
        |    CAST(cay * cbb - cby * cab AS DOUBLE)
        |      / CAST(caa * cbb - cab * cab AS DOUBLE) AS ba,
        |    CAST(cby * caa - cay * cab AS DOUBLE)
        |      / CAST(caa * cbb - cab * cab AS DOUBLE) AS bb
        |  FROM c)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN det = 0 THEN NULL ELSE
        |    CAST(round(CAST(ba / 100.0 AS DECIMAL(20,10)), 6) AS DOUBLE)
        |    END AS beta_size,
        |  CASE WHEN det = 0 THEN NULL ELSE
        |    CAST(round(CAST(bb / 100.0 AS DECIMAL(20,10)), 6) AS DOUBLE)
        |    END AS beta_namelen,
        |  CASE WHEN det = 0 THEN NULL ELSE
        |    CAST(round(CAST((CAST(sy AS DOUBLE) - ba * CAST(sa AS DOUBLE)
        |      - bb * CAST(sb AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS intercept,
        |  CASE WHEN det = 0 OR cyy = 0 THEN NULL ELSE
        |    CAST(round(CAST((ba * CAST(cay AS DOUBLE)
        |      + bb * CAST(cby AS DOUBLE)) / CAST(cyy AS DOUBLE)
        |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS r2
        |FROM s""".stripMargin,

    // Same ×1e6 idf snaps and directional mass ratio.
    "q305_vocab_containment" ->
      s"""WITH st AS (SELECT DISTINCT source, tok FROM
         |  (SELECT source, unnest(list_distinct($tokSql)) AS tok
         |   FROM documents)),
         |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM
         |  (SELECT DISTINCT doc_id, tok FROM
         |    (SELECT doc_id, unnest(list_distinct($tokSql)) AS tok
         |     FROM documents)) GROUP BY 1),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents),
         |w AS (SELECT tok, CAST(round(ln(CAST(n_docs AS DOUBLE) / df)
         |    * 1e6) AS BIGINT) AS wm
         |  FROM dfq CROSS JOIN nd),
         |sw AS (SELECT st.source, st.tok, w.wm
         |  FROM st JOIN w USING (tok)),
         |tot AS (SELECT source, CAST(sum(wm) AS BIGINT) AS tw
         |  FROM sw GROUP BY 1),
         |inter AS (SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(sum(a.wm) AS BIGINT) AS iw
         |  FROM sw a JOIN sw b ON a.tok = b.tok
         |    AND a.source <> b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b,
         |  CAST(round(CAST(CAST(iw AS DOUBLE) / tw AS DECIMAL(20,10)),
         |    4) AS DOUBLE) AS containment
         |FROM inter JOIN tot ON tot.source = inter.source_a
         |ORDER BY 3 DESC, 1, 2 LIMIT 30""".stripMargin,

    // q132's transition chain + three unrolled ×1e9-snapped power
    // steps from the uniform start.
    "q306_markov_stationary" -> {
      def stepSql(prev: String, tag: String): String =
        s"""$tag AS (SELECT c.to_type AS s,
           |  CAST(sum(CAST(round($prev.pi
           |    * (CAST(c.n AS DOUBLE) / rt.rt) * 1e9) AS BIGINT))
           |    AS DOUBLE) / 1e9 AS pi
           |  FROM ctr c JOIN rt ON rt.from_type = c.from_type
           |  JOIN $prev ON $prev.s = c.from_type GROUP BY 1)""".stripMargin
      s"""WITH m AS (SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
         |        > 1800 * 1000000 THEN 1
         |      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
         |      ELSE 0 END AS new_s
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sx AS (SELECT user_id, ts, event_id, event_type,
         |    sum(new_s) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS session_id
         |  FROM m),
         |pr AS (SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id, session_id
         |      ORDER BY ts, event_id) AS to_type
         |  FROM sx),
         |ctr AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT)
         |    AS n
         |  FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS rt
         |  FROM ctr GROUP BY 1),
         |stt AS (SELECT from_type AS s FROM rt),
         |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM stt),
         |p0 AS (SELECT s, CAST(1.0 AS DOUBLE) / k AS pi
         |  FROM stt CROSS JOIN kk),
         |${stepSql("p0", "p1")},
         |${stepSql("p1", "p2")},
         |${stepSql("p2", "p3")}
         |SELECT s AS state,
         |  CAST(round(CAST(pi AS DECIMAL(20,10)), 6) AS DOUBLE) AS pi
         |FROM p3""".stripMargin
    },

    // Same exact µs lag algebra and inclusive-rank band rule.
    "q303_funnel_latency_bands" ->
      """WITH fv AS (SELECT user_id, min(ts) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |lg AS (SELECT e.user_id,
        |    CAST(min(epoch_us(e.ts) - epoch_us(fv.tv)) AS BIGINT)
        |      AS lag_us
        |  FROM events e JOIN fv ON fv.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= fv.tv
        |  GROUP BY 1),
        |byv AS (SELECT lag_us AS v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lg GROUP BY 1),
        |rk AS (SELECT v, cnt, CAST(coalesce(sum(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cnt_below FROM byv),
        |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM byv)
        |SELECT n AS n_users,
        |  CAST(round(CAST(CAST(min(CASE WHEN (cnt_below + cnt) * 100
        |      >= n * 25 THEN v END) AS DOUBLE) / 1e6
        |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS p25_s,
        |  CAST(round(CAST(CAST(min(CASE WHEN (cnt_below + cnt) * 100
        |      >= n * 50 THEN v END) AS DOUBLE) / 1e6
        |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS p50_s,
        |  CAST(round(CAST(CAST(min(CASE WHEN (cnt_below + cnt) * 100
        |      >= n * 75 THEN v END) AS DOUBLE) / 1e6
        |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS p75_s
        |FROM rk CROSS JOIN nn GROUP BY n""".stripMargin,

    // Same distinct directed edges against their transpose.
    "q304_reciprocity" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
        |e0 AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
        |  FROM docs CROSS JOIN nc
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |m AS (SELECT a.src, a.dst FROM e a
        |  JOIN e b ON a.src = b.dst AND a.dst = b.src)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_mutual,
        |  CAST(round(CAST(
        |    CAST((SELECT count(*) FROM m) AS DOUBLE)
        |    / (SELECT count(*) FROM e) AS DECIMAL(20,10)), 4)
        |    AS DOUBLE) AS reciprocity""".stripMargin,

    // Same exact inclusive-rank band rule (the oracle may sort each
    // day globally), same cent→dollar snap.
    "q301_daily_bands" ->
      """WITH byv AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT d, v, cnt,
        |    CAST(coalesce(sum(cnt) OVER (PARTITION BY d ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cnt_below
        |  FROM byv),
        |nn AS (SELECT d, CAST(sum(cnt) AS BIGINT) AS n
        |  FROM byv GROUP BY 1)
        |SELECT rk.d, n AS n_events,
        |  CAST(round(CAST(CAST(min(CASE WHEN (cnt_below + cnt) * 100
        |      >= n * 10 THEN v END) AS DOUBLE) / 100.0
        |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS p10,
        |  CAST(round(CAST(CAST(min(CASE WHEN (cnt_below + cnt) * 100
        |      >= n * 50 THEN v END) AS DOUBLE) / 100.0
        |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS p50,
        |  CAST(round(CAST(CAST(min(CASE WHEN (cnt_below + cnt) * 100
        |      >= n * 90 THEN v END) AS DOUBLE) / 100.0
        |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS p90
        |FROM rk JOIN nn ON nn.d = rk.d GROUP BY rk.d, n""".stripMargin,

    // Same cells, same k = 20 release rule with null-suppressed
    // values.
    "q302_suppressed_heatmap" ->
      """WITH cell AS (SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS h,
        |    CAST(count(*) AS BIGINT) AS ner,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS nur
        |  FROM events GROUP BY 1, 2)
        |SELECT CAST(dow AS INT) AS dow, CAST(h AS INT) AS h,
        |  nur >= 20 AS released,
        |  CASE WHEN nur >= 20 THEN ner END AS n_events,
        |  CASE WHEN nur >= 20 THEN nur END AS n_users
        |FROM cell""".stripMargin,

    // Same exact integer numerator, same snapped χ² and 3.84 gate.
    "q299_srm_check" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_c
        |  FROM events GROUP BY 1),
        |z AS (SELECT d, n_t, n_c,
        |    CAST(round(CAST(
        |      CAST((CAST(n_t AS HUGEINT) - n_c)
        |        * (CAST(n_t AS HUGEINT) - n_c) AS DOUBLE)
        |      / (n_t + n_c) AS DECIMAL(20,10)), 4) AS DOUBLE) AS chi2
        |  FROM daily)
        |SELECT d, n_t, n_c, chi2, chi2 > 3.84 AS srm_alarm
        |FROM z""".stripMargin,

    // Same single-pass flags and pair masses, list_filter ≡ the
    // engine's bound filter.
    "q300_gate_overlap" ->
      s"""WITH tk AS (SELECT n_chars, $tokSql AS tk FROM documents),
         |fl AS (SELECT n_chars < 250 AS gs,
         |    len(list_distinct(tk)) * 3 < len(tk) AS gr,
         |    len(list_filter(tk, t -> t IN ('the', 'of', 'and'))) * 5
         |      >= len(tk) AS gb
         |  FROM tk),
         |a AS (SELECT
         |    CAST(sum(CASE WHEN gs THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ns,
         |    CAST(sum(CASE WHEN gr THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nr,
         |    CAST(sum(CASE WHEN gb THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nb,
         |    CAST(sum(CASE WHEN gs AND gr THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nsr,
         |    CAST(sum(CASE WHEN gs AND gb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nsb,
         |    CAST(sum(CASE WHEN gr AND gb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nrb
         |  FROM fl),
         |m AS (
         |  SELECT 'g_block' AS gate_a, 'g_repeat' AS gate_b,
         |    nb AS n_a, nr AS n_b, nrb AS n_both FROM a
         |  UNION ALL SELECT 'g_block', 'g_short', nb, ns, nsb FROM a
         |  UNION ALL SELECT 'g_repeat', 'g_short', nr, ns, nsr FROM a)
         |SELECT gate_a, gate_b, n_a, n_b, n_both,
         |  CASE WHEN n_a + n_b - n_both = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n_both AS DOUBLE)
         |      / (n_a + n_b - n_both) AS DECIMAL(20,10)), 4)
         |      AS DOUBLE) END AS jaccard
         |FROM m""".stripMargin,

    // Same mirrored corpus and keep-min rule, same share tables.
    "q298_dedup_bias" ->
      """WITH corpus AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL SELECT doc_id + 3000000000, 'mirror1', text
        |    FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id + 4000000000, 'mirror2', text
        |    FROM documents WHERE doc_id % 7 = 0),
        |f0 AS (SELECT doc_id, source,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |      AS fp FROM corpus),
        |keep AS (SELECT fp, CAST(min(doc_id) AS BIGINT) AS keep_id
        |  FROM f0 GROUP BY 1),
        |bfr AS (SELECT source, CAST(count(*) AS BIGINT) AS n_before
        |  FROM f0 GROUP BY 1),
        |aft AS (SELECT source, CAST(count(*) AS BIGINT) AS n_after
        |  FROM f0 JOIN keep ON keep.fp = f0.fp
        |    AND keep.keep_id = f0.doc_id
        |  GROUP BY 1),
        |tt AS (SELECT (SELECT CAST(sum(n_before) AS BIGINT) FROM bfr)
        |    AS tb,
        |  (SELECT CAST(sum(n_after) AS BIGINT) FROM aft) AS ta)
        |SELECT bfr.source, n_before,
        |  CAST(coalesce(aft.n_after, 0) AS BIGINT) AS n_after,
        |  CAST(round(CAST(CAST(n_before AS DOUBLE) / tb
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS share_before,
        |  CAST(round(CAST(CAST(coalesce(aft.n_after, 0) AS DOUBLE)
        |    / ta AS DECIMAL(20,10)), 4) AS DOUBLE) AS share_after
        |FROM bfr LEFT JOIN aft USING (source) CROSS JOIN tt""".stripMargin,

    // Shingle strings key the same domain the engine's hashes do
    // (grouping is representation-free); same floor-div deciles and
    // pooled ratio.
    "q296_novelty_curve" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |ds AS (SELECT doc_id, sh FROM (SELECT doc_id,
         |    unnest(CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
         |      ELSE $shingleSql END) AS sh FROM tk)),
         |fs AS (SELECT sh, CAST(min(doc_id) AS BIGINT) AS fid
         |  FROM ds GROUP BY 1),
         |per AS (SELECT ds.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
         |    CAST(sum(CASE WHEN fid = ds.doc_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_novel
         |  FROM ds JOIN fs USING (sh) GROUP BY 1),
         |mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS mid
         |  FROM documents)
         |SELECT doc_id * 10 // (mid + 1) AS decile,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_sh) AS BIGINT) AS n_sh,
         |  CAST(sum(n_novel) AS BIGINT) AS n_novel,
         |  CAST(round(CAST(CAST(sum(n_novel) AS DOUBLE) / sum(n_sh)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS novelty
         |FROM per CROSS JOIN mx GROUP BY 1""".stripMargin,

    // Same 200-vector panel pairs, same micro-cosine scores, q170's
    // exact AUC algebra.
    "q297_embedding_auc" ->
      s"""WITH panel AS (SELECT vec_id AS id, embedding AS vec,
         |    CAST(label AS BIGINT) AS lb FROM embeddings
         |  ORDER BY ${h60("'ea' || CAST(vec_id AS VARCHAR)")}, vec_id
         |  LIMIT 200),
         |pr AS (SELECT (a.lb = b.lb) AS y,
         |    CAST(round(CAST(round(${cosSql("a.vec", "b.vec")}, 6)
         |      AS DECIMAL(20,10)) * 1000000) AS BIGINT) AS v
         |  FROM panel a JOIN panel b ON a.id < b.id),
         |bv AS (SELECT v,
         |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
         |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS q
         |  FROM pr GROUP BY 1),
         |c AS (SELECT p, q,
         |    COALESCE(CAST(sum(q) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS nb
         |  FROM bv)
         |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
         |  CAST(sum(q) AS BIGINT) AS n_neg,
         |  CASE WHEN sum(p) = 0 OR sum(q) = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(sum(CAST(p AS HUGEINT)
         |        * (2 * nb + q)) AS DOUBLE)
         |      / (CAST(2.0 AS DOUBLE) * CAST(sum(p) AS DOUBLE)
         |        * CAST(sum(q) AS DOUBLE))
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS auc
         |FROM c""".stripMargin,

    // Same hash panel, same (rounded-sim desc, id) 5-NN and
    // (count desc, label) vote.
    "q295_knn_classifier" ->
      s"""WITH qs AS (SELECT vec_id AS id, embedding AS vec,
         |    CAST(label AS BIGINT) AS lb FROM embeddings
         |  ORDER BY ${h60("'kc' || CAST(vec_id AS VARCHAR)")}, vec_id
         |  LIMIT 100),
         |nn AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, c.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c.embedding")}, 6)
         |        DESC, c.vec_id) AS rnk
         |  FROM qs q JOIN embeddings c ON q.id != c.vec_id)
         |  WHERE rnk <= 5),
         |nl AS (SELECT nn.query_id, CAST(e.label AS BIGINT) AS nl
         |  FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id),
         |vc AS (SELECT query_id, nl, CAST(count(*) AS BIGINT) AS c
         |  FROM nl GROUP BY 1, 2),
         |vote AS (SELECT query_id, nl AS pred FROM (
         |  SELECT query_id, nl, row_number() OVER (
         |      PARTITION BY query_id ORDER BY c DESC, nl) AS rn
         |  FROM vc) WHERE rn = 1)
         |SELECT qs.lb AS true_label, vote.pred,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM qs JOIN vote ON vote.query_id = qs.id
         |GROUP BY 1, 2""".stripMargin,

    // Same per-(fp, source) count algebra (// is DuckDB integer
    // division — / would go double).
    "q293_dup_source_matrix" ->
      """WITH corpus AS (
        |  SELECT source, text FROM documents
        |  UNION ALL SELECT 'mirror1', text FROM documents
        |    WHERE doc_id % 3 = 0
        |  UNION ALL SELECT 'mirror2', text FROM documents
        |    WHERE doc_id % 7 = 0),
        |f0 AS (SELECT source,
        |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |      AS fp FROM corpus),
        |fc AS (SELECT fp, source, CAST(count(*) AS BIGINT) AS c
        |  FROM f0 GROUP BY 1, 2),
        |w AS (SELECT source AS source_a, source AS source_b,
        |    CAST(sum(CAST(c AS HUGEINT) * (c - 1) // 2) AS BIGINT)
        |      AS n_pairs
        |  FROM fc WHERE c > 1 GROUP BY 1, 2),
        |a AS (SELECT x.source AS source_a, y.source AS source_b,
        |    CAST(sum(CAST(x.c AS HUGEINT) * y.c) AS BIGINT) AS n_pairs
        |  FROM fc x JOIN fc y ON x.fp = y.fp AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT * FROM (SELECT * FROM w UNION ALL SELECT * FROM a)
        |WHERE n_pairs > 0""".stripMargin,

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

    // Same ×1e9 entropy terms, same (df-share × flatness) composite
    // snapped 6dp before the cut.
    "q291_stopword_discovery" ->
      s"""WITH occ AS (SELECT doc_id, source, unnest($tokSql) AS tok
         |  FROM documents),
         |ts AS (SELECT tok, source, CAST(count(*) AS BIGINT) AS c
         |  FROM occ GROUP BY 1, 2),
         |tt AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct
         |  FROM ts GROUP BY 1),
         |hh AS (SELECT ts.tok, CAST(sum(CAST(round(
         |      -(CAST(c AS DOUBLE) / ct) * ln(CAST(c AS DOUBLE) / ct)
         |      * 1e9) AS BIGINT)) AS BIGINT) AS sh
         |  FROM ts JOIN tt USING (tok) GROUP BY 1),
         |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM
         |  (SELECT DISTINCT tok, doc_id FROM occ) GROUP BY 1),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents)
         |SELECT tok AS token, df, ct AS n_occ,
         |  CAST(round(CAST(CAST(sh AS DOUBLE) / 1e9
         |    / ln(CAST(20.0 AS DOUBLE)) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS flatness,
         |  CAST(round(CAST(CAST(df AS DOUBLE) / n_docs
         |    * (CAST(sh AS DOUBLE) / 1e9 / ln(CAST(20.0 AS DOUBLE)))
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS score
         |FROM tt JOIN hh USING (tok) JOIN dfq USING (tok)
         |CROSS JOIN nd
         |ORDER BY 5 DESC, 1 LIMIT 20""".stripMargin,

    // Same md5 global ranks (the oracle may sort the hash domain
    // globally), same per-source gaps and exact moment dispersion.
    "q292_shuffle_quality" ->
      s"""WITH rated AS (SELECT doc_id, source,
         |    ${h60("'sq' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |rk AS (SELECT h, CAST(coalesce(sum(cnt) OVER (ORDER BY h
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS cnt_below
         |  FROM (SELECT h, CAST(count(*) AS BIGINT) AS cnt
         |    FROM rated GROUP BY 1)),
         |pos AS (SELECT source, cnt_below + 1 AS pos
         |  FROM rated JOIN rk USING (h)),
         |gg AS (SELECT source, CAST(g AS BIGINT) AS g FROM (
         |  SELECT source, pos - lag(pos) OVER (PARTITION BY source
         |    ORDER BY pos) AS g FROM pos) WHERE g IS NOT NULL),
         |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n_gaps,
         |    CAST(sum(g) AS BIGINT) AS sg,
         |    sum(CAST(g AS HUGEINT) * g) AS sgg FROM gg GROUP BY 1)
         |SELECT source, n_gaps,
         |  CAST(round(CAST(CAST(sg AS DOUBLE) / n_gaps
         |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS mean_gap,
         |  CAST(round(CAST(
         |    CAST(CAST(n_gaps AS HUGEINT) * sgg
         |      - CAST(sg AS HUGEINT) * sg AS DOUBLE)
         |    / CAST(CAST(n_gaps AS HUGEINT) * n_gaps AS DOUBLE)
         |    / (CAST(sg AS DOUBLE) / n_gaps) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS dispersion
         |FROM m""".stripMargin,

    // Same hash epochs, add-one log-odds, ×1e4 snap.
    "q289_trending_terms" ->
      s"""WITH occ AS (SELECT
         |    ${h60("CAST(doc_id AS VARCHAR)")} % 2 AS ep,
         |    unnest($tokSql) AS tok FROM documents),
         |g AS (SELECT tok,
         |    CAST(sum(CASE WHEN ep = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c0,
         |    CAST(sum(CASE WHEN ep = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c1
         |  FROM occ GROUP BY 1 HAVING count(*) >= 25),
         |tots AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
         |    CAST(sum(c1) AS BIGINT) AS n1 FROM g)
         |SELECT tok AS token, c0, c1,
         |  CAST(round(CAST(
         |    ln(CAST(c1 + 1 AS DOUBLE) / (n1 - c1 + 1))
         |    - ln(CAST(c0 + 1 AS DOUBLE) / (n0 - c0 + 1))
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS log_odds
         |FROM g CROSS JOIN tots
         |ORDER BY 4 DESC, 1 LIMIT 20""".stripMargin,

    // q108's IVF chain at k=20/nprobe=2, truth@1, cumulative grid.
    "q290_recall_curve" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec
         |  FROM embeddings WHERE vec_id < 16),
         |q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |  ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |  LIMIT 100),
         |assigned AS (SELECT id, vec, cid AS cell FROM (
         |  SELECT e.vec_id AS id, e.embedding AS vec, c.cid,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.embedding", "c.cvec")}, 6)
         |        DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN c) WHERE rn = 1),
         |qc AS (SELECT qid, qv, cell FROM (
         |  SELECT q.id AS qid, q.vec AS qv, c.cid AS cell,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c.cvec")}, 6) DESC,
         |        c.cid) AS pr
         |  FROM q CROSS JOIN c) WHERE pr <= 2),
         |ranked AS (SELECT qid, nid, rnk FROM (
         |  SELECT qc.qid, a.id AS nid, row_number() OVER (
         |      PARTITION BY qc.qid ORDER BY
         |      round(${cosSql("qc.qv", "a.vec")}, 6) DESC, a.id)
         |      AS rnk
         |  FROM qc JOIN assigned a
         |    ON qc.cell = a.cell AND qc.qid != a.id) WHERE rnk <= 20),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT q.id AS query_id, c2.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.vec", "c2.embedding")}, 6)
         |        DESC, c2.vec_id) AS rnk
         |  FROM q JOIN embeddings c2 ON q.id != c2.vec_id)
         |  WHERE rnk <= 1),
         |fh AS (SELECT t.query_id, r.rnk FROM truth t
         |  JOIN ranked r ON r.qid = t.query_id
         |    AND r.nid = t.neighbor_id),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q)
         |SELECT n_at, CAST(count(fh.query_id) AS BIGINT) AS n_hit,
         |  n_queries,
         |  CAST(round(CAST(CAST(count(fh.query_id) AS DOUBLE)
         |    / n_queries AS DECIMAL(20,10)), 4) AS DOUBLE) AS recall
         |FROM (SELECT CAST(unnest([1, 2, 5, 10, 20]) AS INT) AS n_at)
         |LEFT JOIN fh ON fh.rnk <= n_at
         |CROSS JOIN nq
         |GROUP BY n_at, n_queries""".stripMargin,

    // Same ×N-scaled integer residual mass, same sandwich ratios.
    "q287_cluster_robust_se" ->
      """WITH ug AS (SELECT user_id % 2 = 0 AS tr, user_id,
        |    CAST(count(*) AS BIGINT) AS nu,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100)
        |      AS BIGINT)) AS BIGINT) AS su,
        |    sum(CAST(CAST(round(CAST(value AS DOUBLE) * 100)
        |      AS BIGINT) AS HUGEINT)
        |      * CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT))
        |      AS ssu
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT tr, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(nu) AS BIGINT) AS n, CAST(sum(su) AS BIGINT)
        |      AS sv, sum(ssu) AS ssv
        |  FROM ug GROUP BY 1),
        |crm AS (SELECT ug.tr,
        |    sum((CAST(n AS HUGEINT) * su - CAST(nu AS HUGEINT) * sv)
        |      * (CAST(n AS HUGEINT) * su - CAST(nu AS HUGEINT) * sv))
        |      AS crm
        |  FROM ug JOIN tot ON tot.tr = ug.tr GROUP BY 1)
        |SELECT tot.tr AS treat_cohort, n_users, n,
        |  CAST(round(CAST(CAST(sv AS DOUBLE) / n / 100.0
        |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS mean_value,
        |  CAST(round(CAST(sqrt(
        |      CAST(CAST(n AS HUGEINT) * ssv - CAST(sv AS HUGEINT) * sv
        |        AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n * n AS DOUBLE)) / 100.0
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS se_iid,
        |  CAST(round(CAST(sqrt(CAST(crm AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n * n * n AS DOUBLE))
        |      / 100.0 AS DECIMAL(20,10)), 4) AS DOUBLE)
        |    AS se_cluster,
        |  CAST(round(CAST(CAST(crm AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * ssv
        |      - CAST(sv AS HUGEINT) * sv) AS DOUBLE)
        |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS design_effect
        |FROM tot JOIN crm ON crm.tr = tot.tr""".stripMargin,

    // Same q260 grouping, pure-integer ECE numerator, per-group ×1e9
    // MCE snap before the max.
    "q288_calibration_error" ->
      s"""WITH ev AS (SELECT hour(ts) AS h,
         |    CAST(event_type = 'purchase' AS BIGINT) AS y,
         |    ${h60("CAST(event_id AS VARCHAR)")} % 2 AS b
         |  FROM events),
         |trn AS (SELECT h, CAST(round(CAST(CAST(sum(y) AS DOUBLE)
         |    / count(*) * CAST(1e6 AS DOUBLE) AS DECIMAL(20,10)))
         |    AS BIGINT) AS p
         |  FROM ev WHERE b = 0 GROUP BY 1),
         |g AS (SELECT p, CAST(count(*) AS BIGINT) AS nk,
         |    CAST(sum(y) AS BIGINT) AS sk
         |  FROM ev JOIN trn USING (h) WHERE ev.b <> 0 GROUP BY 1),
         |dd AS (SELECT nk, abs(CAST(p AS HUGEINT) * nk
         |    - CAST(1000000 AS HUGEINT) * sk) AS dl FROM g)
         |SELECT CAST(sum(nk) AS BIGINT) AS n,
         |  CAST(round(CAST(CAST(sum(dl) AS DOUBLE)
         |    / (CAST(sum(nk) AS DOUBLE) * CAST(1e6 AS DOUBLE))
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS ece,
         |  CAST(round(CAST(CAST(max(CAST(round(CAST(dl AS DOUBLE)
         |      / nk / 1e6 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS mce
         |FROM dd""".stripMargin,

    // Same three-covariate melt (UNION ALL ≡ the engine's Expand),
    // same exact moments and SMD shape.
    "q285_covariate_balance" ->
      """WITH ev AS (
        |  SELECT user_id % 2 = 0 AS tr, 'hour' AS cov,
        |    CAST(hour(ts) AS BIGINT) AS x FROM events
        |  UNION ALL SELECT user_id % 2 = 0, 'dow',
        |    CAST(dayofweek(ts) + 1 AS BIGINT) FROM events
        |  UNION ALL SELECT user_id % 2 = 0, 'value_cents',
        |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)
        |  FROM events),
        |g AS (SELECT cov, tr, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS HUGEINT)) AS sx,
        |    sum(CAST(x AS HUGEINT) * x) AS ss
        |  FROM ev GROUP BY 1, 2),
        |wide AS (SELECT cov,
        |    max(CASE WHEN tr THEN n END) AS n_t,
        |    max(CASE WHEN tr THEN sx END) AS s_t,
        |    max(CASE WHEN tr THEN ss END) AS ss_t,
        |    max(CASE WHEN NOT tr THEN n END) AS n_c,
        |    max(CASE WHEN NOT tr THEN sx END) AS s_c,
        |    max(CASE WHEN NOT tr THEN ss END) AS ss_c
        |  FROM g GROUP BY 1),
        |v AS (SELECT *,
        |    CAST(CAST(n_t AS HUGEINT) * ss_t - s_t * s_t AS DOUBLE)
        |      / CAST(CAST(n_t AS HUGEINT) * n_t AS DOUBLE) AS v_t,
        |    CAST(CAST(n_c AS HUGEINT) * ss_c - s_c * s_c AS DOUBLE)
        |      / CAST(CAST(n_c AS HUGEINT) * n_c AS DOUBLE) AS v_c
        |  FROM wide)
        |SELECT cov AS covariate, n_t, n_c,
        |  CASE WHEN v_t + v_c = 0 THEN NULL ELSE
        |    CAST(round(CAST(
        |      (CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c)
        |      / sqrt((v_t + v_c) / CAST(2.0 AS DOUBLE))
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS smd
        |FROM v""".stripMargin,

    // Same per-cohort cumulative windows over the day grid, same
    // pooled-proportion z shape and 4dp snap before the 1.96 compare.
    "q286_peeking_curve" ->
      """WITH daily AS (SELECT user_id % 2 = 0 AS tr,
        |    CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(event_type = 'purchase' AS BIGINT))
        |      AS BIGINT) AS cv
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT tr, d, CAST(sum(n) OVER w AS BIGINT) AS cn,
        |    CAST(sum(cv) OVER w AS BIGINT) AS cc
        |  FROM daily WINDOW w AS (PARTITION BY tr ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |wide AS (SELECT d,
        |    max(CASE WHEN tr THEN cn END) AS n_t,
        |    max(CASE WHEN tr THEN cc END) AS c_t,
        |    max(CASE WHEN NOT tr THEN cn END) AS n_c,
        |    max(CASE WHEN NOT tr THEN cc END) AS c_c
        |  FROM cum GROUP BY 1),
        |zz AS (SELECT d, n_t, n_c, c_t, c_c,
        |    CAST(round(CAST(
        |      (CAST(c_t AS DOUBLE) / n_t - CAST(c_c AS DOUBLE) / n_c)
        |      / sqrt((CAST(c_t + c_c AS DOUBLE) / (n_t + n_c))
        |        * (CAST(1.0 AS DOUBLE)
        |          - CAST(c_t + c_c AS DOUBLE) / (n_t + n_c))
        |        * (CAST(1.0 AS DOUBLE) / n_t
        |          + CAST(1.0 AS DOUBLE) / n_c))
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) AS z4
        |  FROM wide WHERE n_t IS NOT NULL AND n_c IS NOT NULL)
        |SELECT d, n_t, n_c,
        |  CASE WHEN c_t + c_c = 0 OR c_t + c_c = n_t + n_c
        |    THEN NULL ELSE z4 END AS z,
        |  CASE WHEN c_t + c_c = 0 OR c_t + c_c = n_t + n_c
        |    THEN NULL ELSE abs(z4) >= 1.96 END AS crossed
        |FROM zz""".stripMargin,

    // Same frequency-of-frequency walk (the oracle may sort the tiny
    // count domain globally), same exact partial-bucket algebra.
    "q284_cache_curve" ->
      """WITH kc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |hc AS (SELECT n AS c, CAST(count(*) AS BIGINT) AS k
        |  FROM kc GROUP BY 1),
        |cum AS (SELECT c, k,
        |    CAST(coalesce(sum(k) OVER (ORDER BY c DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS k_before
        |  FROM hc),
        |tot AS (SELECT sum(CAST(c AS HUGEINT) * k) AS m_tot,
        |    CAST(sum(k) AS BIGINT) AS n_keys FROM hc)
        |SELECT n_cache, n_keys,
        |  CAST(round(CAST(CAST(sum(CAST(c AS HUGEINT)
        |      * least(k, n_cache - k_before)) AS DOUBLE)
        |    / CAST(m_tot AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE)
        |    AS hit_rate
        |FROM cum
        |JOIN (SELECT CAST(unnest([1, 10, 100, 1000]) AS BIGINT)
        |    AS n_cache) g
        |  ON k_before < n_cache
        |CROSS JOIN tot
        |GROUP BY n_cache, n_keys, m_tot""".stripMargin,

    // Same one-pass pair stream (q28's oracle kernel), same ×1e4
    // integer threshold compare.
    "q281_threshold_sweep" ->
      s"""WITH u AS ($docsDupSql),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM u),
         |sh AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[])
         |    ELSE $shingleSql END AS sh FROM tk),
         |p AS (SELECT id_a, id_b,
         |    CAST(round(jac * 10000) AS BIGINT) AS jm FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |      (len(a.sh) + len(b.sh)
         |        - len(list_intersect(a.sh, b.sh))), 4) AS jac
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |  WHERE jac >= 0.5)
         |SELECT th_pct, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT id_b) AS BIGINT) AS n_droppable
         |FROM p CROSS JOIN (SELECT CAST(unnest(range(10, 19)) * 5
         |    AS INT) AS th_pct)
         |WHERE jm >= th_pct * 100 GROUP BY 1""".stripMargin,

    // Two identical q276 chains over base and drifted rows; the diff
    // join keeps only unequal nodes.
    "q282_merkle_diff" -> {
      def chain(tag: String, nchExpr: String): String = {
        val rowsSql =
          s"""SELECT ${h60("'mk' || CAST(doc_id AS VARCHAR)")} % 64
             |    AS bkt,
             |  ${h60(s"concat_ws('|', doc_id, source, lang, $nchExpr)")}
             |    AS rh FROM documents""".stripMargin
        val lvls = (1 to 6).map(l =>
          s"""${tag}l$l AS (SELECT idx // 2 AS idx,
             |  md5(arg_min(h, idx) || arg_max(h, idx)) AS h
             |  FROM ${tag}l${l - 1} GROUP BY 1)""".stripMargin)
          .mkString(",\n")
        val sel = (1 to 6).map(l =>
          s"UNION ALL SELECT $l, idx, h FROM ${tag}l$l").mkString(" ")
        s"""${tag}ag AS (SELECT bkt AS idx,
           |    CAST(sum(CAST(rh AS HUGEINT)) AS VARCHAR) AS sx
           |  FROM ($rowsSql) GROUP BY 1),
           |${tag}l0 AS (SELECT r AS idx,
           |    md5(coalesce(${tag}ag.sx, 'empty')) AS h
           |  FROM (SELECT unnest(range(0, 64)) AS r)
           |  LEFT JOIN ${tag}ag ON ${tag}ag.idx = r),
           |$lvls,
           |${tag}t AS (SELECT CAST(0 AS INT) AS level, idx, h
           |  FROM ${tag}l0 $sel)""".stripMargin
      }
      s"""WITH ${chain("a", "n_chars")},
         |${chain("b",
           "CASE WHEN doc_id % 503 = 0 THEN n_chars + 1 ELSE n_chars END")}
         |SELECT a.level, a.idx, a.h AS h_base, b.h AS h_drift
         |FROM at a JOIN bt b ON a.level = b.level AND a.idx = b.idx
         |WHERE a.h <> b.h""".stripMargin
    },

    // Same (user, day) distinct and ×7 cover fan.
    "q283_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE)
        |    AS d FROM events),
        |dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau
        |  FROM ud GROUP BY 1),
        |cover AS (SELECT DISTINCT u, d + CAST(k AS INT) AS d FROM ud
        |  CROSS JOIN (SELECT unnest(range(0, 7)) AS k)),
        |wau AS (SELECT d, CAST(count(*) AS BIGINT) AS wau
        |  FROM cover GROUP BY 1)
        |SELECT d, dau, wau,
        |  CAST(round(CAST(CAST(dau AS DOUBLE) / wau
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS stickiness
        |FROM dau JOIN wau USING (d)""".stripMargin,

    // Same canonical undirected edge set and wedge join, same
    // zero-fill.
    "q279_edge_embeddedness" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
        |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
        |  FROM docs CROSS JOIN nc
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
        |und AS (SELECT DISTINCT least(src, dst) AS u,
        |    greatest(src, dst) AS v FROM e WHERE src <> dst),
        |adj AS (SELECT u AS a, v AS b FROM und
        |  UNION ALL SELECT v, u FROM und),
        |sup AS (SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS support
        |  FROM und e JOIN adj x ON x.a = e.u
        |  JOIN adj y ON y.a = e.v AND y.b = x.b
        |  GROUP BY 1, 2),
        |fl AS (SELECT und.u, und.v,
        |    CAST(coalesce(s.support, 0) AS BIGINT) AS support
        |  FROM und LEFT JOIN sup s ON s.u = und.u AND s.v = und.v),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_und FROM fl)
        |SELECT support, CAST(count(*) AS BIGINT) AS n_edges,
        |  CAST(round(CAST(CAST(count(*) AS DOUBLE) / n_und
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS share
        |FROM fl CROSS JOIN tot GROUP BY support, n_und""".stripMargin,

    // Same degree-hub cut and two identically unrolled q143 BFS
    // chains.
    "q280_attack_robustness" -> {
      def bfs(tag: String, eCte: String): String =
        (1 to 3).map { h =>
          s"""${tag}f$h AS (SELECT $eCte.dst AS id, $h AS hops
             |  FROM $eCte JOIN (SELECT id FROM ${tag}d${h - 1}
             |    WHERE hops = ${h - 1}) f ON $eCte.src = f.id),
             |${tag}d$h AS (SELECT id, min(hops) AS hops FROM
             |  (SELECT * FROM ${tag}d${h - 1}
             |   UNION ALL SELECT * FROM ${tag}f$h) GROUP BY 1)""".stripMargin
        }.mkString(",\n")
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS dg FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
         |  GROUP BY 1),
         |hubs AS (SELECT id FROM deg ORDER BY dg DESC, id LIMIT 8),
         |s0 AS (SELECT doc_id AS id FROM documents
         |  WHERE doc_id % 97 = 0),
         |bd0 AS (SELECT id, 0 AS hops FROM s0),
         |${bfs("b", "e")},
         |e2 AS (SELECT e.src, e.dst FROM e
         |  LEFT JOIN hubs h1 ON h1.id = e.src
         |  LEFT JOIN hubs h2 ON h2.id = e.dst
         |  WHERE h1.id IS NULL AND h2.id IS NULL),
         |ad0 AS (SELECT s0.id, 0 AS hops FROM s0
         |  LEFT JOIN hubs ON hubs.id = s0.id WHERE hubs.id IS NULL),
         |${bfs("a", "e2")},
         |nn2 AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
         |rb AS (SELECT CAST(count(*) AS BIGINT) AS reach_before
         |  FROM bd3),
         |ra AS (SELECT CAST(count(*) AS BIGINT) AS reach_after
         |  FROM ad3)
         |SELECT n_nodes, reach_before, reach_after,
         |  CAST(round(CAST(CAST(reach_before - reach_after AS DOUBLE)
         |    / reach_before AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    AS drop_share
         |FROM nn2 CROSS JOIN rb CROSS JOIN ra""".stripMargin
    },

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

    // Same 256-bucket md5 hashing, same collision aggregates.
    "q278_feature_hash_audit" ->
      s"""WITH tokc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($tokSql) AS tok FROM documents)
         |  GROUP BY 1),
         |tb AS (SELECT ${h60("'fh' || tok")} % 256 AS b, c FROM tokc),
         |bk AS (SELECT b, CAST(count(*) AS BIGINT) AS n_toks,
         |    CAST(sum(c) AS BIGINT) AS mass FROM tb GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_buckets_used,
         |  CAST(sum(n_toks) AS BIGINT) AS vocab,
         |  CAST(sum(CASE WHEN n_toks > 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_colliding,
         |  CAST(round(CAST(CAST(sum(CASE WHEN n_toks > 1 THEN 1
         |    ELSE 0 END) AS DOUBLE) / count(*) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS bucket_collision_rate,
         |  CAST(round(CAST(CAST(sum(CASE WHEN n_toks > 1 THEN mass
         |    ELSE 0 END) AS DOUBLE) / sum(mass) AS DECIMAL(20,10)),
         |    4) AS DOUBLE) AS mass_collision_share
         |FROM bk""".stripMargin,

    // Same order-free leaf sums, same md5(left || right) parents,
    // arg_min/arg_max ≙ min_by/max_by child ordering.
    "q276_merkle_tree" -> {
      val lvls = (1 to 6).map(l =>
        s"""l$l AS (SELECT idx // 2 AS idx,
           |  md5(arg_min(h, idx) || arg_max(h, idx)) AS h
           |  FROM l${l - 1} GROUP BY 1)""".stripMargin).mkString(",\n")
      val sel = (1 to 6).map(l =>
        s"UNION ALL SELECT $l, idx, h FROM l$l").mkString("\n")
      s"""WITH rows_ AS (SELECT
         |    ${h60("'mk' || CAST(doc_id AS VARCHAR)")} % 64 AS bkt,
         |    ${h60("concat_ws('|', doc_id, source, lang, n_chars)")}
         |      AS rh
         |  FROM documents),
         |ag AS (SELECT bkt AS idx,
         |    CAST(sum(CAST(rh AS HUGEINT)) AS VARCHAR) AS sx
         |  FROM rows_ GROUP BY 1),
         |l0 AS (SELECT r AS idx, md5(coalesce(ag.sx, 'empty')) AS h
         |  FROM (SELECT unnest(range(0, 64)) AS r)
         |  LEFT JOIN ag ON ag.idx = r),
         |$lvls
         |SELECT CAST(0 AS INT) AS level, idx, h FROM l0
         |$sel""".stripMargin
    },

    // Same panels, same exact cross-multiply duels, two identically
    // unrolled iterations with ×1e9 term snaps, same ×1e6 share
    // renormalization.
    "q275_bradley_terry" ->
      s"""WITH sp AS (SELECT source AS g,
         |    ${h60("CAST(doc_id AS VARCHAR)")} % 64 AS p,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(n_chars) AS BIGINT) AS sv
         |  FROM documents GROUP BY 1, 2),
         |duel AS (SELECT x.g AS a, y.g AS b,
         |    CAST(x.sv AS HUGEINT) * y.n > CAST(y.sv AS HUGEINT) * x.n
         |      AS win
         |  FROM sp x JOIN sp y ON x.p = y.p AND x.g <> y.g),
         |w AS (SELECT a, b, CAST(sum(CASE WHEN win THEN 1 ELSE 0 END)
         |    AS BIGINT) AS w FROM duel GROUP BY 1, 2),
         |m AS (SELECT u.a, u.b, u.w AS w_ab, u.w + v.w AS n_ab
         |  FROM w u JOIN w v ON u.a = v.b AND u.b = v.a
         |  WHERE u.w + v.w > 0),
         |wa AS (SELECT a, CAST(sum(w_ab) AS BIGINT) AS w_tot
         |  FROM m GROUP BY 1),
         |t1 AS (SELECT a, CAST(sum(CAST(round(1e9
         |      * CAST(n_ab AS DOUBLE)
         |      / (CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |      AS BIGINT)) AS BIGINT) AS den
         |  FROM m GROUP BY 1),
         |p1 AS (SELECT wa.a AS g, CAST(w_tot AS DOUBLE) * 1e9 / den
         |    AS pi FROM wa JOIN t1 ON t1.a = wa.a),
         |t2 AS (SELECT m.a, CAST(sum(CAST(round(1e9
         |      * CAST(n_ab AS DOUBLE) / (pa.pi + pb.pi))
         |      AS BIGINT)) AS BIGINT) AS den
         |  FROM m JOIN p1 pa ON pa.g = m.a JOIN p1 pb ON pb.g = m.b
         |  GROUP BY 1),
         |p2 AS (SELECT wa.a AS g, CAST(w_tot AS DOUBLE) * 1e9 / den
         |    AS pi FROM wa JOIN t2 ON t2.a = wa.a),
         |pm AS (SELECT g, CAST(round(CAST(pi AS DECIMAL(20,10))
         |    * 1000000) AS BIGINT) AS pm FROM p2),
         |tot AS (SELECT CAST(sum(pm) AS BIGINT) AS tot FROM pm)
         |SELECT pm.g AS source, wa.w_tot,
         |  CAST(round(CAST(CAST(pm AS DOUBLE) / 1e6
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS bt_pi,
         |  CAST(round(CAST(CAST(pm AS DOUBLE) / tot
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS share
         |FROM pm CROSS JOIN tot JOIN wa ON wa.a = pm.g""".stripMargin,

    // Same ordered-bigram distinct and exact ratios.
    "q273_kn_continuation" ->
      s"""WITH tk AS (SELECT $tokSql AS tk FROM documents),
         |bg AS (SELECT r['a'] AS a, r['b'] AS b FROM (
         |  SELECT unnest([{'a': tk[i + 1], 'b': tk[i + 2]}
         |      for i in range(0, len(tk) - 1)]) AS r FROM tk)),
         |dist AS (SELECT DISTINCT a, b FROM bg),
         |cont AS (SELECT b AS token, CAST(count(*) AS BIGINT)
         |    AS n_contexts FROM dist GROUP BY 1),
         |dd AS (SELECT CAST(count(*) AS BIGINT) AS d FROM dist),
         |uni AS (SELECT tok AS token, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(tk) AS tok FROM tk) GROUP BY 1),
         |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni)
         |SELECT token, c,
         |  CAST(coalesce(cont.n_contexts, 0) AS BIGINT) AS n_contexts,
         |  CAST(round(CAST(CAST(c AS DOUBLE) / n AS DECIMAL(20,10)),
         |    6) AS DOUBLE) AS p_raw,
         |  CAST(round(CAST(CAST(coalesce(cont.n_contexts, 0)
         |    AS DOUBLE) / d AS DECIMAL(20,10)), 6) AS DOUBLE)
         |    AS p_cont
         |FROM uni LEFT JOIN cont USING (token)
         |CROSS JOIN dd CROSS JOIN nn
         |ORDER BY c DESC, token LIMIT 50""".stripMargin,

    // Same top-2 probe derivation (n desc, token), same ≤3 window.
    "q274_proximity_search" ->
      s"""WITH pg AS (SELECT doc_id,
         |    generate_subscripts(tk, 1) - 1 AS pos, unnest(tk) AS token
         |  FROM (SELECT doc_id, $tokSql AS tk FROM documents)),
         |tc AS (SELECT token, count(*) AS n FROM pg GROUP BY 1),
         |t1 AS (SELECT token FROM tc ORDER BY n DESC, token LIMIT 1),
         |t2 AS (SELECT token FROM (SELECT token, row_number() OVER (
         |    ORDER BY n DESC, token) AS rn FROM tc) WHERE rn = 2)
         |SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(min(abs(x.pos - y.pos)) AS BIGINT) AS min_gap
         |FROM pg x JOIN t1 ON x.token = t1.token
         |JOIN pg y ON y.doc_id = x.doc_id
         |JOIN t2 ON y.token = t2.token
         |WHERE abs(x.pos - y.pos) <= 3
         |GROUP BY 1""".stripMargin,

    // Same hash-argmin candidate draws, same integer band inequality,
    // same (inliers desc, ci) winner.
    "q270_ransac_fit" ->
      s"""WITH pts AS (SELECT doc_id, n_chars AS x,
         |    CAST(len($tokSql) AS BIGINT) AS y FROM documents),
         |cix AS (SELECT unnest(range(1, 17)) AS ci),
         |cd0 AS (SELECT ci,
         |    arg_min({'x1': x, 'y1': y}, ${h60(
             "'ra' || CAST(ci AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")})
         |      AS pa,
         |    arg_min({'x2': x, 'y2': y}, ${h60(
             "'rb' || CAST(ci AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")})
         |      AS pb
         |  FROM pts CROSS JOIN cix GROUP BY 1),
         |cands AS (SELECT ci, (pa).x1 AS x1, (pa).y1 AS y1,
         |    (pb).x2 - (pa).x1 AS dx, (pb).y2 - (pa).y1 AS dy
         |  FROM cd0 WHERE (pb).x2 - (pa).x1 <> 0),
         |sc AS (SELECT ci, dx, dy, CAST(count(*) AS BIGINT)
         |    AS n_inliers
         |  FROM pts CROSS JOIN cands
         |  WHERE abs(CAST(dy AS HUGEINT) * (x - x1)
         |      - CAST(dx AS HUGEINT) * (y - y1))
         |    <= 5 * abs(CAST(dx AS HUGEINT))
         |  GROUP BY 1, 2, 3),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_points FROM pts)
         |SELECT CAST(ci AS BIGINT) AS cand_id, n_inliers, n_points,
         |  CAST(round(CAST(CAST(dy AS DOUBLE) / dx
         |    * CAST(1e6 AS DOUBLE) AS DECIMAL(20,10)), 0) AS BIGINT)
         |    AS slope_micro,
         |  CAST(round(CAST(CAST(n_inliers AS DOUBLE) / n_points
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS inlier_share
         |FROM (SELECT *, row_number() OVER (ORDER BY n_inliers DESC,
         |    ci) AS rn FROM sc) CROSS JOIN nt
         |WHERE rn = 1""".stripMargin,

    // Same weekday grid (+1 aligns the Sunday conventions), same
    // exact HUGEINT inequality.
    "q269_seasonal_anomaly" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |dd AS (SELECT d, dayofweek(d) + 1 AS dow, c FROM daily),
        |g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS sc,
        |    sum(CAST(c AS HUGEINT) * c) AS m2
        |  FROM dd GROUP BY 1)
        |SELECT d, CAST(dow AS INT) AS dow, c AS n_events,
        |  CAST(round(CAST(CAST(sc AS DOUBLE) / n AS DECIMAL(20,10)),
        |    2) AS DOUBLE) AS expected,
        |  (CAST(c AS HUGEINT) * n - sc) * (CAST(c AS HUGEINT) * n - sc)
        |    > (CAST(n AS HUGEINT) * m2 - CAST(sc AS HUGEINT) * sc) * 4
        |    AS is_anomaly
        |FROM dd JOIN g USING (dow)""".stripMargin,

    // The round-trip identity: pivot→unpivot with null cells dropped
    // IS the direct (user, type) aggregate.
    "q268_unpivot" ->
      """SELECT user_id, event_type,
        |  CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    // DuckDB's native jaro_winkler_similarity IS the oracle for the
    // engine's expression — same blocking, snap, gate and best-match
    // struct-min.
    "q267_jaro_winkler" ->
      """WITH probes AS (SELECT p_partkey + 2000000000 AS probe_id,
        |    substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
        |      || substr(p_name,
        |        CAST(p_partkey % length(p_name) AS INT) + 2) AS pn
        |  FROM part WHERE p_partkey % 10 = 0),
        |cand AS (SELECT * FROM (SELECT probe_id, p_partkey,
        |    CAST(round(CAST(jaro_winkler_similarity(pn, p_name)
        |      AS DECIMAL(20,10)) * 1000000) AS BIGINT) AS jw
        |  FROM probes JOIN part
        |    ON substr(pn, 1, 1) = substr(p_name, 1, 1)
        |    AND abs(length(pn) - length(p_name)) <= 2)
        |  WHERE jw >= 900000),
        |m AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_cand,
        |    min({'nj': 1000000 - jw,
        |        'r': CAST(p_partkey AS BIGINT)}) AS bk
        |  FROM cand GROUP BY 1)
        |SELECT p.probe_id,
        |  CAST(coalesce(m.n_cand, 0) AS BIGINT) AS n_cand,
        |  CAST(coalesce(1000000 - (m.bk).nj, -1) AS BIGINT)
        |    AS best_jw_micro,
        |  CAST(coalesce((m.bk).r, -1) AS BIGINT) AS best_ref
        |FROM probes p LEFT JOIN m ON p.probe_id = m.probe_id""".stripMargin,

    // Same (ts, event_id) position order, same first/last-occurrence
    // order algebra for pairs and betweenness witness for triples.
    "q266_sequence_patterns" ->
      """WITH pos AS (SELECT user_id AS u, event_type AS ty,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS pos
        |  FROM events),
        |ext AS (SELECT u, ty, CAST(min(pos) AS BIGINT) AS fp,
        |    CAST(max(pos) AS BIGINT) AS lp
        |  FROM pos GROUP BY 1, 2),
        |nn AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n FROM ext),
        |pr AS (SELECT a.ty || '>' || b.ty AS pattern,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM ext a JOIN ext b ON a.u = b.u AND a.fp < b.lp
        |  GROUP BY 1),
        |tr AS (SELECT at || '>' || bt || '>' || ct AS pattern,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM (SELECT DISTINCT p.u, ea.ty AS at, p.ty AS bt,
        |      ec.ty AS ct
        |    FROM pos p JOIN ext ea ON ea.u = p.u
        |    JOIN ext ec ON ec.u = p.u
        |    WHERE p.pos > ea.fp AND p.pos < ec.lp)
        |  GROUP BY 1),
        |u AS (SELECT * FROM pr UNION ALL SELECT * FROM tr)
        |SELECT pattern, n_users,
        |  CAST(round(CAST(CAST(n_users AS DOUBLE) / n
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS support
        |FROM u CROSS JOIN nn""".stripMargin,

    // Same exact midrank algebra: exclusive running pooled count as a
    // plain window over the distinct value domain (the oracle may sort
    // it globally — it is the engine that must not), tie term and
    // variance in HUGEINT, identical one-division-one-sqrt z shape.
    "q244_mann_whitney" ->
      """WITH gv AS (SELECT source AS g, n_chars AS v,
        |    CAST(count(*) AS BIGINT) AS n_gv
        |  FROM documents GROUP BY 1, 2),
        |bv AS (SELECT v, CAST(sum(n_gv) AS BIGINT) AS n_v
        |  FROM gv GROUP BY 1),
        |bl AS (SELECT v, n_v, CAST(coalesce(sum(n_v) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS n_v_below FROM bv),
        |tot AS (SELECT CAST(sum(n_v) AS BIGINT) AS n_tot,
        |    sum(CAST(n_v AS HUGEINT) * n_v * n_v - n_v) AS tie_t
        |  FROM bv),
        |r AS (SELECT g, CAST(sum(n_gv) AS BIGINT) AS n_g,
        |    sum(CAST(n_gv AS HUGEINT) * (2 * n_v_below + n_v + 1)) AS r2
        |  FROM gv JOIN bl USING (v) GROUP BY 1),
        |x AS (SELECT g, n_g, n_tot - n_g AS n_o,
        |    CAST(r2 - CAST(n_g AS HUGEINT) * (n_g + 1) AS BIGINT) AS u2,
        |    CAST(n_g AS HUGEINT) * (n_tot - n_g) *
        |      (CAST(n_tot + 1 AS HUGEINT) * n_tot * (n_tot - 1) - tie_t)
        |      AS var_num,
        |    CAST(n_tot AS HUGEINT) * (n_tot - 1) * 12 AS var_den
        |  FROM r CROSS JOIN tot)
        |SELECT g AS source, n_g, u2,
        |  CASE WHEN n_o = 0 OR var_num = 0 THEN NULL ELSE
        |    CAST(round(CAST(
        |      CAST(u2 - CAST(n_g AS HUGEINT) * n_o AS DOUBLE) /
        |      (sqrt(CAST(var_num AS DOUBLE) / CAST(var_den AS DOUBLE))
        |        * 2.0) AS DECIMAL(20,10)), 4) AS DOUBLE) END AS z,
        |  CASE WHEN n_o = 0 THEN NULL ELSE
        |    CAST(round(CAST(
        |      CAST(u2 - CAST(n_g AS HUGEINT) * n_o AS DOUBLE) /
        |      CAST(CAST(n_g AS HUGEINT) * n_o AS DOUBLE)
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS r_rb
        |FROM x""".stripMargin,

    // Same tier thresholds and hash shuffle; in-tier rank as one
    // (h, doc_id)-ordered row_number, same interleave arithmetic.
    "q243_curriculum_interleave" ->
      s"""WITH rt AS (SELECT doc_id,
         |    CASE WHEN n_chars < 250 THEN 0 WHEN n_chars < 400 THEN 1
         |      ELSE 2 END AS tier,
         |    ${h60("'c' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents)
         |SELECT CAST((row_number() OVER (PARTITION BY tier
         |    ORDER BY h, doc_id) - 1) * 3 + tier AS BIGINT)
         |    AS order_idx,
         |  doc_id, CAST(tier AS BIGINT) AS tier
         |FROM rt ORDER BY order_idx LIMIT 30""".stripMargin,

    // Same md5 ring/key hashes, clockwise pick via the correlated
    // (p, w)-ordered first point, same wrap rule and 4dp snaps.
    "q242_consistent_hash" ->
      s"""WITH r8 AS (SELECT 'w' || CAST(t.i AS VARCHAR) AS w,
         |    ${h60("'ring:w' || CAST(t.i AS VARCHAR) || ':' || CAST(u.v AS VARCHAR)")}
         |      AS p
         |  FROM range(0, 8) t(i) CROSS JOIN range(0, 32) u(v)),
         |r9 AS (SELECT 'w' || CAST(t.i AS VARCHAR) AS w,
         |    ${h60("'ring:w' || CAST(t.i AS VARCHAR) || ':' || CAST(u.v AS VARCHAR)")}
         |      AS p
         |  FROM range(0, 9) t(i) CROSS JOIN range(0, 32) u(v)),
         |dk AS (SELECT CAST(doc_id AS VARCHAR) AS k,
         |    ${h60("'doc:' || CAST(doc_id AS VARCHAR)")} AS hd
         |  FROM documents),
         |o8 AS (SELECT k, coalesce(
         |    (SELECT r.w FROM r8 r WHERE r.p >= d.hd
         |     ORDER BY r.p, r.w LIMIT 1),
         |    (SELECT w FROM r8 ORDER BY p, w LIMIT 1)) AS o8
         |  FROM dk d),
         |o9 AS (SELECT k, coalesce(
         |    (SELECT r.w FROM r9 r WHERE r.p >= d.hd
         |     ORDER BY r.p, r.w LIMIT 1),
         |    (SELECT w FROM r9 ORDER BY p, w LIMIT 1)) AS o9
         |  FROM dk d),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM dk)
         |SELECT o8 AS worker, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(round(CAST(CAST(count(*) AS DOUBLE)
         |    / CAST(n_total AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS share,
         |  CAST(sum(CASE WHEN o8 <> o9 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_moved_out,
         |  CAST(round(CAST(
         |    CAST(sum(CASE WHEN o8 <> o9 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS moved_share
         |FROM o8 JOIN o9 USING (k) CROSS JOIN nn
         |GROUP BY o8, n_total""".stripMargin,

    // Same positional (non-distinct) 3-gram stream, the same two
    // aggregates and exact-ratio snaps.
    "q241_good_turing" ->
      s"""WITH tk AS (SELECT source, $tokSql AS tk FROM documents),
         |un AS (SELECT source, unnest(CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[])
         |    ELSE [array_to_string(tk[i:i+2], ' ')
         |      for i in range(1, len(tk) - 1)] END) AS u
         |  FROM tk),
         |vf AS (SELECT source, u, CAST(count(*) AS BIGINT) AS r
         |  FROM un GROUP BY 1, 2),
         |ag AS (SELECT source, CAST(sum(r) AS BIGINT) AS n_units,
         |    CAST(count(*) AS BIGINT) AS vocab,
         |    CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n2
         |  FROM vf GROUP BY 1)
         |SELECT source, n_units, vocab, n1, n2,
         |  CAST(round(CAST(CAST(n1 AS DOUBLE)
         |    / CAST(n_units AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS p_unseen,
         |  CASE WHEN n1 = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n2 * 2 AS DOUBLE)
         |      / CAST(n1 AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    END AS r_star_1
         |FROM ag""".stripMargin,

    // q221's winnowing chain with the selected POSITION kept, the
    // same df guard and pair cut, then the (nv desc, d) modal vote.
    "q240_winnow_align" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents),
         |gr AS (SELECT doc_id, r['p'] AS pos,
         |    ${h60("r['g']")} AS h FROM (
         |  SELECT doc_id, unnest([{'p': i,
         |      'g': array_to_string(tk[i+1:i+4], ' ')}
         |      for i in range(0, len(tk) - 3)]) AS r FROM tk)),
         |n AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY 1),
         |st AS (SELECT gr.doc_id, gr.pos AS ws
         |  FROM gr JOIN n USING (doc_id)
         |  WHERE gr.pos <= n.n - 4 OR (n.n < 4 AND gr.pos = 0)),
         |sel AS (SELECT doc_id, h, pos FROM (
         |  SELECT st.doc_id, g2.h, g2.pos,
         |    row_number() OVER (PARTITION BY st.doc_id, st.ws
         |      ORDER BY g2.h ASC, g2.pos DESC) AS rn
         |  FROM st JOIN gr g2 ON g2.doc_id = st.doc_id
         |    AND g2.pos BETWEEN st.ws AND st.ws + 3)
         |  WHERE rn = 1),
         |fpp AS (SELECT DISTINCT doc_id, h, pos FROM sel),
         |fp AS (SELECT DISTINCT doc_id, h FROM fpp),
         |hok AS (SELECT h FROM fp GROUP BY h HAVING count(*) <= 16),
         |pr AS (SELECT doc_a, doc_b, n_shared FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM fp a JOIN hok USING (h) JOIN fp b USING (h)
         |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
         |  WHERE n_shared >= 3
         |  ORDER BY n_shared DESC, doc_a, doc_b LIMIT 10),
         |vt AS (SELECT pr.doc_a, pr.doc_b, pr.n_shared,
         |    x.pos - y.pos AS d, CAST(count(*) AS BIGINT) AS nv
         |  FROM pr
         |  JOIN (SELECT fpp.* FROM fpp JOIN hok USING (h)) x
         |    ON x.doc_id = pr.doc_a
         |  JOIN (SELECT fpp.* FROM fpp JOIN hok USING (h)) y
         |    ON y.doc_id = pr.doc_b AND y.h = x.h
         |  GROUP BY 1, 2, 3, 4),
         |mx AS (SELECT doc_a, doc_b, n_shared, d, nv,
         |    CAST(sum(nv) OVER (PARTITION BY doc_a, doc_b) AS BIGINT)
         |      AS n_matches,
         |    row_number() OVER (PARTITION BY doc_a, doc_b
         |      ORDER BY nv DESC, d) AS rn
         |  FROM vt)
         |SELECT doc_a, doc_b, n_shared, n_matches,
         |  CAST(d AS INT) AS offset_mode, nv AS offset_support,
         |  CAST(round(CAST(CAST(nv AS DOUBLE)
         |    / CAST(n_matches AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS aligned_share
         |FROM mx WHERE rn = 1""".stripMargin,

    // Three unrolled greedy rounds: same (count desc, src) argmax,
    // same anti-membership against the covered set, same 4dp share.
    "q239_set_cover" ->
      s"""WITH tk AS (SELECT source AS src, $tokSql AS tk
         |  FROM documents),
         |sv AS (SELECT DISTINCT src, sh FROM (
         |  SELECT src, unnest(CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END) AS sh
         |  FROM tk)),
         |tot AS (SELECT CAST(count(DISTINCT sh) AS BIGINT) AS tot
         |  FROM sv),
         |c1 AS (SELECT src, CAST(count(*) AS BIGINT) AS c
         |  FROM sv GROUP BY 1),
         |r1 AS (SELECT src, c FROM c1 ORDER BY c DESC, src LIMIT 1),
         |cov1 AS (SELECT DISTINCT sh FROM sv
         |  WHERE src IN (SELECT src FROM r1)),
         |c2 AS (SELECT src, CAST(count(*) AS BIGINT) AS c FROM sv
         |  WHERE src NOT IN (SELECT src FROM r1)
         |    AND sh NOT IN (SELECT sh FROM cov1) GROUP BY 1),
         |r2 AS (SELECT src, c FROM c2 ORDER BY c DESC, src LIMIT 1),
         |cov2 AS (SELECT DISTINCT sh FROM sv
         |  WHERE src IN (SELECT src FROM r1 UNION ALL
         |    SELECT src FROM r2)),
         |c3 AS (SELECT src, CAST(count(*) AS BIGINT) AS c FROM sv
         |  WHERE src NOT IN (SELECT src FROM r1 UNION ALL
         |      SELECT src FROM r2)
         |    AND sh NOT IN (SELECT sh FROM cov2) GROUP BY 1),
         |r3 AS (SELECT src, c FROM c3 ORDER BY c DESC, src LIMIT 1),
         |sel AS (SELECT 1 AS rnd, src, c FROM r1
         |  UNION ALL SELECT 2, src, c FROM r2
         |  UNION ALL SELECT 3, src, c FROM r3)
         |SELECT CAST(rnd AS INT) AS "round", src AS source,
         |  c AS n_new,
         |  CAST(sum(c) OVER (ORDER BY rnd) AS BIGINT) AS n_cum,
         |  CAST(round(CAST(CAST(sum(c) OVER (ORDER BY rnd) AS DOUBLE)
         |    / CAST(tot AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    AS coverage
         |FROM sel CROSS JOIN tot""".stripMargin,

    // Same one-iteration Lloyd chain + nprobe=2 probe (q125's CTEs at
    // k=10), the SAME inlined cfp literals, same (query, neighbor)
    // match join and /1e7 snap.
    "q238_rbo" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a0 AS (${l2aSql("c0")}),
         |c1 AS (${l2MeanSql("a0")}),
         |a1 AS (${l2aSql("c1")}),
         |q AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |      ORDER BY ${h60("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT 100),
         |ap AS (SELECT qid, nid, rnk AS ra FROM (
         |  SELECT qc.qid, a.id AS nid,
         |    row_number() OVER (PARTITION BY qc.qid
         |      ORDER BY round(${sqdSql("qc.qv", "a.vec")}, 6), a.id)
         |      AS rnk
         |  FROM (SELECT qid, qv, cell FROM (
         |    SELECT q.id AS qid, q.vec AS qv, c.cid AS cell,
         |      row_number() OVER (PARTITION BY q.id
         |        ORDER BY round(${sqdSql("q.vec", "c.cvec")}, 6),
         |          c.cid) AS pr
         |    FROM q CROSS JOIN c1 c) WHERE pr <= 2) qc
         |  JOIN a1 a ON qc.cell = a.cell AND qc.qid != a.id)
         |  WHERE rnk <= 10),
         |tr AS (SELECT query_id, neighbor_id, rnk AS rb FROM (
         |  SELECT q.id AS query_id, c.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${sqdSql("q.vec", "c.embedding")}, 6),
         |        c.vec_id) AS rnk
         |  FROM q JOIN embeddings c ON q.id != c.vec_id)
         |  WHERE rnk <= 10),
         |mt AS (SELECT tr.query_id,
         |    ([${rboCfp(10).mkString(", ")}])[greatest(ap.ra, tr.rb)]
         |      AS cfp
         |  FROM tr JOIN ap ON ap.qid = tr.query_id
         |    AND ap.nid = tr.neighbor_id),
         |ag AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_common,
         |    CAST(sum(cfp) AS BIGINT) AS rbofp FROM mt GROUP BY 1)
         |SELECT q.id AS query_id,
         |  CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
         |  CAST(round(CAST(CAST(coalesce(rbofp, 0) AS DOUBLE) / 1e7
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS rbo
         |FROM q LEFT JOIN ag ON ag.query_id = q.id""".stripMargin,

    // q132's sessionize chain on each hash-split half, the same
    // (n desc, to_type) majority rule and weighted-accuracy snap.
    "q237_markov_eval" ->
      s"""WITH ev AS (SELECT user_id, ts, event_id, event_type,
         |    ${h60("'m' || CAST(user_id AS VARCHAR)")} % 4 AS sp
         |  FROM events),
         |mtr AS (SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
         |        > 1800 * 1000000 THEN 1
         |      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
         |      ELSE 0 END AS new_s
         |  FROM ev WHERE sp <> 0
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |str AS (SELECT user_id, ts, event_id, event_type,
         |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS session_id
         |  FROM mtr),
         |ptr AS (SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id, session_id
         |      ORDER BY ts, event_id) AS to_type
         |  FROM str),
         |ctr AS (SELECT from_type, to_type,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM ptr WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |model AS (SELECT from_type, to_type AS pred FROM (
         |  SELECT from_type, to_type, row_number() OVER (
         |      PARTITION BY from_type ORDER BY n DESC, to_type) AS rn
         |  FROM ctr) WHERE rn = 1),
         |mte AS (SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
         |        > 1800 * 1000000 THEN 1
         |      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
         |      ELSE 0 END AS new_s
         |  FROM ev WHERE sp = 0
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |ste AS (SELECT user_id, ts, event_id, event_type,
         |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS session_id
         |  FROM mte),
         |pte AS (SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id, session_id
         |      ORDER BY ts, event_id) AS to_type
         |  FROM ste),
         |cte_ AS (SELECT from_type, to_type,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM pte WHERE to_type IS NOT NULL GROUP BY 1, 2)
         |SELECT c.from_type, max(m.pred) AS pred,
         |  CAST(sum(c.n) AS BIGINT) AS n_test,
         |  CAST(sum(CASE WHEN c.to_type = m.pred THEN c.n ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  CASE WHEN max(m.pred) IS NULL THEN NULL ELSE
         |    CAST(round(CAST(
         |      CAST(sum(CASE WHEN c.to_type = m.pred THEN c.n ELSE 0
         |        END) AS DOUBLE) / CAST(sum(c.n) AS DOUBLE)
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS accuracy
         |FROM cte_ c LEFT JOIN model m ON m.from_type = c.from_type
         |GROUP BY 1""".stripMargin,

    // Same exact-moment σ, ×1e6 weight snap + integer micro-share
    // largest-remainder split, same md5 bottom-alloc draw.
    "q236_neyman" ->
      s"""WITH rws AS (SELECT event_type AS h,
         |    CAST(round(value * 100) AS BIGINT) AS v,
         |    CAST(event_id AS VARCHAR) AS k FROM events),
         |st AS (SELECT h, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(v AS HUGEINT)) AS sx,
         |    sum(CAST(v AS HUGEINT) * v) AS sxx
         |  FROM rws GROUP BY 1),
         |wt AS (SELECT h, n,
         |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE)
         |      AS sd,
         |    CAST(round(CAST(n AS DOUBLE)
         |      * (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |         / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS wfp
         |  FROM st),
         |ws AS (SELECT CAST(sum(wfp) AS BIGINT) AS wsum FROM wt),
         |sh AS (SELECT h, n, sd,
         |    CASE WHEN wsum = 0 THEN 0 ELSE
         |      CAST(round(CAST(500 AS DOUBLE) * CAST(wfp AS DOUBLE)
         |        * 1e6 / CAST(wsum AS DOUBLE)) AS BIGINT) END AS qfp
         |  FROM wt CROSS JOIN ws),
         |bs AS (SELECT h, n, sd,
         |    CAST((qfp - qfp % 1000000) / 1000000 AS BIGINT) AS base,
         |    qfp % 1000000 AS rem
         |  FROM sh),
         |df_ AS (SELECT greatest(0, 500 - CAST(sum(base) AS BIGINT))
         |    AS d FROM bs),
         |al AS (SELECT h, n, sd,
         |    base + (CASE WHEN row_number() OVER (ORDER BY rem DESC, h)
         |      <= d THEN 1 ELSE 0 END) AS alloc
         |  FROM bs CROSS JOIN df_),
         |sm AS (SELECT r.h, CAST(count(*) AS BIGINT) AS n_sampled,
         |    sum(CAST(v AS HUGEINT)) AS ssum
         |  FROM (SELECT h, v, row_number() OVER (PARTITION BY h
         |      ORDER BY ${h60("'s' || k")}, k) AS srn
         |    FROM rws) r JOIN al ON al.h = r.h
         |  WHERE r.srn <= al.alloc GROUP BY 1)
         |SELECT al.h, al.n,
         |  CAST(round(CAST(sd AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    AS sigma,
         |  CAST(al.alloc AS BIGINT) AS alloc,
         |  CAST(coalesce(sm.n_sampled, 0) AS BIGINT) AS n_sampled,
         |  CASE WHEN coalesce(sm.n_sampled, 0) = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(ssum AS DOUBLE)
         |      / CAST(sm.n_sampled AS DOUBLE) / CAST(100 AS DOUBLE)
         |      AS DECIMAL(20,10)), 2) AS DOUBLE) END AS mean_sample
         |FROM al LEFT JOIN sm ON sm.h = al.h""".stripMargin,

    // q142's canonical triangle enumeration verbatim, the same
    // degree/wedge aggregates, ×1e9 local-coefficient snaps.
    "q235_transitivity" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
        |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
        |  FROM docs CROSS JOIN nc
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
        |ue AS (SELECT DISTINCT least(src, dst) AS u,
        |    greatest(src, dst) AS v
        |  FROM e WHERE src <> dst),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM ue e1 JOIN ue e2 ON e2.u = e1.v
        |  JOIN ue e3 ON e3.u = e1.u AND e3.v = e2.v),
        |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
        |  SELECT u AS id FROM ue UNION ALL SELECT v FROM ue)
        |  GROUP BY 1),
        |tn AS (SELECT id, CAST(count(*) AS BIGINT) AS tri FROM (
        |  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri) GROUP BY 1),
        |nd AS (SELECT deg.id, deg.deg, coalesce(tn.tri, 0) AS tri
        |  FROM deg LEFT JOIN tn USING (id)),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(sum(tri) AS BIGINT) AS s3,
        |    CAST(sum(deg * (deg - 1)) AS BIGINT) AS w2 FROM nd),
        |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM ue),
        |lc AS (SELECT CAST(count(*) AS BIGINT) AS n2,
        |    CAST(sum(CAST(round(CAST(tri AS DOUBLE) * 2e9
        |      / CAST(deg * (deg - 1) AS DOUBLE)) AS BIGINT))
        |      AS BIGINT) AS scfp
        |  FROM nd WHERE deg >= 2)
        |SELECT n_nodes, n_edges,
        |  CAST(CAST(s3 - s3 % 3 AS DOUBLE) / 3 AS BIGINT)
        |    AS n_triangles,
        |  CAST(CAST(w2 - w2 % 2 AS DOUBLE) / 2 AS BIGINT) AS n_wedges,
        |  CASE WHEN w2 = 0 THEN NULL ELSE
        |    CAST(round(CAST(CAST(s3 * 2 AS DOUBLE)
        |      / CAST(w2 AS DOUBLE) AS DECIMAL(20,10)), 6) AS DOUBLE)
        |    END AS transitivity,
        |  CASE WHEN n2 = 0 THEN NULL ELSE
        |    CAST(round(CAST(CAST(scfp AS DOUBLE)
        |      / (CAST(n2 AS DOUBLE) * 1e9) AS DECIMAL(20,10)), 6)
        |      AS DOUBLE) END AS avg_local
        |FROM ag CROSS JOIN ne CROSS JOIN lc""".stripMargin,

    // q25's stopword-family scorer verbatim, then the full-outer
    // class margins and the exact 2·TP/(pred+support) F1 identity.
    "q234_langid_report" ->
      s"""WITH sc AS (
         |  SELECT lang,
         |    len(list_filter(tk, t -> t IN ('the','a','of','to','and'))) * 1.0 / len(tk) AS s_en,
         |    len(list_filter(tk, t -> t IN ('der','die','das','und','ein'))) * 1.0 / len(tk) AS s_de,
         |    len(list_filter(tk, t -> t IN ('el','la','de','y','que'))) * 1.0 / len(tk) AS s_es,
         |    len(list_filter(tk, t -> t IN ('le','la','de','et','les'))) * 1.0 / len(tk) AS s_fr
         |  FROM (SELECT lang, $tokSql AS tk FROM documents)
         |  WHERE len(tk) > 0),
         |pr AS (SELECT lang AS truth,
         |  CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |    WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |    WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |    WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |    ELSE 'fr' END AS pred
         |  FROM sc),
         |cells AS (SELECT truth, pred, CAST(count(*) AS BIGINT) AS o
         |  FROM pr GROUP BY 1, 2),
         |sup AS (SELECT truth AS cls, CAST(sum(o) AS BIGINT)
         |    AS support FROM cells GROUP BY 1),
         |prd AS (SELECT pred AS cls, CAST(sum(o) AS BIGINT)
         |    AS predicted FROM cells GROUP BY 1),
         |diag AS (SELECT truth AS cls, o AS tp FROM cells
         |  WHERE truth = pred),
         |j AS (SELECT cls, coalesce(support, 0) AS support,
         |    coalesce(predicted, 0) AS predicted,
         |    coalesce(tp, 0) AS tp
         |  FROM sup FULL OUTER JOIN prd USING (cls)
         |  LEFT JOIN diag USING (cls))
         |SELECT cls, support, predicted, tp,
         |  CASE WHEN predicted = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(tp AS DOUBLE)
         |      / CAST(predicted AS DOUBLE) AS DECIMAL(20,10)), 4)
         |      AS DOUBLE) END AS "precision",
         |  CASE WHEN support = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(tp AS DOUBLE)
         |      / CAST(support AS DOUBLE) AS DECIMAL(20,10)), 4)
         |      AS DOUBLE) END AS recall,
         |  CAST(round(CAST(CAST(tp * 2 AS DOUBLE)
         |    / CAST(predicted + support AS DOUBLE)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS f1
         |FROM j""".stripMargin,

    // Same descending-upper-rank decile snap (exact subtract-mod
    // ceil-div), same cumulative walk and 4dp rate/lift snaps.
    "q233_decile_lift" ->
      """WITH rws AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |bv AS (SELECT v, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) AS BIGINT) AS tot FROM rws GROUP BY 1),
        |rk AS (SELECT v, pos, tot,
        |    CAST(coalesce(sum(tot) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tot_below
        |  FROM bv),
        |tt AS (SELECT CAST(sum(pos) AS BIGINT) AS npos,
        |    CAST(sum(tot) AS BIGINT) AS n FROM bv),
        |td AS (SELECT
        |    CAST((((n - tot_below) * 10 + n - 1
        |      - (((n - tot_below) * 10 + n - 1) % n)) / n) AS BIGINT)
        |      AS decile,
        |    pos, tot, npos, n
        |  FROM rk CROSS JOIN tt),
        |ag AS (SELECT decile, CAST(sum(tot) AS BIGINT) AS n_d,
        |    CAST(sum(pos) AS BIGINT) AS pos_d,
        |    CAST(max(npos) AS BIGINT) AS npos,
        |    CAST(max(n) AS BIGINT) AS nn
        |  FROM td GROUP BY 1),
        |cm AS (SELECT decile, n_d, pos_d, npos, nn,
        |    CAST(sum(n_d) OVER wc AS BIGINT) AS cum_n,
        |    CAST(sum(pos_d) OVER wc AS BIGINT) AS cum_pos
        |  FROM ag WINDOW wc AS (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT decile, n_d AS n, pos_d AS n_pos, cum_n, cum_pos,
        |  CAST(round(CAST(CAST(cum_pos AS DOUBLE)
        |    / CAST(cum_n AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE)
        |    AS cum_rate,
        |  CASE WHEN npos = 0 THEN NULL ELSE
        |    CAST(round(CAST(
        |      CAST(CAST(cum_pos AS HUGEINT) * nn AS DOUBLE)
        |      / CAST(CAST(cum_n AS HUGEINT) * npos AS DOUBLE)
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS lift
        |FROM cm""".stripMargin,

    // Two independent two-iteration Lloyd chains (q215's helpers,
    // different seed windows), the same contingency-cell pair algebra
    // in HUGEINT, same snapped division and null-den convention.
    "q232_ari" ->
      s"""WITH c0a AS (SELECT vec_id AS cid, embedding AS cvec
         |             FROM embeddings WHERE vec_id < 16),
         |a0a AS (${l2aSql("c0a")}),
         |c1a AS (${l2MeanSql("a0a")}),
         |a1a AS (${l2aSql("c1a")}),
         |c2a AS (${l2MeanSql("a1a")}),
         |a2a AS (${l2aSql("c2a")}),
         |c0b AS (SELECT vec_id AS cid, embedding AS cvec
         |        FROM embeddings WHERE vec_id >= 100 AND vec_id < 116),
         |a0b AS (${l2aSql("c0b")}),
         |c1b AS (${l2MeanSql("a0b")}),
         |a1b AS (${l2aSql("c1b")}),
         |c2b AS (${l2MeanSql("a1b")}),
         |a2b AS (${l2aSql("c2b")}),
         |cl AS (SELECT x.cell AS ca, y.cell AS cb,
         |    CAST(count(*) AS BIGINT) AS nij
         |  FROM a2a x JOIN a2b y ON x.id = y.id GROUP BY 1, 2),
         |av AS (SELECT sum(CAST(ai AS HUGEINT) * (ai - 1)) AS a2,
         |    CAST(count(*) AS BIGINT) AS ka
         |  FROM (SELECT ca, CAST(sum(nij) AS BIGINT) AS ai
         |    FROM cl GROUP BY 1)),
         |bv AS (SELECT sum(CAST(bi AS HUGEINT) * (bi - 1)) AS b2,
         |    CAST(count(*) AS BIGINT) AS kb
         |  FROM (SELECT cb, CAST(sum(nij) AS BIGINT) AS bi
         |    FROM cl GROUP BY 1)),
         |cv AS (SELECT sum(CAST(nij AS HUGEINT) * (nij - 1)) AS c2,
         |    CAST(sum(nij) AS BIGINT) AS n FROM cl)
         |SELECT n, ka, kb,
         |  CASE WHEN CAST(n AS HUGEINT) * (n - 1) * (a2 + b2)
         |      - 2 * a2 * b2 = 0 THEN NULL
         |    ELSE CAST(round(CAST(
         |      CAST(2 * CAST(n AS HUGEINT) * (n - 1) * c2
         |        - 2 * a2 * b2 AS DOUBLE)
         |      / CAST(CAST(n AS HUGEINT) * (n - 1) * (a2 + b2)
         |        - 2 * a2 * b2 AS DOUBLE)
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS ari
         |FROM cv CROSS JOIN av CROSS JOIN bv""".stripMargin,

    // Same (ts, event_id)-ordered µs gaps, HUGEINT moments, the same
    // n-cancelled B expression with one sqrt, same 4dp snap.
    "q231_burstiness" ->
      """WITH g AS (SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS g
        |  FROM events),
        |mm AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    sum(CAST(g AS HUGEINT)) AS sx,
        |    sum(CAST(g AS HUGEINT) * g) AS sxx
        |  FROM g WHERE g IS NOT NULL GROUP BY 1
        |  HAVING count(*) >= 4)
        |SELECT user_id, n_gaps,
        |  CASE WHEN sqrt(CAST(n_gaps * sxx - sx * sx AS DOUBLE))
        |      + CAST(sx AS DOUBLE) = 0 THEN NULL
        |    ELSE CAST(round(CAST(
        |      (sqrt(CAST(n_gaps * sxx - sx * sx AS DOUBLE))
        |        - CAST(sx AS DOUBLE))
        |      / (sqrt(CAST(n_gaps * sxx - sx * sx AS DOUBLE))
        |        + CAST(sx AS DOUBLE))
        |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS b
        |FROM mm""".stripMargin,

    // q132's sessionize/lead chain verbatim, then the ×1e9 entropy
    // snap per (from, to) cell and the per-state aggregate.
    "q230_transition_entropy" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |        > 1800 * 1000000 THEN 1
        |      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |      ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, event_id, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM m),
        |pr AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id, session_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM s),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |nf AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out,
        |    CAST(count(*) AS BIGINT) AS n_next FROM c GROUP BY 1),
        |tm AS (SELECT c.from_type, nf.n_out, nf.n_next,
        |    CAST(round(CAST(n AS DOUBLE) / CAST(n_out AS DOUBLE)
        |      * ln(CAST(n AS DOUBLE) / CAST(n_out AS DOUBLE)) * 1e9)
        |      AS BIGINT) AS tfp
        |  FROM c JOIN nf USING (from_type))
        |SELECT from_type, n_out, n_next,
        |  CAST(round(CAST(CAST(-sum(tfp) AS DOUBLE) / 1e9
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS entropy
        |FROM tm GROUP BY 1, 2, 3""".stripMargin,

    // Same inclusive-left prefix counts, the same ×1e9 weighted
    // purity expression term-for-term, same (gfp desc, v) head.
    "q229_gini_stump" ->
      """WITH rws AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |bv AS (SELECT v, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) AS BIGINT) AS tot FROM rws GROUP BY 1),
        |rk AS (SELECT v, pos, tot,
        |    CAST(coalesce(sum(pos) OVER w, 0) AS BIGINT) AS pos_below,
        |    CAST(coalesce(sum(tot) OVER w, 0) AS BIGINT) AS tot_below
        |  FROM bv WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |tt AS (SELECT CAST(sum(pos) AS BIGINT) AS npos,
        |    CAST(sum(tot) AS BIGINT) AS n FROM bv),
        |sc AS (SELECT v, npos, n,
        |    pos_below + pos AS posl, tot_below + tot AS nl,
        |    npos - (pos_below + pos) AS posr,
        |    n - (tot_below + tot) AS nr
        |  FROM rk CROSS JOIN tt WHERE tot_below + tot < n),
        |gg AS (SELECT v, npos, n,
        |    CAST(round((CAST(CAST(posl AS HUGEINT) * posl
        |        + CAST(nl - posl AS HUGEINT) * (nl - posl) AS DOUBLE)
        |        / CAST(CAST(nl AS HUGEINT) * n AS DOUBLE)
        |      + CAST(CAST(posr AS HUGEINT) * posr
        |        + CAST(nr - posr AS HUGEINT) * (nr - posr) AS DOUBLE)
        |        / CAST(CAST(nr AS HUGEINT) * n AS DOUBLE)) * 1e9)
        |      AS BIGINT) AS gfp
        |  FROM sc),
        |best AS (SELECT *,
        |    CAST(round(CAST(CAST(npos AS HUGEINT) * npos
        |      + CAST(n - npos AS HUGEINT) * (n - npos) AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) * 1e9)
        |      AS BIGINT) AS pfp
        |  FROM gg ORDER BY gfp DESC, v LIMIT 1)
        |SELECT n, npos AS n_pos, v AS threshold,
        |  CAST(round(CAST(CAST(1000000000 - pfp AS DOUBLE) / 1e9
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS gini_parent,
        |  CAST(round(CAST(CAST(1000000000 - gfp AS DOUBLE) / 1e9
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS gini_split,
        |  CAST(round(CAST(CAST(gfp - pfp AS DOUBLE) / 1e9
        |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS gain
        |FROM best""".stripMargin,

    // Same two-iteration Lloyd chain (q215's CTE helpers), same
    // (o desc, label) majority pick and ×1e9 entropy snaps.
    "q228_cluster_purity" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a0 AS (${l2aSql("c0")}),
         |c1 AS (${l2MeanSql("a0")}),
         |a1 AS (${l2aSql("c1")}),
         |c2 AS (${l2MeanSql("a1")}),
         |a2 AS (${l2aSql("c2")}),
         |cl AS (SELECT a2.cell, e.label, CAST(count(*) AS BIGINT) AS o
         |  FROM a2 JOIN embeddings e ON e.vec_id = a2.id
         |  GROUP BY 1, 2),
         |nc AS (SELECT cell, CAST(sum(o) AS BIGINT) AS n
         |  FROM cl GROUP BY 1),
         |top AS (SELECT cell, label AS top_label, o AS n_top FROM (
         |  SELECT cell, label, o, row_number() OVER (PARTITION BY cell
         |      ORDER BY o DESC, label) AS rn FROM cl) WHERE rn = 1),
         |ent AS (SELECT cell,
         |    CAST(-sum(CAST(round(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
         |      * ln(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9)
         |      AS BIGINT)) AS BIGINT) AS efp
         |  FROM cl JOIN nc USING (cell) GROUP BY 1)
         |SELECT nc.cell AS cid, n, top_label, n_top,
         |  CAST(round(CAST(CAST(n_top AS DOUBLE) / CAST(n AS DOUBLE)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS purity,
         |  CAST(round(CAST(CAST(efp AS DOUBLE) / 1e9
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS entropy
         |FROM nc JOIN top USING (cell) JOIN ent USING (cell)""".stripMargin,

    // Same md5-hash block/selection routing, micro-cent replicate
    // snaps, exact ceil-div order-statistic picks, HUGEINT moments.
    "q227_block_bootstrap" ->
      s"""WITH rws AS (SELECT
         |    ${h60("'u' || CAST(user_id AS VARCHAR)")} % 50 AS blk,
         |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
         |blocks AS (SELECT blk, sum(CAST(v AS HUGEINT)) AS s,
         |    CAST(count(*) AS BIGINT) AS c FROM rws GROUP BY 1),
         |grid AS (SELECT t.b AS b,
         |    ${h60("'r' || CAST(t.b AS VARCHAR) || ':' || CAST(u.i AS VARCHAR)")}
         |      % 50 AS blk
         |  FROM range(0, 200) t(b) CROSS JOIN range(0, 50) u(i)),
         |reps AS (SELECT b, sum(s) AS ss, sum(c) AS cc
         |  FROM grid JOIN blocks USING (blk) GROUP BY 1
         |  HAVING sum(c) > 0),
         |rm AS (SELECT b, CAST(round(CAST(ss AS DOUBLE)
         |    / CAST(cc AS DOUBLE) * 1e6) AS BIGINT) AS mfp FROM reps),
         |rk AS (SELECT b, mfp,
         |    row_number() OVER (ORDER BY mfp, b) AS rn FROM rm),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS nb,
         |    sum(CAST(mfp AS HUGEINT)) AS sx,
         |    sum(CAST(mfp AS HUGEINT) * mfp) AS sxx FROM rm),
         |ci AS (SELECT nb, sx, sxx,
         |    max(CASE WHEN rn = CAST(((nb * 25 + 999)
         |      - ((nb * 25 + 999) % 1000)) / 1000 AS BIGINT)
         |      THEN mfp END) AS lofp,
         |    max(CASE WHEN rn = CAST(((nb * 975 + 999)
         |      - ((nb * 975 + 999) % 1000)) / 1000 AS BIGINT)
         |      THEN mfp END) AS hifp
         |  FROM rk CROSS JOIN st GROUP BY 1, 2, 3),
         |fl AS (SELECT sum(CAST(v AS HUGEINT)) AS stt,
         |    CAST(count(*) AS BIGINT) AS ct,
         |    CAST(count(DISTINCT blk) AS BIGINT) AS nblk FROM rws)
         |SELECT ct AS n_rows, nblk AS n_blocks, nb AS n_reps,
         |  CAST(round(CAST(CAST(stt AS DOUBLE) / CAST(ct AS DOUBLE)
         |    / CAST(100 AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE)
         |    AS mean_full,
         |  CAST(round(CAST(CAST(lofp AS DOUBLE) / 1e8
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS ci_lo,
         |  CAST(round(CAST(CAST(hifp AS DOUBLE) / 1e8
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS ci_hi,
         |  CAST(round(CAST(sqrt(CAST(nb * sxx - sx * sx AS DOUBLE)
         |    / CAST(nb * (nb - 1) AS DOUBLE)) / 1e8
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS se
         |FROM fl CROSS JOIN ci WHERE ct > 0""".stripMargin,

    // Same tier thresholds, subtract-mod TTR floor-div, the same
    // exact κ integer algebra through HUGEINT, same snaps.
    "q226_kappa" ->
      s"""WITH rated AS (SELECT
         |    CASE WHEN n_chars < 250 THEN 0 WHEN n_chars < 400 THEN 1
         |      ELSE 2 END AS a,
         |    CASE WHEN rfp < 400 THEN 0 WHEN rfp < 550 THEN 1
         |      ELSE 2 END AS b
         |  FROM (SELECT n_chars,
         |      CASE WHEN len(tk) = 0 THEN 0 ELSE
         |        CAST(((CAST(len(list_distinct(tk)) AS BIGINT) * 1000
         |          - (CAST(len(list_distinct(tk)) AS BIGINT) * 1000
         |             % len(tk))) / len(tk)) AS BIGINT) END AS rfp
         |    FROM (SELECT n_chars, $tokSql AS tk FROM documents))),
         |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
         |  FROM rated GROUP BY 1, 2),
         |ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra
         |  FROM cells GROUP BY 1),
         |cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb
         |  FROM cells GROUP BY 1),
         |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
         |ag AS (SELECT CAST(coalesce(sum(o), 0) AS BIGINT) AS agree
         |  FROM cells WHERE a = b),
         |sp AS (SELECT CAST(coalesce(sum(CAST(ra AS HUGEINT) * cb), 0)
         |    AS HUGEINT) AS spc
         |  FROM ra JOIN cb ON ra.a = cb.b)
         |SELECT n, agree,
         |  CAST(round(CAST(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS po,
         |  CAST(round(CAST(CAST(spc AS DOUBLE)
         |    / CAST(CAST(n AS HUGEINT) * n AS DOUBLE)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS pe,
         |  CASE WHEN CAST(n AS HUGEINT) * n = spc THEN NULL ELSE
         |    CAST(round(CAST(
         |      CAST(CAST(n AS HUGEINT) * agree - spc AS DOUBLE)
         |      / CAST(CAST(n AS HUGEINT) * n - spc AS DOUBLE)
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS kappa
         |FROM nn CROSS JOIN ag CROSS JOIN sp""".stripMargin,

    // Same (cnt desc, u) top-51 cut, ×1e6 ln snaps pre-sum, one
    // double division through the DECIMAL snap.
    "q225_hill_tail" ->
      s"""WITH tk AS (SELECT $tokSql AS tk FROM documents),
         |tok AS (SELECT unnest(CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END) AS u
         |  FROM tk),
         |vf AS (SELECT u, CAST(count(*) AS BIGINT) AS cnt
         |  FROM tok GROUP BY 1),
         |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM vf),
         |top AS (SELECT u, cnt FROM vf ORDER BY cnt DESC, u LIMIT 51),
         |rk AS (SELECT cnt,
         |    row_number() OVER (ORDER BY cnt DESC, u) AS rnk,
         |    CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT)
         |      AS lfp
         |  FROM top),
         |tl AS (SELECT cnt AS x_tail, lfp AS lt FROM rk WHERE rnk = 51),
         |s AS (SELECT x_tail, CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(lfp - lt) AS BIGINT) AS sfp
         |  FROM rk CROSS JOIN tl WHERE rnk <= 50 GROUP BY 1)
         |SELECT n_vocab, k, x_tail,
         |  CASE WHEN sfp = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(k AS DOUBLE) * 1e6
         |      / CAST(sfp AS DOUBLE) AS DECIMAL(20,10)), 6) AS DOUBLE)
         |    END AS alpha
         |FROM s CROSS JOIN nv""".stripMargin,

    // Same one-iteration Lloyd chain and within-cell rounded-cosine
    // top-5, reverse-edge EXISTS for mutuality, same per-label
    // aggregate and snap.
    "q224_mutual_knn" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS cvec
         |            FROM embeddings WHERE vec_id < 16),
         |a0 AS (${l2aSql("c0")}),
         |c1 AS (${l2MeanSql("a0")}),
         |a1 AS (${l2aSql("c1")}),
         |knn AS (SELECT query_id, neighbor_id FROM (
         |  SELECT x.id AS query_id, y.id AS neighbor_id,
         |    row_number() OVER (PARTITION BY x.id
         |      ORDER BY round(${cosSql("x.vec", "y.vec")},
         |        6) DESC, y.id) AS rnk
         |  FROM a1 x JOIN a1 y
         |    ON x.cell = y.cell AND x.id != y.id)
         |  WHERE rnk <= 5),
         |mut AS (SELECT a.query_id FROM knn a
         |  WHERE EXISTS (SELECT 1 FROM knn b
         |    WHERE b.query_id = a.neighbor_id
         |      AND b.neighbor_id = a.query_id)),
         |pn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS deg
         |  FROM knn GROUP BY 1),
         |pm AS (SELECT query_id, CAST(count(*) AS BIGINT) AS mdeg
         |  FROM mut GROUP BY 1)
         |SELECT e.label, CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(deg) AS BIGINT) AS n_edges,
         |  CAST(sum(coalesce(mdeg, 0)) AS BIGINT) AS n_mutual,
         |  CAST(round(CAST(CAST(sum(coalesce(mdeg, 0)) AS DOUBLE)
         |    / CAST(sum(deg) AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS reciprocity
         |FROM pn JOIN embeddings e ON e.vec_id = pn.query_id
         |LEFT JOIN pm ON pm.query_id = pn.query_id
         |GROUP BY 1""".stripMargin,

    // Same upper-rank → 100-bin snap (exact subtract-mod ceil-div),
    // same pooled-range reference lookup, same aggregate snaps.
    "q223_quantile_norm" ->
      """WITH rws AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
        |  FROM documents),
        |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM rws GROUP BY 1, 2),
        |rk AS (SELECT g, v, cnt,
        |    CAST(coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below,
        |    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS ng
        |  FROM gv),
        |bb AS (SELECT g, v, cnt,
        |    CAST((((below + cnt) * 100 + ng - 1
        |      - (((below + cnt) * 100 + ng - 1) % ng)) / ng)
        |      AS BIGINT) AS b
        |  FROM rk),
        |pv AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS cnt
        |  FROM gv GROUP BY 1),
        |pr AS (SELECT v, cnt,
        |    CAST(coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below
        |  FROM pv),
        |nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tot FROM pv),
        |grid AS (SELECT CAST(t.b AS BIGINT) AS b,
        |    CAST(((t.b * n_tot + 99 - ((t.b * n_tot + 99) % 100))
        |      / 100) AS BIGINT) AS p
        |  FROM range(1, 101) t(b) CROSS JOIN nt),
        |ref AS (SELECT grid.b, pr.v AS v_norm FROM pr JOIN grid
        |  ON grid.p > pr.below AND grid.p <= pr.below + pr.cnt),
        |mp AS (SELECT g, v, cnt, v_norm FROM bb JOIN ref USING (b))
        |SELECT g AS source, CAST(sum(cnt) AS BIGINT) AS n,
        |  CAST(round(CAST(CAST(sum(CAST(v AS HUGEINT) * cnt)
        |    AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS mean_before,
        |  CAST(round(CAST(CAST(sum(CAST(v_norm AS HUGEINT) * cnt)
        |    AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS mean_after,
        |  CAST(sum(CASE WHEN v <> v_norm THEN cnt ELSE 0 END)
        |    AS BIGINT) AS n_changed,
        |  min(v_norm) AS norm_min, max(v_norm) AS norm_max
        |FROM mp GROUP BY 1""".stripMargin,

    // Same daily-cents collapse, HUGEINT prefix/total sums, the same
    // normalized-gain double expression term-for-term (×1e9 snap),
    // same (gfp desc, ord) argmax tie break.
    "q222_changepoint" ->
      """WITH daily AS (SELECT o_orderpriority AS g,
        |    CAST(o_orderdate AS DATE) AS ord,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
        |  FROM orders GROUP BY 1, 2),
        |pre AS (SELECT g, ord, v,
        |    row_number() OVER (PARTITION BY g ORDER BY ord) AS i,
        |    sum(CAST(v AS HUGEINT)) OVER (PARTITION BY g ORDER BY ord
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS si,
        |    count(*) OVER (PARTITION BY g) AS n,
        |    sum(CAST(v AS HUGEINT)) OVER (PARTITION BY g) AS st
        |  FROM daily),
        |sc AS (SELECT g, ord, i, n, si, st, st - si AS sr,
        |    CAST(round((CAST(n * si * si AS DOUBLE)
        |        / CAST(i * st * st AS DOUBLE)
        |      + CAST(n * (st - si) * (st - si) AS DOUBLE)
        |        / CAST((n - i) * st * st AS DOUBLE)
        |      - CAST(1 AS DOUBLE)) * 1e9) AS BIGINT) AS gfp
        |  FROM pre WHERE i < n AND st <> 0),
        |pick AS (SELECT *, row_number() OVER (PARTITION BY g
        |    ORDER BY gfp DESC, ord) AS rn FROM sc)
        |SELECT g, CAST(n AS BIGINT) AS n_points, ord AS split_ord,
        |  CAST(round(CAST(CAST(gfp AS DOUBLE) / 1e9
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS gain_norm,
        |  CAST(round(CAST(CAST(si AS DOUBLE) / CAST(i AS DOUBLE)
        |    / CAST(100 AS DOUBLE) AS DECIMAL(20,10)), 2) AS DOUBLE)
        |    AS mean_left,
        |  CAST(round(CAST(CAST(sr AS DOUBLE) / CAST(n - i AS DOUBLE)
        |    / CAST(100 AS DOUBLE) AS DECIMAL(20,10)), 2) AS DOUBLE)
        |    AS mean_right
        |FROM pick WHERE rn = 1""".stripMargin,

    // Same (cnt desc, tok) head cut and ranking, same ×1e6 ln snaps,
    // q152's HUGEINT moment algebra and rounding chain.
    "q209_zipf_fit" ->
      s"""WITH tok AS (SELECT unnest($tokSql) AS tok FROM documents),
         |vf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM tok GROUP BY 1),
         |top AS (SELECT tok, cnt FROM vf ORDER BY cnt DESC, tok
         |  LIMIT 100),
         |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok)
         |    AS rnk FROM top),
         |pts AS (SELECT
         |    CAST(round(1e6 * ln(CAST(rnk AS DOUBLE))) AS BIGINT) AS x,
         |    CAST(round(1e6 * ln(CAST(cnt AS DOUBLE))) AS BIGINT) AS y
         |  FROM rk),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         |    sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
         |    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
         |  FROM pts)
         |SELECT 'top100' AS corpus, n,
         |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
         |      / CAST(n * sxx - sx * sx AS DOUBLE)
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS slope,
         |  CASE WHEN n * sxx - sx * sx = 0
         |      OR n * syy - sy * sy = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
         |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
         |        * CAST(n * syy - sy * sy AS DOUBLE))
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS r
         |FROM m""".stripMargin,

    // Truth = brute-force all-pairs levenshtein <= 2 on the distinct
    // vocabulary (the engine's segment blocking must equal it —
    // recall 1 by construction); first-char adds the equal-head
    // predicate; SN reuses q205's global-rank window construction.
    "q211_blocking_recall" ->
      """WITH p4 AS (SELECT p_partkey, p_name FROM part
        |  WHERE p_partkey % 4 = 0),
        |vars AS (SELECT p_name AS nm FROM p4
        |  UNION ALL SELECT
        |    substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
        |      || substr(p_name,
        |        CAST(p_partkey % length(p_name) AS INT) + 2) AS nm
        |  FROM p4),
        |nm AS (SELECT DISTINCT nm FROM vars),
        |tr AS (SELECT a.nm AS a, b.nm AS b FROM nm a JOIN nm b
        |  ON a.nm < b.nm AND levenshtein(a.nm, b.nm) <= 2),
        |fc AS (SELECT * FROM tr
        |  WHERE substr(a, 1, 1) = substr(b, 1, 1)),
        |rk AS (SELECT nm, row_number() OVER (ORDER BY nm) - 1 AS rk
        |  FROM nm),
        |snp AS (SELECT ra.nm AS a, rb.nm AS b FROM rk ra JOIN rk rb
        |  ON rb.rk > ra.rk AND rb.rk - ra.rk <= 7
        |    AND levenshtein(ra.nm, rb.nm) <= 2),
        |cts AS (SELECT 'segments' AS family,
        |    CAST(count(*) AS BIGINT) AS n_pairs FROM tr
        |  UNION ALL SELECT 'first_char', CAST(count(*) AS BIGINT)
        |    FROM fc
        |  UNION ALL SELECT 'sorted_neighborhood',
        |    CAST(count(*) AS BIGINT) FROM snp),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM tr)
        |SELECT family, n_pairs,
        |  CAST(round(CAST(CAST(n_pairs AS DOUBLE)
        |    / CAST(n_truth AS DOUBLE) AS DECIMAL(20,10)), 6)
        |    AS DOUBLE) AS recall
        |FROM cts CROSS JOIN tot""".stripMargin,

    // Independent formulation on the same cell grid: canonical-order
    // cell self-join for C/D mass, doubled marginal tie terms, the
    // 2(C−D)/√ double chain with the same DECIMAL(20,10) snap.
    "q210_kendall_tau" ->
      s"""WITH r AS (SELECT source AS g,
         |    CAST(len($tokSql) AS BIGINT) AS x,
         |    CAST(length(text) // 16 AS BIGINT) AS y FROM documents),
         |cells AS (SELECT g, x, y, CAST(count(*) AS BIGINT) AS w
         |  FROM r GROUP BY 1, 2, 3),
         |prs AS (SELECT a.g AS g,
         |    sum(CASE WHEN a.x < b.x AND a.y < b.y
         |      THEN CAST(a.w AS HUGEINT) * b.w ELSE 0 END) AS cc,
         |    sum(CASE WHEN a.x < b.x AND a.y > b.y
         |      THEN CAST(a.w AS HUGEINT) * b.w ELSE 0 END) AS dd
         |  FROM cells a JOIN cells b ON a.g = b.g
         |    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
         |  GROUP BY 1),
         |t1 AS (SELECT g, sum(CAST(t AS HUGEINT) * (t - 1)) AS n1d
         |  FROM (SELECT g, x, CAST(sum(w) AS BIGINT) AS t
         |    FROM cells GROUP BY 1, 2) GROUP BY 1),
         |t2 AS (SELECT g, sum(CAST(t AS HUGEINT) * (t - 1)) AS n2d
         |  FROM (SELECT g, y, CAST(sum(w) AS BIGINT) AS t
         |    FROM cells GROUP BY 1, 2) GROUP BY 1),
         |nn AS (SELECT g, CAST(sum(w) AS BIGINT) AS n
         |  FROM cells GROUP BY 1)
         |SELECT nn.g AS source, nn.n,
         |  CAST(coalesce(cc, 0) AS BIGINT) AS concordant,
         |  CAST(coalesce(dd, 0) AS BIGINT) AS discordant,
         |  CASE WHEN CAST(n AS HUGEINT) * (n - 1) - n1d = 0
         |      OR CAST(n AS HUGEINT) * (n - 1) - n2d = 0 THEN NULL
         |    ELSE CAST(round(CAST(
         |      CAST(2 * (coalesce(cc, 0) - coalesce(dd, 0)) AS DOUBLE)
         |      / sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - n1d AS DOUBLE)
         |        * CAST(CAST(n AS HUGEINT) * (n - 1) - n2d AS DOUBLE))
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS tau_b
         |FROM nn JOIN t1 USING (g) JOIN t2 USING (g)
         |LEFT JOIN prs USING (g)""".stripMargin,

    // Lag windows over the same (symbol, day) collapse, HUGEINT
    // moments, q194's double chain.
    "q204_acf" ->
      """WITH srs AS (SELECT l_partkey AS symbol,
        |    CAST(l_shipdate AS DATE) AS d,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |lagd AS (SELECT symbol, v AS y,
        |    lag(v, 1) OVER w AS l1, lag(v, 2) OVER w AS l2,
        |    lag(v, 3) OVER w AS l3
        |  FROM srs WINDOW w AS (PARTITION BY symbol ORDER BY d)),
        |p AS (SELECT symbol, 1 AS lag, l1 AS x, y FROM lagd
        |    WHERE l1 IS NOT NULL
        |  UNION ALL SELECT symbol, 2, l2, y FROM lagd
        |    WHERE l2 IS NOT NULL
        |  UNION ALL SELECT symbol, 3, l3, y FROM lagd
        |    WHERE l3 IS NOT NULL),
        |m AS (SELECT symbol, lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        |  FROM p GROUP BY 1, 2)
        |SELECT symbol, lag, n,
        |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
        |    THEN NULL ELSE
        |    CAST(round(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |        * CAST(n * syy - sy * sy AS DOUBLE))
        |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS acf
        |FROM m""".stripMargin,

    // Independent PSL computation: last-2/last-3 label split by
    // membership of the host's 2-label tail in the same literal
    // suffix set (every fixture host is 3+ labels with at most a
    // 2-label public suffix, so the CASE is the full rule here).
    "q198_psl_domains" ->
      """WITH u AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0
        |        THEN 'app-' || source || '.github.io'
        |      WHEN doc_id % 4 = 1 THEN 'www.' || source || '-ltd.co.uk'
        |      WHEN doc_id % 4 = 2 THEN 'cdn.' || source || '-site.net'
        |      ELSE 'mail.' || source || '.ca.us' END AS host0
        |  FROM documents),
        |h AS (SELECT doc_id, regexp_replace(host0, '^www\\.', '')
        |    AS host FROM u),
        |l AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM h),
        |d AS (SELECT doc_id, host,
        |    CASE WHEN array_to_string(ls[len(ls)-1:], '.')
        |        IN ('co.uk', 'github.io', 'ca.us')
        |      THEN array_to_string(ls[len(ls)-2:], '.')
        |      ELSE array_to_string(ls[len(ls)-1:], '.') END AS domain
        |  FROM l)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs
        |FROM d GROUP BY 1""".stripMargin,

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

    // Three unrolled time-respecting rounds (full expansion, which the
    // min-merge makes equivalent to the engine's frontier-only form).
    "q193_temporal_bfs" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e0 AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |e AS (SELECT src, dst,
         |    CAST((src * 31 + dst * 17) % 1000 AS BIGINT) AS ts
         |  FROM e0),
         |a0 AS (SELECT doc_id AS id, CAST(0 AS BIGINT) AS arrival
         |  FROM documents WHERE doc_id % 97 = 0),
         |${tbfsIterSql("a0", "a1")},
         |${tbfsIterSql("a1", "a2")},
         |${tbfsIterSql("a2", "a3")}
         |SELECT id AS doc_id, arrival FROM a3
         |ORDER BY arrival, id LIMIT 25""".stripMargin,

    // Same symmetrized degree pairs, same five-moment normal-equation
    // algebra (q152's), same null guards.
    "q194_assortativity" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |ue AS (SELECT DISTINCT least(src, dst) AS u,
         |    greatest(src, dst) AS v
         |  FROM e WHERE src <> dst),
         |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT u AS id FROM ue UNION ALL SELECT v FROM ue)
         |  GROUP BY 1),
         |sym AS (SELECT u, v FROM ue UNION ALL SELECT v, u FROM ue),
         |p AS (SELECT du.deg AS x, dv.deg AS y
         |  FROM sym JOIN deg du ON sym.u = du.id
         |  JOIN deg dv ON sym.v = dv.id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM p)
         |SELECT n,
         |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
         |      / CAST(n * sxx - sx * sx AS DOUBLE)
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS slope,
         |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
         |    THEN NULL ELSE
         |    CAST(round(CAST(CAST(n * sxy - sx * sy AS DOUBLE)
         |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
         |        * CAST(n * syy - sy * sy AS DOUBLE))
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) END AS r
         |FROM m""".stripMargin,

    // Two unrolled LPA sweeps over the same generated edge set (both
    // directions, self-loops out), same (size desc, community) cutoff.
    // q174's LPA CTEs verbatim; canonical distinct pairs, exact
    // HUGEINT Σ(4m·e_c − d_c²), one division by 4m².
    "q219_modularity" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |eu AS (SELECT src, dst FROM e WHERE src <> dst
         |  UNION ALL SELECT dst, src FROM e WHERE src <> dst),
         |nodes AS (SELECT DISTINCT src AS id FROM eu),
         |l0 AS (SELECT id, id AS lbl FROM nodes),
         |${lpaIterSql("l0", "l1")},
         |${lpaIterSql("l1", "l2")},
         |ue2 AS (SELECT DISTINCT least(src, dst) AS a,
         |    greatest(src, dst) AS b FROM e WHERE src <> dst),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM ue2),
         |ej AS (SELECT la.lbl AS ca, lb.lbl AS cb FROM ue2
         |  JOIN l2 la ON ue2.a = la.id JOIN l2 lb ON ue2.b = lb.id),
         |ec AS (SELECT ca AS c, CAST(count(*) AS BIGINT) AS e_c
         |  FROM ej WHERE ca = cb GROUP BY 1),
         |dg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT a AS id FROM ue2 UNION ALL SELECT b FROM ue2)
         |  GROUP BY 1),
         |dc AS (SELECT l2.lbl AS c, CAST(sum(dg.deg) AS BIGINT) AS d_c
         |  FROM dg JOIN l2 ON dg.id = l2.id GROUP BY 1),
         |terms AS (SELECT m_edges,
         |    CAST(4 AS HUGEINT) * m_edges * coalesce(e_c, 0)
         |      - CAST(d_c AS HUGEINT) * d_c AS num
         |  FROM dc LEFT JOIN ec USING (c) CROSS JOIN mm)
         |SELECT m_edges, CAST(count(*) AS BIGINT) AS n_comms,
         |  CAST(round(CAST(CAST(sum(num) AS DOUBLE)
         |    / CAST(CAST(4 AS HUGEINT) * m_edges * m_edges AS DOUBLE)
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS modularity
         |FROM terms GROUP BY 1""".stripMargin,

    // Same symmetrized-distinct adjacency; wedge join through the
    // middle endpoint, direct-neighbor/self exclusion, per-node
    // distinct counts, identical rollup.
    "q217_two_hop" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e0 AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |sym AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM e0 WHERE src <> dst
         |  UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)),
         |oneh AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS n_1hop
         |  FROM sym GROUP BY 1),
         |wed AS (SELECT DISTINCT a.src AS id, b.dst AS nb
         |  FROM sym a JOIN sym b ON a.dst = b.src AND b.dst <> a.src),
         |twoh AS (SELECT w.id, CAST(count(*) AS BIGINT) AS n_2hop
         |  FROM wed w ANTI JOIN sym s ON w.id = s.src AND w.nb = s.dst
         |  GROUP BY 1),
         |per AS (SELECT o.id, o.n_1hop, coalesce(t.n_2hop, 0) AS n_2hop
         |  FROM oneh o LEFT JOIN twoh t ON o.id = t.id)
         |SELECT n_1hop, n_2hop, CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(id) AS BIGINT) AS id_sum
         |FROM per GROUP BY 1, 2""".stripMargin,

    // Same symmetrized-distinct induced subgraph, three unrolled peel
    // rounds, per-degree rollup with id-sum fingerprint.
    "q216_kcore" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e0 AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |sym AS (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM e0 WHERE src <> dst
         |  UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)),
         |d1 AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |  FROM sym GROUP BY 1),
         |a1 AS (SELECT src AS id, deg FROM d1 WHERE deg >= 6),
         |e2 AS (SELECT s.src, s.dst FROM sym s
         |  JOIN a1 x ON s.src = x.id JOIN a1 y ON s.dst = y.id),
         |d2 AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |  FROM e2 GROUP BY 1),
         |a2 AS (SELECT src AS id, deg FROM d2 WHERE deg >= 6),
         |e3 AS (SELECT s.src, s.dst FROM sym s
         |  JOIN a2 x ON s.src = x.id JOIN a2 y ON s.dst = y.id),
         |d3 AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |  FROM e3 GROUP BY 1),
         |a3 AS (SELECT src AS id, deg FROM d3 WHERE deg >= 6)
         |SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(id) AS BIGINT) AS id_sum
         |FROM a3 GROUP BY 1""".stripMargin,

    "q174_label_prop" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM docs),
         |e AS (SELECT doc_id AS src, (doc_id * 7 + k * 13) % nn AS dst
         |  FROM docs CROSS JOIN nc
         |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)),
         |eu AS (SELECT src, dst FROM e WHERE src <> dst
         |  UNION ALL SELECT dst, src FROM e WHERE src <> dst),
         |nodes AS (SELECT DISTINCT src AS id FROM eu),
         |l0 AS (SELECT id, id AS lbl FROM nodes),
         |${lpaIterSql("l0", "l1")},
         |${lpaIterSql("l1", "l2")}
         |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
         |FROM l2 GROUP BY 1
         |ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin,

    // Same literal blocklist, same occurrence/distinct-term split.
    "q162_blocklist_gate" ->
      s"""WITH tk AS (SELECT doc_id, $tokSql AS tk FROM documents)
         |SELECT doc_id,
         |  CAST(len(list_filter(tk,
         |    t -> t IN ('the', 'of', 'and'))) AS INT) AS n_occurrences,
         |  CAST(len(list_filter(list_distinct(tk),
         |    t -> t IN ('the', 'of', 'and'))) AS INT) AS n_terms,
         |  len(list_filter(tk, t -> t IN ('the', 'of', 'and'))) >= 2
         |    AS blocked
         |FROM tk""".stripMargin,

    // Same sorted prefix-sum chain; budget in exact integer division
    // (div ≙ //), level = first feasible (B − prefix)/(m − k + 1).
    "q163_waterfill_mix" ->
      s"""WITH srcs AS (SELECT source, CAST(sum(len(tk)) AS BIGINT)
         |    AS n_tok
         |  FROM (SELECT source, $tokSql AS tk FROM documents)
         |  GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total,
         |    CAST(count(*) AS BIGINT) AS m FROM srcs),
         |rk AS (SELECT source, n_tok, m, (total * 2) // 5 AS budget,
         |    row_number() OVER (ORDER BY n_tok, source) AS k,
         |    coalesce(sum(n_tok) OVER (ORDER BY n_tok, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS pfx
         |  FROM srcs CROSS JOIN tot),
         |lvl AS (SELECT CAST(budget - pfx AS DOUBLE)
         |      / CAST(m - k + 1 AS DOUBLE) AS level
         |  FROM rk
         |  WHERE CAST(budget - pfx AS DOUBLE) / CAST(m - k + 1 AS DOUBLE)
         |    <= CAST(n_tok AS DOUBLE) OR k = m
         |  ORDER BY k LIMIT 1)
         |SELECT source, n_tok,
         |  CAST(round(CAST(least(CAST(n_tok AS DOUBLE), level)
         |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS allocation,
         |  CAST(n_tok AS DOUBLE) <= level AS saturated
         |FROM rk CROSS JOIN lvl""".stripMargin,

    // Per-user first-seen day → per-day new users → running sum over
    // the aggregated day table.
    "q160_cumulative_uniques" ->
      """WITH fs AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
        |  FROM events GROUP BY 1),
        |pd AS (SELECT d0 AS d, CAST(count(*) AS BIGINT) AS new_users
        |  FROM fs GROUP BY 1)
        |SELECT d, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM pd""".stripMargin,

    // Same distinct item sets, pair supports from the a<b self-join,
    // lift on exact integers with one double division; same
    // (lift desc, a, b) cutoff.
    "q161_basket_lift" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok,
        |    l_suppkey AS pk FROM lineitem),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders),
        |supp AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item
        |  FROM items GROUP BY 1),
        |pairs AS (SELECT x.pk AS a, y.pk AS b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM items x JOIN items y
        |    ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT a, b, n_ab,
        |  CAST(round(CAST(CAST(n_orders * n_ab AS DOUBLE)
        |    / CAST(sa.n_item * sb.n_item AS DOUBLE)
        |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS lift
        |FROM pairs
        |JOIN supp sa ON pairs.a = sa.pk
        |JOIN supp sb ON pairs.b = sb.pk
        |CROSS JOIN n
        |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin,

    // Same two windows: rows-to-−1 touch count, ×1e6 share snap per
    // conversion, rows +1-to-∞ suffix sum per touch.
    "q158_linear_attribution" ->
      """WITH w AS (SELECT user_id, ts, event_id, event_type, value,
        |    count(CASE WHEN event_type IN ('click', 'view') THEN 1 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS nprior
        |  FROM events),
        |c AS (SELECT *,
        |    CASE WHEN event_type = 'purchase' AND nprior > 0
        |      THEN CAST(round(value / nprior * 1e6) AS BIGINT)
        |      ELSE 0 END AS share_fp
        |  FROM w),
        |s AS (SELECT *,
        |    sum(share_fp) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS credit_fp
        |  FROM c)
        |SELECT event_type AS touch_type,
        |  CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(round(CAST(CAST(sum(credit_fp) AS DOUBLE) / 1e6
        |    AS DECIMAL(20,10)), 2) AS DOUBLE) AS credit
        |FROM s WHERE event_type IN ('click', 'view') GROUP BY 1
        |UNION ALL
        |SELECT 'none' AS touch_type,
        |  CAST(count(*) AS BIGINT) AS n_touches,
        |  coalesce(round(sum(value), 2), CAST(0.0 AS DOUBLE)) AS credit
        |FROM c WHERE event_type = 'purchase' AND nprior = 0""".stripMargin,

    // The same md5-based 60-bit row hash XOR-folded; the oracle's two
    // sides are trivially identical — the engine's replica leg is the
    // order/partitioning-invariance audit.
    "q159_table_checksum" ->
      s"""WITH r AS (SELECT concat_ws(chr(1), l_orderkey, l_linenumber,
         |    l_returnflag, CAST(round(l_quantity * 100) AS BIGINT)) AS s
         |  FROM lineitem),
         |h AS (SELECT ${h60("s")} AS h FROM r)
         |SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(bit_xor(h) AS BIGINT) AS checksum,
         |  true AS replica_matches
         |FROM h""".stripMargin,

    // q31's brute ranking over the q123 perturbed corpus with the dup
    // gate applied before row_number — rank k is the k-th non-dup on
    // both engines.
    "q155_hard_negatives" ->
      s"""WITH e AS (
         |  SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000 AS id,
         |    [CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) + 0.5
         |      ELSE CAST(embedding[i] AS DOUBLE) END
         |     for i in range(1, len(embedding) + 1)] AS v
         |  FROM embeddings)
         |SELECT query_id, neighbor_id, "rank", sim FROM (
         |  SELECT q.id AS query_id, c.id AS neighbor_id,
         |    round(${cosSql("q.v", "c.v")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY q.id
         |      ORDER BY round(${cosSql("q.v", "c.v")}, 6) DESC, c.id)
         |      AS "rank"
         |  FROM e q JOIN e c ON q.id != c.id
         |  WHERE q.id < 10 AND round(${cosSql("q.v", "c.v")}, 6)
         |    < CAST(0.9 AS DOUBLE))
         |WHERE "rank" <= 5""".stripMargin,

    // Same skeleton chain — fingerprint normalization then digit-run
    // fold, both regexp_replace calls GLOBAL ('g').
    "q156_template_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text || ' order 123 total 45' AS t
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id, text || ' order 999 total 7'
        |    AS t
        |  FROM documents WHERE doc_id % 3 = 0),
        |s AS (SELECT doc_id,
        |    md5(regexp_replace(
        |      regexp_replace(trim(lower(t)), '\s+', ' ', 'g'),
        |      '[0-9]+', '#', 'g')) AS fp
        |  FROM d)
        |SELECT fp, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id)
        |  AS kept_id
        |FROM s GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    // Snapshot-partial + increment-partial re-aggregated must equal the
    // full rescan — the audit column checks it in-query.
    "q157_incremental_agg" ->
      """WITH li AS (SELECT l_returnflag AS g, CAST(l_shipdate AS DATE)
        |    AS d, CAST(round(l_quantity * 100) AS BIGINT) AS qc
        |  FROM lineitem),
        |snap AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(qc) AS BIGINT) AS qsum
        |  FROM li WHERE d < DATE '1998-06-01' GROUP BY 1),
        |inc AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(qc) AS BIGINT) AS qsum
        |  FROM li WHERE d >= DATE '1998-06-01' GROUP BY 1),
        |merged AS (SELECT g, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(qsum) AS BIGINT) AS qsum
        |  FROM (SELECT * FROM snap UNION ALL SELECT * FROM inc)
        |  GROUP BY 1),
        |f AS (SELECT g, CAST(count(*) AS BIGINT) AS fn,
        |    CAST(sum(qc) AS BIGINT) AS fq
        |  FROM li GROUP BY 1)
        |SELECT merged.g AS l_returnflag, merged.n,
        |  round(CAST(qsum AS DOUBLE) / 100.0, 2) AS qty_sum,
        |  (merged.n = f.fn AND merged.qsum = f.fq) AS matches_full
        |FROM merged JOIN f ON merged.g = f.g""".stripMargin,

    // The lexical leg IS q144's statement at k=50; the semantic leg is
    // q31's brute ranking for query 0; fusion sums exact
    // round(1e9/(60+rank)) integers, full-outer so single-leg docs
    // score too.
    "q154_rrf_fusion" ->
      s"""WITH lex AS (SELECT doc_id AS id, "rank" AS rt
         |  FROM (${bm25OracleSql(50)})),
         |sem AS (SELECT neighbor_id AS id, rv FROM (
         |  SELECT c.vec_id AS neighbor_id,
         |    row_number() OVER (ORDER BY
         |      round(${cosSql("q.embedding", "c.embedding")}, 6) DESC,
         |      c.vec_id) AS rv
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id = 0)
         |  WHERE rv <= 50),
         |f AS (SELECT coalesce(l.id, s.id) AS doc_id, l.rt, s.rv,
         |    (coalesce(CAST(round(1e9 / (60 + l.rt)) AS BIGINT), 0)
         |     + coalesce(CAST(round(1e9 / (60 + s.rv)) AS BIGINT), 0))
         |      AS sfp
         |  FROM lex l FULL JOIN sem s ON l.id = s.id)
         |SELECT doc_id, rt, rv,
         |  CAST(round(CAST(CAST(sfp AS DOUBLE) / 1e9
         |    AS DECIMAL(20,10)), 6) AS DOUBLE) AS rrf
         |FROM f ORDER BY sfp DESC, doc_id LIMIT 20""".stripMargin,

    // q66's relational bloom (same k=5 hash rows over m=8192 buckets,
    // same md5 bucket function keyed on the canonical string) over the
    // q133 canonical chains; the exact NOT IN rides along as truth.
    "q134_bloom_url_novelty" -> {
      val bkt = s"CAST(${h60("CAST(i AS VARCHAR) || '|' || canonical_url")}" +
        " % 8192 AS BIGINT)"
      s"""WITH ${urlChainSql("c",
              s"""SELECT doc_id, text,
                 |    ${urlSql("doc_id", "source")} AS url
                 |  FROM documents""".stripMargin)},
         |${urlChainSql("i",
              s"""SELECT nid AS doc_id, text,
                 |    ${urlSql("nid", "src")} AS url
                 |  FROM (SELECT doc_id + 1000000000 AS nid, text,
                 |      CASE WHEN doc_id % 4 = 0 THEN source || 'x'
                 |        ELSE source END AS src
                 |    FROM documents)""".stripMargin)},
         |cd AS (SELECT DISTINCT canonical_url FROM ccu),
         |ci AS (SELECT canonical_url, regexp_extract(
         |      regexp_extract(canonical_url, '^([^/?]+)', 1),
         |      '([^.]+\\.[^.]+)$$', 1) AS domain
         |  FROM (SELECT DISTINCT canonical_url FROM icu)),
         |reg AS (SELECT DISTINCT i, $bkt AS bucket
         |  FROM cd, range(5) r(i)),
         |pb AS (SELECT canonical_url, i, $bkt AS bucket
         |  FROM ci, range(5) r(i)),
         |mb AS (SELECT canonical_url,
         |    sum(CASE WHEN hit IS NULL THEN 0 ELSE 1 END) = 5
         |      AS might_contain
         |  FROM pb LEFT JOIN (SELECT i, bucket, 1 AS hit FROM reg)
         |    USING (i, bucket)
         |  GROUP BY 1),
         |ex AS (SELECT canonical_url, 1 AS novel_exact FROM ci
         |  WHERE canonical_url NOT IN (SELECT canonical_url FROM cd))
         |SELECT ci.domain, CAST(count(*) AS BIGINT) AS n_urls,
         |  CAST(sum(coalesce(ex.novel_exact, 0)) AS BIGINT)
         |    AS n_novel_exact,
         |  CAST(sum(CASE WHEN NOT mb.might_contain THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel_bloom
         |FROM ci JOIN mb USING (canonical_url)
         |  LEFT JOIN ex USING (canonical_url)
         |GROUP BY 1""".stripMargin
    },

    // Efraimidis–Spirakis priorities in lockstep: same md5-derived
    // uniform, same double arithmetic order, priority snapped through
    // DECIMAL(20,8) on both sides before it decides the order.
    "q126_weighted_sample" ->
      s"""WITH t AS (
         |  SELECT lang, doc_id,
         |    CAST(round(CAST(-ln((CAST(h AS DOUBLE) + 1.0)
         |        / 1.152921504606846977e18)
         |      / CAST(ntok AS DOUBLE) AS DECIMAL(20,8)), 8) AS DOUBLE)
         |      AS priority
         |  FROM (SELECT lang, doc_id,
         |      ${h60("'42|' || CAST(doc_id AS VARCHAR)")} AS h,
         |      len($tokSql) AS ntok FROM documents)
         |  WHERE ntok > 0)
         |SELECT lang, doc_id, priority FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY lang ORDER BY priority, doc_id) AS rn
         |  FROM t) WHERE rn <= 20""".stripMargin,

    // Exact integer-cents rationals; ONE double division at the end,
    // identical operand order.
    "q99_dow_seasonality" ->
      """WITH b AS (SELECT l_partkey AS symbol,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(l_shipdate AS DATE)) % 7 AS INTEGER) AS dow,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS px_c
        |  FROM lineitem),
        |d AS (SELECT symbol, dow, count(*) AS n_dow, sum(px_c) AS s_dow
        |  FROM b GROUP BY 1, 2),
        |a AS (SELECT symbol, count(*) AS n_all, sum(px_c) AS s_all
        |  FROM b GROUP BY 1)
        |SELECT d.symbol, d.dow, CAST(d.n_dow AS BIGINT) AS n_dow,
        |  CAST(round(CAST(CAST(d.s_dow * a.n_all AS DOUBLE)
        |    / CAST(d.n_dow * a.s_all AS DOUBLE) AS DECIMAL(20,10)), 4)
        |    AS DOUBLE) AS ratio
        |FROM d JOIN a USING (symbol) WHERE d.symbol <= 50""".stripMargin,

    // Identical register construction (q63's row|value md5 bucket);
    // the inner product and min are exact integer arithmetic.
    "q91_join_size_sketch" -> {
      def bucket(v: String) =
        s"CAST(${h60(s"CAST(i AS VARCHAR) || '|' || CAST($v AS VARCHAR)")} % 1024 AS BIGINT)"
      s"""WITH ra AS (
         |  SELECT i, ${bucket("l_orderkey")} AS bucket, count(*) AS ca
         |  FROM lineitem, range(4) r(i) GROUP BY 1, 2),
         |rb AS (
         |  SELECT i, ${bucket("o_orderkey")} AS bucket, count(*) AS cb
         |  FROM orders, range(4) r(i) GROUP BY 1, 2),
         |rows_ AS (
         |  SELECT i, sum(ca * cb) AS rowsum
         |  FROM ra JOIN rb USING (i, bucket) GROUP BY 1),
         |allrows AS (
         |  SELECT r.i, coalesce(rows_.rowsum, 0) AS rowsum
         |  FROM range(4) r(i) LEFT JOIN rows_ ON r.i = rows_.i),
         |exact AS (
         |  SELECT count(*) AS n_exact FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey)
         |SELECT CAST(min(rowsum) AS BIGINT) AS join_size_est,
         |  CAST(n_exact AS BIGINT) AS n_exact
         |FROM allrows CROSS JOIN exact
         |GROUP BY n_exact""".stripMargin
    },

    // Same operation order per term; every constant cast to DOUBLE;
    // the ×1e6 BIGINT snap makes the sum order-free.
    "q90_psi_drift" ->
      """WITH r AS (SELECT CAST(floor(o_totalprice
        |      / CAST(20000 AS DOUBLE)) AS BIGINT) AS bin,
        |    count(*) AS n_r FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
        |c AS (SELECT CAST(floor(o_totalprice
        |      / CAST(20000 AS DOUBLE)) AS BIGINT) AS bin,
        |    count(*) AS n_c FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1),
        |tr AS (SELECT CAST(sum(n_r) AS BIGINT) AS t_r FROM r),
        |tc AS (SELECT CAST(sum(n_c) AS BIGINT) AS t_c FROM c),
        |terms AS (SELECT
        |    CAST(round((CAST(n_r AS DOUBLE) / t_r - CAST(n_c AS DOUBLE) / t_c)
        |      * ln((CAST(n_r AS DOUBLE) / t_r) / (CAST(n_c AS DOUBLE) / t_c))
        |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS term_fp
        |  FROM r JOIN c USING (bin) CROSS JOIN tr CROSS JOIN tc)
        |SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(round(CAST(CAST(sum(term_fp) AS DOUBLE)
        |    / CAST(1000000.0 AS DOUBLE) AS DECIMAL(20,10)), 4) AS DOUBLE)
        |    AS psi
        |FROM terms""".stripMargin,

    // Identical integer arithmetic: // is floor division but every
    // operand is positive, matching Spark's div.
    "q88_mix_corpora" ->
      s"""WITH per AS (SELECT source, doc_id,
         |    CAST(len($tokSql) AS BIGINT) AS w FROM documents),
         |c AS (SELECT source, sum(w) AS w_s, count(*) AS n_docs
         |  FROM per GROUP BY 1),
         |t AS (SELECT CAST(sum(w_s) AS BIGINT) AS w_tot,
         |    count(*) AS k_src FROM c),
         |r AS (SELECT source, n_docs, w_s AS n_tokens,
         |    CASE WHEN w_s = 0 THEN 100
         |      ELSE least(100, (w_tot * 100) // (k_src * w_s)) END
         |      AS keep_buckets
         |  FROM c CROSS JOIN t)
         |SELECT per.source,
         |  CAST(min(r.n_docs) AS BIGINT) AS n_docs,
         |  CAST(min(r.n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(min(r.keep_buckets) AS BIGINT) AS keep_buckets,
         |  CAST(sum(CASE WHEN ${h60("CAST(per.doc_id AS VARCHAR)")} % 100
         |      < r.keep_buckets THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_docs,
         |  CAST(sum(CASE WHEN ${h60("CAST(per.doc_id AS VARCHAR)")} % 100
         |      < r.keep_buckets THEN per.w ELSE 0 END) AS BIGINT)
         |    AS n_kept_tokens
         |FROM per JOIN r ON per.source = r.source
         |GROUP BY 1""".stripMargin,

    // Same keep-latest series, same integer-cent fold with the packed
    // (S·2^20 + alarms) state — DuckDB's // and % keep it exact.
    "q86_cusum_drift" ->
      s"""WITH b AS (
         |  SELECT symbol, d, px FROM (SELECT *, row_number() OVER (
         |    PARTITION BY symbol, d ORDER BY ord DESC, px DESC, vol DESC)
         |    AS rn FROM ($barsSql)) WHERE rn = 1),
         |ser AS (
         |  SELECT symbol,
         |    list(CAST(round(px * 100) AS BIGINT) ORDER BY d) AS xs,
         |    CAST(sum(CAST(round(px * 100) AS BIGINT)) AS BIGINT) AS sum_c,
         |    count(*) AS n
         |  FROM b GROUP BY symbol),
         |f AS (SELECT symbol, CAST(n AS INT) AS n_obs,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), xs), (acc, x) ->
         |      greatest(CAST(0 AS BIGINT),
         |        acc // 1048576 + x - sum_c // n - 50) * 1048576
         |      + acc % 1048576
         |      + CASE WHEN greatest(CAST(0 AS BIGINT),
         |          acc // 1048576 + x - sum_c // n - 50) > 500
         |        THEN 1 ELSE 0 END) AS packed
         |  FROM ser)
         |SELECT symbol, n_obs,
         |  packed // 1048576 AS cusum_final,
         |  packed % 1048576 AS n_alarms
         |FROM f""".stripMargin,

    "q87_ri_orphans" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_orphan_rows,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orphan_keys
        |FROM lineitem WHERE l_orderkey NOT IN
        |  (SELECT o_orderkey FROM orders)""".stripMargin,

    // Identical corruption, blocking predicate (first char + |Δlen|≤2
    // == the exploded length band), levenshtein, and BIGINT best-key.
    "q85_fuzzy_match" ->
      """WITH probes AS (SELECT p_partkey + 2000000000 AS probe_id,
        |    substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
        |      || substr(p_name,
        |        CAST(p_partkey % length(p_name) AS INT) + 2) AS pn
        |  FROM part),
        |m AS (SELECT probe_id,
        |    count(*) AS n_matches,
        |    min({'d': CAST(levenshtein(pn, p_name) AS BIGINT),
        |        'r': CAST(p_partkey AS BIGINT)}) AS bk
        |  FROM probes JOIN part ON
        |    substr(pn, 1, 1) = substr(p_name, 1, 1)
        |    AND abs(length(pn) - length(p_name)) <= 2
        |    AND levenshtein(pn, p_name) <= 2
        |  GROUP BY 1)
        |SELECT p.probe_id,
        |  CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,
        |  coalesce((m.bk).d, -1) AS best_dist,
        |  coalesce((m.bk).r, -1) AS best_ref
        |FROM probes p LEFT JOIN m ON p.probe_id = m.probe_id""".stripMargin,

    // Integer-day RANGE frame (same -6..0 bounds); cent-snap before the
    // sum keeps the frame aggregate order-free; count/avg written in
    // the identical operation order.
    "q83_range_window" ->
      s"""SELECT symbol, d,
         |  CAST(count(*) OVER w AS BIGINT) AS n_win,
         |  CAST(round(CAST(CAST(sum(CAST(round(px * 100) AS BIGINT))
         |        OVER w AS DOUBLE) / 100.0 / count(*) OVER w
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) AS avg7
         |FROM (SELECT symbol, d,
         |    date_diff('day', DATE '1970-01-01', d) AS day, px
         |  FROM ($barsSql))
         |WINDOW w AS (PARTITION BY symbol ORDER BY day
         |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q84_topn_per_group" ->
      """SELECT o_orderpriority, o_totalprice,
        |  CAST(dense_rank() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC) AS INT) AS rk
        |FROM orders QUALIFY rk <= 3""".stripMargin,

    // Transitive closure of same-fp pairs == the fp group, so the
    // canonical (cluster-min) id is a plain window min here; the hash
    // route is the shared h60 % den.
    "q81_leakage_split" ->
      s"""WITH u AS ($docsDupSql),
         |fp AS (SELECT doc_id,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM u),
         |c AS (SELECT doc_id,
         |    min(doc_id) OVER (PARTITION BY fp) AS canonical FROM fp),
         |s AS (SELECT doc_id, canonical,
         |    CASE WHEN ${h60("CAST(canonical AS VARCHAR)")} % 100 < 80
         |        THEN 'train'
         |      WHEN ${h60("CAST(canonical AS VARCHAR)")} % 100 < 90
         |        THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM c)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT canonical) AS BIGINT) AS n_clusters
         |FROM s GROUP BY 1""".stripMargin,

    // Same BIGINT encoding (epoch_us·8 + step index) and the same fold;
    // list_prepend supplies the explicit 0 init Spark's aggregate() has.
    "q77_funnel" ->
      """WITH e AS (SELECT user_id,
        |    epoch_us(ts) * 8 + CASE event_type WHEN 'view' THEN 1
        |      WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 ELSE 0 END AS enc,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |      WHEN 'purchase' THEN 3 ELSE 0 END AS si
        |  FROM events),
        |u AS (SELECT user_id, list_sort(list(enc)) AS seq
        |      FROM e WHERE si > 0 GROUP BY 1),
        |r AS (SELECT user_id,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT), seq),
        |          (acc, x) -> CASE WHEN x % 8 = acc + 1 THEN acc + 1
        |            ELSE acc END) AS reached
        |      FROM u)
        |SELECT s.step, s.step_name,
        |  CAST(coalesce(sum(CASE WHEN r.reached >= s.step THEN 1 ELSE 0 END),
        |    0) AS BIGINT) AS n_users
        |FROM (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
        |  s(step, step_name)
        |LEFT JOIN r ON true
        |GROUP BY 1, 2""".stripMargin,

    // Same packed (anchor·8+reached) state; >> and % are the exact
    // integer decode on BIGINT.
    "q89_windowed_funnel" ->
      """WITH e AS (SELECT user_id,
        |    epoch_us(ts) * 8 + CASE event_type WHEN 'view' THEN 1
        |      WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 ELSE 0 END AS enc,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |      WHEN 'purchase' THEN 3 ELSE 0 END AS si
        |  FROM events),
        |u AS (SELECT user_id, list_sort(list(enc)) AS seq
        |      FROM e WHERE si > 0 GROUP BY 1),
        |r AS (SELECT user_id,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT), seq),
        |          (acc, x) -> CASE
        |            WHEN acc % 8 = 0 AND x % 8 = 1
        |              THEN (x >> 3) * 8 + 1
        |            WHEN acc % 8 > 0 AND x % 8 = acc % 8 + 1
        |              AND (x >> 3) - (acc >> 3) <= 86400000000
        |              THEN (acc >> 3) * 8 + acc % 8 + 1
        |            ELSE acc END) % 8 AS reached
        |      FROM u)
        |SELECT s.step, s.step_name,
        |  CAST(coalesce(sum(CASE WHEN r.reached >= s.step THEN 1 ELSE 0 END),
        |    0) AS BIGINT) AS n_users
        |FROM (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
        |  s(step, step_name)
        |LEFT JOIN r ON true
        |GROUP BY 1, 2""".stripMargin,

    // Gaps-and-islands with the STRICT > gap rule (SessionBoundarySpec
    // semantics); same (ts, event_id) tiebreak on both engines.
    "q78_sessionize" ->
      """WITH m AS (SELECT user_id, ts, event_id, value,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |        > 1800 * 1000000 THEN 1
        |      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |      ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, value, event_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM m)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS value_sum,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM s GROUP BY 1, 2""".stripMargin,

    // DuckDB date_trunc('week') is already a DATE; datediff between
    // week starts is an exact multiple of 7.
    "q79_cohort_retention" ->
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
        |    min(ts) OVER (PARTITION BY user_id) AS first_ts
        |  FROM events),
        |a AS (SELECT DISTINCT user_id, wk,
        |    CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week
        |  FROM f)
        |SELECT cohort_week,
        |  CAST(floor(datediff('day', cohort_week, wk) / 7) AS INT)
        |    AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM a GROUP BY 1, 2""".stripMargin,

    // median == quantile_cont(0.5) on both engines (interpolated
    // midpoint); every float constant cast to DOUBLE; the flag compares
    // the same multiply-form expression.
    "q80_robust_outliers" ->
      """WITH v AS (SELECT o_orderpriority AS g,
        |    CAST(o_totalprice AS DOUBLE) AS v FROM orders),
        |med AS (SELECT g, median(v) AS med FROM v GROUP BY 1),
        |dev AS (SELECT v.g, v.v, med.med, abs(v.v - med.med) AS adev
        |  FROM v JOIN med USING (g)),
        |mad AS (SELECT g, median(adev) AS mad FROM dev GROUP BY 1)
        |SELECT dev.g, CAST(round(CAST(dev.med AS DECIMAL(20,10)), 4)
        |    AS DOUBLE) AS med,
        |  CAST(round(CAST(mad.mad AS DECIMAL(20,10)), 4) AS DOUBLE) AS mad,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN dev.adev
        |      > CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (g)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q26_exact_dedup" ->
      """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  count(*) AS n_copies, min(doc_id) AS keep_id
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL SELECT doc_id + 1000000000, text FROM documents)
        |GROUP BY 1""".stripMargin,

    "q27_minhash_lsh" ->
      s"""WITH u AS ($docsDupSql),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM u),
         |sh AS (SELECT doc_id, CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE $shingleSql END AS sh FROM tk),
         |sig AS (SELECT doc_id, sh, ${minhashSql(16)} AS sig FROM sh)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jac
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  AND (a.sig[1:4] = b.sig[1:4] OR a.sig[5:8] = b.sig[5:8]
         |    OR a.sig[9:12] = b.sig[9:12] OR a.sig[13:16] = b.sig[13:16])""".stripMargin,

    // Same half-corpus, q28's brute-force truth, q27's band-equality
    // candidate rule, exact integer counts and the two snapped ratios.
    "q213_lsh_audit" ->
      s"""WITH u AS (SELECT * FROM ($docsDupSql)
         |  WHERE (doc_id % 1000000000) % 4 = 0),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM u),
         |shl AS (SELECT doc_id, CASE WHEN len(tk) < 3
         |    THEN CAST([] AS VARCHAR[]) ELSE $shingleSql END AS sh
         |  FROM tk),
         |hs AS (SELECT doc_id, sh FROM shl WHERE len(sh) > 0),
         |sig AS (SELECT doc_id, sh, ${minhashSql(16)} AS sig FROM hs),
         |truth AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |  WHERE round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
         |    4) >= 0.5),
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |  AND (a.sig[1:4] = b.sig[1:4] OR a.sig[5:8] = b.sig[5:8]
         |    OR a.sig[9:12] = b.sig[9:12]
         |    OR a.sig[13:16] = b.sig[13:16])),
         |hits AS (SELECT c.* FROM cand c JOIN truth t
         |  ON c.id_a = t.id_a AND c.id_b = t.id_b),
         |cts AS (SELECT
         |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         |    (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
         |    (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits)
         |SELECT CAST(4 AS INT) AS bands, CAST(4 AS INT) AS rows_per_band,
         |  n_truth, n_cand, n_hits,
         |  CASE WHEN n_truth = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n_hits AS DOUBLE)
         |      / CAST(n_truth AS DOUBLE) AS DECIMAL(20,10)), 6)
         |      AS DOUBLE) END AS recall,
         |  CASE WHEN n_cand = 0 THEN NULL ELSE
         |    CAST(round(CAST(CAST(n_cand - n_hits AS DOUBLE)
         |      / CAST(n_cand AS DOUBLE) AS DECIMAL(20,10)), 6)
         |      AS DOUBLE) END AS waste_rate
         |FROM cts""".stripMargin,

    // Same ×1e4 quality integers, window-cumulative grid ECDFs per
    // source, the same exact |F1·n2 − F2·n1| sup, the same exp/round
    // p chain, and BH's integer step-up rule (p_fp·m ≤ 50000·rank).
    "q214_drift_fdr" ->
      s"""WITH sc AS (SELECT source,
         |    CAST(round(CAST(round(CAST(0.4 * least(1.0, len(tk) / 100.0)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_filter(tk,
         |            t -> t IN ('the','a','of','to','and'))) * 1.0
         |            / len(tk) END)
         |      + 0.3 * (CASE WHEN len(tk) = 0 THEN 0.0
         |          ELSE len(list_distinct(tk)) * 1.0 / len(tk) END)
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) * 10000) AS BIGINT)
         |      AS v
         |  FROM (SELECT source, $tokSql AS tk FROM documents)),
         |gv AS (SELECT source AS g, v, CAST(count(*) AS BIGINT) AS c1
         |  FROM sc GROUP BY 1, 2),
         |vv AS (SELECT v, CAST(sum(c1) AS BIGINT) AS ct
         |  FROM gv GROUP BY 1),
         |gs AS (SELECT DISTINCT g FROM gv),
         |grid AS (SELECT g, v, ct, coalesce(c1, 0) AS c1
         |  FROM gs CROSS JOIN vv LEFT JOIN gv USING (g, v)),
         |cum AS (SELECT g, v,
         |    sum(c1) OVER (PARTITION BY g ORDER BY v) AS k1,
         |    sum(ct - c1) OVER (PARTITION BY g ORDER BY v) AS k2
         |  FROM grid),
         |ns AS (SELECT g, CAST(sum(c1) AS BIGINT) AS n1
         |  FROM gv GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM sc),
         |ksq AS (SELECT g, n1, nn - n1 AS n2,
         |    CAST(round(CAST(CAST(max(abs(CAST(k1 AS HUGEINT)
         |        * (nn - n1) - CAST(k2 AS HUGEINT) * n1)) AS DOUBLE)
         |      / (CAST(n1 AS DOUBLE) * CAST(nn - n1 AS DOUBLE))
         |      AS DECIMAL(20,10)), 6) AS DOUBLE) AS ks
         |  FROM cum JOIN ns USING (g) CROSS JOIN tot
         |  GROUP BY 1, 2, 3),
         |tests AS (SELECT g, n1, n2, ks,
         |    least(CAST(1.0 AS DOUBLE), CAST(round(CAST(
         |      CAST(2 AS DOUBLE) * exp(CAST(-2 AS DOUBLE) * ks * ks
         |        * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
         |        / CAST(n1 + n2 AS DOUBLE))
         |      AS DECIMAL(20,10)), 6) AS DOUBLE)) AS p
         |  FROM ksq),
         |ranked AS (SELECT *,
         |    CAST(round(p * 1e6) AS BIGINT) AS pfp,
         |    row_number() OVER (ORDER BY CAST(round(p * 1e6) AS BIGINT),
         |      g) AS rnk,
         |    count(*) OVER () AS m FROM tests),
         |dec AS (SELECT *,
         |    max(CASE WHEN pfp * m <= 50000 * rnk THEN rnk ELSE 0 END)
         |      OVER () AS kstar
         |  FROM ranked)
         |SELECT g AS source, n1, n2, ks, p, CAST(rnk AS INT) AS rnk,
         |  rnk <= kstar AS rejected
         |FROM dec""".stripMargin,

    "q28_jaccard_pairs" ->
      s"""WITH u AS ($docsDupSql),
         |tk AS (SELECT doc_id, $tokSql AS tk FROM u),
         |sh AS (SELECT doc_id, CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE $shingleSql END AS sh FROM tk)
         |SELECT id_a, id_b, jac FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jac
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |WHERE jac >= 0.5""".stripMargin,

    "q29_simhash" ->
      s"""WITH u AS ($docsDupSql),
         |sk AS (SELECT doc_id,
         |  CAST(list_sum([CASE WHEN 2 * len(list_filter(tk, t -> ((${h60("t")} >> i) & 1) = 1)) > len(tk)
         |    THEN (CAST(1 AS BIGINT) << i) ELSE 0 END for i in range(0, 32)]) AS BIGINT) AS sk
         |  FROM (SELECT doc_id, $tokSql AS tk FROM u))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.sk, b.sk)) AS hamming
         |FROM sk a JOIN sk b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sk, b.sk)) <= 3""".stripMargin,

    "q30_embed_neardup" ->
      s"""WITH e AS (
         |  SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000 AS id,
         |    [CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) + 0.5
         |      ELSE CAST(embedding[i] AS DOUBLE) END
         |     for i in range(1, len(embedding) + 1)] AS embedding
         |  FROM embeddings)
         |SELECT a.id AS id_a, b.id AS id_b,
         |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
         |FROM e a JOIN e b ON a.id < b.id
         |WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= 0.9""".stripMargin,

    // Same pair predicate as q30; clusters via recursive closure,
    // survivors = ids equal to their component min.
    "q73_semantic_dedup" ->
      s"""WITH RECURSIVE
         |e AS (
         |  SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000 AS id,
         |    [CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) + 0.5
         |      ELSE CAST(embedding[i] AS DOUBLE) END
         |     for i in range(1, len(embedding) + 1)] AS embedding
         |  FROM embeddings),
         |pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM e a JOIN e b ON a.id < b.id
         |  WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= 0.9),
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, ed.d FROM reach r JOIN edges ed ON r.d = ed.s),
         |comp AS (
         |  SELECT e.id, least(e.id, coalesce(mn.mn, e.id)) AS c
         |  FROM e LEFT JOIN
         |    (SELECT s AS id, min(d) AS mn FROM reach GROUP BY 1) mn
         |    USING (id))
         |SELECT CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(id) AS BIGINT) AS id_sum
         |FROM comp WHERE c = id""".stripMargin,

    // q123 = q73 with the candidate pairs restricted to vectors
    // sharing one of their 2 nearest coarse cells (the engine's
    // IVF-cell-blocked kernel): qc mirrors ivfProbeCells (rounded-
    // cos/cid probe ranking), bp the same-cell verify, the closure
    // runs over the BLOCKED pairs, and ep (plain all-pairs truth)
    // only feeds the recall ratio.
    "q123_semantic_dedup_ann" ->
      s"""WITH RECURSIVE
         |e AS (
         |  SELECT vec_id AS id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000 AS id,
         |    [CASE WHEN i = 1 THEN CAST(embedding[i] AS DOUBLE) + 0.5
         |      ELSE CAST(embedding[i] AS DOUBLE) END
         |     for i in range(1, len(embedding) + 1)] AS embedding
         |  FROM embeddings),
         |ct AS (
         |  SELECT vec_id AS cid,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
         |  FROM embeddings WHERE vec_id < 16),
         |qc AS (SELECT qid, qv, cell FROM (
         |  SELECT v.id AS qid, v.embedding AS qv, ct.cid AS cell,
         |    row_number() OVER (PARTITION BY v.id
         |      ORDER BY round(${cosSql("v.embedding", "ct.cvec")}, 6) DESC,
         |        ct.cid) AS pr
         |  FROM e v CROSS JOIN ct)
         |  WHERE pr <= 2),
         |bp AS (SELECT DISTINCT a.qid AS id_a, b.qid AS id_b
         |  FROM qc a JOIN qc b ON a.cell = b.cell AND a.qid < b.qid
         |  WHERE round(${cosSql("a.qv", "b.qv")}, 6) >= 0.9),
         |ep AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM e a JOIN e b ON a.id < b.id
         |  WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= 0.9),
         |edges AS (SELECT id_a AS s, id_b AS d FROM bp
         |          UNION SELECT id_b, id_a FROM bp),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, ed.d FROM reach r JOIN edges ed ON r.d = ed.s),
         |comp AS (
         |  SELECT e.id, least(e.id, coalesce(mn.mn, e.id)) AS cc
         |  FROM e LEFT JOIN
         |    (SELECT s AS id, min(d) AS mn FROM reach GROUP BY 1) mn
         |    USING (id)),
         |k AS (SELECT CAST(count(*) AS BIGINT) AS n_kept,
         |        CAST(sum(id) AS BIGINT) AS id_sum
         |      FROM comp WHERE cc = id),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs_blocked FROM bp),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs_exact FROM ep)
         |SELECT k.n_kept, k.id_sum, nb.n_pairs_blocked, ne.n_pairs_exact,
         |  CAST(round(CAST(CAST(nb.n_pairs_blocked AS DOUBLE)
         |    / CAST(ne.n_pairs_exact AS DOUBLE) AS DECIMAL(20,10)), 4)
         |    AS DOUBLE) AS pair_recall
         |FROM k, nb, ne""".stripMargin,

    "q31_ann_topk" ->
      s"""SELECT query_id, neighbor_id, "rank", sim FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(${cosSql("q.embedding", "c.embedding")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${cosSql("q.embedding", "c.embedding")}, 6) DESC, c.vec_id) AS "rank"
         |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id < 20)
         |WHERE "rank" <= 5""".stripMargin,

    "q32_ann_lsh" ->
      s"""WITH bk AS (SELECT vec_id AS id, embedding, $bucketSql AS bucket
         |            FROM embeddings)
         |SELECT query_id, neighbor_id, sim, "rank" FROM (
         |  SELECT x.id AS query_id, y.id AS neighbor_id,
         |    round(${cosSql("x.embedding", "y.embedding")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY x.id
         |      ORDER BY round(${cosSql("x.embedding", "y.embedding")}, 6) DESC, y.id) AS "rank"
         |  FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.id != y.id)
         |WHERE "rank" <= 5""".stripMargin,

    "q33_multimodal" ->
      """SELECT doc_id, octet_length(blob) AS n_bytes,
        |  substr(hex(blob), 1, 16) AS header_hex,
        |  CASE WHEN octet_length(blob) < 32 THEN 0
        |    ELSE CAST(floor((octet_length(blob) - 32) / 64.0) + 1 AS INT) END AS n_frames,
        |  CASE WHEN octet_length(blob) >= 32 THEN
        |    CAST(list_sum([CAST('0x' || substr(hex(blob), (j-1)*2 + 1, 2) AS BIGINT)
        |      for j in range(1, 33)]) AS BIGINT) END AS f0_checksum
        |FROM (SELECT doc_id, CAST(text AS BLOB) AS blob FROM documents)""".stripMargin,

    "q34_embed_centroids" ->
      """SELECT label, pos, round(avg(x), 6) AS avg_val, count(*) AS n
        |FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |        CAST(unnest(embedding) AS DOUBLE) AS x
        |      FROM embeddings)
        |GROUP BY 1, 2""".stripMargin,

    "q35_fail_list" ->
      """SELECT c_nationkey AS market, count(*) AS n_fails,
        |  array_to_string((list(c_name ORDER BY c_name))[1:5], ',') AS sample
        |FROM customer WHERE c_acctbal < 0
        |GROUP BY 1""".stripMargin,

    "q36_sql_surface" ->
      """SELECT n_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q38_bpe_tokens" ->
      s"""SELECT lang,
         |  CAST(sum(nb) AS BIGINT) AS total_bpe,
         |  CAST(sum(nw) AS BIGINT) AS total_words,
         |  round(avg(nb), 2) AS avg_bpe
         |FROM (SELECT lang,
         |        len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS nb,
         |        len($tokSql) AS nw
         |      FROM documents)
         |GROUP BY lang""".stripMargin,

    // Horner fold, same recurrence as Text.rollingHash — NO token cap on
    // either side (the earlier positional power-table oracle silently
    // went NULL→0 past 512 tokens, a parity trap; ADVICE round 2).
    // list_reduce seeds with the first element, which equals the
    // engine's (0*31 + h₁) mod P first step since h₁ < P.
    "q39_rolling_hash" ->
      s"""SELECT doc_id,
         |  CAST(CASE WHEN len(tk) = 0 THEN 0 ELSE
         |    list_reduce([${h60("t")} % 2147483647 for t in tk],
         |                (acc, h) -> (acc * 31 + h) % 2147483647) END AS BIGINT) AS rh
         |FROM (SELECT doc_id, $tokSql AS tk FROM documents)""".stripMargin,

    "q40_rollup" ->
      """SELECT c_nationkey, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP (c_nationkey, o_orderstatus)""".stripMargin,

    "q41_quantiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q42_ohlc_gate" ->
      s"""SELECT DISTINCT symbol AS key, 'ohlc_logic_error' AS reason
         |FROM (SELECT symbol,
         |        CASE WHEN symbol % 7 = 0 THEN close * 1.5 ELSE close END AS close,
         |        low, high
         |      FROM (${ohlcSql(weekEndSqlFn)}))
         |WHERE close > high OR close < low""".stripMargin,

    // gaps-and-islands rendering of the 30-minute session window:
    // session start = first event, end = last event + gap; Spark's
    // unix_timestamp truncates to whole seconds, hence the floor.
    "q43_session_windows" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS s_start,
        |  CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS s_end,
        |  user_id, count(*) AS n, round(sum(value), 2) AS value_sum
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    "q44_typed_agg" ->
      s"""SELECT symbol, arg_min(px, ord) AS first_px, arg_max(px, ord) AS last_px
         |FROM (SELECT symbol, ord, max(px) AS px FROM ($barsSql) GROUP BY 1, 2)
         |GROUP BY symbol""".stripMargin,

    "q45_success_rate" ->
      """SELECT c_nationkey AS market, count(*) AS total,
        |  CAST(sum(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS success,
        |  round(sum(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END) * 100.0
        |    / count(*), 2) AS rate
        |FROM customer GROUP BY 1""".stripMargin,

    "q50_dup_clusters" ->
      """WITH dup AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000000, text FROM documents
        |  UNION ALL SELECT doc_id + 2000000000, text FROM documents),
        |fp AS (SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |  FROM dup)
        |SELECT doc_id AS id, min(doc_id) OVER (PARTITION BY fp) AS component
        |FROM fp""".stripMargin,

    "q51_hash_sample" ->
      s"""SELECT lang, count(*) AS n,
         |  CAST(sum(len($tokSql)) AS BIGINT) AS total_tokens
         |FROM documents
         |WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 100 < 30
         |GROUP BY 1""".stripMargin,

    // Lockstep HLL: same md5 bucketing/rho, same exact fixed-point
    // register sum (order-independent), same estimate arithmetic with
    // every constant forced to DOUBLE (a bare 0.7213 would be DECIMAL
    // in DuckDB and diverge).
    "q56_hll_distinct" ->
      """WITH h AS (
        |  SELECT l_returnflag AS flag, md5(CAST(l_partkey AS VARCHAR)) AS hx
        |  FROM lineitem),
        |parts AS (
        |  SELECT flag, hx, substr(hx, 4, 29) AS rest,
        |    ltrim(substr(hx, 4, 29), '0') AS st
        |  FROM h),
        |reg AS (
        |  SELECT flag, CAST('0x' || substr(hx, 1, 3) AS BIGINT) AS bucket,
        |    max(CASE WHEN length(st) = 0 THEN 117
        |        ELSE (length(rest) - length(st)) * 4 +
        |          (CASE WHEN substr(st, 1, 1) = '1' THEN 3
        |                WHEN substr(st, 1, 1) IN ('2','3') THEN 2
        |                WHEN substr(st, 1, 1) IN ('4','5','6','7') THEN 1
        |                ELSE 0 END) + 1 END) AS rho
        |  FROM parts GROUP BY 1, 2),
        |agg AS (
        |  SELECT flag, count(*) AS nb,
        |    CAST(sum(CAST(floor(power(CAST(2.0 AS DOUBLE), 50 - rho))
        |      AS BIGINT)) AS BIGINT) AS sum_fp
        |  FROM reg GROUP BY 1),
        |est AS (
        |  SELECT flag,
        |    CAST(round(CAST(CASE WHEN raw <= CAST(10240.0 AS DOUBLE) AND v > 0
        |        THEN ln(CAST(4096.0 AS DOUBLE) / v) * CAST(4096.0 AS DOUBLE)
        |        ELSE raw END AS DECIMAL(20,10)), 2) AS DOUBLE) AS n_approx
        |  FROM (SELECT flag,
        |      (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
        |         + CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))
        |        * CAST(4096.0 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
        |        * power(CAST(2.0 AS DOUBLE), 50)
        |        / (sum_fp + (4096 - nb) * (CAST(1 AS BIGINT) << 50)) AS raw,
        |      CAST(4096 - nb AS DOUBLE) AS v
        |    FROM agg))
        |SELECT x.flag AS flag, x.n_exact, e.n_approx
        |FROM (SELECT l_returnflag AS flag, count(DISTINCT l_partkey) AS n_exact
        |      FROM lineitem GROUP BY 1) x
        |JOIN est e USING (flag)""".stripMargin,

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

    // profileSketched in lockstep: the same melt (col_name, string
    // rendering) feeds the q56 HLL register/estimate arithmetic keyed by
    // col_name; plain counts/bounds come from the same melted relation.
    "q68_profile_sketched" ->
      """WITH m AS (
        |  SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS sval,
        |    CAST(doc_id AS DOUBLE) AS nval FROM documents
        |  UNION ALL SELECT 'lang', lang, CAST(NULL AS DOUBLE) FROM documents
        |  UNION ALL SELECT 'source', source, CAST(NULL AS DOUBLE) FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR),
        |    CAST(n_chars AS DOUBLE) FROM documents),
        |base AS (
        |  SELECT col_name, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN sval IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    min(nval) AS min_num, max(nval) AS max_num
        |  FROM m GROUP BY 1),
        |h AS (SELECT col_name, md5(sval) AS hx FROM m WHERE sval IS NOT NULL),
        |parts AS (
        |  SELECT col_name, hx, substr(hx, 4, 29) AS rest,
        |    ltrim(substr(hx, 4, 29), '0') AS st
        |  FROM h),
        |reg AS (
        |  SELECT col_name, CAST('0x' || substr(hx, 1, 3) AS BIGINT) AS bucket,
        |    max(CASE WHEN length(st) = 0 THEN 117
        |        ELSE (length(rest) - length(st)) * 4 +
        |          (CASE WHEN substr(st, 1, 1) = '1' THEN 3
        |                WHEN substr(st, 1, 1) IN ('2','3') THEN 2
        |                WHEN substr(st, 1, 1) IN ('4','5','6','7') THEN 1
        |                ELSE 0 END) + 1 END) AS rho
        |  FROM parts GROUP BY 1, 2),
        |agg AS (
        |  SELECT col_name, count(*) AS nb,
        |    CAST(sum(CAST(floor(power(CAST(2.0 AS DOUBLE), 50 - rho))
        |      AS BIGINT)) AS BIGINT) AS sum_fp
        |  FROM reg GROUP BY 1),
        |est AS (
        |  SELECT col_name,
        |    CAST(round(CAST(CASE WHEN raw <= CAST(10240.0 AS DOUBLE) AND v > 0
        |        THEN ln(CAST(4096.0 AS DOUBLE) / v) * CAST(4096.0 AS DOUBLE)
        |        ELSE raw END AS DECIMAL(20,10)), 2) AS DOUBLE) AS n_approx
        |  FROM (SELECT col_name,
        |      (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
        |         + CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))
        |        * CAST(4096.0 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
        |        * power(CAST(2.0 AS DOUBLE), 50)
        |        / (sum_fp + (4096 - nb) * (CAST(1 AS BIGINT) << 50)) AS raw,
        |      CAST(4096 - nb AS DOUBLE) AS v
        |    FROM agg))
        |SELECT b.col_name AS col_name, b.n_rows, b.n_nulls,
        |  coalesce(e.n_approx, CAST(0.0 AS DOUBLE)) AS n_distinct_approx,
        |  b.min_num, b.max_num
        |FROM base b LEFT JOIN est e USING (col_name)""".stripMargin,

    // Survivors derived independently of the engine's clustering: the
    // canonical member of an exact-dup cluster is min(doc_id) per
    // fingerprint, and singletons keep themselves.
    "q60_dedup_pipeline" ->
      s"""WITH dup AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL SELECT doc_id + 1000000000, text, lang FROM documents
         |  UNION ALL SELECT doc_id + 2000000000, text, lang FROM documents),
         |fp AS (SELECT doc_id, lang, text,
         |  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM dup),
         |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(len($tokSql)) AS BIGINT) AS total_tokens
         |FROM fp JOIN keep USING (doc_id)
         |GROUP BY lang""".stripMargin,

    // Same register/locate/interpolate arithmetic; every literal forced
    // to DOUBLE (DuckDB decimal-literal trap).
    "q64_hist_quantiles" -> {
      def q(t: String, name: String) =
        s"""max(CASE WHEN CAST(cum AS DOUBLE) >= $t
           |    AND CAST(cum - cnt AS DOUBLE) < $t
           |  THEN bucket * CAST(1000.0 AS DOUBLE)
           |    + CAST(1000.0 AS DOUBLE) * ($t - CAST(cum - cnt AS DOUBLE))
           |      / CAST(cnt AS DOUBLE) END) AS $name""".stripMargin
      s"""WITH reg AS (
         |  SELECT o_orderstatus,
         |    CAST(floor(o_totalprice / CAST(1000.0 AS DOUBLE)) AS BIGINT) AS bucket,
         |    count(*) AS cnt
         |  FROM orders GROUP BY 1, 2),
         |cum AS (
         |  SELECT o_orderstatus, bucket, cnt,
         |    sum(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bucket) AS cum,
         |    sum(cnt) OVER (PARTITION BY o_orderstatus) AS n
         |  FROM reg),
         |t AS (SELECT *, CAST(0.5 AS DOUBLE) * CAST(n AS DOUBLE) AS t50,
         |        CAST(0.95 AS DOUBLE) * CAST(n AS DOUBLE) AS t95 FROM cum)
         |SELECT o_orderstatus,
         |  ${q("t50", "p50")},
         |  ${q("t95", "p95")}
         |FROM t GROUP BY 1""".stripMargin
    },

    "q66_bloom_membership" -> {
      val bkt = s"CAST(${h60("CAST(i AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR)")} % 8192 AS BIGINT)"
      s"""WITH reg AS (
         |  SELECT DISTINCT i, $bkt AS bucket
         |  FROM documents, range(5) r(i)),
         |probes AS (SELECT range AS doc_id FROM range(0, 1200)),
         |pb AS (SELECT doc_id, i, $bkt AS bucket
         |       FROM probes, range(5) r(i)),
         |m AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN hit IS NULL THEN 0 ELSE 1 END) = 5 AS might_contain
         |  FROM pb LEFT JOIN (SELECT i, bucket, 1 AS hit FROM reg)
         |    USING (i, bucket)
         |  GROUP BY 1)
         |SELECT might_contain, count(*) AS n FROM m GROUP BY 1""".stripMargin
    },

    // Clusters recomputed INDEPENDENTLY via recursive transitive
    // closure; winners picked by a (quality desc, id asc) window.
    "q67_dedup_keep_best" ->
      s"""WITH RECURSIVE
         |u AS ($docsDupSql),
         |tk AS (SELECT doc_id, $tokSql AS tk, text FROM u),
         |sh AS (SELECT doc_id, CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
         |         ELSE $shingleSql END AS sh FROM tk),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |      round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jac
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |  WHERE jac >= 0.5),
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |comp AS (
         |  SELECT u.doc_id, least(u.doc_id, coalesce(mn.mn, u.doc_id)) AS c
         |  FROM u LEFT JOIN
         |    (SELECT s AS doc_id, min(d) AS mn FROM reach GROUP BY 1) mn
         |    USING (doc_id)),
         |q AS (
         |  SELECT u.doc_id, c,
         |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS q
         |  FROM u JOIN comp USING (doc_id)),
         |win AS (SELECT doc_id FROM (
         |  SELECT doc_id, row_number() OVER (
         |    PARTITION BY c ORDER BY q DESC, doc_id ASC) AS rn FROM q)
         |  WHERE rn = 1)
         |SELECT count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM win""".stripMargin,

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

    "q62_stratified_sample" ->
      s"""SELECT lang, count(*) AS n,
         |  CAST(sum(len($tokSql)) AS BIGINT) AS total_tokens
         |FROM documents
         |WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 100 <
         |  CASE lang WHEN 'en' THEN 20 WHEN 'zh' THEN 50 ELSE 100 END
         |GROUP BY 1""".stripMargin,

    "q63_cm_frequencies" -> {
      def bucket(term: String) =
        s"CAST(${h60(s"CAST(i AS VARCHAR) || '|' || $term")} % 1024 AS BIGINT)"
      s"""WITH tk AS (SELECT unnest($tokSql) AS term FROM documents),
         |rb AS (
         |  SELECT i, ${bucket("term")} AS bucket, count(*) AS cnt
         |  FROM tk, range(4) r(i) GROUP BY 1, 2),
         |probes AS (
         |  SELECT unnest(['the','data','market','zzznope']) AS term),
         |pb AS (SELECT term, i, ${bucket("term")} AS bucket
         |       FROM probes, range(4) r(i)),
         |est AS (
         |  SELECT term, min(coalesce(cnt, 0)) AS cm_est
         |  FROM pb LEFT JOIN rb USING (i, bucket) GROUP BY term),
         |exact AS (
         |  SELECT p.term, CAST(coalesce(c.cnt, 0) AS BIGINT) AS n_exact
         |  FROM probes p LEFT JOIN
         |    (SELECT term, count(*) AS cnt FROM tk GROUP BY 1) c
         |    USING (term))
         |SELECT term, cm_est, n_exact FROM est JOIN exact USING (term)""".stripMargin
    },

    // Pearson from raw sums in the SAME arithmetic order as the Spark
    // side — never corr(), whose streaming update order is per-engine.
    "q61_return_corr" ->
      s"""WITH m AS (${ohlcSql("last_day(d)")}),
         |r AS (
         |  SELECT symbol, period,
         |    round(close / lag(close) OVER (PARTITION BY symbol
         |      ORDER BY period) - 1, 4) + 0 AS ret
         |  FROM m),
         |top AS (
         |  SELECT symbol FROM (
         |    SELECT symbol, round(sum(vol), 2) AS v,
         |      row_number() OVER (ORDER BY round(sum(vol), 2) DESC, symbol) AS rk
         |    FROM ($barsSql) GROUP BY symbol) WHERE rk <= 20),
         |rr AS (SELECT r.* FROM r JOIN top USING (symbol)
         |       WHERE ret IS NOT NULL),
         |p AS (
         |  SELECT a.symbol AS s1, b.symbol AS s2, a.ret AS x, b.ret AS y
         |  FROM rr a JOIN rr b
         |    ON a.period = b.period AND a.symbol < b.symbol),
         |agg AS (
         |  SELECT s1, s2, count(*) AS n_periods,
         |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |    sum(x * x) AS sxx, sum(y * y) AS syy
         |  FROM p GROUP BY 1, 2)
         |SELECT s1, s2, n_periods,
         |  CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) > 0
         |    THEN CAST(round(CAST((n * sxy - sx * sy)
         |        / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
         |      AS DECIMAL(20,10)), 4) AS DOUBLE) END AS corr
         |FROM (SELECT *, CAST(n_periods AS DOUBLE) AS n FROM agg)""".stripMargin,

    // Same seed-with-first, fold-the-rest shape as the Spark aggregate;
    // every constant cast to DOUBLE so the arithmetic is bit-identical.
    "q58_ema" ->
      s"""WITH b AS (
         |  SELECT symbol, d, px FROM (SELECT *, row_number() OVER (
         |    PARTITION BY symbol, d ORDER BY ord DESC, px DESC, vol DESC)
         |    AS rn FROM ($barsSql)) WHERE rn = 1),
         |ser AS (
         |  SELECT symbol, list(CAST(px AS DOUBLE) ORDER BY d) AS px
         |  FROM b GROUP BY symbol)
         |SELECT symbol, CAST(len(px) AS INTEGER) AS n_days,
         |  list_reduce(px, (acc, x) ->
         |    CAST(0.1 AS DOUBLE) * x + CAST(0.9 AS DOUBLE) * acc) AS ema
         |FROM ser""".stripMargin,

    "q59_cube" ->
      """SELECT c_nationkey, o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE (c_nationkey, o_orderstatus)""".stripMargin,

    "q52_asof_join" ->
      """WITH t AS (SELECT event_id, user_id, ts, value AS trade_v
        |  FROM events WHERE event_type = 'purchase'),
        |q AS (SELECT user_id, ts, value AS quote_v
        |  FROM events WHERE event_type = 'view')
        |SELECT event_id, t.user_id AS user_id, trade_v, quote_v
        |FROM t ASOF LEFT JOIN q
        |  ON t.user_id = q.user_id AND t.ts >= q.ts""".stripMargin,

    "q53_rolling_indicators" ->
      s"""WITH b AS (
         |  SELECT symbol, d, px FROM (SELECT *, row_number() OVER (
         |    PARTITION BY symbol, d ORDER BY ord DESC, px DESC, vol DESC)
         |    AS rn FROM ($barsSql)) WHERE rn = 1)
         |SELECT symbol, d,
         |  CAST(round(CAST(avg(px) OVER (PARTITION BY symbol ORDER BY d
         |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         |    AS DECIMAL(20,10)), 4) AS DOUBLE) AS sma20,
         |  CAST(round(CAST(px / lag(px, 10) OVER (PARTITION BY symbol ORDER BY d)
         |    - 1 AS DECIMAL(20,10)), 4) AS DOUBLE) AS roc10,
         |  CAST(round(CAST(px / max(px) OVER (PARTITION BY symbol ORDER BY d
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - 1 AS DECIMAL(20,10)), 4) AS DOUBLE) AS drawdown
         |FROM b""".stripMargin,

    "q54_event_pivot" ->
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS "view",
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS "error"
        |FROM events GROUP BY user_id""".stripMargin,

    "q55_embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    CASE WHEN amax = 0 THEN [CAST(0 AS BIGINT) for x in embedding]
        |         ELSE [CAST(floor(CAST(x AS DOUBLE) * (127.0 / amax) + 0.5)
        |                    AS BIGINT) for x in embedding] END AS q
        |  FROM (SELECT vec_id, embedding,
        |          CAST(list_max([abs(x) for x in embedding]) AS DOUBLE) AS amax
        |        FROM embeddings))
        |SELECT vec_id, list_min(q) AS q_min, list_max(q) AS q_max,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(len(list_filter(q, x -> abs(x) = 127)) AS INTEGER) AS n_sat
        |FROM q""".stripMargin,

    "q49_tfidf" ->
      s"""WITH tk AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tk GROUP BY 1),
         |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         |s AS (SELECT doc_id, tf.term,
         |        CAST(round(CAST(tf * ln(n_docs * 1.0 / df) AS DECIMAL(20,10)), 4)
         |          AS DOUBLE) AS tfidf
         |      FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
         |SELECT doc_id, term, tfidf, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, term) AS rnk FROM s)
         |WHERE rnk <= 5""".stripMargin,

    "q48_interval_join" ->
      """SELECT l.user_id AS user_id, count(*) AS n_pairs,
        |  round(sum(r.value), 2) AS pred_value_sum
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        |  AND r.ts >= l.ts - INTERVAL 10 MINUTE
        |  AND r.ts < l.ts
        |GROUP BY 1""".stripMargin,

    "q47_salted_agg" ->
      """SELECT l_returnflag AS key, round(sum(l_quantity), 2) AS qty_sum,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q46_schema_reconcile" ->
      """SELECT user_id, round(sum(value), 2) AS value_sum,
        |  count(*) AS n_null_sf
        |FROM (SELECT CAST(CAST(user_id AS INTEGER) AS BIGINT) AS user_id,
        |             CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value
        |      FROM events)
        |GROUP BY 1""".stripMargin,

    "q37_ann_ivf" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |           WHERE vec_id < 16),
         |assigned AS (
         |  SELECT id, vec, cid AS cell FROM (
         |    SELECT e.vec_id AS id, e.embedding AS vec, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${cosSql("e.embedding", "c.cvec")}, 6) DESC, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN c)
         |  WHERE rn = 1)
         |SELECT query_id, neighbor_id, sim, "rank" FROM (
         |  SELECT x.id AS query_id, y.id AS neighbor_id,
         |    round(${cosSql("x.vec", "y.vec")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY x.id
         |      ORDER BY round(${cosSql("x.vec", "y.vec")}, 6) DESC, y.id) AS "rank"
         |  FROM assigned x JOIN assigned y ON x.cell = y.cell AND x.id != y.id)
         |WHERE "rank" <= 5""".stripMargin
  )

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the full composed lifecycle — day bars through validation gates,
    * Friday-anchored weekly resample and period returns (Pipeline
    * .dailySlice), i.e. the reference's richest end-to-end query in one
    * job graph.
    */
  def entry(spark: SparkSession): DataFrame =
    entryFrom(spark,
      sys.env.getOrElse("SPARK_GRAFT_ENTRY_DIR", "/root/testdata/sf0.001"))

  /** entry() against an explicit fixture dir — the seam EntrySpec uses
    * to prove the SPARK_GRAFT_ENTRY_DIR override actually redirects the
    * scan (the env var feeds this parameter and nothing else).
    */
  private[graft] def entryFrom(spark: SparkSession, dir: String): DataFrame = {
    val dayBars = bars(spark, dir)
      .groupBy(col("symbol"), col("d").as("date"))
      .agg(min_by(col("px"), col("ord")).as("open"), max(col("px")).as("high"),
        min(col("px")).as("low"), max_by(col("px"), col("ord")).as("close"),
        round(sum(col("vol")), 2).cast("long").as("volume"))
    // synthetic shipdates are sparse (~3 bars/symbol/6y), so the
    // continuity gate uses a cadence-appropriate threshold — at 14d
    // (daily-bar cadence) every symbol here would be rejected
    Pipeline.dailySlice(dayBars, gapDays = 600, gapSince = "1995-01-01").weekly
  }
}
