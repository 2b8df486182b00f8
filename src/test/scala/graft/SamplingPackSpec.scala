package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sampling, Text}

/** Chunking, shard packing and temperature sampling — the
  * context-length / corpus-rebalancing primitives.
  */
class SamplingPackSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens windows with overlap; short tail; empty doc emits none") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "a b"),
      (3L, "   ")).toDF("doc_id", "text")
    val out = Text.chunkTokens(docs, "doc_id", $"text", 4, 3)
      .select($"id", $"chunk_id", $"n_tokens")
      .as[(Long, Int, Int)].collect().toSet
    // doc 1: starts 1,4,7,10 -> sizes 4,4,4,1; doc 2: one short chunk;
    // doc 3 tokenizes empty -> no rows at all
    assert(out == Set(
      (1L, 0, 4), (1L, 1, 4), (1L, 2, 4), (1L, 3, 1),
      (2L, 0, 2)))
    // stride <= size covers every token: total chunked tokens >= doc tokens
    val covered = Text.chunkTokens(docs, "doc_id", $"text", 4, 3)
      .groupBy($"id").agg(sum($"n_tokens").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(covered(1L) >= 10 && covered(2L) >= 2)
  }

  test("chunkTokens fingerprints the exact token slice") {
    val docs = Seq((7L, "alpha beta gamma")).toDF("doc_id", "text")
    val fp = Text.chunkTokens(docs, "doc_id", $"text", 2, 2)
      .orderBy($"chunk_id").select($"chunk_fp").as[String].collect()
    val exp = docs.select(
      md5(lit("alpha beta")).as("a"), md5(lit("gamma")).as("b"))
      .as[(String, String)].head()
    assert(fp.toSeq == Seq(exp._1, exp._2))
  }

  test("packByBudget equals the single-window prefix sum, any bucketWidth") {
    val rows = (1L to 40L).map(i => (i, (i % 7) + 1)) // weights 1..7
    val df = rows.toDF("id", "w")
    // driver-side oracle: exclusive running sum / budget
    var acc = 0L
    val expected = rows.map { case (i, w) =>
      val shard = acc / 9; acc += w; (i, w, shard)
    }.toSet
    for (bw <- Seq(1L, 5L, 1000L)) {
      val got = Sampling.packByBudget(df, $"id", $"w", 9L, bw)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"bucketWidth=$bw")
    }
  }

  test("packByBudget: big window is partitioned by bucket, offsets broadcast") {
    val df = (1L to 100L).map(i => (i, 3L)).toDF("id", "w")
    val plan = Sampling.packByBudget(df, $"id", $"w", 50L, 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__bkt"),
      s"expected bucket-partitioned window, got:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"),
      "per-bucket offsets should come back broadcast")
  }

  test("mixUniformByTokens downsamples token-heavy sources, exact rates") {
    // source a: 10 docs x 100 tokens = 1000; b: 10 x 10 = 100; total
    // 1100 over 2 sources -> target 550 each: a keeps floor(1100*100/
    // (2*1000))=55 buckets, b keeps min(100, 550/100*100)=100.
    val docs = ((1L to 10L).map(i => (i, "a", ("t " * 100).trim)) ++
      (11L to 20L).map(i => (i, "b", ("t " * 10).trim)))
      .toDF("doc_id", "source", "text")
    val out = Sampling.mixUniformByTokens(docs, $"doc_id", $"source",
        Text.tokenCount($"text"), 100)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a")._2 == 10L && out("a")._3 == 1000L && out("a")._4 == 55L)
    assert(out("b")._4 == 100L, "light source keeps everything")
    assert(out("b")._5 == 10L && out("b")._6 == 100L)
    assert(out("a")._5 <= 10L && out("a")._6 == out("a")._5 * 100)
  }

  test("leakageSafeSplit keeps whole clusters in one split, transitively") {
    val docs = (1L to 60L).toDF("doc_id")
    // chain 1-2, 2-3 (transitive cluster {1,2,3}); pair {10,11}; rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
        Seq(("train", 60), ("val", 80), ("test", 100)), 100)
      .select($"doc_id", $"canonical", $"split")
      .as[(Long, Long, String)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // transitive chain shares a canonical and a split
    assert(Set(1L, 2L, 3L).map(byId(_)._2).size == 1)
    assert(Set(1L, 2L, 3L).map(byId(_)._3).size == 1)
    assert(byId(10L)._3 == byId(11L)._3)
    // singletons canonicalize to themselves; every doc gets a split
    assert(byId(42L)._2 == 42L)
    assert(out.length == 60 && out.forall(r =>
      Set("train", "val", "test").contains(r._3)))
    // split of a clustered doc equals the split its canonical would get
    // alone — incremental re-splits are stable
    val solo = Sampling.leakageSafeSplit(Seq(1L).toDF("doc_id"),
        "doc_id", Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
        Seq(("train", 60), ("val", 80), ("test", 100)), 100)
      .select($"split").as[String].head()
    assert(byId(1L)._3 == solo && byId(3L)._3 == solo)
  }

  test("weightedSample matches the reference A-Res computation") {
    import graft.ops.Sampling
    val rows = Seq((1L, "a", 10L), (2L, "a", 1L), (3L, "a", 5L),
      (4L, "a", 2L), (5L, "b", 7L), (6L, "b", 3L))
    val df = rows.toDF("id", "grp", "w")
    val got = Sampling.weightedSample(df, $"grp", $"id", $"w", 2, 42L)
      .as[(String, Long, Double)].collect().toSet
    // reference: same hash, same priority formula, same snap, in Scala
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val ref = rows.map { case (id, g, w) =>
      val u = (h60(s"42|$id").toDouble + 1.0) / 1.152921504606846977e18
      val p = BigDecimal(-math.log(u) / w)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      (g, id, p)
    }.groupBy(_._1).flatMap { case (_, rs) =>
      rs.sortBy(r => (r._3, r._2)).take(2)
    }.toSet
    assert(got == ref, s"got=$got ref=$ref")
  }

  test("weightedSample: heavier rows win more often; determinism; w<=0 excluded") {
    import graft.ops.Sampling
    // one heavy row among 49 light ones: across 40 seeds the heavy row
    // should make the top-5 far more often than any light row's 10%
    // expectation under uniform sampling
    val df = (1L to 50L).map(i => (i, "g", if (i == 7L) 500L else 1L))
      .toDF("id", "grp", "w")
    val hits = (1 to 40).count { seed =>
      Sampling.weightedSample(df, $"grp", $"id", $"w", 5, seed.toLong)
        .filter($"id" === 7L).count() == 1L
    }
    assert(hits >= 30, s"heavy row sampled only $hits/40 times")
    // determinism: identical frame for identical seed
    val a = Sampling.weightedSample(df, $"grp", $"id", $"w", 5, 9L)
      .collect().toSet
    val b = Sampling.weightedSample(df, $"grp", $"id", $"w", 5, 9L)
      .collect().toSet
    assert(a == b)
    // non-positive weights never sampled, even with k >= group size
    val z = Seq((1L, "g", 0L), (2L, "g", -3L), (3L, "g", 1L))
      .toDF("id", "grp", "w")
    val kept = Sampling.weightedSample(z, $"grp", $"id", $"w", 10, 1L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("temperatureSample flattens the stratum distribution deterministically") {
    val docs = (1L to 100L).map { i =>
      val lang = if (i <= 90) "en" else if (i <= 99) "de" else "sw"
      (i, lang)
    }.toDF("doc_id", "lang")
    val out = Sampling.temperatureSample(docs, $"doc_id", $"lang", 1, 2, 100)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // driver-side recompute of the fixed-point rate formula
    val counts = Map("en" -> 90L, "de" -> 9L, "sw" -> 1L)
    val wfp = counts.map { case (k, n) =>
      k -> math.round(math.sqrt(n.toDouble) * 1e6)
    }
    val (nTot, wTot) = (counts.values.sum, wfp.values.sum)
    counts.foreach { case (lang, n) =>
      val kb = math.min(100L,
        math.floor(nTot.toDouble * 1 / 2 * wfp(lang) / wTot / n * 100).toLong)
      val (gotN, gotKb, gotSampled) = out(lang)
      assert(gotN == n && gotKb == kb, s"$lang rate")
      assert(gotSampled <= n && gotSampled >= 0)
    }
    // temperature 0.5 keeps the tail fully: tiny strata at 100 buckets
    assert(out("sw")._2 == 100L, "singleton stratum kept whole")
    // dominant stratum is downsampled below its share
    assert(out("en")._2 < 100L, "dominant stratum downsampled")
    // determinism: identical on re-run
    val again = Sampling.temperatureSample(docs, $"doc_id", $"lang", 1, 2, 100)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again == out)
  }

  test("waterfillAllocation: small sources fully taken, big ones " +
      "capped at the level; the sum hits the budget") {
    val counts = Seq(("a", 10L), ("b", 20L), ("c", 100L), ("d", 200L))
      .toDF("source", "n")
    // budget = 330/2 = 165: a, b fit (30); level over {c, d} =
    // (165 - 30)/2 = 67.5 — both capped
    val out = Sampling.waterfillAllocation(counts, $"source", $"n", 1, 2)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      "a" -> ((10L, 10.0, true)), "b" -> ((20L, 20.0, true)),
      "c" -> ((100L, 67.5, false)), "d" -> ((200L, 67.5, false))))
    assert(out.values.map(_._2).sum == 165.0, "allocations sum to budget")
  }

  test("waterfillAllocation over-budget allocates everything; zero " +
      "budget allocates nothing") {
    val counts = Seq(("a", 10L), ("b", 20L)).toDF("source", "n")
    // budget = 3x total: the k = m fallback level exceeds max n
    val all = Sampling.waterfillAllocation(counts, $"source", $"n", 3, 1)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(all == Map("a" -> ((10L, 10.0, true)), "b" -> ((20L, 20.0, true))))
    val none = Sampling.waterfillAllocation(counts, $"source", $"n", 0, 1)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(none == Map("a" -> 0.0, "b" -> 0.0))
  }

  test("rangePartitionAudit: total partition (every row exactly once), " +
      "ordered disjoint ranges, exact balance under a full sample") {
    val rnd = new scala.util.Random(47)
    val rows = (1L to 400L).map(k => (k, rnd.nextInt(100000).toLong))
    val df = rows.toDF("k", "v")
    val out = Sampling.rangePartitionAudit(df, col("k"), col("v"), 8, 64)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).sum == 400L, "every row lands in exactly one part")
    // ranges are disjoint and ordered: each part's max below next min
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"parts overlap: $a vs $b")
    case _ => ()
    }
    // full sample (k = n) on DISTINCT values with p | n → perfectly
    // equal parts (boundaries are the exact quantiles)
    val dv = (1L to 400L).map(k => (k, k * 7L)).toDF("k", "v")
    val eq = Sampling.rangePartitionAudit(dv, col("k"), col("v"), 8, 400)
      .as[(Int, Long, Long, Long)].collect()
    assert(eq.length == 8 && eq.forall(_._2 == 50L),
      s"full-sample split must be exactly balanced: ${eq.mkString(",")}")
  }

  test("greedySetCover: textbook greedy picks, zero-gain groups are " +
    "never picked and rounds end early") {
    val rows = Seq(
      ("a", Seq("1", "2", "3", "4")),
      ("b", Seq("3", "4", "5")),
      ("c", Seq("5", "6")))
    val r = Sampling.greedySetCover(rows.toDF("g", "us"), $"g", $"us", 3)
      .as[(Int, String, Long, Long, Double)].collect().sortBy(_._1)
    // r1: a covers 4; r2: c adds {5,6}=2 (beats b's {5}=1);
    // r3: b adds nothing -> dropped, only 2 rows
    assert(r.length == 2, s"got ${r.mkString(",")}")
    assert(r(0) == ((1, "a", 4L, 4L, 0.6667)))
    assert(r(1) == ((2, "c", 2L, 6L, 1.0)))
    // the k driver-round bound is enforced, not just documented
    intercept[IllegalArgumentException] {
      Sampling.greedySetCover(rows.toDF("g", "us"), $"g", $"us", 1001)
    }
  }

  test("neymanAllocation: budget follows N_h*sigma_h — a zero-variance " +
    "stratum draws nothing while the varying one takes the budget") {
    val rows = (1 to 10).map(i => ("a", 100L, s"a$i")) ++
      (1 to 10).map(i => ("b", if (i % 2 == 0) 200L else 0L, s"b$i"))
    val r = Sampling.neymanAllocation(rows.toDF("h", "v", "k"),
        $"h", $"v", $"k", 6)
      .as[(String, Long, Double, Long, Long, Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    assert(r("a")._4 == 0L && r("a")._5 == 0L && r("a")._6.isEmpty)
    assert(r("b")._3 == 100.0) // population sigma of {0,200}^5 = 100
    assert(r("b")._4 == 6L && r("b")._5 == 6L)
    assert(r.values.map(_._4).sum <= 6L)
  }

  test("neymanAllocation: all-zero-variance strata fall back to the " +
    "remainder round in stratum order, never exceeding the budget") {
    val rows = (1 to 5).map(i => ("a", 7L, s"a$i")) ++
      (1 to 5).map(i => ("b", 9L, s"b$i"))
    val r = Sampling.neymanAllocation(rows.toDF("h", "v", "k"),
        $"h", $"v", $"k", 1)
      .as[(String, Long, Double, Long, Long, Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    assert(r("a")._4 == 1L && r("b")._4 == 0L)
    assert(r("a")._5 == 1L && r("a")._6 == Some(0.07))
  }

  test("profileMatchThinning: a solo source matches its own profile " +
      "and keeps everything; under-represented bins keep ratio 1e6; " +
      "kept never exceeds the bin count") {
    // one source: target == own profile -> a_micro = 1e6, all kept
    val solo = (1 to 40).map(i => ("s", (i % 4) * 10L, s"d$i"))
      .toDF("g", "v", "k")
    val r1 = Sampling.profileMatchThinning(solo, $"g", $"v", $"k", 4)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r1.nonEmpty && r1.forall(x => x._4 == 1000000L && x._5 == x._3))
    // two sources, disjoint value ranges: within each bin one source
    // owns ALL the mass -> that source's a = n_b*n_g/(N*n_gb) =
    // n_g/N < 1, the absent source has no row. Every bin of the
    // skewed layout must thin toward the pooled share.
    val skew = ((1 to 30).map(i => ("a", 0L, s"a$i")) ++
      (1 to 10).map(i => ("b", 100L, s"b$i"))).toDF("g", "v", "k")
    val r2 = Sampling.profileMatchThinning(skew, $"g", $"v", $"k", 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> x).toMap
    // a owns bin 0 entirely: a = 30*30/(40*30) = 0.75
    assert(r2(("a", 0L))._4 == 750000L)
    assert(r2(("b", 1L))._4 == 250000L)
    assert(r2.values.forall(x => x._5 <= x._3))
    // determinism: a second run returns the identical kept counts
    val r3 = Sampling.profileMatchThinning(skew, $"g", $"v", $"k", 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> x).toMap
    assert(r2 == r3)
  }

  test("egReweight: weights sum to EXACTLY 1e6, factors are monotone " +
      "in loss, uniform losses stay uniform, remainder distribution " +
      "is deterministic") {
    val losses = Seq(("a", 50000000L), ("b", 55000000L),
      ("c", 60000000L), ("d", 52000000L), ("e", 52000000L))
      .toDF("source", "loss_micro")
    val got = Sampling.egReweight(losses, 100000L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.values.map(_._4).sum == 1000000L, "weights must sum to 1e6")
    // higher loss -> strictly higher factor (exp is monotone)
    val byLoss = got.values.toSeq.sortBy(_._2).map(_._3)
    assert(byLoss == byLoss.sorted && byLoss.distinct.size >= 4)
    // equal losses get equal factors; their weights differ by at most
    // the largest-remainder unit
    assert(got("d")._3 == got("e")._3)
    assert(math.abs(got("d")._4 - got("e")._4) <= 1)
    // uniform losses: every factor 1e6, weights split 1e6 as evenly
    // as integers allow
    val uni = Sampling.egReweight(
        Seq(("x", 7L), ("y", 7L), ("z", 7L)).toDF("source", "loss_micro"),
        100000L)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(uni.forall(_._3 == 1000000L))
    assert(uni.map(_._4).sum == 1000000L)
    assert(uni.map(_._4).toSet == Set(333333L, 333334L))
    // determinism
    val again = Sampling.egReweight(losses, 100000L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("bootstrapCiMean: the md5 resample universe replays exactly in " +
      "a local brute force; CI bounds bracket the point estimate") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hashLong(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val vals = Seq(3L, 8L, 5L, 13L, 2L, 21L, 1L)
    val rows = vals.zipWithIndex.map { case (v, i) => (i * 10L, v) }
    val df = rows.toDF("id", "v")
    val (b, lo, hi) = (9, 1000, 9000)
    val got = Sampling.bootstrapCiMean(df, col("id"), col("v"), b, lo, hi)
      .as[(Long, Long, Long, Long, Long)].head()
    // brute: ids rank densely by id; draw (rep, j) -> hash mod n
    val n = vals.size
    val byIdx = rows.sortBy(_._1).map(_._2)
    val means = (0 until b).map { rep =>
      val s = (0 until n)
        .map(j => byIdx((hashLong(s"$rep:$j") % n).toInt)).sum
      s * 1000000L / n
    }.sorted
    val loIdx = (lo.toLong * (b - 1) / 10000).toInt
    val hiIdx = (hi.toLong * (b - 1) / 10000).toInt
    val mean = vals.sum * 1000000L / n
    assert(got == ((n.toLong, b.toLong, mean,
      means(loIdx), means(hiIdx))))
    assert(got._4 <= got._5)
  }

  test("mixturePlan: exact floors, minimal whole-pass epochs, absent " +
      "weighted source carries its target as shortfall, unweighted " +
      "source plans to zero") {
    val docs = Seq(
      (1L, "a", "w1 w2 w3 w4 w5"), (2L, "a", "x1 x2 x3"),
      (3L, "b", "y1 y2 y3 y4 y5 y6 y7"),
      (4L, "c", "z1 z2")).toDF("doc_id", "source", "text")
    val weights = Seq("a" -> 600000L, "b" -> 300000L, "ghost" -> 100000L)
    val budget = 101L
    val got = Sampling.mixturePlan(docs, col("source"),
        graft.ops.Text.tokenCount(col("text")), weights, budget)
      .select(col("source"), col("n_docs"), col("available_tokens"),
        col("weight_micro"), col("target_tokens"), col("repeat_epochs"),
        col("sample_rate_micro"), col("planned_tokens"), col("shortfall"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // a: avail 8, target ⌊101·0.6⌋ = 60, epochs ⌈60/8⌉ = 8,
    //    rate ⌊60e6/64⌋ = 937500, planned ⌊937500·64/1e6⌋ = 60
    assert(got("a") == (("a", 2L, 8L, 600000L, 60L, 8L, 937500L, 60L, 0L)))
    // b: avail 7, target 30, epochs 5, rate ⌊30e6/35⌋ = 857142,
    //    planned ⌊857142·35/1e6⌋ = 29 → shortfall 1 (the floor's cost)
    assert(got("b") == (("b", 1L, 7L, 300000L, 30L, 5L, 857142L, 29L, 1L)))
    // c: in the corpus, unweighted → plans to zero
    assert(got("c") == (("c", 1L, 2L, 0L, 0L, 0L, 0L, 0L, 0L)))
    // ghost: weighted, absent → zero availability, full shortfall
    assert(got("ghost") ==
      (("ghost", 0L, 0L, 100000L, 10L, 0L, 0L, 0L, 10L)))
    // epoch minimality: one fewer pass cannot reach the target
    got.values.filter(r => r._6 > 0).foreach { r =>
      assert((r._6 - 1) * r._3 < r._5, s"${r._1}: epochs not minimal")
      assert(r._7 <= 1000000L)
    }
  }

  test("dsirSelect: weights replay in a local brute force, target-like " +
      "raw docs outrank dissimilar ones, targets never selected, empty " +
      "docs carry zero weight") {
    val docs = Seq(
      // target corpus: a distinctive vocabulary
      (1L, "wiki facts wiki facts history", true),
      (2L, "facts history wiki archive", true),
      // raw pool: one target-like, one alien, one empty
      (10L, "wiki facts archive history", false),
      (11L, "buy now spam deal spam", false),
      (12L, "   ", false))
      .toDF("doc_id", "text", "tgt")
    val B = 64
    val got = Sampling.dsirSelect(docs, $"doc_id", $"text", $"tgt", B, 1)
      .as[(Long, Boolean, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // local brute-force replay of the exact arithmetic
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(15), 16) % B
    def feats(text: String): Seq[Long] = {
      val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val bg = tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      (tk ++ bg).map(bucket)
    }
    val all = docs.as[(Long, String, Boolean)].collect()
    val tFeats = all.filter(_._3).flatMap(r => feats(r._2))
    val rFeats = all.filter(!_._3).flatMap(r => feats(r._2))
    val (nt, nr) = (tFeats.length.toLong, rFeats.length.toLong)
    def lam(b: Long): Long = {
      val ct = tFeats.count(_ == b).toLong
      val cr = rFeats.count(_ == b).toLong
      math.round(math.log((ct + 1).toDouble / (nt + B)) * 1e6) -
        math.round(math.log((cr + 1).toDouble / (nr + B)) * 1e6)
    }
    all.foreach { case (id, text, _) =>
      val fs = feats(text)
      assert(got(id)._3 == fs.length.toLong, s"n_feats of $id")
      assert(got(id)._4 == fs.map(lam).sum, s"w_micro of $id")
    }
    // the target-like raw doc outranks the alien one and wins the top-1
    assert(got(10L)._4 > got(11L)._4)
    assert(got(10L)._5 && !got(11L)._5)
    // targets are the reference, never the selection
    assert(all.filter(_._3).forall(r => !got(r._1)._5))
    // the empty doc: zero features, zero weight, not selected
    assert(got(12L)._3 == 0L && got(12L)._4 == 0L && !got(12L)._5)
  }

  test("repeatValueCurve: epoch 1 is full value, later epochs decay " +
    "by the exact snapped factor, marginals telescope") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(("a", 10L), ("a", 30L), ("b", 100L))
      .toDF("src", "n")
    val out = Sampling.repeatValueCurve(docs, col("src"), col("n"),
      4, 15.0)
      .as[(String, Long, Int, Long, Long, Long)].collect()
    val a = out.filter(_._1 == "a").sortBy(_._3)
    assert(a.head == (("a", 40L, 1, 40L, 40L, 1000000L)),
      "first epoch carries full value")
    def f(k: Int): Long =
      math.round(1e6 * 15.0 * (1.0 - math.exp(-(k - 1).toDouble / 15.0)))
    val expectedEff = (1 to 4).map(k => 40L + 40L * f(k) / 1000000L)
    assert(a.map(_._4).toSeq == expectedEff)
    assert(a.map(_._5).sum == a.last._4, "marginals telescope to eff")
    assert(a.map(_._6).toSeq ==
      expectedEff.zipWithIndex.map { case (e, i) =>
        e * 1000000L / ((i + 1) * 40L)
      })
    val b = out.filter(_._1 == "b").sortBy(_._3)
    assert(b.map(_._4).toSeq ==
      (1 to 4).map(k => 100L + 100L * f(k) / 1000000L))
  }

  test("inBatchCollisionAudit: collisions match the hash-bucket " +
    "replay; one batch collides everything") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L), (3L, 400L), (7L, 9L)).toDF("a", "b")
    val out = Sampling.inBatchCollisionAudit(pairs, col("a"), col("b"),
      400L, Seq(200, 1024))
      .as[(Int, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // replay the op's own bucket assignment for nb = 2
    val buckets = Seq(1L, 2L, 3L, 400L, 7L, 9L).toDF("id")
      .select(col("id"), Sampling.hashBucket(col("id"), 2).as("bk"))
      .as[(Long, Long)].collect().toMap
    val expected = Seq((1L, 2L), (3L, 400L), (7L, 9L))
      .count(p => buckets(p._1) == buckets(p._2)).toLong
    assert(out(200) == ((200, 2L, 3L, expected,
      expected * 1000000L / 3L, 500000L)))
    assert(out(1024) == ((1024, 1L, 3L, 3L, 1000000L, 1000000L)),
      "a single batch makes every near-dup pair a false negative")
  }

  test("repeatAwareAllocation: epoch-level round-robin greedy under the budget") {
    import org.apache.spark.sql.functions.col
    // sources a (40 tokens), b (100); budget 180 -> a:2 epochs, b:1
    val docs = Seq(("a", 40L), ("b", 60L), ("b", 40L)).toDF("src", "n")
    val out = Sampling.repeatAwareAllocation(docs, col("src"),
      col("n"), 2, 15.0, 180L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val f2 = math.round(1e6 * 15.0 * (1.0 - math.exp(-1.0 / 15.0)))
    assert(out("a") == (("a", 40L, 2L, 80L, 40L + 40L * f2 / 1000000L)))
    assert(out("b") == (("b", 100L, 1L, 100L, 100L)))
    // zero budget: rows survive with zero allocation
    val zero = Sampling.repeatAwareAllocation(docs, col("src"),
      col("n"), 2, 15.0, 0L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(zero("a") == (("a", 40L, 0L, 0L, 0L)))
    assert(zero("b") == (("b", 100L, 0L, 0L, 0L)))
  }


  test("shardBalanceAudit: min/max shard tokens and imbalance floor") {
    val shards = Seq((1L, 10L, 0L), (2L, 5L, 0L), (3L, 12L, 1L),
      (4L, 3L, 2L)).toDF("id", "weight", "shard")
    val r = Sampling.shardBalanceAudit(shards)
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((3L, 3L, 15L, 800000L)), "(15-3)*1e6//15 = 800000")
  }


  test("interleaveAudit: prefix shares sum to the prefix, short corpus clamps") {
    import org.apache.spark.sql.functions.col
    val docs = ((1L to 30L).map(i => (i, "a")) ++
      (31L to 40L).map(i => (i, "b"))).toDF("id", "src")
    val out = Sampling.interleaveAudit(docs, col("src"), col("id"),
      Seq(10L, 1000L))
      .as[(Long, String, Long, Long, Long)].collect()
    val p10 = out.filter(_._1 == 10L)
    assert(p10.map(_._3).sum == 10L, "first-10 counts partition the prefix")
    assert(p10.forall(r => r._4 == r._3 * 1000000L / 10L))
    val pAll = out.filter(_._1 == 1000L).map(r => r._2 -> r).toMap
    assert(pAll("a")._3 == 30L && pAll("a")._4 == 750000L,
      "prefix beyond the corpus clamps to n")
    assert(pAll("a")._5 == 750000L && pAll("b")._5 == 250000L)
  }

}
