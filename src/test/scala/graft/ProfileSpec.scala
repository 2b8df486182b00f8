package graft

import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profiler counts nulls/distincts and bounds numerics in one pass") {
    val df = Seq(
      (Some(1.0), Some("a")), (Some(2.5), None),
      (None, Some("a")), (Some(2.5), Some("b")))
      .toDF("x", "s")
    val got = Profile.profile(df, Seq("x", "s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("x") == ("x", 4L, 1L, 2L, Some(1.0), Some(2.5)))
    assert(got("s") == ("s", 4L, 1L, 2L, None, None),
      "string columns have no numeric bounds")
  }

  test("sketched profiler tracks the exact one within a few percent") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 5000)
      .select($"id", (col("id") % 50).as("cat"))
    val sk = Profile.profileSketched(df, Seq("id", "cat"))
      .select($"col_name", $"n_rows", $"n_nulls", $"n_distinct_approx")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(sk("id")._2 == 5000L && sk("id")._3 == 0L)
    assert(math.abs(sk("id")._4 - 5000.0) / 5000.0 < 0.05,
      s"id distinct ${sk("id")._4}")
    assert(math.abs(sk("cat")._4 - 50.0) / 50.0 < 0.05,
      s"cat distinct ${sk("cat")._4}")
  }

  test("sketched profiler reports 0 (not null) for an all-null column") {
    val df = Seq((1L, None: Option[String]), (2L, None))
      .toDF("id", "dead")
    val sk = Profile.profileSketched(df, Seq("id", "dead"))
      .select($"col_name", $"n_nulls", $"n_distinct_approx")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(sk("dead") == (("dead", 2L, 0.0)),
      "the exact profiler reports n_distinct = 0 here; the sketch must agree")
    assert(sk("id")._3 > 0.0)
  }

  test("winsorizedStats: bounds clamp exactly, clip counts split " +
      "below/above, mean is the exact clipped ratio") {
    // 10 values 100..1000 cents: p10 = 190, p90 = 910 (exact
    // h = (n-1)p interpolation), so 100 clips up and 1000 clips down
    val df = (1 to 10).map(i => ("a", i * 100L)).toDF("g", "vc")
    val out = Profile.winsorizedStats(df, $"g", $"vc", 0.10, 0.90)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(out.length == 1)
    val (_, lo, hi, n, nLo, nHi, mean) = out.head
    assert((lo, hi) == ((190L, 910L)))
    assert((n, nLo, nHi) == ((10L, 1L, 1L)))
    // winsorized sum = 190 + 200..900 + 910 = 5500 cents
    assert(mean == 5500.0 / 10 / 100)
    // degenerate group: constant values — bounds equal, nothing clips
    val c = Seq.fill(4)(("b", 500L)).toDF("g", "vc")
    val cc = Profile.winsorizedStats(c, $"g", $"vc", 0.01, 0.99)
      .as[(String, Long, Long, Long, Long, Long, Double)].head()
    assert(cc == (("b", 500L, 500L, 4L, 0L, 0L, 5.0)))
  }

  test("paretoFrontier2D equals brute-force strict dominance on random " +
      "points; duplicates collapse; equal-cost ties keep only the best") {
    val rnd = new scala.util.Random(23)
    val pts = (0 until 300).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val distinct = pts.distinct
    val truth = distinct.filter { case (c, g) =>
      !distinct.exists { case (c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.toSet
    val out = Profile.paretoFrontier2D(pts.toDF("c", "g"), $"c", $"g")
      .as[(Long, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == truth)
    // n_rows carries the duplicate multiplicity
    val counts = pts.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(out.forall(r => counts((r._1, r._2)) == r._3))
    // all-identical input: one frontier row with the full count
    val same = Profile.paretoFrontier2D(
        Seq.fill(5)((3L, 3L)).toDF("c", "g"), $"c", $"g")
      .as[(Long, Long, Long)].collect().toSeq
    assert(same == Seq((3L, 3L, 5L)))
    // a tiny bucket width forces the REAL two-level path (many buckets,
    // broadcast offsets, cross-bucket prefix max) — same frontier; also
    // covers negative costs (pmod bucketing) via a shifted copy
    val multi = Profile.paretoFrontier2D(pts.toDF("c", "g"), $"c", $"g", 4L)
      .as[(Long, Long, Long)].collect()
    assert(multi.map(r => (r._1, r._2)).toSet == truth)
    assert(multi.forall(r => counts((r._1, r._2)) == r._3))
    val shifted = pts.map { case (c, g) => (c - 10, g) }
    val negTruth = truth.map { case (c, g) => (c - 10, g) }
    val neg = Profile.paretoFrontier2D(shifted.toDF("c", "g"), $"c", $"g", 4L)
      .as[(Long, Long, Long)].collect()
    assert(neg.map(r => (r._1, r._2)).toSet == negTruth)
  }

  test("olsTrend: exact slope/r on a perfect line, r sign on a falling " +
      "one, degenerate groups go null") {
    val rows =
      // a: y = 2x + 5 exactly → slope 2, r 1
      (1L to 5L).map(x => ("a", x, 2 * x + 5)) ++
      // b: y = -3x + 100 → slope -3, r -1
      (1L to 4L).map(x => ("b", x, -3 * x + 100)) ++
      // c: constant y → slope 0, r null (deny = 0)
      (1L to 3L).map(x => ("c", x, 7L)) ++
      // d: constant x → both null (denx = 0)
      Seq(("d", 2L, 1L), ("d", 2L, 9L))
    val out = Profile.olsTrend(rows.toDF("g", "x", "y"), $"g", $"x", $"y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out("a") == ((5L, Some(2.0), Some(1.0))))
    assert(out("b") == ((4L, Some(-3.0), Some(-1.0))))
    assert(out("c") == ((3L, Some(0.0), None)))
    assert(out("d") == ((2L, None, None)))
  }

  test("aucExact equals the pairwise definition (ties = 1/2), is " +
      "bucket-width invariant, and nulls on a one-class sample") {
    val rnd = new scala.util.Random(31)
    // heavy ties: scores from a small domain so every tie path runs
    val rows = (0 until 400).map(_ =>
      (rnd.nextBoolean(), rnd.nextInt(25).toLong))
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    val truth = pos.flatMap(p => neg.map(n =>
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0)).sum /
      (pos.size.toDouble * neg.size.toDouble)
    val df = rows.toDF("y", "v")
    val got = Profile.aucExact(df, $"y", $"v", 7L)
      .as[(Long, Long, Double)].head()
    assert(got._1 == pos.size && got._2 == neg.size)
    assert(math.abs(got._3 - truth) < 1e-6, s"auc ${got._3} vs $truth")
    // two-level decomposition must not depend on the bucket width
    val w1 = Profile.aucExact(df, $"y", $"v", 1L)
      .as[(Long, Long, Double)].head()
    assert(w1 == got)
    // perfect separation → 1.0; one-class sample → null auc
    val sep = Seq((true, 10L), (true, 9L), (false, 1L), (false, 2L))
    assert(Profile.aucExact(sep.toDF("y", "v"), $"y", $"v", 3L)
      .as[(Long, Long, Double)].head()._3 == 1.0)
    val one = Seq((true, 1L), (true, 2L)).toDF("y", "v")
    assert(Profile.aucExact(one, $"y", $"v", 3L)
      .select($"auc").collect().head.isNullAt(0))
  }

  test("theilSenTrend matches the brute-force median-of-slopes, shrugs " +
      "off an outlier that drags OLS, and skips equal-x pairs") {
    // perfect line y = 3x + 2 with ONE wild outlier at x=6
    val pts = (1L to 5L).map(x => ("a", x, 3 * x + 2)) :+ (("a", 6L, 1000L))
    val df = pts.toDF("g", "x", "y")
    val out = Profile.theilSenTrend(df, $"g", $"x", $"y")
      .as[(String, Long, Double)].head()
    // brute force with the same ×1e6 snap + lower-median convention
    def brute(ps: Seq[(Long, Long)]): Double = {
      val slopes = (for {
        (xi, yi) <- ps; (xj, yj) <- ps if xi < xj
      } yield math.round((yj - yi).toDouble / (xj - xi) * 1e6)).sorted
      slopes(((slopes.size + 1) / 2) - 1) / 1e6
    }
    val want = brute(pts.map(p => (p._2, p._3)))
    assert(out._2 == 15L, "C(6,2) slope pairs")
    assert(math.abs(out._3 - want) < 1e-9, s"${out._3} vs $want")
    assert(out._3 == 3.0, "the robust slope ignores the single outlier")
    // OLS on the same data is dragged far off 3
    val ols = Profile.olsTrend(df, $"g", $"x", $"y")
      .as[(String, Long, Option[Double], Option[Double])].head()
    assert(math.abs(ols._3.get - 3.0) > 10, s"OLS drags: ${ols._3}")
    // equal-x pairs are skipped: duplicated x contributes no pair with
    // itself, and a single-point group emits nothing
    val dup = Seq(("b", 1L, 5L), ("b", 1L, 9L), ("c", 1L, 1L))
      .toDF("g", "x", "y")
    val rows = Profile.theilSenTrend(dup, $"g", $"x", $"y").collect()
    assert(rows.isEmpty, "no defined slopes -> no output")
  }

  test("blockJackknifeMean: zero se on a constant column, algebra " +
      "matches a local jackknife over the same blocks, mean is exact") {
    import org.apache.spark.sql.functions.{col, lit}
    // constant column: every leave-one-out mean identical → se 0
    val const = (1L to 200L).map(k => (k, 500L)).toDF("k", "v")
    val c = Profile.blockJackknifeMean(const, col("k"), col("v"), 10)
      .as[(Long, Long, Double, Double)].head()
    assert(c == ((200L, 10L, 5.0, 0.0)))
    // varied data: recompute locally from the SAME hash blocks
    val rnd = new scala.util.Random(71)
    val data = (1L to 300L).map(k => (k, rnd.nextInt(10000).toLong))
    val df = data.toDF("k", "v")
    val blocks = df.select(
        graft.ops.Sampling.hashBucket(col("k"), 12).as("b"), col("v"))
      .as[(Long, Long)].collect()
    val byB = blocks.groupBy(_._1).toSeq.map { case (_, vs) =>
      (vs.size.toLong, vs.map(_._2).sum) }
    val (n, s) = (byB.map(_._1).sum, byB.map(_._2).sum)
    val mfp = byB.filter(_._1 < n).map { case (nb, sb) =>
      math.round((s - sb).toDouble / (n - nb) * 1e6) }
    val bb = mfp.size
    val want = math.sqrt((bb - 1).toDouble *
      (bb.toDouble * mfp.map(m => BigInt(m) * BigInt(m)).sum.toDouble -
        BigDecimal(mfp.sum).pow(2).toDouble) / (bb.toDouble * bb) /
      1e12) / 100.0
    val got = Profile.blockJackknifeMean(df, col("k"), col("v"), 12)
      .as[(Long, Long, Double, Double)].head()
    assert(got._1 == 300L && got._2 == bb.toLong)
    assert(math.abs(got._4 - want) < 1e-5, s"se ${got._4} vs $want")
    assert(math.abs(got._3 - s.toDouble / n / 100.0) < 1e-6)
  }

  test("keySkewReport: Gini 0 on uniform keys, matches the classic " +
      "per-key formula on skewed data, max share exact") {
    import org.apache.spark.sql.functions.col
    // uniform: 50 keys × 4 rows → Gini exactly 0
    val uni = (0 until 200).map(i => Tuple1(i % 50L)).toDF("k")
    val u = Profile.keySkewReport(uni, col("k"), 10L)
      .as[(Long, Long, Double, Double)].head()
    assert(u == ((50L, 200L, 0.02, 0.0)), s"uniform: $u")
    // skewed: loads 1,1,2,6 → brute force over per-key ranks
    val rows = Seq.fill(1)(1L) ++ Seq.fill(1)(2L) ++
      Seq.fill(2)(3L) ++ Seq.fill(6)(4L)
    val df = rows.map(Tuple1(_)).toDF("k")
    val got = Profile.keySkewReport(df, col("k"), 10L)
      .as[(Long, Long, Double, Double)].head()
    val loads = Seq(1L, 1L, 2L, 6L).sorted
    val n = loads.size; val s = loads.sum
    val bB = loads.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val gini = BigDecimal(2.0 * bB / (n.toDouble * s) - (n + 1.0) / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 == 4L && got._2 == 10L)
    assert(got._3 == 0.6, "hottest key holds 6/10 of the rows")
    assert(got._4 == gini, s"gini ${got._4} vs $gini")
  }

  test("equalCountBinMap: distinct uniform values split evenly, ties " +
      "share a bin, map covers every input value") {
    import org.apache.spark.sql.functions.col
    val uni = (1L to 100L).map(Tuple1(_)).toDF("v")
    val m = Profile.equalCountBinMap(uni, col("v"), 5, 9L)
      .as[(Long, Int)].collect().toMap
    assert(m.size == 100 && (1L to 100L).forall(m.contains))
    assert((1L to 100L).groupBy(m).values.forall(_.size == 20))
    // all-equal values: everything lands in bin 0
    val same = Seq.fill(7)(Tuple1(3L)).toDF("v")
    val s = Profile.equalCountBinMap(same, col("v"), 5, 9L)
      .as[(Long, Int)].collect().toSeq
    assert(s == Seq((3L, 0)))
  }

  test("calibrationBins: every row in exactly one bin, bins are ordered " +
      "disjoint score ranges, uniform distinct scores split equally, " +
      "rates match hand counts") {
    val rnd = new scala.util.Random(61)
    val rows = (0 until 500).map(_ =>
      (rnd.nextBoolean(), rnd.nextInt(40).toLong))
    val out = Profile.calibrationBins(rows.toDF("y", "v"), $"y", $"v",
        5, 7L)
      .as[(Int, Long, Long, Double, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).sum == 500L)
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._6 <= b._5, s"ranges overlap: $a $b")
      case _ => ()
    }
    // rate per bin equals the hand count over the same value range
    out.foreach { case (_, n, np, rate, lo, hi) =>
      val inBin = rows.filter(r => r._2 >= lo && r._2 <= hi)
      assert(inBin.size == n && inBin.count(_._1) == np)
      assert(math.abs(rate - np.toDouble / n) < 1e-4)
    }
    // 100 distinct uniform values into 5 bins → exactly 20 rows each
    val uni = (1L to 100L).map(v => (v % 3 == 0, v))
    val eq = Profile.calibrationBins(uni.toDF("y", "v"), $"y", $"v", 5, 9L)
      .as[(Int, Long, Long, Double, Long, Long)].collect()
    assert(eq.length == 5 && eq.forall(_._2 == 20L))
  }

  test("kAnonymityLadder: coarser widths absorb risky rows, width 0 " +
      "drops the column, negative values floor-bucket") {
    // group key "a": balances 5, 15 → width 10 splits them into two
    // singleton groups (risky at k=2); width 100 merges them (safe).
    // group key "b": -5 and -15 must land in buckets -1 and -2 under
    // width 10 (floor, not truncation toward zero).
    val df = Seq(
      ("a", 5L), ("a", 15L),
      ("b", -5L), ("b", -15L))
      .toDF("g", "v")
    val out = Profile.kAnonymityLadder(df, Seq($"g"), $"v",
        Seq(10L, 100L, 0L), 2)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(10L) == ((10L, 4L, 4L, 4L, false)),
      "width 10: four singleton groups, all risky")
    // width 100: a's pair share bucket 0, but b's -5 (bucket -1) and
    // -15 (bucket -1) also merge — both groups reach k
    assert(out(100L) == ((100L, 2L, 0L, 0L, true)))
    assert(out(0L) == ((0L, 2L, 0L, 0L, true)),
      "width 0 generalizes the numeric away entirely")
  }

  test("spearmanExact: monotone nonlinear = 1, reversal = -1, ties " +
      "use exact mid-ranks") {
    // y = x^3 is monotone but far from linear: Pearson < 1, Spearman = 1
    val cubic = (1L to 20L).map(v => (v, v * v * v)).toDF("x", "y")
    val up = Profile.spearmanExact(cubic, $"x", $"y", 5L)
      .as[(Long, Double)].collect().head
    assert(up == ((20L, 1.0)))
    val dn = Profile.spearmanExact(cubic, $"x", -$"y", 5L)
      .as[(Long, Double)].collect().head
    assert(dn._2 == -1.0)
    // ties: x 1..4 vs y [10,10,20,20] — scipy's tie-aware value is
    // 16/sqrt(320) = 0.894427 (mid-ranks 1.5,1.5,3.5,3.5 on y)
    val tied = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L))
      .toDF("x", "y")
    val t = Profile.spearmanExact(tied, $"x", $"y", 2L)
      .as[(Long, Double)].collect().head
    assert(t == ((4L, 0.894427)))
    // constant y → null, not a division error
    val const = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    val c = Profile.spearmanExact(const, $"x", $"y", 2L)
      .as[(Long, Option[Double])].collect().head
    assert(c == ((2L, None)))
  }

  test("kendallTauB equals the brute-force pairwise definition with " +
      "ties, hits +/-1 on monotone data, nulls on constants") {
    val rnd = new scala.util.Random(77)
    val rows = Seq.fill(60)(("r", rnd.nextInt(6).toLong,
        rnd.nextInt(5).toLong)) ++
      (1L to 8L).map(i => ("up", i, i * 3 + 1)) ++
      (1L to 8L).map(i => ("dn", i, 100 - i)) ++
      Seq.fill(5)(("cx", 2L, 0L)).zipWithIndex
        .map { case ((g, x, _), i) => (g, x, i.toLong) }
    val out = Profile.kendallTauB(rows.toDF("g", "x", "y"),
        $"g", $"x", $"y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // brute force on the random group: all unordered row pairs
    val rg = rows.filter(_._1 == "r")
    val prs = for {
      i <- rg.indices; j <- (i + 1) until rg.size
    } yield (rg(i), rg(j))
    val bc = prs.count { case (a, b) =>
      (a._2 - b._2) * (a._3 - b._3) > 0 }
    val bd = prs.count { case (a, b) =>
      (a._2 - b._2) * (a._3 - b._3) < 0 }
    val n1d = rg.groupBy(_._2).values.map(v =>
      v.size.toLong * (v.size - 1)).sum
    val n2d = rg.groupBy(_._3).values.map(v =>
      v.size.toLong * (v.size - 1)).sum
    val n0d = rg.size.toLong * (rg.size - 1)
    val wantTau = BigDecimal(2.0 * (bc - bd) /
        math.sqrt((n0d - n1d).toDouble * (n0d - n2d).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("r")._1 == 60L && out("r")._2 == bc.toLong &&
      out("r")._3 == bd.toLong)
    assert(out("r")._4.contains(wantTau))
    assert(out("up")._4.contains(1.0) && out("dn")._4.contains(-1.0))
    assert(out("cx")._4.isEmpty, "constant x: tau undefined")
  }

  test("chiSquareIndependence: balanced = 0, perfect 2x2 " +
      "dependence = n, dof counts categories") {
    // perfectly balanced 2x2 (every cell 5): independent, chi2 = 0
    val bal = (for { a <- Seq("x", "y"); b <- Seq("u", "v");
      _ <- 1 to 5 } yield (a, b)).toDF("a", "b")
    val g0 = Profile.chiSquareIndependence(bal, $"a", $"b")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(g0 == ((20L, 2L, 2L, 1L, 0.0)))
    // diagonal 2x2 ([[10,0],[0,10]]): chi2 = n = 20
    val diag = ((1 to 10).map(_ => ("x", "u")) ++
      (1 to 10).map(_ => ("y", "v"))).toDF("a", "b")
    val g1 = Profile.chiSquareIndependence(diag, $"a", $"b")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(g1._5 == 20.0 && g1._4 == 1L)
    // 3x2 dof = (3-1)(2-1) = 2
    val wide = Seq(("x", "u"), ("y", "u"), ("z", "v")).toDF("a", "b")
    assert(Profile.chiSquareIndependence(wide, $"a", $"b")
      .as[(Long, Long, Long, Long, Double)].collect().head._4 == 2L)
  }

  test("bhFdr: textbook step-up — a non-satisfying p BELOW the " +
      "crossing still rejects; none rejected under flat noise; " +
      "all rejected when all tiny") {
    // classic: m=5, alpha=0.25. p=(0.01, 0.04, 0.2, 0.5, 0.9):
    // i=1: 0.01<=0.05 T; i=2: 0.04<=0.10 T; i=3: 0.2>0.15 F; k*=2
    val a = Seq(("t1", 0.01), ("t2", 0.04), ("t3", 0.2),
      ("t4", 0.5), ("t5", 0.9))
    val outA = Profile.bhFdr(a.toDF("id", "p"), $"p", 0.25, $"id")
      .as[(String, Double, Int, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(outA == Map("t1" -> true, "t2" -> true, "t3" -> false,
      "t4" -> false, "t5" -> false))
    // step-up: p=(0.03, 0.06, 0.07) at alpha=0.1 — i=2 FAILS
    // (0.06 > 0.0667? no wait 2*0.1/3=0.0667, 0.06<=0.0667 T)...
    // use p=(0.02, 0.09, 0.095): i=1 T (0.0333), i=2 F (0.09>0.0667),
    // i=3 T (0.095 <= 0.1) -> k*=3, ALL rejected incl. the failing i=2
    val b = Seq(("u1", 0.02), ("u2", 0.09), ("u3", 0.095))
    val outB = Profile.bhFdr(b.toDF("id", "p"), $"p", 0.1, $"id")
      .as[(String, Double, Int, Boolean)].collect()
    assert(outB.forall(_._4), s"step-up must reject all: ${outB.toSeq}")
    // flat noise well above alpha: nothing rejected
    val c = (1 to 10).map(i => (s"n$i", 0.3 + i * 0.05))
    assert(Profile.bhFdr(c.toDF("id", "p"), $"p", 0.05, $"id")
      .as[(String, Double, Int, Boolean)].collect().forall(!_._4))
  }

  test("mutualInformation: independent = 0, determined = ln|A| " +
      "(nmi 1), textbook half-coupled value, constant column null") {
    // independent: every (a, b) cell equally likely
    val ind = for (a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5)
      yield (a, b)
    val mi0 = Profile.mutualInformation(ind.toDF("a", "b"), $"a", $"b")
      .collect().head
    assert(mi0.getLong(0) == 20L && mi0.getDouble(3) == 0.0 &&
      mi0.getDouble(4) == 0.0)
    // fully determined (b = f(a), bijective): MI = H(A) = ln 2, nmi 1
    val det = Seq.fill(6)(("x", "p")) ++ Seq.fill(6)(("y", "q"))
    val mi1 = Profile.mutualInformation(det.toDF("a", "b"), $"a", $"b")
      .collect().head
    assert(math.abs(mi1.getDouble(3) - math.log(2.0)) < 1e-5)
    assert(math.abs(mi1.getDouble(4) - 1.0) < 1e-5)
    // textbook 2x2: P(a,b) = [[1/2, 1/4], [0, 1/4]] →
    // MI = (1/2)ln(4/3) + (1/4)ln(2/3) + (1/4)ln 2 exactly
    val mix = Seq.fill(2)(("x", "p")) ++ Seq(("x", "q"), ("y", "q"))
    val mi2 = Profile.mutualInformation(mix.toDF("a", "b"), $"a", $"b")
      .collect().head
    val want = 0.5 * math.log(4.0 / 3) + 0.25 * math.log(2.0 / 3) +
      0.25 * math.log(2.0)
    assert(math.abs(mi2.getDouble(3) - want) < 1e-5)
    // constant B: mi 0, nmi null (min domain = 1)
    val con = Seq(("x", "p"), ("y", "p"), ("x", "p"))
    val mi3 = Profile.mutualInformation(con.toDF("a", "b"), $"a", $"b")
      .collect().head
    assert(mi3.getDouble(3) == 0.0 && mi3.isNullAt(4))
  }

  test("kaplanMeier: textbook curve with censoring, all-fail sentinel " +
      "pins survival 0") {
    // durations (t, event): censored rows thin the at-risk set without
    // contributing a factor. S(1)=4/5, S(2)=4/5*3/4=0.6, S(3)=0.3.
    val obs = Seq((1L, true), (2L, true), (2L, false), (3L, true),
      (4L, false)).toDF("t", "e")
    val km = Profile.kaplanMeier(obs, $"t", $"e", 2L)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(km.map(r => (r._1, r._2, r._3, r._4)).toSeq == Seq(
      (1L, 5L, 1L, 0.8), (2L, 4L, 1L, 0.6), (3L, 2L, 1L, 0.3)),
      s"got ${km.toSeq}")
    // the last at-risk subject failing drives survival to exact 0 and
    // it stays 0 (the -1e8 ln sentinel, never a NaN/-Inf)
    val fatal = Seq((1L, true), (2L, true)).toDF("t", "e")
    val kf = Profile.kaplanMeier(fatal, $"t", $"e", 2L)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(kf.map(r => (r._1, r._4)).toSeq == Seq((1L, 0.5), (2L, 0.0)))
  }

  test("decileLift: a perfect ranking concentrates all response in " +
    "decile 1 with lift 10; an all-tied score lands in decile 10") {
    val df = (1 to 100).map(i => (i.toLong, i > 90)).toDF("v", "y")
    val r = Profile.decileLift(df, $"v", $"y", 10, 16L)
      .as[(Long, Long, Long, Long, Long, Double, Option[Double])]
      .collect().sortBy(_._1)
    assert(r.length == 10)
    val d1 = r.head
    assert(d1 == ((1L, 10L, 10L, 10L, 10L, 1.0, Some(10.0))),
      s"got $d1")
    assert(r.tail.forall(_._3 == 0L))
    val last = r.last
    assert(last._4 == 100L && last._5 == 10L && last._6 == 0.1 &&
      last._7 == Some(1.0))
    val tied = Seq.fill(8)((5L, true)).toDF("v", "y")
    val tr = Profile.decileLift(tied, $"v", $"y", 10, 16L)
      .as[(Long, Long, Long, Long, Long, Double, Option[Double])]
      .collect()
    assert(tr.length == 1 && tr.head._1 == 10L && tr.head._2 == 8L)
  }

  test("giniSplitStump: a separable label splits at the boundary " +
    "with zero impurity; degenerate single-value input is empty") {
    val df = (1 to 10).map(i => (i.toLong, i > 5)).toDF("v", "y")
    val r = Profile.giniSplitStump(df, $"v", $"y", 4L)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(r == ((10L, 5L, 5L, 0.5, 0.0, 0.5)), s"got $r")
    assert(Profile.giniSplitStump(Seq((3L, true)).toDF("v", "y"),
      $"v", $"y", 4L).isEmpty)
  }

  test("giniSplitStump picks the brute-force best threshold") {
    val rows = (1 to 60).map(i => ((i * 7 % 13).toLong, i * 5 % 3 == 0))
    val got = Profile.giniSplitStump(rows.toDF("v", "y"), $"v", $"y", 4L)
      .select($"threshold").as[Long].head()
    val n = rows.size
    val npos = rows.count(_._2)
    def gfp(v: Long): Long = {
      val (nl, posl) = (rows.count(_._1 <= v), rows.count(r => r._1 <= v && r._2))
      val (nr, posr) = (n - nl, npos - posl)
      math.round((
        (posl.toDouble * posl + (nl - posl).toDouble * (nl - posl)) /
          (nl.toDouble * n) +
        (posr.toDouble * posr + (nr - posr).toDouble * (nr - posr)) /
          (nr.toDouble * n)) * 1e9)
    }
    val cands = rows.map(_._1).distinct.sorted.dropRight(1)
    val best = cands.maxBy(v => (gfp(v), -v))
    assert(got == best, s"got $got want $best")
  }

  test("blockBootstrapMean: constant data collapses the CI to the " +
    "mean with se 0; mixed data brackets the mean; empty is empty") {
    val const = (1 to 60).map(i => (i.toLong, 500L)).toDF("k", "v")
    val c = Profile.blockBootstrapMean(const, $"k", $"v", 8, 50)
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(c._1 == 60L && c._3 == 50L)
    assert(c._4 == 5.0 && c._5 == 5.0 && c._6 == 5.0 && c._7 == 0.0)
    val mixed = (1 to 200).map(i => (i.toLong, (i % 17) * 100L))
      .toDF("k", "v")
    val x = Profile.blockBootstrapMean(mixed, $"k", $"v", 16, 100)
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(x._5 <= x._6, s"lo > hi: $x")
    assert(x._5 <= x._4 + 2 && x._6 >= x._4 - 2,
      s"CI should be near the mean: $x")
    assert(x._7 > 0.0)
    assert(Profile.blockBootstrapMean(
      Seq.empty[(Long, Long)].toDF("k", "v"), $"k", $"v", 8, 50)
      .isEmpty)
  }

  test("cohenKappa: perfect = 1, textbook 2x2 value, " +
    "independent-margins ~ 0, one-category = null") {
    val perfect = Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("a", "b")
    val p = Profile.cohenKappa(perfect, $"a", $"b")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(p._1 == 3L && p._2 == 3L && p._3 == 1.0 &&
      p._5 == Some(1.0))
    // textbook: cells yes/yes=20, yes/no=5, no/yes=10, no/no=15
    // po=0.7, pe=(25*30 + 25*20)/2500=0.5, kappa=0.4
    val tb = (Seq.fill(20)((1L, 1L)) ++ Seq.fill(5)((1L, 0L)) ++
      Seq.fill(10)((0L, 1L)) ++ Seq.fill(15)((0L, 0L))).toDF("a", "b")
    val t = Profile.cohenKappa(tb, $"a", $"b")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(t == ((50L, 35L, 0.7, 0.5, Some(0.4))), s"got $t")
    // single category both sides: pe = 1 -> kappa undefined (null)
    val mono = Seq.fill(4)((7L, 7L)).toDF("a", "b")
    val m = Profile.cohenKappa(mono, $"a", $"b")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(m._5.isEmpty && m._3 == 1.0)
    // disjoint categories: agree = 0 and pe = 0 -> kappa 0/(n^2) = 0
    val dis = Seq((0L, 1L), (2L, 3L)).toDF("a", "b")
    val d = Profile.cohenKappa(dis, $"a", $"b")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(d._2 == 0L && d._4 == 0.0 && d._5 == Some(0.0))
  }

  test("quantileNormalize: single group with bins = n is the identity") {
    val df = (1 to 8).map(i => ("a", i.toLong * 10)).toDF("g", "v")
    val m = Profile.quantileNormalize(df, $"g", $"v", 8, 4L)
      .as[(String, Long, Long, Long)].collect()
    assert(m.length == 8 && m.forall(r => r._2 == r._4))
  }

  test("quantileNormalize: equal-size groups land on the SAME pooled " +
    "reference (the defining property), ties carry multiplicity") {
    val rows = (1 to 5).map(i => ("a", i.toLong)) ++
      (11 to 15).map(i => ("b", i.toLong)) ++
      Seq(("a", 3L)) // tie: a has 3 twice -> cnt=2 on one distinct row
    val m = Profile.quantileNormalize(
        rows.toDF("g", "v"), $"g", $"v", 10, 4L)
      .as[(String, Long, Long, Long)].collect()
    val aTie = m.find(r => r._1 == "a" && r._2 == 3L).get
    assert(aTie._3 == 2L)
    // group b (5 distinct, cnt 1 each) must map exactly onto the
    // pooled even-rank values: upper ranks 1..5 of 11 pooled rows
    val bNorm = m.filter(_._1 == "b").sortBy(_._2).map(_._4).toSeq
    // pooled sorted: 1,2,3,3,4,5,11,12,13,14,15 (N=11)
    // b ranks r=1..5 -> bins ceil(10r/5)=2,4,6,8,10 ->
    // positions ceil(b*11/10)=3,5,7,9,11 -> values 3,4,11,13,15
    assert(bNorm == Seq(3L, 4L, 11L, 13L, 15L), s"got $bNorm")
  }

  test("changePointSSE: locates a planted level shift, flat series " +
    "gains 0 at the earliest split, degenerate groups emit nothing") {
    val rows =
      // planted shift after ord 4: [10,10,10,10, 50,50,50,50]
      (1 to 4).map(i => ("shift", i.toLong, 1000L)) ++
      (5 to 8).map(i => ("shift", i.toLong, 5000L)) ++
      // flat series: every split's normalized gain is exactly 0
      (1 to 6).map(i => ("flat", i.toLong, 700L)) ++
      // all-zero total and single-point groups: declared absent
      (1 to 3).map(i => ("zero", i.toLong, 0L)) ++
      Seq(("one", 1L, 42L))
    val r = Profile.changePointSSE(rows.toDF("g", "ord", "v"),
        $"g", $"ord", $"v")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    assert(!r.contains("zero") && !r.contains("one"))
    val sh = r("shift")
    assert(sh._3 == 4L && sh._5 == 10.0 && sh._6 == 50.0,
      s"shift row: $sh")
    assert(sh._4 > 0.3, s"gain should be large: $sh")
    val fl = r("flat")
    assert(fl._3 == 1L && fl._4 == 0.0, s"flat row: $fl")
  }

  test("changePointSSE argmax equals the brute-force best split") {
    // a noisy-ish deterministic series with no clean shift
    val vals = (1 to 30).map(i => (i * 37 % 11) * 100L + i * 13L)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "ord", "v")
    val got = Profile.changePointSSE(df, $"g", $"ord", $"v")
      .select($"split_ord").as[Long].head()
    val n = vals.size
    val s = vals.map(BigInt(_)).scanLeft(BigInt(0))(_ + _).tail
    val st = s.last
    def gain(i: Int): Double =
      (BigInt(n) * s(i - 1) * s(i - 1)).toDouble /
        (BigInt(i) * st * st).toDouble +
      (BigInt(n) * (st - s(i - 1)) * (st - s(i - 1))).toDouble /
        (BigInt(n - i) * st * st).toDouble - 1.0
    val best = (1 until n).maxBy(i => (math.round(gain(i) * 1e9), -i))
    assert(got == best - 1L, s"got $got want ${best - 1}")
  }

  test("mannWhitneyVsRest 2U equals brute-force pairwise counting " +
      "(2·wins + ties), with the degenerate cases nulled") {
    // heavy ties on purpose: values are small ints across 3 groups
    val vals = (1 to 60).map(i =>
      (s"g${i % 3}", ((i * 7) % 10 + (i % 3)).toLong))
    val df = vals.toDF("g", "v")
    val got = Profile.mannWhitneyVsRest(df, $"g", $"v", bucketWidth = 4L)
      .select($"g", $"n_g", $"u2").as[(String, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val mine = vals.filter(_._1 == g).map(_._2)
      val rest = vals.filter(_._1 != g).map(_._2)
      val u2 = mine.map(x =>
        2L * rest.count(_ < x) + rest.count(_ == x)).sum
      assert(got(g)._2 == mine.size.toLong && got(g)._3 == u2,
        s"$g: got ${got(g)} want (${mine.size}, $u2)")
    }
    // one group only -> rest is empty -> z and r_rb null, u2 = 0
    val solo = Profile.mannWhitneyVsRest(
      Seq(("a", 1L), ("a", 2L)).toDF("g", "v"), $"g", $"v")
      .as[(String, Long, Long, Option[Double], Option[Double])].head()
    assert(solo == (("a", 2L, 0L, None, None)))
    // all values tied -> var_num = 0 -> z null, r_rb defined (0)
    val tied = Profile.mannWhitneyVsRest(
      Seq(("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v"), $"g", $"v")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(tied("a")._4.isEmpty && tied("a")._5 == Some(0.0))
  }

  test("wassersteinVsRest: a pure +k shift reads k bins, identical " +
      "distributions read 0, a solo group reads null") {
    import org.apache.spark.sql.functions.col
    // b is exactly a+4 at unit bin width: W1 must be 4.0 both ways
    val df = ((0 to 3).map(v => ("a", v.toLong)) ++
      (4 to 7).map(v => ("b", v.toLong))).toDF("g", "v")
    val out = Profile.wassersteinVsRest(df, col("g"), col("v"), 8)
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 4L, Some(4.0))))
    assert(out("b") == (("b", 4L, Some(4.0))))
    val same = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L))
      .toDF("g", "v")
    val o2 = Profile.wassersteinVsRest(same, col("g"), col("v"), 4)
      .as[(String, Long, Option[Double])].collect()
    assert(o2.forall(_._3 == Some(0.0)))
    val solo = Seq(("z", 5L), ("z", 9L)).toDF("g", "v")
    assert(Profile.wassersteinVsRest(solo, col("g"), col("v"), 4)
      .as[(String, Long, Option[Double])].head()._3.isEmpty)
  }

  test("signFlipTest: all-zero diffs give p = 1, t_obs and m are " +
      "exact, and the flips are deterministic across runs") {
    import org.apache.spark.sql.functions.col
    val zero = (1 to 10).map(i => (s"u$i", 0L)).toDF("u", "d")
    val rz = Profile.signFlipTest(zero, col("u"), col("d"), 32)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(rz == ((10L, 0L, 32L, 32L, 1.0)))
    // mixed diffs: invariants + determinism (the null distribution
    // is a pure function of (unit, rep), never of run or layout)
    val mixed = Seq(("a", 5L), ("b", -3L), ("c", 9L), ("d", 2L),
      ("e", -1L), ("f", 4L), ("g", 7L), ("h", -2L)).toDF("u", "d")
    val r1 = Profile.signFlipTest(mixed, col("u"), col("d"), 64)
      .as[(Long, Long, Long, Long, Double)].head()
    val r2 = Profile.signFlipTest(mixed, col("u"), col("d"), 64)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r1 == r2)
    assert(r1._1 == 8L && r1._2 == 21L && r1._3 == 64L)
    assert(r1._4 >= 0L && r1._4 <= 64L)
    assert(math.abs(r1._5 - (r1._4 + 1).toDouble / 65.0) < 5e-5,
      "p is the 4dp-rounded add-one share")
  }

  test("lDiversity: ladder counts classes/rows strictly below each rung") {
    import org.apache.spark.sql.functions.col
    // dept A: 3 rows, 1 sensitive value; B: 2 rows, 2; C: 3 rows, 3
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("B", "x"),
      ("B", "y"), ("C", "x"), ("C", "y"), ("C", "z"))
      .toDF("dept", "s")
    val out = Profile.lDiversity(df, Seq(col("dept")), col("s"), 3)
      .as[(Int, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1) == ((1, 0L, 0L, 1L, 3L, true)))
    assert(out(2) == ((2, 1L, 3L, 1L, 3L, false)))
    assert(out(3) == ((3, 2L, 5L, 1L, 3L, false)))
  }

  test("averagePrecision: per-positive snapped precision, id ties, " +
    "null on an all-negative corpus") {
    import org.apache.spark.sql.functions.col
    val d = Seq((1L, 100L, true), (2L, 90L, false), (3L, 80L, true),
      (4L, 70L, false)).toDF("id", "sc", "rel")
    val r = Profile.averagePrecision(d, col("id"), col("sc"),
      col("rel"), 16L).as[(Long, Long, Long, Option[Long])].head()
    assert(r == ((4L, 2L, 1666666L, Some(833333L))),
      "prec@1 = 1e6, prec@3 = 666666, mean floors to 833333")
    val tie = Seq((5L, 100L, false), (6L, 100L, true), (7L, 50L, true))
      .toDF("id", "sc", "rel")
    val rt = Profile.averagePrecision(tie, col("id"), col("sc"),
      col("rel"), 16L).as[(Long, Long, Long, Option[Long])].head()
    assert(rt == ((3L, 2L, 1166666L, Some(583333L))),
      "the tied negative with the smaller id ranks first")
    val neg = Seq((1L, 10L, false)).toDF("id", "sc", "rel")
    assert(Profile.averagePrecision(neg, col("id"), col("sc"),
      col("rel"), 16L).as[(Long, Long, Long, Option[Long])]
      .head()._4.isEmpty)
  }

  test("inferContract: null/distinct profile suggests the rules the data satisfies") {
    val d = Seq((1L, Some("a")), (2L, Some("a")), (3L, None))
      .toDF("id", "s")
    val out = Profile.inferContract(d, Seq("id", "s"))
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("id") == (("id", 3L, 0L, 3L, 0L, true, true)))
    assert(out("s") == (("s", 3L, 1L, 1L, 333333L, false, false)))
  }


  test("giniCoefficient: equality is 0, extreme concentration nears 1, " +
    "ties collapse exactly, bucket width immaterial") {
    import org.apache.spark.sql.functions.col
    val equal = Seq.fill(5)(10L).toDF("v")
    val ge = Profile.giniCoefficient(equal, col("v"), 4L)
      .as[(Long, Long, Option[Long])].head()
    assert(ge == ((5L, 50L, Some(0L))))
    // one holder of everything: G = (n-1)/n = 0.8
    val conc = (Seq.fill(4)(0L) :+ 100L).toDF("v")
    assert(Profile.giniCoefficient(conc, col("v"), 4L)
      .as[(Long, Long, Option[Long])].head()._3 == Some(800000L))
    // hand case with ties: values 1,1,2 -> sorted ranks 1,2,3;
    // iw = 1*1 + 1*2 + 2*3 = 9; G = (18 - 4*4)/(3*4) = 2/12
    for (w <- Seq(1L, 1000L)) {
      val r = Profile.giniCoefficient(Seq(1L, 1L, 2L).toDF("v"),
        col("v"), w).as[(Long, Long, Option[Long])].head()
      assert(r == ((3L, 4L, Some(166666L))), s"w=$w")
    }
    // all zeros -> null
    assert(Profile.giniCoefficient(Seq(0L, 0L).toDF("v"), col("v"),
      4L).as[(Long, Long, Option[Long])].head()._3.isEmpty)
  }


  test("hhiConcentration: monopoly 1e6, even split 1/k") {
    import org.apache.spark.sql.functions.col
    val df = (Seq.fill(4)(("mono", "x")) ++
      Seq(("even", "a"), ("even", "b"), ("even", "c"), ("even", "d")))
      .toDF("g", "m")
    val out = Profile.hhiConcentration(df, col("g"), col("m"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r)
      .toMap
    assert(out("mono") == (("mono", 1L, 4L, 1000000L)))
    assert(out("even") == (("even", 4L, 4L, 250000L)))
  }


  test("tCloseness: exact unit-ground EMD against hand-computed " +
      "cumulative gaps; single-value corpus is vacuous") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Profile
    // A holds values [1,1,2], B holds [2,3]; global P = [2/5,2/5,1/5]
    // EMD(A) = (|2/3-2/5| + |1-4/5|)/2 = 7/30; EMD(B) = 0.35
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("grp", "v")
    val out = Profile.tCloseness(df, col("grp"), col("v"))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 3L, 3L, Some(233333L))))
    assert(out("B") == (("B", 2L, 3L, Some(350000L))))
    val one = Seq(("A", 9L), ("B", 9L)).toDF("grp", "v")
    assert(Profile.tCloseness(one, col("grp"), col("v"))
      .as[(String, Long, Long, Option[Long])].collect()
      .forall(r => r._3 == 1L && r._4.isEmpty), "m=1 vacuous")
    // a group identical to the corpus has EMD exactly 0
    val same = Seq(("X", 1L), ("X", 2L), ("Y", 1L), ("Y", 2L))
      .toDF("grp", "v")
    assert(Profile.tCloseness(same, col("grp"), col("v"))
      .as[(String, Long, Long, Option[Long])].collect()
      .forall(_._4.contains(0L)))
  }

  test("medianOfMeans: shrugs off the outlier the mean swallows; " +
    "median pick matches a hand recomputation of the same buckets") {
    import org.apache.spark.sql.functions.col
    val vals = (0 until 90).map(i => (i.toLong, 1000L + i)) :+
      (90L, 90000000L) // one adversarial row
    val df = vals.toDF("k", "v")
    val r = Profile.medianOfMeans(df.selectExpr("'g' AS grp", "v",
        "k"), col("grp"), col("v"), col("k"), 9)
      .as[(String, Long, Long, Long, Long)].head()
    assert(r._2 == 91L && r._3 == 9L)
    assert(r._4 > 980000L, s"mean dragged to ${r._4}")
    assert(r._5 < 2000L, s"MoM stays in the clean range: ${r._5}")
    // exact lower-median parity with a driver-side recomputation of
    // the op's own deterministic bucket assignment
    def bucketOf(k: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      (BigInt(hex, 16) % 9).toLong
    }
    val buckets = vals.groupBy { case (k, _) => bucketOf(k) }
    val means = buckets.toSeq.map { case (b, vs) =>
      (BigInt(vs.map(_._2).sum) / vs.size, b)
    }.sorted
    assert(r._5 == means((means.size + 1) / 2 - 1)._1.toLong)
    // single-row group: one bucket, MoM == mean
    val one = Seq(("h", 7L, 1L)).toDF("grp", "v", "k")
    val ro = Profile.medianOfMeans(one, col("grp"), col("v"),
        col("k"), 9)
      .as[(String, Long, Long, Long, Long)].head()
    assert(ro._3 == 1L && ro._4 == 7L && ro._5 == 7L)
  }

  test("logRankTest: hand-worked 2x2 tables per event time, exact " +
    "nano terms, z from the snapped chain") {
    import org.apache.spark.sql.functions.col
    // g1: die at 1, die at 2; g2: die at 2, censored at 3
    val subj = Seq((true, 1L, true), (true, 2L, true),
      (false, 2L, true), (false, 3L, false)).toDF("g", "t", "e")
    val r = Profile.logRankTest(subj, col("g"), col("t"), col("e"), 4)
      .as[(Long, Long, Long, Long, Long, Option[Long], Boolean)]
      .head()
    assert(r._1 == 2L && r._2 == 2L && r._3 == 2L)
    // t=1: E=1*2/4=0.5, V=1*2*2*3/(16*3)=0.25
    // t=2: n1=1,n2=2: E=2*1/3, V=2*1*2*1/(9*2)
    assert(r._4 == 500000000L + 666666666L)
    assert(r._5 == 250000000L + 222222222L)
    val z = math.round((2.0 - r._4 / 1e9) / math.sqrt(r._5 / 1e9)
      * 1e6)
    assert(r._6.contains(z) && !r._7)
    // identical groups: O ~ E, z small; single-subject times with
    // nr=1 contribute zero variance (no crash)
    val one = Seq((true, 5L, true)).toDF("g", "t", "e")
    assert(Profile.logRankTest(one, col("g"), col("t"), col("e"), 4)
      .as[(Long, Long, Long, Long, Long, Option[Long], Boolean)]
      .head()._6.isEmpty, "V = 0 yields null z")
  }

  test("dpBudgetAccountant: sequential sums, parallel max over " +
    "disjoint partitions, cap flags on either axis") {
    import org.apache.spark.sql.functions.col
    val ledger = Seq(
      // a: two partitions, seq 900k over the 800k cap
      ("a", "p1", 400000L, 10L), ("a", "p1", 200000L, 10L),
      ("a", "p2", 300000L, 10L),
      // b: under eps cap but over delta cap
      ("b", "p1", 100000L, 600L), ("b", "p2", 100000L, 500L),
      // c: comfortably inside
      ("c", "p1", 50000L, 1L)).toDF("an", "pt", "e", "d")
    val out = Profile.dpBudgetAccountant(ledger, col("an"), col("pt"),
        col("e"), col("d"), 800000L, 1000L)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 3L, 2L, 900000L, 30L, 600000L,
      -100000L, true)))
    assert(out("b") == (("b", 2L, 2L, 200000L, 1100L, 100000L,
      600000L, true)))
    assert(out("c") == (("c", 1L, 1L, 50000L, 1L, 50000L, 750000L,
      false)))
  }

  test("pinballLoss: exact percent arithmetic and quantile coverage") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(("g", 50L, 0L, 500000L), ("g", 50L, 1000000L,
      500000L), ("g", 90L, 0L, 500000L), ("g", 90L, 1000000L,
      500000L)).toDF("grp", "q", "a", "f")
    val out = Profile.pinballLoss(rows, col("grp"), col("q"),
        col("a"), col("f"))
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    // q50: terms 50*500000 + 50*500000 = 5e7 -> //(2*100) = 250000
    assert(out(50) == (("g", 50, 2L, 250000L, 500000L)))
    // q90: 10*500000 + 90*500000 = 5e7 -> same mean, same coverage
    assert(out(90) == (("g", 90, 2L, 250000L, 500000L)))
  }
}
