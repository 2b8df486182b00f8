package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Frequent, Joins, Resample}

/** rangeJoin / heavyHitters / duplicateSpans / decayedSum — the round-5
  * additions beyond the verdict list.
  */
class JoinsFrequentSpec extends SparkSpec {
  import spark.implicits._

  // ---- Joins.rangeJoin ----------------------------------------------------

  private def naiveRange(points: org.apache.spark.sql.DataFrame,
                         intervals: org.apache.spark.sql.DataFrame) =
    points.crossJoin(intervals)
      .filter($"pt".between($"lo", $"hi"))

  test("rangeJoin equals the naive between-join, pair-exact, at several widths") {
    // deterministic pseudo-random layout incl. negatives and boundary hits
    val points = (-50 to 400).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("pid", "pt")
    val intervals = (0 to 60).map { i =>
      val lo = (i * 53 % 97).toLong - 10
      (1000L + i, lo, lo + (i % 13))
    }.toDF("iid", "lo", "hi")
    val want = rowsOf(naiveRange(points.withColumnRenamed("pt", "pt")
      .select($"pid", $"pt"), intervals))
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = rowsOf(Joins.rangeJoin(points, "pt", intervals, "lo", "hi", w)
        .select($"pid", $"pt", $"iid", $"lo", $"hi"))
      assert(got == want, s"bucketWidth=$w")
    }
  }

  test("rangeJoin: exact cells beyond 2^53 (epoch-nano domain)") {
    // double division loses integer exactness past 2^53: with the old
    // floor(pt / w) a point and its own covering interval could land in
    // DIFFERENT cells and the pair silently vanished. Epoch-nanos are
    // ~1.7e18; stress the top of the long range on an odd width.
    val base = Long.MaxValue - 1000L
    val points = (0 until 20).map(i => (i.toLong, base + i * 7)).toDF("pid", "pt")
    val intervals = (0 until 20).map { i =>
      (100L + i, base + i * 7 - 1, base + i * 7 + 1)
    }.toDF("iid", "lo", "hi")
    val got = Joins.rangeJoin(points, "pt", intervals, "lo", "hi", 3L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val want = rowsOf(naiveRange(points, intervals)
      .select($"pid", $"iid")).map(r => (r.getLong(0), r.getLong(1)))
    assert(got == want && got.size == 20)
    // negative domain too (floor, not truncate-toward-zero)
    val npts = Seq((1L, Long.MinValue + 10L)).toDF("pid", "pt")
    val nint = Seq((2L, Long.MinValue + 9L, Long.MinValue + 11L))
      .toDF("iid", "lo", "hi")
    assert(Joins.rangeJoin(npts, "pt", nint, "lo", "hi", 7L).count() == 1L)
  }

  test("rangeJoin: inclusive bounds, empty intervals, multi-cell spans") {
    val points = Seq((1L, 0L), (2L, 5L), (3L, 9L), (4L, 10L)).toDF("pid", "pt")
    val intervals = Seq(
      (10L, 0L, 9L),   // spans multiple 4-cells; hits pts 0,5,9
      (11L, 5L, 5L),   // degenerate single-point interval
      (12L, 7L, 6L),   // inverted -> matches nothing
      (13L, 10L, 10L)) // boundary at cell edge
      .toDF("iid", "lo", "hi")
    val got = Joins.rangeJoin(points, "pt", intervals, "lo", "hi", 4L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (2L, 11L), (4L, 13L)))
    // pair-exactness: no duplicates even for the multi-cell interval
    val n = Joins.rangeJoin(points, "pt", intervals, "lo", "hi", 4L).count()
    assert(n == 5L)
  }

  test("rangeJoin rejects shared column names") {
    val a = Seq((1L, 2L)).toDF("x", "pt")
    val b = Seq((1L, 2L, 3L)).toDF("x", "lo", "hi")
    intercept[IllegalArgumentException] {
      Joins.rangeJoin(a, "pt", b, "lo", "hi", 4L)
    }
  }

  test("intervalOverlapJoin equals the brute-force inequality join — " +
      "each pair exactly once, touch/containment/negative domains") {
    val rnd = new scala.util.Random(19)
    val as = (0 until 60).map { i =>
      val lo = rnd.nextInt(60).toLong - 30
      (i.toLong, lo, lo + rnd.nextInt(8))
    }
    val bs = (0 until 60).map { i =>
      val lo = rnd.nextInt(60).toLong - 30
      (i.toLong, lo, lo + rnd.nextInt(8))
    }
    val truth = (for {
      (ak, alo, ahi) <- as; (bk, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (ak, bk)).toSet
    for (w <- Seq(1L, 3L, 7L)) {
      val got = Joins.intervalOverlapJoin(
          as.toDF("a_key", "a_lo", "a_hi"), "a_lo", "a_hi",
          bs.toDF("b_key", "b_lo", "b_hi"), "b_lo", "b_hi", w)
        .select($"a_key", $"b_key").as[(Long, Long)].collect()
      assert(got.toSet == truth, s"w=$w")
      assert(got.length == truth.size,
        s"w=$w: pair must appear exactly once (canonical-cell dedup)")
    }
    // boundary touch counts (hi_a == lo_b), disjoint doesn't
    val t = Joins.intervalOverlapJoin(
        Seq((1L, 0L, 5L)).toDF("a_key", "a_lo", "a_hi"), "a_lo", "a_hi",
        Seq((9L, 5L, 7L), (8L, 6L, 7L)).toDF("b_key", "b_lo", "b_hi"),
        "b_lo", "b_hi", 4L)
      .select($"b_key").as[Long].collect().toSet
    assert(t == Set(9L))
  }

  // ---- Frequent.heavyHitters ------------------------------------------------

  test("heavyHitters equals groupBy-having exactly, across thresholds and partitionings") {
    // zipf-ish: item k appears 1000/k times; plus nulls that must not count
    val rows = (1 to 40).flatMap(k => Seq.fill(1000 / k)(s"w$k")) ++
      Seq.fill(25)(null.asInstanceOf[String])
    val df = rows.toDF("it")
    val n = rows.count(_ != null).toLong
    for ((num, den) <- Seq((1, 20), (1, 100), (3, 100), (1, 2));
         parts <- Seq(1, 7, 32)) {
      val d = df.repartition(parts)
      val got = Frequent.heavyHitters(d, $"it", num, den)
        .as[(String, Long)].collect().toSet
      val want = rows.filter(_ != null).groupBy(identity)
        .map { case (k, v) => (k, v.size.toLong) }
        .filter { case (_, c) => c * den >= n * num }.toSet
      assert(got == want, s"num=$num den=$den parts=$parts")
    }
  }

  test("heavyHitters at threshold 1/1 returns only an all-rows item") {
    val one = Seq.fill(10)("only").toDF("it")
    assert(Frequent.heavyHitters(one, $"it", 1, 1)
      .as[(String, Long)].collect().toSeq == Seq(("only", 10L)))
    val two = (Seq.fill(9)("a") :+ "b").toDF("it")
    assert(Frequent.heavyHitters(two, $"it", 1, 1).isEmpty)
  }

  // ---- Dedup.duplicateSpans -------------------------------------------------

  test("duplicateSpans flags corpus-repeated and self-repeated spans") {
    val span = (1 to 8).map(i => s"t$i").mkString(" ") // one exact 8-token run
    val uniq = (1 to 8).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span $uniq"),         // span dup (shared with doc 2), uniq not
      (2L, s"$span x1 x2 x3"),      // span dup, short tail chunk unique
      (3L, s"$span $span"),         // self-repeat: both chunks dup
      (4L, "lonely words only"),    // single short chunk, unique
      (5L, "")                      // zero tokens -> no row
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", $"text", 8)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 2L, 1L, 0.5)))
    assert(got(3L) == ((3L, 2L, 2L, 1.0)))
    assert(got(4L) == ((4L, 1L, 0L, 0.0)))
    assert(!got.contains(5L))
  }

  // ---- Text.bigramPmi ---------------------------------------------------------

  test("bigramPmi: hand-computed collocation scores, minCount filter, short docs") {
    val docs = Seq((1L, "x y x y"), (2L, "x y"), (3L, "z"), (4L, ""))
      .toDF("doc_id", "text")
    // bigrams: (x,y)×3, (y,x)×1; Nb=4; unigrams x=3 y=3 z=1, Nu=7
    val got = graft.ops.Text.bigramPmi(docs, $"text", 1L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("x", "y"))._3 == 3L && got(("y", "x"))._3 == 1L)
    val pmiXY = math.log((3.0 / 4) / ((3.0 / 7) * (3.0 / 7)))
    assert(math.abs(got(("x", "y"))._4 -
      BigDecimal(pmiXY).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    // minCount prunes the rare bigram; single-token and empty docs are safe
    assert(graft.ops.Text.bigramPmi(docs, $"text", 2L).count() == 1L)
  }

  // ---- Sampling.throttleByWindow ---------------------------------------------

  test("throttleByWindow: strict gap, same-day dups drop, window 0 keeps distinct days") {
    val df = Seq(
      ("a", 100L), ("a", 100L),          // same-day revisit drops
      ("a", 130L),                       // gap 30 == window -> drops
      ("a", 131L),                       // gap 31 > 30 -> kept
      ("a", 140L),                       // inside the NEW window -> drops
      ("b", 5L))                         // first is always kept
      .toDF("k", "day")
    val got = graft.ops.Sampling
      .throttleByWindow(df, $"k", $"day", 30)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 5L, 2L, 131L)))
    assert(got("b") == (("b", 1L, 1L, 5L)))
    val zero = graft.ops.Sampling
      .throttleByWindow(df.filter($"k" === "a"), $"k", $"day", 0)
      .as[(String, Long, Long, Long)].collect()
    assert(zero.head == (("a", 5L, 4L, 140L)),
      "window 0 keeps one row per distinct day")
  }

  // ---- Resample.decayedSum ---------------------------------------------------

  test("decayedSum: exact cents at whole half-lives, horizon and future cut") {
    val anchor = lit("2024-12-31").cast("date")
    val df = Seq(
      ("a", "2024-12-31", 100.0),  // delta 0   -> 100.00
      ("a", "2024-10-02", 100.0),  // delta 90  -> 50.00
      ("a", "2024-07-04", 100.0),  // delta 180 -> 25.00
      ("a", "2025-01-01", 999.0),  // future -> dropped
      ("b", "2000-01-01", 999.0),  // > 20 half-lives -> dropped
      ("b", "2024-12-31", 0.015)   // rounds to 2 cents (half-up)
    ).toDF("g", "d", "v")
    val got = Resample.decayedSum(df, $"g", $"d".cast("date"), $"v",
      anchor, 90)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 3L, 175.0)))
    assert(got("b") == (("b", 1L, 0.02)))
  }
}
