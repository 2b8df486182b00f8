package graft

import org.apache.spark.sql.functions.col
import graft.ops.Preference

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: two-item duel reaches the exact MM fixed point") {
    // A beats B 3x, B beats A 1x. Round 1: denom = 4e12//2e6 = 2e6,
    // piA = 3e12//2e6 = 1.5e6, piB = 1e12//2e6 = 0.5e6; the pair sum
    // stays 2e6 so every later round reproduces the same ratings.
    val duels = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")))
      .toDF("w", "l")
    val out = Preference.bradleyTerry(duels, col("w"), col("l"), 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 3L, 4L, 1500000L)))
    assert(out("B") == (("B", 1L, 4L, 500000L)))
  }

  test("bradleyTerry: a winless item rates 0 and skill order follows " +
    "the planted gradient") {
    val duels = (Seq.fill(4)(("A", "B")) ++ Seq.fill(2)(("B", "A")) ++
      Seq.fill(3)(("A", "C")) ++ Seq.fill(3)(("B", "C")))
      .toDF("w", "l")
    val out = Preference.bradleyTerry(duels, col("w"), col("l"), 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("C")._4 == 0L, "winless C pins to 0")
    assert(out("C")._2 == 0L && out("C")._3 == 6L)
    assert(out("A")._4 > out("B")._4, "A dominates the duel record")
    assert(out("A")._2 == 7L && out("A")._3 == 9L)
  }

  test("duelMatrix collapses raw duels map-side to the directed matrix") {
    val duels = Seq(("A", "B"), ("A", "B"), ("B", "A")).toDF("w", "l")
    val m = Preference.duelMatrix(duels, col("w"), col("l"))
      .as[(String, String, Long)].collect().toSet
    assert(m == Set(("A", "B", 2L), ("B", "A", 1L)))
  }

  test("positionBias: exact per-slot counts, floored micro rates, " +
    "corpus first-slot rate on every row") {
    val duels = Seq(("A", "B", true), ("A", "B", true), ("A", "B", true),
      ("A", "B", false), ("B", "A", true)).toDF("f", "s", "fw")
    val out = Preference.positionBias(duels, col("f"), col("s"),
      col("fw"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 4L, 3L, 1L, 0L, 750000L, 5L, 800000L)))
    assert(out("B") == (("B", 1L, 1L, 4L, 1L, 750000L, 5L, 800000L)))
  }

  test("lengthBias: exact longer-wins rate excluding ties; all-tie corpus yields null") {
    val duels = Seq((10L, 5L), (8L, 8L), (3L, 7L)).toDF("lw", "ll")
    val r = Preference.lengthBias(duels, col("lw"), col("ll"))
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert(r == ((3L, 1L, 1L, 1L, Some(500000L))))
    val ties = Seq((4L, 4L)).toDF("lw", "ll")
    assert(Preference.lengthBias(ties, col("lw"), col("ll"))
      .as[(Long, Long, Long, Long, Option[Long])].head()._5.isEmpty)
  }


  test("intransitivityAudit: a planted rock-paper-scissors cycle is " +
    "counted once; transitive triples are not") {
    // A>B (2-0), B>C (2-0), C>A (2-0): pure cycle. D loses to all:
    // triples with D are transitive.
    val duels = (Seq.fill(2)(("A", "B")) ++ Seq.fill(2)(("B", "C")) ++
      Seq.fill(2)(("C", "A")) ++
      Seq(("A", "D"), ("B", "D"), ("C", "D"))).toDF("w", "l")
    val r = Preference.intransitivityAudit(duels, col("w"), col("l"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r == ((4L, 6L, 0L, 4L, 1L, 250000L)),
      "four triangles, exactly the ABC one cycles")
  }

  test("bradleyTerryFromMatrix: two floor-to-zero items sharing a " +
    "pair converge instead of dividing by zero") {
    // Z crushes X and Y (3e6 wins each — one matrix row, not 3e6
    // duels), so round 1 floors both their ratings to 0 (2e6·wins <
    // duels); the X–Y pair then has pi(X)+pi(Y) == 0 in round 2 and
    // only the max(1) clamp keeps the MM term finite.
    val m = Seq(("Z", "X", 3000000L), ("Z", "Y", 3000000L),
      ("X", "Y", 1L), ("Y", "X", 1L)).toDF("i", "j", "wins")
    val out = Preference.bradleyTerryFromMatrix(m, 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out("Z") > 0L && out.contains("X") && out.contains("Y"))
  }

  test("bradleyTerryFromMatrix: an over-limit matrix fails fast with " +
    "the bounded-items message, never an OOM") {
    val big = spark.range(Preference.MaxMatrixRows + 1L)
      .select(col("id").as("i"), (col("id") + 1L).as("j"),
        org.apache.spark.sql.functions.lit(1L).as("wins"))
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerryFromMatrix(big, 1)
    }
    assert(e.getMessage.contains("bounded model-sized set"))
  }

  test("bestOfNCurve: exact order-statistics E[max] on a hand case, " +
    "brute-force subset equality, n > N null") {
    // prompt A scores {10, 20, 30}: E[max_1] = 20, E[max_2] = 80/3
    // (subset maxes 20, 30, 30), E[max_3] = 30, n=4 > N -> null
    val df = Seq(("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L),
      ("B", 5L, 1L)).toDF("p", "s", "o")
    val out = Preference.bestOfNCurve(df, col("p"), col("s"),
        col("o"), 4)
      .as[(String, Int, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out(("A", 1)) == (("A", 1, 3L, Some(20L))))
    assert(out(("A", 2)) == (("A", 2, 3L, Some(26L)))) // floor(80/3)
    assert(out(("A", 3)) == (("A", 3, 3L, Some(30L))))
    assert(out(("A", 4)) == (("A", 4, 3L, None)))
    assert(out(("B", 1)) == (("B", 1, 1L, Some(5L))))
    assert(out(("B", 2))._4.isEmpty)
    // brute force on a bigger random set: E[max_n] floored must equal
    // the subset enumeration exactly
    val rnd = new scala.util.Random(7)
    val scores = Seq.fill(7)(rnd.nextInt(1000000).toLong)
    val big = scores.zipWithIndex
      .map { case (s, i) => ("C", s, i.toLong) }.toDF("p", "s", "o")
    val got = Preference.bestOfNCurve(big, col("p"), col("s"),
        col("o"), 4)
      .as[(String, Int, Long, Option[Long])].collect()
      .map(r => r._2 -> r._4.get).toMap
    (1 to 4).foreach { n =>
      val subsets = scores.indices.combinations(n).toSeq
      val sum = subsets.map(ix => BigInt(ix.map(scores).max)).sum
      assert(got(n) == (sum / subsets.size).toLong, s"n=$n")
    }
  }

  test("dpoPairs: best/worst per prompt with ord tiebreaks, margin " +
    "and single-sample filters") {
    val samples = Seq(
      // p1: clear pair, margin 700000
      ("p1", 900000L, 10L), ("p1", 200000L, 11L), ("p1", 500000L, 12L),
      // p2: tied maxima AND tied minima — smallest ord wins both slots
      ("p2", 800000L, 21L), ("p2", 800000L, 20L),
      ("p2", 100000L, 23L), ("p2", 100000L, 22L),
      // p3: margin 100000 — under the floor, dropped
      ("p3", 300000L, 30L), ("p3", 200000L, 31L),
      // p4: single sample — no pair exists
      ("p4", 999999L, 40L)).toDF("p", "s", "o")
    val out = Preference.dpoPairs(samples, col("p"), col("s"),
        col("o"), 200000L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("p1", "p2"))
    assert(out("p1") == (("p1", 3L, 10L, 900000L, 11L, 200000L,
      700000L)))
    assert(out("p2") == (("p2", 4L, 20L, 800000L, 22L, 100000L,
      700000L)))
  }

  test("grpoAdvantage: exact mean-centered advantages, group " +
    "variance, and k1/k2 KL estimators with signed truncation") {
    // one prompt, rewards 100, 400, 1000 (micro): mean 500, adv
    // -400, -100, 500; d = lp - lr: 300000, -600000, 0
    val samples = Seq(
      ("p", 1L, 100L, 300000L, 0L),
      ("p", 2L, 400L, 0L, 600000L),
      ("p", 3L, 1000L, 250000L, 250000L)).toDF("p", "o", "r", "lp",
      "lr")
    val out = Preference.grpoAdvantage(samples, col("p"), col("o"),
        col("r"), col("lp"), col("lr"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._2 -> r).toMap
    assert(out(1L)._4 == -400L && out(2L)._4 == -100L &&
      out(3L)._4 == 500L)
    // var num = 3*(100^2+400^2+1000^2) - 1500^2 = 3*1170000 -
    // 2250000 = 1260000; // 9 = 140000
    assert(out(1L)._6 == 140000L)
    // k1 = (300000 - 600000 + 0) / 3 = -100000 exactly
    assert(out(1L)._7 == -100000L)
    // k2 = (9e10 + 36e10 + 0) // (2*3*1e6) = 45e10 // 6e6 = 75000
    assert(out(1L)._8 == 75000L)
    // truncation toward zero on a signed dividend: d sums to -300000,
    // adv of r=100 vs mean 500 is exactly -400 (no floor drift)
    val neg = Seq(("q", 1L, 0L, 0L, 1L), ("q", 2L, 1L, 0L, 0L))
      .toDF("p", "o", "r", "lp", "lr")
    val nout = Preference.grpoAdvantage(neg, col("p"), col("o"),
        col("r"), col("lp"), col("lr"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._2 -> r).toMap
    // adv(r=0): (2*0 - 1) tdiv 2 = 0 (truncates toward zero, DuckDB
    // // semantics), NOT -1 (floor)
    assert(nout(1L)._4 == 0L)
    assert(nout(1L)._7 == 0L, "k1 = -1 tdiv 2 truncates to 0")
  }

  test("intransitivityAudit: an over-limit item panel fails fast " +
    "before the O(items³) walk") {
    val duels = (0 to Preference.MaxTripleItems)
      .map(i => (s"i$i", "t")).toDF("w", "l")
    val e = intercept[IllegalArgumentException] {
      Preference.intransitivityAudit(duels, col("w"), col("l"))
    }
    assert(e.getMessage.contains("O(items³)"))
  }

}
