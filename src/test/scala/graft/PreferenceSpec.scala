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
