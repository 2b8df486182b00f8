package graft

import org.apache.spark.sql.functions._
import graft.ops.LinearModel

class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  private def away(d: Double): Long =
    if (d >= 0) math.floor(d + 0.5).toLong else math.ceil(d - 0.5).toLong

  /** Independent reference: the identical snapped trajectory in plain
    * Scala maps — every margin/gradient an exact integer sum, sigmoid
    * snapped ×1e6, updates rounded half-away-from-zero.
    */
  private def ref(xs: Seq[(Long, Seq[Double])], ys: Map[Long, Long],
                  iters: Int): Map[Int, Long] = {
    val xi = xs.flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, d) => (id, d, away(x * 1e6)) } :+
        ((id, -1, 1000000L))
    }
    val dims = xi.map(_._2).distinct
    var w = dims.map(_ -> 0L).toMap
    val n = ys.size
    for (_ <- 1 to iters) {
      val m = xs.map { case (id, _) =>
        id -> xi.filter(_._1 == id).map(t => t._3 * w(t._2)).sum
      }.toMap
      val p = m.map { case (id, m12) =>
        id -> away(1e6 / (1.0 + math.exp(-(m12.toDouble / 1e12))))
      }
      val g = xi.groupBy(_._2).map { case (d, rows) =>
        d -> rows.map(t => t._3 * (ys(t._1) * 1000000L - p(t._1))).sum
      }
      w = w.map { case (d, wv) =>
        d -> (wv + away(g(d).toDouble / (n.toDouble * 1e6)))
      }
    }
    w
  }

  private val xs: Seq[(Long, Seq[Double])] = Seq(
    0L -> Seq(0.2, -0.4, 0.1), 1L -> Seq(0.3, -0.1, 0.2),
    2L -> Seq(0.25, -0.3, 0.15), 3L -> Seq(0.1, 0.0, 0.3),
    4L -> Seq(-0.2, 0.4, -0.1), 5L -> Seq(-0.3, 0.1, -0.2),
    6L -> Seq(-0.25, 0.3, -0.15), 7L -> Seq(-0.1, 0.0, -0.3))
  private val ys: Map[Long, Long] =
    Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 0L, 5L -> 0L, 6L -> 0L, 7L -> 0L)

  private def train(iters: Int): Map[Int, Long] =
    LinearModel.logisticGd(
      xs.toDF("id", "x"),
      ys.toSeq.toDF("id", "y"), iters)
      .as[(Int, Long)].collect().toMap

  test("logisticGd matches the independent snapped-trajectory " +
      "reference bit-for-bit across three iterations") {
    assert(train(3) == ref(xs, ys, 3))
    assert(train(1) == ref(xs, ys, 1))
  }

  test("logisticGd learns the separating direction and the " +
      "trajectory actually moves between iterations") {
    val w3 = train(3)
    // class 1 has positive dim0/dim2 and negative dim1
    assert(w3(0) > 0 && w3(2) > 0 && w3(1) < 0)
    assert(w3.contains(-1)) // bias row present
    assert(train(1) != w3)  // iterations matter
  }

  test("logisticGd gradient sums accumulate as decimal(38,0) and " +
      "never wrap past Long (the r13 advisor bound)") {
    // per-row gradient term = xi·(ymu−pmu) = 1e13·5e5 = 5e18; two
    // same-sign rows sum to 1e19 > Long.MaxValue (9.22e18) — a
    // LongType sum wraps negative and flips the learned direction
    val bigXs = Seq(0L -> Seq(1.0e7), 1L -> Seq(1.0e7))
    val bigYs = Seq(0L -> 1L, 1L -> 1L)
    val got = LinearModel.logisticGd(bigXs.toDF("id", "x"),
      bigYs.toDF("id", "y"), 1).as[(Int, Long)].collect().toMap
    // exact BigInt replay of iteration 1: w=0 → m12=0 → pmu=500000
    val g0 = BigInt("10000000000000") * 500000L * 2 // 1e19, > Long.Max
    assert(g0 > BigInt(Long.MaxValue))
    assert(got(0) == away(g0.toDouble / (2.0 * 1e6)) && got(0) > 0)
    val gb = BigInt(1000000L) * 500000L * 2
    assert(got(-1) == away(gb.toDouble / (2.0 * 1e6)))
  }

  test("scoreLogistic replays the forward pass bit-for-bit and " +
      "calibrationBins emits exact per-bin masses with the top edge " +
      "clamped") {
    val wMap = ref(xs, ys, 3)
    val wDf = wMap.toSeq.toDF("dim", "w_micro")
    val scored = LinearModel.scoreLogistic(xs.toDF("id", "x"), wDf)
      .as[(Long, Long)].collect().toMap
    // independent forward pass on the reference weights
    val want = xs.map { case (id, v) =>
      val m = v.zipWithIndex.map { case (x, d) =>
        away(x * 1e6) * wMap(d) }.sum + 1000000L * wMap(-1)
      id -> away(1e6 / (1.0 + math.exp(-(m.toDouble / 1e12))))
    }.toMap
    assert(scored == want)
    // bins: replay the clamped integer floor, compare whole rows
    val got = LinearModel.calibrationBins(
        LinearModel.scoreLogistic(xs.toDF("id", "x"), wDf),
        ys.toSeq.toDF("id", "y"), 10)
      .as[(Int, Long, Long, Long)].collect().toSet
    val expect = want.toSeq.groupBy { case (_, pmu) =>
      math.min(pmu * 10 / 1000000, 9).toInt
    }.map { case (b, rows) =>
      (b, rows.size.toLong, rows.map(r => ys(r._1)).sum,
        rows.map(_._2).sum)
    }.toSet
    assert(got == expect)
    // a perfect 1e6 score lands in bin 9, never a phantom bin 10
    val sure = LinearModel.calibrationBins(
        Seq((0L, 1000000L), (1L, 0L)).toDF("id", "pmu"),
        Seq((0L, 1L), (1L, 0L)).toDF("id", "y"), 10)
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(sure == Set((9, 1L, 1L, 1000000L), (0, 1L, 0L, 0L)))
  }

  test("expectedCalibrationError: exact gap arithmetic on hand-built " +
      "bins; a perfectly calibrated table scores 0") {
    // bin A: 4 rows, 3 positives, predicted mass 2.0e6 → gap12 = 1e6
    // bin B: 6 rows, 1 positive, predicted mass 2.5e6 → gap12 = 1.5e6
    // ECE = (1e6 + 1.5e6)/10 = 250000; worst bin gap = 1.5e6/6 = 250000
    val bins = Seq((0, 4L, 3L, 2000000L), (1, 6L, 1L, 2500000L))
      .toDF("bin", "n", "positives", "pmu_mass")
    val got = LinearModel.expectedCalibrationError(bins)
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((10L, 2L, 250000L, 250000L)))
    // perfect calibration: every bin's mass equals its positives ×1e6
    val perfect = Seq((0, 5L, 2L, 2000000L), (1, 5L, 5L, 5000000L))
      .toDF("bin", "n", "positives", "pmu_mass")
    val z = LinearModel.expectedCalibrationError(perfect)
      .as[(Long, Long, Long, Long)].head()
    assert(z._3 == 0L && z._4 == 0L)
  }

  test("logisticGd under a one-class corpus pushes every weight " +
      "toward that class and stays exact") {
    val allOne = ys.map { case (k, _) => k -> 1L }
    assert(train(2) != null) // sanity: mixed case already covered
    val got = LinearModel.logisticGd(xs.toDF("id", "x"),
      allOne.toSeq.toDF("id", "y"), 2)
      .as[(Int, Long)].collect().toMap
    assert(got == ref(xs, allOne, 2))
    assert(got(-1) > 0) // bias climbs when every label is 1
  }

  test("tracInfluence: exact three-factor products, trunc-toward-zero " +
    "micro scale, probe excluded from the train side") {
    import org.apache.spark.sql.functions.col
    val vecs = Seq((100L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(-1.0, 0.0)), (3L, Seq(0.5, 0.0)))
      .toDF("id", "x")
    val labels = Seq((100L, 1L), (1L, 0L), (2L, 1L), (3L, 0L))
      .toDF("id", "y")
    val w = Seq((-1, 0L), (0, 1000000L), (1, 0L))
      .toDF("dim", "w_micro")
    val probes = Seq(Tuple1(100L)).toDF("id")
    val out = LinearModel.tracInfluence(vecs, labels, w, probes, 5)
      .as[(Long, Long, Int, Long)].collect().sortBy(_._3)
    assert(out.map(_._2).toSeq == Seq(2L, 3L, 1L),
      "zero-dot train ranks first, then the less-negative influencer")
    assert(!out.map(_._2).contains(100L), "probe never self-influences")
    // pmu: sigma(1) = 731059, sigma(-1) = 268941, sigma(.5) = 622459
    def trunc(a: BigInt): Long = (a / BigInt(1000000000000L)).toLong
    val rp = BigInt(731059 - 1000000)
    assert(out.map(_._4).toSeq == Seq(0L,
      trunc(BigInt(622459) * rp * BigInt(1500000000000L)),
      trunc(BigInt(731059) * rp * BigInt(2000000000000L))))
  }

  test("el2nScores: |pmu - ymu| ranks hardest examples, ties break on id") {
    import org.apache.spark.sql.functions.col
    val vecs = Seq((100L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(-1.0, 0.0)), (3L, Seq(0.5, 0.0)))
      .toDF("id", "x")
    val labels = Seq((100L, 1L), (1L, 0L), (2L, 1L), (3L, 0L))
      .toDF("id", "y")
    val w = Seq((-1, 0L), (0, 1000000L), (1, 0L))
      .toDF("dim", "w_micro")
    val out = LinearModel.el2nScores(vecs, labels, w, 2)
      .as[(Long, Long, Long, Long)].collect()
    // errors: id1 = 731059, id2 = |268941-1e6| = 731059 (tie -> id asc),
    // id3 = 622459, id100 = 268941
    assert(out.map(r => (r._1, r._4)).toSeq ==
      Seq((1L, 731059L), (2L, 731059L)))
  }
}
