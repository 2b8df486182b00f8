package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Merge, Resample}
import java.sql.Date

/** Property layer (SURVEY §5): invariants that must hold for arbitrary
  * inputs, not just goldens. Uses raw ScalaCheck generators with fixed
  * seeds (deterministic CI) — a handful of samples per property since
  * each case runs real Spark jobs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val epoch = Date.valueOf("2024-01-01").toLocalDate

  private val barGen: Gen[(String, Date, Double, Long)] = for {
    sym <- Gen.oneOf("A", "B", "C")
    day <- Gen.choose(0, 400)
    px <- Gen.choose(1.0, 1000.0)
    vol <- Gen.choose(1L, 100000L)
  } yield (sym, Date.valueOf(epoch.plusDays(day.toLong)), px, vol)

  test("property: weekEndFri lands on a Friday, within 6 days, order-preserving") {
    for (offsets <- samples(Gen.listOfN(60, Gen.choose(0, 2000)), 5)) {
      val rows = offsets.map(o => Date.valueOf(epoch.plusDays(o.toLong)))
        .toDF("d")
        .select($"d", Resample.weekEndFri($"d").as("we"))
        .select($"d", $"we", dayofweek($"we").as("dow"),
          datediff($"we", $"d").as("delta"))
        .as[(Date, Date, Int, Int)].collect()
      assert(rows.forall(_._3 == 6), "labels must be Fridays (dayofweek=6)")
      assert(rows.forall(r => r._4 >= 0 && r._4 <= 6))
      val sorted = rows.sortBy(_._1.getTime)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => !a._2.after(b._2) },
        "a later day must never map to an earlier week label")
    }
  }

  test("property: resampled bars always satisfy low <= open,close <= high") {
    for (bars <- samples(Gen.listOfN(80, barGen), 5)) {
      val df = bars.toDF("symbol", "d", "px", "vol")
        .withColumn("ord", Resample.ordinal($"d", lit(0)))
      val out = Resample.ohlc(df, $"symbol", Resample.weekEndFri($"d"),
        $"px", $"vol", $"ord")
      val bad = out.filter($"low" > $"open" || $"low" > $"close" ||
        $"high" < $"open" || $"high" < $"close" || $"low" > $"high")
      assert(bad.count() == 0)
      val inVol = bars.map(_._4).sum.toDouble
      val outVol = out.agg(sum($"volume")).as[Double].head()
      assert(math.abs(outVol - inVol) < 0.5, "volume conservation across buckets")
    }
  }

  test("property: upsert is idempotent and last-writer-wins for any batch pair") {
    val pairs = samples(Gen.zip(Gen.listOfN(40, barGen), Gen.listOfN(40, barGen)), 4)
    for ((b0, b1) <- pairs) {
      val existing = b0.toDF("symbol", "d", "px", "vol").withColumn("v", lit(0L))
      val incoming = b1.toDF("symbol", "d", "px", "vol").withColumn("v", lit(1L))
      val keys = Seq("symbol", "d")
      val tiebreaks = Seq($"px", $"vol")
      val merged = Merge.upsert(existing, incoming, keys, "v", tiebreaks: _*)
      assert(merged.groupBy("symbol", "d").count().filter($"count" > 1).count() == 0,
        "merged table must be key-unique")
      val incomingKeys = incoming.select("symbol", "d").distinct()
      assert(merged.join(incomingKeys, keys).filter($"v" =!= 1L).count() == 0,
        "every key present in the incoming batch must carry the incoming row")
      val again = Merge.upsert(merged, incoming, keys, "v", tiebreaks: _*)
      assert(rowsOf(again) == rowsOf(merged), "re-merging must be a no-op")
    }
  }

  test("property: as-of join equals the brute-force per-row maximum") {
    val tradeGen = Gen.listOfN(30, for {
      sym <- Gen.oneOf("A", "B")
      t <- Gen.choose(0L, 100L)
    } yield (sym, t))
    val quoteGen = Gen.listOfN(25, for {
      sym <- Gen.oneOf("A", "B")
      t <- Gen.choose(0L, 100L)
      v <- Gen.choose(1.0, 9.0)
    } yield (sym, t, v))
    for ((ts, qsRaw) <- samples(Gen.zip(tradeGen, quoteGen), 4)) {
      // unique (sym, t) on the right side — the documented precondition
      val qs = qsRaw.groupBy(q => (q._1, q._2)).map(_._2.head).toSeq
      val trades = ts.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, s, t) }
        .toDF("tid", "sym", "t")
      val quotes = qs.toDF("sym", "t", "qv")
      val got = graft.ops.Asof.joinAsOf(trades, quotes, Seq("sym"), "t", "t")
        .select($"tid", $"qv").as[(Long, Option[Double])].collect().toMap
      ts.zipWithIndex.foreach { case ((s, t), i) =>
        val expect = qs.filter(q => q._1 == s && q._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        assert(got(i.toLong) == expect,
          s"trade ($s,$t): got ${got(i.toLong)}, want $expect")
      }
    }
  }
}
