package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals the direct aggregate on a skewed key set") {
    // 10k rows for the hot key, a handful for the rest
    val df = (Seq.fill(10000)("hot") ++ Seq("a", "a", "b")).zipWithIndex
      .map { case (k, i) => (k, i.toLong % 7) }.toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("sum"), count(lit(1)).as("count"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedSumCount(df, $"k", $"v", 16)
      .as[(String, Long, Long)].collect().toSet
    assert(salted == direct)
  }

  test("saltJoinSides preserves join results while spreading hot keys") {
    val big = (1 to 5000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val small = Seq(("hot", "H"), ("cold", "C")).toDF("k", "tag")
    val (b, s) = Skew.saltJoinSides(big, small, 8)
    val joined = b.join(s, Seq("k", "__salt")).drop("__salt")
    assert(joined.count() == 5000)
    assert(s.select(countDistinct($"__salt")).as[Long].head() == 8)
    val direct = big.join(small, Seq("k"))
    assert(joined.agg(sum($"v")).as[Long].head() ==
      direct.agg(sum($"v")).as[Long].head())
  }

  test("saltedJoin is row-identical to the plain join, including multi-row matches") {
    val big = ((1 to 3000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => ("warm", i.toLong)) ++ Seq(("lonely", 1L)))
      .toDF("k", "v")
    // a key with TWO small-side rows: every big row must match both
    val small = Seq(("hot", "H1"), ("hot", "H2"), ("warm", "W"))
      .toDF("k", "tag")
    val salted = rowsOf(Skew.saltedJoin(big, small, Seq("k"), 8))
    val direct = rowsOf(big.join(small, Seq("k")))
    assert(salted == direct)
    assert(salted.size == 3000 * 2 + 50, "hot rows match both small rows")
  }

  test("autoSaltFactor scales with the hot key's share and clamps to " +
      "[1, parallelism]; flat keys get factor 1") {
    import graft.ops.Profile
    // hot key: 500 of 1000 rows → share 0.5 → ⌈0.5·16⌉ = 8
    val hot = ((1 to 500).map(_ => 0L) ++ (501L to 1000L)).toDF("k")
    val rHot = Profile.keySkewReport(hot, $"k", 16L)
    assert(Skew.autoSaltFactor(rHot, 16) == 8)
    // everything one key → share 1.0 → clamp to parallelism
    val all = Seq.fill(100)(7L).toDF("k")
    assert(Skew.autoSaltFactor(Profile.keySkewReport(all, $"k", 16L), 16) == 16)
    // flat: 1000 distinct keys, share 1/1000 → factor 1
    val flat = (1L to 1000L).toDF("k")
    assert(Skew.autoSaltFactor(Profile.keySkewReport(flat, $"k", 16L), 16) == 1)
  }

  test("autoSaltedJoin equals the plain join on both dispatch paths " +
      "(flat → unsalted, hot → salted)") {
    val small = Seq((0L, "zero"), (5L, "five"), (9L, "nine")).toDF("k", "tag")
    val hotBig = ((1 to 800).map(_ => 0L) ++ (1L to 200L).map(_ % 10))
      .toDF("k").withColumn("v", col("k") * 3 + 1)
    val flatBig = (1L to 500L).map(i => (i % 10, i)).toDF("k", "v")
    for (big <- Seq(hotBig, flatBig)) {
      val auto = rowsOf(Skew.autoSaltedJoin(big, small, Seq("k"), 16))
      val direct = rowsOf(big.join(small, Seq("k")))
      assert(auto == direct)
    }
  }

  test("consistentHashOwners: every key owned, and adding a worker " +
    "only ever moves keys TO the new worker (the ring property)") {
    import spark.implicits._
    val keys = (1 to 500).map(_.toLong).toDF("id")
    val w = (0 until 8).map(i => s"w$i")
    val o8 = Skew.consistentHashOwners(keys, $"id", w, 32)
      .withColumnRenamed("owner", "o8")
    val o9 = Skew.consistentHashOwners(keys, $"id", w :+ "w8", 32)
      .withColumnRenamed("owner", "o9")
    val j = o8.join(o9, "k").as[(String, String, String)].collect()
    assert(j.length == 500 && j.forall(r => r._2 != null && r._3 != null))
    val moved = j.filter(r => r._2 != r._3)
    assert(moved.nonEmpty && moved.forall(_._3 == "w8"),
      s"moved keys must land on the new worker only: ${moved.take(3).mkString(",")}")
    // ~1/9 expected; generous band
    assert(moved.length > 10 && moved.length < 200,
      s"moved=${moved.length}")
  }
}
