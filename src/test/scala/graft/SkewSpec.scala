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
}
