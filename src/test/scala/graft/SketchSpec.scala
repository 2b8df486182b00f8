package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate lands within a few percent of the exact count") {
    val df = (1L to 20000L).map(i => ("g", i)).toDF("g", "v")
    val est = Sketch.hllDistinct(df, Seq("g"), $"v")
      .select($"n_approx").as[Double].head()
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05,
      s"estimate $est too far from 20000")
  }

  test("small cardinalities ride the linear-counting branch accurately") {
    val df = (1L to 300L).map(i => ("g", i)).toDF("g", "v")
    val est = Sketch.hllDistinct(df, Seq("g"), $"v")
      .select($"n_approx").as[Double].head()
    assert(math.abs(est - 300.0) / 300.0 < 0.05, s"estimate $est vs 300")
  }

  test("estimate is insensitive to duplication — it sketches the SET") {
    val once = (1L to 5000L).map(i => ("g", i)).toDF("g", "v")
    val thrice = once.unionByName(once).unionByName(once)
    val a = Sketch.hllDistinct(once, Seq("g"), $"v")
      .select($"n_approx").as[Double].head()
    val b = Sketch.hllDistinct(thrice, Seq("g"), $"v")
      .select($"n_approx").as[Double].head()
    assert(a == b, "duplicates must not move the estimate at all")
  }

  test("merged register tables equal the sketch of the union") {
    val left = (1L to 4000L).map(i => ("g", i)).toDF("g", "v")
    val right = (2000L to 7000L).map(i => ("g", i)).toDF("g", "v")
    val merged = Sketch.hllEstimate(
      Sketch.hllMerge(
        Sketch.hllRegisters(left, Seq("g"), $"v"),
        Sketch.hllRegisters(right, Seq("g"), $"v"),
        Seq("g")),
      Seq("g"))
      .select($"n_approx").as[Double].head()
    val direct = Sketch.hllDistinct(left.unionByName(right), Seq("g"), $"v")
      .select($"n_approx").as[Double].head()
    assert(merged == direct, "sketch union must equal union sketch exactly")
  }
}
