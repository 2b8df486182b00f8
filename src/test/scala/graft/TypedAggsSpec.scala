package graft

import org.apache.spark.sql.functions._
import graft.functions.TypedAggs
import graft.functions.TypedAggs.OrdVal

class TypedAggsSpec extends SparkSpec {
  import spark.implicits._

  test("firstByOrd/lastByOrd agree with min_by/max_by on random data") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(20).toString, rnd.nextInt(100000).toLong, rnd.nextDouble() * 100))
    val df = rows.toDF("k", "ord", "v")
    val builtin = df.groupBy($"k")
      .agg(min_by($"v", $"ord").as("first"), max_by($"v", $"ord").as("last"))
      .as[(String, Double, Double)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    val typed = df.as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => OrdVal(r._2, r._3))
      .agg(TypedAggs.firstByOrd.toColumn.name("first"),
        TypedAggs.lastByOrd.toColumn.name("last"))
      .collect().map { case (k, a, b) => k -> (a, b) }.toMap
    assert(typed == builtin)
  }

  test("gramian aggregator equals the brute-force outer-product sum " +
      "across many partitions; ragged widths and overflow throw") {
    val rnd = new scala.util.Random(41)
    val d = 7
    val vecs = (1 to 400).map(_ => Array.fill(d)(rnd.nextInt(2001) - 1000L))
    val brute = Array.ofDim[Long](d, d)
    for (v <- vecs; i <- 0 until d; j <- 0 until d)
      brute(i)(j) += v(i) * v(j)
    // 13 partitions force real partial-buffer merges
    val out = spark.createDataset(vecs).repartition(13)
      .select(TypedAggs.gramian.toColumn).head()
    assert(out.d == d)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      assert(out.tri(k) == brute(i)(j), s"cell ($i,$j)")
      k += 1
    }
    assert(k == d * (d + 1) / 2)
    // empty input stays the zero sentinel; zero-length rows are skipped
    assert(spark.createDataset(Seq.empty[Array[Long]])
      .select(TypedAggs.gramian.toColumn).head().d == 0)
    // ragged vector widths must fail loudly, not mis-index
    intercept[Exception] {
      spark.createDataset(Seq(Array(1L, 2L), Array(1L, 2L, 3L)))
        .repartition(1)
        .select(TypedAggs.gramian.toColumn).head()
    }
    // a cell crossing 2^63 must THROW (addExact), never wrap silently
    intercept[Exception] {
      spark.createDataset(Seq(Array(3037000500L), Array(3037000500L)))
        .repartition(1)
        .select(TypedAggs.gramian.toColumn).head()
    }
    // width past MaxGramianDim fails fast on row ONE — the triangle
    // buffer rides every partial aggregate, so an absurd d must not
    // get as far as allocating executor memory per partition
    intercept[Exception] {
      spark.createDataset(
          Seq(Array.fill(TypedAggs.MaxGramianDim + 1)(1L)))
        .repartition(1)
        .select(TypedAggs.gramian.toColumn).head()
    }
  }
}
