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
}
