package graft

import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profiler counts nulls/distincts and bounds numerics in one pass") {
    val df = Seq(
      (Some(1.0), Some("a")), (Some(2.5), None),
      (None, Some("a")), (Some(2.5), Some("b")))
      .toDF("x", "s")
    val got = Profile.profile(df, Seq("x", "s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("x") == ("x", 4L, 1L, 2L, Some(1.0), Some(2.5)))
    assert(got("s") == ("s", 4L, 1L, 2L, None, None),
      "string columns have no numeric bounds")
  }
}
