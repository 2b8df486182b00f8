package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pins the bench harness's error contract: a query that throws during
  * measurement must surface in the error set, never bench as a silent
  * green number (round 6 recorded -1 rows and wall time with no flag).
  */
class BenchSpec extends SparkSpec {
  import spark.implicits._

  test("timeQueries flags a deliberately broken query and times the rest") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }
    val broken: (SparkSession, String) => DataFrame =
      (s, _) => {
        import s.implicits._
        // analysis succeeds, execution throws (raise_error is lazy)
        Seq(1).toDF("x").select(
          when($"x" > 0, raise_error(lit("deliberate bench failure")))
            .otherwise($"x").as("x"))
      }
    val (times, errs) = Bench.timeQueries(spark, "/nonexistent",
      Map("q_ok" -> ok, "q_broken" -> broken))
    assert(errs == Set("q_broken"))
    assert(times.keySet == Set("q_ok", "q_broken"))
    assert(times.values.forall(_ >= 0.0)) // time-to-failure still recorded
  }

  test("calibration probe runs the fixed CPU-bound job and returns " +
      "a positive wall time") {
    // work content is pinned by construction (constant range, fixed
    // slices); the only testable contracts are that it completes and
    // reports elapsed wall time — never a timing bound (host noise)
    val c = Bench.calibrate(spark)
    assert(c > 0.0)
  }

  test("a query whose plan fails at construction is also flagged") {
    val explodes: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("bad query builder")
    val (times, errs) = Bench.timeQueries(spark, "/nonexistent",
      Map("q_boom" -> explodes))
    assert(errs == Set("q_boom"))
    assert(times.contains("q_boom"))
  }
}
