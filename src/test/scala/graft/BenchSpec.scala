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

  test("instrumented pass records a start offset per query and " +
      "interleaves probes at the requested cadence") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq(1).toDF("x") }
    val qs = (1 to 5).map(i => s"q$i" -> ok).toMap
    val r = Bench.timeQueriesInstrumented(spark, "/nonexistent", qs,
      probeEvery = 2)
    assert(r.times.keySet == qs.keySet)
    assert(r.startOffsets.keySet == qs.keySet)
    // offsets are measured from pass start and strictly increase in
    // execution order
    val ordered = r.startOffsets.values.toSeq.sorted
    assert(ordered.head >= 0.0 && ordered == ordered.distinct,
      "start offsets must be distinct and non-negative")
    // 5 queries at cadence 2 → probes after queries 2 and 4
    assert(r.probes.map(_._1) == Seq(2, 4),
      s"probe positions: ${r.probes.map(_._1)}")
    assert(r.probes.forall(_._2 > 0.0))
    // cadence 0 disables probing (the plain timeQueries path)
    val r0 = Bench.timeQueriesInstrumented(spark, "/nonexistent", qs,
      probeEvery = 0)
    assert(r0.probes.isEmpty)
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
