package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{Events, Profile}

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel requires steps in time order, not mere presence") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // u2: purchase BEFORE view/click -> only step 1 counts
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3: view then purchase, no click -> depth 1
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:00:00"), "purchase"),
      // u4: unrelated events only -> depth 0, not even step 1
      (4L, ts("2024-01-01 10:00:00"), "error"))
      .toDF("user_id", "ts", "event_type")
    val out = Events.funnelCounts(ev, $"user_id", $"ts", $"event_type",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out == Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("funnel resolves same-microsecond ties to the earlier step") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:01"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val reached = Events.funnelReached(ev, $"user_id", $"ts",
        $"event_type", Seq("view", "click", "purchase"))
      .select($"reached").as[Long].head()
    // view and click at the same instant: view (idx 1) sorts first, so
    // the walk still completes all three steps
    assert(reached == 3L)
  }

  test("windowed funnel: steps count only within the window of the first anchor") {
    val ev = Seq(
      // u1: purchase lands outside 1h of the first view -> depth 2
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2: click outside the window -> depth 1
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:30:00"), "click"),
      // u3: full funnel inside the window
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:20:00"), "click"),
      (3L, ts("2024-01-01 10:40:00"), "purchase"),
      // u4: a SECOND view does not restart the anchor (first touch):
      // click is within 1h of the second view but not the first
      (4L, ts("2024-01-01 08:00:00"), "view"),
      (4L, ts("2024-01-01 09:00:00"), "view"),
      (4L, ts("2024-01-01 09:30:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val reached = Events.funnelReachedWithin(ev, $"user_id", $"ts",
        $"event_type", Seq("view", "click", "purchase"), 3600L)
      .as[(Long, Long)].collect().toMap
    assert(reached == Map(1L -> 2L, 2L -> 1L, 3L -> 3L, 4L -> 1L))
    val counts = Events.funnelCountsWithin(ev, $"user_id", $"ts",
        $"event_type", Seq("view", "click", "purchase"), 3600L)
      .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(counts == Map(1 -> 4L, 2 -> 2L, 3 -> 1L))
  }

  test("sessionize splits strictly-greater-than-gap, 1-based ids") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:29:00")),  // 29 min: same session
      (1L, 12L, ts("2024-01-01 10:59:00")),  // exactly 30 min: SAME (strict >)
      (1L, 13L, ts("2024-01-01 11:29:01")),  // 30m01s: new session
      (2L, 20L, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_id", "ts")
    val out = Events.sessionize(ev, $"user_id", $"ts", $"event_id", 1800L)
      .select($"event_id", $"session_id").as[(Long, Long)]
      .collect().toMap
    assert(out == Map(10L -> 1L, 11L -> 1L, 12L -> 1L, 13L -> 2L, 20L -> 1L))
  }

  test("sessionize plans one exchange and one sort (windows share the spec)") {
    val ev = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_id", "ts")
    val plan = Events.sessionize(ev, $"user_id", $"ts", $"event_id", 1800L)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected one exchange, got:\n$plan")
    assert("\\+- Sort ".r.findAllIn(plan).size == 1,
      s"expected one sort, got:\n$plan")
  }

  test("cohort retention counts distinct active users per week offset") {
    val ev = Seq(
      // u1 first event Tue Jan 2 (cohort week Mon Jan 1), active wk0 + wk2
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),  // same week, must not double-count
      (1L, ts("2024-01-16 10:00:00")),
      // u2 cohort week Jan 1 too, only wk0
      (2L, ts("2024-01-05 10:00:00")),
      // u3 cohort week Jan 8, active wk0 and wk1
      (3L, ts("2024-01-08 10:00:00")),
      (3L, ts("2024-01-17 10:00:00")))
      .toDF("user_id", "ts")
    val out = Events.cohortRetention(ev, $"user_id", $"ts")
      .as[(java.sql.Date, Int, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 2) -> 1L,
      ("2024-01-08", 0) -> 1L, ("2024-01-08", 1) -> 1L))
  }

  test("sessionTransitions: pairs stop at session boundaries, " +
      "probabilities normalize per from-type") {
    val ev = Seq(
      // u1 session 1: view -> click -> view (2 transitions)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:10:00"), 3L, "view"),
      // u1 session 2 (2h gap): buy alone — the view->buy hop across the
      // boundary must NOT appear
      (1L, ts("2024-01-01 12:30:00"), 4L, "buy"),
      // u2 one session: view -> buy
      (2L, ts("2024-01-01 10:00:00"), 5L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 6L, "buy"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.sessionTransitions(ev, $"user_id", $"ts",
        $"event_id", $"event_type", 1800L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      ("view", "click") -> ((1L, 0.5)),
      ("view", "buy") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 1.0))))
  }

  test("lastTouchAttribution credits the latest preceding touch; " +
      "untouched conversions land in none") {
    val ev = Seq(
      // u1: view then click then purchase → click wins (latest)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click", 0.0),
      (1L, ts("2024-01-01 10:10:00"), 3L, "purchase", 10.0),
      // u1 second purchase: still the same click (no new touch)
      (1L, ts("2024-01-01 10:20:00"), 4L, "purchase", 5.0),
      // u2: purchase BEFORE any touch → none; later view→purchase
      (2L, ts("2024-01-01 09:00:00"), 5L, "purchase", 7.0),
      (2L, ts("2024-01-01 09:30:00"), 6L, "view", 0.0),
      (2L, ts("2024-01-01 09:45:00"), 7L, "purchase", 2.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val r = Events.lastTouchAttribution(ev, $"user_id", $"ts",
        $"event_id", $"event_type", $"value",
        Seq("click", "view"), "purchase")
      .as[(String, Long, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r == Map(
      "click" -> ((2L, 15.0)),
      "view" -> ((1L, 2.0)),
      "none" -> ((1L, 7.0))))
  }

  test("linearAttribution splits each purchase equally over ALL prior " +
      "touches; orphan purchases report as none") {
    val ev = Seq(
      // u1: view, click, then a 30.0 purchase → 15 each; then another
      // view and a 12.0 purchase over 3 touches → 4 each
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click", 0.0),
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase", 30.0),
      (1L, ts("2024-01-01 10:03:00"), 4L, "view", 0.0),
      (1L, ts("2024-01-01 10:04:00"), 5L, "purchase", 12.0),
      // u2: purchase with no prior touch → 'none'
      (2L, ts("2024-01-01 09:00:00"), 6L, "purchase", 7.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Events.linearAttribution(ev, $"user_id", $"ts",
        $"event_id", $"event_type", $"value", Seq("click", "view"),
        "purchase")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // view: 15 + 4 (first view) + 4 (second view) = 23; click: 15 + 4
    assert(out == Map(
      "view" -> ((2L, 23.0)),
      "click" -> ((1L, 19.0)),
      "none" -> ((1L, 7.0))))
  }

  test("conversionLag: first-view anchor, at-or-after first purchase, " +
      "non-converters and pre-view purchasers drop out") {
    val ev = Seq(
      // u1: view 10:00, purchases 10:30 and 11:00 → lag 1800 s
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "purchase"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      // u2: purchase BEFORE the only view → no conversion
      (2L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3: view only → no conversion
      (3L, ts("2024-01-01 10:00:00"), "view"),
      // u4: SECOND view is not the anchor — lag from the FIRST view
      (4L, ts("2024-01-01 08:00:00"), "view"),
      (4L, ts("2024-01-01 09:00:00"), "view"),
      (4L, ts("2024-01-01 09:10:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Events.conversionLag(ev, $"user_id", $"ts", $"event_type",
        "view", "purchase")
      .as[(java.sql.Date, Long, Double, Double)].collect()
    assert(out.length == 1)
    val (_, n, p50, p90) = out.head
    // lags: u1 1800 s, u4 4200 s → p50 = 3000, p90 = 0.9-interpolated
    assert(n == 2L)
    assert(p50 == 3000.0)
    assert(p90 == 1800.0 + 0.9 * (4200.0 - 1800.0))
  }

  test("sessionPathTrigrams: 3-grams never span a session boundary") {
    val ev = Seq(
      // one session: a b c d → trigrams abc, bcd
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "c"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "d"),
      // same user, >30 min gap: b c | (new session) a b c
      (2L, ts("2024-01-01 10:00:00"), 5L, "b"),
      (2L, ts("2024-01-01 10:01:00"), 6L, "c"),
      (2L, ts("2024-01-01 11:00:00"), 7L, "a"),
      (2L, ts("2024-01-01 11:01:00"), 8L, "b"),
      (2L, ts("2024-01-01 11:02:00"), 9L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Events.sessionPathTrigrams(ev, $"user_id", $"ts",
        $"event_id", $"event_type", 1800L, 10)
      .as[(String, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    // u2's pre-gap "b c" never chains into the post-gap "a": no bca/cab
    assert(out == Map(("a", "b", "c") -> 2L, ("b", "c", "d") -> 1L))
  }

  test("timeDecayAttribution: weights halve per half-life, credit " +
      "conserves the converted value, orphans report under 'none'") {
    // u1: click 14 days before, view 7 days before, click at T-0h —
    // weights 0.25 : 0.5 : 1.0 → shares 1/7, 2/7, 4/7 of $7.00.
    // u2: purchase with no prior touch → 'none' bucket, full $3.00.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0),
      (1L, ts("2024-01-08 00:00:00"), 2L, "view", 0.0),
      (1L, ts("2024-01-15 00:00:00"), 3L, "click", 0.0),
      (1L, ts("2024-01-15 00:00:00"), 4L, "purchase", 7.0),
      (2L, ts("2024-01-02 00:00:00"), 5L, "purchase", 3.0),
      (2L, ts("2024-01-03 00:00:00"), 6L, "click", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Events.timeDecayAttribution(ev, $"user_id", $"ts",
        $"event_id", $"event_type", $"value",
        Seq("click", "view"), "purchase", 7.0)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // clicks: (0.25 + 1.0)/1.75 of 7.00 = 5.00; view: 0.5/1.75 = 2.00
    assert(out("click") == ((2L, 5.0)), s"click: ${out("click")}")
    assert(out("view") == ((1L, 2.0)), s"view: ${out("view")}")
    assert(out("none") == ((1L, 3.0)), "post-conversion touches don't count")
    // conservation: attributed + orphan credit = total converted value
    assert(math.abs(out.values.map(_._2).sum - 10.0) < 1e-6)
  }

  test("timeDecayAttribution: touches past ~21 half-lives clamp to the " +
      "minimum weight instead of vanishing — value is conserved, not " +
      "silently dropped (and never divides by a zero weight sum)") {
    // both touches are 200 days stale at a 7-day half-life: raw ×1e6
    // weights round to 0; unclamped, sw_fp = 0 → credit = round(NaN)
    // → the $5.00 evaporates. Clamped to 1 each, they split evenly.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0),
      (1L, ts("2024-01-02 00:00:00"), 2L, "view", 0.0),
      (1L, ts("2024-07-20 00:00:00"), 3L, "purchase", 5.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Events.timeDecayAttribution(ev, $"user_id", $"ts",
        $"event_id", $"event_type", $"value",
        Seq("click", "view"), "purchase", 7.0)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("click") == ((1L, 2.5)), s"click: ${out.get("click")}")
    assert(out("view") == ((1L, 2.5)), s"view: ${out.get("view")}")
    assert(out("none") == ((0L, 0.0)), "the conversion has prior touches")
    assert(math.abs(out.values.map(_._2).sum - 5.0) < 1e-6,
      "conservation must hold even when every weight underflows")
  }

  test("robustOutliers flags by median/MAD and survives outlier drag") {
    // group a: tight cluster around 10 with one wild point; the mean/σ
    // z-score of 100 would shrink under the outlier's own drag, the
    // MAD flag does not. group b: all-identical -> MAD 0, any deviation
    // flags (multiply-form, no division blowup).
    val df = (Seq.fill(9)(("a", 10.0)) ++ Seq(("a", 100.0)) ++
      Seq.fill(4)(("b", 5.0))).toDF("g", "v")
    val out = Profile.robustOutliers(df, $"g", $"v", 3.0)
      .select($"g", $"med", $"mad", $"n", $"n_outliers")
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("a") == ((10.0, 0.0, 10L, 1L)))
    assert(out("b") == ((5.0, 0.0, 4L, 0L)))
  }

  test("peakConcurrency: sweep depth, inclusive ends, first peak point") {
    import org.apache.spark.sql.functions.col
    val iv = Seq((0L, 10L), (5L, 20L), (15L, 30L), (100L, 110L))
      .toDF("s", "e")
    val r = Events.peakConcurrency(iv, col("s"), col("e"))
      .as[(Long, Long, Long)].head()
    assert(r == ((2L, 5L, 2L)), "peak 2 first at t=5, hit twice")
  }


  test("interArrivalBurstiness: Fano = (nQ - S^2)/(nS) on exact gap sums") {
    import org.apache.spark.sql.functions.col
    import java.sql.Timestamp
    def t(us: Long) = new Timestamp(us / 1000).toInstant
      .plusNanos((us % 1000) * 1000)
    // one user, events at 0, 10, 40 us -> gaps 10, 30:
    // S=40, Q=1000, n=2: fano = (2000-1600)*1e6 // 80 = 5_000_000
    val ev = Seq((1L, 0L), (1L, 10L), (1L, 40L))
      .toDF("u", "us")
      .select(col("u"), org.apache.spark.sql.functions
        .timestamp_micros(col("us")).as("ts"), col("us").as("ord"))
    val r = Events.interArrivalBurstiness(ev, col("u"), col("ts"),
      col("ord")).as[(Long, Long, Option[Long], Option[Long])].head()
    assert(r == ((2L, 40L, Some(20L), Some(5000000L))))
  }


  test("conversionZTest: hand z-value, degenerate pool null, 2-variant contract") {
    import org.apache.spark.sql.functions.col
    val rows = (1 to 100).map(i => ("a", i <= 30)) ++
      (1 to 100).map(i => ("b", i <= 50))
    val df = rows.toDF("v", "c")
    val r = Events.conversionZTest(df, col("v"), col("c"))
      .as[(String, String, Long, Long, Long, Long, Option[Long], Option[Boolean])]
      .head()
    val z = (0.3 - 0.5) / math.sqrt(0.4 * (1.0 - 0.4) * (1.0 / 100 + 1.0 / 100))
    assert((r._1, r._2, r._3, r._4, r._5, r._6) ==
      (("a", "b", 100L, 30L, 100L, 50L)))
    assert(r._7 == Some(math.round(z * 1e6)))
    assert(r._8 == Some(true), "|z| ~ 2.89 clears 1.96")
    val allConv = Seq(("a", true), ("b", true)).toDF("v", "c")
    assert(Events.conversionZTest(allConv, col("v"), col("c"))
      .as[(String, String, Long, Long, Long, Long, Option[Long], Option[Boolean])]
      .head()._7.isEmpty)
    intercept[IllegalArgumentException] {
      Events.conversionZTest(Seq(("a", true), ("b", true), ("c", true))
        .toDF("v", "c"), col("v"), col("c"))
    }
  }


  test("engagement: DAU/WAU/MAU joins and stickiness floor") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // Mon 2024-01-01 and Tue 2024-01-02 (same ISO week/month):
    // users {1,2} Mon, {2,3,4} Tue -> dau 2/3, wau 4, mau 4
    val ev = Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (2L, "2024-01-02 10:00:00"), (3L, "2024-01-02 11:00:00"),
      (4L, "2024-01-02 12:00:00"))
      .toDF("u", "s").select(col("u"), to_timestamp(col("s")).as("ts"))
    val out = Events.engagement(ev, col("u"), col("ts"))
      .select(col("day").cast("string"), col("dau"), col("wau"),
        col("mau"), col("stickiness_micro"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("2024-01-01") == (("2024-01-01", 2L, 4L, 4L, 500000L)))
    assert(out("2024-01-02") == (("2024-01-02", 3L, 4L, 4L, 750000L)))
  }


  test("dayRetention: exact-offset hits per first-seen cohort") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // u1 first 01-01, returns 01-02 (D1) and 01-08 (D7);
    // u2 first 01-01, never returns; u3 first 01-02, returns 01-03
    val ev = Seq((1L, "2024-01-01"), (1L, "2024-01-02"),
      (1L, "2024-01-08"), (2L, "2024-01-01"), (3L, "2024-01-02"),
      (3L, "2024-01-03"))
      .toDF("u", "s")
      .select(col("u"), to_timestamp(col("s")).as("ts"))
    val out = Events.dayRetention(ev, col("u"), col("ts"), Seq(1, 7))
      .select(col("cohort_day").cast("string"), col("d"),
        col("cohort_users"), col("retained"), col("retention_micro"))
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out(("2024-01-01", 1)) ==
      (("2024-01-01", 1, 2L, 1L, 500000L)))
    assert(out(("2024-01-01", 7)) ==
      (("2024-01-01", 7, 2L, 1L, 500000L)))
    assert(out(("2024-01-02", 1)) ==
      (("2024-01-02", 1, 1L, 1L, 1000000L)))
    assert(out(("2024-01-02", 7)) ==
      (("2024-01-02", 7, 1L, 0L, 0L)))
  }

  test("diffInDiff: exact cell means and the double difference; " +
    "an empty cell nulls the estimate") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (true, false, 10L), (true, false, 20L), (true, true, 40L),
      (false, false, 0L), (false, false, 10L), (false, true, 20L))
      .toDF("t", "p", "y")
    val r = graft.ops.Events.diffInDiff(rows, col("t"), col("p"),
        col("y"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long])].head()
    assert(r._1 == 2L && r._2 == 1L && r._3 == 2L && r._4 == 1L)
    assert(r._5.get == 15L && r._6.get == 40L && r._7.get == 5L &&
      r._8.get == 20L)
    assert(r._9.get == 10L, "(40-15) - (20-5)")
    val missing = rows.filter(!(col("t") && col("p")))
    assert(graft.ops.Events.diffInDiff(missing, col("t"), col("p"),
        col("y"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long])].head()._9.isEmpty)
  }

  test("marketBasket: support/confidence/lift on a hand corpus; " +
    "duplicate basket lines collapse; minCount trims the tail") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "y"), // dup line collapses
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "x"), (3L, "z"),
      (4L, "y")).toDF("bk", "it")
    val out = graft.ops.Events.marketBasket(rows, col("bk"),
        col("it"), 2L)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // n_baskets 4; x: 3, y: 3, z: 2; xy: 2, xz: 2, yz: 1 (trimmed)
    assert(out.keySet == Set(("x", "y"), ("x", "z")))
    assert(out(("x", "y")) == (("x", "y", 2L, 3L, 3L,
      500000L, 666666L, 666666L, 888888L)))
    assert(out(("x", "z")) == (("x", "z", 2L, 3L, 2L,
      500000L, 666666L, 1000000L, 1333333L)))
  }

  test("marketBasket: the mega-basket guard skips pairing but keeps " +
    "corpus-wide support/marginal semantics") {
    import org.apache.spark.sql.functions.col
    val rows = (Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y")) ++
      Seq("x", "y", "z", "w", "v").map(i => (3L, i)))
      .toDF("bk", "it")
    val out = graft.ops.Events.marketBasket(rows, col("bk"),
        col("it"), 2L, 4L)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // basket 3 (5 items > cap 4) never pairs; x/y marginals and the
    // basket denominator still count it
    assert(out.keySet == Set(("x", "y")))
    assert(out(("x", "y"))._3 == 2L && out(("x", "y"))._4 == 3L)
    assert(out(("x", "y"))._6 == 666666L, "support over ALL 3 baskets")
  }

  test("smdBalance: exact means, pooled-variance SMD, the 0.1 bar") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (true, 0L, 7L), (true, 2L, 9L),
      (false, 10L, 7L), (false, 12L, 9L)).toDF("t", "c1", "c2")
    val out = graft.ops.Events.smdBalance(rows, col("t"),
        Seq("shifted" -> col("c1"), "same" -> col("c2")))
      .as[(String, Long, Long, Long, Long, Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // both arms var 2; smd = (1 - 11)/sqrt(2) = -7.0710678
    assert(out("shifted") == (("shifted", 2L, 2L, 1L, 11L,
      Some(-7071068L), false)))
    assert(out("same")._6.contains(0L) && out("same")._7)
  }

  test("psStratifiedAte: within-bin contrasts, common-support trim, " +
    "weighted combine vs the confounded raw diff") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (true, 100000L, 10L), (false, 200000L, 4L),
      (false, 240000L, 6L), // b0: diff 5
      (true, 300000L, 20L), (true, 430000L, 22L),
      (false, 270000L, 15L), // b1: diff 6
      (false, 990000L, 100L)) // b3: control only - trimmed
      .toDF("tr", "sc", "y")
    val r = graft.ops.Events.psStratifiedAte(rows, col("tr"),
        col("sc"), col("y"), 4)
      .as[(Long, Long, Long, Option[Long], Long)].head()
    assert(r._1 == 7L && r._2 == 6L && r._3 == 2L)
    assert(r._4.get == 5L, "(3*5 + 3*6) tdiv 6")
    assert(r._5 == 17L - 31L, "raw contrast swallows the outlier bin")
  }

  test("ipsPolicyEval: replay, IPS and SNIPS match hand arithmetic") {
    import org.apache.spark.sql.functions.col
    val logs = Seq(
      ("a", "a", 600000L, 500000L), // hit, w = 2e6
      ("b", "a", 900000L, 500000L), // miss
      ("a", "a", 0L, 250000L)) // hit, w = 4e6, zero reward
      .toDF("la", "ta", "r", "p")
    val r = graft.ops.Events.ipsPolicyEval(logs, col("la"), col("ta"),
        col("r"), col("p"))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .head()
    assert(r._1 == 3L && r._2 == 2L)
    assert(r._3.get == 300000L, "replay = 600000/2")
    assert(r._4.get == 400000L, "IPS = 1.2/3")
    assert(r._5.get == 200000L, "SNIPS = 1.2/6")
  }

}
