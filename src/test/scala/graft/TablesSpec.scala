package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events loader must accept BOTH generations of the events feed:
  * old drops with TIMESTAMP(NANOS) columns (which Spark 4 surfaces as
  * LongType nanos under `nanosAsLong=true`) and regenerated drops with
  * plain timestamp[us] columns. Round 8 broke when the loader hard-coded
  * the nanos path; this spec pins the dtype-sniffing behavior so a future
  * testdata regeneration can't silently break the board again.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("events loader passes microsecond-timestamp fixtures through") {
    withTempDir { dir =>
      val us = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")),
        (2L, java.sql.Timestamp.valueOf("2024-06-07 08:09:10.654321"))
      ).toDF("user_id", "ts")
      us.write.parquet(s"${dir.getAbsolutePath}/events.parquet")

      val loaded = Tables(spark, dir.getAbsolutePath, "events")
      assert(loaded.schema("ts").dataType.isInstanceOf[TimestampType]
        || loaded.schema("ts").dataType.isInstanceOf[TimestampNTZType])
      val got = loaded.orderBy("user_id")
        .select(date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .as[String].collect()
      assert(got.toSeq == Seq(
        "2024-01-02 03:04:05.123456", "2024-06-07 08:09:10.654321"))
    }
  }

  test("events loader casts TIMESTAMP_NTZ fixtures to session-zoned timestamps") {
    withTempDir { dir =>
      val ntz = Seq(
        (1L, "2024-01-02 03:04:05.123456"),
        (2L, "2024-06-07 08:09:10.654321")
      ).toDF("user_id", "raw")
        .select($"user_id", $"raw".cast(TimestampNTZType).as("ts"))
      assert(ntz.schema("ts").dataType.isInstanceOf[TimestampNTZType])
      ntz.write.parquet(s"${dir.getAbsolutePath}/events.parquet")

      val loaded = Tables(spark, dir.getAbsolutePath, "events")
      assert(loaded.schema("ts").dataType.isInstanceOf[TimestampType],
        s"expected LTZ timestamp, got ${loaded.schema("ts").dataType}")
      // the UTC session preserves the wall-clock instant, and unix_micros
      // (the downstream contract that broke in round 8) must resolve
      val got = loaded.orderBy("user_id")
        .select(unix_micros($"ts")).as[Long].collect()
      assert(got.toSeq == Seq(1704164645123456L, 1717747750654321L))
    }
  }

  test("events loader converts LongType nanos fixtures to timestamps") {
    withTempDir { dir =>
      // A TIMESTAMP(NANOS) parquet file read under nanosAsLong=true
      // surfaces ts as LongType nanos-since-epoch; writing LongType
      // directly produces the identical loaded shape.
      val nanos = Seq(
        (1L, 1704164645123456000L), // 2024-01-02 03:04:05.123456 UTC
        (2L, 1717747750654321000L)  // 2024-06-07 08:09:10.654321 UTC
      ).toDF("user_id", "ts")
      nanos.write.parquet(s"${dir.getAbsolutePath}/events.parquet")

      val loaded = Tables(spark, dir.getAbsolutePath, "events")
      assert(!loaded.schema("ts").dataType.isInstanceOf[LongType])
      val got = loaded.orderBy("user_id")
        .select(unix_micros($"ts")).as[Long].collect()
      assert(got.toSeq == Seq(1704164645123456L, 1717747750654321L))
    }
  }

  test("memo: stopped sessions are evicted from the cache and " +
      "invalidate() forces a re-resolve (r15 advice — the WeakHashMap " +
      "values pinned their own keys, so nothing ever collected)") {
    withTempDir { dir =>
      Seq((1L, 2L)).toDF("a", "b")
        .write.parquet(s"${dir.getAbsolutePath}/part.parquet")
      val s2 = spark.newSession()
      val df1 = Tables(s2, dir.getAbsolutePath, "part")
      // memo hit: the SAME resolved plan object comes back
      assert(Tables(s2, dir.getAbsolutePath, "part") eq df1)
      // invalidate drops the session's entries → fresh plan object,
      // re-resolved against the CURRENT files (the writer-then-reader
      // path the snapshot-semantics note documents)
      Tables.invalidate(s2)
      val df2 = Tables(s2, dir.getAbsolutePath, "part")
      assert(!(df2 eq df1))
      assert(df2.count() == 1)
    }
  }

  test("real testdata events table loads with a timestamp ts column") {
    val sf = "/root/testdata/sf0.001"
    if (new java.io.File(s"$sf/events.parquet").exists()) {
      val ev = Tables(spark, sf, "events")
      val dt = ev.schema("ts").dataType
      assert(dt.isInstanceOf[TimestampType] || dt.isInstanceOf[TimestampNTZType],
        s"events.ts loaded as $dt")
      assert(ev.limit(1).count() == 1)
    }
  }
}
