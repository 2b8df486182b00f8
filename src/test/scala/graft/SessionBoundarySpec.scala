package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

class SessionBoundarySpec extends SparkSpec {
  import spark.implicits._

  test("session windows: an event exactly gap after the last DOES merge") {
    // Pinned empirically: Spark merges an event landing exactly at the
    // previous session's end (last + gap) into that session. The q43
    // oracle's gaps-and-islands SQL opens a new session only on
    // `> INTERVAL 30 MINUTE` — equality merges — so engine and oracle
    // agree on the boundary. If either side ever changes, this spec
    // fails here instead of surfacing as an oracle mystery.
    val events = Seq(
      ("2024-01-01 10:00:00", 1L, 1.0),
      ("2024-01-01 10:30:00", 1L, 2.0),  // exactly gap after 10:00 -> merges
      ("2024-01-01 11:00:01", 1L, 4.0))  // 1s past the merged end -> new session
    .toDF("s", "user_id", "value")
      .select(to_timestamp($"s").as("ts"), $"user_id", $"value")
    val got = Streams.sessionRollup(events, "user_id", "30 minutes")
      .select($"session_start".cast("string"), $"n", $"value_sum")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(
      ("2024-01-01 10:00:00", 2L, 3.0),
      ("2024-01-01 11:00:01", 1L, 4.0)))
  }
}
