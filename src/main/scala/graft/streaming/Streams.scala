package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine. The reference is a daily
  * batch cron whose only incremental semantics are (a) the freshness gate
  * "run only if MAX(date) < today" and (b) re-download overlap absorbed
  * by PK upsert (reference main.py:101-112, downloader_tw.py:118-120).
  * Both map onto streams: a file-source + Trigger.AvailableNow run IS the
  * daily batch, and watermarked dropDuplicates IS the upsert's
  * exactly-once key contract — so the same pipeline definition serves
  * both the cron deployment and a continuous one.
  *
  * Scale posture: state stores are keyed by (date,symbol)-grade keys
  * (high cardinality, well distributed); watermarks bound state size;
  * aggregations are partial-agg friendly (count/sum/min/max only).
  */
object Streams {

  /** Exactly-once ingest dedup: keep the first arrival per key inside
    * the watermark horizon — the streaming face of the K1 upsert. Late
    * duplicates beyond the watermark age out of the state store instead
    * of accumulating forever.
    */
  def dedupByKey(in: DataFrame, eventTimeCol: String, watermark: String,
                 keys: Seq[String]): DataFrame =
    in.withWatermark(eventTimeCol, watermark)
      .dropDuplicates(keys :+ eventTimeCol)

  /** Tumbling-window rollup of the event feed (the streaming shape of
    * q21): counts and value sums per (window, event_type), emitted once
    * the watermark passes the window end.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("value_sum"))

  /** Session windows: activity bursts per key separated by `gap` of
    * silence (built-in session_window — state merges adjacent events,
    * emits once the watermark passes session end + gap). Works
    * identically over batch frames, which is how the spec goldens it.
    */
  def sessionRollup(events: DataFrame, key: String, gap: String,
                    watermark: Option[String] = None): DataFrame = {
    val in = watermark.map(events.withWatermark("ts", _)).getOrElse(events)
    in.groupBy(session_window(col("ts"), gap), col(key))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(key), col("n"), col("value_sum"))
  }

  /** Per-key running state for custom incremental logic that windowed
    * aggs can't express — the mapGroupsWithState path. Tracks per symbol:
    * row count, latest event date, and min close seen (the streaming
    * freshness/validity summary).
    */
  final case class BarEvent(symbol: String, date: java.sql.Date, close: Double)
  final case class SymbolState(symbol: String, nRows: Long,
                               lastDate: java.sql.Date, minClose: Double)

  def symbolRunningState(bars: Dataset[BarEvent]): Dataset[SymbolState] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.symbol)
      .mapGroupsWithState[SymbolState, SymbolState](GroupStateTimeout.NoTimeout) {
        (symbol, events, state: GroupState[SymbolState]) =>
          val prev = state.getOption.getOrElse(
            SymbolState(symbol, 0L, java.sql.Date.valueOf("1970-01-01"), Double.MaxValue))
          val next = events.foldLeft(prev) { (st, e) =>
            SymbolState(symbol, st.nRows + 1,
              if (e.date.after(st.lastDate)) e.date else st.lastDate,
              math.min(st.minClose, e.close))
          }
          state.update(next)
          next
      }
  }

  /** Streaming MERGE: upsert each micro-batch into the partitioned
    * parquet warehouse through foreachBatch — the continuous face of the
    * reference's INSERT OR REPLACE ingest. Each batch is a partition-
    * scoped merge (only the partitions the batch touches are rewritten),
    * so a day's worth of late symbols costs one date-partition rewrite,
    * not a table scan. Exactly-once per key comes from the version-column
    * keep-latest semantics, which absorbs micro-batch replays after a
    * checkpoint recovery (re-merging a batch is a no-op).
    */
  def mergeStream(in: DataFrame, tablePath: String, checkpoint: String,
                  keys: Seq[String], versionCol: String,
                  partitionCol: String): Unit = {
    val q = in.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.Merge.upsertIntoPath(batch.toDF(), tablePath, keys,
          versionCol, partitionCol)
      }
      .start()
    q.awaitTermination()
  }

  /** Drive any streaming DataFrame to a parquet sink with AvailableNow:
    * processes everything pending, then stops — the scheduled-batch
    * deployment mode (replaces the reference's GitHub Actions cron with
    * a restartable, checkpointed run).
    */
  def runAvailableNow(out: DataFrame, path: String, checkpoint: String,
                      mode: OutputMode = OutputMode.Append): Unit = {
    val q = out.writeStream
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", path)
      .start()
    q.awaitTermination()
  }
}
