package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality gates — first-class semantics in the reference
  * (downloader_wmy.py:94-122): a key failing any gate contributes NO
  * output rows but DOES appear in the rejection/audit stream with a
  * machine-readable reason (V1–V5 in SURVEY §2.11).
  *
  * Shape: every validator computes a per-key verdict as ONE aggregate pass
  * (no per-key loops, no collect), returns the rejection table
  * (key, reason), and clean data = input anti-joined against rejections —
  * at scale the anti-join broadcasts the (small) rejection key set.
  */
object Quality {

  val ReasonEmpty = "empty_file"
  val ReasonInvalidPrice = "invalid_price"
  val ReasonOhlcLogic = "ohlc_logic_error"

  /** Fixed gate order for a key rejected by several gates at once —
    * the reference evaluates gates sequentially and reports the FIRST
    * failure (empty → invalid_price → gap → ohlc,
    * downloader_wmy.py:94-122), so a multi-gate failure must resolve to
    * the same reason on every run, never to whichever union branch an
    * unordered `first()` happened to see.
    */
  def reasonPriority(reason: Column): Column =
    when(reason === ReasonEmpty, 0)
      .when(reason === ReasonInvalidPrice, 1)
      .when(reason.startsWith("gap_"), 2)
      .when(reason === ReasonOhlcLogic, 3)
      .otherwise(4)

  /** Collapse a (key, reason) union to one deterministic reason per key,
    * by gate priority then lexicographic reason as the total-order tiebreak.
    */
  def firstReasonPerKey(rejections: DataFrame): DataFrame =
    rejections.groupBy("key")
      .agg(min_by(col("reason"),
        struct(reasonPriority(col("reason")), col("reason"))).as("reason"))

  /** V1 positive-price gate (downloader_wmy.py:98-99): reject a key if ANY
    * close <= 0.
    */
  def invalidPriceKeys(df: DataFrame, key: Column, close: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(max(when(close <= 0, 1).otherwise(0)).as("bad"))
      .filter(col("bad") === 1)
      .select(col("key"), lit(ReasonInvalidPrice).as("reason"))

  /** V2 continuity gate (downloader_wmy.py:101-107): reject a key whose
    * sorted dates (restricted to >= since) contain a gap > maxGapDays.
    * Reason carries the observed max gap, e.g. "gap_20d".
    */
  def gapKeys(df: DataFrame, key: Column, date: Column,
              maxGapDays: Int, since: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(date)
    df.filter(date >= to_date(lit(since)))
      .withColumn("__gap", datediff(date, lag(date, 1).over(w)))
      .groupBy(key.as("key"))
      .agg(max(col("__gap")).as("max_gap"))
      .filter(col("max_gap") > maxGapDays)
      .select(col("key"),
        concat(lit("gap_"), col("max_gap").cast("string"), lit("d")).as("reason"))
  }

  /** V3 OHLC invariant on resampled bars (downloader_wmy.py:119-122):
    * a key is rejected if any bar violates low <= close <= high.
    */
  def ohlcViolationKeys(bars: DataFrame, key: Column, low: Column,
                        close: Column, high: Column): DataFrame =
    bars.filter(close > high || close < low)
      .select(key.as("key")).distinct()
      .withColumn("reason", lit(ReasonOhlcLogic))

  /** Remove all rows belonging to rejected keys — rejection key sets are
    * tiny relative to the fact table, so broadcast the anti-join side.
    */
  def excludeRejected(df: DataFrame, key: Column, rejections: DataFrame): DataFrame =
    df.join(broadcast(rejections.select(col("key"))),
      key === col("key"), "left_anti")
}
