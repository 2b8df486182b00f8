package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Run-summary aggregates — SURVEY §2.5 A2–A9 (reference main.py:114-137,
  * notifier.py:40-119). All of these reduce a fact table to a handful of
  * rows; the only scale concern is exact countDistinct (one extra shuffle)
  * vs approx_count_distinct — the reference's coverage contract is exact,
  * so exact is the default with approx offered for the 100 TB path.
  */
object Report {

  /** A2: COUNT(DISTINCT symbol), MAX(date), COUNT(*) (main.py:118). */
  def summaryStats(df: DataFrame, symbol: Column, date: Column): DataFrame =
    df.agg(
      countDistinct(symbol).as("n_symbols"),
      max(date).as("end_date"),
      count(lit(1)).as("total_rows"))

  /** A6: coverage ratio vs an expected floor, >=80% => OK
    * (main.py:126-133).
    */
  def coverage(counts: DataFrame, actual: Column, expected: Column): DataFrame =
    counts
      .withColumn("coverage", round(actual * lit(100.0) / expected, 2))
      .withColumn("status", when(col("coverage") >= 80, "OK").otherwise("LOW"))

  /** A5: freshness — latest date per key, and staleness vs the global max
    * (main.py:105-111 generalized per-key). The global max is a 1-row
    * aggregate broadcast into the comparison.
    */
  def staleKeys(df: DataFrame, key: Column, date: Column, staleDays: Int): DataFrame = {
    val perKey = df.groupBy(key.as("key")).agg(max(date).as("last_date"))
    val global = df.agg(max(date).as("global_max"))
    perKey.crossJoin(broadcast(global))
      .filter(col("last_date") < date_sub(col("global_max"), staleDays))
      .select(col("key"), col("last_date"))
  }
}
