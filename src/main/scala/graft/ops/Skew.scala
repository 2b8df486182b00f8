package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping/join keys. AQE's skew-join split
  * (spark.sql.adaptive.skewJoin, on by default) handles most runtime
  * skew; these helpers cover the aggregate-side cases AQE doesn't —
  * a groupBy where one key holds a large share of all rows.
  */
object Skew {

  /** Two-stage salted aggregation: spread each key over `salts` partial
    * groups, aggregate, then combine. Correct for any algebraic
    * aggregate expressible as (partial, combine) — here sum/count;
    * extend by passing both phases. The salt derives from hash() of the
    * value row, not rand(), so the plan stays deterministic and
    * retry-safe (a recomputed task salts identically).
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int): DataFrame =
    df.select(key.as("key"), value.as("v"))
      .withColumn("__salt", pmod(hash(col("key"), col("v")), lit(salts)))
      .groupBy(col("key"), col("__salt"))
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pc"))
      .groupBy(col("key"))
      .agg(sum(col("ps")).as("sum"), sum(col("pc")).as("count"))

  /** Broadcast-salt the small side of a skewed join: replicate each
    * small-side row `salts` times with a salt column, salt the big side
    * by hash, and join on (key, salt) — every hot key's rows spread over
    * `salts` reducers. Returns the two prepared sides; caller joins on
    * `keys :+ "__salt"`.
    */
  def saltJoinSides(big: DataFrame, small: DataFrame, salts: Int)
      : (DataFrame, DataFrame) = {
    val bigSalted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    (bigSalted, smallSalted)
  }
}
