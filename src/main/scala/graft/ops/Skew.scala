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

  /** The complete salted equi-join: result identical to
    * `big.join(small, keys)` but the shuffle key is (keys, salt), so a
    * hot key's rows spread over `salts` reducers instead of one. Each
    * big-side row carries ONE salt and meets exactly the one matching
    * replica of each small-side row — no duplicates, no loss. Use when
    * the small side is too big to broadcast and AQE's skew split can't
    * help (e.g. the skew is in a single partition-key value); cost is
    * the `salts`× inflation of the small side. The salt is hash(), not
    * rand(): deterministic under task retry, invisible in the result.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    val (b, s) = saltJoinSides(big, small, salts)
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
