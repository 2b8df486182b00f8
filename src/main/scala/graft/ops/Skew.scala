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

  /** Salt factor from [[Profile.keySkewReport]]'s one-row diagnostic —
    * the diagnose→mitigate loop closed: a key holding share σ of the
    * big side's rows fills σ·P of the target parallelism P when
    * unsalted, so spreading it evenly needs ⌈σ·P⌉ partial keys; a key
    * at or under 1/P needs none (factor 1). Reading the report is a
    * ONE-ROW driver collect (the bounded-collect convention); a
    * production deployment amortizes it from maintained table stats
    * instead of a per-join pre-pass.
    */
  def autoSaltFactor(report: DataFrame, parallelism: Int): Int = {
    require(parallelism >= 1, "parallelism must be >= 1")
    val r = report.select(col("max_key_share")).collect()
    val share =
      if (r.isEmpty || r.head.isNullAt(0)) 0.0 else r.head.getDouble(0)
    math.max(1, math.min(parallelism, math.ceil(share * parallelism).toInt))
  }

  /** Diagnose-then-join: run the key-skew report on the big side's
    * join key, derive the salt factor, and dispatch — the plain
    * equi-join when the key is flat (factor 1, zero overhead beyond
    * the diagnostic), the salted join otherwise. Result identical to
    * `big.join(small, keys)` either way; only the shuffle layout
    * changes. `bucketWidth` feeds the report's two-level prefix kernel
    * (rows-per-key value domain / width ≈ bucket count).
    */
  def autoSaltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     parallelism: Int, bucketWidth: Long = 16L): DataFrame = {
    val keyCol =
      if (keys.size == 1) col(keys.head)
      else struct(keys.map(col): _*)
    val report = Profile.keySkewReport(big, keyCol, bucketWidth)
    val salts = autoSaltFactor(report, parallelism)
    if (salts <= 1) big.join(small, keys)
    else saltedJoin(big, small, keys, salts)
  }

  /** CONSISTENT-HASHING owner assignment — the shard-placement
    * primitive behind stable routing: `vnodes` virtual points per
    * worker land on the 60-bit md5 ring, every key routes to the
    * first point clockwise (≥ its own hash, wrapping to the ring
    * minimum). The property a placement audit checks: adding one
    * worker moves only ~1/(n+1) of the keys, vs ~all under plain
    * mod-n. Deterministic — no RNG, identical on any engine.
    *
    * Shape: the ring is a workers×vnodes CONSTANT table that
    * broadcasts; each key meets only the ring (never another key),
    * and the clockwise pick is a lexicographic (point, worker)
    * struct-min per key. Output: (k, owner).
    */
  def consistentHashOwners(df: DataFrame, key: Column,
                           workers: Seq[String], vnodes: Int): DataFrame = {
    require(workers.nonEmpty && vnodes >= 1, "need workers and vnodes")
    val spark = df.sparkSession
    import spark.implicits._
    val ring = workers.flatMap(w => (0 until vnodes).map(v => (w, v)))
      .toDF("w", "v")
      .select(col("w"), Dedup.hashLong(concat(lit("ring:"), col("w"),
        lit(":"), col("v").cast("string"))).as("p"))
    val wrap = ring.agg(
      min_by(col("w"), struct(col("p"), col("w"))).as("w0"))
    val keyed = df.select(key.cast("string").as("k"))
      .withColumn("hd", Dedup.hashLong(concat(lit("doc:"), col("k"))))
    val owned = keyed.join(broadcast(ring), col("p") >= col("hd"))
      .groupBy(col("k"))
      .agg(min(struct(col("p"), col("w"))).as("sel"))
      .select(col("k"), col("sel.w").as("owner"))
    keyed.select(col("k")).join(owned, Seq("k"), "left")
      .crossJoin(broadcast(wrap))
      .select(col("k"), coalesce(col("owner"), col("w0")).as("owner"))
  }
}
