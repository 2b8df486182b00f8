package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — reproducibility is the whole point at
  * 100 TB: the SAME rows must be selected on every run, every cluster
  * layout, and every engine (auditable train/holdout splits), which
  * rules out `rand()`/`sample()` RNG state. Selection here is a pure
  * function of the row key: the portable 60-bit md5 hash mod a bucket
  * count (`Dedup.hashLong` — identical in any SQL engine).
  */
object Sampling {

  /** Keep rows whose key hashes into the first `rateNum` of `rateDen`
    * buckets — a deterministic ~rateNum/rateDen sample. One codegen'd
    * predicate on the scan; no shuffle, no RNG, pushdown-friendly.
    */
  def hashSample(df: DataFrame, key: Column, rateNum: Int, rateDen: Int): DataFrame =
    df.filter(hashBucket(key, rateDen) < rateNum)

  /** The bucket assignment itself (also the train/validation/test split
    * primitive: bucket ranges partition the corpus disjointly).
    */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(Dedup.hashLong(key.cast("string")), lit(buckets))

  /** Per-stratum deterministic rates: e.g. downsample dominant languages
    * while keeping the tail — `rates` maps stratum value → kept buckets
    * of `rateDen`; strata not in the map keep everything.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Map[String, Int], rateDen: Int): DataFrame = {
    val keep = rates.foldLeft(lit(rateDen)) { case (acc, (s, num)) =>
      when(stratum === s, lit(num)).otherwise(acc)
    }
    df.filter(hashBucket(key, rateDen) < keep)
  }
}
