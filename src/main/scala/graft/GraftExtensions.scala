package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extensions entry point — enable the engine's native SQL
  * functions on every session of a cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Injected functions: cosine_similarity, simhash, hashed_shingles,
  * minhash_sig (all codegen'd Catalyst expressions; see
  * org.apache.spark.sql.graftshim). Injected optimizer rules:
  * [[graft.plans.BandedLevenshteinRule]] (unbounded levenshtein
  * comparisons → banded early-exit kernel).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    org.apache.spark.sql.graftshim.GraftExtensionsShim.inject(ext)
}
