package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.LevWithin
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: any comparison of an UNBOUNDED `levenshtein(a, b)`
  * against an int literal k becomes the banded early-exit `lev_within`
  * kernel (trim + O(k·min|a|,|b|) band + row-max early exit — see
  * graftshim.FuzzyMatchUtil), so a user writing plain SQL
  * `WHERE levenshtein(pn, rn) <= 1` over a blocked candidate stream
  * gets the verify-path kernel the engine's own fuzzy joins use,
  * without knowing it exists. On long strings with small k the full
  * O(|a|·|b|) DP is ~|a|/k× more work than the band; on dense blocks
  * where most candidates miss, the early exit dominates.
  *
  * Soundness (FuzzyJoinSpec pins lev_within == levenshtein at every
  * threshold): lev_within(a,b,k) returns the exact distance when it is
  * ≤ k and −1 otherwise, and is null iff an input is null — so
  *
  *   lev ≤ k  ⇔ 0 ≤ lev_within(k) ≤ k        lev < k  ⇔ band at k−1
  *   lev = k  ⇔ lev_within(k) = k            lev > k  ⇔ lev_within(k) = −1
  *   lev ≥ k  ⇔ lev_within(k−1) = −1 (k ≥ 1)
  *
  * with null propagating identically through every form (the rewrite
  * is valid in projections, not just filters). Comparisons against a
  * NEGATIVE k and calls already carrying Spark's own threshold arg are
  * left untouched. Registered via `spark.sql.extensions`
  * (GraftExtensionsShim) — the idiomatic cluster-deployment path; tests
  * use `spark.experimental.extraOptimizations`.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def band(a: Expression, b: Expression, k: Int): Expression = {
    val lw = LevWithin(a, b, k)
    And(GreaterThanOrEqual(lw, Literal(0)), LessThanOrEqual(lw, Literal(k)))
  }
  private def outside(a: Expression, b: Expression, k: Int): Expression =
    EqualTo(LevWithin(a, b, k), Literal(-1))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev ≤ k / k ≥ lev
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => band(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => band(a, b, k)
      // lev < k / k > lev
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => band(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => band(a, b, k - 1)
      // lev = k
      case EqualTo(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => EqualTo(LevWithin(a, b, k), Literal(k))
      case EqualTo(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => EqualTo(LevWithin(a, b, k), Literal(k))
      // lev > k / k ≤ lev — the complement of the band
      case GreaterThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => outside(a, b, k)
      case LessThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => outside(a, b, k - 1)
      case GreaterThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => outside(a, b, k - 1)
      case LessThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => outside(a, b, k)
    }
}
