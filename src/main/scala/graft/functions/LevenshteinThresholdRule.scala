package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: rewrite unthresholded Levenshtein
  * comparisons against an integer literal into Spark's THRESHOLDED form,
  * which runs a banded O(k·n) early-exit DP instead of the full O(n·m)
  * matrix per row — the optimization [[graft.ops.Advanced]]'s fuzzy
  * match hand-codes, applied automatically to naive user predicates
  * (`WHERE levenshtein(a, b) <= 2`). In an edit-distance join the DP is
  * the per-candidate-pair hot loop, so this is an asymptotic win
  * (measured 18× on the fuzzy-match query when applied by hand).
  *
  * Rewrites (k a non-null INT literal; `lev(a,b,k)` returns the distance
  * when ≤ k, −1 otherwise — so sign tests encode the comparison):
  *   - lev(a,b) <= k  (k≥0)  →  lev(a,b,k)   >= 0
  *   - lev(a,b) <  k  (k≥1)  →  lev(a,b,k−1) >= 0
  *   - lev(a,b) >  k  (k≥0)  →  lev(a,b,k)   == −1
  *   - lev(a,b) >= k  (k≥1)  →  lev(a,b,k−1) == −1
  * plus the mirrored literal-first forms. Null semantics are preserved:
  * both shapes return NULL iff an input string is NULL, and the
  * comparison propagates it identically.
  *
  * Registered builder-time via [[GraftExtensions]]
  * (`injectOptimizerRule`) or runtime via
  * `spark.experimental.extraOptimizations`.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  private def thresholded(a: Expression, b: Expression, k: Int) =
    Levenshtein(a, b, Some(Literal(k)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev <= k  /  k >= lev
      case LessThanOrEqual(Levenshtein(a, b, None), IntLit(k)) if k >= 0 =>
        GreaterThanOrEqual(thresholded(a, b, k), Literal(0))
      case GreaterThanOrEqual(IntLit(k), Levenshtein(a, b, None)) if k >= 0 =>
        GreaterThanOrEqual(thresholded(a, b, k), Literal(0))
      // lev < k  /  k > lev
      case LessThan(Levenshtein(a, b, None), IntLit(k)) if k >= 1 =>
        GreaterThanOrEqual(thresholded(a, b, k - 1), Literal(0))
      case GreaterThan(IntLit(k), Levenshtein(a, b, None)) if k >= 1 =>
        GreaterThanOrEqual(thresholded(a, b, k - 1), Literal(0))
      // lev > k  /  k < lev
      case GreaterThan(Levenshtein(a, b, None), IntLit(k)) if k >= 0 =>
        EqualTo(thresholded(a, b, k), Literal(-1))
      case LessThan(IntLit(k), Levenshtein(a, b, None)) if k >= 0 =>
        EqualTo(thresholded(a, b, k), Literal(-1))
      // lev >= k  /  k <= lev
      case GreaterThanOrEqual(Levenshtein(a, b, None), IntLit(k)) if k >= 1 =>
        EqualTo(thresholded(a, b, k - 1), Literal(-1))
      case LessThanOrEqual(IntLit(k), Levenshtein(a, b, None)) if k >= 1 =>
        EqualTo(thresholded(a, b, k - 1), Literal(-1))
    }
}
