package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite edit-distance THRESHOLD predicates to Spark's
  * banded 3-arg `levenshtein(l, r, threshold)`.
  *
  * `levenshtein(a, b) <= k` forces the full O(|a|·|b|) Wagner–Fischer
  * table even though the predicate only needs to know whether the
  * distance exceeds k — the classic missed rewrite in dedup pipelines,
  * where the verifier (d11/d12) evaluates the predicate on every
  * candidate pair. Spark's thresholded Levenshtein (3.5+) runs the
  * banded DP — O(k·min(|a|,|b|)) cells, early-exit when a full
  * diagonal exceeds k — and returns −1 past the threshold, so
  *
  *   lev(a, b) ≤ k   ⇔   lev(a, b, k) ≥ 0          (k ≥ 0)
  *   lev(a, b) < k   ⇔   lev(a, b, k−1) ≥ 0        (k ≥ 1)
  *
  * (the distance is non-negative, so the banded form returns either the
  * true distance in [0, k] or −1). NULL propagation is identical: null
  * input → null distance → null comparison on both forms. The rewrite
  * fires only on FOLDABLE integer bounds — a per-row bound (d11's
  * length-relative similarity) stays on the 2-arg form, whose banded
  * variant would need a per-row threshold.
  *
  * Installed two ways (the standard extension-library pair): at session
  * build via `spark.sql.extensions=graft.GraftExtensions`
  * (injectOptimizerRule), or on a live session via
  * [[graft.GraftExtensions.install]] (experimental.extraOptimizations —
  * the sanctioned post-optimizer user batch; this rewrite is
  * batch-position-independent since nothing downstream matches on the
  * comparison shape).
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def banded(l: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l.left, l.right, Some(Literal(k))),
      Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(l @ Levenshtein(_, _, None), IntegerLiteral(k))
          if k >= 0 => banded(l, k)
      case GreaterThanOrEqual(IntegerLiteral(k), l @ Levenshtein(_, _, None))
          if k >= 0 => banded(l, k)
      case LessThan(l @ Levenshtein(_, _, None), IntegerLiteral(k))
          if k >= 1 => banded(l, k - 1)
      case GreaterThan(IntegerLiteral(k), l @ Levenshtein(_, _, None))
          if k >= 1 => banded(l, k - 1)
    }
}
