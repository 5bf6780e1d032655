package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prefix every `levenshtein(a, b) <= k` filter predicate
  * with the sound, cheap bound `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is always ≥ the length difference, so the guard never
  * changes results — it short-circuits the O(|a|·|b|) DP for every row
  * pair whose lengths alone already rule the match out. On a fuzzy-join
  * verify stage (the canonical consumer — LSH candidates → exact edit
  * distance) most candidate pairs in a skewed corpus fail on length
  * first, so the expensive kernel runs only on plausibles. This encodes
  * the same engineering DedupQueries.qFuzzyVerify does BY HAND (its
  * banded `levenshtein(l, r, 120)` + explicit length guard) as an
  * engine-level rewrite every query gets for free.
  *
  * Scope, deliberately narrow:
  *   - only 2-arg levenshtein (the 3-arg banded form already early-exits
  *     internally);
  *   - only `<=` / `<` comparisons against the distance (and their
  *     mirrored `>=` / `>` literal-first forms) — the shapes where a
  *     lower bound prunes;
  *   - null semantics unchanged: the guard is null exactly when the
  *     original predicate is null (same inputs), and `null AND null`
  *     filters identically to `null`.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` in
  * [[graft.GraftSession]]; runs to fixpoint safely because a predicate
  * whose conjunction already contains its guard is left alone.
  */
object EditDistancePrefilter extends Rule[LogicalPlan] {

  private def boundOf(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(
      Abs(Subtract(Length(lev.left), Length(lev.right)), failOnError = false),
      k)

  /** The guards implied by one predicate node, if it is a prunable
    * levenshtein comparison. */
  private def guardFor(p: Expression): Option[Expression] = p match {
    case LessThanOrEqual(lev: Levenshtein, k) if lev.threshold.isEmpty => Some(boundOf(lev, k))
    case LessThan(lev: Levenshtein, k) if lev.threshold.isEmpty => Some(boundOf(lev, k))
    case GreaterThanOrEqual(k, lev: Levenshtein) if lev.threshold.isEmpty => Some(boundOf(lev, k))
    case GreaterThan(k, lev: Levenshtein) if lev.threshold.isEmpty => Some(boundOf(lev, k))
    case _ => None
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val guards = conjuncts
        .flatMap(guardFor)
        .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
        .distinct
      if (guards.isEmpty) f
      else Filter(guards.foldRight(cond)(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
