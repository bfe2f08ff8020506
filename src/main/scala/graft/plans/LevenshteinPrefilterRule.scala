package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: in front of every `levenshtein(a, b) <= d` predicate,
  * plant the implied-but-cheap `abs(length(a) - length(b)) <= d` guard.
  *
  * Edit distance is bounded below by the length difference (each edit
  * changes the length by at most 1), so the guard is IMPLIED by the
  * original predicate — the rewrite is strictly semantics-preserving —
  * while costing O(1) per row against levenshtein's O(|a|·|b|) dynamic
  * program. With conjunct short-circuiting inside whole-stage codegen,
  * rows that can't match never run the quadratic loop; on a fuzzy-join
  * verify stage most candidate pairs are length-compatible neighbors,
  * but on raw `WHERE levenshtein(...) <= d` SQL over a corpus the guard
  * is the difference between scanning and crawling.
  *
  * This is the `Rule[LogicalPlan]` extension path (injected via
  * `GraftExtensions.injectOptimizerRule`): the operator library adds the
  * guard by hand (`FuzzyJoin`), but SQL users writing plain
  * `levenshtein` predicates get it for free. The rule tags its output
  * (the guard it plants is exactly the shape it checks for) so it is
  * idempotent across optimizer batches. */
object LevenshteinPrefilterRule extends Rule[LogicalPlan] {

  // Only rewrite when both operands are deterministic: the guard
  // duplicates a and b, so a non-deterministic operand would be
  // evaluated twice per row with possibly different values — the
  // standard precondition for expression-duplicating optimizer rules.
  //
  // Only the 2-ARG form: the thresholded `levenshtein(a, b, t)` returns
  // the SENTINEL -1 when the distance exceeds t, and -1 satisfies any
  // `<= d` — so the length bound does NOT hold for it (a row with a huge
  // length gap can legitimately pass via the sentinel) and planting the
  // guard would prune rows the original query keeps.
  private def boundOf(e: Expression): Option[(Expression, Expression, Expression)] = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), d)
        if d.foldable && a.deterministic && b.deterministic =>
      Some((a, b, d))
    case LessThan(Levenshtein(a, b, None), d)
        if d.foldable && a.deterministic && b.deterministic =>
      Some((a, b, d))
    case _ => None
  }

  private def guard(a: Expression, b: Expression, d: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Cast(d, IntegerType))

  /** True when the implied guard for this comparison is already present
    * among the filter's conjuncts (idempotence across batches). */
  private def hasGuard(conjuncts: Seq[Expression], a: Expression, b: Expression): Boolean =
    conjuncts.exists {
      case LessThanOrEqual(Abs(Subtract(Length(x), Length(y), _), _), _) =>
        (x.semanticEquals(a) && y.semanticEquals(b)) ||
          (x.semanticEquals(b) && y.semanticEquals(a))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val guards = conjuncts.flatMap(boundOf).collect {
        case (a, b, d) if !hasGuard(conjuncts, a, b) => guard(a, b, d)
      }
      if (guards.isEmpty) f
      else Filter((guards ++ conjuncts).reduce(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
