package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Shared applicability/convergence guard for the band-join rewrite
  * rules ([[HammingBandJoinRule]], [[CosineBandJoinRule]]).
  *
  * True when the join condition already carries a cross-side equality —
  * then the join is hash-joinable as-is (banding would add nothing),
  * and, critically, this makes each rule CONVERGE: every rewrite's
  * output join carries band/bucket equalities, so even when a later
  * fixed-point iteration pushes the residual predicate back into the
  * join condition (PushDownPredicates does exactly that when a rule is
  * injected into the main optimizer batch), a rewritten join can never
  * match again. Without this guard the extensions path re-banded its
  * own output every iteration until the iteration cap.
  */
private[plans] object BandJoinGuards extends PredicateHelper {

  def hasCrossSideEquiConjunct(
      cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def splits(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) => a.references.nonEmpty && b.references.nonEmpty && splits(a, b)
      case EqualNullSafe(a, b) => a.references.nonEmpty && b.references.nonEmpty && splits(a, b)
      case _ => false
    }
  }
}
