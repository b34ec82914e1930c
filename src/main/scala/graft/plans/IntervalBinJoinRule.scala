package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** OPT-IN Catalyst optimizer rule: plans a point-in-interval range join
  * as a time-binned equi-join — the declarative twin of
  * [[graft.ops.RangeJoin.pointInIntervalJoin]].
  *
  * A user writing the natural form
  * {{{
  *   points.join(wins, $"ts" >= $"w_start" && $"ts" < $"w_end")
  * }}}
  * gets a BroadcastNestedLoopJoin (every point compared against every
  * interval). This rule re-plans it as the binned shape: the point side
  * tagged with its bin (`unix_micros(ts) div binMicros`), the interval
  * side exploded to the bins its [start, end] span covers, an equi-join
  * on the bin, and the ORIGINAL condition re-checked on candidates.
  *
  * The rewrite is EXACT — integer division is monotone, so a point
  * between the bounds always carries a bin inside the interval's bin
  * span (completeness), the point's single bin means each pair meets at
  * most once (multiplicity-preserving, no dedup), and the re-check
  * drops same-bin non-matches (soundness). It is still gated behind a
  * knob because the bin WIDTH is workload knowledge the optimizer does
  * not have: each interval explodes to `len/binSeconds + 1` rows, so a
  * bin much narrower than the typical interval inflates the build side,
  * while a much wider one degrades toward all-pairs within a bin. Size
  * it near the typical interval length:
  *
  * {{{
  *   spark.conf.set("spark.graft.intervalJoin.rewrite", "true")
  *   spark.conf.set("spark.graft.intervalJoin.binSeconds", "600")
  * }}}
  *
  * Matches inner joins whose condition carries BOTH a lower-bound
  * conjunct (`ts >= start`, `ts > start`, or the reversed spellings)
  * and an upper-bound conjunct (`ts < end`, `ts <= end`, reversed
  * spellings) over the SAME timestamp expression, with the point on one
  * side and both bounds on the other, and no cross-side equi conjunct
  * (an equi key means the join already hash-plans; the guard also makes
  * the rule converge, since its own output carries the bin equality).
  */
object IntervalBinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private[graft] val EnabledKey = "spark.graft.intervalJoin.rewrite"
  private[graft] val BinKey = "spark.graft.intervalJoin.binSeconds"

  /** One range conjunct read as (conjunct, point, bound). */
  private type Bound = (Expression, Expression, Expression)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    val binSeconds = conf.getConfString(BinKey, "3600").toLong
    require(binSeconds > 0, s"$BinKey must be positive, got $binSeconds")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if cond.deterministic &&
            !BandJoinGuards.hasCrossSideEquiConjunct(cond, left, right) =>
        extract(j, cond).map(m => rewrite(j, cond, m, binSeconds)).getOrElse(j)
    }
  }

  /** (point, start, end, pointOnLeft) from a consistent lower+upper
    * conjunct pair, or None.
    */
  private def extract(
      j: Join,
      cond: Expression): Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // Each comparison is enumerated under BOTH readings (its first
    // operand as the point, and its second), and a consistent
    // lower/upper pair is searched for — this covers every spelling
    // orientation (ts >= s, s <= ts, e > ts, ...).
    val lowers: Seq[Bound] = conjuncts.flatMap {
      case c @ GreaterThanOrEqual(p, s) => Seq((c, p, s): Bound)
      case c @ GreaterThan(p, s) => Seq((c, p, s): Bound)
      case c @ LessThanOrEqual(s, p) => Seq((c, p, s): Bound)
      case c @ LessThan(s, p) => Seq((c, p, s): Bound)
      case _ => Nil
    }
    val uppers: Seq[Bound] = conjuncts.flatMap {
      case c @ LessThan(p, e) => Seq((c, p, e): Bound)
      case c @ LessThanOrEqual(p, e) => Seq((c, p, e): Bound)
      case c @ GreaterThan(e, p) => Seq((c, p, e): Bound)
      case c @ GreaterThanOrEqual(e, p) => Seq((c, p, e): Bound)
    }
    def ts(e: Expression): Boolean =
      e.dataType == TimestampType && e.deterministic
    def onSide(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    val pairs = for {
      (lc, lp, start) <- lowers.iterator
      (uc, up, end) <- uppers.iterator
      if !(lc eq uc)
      if lp.semanticEquals(up) && ts(lp) && ts(start) && ts(end)
      pointOnLeft <- Seq(true, false)
      (pSide, iSide) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
      if onSide(lp, pSide) && onSide(start, iSide) && onSide(end, iSide)
    } yield (lp, start, end, pointOnLeft)
    pairs.nextOption()
  }

  private def rewrite(
      j: Join,
      cond: Expression,
      m: (Expression, Expression, Expression, Boolean),
      binSeconds: Long): LogicalPlan = {
    val (point, start, end, pointOnLeft) = m
    val w = Literal(binSeconds * 1000000L)
    // Truncating division is monotone (enough for completeness even on
    // pre-epoch timestamps — point and bounds go through the SAME map).
    def binOf(e: Expression): Expression = IntegralDivide(UnixMicros(e), w)

    val (pointPlan, intervalPlan) =
      if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

    // Point side: one bin per row. Null points never satisfy the
    // range comparisons, so the filter is semantics-preserving and
    // keeps nulls from concentrating in a bin.
    val pAlias = Alias(binOf(point), "__graft_pbin")()
    val pProj = Project(pointPlan.output :+ pAlias,
      Filter(IsNotNull(point), pointPlan))

    // Interval side: exploded to the inclusive bin span. The
    // start <= end guard keeps Sequence from a backward range (such
    // intervals match nothing under the original condition).
    // Sequence is TimeZoneAwareExpression; post-analysis nothing fills
    // its timeZoneId, so an explicit one keeps the plan resolved (the
    // zone is irrelevant for a LONG sequence, but resolution checks it).
    val gen = Explode(Sequence(binOf(start), binOf(end),
      Some(Literal(1L)), Some(conf.sessionLocalTimeZone)))
    val binAttr = gen.elementSchema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val iGen = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = binAttr,
      child = Filter(And(IsNotNull(start),
        And(IsNotNull(end), LessThanOrEqual(start, end))), intervalPlan))

    val binEq = EqualTo(pAlias.toAttribute, binAttr.head)
    val joined =
      if (pointOnLeft) Join(pProj, iGen, Inner, Some(And(binEq, cond)), j.hint)
      else Join(iGen, pProj, Inner, Some(And(binEq, cond)), j.hint)
    Project(j.output, joined)
  }
}
