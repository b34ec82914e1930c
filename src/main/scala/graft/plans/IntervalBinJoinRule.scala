package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** ALWAYS-ON Catalyst optimizer rule: plans a point-in-interval range
  * join as a time-binned equi-join — the declarative twin of
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
  * drops same-bin non-matches (soundness).
  *
  * Bin WIDTH: by default the rule DERIVES it from the interval
  * relation as ceil(max(end − start)) seconds — a memoized 1-row
  * aggregate over the interval subtree (the `adaptivePlanes`
  * precedent: a bounded eager stats job shaping a big lazy plan).
  * NOTE the derivation is a PLANNING-TIME Spark job: the first
  * optimization of a matching join — including planning-only paths
  * like `df.explain()` — eagerly scans the interval side once per
  * distinct (subtree, bounds) per JVM. Sessions that must not run
  * jobs at plan time have three postures: set an explicit
  * `spark.graft.intervalJoin.binSeconds` (no derivation happens when
  * the width is explicit — the rewrite still engages), set
  * `spark.graft.intervalJoin.deriveStats=false` (derivation-dependent
  * joins stay as written; widths already memoized this JVM still
  * serve), or disable the rewrite entirely. At
  * that width every interval explodes to at most TWO bin rows, so the
  * build side can never inflate; the cost of an over-wide bin (one
  * outlier interval stretching the max on a skew-heavy workload —
  * more intervals sharing each bin with the candidate re-check
  * filtering harder) is bounded by match-volume + same-bin collisions
  * and is the safe direction, never all-pairs on the build side. An
  * explicit width overrides the derivation when the workload knows
  * better; the whole rewrite can be disabled per session:
  *
  * {{{
  *   spark.conf.set("spark.graft.intervalJoin.binSeconds", "600")
  *   spark.conf.set("spark.graft.intervalJoin.rewrite", "false")
  * }}}
  *
  * Matches inner joins whose condition carries BOTH a lower-bound
  * conjunct (`ts >= start`, `ts > start`, or the reversed spellings)
  * and an upper-bound conjunct (`ts < end`, `ts <= end`, reversed
  * spellings) over the SAME timestamp expression, with the point on one
  * side and both bounds on the other, and no cross-side equi conjunct
  * (an equi key means the join already hash-plans; the guard also makes
  * the rule converge, since its own output carries the bin equality).
  * Streaming plans never match (the derivation cannot run a batch job
  * over an unbounded side, and stream-stream range joins belong to the
  * watermark machinery).
  */
object IntervalBinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private[graft] val EnabledKey = "spark.graft.intervalJoin.rewrite"
  private[graft] val BinKey = "spark.graft.intervalJoin.binSeconds"
  private[graft] val DeriveKey = "spark.graft.intervalJoin.deriveStats"

  /** One range conjunct read as (conjunct, point, bound). */
  private type Bound = (Expression, Expression, Expression)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    // Explicit width wins; otherwise derive per interval subtree —
    // unless the session forbids planning-time jobs (the explain-only /
    // plan-inspection posture): with deriveStats=false and no explicit
    // width, the join is left as written (always correct) and the
    // memoized width cache is still consulted, so a width derived
    // earlier in the session keeps serving.
    val explicit = Option(conf.getConfString(BinKey, null)).map(_.toLong)
    explicit.foreach(w => require(w > 0, s"$BinKey must be positive, got $w"))
    val mayDerive = conf.getConfString(DeriveKey, "true").toBoolean
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if cond.deterministic && !left.isStreaming && !right.isStreaming &&
            !BandJoinGuards.hasCrossSideEquiConjunct(cond, left, right) =>
        extract(j, cond).flatMap { m =>
          val (_, start, end, pointOnLeft) = m
          val intervalPlan = if (pointOnLeft) j.right else j.left
          explicit.orElse(derivedBinSeconds(intervalPlan, start, end, mayDerive))
            .map(w => rewrite(j, cond, m, w))
        }.getOrElse(j)
    }
  }

  /** Memoized max(end − start) of the interval subtree, in whole
    * seconds (ceil, floored at 1s). One 1-row aggregate job per
    * distinct (subtree, bounds) per JVM; an empty/all-null relation
    * yields width 1 (unit bins — engage; exact for any width, and
    * plan shape must not flip on an empty incremental batch). None
    * only when the stats job cannot run here (re-entrant optimization
    * of the stats query itself) or fails transiently.
    */
  private val widthCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val deriving = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  private def derivedBinSeconds(
      intervalPlan: LogicalPlan,
      start: Expression,
      end: Expression,
      mayDerive: Boolean): Option[Long] = {
    if (deriving.get()) return None
    // Bounded memo: a long-lived session planning many distinct
    // interval relations must not grow the cache without limit — a
    // reset only costs re-running the 1-row stats job.
    if (widthCache.size() > 1024) widthCache.clear()
    val key = intervalPlan.canonicalized.semanticHash() + ":" +
      start.canonicalized.semanticHash() + ":" + end.canonicalized.semanticHash()
    val cached = widthCache.get(key)
    if (cached != null) return Some(cached.longValue())
    // deriveStats=false: never launch the stats job from this planning
    // pass (cached widths above still apply).
    if (!mayDerive) return None
    // The stats job runs OUTSIDE any map lock: two planner threads
    // racing on the same key may duplicate the 1-row aggregate
    // (harmless — both compute the same value, putIfAbsent keeps one),
    // but a slow full scan here can never stall unrelated planning
    // threads the way a computeIfAbsent-held bin lock would.
    val w: java.lang.Long = {
      deriving.set(true)
      try {
        val spark = org.apache.spark.sql.SparkSession.active
        val agg = org.apache.spark.sql.catalyst.plans.logical.Aggregate(Nil,
          Seq(Alias(org.apache.spark.sql.catalyst.expressions.aggregate.Max(
            Subtract(UnixMicros(end), UnixMicros(start))).toAggregateExpression(),
            "__graft_maxw")()),
          intervalPlan)
        val row = org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, agg).head()
        // Empty/all-null interval relation: ENGAGE with unit bins
        // rather than declining. The rewrite is exact for ANY width
        // (null start/end produce null bin keys, dropped by the inner
        // equi-join exactly as the original range predicate drops
        // them), and declining here would make plan shape — and any
        // caller pinned to it — flip on the first empty batch of an
        // incremental feed.
        if (row.isNullAt(0)) 1L
        else math.max(1L, math.ceil(row.getLong(0).toDouble / 1e6).toLong)
      } catch {
        // A stats failure must never fail the user's query — fall back
        // to not rewriting (the original join is always correct). The
        // failure is NOT cached: a transient error (e.g. an executor
        // hiccup) would otherwise silently disable the rewrite for this
        // plan shape for the JVM's lifetime; the next planning pass
        // simply retries.
        case _: Throwable => null
      } finally deriving.set(false)
    }
    if (w == null) None
    else {
      widthCache.putIfAbsent(key, w)
      Some(w.longValue())
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
      // Non-comparison conjuncts (e.g. a `!=` inequality arriving as
      // Not(EqualTo)) must fall through — a missing default here threw
      // MatchError inside the optimizer for ANY candidate join whose
      // condition carried one (found by q143's `va =!= vb` conjunct).
      case _ => Nil
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
