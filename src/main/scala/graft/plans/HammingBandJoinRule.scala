package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule (the SURVEY §4.5 custom-plan-tier stretch):
  * plans a Hamming-distance similarity join as a banded equi-join.
  *
  * A user writing the natural declarative form
  * {{{
  *   a.join(b, bit_count(a("sh") ^ b("sh")) <= lit(3))
  * }}}
  * gets a BroadcastNestedLoopJoin — an O(|a|*|b|) comparison that is
  * THE scale killer for near-dup joins. But for 64-bit keys and
  * distance <= k, splitting the word into k+1 disjoint bands guarantees
  * (pigeonhole) that every qualifying pair agrees exactly on at least
  * one band, so the same semantics can be planned as: posexplode the
  * k+1 bands on each side, equi-join on (band index, band value) — a
  * uniform hash shuffle — and re-check the exact predicate on the
  * candidates. This is the rewrite `Dedup.simhashNearDuplicates` does
  * by hand, surfaced as an optimizer rule so ANY matching join in any
  * query gets the scalable plan for free.
  *
  * The rewrite is EXACT, not approximate:
  *  - recall: pigeonhole covers every pair at distance <= k;
  *  - no duplicates: a pair agreeing on several bands is emitted only
  *    for its FIRST agreeing band (the filter keeps row (i) only when
  *    bands 0..i-1 all differ), so row multiplicities are preserved
  *    without a `distinct` that would merge legitimately duplicate
  *    input rows;
  *  - null keys drop on the band equi-join exactly as the original
  *    null comparison dropped them.
  *
  * Matches inner joins whose condition contains a conjunct of shape
  * `bit_count(lKey ^ rKey) <= k` (or `<`, or the reversed `>=`/`>`
  * literal-first forms) with LongType keys, one side each, k <= 15
  * (beyond that the bands get too short to prune anything). All other
  * conjuncts are preserved in the post-join filter.
  *
  * Registered via `GraftExtensions` (spark.sql.extensions) or
  * imperatively with `GraftFunctions.registerOptimizations(spark)`
  * (`spark.experimental.extraOptimizations`, which runs after the main
  * optimizer batches — by then a crossJoin+where has already been
  * collapsed into a conditioned Join, so the pattern is visible).
  */
object HammingBandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxK = 15

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if cond.deterministic && !BandJoinGuards.hasCrossSideEquiConjunct(cond, left, right) =>
      splitConjunctivePredicates(cond).iterator
        .map(c => extractHamming(c, left, right))
        .collectFirst { case Some((lKey, rKey, k)) if k >= 0 && k <= MaxK =>
          rewrite(j, lKey, rKey, k)
        }
        .getOrElse(j)
  }

  /** (leftKey, rightKey, k) from one conjunct, or None. */
  private def extractHamming(
      c: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Int)] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case Literal(v: Long, _) if v.isValidInt => Some(v.toInt)
      case _ => None
    }
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] = {
      val ok = a.dataType == LongType && b.dataType == LongType &&
        a.deterministic && b.deterministic
      if (!ok) None
      else if (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) Some((a, b))
      else if (b.references.subsetOf(left.outputSet) &&
        a.references.subsetOf(right.outputSet)) Some((b, a))
      else None
    }
    val kv: Option[(Expression, Expression, Int)] = c match {
      case LessThanOrEqual(BitwiseCount(BitwiseXor(a, b)), l) =>
        lit(l).map(k => (a, b, k))
      case LessThan(BitwiseCount(BitwiseXor(a, b)), l) =>
        lit(l).map(k => (a, b, k - 1))
      case GreaterThanOrEqual(l, BitwiseCount(BitwiseXor(a, b))) =>
        lit(l).map(k => (a, b, k))
      case GreaterThan(l, BitwiseCount(BitwiseXor(a, b))) =>
        lit(l).map(k => (a, b, k - 1))
      case _ => None
    }
    kv.flatMap { case (a, b, k) => sides(a, b).map { case (l, r) => (l, r, k) } }
  }

  /** (offset, width) of the k+1 disjoint bands covering all 64 bits. */
  private def bandLayout(k: Int): Seq[(Int, Int)] = {
    val nb = k + 1
    val base = 64 / nb
    val rem = 64 % nb
    val widths = Seq.fill(rem)(base + 1) ++ Seq.fill(nb - rem)(base)
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  private def bandExpr(key: Expression, off: Int, width: Int): Expression =
    if (width >= 64) key
    else BitwiseAnd(ShiftRightUnsigned(key, Literal(off)), Literal((1L << width) - 1))

  private def rewrite(
      j: Join, lKey: Expression, rKey: Expression, k: Int): LogicalPlan = {
    val layout = bandLayout(k)

    def banded(child: LogicalPlan, key: Expression): (LogicalPlan, Attribute, Attribute) = {
      val gen = PosExplode(CreateArray(layout.map { case (o, w) => bandExpr(key, o, w) }))
      val attrs = gen.elementSchema.fields.toSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)())
      (Generate(gen, unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = attrs, child = child), attrs(0), attrs(1))
    }

    val (lGen, lIdx, lVal) = banded(j.left, lKey)
    val (rGen, rIdx, rVal) = banded(j.right, rKey)
    val joined = Join(lGen, rGen, Inner,
      Some(And(EqualTo(lIdx, rIdx), EqualTo(lVal, rVal))), j.hint)

    // Emit a candidate only at its FIRST agreeing band: for every band
    // b below the joined index, the band values must differ.
    val firstMatchOnly = layout.indices.dropRight(1).map { b =>
      val (o, w) = layout(b)
      Or(LessThanOrEqual(lIdx, Literal(b)),
        Not(EqualTo(bandExpr(lKey, o, w), bandExpr(rKey, o, w))))
    }.reduceOption(And).getOrElse(Literal.TrueLiteral)

    // Exact original condition (the Hamming predicate prunes candidate
    // pairs that agree on a band but exceed k overall, plus any other
    // conjuncts the join carried).
    Project(j.output, Filter(And(j.condition.get, firstMatchOnly), joined))
  }
}
