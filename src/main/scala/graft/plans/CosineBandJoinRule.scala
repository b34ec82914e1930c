package graft.plans

import graft.functions.{LshBucketExpr, VecCosineExpr}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** OPT-IN Catalyst optimizer rule: plans a cosine-similarity threshold
  * join as a multi-probe LSH-bucketed equi-join.
  *
  * A user writing the natural declarative form
  * {{{
  *   a.join(b, vecCosine(a("emb"), b("emb")) >= lit(0.7))
  * }}}
  * gets a BroadcastNestedLoopJoin — the O(|a|*|b|) comparison that is
  * the #1 way a large-corpus similarity query goes quadratic. This
  * rule re-plans it as the bucketed shape
  * [[graft.ops.Dedup.embeddingNearDuplicatesLsh]] builds by hand: both
  * sides keyed by their sign-pattern LSH bucket
  * ([[graft.functions.LshBucketExpr]]), the LEFT side exploded to
  * multi-probe every bucket at Hamming distance <= 1 in sign space,
  * an equi-join on the bucket, and the ORIGINAL cosine predicate (plus
  * any other conjuncts) re-checked on the candidates.
  *
  * Soundness is exact (every emitted pair satisfies the original
  * condition; a left-right row pair can match on at most one probe
  * value, so multiplicities are preserved with no distinct). Recall is
  * NOT: pairs whose sign patterns differ in more than one hyperplane
  * are never candidates — that is the standard LSH trade, and the
  * reason this rewrite is gated behind an explicit session knob,
  * unlike the exact [[HammingBandJoinRule]]:
  *
  * {{{
  *   spark.conf.set("spark.graft.cosineJoin.rewrite", "true")   // opt in
  *   spark.conf.set("spark.graft.cosineJoin.numPlanes", "6")    // default 8
  * }}}
  *
  * Tune numPlanes toward log2(expected cluster count) — measured
  * operating points are documented at
  * [[graft.ops.Similarity.lshTopK]]. Matches inner joins whose
  * condition contains a conjunct `vec_cosine(l, r) >= t` (or `>`, or
  * the literal-first reversed forms) with t > 0, one side each, and no
  * cross-side equality conjunct (an equi conjunct means the join
  * already hash-plans — and the guard is also what makes the rule
  * converge in a fixed-point batch, since its own output carries the
  * bucket equality).
  */
object CosineBandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private[graft] val EnabledKey = "spark.graft.cosineJoin.rewrite"
  private[graft] val PlanesKey = "spark.graft.cosineJoin.numPlanes"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    val numPlanes = conf.getConfString(PlanesKey, "8").toInt
    require(numPlanes >= 1 && numPlanes <= 62,
      s"$PlanesKey must be in [1, 62], got $numPlanes")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if cond.deterministic && !BandJoinGuards.hasCrossSideEquiConjunct(cond, left, right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        conjuncts.iterator
          .map(c => (c, extractCosine(c, left, right)))
          .collectFirst { case (matched, Some((lKey, rKey))) =>
            rewrite(j, conjuncts, matched, lKey, rKey, numPlanes)
          }
          .getOrElse(j)
    }
  }

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** (leftKey, rightKey) from one `vec_cosine(a, b) >= t` conjunct
    * (t > 0 — at t <= 0 nearly everything qualifies and bucketing
    * cannot help), or None.
    */
  private def extractCosine(
      c: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression)] = {
    def thresh(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case _ => None
    }
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] = {
      val ok = isVec(a) && isVec(b) && a.deterministic && b.deterministic
      if (!ok) None
      else if (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) Some((a, b))
      else if (b.references.subsetOf(left.outputSet) &&
        a.references.subsetOf(right.outputSet)) Some((b, a))
      else None
    }
    val keys: Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(VecCosineExpr(a, b), l) if thresh(l).exists(_ > 0) =>
        Some((a, b))
      case GreaterThan(VecCosineExpr(a, b), l) if thresh(l).exists(_ >= 0) =>
        Some((a, b))
      case LessThanOrEqual(l, VecCosineExpr(a, b)) if thresh(l).exists(_ > 0) =>
        Some((a, b))
      case LessThan(l, VecCosineExpr(a, b)) if thresh(l).exists(_ >= 0) =>
        Some((a, b))
      case _ => None
    }
    keys.flatMap { case (a, b) => sides(a, b) }
  }

  private def rewrite(
      j: Join,
      conjuncts: Seq[Expression],
      cosineConjunct: Expression,
      lKey: Expression,
      rKey: Expression,
      numPlanes: Int): LogicalPlan = {
    // Probe side (left): own bucket plus each bucket at sign-Hamming
    // distance 1. The probe values of one row are pairwise distinct and
    // the base side carries exactly one bucket, so any row pair matches
    // at most once — exactly-once emission, no dedup shuffle.
    // Null embeddings drop BEFORE bucketing: LshBucketExpr maps a null
    // array to bucket 0, so without these filters every null row on
    // both sides concentrates in bucket 0 — and each left null row
    // still explodes into numPlanes+1 probe rows against that hot
    // bucket (a skew footgun on dirty data). Rows with null keys can
    // never satisfy the original cosine predicate (null comparison),
    // so the filters are semantics-preserving.
    val lBucket = LshBucketExpr(lKey, numPlanes)
    val probes = lBucket +: (0 until numPlanes).map(p =>
      BitwiseXor(lBucket, Literal(1L << p)))
    val gen = Explode(CreateArray(probes))
    val probeAttr = gen.elementSchema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val lGen = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = probeAttr,
      child = Filter(IsNotNull(lKey), j.left))

    val rAlias = Alias(LshBucketExpr(rKey, numPlanes), "__graft_bucket")()
    val rProj = Project(j.right.output :+ rAlias, Filter(IsNotNull(rKey), j.right))

    // Re-check the full original condition on candidates, but with the
    // cosine conjunct LAST: the other conjuncts (id ordering, cheap
    // attribute predicates) prune same-bucket candidates — including
    // self-pairs and the mirrored ordering of every pair — before the
    // O(dim) cosine runs. Measured ~2x on the 10x bench corpus.
    val reordered = (conjuncts.filterNot(_ eq cosineConjunct) :+ cosineConjunct)
      .reduce(And)
    val joined = Join(lGen, rProj, Inner,
      Some(And(EqualTo(probeAttr.head, rAlias.toAttribute), reordered)), j.hint)
    Project(j.output, joined)
  }
}
