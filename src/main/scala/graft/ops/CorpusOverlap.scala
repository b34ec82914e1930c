package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise content overlap between corpus slices (§2.11 extension —
  * the "how much do my sources repeat each other" matrix that decides
  * whether two crawls/dumps should be cross-deduplicated before
  * mixing: Jaccard and containment of the slices' n-gram vocabularies.
  * Containment is the asymmetric signal — a small source fully
  * contained in a big one is a subset-dump even when Jaccard is low).
  *
  * Exactness: set sizes and intersections are integer counts over the
  * DISTINCT (group, shingle) relation; the ratios ship as micro-units
  * via IntegralDivide, so every digit reproduces on any engine.
  *
  * Scale shape: one token-grain explode (the dedup-index grain every
  * shingle method already pays), a distinct at (group, shingle), one
  * self-equi-join ON THE SHINGLE of that deduped relation (work tracks
  * true shared-vocabulary volume — a stop-shingle appears once per
  * GROUP, not once per document, so the join's per-key fan-out is
  * bounded by the group count), and aggregations at group and
  * group-pair grain (#groups² rows at most — sources/domains number
  * thousands, not billions). At PB scale the same matrix is estimated
  * from per-group MinHash sketches (constant size per group, no
  * shingle join at all); this exact form is the oracle and stays
  * correct at any scale — it is just no longer the cheapest estimate.
  */
object CorpusOverlap {

  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** (grp_a, grp_b, n_a, n_b, n_common, jaccard_micro,
    * containment_micro) for every UNORDERED group pair sharing at
    * least one word-`shingleN`-gram (grp_a < grp_b; disjoint pairs
    * carry no signal and are omitted — at matrix grain absence IS the
    * zero). Sizes are distinct-shingle vocabulary sizes; containment
    * divides by the smaller vocabulary.
    */
  def sourceOverlap(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      shingleN: Int = 3): DataFrame = {
    val keys = graft.core.Caches.persistTracked(
      docs.select(col(groupCol).as("grp"),
          explode(TextAnalysis.ngrams(col(textCol), shingleN)).as("g"))
        .distinct())
    val sizes = keys.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val common = keys.select(col("grp").as("grp_a"), col("g"))
      .join(keys.select(col("grp").as("grp_b"), col("g")), Seq("g"))
      .where(col("grp_a") < col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("n_common"))
    val m = lit(1000000L)
    common
      .join(sizes.select(col("grp").as("grp_a"), col("n").as("n_a")), "grp_a")
      .join(sizes.select(col("grp").as("grp_b"), col("n").as("n_b")), "grp_b")
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"), col("n_common"),
        intDiv(m * col("n_common"), col("n_a") + col("n_b") - col("n_common"))
          .as("jaccard_micro"),
        intDiv(m * col("n_common"), least(col("n_a"), col("n_b")))
          .as("containment_micro"))
  }

  /** Per-group MERGEABLE MinHash signature over the group's shingle
    * vocabulary: (grp, sig) with sig = elementwise min of the member
    * documents' native MinHash signatures — which IS the MinHash of
    * the UNION of their shingle sets (a min of mins), so signatures
    * merge across shards/snapshots in any order with no raw rescan
    * (the IncrementalStats property, for set overlap). Constant
    * `numHashes`·8 bytes per group; the per-doc signature pass is the
    * codegen'd [[graft.functions.MinHashSigExpr]] scan loop, the merge
    * is a map-side-combinable (grp, pos) min.
    */
  def groupSignatures(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      shingleN: Int = 3,
      numHashes: Int = 128): DataFrame =
    docs.select(col(groupCol).as("grp"),
        posexplode(Dedup.minhashSignature(col(textCol), shingleN, numHashes))
          .as(Seq("pos", "v")))
      .groupBy(col("grp"), col("pos")).agg(min(col("v")).as("v"))
      .groupBy(col("grp"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("sig"))

  /** The PB-scale estimate of [[sourceOverlap]]: pairwise Jaccard from
    * the group signatures (matching-component fraction — the classic
    * unbiased MinHash estimator), for EVERY group pair including
    * disjoint ones. No shingle join at all: the pair loop runs over
    * #groups² constant-size signatures. est stderr = sqrt(J(1-J)/k).
    * Output: (grp_a, grp_b, est_micro).
    */
  def sourceOverlapEstimate(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      shingleN: Int = 3,
      numHashes: Int = 128): DataFrame = {
    val sigs = graft.core.Caches.persistTracked(
      groupSignatures(docs, textCol, groupCol, shingleN, numHashes))
    val matches = aggregate(
      zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, z) => acc + z)
    sigs.select(col("grp").as("grp_a"), col("sig").as("sig_a"))
      .join(sigs.select(col("grp").as("grp_b"), col("sig").as("sig_b")),
        col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"),
        intDiv(lit(1000000L) * matches, lit(numHashes.toLong)).as("est_micro"))
  }
}
