package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank on an exact integer grid (§2.11 extension
  * — graph authority scoring over co-occurrence / link graphs: which
  * items, hosts, or documents sit at the center of the corpus).
  *
  * Two deliberate design choices:
  *
  *  - FIXED iteration count, not convergence detection. Each iteration
  *    is one join + one key-grain aggregation (the classic BSP
  *    formulation); a convergence test would add a driver round-trip
  *    per iteration for no analytical benefit at small K. Iterations
  *    are separated by eager rank checkpoints so every round's plan is
  *    a constant-size join of materialized leaves (the composed-DAG
  *    form re-derived the nodes/degree subtrees once per iteration and
  *    tripled the stage count — measured 3x slower at sf0.1).
  *  - INTEGER micro-unit arithmetic. Float PageRank sums are
  *    reduction-order-sensitive — the same graph gives last-ULP
  *    different ranks run-to-run, and engine-to-engine. Here rank
  *    starts at 1e6 per node and every step is floor division:
  *    contribution = r div out_deg, damped update =
  *    150000 + (17 * sum) div 20 (= 0.15 + 0.85x on the grid). Every
  *    intermediate is an exact integer any engine reproduces, so a
  *    3-iteration DuckDB CTE chain matches digit for digit.
  *
  * Scale shape: degrees are computed once; each iteration shuffles the
  * edge list on src (join with current ranks) and on dst (contribution
  * sum) — the standard 2-shuffle PageRank step, with ranks
  * checkpointed between iterations to truncate lineage (the same
  * discipline real-scale PageRank applies).
  */
object PageRank {

  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** (node, rank_micro) after `iterations` damped updates over the
    * directed edge list (srcCol, dstCol). Nodes are the distinct edge
    * endpoints; a node with no in-edges keeps the base 150000. Ranks
    * are unnormalized (start at 1e6 each); dangling mass is dropped,
    * matching the floor-division oracle exactly.
    */
  def pageRankMicro(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations must be in [1, 10] (composed-plan depth), got $iterations")
    // Persist the canonical edge list: every iteration's contribution
    // join AND the nodes/degree relations hang off it, so an unpersisted
    // plan would re-derive the (possibly expensive) upstream edge
    // discovery once per reference — at 100x scale that re-derivation,
    // not the rank updates, dominates. Released by the caller via
    // Caches.releaseAll.
    val e = graft.core.Caches.persistTracked(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    // nodes and the degree-annotated edge list are each referenced by
    // EVERY iteration; materialized once (checkpoint leaf / tracked
    // persist) instead of re-deriving the distinct/agg/join subtrees
    // per reference inside one composed DAG — measured on the q115
    // support-pair graph at sf0.1, the composed form re-ran those
    // subtrees three times each and the single job carried ~15 shuffle
    // stages (q115 in-suite 9.1 s composed; ~5.1 s restructured).
    // Checkpoints.cut: eager localCheckpoint by default, config-keyed
    // reliable checkpoint for executor-loss-sensitive deployments.
    val nodes = graft.core.Checkpoints.cut(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val withDeg = graft.core.Caches.persistTracked(e.join(deg, "src"))
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (i <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks.select(col("node").as("src"), col("rank_micro")), "src")
        .select(col("dst").as("node"),
          intDiv(col("rank_micro"), col("out_deg")).as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__in"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) +
            intDiv(lit(17L) * coalesce(col("__in"), lit(0L)), lit(20L)))
            .as("rank_micro"))
      // EAGER checkpoint between iterations (the connectedComponents
      // flat-plan lesson): each iteration's plan stays a constant-size
      // join of three leaves instead of nesting the previous
      // iterations'. The LAST iteration stays lazy so callers compose
      // their projection/order on an un-materialized plan.
      if (i < iterations) ranks = graft.core.Checkpoints.cut(ranks)
    }
    ranks
  }
}
