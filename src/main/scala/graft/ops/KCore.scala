package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition of an undirected graph — the density primitive
  * that separates STRUCTURAL cluster membership from incidental
  * pairing: the k-core is the unique maximal subgraph in which every
  * vertex keeps at least k neighbors (Seidman 1983, "Network structure
  * and minimum degree"). On a duplicate-pair graph it distinguishes
  * dense template families (boilerplate, mirrored corpora — every
  * member near-duplicates many others) from one-off coincidental
  * pairs; on a co-purchase graph it isolates the stable product
  * communities from long-tail co-occurrence noise. Connected
  * components ([[Components]]) answer "reachable at all"; the k-core
  * answers "mutually dense", which is the grain a pipeline prunes or
  * weights by.
  *
  * Algorithm: synchronous peeling — each round removes every vertex
  * whose degree among SURVIVORS is below k, until a round removes
  * nothing. Each round is one partial-aggregated degree count over
  * the surviving edge relation plus two anti-joins that drop the
  * peeled vertices' edges; no driver-side graph state. Round count is
  * the graph's peel depth (bounded by its degeneracy ordering), small
  * for real corpus graphs — hub-heavy graphs peel their sparse fringe
  * in the first rounds and converge as soon as the dense center
  * stabilizes.
  *
  * Exactness is CERTIFIABLE per vertex without re-running the peel
  * ([[kCoreCertified]]): a kept vertex is correct iff it has >= k KEPT
  * neighbors (validity); a removed vertex is correct iff fewer than k
  * of its neighbors were still alive entering its peel round, i.e.
  * kept or peeled in the same-or-a-later round (an inductive exclusion
  * certificate). Validity of all kept rows proves kept ⊆ k-core;
  * certified exclusion of all removed rows proves k-core ⊆ kept — both
  * TRUE pins the result exactly, and both are plain SQL aggregates a
  * DuckDB oracle can replay (the q52 argmax-verification discipline).
  */
object KCore {

  /** Vertices of the undirected graph given by `pairs`, labeled with
    * k-core membership.
    *
    * @param pairs one row per undirected edge; self-loops and duplicate
    *              edges are tolerated (they are no-ops)
    * @param aCol  left endpoint column name
    * @param bCol  right endpoint column name
    * @param k     minimum within-subgraph degree (>= 1)
    * @param maxIter hard cap on peel rounds; the loop exits as soon as
    *                a round removes nothing, and THROWS if the cap cuts
    *                the peel short (a truncated peel is not a k-core —
    *                failing loudly beats returning a superset)
    * @param localFinishVertices survivor-count threshold under which
    *                the residual peel finishes sequentially on the
    *                driver (see [[kCoreFromEdges]]); 0 forces every
    *                round distributed (tests pin both paths)
    * @return (id, in_kcore, peel_round): one row per distinct endpoint;
    *         peel_round is 1-based for removed vertices, null for kept
    */
  def kCore(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      k: Int,
      maxIter: Int = 50,
      localFinishVertices: Long = 100000L): DataFrame =
    kCoreFromEdges(graft.core.Caches.persistTracked(
      symmetricEdges(pairs, aCol, bCol)), k, maxIter, localFinishVertices)

  /** Symmetric (src, dst) edge relation via the explode idiom (not
    * self-union: union branches re-execute an expensive upstream pair
    * producer; see [[Components.connectedComponents]]).
    */
  private def symmetricEdges(
      pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst"))))
        .as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()

  /** The peel over a PRE-PERSISTED symmetric edge relation — shared so
    * [[kCoreCertified]] pays the (often expensive) pair producer once
    * for the peel AND the certificate join.
    */
  private def kCoreFromEdges(
      edges: DataFrame, k: Int, maxIter: Int,
      localFinishVertices: Long = 100000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var aliveE = edges
    var aliveV = graft.core.Caches.persistTracked(
      aliveE.select(col("src").as("id")).distinct())
    // Peels are top-heavy: the first round or two strip the sparse
    // fringe (most of a real corpus graph) and every later round works
    // a small core where per-JOB overhead, not data, is the cost — a
    // deep cascade is dozens of rounds x 3 Spark jobs over a few
    // thousand rows. Once the survivor count provably fits the
    // thresholds, the peel COLLECTS the residual graph and finishes
    // sequentially on the driver (identical synchronous semantics,
    // continuous round numbers). This is a size-BOUNDED escape hatch,
    // not driver-side graph processing: the distributed rounds did the
    // corpus-scale work, and the collect is capped at maxLocalEdges
    // rows (~tens of MB) — measured on q147 it replaces ~30 scheduled
    // jobs with one collect.
    var aliveN = aliveV.count()
    val maxLocalEdges = 2000000L

    var removed: DataFrame = null
    var localResult: Option[DataFrame] = None
    var converged = false
    var iter = 0
    while (!converged && localResult.isEmpty && iter < maxIter) {
      if (aliveN < localFinishVertices) {
        val eRows = aliveE.count()
        if (eRows <= maxLocalEdges)
          localResult = Some(finishLocally(aliveV, aliveE, k, iter, maxIter))
      }
      if (localResult.isEmpty) {
        iter += 1
        // Degree among survivors: both endpoints of every aliveE row
        // are alive by construction, so one map-side-combined count
        // does it.
        val deg = aliveE.groupBy(col("src").as("id"))
          .agg(count(lit(1)).as("__deg"))
        // Left join, not inner: a vertex whose last edge died in an
        // earlier round has degree 0 — it must peel, not linger.
        // EAGER localCheckpoint, not persist: the peeled relation is
        // referenced twice by the edge anti-join below while itself
        // referencing the previous round's whole chain — carried as a
        // logical plan that re-embedding would grow 3^rounds (measured:
        // plan-string OOM by round 8 on a 30-edge ladder). The
        // checkpoint cuts it to a vertex-sized RDD leaf each round.
        val peeled = aliveV.join(deg, Seq("id"), "left")
          .where(coalesce(col("__deg"), lit(0L)) < k)
          .select(col("id"), lit(iter).as("peel_round"))
          .localCheckpoint()
        val peeledN = peeled.count()
        if (peeledN == 0L) converged = true
        else {
          aliveN -= peeledN
          // A fully collapsed graph is converged — without this, a
          // peel finishing in EXACTLY maxIter rounds would throw even
          // though the result is fully determined (the empty-detection
          // round would need iteration maxIter+1).
          if (aliveN == 0L) converged = true
          removed = if (removed == null) peeled
            else removed.unionByName(peeled)
          val pk = peeled.select(col("id").as("__pid"))
          aliveV = graft.core.Caches.persistTracked(
            aliveV.join(pk, col("id") === col("__pid"), "left_anti"))
          aliveE = graft.core.Caches.persistTracked(
            aliveE.join(pk, col("src") === col("__pid"), "left_anti")
              .join(pk, col("dst") === col("__pid"), "left_anti"))
          // Lineage hygiene for graphs too large for the local
          // finisher that still cascade deep: cut the carried plan to
          // an RDD leaf periodically (the Components jump-round
          // discipline) so planning cost stays linear in depth.
          if (iter % 8 == 0) {
            aliveV = aliveV.localCheckpoint()
            aliveE = aliveE.localCheckpoint()
          }
        }
      }
    }
    if (!converged && localResult.isEmpty)
      throw new IllegalStateException(
        s"k-core peel did not converge within maxIter=$maxIter rounds; " +
          "raise maxIter — a truncated peel is a SUPERSET of the k-core")

    val tail = localResult.getOrElse(
      aliveV.select(col("id"), lit(true).as("in_kcore"),
        lit(null).cast("int").as("peel_round")))
    if (removed == null) tail
    else tail.unionByName(removed
      .select(col("id"), lit(false).as("in_kcore"), col("peel_round")))
  }

  /** Sequential synchronous peel of the RESIDUAL graph on the driver —
    * byte-for-byte the distributed rounds' semantics (same conditions,
    * continuing round numbers from `startIter`), invoked only under
    * the size caps documented in [[kCoreFromEdges]]. Generic over the
    * id type (ids are carried as opaque values). Returns the residual
    * vertices' full membership relation.
    */
  private def finishLocally(
      aliveV: DataFrame,
      aliveE: DataFrame,
      k: Int,
      startIter: Int,
      maxIter: Int): DataFrame = {
    val spark = aliveV.sparkSession
    val idField = aliveV.schema.fields.head
    val vs = aliveV.collect().map(_.get(0))
    val adj = collection.mutable.Map.empty[Any, collection.mutable.Set[Any]]
    for (v <- vs) adj(v) = collection.mutable.Set.empty[Any]
    for (r <- aliveE.collect()) adj(r.get(0)) += r.get(1)
    var alive = vs.toSet
    val removedLocal = collection.mutable.ArrayBuffer.empty[(Any, Int)]
    var iter = startIter
    var done = false
    while (!done && iter < maxIter) {
      iter += 1
      val peel = alive.filter(v => adj(v).count(alive) < k)
      if (peel.isEmpty) done = true
      else {
        peel.foreach(v => removedLocal += ((v, iter)))
        alive = alive -- peel
        // Full collapse is converged (see the distributed loop's
        // maxIter-boundary note).
        if (alive.isEmpty) done = true
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"k-core peel did not converge within maxIter=$maxIter rounds; " +
          "raise maxIter — a truncated peel is a SUPERSET of the k-core")
    val rows = alive.toSeq.map(v =>
        org.apache.spark.sql.Row(v, true, null)) ++
      removedLocal.map { case (v, r) =>
        org.apache.spark.sql.Row(v, false, Integer.valueOf(r)) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idField.dataType,
          idField.nullable),
        org.apache.spark.sql.types.StructField("in_kcore",
          org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField("peel_round",
          org.apache.spark.sql.types.IntegerType, nullable = true))))
  }

  /** [[kCore]] plus the per-vertex exactness certificate: (id, degree,
    * certified) with degree = distinct-neighbor count in the FULL
    * graph and certified as documented on the object — every row TRUE
    * iff the peel returned exactly the k-core. One extra join of the
    * edge relation against the (vertex-sized) membership, grouped
    * map-side; the certificate never re-runs the peel.
    */
  def kCoreCertified(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      k: Int,
      maxIter: Int = 50,
      localFinishVertices: Long = 100000L): DataFrame = {
    val edges = graft.core.Caches.persistTracked(
      symmetricEdges(pairs, aCol, bCol))
    val membership = graft.core.Caches.persistTracked(
      kCoreFromEdges(edges, k, maxIter, localFinishVertices))
    val s = membership.select(col("id").as("src"),
      col("in_kcore").as("__s_kept"), col("peel_round").as("__s_round"))
    val t = membership.select(col("id").as("dst"),
      col("in_kcore").as("__t_kept"), col("peel_round").as("__t_round"))
    edges.join(s, "src").join(t, "dst")
      .groupBy(col("src").as("id"), col("__s_kept"), col("__s_round"))
      .agg(
        count(lit(1)).as("degree"),
        count(when(col("__t_kept"), 1)).as("__kept_nbrs"),
        count(when(col("__t_kept") || col("__t_round") >= col("__s_round"), 1))
          .as("__alive_at_peel"))
      .select(col("id"),
        col("degree"),
        when(col("__s_kept"), col("__kept_nbrs") >= k)
          .otherwise(col("__alive_at_peel") < k).as("certified"))
  }
}
