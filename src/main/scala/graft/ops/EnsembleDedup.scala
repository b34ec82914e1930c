package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ensemble duplicate-family discovery (§2.11 extensions capstone):
  * UNION several dedup signals — exact content, lexical Jaccard,
  * embedding cosine, any (id_a, id_b) pair relation — into ONE
  * provenance-tagged duplicate graph, close it under connectivity, and
  * report per document its family, the family's size, and WHICH
  * signals connect the family (a bitmask OR-folded over its edges).
  *
  * Why one graph instead of per-signal dedup passes: the signals
  * overlap but none subsumes another (a paraphrase is cosine-only, a
  * shuffled boilerplate page Jaccard-only, a re-encode exact-only), and
  * chained per-signal passes double-drop documents whose family
  * membership is only visible transitively ACROSS signals (A≈B
  * lexically, B≈C semantically must land A,B,C in one family). The
  * provenance bitmask keeps the audit trail a curation pipeline needs:
  * which detector family caused each removal.
  *
  * Scale shape: each signal contributes its own already-bounded pair
  * relation (banded/prefix-filtered upstream — this operator never
  * generates pairs); the union is edge-grain, the per-pair bit_or and
  * the closure ride [[Components.connectedComponents]] (min-label
  * propagation with pointer-jump escalation), and the per-family
  * signal rollup is one more edge-grain aggregation. Nothing here
  * touches text or embeddings.
  */
object EnsembleDedup {

  /** Exact-content duplicate edges in STAR form — each document linked
    * to its content group's minimum id. One shuffle at (content, id)
    * grain and edge count = dup count (an in-group all-pairs form is
    * quadratic in group size and adds nothing: the closure and the
    * per-family signal presence are identical).
    */
  def exactContentEdges(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h"))
    docs.select(col(idCol).as("id_b"), xxhash64(col(textCol)).as("__h"))
      .withColumn("id_a", min(col("id_b")).over(w))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
  }

  /** One dedup signal: an undirected pair relation plus the provenance
    * bit it contributes (a power of two; bits OR across signals).
    */
  final case class Signal(pairs: DataFrame, aCol: String, bCol: String,
      bit: Int) {
    require(bit > 0 && (bit & (bit - 1)) == 0,
      s"signal bit must be a power of two, got $bit")
  }

  /** Per-document family assignment over the union graph:
    * (id, family, family_size, signals, is_canonical) — `family` = min
    * reachable id across ALL signals (singletons keep their own id,
    * signals 0), `signals` = bit_or of every edge bit inside the
    * family, `is_canonical` = id == family (the survivor a dedup pass
    * keeps).
    */
  def dupFamilies(
      docs: DataFrame,
      idCol: String,
      signals: Seq[Signal]): DataFrame = {
    require(signals.nonEmpty, "need at least one signal")
    // Canonical undirected orientation, then ONE row per distinct pair
    // carrying the OR of every signal that proposed it. Persisted: the
    // closure re-joins edges every propagation round and the family
    // signal rollup scans them once more.
    val edges = graft.core.Caches.persistTracked(
      signals.map { s =>
        s.pairs.select(
          least(col(s.aCol), col(s.bCol)).as("id_a"),
          greatest(col(s.aCol), col(s.bCol)).as("id_b"),
          lit(s.bit).as("__sig"))
          .where(col("id_a") =!= col("id_b") &&
            col("id_a").isNotNull && col("id_b").isNotNull)
      }.reduce(_ unionByName _)
        .groupBy(col("id_a"), col("id_b"))
        .agg(bit_or(col("__sig")).as("signals")))

    val comps = Components.connectedComponents(edges, "id_a", "id_b")
    val assigned = graft.core.Caches.persistTracked(
      docs.select(col(idCol).as("id"))
        .join(comps, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("family")))
    val sizes = assigned.groupBy(col("family"))
      .agg(count(lit(1)).as("family_size"))
    // Family-level signal presence: every edge lives inside one family
    // (both endpoints share a component by construction), so rolling up
    // by id_a's component covers it.
    val famSignals = edges
      .join(comps.select(col("id").as("id_a"), col("component").as("family")),
        Seq("id_a"))
      .groupBy(col("family"))
      .agg(bit_or(col("signals")).as("signals"))
    assigned
      .join(sizes, Seq("family"))
      .join(famSignals, Seq("family"), "left")
      .select(col("id"), col("family"), col("family_size"),
        coalesce(col("signals"), lit(0)).as("signals"),
        (col("id") === col("family")).as("is_canonical"))
  }
}
