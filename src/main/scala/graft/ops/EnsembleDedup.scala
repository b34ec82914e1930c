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

  /** Incremental family maintenance: assign a NEW BATCH of documents to
    * the standing families of a prior [[dupFamilies]] run without
    * re-closing the corpus graph. Exact by the supernode argument: a
    * family's id is the minimum of its member ids, so collapsing every
    * corpus endpoint to its family id and min-label-closing the
    * (batch ∪ supernode) graph yields the SAME family ids, sizes,
    * signal bitmasks, and canonical verdicts a full recompute over
    * corpus ∪ batch would — including the case where one batch document
    * BRIDGES two standing families (both collapse into the global-min
    * id, sizes and signals summing/OR-ing). Corpus-internal edges are
    * never re-derived: they are represented by `corpusFamilies`'
    * family-level size and signal columns.
    *
    * Scale shape: `signals` carries only BATCH-INCIDENT pair relations
    * (batch-vs-corpus R-S joins + batch self-joins — the q134/q80
    * incremental discipline), so the closure runs on a batch-sized
    * graph; the corpus is touched by one equi-join per endpoint column
    * (the id → family remap) and a family-grain metadata join.
    *
    * Contract: batch ids and corpus ids are disjoint (shared id space,
    * new ids strictly after old — a family id must never collide with a
    * batch id); `corpusFamilies` covers EVERY corpus doc (singletons
    * included, as [[dupFamilies]] emits them).
    *
    * Output: one row per batch doc — (id, family, family_size, signals,
    * is_canonical, n_absorbed) where family_size counts corpus AND
    * batch members, signals ORs batch-incident edge bits with absorbed
    * families' bitmasks, and n_absorbed counts standing families merged
    * into this doc's family (0 for a pure-batch family).
    */
  def assignToFamilies(
      batch: DataFrame,
      idCol: String,
      corpusFamilies: DataFrame,
      signals: Seq[Signal]): DataFrame =
    assignToFamiliesWithUpdates(batch, idCol, corpusFamilies, signals)._1

  /** [[assignToFamilies]] plus the STORE-UPDATE relation a family store
    * needs to stay consistent: one row per standing family pulled into
    * the closure — (old_family, new_family, family_size, signals) with
    * the merged family's final size and bitmask. Families untouched by
    * any batch-incident edge do not appear (their rows stand). Every
    * absorbed family's component contains at least one batch vertex
    * (edges are batch-incident by contract), so the stats join is
    * total.
    */
  def assignToFamiliesWithUpdates(
      batch: DataFrame,
      idCol: String,
      corpusFamilies: DataFrame,
      signals: Seq[Signal]): (DataFrame, DataFrame) = {
    require(signals.nonEmpty, "need at least one signal")
    // The prior is consumed SIX times (a remap join per endpoint per
    // signal) plus the family metadata, all underneath a second
    // min-label closure loop. An in-query prior (its own closure +
    // three pair joins) embedded that many times is an analyzer-killer
    // — plan canonicalization blew the driver heap at sf0.001 and
    // surfaced attribute-ambiguity at sf10m before this cut. EAGER
    // localCheckpoint truncates the lineage to an RDD leaf (the q147 /
    // connectedComponents lesson): the prior's plan is analyzed once,
    // and everything downstream sees a three-column leaf. In
    // deployment the prior is a store read and the checkpoint is a
    // cheap id-grain copy; storage is reclaimed by the ContextCleaner
    // when the query's references drop.
    val fams = corpusFamilies
      .select(col("id"), col("family"), col("family_size"), col("signals"))
      .localCheckpoint()
    val remapA = fams
      .select(col("id").as("__mida"), col("family").as("__mfama"))
    val remapB = fams
      .select(col("id").as("__midb"), col("family").as("__mfamb"))
    // Collapse corpus endpoints to their family supernode, THEN
    // canonicalize orientation and fold signal bits per distinct pair.
    // Self-loops after the collapse (an edge between two members of one
    // standing family) are no-ops and drop out. Eager localCheckpoint,
    // not persist: the closure loop and two rollups all re-reference
    // this relation, and its plan (signal producers + remap joins)
    // must not be re-analyzed under every propagation round.
    val edges = signals.map { s =>
        s.pairs
          .join(remapA, col(s.aCol) === col("__mida"), "left")
          .join(remapB, col(s.bCol) === col("__midb"), "left")
          .select(coalesce(col("__mfama"), col(s.aCol)).as("__u"),
            coalesce(col("__mfamb"), col(s.bCol)).as("__v"),
            lit(s.bit).as("__sig"))
      }.reduce(_ unionByName _)
        .select(least(col("__u"), col("__v")).as("id_a"),
          greatest(col("__u"), col("__v")).as("id_b"), col("__sig"))
        .where(col("id_a") =!= col("id_b") &&
          col("id_a").isNotNull && col("id_b").isNotNull)
        .groupBy(col("id_a"), col("id_b"))
        .agg(bit_or(col("__sig")).as("signals"))
        .localCheckpoint()

    val comps = graft.core.Caches.persistTracked(
      Components.connectedComponents(edges, "id_a", "id_b"))
    val assigned = graft.core.Caches.persistTracked(
      batch.select(col(idCol).as("id"))
        .join(comps, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("component"), col("id")).as("family")))
    val batchCounts = assigned.groupBy(col("family"))
      .agg(count(lit(1)).as("__batch_n"))
    // Standing families pulled into the closure: every supernode vertex
    // present in the component map, with its size/signals metadata.
    val famMeta = fams
      .select(col("family"), col("family_size"), col("signals")).distinct()
    val absorbed = comps
      .join(famMeta, comps("id") === famMeta("family"))
      .groupBy(comps("component").as("family"))
      .agg(sum(col("family_size")).as("__corpus_n"),
        bit_or(famMeta("signals")).as("__corpus_sig"),
        count(lit(1)).as("n_absorbed"))
    val edgeSig = edges
      .join(comps.select(col("id").as("id_a"), col("component").as("family")),
        Seq("id_a"))
      .groupBy(col("family"))
      .agg(bit_or(col("signals")).as("__edge_sig"))
    // Family-grain final stats (batchCounts covers every assigned
    // family, so the inner join below is total on the batch side).
    val famStats = graft.core.Caches.persistTracked(batchCounts
      .join(absorbed, Seq("family"), "left")
      .join(edgeSig, Seq("family"), "left")
      .select(col("family"),
        (col("__batch_n") + coalesce(col("__corpus_n"), lit(0L)))
          .as("family_size"),
        (coalesce(col("__edge_sig"), lit(0))
          .bitwiseOR(coalesce(col("__corpus_sig"), lit(0)))).as("signals"),
        coalesce(col("n_absorbed"), lit(0L)).as("n_absorbed")))
    val out = assigned
      .join(famStats, Seq("family"))
      .select(col("id"), col("family"), col("family_size"), col("signals"),
        (col("id") === col("family")).as("is_canonical"), col("n_absorbed"))
    val updates = comps
      .join(famMeta, comps("id") === famMeta("family"))
      .select(famMeta("family").as("old_family"),
        comps("component").as("new_family"))
      .join(famStats.select(col("family").as("new_family"),
        col("family_size"), col("signals")), Seq("new_family"))
      .select(col("old_family"), col("new_family"),
        col("family_size"), col("signals"))
    (out, updates)
  }

  /** The standard three-signal ensemble (exact content = bit 1, lexical
    * Jaccard = bit 2, embedding cosine within label blocks = bit 4) —
    * the q149 construction, shared verbatim by the `dup_families` SQL
    * table function. Documents and embeddings share one id space.
    */
  def standardDupFamilies(
      docs: DataFrame, textCol: String, idCol: String,
      embeddings: DataFrame, embCol: String, vecIdCol: String,
      labelCol: String,
      jaccardThreshold: Double, cosineThreshold: Double,
      shingleN: Int = 3): DataFrame =
    dupFamilies(docs, idCol, Seq(
      Signal(exactContentEdges(docs, textCol, idCol), "id_a", "id_b", 1),
      Signal(Dedup.jaccardJoinExact(docs, textCol, idCol,
        jaccardThreshold, shingleN), "id_a", "id_b", 2),
      Signal(Dedup.embeddingNearDuplicates(embeddings, embCol, vecIdCol,
        labelCol, cosineThreshold), "id_a", "id_b", 4)))
}
