package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (§2.11 extensions): segment documents at
  * ROLLING-HASH boundaries instead of fixed strides, so segment
  * identity survives insertions and deletions — the LBFS breakpoint
  * construction (Muthitacharoen et al. 2001, "A Low-bandwidth Network
  * File System": cut where a sliding-window fingerprint hits a residue
  * class; rsync and every dedup store since use the same idea).
  *
  * Why it earns a slot next to [[SpanDedup]]: the stride segmentation
  * there (q95) is POSITION-addressed — prepend one token and every
  * window shifts, so no segment of the edited document matches the
  * original. CDC boundaries are CONTENT-addressed: a boundary exists
  * after token i iff the hash of the w-token window ENDING at i lands
  * in the cut class, which depends only on the window's tokens. An
  * insertion disturbs boundaries only while its edit is inside the
  * window; after w tokens the boundary set RESYNCHRONIZES and every
  * later segment is byte-identical to the original's. That makes
  * partial-copy detection robust to the prefix/infix edits real
  * corpus duplication actually has.
  *
  * Boundary rule (the declarative variant): cut after token i when
  * `md5_32(window(i)) % divisor == 0`, where `window(i)` is the
  * space-joined w tokens ending at i (truncated near the start) and
  * `md5_32` is the first 8 md5 hex digits as an integer — the
  * engine-portable draw the sampling family uses, so DuckDB
  * recomputes boundaries EXACTLY (full-value oracle, unlike the
  * xxhash64-keyed inventories). The final token always closes the
  * last segment. Segment lengths are geometric with mean `divisor`
  * tokens. Classic CDC also imposes min/max segment bounds; those
  * make each cut depend on the PREVIOUS cut (a sequential scan,
  * hostile to both declarative planning and the oracle), so this
  * operator deliberately ships the pure residue rule — the
  * unbounded-variance trade is documented, not hidden.
  *
  * Scale shape: boundary detection and segment assembly are ONE
  * array-expression projection per document (higher-order functions
  * over the token array — no token-grain explode, no shuffle until
  * the segment-grain output, which is the operator's irreducible
  * grain). The duplication inventory then shuffles skinny
  * (xxhash64, id) tuples with map-side combine, exactly the
  * [[SpanDedup]] anatomy. Nothing here is quadratic in anything.
  */
object ContentDefinedChunking {

  /** CDC segments of `textCol` as an array<string> column — pure
    * higher-order-function math, evaluated scan-side.
    *
    * Evaluation-cost note: a subexpression referenced inside a lambda
    * is re-evaluated PER ELEMENT (Spark does no CSE across
    * higher-order functions), so naively writing the token array into
    * the boundary lambda re-runs the whole tokenize for every
    * position — O(n²) string work per document (measured: 120 s for
    * the q145 suite row at sf0.1). The single-element
    * `transform(array(x), v => ...)` is a LET binding: `x` evaluates
    * once per row and `v` is a cheap bound value inside the lambdas.
    * Same trick binds the boundary-position array before the segment
    * assembly references it twice.
    */
  def cdcSegmentsOf(textCol: Column, w: Int, divisor: Int): Column = {
    require(w >= 1, s"window must be >= 1 token, got $w")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val out = transform(array(Lexical.tokens(textCol)), toks => {
      val n = size(toks)
      // 32-bit md5 draw of the w-token window ending at 1-based i.
      def draw(i: Column): Column = {
        val start = greatest(lit(1), i - lit(w - 1))
        conv(substring(
          md5(array_join(slice(toks, start, i - start + lit(1)), " ")),
          1, 8), 16, 10).cast("long")
      }
      // Boundary positions: residue-class cuts plus the forced final
      // cut. sequence(1, 0) would yield [1, 0] (the q20 lesson) —
      // guard n < 1.
      val bposE = filter(sequence(lit(1), n),
        i => (draw(i) % divisor === 0) || (i === n))
      val segs = element_at(transform(array(bposE), bpos =>
        transform(bpos, (b, j) => {
          val prev = when(j === 0, lit(0)).otherwise(element_at(bpos, j))
          array_join(slice(toks, prev + lit(1), b - prev), " ")
        })), 1)
      when(n < 1, array().cast("array<string>")).otherwise(segs)
    })
    element_at(out, 1)
  }

  /** Exploded segment relation: (id, seg_idx, seg_text), seg_idx
    * 0-based in document order. Token-empty documents emit no rows.
    */
  def cdcSegments(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      w: Int = 4,
      divisor: Int = 8): DataFrame =
    docs.select(col(idCol).as("id"),
      posexplode(cdcSegmentsOf(col(textCol), w, divisor))
        .as(Seq("seg_idx", "seg_text")))

  /** Per-document CDC duplication profile: (id, n_segs, dup_segs,
    * dup_frac, flagged) — a segment counts as duplicated when its
    * TEXT occurs in at least `minDocs` distinct documents (one doc is
    * one vote; within-doc repeats don't qualify a segment by
    * themselves, matching the C4/[[SpanDedup]] convention). Every
    * input document emits a row (n_segs = 0 for token-empty docs), so
    * the result is row-stable over the id domain.
    *
    * The inventory and probe shuffle xxhash64 keys, never segment
    * text; the standard 2^-64 collision trade the dedup family
    * documents applies.
    */
  def cdcDedupStats(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      w: Int = 4,
      divisor: Int = 8,
      minDocs: Int = 2,
      flagFrac: Double = 0.5): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // Segment relation feeds the inventory, the probe, and the per-doc
    // totals; persist-track so the scan + HOF projection run once.
    val seg = graft.core.Caches.persistTracked(
      cdcSegments(docs, textCol, idCol, w, divisor)
        .select(col("id"), xxhash64(col("seg_text")).as("__h")))
    val repeated = seg
      .groupBy(col("__h"))
      .agg(count_distinct(col("id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__h"))
    val perDoc = seg
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_segs"))
    val dupPerDoc = seg
      .join(repeated, "__h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("dup_segs"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .join(dupPerDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_segs"), lit(0L)).as("n_segs"),
        coalesce(col("dup_segs"), lit(0L)).as("dup_segs"))
      .withColumn("dup_frac",
        round(when(col("n_segs") === 0, lit(0.0))
          .otherwise(col("dup_segs").cast("double") / col("n_segs")), 4))
      .withColumn("flagged", col("dup_frac") > flagFrac)
  }
}
