package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data AUGMENTATION (§2.11 extensions): deterministic T5-style
  * span corruption (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning", §3.1.4) — mask short token spans with indexed
  * sentinels and emit the (corrupted_text, target_text) pair a
  * denoising pretraining objective consumes.
  *
  * Determinism contract: span placement is a pure function of
  * md5(salt : doc id : block), so the corruption is reproducible across
  * engines (the DuckDB oracle recomputes it exactly), stable under
  * corpus appends, and shuffle-order-independent — the q75/q96 draw
  * discipline applied to augmentation. Randomized-per-epoch corruption
  * is the same operator with the epoch folded into the salt.
  *
  * Span placement is BLOCK-LOCAL: tokens partition into consecutive
  * `blockLen`-token blocks, each FULL block receives exactly one
  * `spanLen`-token span at offset md5-draw mod (blockLen-spanLen+1),
  * and the partial tail block is never corrupted. Block locality is
  * what makes the construction closed-form in BOTH engines (pure array
  * slices — no sequential scan to avoid span overlap) and embarrassingly
  * parallel at corpus scale: one map-side pass, no shuffle anywhere.
  * The corruption rate is spanLen/blockLen (15% at the 3/20 default,
  * T5's rate with mean span 3).
  *
  * Tokenization is the suite convention (lowercased, whitespace-split,
  * empties dropped) so every derived value is oracle-checkable.
  */
object Augment {

  /** Per-document span corruption: (idCol, corrupted_text, target_text,
    * n_spans). Sentinels are `<extra_id_B>` numbered by block; the
    * target lists each sentinel followed by the tokens it replaced, in
    * block order.
    */
  def spanCorrupt(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockLen: Int = 20,
      spanLen: Int = 3,
      salt: String = "corrupt1"): DataFrame = {
    require(blockLen >= 2 && spanLen >= 1 && spanLen < blockLen,
      s"need 1 <= spanLen < blockLen, got $spanLen / $blockLen")
    val nOffsets = blockLen - spanLen + 1
    val toks = filter(split(lower(trim(coalesce(col(textCol), lit("")))),
      "\\s+"), t => t =!= lit(""))
    // Exact integer draw shared with the oracle: first 4 hex chars of
    // the md5, parsed base-16 (DuckDB: CAST('0x'||substr(md5(..),1,4)
    // AS INT)), mod the offset count.
    def drawOffset(b: Column): Column =
      conv(substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"),
        lit(":"), b.cast("string"))), 1, 4), 16, 10).cast("int") % nOffsets

    df.select(col(idCol), toks.as("__t"))
      .withColumn("__n", size(col("__t")))
      .withColumn("__nfull", floor(col("__n") / lit(blockLen)).cast("int"))
      // One string per full block: tokens before the span, the indexed
      // sentinel, tokens after the span — pure 1-based slices.
      .withColumn("__blocks",
        when(col("__nfull") > 0,
          transform(sequence(lit(0), col("__nfull") - 1), b => {
            val s = drawOffset(b)
            val base = b * blockLen
            array_join(concat(
              slice(col("__t"), base + 1, s),
              array(concat(lit("<extra_id_"), b.cast("string"), lit(">"))),
              slice(col("__t"), base + s + spanLen + 1, lit(blockLen) - s - spanLen)
            ), " ")
          }))
          .otherwise(array().cast("array<string>")))
      .withColumn("__targets",
        when(col("__nfull") > 0,
          transform(sequence(lit(0), col("__nfull") - 1), b => {
            val s = drawOffset(b)
            concat(lit("<extra_id_"), b.cast("string"), lit("> "),
              array_join(slice(col("__t"), b * blockLen + s + 1, lit(spanLen)), " "))
          }))
          .otherwise(array().cast("array<string>")))
      .withColumn("__tail",
        array_join(slice(col("__t"), col("__nfull") * blockLen + 1,
          col("__n") - col("__nfull") * lit(blockLen)), " "))
      .select(col(idCol),
        array_join(filter(array(array_join(col("__blocks"), " "),
          col("__tail")), p => p =!= lit("")), " ").as("corrupted_text"),
        array_join(col("__targets"), " ").as("target_text"),
        col("__nfull").cast("long").as("n_spans"))
  }
}
