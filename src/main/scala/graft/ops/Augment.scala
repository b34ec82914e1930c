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

  /** Deterministic BERT-style MLM masking (Devlin et al. 2019, §3.1):
    * each token position draws independently — `maskPct`% of positions
    * are selected, and a selected position becomes `[MASK]` with
    * probability 8/10, keeps its token with 1/10, or is replaced by a
    * deterministically-drawn token from the SAME document with 1/10
    * (BERT's 80/10/10 split). All three draws are md5 functions of
    * (salt, doc id, position) — the [[spanCorrupt]] reproducibility
    * contract — so the corruption is engine-replayable, append-stable,
    * and shuffle-order-independent; per-epoch remasking folds the epoch
    * into the salt.
    *
    * Closed-form per token (array transform over the position range) —
    * map-only, zero shuffle, the embarrassingly-parallel shape masking
    * must keep at corpus scale.
    *
    * Output: (idCol, masked_text, target_text, n_masked) where
    * target_text lists the ORIGINAL tokens at masked positions in
    * position order (the prediction targets) and n_masked counts them.
    */
  def mlmMask(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maskPct: Int = 15,
      salt: String = "mlm1"): DataFrame = {
    require(maskPct >= 1 && maskPct <= 100,
      s"need 1 <= maskPct <= 100, got $maskPct")
    val toks = filter(split(lower(trim(coalesce(col(textCol), lit("")))),
      "\\s+"), t => t =!= lit(""))
    // Same 4-hex-char md5 integer draw as spanCorrupt, one per (kind,
    // doc, position): kind "" selects, "r" picks the 80/10/10 branch,
    // "p" picks the in-document replacement token.
    def draw(kind: String, i: Column): Column =
      conv(substring(md5(concat(lit(s"$salt$kind:"),
        col(idCol).cast("string"), lit(":"), i.cast("string"))), 1, 4),
        16, 10).cast("int")

    df.select(col(idCol), toks.as("__t"))
      .withColumn("__n", size(col("__t")))
      // sequence(0, n-1) at n = 0 would step BACKWARD and emit [0, -1]
      // (the q20 phantom-row trap) — guard empty docs explicitly.
      .withColumn("__sel",
        when(col("__n") > 0,
          transform(sequence(lit(0), col("__n") - 1), i =>
            draw("", i) % 100 < maskPct))
          .otherwise(array().cast("array<boolean>")))
      .select(col(idCol),
        when(col("__n") > 0,
          array_join(transform(sequence(lit(0), col("__n") - 1), i => {
            val tok = element_at(col("__t"), i + 1)
            val branch = draw("r", i) % 10
            when(!element_at(col("__sel"), i + 1), tok)
              .otherwise(when(branch < 8, lit("[MASK]"))
                .otherwise(when(branch === 8, tok)
                  .otherwise(element_at(col("__t"),
                    (draw("p", i) % col("__n")) + 1))))
          }), " "))
          .otherwise(lit("")).as("masked_text"),
        when(col("__n") > 0,
          array_join(filter(transform(sequence(lit(0), col("__n") - 1), i =>
            when(element_at(col("__sel"), i + 1),
              element_at(col("__t"), i + 1)).otherwise(lit(""))),
            t => t =!= lit("")), " "))
          .otherwise(lit("")).as("target_text"),
        coalesce(aggregate(col("__sel"), lit(0L),
          (acc, s) => acc + when(s, 1L).otherwise(0L)), lit(0L))
          .as("n_masked"))
  }
}
