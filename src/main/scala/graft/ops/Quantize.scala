package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage/bandwidth lever for a
  * corpus-scale vector store: a float32 embedding column shrinks 4x
  * (plus one scale per vector), which at 100 TB is the difference
  * between a scan-bound and a network-bound ANN pipeline. Symmetric
  * per-vector absmax scheme (the common faiss/SQ8-style baseline):
  * scale = 127 / max|x|, q_i = round(x_i * scale) clamped to [-127,
  * 127], reconstruction x̂_i = q_i / scale.
  *
  * All arithmetic is double-precision and deterministic (floats widen
  * to double before any multiply; `round` is half-away-from-zero in
  * both Spark and DuckDB), so an oracle reproduces every quantized
  * value bit-for-bit — no tolerance bands needed on the codes
  * themselves. Map-only: no shuffle anywhere.
  */
object Quantize {

  private def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Per-vector symmetric scale: 127 / absmax (null for all-zero or
    * empty vectors — nothing to quantize).
    */
  def int8Scale(vec: Column): Column = {
    val absmax = aggregate(asDouble(vec), lit(0.0d),
      (acc, x) => greatest(acc, abs(x)))
    when(absmax > 0.0d, lit(127.0d) / absmax)
  }

  /** Quantized codes: array<int> in [-127, 127] (int over tinyint so
    * the oracle compare is type-stable; a store sink would cast to
    * byte). All-zero vectors quantize to all-zero codes.
    */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(asDouble(vec), x =>
      when(scale.isNull, lit(0))
        .otherwise(greatest(lit(-127), least(lit(127),
          round(x * scale).cast("int")))))

  /** Reconstruction from codes (x̂ = q / scale); zero vector when the
    * scale is null.
    */
  def int8Reconstruct(codes: Column, scale: Column): Column =
    transform(codes, q =>
      when(scale.isNull, lit(0.0d)).otherwise(q.cast("double") / scale))
}
