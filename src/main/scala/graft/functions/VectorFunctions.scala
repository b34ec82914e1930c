package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY.md O5 and
  * the similarity-search extension). v0 uses Catalyst higher-order
  * functions (zip_with/aggregate) — fully codegen'd builtins, no UDF.
  * All math is done in double for deterministic, oracle-matchable
  * results regardless of partial-aggregation order (each row's score is
  * a pure per-row fold, so order never varies).
  */
object VectorFunctions {

  private def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product of two float vectors, in double. */
  def vecDot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. Native
    * Catalyst expression (one tight loop per row, codegen'd) — the HOF
    * form below is kept as the reference implementation for tests.
    */
  def vecCosine(a: Column, b: Column): Column =
    VecCosineOps.vecCosineNative(a, b)

  /** HOF reference implementation of cosine (identical semantics). */
  def vecCosineHof(a: Column, b: Column): Column = {
    val denom = vecNorm(a) * vecNorm(b)
    when(denom === 0.0, lit(0.0)).otherwise(vecDot(a, b) / denom)
  }

  /** L2-normalize a vector (reference normalizes embeddings at encode
    * time, build_vector_store.py:26-28); zero vector stays zero.
    */
  def vecL2Normalize(a: Column): Column = {
    val n = vecNorm(a)
    when(n === 0.0, asDouble(a)).otherwise(transform(asDouble(a), x => x / n))
  }
}
