package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (§2.11 extension — the
  * dimensionality-reduction step ahead of LSH bucketing, clustering,
  * or index build when the embedding width, not the corpus, is the
  * cost driver; Achlioptas 2003 shows a ±1 projection matrix
  * preserves pairwise distances in expectation like a Gaussian one).
  *
  * The projection matrix is never materialized: entry sign(j, i) is
  * the parity of the first md5 nibble of "salt || j : i" — a pure
  * function both engines evaluate identically, which makes the whole
  * operator MAP-ONLY (no broadcast matrix, no (vec, dim)-grain
  * explode/shuffle; the alternative — posexplode + matrix join —
  * costs a width-times-rows shuffle for no accuracy gain).
  *
  * Determinism: input components are snapped to the 1e-6 grid
  * (`rint(v * 1e6)` — float→double widening is exact) and every
  * accumulation is int64 addition of ±micro values, so output is
  * bit-identical on any engine and any evaluation order. Output is
  * long micro-units; divide by 1e6 when a double is wanted.
  *
  * Shape note: the nested higher-order functions are interpreted, not
  * codegen'd — ~outDims × inDims md5 calls per row. If projection
  * ever sits in a hot loop, the upgrade is a native codegen'd
  * Expression (the [[Quantize]] precedent); the plan shape would not
  * change.
  *
  * Output: one row per (id, j) with `out_micro` — the j-th projected
  * component on the micro grid, j in [0, outDims).
  */
object RandomProjection {

  private def sign(salt: String, j: Column, i: Column): Column =
    (conv(substring(md5(
      concat(lit(salt), j.cast("string"), lit(":"), i.cast("string"))),
      1, 1), 16, 10).cast("long") % 2) * 2 - 1

  def jlProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      outDims: Int,
      salt: String): DataFrame = {
    require(outDims >= 1, s"outDims must be >= 1, got $outDims")
    val v = col(vecCol)
    df.where(v.isNotNull)
      .select(col(idCol), v)
      .withColumn("j", explode(sequence(lit(0), lit(outDims - 1))))
      .select(col(idCol), col("j").cast("long").as("j"),
        aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, i) => struct(x.as("x"), i.as("i"))),
          lit(0L),
          (acc, e) => acc +
            sign(salt, col("j"), e("i")) *
              rint(e("x") * lit(1000000.0)).cast("long"))
          .as("out_micro"))
  }
}
