package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling and dataset splitting (§2.11
  * extensions — the subsampling / train-val-test machinery a
  * training-data pipeline needs at corpus scale).
  *
  * Membership is a pure function of (salt, key): `md5(salt || key)`'s
  * first 4 hex digits read as a uniform draw from [0, 65536). That
  * buys three properties `DataFrame.sample` cannot give at 100 TB:
  *
  *  - STABLE: re-runs, retries, and engine changes reproduce the same
  *    sample — md5 is engine-portable (the DuckDB oracle recomputes
  *    membership bit-for-bit), while `sample()` depends on partition
  *    layout and seed plumbing.
  *  - INCREMENTAL: growing the corpus never reshuffles existing
  *    membership — yesterday's training docs stay training docs, so
  *    downstream caches and eval contamination guarantees survive
  *    appends.
  *  - STRATUM-UNIFORM: the hash is independent of any grouping column,
  *    so every stratum is split in the same proportions without a
  *    per-stratum pass (no `sampleBy` fraction map to maintain).
  *
  * Plan shape: a scan-local predicate/projection — no shuffle, no
  * state, fully pushdown- and codegen-friendly. Thresholds are in
  * units of 1/65536 (~0.0015% resolution); comparisons are on the hex
  * PREFIX STRING (lowercase hex order == numeric order), so both
  * engines evaluate the identical expression.
  */
object Sampling {

  /** First 4 hex digits of md5(salt || key) — a uniform 16-bit draw as
    * a lowercase hex string.
    */
  def hashHex16(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 4)

  private def hex4(cut: Int): String = f"$cut%04x"

  /** Keep rows whose draw falls below `keep`/65536 (e.g. 6554 ~ 10%). */
  def hashSample(df: DataFrame, key: Column, keep: Int, salt: String): DataFrame = {
    require(keep >= 0 && keep <= 0x10000, s"keep must be in [0, 65536], got $keep")
    // keep = 65536 admits every draw; hex4(65536) would be the 5-char
    // "10000", which sorts BELOW "2..."-prefixed draws lexicographically.
    if (keep == 0x10000) df
    else df.filter(hashHex16(key, salt) < lit(hex4(keep)))
  }

  /** Split assignment from cumulative cut points in 1/65536 units:
    * `cuts = Seq("train" -> 52429, "val" -> 58982, "test" -> 65536)`
    * labels draws [0, 52429) train, [52429, 58982) val, the rest test.
    * The final cut must be 65536 so every row is labeled.
    */
  def assignSplit(key: Column, salt: String, cuts: Seq[(String, Int)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 0x10000,
      s"final cut must be 65536, got ${cuts.map(_._2)}")
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must be non-decreasing")
    val h = hashHex16(key, salt)
    cuts.init.foldRight(lit(cuts.last._1): Column) { case ((label, cut), acc) =>
      when(h < lit(hex4(cut)), lit(label)).otherwise(acc)
    }
  }
}
