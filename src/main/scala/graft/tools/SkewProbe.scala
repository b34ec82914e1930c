package graft.tools

import org.apache.spark.sql.functions._

/** Skewed-basket posture probe for
  * [[graft.ops.Affinity.supportPairs]]: the TPC-H-shaped inputs the
  * suite measures have uniform baskets (1-7 items), so the self-join's
  * basket-key shuffle is naturally balanced. A real 100 TB corpus is
  * power-law — this probe synthesizes that shape and measures whether
  * the plan survives it:
  *
  *  - UNIFORM: nBaskets baskets of 1..7 items (the suite's shape).
  *  - POWERLAW: the same plus a heavy tail (sizes ~ s^-2 up to
  *    `maxHeavy`) and one `megaSize` mega-basket — one join KEY owning
  *    megaSize² pair rows.
  *
  * Reported per run: wall seconds, basket-size stats, pair volume, and
  * whether AQE's skew-join split engaged (`skew=true` in the final
  * plan). The probe drives the posture documented in Affinity's
  * Scaladoc: per-key pair volume is quadratic in basket size, so the
  * guard at scale is (1) AQE skew-split for moderate tails, and (2)
  * the market-basket cap — degenerate baskets (a crawler session
  * touching 100k items) are dropped or truncated upstream, because
  * megaSize² pairs from ONE basket is a data-quality pathology, not a
  * co-occurrence signal.
  *
  * Usage: SkewProbe [nBaskets=300000] [maxHeavy=2000] [megaSize=20000]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val nBaskets = if (args.length > 0) args(0).toLong else 300000L
    val maxHeavy = if (args.length > 1) args(1).toInt else 2000
    val megaSize = if (args.length > 2) args(2).toInt else 20000
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Uniform floor: basket b has 1 + (b mod 7) items from a 200k item
    // space (hash-scattered so pairs rarely repeat — the q114 profile).
    val uniform = spark.range(nBaskets)
      .select(col("id").as("b"),
        explode(sequence(lit(0L), pmod(col("id"), lit(7L)))).as("i"))
      .select(col("b"), pmod(xxhash64(col("b"), col("i")), lit(200000L)).as("i"))
    // Heavy tail: ~1/s^2 baskets of size s for s in [100, maxHeavy].
    val tailSizes = Iterator.iterate(100)(s => math.max(s + 1, (s * 1.3).toInt))
      .takeWhile(_ <= maxHeavy).toSeq
    val tail = tailSizes.zipWithIndex.map { case (s, k) =>
      (nBaskets + k.toLong, s)
    }.toDF("b", "sz")
      .select(col("b"), explode(sequence(lit(0), col("sz") - 1)).as("i"))
      .select(col("b"), pmod(xxhash64(col("b"), col("i")), lit(200000L)).as("i"))
    val mega = Seq((nBaskets + 1000L, megaSize)).toDF("b", "sz")
      .select(col("b"), explode(sequence(lit(0), col("sz") - 1)).as("i"))
      .select(col("b"), pmod(xxhash64(col("b"), col("i")), lit(200000L)).as("i"))

    def run(label: String, df: org.apache.spark.sql.DataFrame,
        cap: Option[Int] = None): Unit = {
      graft.core.Caches.releaseShared()
      graft.core.Caches.releaseAll()
      val stats = df.groupBy(col("b")).count()
        .agg(count(lit(1)), max(col("count")), sum(col("count") * col("count")))
        .head()
      val t0 = System.nanoTime()
      val pairs = graft.ops.Affinity.supportPairs(df, "b", "i", minSupport = 2,
        maxBasketSize = cap)
      val n = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val plan = pairs.queryExecution.executedPlan.toString
      val skewSplit = plan.contains("skew=true")
      println(f"[skewprobe] $label baskets=${stats.getLong(0)} " +
        f"max_basket=${stats.getLong(1)} sum_sz2=${stats.getLong(2)} " +
        f"pairs_ge2=$n wall=${secs}%.1f s aqe_skew_split=$skewSplit")
      graft.core.Caches.releaseShared()
      graft.core.Caches.releaseAll()
    }

    run("uniform", uniform)
    run("powerlaw", uniform.unionByName(tail))
    run("powerlaw+mega", uniform.unionByName(tail).unionByName(mega))
    // The market-basket cap drops only the mega-basket: the pair set
    // loses exactly that basket's contribution and the wall returns to
    // the powerlaw floor.
    run("powerlaw+mega capped", uniform.unionByName(tail).unionByName(mega),
      cap = Some(maxHeavy))
    spark.stop()
  }
}
