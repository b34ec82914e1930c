package graft.tools

import org.apache.spark.sql.functions._

/** Peel-depth probe for [[graft.ops.KCore]] on the co-purchase graph:
  * kept/removed split, round count, and certificate verdict per k.
  * Probe evidence (why q147 hosts the dup-pair graph + a planted
  * scaffold instead): the TPC-H co-purchase graph is near-uniform —
  * small k keeps everything, k near the degree band cascades one or
  * two vertices per round for dozens of rounds (the pathological
  * shape the driver finisher now absorbs), and no k yields a stable
  * kept/removed split across SFs.
  *
  * Usage: KCoreProbe [sfdir] [k...]
  */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val ks = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(2, 3, 4, 6)
    val spark = graft.core.Sessions.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.core.Tables.lineitem(spark, dir)
    val pairs = graft.ops.Affinity.supportPairs(li, "l_orderkey", "l_partkey", 2)
      .select(col("item_a"), col("item_b"))
    for (k <- ks) {
      // The two calls each run a full peel (kCoreCertified does not
      // expose membership) — timed separately so neither timing
      // overstates the operator's single-run cost.
      val t0 = System.nanoTime()
      val r = graft.ops.KCore.kCoreCertified(pairs, "item_a", "item_b", k)
        .agg(count(lit(1)).as("n"),
          count(when(col("certified"), 1)).as("ok")).head()
      val tCert = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val m = graft.ops.KCore.kCore(pairs, "item_a", "item_b", k)
      val kept = m.where(col("in_kcore")).count()
      val rounds = m.agg(max(col("peel_round"))).head()
      val tCore = (System.nanoTime() - t1) / 1e9
      println(f"k=$k kept=$kept removed=${r.getLong(0) - kept} " +
        f"rounds=${if (rounds.isNullAt(0)) 0 else rounds.getInt(0)} " +
        f"certified=${r.getLong(1)}/${r.getLong(0)} " +
        f"core=$tCore%.1f s certified=$tCert%.1f s")
      graft.core.Caches.releaseAll(); graft.core.Caches.releaseShared()
    }
    spark.stop()
  }
}
