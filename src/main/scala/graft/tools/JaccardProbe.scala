package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-volume probe for the exact prefix-filter Jaccard join:
  * `JaccardProbe <sfDir> [threshold]` prints, for hash order vs
  * frequency order (with and without the positional filter), the
  * token-join output volume, surviving candidate pairs, and wall
  * time — the measurements behind the `freqOrdered` default.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val t = if (args.length > 1) args(1).toDouble else 0.8
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    val eps = 1e-9

    def sets(freq: Boolean): DataFrame = {
      val raw = docs.select(col("doc_id").as("id"),
        graft.ops.Dedup.shingleHashes(col("text"), 3).as("sh"))
        .where(size(col("sh")) > 0)
      if (!freq) raw.select(col("id"), array_sort(col("sh")).as("sh"))
      else {
        val heavy = raw.select(explode(col("sh")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .where(col("df") > 1).orderBy(desc("df"), col("tok")).limit(1 << 16)
          .select("tok").collect().map(_.getLong(0))
        val byTok = heavy.zipWithIndex.sortBy(_._1)
        raw.select(col("id"), org.apache.spark.sql.graftbridge.Bridge.column(
          graft.functions.FreqOrderExpr(
            org.apache.spark.sql.graftbridge.Bridge.expression(col("sh")),
            byTok.map(_._1), byTok.map(_._2), heavy)).as("sh"))
      }
    }

    for (freq <- Seq(false, true); positional <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val s = sets(freq)
      val prefLen =
        (size(col("sh")) - ceil(lit(t) * size(col("sh")) - lit(eps)) + 1).cast("int")
      val tokens = s.select(col("id"), size(col("sh")).as("sz"),
        posexplode(slice(col("sh"), lit(1), prefLen)).as(Seq("pos", "tok")))
      val a = tokens.select(col("tok"), col("id").as("id_a"), col("sz").as("sz_a"),
        col("pos").as("pos_a"))
      val b = tokens.select(col("tok"), col("id").as("id_b"), col("sz").as("sz_b"),
        col("pos").as("pos_b"))
      var j = a.join(b, Seq("tok"))
        .where(col("id_a") < col("id_b"))
        .where(least(col("sz_a"), col("sz_b")) >=
          lit(t) * greatest(col("sz_a"), col("sz_b")) - lit(eps))
      if (positional)
        j = j.where(least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b")) >=
          lit(t / (1.0 + t)) * (col("sz_a") + col("sz_b")) - lit(eps))
      val agg = j.agg(count(lit(1)).as("join_rows"),
        count_distinct(col("id_a"), col("id_b")).as("cand_pairs")).collect()(0)
      println(f"[probe] freq=$freq pos=$positional join_rows=${agg.getLong(0)}%,d " +
        f"cand_pairs=${agg.getLong(1)}%,d wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
