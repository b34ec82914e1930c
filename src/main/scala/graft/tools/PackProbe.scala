package graft.tools

import org.apache.spark.sql.functions._

/** Cost-anatomy probe for the BPE packing paths (q154 native tokenize,
  * q165 dictionary-join tokenize): phases each query into tokenize,
  * reassemble and pack so the structural gap between the two spellings
  * is visible apart from host noise (this host family bursts — take
  * the MIN across reps, never a single run).
  * Usage: PackProbe <sfDir> [reps]
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    val merges = graft.ops.Bpe.train(docs, "text", 20)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (rep <- 1 to reps) {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[pack] rep$rep $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      // q154 native path, phased.
      t("q154_tokenize_noop")(noop(docs.select(col("doc_id"),
        graft.ops.Bpe.tokenize(col("text"), merges).as("toks"))))
      val toks154 = t("q154_toks_checkpoint")(
        docs.select(col("doc_id"),
            concat(graft.ops.Bpe.tokenize(col("text"), merges),
              array(lit("<eod>"))).as("toks"))
          .localCheckpoint())
      t("q154_pack_from_ckpt")(noop(graft.ops.SequencePack.packTokens(
        toks154, col("toks"), "doc_id", 64)))
      t("q154_full")(noop(graft.ops.SequencePack.packTokens(docs,
        concat(graft.ops.Bpe.tokenize(col("text"), merges),
          array(lit("<eod>"))), "doc_id", 64)))
      // q165 dictionary path, phased (wordsAndDict re-spelled inline).
      val words = docs.select(col("doc_id").as("__id"),
          posexplode(filter(
            split(lower(trim(coalesce(col("text"), lit("")))), "\\s+"),
            tk => tk =!= lit(""))))
        .select(col("__id"), col("pos").as("__p"), col("col").as("__w"))
      t("q165_words_noop")(noop(words))
      val dict = words.select(col("__w")).distinct()
        .select(col("__w"), graft.ops.Bpe.tokenize(col("__w"), merges).as("__t"))
      t("q165_dict_noop")(noop(dict))
      val toked = graft.ops.Bpe.tokenizeByDict(docs, "text", "doc_id", merges)
      t("q165_reassemble_noop")(noop(toked))
      val toked2 = t("q165_reassemble_ckpt")(toked.localCheckpoint())
      t("q165_pack_from_ckpt")(noop(graft.ops.SequencePack.packTokens(
        toked2, concat(col("tokens"), array(lit("<eod>"))), "doc_id", 64)))
      t("q165_full")(noop(graft.ops.SequencePack.packTokens(
        graft.ops.Bpe.tokenizeByDict(docs, "text", "doc_id", merges),
        concat(col("tokens"), array(lit("<eod>"))), "doc_id", 64)))
      graft.core.Caches.releaseAll()
      graft.core.Caches.releaseShared()
    }
    spark.stop()
  }
}
