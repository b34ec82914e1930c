package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STANDING MATERIALIZED TOKENIZATION — the corpus-version artifact a
  * production pipeline derives ONCE per (tokenizer, corpus) and every
  * downstream consumer reads (decontamination, fertility eval, packing,
  * mixing all need the same token ids; re-tokenizing 100 TB per
  * consumer is the dominant avoidable cost). Same catalog discipline as
  * the corpus index ([[Dedup.writeCorpusIndex]]) and the line-stats
  * store ([[Boilerplate]]): catalog entries are session-scoped, parquet
  * files are not; [[ensure]] is idempotent — it builds on first touch,
  * rebinds from files after a restart, and no-ops when the tables are
  * already live, so ANY consumer can run first (or alone) and the
  * train + tokenize cost is paid exactly once per (run, corpus).
  *
  * Tables under `tablePrefix` / `basePath` (byte-level BPE — the q178
  * production-tokenizer convention, [[Bpe.trainByteLevel]]):
  *  - `_merges` (merge_rank, pair_a, pair_b, pair_count) — the trained
  *    merge table, vocabulary-sized (collected by consumers that need
  *    the native tokenize expression for OUT-OF-STORE rows, e.g.
  *    planted eval probes);
  *  - `_vocab`  (token, token_id) — [[Bpe.vocabTableByteLevel]];
  *  - `_ids`    (doc_id, token_ids array<bigint>) — the corpus
  *    tokenization at document grain, doc-id order irrelevant.
  *
  * The store holds the DERIVED relation only; its content is pinned by
  * the consumers' oracles, which keep the DIRECT train + tokenize
  * spelling in DuckDB (q178/q180/q185 replay the whole derivation), so
  * a store bug cannot hide — the gate compares store-backed Spark
  * output against store-free SQL.
  */
object TokenStore {

  /** Build-or-rebind the standing tokenization of `docs` (textCol at
    * idCol grain) under `tablePrefix`/`basePath`. Idempotent per
    * session AND across restarts (files outlive the catalog), and
    * INCREMENTAL (the [[VectorIndex.ensureIvfPqIndex]] needPq
    * economics): a consumer that only needs the trained tokenizer
    * (vocab readers like q177) passes `needIds = false` and pays the
    * train alone; the first consumer that reads corpus ids layers the
    * `_ids` table on top — the corpus tokenize, the expensive half,
    * is charged only to queries that consume it, and still exactly
    * once per (run, corpus).
    */
  def ensure(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      numMerges: Int,
      tablePrefix: String,
      basePath: String,
      needIds: Boolean = true): Unit = {
    val spark = docs.sparkSession
    def path(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
        name: String) =
      if (basePath == null) w else w.option("path", s"$basePath/$name")
    // Tokenizer half (merges + vocab) — every consumer needs it.
    if (!spark.catalog.tableExists(s"${tablePrefix}_merges")) {
      if (filesExist(spark, s"$basePath/merges"))
        register(spark, tablePrefix, basePath)
      else {
        val m = Bpe.trainByteLevel(docs, textCol, numMerges)
        import spark.implicits._
        path(m.map(x => (x.rank.toLong, x.a, x.b, x.count))
          .toDF("merge_rank", "pair_a", "pair_b", "pair_count")
          .write.mode("overwrite").format("parquet"), "merges")
          .saveAsTable(s"${tablePrefix}_merges")
        path(Bpe.vocabTableByteLevel(spark, m)
          .write.mode("overwrite").format("parquet"), "vocab")
          .saveAsTable(s"${tablePrefix}_vocab")
      }
    }
    if (!needIds) return
    // Ids half: bind, or tokenize the corpus through the stored
    // tokenizer and layer the table on.
    if (spark.catalog.tableExists(s"${tablePrefix}_ids")) return
    if (filesExist(spark, s"$basePath/ids")) {
      register(spark, tablePrefix, basePath)
      return
    }
    val m = merges(spark, tablePrefix)
    val ids = Bpe.tokenizeToIdsByteLevel(docs, textCol, idCol, m,
      vocab(spark, tablePrefix))
    path(ids.select(col(idCol).cast("long").as("doc_id"),
        col("token_ids"))
      .write.mode("overwrite").format("parquet"), "ids")
      .saveAsTable(s"${tablePrefix}_ids")
  }

  /** The trained merge table as the driver-side Seq consumers feed the
    * native tokenize expression — vocabulary-sized by construction
    * (numMerges rows), the [[Bpe.vocabTable]] collect discipline.
    * Ranks order the merge fold; pair scores are not stored (byte-level
    * BPE selects by count, already in `pair_count`).
    */
  def merges(spark: SparkSession, tablePrefix: String): Seq[Bpe.Merge] =
    spark.table(s"${tablePrefix}_merges")
      .orderBy(col("merge_rank"))
      .collect()
      .map(r => Bpe.Merge(r.getLong(0).toInt, r.getString(1),
        r.getString(2), r.getLong(3)))
      .toSeq

  def vocab(spark: SparkSession, tablePrefix: String): DataFrame =
    spark.table(s"${tablePrefix}_vocab")

  /** (doc_id, token_ids) at document grain. */
  def ids(spark: SparkSession, tablePrefix: String): DataFrame =
    spark.table(s"${tablePrefix}_ids")

  /** Rebind an existing materialization into THIS session's catalog
    * (restart path — the [[VectorIndex.registerVectorIndex]]
    * discipline). Idempotent.
    */
  def register(
      spark: SparkSession, tablePrefix: String, basePath: String): Unit = {
    def ddl(name: String): String =
      spark.read.parquet(s"$basePath/$name").schema.toDDL
    // ids may legitimately be absent (a needIds=false materialization).
    for (name <- Seq("merges", "vocab", "ids"))
      if (!spark.catalog.tableExists(s"${tablePrefix}_$name") &&
          filesExist(spark, s"$basePath/$name"))
        spark.sql(s"CREATE TABLE ${tablePrefix}_$name (${ddl(name)}) " +
          s"USING PARQUET LOCATION '$basePath/$name'")
  }

  private def filesExist(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))
  }
}
