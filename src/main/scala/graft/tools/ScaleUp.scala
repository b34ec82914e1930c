package graft.tools

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver test data: replicates the
  * fact tables `factor` times with key-space shifts that keep every
  * join relationship intact (replica r of a lineitem row points at
  * replica r of its order/part/supplier), while the fixed-cardinality
  * dimensions (region, nation) stay as-is — the same shape real TPC-H
  * scaling has. Used to produce a larger bench input (e.g. sf0.1 x10 ~
  * sf1) for scaling-curve measurements; correctness gates stay on the
  * driver-generated inputs.
  *
  * Usage: ScaleUp <srcDir> <destDir> <factor> [mutate]
  *
  * With the optional `mutate` flag, replicas of documents/embeddings
  * are DETERMINISTICALLY perturbed so the dedup/ANN family is measured
  * on organic-shaped data instead of byte-identical copies (identical
  * copies make every same-text/same-vector group `factor` deep, so
  * candidate-pair counts grow ~factor^2 — a shape no real corpus has):
  *
  *  - documents.text: every word in replica r > 0 gets a per-replica
  *    suffix. The map is INJECTIVE per replica, so within-replica
  *    shingle-set Jaccard is preserved exactly (the original near-dup
  *    structure replicates), while cross-replica Jaccard drops to 0 —
  *    pair counts scale linearly, the organic shape. n_chars is
  *    recomputed to stay consistent.
  *  - embeddings.embedding: replica r > 0 is multiplied by a
  *    hash-derived per-replica sign mask. Sign flips preserve norms
  *    and every INTRA-replica cosine exactly (s_d^2 = 1), while
  *    cross-replica cosines decorrelate to ~0 — cluster geometry
  *    replicates, near-dup pairs scale linearly.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (src, dst, factorS, mutate) = args match {
      case Array(a, b, c) => (a, b, c, false)
      case Array(a, b, c, "mutate") => (a, b, c, true)
      case _ => sys.error("usage: ScaleUp <srcDir> <destDir> <factor> [mutate]")
    }
    val factor = factorS.toInt
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    /** Per-replica shift for a key space = max(PK in the OWNING table)
      * + 1 — a foreign key must shift by the referenced dimension's key
      * range, not its own observed max (a dimension row with no fact
      * reference would otherwise desynchronize the replica offsets and
      * dangle every cross-replica FK).
      */
    def keySpace(table: DataFrame, pkCol: String): Long =
      table.agg(max(col(pkCol))).head.getAs[Number](0).longValue() + 1L

    /** Replicate `df` `factor` times; each (column -> shift) moves the
      * column into its replica's disjoint key range, so join
      * relationships stay intact and per-key group sizes stay constant
      * (10x users, not 10x-deep users).
      */
    def replicate(df: DataFrame, shifts: Seq[(String, Long)]): DataFrame = {
      val rep = df.withColumn("__r", explode(sequence(lit(0L), lit(factor - 1L))))
      shifts.foldLeft(rep) { case (d, (c, m)) =>
        d.withColumn(c, col(c) + col("__r") * m)
      }
    }

    def write(df: DataFrame, name: String): Unit = {
      // Multi-file output: the single-file source collapses the
      // replicated table into ONE partition -> ONE part file with ONE
      // row group, which no byte-range split can parallelize — every
      // downstream scan (and scan-side explode) would run on one core,
      // misrepresenting the many-files layout any real corpus has.
      df.drop("__r").repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // Fixed-cardinality dimensions: copy through unchanged.
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    // Key spaces come from the table that OWNS each key.
    val custSpace = keySpace(Tables.customer(spark, src), "c_custkey")
    val suppSpace = keySpace(Tables.supplier(spark, src), "s_suppkey")
    val partSpace = keySpace(Tables.part(spark, src), "p_partkey")
    val orderSpace = keySpace(Tables.orders(spark, src), "o_orderkey")
    val events = Tables.events(spark, src)
    val eventSpace = keySpace(events, "event_id")
    val userSpace = keySpace(events, "user_id")

    write(replicate(Tables.customer(spark, src), Seq("c_custkey" -> custSpace)), "customer")
    write(replicate(Tables.supplier(spark, src), Seq("s_suppkey" -> suppSpace)), "supplier")
    // part: in mutate mode, decorate names per replica with a DOUBLED
    // base-26 replica code (" c1c1c2c2"). Within a replica every name
    // gets the same suffix, so the replica's internal edit-distance
    // structure replicates; across replicas, two distinct doubled codes
    // always differ in >= 2 positions, and equal-length lev=1 is
    // exactly Hamming=1 — so no cross-replica pair can sit at edit
    // distance <= 1 (replica 0 keeps the original, shorter names). An
    // organic 10x catalog has ~10x typo clusters, not 10x-deeper ones;
    // byte-identical replicas would grow matching pairs ~factor^2.
    val partRep = replicate(Tables.part(spark, src), Seq("p_partkey" -> partSpace))
    val partOut =
      if (!mutate) partRep
      else partRep.withColumn("p_name",
        when(col("__r") === 0, col("p_name"))
          .otherwise(concat(col("p_name"), lit(" "),
            expr("repeat(char(97 + CAST(__r / 26 AS INT)), 2)"),
            expr("repeat(char(97 + CAST(__r % 26 AS INT)), 2)"))))
    write(partOut, "part")
    write(replicate(Tables.orders(spark, src),
      Seq("o_orderkey" -> orderSpace, "o_custkey" -> custSpace)), "orders")
    write(replicate(Tables.lineitem(spark, src),
      Seq("l_orderkey" -> orderSpace, "l_partkey" -> partSpace,
        "l_suppkey" -> suppSpace)), "lineitem")
    // events via Tables.events: the nanos ts is normalized to a real
    // timestamp column, so the scaled copy reads without the legacy flag.
    write(replicate(events, Seq("event_id" -> eventSpace, "user_id" -> userSpace)), "events")
    // documents: new videos per replica (constant transcript length).
    val docsRep = replicate(Tables.documents(spark, src),
      Seq("doc_id" -> keySpace(Tables.documents(spark, src), "doc_id")))
      .withColumn("source",
        when(col("__r") === 0, col("source"))
          .otherwise(concat(col("source"), lit("_r"), col("__r"))))
    val docsOut =
      if (!mutate) docsRep
      else docsRep
        .withColumn("text",
          when(col("__r") === 0, col("text"))
            .otherwise(array_join(
              transform(split(col("text"), "\\s+"),
                w => concat(w, lit("~"), col("__r"))), " ")))
        .withColumn("n_chars", length(col("text")))
    write(docsOut, "documents")
    // In mutate mode the label (cluster id) space is shifted per
    // replica too: an organic 10x corpus has ~10x clusters of the same
    // size, not 10x-deeper clusters (unshifted labels make every
    // label-blocked operator quadratically deeper, the exact pathology
    // mutate mode exists to remove).
    val embSrc = Tables.embeddings(spark, src)
    val embRep = replicate(embSrc,
      Seq("vec_id" -> keySpace(embSrc, "vec_id")) ++
        (if (mutate) Seq("label" -> keySpace(embSrc, "label")) else Nil))
    val embOut =
      if (!mutate) embRep
      else embRep.withColumn("embedding",
        when(col("__r") === 0, col("embedding"))
          .otherwise(zip_with(
            col("embedding"),
            transform(sequence(lit(0), size(col("embedding")) - 1),
              i => when(pmod(xxhash64(col("__r"), i), lit(2)) === 0, lit(1.0f))
                .otherwise(lit(-1.0f))),
            (x, s) => x * s)))
        .withColumn("label", col("label").cast("int")) // keep the source schema
    write(embOut, "embeddings")

    spark.stop()
  }
}
