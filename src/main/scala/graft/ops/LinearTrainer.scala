package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed TRAINING for the hashed-feature linear quality
  * classifier (§2.11 extensions): full-batch gradient descent on a
  * logistic-style objective over hashed bag-of-words features — the
  * trainer that makes the fastText-style score → funnel pipeline
  * ([[HashedClassifier]], [[QualityFilter]]) end-to-end (Joulin et al.
  * 2017, "Bag of Tricks for Efficient Text Classification").
  *
  * EXACT-ARITHMETIC quantization: weights, margins, and gradients are
  * 64-bit integers in micro-units (1e6 = probability 1), and the link
  * function is the HARD sigmoid σ̂(z) = clamp(z/4 + 1/2, 0, 1) — the
  * piecewise-linear logistic surrogate (Courbariaux et al. 2016 use the
  * same form for quantized training). Every update is therefore
  * integer-exact and bit-identical across engines: a DuckDB oracle
  * replays the full training schedule round for round, which no
  * float sigmoid can promise (libm exp and float summation order both
  * diverge across engines). Floor division is spelled
  * (x − pmod(x, d)) / d: the remainder is subtracted first, so the
  * quotient is exact under BOTH truncating and flooring integer
  * division — engine-portable by construction.
  *
  * Scale shape: the token→bucket relation is built ONCE (one corpus
  * scan + one (doc, bucket)-grain aggregation, the label fused on as a
  * rider column) and persisted; each epoch is (1) a broadcast join of
  * the bucket-count relation with the `buckets`-row weight table + a
  * doc-grain margin-and-residual aggregation (the fused label makes
  * the residual part of the same exchange), and (2) a doc-grain
  * gradient join + bucket-grain aggregation — both map-side
  * combinable, shuffles at doc grain only, gradient state exactly
  * `buckets` rows (the tree-aggregation equivalent, expressed
  * declaratively). Weight state between steps is CONFIG-BOUNDED
  * (`buckets` rows): within [[DriverStateMaxBuckets]] it rides the
  * driver as a LocalRelation (one bounded collect per step — the same
  * discipline as the minibatch doc counts), past the bound it stays a
  * `localCheckpoint`ed DataFrame; the per-step expression tree is
  * identical either way.
  *
  * Learning rate = 1/(lrFactor × n_docs) in micro-units — the integer
  * grid schedule. Deterministic by construction: full-batch (no
  * sampling, no example order), integer arithmetic (no FP drift).
  */
object LinearTrainer {

  /** Micro-unit scale: 1e6 = probability 1. */
  val Scale = 1000000L

  /** h60 bucket of a token: first 15 md5 hex digits as a 60-bit long,
    * mod `buckets` — the [[graft.functions.HashedLinearOps]] hash, in
    * its portable column spelling.
    */
  private def bucketOf(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % buckets

  /** Exact floor division (see object doc). */
  private def fdiv(x: Column, d: Column): Column =
    ((x - pmod(x, d)) / d).cast("long")

  /** Hard sigmoid in micro-units: clamp(z/4 + Scale/2, 0, Scale). */
  private def hardSigmoid(z: Column): Column =
    least(greatest(fdiv(z, lit(4L)) + lit(Scale / 2), lit(0L)), lit(Scale))

  /** Weight-state dispatch bound (round 14): the weight table is
    * `buckets` rows — bounded by CONFIG, never by data — so for every
    * realistic hashed-linear configuration it is DRIVER-BOUNDED state,
    * exactly like the minibatch doc counts. Holding it as a driver-side
    * LocalRelation between steps (instead of an eagerly
    * localCheckpointed DataFrame) removes the per-step fixed costs that
    * dominated q164: the broadcast-build job (a LocalRelation
    * broadcasts without a collect job), the checkpoint persist, and one
    * AQE replan per step — measured 9.5 s → per-step job count 3 → 1 at
    * identical values (every update is still computed BY SPARK
    * EXPRESSIONS; the driver only carries rows between steps, so the
    * integer arithmetic, null propagation, and floor-division spelling
    * are untouched). Configs past these bounds (weights or trajectory
    * too big to hold on the driver) keep the original
    * localCheckpoint-chained path.
    */
  private val DriverStateMaxBuckets = 1 << 16
  private val DriverStateMaxTrajectory = 1L << 22

  /** One-exchange gradient step for the driver-state path: the margin
    * aggregation CARRIES each doc's (bucket, count) feature list
    * through the doc-grain exchange (collect_list rider), so the
    * gradient explodes it back out of the same aggregate instead of
    * re-joining the COO relation at doc grain — per step: ONE exchange
    * of the (already bucket-joined) COO rows plus the map-side-combined
    * bucket-grain gradient exchange, versus the two-aggregation
    * spelling's extra COO re-exchange + sort-merge join (guide §2.4).
    * Values are IDENTICAL: every gradient term r·x is the same 64-bit
    * integer, integer sums are order-independent, and null residuals
    * (null labels) drop from `sum` exactly as before; TrainSpec pins
    * fused == two-aggregation row for row. The fallback DataFrame path
    * keeps the two-aggregation shape — past the driver-state bound a
    * doc's feature list is `buckets`-wide and the rider would dominate
    * the exchange.
    */
  private def fusedGrad(cooTok: DataFrame, w: DataFrame): DataFrame =
    cooTok.join(broadcast(w), Seq("__b"))
      .groupBy(col("__id"))
      .agg(sum(col("__x") * col("__wt")).as("__z"), max(col("__y")).as("__yy"),
        collect_list(struct(col("__b"), col("__x"))).as("__f"))
      .select((hardSigmoid(col("__z")) - col("__yy") * lit(Scale)).as("__r"),
        explode(col("__f")).as("__e"))
      .groupBy(col("__e.__b").as("__b"))
      .agg(sum(col("__r") * col("__e.__x")).as("__g"))

  private def localWeights(
      spark: org.apache.spark.sql.SparkSession,
      rows: Seq[org.apache.spark.sql.Row]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__b",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__wt",
        org.apache.spark.sql.types.LongType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }

  /** Train `epochs` full-batch rounds; returns the weight trajectory
    * (epoch, bucket, weight) — one row per epoch per feature bucket
    * that occurs in the corpus, epoch 1..epochs, all BIGINT. The
    * initial weights are zero; labelCol must be 0/1.
    */
  def train(
      df: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: Column,
      buckets: Int = 64,
      epochs: Int = 3,
      lrFactor: Long = 16L): DataFrame =
    trainImpl(df, textCol, idCol, labelCol, buckets, epochs, lrFactor,
      driverState = buckets <= DriverStateMaxBuckets &&
        epochs.toLong * buckets <= DriverStateMaxTrajectory)

  private[graft] def trainImpl(
      df: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: Column,
      buckets: Int,
      epochs: Int,
      lrFactor: Long,
      driverState: Boolean): DataFrame = {
    require(epochs >= 1 && buckets >= 1 && lrFactor >= 1,
      s"bad config: epochs=$epochs buckets=$buckets lrFactor=$lrFactor")
    // (doc, bucket, count, label): the feature matrix in COO form with
    // the LABEL fused on as a rider column (constant per doc), one
    // corpus scan, reused by every epoch. Fusing the label means each
    // epoch's residual computes inside the margin aggregation itself —
    // one shuffle — instead of a separate doc-grain z ⋈ label join per
    // epoch (guide §2.4: two operations keyed the same way share one
    // exchange). Docs with no tokens have no COO rows and contribute no
    // gradient either way, so the fused spelling is value-identical.
    // Persisted PARTITIONED BY DOC ID: every epoch's margin aggregation
    // requires doc-grain clustering, and a cached relation advertises
    // its partitioning — one compact repartition at build time replaces
    // an exchange of the full COO relation in EVERY epoch (guide §2.4:
    // establish the partitioning once, let each keyed consumer reuse
    // it).
    val tok = graft.core.Caches.persistTracked(
      df.select(col(idCol).as("__id"), labelCol.cast("long").as("__y0"),
          explode(filter(
            split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
            t => t =!= lit(""))).as("__tok"))
        .select(col("__id"), col("__y0"), bucketOf(col("__tok"), buckets).as("__b"))
        .groupBy(col("__id"), col("__b"))
        .agg(count(lit(1)).as("__x"), max(col("__y0")).as("__y"))
        .repartition(col("__id")))
    // Integer-grid learning rate 1/(lrFactor*n). parquetRowCount-style
    // metadata isn't available for an arbitrary frame, and one count
    // job up front is the documented price of a deterministic
    // denominator; max(1,_) keeps the empty corpus well-defined.
    val lrd = lit(math.max(1L, lrFactor * df.count()))

    if (driverState) {
      // Same per-epoch PLAN as the checkpointed path — margin agg,
      // gradient join, weight-update join, all Spark expressions — but
      // the `buckets`-row weight state rides the driver between steps
      // as a LocalRelation: one collect job per epoch, no broadcast
      // build job, no checkpoint. Values are computed by the identical
      // expression tree, so the trajectory is bit-equal (TrainSpec pins
      // driver-state == checkpoint-chained row for row).
      val spark = df.sparkSession
      var wRows: Seq[org.apache.spark.sql.Row] =
        tok.select(col("__b")).distinct()
          .select(col("__b"), lit(0L).as("__wt"))
          .collect().toSeq
      val snaps = Seq.newBuilder[org.apache.spark.sql.Row]
      for (e <- 1 to epochs) {
        val w = localWeights(spark, wRows)
        wRows = w.join(fusedGrad(tok, w), Seq("__b"))
          .select(col("__b"), (col("__wt") - fdiv(col("__g"), lrd)).as("__wt"))
          .collect().toSeq
        wRows.foreach(r => snaps += org.apache.spark.sql.Row(
          e.toLong, r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      }
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("epoch",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("weight",
          org.apache.spark.sql.types.LongType, nullable = true)))
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(snaps.result()).asJava),
        outSchema).orderBy(col("epoch"), col("bucket"))
    }

    var w = tok.select(col("__b")).distinct()
      .select(col("__b"), lit(0L).as("__wt"))
      .localCheckpoint()
    var out: DataFrame = null
    for (e <- 1 to epochs) {
      val resid = tok.join(broadcast(w), Seq("__b"))
        .groupBy(col("__id"))
        .agg(sum(col("__x") * col("__wt")).as("__z"), max(col("__y")).as("__yy"))
        .select(col("__id"),
          (hardSigmoid(col("__z")) - col("__yy") * lit(Scale)).as("__r"))
      val grad = tok.join(resid, Seq("__id"))
        .groupBy(col("__b"))
        .agg(sum(col("__r") * col("__x")).as("__g"))
      w = w.join(grad, Seq("__b"))
        .select(col("__b"), (col("__wt") - fdiv(col("__g"), lrd)).as("__wt"))
        .localCheckpoint()
      val epochW = w.select(lit(e.toLong).as("epoch"),
        col("__b").as("bucket"), col("__wt").as("weight"))
      out = if (out == null) epochW else out.unionByName(epochW)
    }
    out.orderBy(col("epoch"), col("bucket"))
  }

  /** Deterministic MINI-BATCH SGD variant of [[train]]: each epoch is
    * `numBatches` sequential gradient steps, batch membership = an md5
    * hash bucket of the document id (the q75 hash-order discipline —
    * no sampling, no example order, engine-replayable), arithmetic
    * identical to the full-batch path (integer micro-units, hard
    * sigmoid, pmod floor division). Learning rate per step =
    * 1/(lrFactor × batch doc count), so `numBatches = 1` reduces
    * EXACTLY to [[train]] (pinned in TrainSpec).
    *
    * Returns the step trajectory (epoch, batch, bucket, weight) — one
    * weight-table snapshot per gradient step, all BIGINT, so a DuckDB
    * oracle replays the full epochs × batches schedule bit for bit.
    *
    * Scale shape: same as [[train]] — the COO feature relation is
    * built once and persisted with the batch id as a rider column;
    * each step filters it to one hash bucket (a scan-side predicate,
    * no extra shuffle), joins the broadcast `buckets`-row weight
    * table, and aggregates at doc then bucket grain. Per-batch doc
    * counts are ONE bounded collect (`numBatches` rows, the argmax
    * discipline). The weight update is a LEFT join: buckets absent
    * from a batch keep their weights.
    */
  def trainMiniBatch(
      df: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: Column,
      buckets: Int = 64,
      epochs: Int = 3,
      numBatches: Int = 4,
      lrFactor: Long = 16L,
      salt: String = "mb1"): DataFrame =
    trainMiniBatchImpl(df, textCol, idCol, labelCol, buckets, epochs,
      numBatches, lrFactor, salt,
      driverState = buckets <= DriverStateMaxBuckets &&
        epochs.toLong * numBatches * buckets <= DriverStateMaxTrajectory)

  private[graft] def trainMiniBatchImpl(
      df: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: Column,
      buckets: Int,
      epochs: Int,
      numBatches: Int,
      lrFactor: Long,
      salt: String,
      driverState: Boolean): DataFrame = {
    require(epochs >= 1 && buckets >= 1 && numBatches >= 1 && lrFactor >= 1,
      s"bad config: epochs=$epochs buckets=$buckets " +
        s"numBatches=$numBatches lrFactor=$lrFactor")
    // Batch id: h60 of the salted id string, mod numBatches — the same
    // portable hash spelling as the feature buckets.
    def batchOf(id: Column): Column =
      conv(substring(md5(concat(lit(salt), lit(":"), id.cast("string"))),
        1, 15), 16, 10).cast("long") % numBatches
    // Label fused onto the COO relation as in [[train]] — each step's
    // residual computes inside its margin aggregation, no per-step
    // z ⋈ label join. The doc-grain label relation below survives only
    // for the per-batch doc counts (they count ALL docs, token-less
    // included — the lrd denominator).
    val tok = graft.core.Caches.persistTracked(
      df.select(col(idCol).as("__id"), labelCol.cast("long").as("__y0"),
          explode(filter(
            split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
            t => t =!= lit(""))).as("__tok"))
        .select(col("__id"), col("__y0"), bucketOf(col("__tok"), buckets).as("__b"))
        .groupBy(col("__id"), col("__b"))
        .agg(count(lit(1)).as("__x"), max(col("__y0")).as("__y"))
        .withColumn("__mb", batchOf(col("__id")))
        // Doc-grain partitioning established ONCE at build — each of
        // the epochs x numBatches step aggregations reuses it instead
        // of re-exchanging its batch slice (guide §2.4).
        .repartition(col("__id")))
    // numBatches rows — bounded by construction.
    val batchN = df.select(batchOf(col(idCol)).as("__mb"))
      .groupBy(col("__mb")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    if (driverState) {
      // Driver-bounded weight state (see [[DriverStateMaxBuckets]]):
      // identical per-step expression tree, one collect job per
      // gradient step, snapshots accumulate on the driver (steps x
      // occupied-buckets rows, guarded by the dispatch bound).
      val spark = df.sparkSession
      var wRows: Seq[org.apache.spark.sql.Row] =
        tok.select(col("__b")).distinct()
          .select(col("__b"), lit(0L).as("__wt"))
          .collect().toSeq
      val snaps = Seq.newBuilder[org.apache.spark.sql.Row]
      for (e <- 1 to epochs; b <- 0 until numBatches) {
        val lrd = lit(math.max(1L, lrFactor * batchN.getOrElse(b.toLong, 0L)))
        val btok = tok.where(col("__mb") === b)
        val w = localWeights(spark, wRows)
        wRows = w.join(fusedGrad(btok, w), Seq("__b"), "left")
          .select(col("__b"), (col("__wt") -
            fdiv(coalesce(col("__g"), lit(0L)), lrd)).as("__wt"))
          .collect().toSeq
        wRows.foreach(r => snaps += org.apache.spark.sql.Row(
          e.toLong, b.toLong, r.getLong(0),
          if (r.isNullAt(1)) null else r.getLong(1)))
      }
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("epoch",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("batch",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("weight",
          org.apache.spark.sql.types.LongType, nullable = true)))
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(snaps.result()).asJava),
        outSchema).orderBy(col("epoch"), col("batch"), col("bucket"))
    }

    var w = tok.select(col("__b")).distinct()
      .select(col("__b"), lit(0L).as("__wt"))
      .localCheckpoint()
    var out: DataFrame = null
    for (e <- 1 to epochs; b <- 0 until numBatches) {
      val lrd = lit(math.max(1L, lrFactor * batchN.getOrElse(b.toLong, 0L)))
      val btok = tok.where(col("__mb") === b)
      val resid = btok.join(broadcast(w), Seq("__b"))
        .groupBy(col("__id"))
        .agg(sum(col("__x") * col("__wt")).as("__z"), max(col("__y")).as("__yy"))
        .select(col("__id"),
          (hardSigmoid(col("__z")) - col("__yy") * lit(Scale)).as("__r"))
      val grad = btok.join(resid, Seq("__id"))
        .groupBy(col("__b"))
        .agg(sum(col("__r") * col("__x")).as("__g"))
      w = w.join(grad, Seq("__b"), "left")
        .select(col("__b"), (col("__wt") -
          fdiv(coalesce(col("__g"), lit(0L)), lrd)).as("__wt"))
        .localCheckpoint()
      val snap = w.select(lit(e.toLong).as("epoch"), lit(b.toLong).as("batch"),
        col("__b").as("bucket"), col("__wt").as("weight"))
      out = if (out == null) snap else out.unionByName(snap)
    }
    out.orderBy(col("epoch"), col("batch"), col("bucket"))
  }

  /** Score texts with a trained weight table (the FINAL epoch of
    * [[train]]'s output, or any (bucket, weight) relation): the
    * hard-sigmoid probability in micro-units, via a broadcast
    * dictionary join at token grain. Composes with
    * [[QualityFilter]]-style funnels: train → score → threshold.
    */
  def score(
      df: DataFrame,
      textCol: String,
      idCol: String,
      weights: DataFrame,
      buckets: Int = 64): DataFrame = {
    val tok = df.select(col(idCol).as("__id"),
        explode(filter(
          split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
          t => t =!= lit(""))).as("__tok"))
      .select(col("__id"), bucketOf(col("__tok"), buckets).as("bucket"))
    val z = tok.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("__id"))
      .agg(sum(coalesce(col("weight"), lit(0L))).as("__z"))
    df.select(col(idCol).as("__id"))
      .join(z, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        hardSigmoid(coalesce(col("__z"), lit(0L))).as("score_micro"))
  }
}
