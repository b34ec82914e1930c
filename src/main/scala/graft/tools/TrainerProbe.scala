package graft.tools

import org.apache.spark.sql.functions._

/** Cost-anatomy probe for the LinearTrainer paths (q155/q164): phases
  * the minibatch trainer into COO build+count, weight init, and the
  * per-step gradient collects, so the per-step fixed cost is visible
  * apart from the corpus scan. Usage: TrainerProbe <sfDir> [reps]
  */
object TrainerProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    for (rep <- 1 to reps) {
      val docs = graft.core.Tables.documents(spark, dir)
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[trainer] rep$rep $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val label = when(length(col("text")) >= 250, lit(1L)).otherwise(lit(0L))
      val buckets = 64
      def bucketOf(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c), 1, 15), 16, 10).cast("long") % buckets
      def batchOf(id: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit("mb1"), lit(":"), id.cast("string"))),
          1, 15), 16, 10).cast("long") % 4
      val tok = graft.core.Caches.persistTracked(
        docs.select(col("doc_id").as("__id"), label.cast("long").as("__y0"),
            explode(filter(
              split(lower(trim(coalesce(col("text"), lit("")))), "\\s+"),
              tk => tk =!= lit(""))).as("__tok"))
          .select(col("__id"), col("__y0"), bucketOf(col("__tok")).as("__b"))
          .groupBy(col("__id"), col("__b"))
          .agg(count(lit(1)).as("__x"), max(col("__y0")).as("__y"))
          .withColumn("__mb", batchOf(col("__id"))))
      t("tok_materialize")(tok.count())
      t("doc_count")(docs.count())
      t("batchN")(docs.select(batchOf(col("doc_id")).as("__mb"))
        .groupBy(col("__mb")).agg(count(lit(1))).collect())
      var wRows = t("w_init")(tok.select(col("__b")).distinct()
        .select(col("__b"), lit(0L).as("__wt")).collect().toSeq)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__wt",
          org.apache.spark.sql.types.LongType, nullable = true)))
      for (e <- 1 to 2; b <- 0 until 4) {
        val w = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(wRows).asJava), schema)
        val btok = tok.where(col("__mb") === b)
        val grad = btok.join(broadcast(w), Seq("__b"))
          .groupBy(col("__id"))
          .agg(sum(col("__x") * col("__wt")).as("__z"), max(col("__y")).as("__yy"),
            collect_list(struct(col("__b"), col("__x"))).as("__f"))
          .select((least(greatest(((col("__z") - pmod(col("__z"), lit(4L))) / 4L)
            .cast("long") + lit(500000L), lit(0L)), lit(1000000L))
            - col("__yy") * lit(1000000L)).as("__r"),
            explode(col("__f")).as("__e"))
          .groupBy(col("__e.__b").as("__b"))
          .agg(sum(col("__r") * col("__e.__x")).as("__g"))
        wRows = t(s"step_e${e}_b$b")(
          w.join(grad, Seq("__b"), "left")
            .select(col("__b"), col("__wt"), col("__g"))
            .collect().toSeq.map(r =>
              org.apache.spark.sql.Row(r.getLong(0), r.getLong(1))))
      }
      graft.core.Caches.releaseAll()
    }
    spark.stop()
  }
}
