package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B variants of the connected-components inner loop, timed over the
  * real q149 edge set — the experiment bench behind any change to
  * [[graft.ops.Components.connectedComponents]]. Variants must produce
  * the identical (id, component) relation (asserted against current).
  */
object ClosureVariants {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, dir)
    val emb = graft.core.Tables.embeddings(spark, dir)
    val pairs = graft.ops.EnsembleDedup
      .exactContentEdges(docs, "text", "doc_id")
      .unionByName(graft.ops.Dedup.jaccardJoinExact(docs, "text", "doc_id", 0.8)
        .select(col("id_a"), col("id_b")))
      .unionByName(graft.ops.Dedup.embeddingNearDuplicates(
          emb, "embedding", "vec_id", "label", 0.4)
        .select(col("id_a"), col("id_b")))
      .persist()
    println(s"[pairs] n=${pairs.count()}")
    graft.core.Caches.releaseAll()

    val expected = graft.ops.Components
      .connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.core.Caches.releaseAll()

    def check(label: String, df: DataFrame): Unit = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      require(got == expected,
        s"$label diverged: ${got.size} vs ${expected.size} vertices, " +
          s"first diff=${(got.toSet -- expected.toSet).take(3)}")
    }

    // Variant A: convergence detected on the PLAIN propagation step
    // BEFORE any pointer jump (sound: a plain-step fixpoint means every
    // edge has equal labels on both ends, i.e. fully converged), jump
    // applied only to still-moving rounds past plainRounds.
    def variantA(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
      val edges = graft.core.Caches.persistTracked(
        pairs
          .select(explode(array(
            struct(col(aCol).as("src"), col(bCol).as("dst")),
            struct(col(bCol).as("src"), col(aCol).as("dst")))).as("__e"))
          .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
          .where(col("src") =!= col("dst"))
          .distinct())
      var labels = graft.core.Caches.persistTracked(
        edges.select(col("src").as("id")).distinct()
          .select(col("id"), col("id").as("component")))
      def labelSum(df: DataFrame): java.math.BigDecimal = {
        val v = df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
        if (v == null) java.math.BigDecimal.ZERO else v
      }
      var prevSum: java.math.BigDecimal = null
      var converged = false
      var iter = 0
      val plainRounds = 3
      while (!converged && iter < 10) {
        val propagated = graft.core.Caches.persistTracked(
          edges.join(labels, edges("src") === labels("id"))
            .select(edges("dst").as("id"), col("component"))
            .union(labels)
            .groupBy(col("id"))
            .agg(min(col("component")).as("component")))
        val s = labelSum(propagated)
        converged = prevSum != null && s.compareTo(prevSum) == 0
        prevSum = s
        labels =
          if (converged || iter < plainRounds) propagated
          else {
            val p = propagated.localCheckpoint()
            val lookup = p.select(col("id").as("__lid"), col("component").as("__lcomp"))
            val jumped = p.join(lookup, p("component") === col("__lid"), "left")
              .select(p("id"),
                least(p("component"), coalesce(col("__lcomp"), p("component")))
                  .as("component"))
              .localCheckpoint()
            prevSum = labelSum(jumped) // keep detection continuous post-jump
            jumped
          }
        iter += 1
      }
      labels
    }

    // Variant B: A + fused init (round 0 computed straight off the edge
    // relation: label(v) = min(v, min src over in-edges) — every vertex
    // appears as dst of the symmetric edge relation) + localCheckpoint
    // instead of persist each round so the per-round plan stays a leaf.
    def variantB(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
      val edges = pairs
        .select(explode(array(
          struct(col(aCol).as("src"), col(bCol).as("dst")),
          struct(col(bCol).as("src"), col(aCol).as("dst")))).as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      var labels = edges
        .groupBy(col("dst").as("id"))
        .agg(least(min(col("src")), col("dst")).as("component"))
        .localCheckpoint()
      def labelSum(df: DataFrame): java.math.BigDecimal = {
        val v = df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
        if (v == null) java.math.BigDecimal.ZERO else v
      }
      var prevSum: java.math.BigDecimal = labelSum(labels)
      var converged = false
      var iter = 1
      val plainRounds = 3
      while (!converged && iter < 10) {
        val propagated = edges.join(labels, edges("src") === labels("id"))
          .select(edges("dst").as("id"), col("component"))
          .union(labels)
          .groupBy(col("id"))
          .agg(min(col("component")).as("component"))
          .localCheckpoint()
        val s = labelSum(propagated)
        converged = prevSum != null && s.compareTo(prevSum) == 0
        prevSum = s
        labels =
          if (converged || iter < plainRounds) propagated
          else {
            val lookup = propagated.select(col("id").as("__lid"),
              col("component").as("__lcomp"))
            val jumped = propagated
              .join(lookup, propagated("component") === col("__lid"), "left")
              .select(propagated("id"),
                least(propagated("component"),
                  coalesce(col("__lcomp"), propagated("component")))
                  .as("component"))
              .localCheckpoint()
            prevSum = labelSum(jumped)
            jumped
          }
        iter += 1
      }
      labels
    }

    def timeVariant(name: String, f: (DataFrame, String, String) => DataFrame): Unit = {
      for (rep <- 1 to reps) {
        val t0 = System.nanoTime()
        val out = f(pairs, "id_a", "id_b")
        val n = out.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[$name] rep$rep $dt%.2f s (vertices=$n)")
        if (rep == 1) check(name, out)
        graft.core.Caches.releaseAll()
      }
    }

    timeVariant("current", (p, a, b) =>
      graft.ops.Components.connectedComponents(p, a, b))
    timeVariant("A-detect-before-jump", variantA)
    timeVariant("B-fused-checkpointed", variantB)
    timeVariant("current2", (p, a, b) =>
      graft.ops.Components.connectedComponents(p, a, b))
    spark.stop()
  }
}
