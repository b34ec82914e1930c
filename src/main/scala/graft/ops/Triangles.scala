package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting (§2.11 extension — the clustering
  * signal of a similarity/co-occurrence graph: dup-pair graphs with
  * many triangles collapse into tight clusters under the CC closure,
  * low-triangle graphs are chains that transitive dedup should treat
  * sceptically; also the standard graph-health metric for
  * co-purchase/citation graphs).
  *
  * Algorithm: DEGREE-ORDERED ORIENTATION (the MapReduce-era standard,
  * Suri & Vassilvitskii WWW'11): orient every undirected edge from its
  * lower-(degree, id) endpoint to the higher; every triangle then has
  * exactly one vertex with two outgoing edges, so counting wedges
  * (u→v, u→w) closed by an oriented edge v→w counts each triangle
  * ONCE. The orientation bounds per-vertex out-degree by O(√m), so
  * wedge volume is O(m^1.5) — the hub that would generate deg² wedges
  * under naive adjacency generates almost none, which is exactly the
  * skew discipline a power-law co-occurrence graph needs at scale.
  *
  * Scale shape: one degree aggregation, two broadcast-or-shuffle
  * equi-joins (degree attach), one self-join on the wedge pivot, one
  * equi-join against the oriented edge list, one global count. No
  * driver state, no per-vertex adjacency materialization.
  */
object Triangles {

  /** One row: (n_vertices, n_edges, n_triangles) of the UNDIRECTED
    * simple graph spanned by (aCol, bCol) pairs (self-loops dropped,
    * duplicate/reversed edges collapsed).
    */
  def triangleCount(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = graft.core.Caches.persistTracked(
      edges.select(least(col(aCol), col(bCol)).as("a"),
          greatest(col(aCol), col(bCol)).as("b"))
        .where(col("a") =!= col("b"))
        .distinct())
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    def before(da: Column, a: Column, db: Column, b: Column): Column =
      da < db || (da === db && a < b)
    val oriented = graft.core.Caches.persistTracked(
      e.join(deg.select(col("v").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
        .select(
          when(before(col("da"), col("a"), col("db"), col("b")), col("a"))
            .otherwise(col("b")).as("src"),
          when(before(col("da"), col("a"), col("db"), col("b")), col("b"))
            .otherwise(col("a")).as("dst"),
          when(before(col("da"), col("a"), col("db"), col("b")), col("db"))
            .otherwise(col("da")).as("dd")))
    // Wedges at the lowest-order vertex: order the two spokes by the
    // SAME (degree, id) key the orientation used, so the closing edge
    // is oriented v→w exactly when (dv,v) < (dw,w).
    val w1 = oriented.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
    val w2 = oriented.select(col("src"), col("dst").as("w"), col("dd").as("dw"))
    val wedges = w1.join(w2, "src")
      .where(before(col("dv"), col("v"), col("dw"), col("w")))
    val tris = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
    val nv = deg.agg(count(lit(1)).as("n_vertices"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    nv.crossJoin(ne).crossJoin(tris)
  }
}
