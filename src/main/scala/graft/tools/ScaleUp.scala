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
  * Usage: ScaleUp <srcDir> <destDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    /** Replicate `df` `factor` times; each column in `shiftCols` is
      * offset per replica by (max+1) so replicas occupy disjoint key
      * ranges and per-key group sizes stay constant (10x users, not
      * 10x-deep users).
      */
    def replicate(df: DataFrame, shiftCols: Seq[String]): DataFrame = {
      val shifts = shiftCols.map { c =>
        c -> (df.agg(max(col(c))).head.getAs[Number](0).longValue() + 1L)
      }
      val rep = df.withColumn("__r", explode(sequence(lit(0L), lit(factor - 1L))))
      shifts.foldLeft(rep) { case (d, (c, m)) =>
        d.withColumn(c, col(c) + col("__r") * m)
      }
    }

    def write(df: DataFrame, name: String): Unit = {
      df.drop("__r").write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // Fixed-cardinality dimensions: copy through unchanged.
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(replicate(Tables.customer(spark, src), Seq("c_custkey")), "customer")
    write(replicate(Tables.supplier(spark, src), Seq("s_suppkey")), "supplier")
    write(replicate(Tables.part(spark, src), Seq("p_partkey")), "part")
    write(replicate(Tables.orders(spark, src), Seq("o_orderkey", "o_custkey")), "orders")
    write(replicate(Tables.lineitem(spark, src),
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    // events via Tables.events: the nanos ts is normalized to a real
    // timestamp column, so the scaled copy reads without the legacy flag.
    write(replicate(Tables.events(spark, src), Seq("event_id", "user_id")), "events")
    // documents: new videos per replica (constant transcript length).
    write(replicate(Tables.documents(spark, src), Seq("doc_id"))
      .withColumn("source",
        when(col("__r") === 0, col("source"))
          .otherwise(concat(col("source"), lit("_r"), col("__r")))), "documents")
    write(replicate(Tables.embeddings(spark, src), Seq("vec_id")), "embeddings")

    spark.stop()
  }
}
