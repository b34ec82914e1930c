package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** SQL registration of custom expressions + the as-of join operator. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions callable from spark.sql after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT iso_duration_seconds('PT1H2M3S') AS dur,
                vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
                simhash64(array(CAST(-1 AS LONG), CAST(-1 AS LONG))) AS sh,
                size(minhash_signature('a b c d', 2, 8)) AS sig_len""")
      .head()
    assert(r.getAs[Long]("dur") == 3723L)
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(r.getAs[Long]("sh") == -1L) // every bit voted by both hashes
    assert(r.getAs[Int]("sig_len") == 8)
  }

  test("asof join matches latest right ts at-or-before each left row") {
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val clicks = Seq((1L, 7L, ts(10)), (2L, 7L, ts(30)), (3L, 8L, ts(5)))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq((7L, ts(10)), (7L, ts(25)), (7L, ts(31)), (9L, ts(0)))
      .toDF("user_id", "ts")
    val out = AsOfJoin.asofMatchedTs(clicks, purchases, "user_id", "ts")
      .select("event_id", "matched_ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    assert(out(1L).contains(ts(10))) // inclusive <= at equal ts
    assert(out(2L).contains(ts(25))) // latest before, not the later one
    assert(out(3L).isEmpty)          // no purchase for user 8
  }
}
