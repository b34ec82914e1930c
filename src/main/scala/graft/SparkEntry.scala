package graft

import graft.core.Tables._
import graft.functions.{TextFunctions, TimeFunctions}
import graft.functions.VectorFunctions._
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Driver contract: the declared operator inventory (SURVEY.md §2), one
  * query per operator, each with a DuckDB-equivalent oracle SQL.
  *
  * Determinism rules used throughout (so driver hash-compare is exact):
  *  - money/measure sums go through `decimal` so the sum is exact and
  *    order-independent, then cast back to double;
  *  - every query ends in an ORDER BY on a unique key;
  *  - column names are identical between Spark and oracle SQL.
  */
object SparkEntry {

  /** Exact, order-independent sum of a double column: round each value to
    * 4dp, sum as decimal, emit double.
    */
  private def dsum(c: Column): Column =
    sum(round(c, 4).cast("decimal(20,4)")).cast("double")

  private def davg(c: Column): Column =
    (sum(round(c, 4).cast("decimal(20,4)")) / count(c)).cast("double")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pricing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregations (A1-A6) --------------------------------------
    "q01_agg_pricing" -> ((s, d) => {
      // TPC-H Q1 shape: the reference's A-family aggregate surface.
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q07_string_agg" -> ((s, d) => {
      // A1 GROUP_CONCAT with canonical sorted order.
      val n = nation(s, d); val r = region(s, d)
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_regionkey"), col("r_name"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
        .orderBy(col("r_regionkey"))
    }),
    "q08_distinct" -> ((s, d) =>
      // A2/O4: sorted distinct list.
      customer(s, d).select(col("c_mktsegment")).where(col("c_mktsegment").isNotNull)
        .distinct().orderBy(col("c_mktsegment"))),
    "q09_explode_having" -> ((s, d) => {
      // A3/G2: join-string then split/explode/trim/group/countDistinct/having.
      val sup = supplier(s, d); val nat = nation(s, d)
      val joined = sup.join(nat, sup("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_nationkey"))
        .agg(concat_ws(",", collect_list(col("s_name"))).as("names"))
      joined
        .select(col("n_nationkey"), explode(split(col("names"), ",")).as("sname"))
        .withColumn("sname", trim(col("sname")))
        .where(col("sname") =!= "")
        .groupBy(col("sname"))
        .agg(countDistinct(col("n_nationkey")).as("n_nations"))
        .where(col("n_nations") >= 1)
        .orderBy(col("sname"))
    }),

    // ---- projections / filters (P1-P10) ----------------------------
    "q02_filter_range" -> ((s, d) =>
      // P1/P2/P4: projection + numeric and timestamp-range predicates;
      // pushed to the parquet scan.
      lineitem(s, d)
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
               col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    "q37_filter_compiler" -> ((s, d) => {
      // P3/P5/P7/P8: structured FilterSpec -> Column compilation.
      import graft.query.FilterSpec._
      val spec = And(Seq(
        In("o_orderpriority", Seq("1-URGENT", "2-HIGH")),
        Or(Seq(
          IContains("o_orderstatus", "f"),
          Gte("o_totalprice", 200000.0))),
        Gt("o_orderdate", java.sql.Timestamp.valueOf("1994-01-01 00:00:00"))))
      orders(s, d).where(graft.query.FilterSpec.compile(spec))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- joins (J1-J7) ---------------------------------------------
    "q03_join_revenue" -> ((s, d) => {
      // J1 star join (dims broadcast) + grouped revenue.
      val o = orders(s, d); val c = customer(s, d); val n = nation(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),
    "q04_left_join_counts" -> ((s, d) => {
      // J2 left outer: customers with zero orders kept.
      val c = customer(s, d); val o = orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),
    "q05_semi_join" -> ((s, d) => {
      // J6-style semi join: customers having >= 1 urgent order.
      val c = customer(s, d)
      val urgent = orders(s, d).where(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "q06_anti_join" -> ((s, d) => {
      // J4 set-difference via anti join: customers with no orders.
      val c = customer(s, d); val o = orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    }),
    "q40_composite_anti" -> ((s, d) => {
      // J5 composite-key anti-join (incremental-resume shape): line items
      // whose (orderkey, linenumber) has no 1995+ shipment sibling line.
      val li = lineitem(s, d)
      val existing = li.where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey").as("e_ok"), col("l_suppkey").as("e_sk"))
      li.join(existing,
          li("l_orderkey") === existing("e_ok") && li("l_suppkey") === existing("e_sk"),
          "left_anti")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_orderkey"))
    }),

    // ---- sorts / top-k / windows (O1-O5) ---------------------------
    "q11_topk_orders" -> ((s, d) =>
      // O2-lite: global top-k -> TakeOrderedAndProject, no full sort.
      orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),
    "q10_window_topk" -> ((s, d) => {
      // O2 keep-best-per-key via row_number (NOT dropDuplicates).
      val c = customer(s, d); val o = orders(s, d)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),
    "q41_window_running" -> ((s, d) => {
      // Window frame surface: per-customer running order total.
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .withColumn("running_total",
          sum(col("o_totalprice").cast("decimal(20,2)")).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    "q42_lag_lead" -> ((s, d) => {
      // lag/lead surface: gap in days between consecutive orders per customer.
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("gap_days",
          datediff(col("o_orderdate").cast("date"), col("prev_date").cast("date")))
        .select(col("o_custkey"), col("o_orderkey"), col("gap_days"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- set ops (§2.6) --------------------------------------------
    "q12_setops" -> ((s, d) => {
      val c = customer(s, d); val o = orders(s, d)
      val buildersKeys = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val bigBal = c.where(col("c_acctbal") > 5000).select(col("c_custkey"))
      val noOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"))
      buildersKeys.intersect(bigBal).except(noOrders).orderBy(col("c_custkey"))
    }),
    "q13_rollup" -> ((s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(20,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // ---- scalar functions (F1-F20) ---------------------------------
    "q14_month_partition" -> ((s, d) =>
      // F6 year/month partition derivation over order dates.
      orders(s, d)
        .withColumn("epoch", unix_timestamp(col("o_orderdate")))
        .select(TimeFunctions.partitionYear(col("epoch")).as("year"),
          TimeFunctions.partitionMonth(col("epoch")).as("month"))
        .groupBy(col("year"), col("month"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("year"), col("month"))),
    "q15_duration_format" -> ((s, d) =>
      // F5 h:mm:ss render (value treated as seconds).
      events(s, d)
        .select(col("event_id"), TimeFunctions.hms(col("value")).as("hms"))
        .orderBy(col("event_id"))),
    "q17_url_build" -> ((s, d) =>
      // F7: timestamp buffer + watch URL assembly.
      events(s, d)
        .withColumn("t", (floor(col("value")) + 10).cast("long"))
        .select(col("event_id"),
          concat(lit("https://www.youtube.com/watch?v=u"), col("user_id"),
            lit("&t="), col("t"), lit("s")).as("url"))
        .orderBy(col("event_id"))),
    "q18_epoch_convert" -> ((s, d) =>
      // F1/F2: timestamp -> epoch seconds (floor semantics).
      events(s, d)
        .select(col("event_id"), unix_timestamp(col("ts")).as("epoch"))
        .orderBy(col("event_id"))),
    "q19_json_default" -> ((s, d) =>
      // F19 + JSON access: extract props.k with default 0.
      events(s, d)
        .select(col("event_id"),
          coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(0L)).as("k"))
        .orderBy(col("event_id"))),
    "q20_chunk_explode" -> ((s, d) =>
      // S6/F18: duration -> per-chunk rows (explode(sequence)).
      events(s, d)
        .withColumn("n_chunks",
          TimeFunctions.chunkCount(col("value") * 100, 7200))
        .select(col("event_id"),
          explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
        .withColumn("chunk_start", col("chunk_idx") * 7200)
        .orderBy(col("event_id"), col("chunk_idx"))),
    "q16_clean_text" -> ((s, d) =>
      // F8/F13 cleaning chain over documents.
      documents(s, d)
        .select(col("doc_id"),
          TextFunctions.cleanTextChunk(
            concat(lit("  >> "), col("text"), lit(" [Music] ​"))).as("cleaned"))
        .orderBy(col("doc_id"))),

    // ---- streaming-shaped windows over events (§2.9) ---------------
    "q21_tumbling_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))),
    "q22_sliding_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("n"))
        .orderBy(col("window_start"))),

    // ---- dedup / text-analysis extensions (§2.11) ------------------
    "q24_dedup_exact" -> ((s, d) =>
      Dedup.exact(documents(s, d), "text", "doc_id")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),
    "q31_token_count" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars_computed"))
        .orderBy(col("doc_id"))),
    "q32_lang_stats" -> ((s, d) =>
      documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_chars")) / count(lit(1))).cast("double").as("avg_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))),
    "q33_quality_score" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
          TextAnalysis.meanWordLength(col("text")).as("mean_word_len"))
        .withColumn("punct_ratio", round(col("punct_ratio"), 4))
        .withColumn("mean_word_len", round(col("mean_word_len"), 4))
        .orderBy(col("doc_id"))),
    "q34_stopword_ratio" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          round(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"))
        .orderBy(col("doc_id"))),

    // ---- vector similarity (O5 + extension) ------------------------
    "q28_cosine_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      val qvec = emb.where(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      graft.query.Retriever.topK(emb, "embedding", "vec_id", qvec.toArray, 100)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
    }),
    "q29_cosine_topk_per_query" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
      graft.query.Retriever.neighbors(emb, queries, 5)
        .select(col("q_id"), col("vec_id"), round(col("score"), 4).as("score"), col("rank"))
        .orderBy(col("q_id"), col("rank"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(round(l_quantity,4) AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(round(l_extendedprice,4) AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount),4) AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(round(l_quantity,4) AS DECIMAL(20,4))) / count(l_quantity) AS DOUBLE) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q07_string_agg" ->
      """SELECT r_regionkey, r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_regionkey, r_name ORDER BY r_regionkey""",
    "q08_distinct" ->
      """SELECT DISTINCT c_mktsegment FROM customer
         WHERE c_mktsegment IS NOT NULL ORDER BY c_mktsegment""",
    "q09_explode_having" ->
      """WITH joined AS (
           SELECT n_nationkey, string_agg(s_name, ',') AS names
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           GROUP BY n_nationkey),
         exploded AS (
           SELECT n_nationkey, trim(u.sname) AS sname
           FROM joined, LATERAL unnest(string_split(names, ',')) AS u(sname))
         SELECT sname, count(DISTINCT n_nationkey) AS n_nations
         FROM exploded WHERE sname <> ''
         GROUP BY sname HAVING count(DISTINCT n_nationkey) >= 1
         ORDER BY sname""",
    "q02_filter_range" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_extendedprice*(1.0-l_discount), 4) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
           AND l_quantity < 24
         ORDER BY l_orderkey, l_linenumber""",
    "q37_filter_compiler" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
           AND (lower(o_orderstatus) LIKE '%f%' OR o_totalprice >= 200000.0)
           AND o_orderdate > TIMESTAMP '1994-01-01'
         ORDER BY o_orderkey""",
    "q03_join_revenue" ->
      """SELECT n_name,
         CAST(sum(CAST(round(o_totalprice,4) AS DECIMAL(20,4))) AS DOUBLE) AS revenue,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q04_left_join_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q06_anti_join" ->
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q40_composite_anti" ->
      """SELECT l_orderkey, count(*) AS n FROM lineitem li
         WHERE NOT EXISTS (
           SELECT 1 FROM lineitem e
           WHERE e.l_shipdate >= TIMESTAMP '1996-01-01'
             AND e.l_orderkey = li.l_orderkey AND e.l_suppkey = li.l_suppkey)
         GROUP BY l_orderkey ORDER BY l_orderkey""",
    "q11_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q10_window_topk" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
           SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders JOIN customer ON o_custkey = c_custkey) t
         WHERE rn <= 3 ORDER BY c_mktsegment, rn""",
    "q41_window_running" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q42_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
         datediff('day',
           CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS DATE),
           CAST(o_orderdate AS DATE)) AS gap_days
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q12_setops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
         EXCEPT
         SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
         count(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q14_month_partition" ->
      """SELECT CASE WHEN epoch(o_orderdate) = 0 THEN 'unknown'
                ELSE CAST(year(o_orderdate) AS VARCHAR) END AS year,
         CASE WHEN epoch(o_orderdate) = 0 THEN 'unknown'
                ELSE lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0') END AS month,
         count(*) AS n
         FROM orders GROUP BY 1, 2 ORDER BY year, month""",
    "q15_duration_format" ->
      """SELECT event_id,
         CASE WHEN CAST(floor(value) AS BIGINT) // 3600 > 0
           THEN printf('%d:%02d:%02d', CAST(floor(value) AS BIGINT) // 3600,
             (CAST(floor(value) AS BIGINT) % 3600) // 60,
             CAST(floor(value) AS BIGINT) % 60)
           ELSE printf('%d:%02d', (CAST(floor(value) AS BIGINT) % 3600) // 60,
             CAST(floor(value) AS BIGINT) % 60)
         END AS hms
         FROM events ORDER BY event_id""",
    "q17_url_build" ->
      """SELECT event_id,
         'https://www.youtube.com/watch?v=u' || CAST(user_id AS VARCHAR) ||
           '&t=' || CAST(CAST(floor(value) + 10 AS BIGINT) AS VARCHAR) || 's' AS url
         FROM events ORDER BY event_id""",
    "q18_epoch_convert" ->
      """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch
         FROM events ORDER BY event_id""",
    "q19_json_default" ->
      """SELECT event_id,
         coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k
         FROM events ORDER BY event_id""",
    "q20_chunk_explode" ->
      """SELECT event_id, u.chunk_idx, u.chunk_idx * 7200 AS chunk_start
         FROM events, LATERAL unnest(generate_series(0,
           CAST(ceil(value * 100 / 7200.0) AS BIGINT) - 1)) AS u(chunk_idx)
         ORDER BY event_id, chunk_idx""",
    "q16_clean_text" ->
      """SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace('  >> ' || text || ' [Music] ' || chr(8203),
                   '\[\s*__\s*\]', '****', 'g'),
                 chr(8203), '', 'g'),
               '>>', '', 'g'),
             '\[[^\]]*\]', '', 'g'),
           '\s+', ' ', 'g')) AS cleaned
         FROM documents ORDER BY doc_id""",
    "q21_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q22_sliding_window" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) - k.k * INTERVAL '10 minutes' AS window_start,
         count(*) AS n
         FROM events, LATERAL unnest([0,1,2]) AS k(k)
         GROUP BY 1 ORDER BY window_start""",
    "q24_dedup_exact" ->
      """SELECT doc_id FROM (
           SELECT doc_id, row_number() OVER (
             PARTITION BY sha256(text) ORDER BY doc_id) AS rn
           FROM documents) t
         WHERE rn = 1 ORDER BY doc_id""",
    "q31_token_count" ->
      """SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         length(text) AS n_chars_computed
         FROM documents ORDER BY doc_id""",
    "q32_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(n_chars) / count(*) AS DOUBLE) AS avg_chars,
         count(DISTINCT source) AS n_sources
         FROM documents GROUP BY lang ORDER BY lang""",
    "q33_quality_score" ->
      """SELECT doc_id,
         round(CASE WHEN length(text) = 0 THEN 0.0
           ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END, 4) AS punct_ratio,
         round(CASE WHEN length(trim(text)) = 0 THEN 0.0
           ELSE CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
                / len(regexp_split_to_array(trim(text), '\s+')) END, 4) AS mean_word_len
         FROM documents ORDER BY doc_id""",
    "q34_stopword_ratio" ->
      """SELECT doc_id,
         round(CASE WHEN length(trim(text)) = 0 THEN 0.0
           ELSE CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> list_contains(['the','and','of','to','a','in','is','it','that','for'], t))) AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '\s+')) END, 4) AS stopword_ratio
         FROM documents ORDER BY doc_id""",
    "q28_cosine_topk" ->
      """SELECT vec_id, round(list_cosine_similarity(
           CAST(embedding AS DOUBLE[]),
           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS score
         FROM embeddings
         ORDER BY score DESC, vec_id LIMIT 100""",
    "q29_cosine_topk_per_query" ->
      """SELECT q_id, vec_id, round(score, 4) AS score, rank FROM (
           SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
               CAST(q.embedding AS DOUBLE[])) AS score,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                 CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id) AS rank
           FROM embeddings e, embeddings q WHERE q.vec_id < 10) t
         WHERE rank <= 5 ORDER BY q_id, rank""",
  )
}
