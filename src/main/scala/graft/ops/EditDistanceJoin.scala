package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact string-similarity join under EDIT DISTANCE (§2.11 extension —
  * the record-linkage/fuzzy-matching primitive: catalog titles, URLs,
  * names with typos. Set-similarity (Jaccard) misses single-character
  * corruptions entirely — "iphone" vs "iphnoe" share almost no shingle
  * vocabulary — so a pipeline needs BOTH similarity families).
  *
  * Algorithm: PassJoin-style segment filtering (Li, Deng, Feng, WWW'11
  * family — public literature). Pigeonhole: split s into k+1 contiguous
  * segments; any t with ed(s, t) <= k must contain at least one
  * segment VERBATIM, at a position shifted by at most k. So:
  *   - index arm: each string explodes its k+1 segments, keyed
  *     (j, segment, len(s));
  *   - probe arm: each string explodes the substrings that could match
  *     a segment — for each source length in [len(t)-k, len(t)+k],
  *     each j, each position offset in [-k, k] — a CONSTANT
  *     (2k+1)²·(k+1) keys per row (27 at k=1);
  *   - equi-join on the key, distinct unordered pairs, exact
  *     `levenshtein` verification — complete by pigeonhole, sound by
  *     verify.
  *
  * The join runs at DISTINCT-STRING grain: byte-identical strings
  * collapse to one representative (min id) with a group count BEFORE
  * any similarity work — the same exact-dedup-first discipline the
  * shingle-Jaccard family applies. That is not an optimization detail
  * but the survival condition: duplicate-heavy catalogs (this corpus:
  * 2000 rows, 64 distinct names) make the ROW-grain d=0 result
  * quadratic in group depth (~31M pairs at 10x scale) while the
  * distinct-grain result stays vocabulary-sized. [[editDistanceJoin]]
  * re-expands through the groups when row grain is genuinely wanted.
  *
  * Strings short enough to have empty segments (len <= 2k) break the
  * pigeonhole; they and all their possible partners (len <= 3k) take a
  * brute-force arm over that length bucket — a vanishing population.
  *
  * Scale shape: both explodes are constant fan-out; the join is an
  * ordinary hash join on skinny (j, substring, length) keys whose
  * fan-out tracks true near-match volume among DISTINCT strings;
  * verification joins strings back BY representative id, so candidate
  * tuples never carry two full strings through a shuffle. No all-pairs
  * anywhere outside the oracle.
  */
object EditDistanceJoin {

  /** Distinct-string grain: (id_a, id_b, d, n_a, n_b) for every pair
    * of DISTINCT string values within levenshtein `k` — ids are group
    * representatives (min id per identical value), n_* the group
    * sizes, d >= 1 by construction (identical values share a group).
    * id_a < id_b. Null strings are dropped.
    */
  def editDistanceJoinDistinct(
      df: DataFrame,
      strCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val groups = distinctGroups(df, strCol, idCol)
    corePairs(groups, k)
      .select(col("id_a"), col("id_b"), col("d"), col("n_a"), col("n_b"))
  }

  /** Row grain: (id_a, id_b, d) for every row pair within levenshtein
    * `k` (id_a < id_b) — [[editDistanceJoinDistinct]] expanded back
    * through the identical-value groups (within-group pairs at d = 0
    * plus cross-group pairs at the group pair's distance). The output
    * is quadratic in group depth by definition; prefer the distinct
    * grain unless row identity matters downstream.
    */
  def editDistanceJoin(
      df: DataFrame,
      strCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val groups = distinctGroups(df, strCol, idCol)
    val members = df.select(col(idCol).as("mid"), col(strCol).as("s"))
      .where(col("s").isNotNull)
      .join(groups.select(col("id").as("rep"), col("s")), "s")
      .select(col("rep"), col("mid"))
    val within = members.select(col("rep"), col("mid").as("id_a"))
      .join(members.select(col("rep"), col("mid").as("id_b")), "rep")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).as("d"))
    val across = corePairs(groups, k)
      .join(members.select(col("rep").as("id_a"), col("mid").as("ma")), "id_a")
      .join(members.select(col("rep").as("id_b"), col("mid").as("mb")), "id_b")
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("d"))
    within.unionByName(across)
  }

  /** One row per distinct string value: (s, id = min rowid, n). */
  private def distinctGroups(
      df: DataFrame, strCol: String, idCol: String): DataFrame =
    graft.core.Caches.persistTracked(
      df.select(col(idCol).as("__id"), col(strCol).as("s"))
        .where(col("s").isNotNull)
        .groupBy(col("s"))
        .agg(min(col("__id")).as("id"), count(lit(1)).as("n")))

  /** PassJoin over the distinct-string relation `groups(s, id, n)`:
    * (id_a, id_b, d, n_a, n_b), id ordering by representative id.
    */
  private def corePairs(groups: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 3, "k in [1, 3] — fan-out grows as (2k+1)^2(k+1)")
    val kk = k + 1
    // Even partition of a length-l string: first (l mod k+1) segments
    // get the extra character. All arithmetic on ints; l / kk floors
    // exactly for the non-negative lengths involved.
    def segLen(l: Column, j: Int): Column =
      (l / kk).cast("int") + when(lit(j) < l % kk, 1).otherwise(0)
    def segStart(l: Column, j: Int): Column =
      (lit(j) * (l / kk).cast("int") + least(lit(j), l % kk)).cast("int")
    val len = length(col("s"))

    val index = groups.where(len > 2 * k)
      .select(col("id").as("id_i"),
        explode(array((0 to k).map(j => struct(
          lit(j).as("j"),
          col("s").substr(segStart(len, j) + 1, segLen(len, j)).as("seg"),
          len.as("l"))): _*)).as("e"))
      .select(col("id_i"), col("e.j"), col("e.seg"), col("e.l"))
    val probe = groups
      .select(col("id").as("id_p"),
        explode(array((for {
          dl <- -k to k
          j <- 0 to k
          off <- -k to k
        } yield {
          val ls = len + dl
          val st = segStart(ls, j) + off
          val ln = segLen(ls, j)
          struct(lit(j).as("j"),
            when(ls > 2 * k && st >= 0 && ln >= 1 && st + ln <= len,
              col("s").substr(st + 1, ln)).as("seg"),
            ls.as("l"))
        }): _*)).as("e"))
      .where(col("e.seg").isNotNull)
      .select(col("id_p"), col("e.j"), col("e.seg"), col("e.l"))
    val longPairs = index.join(probe, Seq("j", "seg", "l"))
      .where(col("id_i") =!= col("id_p"))
      .select(least(col("id_i"), col("id_p")).as("id_a"),
        greatest(col("id_i"), col("id_p")).as("id_b"))

    // Short arm: every partner of a len<=2k string has len<=3k, so the
    // <=3k length bucket brute-forces its own pairs (tiny by nature).
    val shortBucket = groups.where(len <= 3 * k)
    val shortPairs = shortBucket.select(col("id").as("id_a"))
      .join(shortBucket.select(col("id").as("id_b")), col("id_a") < col("id_b"))

    longPairs.union(shortPairs).distinct()
      .join(groups.select(col("id").as("id_a"), col("s").as("s_a"),
        col("n").as("n_a")), "id_a")
      .join(groups.select(col("id").as("id_b"), col("s").as("s_b"),
        col("n").as("n_b")), "id_b")
      .withColumn("d", levenshtein(col("s_a"), col("s_b")))
      .where(col("d") <= k)
      .select(col("id_a"), col("id_b"), col("d"), col("n_a"), col("n_b"))
  }
}
