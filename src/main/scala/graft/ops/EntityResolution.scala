package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked entity resolution (§2.11 extension — the record-linkage
  * step that collapses dirty near-identical records before a corpus
  * joins user/author/source entities: candidate generation by
  * BLOCKING, multi-field agreement scoring, threshold decision — the
  * Fellegi–Sunter pipeline shape, with deterministic integer weights
  * in place of learned log-likelihood ratios).
  *
  * Exactness: the match score is an integer micro-unit sum of field
  * agreements (levenshtein is an integer; the name-similarity term
  * floor-divides on the grid), so scores and decisions are
  * bit-identical on any engine.
  *
  * Scale shape: candidates come ONLY from equi-joining the blocking
  * key — the classic trade: within-block pairs are quadratic in BLOCK
  * size but blocks are bounded (nation × name-length here; real
  * deployments pick keys targeting ~10²–10³ rows), so candidate
  * volume is Σ|block|², never |corpus|². One shuffle on the block key,
  * expensive per-pair functions (levenshtein) evaluated only inside
  * blocks, then a threshold filter — no global state. Skewed mega-
  * blocks at 100 TB split by salting the block key or tightening it
  * with another field (both plan-shape-preserving).
  */
object EntityResolution {

  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** Match candidate pairs among `records(id, name, block..., acctbal,
    * segment)`: block on `blockCols`, score name edit-similarity
    * (600k × (1 − lev/maxlen) on the micro grid) + exact-balance
    * agreement (250k) + segment agreement (150k), decide at
    * `thresholdMicro`. Emits every in-block DISTINCT-RECORD candidate
    * pair with `lev <= maxLev` (the verify-stage survivors), matched
    * flag set by the score — downstream feeds matched pairs to the CC
    * closure ([[Components]]) for transitive entity groups.
    *
    * Runs at DISTINCT-RECORD grain — the [[EditDistanceJoin]] exact-
    * dedup-first discipline: records identical in every match field
    * collapse to (min-id representative, count) BEFORE pairing, so a
    * record duplicated d-deep (re-ingested crawls, replicated CRM
    * rows) costs d ONCE in the count instead of d² in the pair join
    * (measured: row grain went >10 min at 100-deep replication where
    * distinct grain stays block-bounded). `n_a`/`n_b` carry the
    * collapse multiplicity; identical-record "matches" are the
    * diagonal the counts already encode, not emitted pairs.
    */
  def resolve(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      blockCols: Seq[String],
      balanceCol: String,
      segmentCol: String,
      maxLev: Int = 1,
      thresholdMicro: Long = 700000L): DataFrame = {
    val g = records
      .groupBy((col(nameCol).as("name") +: col(balanceCol).as("bal") +:
        col(segmentCol).as("seg") +: blockCols.map(c => col(c))): _*)
      .agg(min(col(idCol)).as("id"), count(lit(1)).as("n"))
    val a = g.select(
      (Seq(col("id").as("id_a"), col("name").as("name_a"),
        col("bal").as("bal_a"), col("seg").as("seg_a"), col("n").as("n_a")) ++
        blockCols.map(c => col(c))): _*)
    val b = g.select(
      (Seq(col("id").as("id_b"), col("name").as("name_b"),
        col("bal").as("bal_b"), col("seg").as("seg_b"), col("n").as("n_b")) ++
        blockCols.map(c => col(c))): _*)
    val lev = levenshtein(col("name_a"), col("name_b"))
    val maxLen = greatest(length(col("name_a")), length(col("name_b")))
    val nameSim = intDiv(
      lit(600000L) * (maxLen - lev).cast("long"), maxLen.cast("long"))
    val score = nameSim +
      when(col("bal_a") === col("bal_b"), lit(250000L)).otherwise(lit(0L)) +
      when(col("seg_a") === col("seg_b"), lit(150000L)).otherwise(lit(0L))
    a.join(b, blockCols)
      .where(col("id_a") < col("id_b"))
      .where(lev <= maxLev)
      .select(col("id_a"), col("id_b"), lev.as("lev"),
        score.as("score_micro"),
        (score >= thresholdMicro).as("matched"),
        col("n_a"), col("n_b"))
  }
}
