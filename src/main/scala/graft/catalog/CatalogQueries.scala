package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's catalog query as a composed unit (SURVEY.md §3.1):
  * fact ⋈ dim, ⟕ M:N bridge, ⟕ attribute table, then group by the fact
  * key collecting a canonical sorted comma-joined attribute list —
  * `videos_video vv JOIN shows_show LEFT JOIN videos_video_hosts LEFT
  * JOIN hosts_host ... GROUP_CONCAT(hh.name)` re-expressed declaratively
  * (extractors/utils/helpers/database.py:148-166).
  *
  * Scale notes: the dim and attribute tables are broadcast (tiny); the
  * only shuffle is the final groupBy on the fact key, which is the
  * already-unique join key, so partial aggregation collapses nothing but
  * also skews nothing. GROUP_CONCAT order is unspecified in SQLite — we
  * declare the `array_sort` canonical form (SURVEY §7.4.3) so results
  * are deterministic and oracle-stable.
  */
object CatalogQueries {

  /** J1 + J2 + A1. Column names are parameters so the same composed unit
    * serves the reference star schema and the TPC-H-shaped test tables.
    */
  def catalog(
      facts: DataFrame,
      dim: DataFrame,
      bridge: DataFrame,
      attr: DataFrame,
      factId: String, dimFk: String, dimId: String, dimName: String,
      bridgeFactFk: String, bridgeAttrFk: String,
      attrId: String, attrName: String): DataFrame = {
    facts
      .join(broadcast(dim), facts(dimFk) === dim(dimId))
      .join(bridge, facts(factId) === bridge(bridgeFactFk), "left")
      .join(broadcast(attr), bridge(bridgeAttrFk) === attr(attrId), "left")
      .groupBy(facts(factId), dim(dimName))
      // collect_list skips nulls (facts with no bridge rows -> empty list
      // -> ""), matching the reference's NULL -> [] split guard
      // (database.py:180).
      .agg(concat_ws(",", array_sort(collect_list(attr(attrName)))).as("names"))
  }
}
