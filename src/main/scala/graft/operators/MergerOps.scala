package graft.operators

import graft.QueryPack
import graft.cluster.{ClusterSql, ClusterViews}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge thresholds (reference `api/merger/MergeParams.java:3-26`):
  * min/max single-region store sizes plus the max merged size. */
case class MergeParams(minMb: Long, maxMb: Long, maxMergedMb: Long)

/** Quality modes for the merger (reference `api/merger/QualityMerge.java:6-68`):
  * each mode is a distinct pair-eligibility rule plus a stop bound for the
  * multi-round driver loop (`Merger.java:133-150` keeps merging rounds
  * while the region count exceeds `borderRegionsCount`).
  */
sealed abstract class MergeQuality(val name: String) {
  /** Pair eligibility on (left size, right size) — `canMergeRegions`. */
  def canMerge(a: Column, b: Column, p: MergeParams): Column

  /** Stop bound for the outer merge loop — `setBorderRegionsCount`:
    * SMALL ignores it (-1, single pass), MEDIUM honors the configured
    * value, LARGE always merges down to one region. */
  def borderRegionsCount(configured: Int): Int
}

object MergeQuality {
  /** `canMergeTwoRegions` (`QualityMerge.java:75-90`): any sub-minimum
    * region may merge unconditionally; otherwise both must fit under the
    * single-region cap and their sum under the merged cap. */
  private def canMergeTwo(a: Column, b: Column, p: MergeParams): Column =
    (a < p.minMb || b < p.minMb) ||
      (a <= p.maxMb && b <= p.maxMb && (a + b) <= p.maxMergedMb)

  case object Small extends MergeQuality("small") {
    override def canMerge(a: Column, b: Column, p: MergeParams): Column =
      (a < p.minMb && b < p.maxMb) || (b < p.minMb && a < p.maxMb)
    override def borderRegionsCount(configured: Int): Int = -1
  }

  case object Medium extends MergeQuality("medium") {
    override def canMerge(a: Column, b: Column, p: MergeParams): Column = canMergeTwo(a, b, p)
    override def borderRegionsCount(configured: Int): Int = configured
  }

  case object Large extends MergeQuality("large") {
    override def canMerge(a: Column, b: Column, p: MergeParams): Column = canMergeTwo(a, b, p)
    override def borderRegionsCount(configured: Int): Int = 1
  }

  /** `parseQuality` (`QualityMerge.java:52-68`), including the reference's
    * colloquial Russian aliases. */
  def parse(quality: String): MergeQuality = quality.toLowerCase(java.util.Locale.ROOT) match {
    case "на-пол-шишечки" | "small"  => Small
    case "ну-сожми-чуток" | "medium" => Medium
    case "по-взрослому" | "large"    => Large
    case other => throw new IllegalArgumentException(s"Incorrect merge parameters: $other")
  }
}

/** MERGER analytics (reference `api/merger/...`).
  *
  * The reference's adjacent-pair walk (`api/merger/Merger.java:190-257`:
  * sort regions, try (i, i+1), on merge skip i+1) is sequential, but its
  * selection is exactly "pairs at odd positions inside each maximal run of
  * consecutive eligible pairs" — a gaps-and-islands computation, fully
  * window-expressible. No driver loop, no mapPartitions: scales to any
  * number of tables/regions in one pass, partitioned by table.
  */
object MergerOps {

  val SmallRegionMb = 64L   // merger.regions.min-storefile-size-mb
  val MaxMergedMb = 8192L   // merger.regions.max-merged-storefile-size-mb

  /** O-22 join + O-40 pair walk → merge plan.
    * Input: region_info (keys, adjacency) ⋈ region_metrics (sizes).
    * A pair (r_i, r_{i+1}) of one table is eligible when both are small
    * (O-15, `api/merger/MergerService.java:67-70`), the merged size fits
    * (`api/merger/QualityMerge.java:70-84`), and the regions are truly
    * adjacent (`RegionInfo.areAdjacent` — end_key == next start_key).
    * Greedy non-overlap = odd positions within eligible-run islands. */
  def mergePlan(
      regionInfo: DataFrame,
      metrics: DataFrame,
      smallMb: Long = SmallRegionMb,
      maxMergedMb: Long = MaxMergedMb): DataFrame =
    greedyAdjacentPlan(regionInfo, metrics,
      (a, b) => a <= smallMb && b <= smallMb && (a + b) <= maxMergedMb)

  /** [[mergePlan]] under a reference quality mode: same greedy adjacent
    * walk, pair eligibility swapped for the mode's ladder
    * (`api/merger/QualityMerge.java:6-40`). */
  def mergePlanQuality(
      regionInfo: DataFrame,
      metrics: DataFrame,
      quality: MergeQuality,
      params: MergeParams): DataFrame =
    greedyAdjacentPlan(regionInfo, metrics, (a, b) => quality.canMerge(a, b, params))

  /** Shared O-40 walk: adjacency pairing, size eligibility, islands of
    * consecutive eligible pairs, greedy odd positions. */
  private def greedyAdjacentPlan(
      regionInfo: DataFrame,
      metrics: DataFrame,
      sizeEligible: (Column, Column) => Column): DataFrame = {
    val joined = regionInfo
      .select("region_id", "table_name", "start_key", "end_key")
      .join(metrics.select(col("region_id"), col("size_mb")), Seq("region_id"), "inner")
    val byTable = Window.partitionBy("table_name").orderBy("start_key")
    val paired = joined
      .withColumn("next_region", lead(col("region_id"), 1).over(byTable))
      .withColumn("next_start", lead(col("start_key"), 1).over(byTable))
      .withColumn("next_size", lead(col("size_mb"), 1).over(byTable))
      .withColumn(
        "eligible",
        col("next_region").isNotNull &&
          col("end_key") === col("next_start") &&
          sizeEligible(col("size_mb"), col("next_size")))
    // islands of consecutive eligible pairs; greedy picks odd positions
    val island = sum(when(col("eligible"), 0).otherwise(1))
      .over(byTable.rowsBetween(Window.unboundedPreceding, 0))
    val pos = row_number().over(
      Window.partitionBy(col("table_name"), col("island_id")).orderBy("start_key"))
    paired
      .withColumn("island_id", island)
      .filter(col("eligible"))
      .withColumn("pos_in_island", pos)
      .filter(col("pos_in_island") % 2 === 1)
      .select(
        col("table_name"),
        col("region_id").as("left_region"),
        col("next_region").as("right_region"),
        (col("size_mb") + col("next_size")).as("merged_size_mb"))
  }

  /** O-37: mergeable-regions count per table
    * (`api/merger/MergerService.java:84-102`: all-small → n-1, else n_small). */
  def mergeableCount(metrics: DataFrame, smallMb: Long = SmallRegionMb): DataFrame =
    metrics
      .groupBy("table_name")
      .agg(
        count(lit(1)).as("n_regions"),
        sum(when(col("size_mb") <= smallMb, 1L).otherwise(0L)).as("n_small"))
      .withColumn(
        "mergeable",
        when(col("n_regions") === col("n_small"), col("n_regions") - 1)
          .otherwise(col("n_small")))

  /** O-3 / O-45: first & last live row of each region's key range
    * (`api/common/HBaseRegionChecker.java:44-71` — forward + reversed
    * scan with maxResultSize=1). Row key = l_orderkey*10 + l_linenumber. */
  def borderRows(lineitem: DataFrame): DataFrame =
    lineitem
      .select(
        col("l_partkey").as("region_id"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("rowkey"))
      .groupBy("region_id")
      .agg(min(col("rowkey")).as("first_rowkey"), max(col("rowkey")).as("last_rowkey"))

  /** O-24: merged-range rediscovery — match "new" regions by exact
    * (start_key, end_key) range equality (`api/merger/Merger.java:290-301`).
    * Expected ranges come from the merge plan (left.start, right.end). */
  def rediscoverMerged(
      regionInfo: DataFrame,
      metrics: DataFrame,
      smallMb: Long = SmallRegionMb,
      maxMergedMb: Long = MaxMergedMb): DataFrame = {
    val plan = mergePlan(regionInfo, metrics, smallMb, maxMergedMb)
    val expected = plan
      .join(regionInfo.select(col("region_id").as("left_region"), col("start_key")), Seq("left_region"))
      .join(regionInfo.select(col("region_id").as("right_region"), col("end_key")), Seq("right_region"))
      .select(col("table_name"), col("start_key"), col("end_key"))
    // simulated post-merge region set: merged ranges replace their halves
    expected
      .join(
        regionInfo.select(col("table_name"), col("start_key"), col("region_id").as("found_left")),
        Seq("table_name", "start_key"),
        "left")
      .select(col("table_name"), col("start_key"), col("end_key"), col("found_left"))
  }
}

object MergerPack extends QueryPack {
  private def m(s: SparkSession, d: String): DataFrame = ClusterViews.regionMetrics(s, d)
  private def ri(s: SparkSession, d: String): DataFrame = ClusterViews.regionInfo(s, d)

  // fixture-scaled thresholds: derived region sizes run 3-13 GB, so the
  // reference's 64 MB default would select nothing — configured exactly as
  // a user would tune merger.regions.min/max-storefile-size-mb
  private val FixtureSmallMb = 7000L
  private val FixtureMaxMergedMb = 15000L
  private val FixtureMedParams = MergeParams(minMb = 5000L, maxMb = 12000L, maxMergedMb = 15000L)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_plan" -> ((s, d) =>
      MergerOps.mergePlan(ri(s, d), m(s, d), FixtureSmallMb, FixtureMaxMergedMb)),
    "merge_plan_med" -> ((s, d) =>
      MergerOps.mergePlanQuality(ri(s, d), m(s, d), MergeQuality.parse("medium"), FixtureMedParams)),
    "mergeables" -> ((s, d) => MergerOps.mergeableCount(m(s, d), FixtureSmallMb)),
    "border_rows" -> ((s, d) => MergerOps.borderRows(graft.sources.Tables.lineitem(s, d))),
    "remerged" -> ((s, d) =>
      MergerOps.rediscoverMerged(ri(s, d), m(s, d), FixtureSmallMb, FixtureMaxMergedMb))
  )

  private def pairedSqlFor(sizePred: String): String =
    s"""joined AS (
       |  SELECT i.region_id, i.table_name, i.start_key, i.end_key, m.size_mb
       |  FROM region_info i JOIN region_metrics m ON i.region_id = m.region_id
       |),
       |paired AS (
       |  SELECT *,
       |         LEAD(region_id) OVER w AS next_region,
       |         LEAD(start_key) OVER w AS next_start,
       |         LEAD(size_mb) OVER w AS next_size
       |  FROM joined
       |  WINDOW w AS (PARTITION BY table_name ORDER BY start_key)
       |),
       |flagged AS (
       |  SELECT *,
       |         (next_region IS NOT NULL AND end_key = next_start
       |          AND ($sizePred)) AS eligible
       |  FROM paired
       |),
       |islands AS (
       |  SELECT *,
       |         SUM(CASE WHEN eligible THEN 0 ELSE 1 END)
       |           OVER (PARTITION BY table_name ORDER BY start_key
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
       |  FROM flagged
       |),
       |picked AS (
       |  SELECT *,
       |         ROW_NUMBER() OVER (PARTITION BY table_name, island_id ORDER BY start_key) AS pos_in_island
       |  FROM islands WHERE eligible
       |)""".stripMargin

  private val pairedSql = pairedSqlFor(
    "size_mb <= 7000 AND next_size <= 7000 AND size_mb + next_size <= 15000")

  // MEDIUM ladder (QualityMerge.canMergeTwoRegions): sub-minimum regions
  // merge unconditionally; otherwise both under the cap and the sum fits
  private val pairedSqlMed = pairedSqlFor(
    "(size_mb < 5000 OR next_size < 5000) OR " +
      "(size_mb <= 12000 AND next_size <= 12000 AND size_mb + next_size <= 15000)")

  override def oracles: Map[String, String] = Map(
    "merge_plan" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.regionInfo},
         |$pairedSql
         |SELECT table_name, region_id AS left_region, next_region AS right_region,
         |       CAST(size_mb + next_size AS BIGINT) AS merged_size_mb
         |FROM picked WHERE pos_in_island % 2 = 1""".stripMargin,
    "merge_plan_med" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.regionInfo},
         |$pairedSqlMed
         |SELECT table_name, region_id AS left_region, next_region AS right_region,
         |       CAST(size_mb + next_size AS BIGINT) AS merged_size_mb
         |FROM picked WHERE pos_in_island % 2 = 1""".stripMargin,
    "mergeables" ->
      s"""WITH ${ClusterSql.regionMetrics}
         |SELECT table_name, COUNT(*) AS n_regions,
         |       CAST(SUM(CASE WHEN size_mb <= 7000 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
         |       CAST(CASE WHEN COUNT(*) = SUM(CASE WHEN size_mb <= 7000 THEN 1 ELSE 0 END)
         |            THEN COUNT(*) - 1
         |            ELSE SUM(CASE WHEN size_mb <= 7000 THEN 1 ELSE 0 END) END AS BIGINT) AS mergeable
         |FROM region_metrics GROUP BY table_name""".stripMargin,
    "border_rows" ->
      """SELECT l_partkey AS region_id,
        |       MIN(l_orderkey * 10 + l_linenumber) AS first_rowkey,
        |       MAX(l_orderkey * 10 + l_linenumber) AS last_rowkey
        |FROM lineitem GROUP BY l_partkey""".stripMargin,
    "remerged" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.regionInfo},
         |$pairedSql,
         |plan AS (
         |  SELECT table_name, region_id AS left_region, next_region AS right_region
         |  FROM picked WHERE pos_in_island % 2 = 1
         |),
         |expected AS (
         |  SELECT p.table_name, li.start_key, ri2.end_key
         |  FROM plan p
         |  JOIN region_info li ON p.left_region = li.region_id
         |  JOIN region_info ri2 ON p.right_region = ri2.region_id
         |)
         |SELECT e.table_name, e.start_key, e.end_key, f.region_id AS found_left
         |FROM expected e
         |LEFT JOIN region_info f
         |  ON e.table_name = f.table_name AND e.start_key = f.start_key""".stripMargin
  )
}
