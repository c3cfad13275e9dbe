package graft.operators

import graft.QueryPack
import graft.cluster.{ClusterSql, ClusterViews}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TABLE_ANALYZER pack (reference `api/analyze/TableAnalyzer.java`):
  * per-table totals and the four histograms it prints
  * (size `:85-103`, distribution `:105-128`, locality `:130-153`,
  * file-count `:155-172`), plus per-server weight statistics
  * (reference `api/compactor/CompactorServer.java:298-315`).
  *
  * All are single hash-aggregates over D1 — Spark executes them with
  * partial (map-side) aggregation, so at 100 TB each is one shuffle of
  * pre-aggregated partials, not of raw rows. The double group-by (O-29)
  * is two chained aggregations whose second input is tiny (#servers).
  */
object AnalyzerOps {

  /** O-27: region count + total size per table (`TableAnalyzer.java:72-83`). */
  def tableTotals(metrics: DataFrame): DataFrame =
    metrics
      .groupBy("table_name")
      .agg(count(lit(1)).as("n_regions"), sum("size_mb").as("total_size_mb"))

  /** O-28: 1-GB-wide size histogram (`TableAnalyzer.java:85-103`). */
  def sizeHistogram(metrics: DataFrame): DataFrame =
    metrics
      .groupBy(floor(col("size_mb") / 1024.0).cast("long").as("gb_bucket"))
      .agg(count(lit(1)).as("n_regions"))

  /** O-29: regions-per-server, then servers-per-count histogram
    * (`TableAnalyzer.java:105-128` — the double group-by). */
  def distributionHistogram(metrics: DataFrame): DataFrame =
    metrics
      .groupBy("server")
      .agg(count(lit(1)).as("regions_on_server"))
      .groupBy("regions_on_server")
      .agg(count(lit(1)).as("n_servers"))

  /** O-30: locality histogram in 10-percent buckets (`TableAnalyzer.java:130-153`). */
  def localityHistogram(metrics: DataFrame): DataFrame =
    metrics
      .groupBy((floor(col("locality") * 10) * 10).cast("long").as("locality_pct_bucket"))
      .agg(count(lit(1)).as("n_regions"))

  /** O-31: regions per storefile count (`TableAnalyzer.java:155-172`). */
  def fileCountHistogram(metrics: DataFrame): DataFrame =
    metrics
      .groupBy("file_count")
      .agg(count(lit(1)).as("n_regions"))

  /** Exact size percentiles per table (median / p95) — the distribution
    * summary the analyzer prints alongside its histograms. Exact
    * interpolated percentiles over integer sizes are engine-portable
    * (approx sketches are not). */
  def sizePercentiles(metrics: DataFrame): DataFrame =
    metrics
      .groupBy("table_name")
      .agg(
        percentile(col("size_mb"), lit(0.5)).as("p50_size_mb"),
        percentile(col("size_mb"), lit(0.95)).as("p95_size_mb"),
        count(lit(1)).as("n_regions"))

  /** The 100-TB twin of [[sizePercentiles]]: `percentile_approx` (a
    * KLL-style mergeable sketch) computes map-side partials and merges —
    * no per-group sort of all values, bounded memory at any cardinality.
    * Deliberately NOT oracled: sketch internals are engine-specific, so
    * this is cross-validated against the exact operator by test instead
    * — the same exact/scale twin pattern as `key_lookup` /
    * `key_lookup_bin`. */
  def sizePercentilesApprox(metrics: DataFrame, accuracy: Int = 10000): DataFrame =
    metrics
      .groupBy("table_name")
      .agg(
        percentile_approx(col("size_mb"), lit(0.5), lit(accuracy)).as("p50_size_mb"),
        percentile_approx(col("size_mb"), lit(0.95), lit(accuracy)).as("p95_size_mb"),
        count(lit(1)).as("n_regions"))

  /** O-34: per-server stats over positive compaction weights
    * (`CompactorServer.java:298-315`: max-by, mean, exact median).
    * Stats run in the scaled-integer (e4) domain so both engines compute
    * over identical values; top region picked by deterministic rank.
    */
  def weightStats(metrics: DataFrame): DataFrame = {
    val weighted = metrics
      .withColumn(
        "weight_e4",
        floor(
          CompactionOps.weight(col("size_mb"), col("max_file_mb"), col("file_count"), col("locality")) * 10000
            + 0.5).cast("long"))
      .filter(col("weight_e4") > 0)
    weighted
      .groupBy("server")
      .agg(
        count(lit(1)).as("n_pos"),
        max(col("weight_e4")).as("max_weight_e4"),
        max_by(col("region_id"), struct(col("weight_e4"), -col("region_id"))).as("top_region"),
        // exact long sum / count, not avg(): engines disagree on the
        // incremental-double AVG algorithm over integer inputs
        (sum(col("weight_e4")) / count(lit(1))).as("mean_weight_e4"),
        percentile(col("weight_e4"), lit(0.5)).as("median_weight_e4"))
  }
}

object AnalyzerPack extends QueryPack {
  private def m(s: SparkSession, dir: String): DataFrame = ClusterViews.regionMetrics(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "table_totals" -> ((s, d) => AnalyzerOps.tableTotals(m(s, d))),
    "size_hist" -> ((s, d) => AnalyzerOps.sizeHistogram(m(s, d))),
    "dist_hist" -> ((s, d) => AnalyzerOps.distributionHistogram(m(s, d))),
    "loc_hist" -> ((s, d) => AnalyzerOps.localityHistogram(m(s, d))),
    "files_hist" -> ((s, d) => AnalyzerOps.fileCountHistogram(m(s, d))),
    "weight_stats" -> ((s, d) => AnalyzerOps.weightStats(m(s, d))),
    "size_pctl" -> ((s, d) => AnalyzerOps.sizePercentiles(m(s, d)))
  )

  override def oracles: Map[String, String] = Map(
    "table_totals" ->
      s"""WITH ${ClusterSql.regionMetrics}
         |SELECT table_name, COUNT(*) AS n_regions,
         |       CAST(SUM(size_mb) AS BIGINT) AS total_size_mb
         |FROM region_metrics GROUP BY table_name""".stripMargin,
    "size_hist" ->
      s"""WITH ${ClusterSql.regionMetrics}
         |SELECT CAST(FLOOR(size_mb / 1024.0) AS BIGINT) AS gb_bucket, COUNT(*) AS n_regions
         |FROM region_metrics GROUP BY 1""".stripMargin,
    "dist_hist" ->
      s"""WITH ${ClusterSql.regionMetrics},
         |per_server AS (
         |  SELECT server, COUNT(*) AS regions_on_server FROM region_metrics GROUP BY server
         |)
         |SELECT regions_on_server, COUNT(*) AS n_servers FROM per_server GROUP BY 1""".stripMargin,
    "loc_hist" ->
      s"""WITH ${ClusterSql.regionMetrics}
         |SELECT CAST(FLOOR(locality * 10) * 10 AS BIGINT) AS locality_pct_bucket,
         |       COUNT(*) AS n_regions
         |FROM region_metrics GROUP BY 1""".stripMargin,
    "files_hist" ->
      s"""WITH ${ClusterSql.regionMetrics}
         |SELECT file_count, COUNT(*) AS n_regions FROM region_metrics GROUP BY file_count""".stripMargin,
    "size_pctl" ->
      s"""WITH ${ClusterSql.regionMetrics}
         |SELECT table_name,
         |       quantile_cont(size_mb, 0.5) AS p50_size_mb,
         |       quantile_cont(size_mb, 0.95) AS p95_size_mb,
         |       COUNT(*) AS n_regions
         |FROM region_metrics GROUP BY table_name""".stripMargin,
    "weight_stats" ->
      s"""WITH ${ClusterSql.regionMetrics},
         |weighted AS (
         |  SELECT server, region_id,
         |         CAST(FLOOR((${ClusterSql.weightExpr}) * 10000 + 0.5) AS BIGINT) AS weight_e4
         |  FROM region_metrics
         |),
         |pos AS (SELECT * FROM weighted WHERE weight_e4 > 0),
         |top AS (
         |  SELECT server, region_id AS top_region,
         |         ROW_NUMBER() OVER (PARTITION BY server ORDER BY weight_e4 DESC, region_id) AS rn
         |  FROM pos
         |)
         |SELECT p.server, COUNT(*) AS n_pos,
         |       CAST(MAX(p.weight_e4) AS BIGINT) AS max_weight_e4,
         |       MAX(t.top_region) AS top_region,
         |       CAST(SUM(p.weight_e4) AS DOUBLE) / COUNT(*) AS mean_weight_e4,
         |       MEDIAN(p.weight_e4) AS median_weight_e4
         |FROM pos p
         |LEFT JOIN (SELECT server, top_region FROM top WHERE rn = 1) t ON p.server = t.server
         |GROUP BY p.server""".stripMargin
  )
}
