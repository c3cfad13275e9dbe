package graft.operators

import graft.cluster.ClusterViews
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's flagship computation: which regions should be
  * major-compacted, in what order, per server
  * (reference `api/compactor/CompactorServer.java:179-217` —
  * regions⋈metrics → weight → threshold filter → per-server priority sort,
  * then top `recalculate.region.count`=15 processed per cycle;
  * weight formula `api/compactor/CompactionWeight.java:39-44`;
  * thresholds `api/configuration/HBaseToolsOptions.java:52,57-58`).
  *
  * Spark shape: one narrow projection + a filter + a per-server window
  * rank. No join is needed for the weight itself (metrics carry all
  * inputs); the window shuffles once on `server` — exactly the partitioning
  * a 1000-node cluster wants, since downstream action emission is
  * per-server anyway. The filter sits below the window so the shuffle only
  * carries candidate rows.
  */
object CompactionOps {

  val DefaultBorderWeight = 15.0 // compactor.border.weight
  val DefaultMinSizeMb = 100L    // compactor.store.size.mb
  val DefaultQueueDepth = 15     // compactor.recalculate.region.count

  /** Compaction weight (reference `api/compactor/CompactionWeight.java:39-44`):
    * `(1-locality)*115 + ((sizeMB-maxStoreFile)/1024)*(files*1.33)`, 0 when
    * sizeMB < 10. Backed by the native [[graft.functions.CompactionWeightExpr]]
    * (codegen'd straight-line arithmetic), which also lets the
    * [[graft.plans.PushCompactionWeightBounds]] optimizer rule derive
    * scan-pushable bounds from weight-threshold filters.
    */
  def weight(sizeMb: Column, maxFileMb: Column, fileCount: Column, locality: Column): Column =
    graft.functions.CompactionWeightExpr.compaction_weight(sizeMb, maxFileMb, fileCount, locality)

  /** Weighted candidates above the (border, minSize) thresholds
    * (reference filter `api/compactor/CompactorServer.java:240-242`). */
  def candidates(
      metrics: DataFrame,
      borderWeight: Double = DefaultBorderWeight,
      minSizeMb: Long = DefaultMinSizeMb): DataFrame =
    metrics
      .withColumn(
        "weight",
        weight(col("size_mb"), col("max_file_mb"), col("file_count"), col("locality")))
      .filter(col("weight") > borderWeight && col("size_mb") > minSizeMb)

  /** Per-server prioritized compaction queue, truncated to `queueDepth`
    * (reference sort `api/compactor/CompactorServer.java:210-216`, queue
    * recompute cadence `HBaseToolsOptions.java:58`). */
  def plan(
      metrics: DataFrame,
      borderWeight: Double = DefaultBorderWeight,
      minSizeMb: Long = DefaultMinSizeMb,
      queueDepth: Int = DefaultQueueDepth): DataFrame = {
    val byServer = Window.partitionBy(col("server")).orderBy(col("weight").desc, col("region_id"))
    candidates(metrics, borderWeight, minSizeMb)
      .withColumn("rnk", row_number().over(byServer))
      .filter(col("rnk") <= queueDepth)
      .select(
        col("server"),
        col("region_id"),
        col("table_name"),
        // scaled-integer output: `round(double, n)` semantics differ across
        // engines on exact decimal halves; floor(x*1e4 + 0.5) is
        // bit-deterministic on IEEE doubles everywhere
        floor(col("weight") * 10000 + 0.5).cast("long").as("weight_e4"),
        col("rnk"))
  }

  /** Entry used by SparkEntry: plan over the derived D1 metrics. */
  def planFromSf(spark: SparkSession, sfDir: String): DataFrame =
    plan(ClusterViews.regionMetrics(spark, sfDir))
}
