package graft.cluster

import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Registers the full data model as temp views so users can work in pure
  * SQL against the engine: the raw tables, the derived cluster-state
  * views (D1-D3), and the server dimension. With
  * `spark.sql.extensions=graft.plans.GraftExtensions` the custom
  * functions (salted_key) resolve in SQL too.
  */
object GraftCatalog {

  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.all.foreach { name =>
      Tables.read(spark, sfDir, name).createOrReplaceTempView(name)
    }
    // events with normalized timestamp type
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    ClusterViews.regionMetrics(spark, sfDir).createOrReplaceTempView("region_metrics")
    ClusterViews.regionInfo(spark, sfDir).createOrReplaceTempView("region_info")
    ClusterViews.topology(spark, sfDir).createOrReplaceTempView("topology")
    ClusterViews.servers(spark).createOrReplaceTempView("servers")
  }
}
