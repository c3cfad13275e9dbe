package graft.model

import java.sql.Timestamp

/** Typed rows for the cluster-state datasets (SURVEY.md §1 D1-D3).
  * Field names match the DataFrame column names exactly so
  * `df.as[RegionMetric]` is a zero-cost view; Dataset[T] is used where a
  * typed core pays off (plan emitters, reporters), DataFrame everywhere
  * schema is dynamic. */
case class RegionMetric(
    region_id: Long, table_name: String, server: String, size_mb: Long,
    file_count: Int, max_file_mb: Long, mem_store_mb: Long, locality: Double)

case class RegionInfo(
    region_id: Long, table_name: String, namespace: String,
    start_key: Long, end_key: Long, server: String, offline: Boolean)

case class TopologyObs(
    region_id: Long, snapshot_ts: Timestamp, server: String, obs_id: Long)
