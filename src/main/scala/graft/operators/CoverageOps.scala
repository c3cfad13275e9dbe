package graft.operators

import graft.QueryPack
import graft.cluster.{ClusterSql, ClusterViews}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining SURVEY.md §2 scan/filter/eligibility operators, each as a
  * small composable dataflow:
  * O-1 meta scan with server/liveness predicates, O-5 point get,
  * O-9 keep-latest pre-write dedup (with delete tombstones),
  * O-16 flush queue, O-17 namespace/mask predicates, O-18 snapshot
  * guard (anti-join), O-19 health-table candidates, O-22 miss-path
  * diagnostics, O-38 availability fold, D4 kv-pivot wide view.
  */
object CoverageOps {

  /** O-1: live regions of the meta scan, optionally restricted to one
    * server (`api/meta/MetaTableInfoService.java:20-72` — the server
    * filter and offline check are pushed into the scan). */
  def metaRegions(regionInfo: DataFrame, server: Option[String]): DataFrame = {
    val live = regionInfo.filter(!col("offline"))
    server.fold(live)(sn => live.filter(col("server") === sn))
      .select("region_id", "table_name", "namespace", "start_key", "end_key", "server")
  }

  /** O-5: point get of a single row by key (`api/meta/TableLock.java:83-109`);
    * with a keyed source this prunes to one partition/row-range. */
  def pointGet(regionInfo: DataFrame, key: Long): DataFrame =
    regionInfo.filter(col("region_id") === key)
      .select("region_id", "server", "start_key", "end_key")

  /** O-9: pre-write compaction of a mutation queue — per key keep the
    * latest mutation; a trailing delete tombstone drops the row entirely
    * (`SequenceBufferedMutator.java:201-275` merge semantics). */
  def keepLatest(mutations: DataFrame): DataFrame = {
    val w = Window.partitionBy("region_id").orderBy(col("snapshot_ts").desc, col("obs_id").desc)
    mutations
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && !col("is_delete"))
      .select(col("region_id"), col("server"), unix_micros(col("snapshot_ts")).as("ts_us"))
  }

  /** O-16 + O-41: flush queue — regions above the memstore border, biggest
    * first per server, top 3 per server (flusher.thread.count)
    * (`api/flusher/FlushController.java:43-50`). */
  def flushQueue(metrics: DataFrame, borderMb: Long = 1L, threads: Int = 3): DataFrame = {
    val w = Window.partitionBy("server").orderBy(col("mem_store_mb").desc, col("region_id"))
    metrics
      .filter(col("mem_store_mb") > borderMb)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= threads)
      .select("server", "region_id", "mem_store_mb", "rnk")
  }

  /** O-17: namespace equality + table-mask regex predicates
    * (`api/merger/MergerService.java:62`, `api/distributor/Distributor.java:73`). */
  def namespaceFilter(regionInfo: DataFrame, ns: String, mask: String): DataFrame =
    regionInfo
      .filter(col("namespace") === ns && col("table_name").rlike(mask))
      .groupBy("table_name")
      .agg(count(lit(1)).as("n_regions"))

  /** O-18: snapshot-exists guard — tables already snapshotted are NOT
    * eligible (left-anti join; `api/merger/Merger.java:117-129`). Snapshot
    * set = tables with a recent snapshot in the derived snapshot log. */
  def mergeGuard(metrics: DataFrame, orders: DataFrame): DataFrame = {
    val snapshotted = orders
      .filter(col("o_orderkey") % 7 === 0)
      .select(concat(lit("t"), floor((col("o_orderkey") % 2048) / 128.0).cast("long").cast("string"))
        .as("table_name"))
      .distinct()
    metrics
      .select("table_name").distinct()
      .join(snapshotted, Seq("table_name"), "left_anti")
  }

  /** O-19: health-check candidate tables — region count within
    * [lo*servers, hi*servers], deterministic sample of n
    * (`api/analyze/HBaseHealthAnalyzeService.java:181-224`; the reference
    * samples randomly, a distributed probe wants reproducibility → order
    * by md5(table)). */
  def healthCandidates(
      metrics: DataFrame,
      nServers: Int = 24,
      lo: Double = 4.0,
      hi: Double = 6.0,
      sample: Int = 5): DataFrame =
    metrics
      .groupBy("table_name")
      .agg(count(lit(1)).as("n_regions"))
      .filter(col("n_regions") >= lo * nServers && col("n_regions") <= hi * nServers)
      .orderBy(md5(col("table_name")), col("table_name"))
      .limit(sample)

  /** O-22 miss path: regions with metrics but no live meta row (offline) —
    * the "moved region" diagnostic (`api/compactor/CompactorServer.java:197-199`). */
  def missingMeta(metrics: DataFrame, regionInfo: DataFrame): DataFrame =
    metrics
      .join(regionInfo.filter(!col("offline")).select("region_id"), Seq("region_id"), "left_anti")
      .select("region_id", "table_name", "server", "size_mb")

  /** O-38: availability fold — AND over probe results per operation type
    * (`api/analyze/ClusterAvailabilityObject.java:18-32`); probes derived
    * from events (an error event = failed probe). */
  def availability(events: DataFrame): DataFrame =
    events
      .select(
        when(col("event_id") % 2 === 0, "read").otherwise("write").as("op_type"),
        (col("event_type") =!= "error").as("ok"))
      .groupBy("op_type")
      .agg(min(col("ok")).as("available"), count(lit(1)).as("n_probes"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_failures"))

  /** O-2: the metrics-snapshot flatten — `ClusterMetrics` arrives as one
    * row per server carrying a map<region, metrics>; explode(map_entries)
    * turns it into per-region rows (reference
    * `api/analyze/TableAnalyzer.java:174-203`). Inverse of the nested
    * grouping in `api/meta/MetaTableHolder.java:32-74`. */
  def flattenServerMap(nested: DataFrame): DataFrame =
    nested
      .select(col("server"), explode(map_entries(col("region_metrics"))).as("e"))
      .select(col("server"), col("e.key").as("region_id"), col("e.value.size_mb"),
        col("e.value.file_count"))

  /** Builds the nested shape (one row per server, map of region metrics)
    * from flat metrics — used to round-trip-test O-2. */
  def nestServerMap(metrics: DataFrame): DataFrame =
    metrics
      .groupBy("server")
      .agg(map_from_entries(collect_list(struct(
        col("region_id").as("key"),
        struct(col("size_mb"), col("file_count")).as("value")))).as("region_metrics"))

  /** D4 wide view: EAV cells (rowkey, qualifier, value) pivoted to
    * columns — `groupBy(rowkey).pivot(qualifier)` with explicit qualifier
    * values so no extra distinct-scan job runs. */
  def kvPivot(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey").as("rowkey"), col("l_linenumber").as("qualifier"),
        col("l_quantity").cast("long").as("value"))
      .groupBy("rowkey")
      .pivot("qualifier", Seq(1, 2, 3, 4))
      .sum("value")
      .select(col("rowkey"), col("1").as("q1"), col("2").as("q2"), col("3").as("q3"), col("4").as("q4"))
}

object CoveragePack extends QueryPack {
  private def m(s: SparkSession, d: String): DataFrame = ClusterViews.regionMetrics(s, d)
  private def ri(s: SparkSession, d: String): DataFrame = ClusterViews.regionInfo(s, d)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "meta_regions" -> ((s, d) => CoverageOps.metaRegions(ri(s, d), Some("s6"))),
    "point_get" -> ((s, d) => CoverageOps.pointGet(ri(s, d), 777L)),
    "kv_keep_latest" -> { (s, d) =>
      val topo = ClusterViews.topology(s, d).withColumn("is_delete", col("obs_id") % 50 === 0)
      CoverageOps.keepLatest(topo)
    },
    "flush_queue" -> ((s, d) => CoverageOps.flushQueue(m(s, d))),
    "namespace_filter" -> ((s, d) => CoverageOps.namespaceFilter(ri(s, d), "ns1", "^t1.*")),
    "merge_guard" -> ((s, d) =>
      CoverageOps.mergeGuard(m(s, d), graft.sources.Tables.orders(s, d))),
    "health_cand" -> ((s, d) => CoverageOps.healthCandidates(m(s, d))),
    "missing_meta" -> ((s, d) => CoverageOps.missingMeta(m(s, d), ri(s, d))),
    "availability" -> ((s, d) => CoverageOps.availability(graft.sources.Tables.events(s, d))),
    "kv_pivot" -> ((s, d) => CoverageOps.kvPivot(graft.sources.Tables.lineitem(s, d))),
    // O-2 both ways: nest the flat metrics into the ClusterMetrics map
    // shape, then flatten back — oracled against the flat view directly,
    // so the explode(map_entries) path is value-checked, not just
    // round-trip-checked
    "flat_server_map" -> ((s, d) => CoverageOps.flattenServerMap(CoverageOps.nestServerMap(m(s, d))))
  )

  override def oracles: Map[String, String] = Map(
    "flat_server_map" ->
      s"""WITH ${ClusterSql.regionMetrics}
         |SELECT server, region_id, size_mb, file_count FROM region_metrics""".stripMargin,
    "meta_regions" ->
      s"""WITH ${ClusterSql.regionInfo}
         |SELECT region_id, table_name, namespace, start_key, end_key, server
         |FROM region_info WHERE NOT offline AND server = 's6'""".stripMargin,
    "point_get" ->
      s"""WITH ${ClusterSql.regionInfo}
         |SELECT region_id, server, start_key, end_key FROM region_info WHERE region_id = 777""".stripMargin,
    "kv_keep_latest" ->
      s"""WITH ${ClusterSql.topology},
         |ranked AS (
         |  SELECT region_id, server, snapshot_ts, obs_id % 50 = 0 AS is_delete,
         |         ROW_NUMBER() OVER (PARTITION BY region_id
         |                            ORDER BY snapshot_ts DESC, obs_id DESC) AS rn
         |  FROM topology
         |)
         |SELECT region_id, server, epoch_us(snapshot_ts) AS ts_us
         |FROM ranked WHERE rn = 1 AND NOT is_delete""".stripMargin,
    "flush_queue" ->
      s"""WITH ${ClusterSql.regionMetrics},
         |ranked AS (
         |  SELECT server, region_id, mem_store_mb,
         |         ROW_NUMBER() OVER (PARTITION BY server
         |                            ORDER BY mem_store_mb DESC, region_id) AS rnk
         |  FROM region_metrics WHERE mem_store_mb > 1
         |)
         |SELECT server, region_id, mem_store_mb, rnk FROM ranked WHERE rnk <= 3""".stripMargin,
    "namespace_filter" ->
      s"""WITH ${ClusterSql.regionInfo}
         |SELECT table_name, COUNT(*) AS n_regions
         |FROM region_info
         |WHERE namespace = 'ns1' AND regexp_matches(table_name, '^t1.*')
         |GROUP BY table_name""".stripMargin,
    "merge_guard" ->
      s"""WITH ${ClusterSql.regionMetrics},
         |snapshotted AS (
         |  SELECT DISTINCT 't' || CAST(CAST(FLOOR((o_orderkey % 2048) / 128.0) AS BIGINT) AS VARCHAR) AS table_name
         |  FROM orders WHERE o_orderkey % 7 = 0
         |)
         |SELECT DISTINCT m.table_name FROM region_metrics m
         |WHERE NOT EXISTS (SELECT 1 FROM snapshotted s WHERE s.table_name = m.table_name)""".stripMargin,
    "health_cand" ->
      s"""WITH ${ClusterSql.regionMetrics},
         |counts AS (
         |  SELECT table_name, COUNT(*) AS n_regions FROM region_metrics GROUP BY table_name
         |)
         |SELECT table_name, n_regions FROM counts
         |WHERE n_regions >= CAST(4.0 AS DOUBLE) * 24 AND n_regions <= CAST(6.0 AS DOUBLE) * 24
         |ORDER BY md5(table_name), table_name LIMIT 5""".stripMargin,
    "missing_meta" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.regionInfo}
         |SELECT m.region_id, m.table_name, m.server, m.size_mb
         |FROM region_metrics m
         |WHERE NOT EXISTS (SELECT 1 FROM region_info i
         |                  WHERE NOT i.offline AND i.region_id = m.region_id)""".stripMargin,
    "availability" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN 'read' ELSE 'write' END AS op_type,
        |       MIN(event_type <> 'error') AS available,
        |       COUNT(*) AS n_probes,
        |       CAST(SUM(CASE WHEN event_type <> 'error' THEN 0 ELSE 1 END) AS BIGINT) AS n_failures
        |FROM events GROUP BY 1""".stripMargin,
    "kv_pivot" ->
      """SELECT l_orderkey AS rowkey,
        |       CAST(SUM(CASE WHEN l_linenumber = 1 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS q1,
        |       CAST(SUM(CASE WHEN l_linenumber = 2 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS q2,
        |       CAST(SUM(CASE WHEN l_linenumber = 3 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS q3,
        |       CAST(SUM(CASE WHEN l_linenumber = 4 THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS q4
        |FROM lineitem GROUP BY l_orderkey""".stripMargin
  )
}
