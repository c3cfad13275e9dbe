package graft.operators

import graft.QueryPack
import graft.cluster.{ClusterSql, ClusterViews}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DISTRIBUTOR / balance analytics (reference `api/distributor/...`,
  * `api/rstask/RSTaskControllerHelper.java:155-176`,
  * `api/report/reports/{Meta,Runtime}RSDistributionReporter.java`).
  *
  * Scale notes: the server dimension is tiny (O(1k) even on huge
  * clusters) so zero-fill joins broadcast; the per-(table,server) counts
  * are pre-aggregated before any join, so shuffles carry aggregates, not
  * regions. The move plan is the closed-form rank-and-zip rewrite of the
  * reference's driver-side greedy loop
  * (`api/distributor/DistributeTableWeight.java:26-47`) — no
  * collect()/iteration, works on any number of tables in one pass.
  */
object DistributionOps {

  /** O-32: regions per server with zero-fill for empty servers. */
  def regionsPerServer(metrics: DataFrame, servers: DataFrame): DataFrame =
    servers
      .join(metrics.groupBy("server").agg(count(lit(1)).as("cnt")), Seq("server"), "left")
      .select(col("server"), coalesce(col("cnt"), lit(0L)).as("n_regions"))

  /** O-39: per-server load vs the cluster average, classified with the
    * reporter's band ladder (`MetaRSDistributionReporter.java:39-43`). */
  def loadVsAverage(metrics: DataFrame, servers: DataFrame): DataFrame = {
    val counts = regionsPerServer(metrics, servers)
    // scalar average via broadcast cross join (the counts input is the
    // server dimension — tiny — but the pattern stays single-partition-free)
    val avg = counts.agg((sum(col("n_regions")) / count(lit(1))).as("avg_load"))
    counts
      .crossJoin(broadcast(avg))
      .select(
        col("server"),
        col("n_regions"),
        floor(col("avg_load") * 10000 + 0.5).cast("long").as("avg_load_e4"),
        when(col("n_regions") > col("avg_load") * 2.0, "CRITICAL")
          .when(col("n_regions") > col("avg_load") * 1.3, "NORMAL")
          .when(col("n_regions") < col("avg_load") * 0.3, "LOW")
          .otherwise("NONE")
          .as("severity"))
  }

  /** O-42: most- and least-loaded server, deterministic tie-break
    * (`api/distributor/TableDistributor.java:99-114`). */
  def extremeServers(metrics: DataFrame, servers: DataFrame): DataFrame = {
    val counts = regionsPerServer(metrics, servers)
    val maxRow = counts.orderBy(col("n_regions").desc, col("server")).limit(1)
      .select(lit("max").as("extreme"), col("server"), col("n_regions"))
    val minRow = counts.orderBy(col("n_regions").asc, col("server")).limit(1)
      .select(lit("min").as("extreme"), col("server"), col("n_regions"))
    maxRow.unionByName(minRow)
  }

  /** O-44 (metric): moves needed to balance each table across servers to
    * the reference's max-min<=1 band. Closed form of the greedy loop:
    * moves = max( Σ over-ceil surplus, Σ under-floor deficit ). */
  def balanceMoves(metrics: DataFrame, servers: DataFrame): DataFrame = {
    val tables = metrics.select("table_name").distinct()
    val slots = tables.crossJoin(broadcast(servers))
    val counts = slots
      .join(metrics.groupBy("table_name", "server").agg(count(lit(1)).as("cnt")),
        Seq("table_name", "server"), "left")
      .select(col("table_name"), col("server"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val byTable = Window.partitionBy("table_name")
    counts
      .withColumn("ceil_avg", ceil(sum(col("cnt")).over(byTable) / count(lit(1)).over(byTable)))
      .withColumn("floor_avg", floor(sum(col("cnt")).over(byTable) / count(lit(1)).over(byTable)))
      .groupBy("table_name")
      .agg(
        sum(greatest(col("cnt") - col("ceil_avg"), lit(0L))).as("surplus"),
        sum(greatest(col("floor_avg") - col("cnt"), lit(0L))).as("deficit"))
      .select(
        col("table_name"),
        greatest(col("surplus"), col("deficit")).as("moves"))
  }

  /** O-44 (plan): the concrete (region, from, to) moves — surplus regions
    * ranked within each table zipped against generated deficit slots.
    * Executes the same placement the reference's loop performs in
    * `api/distributor/TableDistributor.java:72-90`, as one dataflow. */
  def movePlan(metrics: DataFrame, servers: DataFrame): DataFrame = {
    val tables = metrics.select("table_name").distinct()
    val counts = tables
      .crossJoin(broadcast(servers))
      .join(metrics.groupBy("table_name", "server").agg(count(lit(1)).as("cnt")),
        Seq("table_name", "server"), "left")
      .select(col("table_name"), col("server"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val byTable = Window.partitionBy("table_name")
    // cached: surplus and deficit both read the per-(table,server) target
    // table; uncached, the counts join + window runs once per side
    val withTarget = graft.Caching.maybeCache(counts
      .withColumn("target", ceil(sum(col("cnt")).over(byTable) / count(lit(1)).over(byTable))))

    // surplus regions: per (table,server) the regions ranked beyond target
    val byTableServer = Window.partitionBy("table_name", "server").orderBy(col("region_id").desc)
    val surplus = metrics
      .select("table_name", "server", "region_id")
      .withColumn("rn", row_number().over(byTableServer))
      .join(withTarget.select(col("table_name"), col("server"), (col("cnt") - col("target")).as("extra")),
        Seq("table_name", "server"))
      .filter(col("rn") <= col("extra"))
      .withColumn(
        "k",
        row_number().over(Window.partitionBy("table_name").orderBy(col("server"), col("region_id"))))

    // deficit slots: (target - cnt) generated rows per under-filled server
    val deficits = withTarget
      .withColumn("needed", (col("target") - col("cnt")).cast("int"))
      .filter(col("needed") > 0)
      .withColumn("slot", explode(sequence(lit(1), col("needed"))))
      .withColumn(
        "k",
        row_number().over(Window.partitionBy("table_name").orderBy(col("server"), col("slot"))))
      .select(col("table_name"), col("server").as("to_server"), col("k"))

    surplus
      .join(deficits, Seq("table_name", "k"))
      .select(
        col("table_name"),
        col("region_id"),
        col("server").as("from_server"),
        col("to_server"))
  }

  /** O-25: server-name prefix resolution, vectorized
    * (`api/HBaseToolsHelper.java:54-94`: error on 0 or >1 match). */
  def resolvePrefixes(prefixes: DataFrame, servers: DataFrame): DataFrame =
    prefixes
      .join(servers, col("server").startsWith(col("prefix")), "left")
      .groupBy("prefix")
      .agg(count(col("server")).as("n_matches"),
        min(col("server")).as("first_match"))
      .select(
        col("prefix"),
        col("n_matches"),
        when(col("n_matches") === 1, col("first_match")).otherwise(lit(null)).as("resolved"),
        when(col("n_matches") === 1, "OK")
          .when(col("n_matches") === 0, "NOT_FOUND")
          .otherwise("AMBIGUOUS")
          .as("status"))
}

object DistributionPack extends QueryPack {
  private def m(s: SparkSession, d: String): DataFrame = ClusterViews.regionMetrics(s, d)
  private def srv(s: SparkSession): DataFrame = ClusterViews.servers(s)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "regions_srv" -> ((s, d) => DistributionOps.regionsPerServer(m(s, d), srv(s))),
    "load_vs_avg" -> ((s, d) => DistributionOps.loadVsAverage(m(s, d), srv(s))),
    "extremes" -> ((s, d) => DistributionOps.extremeServers(m(s, d), srv(s))),
    "balance_moves" -> ((s, d) => DistributionOps.balanceMoves(m(s, d), srv(s))),
    "move_plan" -> ((s, d) => DistributionOps.movePlan(m(s, d), srv(s))),
    "prefixes" -> { (s, d) =>
      val prefixes = m(s, d).select(substring(col("server"), 1, 2).as("prefix")).distinct()
      DistributionOps.resolvePrefixes(prefixes, srv(s))
    }
  )

  private val countsSql =
    """counts AS (
      |  SELECT t.table_name, s.server, COALESCE(c.cnt, 0) AS cnt
      |  FROM (SELECT DISTINCT table_name FROM region_metrics) t
      |  CROSS JOIN servers s
      |  LEFT JOIN (SELECT table_name, server, COUNT(*) AS cnt
      |             FROM region_metrics GROUP BY table_name, server) c
      |    ON t.table_name = c.table_name AND s.server = c.server
      |)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "regions_srv" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.servers}
         |SELECT s.server, COALESCE(c.cnt, 0) AS n_regions
         |FROM servers s
         |LEFT JOIN (SELECT server, COUNT(*) AS cnt FROM region_metrics GROUP BY server) c
         |  ON s.server = c.server""".stripMargin,
    "load_vs_avg" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.servers},
         |counts AS (
         |  SELECT s.server, COALESCE(c.cnt, 0) AS n_regions
         |  FROM servers s
         |  LEFT JOIN (SELECT server, COUNT(*) AS cnt FROM region_metrics GROUP BY server) c
         |    ON s.server = c.server
         |),
         |with_avg AS (
         |  SELECT server, n_regions,
         |         CAST(SUM(n_regions) OVER () AS DOUBLE) / COUNT(*) OVER () AS avg_load
         |  FROM counts
         |)
         |SELECT server, n_regions,
         |       CAST(FLOOR(avg_load * 10000 + 0.5) AS BIGINT) AS avg_load_e4,
         |       CASE WHEN n_regions > avg_load * 2.0 THEN 'CRITICAL'
         |            WHEN n_regions > avg_load * 1.3 THEN 'NORMAL'
         |            WHEN n_regions < avg_load * 0.3 THEN 'LOW'
         |            ELSE 'NONE' END AS severity
         |FROM with_avg""".stripMargin,
    "extremes" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.servers},
         |counts AS (
         |  SELECT s.server, COALESCE(c.cnt, 0) AS n_regions
         |  FROM servers s
         |  LEFT JOIN (SELECT server, COUNT(*) AS cnt FROM region_metrics GROUP BY server) c
         |    ON s.server = c.server
         |)
         |(SELECT 'max' AS extreme, server, n_regions FROM counts
         | ORDER BY n_regions DESC, server LIMIT 1)
         |UNION ALL
         |(SELECT 'min' AS extreme, server, n_regions FROM counts
         | ORDER BY n_regions ASC, server LIMIT 1)""".stripMargin,
    "balance_moves" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.servers},
         |$countsSql,
         |with_target AS (
         |  SELECT table_name, server, cnt,
         |         CAST(CEIL(CAST(SUM(cnt) OVER (PARTITION BY table_name) AS DOUBLE)
         |                   / COUNT(*) OVER (PARTITION BY table_name)) AS BIGINT) AS ceil_avg,
         |         CAST(FLOOR(CAST(SUM(cnt) OVER (PARTITION BY table_name) AS DOUBLE)
         |                    / COUNT(*) OVER (PARTITION BY table_name)) AS BIGINT) AS floor_avg
         |  FROM counts
         |)
         |SELECT table_name,
         |       CAST(GREATEST(SUM(GREATEST(cnt - ceil_avg, 0)),
         |                     SUM(GREATEST(floor_avg - cnt, 0))) AS BIGINT) AS moves
         |FROM with_target GROUP BY table_name""".stripMargin,
    "move_plan" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.servers},
         |$countsSql,
         |with_target AS (
         |  SELECT table_name, server, cnt,
         |         CAST(CEIL(CAST(SUM(cnt) OVER (PARTITION BY table_name) AS DOUBLE)
         |                   / COUNT(*) OVER (PARTITION BY table_name)) AS BIGINT) AS target
         |  FROM counts
         |),
         |surplus AS (
         |  SELECT r.table_name, r.server, r.region_id,
         |         ROW_NUMBER() OVER (PARTITION BY r.table_name, r.server ORDER BY r.region_id DESC) AS rn,
         |         w.cnt - w.target AS extra
         |  FROM region_metrics r
         |  JOIN with_target w ON r.table_name = w.table_name AND r.server = w.server
         |),
         |surplus_k AS (
         |  SELECT table_name, server, region_id,
         |         ROW_NUMBER() OVER (PARTITION BY table_name ORDER BY server, region_id) AS k
         |  FROM surplus WHERE rn <= extra
         |),
         |deficit_k AS (
         |  SELECT table_name, server AS to_server,
         |         ROW_NUMBER() OVER (PARTITION BY table_name ORDER BY server, slot) AS k
         |  FROM (SELECT w.table_name, w.server, t.i + 1 AS slot
         |        FROM with_target w, range(0, 10000) t(i)
         |        WHERE w.target - w.cnt > 0 AND t.i < w.target - w.cnt)
         |)
         |SELECT s.table_name, s.region_id, s.server AS from_server, d.to_server
         |FROM surplus_k s JOIN deficit_k d
         |  ON s.table_name = d.table_name AND s.k = d.k""".stripMargin,
    "prefixes" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.servers},
         |prefixes AS (SELECT DISTINCT SUBSTRING(server, 1, 2) AS prefix FROM region_metrics),
         |matched AS (
         |  SELECT p.prefix, s.server
         |  FROM prefixes p LEFT JOIN servers s ON s.server LIKE p.prefix || '%'
         |)
         |SELECT prefix, COUNT(server) AS n_matches,
         |       CASE WHEN COUNT(server) = 1 THEN MIN(server) ELSE NULL END AS resolved,
         |       CASE WHEN COUNT(server) = 1 THEN 'OK'
         |            WHEN COUNT(server) = 0 THEN 'NOT_FOUND'
         |            ELSE 'AMBIGUOUS' END AS status
         |FROM matched GROUP BY prefix""".stripMargin
  )
}
