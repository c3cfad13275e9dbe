package graft.operators

import graft.QueryPack
import graft.cluster.{ClusterSql, ClusterViews}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Topology time-travel (reference `api/meta/TechnicalMeta.java`,
  * `api/meta/ClusterTopology.java`): as-of reads of the region→server
  * mapping history, diffs between two points in time, and the
  * key→region range lookup.
  *
  * Scale notes: at 100 TB the topology history is partitioned by snapshot
  * date, so the `ts <= t` filter prunes partitions before any shuffle; the
  * as-of pick is one window over (region) — a single shuffle of the
  * pruned slice. The range join broadcasts the region-boundary table
  * (O(#regions), small) against arbitrarily many probe keys.
  */
object TopologyOps {

  val T1 = "1997-01-01 00:00:00"
  val T2 = "1997-09-01 00:00:00"

  /** O-46: as-of pick — latest placement per region at time t
    * (`api/meta/TechnicalMeta.java:156-157` floorEntry). */
  def asOf(topology: DataFrame, t: String): DataFrame = {
    val w = Window
      .partitionBy("region_id")
      .orderBy(col("snapshot_ts").desc, col("obs_id").desc)
    topology
      .filter(col("snapshot_ts") <= lit(t).cast("timestamp"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("region_id"), col("server"), unix_micros(col("snapshot_ts")).as("ts_us"))
  }

  /** O-33: topology diff between t1 and t2 — IN/OUT tagged union of the
    * two placement sets (`api/meta/ClusterTopology.java:45-71`). */
  def diff(topology: DataFrame, t1: String = T1, t2: String = T2): DataFrame = {
    val a = asOf(topology, t1).select("region_id", "server")
    val b = asOf(topology, t2).select("region_id", "server")
    b.except(a).withColumn("change", lit("IN"))
      .unionByName(a.except(b).withColumn("change", lit("OUT")))
  }

  /** O-23: current placement vs as-of placement — full outer join on
    * region (`api/meta/TechnicalMeta.java:86-95`). */
  def currentVsAsOf(regionInfo: DataFrame, topology: DataFrame, t: String = T2): DataFrame =
    regionInfo
      .select(col("region_id"), col("server").as("server_now"))
      .join(asOf(topology, t).select(col("region_id"), col("server").as("server_then")),
        Seq("region_id"), "full_outer")
      .select(
        col("region_id"),
        col("server_now"),
        col("server_then"),
        (col("server_now").isNotNull && col("server_then").isNotNull &&
          col("server_now") === col("server_then")).as("unchanged"))

  /** O-26: key → region range lookup (`api/common/KeyFinder.java:38-46`):
    * locate the region whose [start_key, end_key) contains each probe key.
    * Non-equi join; region boundaries broadcast. Right call while the
    * boundary table is broadcast-small, but the nested-loop probe is
    * O(#regions) comparisons PER KEY — at billions of keys × 10^5+
    * regions use [[keyRangeLookupBinned]] instead. */
  def keyRangeLookup(keys: DataFrame, regionInfo: DataFrame): DataFrame =
    // the broadcast nested loop streams the PROBE side, so its
    // parallelism is the probe scan's — a single-row-group fixture scan
    // plans one task and serializes the O(keys × regions) comparisons;
    // spreading the narrow key projection first uses the whole machine
    Par.spread(keys).join(
      broadcast(regionInfo.select(col("region_id"), col("start_key"), col("end_key"))),
      col("probe_key") >= col("start_key") && col("probe_key") < col("end_key"),
      "left")
      .select(col("probe_key"), col("region_id"))

  /** O-26 at scale: the binned range join. Each range replicates to the
    * fixed-width bins it overlaps; each probe key hashes to exactly one
    * bin; the lookup becomes an EQUI-join on bin + a residual range
    * predicate — a shuffled hash join that scales to billions of keys ×
    * millions of ranges with no nested loop and no global sort (the same
    * binning trick production range-join optimizers apply). A probe meets
    * each overlapping range in exactly one bin copy, so no dedup step is
    * needed. Bin width trades replication (wide ranges split into
    * width/bin copies) against residual work (ranges sharing a bin);
    * pick it near the median range width. */
  def keyRangeLookupBinned(keys: DataFrame, regionInfo: DataFrame, binWidth: Long = 4096L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val ranges = regionInfo
      .select(col("region_id"), col("start_key"), col("end_key"))
      .filter(col("end_key") > col("start_key"))
      .withColumn("bin", explode(sequence(
        expr(s"start_key div $binWidth"), expr(s"(end_key - 1) div $binWidth"))))
    // range predicate stays INSIDE the join condition so left semantics
    // hold: a probe whose bin has ranges but none containing it still
    // emits (probe, null), exactly like the broadcast variant
    keys
      .withColumn("kbin", expr(s"probe_key div $binWidth"))
      .join(ranges,
        col("kbin") === col("bin") &&
          col("probe_key") >= col("start_key") && col("probe_key") < col("end_key"),
        "left")
      .select(col("probe_key"), col("region_id"))
  }
}

object TopologyPack extends QueryPack {
  private def topo(s: SparkSession, d: String): DataFrame = ClusterViews.topology(s, d)
  private def ri(s: SparkSession, d: String): DataFrame = ClusterViews.regionInfo(s, d)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topology_asof" -> ((s, d) => TopologyOps.asOf(topo(s, d), TopologyOps.T2)),
    "topology_diff" -> ((s, d) => TopologyOps.diff(topo(s, d))),
    "cur_asof" -> ((s, d) => TopologyOps.currentVsAsOf(ri(s, d), topo(s, d))),
    "key_lookup" -> { (s, d) =>
      val keys = graft.sources.Tables.customer(s, d)
        .select(((col("c_custkey") * 7919) % 2100000).as("probe_key"))
      TopologyOps.keyRangeLookup(keys, ri(s, d))
    },
    "key_lookup_bin" -> { (s, d) =>
      val keys = graft.sources.Tables.customer(s, d)
        .select(((col("c_custkey") * 7919) % 2100000).as("probe_key"))
      TopologyOps.keyRangeLookupBinned(keys, ri(s, d))
    }
  )

  private def asOfSql(t: String) =
    s"""SELECT region_id, server, snapshot_ts FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY region_id
       |                               ORDER BY snapshot_ts DESC, obs_id DESC) AS rn
       |  FROM topology WHERE snapshot_ts <= TIMESTAMP '$t'
       |) WHERE rn = 1""".stripMargin

  override def oracles: Map[String, String] = Map(
    "topology_asof" ->
      s"""WITH ${ClusterSql.topology}
         |SELECT region_id, server, epoch_us(snapshot_ts) AS ts_us
         |FROM (${asOfSql(TopologyOps.T2)})""".stripMargin,
    "topology_diff" ->
      s"""WITH ${ClusterSql.topology},
         |a AS (SELECT region_id, server FROM (${asOfSql(TopologyOps.T1)})),
         |b AS (SELECT region_id, server FROM (${asOfSql(TopologyOps.T2)}))
         |SELECT region_id, server, 'IN' AS change FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
         |UNION ALL
         |SELECT region_id, server, 'OUT' AS change FROM (SELECT * FROM a EXCEPT SELECT * FROM b)""".stripMargin,
    "cur_asof" ->
      s"""WITH ${ClusterSql.topology}, ${ClusterSql.regionInfo},
         |then_t AS (SELECT region_id, server AS server_then FROM (${asOfSql(TopologyOps.T2)})),
         |now_t AS (SELECT region_id, server AS server_now FROM region_info)
         |SELECT COALESCE(n.region_id, t.region_id) AS region_id,
         |       n.server_now, t.server_then,
         |       (n.server_now IS NOT NULL AND t.server_then IS NOT NULL
         |        AND n.server_now = t.server_then) AS unchanged
         |FROM now_t n FULL OUTER JOIN then_t t ON n.region_id = t.region_id""".stripMargin,
    "key_lookup" ->
      s"""WITH ${ClusterSql.regionInfo},
         |keys AS (SELECT (c_custkey * 7919) % 2100000 AS probe_key FROM customer)
         |SELECT k.probe_key, r.region_id
         |FROM keys k LEFT JOIN region_info r
         |  ON k.probe_key >= r.start_key AND k.probe_key < r.end_key""".stripMargin
  ,
    // same answer, different physical shape — the binning is internal
    "key_lookup_bin" ->
      s"""WITH ${ClusterSql.regionInfo},
         |keys AS (SELECT (c_custkey * 7919) % 2100000 AS probe_key FROM customer)
         |SELECT k.probe_key, r.region_id
         |FROM keys k LEFT JOIN region_info r
         |  ON k.probe_key >= r.start_key AND k.probe_key < r.end_key""".stripMargin
  )
}
