package graft.operators

import graft.QueryPack
import graft.cluster.{ClusterSql, ClusterViews}
import graft.functions.BinaryKeys
import graft.functions.SaltedKey.salted_key
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SPLITTER analytics (reference `api/splitter/TableSplitter.java`):
  * pick the regions worth splitting and compute their split points,
  * plus the salted-key generator surface (KEY_GENERATOR tool).
  */
object SplitterOps {

  val DivideMultiplier = 1.1 // splitter.divide.multiplier
  val SplitCount = 20        // hardcoded RETRIES bound

  /** O-43: per table, regions with size*2*multiplier > the table's biggest
    * region, biggest-first, capped at splitCount; split point = binary
    * midpoint of the region's key range (O-49, via BinaryKeys.midpoint on
    * 8-byte big-endian keys — the oracle checks it as (s+e)//2).
    * (`TableSplitter.java:114-148`, midpoint `:95-112`.) */
  def splitPlan(regionInfo: DataFrame, metrics: DataFrame): DataFrame = {
    val joined = regionInfo
      .select("region_id", "table_name", "start_key", "end_key")
      .join(metrics.select("region_id", "size_mb"), Seq("region_id"), "inner")
    val byTable = Window.partitionBy("table_name")
    val ranked = joined
      .withColumn("max_size", max(col("size_mb")).over(byTable))
      .filter(col("size_mb") * 2.2 > col("max_size"))
      .withColumn(
        "rnk",
        row_number().over(Window.partitionBy("table_name").orderBy(col("size_mb").desc, col("region_id"))))
      .filter(col("rnk") <= SplitCount)
    ranked.select(
      col("table_name"),
      col("region_id"),
      col("size_mb"),
      col("rnk"),
      BinaryKeys.midpoint_key(col("start_key"), col("end_key")).as("split_point"))
  }

  /** O-47 surface: salted keys for a batch of input strings (KEY_GENERATOR
    * tool; `api/common/KeyGenerator.java:27-49`). Emitted as hex for
    * display; rows-only check (CRC32 byte surgery is not SQL-expressible
    * in the oracle engine). */
  def saltedKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val src = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("key_str"))
    src.select(
      col("id"),
      col("key_str"),
      hex(salted_key(col("key_str"))).as("salted_hex"),
      length(salted_key(col("key_str"))).as("salted_len"))
  }
}

object SplitterPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "split_plan" -> ((s, d) =>
      SplitterOps.splitPlan(ClusterViews.regionInfo(s, d), ClusterViews.regionMetrics(s, d))),
    "salted_keys" -> ((s, d) => SplitterOps.saltedKeys(s, d))
  )

  override def oracles: Map[String, String] = Map(
    "split_plan" ->
      s"""WITH ${ClusterSql.regionMetrics}, ${ClusterSql.regionInfo},
         |joined AS (
         |  SELECT i.region_id, i.table_name, i.start_key, i.end_key, m.size_mb
         |  FROM region_info i JOIN region_metrics m ON i.region_id = m.region_id
         |),
         |ranked AS (
         |  SELECT *,
         |         MAX(size_mb) OVER (PARTITION BY table_name) AS max_size,
         |         ROW_NUMBER() OVER (PARTITION BY table_name ORDER BY size_mb DESC, region_id) AS rnk
         |  FROM joined
         |)
         |SELECT table_name, region_id, size_mb, rnk,
         |       (start_key + end_key) // 2 AS split_point
         |FROM ranked
         |WHERE size_mb * CAST(2.2 AS DOUBLE) > max_size AND rnk <= 20""".stripMargin
    // salted_keys: rows-only (no CRC32 in the oracle engine)
  )
}
