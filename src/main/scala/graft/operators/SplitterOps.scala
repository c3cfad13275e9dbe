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
      .filter(col("size_mb") * (2 * DivideMultiplier) > col("max_size"))
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
    * display; hash-checked against a recursive-CTE CRC32 oracle (8-step
    * reflected-polynomial 0xEDB88320 per byte — bit-exact with
    * java.util.zip.CRC32). */
  def saltedKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val src = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("key_str"))
    src.select(
      col("id"),
      col("key_str"),
      hex(salted_key(col("key_str"))).as("salted_hex"),
      length(salted_key(col("key_str"))).as("salted_len"))
  }

  /** O-48 surface: printable escaping of arbitrary binary keys
    * (`Bytes.toStringBinary` semantics — ASCII 32..126 verbatim, \xNN
    * otherwise). The fixture derives full-range binary from md5 bytes so
    * both branches are exercised on every row; the oracle re-implements
    * the escape byte-by-byte in SQL. */
  def printableKeys(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Tables.customer(spark, sfDir)
      .select(
        col("c_custkey").as("id"),
        BinaryKeys.toStringBinaryUdf(unhex(md5(col("c_name")))).as("printable"))

  /** O-50 surface: deterministic probe key per key string — key bytes ++
    * 4 CRC32 bytes over (key ++ 0x9e), hex-emitted; oracled against the
    * same recursive-CTE CRC32 state machine salted_keys uses, extended
    * one byte past the key for the 0x9e seed. */
  def probeKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val probe = BinaryKeys.probeKeyUdf(col("key_str").cast("binary"))
    graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("key_str"))
      .select(
        col("id"), col("key_str"),
        hex(probe).as("probe_hex"),
        length(probe).as("probe_len"))
  }
}

object SplitterPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "split_plan" -> ((s, d) =>
      SplitterOps.splitPlan(ClusterViews.regionInfo(s, d), ClusterViews.regionMetrics(s, d))),
    "salted_keys" -> ((s, d) => SplitterOps.saltedKeys(s, d)),
    "key_printable" -> ((s, d) => SplitterOps.printableKeys(s, d)),
    "probe_keys" -> ((s, d) => SplitterOps.probeKeys(s, d))
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
         |WHERE size_mb * CAST(2.2 AS DOUBLE) > max_size AND rnk <= 20""".stripMargin,
    // CRC32 as a recursive CTE: state machine over (pos, bit) — at a byte
    // boundary (bit=8) XOR in the next byte, then 8 reflected-polynomial
    // shift steps; bit-exact with java.util.zip.CRC32 used by SaltedKey.
    "salted_keys" ->
      """WITH RECURSIVE keys AS (
        |  SELECT c_custkey AS id, c_name AS key_str FROM customer
        |),
        |st(id, key_str, pos, bit, c) AS (
        |  SELECT id, key_str, 0, 8, CAST(4294967295 AS BIGINT) FROM keys
        |  UNION ALL
        |  SELECT id, key_str,
        |    CASE WHEN bit = 8 THEN pos + 1 ELSE pos END,
        |    CASE WHEN bit = 8 THEN 0 ELSE bit + 1 END,
        |    CASE WHEN bit = 8
        |         THEN xor(c, ascii(substring(key_str, pos + 1, 1)))
        |         ELSE xor(c >> 1, CASE WHEN c % 2 = 1 THEN CAST(3988292384 AS BIGINT) ELSE 0 END)
        |    END
        |  FROM st
        |  WHERE bit < 8 OR pos < len(key_str)
        |),
        |fin AS (
        |  SELECT id, key_str, xor(c, 4294967295) AS crc
        |  FROM st WHERE bit = 8 AND pos = len(key_str)
        |)
        |SELECT id, key_str,
        |  CASE WHEN len(key_str) >= 4
        |       THEN lpad(hex(crc), 8, '0') || hex(substring(key_str, len(key_str)-1, 2))
        |            || hex(substring(key_str, len(key_str)-3, 2)) || hex(key_str)
        |       ELSE lpad(hex(crc), 8, '0') || hex(key_str)
        |  END AS salted_hex,
        |  CAST(CASE WHEN len(key_str) >= 4 THEN 8 + len(key_str) ELSE 4 + len(key_str) END AS INTEGER) AS salted_len
        |FROM fin""".stripMargin,
    // Bytes.toStringBinary re-implemented byte-by-byte over md5 bytes:
    // printable ASCII verbatim, \xNN (uppercase) otherwise
    "key_printable" ->
      """WITH h AS (SELECT c_custkey AS id, md5(c_name) AS hx FROM customer),
        |b AS (
        |  SELECT id, i.i, substring(hx, CAST(i.i * 2 + 1 AS INT), 2) AS p
        |  FROM h, range(0, 16) i(i)
        |),
        |e AS (
        |  SELECT id, i,
        |         CASE WHEN CAST(('0x' || p) AS INT) BETWEEN 32 AND 126
        |              THEN chr(CAST(('0x' || p) AS INT))
        |              ELSE '\x' || upper(p) END AS piece
        |  FROM b
        |)
        |SELECT id, string_agg(piece, '' ORDER BY i) AS printable
        |FROM e GROUP BY id""".stripMargin,
    // the salted_keys CRC32 state machine, extended ONE byte past the key
    // (the 0x9e probe seed), probe = key bytes ++ 4 crc bytes
    "probe_keys" ->
      """WITH RECURSIVE keys AS (
        |  SELECT c_custkey AS id, c_name AS key_str FROM customer
        |),
        |st(id, key_str, pos, bit, c) AS (
        |  SELECT id, key_str, 0, 8, CAST(4294967295 AS BIGINT) FROM keys
        |  UNION ALL
        |  SELECT id, key_str,
        |    CASE WHEN bit = 8 THEN pos + 1 ELSE pos END,
        |    CASE WHEN bit = 8 THEN 0 ELSE bit + 1 END,
        |    CASE WHEN bit = 8
        |         THEN xor(c, CASE WHEN pos < len(key_str)
        |                         THEN ascii(substring(key_str, pos + 1, 1))
        |                         ELSE 158 END)
        |         ELSE xor(c >> 1, CASE WHEN c % 2 = 1 THEN CAST(3988292384 AS BIGINT) ELSE 0 END)
        |    END
        |  FROM st
        |  WHERE bit < 8 OR pos < len(key_str) + 1
        |),
        |fin AS (
        |  SELECT id, key_str, xor(c, 4294967295) AS crc
        |  FROM st WHERE bit = 8 AND pos = len(key_str) + 1
        |)
        |SELECT id, key_str, hex(key_str) || lpad(hex(crc), 8, '0') AS probe_hex,
        |       CAST(len(key_str) + 4 AS INTEGER) AS probe_len
        |FROM fin""".stripMargin
  )
}
