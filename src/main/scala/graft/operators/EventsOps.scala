package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics over the `events` table: tumbling / sliding /
  * session windows, JSON property extraction, and the string-parsing
  * operators (O-51/O-53). These are the batch shapes of the Structured
  * Streaming layer (graft.streaming) — identical logical plans run under
  * readStream with watermarks.
  *
  * Exactness: value sums go through DECIMAL(18,2); windows are emitted as
  * epoch-micro longs (never raw timestamps) so engine timestamp precision
  * differences can't bite.
  */
object EventsOps {

  private def valDec = col("value").cast(DecimalType(18, 2))

  /** Tumbling 10-minute windows per event type (Spark `window()`). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(valDec).as("val_sum"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"),
        col("n"),
        col("val_sum").cast("double").as("val_sum"))

  /** Sliding windows: 10-minute length, 5-minute slide. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("window_start_us"), col("event_type"), col("n"))

  /** Session windows with a 5-minute inactivity gap, per user
    * (`session_window` — the batch twin of the streaming sessionizer). */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(valDec).as("val_sum"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"),
        col("val_sum").cast("double").as("val_sum"))

  /** Daily per-type value drift — the data-quality monitor a pipeline
    * runs over an ingest feed: exact-decimal daily means (cross-partition
    * double sums are order-dependent; the DECIMAL cast makes the sum
    * order-free, per the house rule) and the day-over-day delta via one
    * lag window over the tiny (type, day) aggregate. At 100 TB the only
    * corpus-sized stage is the first map-side-combined aggregation. */
  def valueDrift(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("value").cast(DecimalType(18, 6)).as("v"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select(col("event_type"), col("day"), col("n"),
        floor(col("sv").cast("double") / col("n") * 10000 + 0.5).cast("long").as("mean_e4"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily.withColumn("delta_e4",
      coalesce(col("mean_e4") - lag(col("mean_e4"), 1).over(w), lit(0L)))
  }

  /** Binned interval-overlap join: pairs of CONCURRENT sessions from
    * different users (co-activity). The naive formulation is a non-equi
    * interval join — a nested loop over |sessions|² at scale. Here every
    * session explodes into the 10-minute bins it covers (a session is
    * short, so a handful of bins each), pairs meet through a bin
    * EQUI-join, the exact overlap predicate filters, and `distinct`
    * collapses multi-bin matches — the same bin-the-range shape as
    * [[TopologyOps.keyRangeLookupBinned]], plan-gated to stay a hash
    * join. Output size is genuine concurrency² (what an overlap join
    * means); the BINS bound the meeting points, not the answer. */
  def coActivity(events: DataFrame, binMinutes: Int = 10): DataFrame = {
    val binUs = binMinutes * 60L * 1000000L
    // session intervals: session_window's end = last event + gap
    val iv = graft.Caching.maybeCache(
      events
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("s_us"), unix_micros(col("w.end")).as("e_us")))
    val binned = iv.select(col("user_id"), col("s_us"), col("e_us"),
      explode(expr(s"sequence(s_us DIV $binUs, e_us DIV $binUs)")).as("bin"))
    binned.as("a")
      .join(binned.as("b"),
        col("a.bin") === col("b.bin") &&
          col("a.user_id") < col("b.user_id") &&
          col("a.s_us") < col("b.e_us") && col("b.s_us") < col("a.e_us"))
      .select(
        col("a.user_id").as("ua"), col("b.user_id").as("ub"),
        col("a.s_us").as("a_start_us"), col("b.s_us").as("b_start_us"),
        (least(col("a.e_us"), col("b.e_us")) - greatest(col("a.s_us"), col("b.s_us")))
          .as("overlap_us"))
      .distinct()
  }

  /** JSON property extraction + rollup (events.props is a JSON string). */
  def jsonProps(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"), max(col("k")).as("k_max"))

  /** O-53: parse `server_<ts>` qualifiers back into (region, ts) — the
    * technical-meta cell decoding (`api/meta/TechnicalMeta.java:142-147`). */
  def parseQualifiers(topology: DataFrame): DataFrame =
    topology
      .select(
        col("region_id"),
        concat(lit("server_"), unix_micros(col("snapshot_ts")).cast("string")).as("qualifier"),
        col("server"))
      .select(
        col("region_id"),
        col("qualifier"),
        element_at(split(col("qualifier"), "_"), 2).cast("long").as("parsed_ts_us"),
        col("server"))

  /** The compactor's RS-port → JMX-port map in its configuration shape
    * ("rsPort:jmxPort,..." — reference `api/configuration/
    * CompactorSettings.java:51-59` `ports()`). */
  val DefaultJmxPortMap: String =
    (0 until 24).map(i => s"${16000 + i}:${10100 + i}").mkString(",")

  /** O-53 tail: server-name parsing for both shapes the reference accepts
    * — `host,port,startcode` (ServerName.toString) and `host:port` — the
    * host:port identity used for server matching, and the JMX-port lookup
    * (reference `api/compactor/SingleServerCompactorManager.java:53-58`,
    * `api/configuration/CompactorSettings.java:51-59`). Fixture server
    * strings derive deterministically from `supplier`; the JMX map is a
    * configuration constant parsed driver-side exactly as the reference
    * does (a handful of entries — broadcast by construction). */
  def serverPorts(suppliers: DataFrame, jmxPortMap: String = DefaultJmxPortMap): DataFrame = {
    val hostN = col("s_suppkey") % 24
    val host = concat(lit("host-"), hostN.cast("string"), lit(".dc.local"))
    val rsPort = (hostN + 16000L).cast("string")
    val named = suppliers.select(
      col("s_suppkey").as("id"),
      when(col("s_suppkey") % 2 === 0,
        concat(host, lit(","), rsPort, lit(","), (col("s_suppkey") + 1700000000L).cast("string")))
        .otherwise(concat(host, lit(":"), rsPort)).as("server_name"))
    val parsed = named
      .select(
        col("id"), col("server_name"),
        regexp_extract(col("server_name"), "^([^,:]+)", 1).as("host"),
        regexp_extract(col("server_name"), "^[^,:]+[,:](\\d+)", 1).cast("int").as("rs_port"))
      .withColumn("host_port", concat(col("host"), lit(":"), col("rs_port").cast("string")))
    val entries = jmxPortMap.split(",").toSeq.map { p =>
      val i = p.indexOf(":")
      require(i > 0 && i < p.length - 1,
        s"malformed port mapping '$p' (expected rsPort:jmxPort) in: $jmxPortMap")
      (p.substring(0, i).toInt, p.substring(i + 1).toInt)
    }
    val jmx = suppliers.sparkSession.createDataFrame(entries).toDF("rs_port_key", "jmx_port")
    parsed
      .join(broadcast(jmx), parsed("rs_port") === jmx("rs_port_key"), "left")
      .select(col("id"), col("server_name"), col("host"), col("rs_port"),
        col("host_port"), col("jmx_port"))
  }

  /** O-51: snapshot name mangling `snp_<table>_<yyyyMMdd_HHmmss>`
    * (`api/common/HBaseStaticHelper.java:16,21`). */
  def snapshotNames(orders: DataFrame): DataFrame =
    orders
      .select(
        col("o_orderkey").as("snapshot_id"),
        concat(lit("t"), (col("o_orderkey") % 16).cast("string")).as("table_name"),
        col("o_orderdate").cast("timestamp").as("created"))
      .select(
        col("snapshot_id"),
        concat(lit("snp_"), col("table_name"), lit("_"),
          date_format(col("created"), "yyyyMMdd_HHmmss")).as("snapshot_name"))
}

object EventsPack extends QueryPack {
  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_tumbling" -> ((s, d) => EventsOps.tumbling(ev(s, d))),
    "ev_sliding" -> ((s, d) => EventsOps.sliding(ev(s, d))),
    "ev_sessions" -> ((s, d) => EventsOps.sessions(ev(s, d))),
    "ev_json" -> ((s, d) => EventsOps.jsonProps(ev(s, d))),
    "parse_qualifiers" -> ((s, d) =>
      EventsOps.parseQualifiers(graft.cluster.ClusterViews.topology(s, d))),
    "snap_names" -> ((s, d) => EventsOps.snapshotNames(Tables.orders(s, d))),
    "server_ports" -> ((s, d) => EventsOps.serverPorts(Tables.supplier(s, d))),
    "value_drift" -> ((s, d) => EventsOps.valueDrift(ev(s, d))),
    "co_activity" -> ((s, d) => EventsOps.coActivity(ev(s, d)))
  )

  override def oracles: Map[String, String] = Map(
    // the oracle is the DIRECT interval join — the binned Spark rewrite
    // must produce the identical pair set
    "co_activity" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        |  FROM events
        |),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_t IS NULL OR t - prev_t >= 300000000 THEN 1 ELSE 0 END AS ns
        |  FROM ordered
        |),
        |numbered AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sn
        |  FROM flagged
        |),
        |sess AS (
        |  SELECT user_id, MIN(t) AS s_us, MAX(t) + 300000000 AS e_us
        |  FROM numbered GROUP BY user_id, sn
        |)
        |SELECT a.user_id AS ua, b.user_id AS ub,
        |       a.s_us AS a_start_us, b.s_us AS b_start_us,
        |       LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS overlap_us
        |FROM sess a JOIN sess b
        |  ON a.user_id < b.user_id AND a.s_us < b.e_us AND b.s_us < a.e_us""".stripMargin,
    "value_drift" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
        |         SUM(CAST(value AS DECIMAL(18,6))) AS sv
        |  FROM events GROUP BY 1, 2
        |),
        |m AS (
        |  SELECT event_type, day, n,
        |         CAST(FLOOR(CAST(sv AS DOUBLE) / n * 10000 + 0.5) AS BIGINT) AS mean_e4
        |  FROM d
        |)
        |SELECT event_type, day, n, mean_e4,
        |       COALESCE(mean_e4 - LAG(mean_e4) OVER (PARTITION BY event_type ORDER BY day), 0) AS delta_e4
        |FROM m""".stripMargin,
    "ev_tumbling" ->
      """SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ev_sliding" ->
      """WITH expanded AS (
        |  SELECT event_type,
        |         ((epoch_us(ts) // 300000000) - s.i) * 300000000 AS window_start_us,
        |         epoch_us(ts) AS t
        |  FROM events, range(0, 2) s(i)
        |)
        |SELECT window_start_us, event_type, COUNT(*) AS n
        |FROM expanded
        |WHERE t >= window_start_us AND t < window_start_us + 600000000
        |GROUP BY 1, 2""".stripMargin,
    "ev_sessions" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t, CAST(value AS DECIMAL(18,2)) AS v,
        |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        |  FROM events
        |),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_t IS NULL OR t - prev_t >= 300000000 THEN 1 ELSE 0 END AS new_session
        |  FROM ordered
        |),
        |numbered AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        |  FROM flagged
        |)
        |SELECT user_id, MIN(t) AS session_start_us, COUNT(*) AS n_events,
        |       CAST(SUM(v) AS DOUBLE) AS val_sum
        |FROM numbered GROUP BY user_id, session_no""".stripMargin,
    "ev_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
        |FROM events GROUP BY event_type""".stripMargin,
    "parse_qualifiers" ->
      """WITH topology AS (
        |  SELECT o_orderkey % 2048 AS region_id,
        |         o_orderdate AS snapshot_ts,
        |         's' || CAST((o_orderkey * 11 + o_custkey) % 24 AS VARCHAR) AS server
        |  FROM orders
        |),
        |q AS (
        |  SELECT region_id,
        |         'server_' || CAST(epoch_us(snapshot_ts) AS VARCHAR) AS qualifier, server
        |  FROM topology
        |)
        |SELECT region_id, qualifier,
        |       CAST(string_split(qualifier, '_')[2] AS BIGINT) AS parsed_ts_us,
        |       server
        |FROM q""".stripMargin,
    "snap_names" ->
      """SELECT o_orderkey AS snapshot_id,
        |       'snp_t' || CAST(o_orderkey % 16 AS VARCHAR) || '_'
        |         || strftime(o_orderdate, '%Y%m%d_%H%M%S') AS snapshot_name
        |FROM orders""".stripMargin,
    "server_ports" ->
      """WITH named AS (
        |  SELECT s_suppkey AS id,
        |         CASE WHEN s_suppkey % 2 = 0
        |              THEN 'host-' || CAST(s_suppkey % 24 AS VARCHAR) || '.dc.local,'
        |                   || CAST(16000 + s_suppkey % 24 AS VARCHAR) || ','
        |                   || CAST(1700000000 + s_suppkey AS VARCHAR)
        |              ELSE 'host-' || CAST(s_suppkey % 24 AS VARCHAR) || '.dc.local:'
        |                   || CAST(16000 + s_suppkey % 24 AS VARCHAR)
        |         END AS server_name
        |  FROM supplier
        |),
        |parsed AS (
        |  SELECT id, server_name,
        |         regexp_extract(server_name, '^([^,:]+)', 1) AS host,
        |         CAST(regexp_extract(server_name, '^[^,:]+[,:]([0-9]+)', 1) AS INTEGER) AS rs_port
        |  FROM named
        |),
        |jmx AS (SELECT CAST(16000 + i AS INTEGER) AS rs_port_key,
        |               CAST(10100 + i AS INTEGER) AS jmx_port
        |        FROM range(0, 24) t(i))
        |SELECT p.id, p.server_name, p.host, p.rs_port,
        |       p.host || ':' || CAST(p.rs_port AS VARCHAR) AS host_port,
        |       j.jmx_port
        |FROM parsed p LEFT JOIN jmx j ON p.rs_port = j.rs_port_key""".stripMargin
  )
}
