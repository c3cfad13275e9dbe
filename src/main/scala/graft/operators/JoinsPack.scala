package graft.operators

import graft.QueryPack
import graft.cluster.{ClusterSql, ClusterViews}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Composite multi-join analytics — the query shapes Catalyst's join
  * planning exists for: a 5-table star join with pushed-down filters and
  * broadcast dims (nation/region are O(10) rows; customer is broadcast-
  * able under the default threshold at these SFs; lineitem⋈orders is the
  * one real shuffle), and a top-k over a large aggregate.
  *
  * Revenue math is exact decimal end-to-end (order-independent across
  * any shuffle partitioning — required both for the oracle and for
  * run-to-run determinism on a real cluster).
  */
object JoinsOps {

  def revenueByNation(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame = {
    val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
    lineitem
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select(col("l_orderkey"), rev.as("rev"))
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev")).as("revenue"))
      .select(col("region_name"), col("nation_name"), col("n_items"),
        col("revenue").cast("double").as("revenue"))
  }

  /** Generic as-of join: for each left row, the LATEST right row with
    * right-ts <= left-ts on the same key — the temporal-join operator
    * Spark SQL lacks natively.
    *
    * Shape: tag both sides, union, ONE window per key ordered by
    * (ts, side) carrying the right values forward with
    * last(ignoreNulls) — a single shuffle on the key. Never a range
    * join (O(L×R) comparisons) and never a per-row lookup; this is the
    * formulation that survives billions of left rows against millions
    * of right rows. Ties (right-ts == left-ts) count as already
    * effective — floorEntry semantics, the right row sorts first.
    *
    * Contract: right rows must be unique per (key, ts) — pre-aggregate
    * if not, or "latest" is ill-defined in any engine. Right rows with a
    * NULL timestamp are dropped (a NULL never satisfies ts <= t in SQL
    * ASOF semantics; unfiltered they would sort first and leak into
    * every match), and a left row with a NULL timestamp gets NULL right
    * values for the same reason. A NULL in a right VALUE column is
    * treated as "no update" (the previous value carries forward), a
    * consequence of the ignoreNulls fill.
    *
    * Skew caveat: parallelism is per key — a single dominant key
    * serializes through one window partition, as ANY per-key temporal
    * ordering must (AQE cannot split a window). If one key carries a
    * disproportionate share of left rows, use [[asofJoinSharded]]. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String): DataFrame =
    asofJoinImpl(left, right, key, leftTs, rightTs, numShards = 1)

  /** [[asofJoin]] with the dominant-key skew mitigation: left rows are
    * split into `numShards` shards (a deterministic function of the left
    * timestamp), each key's FULL right slice is replicated into every
    * shard, and the per-key window runs per (key, shard) — so a hot
    * key's left rows flow through `numShards` parallel window partitions
    * instead of serializing through one. Results are identical to
    * [[asofJoin]]: each shard sees the complete right history for its
    * key, so every left row still finds the latest right row <= its ts.
    *
    * Cost: the right side is written `numShards` times into the shuffle
    * — the standard replicate-the-small-side skew trade, sized for the
    * as-of shape (billions of left rows against bounded per-key right
    * histories). When the RIGHT side is also huge, shard by time range
    * instead and seed each range with its predecessor's last row —
    * a different operator, not this one. */
  def asofJoinSharded(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      numShards: Int = 8): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    asofJoinImpl(left, right, key, leftTs, rightTs, numShards)
  }

  private def asofJoinImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      numShards: Int): DataFrame = {
    val rightVals = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    require(rightVals.nonEmpty, "right side carries no value columns")
    val reserved = Set("__ats", "__side", "__shard")
    require((left.columns ++ right.columns).forall(c => !reserved(c)),
      "column names __ats/__side/__shard are reserved by asofJoin")
    // Spark resolves column names case-insensitively by default, so the
    // collision check must too — a case-only clash would silently null
    // out the left column instead of erroring
    val clash = rightVals.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      .intersect(left.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet)
    require(clash.isEmpty, s"left/right value column collision: ${clash.mkString(", ")}")
    // any deterministic left-row -> shard function preserves correctness
    // (each shard carries the full right slice); hashing EVERY left
    // column keeps the assignment a pure function of the data while
    // spreading the common skew shape the timestamp alone can't — many
    // rows of one hot key sharing a constant/default timestamp
    val lShard =
      if (numShards == 1) lit(0L)
      else pmod(hash(left.columns.map(col).toSeq: _*).cast("long"), lit(numShards.toLong))
    val lTagged = rightVals.foldLeft(
      left.withColumn("__ats", col(leftTs)).withColumn("__side", lit(1))
        .withColumn("__shard", lShard)) { (df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val rTagged = {
      val filtered = right.filter(col(rightTs).isNotNull)
      val replicated =
        if (numShards == 1) filtered.withColumn("__shard", lit(0L))
        else filtered.crossJoin(
          broadcast(right.sparkSession.range(numShards).withColumnRenamed("id", "__shard")))
      val base = replicated
        .select(col(key) +: col("__shard") +: col(rightTs).as("__ats") +: rightVals.map(col): _*)
        .withColumn("__side", lit(0))
      left.columns.filterNot(_ == key).foldLeft(base) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }
    val w = Window.partitionBy(col(key), col("__shard")).orderBy(col("__ats"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lTagged.unionByName(rTagged)
      .select(left.columns.map(col) ++ (col("__side") +:
        rightVals.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
      .filter(col("__side") === 1)
      .drop("__side", "__shard")
  }

  def topCustomers(orders: DataFrame, customer: DataFrame, k: Int = 10): DataFrame =
    orders
      .groupBy("o_custkey")
      .agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total").desc, col("o_custkey"))
      .limit(k)
      .join(customer.select(col("c_custkey"), col("c_name")), col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("custkey"), col("c_name").as("name"),
        col("total").cast("double").as("total_spend"), col("n_orders"))
}

object JoinsPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "revenue_nat" -> ((s, d) => JoinsOps.revenueByNation(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
      Tables.nation(s, d), Tables.region(s, d))),
    "top_customers" -> ((s, d) => JoinsOps.topCustomers(Tables.orders(s, d), Tables.customer(s, d))),
    // which server hosted each order's (customer-keyed) region at order
    // time: orders as-of joined against the deduped topology history
    "asof_join" -> { (s, d) => asofQuery(s, d, sharded = false) },
    // the identical question through the skew-sharded plan (8 time shards
    // per key), oracled against the same native ASOF JOIN — proving the
    // shard/replicate/union rewrite is answer-preserving on real data
    "asof_sharded" -> { (s, d) => asofQuery(s, d, sharded = true) }
  )

  private[graft] def asofQuery(s: SparkSession, d: String, sharded: Boolean): DataFrame = {
    val topo = ClusterViews.topology(s, d)
    val perTs = Window.partitionBy("region_id", "snapshot_ts").orderBy(col("obs_id").desc)
    val right = topo.withColumn("rn", row_number().over(perTs)).filter(col("rn") === 1)
      .select(col("region_id"), col("snapshot_ts"), col("server"))
    val left = Tables.orders(s, d).select(
      col("o_orderkey").as("evt_id"),
      (col("o_custkey") % 2048).as("region_id"),
      col("o_orderdate").cast("timestamp").as("ts"))
    val joined =
      if (sharded) JoinsOps.asofJoinSharded(left, right, "region_id", "ts", "snapshot_ts")
      else JoinsOps.asofJoin(left, right, "region_id", "ts", "snapshot_ts")
    joined.select(col("evt_id"), col("region_id"), unix_micros(col("ts")).as("ts_us"), col("server"))
  }

  override def oracles: Map[String, String] = Map(
    "revenue_nat" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY r_name, n_name""".stripMargin,
    "top_customers" ->
      """WITH agg AS (
        |  SELECT o_custkey,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
        |         COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey
        |  ORDER BY total DESC, o_custkey LIMIT 10
        |)
        |SELECT a.o_custkey AS custkey, c.c_name AS name,
        |       CAST(a.total AS DOUBLE) AS total_spend, a.n_orders
        |FROM agg a JOIN customer c ON a.o_custkey = c.c_custkey""".stripMargin,
    // the oracle engine HAS a native ASOF JOIN — ideal independent check
    // of the union+window formulation
    "asof_join" -> asofOracle,
    // same oracle on purpose: the sharded plan must be answer-identical
    "asof_sharded" -> asofOracle
  )

  private val asofOracle =
      s"""WITH ${ClusterSql.topology},
         |dedup AS (
         |  SELECT region_id, snapshot_ts, server FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY region_id, snapshot_ts ORDER BY obs_id DESC) AS rn
         |    FROM topology
         |  ) WHERE rn = 1
         |),
         |l AS (
         |  SELECT o_orderkey AS evt_id, o_custkey % 2048 AS region_id,
         |         CAST(o_orderdate AS TIMESTAMP) AS ts
         |  FROM orders
         |)
         |SELECT l.evt_id, l.region_id, epoch_us(l.ts) AS ts_us, d.server
         |FROM l ASOF LEFT JOIN dedup d
         |  ON l.region_id = d.region_id AND l.ts >= d.snapshot_ts""".stripMargin
}
