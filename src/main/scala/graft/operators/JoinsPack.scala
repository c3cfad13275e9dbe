package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    "top_customers" -> ((s, d) => JoinsOps.topCustomers(Tables.orders(s, d), Tables.customer(s, d)))
  )

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
        |FROM agg a JOIN customer c ON a.o_custkey = c.c_custkey""".stripMargin
  )
}
