package graft.operators

import graft.QueryPack
import graft.cluster.{ClusterSql, ClusterViews}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Longitudinal analytics over history tables:
  * cohort retention (users grouped by first-activity month, tracked over
  * subsequent months) and region flapping (how often a region's hosting
  * server changed across topology snapshots — the diagnostic behind the
  * reference's topology diff, aggregated over the full history instead of
  * two points in time).
  *
  * Both are lag/first-touch window patterns partitioned by entity —
  * shuffles once on the entity key, no global ordering anywhere.
  */
object CohortOps {

  /** Cohort retention: for each (cohort_day, activity_day) pair, how many
    * distinct users from that cohort were active. Days are encoded as
    * yyyymmdd ints (engine-exact). */
  def cohortRetention(events: DataFrame): DataFrame = {
    // day granularity (the fixture spans ~a month); a production run
    // would bucket by month with the same shape
    val dayOf = (c: org.apache.spark.sql.Column) =>
      ((year(c) * 100 + month(c)) * 100 + dayofmonth(c)).cast("int")
    val withCohort = events
      .select(col("user_id"), col("ts"))
      .withColumn("cohort_day", min(dayOf(col("ts"))).over(Window.partitionBy("user_id")))
      .withColumn("activity_day", dayOf(col("ts")))
    withCohort
      .groupBy("cohort_day", "activity_day")
      .agg(countDistinct("user_id").as("n_active"))
  }

  /** Region flapping: per region, the number of server changes across its
    * (chronologically ordered) placement observations, flagged when
    * changes exceed `flapBorder`. */
  def regionFlapping(topology: DataFrame, flapBorder: Int = 3): DataFrame = {
    val w = Window.partitionBy("region_id").orderBy(col("snapshot_ts"), col("obs_id"))
    topology
      .withColumn("prev_server", lag(col("server"), 1).over(w))
      .withColumn("changed",
        when(col("prev_server").isNotNull && col("prev_server") =!= col("server"), 1L).otherwise(0L))
      .groupBy("region_id")
      .agg(count(lit(1)).as("n_obs"), sum(col("changed")).as("n_moves"))
      .withColumn("flapping", col("n_moves") > flapBorder)
  }
}

object CohortPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cohort_ret" -> ((s, d) => CohortOps.cohortRetention(Tables.events(s, d))),
    "region_flapping" -> ((s, d) => CohortOps.regionFlapping(ClusterViews.topology(s, d)))
  )

  override def oracles: Map[String, String] = Map(
    "cohort_ret" ->
      """WITH m AS (
        |  SELECT user_id,
        |         CAST((year(ts) * 100 + month(ts)) * 100 + dayofmonth(ts) AS INT) AS activity_day,
        |         MIN(CAST((year(ts) * 100 + month(ts)) * 100 + dayofmonth(ts) AS INT))
        |           OVER (PARTITION BY user_id) AS cohort_day
        |  FROM events
        |)
        |SELECT cohort_day, activity_day, COUNT(DISTINCT user_id) AS n_active
        |FROM m GROUP BY 1, 2""".stripMargin,
    "region_flapping" ->
      s"""WITH ${ClusterSql.topology},
         |lagged AS (
         |  SELECT region_id, server,
         |         LAG(server) OVER (PARTITION BY region_id ORDER BY snapshot_ts, obs_id) AS prev_server
         |  FROM topology
         |)
         |SELECT region_id, COUNT(*) AS n_obs,
         |       CAST(SUM(CASE WHEN prev_server IS NOT NULL AND prev_server <> server
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_moves,
         |       SUM(CASE WHEN prev_server IS NOT NULL AND prev_server <> server
         |                THEN 1 ELSE 0 END) > 3 AS flapping
         |FROM lagged GROUP BY region_id""".stripMargin
  )
}
