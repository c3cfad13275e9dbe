package graft.plans

import graft.cluster.ClusterViews
import graft.model.{EventType, Finding, FixDestination, Severity}
import graft.operators._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed action plans — the "action half" of the reference's tools
  * re-expressed as emitted plans (SURVEY.md: Spark is not an HBase
  * master; instead of issuing admin RPCs we emit a Dataset of commands
  * that an operator-side runner or the fix-script sink consumes).
  *
  * Each emitter is the corresponding analytics operator + a typed
  * projection; `fixScript` routes any plan into the O-10 sink format.
  */
case class CompactionAction(server: String, region_id: Long, table_name: String, weight_e4: Long, rnk: Int)
case class MergeAction(table_name: String, left_region: Long, right_region: Long, merged_size_mb: Long)
case class MoveAction(table_name: String, region_id: Long, from_server: String, to_server: String)
case class SplitAction(table_name: String, region_id: Long, size_mb: Long, rnk: Int, split_point: Long)
case class FlushAction(server: String, region_id: Long, mem_store_mb: Long, rnk: Int)
case class ClearQueueAction(server: String, queues: String)

object ActionPlans {

  def compactionActions(spark: SparkSession, sfDir: String): Dataset[CompactionAction] = {
    import spark.implicits._
    CompactionOps.planFromSf(spark, sfDir).as[CompactionAction]
  }

  def mergeActions(spark: SparkSession, sfDir: String): Dataset[MergeAction] = {
    import spark.implicits._
    MergerOps.mergePlan(
      ClusterViews.regionInfo(spark, sfDir), ClusterViews.regionMetrics(spark, sfDir),
      smallMb = 7000L, maxMergedMb = 15000L).as[MergeAction]
  }

  def moveActions(spark: SparkSession, sfDir: String): Dataset[MoveAction] = {
    import spark.implicits._
    DistributionOps.movePlan(
      ClusterViews.regionMetrics(spark, sfDir), ClusterViews.servers(spark)).as[MoveAction]
  }

  def splitActions(spark: SparkSession, sfDir: String): Dataset[SplitAction] = {
    import spark.implicits._
    SplitterOps.splitPlan(
      ClusterViews.regionInfo(spark, sfDir), ClusterViews.regionMetrics(spark, sfDir))
      .as[SplitAction]
  }

  def flushActions(spark: SparkSession, sfDir: String): Dataset[FlushAction] = {
    import spark.implicits._
    CoverageOps.flushQueue(ClusterViews.regionMetrics(spark, sfDir)).as[FlushAction]
  }

  /** COMPACTION_CLEANER (reference
    * `common/HBaseCompactionQueueCleaner.java:19-31`: clear the long+short
    * compaction queues on every RegionServer): one action per live server,
    * routed through the fix-script sink or [[perServerFanout]]. */
  def clearQueueActions(spark: SparkSession): Dataset[ClearQueueAction] = {
    import spark.implicits._
    ClusterViews.servers(spark)
      .select(col("server"), lit("long,short").as("queues")).as[ClearQueueAction]
  }

  /** Route any plan into findings → ReportSinks.renderFixScript emits the
    * runnable `fix-cluster-<ts>.sh` (O-10). */
  def toFindings(plan: DataFrame, kind: String): Dataset[Finding] = {
    import plan.sparkSession.implicits._
    val (obj, cmd) = kind match {
      case "compact" => (col("region_id"), concat(lit("major_compact '"), col("region_id"), lit("'")))
      case "merge" => (col("left_region"),
        concat(lit("merge_region '"), col("left_region"), lit("', '"), col("right_region"), lit("'")))
      case "move" => (col("region_id"),
        concat(lit("move '"), col("region_id"), lit("', '"), col("to_server"), lit("'")))
      case "split" => (col("region_id"),
        concat(lit("split '"), col("region_id"), lit("', '"), col("split_point"), lit("'")))
      case "flush" => (col("region_id"), concat(lit("flush '"), col("region_id"), lit("'")))
      case "clear_queues" => (col("server"),
        concat(lit("clear_compaction_queues '"), col("server"), lit("', ['"),
          regexp_replace(col("queues"), ",", "','"), lit("']")))
      case other => throw new IllegalArgumentException(s"unknown plan kind: $other")
    }
    // server-scoped plans are REGION_SERVER findings; everything else
    // operates on a region
    val eventType = if (kind == "clear_queues") EventType.RegionServer else EventType.Region
    plan.select(
      lit(eventType).as("eventType"),
      obj.cast("string").as("objectName"),
      lit(s"$kind plan entry").as("problem"),
      lit(Severity.Normal).as("severity"),
      lit(FixDestination.HBaseShell).as("fixDestination"),
      cmd.as("command")).as[Finding]
  }

  /** Per-server task fan-out (reference `api/rstask/RSTask.java:18-23` +
    * `RSTaskController.java:14-50`: one jittered task per RegionServer).
    * Spark-native: repartition on the server key places each server's
    * rows on one executor partition; the action runs there, jittered by a
    * hash of the partition's first server name — deterministic, unlike
    * the reference's Random, so runs are reproducible. Several servers
    * may share a partition (hash partitioning); they are processed
    * consecutively off a sorted iterator, buffering ONE server's rows at
    * a time (never the whole partition), and the jitter fires once per
    * partition — per-server sleeps inside a sequential partition would
    * stack into a sum, not a stagger. */
  def perServerFanout(
      plan: DataFrame,
      serverCol: String,
      maxJitterMs: Long = 0L)(
      action: (String, Seq[org.apache.spark.sql.Row]) => Unit): Unit =
    plan.repartition(col(serverCol)).sortWithinPartitions(col(serverCol))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val buf = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
        var current: String = null
        var jittered = false
        def flush(): Unit = if (buf.nonEmpty) {
          if (maxJitterMs > 0 && !jittered) {
            Thread.sleep(math.abs(Option(current).getOrElse("").hashCode.toLong) % maxJitterMs)
            jittered = true
          }
          action(current, buf.toSeq)
          buf.clear()
        }
        it.foreach { r =>
          val srv = r.getAs[String](serverCol)
          if (buf.nonEmpty && !java.util.Objects.equals(srv, current)) flush()
          current = srv
          buf += r
        }
        flush()
      }
}
