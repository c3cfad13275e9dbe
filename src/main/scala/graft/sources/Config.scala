package graft.sources

import java.io.StringReader
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** O-11 typed settings registry (reference
  * `api/configuration/HBaseToolsSettings.java:22-37`, option catalog
  * `HBaseToolsOptions.java:9-133`): defaults + typed accessors + warnings
  * for unknown keys. */
case class GraftSettings(props: Map[String, String]) {
  import GraftSettings._
  def long(key: String): Long = props.getOrElse(key, Defaults(key)).toLong
  def double(key: String): Double = props.getOrElse(key, Defaults(key)).toDouble
  def string(key: String): String = props.getOrElse(key, Defaults(key))
  def unknownKeys: Seq[String] = props.keys.filterNot(Defaults.contains).toSeq.sorted
}

object GraftSettings {
  /** Reference defaults (BASELINE.md operating envelope). */
  val Defaults: Map[String, String] = Map(
    "compactor.parallel.compactions" -> "2",
    "compactor.store.size.mb" -> "100",
    "compactor.border.weight" -> "15",
    "compactor.recalculate.region.count" -> "15",
    "compactor.max.compactions.border" -> "11",
    "compactor.max.flushes.border" -> "31",
    "flusher.thread.count" -> "3",
    "flusher.memstore.memory.border.mb" -> "1",
    "merger.regions.min-storefile-size-mb" -> "64",
    "merger.regions.max-merged-storefile-size-mb" -> "8192",
    "distributor.region.weight.border" -> "5",
    "distributor.recalculate.table.count" -> "15",
    "splitter.divide.multiplier" -> "1.1",
    "technical.meta.scan.period.sec" -> "3600",
    "checker.check.interval.seconds" -> "900")

  def parse(propertiesText: String): GraftSettings = {
    val p = new Properties()
    p.load(new StringReader(propertiesText))
    GraftSettings(p.asScala.toMap)
  }
}

/** O-12/O-13 auxiliary sources. */
object AuxSources {

  /** O-12: external per-server metrics feed (JMX in the reference,
    * `api/jmx/JMXRegionServerMetrics.java:22-74`) — a small driver-built
    * DataFrame; in streaming mode this becomes a rate/readStream feed. */
  def serverMetricsFeed(
      spark: SparkSession,
      rows: Seq[(String, Int, Int, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("server", "compaction_queue", "flush_queue", "percent_files_local")
  }

  /** O-13: table list from a text file (one name per line, '#' comments). */
  def tablesFromFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .toDF("table_name")
  }

  /** O-13: catalog listing by regex mask. */
  def tablesByMask(spark: SparkSession, mask: String): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().select("name").as[String]
      .filter(_.matches(mask)).toDF("table_name")
  }
}
