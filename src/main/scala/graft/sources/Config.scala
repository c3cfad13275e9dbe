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
    "checker.check.interval.seconds" -> "900",
    // auth seam (reference CommonOptions: principal/keytab default empty
    // = unsecured; site files default to the stock hadoop conf paths)
    "principal" -> "",
    "keytab" -> "",
    "core.site" -> "/etc/hbase/conf/core-site.xml",
    "hdfs.site" -> "/etc/hbase/conf/hdfs-site.xml",
    "hbase.site" -> "/etc/hbase/conf/hbase-site.xml")

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

/** Kerberos/identity seam — the Spark re-expression of the reference's
  * auth subsystem (`runner/UGIExecutor.java:22-90` keytab login + doAs +
  * TGT-renewal thread; `runner/StaticConnector.java:33-58` settings →
  * principal/keytab/site-xml → Configuration).
  *
  * A Spark job does NOT doAs around each call the way a threads-and-RPC
  * tool does: identity is declared ONCE at submit time
  * (`spark.kerberos.principal` / `spark.kerberos.keytab`) and Spark's own
  * machinery performs the keytab login, the periodic TGT relogin
  * (`spark.kerberos.relogin.period` — the renewal thread the reference
  * hand-rolls), and delegation-token distribution to every executor
  * (which UGIExecutor cannot do at all — its UGI is process-local, a
  * 1000-executor job needs tokens shipped, not a driver-side doAs). So
  * the seam maps the SAME settings keys the reference reads
  * (`principal`, `keytab`, `core.site`, `hdfs.site`, `hbase.site` —
  * `HBaseToolsOptions.CommonOptions`) onto the submit-time conf and the
  * Hadoop resource list, instead of porting the doAs executor.
  *
  * [[withLoginFallback]] keeps the one genuinely per-call behavior —
  * doActionAndReturnResult's secured-then-unsecured fallback for
  * DRIVER-side admin actions (the fix-script/report sinks' seam) — with
  * the privileged runner injected, so the contract is testable without a
  * KDC. No Kerberos RPC happens in this sandbox by design; the seam is
  * configuration + control flow, which is all the reference's subsystem
  * is once the HBase RPCs themselves are out of scope. */
object SecurityContext {
  val Principal = "principal"
  val Keytab = "keytab"
  val CoreSite = "core.site"
  val HdfsSite = "hdfs.site"
  val HbaseSite = "hbase.site"

  /** Secured iff both principal and keytab are configured — the same
    * all-or-nothing check StaticConnector's checkParameters applies. */
  def secured(s: GraftSettings): Boolean =
    s.string(Principal).nonEmpty && s.string(Keytab).nonEmpty

  /** The submit-time Spark conf derived from the settings: empty when
    * unsecured (plain-auth cluster), the three kerberos confs when
    * secured. `reloginPeriodMinutes` is the reference's startRenewTask
    * cadence expressed as Spark's relogin conf. */
  def sparkSubmitConf(s: GraftSettings, reloginPeriodMinutes: Int = 10): Map[String, String] =
    if (!secured(s)) Map.empty
    else Map(
      "spark.kerberos.principal" -> s.string(Principal),
      "spark.kerberos.keytab" -> s.string(Keytab),
      "spark.kerberos.relogin.period" -> s"${reloginPeriodMinutes}m")

  /** The Hadoop resource files a connector Configuration must add
    * (StaticConnector.getDefaultConfig's three addResource calls),
    * filtered to files that exist — a missing site file on an edge node
    * falls back to defaults there too. */
  def hadoopResources(s: GraftSettings): Seq[String] =
    Seq(CoreSite, HdfsSite, HbaseSite)
      .map(s.string)
      .filter(p => p.nonEmpty && new java.io.File(p).isFile)

  /** doActionAndReturnResult's contract: run the privileged action; on
    * failure log and retry UNSECURED; if that also fails, fail the
    * action (the reference wraps in RuntimeException). The privileged
    * runner is a plain thunk here — in production it closes over
    * `ugi.doAs`; in tests it closes over a fake.
    *
    * '''Callers must pass an IDEMPOTENT action.''' The catch is
    * deliberately broad (the reference's contract), which carries two
    * hazards the reference leaves implicit: (1) the WHOLE action re-runs
    * unsecured, so a non-idempotent mutation that partially succeeded
    * before an unrelated failure (timeout after the first of N batch
    * puts) executes its prefix twice; (2) the retry silently DOWNGRADES
    * security — an action that should only ever run authenticated must
    * not be routed through here (call `privileged()` directly and let it
    * fail). Route only read-only or replay-safe admin actions through
    * the fallback; `onFallback` is the audit hook — log the downgrade. */
  def withLoginFallback[T](
      privileged: () => T,
      unsecured: () => T,
      onFallback: Throwable => Unit = _ => ()): T =
    try privileged()
    catch {
      case e: Exception =>
        onFallback(e)
        try unsecured()
        catch {
          case e2: Exception =>
            e2.addSuppressed(e)
            throw new RuntimeException("action failed in secured and unsecured contexts", e2)
        }
    }
}
