package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Table readers for the driver-generated test tables (TESTDATA.md),
  * behind a connector seam.
  *
  * Reads stay lazy/declarative so Catalyst pushes filters and prunes
  * columns into the scan — callers should `select` only what they need
  * and let the optimizer do the rest.
  *
  * Connector seam: the source format is CONFIGURATION, not code. By
  * default a table name resolves to `<dir>/<name>.parquet`; a deployment
  * swaps in any DSv2 connector (e.g. an HBase-connector catalog read) by
  * setting session confs — no operator changes:
  *
  *   - `graft.source.format`        DSv2 short name (default "parquet")
  *   - `graft.source.suffix`        path suffix for path-addressed formats
  *                                  (default ".parquet")
  *   - `graft.source.nameAddressed` "true" for connectors that address
  *                                  tables by name/catalog option instead
  *                                  of a filesystem path (hbase-spark
  *                                  style); the table name is passed as
  *                                  the `graft.table` reader option
  *   - `graft.source.option.<k>`    forwarded to the reader as option k
  *                                  (connection, catalog, etc.)
  */
object Tables {
  val FormatKey = "graft.source.format"
  val SuffixKey = "graft.source.suffix"
  val NameAddressedKey = "graft.source.nameAddressed"
  val OptionPrefix = "graft.source.option."
  val TableNameOption = "graft.table"

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Configured source format (the connector seam's one format knob). */
  private[sources] def sourceFormat(spark: SparkSession): String =
    spark.conf.get(FormatKey, "parquet")

  /** All `graft.source.option.<k>` confs, stripped of the prefix —
    * forwarded verbatim to every seam reader AND writer. */
  private[sources] def sourceOptions(spark: SparkSession): Map[String, String] =
    spark.conf.getAll.collect {
      case (k, v) if k.startsWith(OptionPrefix) => k.stripPrefix(OptionPrefix) -> v
    }

  private def configuredReader(spark: SparkSession): (DataFrameReader, String, Boolean) = {
    val suffix = spark.conf.get(SuffixKey, ".parquet")
    val nameAddressed = spark.conf.get(NameAddressedKey, "false").toBoolean
    (spark.read.format(sourceFormat(spark)).options(sourceOptions(spark)), suffix, nameAddressed)
  }

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val (reader, suffix, nameAddressed) = configuredReader(spark)
    if (nameAddressed) reader.option(TableNameOption, name).load()
    else reader.load(s"$sfDir/$name$suffix")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "region")
  /** events.ts normalizes to TimestampType (micros, UTC) whatever the
    * fixture's physical type: nanosecond parquet arrives as a long
    * (spark.sql.legacy.parquet.nanosAsLong, set by GraftSession/Verify/
    * Bench), micros-without-tz arrives as TIMESTAMP_NTZ (a no-op
    * reinterpretation under the UTC session zone), and a plain TIMESTAMP
    * passes through. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = read(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")
}
