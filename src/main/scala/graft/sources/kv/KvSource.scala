package graft.sources.kv

import java.util.concurrent.ConcurrentHashMap

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-memory, name-addressed DataSource V2 connector — the mock
  * region-server store that proves `sources/Tables`' connector seam at
  * the API level, beyond the ORC format swap: reads go through a real
  * `ScanBuilder` with FILTER PUSHDOWN (`SupportsPushDownFilters`) and
  * COLUMN PRUNING (`SupportsPushDownRequiredColumns`) evaluated inside
  * the partition readers — exactly where an hbase-spark connector turns
  * them into row-key ranges and column-family projections (reference:
  * the scan/get surface of `api/HBaseClient.java`) — and writes go
  * through `WriteBuilder`/`BatchWrite` with append and truncate
  * semantics. Partitioned reads split the table into `partitions`
  * slices so operators see a genuinely multi-partition source.
  *
  * The store itself is a process-local map: the point is the connector
  * CONTRACT (what Spark pushes, what the source must honor), which is
  * identical whether rows come from a JVM map or a region server.
  */
class KvSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftkv"

  // writes to not-yet-existing tables take the query's schema
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStore.schemaOf(KvSource.tableName(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new KvTable(KvSource.tableName(opts), schema,
      opts.getInt("partitions", 4),
      Option(opts.get(KvSource.KeyOption)))
  }
}

object KvSource {
  /** Declares the table's physical clustering column (the row-key
    * analogue): reads partition rows BY DISTINCT KEY VALUE and report
    * [[KeyGroupedPartitioning]] so Spark can plan storage-partitioned
    * joins/aggregations WITHOUT an exchange — the DSv2 contract through
    * which an hbase-style connector tells Spark "rows already live
    * grouped by key on the region servers, don't reshuffle them".
    * Requires `spark.sql.sources.v2.bucketing.enabled=true` to take
    * effect; without it Spark ignores the report and plans exchanges as
    * before. */
  val KeyOption = "graft.key"

  /** Name-addressed via `graft.table`, or path-addressed (the seam's
    * writer calls `.save(path)`) with the path string as the key. */
  private[kv] def tableName(options: CaseInsensitiveStringMap): String = {
    val t = options.get(graft.sources.Tables.TableNameOption)
    if (t != null) t
    else {
      val p = options.get("path")
      require(p != null, s"graftkv needs a ${graft.sources.Tables.TableNameOption} option or a path")
      p
    }
  }

  // Observability for the plan-contract specs: what Spark actually
  // pushed into the last scan it built.
  @volatile var lastPushedFilters: Seq[Filter] = Nil
  @volatile var lastPrunedSchema: Option[StructType] = None
  @volatile var lastPushedAggregates: Seq[String] = Nil
  @volatile var lastPushedGroupBy: Seq[String] = Nil
  @volatile var lastPushedLimit: Option[Int] = None
  @volatile var lastPushedTopN: Option[(Seq[String], Int)] = None
  @volatile var lastRuntimeFilters: Seq[Filter] = Nil
}

/** The backing store: table name -> (schema, rows of plain JVM values).
  *
  * Every stored row is STAMPED at write time with two tail values the
  * schema doesn't know about — a wall-clock write timestamp and a
  * store-monotonic sequence — the in-memory analogue of the HBase cell
  * version (timestamp + mvcc sequence a real connector reads off each
  * Cell; cf. the reference's MutationInfo bookkeeping around its
  * buffered mutator). They surface to Spark as the `_ts`/`_seq`
  * METADATA columns via `SupportsMetadataColumns`: invisible to `SELECT
  * *`, served when named, so O-9 keep-latest can run on connector
  * metadata instead of a schema column. `_seq` is the authoritative
  * total order (timestamps can collide within a millisecond).
  *
  * Versioning granularity caveat: a row-level UPDATE/MERGE rewrites its
  * whole GROUP through the copy-on-write path, and this store's one
  * group is the table — so a rewrite re-stamps every surviving row
  * (untouched rows included), unlike HBase, which preserves untouched
  * cells' timestamps. That is the honest face of the documented
  * "no finer replacement unit than the table" contract; metadata-level
  * deletes and plain appends never re-stamp existing rows. */
object KvStore {
  private val tables = new ConcurrentHashMap[String, (StructType, Vector[Seq[Any]])]()

  /** Metadata column names + the stamped tail width. A table whose own
    * schema claims one of these names keeps its data column — the
    * metadata name is simply not advertised (Spark's documented
    * conflict rule). */
  val TsCol = "_ts"
  val SeqCol = "_seq"
  val MetaCols = 2

  private val seqGen = new java.util.concurrent.atomic.AtomicLong(0L)

  private def stamp(rows: Seq[Seq[Any]]): Vector[Seq[Any]] = {
    val now = System.currentTimeMillis()
    rows.toVector.map(r => r :+ now :+ seqGen.incrementAndGet())
  }

  /** Column-name → stored-row index, with the metadata tail mapped
    * behind the schema (unless shadowed by a real schema column) —
    * the one lookup every reader and filter eval shares. */
  def fieldIndex(schema: StructType): Map[String, Int] = {
    val base = schema.fieldNames.zipWithIndex.toMap
    base ++ Seq(TsCol, SeqCol).zipWithIndex.collect {
      case (n, i) if !base.contains(n) => n -> (schema.length + i)
    }
  }

  def put(name: String, schema: StructType, rows: Seq[Seq[Any]]): Unit =
    tables.put(name, (schema, stamp(rows)))

  def append(name: String, schema: StructType, rows: Seq[Seq[Any]]): Unit =
    tables.merge(name, (schema, stamp(rows)),
      (old, add) => (old._1, old._2 ++ add._2))

  // clustering-key registry: recorded when a keyed write commits, so a
  // CATALOG-addressed read (`kvcat.t`) re-plans the same
  // KeyGroupedPartitioning as a path read with `graft.key` — the key is
  // table layout, not a per-reader option, exactly as region boundaries
  // belong to the table
  private val keys = new ConcurrentHashMap[String, String]()
  def setKey(name: String, key: String): Unit = keys.put(name, key)
  def keyOf(name: String): Option[String] = Option(keys.get(name))

  def drop(name: String): Unit = { tables.remove(name); keys.remove(name) }
  def clear(): Unit = { tables.clear(); keys.clear() }
  def contains(name: String): Boolean = tables.containsKey(name)
  def tableNames(): Seq[String] = tables.keySet().asScala.toSeq.sorted

  /** Row-level delete: atomically drop every row matching `pred` —
    * the store-side effect of an HBase Delete mutation batch. Returns
    * the number of rows removed. */
  def deleteWhere(name: String, pred: Seq[Any] => Boolean): Int = {
    var removed = 0
    tables.computeIfPresent(name, (_, t) => {
      val (schema, rows) = t
      val kept = rows.filterNot(pred)
      removed = rows.size - kept.size
      (schema, kept)
    })
    removed
  }

  def schemaOf(name: String): StructType = {
    val t = tables.get(name)
    require(t != null, s"graftkv: unknown table '$name'")
    t._1
  }

  def rowsOf(name: String): Vector[Seq[Any]] = {
    val t = tables.get(name)
    require(t != null, s"graftkv: unknown table '$name'")
    t._2
  }
}

class KvTable(
    tableName: String, tableSchema: StructType, partitions: Int,
    keyCol: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema

  // the cell-version face: `_ts`/`_seq` resolve when NAMED in a query,
  // never appear in SELECT * — schema-name collisions drop the metadata
  // column per Spark's conflict contract (the data column wins)
  override def metadataColumns(): Array[MetadataColumn] = {
    def m(n: String, c: String): MetadataColumn = new MetadataColumn {
      override def name(): String = n
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = c
    }
    Seq(
      KvStore.TsCol -> "cell write timestamp (epoch millis)",
      KvStore.SeqCol -> "store-monotonic write sequence (the mvcc order)")
      .collect { case (n, c) if !tableSchema.fieldNames.contains(n) => m(n, c) }
      .toArray
  }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(tableName, tableSchema, partitions,
      keyCol.filter(tableSchema.fieldNames.contains))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(tableName, info.schema(),
      keyCol.filter(info.schema().fieldNames.contains))

  // Row-level deletes (`SupportsDelete`): `DELETE FROM <kv table> WHERE
  // <pushable predicate>` resolves to one metadata-level deleteWhere on
  // the source — the connector face of an HBase Delete mutation, so
  // O-9's tombstone merge can round-trip through the store it targets
  // (reference: api(client)/SequenceBufferedMutator.java:201-275, where
  // the mutation stream interleaves Puts with Deletes). Only predicates
  // the scan can also push are claimable — a real connector compiles
  // them to row-key ranges; Spark fails loudly on anything else instead
  // of silently rewriting the table.
  private val fieldIdx = KvStore.fieldIndex(tableSchema)
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(KvFilterEval.supported)
  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(canDeleteWhere(filters), s"unsupported delete predicate: ${filters.mkString(", ")}")
    KvStore.deleteWhere(tableName,
      row => filters.forall(f => KvFilterEval.eval(f, n => row(fieldIdx(n)))))
  }

  // Row-level UPDATE / MERGE / unpushable DELETE
  // (`SupportsRowLevelOperations`, group-based copy-on-write): Spark
  // rewrites the command into ReplaceData — scan the affected groups
  // through the op's scan, apply the actions, write the groups back
  // through the op's write. This store has no finer replacement unit
  // than the table (no files, no region snapshots), so the ONE correct
  // group is the whole table: the op's ScanBuilder deliberately claims
  // NO pushdown (a pushed condition would narrow the scan below group
  // granularity and the replace would drop the unscanned rows) and the
  // op's write commits with truncate semantics. Pushable DELETEs never
  // reach this path — Spark prefers the metadata `deleteWhere` above.
  // `MERGE INTO kvcat.t USING updates ...` is the connector face of an
  // HBase checkAndMutate / bulk upsert batch.
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new KvRowLevelOperation(
        tableName, tableSchema, partitions, info.command())
    }
}

class KvRowLevelOperation(
    table: String, full: StructType, partitions: Int,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graftkv row-level $cmd on $table"

  // whole-table group: a bare builder (no pushdown mixins, runtime
  // filtering off) so the scan always reads every row of the group
  // being replaced
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new KvScan(table, full, full, Array.empty, partitions,
          runtimeFilterable = false)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new KvWrite(table, info.schema(), truncate = true, rowLevel = true)
    }
}

/** Minimal DSv2 [[TableCatalog]] over [[KvStore]] — registered as
  * `spark.sql.catalog.<name> = graft.sources.kv.KvCatalog` — so
  * catalog-addressed SQL (`DELETE FROM kvcat.t WHERE ...`, `SELECT ...
  * FROM kvcat.t`) resolves through the same [[KvTable]] as the
  * path/name-addressed reader. The catalog face an hbase-spark
  * connector exposes (HBaseCatalog); creation/rename stay out of scope
  * — tables are materialized by writes or `KvStore.put`. */
class KvCatalog extends TableCatalog {
  private var catalogName: String = "graftkv"
  private var defaultPartitions: Int = 4

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    defaultPartitions = options.getInt("partitions", 4)
  }
  override def name(): String = catalogName

  // the store is FLAT (one namespace): only a bare, dot-free name can
  // resolve — a namespaced or dotted identifier would collide with the
  // '.'-flattening some catalogs do, so it resolves to NOTHING instead
  // of silently joining into an ambiguous store key
  private def tableOf(ident: Identifier): Option[String] =
    if (ident.namespace().nonEmpty || ident.name().contains(".")) None
    else Some(ident.name())

  // SHOW TABLES IN kvcat.ns must list nothing for a namespace that can
  // never resolve — only the flat (empty) namespace holds tables
  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty) Array.empty
    else KvStore.tableNames()
      .map(n => Identifier.of(Array.empty[String], n))
      .toArray

  override def loadTable(ident: Identifier): Table = {
    val t = tableOf(ident).filter(KvStore.contains).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq))
    // the recorded clustering key rides along, so catalog reads plan
    // the same storage-partitioned joins as keyed path reads
    new KvTable(t, KvStore.schemaOf(t), defaultPartitions, KvStore.keyOf(t))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graftkv: alterTable not supported")
  override def dropTable(ident: Identifier): Boolean =
    tableOf(ident).filter(KvStore.contains) match {
      case Some(t) => KvStore.drop(t); true
      case None => false
    }
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graftkv: renameTable not supported")
}

class KvScanBuilder(
    table: String, full: StructType, partitions: Int,
    keyCol: Option[String] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var agg: Option[Aggregation] = None
  private var limit: Option[Int] = None
  private var topN: Option[(Seq[SortOrder], Int)] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(KvFilterEval.supported)
    pushed = sup
    KvSource.lastPushedFilters = sup.toSeq
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
    KvSource.lastPrunedSchema = Some(requiredSchema)
  }

  // Limit / top-N pushdown — the O-3/O-5 scan shapes: a point get is
  // filter + LIMIT 1 (the reference bounds it with scan caching /
  // maxResultSize(1)), a bounded range scan is orderBy(key) + LIMIT k.
  // Both are PARTIAL pushes: each partition reader stops after its local
  // limit (or ships its local top-N) and Spark's global Limit /
  // TakeOrderedAndProject finishes the job — the shape that still works
  // when the "partitions" are a thousand region servers, because what
  // crosses the wire is k rows per region, not the region.
  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    KvSource.lastPushedLimit = Some(l)
    true
  }

  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    val claimable = orders.forall(o => o.expression() match {
      case n: NamedReference => full.fieldNames.contains(n.fieldNames()(0))
      case _ => false
    })
    if (!claimable) false
    else {
      topN = Some((orders.toSeq, l))
      KvSource.lastPushedTopN = Some((orders.map(_.toString).toSeq, l))
      true
    }
  }

  // one override satisfies both interfaces' default method
  override def isPartiallyPushed(): Boolean = true

  // Aggregate pushdown — COUNT(*)/COUNT(col)/MIN/MAX resolved inside the
  // source (COMPLETE, grouped or ungrouped): the scan answers from its
  // own sweep and ships one row per group, the way a real store answers
  // from region statistics instead of streaming every row out. Grouped
  // pushdown plans a single partition (the store is one "region" here);
  // a multi-region connector would return partial per-region rows
  // instead (supportCompletePushDown = false) and let Spark merge.
  private def aggCol(f: AggregateFunc): Option[String] = f match {
    case _: CountStar => Some("*")
    case c: Count if !c.isDistinct => c.column() match {
      case n: NamedReference => Some(n.fieldNames()(0)); case _ => None
    }
    case m: Min => m.column() match {
      case n: NamedReference => Some(n.fieldNames()(0)); case _ => None
    }
    case m: Max => m.column() match {
      case n: NamedReference => Some(n.fieldNames()(0)); case _ => None
    }
    case _ => None
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggregation.groupByExpressions().forall {
      case n: NamedReference => full.fieldNames.contains(n.fieldNames()(0))
      case _ => false
    } && aggregation.aggregateExpressions().forall(
      // schema columns only: an aggregate over a METADATA column (_ts/
      // _seq) is not claimed — the sweep indexes by table schema
      aggCol(_).exists(c => c == "*" || full.fieldNames.contains(c)))

  override def pushAggregation(aggregation: Aggregation): Boolean =
    if (!supportCompletePushDown(aggregation)) false
    else {
      agg = Some(aggregation)
      KvSource.lastPushedAggregates =
        aggregation.aggregateExpressions().map(_.toString).toSeq
      KvSource.lastPushedGroupBy =
        aggregation.groupByExpressions().map(_.toString).toSeq
      true
    }

  override def build(): Scan =
    new KvScan(table, full, required, pushed, partitions, agg, limit, topN, keyCol)
}

class KvScan(
    table: String, full: StructType, required: StructType,
    pushed: Array[Filter], partitions: Int,
    agg: Option[Aggregation] = None,
    limit: Option[Int] = None,
    topN: Option[(Seq[SortOrder], Int)] = None,
    keyCol: Option[String] = None,
    runtimeFilterable: Boolean = true)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportPartitioning with SupportsReportOrdering {
  // after a complete aggregate pushdown the scan's output IS the
  // group-by columns followed by the aggregate columns, positionally —
  // Spark maps readSchema() onto groupings ++ aggregates by index
  private val aggSchema: Option[StructType] = agg.map { a =>
    val groupFields = a.groupByExpressions().map { e =>
      val c = e.asInstanceOf[NamedReference].fieldNames()(0)
      full(c)
    }
    val aggFields = a.aggregateExpressions().zipWithIndex.map { case (f, i) =>
      f match {
        case _: CountStar => StructField(s"agg_$i", LongType)
        case _: Count => StructField(s"agg_$i", LongType)
        case m: Min =>
          val c = m.column().asInstanceOf[NamedReference].fieldNames()(0)
          StructField(s"agg_$i", full(c).dataType)
        case m: Max =>
          val c = m.column().asInstanceOf[NamedReference].fieldNames()(0)
          StructField(s"agg_$i", full(c).dataType)
        case other => throw new IllegalStateException(s"unclaimed aggregate: $other")
      }
    }
    StructType(groupFields ++ aggFields)
  }

  // Runtime (DPP-style) filters arrive on the built scan at execution
  // time, before partition planning — a real connector compiles the IN
  // set into row-key ranges; here the readers evaluate it, which still
  // means the join's build-side keys filter the scan INSIDE the source
  // instead of after a full table ship.
  @volatile private var runtime: Array[Filter] = Array.empty
  // only columns in the scan's OUTPUT are claimable: Spark resolves these
  // against the pruned relation, not the table schema. Row-level-op scans
  // claim NOTHING: advertising filterable columns makes Spark inject a
  // runtime group-filter subquery, and a claimed filter would narrow the
  // scan below the whole-table group granularity the replace write
  // assumes — rows outside the filter would silently vanish from the
  // rewritten table.
  override def filterAttributes(): Array[NamedReference] =
    if (!runtimeFilterable) Array.empty
    else readSchema().fieldNames.map(Expressions.column)
  override def filter(filters: Array[Filter]): Unit = {
    runtime = filters.filter(KvFilterEval.supported)
    KvSource.lastRuntimeFilters = runtime.toSeq
  }
  private def effectiveFilters: Array[Filter] = pushed ++ runtime

  override def readSchema(): StructType = aggSchema.getOrElse(required)
  override def toBatch: Batch = this
  override def description(): String =
    s"graftkv:$table PushedFilters: [${pushed.mkString(", ")}], " +
      s"PushedAggregates: [${agg.map(_.aggregateExpressions().mkString(", ")).getOrElse("")}], " +
      s"PushedGroupBy: [${agg.map(_.groupByExpressions().mkString(", ")).getOrElse("")}], " +
      s"PushedLimit: ${limit.orElse(topN.map(_._2)).map(_.toString).getOrElse("-")}, " +
      s"PushedTopN: [${topN.map(_._1.mkString(", ")).getOrElse("")}], " +
      s"ReadSchema: ${required.simpleString}"

  // Keyed layout (graft.key): one input partition per DISTINCT key value
  // — the in-memory analogue of "each region holds one key range". Only
  // active when the key survives column pruning (the reported
  // partitioning is an expression over the scan OUTPUT) and no aggregate
  // was pushed (the agg path plans its own single partition). A real
  // connector derives the groups from region boundaries; here they come
  // from one grouping sweep at plan time.
  private def activeKey: Option[String] =
    keyCol.filter(k => agg.isEmpty && required.fieldNames.contains(k))

  private lazy val keyedPartitions: Array[InputPartition] = {
    val k = activeKey.get
    val ki = full.fieldNames.indexOf(k)
    // rows are CAPTURED in the partition (not row indices resolved at
    // execution): a write/truncate landing between planning and
    // execution must not shift a running scan onto different rows — the
    // snapshot-at-plan-time contract a real connector gets from region
    // boundary metadata + HBase's own MVCC read point
    KvStore.rowsOf(table)
      .groupBy(_(ki))
      .toArray
      // deterministic partition order; String.valueOf survives a NULL
      // key value (null rows form their own partition)
      .sortBy(p => String.valueOf(p._1))
      .map { case (kv, rows) =>
        KvKeyedPartition(kv == null, kv, rows.toArray): InputPartition
      }
  }

  override def outputPartitioning(): Partitioning = activeKey match {
    case Some(k) =>
      new KeyGroupedPartitioning(Array(Expressions.identity(k)), keyedPartitions.length)
    case None =>
      new UnknownPartitioning(planInputPartitions().length)
  }

  // A keyed partition holds exactly ONE key value, so its rows are
  // (trivially) sorted by the key — reporting that ordering lets a
  // sort-merge join over two keyed scans skip its Sort nodes as well as
  // its exchanges: the full zero-shuffle-zero-sort storage-partitioned
  // join. Empty when unkeyed (no ordering claim).
  override def outputOrdering(): Array[SortOrder] = activeKey match {
    case Some(k) => Array(Expressions.sort(Expressions.column(k), SortDirection.ASCENDING))
    case None => Array.empty
  }

  override def planInputPartitions(): Array[InputPartition] =
    if (agg.isDefined) Array(KvInputPartition(0, KvStore.rowsOf(table).size))
    else if (activeKey.isDefined) keyedPartitions
    else {
      val n = KvStore.rowsOf(table).size
      val parts = math.max(1, math.min(partitions, math.max(1, n)))
      val step = math.max(1, (n + parts - 1) / parts)
      (0 until n by step).map(start =>
        KvInputPartition(start, math.min(n, start + step)): InputPartition).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(table, full, required, effectiveFilters, agg, limit, topN)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KvMicroBatchStream(table, full, required, pushed)
}

/** Streaming read: the row log as an append-only micro-batch source —
  * offsets are row positions, each batch the half-open slice between
  * the last committed and the latest count (the KV analogue of a WAL /
  * change-stream tail). Filter pushdown and column pruning ride the
  * same ScanBuilder as batch. Append-only contract: a truncating
  * overwrite under a running stream is undefined, exactly as rewriting
  * a file under a file stream is. */
class KvMicroBatchStream(
    table: String, full: StructType, required: StructType, pushed: Array[Filter])
    extends MicroBatchStream {
  override def initialOffset(): Offset = KvOffset(0L)
  override def latestOffset(): Offset = KvOffset(KvStore.rowsOf(table).size.toLong)
  override def deserializeOffset(json: String): Offset = KvOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KvOffset].n.toInt
    val e = end.asInstanceOf[KvOffset].n.toInt
    if (e <= s) Array.empty
    else Array(KvInputPartition(s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(table, full, required, pushed)
}

case class KvOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

case class KvInputPartition(start: Int, end: Int) extends InputPartition

/** One distinct key value's rows — the row VALUES snapshotted at plan
  * time, so concurrent store mutation cannot shift a running scan —
  * with the key exposed through [[HasPartitionKey]] so Spark can
  * group/align partitions for storage-partitioned joins. */
case class KvKeyedPartition(keyIsNull: Boolean, key: Any, rows: Array[Seq[Any]])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow.fromSeq(Seq(if (keyIsNull) null else KvFilterEval.toCatalyst(key)))
}

class KvReaderFactory(
    table: String, full: StructType, required: StructType,
    pushed: Array[Filter], agg: Option[Aggregation] = None,
    limit: Option[Int] = None, topN: Option[(Seq[SortOrder], Int)] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    (agg, partition) match {
      case (Some(a), _) => new KvAggReader(table, full, pushed, a)
      case (None, p: KvKeyedPartition) =>
        new KvPartitionReader(table, full, required, pushed, 0, 0, limit, topN,
          captured = Some(p.rows))
      case (None, p: KvInputPartition) =>
        new KvPartitionReader(table, full, required, pushed, p.start, p.end, limit, topN)
      case (_, other) =>
        throw new IllegalStateException(s"unexpected partition: $other")
    }
}

/** Complete aggregate pushdown: one sweep over the (filtered) rows —
  * ungrouped ships ONE row, grouped ships one row per group with the
  * group-by values leading, positionally matching the scan's readSchema. */
class KvAggReader(
    table: String, full: StructType, pushed: Array[Filter], agg: Aggregation)
    extends PartitionReader[InternalRow] {
  private val fieldIdx = KvStore.fieldIndex(full)

  private def colOf(f: AggregateFunc): String = f match {
    case _: CountStar => "*"
    case c: Count => c.column().asInstanceOf[NamedReference].fieldNames()(0)
    case m: Min => m.column().asInstanceOf[NamedReference].fieldNames()(0)
    case m: Max => m.column().asInstanceOf[NamedReference].fieldNames()(0)
    case other => throw new IllegalStateException(s"unclaimed aggregate: $other")
  }

  private def aggValues(rows: Seq[Seq[Any]]): Seq[Any] =
    agg.aggregateExpressions().toSeq.map { f =>
      val c = colOf(f)
      f match {
        case _: CountStar => rows.size.toLong
        case _: Count => rows.count(r => r(fieldIdx(c)) != null).toLong
        case _: Min =>
          val vs = rows.map(r => r(fieldIdx(c))).filter(_ != null)
          if (vs.isEmpty) null
          else KvFilterEval.toCatalyst(vs.reduce((a, b) => if (KvFilterEval.ord(a, b) <= 0) a else b))
        case _: Max =>
          val vs = rows.map(r => r(fieldIdx(c))).filter(_ != null)
          if (vs.isEmpty) null
          else KvFilterEval.toCatalyst(vs.reduce((a, b) => if (KvFilterEval.ord(a, b) >= 0) a else b))
        case other => throw new IllegalStateException(s"unclaimed aggregate: $other")
      }
    }

  private lazy val it: Iterator[InternalRow] = {
    val rows = KvStore.rowsOf(table)
      .filter(row => pushed.forall(f => KvFilterEval.eval(f, n => row(fieldIdx(n)))))
    val groupCols = agg.groupByExpressions().toSeq
      .map(_.asInstanceOf[NamedReference].fieldNames()(0))
    if (groupCols.isEmpty) Iterator.single(InternalRow.fromSeq(aggValues(rows)))
    else rows
      .groupBy(r => groupCols.map(c => r(fieldIdx(c))))
      .iterator
      .map { case (key, grp) =>
        InternalRow.fromSeq(key.map(KvFilterEval.toCatalyst) ++ aggValues(grp))
      }
  }

  private var currentRow: InternalRow = _
  override def next(): Boolean =
    if (it.hasNext) { currentRow = it.next(); true } else false
  override def get(): InternalRow = currentRow
  override def close(): Unit = ()
}

class KvPartitionReader(
    table: String, full: StructType, required: StructType,
    pushed: Array[Filter], start: Int, end: Int,
    limit: Option[Int] = None, topN: Option[(Seq[SortOrder], Int)] = None,
    captured: Option[Array[Seq[Any]]] = None)
    extends PartitionReader[InternalRow] {
  private val fieldIdx = KvStore.fieldIndex(full)
  private val outIdx = required.fieldNames.map(fieldIdx)

  private val it: Iterator[Seq[Any]] = {
    val slice = captured match {
      case Some(rows) => rows.iterator
      case None => KvStore.rowsOf(table).slice(start, end).iterator
    }
    val filtered = slice
      .filter(row => pushed.forall(f => KvFilterEval.eval(f, name => row(fieldIdx(name)))))
    (topN, limit) match {
      // local top-N: this partition's k best rows by the pushed sort —
      // Spark's TakeOrderedAndProject merges the per-partition winners
      case (Some((orders, k)), _) =>
        filtered.toSeq.sorted(KvFilterEval.sortOrdering(orders, fieldIdx)).take(k).iterator
      // local limit: stop the sweep after k rows, Spark's Limit finishes
      case (None, Some(k)) => filtered.take(k)
      case (None, None) => filtered
    }
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (it.hasNext) {
      val row = it.next()
      current = InternalRow.fromSeq(outIdx.map(i => KvFilterEval.toCatalyst(row(i))))
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** The pushdown contract: which V1 filters the source claims, and their
  * row-level evaluation — the part a real connector compiles to row-key
  * ranges / qualifier filters instead of evaluating per row. */
object KvFilterEval {
  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
        _: LessThan | _: LessThanOrEqual | _: IsNotNull | _: IsNull => true
    case In(_, vs) => vs.nonEmpty
    case _ => false
  }

  /** Same-type ordering for the pushed MIN/MAX sweep. */
  def ord(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case _ => throw new IllegalArgumentException(s"graftkv cannot order $a with $b")
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue())
    case (x: Int, y: Number) => java.lang.Long.compare(x.toLong, y.longValue())
    case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => throw new IllegalArgumentException(s"graftkv cannot compare $a with $b")
  }

  def eval(f: Filter, value: String => Any): Boolean = f match {
    case EqualTo(c, v) => value(c) != null && cmp(value(c), v) == 0
    case GreaterThan(c, v) => value(c) != null && cmp(value(c), v) > 0
    case GreaterThanOrEqual(c, v) => value(c) != null && cmp(value(c), v) >= 0
    case LessThan(c, v) => value(c) != null && cmp(value(c), v) < 0
    case LessThanOrEqual(c, v) => value(c) != null && cmp(value(c), v) <= 0
    case IsNotNull(c) => value(c) != null
    case IsNull(c) => value(c) == null
    case In(c, vs) => value(c) != null && vs.exists(v => cmp(value(c), v) == 0)
    case other => throw new IllegalStateException(s"unclaimed filter reached eval: $other")
  }

  /** Row ordering for the pushed top-N: the claimed SortOrders over raw
    * store rows, nulls placed per the order's null ordering. */
  def sortOrdering(
      orders: Seq[SortOrder], fieldIdx: Map[String, Int]): Ordering[Seq[Any]] =
    new Ordering[Seq[Any]] {
      override def compare(x: Seq[Any], y: Seq[Any]): Int = {
        orders.foreach { o =>
          val i = fieldIdx(o.expression().asInstanceOf[NamedReference].fieldNames()(0))
          val (a, b) = (x(i), y(i))
          val c =
            if (a == null && b == null) 0
            else if (a == null) {
              if (o.nullOrdering() == org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_FIRST) -1 else 1
            } else if (b == null) {
              if (o.nullOrdering() == org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_FIRST) 1 else -1
            } else if (o.direction() == SortDirection.ASCENDING) ord(a, b)
            else -ord(a, b)
          if (c != 0) return c
        }
        0
      }
    }

  def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }

  def fromCatalyst(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case other => other
  }
}

class KvWriteBuilder(
    table: String, writeSchema: StructType, keyCol: Option[String] = None)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new KvWrite(table, writeSchema, doTruncate, keyCol = keyCol)
}

class KvWrite(
    table: String, writeSchema: StructType, truncate: Boolean,
    rowLevel: Boolean = false, keyCol: Option[String] = None) extends Write {
  override def toBatch: BatchWrite =
    new KvBatchWrite(table, writeSchema, truncate, rowLevel, keyCol)
}

case class KvCommit(rows: Seq[Seq[Any]]) extends WriterCommitMessage

class KvBatchWrite(
    table: String, writeSchema: StructType, truncate: Boolean,
    rowLevel: Boolean = false, keyCol: Option[String] = None)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(writeSchema, rowLevel)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.flatMap(_.asInstanceOf[KvCommit].rows).toSeq
    if (truncate || !KvStore.contains(table)) KvStore.put(table, writeSchema, rows)
    else KvStore.append(table, writeSchema, rows)
    keyCol.foreach(KvStore.setKey(table, _))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class KvWriterFactory(writeSchema: StructType, rowLevel: Boolean = false)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(writeSchema, rowLevel)
}

class KvDataWriter(writeSchema: StructType, rowLevel: Boolean = false)
    extends DataWriter[InternalRow] {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]

  override def write(record: InternalRow): Unit = {
    // Row-level-op rewrites (ReplaceData) prepend a `__row_operation`
    // metrics column to every row and — for connectors that declare no
    // metadata attributes — hand the writer the UNPROJECTED row (plain
    // DataWritingSparkTask ignores ReplaceDataProjections.rowProjection;
    // only the metadata branch projects). The write schema stays the
    // table schema, so on the ROW-LEVEL path the data columns are the
    // TRAILING numFields-N. The flag comes from KvRowLevelOperation, so
    // the normal append/truncate path keeps the strict arity invariant
    // and a shape drift on either path fails loudly instead of shifting
    // columns.
    val off = record.numFields - writeSchema.length
    require(if (rowLevel) off == 0 || off == 1 else off == 0,
      s"graftkv writer: row has ${record.numFields} fields for schema ${writeSchema.simpleString} (rowLevel=$rowLevel)")
    if (off == 1) {
      // belt-and-braces against SAME-ARITY shape drift (a future Spark
      // appending rather than prepending the extra column would keep the
      // arity but shift every data column): the skipped leading field
      // must actually read as one of RowDeltaUtils' operation codes
      import org.apache.spark.sql.catalyst.util.RowDeltaUtils
      val op = record.getInt(0)
      require(op >= RowDeltaUtils.DELETE_OPERATION &&
        op <= RowDeltaUtils.WRITE_WITH_METADATA_OPERATION,
        s"graftkv writer: leading field $op is not a __row_operation code — " +
          "the row-level row shape has drifted; refusing to shift data columns")
    }
    buf += writeSchema.fields.zipWithIndex.map { case (f, i) =>
      if (record.isNullAt(i + off)) null
      else KvFilterEval.fromCatalyst(record.get(i + off, f.dataType))
    }.toSeq
  }

  override def commit(): WriterCommitMessage = KvCommit(buf.toSeq)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
