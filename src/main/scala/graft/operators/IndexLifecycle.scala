package graft.operators

import graft.sources.BulkOps
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE stored-index lifecycle shared by all three persisted indexes
  * ([[DedupIndexOps]] MinHash signatures, [[AnnIndexOps]] IVFADC
  * postings, [[RetrievalOps]] BM25 postings): membership sidecar,
  * guarded append (idempotent under at-least-once redelivery, crash-safe
  * under torn multi-table writes), tombstone-then-compact, and the
  * checked rename-swap primitives. Before this object the three indexes
  * triplicated the guard and swap logic, and the torn-append bug class
  * lived in exactly that triplication — now each index declares its
  * tables and the protocol runs once, here.
  *
  * ## The ids sidecar
  *
  * `dir/ids` is a one-column (id) table PARTITIONED BY
  * `ib = id mod id_parts` (the dial stored in `dir/ids_meta` — the
  * sidecar is self-describing like the dedup index's meta row). It holds
  * every COMMITTED id: an id is committed iff all of the index's data
  * tables hold its rows. Append-time idempotence probes the sidecar with
  * the batch's distinct `ib` set as a static In partition filter — a
  * small batch reads a few sidecar directories (8 bytes/id each), never
  * a corpus-sized data-table slice. This replaces the per-batch
  * one-row-slice reads (sigs band=0 / postings sub=0 / bm25 distinct)
  * that were O(index) I/O on every ingest batch: worst case (a batch
  * touching every ib) the guard reads the full sidecar, which is
  * ~numPerms·|sig| (dedup), M·|code| (ANN) or |postings| (BM25) times
  * smaller than the slice it replaces.
  *
  * ## The pending-marker protocol (why the sidecar stays truthful)
  *
  * The sidecar is only a valid guard if "in sidecar" really implies "in
  * every data table". A multi-table append can crash between writes, so
  * each append runs:
  *
  *   1. resolve old markers: a `dir/pending/p_*` marker whose ids are
  *      all in the sidecar is a completed append — delete it. Leftover
  *      ids are SUSPECTS: a previous append crashed mid-write for them.
  *   2. classify the batch: ids in the sidecar are committed (skip —
  *      the index is the authority on ids: a redelivered id with
  *      different content is still skipped, and a tombstoned id stays
  *      skipped until compaction drops it); remaining ids are to-commit.
  *   3. write a pending marker holding the to-commit ids (O(batch)).
  *   4. per table, in DECLARED ORDER, append rows for the to-commit ids
  *      — minus, for suspect ids only, the rows that table already
  *      holds (the per-table one-row-slice check, now confined to the
  *      bounded suspect set instead of running corpus-sized every
  *      batch). Table order is chosen by each index so its torn states
  *      are structurally invisible to serves (e.g. dedup writes `mins`
  *      before `sigs`: a half-appended doc can never become a
  *      candidate).
  *   5. append the to-commit ids to the sidecar — the commit point.
  *   6. delete this batch's marker.
  *
  * Crash anywhere: the marker survives, the ids stay out of the sidecar,
  * and the next delivery's step 4 completes exactly the missing tables
  * (the per-table self-healing the index specs pin). Crash between 5
  * and 6: the marker resolves as completed at the next append's step 1.
  *
  * Steady state (no crash evidence) the protocol costs one pruned
  * sidecar probe, one O(batch) marker write and one O(batch) sidecar
  * append per batch — nothing corpus-sized.
  *
  * Reference analogue: the write-then-verify-then-swap discipline of
  * api/common/HBaseStaticHelper.java:41-78 (replaceTable with backup),
  * applied per ingest batch.
  */
object IndexLifecycle {

  /** Power-of-two partition-count dial: enough partitions that each
    * holds ~`rowsPerPart` rows, clamped to [minParts, maxParts]. Powers
    * of two keep `mod` buckets stable-ish under resizing and the
    * directory count predictable. */
  def sizedParts(nRows: Long, rowsPerPart: Long, minParts: Int, maxParts: Int): Int = {
    require(minParts > 0 && maxParts >= minParts)
    val want = math.max(1L, nRows / math.max(1L, rowsPerPart))
    val floorPow = java.lang.Long.highestOneBit(want)
    val pow = if (floorPow == want) floorPow else floorPow << 1
    math.min(maxParts.toLong, math.max(minParts.toLong, pow)).toInt
  }

  /** Sidecar sizing: ~8k ids (64 KB) per directory. */
  val IdsRowsPerPart = 8192L
  val IdsMinParts = 16
  val IdsMaxParts = 4096

  // id_parts per sidecar dir, read once per JVM for PROBES; mutation
  // paths ([[appendGuarded]], compaction) re-read the stored row and
  // re-prime, so a dir rewritten at a different dial by another process
  // cannot corrupt an append (the dedup meta-dial discipline).
  private val idsMetaMemo = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def readIdParts(spark: SparkSession, dir: String): Int = {
    val n = BulkOps.readPath(spark, s"$dir/ids_meta").select("id_parts").head().getLong(0).toInt
    idsMetaMemo.put(dir, n)
    n
  }

  private def idPartsMemo(spark: SparkSession, dir: String): Int = {
    val cached = idsMetaMemo.get(dir)
    if (cached != null) cached.intValue() else readIdParts(spark, dir)
  }

  /** Drop the per-JVM sidecar-dial memos (multi-process deployments that
    * rebuild an index dir out-of-band call this before serving from it
    * again — see DEPLOY.md). */
  def clearIdsMemo(): Unit = {
    idsMetaMemo.clear()
    handles.clear()
  }

  // ---- serving handles -------------------------------------------------

  /** Open-once table handles for SERVE reads: constructing a DataFrame
    * over a many-directory index table costs seconds at scale — the
    * partition discovery lists every directory and schema inference
    * reads footers, and at 4096 partitions that dwarfed the pruned read
    * itself (measured: ~6 s of a 7.5 s dedup serve at the 100× corpus
    * was two table constructions; the data read was 0.1 s). A serving
    * process therefore opens each stored table ONCE and reuses the
    * handle across serves — the production serving shape. Handles
    * invalidate on every mutation THIS JVM performs (fresh build,
    * guarded append, compaction swap, rebuild swap, fixture
    * pristine-copy); an out-of-band mutation by another process
    * requires [[clearIdsMemo]] (which drops the handles too — the
    * DEPLOY.md multi-process note). */
  private val handles = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def servingHandle(spark: SparkSession, dir: String, table: String): DataFrame =
    handles.computeIfAbsent(s"$dir/$table", p => BulkOps.readPath(spark, p))

  /** Drop every handle under `dir` — called by every mutation path. */
  def invalidateHandles(dir: String): Unit =
    handles.keySet.removeIf(k => k.startsWith(dir + "/") || k == dir)

  private def withIb(ids: DataFrame, idCol: String, parts: Int): DataFrame =
    ids.select(col(idCol).cast("long").as(idCol))
      .withColumn("ib", pmod(col(idCol), lit(parts.toLong)))

  /** (Re)create the sidecar for a FRESH build: every id of the initial
    * corpus is committed by construction. Also resets the protocol state
    * (pending markers) from the dir's past life. `expectedN` sizes the
    * partition dial. */
  def writeIds(spark: SparkSession, dir: String, idCol: String,
      ids: DataFrame, expectedN: Long): Unit = {
    // a partitioned write of zero rows produces a directory no reader
    // can infer a schema from — an empty corpus is "no index", refused
    // loudly here so every index family inherits the guard
    require(expectedN > 0,
      s"writeIds: empty id set — refusing to write an unreadable sidecar at $dir")
    val parts = sizedParts(expectedN, IdsRowsPerPart, IdsMinParts, IdsMaxParts)
    BulkOps.writePath(withIb(ids, idCol, parts).repartition(col("ib")), SaveMode.Overwrite)
      .partitionBy("ib").save(s"$dir/ids")
    import spark.implicits._
    BulkOps.writePath(Seq(parts.toLong).toDF("id_parts"), SaveMode.Overwrite)
      .save(s"$dir/ids_meta")
    idsMetaMemo.put(dir, parts)
    invalidateHandles(dir)
    if (BulkOps.fileExists(spark, s"$dir/pending"))
      BulkOps.deletePath(spark, s"$dir/pending")
  }

  /** The ids of `candidates` already committed to the index — the
    * sidecar probe: the candidate set's distinct `ib` values (a bounded
    * driver materialization, ≤ id_parts longs) push as a static In
    * filter on the partition column, so a small batch reads only its own
    * sidecar directories. Candidates must be bounded app input (an
    * ingest batch). `parts` is the sidecar dial the caller read — a
    * MUTATION passes the freshly-read stored value ([[appendGuarded]]
    * reads it once at entry), never a memo that another process's
    * rewrite could have staled. */
  def committedIds(spark: SparkSession, dir: String, idCol: String,
      candidates: DataFrame, parts: Int): DataFrame = {
    val ibs = candidates
      .select(pmod(col(idCol).cast("long"), lit(parts.toLong)).as("ib"))
      .distinct().collect().map(_.getLong(0))
    BulkOps.readPath(spark, s"$dir/ids")
      .filter(col("ib").isin(ibs: _*))
      .select(col(idCol).cast("long").as(idCol))
      .join(broadcast(candidates.select(col(idCol).cast("long").as(idCol))),
        Seq(idCol), "left_semi")
  }

  /** One data table under the guarded-append protocol: `oneRowPred`
    * selects a one-row-per-id slice (the suspect-path presence check);
    * `write` must APPEND exactly the rows of the fresh-id frame it is
    * handed. Declaration order = write order. */
  final case class GuardedTable(name: String, oneRowPred: Column, write: DataFrame => Unit)

  /** Crash-window fault injection for the lifecycle specs: the step name
    * at which the next [[appendGuarded]] throws (a table name, "pending"
    * or "ids"). Test-only; always reset in a finally. */
  @volatile private[graft] var crashAt: Option[String] = None
  private def maybeCrash(step: String): Unit =
    if (crashAt.contains(step))
      throw new IllegalStateException(s"injected crash at step '$step'")

  /** The guarded multi-table append — protocol in the object scaladoc.
    * `batchIds` must be bounded app input (an ingest batch); its
    * materializations here (classification, marker, sidecar) are all
    * O(batch). SINGLE WRITER per index dir (the reference's admin-lock
    * discipline, api/runner/StaticConnector.java's one-connection
    * model): two concurrent appends could both classify an id as fresh
    * and double-write its rows — serializing mutations is the caller's
    * deployment contract; concurrent SERVES are safe throughout. */
  def appendGuarded(spark: SparkSession, dir: String, idCol: String,
      batchIds0: DataFrame, tables: Seq[GuardedTable]): Unit = {
    require(BulkOps.fileExists(spark, s"$dir/ids"),
      s"no ids sidecar under $dir — appends require an index written by this lifecycle")
    // the stored dial, read FRESH before any probe: marker resolution
    // and batch classification must bucket at the dial the sidecar is
    // actually partitioned by — a memoized dial staled by an
    // out-of-band rewrite would probe the wrong directories, classify
    // committed ids as fresh and double-write their rows. Step 5's
    // sidecar append reuses the same value (single writer: nothing can
    // legally change it mid-append).
    val parts = readIdParts(spark, dir)
    // lineage truncated once: the batch id set is read by every step
    // below, and it must be ONE set throughout (bounded, O(batch))
    val batchIds = batchIds0.select(col(idCol).cast("long").as(idCol))
      .distinct().localCheckpoint(true)

    // step 1: resolve old markers; leftovers are the suspect pool
    val markers =
      if (BulkOps.fileExists(spark, s"$dir/pending")) listChildren(spark, s"$dir/pending")
      else Seq.empty
    val unresolved: Seq[(String, DataFrame)] = markers.flatMap { m =>
      val pids = BulkOps.readPath(spark, m).select(col(idCol).cast("long").as(idCol))
      val open = pids.join(broadcast(committedIds(spark, dir, idCol, pids, parts)),
        Seq(idCol), "left_anti").localCheckpoint(true)
      if (open.isEmpty) { BulkOps.deletePath(spark, m); None } else Some((m, open))
    }
    val suspectPool: Option[DataFrame] = unresolved.map(_._2).reduceOption(_ unionByName _)

    // step 2: classify — committed ids skip everything
    val toCommit = batchIds
      .join(broadcast(committedIds(spark, dir, idCol, batchIds, parts)), Seq(idCol), "left_anti")
      .localCheckpoint(true)
    if (toCommit.isEmpty) return
    val suspects = suspectPool
      .map(p => toCommit.join(broadcast(p), Seq(idCol), "left_semi").localCheckpoint(true))
      .filter(!_.isEmpty)

    // step 3: pending marker (the ids this append intends to commit)
    val marker = s"$dir/pending/p_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    BulkOps.writePath(toCommit, SaveMode.Overwrite).save(marker)
    try {
      maybeCrash("pending")

      // step 4: per-table writes in declared order; suspect ids check the
      // table's one-row slice (bounded — only runs after crash evidence)
      tables.foreach { t =>
        val fresh = suspects match {
          case None => toCommit
          case Some(s) =>
            val present = BulkOps.readPath(spark, s"$dir/${t.name}")
              .filter(t.oneRowPred).select(col(idCol).cast("long").as(idCol))
              .join(broadcast(s), Seq(idCol), "left_semi").distinct()
            toCommit.join(broadcast(present), Seq(idCol), "left_anti")
        }
        t.write(fresh)
        maybeCrash(t.name)
      }

      // step 5: commit point — the ids enter the sidecar (at the dial
      // read at entry — the one the probes above classified against)
      BulkOps.writePath(withIb(toCommit, idCol, parts).repartition(col("ib")), SaveMode.Append)
        .partitionBy("ib").save(s"$dir/ids")
      maybeCrash("ids")

      // step 6: this append's marker is done, and so is any older marker
      // whose open ids this append just committed — a single redelivery
      // fully converges the protocol state (markers for ids NOT in this
      // batch stay for their own later delivery)
      BulkOps.deletePath(spark, marker)
      unresolved.foreach { case (m, open) =>
        if (open.join(broadcast(toCommit), Seq(idCol), "left_anti").isEmpty)
          BulkOps.deletePath(spark, m)
      }
    } finally invalidateHandles(dir) // even a crashed append: re-list next serve
  }

  private def listChildren(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.toString)
  }

  /** The SHARED delete-then-compact driver behind all three stored
    * indexes: recover any crashed swap on every table, then — if a
    * tombstone log exists under `dir` — rewrite each table minus the
    * tombstoned `idCol` rows BESIDE the live copy (preserving its
    * partitioning), checked-swap it in ([[swapCompacted]] — rename
    * aside, rename in, every step checked), and clear the log. The ids
    * SIDECAR is compacted with the data tables (a tombstoned id leaves
    * the sidecar exactly when its rows leave the index, so re-ingesting
    * a deleted doc becomes possible after compaction — the documented
    * contract). Returns false on no-op. A compaction that would empty a
    * table is refused: a partitioned write of zero rows produces a
    * directory no reader can infer a schema from — deleting EVERYTHING
    * is "drop the index", not a maintenance operation.
    * `tables` = (name, partition columns, read normalizer). */
  private[operators] def compactTables(
      spark: SparkSession, dir: String, idCol: String,
      tables: Seq[(String, Seq[String], DataFrame => DataFrame)]): Boolean = {
    val withIds: Seq[(String, Seq[String], DataFrame => DataFrame)] =
      if (BulkOps.fileExists(spark, s"$dir/ids"))
        tables :+ (("ids", Seq("ib"), (df: DataFrame) =>
          df.withColumn("ib", col("ib").cast("long"))))
      else tables
    withIds.foreach { case (t, _, _) => recoverSwap(spark, s"$dir/$t") }
    if (!BulkOps.fileExists(spark, s"$dir/tombstones")) false
    else {
      val tomb = BulkOps.readPath(spark, s"$dir/tombstones").select(idCol)
      withIds.foreach { case (t, partCols, normalize) =>
        val keep = normalize(BulkOps.readPath(spark, s"$dir/$t"))
          .join(broadcast(tomb), Seq(idCol), "left_anti")
        require(!keep.isEmpty,
          s"compaction would empty $dir/$t — drop the index instead")
        val w = BulkOps.writePath(keep, SaveMode.Overwrite)
        (if (partCols.isEmpty) w else w.partitionBy(partCols: _*))
          .save(s"$dir/${t}_compact")
        swapCompacted(spark, s"$dir/$t")
      }
      BulkOps.deletePath(spark, s"$dir/tombstones")
      invalidateHandles(dir)
      true
    }
  }

  /** Crash-safe swap of `<table>_compact` into `<table>`: the live table
    * renames ASIDE first (never deleted while it is the only copy), and
    * every rename result is CHECKED — a failed step aborts loudly before
    * anything (tombstone logs included) is cleaned, because acting on an
    * un-swapped compaction would silently resurrect deleted rows. */
  private[operators] def swapCompacted(spark: SparkSession, table: String): Unit = {
    require(BulkOps.renamePath(spark, table, s"${table}_old"),
      s"compaction aborted: could not move $table aside")
    require(BulkOps.renamePath(spark, s"${table}_compact", table),
      s"compaction aborted mid-swap: $table is at ${table}_old, " +
        s"the compacted copy at ${table}_compact — rerun to recover")
    BulkOps.deletePath(spark, s"${table}_old")
  }

  /** Recovery preamble for [[swapCompacted]]'s crash window: if the live
    * table is missing, complete the swap (compacted copy present) or
    * roll back (old copy present); stale leftovers beside a LIVE table
    * are superseded copies and are dropped so the next swap's renames
    * cannot silently no-op against an existing destination. */
  private[operators] def recoverSwap(spark: SparkSession, table: String): Unit = {
    handles.remove(table)
    val live = BulkOps.fileExists(spark, table)
    val old = BulkOps.fileExists(spark, s"${table}_old")
    val cmp = BulkOps.fileExists(spark, s"${table}_compact")
    if (!live) {
      if (cmp) require(BulkOps.renamePath(spark, s"${table}_compact", table),
        s"could not complete the crashed swap of $table")
      else if (old) require(BulkOps.renamePath(spark, s"${table}_old", table),
        s"could not roll back the crashed swap of $table")
      else throw new IllegalStateException(s"$table missing and no recovery copy found")
    }
    if (BulkOps.fileExists(spark, table)) {
      if (old && BulkOps.fileExists(spark, s"${table}_old"))
        BulkOps.deletePath(spark, s"${table}_old")
      if (cmp && BulkOps.fileExists(spark, s"${table}_compact"))
        BulkOps.deletePath(spark, s"${table}_compact")
    }
  }

  // ---- multi-table REBUILD (retrain-and-swap — the drift remedy) ----

  /** Atomically replace a SET of tables that are only consistent
    * together (a retrained quantizer plus postings coded against it):
    * every replacement is staged as `<t>_new` first, then a
    * `rebuild_commit` marker makes the swap roll-FORWARD on crash —
    * unlike per-table compaction (same rows, any mix of old/new tables
    * serves identically), a rebuild mid-swap mix would serve codes
    * against the wrong codebook, so recovery must land all-new, never
    * some-of-each.
    *
    *   1. [[recoverRebuild]] preamble (finish or discard a crashed one).
    *   2. `stage` writes every `<t>_new` (live tables untouched).
    *   3. write the `rebuild_commit` marker — the point of no return.
    *   4. per table: rename live aside, rename `_new` in, drop aside.
    *   5. drop the tombstone log (`postRebuild` semantics: the rebuild
    *      consumed it) and the marker.
    *
    * Crash before 3: next preamble discards the stale `_new` copies —
    * the live index never changed. Crash after 3: next preamble
    * completes every remaining swap from the surviving `_new` copies.
    * Between a mid-swap crash and that recovery, serves FAIL LOUDLY
    * (renamed-away table paths) rather than answer from a mixed
    * quantizer state — run any lifecycle entry point (compact/rebuild)
    * to recover before serving. */
  private[operators] def rebuildTables(
      spark: SparkSession, dir: String, tables: Seq[String])(stage: => Unit): Unit = {
    recoverRebuild(spark, dir, tables)
    stage
    tables.foreach(t => require(BulkOps.fileExists(spark, s"$dir/${t}_new"),
      s"rebuild stage must write $dir/${t}_new"))
    maybeCrash("rebuild_stage")
    BulkOps.writePath(
        { import spark.implicits._; Seq(tables.mkString(",")).toDF("tables") },
        SaveMode.Overwrite)
      .save(s"$dir/rebuild_commit")
    maybeCrash("rebuild_commit")
    tables.foreach { t =>
      swapInNew(spark, s"$dir/$t")
      maybeCrash(s"rebuild_$t")
    }
    if (BulkOps.fileExists(spark, s"$dir/tombstones"))
      BulkOps.deletePath(spark, s"$dir/tombstones")
    BulkOps.deletePath(spark, s"$dir/rebuild_commit")
    invalidateHandles(dir)
  }

  private def swapInNew(spark: SparkSession, table: String): Unit = {
    // idempotent under roll-forward: a table already swapped (live
    // present, no _new) is left alone
    if (BulkOps.fileExists(spark, s"${table}_new")) {
      if (BulkOps.fileExists(spark, table)) {
        require(BulkOps.renamePath(spark, table, s"${table}_aside"),
          s"rebuild aborted: could not move $table aside")
      }
      require(BulkOps.renamePath(spark, s"${table}_new", table),
        s"rebuild aborted mid-swap of $table — rerun to recover")
      BulkOps.deletePath(spark, s"${table}_aside")
    } else if (BulkOps.fileExists(spark, s"${table}_aside")) {
      if (BulkOps.fileExists(spark, table))
        // crashed between the in-rename and the aside-delete: the new
        // copy is live, the aside copy is superseded — drop it
        BulkOps.deletePath(spark, s"${table}_aside")
      else
        // live and _new both missing with an aside copy present can
        // only mean a half-run rename pair — restore the only copy
        require(BulkOps.renamePath(spark, s"${table}_aside", table),
          s"could not roll back the crashed rebuild swap of $table")
    }
  }

  /** [[rebuildTables]]'s crash recovery: with a `rebuild_commit` marker
    * present, complete every remaining swap (roll forward) and consume
    * the tombstone log; without one, discard stale `<t>_new` leftovers
    * (the rebuild never committed — the live index is the truth). */
  private[operators] def recoverRebuild(
      spark: SparkSession, dir: String, tables: Seq[String]): Unit = {
    if (BulkOps.fileExists(spark, s"$dir/rebuild_commit")) {
      tables.foreach(t => swapInNew(spark, s"$dir/$t"))
      if (BulkOps.fileExists(spark, s"$dir/tombstones"))
        BulkOps.deletePath(spark, s"$dir/tombstones")
      BulkOps.deletePath(spark, s"$dir/rebuild_commit")
      invalidateHandles(dir)
    } else {
      tables.foreach { t =>
        if (BulkOps.fileExists(spark, s"$dir/${t}_new"))
          BulkOps.deletePath(spark, s"$dir/${t}_new")
        if (BulkOps.fileExists(spark, s"$dir/${t}_aside") &&
            BulkOps.fileExists(spark, s"$dir/$t"))
          BulkOps.deletePath(spark, s"$dir/${t}_aside")
      }
    }
  }
}
