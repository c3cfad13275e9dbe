package graft.tools

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Temp-directory lifecycle for stored-index fixtures.
  *
  * The served-index demo chains ([[graft.operators.AnnIndexOps.annServed]],
  * [[graft.operators.RetrievalOps.bm25Served]]) write real on-disk index
  * tables into temp dirs. Two leaks this utility closes:
  *
  *   - dirs were never deleted → every allocation is now registered with
  *     one JVM shutdown hook that removes them recursively at exit;
  *   - with `graft.cache.enabled=false` (the ScaleBench posture) every
  *     call allocated a FRESH dir, so min-of-N bench passes wrote N full
  *     posting-table copies → [[scratchFor]] hands back ONE reusable dir
  *     per (prefix, key); each call still rebuilds and overwrites the
  *     index in place, so scale runs keep measuring the full
  *     build-write-serve cycle without accumulating copies.
  */
object IndexScratch {
  private val allocated = ConcurrentHashMap.newKeySet[String]()
  private val scratch = new ConcurrentHashMap[String, String]()
  private val memo = new ConcurrentHashMap[String, String]()
  private val passCounters =
    new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** Id-space stride between append-only bench passes: each pass offsets
    * its batch ids by `pass × AppendIdBase`, far above any fixture
    * corpus id, so every pass appends genuinely FRESH ids to the shared
    * prebuilt index (a min-of-passes measurement then times the append
    * path alone — never the idempotent skip of a redelivered batch). */
  val AppendIdBase: Long = 1L << 40

  /** Monotone per-(family, corpus) pass number for the append-only
    * fixture chains. */
  def passNumber(key: String): Long =
    passCounters.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()

  /** The per-JVM stored-index memo shared by every served-index fixture
    * chain (ANN / BM25 / dedup): derived state builds ONCE per
    * (prefix, key) and serves many times — the entire point of
    * persisting an index. With `graft.cache.enabled=false` (the
    * ScaleBench posture) every call rebuilds into ONE reused scratch
    * dir, so scale runs keep measuring the full build-write-serve cycle
    * without accumulating copies. `build` must be idempotent under
    * overwrite. */
  def memoizedDir(spark: org.apache.spark.sql.SparkSession,
      prefix: String, key: String)(build: String => Unit): String =
    if (!spark.conf.get(graft.Caching.EnabledKey, "true").toBoolean) {
      val d = scratchFor(prefix, key)
      build(d)
      d
    } else memo.computeIfAbsent(s"$prefix|$key", { _ =>
      val d = allocate(prefix)
      build(d)
      d
    })

  /** Drop memo entries whose prefix starts with `prefix` — the on-disk
    * [[graft.Caching.release]] analogue, scoped per index family. */
  def clearMemo(prefix: String): Unit =
    memo.keySet.removeIf(_.startsWith(prefix))

  /** Build ONCE per (prefix, key) regardless of the caching posture —
    * the SERVE-ONLY fixture seam: unlike [[memoizedDir]] (whose no-cache
    * branch deliberately rebuilds per call so ScaleBench times the full
    * build-write-serve cycle), a prebuilt dir persists across bench
    * passes, so a min-of-passes measurement isolates the serve path
    * against stored tables built outside the timer. `build` must be
    * idempotent under overwrite. */
  def prebuiltDir(spark: org.apache.spark.sql.SparkSession,
      prefix: String, key: String)(build: String => Unit): String =
    memo.computeIfAbsent(s"$prefix|$key", { _ =>
      val d = allocate(prefix)
      build(d)
      d
    })

  /** Replace `dst` with a file-level copy of `src` — fixture machinery
    * for MUTATING-operator chains: each call starts from a pristine
    * index copy instead of paying a full rebuild, and the mutation never
    * leaks into the next call. Routed through the Hadoop filesystem of
    * the paths (the BulkOps seam's addressing), so the copy follows the
    * same `fs.*` configuration as every other index read/write instead
    * of assuming local java.nio paths. Driver-side file move
    * (fixture-scale); it never computes over data. */
  def resetFromPristine(spark: org.apache.spark.sql.SparkSession,
      src: String, dst: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val from = new org.apache.hadoop.fs.Path(src)
    val to = new org.apache.hadoop.fs.Path(dst)
    val srcFs = from.getFileSystem(conf)
    val dstFs = to.getFileSystem(conf)
    if (dstFs.exists(to)) dstFs.delete(to, true)
    dstFs.mkdirs(to.getParent)
    if (isLocal(srcFs) && isLocal(dstFs))
      // local fast path: HARDLINK the parquet data files instead of
      // copying their bytes (a sized index tree is hundreds of files —
      // the byte copy was ~1 s of every dedup_gate call). Safe because
      // parquet files are immutable everywhere in this lifecycle
      // (appends create new segment files, compaction/rebuild write
      // aside and RENAME, deletes unlink — none touches an inode's
      // bytes); the one in-place-rewritten file (`lease`, renewed via
      // truncating create) and any other non-parquet file is byte-copied
      linkTree(java.nio.file.Paths.get(from.toUri.getPath),
        java.nio.file.Paths.get(to.toUri.getPath))
    else require(
      org.apache.hadoop.fs.FileUtil.copy(srcFs, from, dstFs, to,
        /* deleteSource = */ false, /* overwrite = */ true, conf),
      s"resetFromPristine: copy $src -> $dst failed")
    // the copy replaced dst's files out-of-band of the lifecycle — any
    // open serving handle on dst is now stale
    graft.operators.IndexLifecycle.invalidateHandles(dst)
  }

  private def isLocal(fs: org.apache.hadoop.fs.FileSystem): Boolean = {
    val s = fs.getUri.getScheme
    s == null || s == "file"
  }

  private def linkTree(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    val children = Files.list(src)
    try children.forEach { c =>
      val t = dst.resolve(c.getFileName)
      if (Files.isDirectory(c)) linkTree(c, t)
      else if (c.getFileName.toString.endsWith(".parquet"))
        // per-file fallback to a byte copy: hardlinks fail across mounts
        // (EXDEV — tmp dirs can span filesystems) and on filesystems
        // without link support; a copy is always correct, just slower
        try Files.createLink(t, c)
        catch {
          case _: UnsupportedOperationException | _: java.io.IOException =>
            Files.copy(c, t)
        }
      else Files.copy(c, t)
    } finally children.close()
  }

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      allocated.forEach(d => deleteRecursively(java.nio.file.Paths.get(d)))))
    true
  }

  /** A fresh temp dir, deleted at JVM exit. */
  def allocate(prefix: String): String = {
    require(hookInstalled)
    val d = Files.createTempDirectory(prefix).toString
    allocated.add(d)
    d
  }

  /** One reusable scratch dir per (prefix, key) — the no-cache rebuild
    * path. Also deleted at JVM exit. */
  def scratchFor(prefix: String, key: String): String =
    scratch.computeIfAbsent(s"$prefix|$key", _ => allocate(prefix))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively) finally children.close()
      }
      Files.deleteIfExists(p)
    }
}
