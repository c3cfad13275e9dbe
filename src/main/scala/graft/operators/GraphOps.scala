package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative / graph-shaped analytics:
  *
  * - near-dup clustering: connected components over the verified
  *   n-gram-Jaccard pair graph via min-label propagation — the
  *   fixed-point pattern from SURVEY.md §3.3 (driver loop re-evaluating a
  *   DataFrame until no change, iteration-bounded like the reference's
  *   MAX_RETRIES). Each doc ends up labeled with the smallest doc_id in
  *   its component; the canonical-keep decision for a dedup pipeline.
  * - session funnel: per-session stage flags folded into funnel
  *   conversion counts.
  *
  * Scale notes: label propagation converges in O(component diameter)
  * rounds; each round is one join + aggregate on the (tiny relative to
  * corpus) pair graph. For very deep graphs, checkpoint every few rounds
  * to cut lineage — noted inline.
  */
object GraphOps {

  val MaxIterations = 20

  /** Lineage is truncated every this many propagation rounds: each round
    * nests the previous round's plan, and dozens of stacked join/agg
    * trees slow re-planning (and can overflow the optimizer stack) long
    * before the data is the problem. */
  val CheckpointEvery = 5

  /** Upper bound on memoized cluster-label results; the eldest entry is
    * evicted beyond this, so a long-lived session cannot pin an unbounded
    * set of materialized frames or analyzed plan trees (a dropped entry's
    * checkpoint blocks are reclaimed by the ContextCleaner once
    * unreachable).
    *
    * Storage caveat shared with everything localCheckpoint-backed: the
    * blocks live on executors WITHOUT lineage, so losing an executor
    * (decommission, dynamic allocation scale-in) makes the affected memo
    * entries unrecoverable — the next action fails rather than silently
    * recomputing. On clusters with dynamic allocation, either disable
    * scale-in for sessions using dedupClusters or call
    * [[clearClusterMemo]] on executor loss and let the labels recompute. */
  val MemoMaxEntries = 8

  /** Driver-side memo for cluster labels: the propagation loop runs
    * actions at CONSTRUCTION time, so plan-level caching alone cannot
    * dedup it — three consumers (clusters / keep / curated) would each
    * re-execute every round. Keyed on (session, canonical docs plan,
    * threshold); the memoized result frame is checkpoint-materialized, so
    * reuse is a block read. Access-ordered LRU bounded at
    * [[MemoMaxEntries]].
    *
    * Memoized results are SNAPSHOTS: plan canonicalization does not see
    * file contents, so if the underlying files are rewritten in place,
    * call [[clearClusterMemo]] to drop stale labels. */
  private val labelMemo = new java.util.LinkedHashMap[
    (SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long), DataFrame](
    16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[
          (SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long),
          DataFrame]): Boolean =
      // checkpoint-backed values have no CacheManager entry to unpersist;
      // dropping the reference is the release (ContextCleaner reclaims)
      size() > MemoMaxEntries
  }

  /** Drop every memoized clustering — the invalidate hook for callers
    * that rewrite input files in place. Memo values are checkpoint-backed
    * (no CacheManager entry), so their storage is reclaimed by the
    * ContextCleaner once the dropped frames are garbage-collected, not
    * synchronously here. */
  def clearClusterMemo(): Unit = labelMemo.synchronized {
    labelMemo.clear()
  }

  private[graft] def memoSize: Int = labelMemo.synchronized(labelMemo.size())

  /** (doc_id, cluster_id) for every document participating in at least
    * one near-dup pair; cluster_id = min doc_id of the component.
    * Throws IllegalStateException if propagation does not converge within
    * [[MaxIterations]] rounds — partial components silently feeding
    * dedup_keep/curated would be a correctness bug, not a warning. */
  def dedupClusters(docs: DataFrame, thresholdE4: Long = 8000L): DataFrame = {
    val key = (docs.sparkSession, docs.queryExecution.analyzed.canonicalized, thresholdE4)
    val hit = labelMemo.synchronized(labelMemo.get(key))
    if (hit != null) hit
    else {
      // compute OUTSIDE the lock: the loop runs multi-second Spark jobs,
      // and holding a global lock across them would serialize unrelated
      // callers. Concurrent misses on the same key may duplicate the
      // computation; the race loser's result is simply dropped (its
      // checkpoint blocks are GC-reclaimed) and the first insert wins.
      val computed = connectedComponents(
        DedupOps.ngramJaccard(docs, thresholdE4).select("da", "db"))
      labelMemo.synchronized {
        val raced = labelMemo.get(key)
        if (raced != null) raced
        else { labelMemo.put(key, computed); computed }
      }
    }
  }

  /** Min-label propagation with pointer doubling over an undirected pair
    * graph `(da, db)`: every node ends labeled with its component's
    * minimum id in O(log diameter) rounds.
    *
    * The result is materialized via an eager localCheckpoint, NOT a
    * cache over the loop's plan: unpersisting a cache entry makes the
    * CacheManager rebuild (clear) every dependent entry, so a cached
    * result sitting on top of the loop-stage caches would lose its
    * materialization the moment the loop caches are released below and
    * every consumer would silently re-run the whole propagation. The
    * checkpoint truncates lineage to the materialized RDD, making the
    * result independent of the loop's storage lifecycle (its blocks are
    * reclaimed by the ContextCleaner once the frame is unreachable).
    *
    * Checkpoint flavor: when the session has a checkpoint directory
    * configured (`sc.setCheckpointDir`), RELIABLE checkpoints are used —
    * they live on the checkpoint filesystem and survive executor loss,
    * the right choice under dynamic allocation. Otherwise localCheckpoint
    * (executor blocks, faster, lost with the executor). */
  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  private[graft] def connectedComponents(
      pairs: DataFrame,
      maxIters: Int = MaxIterations): DataFrame = {
    val edges = pairs
      .unionByName(pairs.select(col("db").as("da"), col("da").as("db")))
      .cache()
    var labels = edges.select(col("da").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .cache()
    // the frame whose storage this round actually holds (labels is a
    // projection over it from round 1 on, so unpersist must target it)
    var prevStored = labels
    var iter = 0
    var changed = true
    while (changed && iter < maxIters) {
      val neighborMin = edges
        .join(labels, edges("db") === labels("doc_id"))
        .groupBy(edges("da").as("nid"))
        .agg(min(col("label")).as("nlabel"))
      // pointer doubling: every label is itself a node id, so label(label(u))
      // is defined; shortcutting it each round makes the min label hop
      // 2^iter-length paths — O(log diameter) rounds instead of O(diameter)
      val parents = labels.select(col("doc_id").as("p_id"), col("label").as("p_label"))
      val steppedPlan = labels
        .join(neighborMin, labels("doc_id") === col("nid"), "left")
        .join(parents, labels("label") === col("p_id"), "left")
        .select(col("doc_id"), col("label").as("prev"),
          least(col("label"),
            coalesce(col("nlabel"), col("label")),
            coalesce(col("p_label"), col("label"))).as("label"))
      // every CheckpointEvery rounds, cut lineage: localCheckpoint is
      // eager, so it doubles as this round's cache; other rounds cache
      val stepped =
        if (iter % CheckpointEvery == CheckpointEvery - 1) materialize(steppedPlan)
        else steppedPlan.cache()
      // carry the previous label through so convergence is a filter on
      // the same frame — one action per round, no extra self-join. A full
      // count (no limit-1 short circuit) on purpose: the probe is also
      // what materializes this round's storage, and a partial probe would
      // leave uncached partitions that recompute through the just-dropped
      // previous round's lineage on every later scan
      changed = stepped.filter(col("label") =!= col("prev")).count() > 0
      prevStored.unpersist()
      prevStored = stepped
      labels = stepped.select("doc_id", "label")
      iter += 1
    }
    if (changed) {
      edges.unpersist()
      prevStored.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIters rounds — " +
          "refusing to emit partial components (raise maxIters, or investigate pathological graph depth)")
    }
    val out = materialize(labels.select(col("doc_id"), col("label").as("cluster_id")))
    edges.unpersist()
    prevStored.unpersist()
    out
  }

  /** The kept corpus after near-dup removal: every document except
    * non-canonical cluster members (cluster_id = min doc_id wins). The
    * end-to-end dedup pipeline output. The duplicate set is O(corpus) in
    * the worst case (web-scale near-dup removal drops 30-50% of docs), so
    * no broadcast hint: the anti-join shuffles one exchange of longs and
    * AQE still picks broadcast at runtime whenever the set actually fits. */
  def dedupKeep(docs: DataFrame, thresholdE4: Long = 8000L): DataFrame = {
    val dupes = dedupClusters(docs, thresholdE4)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    docs
      .join(dupes, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Per-session funnel: stage flags (view → click → purchase) per
    * user-session, rolled into conversion counts per flag combination. */
  def sessionFunnel(events: DataFrame, gapUs: Long = 300000000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .withColumn("prev_t", lag(col("t"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_t").isNull || col("t") - col("prev_t") >= gapUs, 1L).otherwise(0L))
      .withColumn("session_no",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy("user_id", "session_no")
      .agg(
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("has_view"),
        max(when(col("event_type") === "click", 1L).otherwise(0L)).as("has_click"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("has_purchase"))
      .groupBy("has_view", "has_click", "has_purchase")
      .agg(count(lit(1)).as("n_sessions"))
  }
}

object GraphPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> ((s, d) => GraphOps.dedupClusters(Tables.documents(s, d))),
    "dedup_keep" -> ((s, d) => GraphOps.dedupKeep(Tables.documents(s, d))),
    "funnel" -> ((s, d) => GraphOps.sessionFunnel(Tables.events(s, d)))
  )

  /** Connected components over the verified >= 0.8-Jaccard pair graph as
    * recursive CTEs: `labels(doc_id, cluster_id)`. The shingle space is
    * [[DedupOps.MaxShingleDf]]-capped, mirroring `ngramJaccard`. */
  private[operators] val ClustersCte =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT doc_id,
      |         CAST(CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 18, 15)) AS UBIGINT)
      |              % 2147483647 AS BIGINT) AS x31
      |  FROM toks, range(1, ${OracleLimits.MaxDocTokens}) r(i) WHERE i + 2 <= len(t)
      |),
      |sh AS (
      |  SELECT doc_id, x31 FROM (
      |    SELECT doc_id, x31, COUNT(*) OVER (PARTITION BY x31) AS df FROM sh0
      |  ) WHERE df <= ${DedupOps.MaxShingleDf}
      |),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT pa.doc_id AS da, pb.doc_id AS db, COUNT(*) AS inter
      |  FROM sh pa JOIN sh pb ON pa.x31 = pb.x31 AND pa.doc_id < pb.doc_id
      |  GROUP BY 1, 2
      |),
      |pairs AS (
      |  SELECT i.da, i.db FROM inter i
      |  JOIN sizes sa ON i.da = sa.doc_id
      |  JOIN sizes sb ON i.db = sb.doc_id
      |  WHERE (i.inter / CAST(sa.n_shingles + sb.n_shingles - i.inter AS DOUBLE)) * 10000 + 0.5 >= 8000
      |),
      |edges AS (SELECT da, db FROM pairs UNION ALL SELECT db AS da, da AS db FROM pairs),
      |nodes AS (SELECT DISTINCT da AS doc FROM edges),
      |reach(doc, lab) AS (
      |  SELECT doc, doc FROM nodes
      |  UNION
      |  SELECT e.db, r.lab FROM reach r JOIN edges e ON e.da = r.doc
      |),
      |labels AS (
      |  SELECT doc AS doc_id, CAST(MIN(lab) AS BIGINT) AS cluster_id
      |  FROM reach GROUP BY doc
      |)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "dedup_clusters" ->
      s"""WITH RECURSIVE $ClustersCte
         |SELECT doc_id, cluster_id FROM labels""".stripMargin,
    "dedup_keep" ->
      s"""WITH RECURSIVE $ClustersCte
         |SELECT d.doc_id, d.lang, d.source
         |FROM documents d
         |LEFT JOIN labels l ON d.doc_id = l.doc_id AND l.doc_id <> l.cluster_id
         |WHERE l.doc_id IS NULL""".stripMargin,
    "funnel" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
        |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_t
        |  FROM events
        |),
        |numbered AS (
        |  SELECT *,
        |         SUM(CASE WHEN prev_t IS NULL OR t - prev_t >= 300000000 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY t, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        |  FROM flagged
        |),
        |per_session AS (
        |  SELECT user_id, session_no,
        |         CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS has_view,
        |         CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS has_click,
        |         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS has_purchase
        |  FROM numbered GROUP BY user_id, session_no
        |)
        |SELECT has_view, has_click, has_purchase, COUNT(*) AS n_sessions
        |FROM per_session GROUP BY 1, 2, 3""".stripMargin
  )
}
