package graft.streaming

import graft.operators.CompactionOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's continuous loops
  * (SURVEY.md §2.9). Each transform takes a (possibly streaming)
  * DataFrame, so the logic is testable in batch and runs unchanged under
  * readStream → writeStream.
  *
  * The reference's TTL caches become watermark + dropDuplicatesWithin-
  * Watermark: bounded state with event-time expiry — the streaming
  * equivalent of "don't recompact the same region within a day"
  * (`api/compactor/CompactorServer.java:47-57`, 350-entry 1-day cache),
  * except it scales past 350 entries because state lives in the state
  * store, not an LRU map.
  */
object StreamingOps {

  /** O-54 infinite compactor: metric snapshots → weighted candidates →
    * per-region dedup within the no-recompact window. Input needs
    * (region_id, snapshot_ts, size_mb, max_file_mb, file_count, locality).
    */
  def compactionStream(snapshots: DataFrame, noRecompactWindow: String = "1 day"): DataFrame =
    snapshots
      .withColumn(
        "weight",
        CompactionOps.weight(col("size_mb"), col("max_file_mb"), col("file_count"), col("locality")))
      .filter(col("weight") > CompactionOps.DefaultBorderWeight &&
        col("size_mb") > CompactionOps.DefaultMinSizeMb)
      .withWatermark("snapshot_ts", noRecompactWindow)
      .dropDuplicatesWithinWatermark("region_id")
      .select(col("region_id"), col("snapshot_ts"), col("weight"))

  /** O-55 distributor suppression: processed-table set cleared every 6 h
    * (`api/distributor/DistributorService.java:34-87`) — per-table dedup
    * within a 6-hour watermark. */
  def distributorStream(tableWeights: DataFrame, suppression: String = "6 hours"): DataFrame =
    tableWeights
      .withWatermark("snapshot_ts", suppression)
      .dropDuplicatesWithinWatermark("table_name")

  /** O-56 health checker: probe results folded to per-interval
    * availability (AND over probe booleans, `api/analyze/
    * ClusterAvailabilityObject.java:18-32`) on a processing cadence of
    * check.interval (900 s → 15-minute windows). */
  def canaryFold(probes: DataFrame, interval: String = "15 minutes"): DataFrame =
    probes
      .withWatermark("probe_ts", interval)
      .groupBy(window(col("probe_ts"), interval), col("op_type"))
      .agg(min(col("ok")).as("available"), count(lit(1)).as("n_probes"))
      .select(col("window.start").as("interval_start"), col("op_type"),
        col("available"), col("n_probes"))

  /** O-54 backpressure / admission control: per micro-batch, emit at most
    * `maxPerBatch` highest-weight actions, and none at all for servers
    * whose queue depths exceed the reference borders
    * (`api/compactor/CompactorServer.java:244-267`: pause while
    * compactionQueue > 11 or flushQueue > 31). `queueDepths` is the
    * external metrics feed (O-12); trigger pacing bounds batch size, this
    * bounds emission. */
  def pacedActionSink(
      candidates: DataFrame,
      queueDepths: DataFrame,
      emit: DataFrame => Unit,
      maxPerBatch: Int = 15,
      maxCompactionQueue: Int = 11,
      maxFlushQueue: Int = 31): org.apache.spark.sql.streaming.StreamingQuery =
    candidates.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val admitted = batch
          .join(queueDepths, Seq("server"), "left")
          .filter(
            coalesce(col("compaction_queue"), lit(0)) <= maxCompactionQueue &&
              coalesce(col("flush_queue"), lit(0)) <= maxFlushQueue)
          .orderBy(col("weight").desc)
          .limit(maxPerBatch)
          .drop("compaction_queue", "flush_queue", "percent_files_local")
        emit(admitted)
      }
      .start()

  /** O-57 topology snapshotter as a stream: each micro-batch of placement
    * observations appends to the date-partitioned history via the O-8
    * writer; retention stays a partition-prune read (BulkOps). Replaces
    * the reference's hourly loop + HBase row lease
    * (`api/meta/TechnicalMetaUpdater.java:29-54` — lock dropped: a single
    * streaming query owns the sink). */
  def topologySnapshotStream(
      observations: DataFrame,
      destPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    observations.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.BulkOps.writeTopologySnapshot(batch.toDF(), destPath)
      }
      .start()

  /** Streaming sessionization: the events_sessions batch query under a
    * watermark — session_window state is bounded by event time. */
  def sessionStream(events: DataFrame, gap: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Streaming ingest dedup for a document feed: keep the first document
    * per content fingerprint within the dedup window. The streaming face
    * of DedupOps.exact — state is bounded by the watermark (unlike a
    * driver-side seen-set, which would grow with the corpus), so the same
    * query ingests 100 TB/day with per-key state eviction. */
  def ingestDedupStream(docs: DataFrame, window: String = "1 day"): DataFrame =
    docs
      .withColumn("fp", md5(col("text")))
      .withWatermark("ingest_ts", window)
      .dropDuplicatesWithinWatermark("fp")

  case class CappedDoc(doc_id: Long, source: String, rk: Int)

  /** Streaming per-source document cap: admit at most `cap` docs per
    * source across the stream's lifetime — CurationOps.sourceCaps as an
    * ingest-time gate. Keyed counter state (one Int per source, NOT per
    * doc), so state size tracks |sources|, never corpus size; the batch
    * twin re-ranks retrospectively while this admits greedily in arrival
    * order — the two agree on counts, not necessarily on survivors. */
  def sourceCapStream(docs: Dataset[(Long, String)], cap: Int = 15): Dataset[CappedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[(Long, String)], state: GroupState[Int]) => {
          val already = state.getOption.getOrElse(0)
          // deterministic within a batch: admit in doc_id order
          val admitted = rows.map(_._1).toSeq.sorted.take(math.max(cap - already, 0))
          state.update(already + admitted.size)
          admitted.iterator.zipWithIndex.map { case (id, i) =>
            CappedDoc(id, source, already + i + 1)
          }
        })
  }

  case class ServerSeen(server: String)
  case class NewServer(server: String, firstSeen: java.sql.Timestamp)

  /** O-58 new-server watcher: emit each server the first time it appears
    * (`api/compactor/CompactorManager.java:147-164`). Custom keyed state
    * via flatMapGroupsWithState — the general tool for reference loops
    * whose state isn't a dedup window. */
  def newServers(observations: Dataset[(String, java.sql.Timestamp)]): Dataset[NewServer] = {
    import observations.sparkSession.implicits._
    observations
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (server: String, rows: Iterator[(String, java.sql.Timestamp)], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.map(_._2).minBy(_.getTime)
            Iterator(NewServer(server, first))
          }
        })
  }
}
