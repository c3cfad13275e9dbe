package graft

import graft.operators.{DedupOps, GraphOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  test("dedup clusters: labels are component minima and closed under the pair graph") {
    val docs = Tables.documents(spark, sf)
    val clusters = GraphOps.dedupClusters(docs).cache()
    val pairs = DedupOps.ngramJaccard(docs).select("da", "db")
    // every endpoint of every pair is labeled
    val endpoints = pairs.select(col("da").as("doc_id"))
      .unionByName(pairs.select(col("db").as("doc_id"))).distinct()
    assert(endpoints.join(clusters, "doc_id").count() == endpoints.count())
    // both endpoints of any pair share a cluster (transitive closure reached)
    val mismatched = pairs
      .join(clusters.select(col("doc_id").as("da"), col("cluster_id").as("ca")), "da")
      .join(clusters.select(col("doc_id").as("db"), col("cluster_id").as("cb")), "db")
      .filter(col("ca") =!= col("cb"))
    assert(mismatched.count() == 0)
    // cluster id is the minimum member id
    val badMin = clusters.groupBy("cluster_id").agg(min("doc_id").as("m"))
      .filter(col("cluster_id") =!= col("m"))
    assert(badMin.count() == 0)
    clusters.unpersist()
  }

  test("connected components converge across the lineage-checkpoint boundary") {
    // a 101-node path needs ~log2(100) ≈ 7 pointer-doubling rounds, so the
    // loop crosses the CheckpointEvery=5 localCheckpoint at least once
    val pairs = spark.range(100).select(col("id").as("da"), (col("id") + 1).as("db"))
    val labels = GraphOps.connectedComponents(pairs)
    assert(labels.count() == 101)
    assert(labels.filter(col("cluster_id") =!= 0L).count() == 0)
  }

  test("non-convergence is a hard failure, not a warning") {
    val pairs = spark.range(100).select(col("id").as("da"), (col("id") + 1).as("db"))
    val ex = intercept[IllegalStateException] {
      GraphOps.connectedComponents(pairs, maxIters = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("cluster memo hits across separately-constructed identical inputs") {
    GraphOps.clearClusterMemo()
    val r1 = GraphOps.dedupClusters(Tables.documents(spark, sf))
    r1.count()
    assert(GraphOps.memoSize == 1)
    val r2 = GraphOps.dedupClusters(Tables.documents(spark, sf))
    assert(GraphOps.memoSize == 1, "memo missed for an identical input plan")
    // identity, not timing: a hit returns the SAME materialized frame, so
    // the propagation loop provably did not re-run
    assert(r1 eq r2, "memo returned a different frame for an identical input plan")
  }

  test("cluster-label memo stays bounded across distinct input plans") {
    val s = spark
    import s.implicits._
    GraphOps.clearClusterMemo()
    (0 until GraphOps.MemoMaxEntries + 2).foreach { i =>
      val docs = Seq(
        (0L, s"tok$i a b c d e f g h", "en", "s"),
        (1L, s"tok$i a b c d e f g h", "en", "s")
      ).toDF("doc_id", "text", "lang", "source")
      val labels = GraphOps.dedupClusters(docs)
      assert(labels.count() == 2) // both docs share one component
    }
    assert(GraphOps.memoSize <= GraphOps.MemoMaxEntries,
      s"memo grew to ${GraphOps.memoSize} entries")
    GraphOps.clearClusterMemo()
    assert(GraphOps.memoSize == 0)
  }

  test("reliable checkpoints are used when the session has a checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = spark.range(100).select(col("id").as("da"), (col("id") + 1).as("db"))
      val labels = GraphOps.connectedComponents(pairs)
      assert(labels.count() == 101)
      assert(labels.filter(col("cluster_id") =!= 0L).count() == 0)
      // the materialization actually landed on the checkpoint filesystem
      val written = new java.io.File(dir).listFiles()
      assert(written != null && written.nonEmpty, s"no reliable checkpoint under $dir")
    } finally {
      // setCheckpointDir is SparkContext-global; in local mode a null
      // restores Option(null) = None, so suites running after this one in
      // the shared JVM keep using localCheckpoint — no cross-suite leak
      spark.sparkContext.setCheckpointDir(null)
      assert(spark.sparkContext.getCheckpointDir.isEmpty,
        "checkpoint dir must be restored for later suites")
    }
  }

  test("session funnel counts partition all sessions") {
    val events = Tables.events(spark, sf)
    val funnel = GraphOps.sessionFunnel(events)
    val totalSessions = funnel.agg(sum("n_sessions")).collect()(0).getLong(0)
    // independent session count via the sessions operator
    val sessions = graft.operators.EventsOps.sessions(events).count()
    assert(totalSessions == sessions)
  }
}
