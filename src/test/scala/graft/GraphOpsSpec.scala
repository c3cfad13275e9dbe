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

  test("session funnel counts partition all sessions") {
    val events = Tables.events(spark, sf)
    val funnel = GraphOps.sessionFunnel(events)
    val totalSessions = funnel.agg(sum("n_sessions")).collect()(0).getLong(0)
    // independent session count via the sessions operator
    val sessions = graft.operators.EventsOps.sessions(events).count()
    assert(totalSessions == sessions)
  }
}
