package graft

import graft.cluster.ClusterViews
import graft.operators.CompactionOps
import org.apache.spark.sql.functions._

class CompactionOpsSpec extends SparkSpec {

  test("weight formula matches reference semantics on hand values") {
    // reference api/compactor/CompactionWeight.java:39-44:
    // size<10 -> 0; else (1-loc)*115 + ((size-maxFile)/1024)*(files*1.33)
    val s = spark
    import s.implicits._
    val df = Seq(
      (5L, 1L, 1, 0.5),      // tiny -> 0
      (1024L, 0L, 1, 0.0),   // (1-0)*115 + (1024/1024)*(1*1.33) = 116.33
      (2048L, 1024L, 2, 1.0) // 0 + (1024/1024)*(2*1.33) = 2.66
    ).toDF("size_mb", "max_file_mb", "file_count", "locality")
    val got = df
      .select(CompactionOps.weight(col("size_mb"), col("max_file_mb"), col("file_count"), col("locality")).as("w"))
      .collect()
      .map(_.getDouble(0))
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 116.33) < 1e-9)
    assert(math.abs(got(2) - 2.66) < 1e-9)
  }

  test("plan: per-server queues are ranked, capped at depth, above thresholds") {
    val plan = CompactionOps.plan(ClusterViews.regionMetrics(spark, sf)).cache()
    assert(plan.count() > 0)
    val perServer = plan.groupBy("server").count().collect()
    assert(perServer.forall(_.getLong(1) <= CompactionOps.DefaultQueueDepth))
    // ranks within a server are 1..n dense
    val ranks = plan
      .groupBy("server")
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("maxr"), min(col("rnk")).as("minr"))
      .collect()
    assert(ranks.forall(r => r.getAs[Int]("maxr").toLong == r.getAs[Long]("n") && r.getAs[Int]("minr") == 1))
    plan.unpersist()
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
