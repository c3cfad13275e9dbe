package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins — the 100-TB
  * path for the engine's recurring region⋈metrics / orders⋈lineitem join
  * shapes (reference joins its meta scan to JMX metrics on every report
  * cycle; at Spark scale the same join should be pre-bucketed, not
  * re-shuffled per query).
  *
  * Both sides written with `bucketBy(n, key)` + `sortBy(key)` hash-place
  * rows identically, so a later equi-join on the key needs NO Exchange on
  * either side (SortMergeJoin reads buckets pairwise) — the dominant
  * shuffle for fact⋈fact joins disappears. Dimension joins should still
  * broadcast; bucketing is for the big⋈big case where neither side fits.
  *
  * Bucket count sizing at 100 TB: target ~128-256 MB per bucket file per
  * partition write; too few buckets = giant files + low parallelism, too
  * many = small-file pressure. The bucket count must MATCH on both sides
  * (Spark joins bucketed tables shuffle-free only when counts are equal
  * or integer multiples with bucketed-scan enabled).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key. With matching
    * bucket counts the planned join has no Exchange under either child —
    * assert via [[exchangeCount]] in tests/audits. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Number of Exchange (shuffle) operators in a frame's executed plan —
    * the thing bucketing is supposed to drive to zero for the join. */
  def exchangeCount(df: DataFrame): Int = {
    // unwrap AQE so the count reflects the real join plan, not the wrapper
    val root = df.queryExecution.executedPlan
    val plan = root match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.length
  }
}
