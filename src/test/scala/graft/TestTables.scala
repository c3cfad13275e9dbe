package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Spec-side view of a stored-index table under the delta-segment
  * layout (round 13): appended rows live in `<table>_delta` until
  * compaction folds them into the partitioned base, so assertions about
  * "what the index holds" must read base ∪ delta, projected to the
  * requested columns (the base's partition column comes back
  * discovery-typed int, the delta's as the written long — the union
  * widens them). */
object TestTables {
  def fullTable(spark: SparkSession, dir: String, table: String,
      cols: Seq[String]): DataFrame = {
    val base = graft.sources.BulkOps.readPath(spark, s"$dir/$table")
      .select(cols.map(col): _*)
    val dp = s"$dir/${table}_delta"
    if (!graft.sources.BulkOps.fileExists(spark, dp)) base
    else base.unionByName(
      graft.sources.BulkOps.readPath(spark, dp).select(cols.map(col): _*))
  }
}
