package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Dumps formatted physical plans for representative queries and flags
  * plan smells: missing parquet pushdown/pruning, unexpected cartesian
  * products, missing broadcasts, non-codegen hot paths (dev tool).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "compaction_plan", "revenue_nat", "key_lookup",
      "topology_asof", "dedup_minhash", "ann_lsh_topk", "merge_plan", "kv_pivot")
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(FormattedMode)
      println(s"\n================ $n ================")
      println(plan)
      val smells = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "no-PushedFilters-anywhere" -> !plan.contains("PushedFilters"),
        "SortMergeJoin-on-small-input" -> false // eyeball via output
      ).collect { case (s, true) => s }
      if (smells.nonEmpty) println(s"[smell] $n: ${smells.mkString(", ")}")
    }
    spark.stop()
  }
}
