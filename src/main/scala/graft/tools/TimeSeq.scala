package graft.tools

import graft.SparkEntry

/** Dev harness: time a comma-separated list of contract queries in order,
  * N passes, in one JVM — reproduces bench-sequence cache interactions that
  * single-query timing (TimeOne) can't see.
  * `scripts/run.sh graft.tools.TimeSeq q1,q2,... [sfDir] [passes]` */
object TimeSeq {
  def main(args: Array[String]): Unit = {
    // "ALL" = SparkEntry.queries iteration order — the bench's exact order
    val names =
      if (args(0) == "ALL") SparkEntry.queries.keys.toSeq
      else args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = TimingSession.create()
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def postingsCached: Boolean =
      org.apache.spark.sql.graftbridge.CacheProbe.isCached(
        graft.operators.DedupOps.postingsPlanForProbe(docs))
    for (p <- 1 to passes; name <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[time-seq] pass$p $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)  postingsCached=$postingsCached")
    }
    spark.stop()
  }
}
