package graft.tools

import graft.SparkEntry

/** Dev harness: time (and optionally explain) a single contract query —
  * `scripts/run.sh graft.tools.TimeOne <query> [sfDir] [passes] [explain]`.
  * Same session config as Bench so numbers are comparable. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val explain = args.contains("explain")
    val spark = TimingSession.create()
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time-one] pass$p $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
