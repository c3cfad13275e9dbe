package graft.tools

import org.apache.spark.sql.functions._

/** Micro-probe: is a partitioned `SaveMode.Append` paying a full
  * partition-discovery walk of the EXISTING tree per write job? Times a
  * 200-row append into a 4096-directory table against the same write
  * into a fresh dir — the gap is insert-time discovery, the suspected
  * scale-shape of the append-only stored-index families. */
object TimeAppend {
  def main(args: Array[String]): Unit = {
    val spark = TimingSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val n = args.headOption.map(_.toInt).getOrElse(4096)
    val base = s"/tmp/ta_table_$n"
    val df = spark.range(n.toLong * 2)
      .select(col("id"), pmod(col("id"), lit(n.toLong)).as("pb"))
    df.repartition(col("pb")).write.mode("overwrite").partitionBy("pb").parquet(base)
    val batch = spark.range(200)
      .select((col("id") + 10000000L).as("id"), pmod(col("id"), lit(n.toLong)).as("pb"))
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // two rounds: round 1 may pay one-off committer/codegen warmup
    for (round <- 1 to 2) {
      val a = t(batch.write.mode("append").partitionBy("pb").parquet(base))
      val f = t(batch.write.mode("overwrite").partitionBy("pb").parquet(s"/tmp/ta_fresh_$n"))
      println(f"[time-append] round $round dirs=$n append=$a%6.2fs fresh=$f%6.2fs")
    }
    // dir-count sweep: same 880 rows, growing distinct-partition counts —
    // if the write cost tracks the DIRECTORY count, the append path's
    // scale shape is the per-directory commit overhead, not discovery
    for (dirs <- Seq(50, 200, 400, 800)) {
      val b = spark.range(880)
        .select(col("id"), (col("id") % dirs).as("pb"))
      val w = t(b.repartition(col("pb")).write.mode("overwrite")
        .partitionBy("pb").parquet(s"/tmp/ta_sweep_$dirs"))
      println(f"[time-append] sweep dirs=$dirs%4d rows=880 write=$w%6.2fs")
    }
    spark.stop()
  }
}
