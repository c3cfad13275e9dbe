package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared session factory for the timing harnesses (Bench, TimeOne,
  * TimeSeq, ProfileMinhash): identical config = comparable numbers, and
  * the host-stall hardening lives in exactly one place instead of four
  * drifting copies.
  */
object TimingSession {
  def create(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // test parquet files are single-digit-MB; without this the scan is
      // one partition and local parallelism is wasted (real deployments
      // have many files — this only matters for the local fixture)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      // shuffle/spill on tmpfs: the host disk is burst-throttled and MB-scale
      // shuffle writes were intermittently stalling scan-heavy queries 10-50x
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      // the host stalls CPU in multi-minute bursts; with the default
      // 10s heartbeat x 60 maxFailures a ~10-min stall kills the executor
      // (exit 56, lost the whole round-2 bench run). Tolerate ~100 min.
      .config("spark.executor.heartbeatInterval", "30s")
      .config("spark.executor.heartbeat.maxFailures", "200")
      .config("spark.network.timeout", "600s")
      .config("spark.sql.broadcastTimeout", "1200")
      // local-mode JVMs accumulate shuffle files until a driver GC fires
      // the ContextCleaner (default periodic GC: 30 min) — with /dev/shm
      // shuffle dirs that litter is RAM; clean on a tight cadence
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
