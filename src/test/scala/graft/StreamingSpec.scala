package graft

import java.sql.Timestamp

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("compaction stream dedups a region within the no-recompact watermark (O-54)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Long, Int, Double)]
    val df = input.toDF()
      .toDF("region_id", "snapshot_ts", "size_mb", "max_file_mb", "file_count", "locality")
    val q = StreamingOps.compactionStream(df)
      .writeStream.format("memory").queryName("compact_out").outputMode("append").start()
    try {
      // same region twice in one watermark window + one tiny region (filtered)
      input.addData(
        (1L, ts(0), 5000L, 50L, 40, 0.1),
        (1L, ts(1), 5000L, 50L, 40, 0.1),
        (2L, ts(1), 5L, 1L, 1, 0.9))
      q.processAllAvailable()
      val out = s.sql("SELECT region_id FROM compact_out").collect().map(_.getLong(0))
      assert(out.toSeq == Seq(1L))
    } finally q.stop()
  }

  test("distributor stream suppresses repeated tables within 6h (O-55)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Timestamp, Long)]
    val df = input.toDF().toDF("table_name", "snapshot_ts", "weight")
    val q = StreamingOps.distributorStream(df)
      .writeStream.format("memory").queryName("dist_out").outputMode("append").start()
    try {
      input.addData(("t1", ts(0), 10L), ("t1", ts(5), 11L), ("t2", ts(5), 9L))
      q.processAllAvailable()
      val out = s.sql("SELECT table_name FROM dist_out").collect().map(_.getString(0)).sorted
      assert(out.toSeq == Seq("t1", "t2"))
    } finally q.stop()
  }

  test("canary probes fold to per-window availability (O-56, O-38)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Boolean)]
    val df = input.toDF().toDF("probe_ts", "op_type", "ok")
    val q = StreamingOps.canaryFold(df)
      .writeStream.format("memory").queryName("canary_out").outputMode("append").start()
    try {
      input.addData((ts(0), "read", true), (ts(1), "read", false), (ts(2), "write", true))
      // advance watermark past the window so append-mode emits it
      input.addData((ts(40), "read", true))
      q.processAllAvailable()
      val out = s.sql("SELECT op_type, available, n_probes FROM canary_out ORDER BY op_type")
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
      assert(out.contains(("read", false, 2L)))
      assert(out.contains(("write", true, 1L)))
    } finally q.stop()
  }

  test("new-server watcher emits each server exactly once (O-58)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingOps.newServers(input.toDS())
      .writeStream.format("memory").queryName("servers_out").outputMode("append").start()
    try {
      input.addData(("s1", ts(0)), ("s1", ts(1)))
      q.processAllAvailable()
      input.addData(("s2", ts(2)), ("s1", ts(3)))
      q.processAllAvailable()
      val out = s.sql("SELECT server FROM servers_out").collect().map(_.getString(0)).sorted
      assert(out.toSeq == Seq("s1", "s2"))
    } finally q.stop()
  }
}
