package graft.operators

import graft.SparkSpec
import graft.sources.BulkOps
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Direct protocol-level specs for [[IndexLifecycle]] — the scenarios
  * the per-index suites (DedupIndexSpec / AnnIndexSpec /
  * RetrievalLayoutSpec) exercise only through their own table layouts.
  */
class IndexLifecycleSpec extends SparkSpec {

  /** One-table guarded index fixture: `rows(id, v)` + the sidecar. */
  private def freshIndex(n: Long): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_lifecycle").toString
    val initial = (0L until n).toDF("id")
    BulkOps.writePath(initial.withColumn("v", col("id") * 10), SaveMode.Overwrite)
      .save(s"$dir/rows")
    IndexLifecycle.writeIds(spark, dir, "id", initial, n)
    dir
  }

  private def rowsTable(dir: String) =
    IndexLifecycle.GuardedTable("rows", col("id").isNotNull, (fresh: DataFrame) =>
      BulkOps.writePath(fresh.withColumn("v", col("id") * 10), SaveMode.Append)
        .save(s"$dir/rows"))

  test("append probes at the FRESHLY-READ dial: an out-of-band sidecar " +
      "rewrite at a different dial cannot double-write committed ids") {
    val s = spark
    import s.implicits._
    val dir = freshIndex(40) // sizedParts clamps to the 16-dir floor; memo now holds 16
    // another process rebuilds the sidecar at dial 32 (no memo update —
    // that is the point: this JVM's memo is now stale)
    val rebuilt = (0L until 40L).toDF("id")
      .withColumn("ib", pmod(col("id"), lit(32L)))
    BulkOps.writePath(rebuilt.repartition(col("ib")), SaveMode.Overwrite)
      .partitionBy("ib").save(s"$dir/ids")
    BulkOps.writePath(Seq(32L).toDF("id_parts"), SaveMode.Overwrite)
      .save(s"$dir/ids_meta")
    // a batch mixing committed ids (0..39) and fresh ones (40..49): a
    // probe at the STALE dial 16 would miss every sidecar directory
    // ib >= 16 and re-commit ~half the committed ids
    IndexLifecycle.appendGuarded(spark, dir, "id",
      (0L until 50L).toDF("id"), Seq(rowsTable(dir)))
    val got = BulkOps.readPath(spark, s"$dir/rows")
    assert(got.count() == 50, "committed ids must not re-append")
    assert(got.groupBy("id").count().filter(col("count") > 1).isEmpty,
      "no id may hold duplicate rows after the mixed append")
    // and the fresh ids landed in the sidecar at the CURRENT dial
    val sidecar = BulkOps.readPath(spark, s"$dir/ids")
    assert(sidecar.count() == 50)
    assert(sidecar.filter(col("ib") =!= pmod(col("id"), lit(32L))).isEmpty,
      "appended sidecar rows must bucket at the stored dial, not the stale memo")
  }

  test("writeIds refuses an empty id set loudly") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_lifecycle_empty").toString
    val err = intercept[IllegalArgumentException] {
      IndexLifecycle.writeIds(spark, dir, "id",
        Seq.empty[Long].toDF("id"), 0L)
    }
    assert(err.getMessage.contains("empty id set"))
    assert(!BulkOps.fileExists(spark, s"$dir/ids"),
      "a refused write must leave nothing behind")
  }
}
