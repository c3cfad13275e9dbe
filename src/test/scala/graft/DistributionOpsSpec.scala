package graft

import graft.cluster.ClusterViews
import graft.operators.DistributionOps
import org.scalatest.funsuite.AnyFunSuite

/** Pure model of the reference's greedy balance loop
  * (api/distributor/DistributeTableWeight.java:26-47): repeatedly move one
  * region from the max-loaded to the min-loaded server until max-min<=1.
  */
object GreedyBalance {
  def moves(counts: Seq[Long]): Long = {
    val a = counts.toArray
    var n = 0L
    while (a.max - a.min > 1) {
      a(a.indexOf(a.max)) -= 1
      a(a.indexOf(a.min)) += 1
      n += 1
    }
    n
  }

  /** The closed form used by DistributionOps.balanceMoves. */
  def closedForm(counts: Seq[Long]): Long = {
    val total = counts.sum
    val n = counts.size
    val ceilAvg = math.ceil(total.toDouble / n).toLong
    val floorAvg = math.floor(total.toDouble / n).toLong
    val surplus = counts.map(c => math.max(c - ceilAvg, 0L)).sum
    val deficit = counts.map(c => math.max(floorAvg - c, 0L)).sum
    math.max(surplus, deficit)
  }
}

class DistributionOpsSpec extends AnyFunSuite {

  test("closed-form balance moves == reference greedy loop (500 seeded cases)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(30)
      val counts = Seq.fill(n)(rnd.nextInt(61).toLong)
      assert(
        GreedyBalance.closedForm(counts) == GreedyBalance.moves(counts),
        s"counts=$counts")
    }
  }

  test("closed form edge cases: balanced, single server, zero-fill") {
    assert(GreedyBalance.closedForm(Seq(3, 3, 3)) == 0)
    assert(GreedyBalance.closedForm(Seq(7)) == 0)
    assert(GreedyBalance.closedForm(Seq(5, 5, 0)) == 3)
    assert(GreedyBalance.closedForm(Seq(4, 4, 4, 0)) == 3)
  }

  test("approx percentile twin tracks the exact analyzer percentiles") {
    val spark = TestSpark.spark
    val sf = TestSpark.sf
    import org.apache.spark.sql.functions._
    val m = ClusterViews.regionMetrics(spark, sf)
    val exact = graft.operators.AnalyzerOps.sizePercentiles(m)
      .select(col("table_name"), col("p50_size_mb").as("e50"), col("p95_size_mb").as("e95"))
    val approx = graft.operators.AnalyzerOps.sizePercentilesApprox(m)
      .select(col("table_name"),
        col("p50_size_mb").cast("double").as("a50"),
        col("p95_size_mb").cast("double").as("a95"))
    val bad = exact.join(approx, "table_name")
      // percentile_approx returns an actual data value; exact interpolates —
      // allow 10% relative slack plus an absolute floor for tiny groups
      .filter(
        abs(col("a50") - col("e50")) > greatest(col("e50") * 0.1, lit(64.0)) ||
          abs(col("a95") - col("e95")) > greatest(col("e95") * 0.1, lit(64.0)))
    assert(bad.count() == 0, bad.collect().mkString("; "))
  }

  test("move plan empties every surplus and respects the target cap") {
    val spark = TestSpark.spark
    val sf = TestSpark.sf
    val metrics = ClusterViews.regionMetrics(spark, sf).cache()
    val servers = ClusterViews.servers(spark)
    val plan = DistributionOps.movePlan(metrics, servers).cache()
    // no region moves twice
    assert(plan.select("table_name", "region_id").distinct().count() == plan.count())
    // after applying the plan, no server is above its table's ceil target
    import org.apache.spark.sql.functions._
    val after = metrics
      .join(plan.select(col("region_id"), col("to_server")), Seq("region_id"), "left")
      .withColumn("final_server", coalesce(col("to_server"), col("server")))
      .groupBy("table_name", "final_server")
      .count()
    val targets = metrics
      .groupBy("table_name")
      .agg(ceil(count(lit(1)) / lit(24.0)).as("target"))
    val over = after
      .join(targets, "table_name")
      .filter(col("count") > col("target"))
      .count()
    assert(over == 0)
    plan.unpersist(); metrics.unpersist()
  }
}
