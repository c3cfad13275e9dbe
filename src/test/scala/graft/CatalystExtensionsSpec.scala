package graft

import java.nio.file.Files

import graft.functions.CompactionWeightExpr
import graft.operators.CompactionOps
import org.apache.spark.sql.functions._

class CatalystExtensionsSpec extends SparkSpec {

  test("native compaction_weight matches the CASE-expression formula on real data") {
    val m = graft.cluster.ClusterViews.regionMetrics(spark, sf)
    val caseExpr = when(col("size_mb") < 10, lit(0.0))
      .otherwise((lit(1.0) - col("locality")) * 115.0 +
        ((col("size_mb") - col("max_file_mb")) / 1024.0) * (col("file_count") * 1.33))
    val native = CompactionOps.weight(col("size_mb"), col("max_file_mb"), col("file_count"), col("locality"))
    val diff = m.select(caseExpr.as("a"), native.as("b")).filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("interpreted eval matches codegen (compute) on edge values") {
    assert(CompactionWeightExpr.compute(5L, 1L, 3, 0.5) == 0.0)
    assert(CompactionWeightExpr.compute(1024L, 0L, 1, 0.0) == 115.0 + 1.33)
  }

  test("double weight tracks the reference float path within float epsilon (documented deviation)") {
    // CompactionWeight.java:43 computes in float; our compute() uses double
    // (documented in the scaladoc so the SQL oracle matches bit-for-bit).
    // Characterize the deviation: relative error stays at float-epsilon
    // scale across the realistic input space, so rankings are unaffected.
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 2000) {
      val size = 10L + rnd.nextInt(1 << 20)
      val maxFile = (rnd.nextDouble() * size).toLong
      val files = 1 + rnd.nextInt(60)
      val loc = rnd.nextFloat().toDouble
      val d = CompactionWeightExpr.compute(size, maxFile, files, loc)
      val f = ((1.0f - loc.toFloat) * 115f + ((size - maxFile) / 1024f) * (files * 1.33f)).toDouble
      assert(math.abs(d - f) <= math.max(1e-2, math.abs(d) * 1e-5),
        s"size=$size maxFile=$maxFile files=$files loc=$loc d=$d f=$f")
    }
  }

  test("vector kernels match the interpreted HOF folds bit-for-bit") {
    val s = spark
    import s.implicits._
    import graft.functions.VectorExprs._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(64) {
      (rnd.nextInt(8).toLong,
        Array.fill(64)(rnd.nextFloat() * 2f - 1f),
        Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("j", "a", "b").cache()
    def dbl(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("double"))
    def foldSum(c: org.apache.spark.sql.Column) = aggregate(c, lit(0.0), (acc, x) => acc + x)
    val hofDot = foldSum(zip_with(dbl(col("a")), dbl(col("b")), (x, y) => x * y))
    val hofSq = foldSum(transform(dbl(col("a")), x => x * x))
    val hofPlane = foldSum(transform(sequence(lit(1), lit(64)),
      d => element_at(dbl(col("a")), d) * (((col("j") * 67 + d * 31) % 19) - 9).cast("double")))
    assert(df.filter(vec_dot(col("a"), col("b")) =!= hofDot).count() == 0)
    assert(df.filter(vec_sumsq(col("a")) =!= hofSq).count() == 0)
    assert(df.filter(plane_dot(col("a"), col("j")) =!= hofPlane).count() == 0)
    // mismatched lengths yield null, not garbage
    val bad = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    assert(bad.select(vec_dot(col("a"), col("b")).as("d")).filter(col("d").isNull).count() == 1)
    df.unpersist()
  }

  test("nfc expression: canonical composition, idempotence, fast path, SQL resolution") {
    val s = spark
    import s.implicits._
    import graft.functions.NormalizeNfc.nfc
    val decomposed = "caf" + "e\u0301" // combining acute
    val precomposed = "caf\u00e9"
    assert(decomposed != precomposed, "fixture must start in distinct forms")
    val df = Seq((1L, decomposed), (2L, precomposed), (3L, "plain ascii"))
      .toDF("id", "t")
    val out = df.select(col("id"), nfc(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // both forms compose to the same bytes; ASCII passes through
    assert(out(1L) == precomposed && out(2L) == precomposed)
    assert(out(3L) == "plain ascii")
    // idempotent: nfc(nfc(x)) == nfc(x)
    assert(df.filter(nfc(nfc(col("t"))) =!= nfc(col("t"))).count() == 0)
    // null-safe
    assert(Seq(Option.empty[String]).toDF("t")
      .select(nfc(col("t")).as("n")).filter(col("n").isNotNull).count() == 0)
    // resolves in SQL via session extensions, no manual registration
    // (literals injected as Scala escapes: Spark's chr() is ASCII-mod-256,
    // unlike DuckDB's codepoint chr — the oracle side uses DuckDB's)
    assert(spark.sql(s"SELECT nfc('$decomposed') = '$precomposed'")
      .collect()(0).getBoolean(0))
  }

  test("optimizer rule derives size_mb >= 10 bound and pushes it to the parquet scan") {
    val dir = Files.createTempDirectory("graft_weight_push").toString
    graft.cluster.ClusterViews.regionMetrics(spark, sf).write.parquet(s"$dir/metrics")
    val scan = spark.read.parquet(s"$dir/metrics")
    val filtered = scan.filter(
      CompactionOps.weight(col("size_mb"), col("max_file_mb"), col("file_count"), col("locality")) > 15.0)
    val optimized = filtered.queryExecution.optimizedPlan.toString
    assert(optimized.contains(">= 10"), s"derived bound missing in:\n$optimized")
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("GreaterThanOrEqual(size_mb,10)"),
      s"pushed filter missing in:\n$physical")
    // and the rule must not change results: compare to a session-less CASE filter
    val expected = scan.filter(
      when(col("size_mb") < 10, lit(0.0))
        .otherwise((lit(1.0) - col("locality")) * 115.0 +
          ((col("size_mb") - col("max_file_mb")) / 1024.0) * (col("file_count") * 1.33)) > 15.0).count()
    assert(filtered.count() == expected)
  }

  test("O-2 flatten round-trips the nested server map") {
    val m = graft.cluster.ClusterViews.regionMetrics(spark, sf)
      .select("server", "region_id", "size_mb", "file_count")
    val nested = graft.operators.CoverageOps.nestServerMap(
      graft.cluster.ClusterViews.regionMetrics(spark, sf))
    val flat = graft.operators.CoverageOps.flattenServerMap(nested)
    assert(flat.count() == m.count())
    assert(flat.join(m, Seq("server", "region_id", "size_mb", "file_count")).count() == m.count())
  }

  test("wait-until helper is retry-bounded (O-59)") {
    var calls = 0
    val ok = graft.tools.Waits.until(retries = 3, delayMs = 1) { () => calls += 1; calls >= 2 }
    assert(ok && calls == 2)
    var calls2 = 0
    val fail = graft.tools.Waits.until(retries = 2, delayMs = 1) { () => calls2 += 1; false }
    assert(!fail && calls2 == 3)
  }
}
