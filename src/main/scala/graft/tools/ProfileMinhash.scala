package graft.tools

import graft.operators.DedupOps
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for the minhash pipeline (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.expressions.Window

    val hofShingles = docs.select(col("doc_id"),
      explode(shingles3(tokens(col("text")))).as("shingle"))
    time("a: HOF shingles only")(println(hofShingles.count()))
    time("a2: HOF shingles again")(println(hofShingles.count()))
    time("b: HOF + md5conv")(println(
      hofShingles.select(col("doc_id"), stableHash31(col("shingle")).as("x31")).distinct().count()))
    time("c: HOF + xxhash64")(println(
      hofShingles.select(col("doc_id"), xxhash64(col("shingle")).as("x31")).distinct().count()))
    time("d: HOF string distinct")(println(
      hofShingles.distinct().count()))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val winShingles = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
    time("e: window shingles")(println(winShingles.count()))
    time("f: window + md5conv distinct")(println(
      winShingles.select(col("doc_id"), stableHash31(col("shingle")).as("x31")).distinct().count()))
    spark.stop()
  }
}
