package graft.tools

import graft.operators.DedupOps
import graft.sources.Tables

/** Ad-hoc stage profiler for the minhash pipeline (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TimingSession.create()
    val docs = Tables.documents(spark, sfDir)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    import org.apache.spark.sql.functions._

    val postings = DedupOps.postingsForProfile(docs)
    for (p <- 1 to 2) {
      time(s"pass$p postings")(println(postings.count()))
      val sigs = DedupOps.minhashSignatures(postings, spark)
      time(s"pass$p signatures")(println(sigs.count()))
      val pairs = sigs.as("a")
        .join(sigs.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      time(s"pass$p bucket-join pairs")(println(pairs.count()))
      time(s"pass$p full minhashLsh")(println(DedupOps.minhashLsh(docs, spark).count()))
    }
    spark.stop()
  }
}
