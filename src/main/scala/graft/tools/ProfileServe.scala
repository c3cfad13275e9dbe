package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timing of the dedup serve-only path against
  * a (scaled) corpus dir with caching off — where do the seconds go?
  * `scripts/run.sh graft.tools.ProfileServe /tmp/graft_scale/x100` */
object ProfileServe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = TimingSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set(graft.Caching.EnabledKey, "false")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // pass 1: build (untimed interest), pass 2/3: serve
    t("pass1 build+serve") {
      graft.operators.DedupIndexOps.dedupServeOnly(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    for (p <- 2 to 4)
      t(s"pass$p serve") {
        graft.operators.DedupIndexOps.dedupServeOnly(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    // discovery-cost experiment: how much of a serve is just LISTING the
    // two partitioned tables?
    val idx = graft.tools.IndexScratch.prebuiltDir(spark, "graft_dedupidx_so", dir)(_ => ())
    for (p <- 1 to 2) {
      val sigs = t(s"construct sigs df #$p")(graft.sources.BulkOps.readPath(spark, s"$idx/sigs"))
      t(s"sigs pruned count #$p")(println("  rows=" + sigs.filter(col("pb").isin(0, 1, 2)).count()))
      val mins = t(s"construct mins df #$p")(graft.sources.BulkOps.readPath(spark, s"$idx/mins"))
      t(s"mins pruned count #$p")(println("  rows=" + mins.filter(col("mb").isin(0, 1)).count()))
    }
    spark.stop()
  }
}
