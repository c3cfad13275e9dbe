package graft

import graft.cluster.ClusterViews
import graft.plans.ActionPlans
import graft.operators.Salting
import graft.sinks.ReportSinks
import org.apache.spark.sql.functions._

class PlansAndSaltingSpec extends SparkSpec {

  test("typed action plans mirror their query counterparts") {
    assert(ActionPlans.compactionActions(spark, sf).count() ==
      SparkEntry.queries("compaction_plan")(spark, sf).count())
    assert(ActionPlans.moveActions(spark, sf).count() ==
      SparkEntry.queries("move_plan")(spark, sf).count())
    assert(ActionPlans.splitActions(spark, sf).count() ==
      SparkEntry.queries("split_plan")(spark, sf).count())
  }

  test("plans route into the fix-script sink with hbase shell commands") {
    val moves = ActionPlans.moveActions(spark, sf)
    val findings = ActionPlans.toFindings(moves.toDF(), "move")
    val script = ReportSinks.renderFixScript(findings.collect().toSeq.take(3))
    assert(script.contains("| hbase shell"))
    assert(script.contains("move '"))
  }

  test("compaction-queue cleaner: one clear action per server, shell-routable") {
    val actions = ActionPlans.clearQueueActions(spark)
    assert(actions.count() == 24 && actions.select("server").distinct().count() == 24)
    val findings = ActionPlans.toFindings(actions.toDF(), "clear_queues").collect().toSeq
    assert(findings.head.command.contains("clear_compaction_queues '") &&
      findings.head.command.contains("['long','short']"))
    // the script shell-quotes the command, so assert structure, not raw text
    val script = ReportSinks.renderFixScript(findings.take(2))
    assert(script.contains("clear_compaction_queues") && script.contains("| hbase shell"))
  }

  test("per-server fan-out fires once per server with all its rows (RSTask shape)") {
    val plan = ActionPlans.compactionActions(spark, sf).toDF()
    val expected = plan.groupBy("server").count().collect()
      .map(r => r.getAs[String]("server") -> r.getAs[Long]("count")).toMap
    // the closure is serialized even in local mode — an accumulator is the
    // only executor→driver channel that survives the round-trip
    val acc = spark.sparkContext.collectionAccumulator[(String, Int)]("fanout")
    ActionPlans.perServerFanout(plan, "server") { (server, rows) =>
      acc.add(server -> rows.size)
    }
    import scala.jdk.CollectionConverters._
    val seen = acc.value.asScala
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2.toLong).sum }
    assert(seen == expected)
  }

  test("typed cluster views expose case-class rows") {
    val m = ClusterViews.regionMetricsDs(spark, sf)
    val first = m.head()
    assert(first.server.startsWith("s") && first.size_mb > 0)
    val t = ClusterViews.topologyDs(spark, sf)
    assert(t.head().snapshot_ts != null)
  }

  test("salted inner join equals plain join on a skewed fixture") {
    val s = spark
    import s.implicits._
    // hot key: 90% of big rows share key 1
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 1L, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (20L, "a"), (30L, "b")).toDF("k", "name")
    val plain = big.join(small, Seq("k"), "inner")
    val salted = Salting.saltedInnerJoin(big, small, "k", 8)
    assert(salted.count() == plain.count())
    val diff = salted.select("k", "v", "name").exceptAll(plain.select("k", "v", "name")).count()
    assert(diff == 0)
  }

  test("salted two-phase count equals direct count") {
    val s = spark
    import s.implicits._
    val df = (1 to 5000).map(i => (if (i % 100 == 0) i.toLong else 7L)).toDF("k")
    val direct = df.groupBy("k").count().withColumnRenamed("count", "cnt")
    val salted = Salting.saltedCount(df, "k", 16)
    assert(salted.exceptAll(direct).count() == 0 && direct.exceptAll(salted).count() == 0)
  }

  test("asof join: floorEntry tie semantics, carry-forward, and no-earlier-row nulls") {
    val s = spark
    import s.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val left = Seq(
      (1L, "k1", t(0)),  // before any right row -> null
      (2L, "k1", t(5)),  // exactly at a right ts -> that row (tie counts)
      (3L, "k1", t(7)),  // between right rows -> carry t(5)'s value
      (4L, "k1", t(20)), // after the last -> latest value
      (5L, "k2", t(30))  // key with no right rows at all -> null
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", t(5), "v5"), ("k1", t(10), "v10")
    ).toDF("k", "rts", "v")
    val out = graft.operators.JoinsOps.asofJoin(left, right, "k", "ts", "rts")
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> None, 2L -> Some("v5"), 3L -> Some("v5"), 4L -> Some("v10"), 5L -> None))
  }

  test("asof join matches a brute-force reference on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val leftRows = (1 to 300).map(i => (i.toLong, s"k${rnd.nextInt(6)}", t(rnd.nextInt(200))))
    // unique (key, ts) on the right, as the operator contract requires
    val rightRows = rnd.shuffle(
      (for (k <- 0 until 6; m <- 0 until 200) yield (s"k$k", t(m))).toList)
      .take(60).zipWithIndex.map { case ((k, ts), i) => (k, ts, s"v$i") }
    val out = graft.operators.JoinsOps.asofJoin(
      leftRows.toDF("id", "k", "ts"), rightRows.toDF("k", "rts", "v"), "k", "ts", "rts")
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val expected = leftRows.map { case (id, k, ts) =>
      id -> rightRows.filter(r => r._1 == k && !r._2.after(ts))
        .sortBy(_._2.getTime).lastOption.map(_._3)
    }.toMap
    assert(out == expected)
  }

  test("sharded asof join matches the unsharded operator on skewed random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(47)
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // dominant-key shape: 80% of left rows on one hot key — the case the
    // sharded plan exists for — plus a key with no right rows and left
    // rows with NULL timestamps (both must behave identically)
    val leftRows = (1 to 500).map { i =>
      val k = if (rnd.nextInt(10) < 8) "hot" else s"k${rnd.nextInt(5)}"
      val ts = if (i % 97 == 0) null else t(rnd.nextInt(300))
      (i.toLong, k, ts)
    }
    val rightRows = rnd.shuffle(
      (for (k <- "hot" +: (0 until 4).map(i => s"k$i"); m <- 0 until 300) yield (k, t(m))).toList)
      .take(80).zipWithIndex.map { case ((k, ts), i) => (k, ts, s"v$i") }
    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.toDF("k", "rts", "v")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).sortBy(_._1).toSeq
    val unsharded = norm(graft.operators.JoinsOps.asofJoin(left, right, "k", "ts", "rts"))
    for (shards <- Seq(2, 8, 64)) { // fewer, comparable to, and more shards than distinct ts values per key
      val sharded = norm(
        graft.operators.JoinsOps.asofJoinSharded(left, right, "k", "ts", "rts", numShards = shards))
      assert(sharded == unsharded, s"numShards=$shards diverged from the unsharded asof join")
    }
  }

  test("property: sharded asof join is shard-count invariant under constant-timestamp skew") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val keys = Seq("hot", "k0", "k1")
    // the ADVICE shape: most left rows on one hot key, and many of THOSE
    // sharing one constant timestamp (a default/backfill ts) — the case a
    // ts-only shard hash cannot spread; plus occasional NULL timestamps
    val genCase: Gen[(Seq[(Long, String, java.sql.Timestamp)], Seq[(String, java.sql.Timestamp, String)])] =
      for {
        nLeft <- Gen.choose(20, 60)
        constM <- Gen.choose(0, 50)
        lefts <- Gen.listOfN(nLeft, for {
          k <- Gen.frequency((7, Gen.const("hot")), (3, Gen.oneOf("k0", "k1")))
          kind <- Gen.frequency((5, 0), (4, 1), (1, 2)) // constant ts / random ts / null
          m <- Gen.choose(0, 50)
        } yield (k, kind match {
          case 0 => t(constM)
          case 1 => t(m)
          case _ => null.asInstanceOf[java.sql.Timestamp]
        }))
        grid = for (k <- keys; m <- 0 until 51 by 7) yield (k, m)
        rights <- Gen.someOf(grid)
      } yield (
        lefts.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) },
        rights.toSeq.zipWithIndex.map { case ((k, m), i) => (k, t(m), s"v$i") })
    val prop = Prop.forAll(genCase) { case (leftRows, rightRows) =>
      val left = leftRows.toDF("id", "k", "ts")
      val right = rightRows.toDF("k", "rts", "v")
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "v").collect()
          .map(r => r.getLong(0) -> Option(r.getString(1))).sortBy(_._1).toSeq
      val base = norm(graft.operators.JoinsOps.asofJoin(left, right, "k", "ts", "rts"))
      Seq(1, 2, 8, 32).forall { shards =>
        norm(graft.operators.JoinsOps.asofJoinSharded(
          left, right, "k", "ts", "rts", numShards = shards)) == base
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withInitialSeed(Seed(13L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("binned range lookup agrees with the broadcast variant on random ranges") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    // non-contiguous ranges with gaps; probes inside, in gaps, and beyond
    var cursor = 0L
    val ranges = (1 to 80).map { i =>
      val start = cursor + rnd.nextInt(500)
      val end = start + 1 + rnd.nextInt(9000) // spans multiple 4096-bins sometimes
      cursor = end + (if (rnd.nextBoolean()) 0L else rnd.nextInt(3000).toLong) // gap or adjacency
      (s"r$i", "t0", start, end)
    }
    val info = ranges.toDF("region_id", "table_name", "start_key", "end_key")
    val probes = (1 to 500).map(_ => rnd.nextLong().abs % (cursor + 5000)).toDF("probe_key")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).sorted.toSeq
    val broadcasted = norm(graft.operators.TopologyOps.keyRangeLookup(probes, info))
    val binned = norm(graft.operators.TopologyOps.keyRangeLookupBinned(probes, info))
    assert(binned == broadcasted)
  }
}
