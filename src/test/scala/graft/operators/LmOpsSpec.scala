package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Stupid-backoff trigram LM: invariants of the train/score split, the
  * backoff ladder, and the plan shape.
  */
class LmOpsSpec extends SparkSpec {

  /** The operator's own split predicate, recomputed JVM-side: md5-derived
    * 60-bit bucket of the decimal doc_id string, mod 100. */
  private def trainBucket(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(17, 32), 16) % 100L
  }

  private def heldOutId(from: Long): Long =
    Iterator.iterate(from)(_ + 1).find(id => trainBucket(id) >= LmOps.TrainBuckets).get

  private def trainId(from: Long): Long =
    Iterator.iterate(from)(_ + 1).find(id => trainBucket(id) < LmOps.TrainBuckets).get

  test("backoff scores: full coverage, bounded, level counts partition the trigrams") {
    val docs = Tables.documents(spark, sf)
    val out = LmOps.trigramBackoff(docs).cache()
    val eligible = docs.filter(size(split(col("text"), " ")) >= 3).count()
    assert(out.count() == eligible, "every >=3-token doc must be scored")
    assert(out.filter(col("backoff_e4") < 0 || col("backoff_e4") > 10000).count() == 0)
    assert(out.filter(
      col("n_tri") + col("n_bi") + col("n_uni") > col("n_trigrams")).count() == 0,
      "backoff levels partition (with oov remainder) the trigram instances")
  }

  test("train-split docs always trigram-hit; held-out docs exercise the backoff") {
    val docs = Tables.documents(spark, sf)
    val out = LmOps.trigramBackoff(docs).cache()
    val bucket = graft.functions.TextFunctions
      .stableHash60(col("doc_id").cast("string")) % 100L
    val trainMiss = out
      .join(docs.select(col("doc_id"), bucket.as("b")), "doc_id")
      .filter(col("b") < LmOps.TrainBuckets && col("n_tri") =!= col("n_trigrams"))
    assert(trainMiss.count() == 0,
      "a training doc's own trigrams are in the count tables by construction")
    val backedOff = out
      .join(docs.select(col("doc_id"), bucket.as("b")), "doc_id")
      .filter(col("b") >= LmOps.TrainBuckets)
      .filter(col("n_bi") + col("n_uni") > 0 || col("n_tri") < col("n_trigrams"))
    assert(backedOff.count() > 0,
      "the held-out half must actually hit the backoff branches (else they are dead code)")
  }

  test("identical-corpus degenerate case: one score, all trigram-level") {
    val s = spark
    import s.implicits._
    // 40 identical docs: ids span both splits, every trigram is in-train.
    val docs = (1L to 40L)
      .map(id => (id, "alpha beta gamma alpha beta gamma alpha beta", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = LmOps.trigramBackoff(docs).cache()
    assert(out.count() == 40)
    assert(out.filter(col("n_tri") =!= col("n_trigrams")).count() == 0)
    assert(out.select(countDistinct(col("backoff_e4"))).collect()(0).getLong(0) == 1)
  }

  test("held-out all-OOV doc scores exactly zero; shared-boilerplate doc outscores it") {
    val s = spark
    import s.implicits._
    val oov = heldOutId(1000L)
    val boiler = heldOutId(oov + 1)
    val base = (1L to 30L).map(trainId).distinct
      .map(id => (id, "the quick brown fox jumps over the lazy dog again", "en", "web"))
    val docs = (base :+
      ((oov, "zzq wwk vvm zzq wwk vvm zzq", "en", "web")) :+
      ((boiler, "the quick brown fox jumps over the lazy dog", "en", "web")))
      .toDF("doc_id", "text", "lang", "source")
    val out = LmOps.trigramBackoff(docs).cache()
    val oovRow = out.filter(col("doc_id") === oov).collect()(0)
    assert(oovRow.getAs[Long]("backoff_e4") == 0L, "no token of the OOV doc is in-train")
    assert(oovRow.getAs[Long]("n_tri") == 0L && oovRow.getAs[Long]("n_bi") == 0L
      && oovRow.getAs[Long]("n_uni") == 0L)
    val boilerScore = out.filter(col("doc_id") === boiler)
      .collect()(0).getAs[Long]("backoff_e4")
    assert(boilerScore > 0L, "held-out doc made of in-train trigrams must score")
  }

  test("dsir: full bigram coverage, target docs outweigh non-target on average") {
    val docs = Tables.documents(spark, sf)
    val out = LmOps.dsirWeights(docs).cache()
    val eligible = docs.filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.count() == eligible, "every >=2-token doc must be weighted")
    assert(out.filter(col("imp_e6") < 0).count() == 0)
    val tgt = CurationOps.gopherRules(docs).filter(col("pass")).select("doc_id")
    assert(tgt.count() > 0, "fixture must have gopher-passing docs for a meaningful target")
    val joined = out.join(tgt.withColumn("t", lit(1)), Seq("doc_id"), "left")
    val Array(tgtMean, rawMean) = joined
      .agg(
        avg(when(col("t").isNotNull, col("imp_e6"))),
        avg(when(col("t").isNull, col("imp_e6"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(tgtMean > rawMean,
      s"importance weights must separate target ($tgtMean) from non-target ($rawMean)")
  }

  test("dsir: a doc written in target-style n-grams outweighs a gibberish doc") {
    val s = spark
    import s.implicits._
    // 30 target-quality docs (long, stopword-rich), 5 gibberish docs, one
    // short probe of each style: the probes are what DSIR must separate.
    // mean word length must clear the gopher 3.0 floor for these to be target
    val tgtText = ("the quick brown fox jumps over the lazy dog and the bird flies to the house " * 5).trim
    val gibText = "xqz wvk pfm djn bhr " * 12
    val docs = (
      (1L to 30L).map(id => (id, tgtText, "en", "web")) ++
        (31L to 35L).map(id => (id, gibText.trim, "en", "spam")) :+
        ((40L, "the quick brown fox jumps over the lazy dog", "en", "probe")) :+
        ((41L, "xqz wvk pfm djn", "en", "probe"))
      ).toDF("doc_id", "text", "lang", "source")
    val out = LmOps.dsirWeights(docs).cache()
    val good = out.filter(col("doc_id") === 40L).collect()(0).getAs[Long]("imp_e6")
    val bad = out.filter(col("doc_id") === 41L).collect()(0).getAs[Long]("imp_e6")
    assert(good > bad, s"target-style probe ($good) must outweigh gibberish probe ($bad)")
  }

  test("score corr: 3 bounded pairs over the 2-token+ docs; dsir tracks its own target") {
    val docs = Tables.documents(spark, sf)
    val rows = LmOps.scoreCorr(docs).collect()
    assert(rows.length == 3)
    val eligible = docs.filter(size(split(col("text"), " ")) >= 2).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == eligible)
      val c = r.getAs[Long]("corr_e4")
      assert(c >= -10000L && c <= 10000L, s"corr out of bounds: $r")
    }
    val byPair = rows.map(r => r.getString(0) -> r.getAs[Long]("corr_e4")).toMap
    // DSIR's target IS the gopher quality pass, so the structural link
    // must dominate the accidental fluency correlation
    assert(byPair("quality_vs_dsir") > byPair("fluency_vs_dsir"),
      s"expected the structurally-linked pair to lead: $byPair")
  }

  test("nb classifier: full coverage, bounded, trusted sources separate from the rest") {
    val docs = Tables.documents(spark, sf)
    val out = LmOps.nbScore(docs).cache()
    assert(out.count() == docs.count(),
      "every doc scores — the vocab is trained on the same corpus")
    assert(out.filter(col("nb_e4") < 0 || col("nb_e4") > 10000).count() == 0)
    val m = out.join(docs.select("doc_id", "source"), "doc_id")
      .groupBy(col("source").isInCollection(LmOps.NbTrusted).as("t"))
      .agg(avg(col("nb_e4")).as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(m(true) > m(false),
      s"trusted-source docs must outscore the rest under their own classifier: $m")
  }

  test("nb top features: structure + a planted discriminative token leads its side") {
    val s = spark
    import s.implicits._
    val trusted = (1L to 10L).map(id =>
      (id, "zzmarker alpha beta gamma delta", "en", "src0"))
    val rest = (11L to 40L).map(id =>
      (id, "alpha beta gamma delta qqonly", "en", "web"))
    val docs = (trusted ++ rest).toDF("doc_id", "text", "lang", "source")
    val out = LmOps.nbTopFeatures(docs, k = 3).cache()
    assert(out.count() == 6)
    Seq("trusted", "untrusted").foreach { side =>
      val rnks = out.filter(col("side") === side)
        .select("rnk").collect().map(_.getInt(0)).sorted.toSeq
      assert(rnks == Seq(1, 2, 3), s"$side ranks must be 1..k, got $rnks")
    }
    val top = out.filter(col("side") === "trusted" && col("rnk") === 1)
      .select("tok").collect()(0).getString(0)
    assert(top == "zzmarker", s"the trusted-only token must lead, got $top")
    val bot = out.filter(col("side") === "untrusted" && col("rnk") === 1)
      .select("tok").collect()(0).getString(0)
    assert(bot == "qqonly", s"the untrusted-only token must lead its side, got $bot")
    // the two sides never overlap below the posterior midline
    val trMin = out.filter(col("side") === "trusted")
      .agg(min(col("post_e9"))).collect()(0).getLong(0)
    val unMax = out.filter(col("side") === "untrusted")
      .agg(max(col("post_e9"))).collect()(0).getLong(0)
    assert(trMin >= unMax,
      s"top-trusted posteriors must dominate top-untrusted: $trMin < $unMax")
  }

  test("plan: equi-joins only — the single nested loop is the broadcast scalar N") {
    val docs = Tables.documents(spark, sf)
    val full = LmOps.trigramBackoff(docs).queryExecution.executedPlan.toString
    // AQE prints the pre-adaptive plan too; gate only the final one
    val plan = full.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), s"cartesian in backoff plan:\n$plan")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"expected at most the scalar-N nested loop, got $nlj:\n$plan")
  }
}
