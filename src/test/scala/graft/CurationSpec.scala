package graft

import graft.operators.{CurationOps, DedupOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private lazy val sp0 = spark

  test("bpe: iteration 1 picks the heaviest char pair, iteration 2 counts over merged symbols") {
    import sp0.implicits._
    val corpus = Seq(
      (1L, "abc abc abc abd abd")
    ).toDF("doc_id", "text")
    val out = CurationOps.bpeMerges(corpus).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3), r.getInt(4)))
    // it-1: (a,b)=5 beats (b,c)=3 and (b,d)=2
    assert(out.filter(_._1 == 1).minBy(_._5) == ((1, "a", "b", 5L, 1)))
    // it-2: the merge happened — pairs now start from the fused symbol
    val it2 = out.filter(_._1 == 2).map(t => (t._2, t._3) -> t._4).toMap
    assert(it2 == Map(("ab", "c") -> 3L, ("ab", "d") -> 2L))
  }

  test("bpe self-pair merge consumes separators (documented deviation, engine-consistent)") {
    import sp0.implicits._
    val corpus = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val out = CurationOps.bpeMerges(corpus).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.filter(_._1 == 1).toSeq == Seq((1, "a", "a", 4L)))
    // "aaa" -> [aa, a]: the second overlapping occurrence is not re-merged
    assert(out.filter(_._1 == 2).toSeq == Seq((2, "aa", "a", 2L)))
  }

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("corpus diff: self-diff is all unchanged; fixture statuses partition the id union") {
    val self = CurationOps.corpusDiff(docs, docs)
    assert(self.filter(col("status") =!= "unchanged").count() == 0)
    assert(self.count() == docs.count())
    // the fixture version pair must exercise all four statuses, and the
    // diff covers exactly the union of the two versions' ids, once each
    val (o, n) = CurationOps.fixtureVersions(docs)
    val diff = CurationOps.corpusDiff(o, n).cache()
    try {
      val statuses = diff.select("status").distinct().collect().map(_.getString(0)).toSet
      assert(statuses == Set("added", "removed", "changed", "unchanged"))
      assert(diff.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
      assert(diff.count() ==
        o.select("doc_id").union(n.select("doc_id")).distinct().count())
      // removed rows are exactly old-minus-new, added exactly new-minus-old
      assert(diff.filter(col("status") === "removed").count() ==
        o.join(n, Seq("doc_id"), "left_anti").count())
      assert(diff.filter(col("status") === "added").count() ==
        n.join(o, Seq("doc_id"), "left_anti").count())
    } finally diff.unpersist()
  }

  test("property: corpus diff reconciles with set algebra under random edit scripts") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    val s = spark
    import s.implicits._
    // a random corpus of <= 40 docs and an edit script over it: each doc
    // independently kept / dropped / rewritten in the new version, plus
    // some fresh ids — every status must reconcile with the plain set
    // algebra of the two versions
    val genCase: Gen[(Seq[(Long, String)], Seq[(Long, String)])] = for {
      n <- Gen.choose(1, 40)
      edits <- Gen.listOfN(n, Gen.oneOf("keep", "drop", "edit"))
      nAdd <- Gen.choose(0, 10)
    } yield {
      val old = (0 until n).map(i => (i.toLong, s"text $i"))
      val kept = old.zip(edits).collect {
        case ((id, t), "keep") => (id, t)
        case ((id, t), "edit") => (id, t + " edited")
      }
      val added = (0 until nAdd).map(i => ((n + i).toLong, s"new $i"))
      (old, kept ++ added)
    }
    val prop = Prop.forAll(genCase) { case (oldRows, newRows) =>
      val diff = graft.operators.CurationOps.corpusDiff(
        oldRows.toDF("doc_id", "text"), newRows.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      val oldM = oldRows.toMap; val newM = newRows.toMap
      val ids = oldM.keySet ++ newM.keySet
      diff.keySet == ids && ids.forall { id =>
        val expect = (oldM.get(id), newM.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a != b => "changed"
          case _ => "unchanged"
        }
        diff(id) == expect
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withInitialSeed(Seed(29L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("contamination: benchmark docs are never flagged, counts are sane") {
    val out = CurationOps.contamination(docs, minShared = 1L).cache()
    assert(out.count() > 0)
    assert(out.filter(col("doc_id") % CurationOps.BenchMod === CurationOps.BenchRem).count() == 0)
    assert(out.filter(col("n_bench_docs") < 1 || col("n_shared_shingles") < 1).count() == 0)
    // a doc can't touch more benchmark docs than shingles it shares... no —
    // one shared shingle can hit many bench docs; instead: both bounded by
    // the benchmark set size
    val nBench = docs.filter(col("doc_id") % CurationOps.BenchMod === CurationOps.BenchRem).count()
    assert(out.filter(col("n_bench_docs") > nBench).count() == 0)
    out.unpersist()
  }

  test("contamination: a planted benchmark copy is flagged with max overlap") {
    val s = spark
    import s.implicits._
    // doc 9997: verbatim copy of benchmark doc 13's text (same shingles)
    val benchText = docs.filter(col("doc_id") === 13).select("text").as[String].head()
    val planted = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(Seq((9997L, benchText, "en", "srcX", benchText.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val hit = CurationOps.contamination(planted, minShared = 2L)
      .filter(col("doc_id") === 9997L)
      .collect()
    assert(hit.length == 1 && hit(0).getAs[Long]("n_shared_shingles") >= 2L)
  }

  test("stratified sampling: kept fraction per lang tracks the configured rate") {
    val out = CurationOps.stratifiedSample(docs)
    val kept = out.groupBy("lang").agg(count(lit(1)).as("kept"))
    val total = docs.groupBy("lang").agg(count(lit(1)).as("total"))
    val rates = CurationOps.SampleRates.toMap
    kept.join(total, "lang").collect().foreach { r =>
      val lang = r.getAs[String]("lang")
      val frac = r.getAs[Long]("kept").toDouble / r.getAs[Long]("total")
      val rate = rates.getOrElse(lang, 100) / 100.0
      // md5 buckets are uniform; generous tolerance for small fixtures
      assert(math.abs(frac - rate) < 0.25, s"$lang kept=$frac rate=$rate")
    }
    // determinism: same input -> identical sample
    assert(CurationOps.stratifiedSample(docs).exceptAll(out).count() == 0)
  }

  test("PPS sample: pin accounting exact, heavy docs always selected, distributed ≡ one-window reference") {
    import graft.functions.TextFunctions.{stableHash60, tokens}
    val out = CurationOps.ppsSample(docs, k = 40L).cache()
    val weighted = docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("w"),
      stableHash60(col("doc_id").cast("string")).as("pri"))
    val total = weighted.agg(sum(col("w"))).head().getLong(0)
    val step = math.max(total / 40L, 1L)
    // every pin lands in exactly one segment: Σ n_hits = total DIV step
    assert(out.agg(sum(col("n_hits"))).head().getLong(0) == total / step,
      "pin multiplicities must account for every pin exactly once")
    // a doc at least one step wide cannot be missed
    val heavy = weighted.filter(col("w") >= step).select("doc_id")
    assert(heavy.join(out, Seq("doc_id"), "left_anti").count() == 0,
      "every doc spanning a full step must absorb at least one pin")
    // the distributed prefix sum equals the single-window reference
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("pri"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = weighted
      .withColumn("cum", sum(col("w")).over(wAll))
      .withColumn("n_hits", expr(s"cum DIV ${step}L - (cum - w) DIV ${step}L"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("w"), col("cum"), col("n_hits"))
    assert(out.exceptAll(ref).count() == 0 && ref.exceptAll(out).count() == 0,
      "distributed prefix sum must reproduce the single-window cumulative weights")
    out.unpersist()
  }

  test("chunk dedup: a shared stride-aligned window collides where whole-doc keys miss") {
    val s = spark
    import s.implicits._
    // doc 1 = w1..w60 (3 chunks at stride 24); doc 2 = exactly doc 1's
    // middle chunk (tokens 25..56) — different head fingerprints, so
    // whole-doc exact dedup misses the overlap entirely
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val mid = (25 to 56).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, mid)).toDF("doc_id", "text")
    assert(DedupOps.exact(df).count() == 0, "whole-doc keys must miss the partial overlap")
    val out = CurationOps.chunkDedup(df).cache()
    val hit = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(hit.toSet == Set(
      (1L, 1L, 2L, 1L, 1L, true),
      (2L, 0L, 2L, 1L, 1L, false)),
      s"doc 1 chunk 1 and doc 2 chunk 0 must form one dup group, canonical (1,1): ${hit.mkString(", ")}")
    out.unpersist()
  }

  test("per-source PPS: each source's pins account exactly against its own step") {
    import graft.functions.TextFunctions.tokens
    val out = CurationOps.ppsSampleBySource(docs, kPerSource = 20L).cache()
    val perSrc = docs
      .select(col("source"), size(tokens(col("text"))).cast("long").as("w"))
      .groupBy("source").agg(sum(col("w")).as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hits = out.groupBy("source").agg(sum(col("n_hits")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSrc.foreach { case (src, total) =>
      val step = math.max(total / 20L, 1L)
      assert(hits.getOrElse(src, 0L) == total / step,
        s"source $src: pins ${hits.get(src)} != ${total / step}")
    }
    // every source is represented — the per-source quota property the
    // corpus-wide sample does NOT give (a tiny source can miss all
    // global pins)
    assert(hits.keySet == perSrc.keySet)
    out.unpersist()
  }

  test("rep_top_token: ratio bounds and the top token really is the mode") {
    val out = CurationOps.repTopToken(docs).cache()
    assert(out.count() == docs.count())
    assert(out.filter(col("rep_ratio_e4") <= 0 || col("rep_ratio_e4") > 10000).count() == 0)
    // spot-check one doc against a direct count
    val one = out.filter(col("doc_id") === 0).collect()(0)
    val direct = docs.filter(col("doc_id") === 0)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().orderBy(col("count").desc, col("tok")).collect()(0)
    assert(one.getAs[String]("top_token") == direct.getAs[String]("tok"))
    assert(one.getAs[Long]("top_cnt") == direct.getAs[Long]("count"))
    out.unpersist()
  }

  test("rep_bigram_frac: n_bigrams = n_tokens - 1 and dup fraction in [0, 10000]") {
    val out = CurationOps.repBigramFrac(docs)
    val joined = out.join(
      docs.select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("expected")),
      "doc_id")
    assert(joined.filter(col("n_bigrams") =!= col("expected")).count() == 0)
    assert(out.filter(col("dup_frac_e4") < 0 || col("dup_frac_e4") > 10000).count() == 0)
    assert(out.filter(col("n_distinct") > col("n_bigrams")).count() == 0)
  }

  test("fluency: bounded score, full coverage, and boilerplate outscores a one-off doc") {
    val s = spark
    import s.implicits._
    val out = CurationOps.bigramFluency(docs).cache()
    // one row per doc with >= 2 tokens, score within the e4 scale
    val expected = docs.filter(size(split(col("text"), " ")) >= 2).count()
    assert(out.count() == expected)
    assert(out.filter(col("fluency_e4") < 0 || col("fluency_e4") > 10000).count() == 0)
    out.unpersist()
    // a phrase repeated across many docs has high-count bigrams -> its
    // docs must outscore a doc of corpus-unique one-off bigrams
    val boiler = (1L to 20L).map(i => (i, "all rights reserved to the original author"))
    val oneOff = Seq((99L, "zq xv qj kw vx jz wq"))
    val tiny = (boiler ++ oneOff).toDF("doc_id", "text")
    val f = CurationOps.bigramFluency(tiny)
    val boilerMin = f.filter(col("doc_id") <= 20).agg(min("fluency_e4")).collect()(0).getLong(0)
    val oneOffScore = f.filter(col("doc_id") === 99).agg(max("fluency_e4")).collect()(0).getLong(0)
    assert(boilerMin > oneOffScore,
      s"boilerplate $boilerMin should outscore one-off $oneOffScore")
  }

  test("split assignment: partitions the corpus, train dominates, deterministic") {
    val out = CurationOps.splitAssign(docs).cache()
    val byCol = out.groupBy("split").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n")).toMap
    assert(byCol.values.sum == docs.count())
    // 98/1/1 buckets: train must dominate even on a small fixture
    assert(byCol("train") > byCol.getOrElse("val", 0L) * 10)
    assert(out.exceptAll(CurationOps.splitAssign(docs)).count() == 0)
    out.unpersist()
  }

  test("source caps: at most `cap` docs per source, survivors deterministic") {
    val out = CurationOps.sourceCaps(docs, cap = 7).cache()
    val per = out.groupBy("source").agg(count(lit(1)).as("n"), max("rk").as("mr"))
    assert(per.filter(col("n") > 7 || col("mr") > 7).count() == 0)
    // every source with >= 7 docs keeps exactly 7
    val eligible = docs.groupBy("source").agg(count(lit(1)).as("total"))
      .filter(col("total") >= 7).count()
    assert(per.filter(col("n") === 7).count() == eligible)
    assert(out.exceptAll(CurationOps.sourceCaps(docs, cap = 7)).count() == 0)
    out.unpersist()
  }

  test("gopher rules: signals bounded, pass iff every rule holds") {
    val out = CurationOps.gopherRules(docs).cache()
    assert(out.count() == docs.count())
    assert(out.filter(col("stop_e4") < 0 || col("stop_e4") > 10000).count() == 0)
    assert(out.filter(col("alpha_e4") < 0 || col("alpha_e4") > 10000).count() == 0)
    val manual = out.filter(
      col("n_words").between(50, 100000) &&
        col("mwl_e4").between(30000L, 100000L) &&
        col("stop_e4") >= 600L && col("alpha_e4") >= 8000L)
    assert(out.filter(col("pass")).count() == manual.count())
    out.unpersist()
  }

  test("lang mix: shares sum to ~10000 and counts conserve the corpus") {
    val out = CurationOps.langMix(docs).cache()
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) == docs.count())
    val shareSum = out.agg(sum("share_e4")).collect()(0).getLong(0)
    // each cell rounds independently; the sum can drift by < #cells/2
    assert(math.abs(shareSum - 10000L) <= out.count() / 2 + 1)
    out.unpersist()
  }

  test("curated corpus: every survivor passes quality, cap, and dedup independently") {
    val out = CurationOps.curated(docs).cache()
    assert(out.count() > 0 && out.count() < docs.count())
    val quality = CurationOps.gopherRules(docs).filter(col("pass")).select("doc_id")
    val caps = CurationOps.sourceCaps(docs).select("doc_id")
    val dupes = graft.operators.GraphOps.dedupClusters(docs)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    assert(out.join(quality, Seq("doc_id"), "left_anti").count() == 0)
    assert(out.join(caps, Seq("doc_id"), "left_anti").count() == 0)
    assert(out.join(dupes, Seq("doc_id")).count() == 0)
    out.unpersist()
  }

  test("packing buckets: docs conserved, waste consistent with totals") {
    val out = CurationOps.lenBuckets(docs).cache()
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) == docs.count())
    // waste = sum(ctx)*n_docs - n_tokens for real buckets
    assert(out.filter(col("ctx") > 0)
      .filter(col("waste") =!= col("ctx") * col("n_docs") - col("n_tokens"))
      .count() == 0)
    assert(out.filter(col("ctx") === 0 && col("waste") =!= 0).count() == 0)
    out.unpersist()
  }

  test("packing assignment: no bin overflows the context, slots unique, waste reconciles with the plan") {
    val out = CurationOps.packingAssign(docs).cache()
    try {
      // covers exactly the non-overflow docs, once each
      val expected = CurationOps.lenBuckets(docs)
        .filter(col("ctx") > 0).agg(sum("n_docs")).collect()(0).getLong(0)
      assert(out.count() == expected)
      assert(out.select("doc_id").distinct().count() == expected)
      // a doc's padded slot stays inside the bin's context budget
      assert(out.filter(col("bin_offset") + col("ctx") > CurationOps.PackContext).count() == 0)
      assert(out.filter(col("n_toks") > col("ctx")).count() == 0, "doc longer than its slot")
      assert(out.filter(col("pad") =!= col("ctx") - col("n_toks")).count() == 0)
      // no two docs share a (class, bin, slot) cell
      assert(out.groupBy("ctx", "bin_no", "slot").count().filter(col("count") > 1).count() == 0)
      // bins fill densely: every bin except each class's last is full
      val slotsPerBin = out.groupBy("ctx", "bin_no").agg(count(lit(1)).as("n"))
      val lastBin = slotsPerBin.groupBy("ctx").agg(max("bin_no").as("last"))
      assert(slotsPerBin.join(lastBin, "ctx")
        .filter(col("bin_no") =!= col("last"))
        .filter(col("n") =!= floor(lit(CurationOps.PackContext) / col("ctx")))
        .count() == 0, "a non-final bin is underfilled")
      // per-class padding waste reconciles with the lenBuckets plan
      val gotWaste = out.groupBy("ctx").agg(sum("pad").as("w"))
      val planWaste = CurationOps.lenBuckets(docs).filter(col("ctx") > 0)
        .select(col("ctx"), col("waste"))
      assert(gotWaste.join(planWaste, "ctx").filter(col("w") =!= col("waste")).count() == 0,
        "assignment waste diverges from the packing plan")
    } finally out.unpersist()
  }

  test("alloc select: bounded-census cut equals the full-precision per-source greedy, overshoot <= boundary doc") {
    import graft.functions.TextFunctions.{stableHash60, tokens}
    for (pct <- Seq(20L, 50L)) {
      val sel = CurationOps.allocSelect(docs, pct).cache()
      try {
        // one verdict per doc
        assert(sel.count() == docs.count())
        val alloc = CurationOps.tokenAllocation(docs, pct)
          .select(col("source"), col("alloc_tokens"))
        // full-precision reference: per source, greedy take in the exact
        // (bkt, pri, doc_id) priority order — tokenBudgetCut's bucket-major
        // convention — until the budget trips; the selection the bounded
        // census must reproduce doc-for-doc
        val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("bkt"), col("pri"), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val ref = docs.select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("n_toks"),
            stableHash60(col("doc_id").cast("string")).as("pri"))
          .withColumn("bkt", col("pri") % 1000L)
          .join(alloc, "source")
          .withColumn("cum", coalesce(sum(col("n_toks")).over(w), lit(0L)))
          .select(col("doc_id"), (col("cum") < col("alloc_tokens")).as("ref_kept"))
        assert(sel.join(ref, "doc_id").filter(col("kept") =!= col("ref_kept")).count() == 0,
          s"pct $pct: census cut diverges from the full-precision greedy")
        // per-source kept tokens land in [alloc, alloc + boundary doc)
        val got = sel.filter(col("kept")).groupBy("source")
          .agg(sum(col("n_toks")).as("kept_toks"), max(col("n_toks")).as("max_doc"))
          .join(alloc, "source")
        assert(got.filter(col("kept_toks") >= col("alloc_tokens") + col("max_doc")).count() == 0,
          s"pct $pct: overshoot exceeds one document")
        val supply = docs.select(col("source"),
            size(tokens(col("text"))).cast("long").as("n")).groupBy("source")
          .agg(sum("n").as("supply"))
        assert(got.join(supply, "source")
          .filter(col("kept_toks") < least(col("alloc_tokens"), col("supply"))).count() == 0,
          s"pct $pct: greedy left budget unfilled")
      } finally sel.unpersist()
    }
  }

  test("chunking: windows tile each doc — start at 0, stride apart, clipped tail covers n") {
    import graft.functions.TextFunctions.tokens
    val docs = Tables.documents(spark, sf)
    val per = CurationOps.chunked(docs, chunkTokens = 32, stride = 24)
      .groupBy("doc_id")
      .agg(
        min(col("start_tok")).as("s0"),
        max(col("start_tok") + col("n_toks")).as("cover"),
        max(col("n_toks")).as("mx"),
        min(col("n_toks")).as("mn"),
        count(lit(1)).as("nc"),
        (max(col("chunk_no")) + 1).as("maxno"))
    val n = docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"))
    val joined = per.join(n, "doc_id").cache()
    assert(joined.filter(col("s0") =!= 0).count() == 0)
    assert(joined.filter(col("cover") =!= col("n")).count() == 0, "tail not covered")
    assert(joined.filter(col("mx") > 32 || col("mn") <= 0).count() == 0)
    assert(joined.filter(col("nc") =!= col("maxno")).count() == 0, "chunk_no not dense")
    // docs at or under one window get exactly one chunk
    assert(joined.filter(col("n") <= 32 && col("nc") =!= 1).count() == 0)
    joined.unpersist()
  }

  test("mix plan: over-target languages down-sampled, under-target keep everything") {
    val plan = CurationOps.mixPlan(Tables.documents(spark, sf)).cache()
    assert(plan.filter(col("keep_e4") > 10000 || col("keep_e4") < 0).count() == 0)
    assert(plan.filter(col("actual_e4") <= col("target_e4") && col("keep_e4") =!= 10000).count() == 0)
    assert(plan.filter(col("target_e4") === 0 && col("keep_e4") =!= 0).count() == 0)
    plan.unpersist()
  }

  test("bpe fertility ladder: merges never increase the symbol count; char baseline = weighted word length") {
    val docs = Tables.documents(spark, sf)
    val ladder = CurationOps.bpeEncodeStats(docs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(ladder.keySet == Set(0, 1, 2))
    assert(ladder(0)._1 >= ladder(1)._1 && ladder(1)._1 >= ladder(2)._1,
      "a merge must not increase total symbols")
    assert(ladder(0)._2 == ladder(1)._2 && ladder(1)._2 == ladder(2)._2,
      "word population constant across the ladder")
    assert(ladder.values.forall(v => v._3 >= 10000L),
      "fertility below 1.0 symbols/word is impossible")
  }

  test("source drift: tv bounded, and a degenerate source drifts hardest") {
    val sp = spark
    import sp.implicits._
    val base = Tables.documents(spark, sf)
    val tv = CurationOps.sourceQualityDrift(base).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tv.values.forall(v => v >= 0L && v <= 10000L))
    // replace src0's text with identical degenerate junk: its quality
    // mass collapses into one decile, so its drift must strictly exceed
    // every unmodified source's
    val junked = base.withColumn("text",
      when(col("source") === "src0",
        lit("zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz")).otherwise(col("text")))
    val tvJ = CurationOps.sourceQualityDrift(junked).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tvJ("src0") > tvJ.filter(_._1 != "src0").values.max,
      s"degenerate source should lead the drift board: $tvJ")
  }

  test("cascade plan: 7 rules, exec order is a permutation sorted by reject-per-cost") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = CurationOps.cascadePlan(docs).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getAs[Long]("exec_order")).sorted.toSeq == (1L to 7L))
    val byOrder = rows.sortBy(_.getAs[Long]("exec_order"))
    assert(byOrder.map(_.getAs[Long]("rpc_e6")).toSeq ==
      byOrder.map(_.getAs[Long]("rpc_e6")).sortBy(-_).toSeq,
      "execution order must be non-increasing in rejections-per-cost")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_fail") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("sel_e4") >= 0L && r.getAs[Long]("sel_e4") <= 10000L)
    }
  }

  test("curation funnel: monotone non-increasing, raw totals exact, final stage = curated()") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = CurationOps.curationFunnel(docs).collect().sortBy(_.getAs[Long]("ord"))
    assert(rows.length == 5)
    val nd = rows.map(_.getAs[Long]("n_docs"))
    val nt = rows.map(_.getAs[Long]("n_tokens"))
    assert(nd.zip(nd.tail).forall { case (a, b) => b <= a }, s"docs not monotone: ${nd.toSeq}")
    assert(nt.zip(nt.tail).forall { case (a, b) => b <= a }, s"tokens not monotone: ${nt.toSeq}")
    assert(nd.head == docs.count())
    assert(rows.head.getAs[Long]("doc_pct_e4") == 10000L)
    // the funnel's terminal stage must agree with the shipped curated()
    // corpus PLUS the exact-dedup stage the funnel adds in front
    val exactDrops = graft.operators.DedupOps.exact(docs)
      .filter(col("doc_id") =!= col("canonical_id")).select("doc_id")
    val curatedN = CurationOps.curated(docs)
      .join(exactDrops, Seq("doc_id"), "left_anti").count()
    assert(nd.last == curatedN,
      s"funnel end ${nd.last} vs curated-minus-exact-dups $curatedN")
  }

  test("token allocation: water level saturates small sources, budget met within rounding") {
    val s = spark
    import s.implicits._
    // tiny source saturates; two big ones split the remaining budget
    val docs = (
      Seq((1L, "a b c d e", "en", "tiny")) ++
        (2L to 21L).map(i => (i, ("tok " * 50).trim, "en", "big1")) ++
        (22L to 41L).map(i => (i, ("tok " * 50).trim, "en", "big2"))
      ).toDF("doc_id", "text", "lang", "source")
    val out = CurationOps.tokenAllocation(docs, budgetPct = 50L).collect()
      .map(r => r.getString(0) -> r).toMap
    // supplies: tiny 5, big1 1000, big2 1000; B = 1002
    assert(out("tiny").getAs[Boolean]("saturated"))
    assert(out("tiny").getAs[Long]("alloc_tokens") == 5L)
    assert(!out("big1").getAs[Boolean]("saturated") && !out("big2").getAs[Boolean]("saturated"))
    assert(out("big1").getAs[Long]("alloc_tokens") == out("big2").getAs[Long]("alloc_tokens"))
    val total = out.values.map(_.getAs[Long]("alloc_tokens")).sum
    assert(math.abs(total - 1002L) <= 2L, s"allocations must meet the budget, got $total")
    // alloc never exceeds supply, on the fixture corpus too
    val fx = CurationOps.tokenAllocation(Tables.documents(spark, sf)).collect()
    assert(fx.forall(r => r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("n_tokens")))
  }

  test("token allocation with skewed weights: unsaturated budget splits in weight proportion") {
    val s = spark
    import s.implicits._
    val docs = (
      Seq((1L, "a b c d e", "en", "tiny")) ++
        (2L to 21L).map(i => (i, ("tok " * 50).trim, "en", "big1")) ++
        (22L to 41L).map(i => (i, ("tok " * 50).trim, "en", "big2"))
      ).toDF("doc_id", "text", "lang", "source")
    // big1 3×, big2 default 1 (absent from the frame), tiny default 1
    val w = Seq(("big1", 3L)).toDF("source", "w")
    val out = CurationOps.tokenAllocation(docs, budgetPct = 50L, weights = Some(w))
      .collect().map(r => r.getString(0) -> r).toMap
    // supplies 5/1000/1000, B = 1002: tiny saturates, λ = 997/4 = 249.25
    assert(out("tiny").getAs[Boolean]("saturated") &&
      out("tiny").getAs[Long]("alloc_tokens") == 5L)
    assert(out("big1").getAs[Long]("weight") == 3L &&
      out("big2").getAs[Long]("weight") == 1L)
    assert(out("big1").getAs[Long]("alloc_tokens") == 748L, s"got ${out("big1")}")
    assert(out("big2").getAs[Long]("alloc_tokens") == 249L, s"got ${out("big2")}")
    val total = out.values.map(_.getAs[Long]("alloc_tokens")).sum
    assert(math.abs(total - 1002L) <= 2L, s"budget met at skewed weights, got $total")
    // saturation invariant survives skewed weights on the fixture corpus
    val fx = CurationOps.tokenAllocation(Tables.documents(spark, sf),
      weights = Some(graft.operators.CurationPack.weightsFixtureDf(spark))).collect()
    assert(fx.forall(r => r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("n_tokens")))
    // the weighted doc-level closure never overshoots a source by more
    // than its boundary doc
    val sel = CurationOps.allocSelect(docs, budgetPct = 50L, weights = Some(w))
      .filter(col("kept"))
      .groupBy("source").agg(org.apache.spark.sql.functions.sum("n_toks").as("got"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sel("tiny") == 5L)
    assert(sel("big1") <= 748L + 50L && sel("big2") <= 249L + 50L,
      s"per-source overshoot bounded by one doc: $sel")
  }

  test("cascade plan: a cheap high-rejection rule is scheduled first") {
    val s = spark
    import s.implicits._
    // 90% non-English docs: lang_en rejects 90% at cost 1 — nothing beats
    // rejections-per-cost ~0.9; it must head the cascade.
    val docs = (1L to 100L).map { i =>
      val lang = if (i <= 90) "de" else "en"
      (i, "the quick brown fox jumps over the lazy dog and runs on", lang, "web")
    }.toDF("doc_id", "text", "lang", "source")
    val first = CurationOps.cascadePlan(docs).filter(col("exec_order") === 1L)
      .collect()(0)
    assert(first.getAs[String]("rule") == "lang_en", s"got $first")
  }

  test("temperature mix: weights normalize, order-preserve, and flatten a planted skew") {
    val s = spark
    import s.implicits._
    // 100/10/1-doc sources of equal-length docs: a hard head/tail skew
    val docs = ((1L to 100L).map(id => (id, "a b c d e", "en", "head")) ++
      (101L to 110L).map(id => (id, "a b c d e", "en", "mid")) ++
      Seq((111L, "a b c d e", "en", "tail")))
      .toDF("doc_id", "text", "lang", "source")
    val out = CurationOps.temperatureMix(docs).cache()
    val rows = out.collect().map(r =>
      r.getAs[String]("source") -> (r.getAs[Long]("p_e6"), r.getAs[Long]("w_e6"),
        r.getAs[Long]("dup_e4"))).toMap
    // shares each sum to 1e6 within per-row rounding
    Seq("p_e6", "w_e6").foreach { c =>
      val tot = out.agg(sum(col(c))).collect()(0).getLong(0)
      assert(math.abs(tot - 1000000L) <= 3, s"$c sums to $tot")
    }
    // sqrt preserves the size order but compresses it
    assert(rows("head")._2 > rows("mid")._2 && rows("mid")._2 > rows("tail")._2)
    assert(rows("head")._2 < rows("head")._1,
      "the head source's sampling share must shrink below its raw share")
    assert(rows("tail")._2 > rows("tail")._1,
      "the tail source's sampling share must grow above its raw share")
    // duplication factor: tail upsampled hardest, head below 1.0
    assert(rows("head")._3 < 10000L && rows("tail")._3 > 10000L)
    assert(rows("tail")._3 > rows("mid")._3 && rows("mid")._3 > rows("head")._3)
    // the alpha ladder orders as the exponent says: 1/4 flattens harder
    // than 1/2, 3/4 stays closer to the natural distribution
    def wOf(alphaQ: Int): Map[String, Long] =
      CurationOps.temperatureMix(docs, alphaQ).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_e6")).toMap
    val (w25, w75) = (wOf(1), wOf(3))
    assert(w25("head") < rows("head")._2 && rows("head")._2 < w75("head"),
      s"head share must grow with alpha: ${w25("head")}, ${rows("head")._2}, ${w75("head")}")
    assert(w25("tail") > rows("tail")._2 && rows("tail")._2 > w75("tail"),
      s"tail share must shrink with alpha: ${w25("tail")}, ${rows("tail")._2}, ${w75("tail")}")
  }

  test("temperature mix: a sub-0.5ppm source gets NULL dup_e4, not division garbage") {
    val s = spark
    import s.implicits._
    // head: 2.1M tokens across 21 docs; tail: ONE token → p ≈ 0.48 ppm,
    // which rounds to p_e6 = 0 — the 100-TB head/tail shape where an
    // unguarded w/p ratio yields Infinity→Long.MaxValue
    val big = ("a " * 99999) + "a"
    val docs = ((1L to 21L).map(id => (id, big, "en", "head")) ++
      Seq((22L, "a", "en", "tail")))
      .toDF("doc_id", "text", "lang", "source")
    val rows = CurationOps.temperatureMix(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("p_e6"), if (r.isNullAt(r.fieldIndex("dup_e4"))) None
         else Some(r.getAs[Long]("dup_e4")))).toMap
    assert(rows("tail")._1 == 0L, s"expected the tail share to round to 0, got ${rows("tail")._1}")
    assert(rows("tail")._2.isEmpty, "unexpressible share must yield NULL dup_e4")
    assert(rows("head")._2.exists(d => d > 0L && d < 10001L),
      s"the head source keeps a real dup factor, got ${rows("head")._2}")
  }

  test("contamination: an explicit benchmark doc table reproduces the fixture predicate") {
    val docs = Tables.documents(spark, sf)
    val byPredicate = CurationOps.contamination(docs)
      .collect().map(_.toSeq).toSet
    val byTable = CurationOps.contamination(docs,
      benchDocs = Some(docs.filter(CurationOps.benchPredicate).select("doc_id")))
      .collect().map(_.toSeq).toSet
    assert(byPredicate == byTable,
      "membership via a benchmark doc table must equal the modulus fixture")
    // and a disjoint benchmark set flags nothing from itself: no
    // benchmark doc ever appears as a candidate
    val benchIds = docs.filter(col("source") === "src19")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = CurationOps.contamination(docs,
      benchDocs = Some(docs.filter(col("source") === "src19")))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(flagged.intersect(benchIds).isEmpty, "benchmark docs must never be flagged")
  }
}
