package graft

import graft.operators.{AnnOps, DedupOps, MultimodalOps, PqOps, TextOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TrainingDataSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()
  private lazy val embs = Tables.embeddings(spark, sf).cache()

  test("token_count n_chars matches the fixture's own n_chars column") {
    val joined = TextOps.tokenCount(docs)
      .join(docs.select(col("doc_id"), col("n_chars").as("expected")), "doc_id")
    assert(joined.filter(col("n_chars") =!= col("expected")).count() == 0)
  }

  test("lang_id emits one prediction per doc from the profile set") {
    val out = TextOps.langId(docs).cache()
    assert(out.count() == docs.count())
    val langs = out.select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es")))
    out.unpersist()
  }

  test("dsir_select funnel consistency: kept set is a descending-importance prefix within budget") {
    import graft.operators.LmOps
    val budget = 10000L
    val sel = LmOps.dsirSelect(docs, budget).cache()
    try {
      // covers exactly the scored universe, with unchanged importance
      val w = LmOps.dsirWeights(docs).select(col("doc_id"), col("imp_e6").as("w_imp"))
      assert(sel.join(w, "doc_id").filter(col("imp_e6") =!= col("w_imp")).count() == 0)
      assert(sel.count() == w.count(), "one selection row per scored doc")
      // prefix property: no dropped doc outranks a kept doc (ties split
      // only inside the one boundary band)
      val dropped = sel.filter(!col("kept"))
      if (dropped.count() > 0) {
        val minKept = sel.filter(col("kept")).agg(min(col("imp_e6"))).head.getLong(0)
        val maxDrop = dropped.agg(max(col("imp_e6"))).head.getLong(0)
        assert(maxDrop <= minKept, s"dropped imp $maxDrop outranks kept imp $minKept")
      }
      // budget: kept tokens overshoot only by the greedy boundary doc
      val keptTok = sel.filter(col("kept")).agg(sum(col("n_toks"))).head.getLong(0)
      val maxKeptDoc = sel.filter(col("kept")).agg(max(col("n_toks"))).head.getLong(0)
      assert(keptTok < budget + maxKeptDoc, s"kept $keptTok tokens vs budget $budget")
      // the cut is tight: dropping ANY kept doc re-opens budget room only
      // if we kept less than the budget before the boundary doc
      assert(keptTok > 0L, "a 10k budget keeps something at every fixture")
    } finally sel.unpersist()
  }

  test("exact dedup groups share an identical head fingerprint") {
    val out = DedupOps.exact(docs)
    val withKey = out.join(
      docs.select(col("doc_id"),
        md5(array_join(slice(split(col("text"), " "), 1, 5), " ")).as("k")), "doc_id")
    val groups = withKey.groupBy("canonical_id").agg(countDistinct("k").as("nk"))
    assert(groups.filter(col("nk") =!= 1).count() == 0)
  }

  test("minhash LSH survivors are genuinely similar (jaccard >= 0.5)") {
    val out = DedupOps.minhashLsh(docs, spark).cache()
    assert(out.filter(col("jaccard_e4") < 5000).count() == 0)
    out.unpersist()
  }

  test("simhash: near-dup pairs from planted duplicates exist and hamming is small") {
    val out = DedupOps.simhashDedup(docs, spark).cache()
    assert(out.filter(col("hamming") > 3).count() == 0)
    out.unpersist()
  }

  test("pq rerank: exact re-rank of the ADC shortlist never loses recall vs plain pq") {
    val plain = AnnOps.annRecall(embs, spark, index = "pq")
      .agg(sum("n_common")).collect()(0).getLong(0)
    val rr = AnnOps.annRecall(embs, spark, index = "pq_rerank")
      .agg(sum("n_common")).collect()(0).getLong(0)
    assert(rr >= plain, s"rerank recall $rr fell below plain pq $plain")
    // the rerank output is exact-cosine-scored: every row's score must
    // equal the brute-force cosine for that (qid, vec_id)
    val brute = AnnOps.bruteTopK(embs, nQueries = 10, k = 5)
      .select(col("qid"), col("vec_id"), col("cosine_e4").as("bc"))
    val mismatch = PqOps.pqRerankTopK(embs, nQueries = 10, k = 5)
      .join(brute, Seq("qid", "vec_id"))
      .filter(col("cosine_e4") =!= col("bc"))
    assert(mismatch.count() == 0, "rerank scores must be exact cosines")
  }

  test("ivfpq rerank: exact re-rank never loses recall vs the plain probed ADC scan") {
    val plain = AnnOps.annRecall(embs, spark, index = "ivfpq")
      .agg(sum("n_common")).collect()(0).getLong(0)
    val rr = AnnOps.annRecall(embs, spark, index = "ivfpq_rerank")
      .agg(sum("n_common")).collect()(0).getLong(0)
    assert(rr >= plain, s"ivfpq rerank recall $rr fell below plain ivfpq $plain")
    // rerank scores are exact cosines wherever they overlap brute top-k
    val brute = AnnOps.bruteTopK(embs, nQueries = 10, k = 5)
      .select(col("qid"), col("vec_id"), col("cosine_e4").as("bc"))
    val mismatch = PqOps.ivfPqRerankTopK(embs, nQueries = 10, k = 5)
      .join(brute, Seq("qid", "vec_id"))
      .filter(col("cosine_e4") =!= col("bc"))
    assert(mismatch.count() == 0, "ivfpq rerank scores must be exact cosines")
  }

  test("ivf_assign covers exactly the ingest batch with centers from the old corpus") {
    val wm = embs.agg(expr("(MAX(vec_id) * 4) DIV 5")).collect()(0).getLong(0)
    val out = AnnOps.ivfAssignIncremental(embs).cache()
    // exactly one assignment per batch vector, none for the old corpus
    assert(out.count() == embs.filter(col("vec_id") >= wm).count())
    assert(out.filter(col("vec_id") < wm).count() == 0)
    assert(out.select("vec_id").distinct().count() == out.count())
    // every assigned center exists in the OLD corpus's label set
    val oldLabels = embs.filter(col("vec_id") < wm)
      .select(col("label").cast("long").as("center")).distinct()
    assert(out.join(oldLabels, Seq("center"), "left_anti").count() == 0,
      "assignment to a center the existing index does not have")
    out.unpersist()
  }

  test("incrNearDup is exactly the cross-watermark slice of the full simhash pair graph") {
    val wm = 100L
    val incr = DedupOps.incrNearDup(docs, spark, wm).cache()
    // one-sidedness: new-batch doc flagged against an existing-corpus doc
    assert(incr.filter(col("doc_id") < wm || col("dup_of") >= wm).count() == 0)
    // both paths share the same capped banding, so the incremental pairs
    // must equal the full graph's (da < wm <= db) slice
    val fullSlice = DedupOps.simhashDedup(docs, spark)
      .filter(col("da") < wm && col("db") >= wm)
      .select(col("db").as("doc_id"), col("da").as("dup_of"), col("hamming"))
    assert(incr.except(fullSlice).count() == 0 && fullSlice.except(incr).count() == 0)
    incr.unpersist()
  }

  test("annRecall runs against every index variant; unknown index is rejected") {
    for (idx <- Seq("lsh", "ivf", "ivf2", "sq8", "pq", "pq_rerank", "ivfpq", "ivfpq_rerank")) {
      val r = AnnOps.annRecall(embs, spark, nQueries = 5, k = 3, index = idx).cache()
      assert(r.count() == 5, s"index $idx: one recall row per query expected")
      assert(r.filter(col("recall_e4") < 0 || col("recall_e4") > 10000).count() == 0,
        s"index $idx: recall out of range")
      r.unpersist()
    }
    val ex = intercept[IllegalArgumentException] {
      AnnOps.annRecall(embs, spark, index = "hnsw")
    }
    assert(ex.getMessage.contains("unknown ANN index"))
  }

  test("brute-force ANN returns exactly k ranked neighbors per query") {
    val out = AnnOps.bruteTopK(embs, nQueries = 5, k = 3).cache()
    val per = out.groupBy("qid").agg(count(lit(1)).as("n"), max("rnk").as("mr"))
    assert(per.filter(col("n") =!= 3 || col("mr") =!= 3).count() == 0)
    out.unpersist()
  }

  test("sq8 ANN: codes bounded to int8 range, top-k close to float brute force") {
    val q = AnnOps.quantizedSq8(embs)
    assert(q.filter(exists(col("q"), x => abs(x) > 127)).count() == 0)
    // recall@5 of the quantized ranking vs the exact one: int8 on 64 dims
    // loses little — expect strong overlap
    val exact = AnnOps.bruteTopK(embs, nQueries = 5, k = 5).select("qid", "vec_id")
    val sq8 = AnnOps.sq8TopK(embs, nQueries = 5, k = 5).select("qid", "vec_id")
    val overlap = exact.intersect(sq8).count()
    assert(overlap >= 15, s"recall@5 too low: $overlap/25")
  }

  test("kmeans2: Lloyd iterations do not increase total within-cluster distance") {
    import graft.operators.EmbeddingStatsOps
    def cost(centers: org.apache.spark.sql.DataFrame): Long = {
      val quant = embs
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim0", "x")))
        .select(col("vec_id"), (col("dim0") + 1).as("dim"),
          floor(col("x").cast("double") * 1000000 + 0.5).cast("long").as("xq"))
      quant.join(centers.select(col("center"), col("dim"), col("centroid_q")), Seq("dim"))
        .withColumn("d", col("xq") - col("centroid_q"))
        .groupBy("vec_id", "center").agg(sum(col("d") * col("d")).as("d2"))
        .groupBy("vec_id").agg(min("d2").as("best"))
        .agg(sum("best")).collect()(0).getLong(0)
    }
    val init = EmbeddingStatsOps.centroids(embs)
      .select(col("label").cast("long").as("center"), col("dim"), col("centroid_q"))
    val fin = EmbeddingStatsOps.kmeans2(embs)
    assert(cost(fin) <= cost(init), "k-means cost went up after 2 Lloyd iterations")
    // every surviving center keeps all 64 dims
    val dims = fin.groupBy("center").agg(countDistinct("dim").as("nd"))
    assert(dims.filter(col("nd") =!= 64).count() == 0)
  }

  test("ann recall: bounded by [0,10000], and LSH hits are genuine brute-force hits") {
    val out = AnnOps.annRecall(embs, spark, nQueries = 5, k = 5).cache()
    assert(out.count() == 5)
    assert(out.filter(col("recall_e4") < 0 || col("recall_e4") > 10000).count() == 0)
    assert(out.filter(col("n_common") > col("n_brute")).count() == 0)
    assert(out.filter(col("recall_e4") =!= col("n_common") * 2000).count() == 0)
    out.unpersist()
  }

  test("knn graph: at most k ranked neighbors per node, edges bucket-local and best-first") {
    val g = AnnOps.knnGraph(embs, spark, k = 3).cache()
    assert(g.count() > 0)
    assert(g.filter(col("vec_id") === col("nbr_id")).count() == 0, "no self loops")
    val perNode = g.groupBy("vec_id").agg(count(lit(1)).as("deg"), max("rnk").as("maxr"))
    assert(perNode.filter(col("deg") > 3).count() == 0)
    assert(perNode.filter(col("deg") =!= col("maxr")).count() == 0,
      "ranks must be contiguous 1..deg")
    // best-first: rnk 1 has the max cosine among the node's edges
    val bad = g.groupBy("vec_id").agg(max("cosine_e4").as("mx")).as("m")
      .join(g.filter(col("rnk") === 1).as("r1"), col("m.vec_id") === col("r1.vec_id"))
      .filter(col("r1.cosine_e4") =!= col("m.mx"))
    assert(bad.count() == 0)
    // every edge's endpoints share an LSH bucket (approximate-graph contract):
    // each edge came from the capped pair set, whose reverse orientation was
    // also a candidate — so mutual edges carry a symmetric cosine
    val rev = g.as("a").join(g.as("b"),
      col("a.vec_id") === col("b.nbr_id") && col("a.nbr_id") === col("b.vec_id"))
    assert(rev.filter(col("a.cosine_e4") =!= col("b.cosine_e4")).count() == 0)
    g.unpersist()
  }

  test("dsir_select budget sweep: prefix + bound invariants hold at every budget") {
    import graft.operators.LmOps
    // kept tokens grow monotonically with the budget, the prefix property
    // holds at every cut, and overshoot never exceeds the boundary doc
    var prevKept = -1L
    for (budget <- Seq(1L, 100L, 1000L, 5000L, 20000L, 1000000L)) {
      val sel = LmOps.dsirSelect(docs, budget).cache()
      try {
        val kept = sel.filter(col("kept"))
        val keptTok = kept.agg(coalesce(sum(col("n_toks")), lit(0L))).head.getLong(0)
        assert(keptTok >= prevKept, s"budget $budget shrank the kept set")
        prevKept = keptTok
        val dropped = sel.filter(!col("kept"))
        if (dropped.count() > 0 && kept.count() > 0) {
          val minKept = kept.agg(min(col("imp_e6"))).head.getLong(0)
          val maxDrop = dropped.agg(max(col("imp_e6"))).head.getLong(0)
          assert(maxDrop <= minKept, s"budget $budget broke the importance prefix")
        }
        if (kept.count() > 0) {
          val maxDoc = kept.agg(max(col("n_toks"))).head.getLong(0)
          assert(keptTok < budget + maxDoc, s"budget $budget overshot past the boundary doc")
        }
      } finally sel.unpersist()
    }
  }

  test("dsir_select bounded census equals the full-precision sort cut, doc for doc") {
    import graft.operators.LmOps
    import org.apache.spark.sql.expressions.Window
    // brute-force reference: global (imp DESC, doc_id) sort, kept iff the
    // running token sum BEFORE the doc is under budget — the semantics the
    // 1000-qband two-phase construction must reproduce exactly
    for (budget <- Seq(37L, 10000L)) {
      val w = Window.orderBy(col("imp_e6").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val weights = LmOps.dsirWeights(docs)
        .join(docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_toks")),
          "doc_id")
      val ref = weights
        .withColumn("cum", coalesce(sum(col("n_toks")).over(w), lit(0L)))
        .select(col("doc_id"), (col("cum") < budget).as("ref_kept"))
      val diverged = LmOps.dsirSelect(docs, budget)
        .join(ref, "doc_id")
        .filter(col("kept") =!= col("ref_kept"))
      assert(diverged.count() == 0,
        s"budget $budget: bounded-census cut diverges from the full sort")
    }
  }

  test("dsir_select qband is integral and ≤1000 distinct even with all-distinct imps") {
    import graft.operators.LmOps
    import org.apache.spark.sql.types.LongType
    // 50k DISTINCT imp_e6 values over a wide range: the census the
    // cumulative window runs on must still be ≤1000 rows — the bound is
    // BY CONSTRUCTION, not a property of the data (true division here
    // would give one band per distinct imp: the r9 ADVICE regression)
    val wide = spark.range(50000)
      .select((col("id") * 7919L + 13L).as("imp_e6"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        spark.range(1).select(lit(13L).as("lo"), lit(49999L * 7919L + 13L).as("hi"))))
      .select(LmOps.qbandCol.as("qband"))
    assert(wide.schema("qband").dataType == LongType,
      "qband must be integral (true division would make it DOUBLE)")
    val bands = wide.agg(countDistinct(col("qband")).as("n"),
      min(col("qband")).as("mn"), max(col("qband")).as("mx")).head
    assert(bands.getLong(0) <= 1000L, s"census not bounded: ${bands.getLong(0)} bands")
    assert(bands.getLong(1) >= 0L && bands.getLong(2) < 1000L)
  }

  test("kmv sketches: saturated mode is exact, overlap matches true hash-set jaccard") {
    import graft.operators.SketchOps
    import graft.functions.TextFunctions.{stableHash60, tokens}
    // fixture vocab (31 tokens at sf0.001) sits below k = 64, so every
    // sketch saturates and the estimator must return EXACT counts
    val v = SketchOps.kmvVocabSketch(docs).head
    assert(v.getLong(0) <= SketchOps.KmvK)
    if (v.getLong(0) < SketchOps.KmvK)
      assert(v.getLong(3) == v.getLong(2) && v.getLong(4) == 0L,
        "unsaturated sketch must be exact with zero error")
    val ov = SketchOps.kmvSourceOverlap(docs).cache()
    try {
      // structural bounds hold for every pair
      assert(ov.filter(col("jaccard_est_e4") < 0 || col("jaccard_est_e4") > 10000).count() == 0)
      assert(ov.filter(col("est_inter") > col("est_a") + col("est_b")).count() == 0)
      // ground truth: exact jaccard of the per-source distinct hash sets
      val hs = docs.select(col("source"), explode(tokens(col("text"))).as("tok"))
        .select(col("source"), stableHash60(col("tok")).as("h")).distinct()
      val inter = hs.as("x").join(hs.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("n_inter"))
      val sizes = hs.groupBy("source").agg(count(lit(1)).as("n"))
      val truth = inter
        .join(sizes.withColumnRenamed("source", "src_a").withColumnRenamed("n", "na"), "src_a")
        .join(sizes.withColumnRenamed("source", "src_b").withColumnRenamed("n", "nb"), "src_b")
        .select(col("src_a"), col("src_b"),
          floor(col("n_inter") * 10000.0 / (col("na") + col("nb") - col("n_inter")) + 0.5)
            .cast("long").as("true_j"))
      // in saturated (exact) mode the sketch overlap IS the true overlap
      val allExact = ov.filter(col("est_a") >= SketchOps.KmvK ||
        col("est_b") >= SketchOps.KmvK).count() == 0
      if (allExact) {
        val bad = ov.join(truth, Seq("src_a", "src_b"))
          .filter(col("jaccard_est_e4") =!= col("true_j"))
        assert(bad.count() == 0, "saturated sketches must reproduce the exact jaccard")
      }
    } finally ov.unpersist()
  }

  test("ppl buckets: per-language thirds are score-monotone and roughly balanced") {
    import graft.operators.LmOps
    val pb = LmOps.pplBuckets(docs).cache()
    try {
      // monotone: within a language every head score beats every middle
      // score, every middle beats every tail (bands are disjoint values)
      val stats = pb.groupBy("lang", "bucket")
        .agg(min("backoff_e4").as("lo"), max("backoff_e4").as("hi"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val langs = stats.keys.map(_._1).toSet
      for (l <- langs) {
        for (hm <- stats.get((l, "head")); mm <- stats.get((l, "middle")))
          assert(hm._1 > mm._2, s"$l: head min ${hm._1} must beat middle max ${mm._2}")
        for (mm <- stats.get((l, "middle")); tm <- stats.get((l, "tail")))
          assert(mm._1 > tm._2, s"$l: middle min must beat tail max")
      }
      // balance, asserted only as far as the band-start rule GUARANTEES
      // it: whole bands are assigned by their start position, so a
      // single score value holding > n/3 of a language can legitimately
      // swallow a whole third (band counts 1,1,7 all land in head).
      // What the rule does guarantee: when every band holds <= n/3,
      // the first band is head (cum_before = 0) and the last band's
      // cum_before = n - c_last >= 2n/3 makes it tail — so >= 2 buckets
      val perLang = pb.groupBy("lang", "backoff_e4")
        .agg(count(lit(1)).as("c"))
        .groupBy("lang").agg(
          sum(col("c")).as("n"), max(col("c")).as("maxband"),
          countDistinct("backoff_e4").as("nv"))
        .join(pb.groupBy("lang").agg(countDistinct("bucket").as("nb")), Seq("lang"))
        .collect()
      perLang.foreach { r =>
        val (n, maxband, nv, nb) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        if (nv >= 3 && maxband * 3 <= n) assert(nb >= 2,
          s"${r.getString(0)}: $n docs, max band $maxband (<= n/3), $nv score values, one bucket")
      }
      // coverage: every scored doc gets exactly one bucket row
      assert(pb.count() == LmOps.trigramBackoff(docs).count())
      // frozen cutoffs reproduce the census buckets exactly on the
      // training corpus — the serve-time model is a faithful summary
      val cut = LmOps.trainPplCutoffs(docs)
      val applied = LmOps.applyPplCutoffs(
        pb.select(col("doc_id"), col("lang"), col("backoff_e4")), cut)
        .withColumnRenamed("bucket", "applied")
      val diverged = pb.join(applied, Seq("doc_id", "lang", "backoff_e4"))
        .filter(col("bucket") =!= col("applied"))
      assert(diverged.count() == 0, "applyPplCutoffs must replay pplBuckets on its train corpus")
    } finally pb.unpersist()
  }

  test("hard negatives: k cross-label rows per anchor, never beating same-label similarity cap") {
    val emb = Tables.embeddings(spark, sf).cache()
    try {
      val hn = AnnOps.hardNegatives(emb).cache()
      val labels = emb.select(col("vec_id"), col("label")).withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("label", "qlabel")
      // every mined negative carries a label different from its anchor's
      assert(hn.join(labels, "qid").filter(col("label") === col("qlabel")).count() == 0)
      // exactly k rows per anchor, ranked 1..k
      val perQ = hn.groupBy("qid").agg(count(lit(1)).as("n"), max("rnk").as("mr"))
        .filter(col("n") =!= 5 || col("mr") =!= 5)
      assert(perQ.count() == 0)
      // hardest negative can never out-rank the brute-force best overall
      // neighbor (the brute top-1 is an upper bound over ALL labels)
      val best = AnnOps.bruteTopK(emb).filter(col("rnk") === 1)
        .select(col("qid"), col("cosine_e4").as("best_all"))
      val bad = hn.filter(col("rnk") === 1).join(best, "qid")
        .filter(col("cosine_e4") > col("best_all"))
      assert(bad.count() == 0)
      hn.unpersist()
    } finally emb.unpersist()
  }

  test("sem_dedup: one row per embedding near-dup pair, Jaccard attached") {
    val pairs = AnnOps.nearDupPairs(embs, spark)
    val out = AnnOps.semDedup(docs, embs, spark).cache()
    assert(out.count() == pairs.count())
    assert(out.filter(col("jaccard_e4") < 0 || col("jaccard_e4") > 10000).count() == 0)
    assert(out.filter(col("cosine_e4") < 4000).count() == 0)
    out.unpersist()
  }

  test("raising the LSH plane count never ADDS a near-dup pair (16p candidates ⊆ 8p)") {
    // the 16-plane bucket bits extend the 8-plane bits, so a same-bucket
    // pair at 16 planes must share its 8-plane bucket too — raising
    // planes only SPLITS buckets (the safe direction for cap tuning);
    // holds as long as no 8-plane bucket crosses the degeneracy cap,
    // which the fixture's honest buckets never do
    val p8 = AnnOps.nearDupPairs(embs, spark).select("va", "vb").cache()
    val p16 = AnnOps.nearDupPairs(embs, spark, numPlanes = 16).select("va", "vb").cache()
    try {
      assert(p16.except(p8).count() == 0, "16-plane blocking fabricated a pair")
      assert(p16.count() <= p8.count())
      assert(p16.count() > 0, "fixture should retain some near-dups at 16 planes")
    } finally { p8.unpersist(); p16.unpersist() }
  }

  test("containment dominates Jaccard: every Jaccard pair survives the containment threshold") {
    // inter/min(na,nb) >= inter/(na+nb-inter) always, so at one threshold
    // the containment pair set is a superset — the extra pairs are the
    // near-superset shape (small doc embedded in a bigger one)
    val jac = DedupOps.ngramJaccard(docs, 8000L).select("da", "db").cache()
    val cont = DedupOps.containmentDedup(docs, 8000L).cache()
    try {
      assert(jac.except(cont.select("da", "db")).count() == 0,
        "a Jaccard-threshold pair fell below the same containment threshold")
      assert(cont.filter(col("containment_e4") < 8000L || col("containment_e4") > 10000L).count() == 0)
    } finally { jac.unpersist(); cont.unpersist() }
  }

  test("multi-probe near-dups contain the single-probe pairs and never invent similarity") {
    val plain = AnnOps.nearDupPairs(embs, spark).cache()
    val mp = AnnOps.nearDupPairsMultiProbe(embs, spark).cache()
    try {
      // home-bucket probes make multi-probe a superset of plain blocking
      assert(plain.select("va", "vb").except(mp.select("va", "vb")).count() == 0,
        "multi-probe lost a same-bucket pair")
      // every surfaced pair really clears the cosine threshold
      assert(mp.filter(col("cosine_e4") < 4000L).count() == 0)
      // and the probe expansion introduces no duplicate pairs
      assert(mp.groupBy("va", "vb").count().filter(col("count") > 1).count() == 0)
    } finally { plain.unpersist(); mp.unpersist() }
  }

  test("incremental dedup: no admitted fingerprint exists in the old corpus or twice in batch") {
    val out = DedupOps.incrDedup(docs, 25L).cache()
    assert(out.count() > 0)
    assert(out.filter(col("doc_id") < 25).count() == 0)
    // no admitted fp collides with the old corpus
    val oldFps = docs.filter(col("doc_id") < 25)
      .select(md5(array_join(slice(split(col("text"), " "), 1, 5), " ")).as("fp"))
    assert(out.join(oldFps, "fp").count() == 0)
    // admitted fingerprints are unique
    assert(out.groupBy("fp").count().filter(col("count") > 1).count() == 0)
    out.unpersist()
  }

  test("dedup keep: drops exactly the non-canonical cluster members") {
    val keep = graft.operators.GraphOps.dedupKeep(docs).cache()
    val clusters = graft.operators.GraphOps.dedupClusters(docs).cache()
    val dropped = clusters.filter(col("doc_id") =!= col("cluster_id")).count()
    assert(keep.count() == docs.count() - dropped)
    // every cluster's canonical doc survives
    val canon = clusters.select(col("cluster_id").as("doc_id")).distinct()
    assert(canon.join(keep, "doc_id").count() == canon.count())
    keep.unpersist(); clusters.unpersist()
  }

  test("LSH ANN scores never beat the brute-force best for the same query") {
    val brute = AnnOps.bruteTopK(embs, nQueries = 5, k = 1)
      .select(col("qid"), col("cosine_e4").as("best"))
    val lsh = AnnOps.lshTopK(embs, spark, nQueries = 5, k = 1)
      .select(col("qid"), col("cosine_e4").as("lsh_best"))
    val joined = brute.join(lsh, "qid")
    assert(joined.filter(col("lsh_best") > col("best")).count() == 0)
  }

  test("multimodal decode stub: deterministic checksum, header shape, all rows") {
    val f1 = MultimodalOps.decodeFeatures(docs).orderBy("doc_id").collect()
    val f2 = MultimodalOps.decodeFeatures(docs).orderBy("doc_id").collect()
    assert(f1.length == docs.count())
    assert(f1.map(_.getLong(3)).toSeq == f2.map(_.getLong(3)).toSeq)
    assert(f1.forall(r => r.getString(2).length == 8))
  }

  test("media embeddings feed the ANN operators unchanged") {
    val me = MultimodalOps.mediaEmbeddings(docs)
      .withColumn("embedding", org.apache.spark.sql.functions.transform(
        col("embedding"), (x: org.apache.spark.sql.Column) => x.cast("float")))
    val topk = AnnOps.bruteTopK(me, nQueries = 3, k = 2)
    assert(topk.groupBy("qid").count().filter(col("count") =!= 2).count() == 0)
  }

  test("frame dedup groups only identical frames (hash spot-check)") {
    import graft.operators.MultimodalOps
    val out = MultimodalOps.frameDedup(docs).cache()
    assert(out.filter(col("n") < 2).count() == 0)
    // every reported fingerprint really has n matching frames
    val direct = MultimodalOps.frameSample(docs)
      .select(md5(col("frame")).as("fp"))
      .groupBy("fp").count()
    val joined = out.join(direct, "fp")
    assert(joined.filter(col("n") =!= col("count")).count() == 0)
    out.unpersist()
  }

  test("jpeg segment walk survives adversarial streams the fixture lacks") {
    val s = spark
    import s.implicits._
    // hand-assembled byte streams (hex), 1 row each:
    //  good:   SOI | APP0(len4,2 data) | COM(len5,3 data) | SOF0 h=2 w=3, 1 comp
    //  noff:   SOI then garbage where a marker's 0xFF should be
    //  nosof:  SOI then 9 consecutive COM segments — SOF beyond the walk budget
    //  cutsof: SOI | SOF0 marker+length only, stream ends inside the header
    val good = "FFD8" + "FFE000041111" + "FFFE0005222222" +
      "FFC0000B08" + "0002" + "0003" + "01" + "011100"
    val noff = "FFD8" + "00E000041111"
    val nosof = "FFD8" + "FFFE00031A" * 9 + "FFC0000B0800020003" + "01011100"
    val cutsof = "FFD8" + "FFC0000B"
    val rows = Seq((1L, good), (2L, noff), (3L, nosof), (4L, cutsof))
      .toDF("doc_id", "hex")
      .select(col("doc_id"), unhex(col("hex")).as("media"))
    val parsed = rows
      .select(col("doc_id"), col("media"),
        MultimodalOps.jpegSofOffset(col("media")).as("sof_off"))
      .select(col("doc_id"),
        MultimodalOps.jpegDimsStruct(col("media"), col("sof_off")).as("d"))
      .select(col("doc_id"), col("d.width"), col("d.height"), col("d.status"))
      .orderBy("doc_id").collect()
    assert(parsed(0).getLong(1) == 3L && parsed(0).getLong(2) == 2L &&
      parsed(0).getString(3) == "jpeg")
    assert(parsed(1).getString(3) == "corrupt")
    assert(parsed(2).getString(3) == "corrupt") // budget exhausted, NOT a crash
    assert(parsed(3).getString(3) == "corrupt") // truncated inside SOF header
  }

  test("riff chunk walk honors odd-size padding and survives adversarial streams") {
    val s = spark
    import s.implicits._
    def le32(n: Int) = f"${n & 0xff}%02X${(n >> 8) & 0xff}%02X${(n >> 16) & 0xff}%02X${(n >> 24) & 0xff}%02X"
    def tag(t: String) = t.getBytes("US-ASCII").map(b => f"$b%02X").mkString
    val fmtChunk = tag("fmt ") + le32(16) +
      "0100" + "0200" + le32(22050) + le32(88200) + "0400" + "1000" // 2ch 22050Hz 16bit
    // good: JUNK with ODD size 3 (pad byte follows, excluded from size) then fmt
    val good = tag("RIFF") + le32(100) + tag("WAVE") +
      tag("JUNK") + le32(3) + "AAAAAA" + "00" + fmtChunk
    // nofmt: 9 JUNK chunks — fmt beyond the walk budget
    val nofmt = tag("RIFF") + le32(100) + tag("WAVE") +
      (tag("JUNK") + le32(2) + "BBBB") * 9 + fmtChunk
    // cutfmt: stream ends inside the fmt payload
    val cutfmt = tag("RIFF") + le32(100) + tag("WAVE") + tag("fmt ") + le32(16) + "0100"
    // notriff: right sizes, wrong magic
    val notriff = tag("RIFX") + le32(100) + tag("WAVE") + fmtChunk
    val rows = Seq((1L, good), (2L, nofmt), (3L, cutfmt), (4L, notriff))
      .toDF("doc_id", "hex")
    val out = rows.select(col("doc_id"), unhex(col("hex")).as("media"))
    val byteParsed = out.select(col("doc_id"),
        MultimodalOps.wavFmtOffset(col("media")).as("fmt_off"),
        length(col("media")).as("len"))
      .orderBy("doc_id").collect()
    // good: walk lands on fmt after the padded odd JUNK: 13 + 8 + 3 + 1 = 25
    assert(byteParsed(0).getLong(1) == 25L)
    assert(byteParsed(1).getLong(1) == -1L) // budget exhausted, NOT a crash
    // cutfmt: the walk FINDS fmt (id readable) — wavDims' length guard
    // is what rejects it; check the guard arithmetic here
    assert(byteParsed(2).getLong(1) == 13L && byteParsed(2).getInt(2) < 13 + 23)
    assert(byteParsed(3).getLong(1) == 13L) // walk is magic-agnostic; riffOk rejects
  }

  test("header parsers never throw on arbitrary bytes (scraped-data fuzz)") {
    val s = spark
    import s.implicits._
    // 600 deterministic random streams: pure garbage, plus each magic
    // followed by garbage (the adversarial case — the walk runs on it)
    val rnd = new scala.util.Random(42)
    def bytes(n: Int) = Array.fill(n)(rnd.nextInt(256).toByte)
    val magics = Seq(
      Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A),
      Array[Byte](0xFF.toByte, 0xD8.toByte),
      "RIFF".getBytes("US-ASCII"))
    val streams = (0 until 300).map(i => (i.toLong, bytes(rnd.nextInt(64)))) ++
      (0 until 300).map(i => ((300 + i).toLong,
        magics(i % 3) ++ bytes(rnd.nextInt(48))))
    val df = streams.toDF("doc_id", "media")
    // UNGUARDED walks on purpose: every stream — garbage included — runs
    // both segment walks, which is a stronger no-throw property than the
    // production magic-guarded walkOffsets projection exercises
    val parsed = df.select(col("doc_id"), col("media"),
        MultimodalOps.jpegSofOffset(col("media")).as("sof_off"),
        MultimodalOps.wavFmtOffset(col("media")).as("fmt_off"))
      .select(col("doc_id"),
        MultimodalOps.sniffStatus(col("media"), col("sof_off"), col("fmt_off")).as("status"),
        MultimodalOps.pngDimsStruct(col("media")).getField("width").as("pw"),
        MultimodalOps.jpegDimsStruct(col("media"), col("sof_off")).getField("width").as("jw"),
        MultimodalOps.wavDimsStruct(col("media"), col("fmt_off")).getField("sample_rate").as("sr"))
      .collect() // completing at all IS the no-throw property
    assert(parsed.length == 600)
    val statuses = parsed.map(_.getString(1)).toSet
    assert(statuses.subsetOf(Set("png", "jpeg", "wav", "corrupt", "unknown")))
    // garbage-after-magic rows must resolve (almost always corrupt, never
    // unknown — the magic matched); pure-garbage rows can never parse
    assert(parsed.filter(_.getLong(0) >= 300).forall(_.getString(1) != "unknown"))
  }

  test("pnm pixel decode: fuzzed bytes never throw; mutated well-formed payloads stay sane") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(43)
    def bytes(n: Int) = Array.fill(n)(rnd.nextInt(256).toByte)
    // garbage; magic+garbage (adversarial header digits reach the dim
    // guards); and REAL payloads truncated at random byte lengths
    def realPnm(id: Long): Array[Byte] = {
      val ch = if (id % 2 == 0) 1 else 3
      val w = (id % 8 + 1).toInt; val h = (id % 6 + 1).toInt
      val head = s"P${if (ch == 1) 5 else 6}\n$w $h\n255\n".getBytes("US-ASCII")
      val n = w * h * ch
      val px = Array.tabulate(n)(j =>
        (if (ch == 1) (id * 31 + j * 7) % 256 else (id * 17 + j * 5) % 256).toByte)
      head ++ px
    }
    val streams =
      (0 until 200).map(i => (i.toLong, bytes(rnd.nextInt(64)))) ++
      (0 until 200).map(i => ((200 + i).toLong,
        s"P${5 + i % 2}\n".getBytes("US-ASCII") ++ bytes(rnd.nextInt(48)))) ++
      (0 until 200).map { i =>
        val full = realPnm(400L + i)
        ((400 + i).toLong, full.take(rnd.nextInt(full.length + 1)))
      }
    val df = streams.toDF("doc_id", "media")
    val parsed = df
      .select(col("doc_id") +: MultimodalOps.pnmParseCols(col("media")): _*)
      .select(col("doc_id"), col("status"), col("width"), col("channels"),
        array_min(col("c0")).as("c0_min"), array_max(col("c0")).as("c0_max"))
      .collect() // completing at all IS the no-throw property
    assert(parsed.length == 600)
    assert(parsed.map(_.getString(1)).toSet.subsetOf(Set("pgm", "ppm", "corrupt")))
    // any row that parsed must carry in-range samples and sane dims
    parsed.filter(_.getString(1) != "corrupt").foreach { r =>
      assert(!r.isNullAt(2) && r.getLong(2) >= 1L)
      assert(r.getLong(4) >= 0L && r.getLong(5) <= 255L, s"sample out of range: $r")
    }
    // untruncated real payloads (take == full length) must parse clean —
    // verified exactly via the closed pixel form on one known row
    // 9997 % 7 != 3 (not the truncated branch) and odd → P6/RGB
    val one = Seq(9997L).toDF("doc_id")
    val got = MultimodalOps.mediaPixels(one).collect()(0)
    assert(got.getAs[String]("status") == "ppm" && got.getAs[Long]("channels") == 3L)
    val n = (9997 % 8 + 1) * (9997 % 6 + 1) * 3
    val exp0 = (0 until n).filter(_ % 3 == 0).map(j => (9997L * 17 + j * 5) % 256)
    assert(got.getAs[Long]("c0_sum") == exp0.sum && got.getAs[Long]("c0_min") == exp0.min)
  }

  test("ahash near-dups: identical images pair at hamming 0; a degenerate bucket is capped, not squared") {
    val s = spark
    import s.implicits._
    def docsFor(ids: Seq[Long]) = ids.toDF("doc_id")
    // doc_ids ≡ (mod 768) share (w, h, ch) AND every pixel byte (768 is
    // lcm of the dim moduli and a multiple of 256) — identical images.
    // 768 % 7 = 5 and 2304 % 7 = 1: neither is the truncated class.
    val pair = MultimodalOps.ahashNearDups(docsFor(Seq(768L, 2304L))).collect()
    assert(pair.length == 1 && pair(0).getLong(2) == 0L,
      s"identical images must pair at hamming 0: ${pair.mkString(", ")}")
    // 200 identical images: ~171 non-corrupt land in ONE band bucket >
    // MaxBandBucket — the bucket drops whole (0 pairs), never squares;
    // the group is still recoverable by grouping mediaAHash exactly
    val flood = docsFor((0L until 200L).map(_ * 768L))
    assert(MultimodalOps.ahashNearDups(flood).count() == 0,
      "an over-cap bucket must drop, not emit O(n²) pairs")
    val groups = MultimodalOps.mediaAHash(flood)
      .filter(col("status") =!= "corrupt")
      .groupBy("width", "height", "channels", "ahash").count()
      .collect()
    assert(groups.length == 1 && groups(0).getLong(4) > DedupOps.MaxBandBucket,
      "exact-hash grouping still sees the identical-image class")
    // banding is an implementation dial, not semantics: at the same
    // radius, 4 bands of 12 bits and 8 bands of 6 bits (both exact-recall
    // for t < bands) must return the IDENTICAL verified pair set
    val a = MultimodalOps.ahashNearDups(docs, maxHamming = 2, bands = 4)
    val b = MultimodalOps.ahashNearDups(docs, maxHamming = 2, bands = 8)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "different band structures must agree on the verified pairs")
  }

  test("frame sampling reconstructs total byte counts") {
    val frames = MultimodalOps.frameSample(docs)
      .groupBy("doc_id").agg(sum("frame_bytes").as("total"))
    val expected = MultimodalOps.mediaTable(docs)
      .select(col("doc_id"), length(col("media")).as("n_bytes"))
    assert(frames.join(expected, "doc_id").filter(col("total") =!= col("n_bytes")).count() == 0)
  }

  test("PQ encoding: every vector gets exactly one code per subspace") {
    val emb = Tables.embeddings(spark, sf)
    val codes = operators.PqOps.pqCodes(emb).cache()
    val nVecs = emb.count()
    // 8 subspaces, one code each, per vector
    assert(codes.count() == nVecs * 8)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= 8).count() == 0)
    assert(codes.groupBy("vec_id", "sub").count().filter(col("count") =!= 1).count() == 0)
    // ADC distances are sums of integer squared errors — non-negative
    val knn = operators.PqOps.pqTopK(emb)
    assert(knn.filter(col("adist_q") < 0).count() == 0)
    codes.unpersist()
  }

  test("count-min sketch: never underestimates, narrow width collides, merge = counter addition") {
    import graft.operators.SketchOps
    // the one-sided error guarantee: min-over-rows can only OVERcount
    val audit = SketchOps.cmsFreqAudit(docs, width = 4).cache()
    try {
      assert(audit.filter(col("est_count") < col("n_exact")).count() == 0,
        "CMS must never underestimate")
      // pigeonhole: the fixture vocab into 4 buckets/row must collide in
      // every row for some token, so at least one probe overestimates
      assert(audit.filter(col("over_e4") > 0).count() > 0,
        "width 4 must produce at least one collision overestimate")
    } finally audit.unpersist()
    // mergeability: the corpus sketch IS the elementwise counter sum of
    // the halves' sketches — the per-partition combine the scale story
    // rests on, asserted end-to-end
    val whole = SketchOps.cmsSketch(docs)
    val summed = SketchOps.cmsSketch(docs.filter(col("doc_id") % 2 === 0))
      .union(SketchOps.cmsSketch(docs.filter(col("doc_id") % 2 =!= 0)))
      .groupBy("row_id", "bucket").agg(sum(col("cnt")).as("scnt"))
    val diff = whole.join(summed, Seq("row_id", "bucket"), "full_outer")
      .filter(coalesce(col("cnt"), lit(0L)) =!= coalesce(col("scnt"), lit(0L)))
    assert(diff.count() == 0, "CMS must merge by counter addition")
    // heavy hitters: one-sided error ⇒ NO false negatives (every truly
    // heavy token survives), and the survivor set is exactly
    // truly-heavy ∪ flagged false positives
    val hh = SketchOps.cmsHeavyHitters(docs, width = 4).cache()
    try {
      val nTotal = hh.select(col("n_total")).head.getLong(0)
      val truly = SketchOps.cmsFreqAudit(docs, width = 4)
        .filter(col("n_exact") * 10000L >= lit(300L) * lit(nTotal))
      assert(truly.join(hh.select("tok"), Seq("tok"), "left_anti").count() == 0,
        "a truly heavy token was dropped — violates the one-sided bound")
      assert(hh.filter(!col("is_heavy")).count() == hh.count() - truly.count(),
        "survivors must be exactly truly-heavy plus flagged false positives")
    } finally hh.unpersist()
  }
}
