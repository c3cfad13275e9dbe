package graft

import graft.operators._
import org.apache.spark.sql.DataFrame

/** Empty-input behavior: every operator family must return an empty
  * result — not throw — on an empty (but well-typed) input. The cases
  * that historically break: windows over empty partitions, sequence()
  * explodes with degenerate bounds, iterative loops with no first round,
  * and aggregations feeding scalar cross joins.
  */
class EmptyInputSpec extends SparkSpec {

  private def emptyDocs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq.empty[(Long, String, String, String)].toDF("doc_id", "text", "lang", "source")
  }

  private def emptyEmb: DataFrame = {
    val s = spark
    import s.implicits._
    Seq.empty[(Long, String, Array[Float])].toDF("vec_id", "label", "embedding")
  }

  test("dedup family returns empty on an empty corpus") {
    assert(DedupOps.exact(emptyDocs).count() == 0)
    assert(DedupOps.ngramJaccard(emptyDocs).count() == 0)
    assert(DedupOps.minhashLsh(emptyDocs, spark).count() == 0)
    assert(DedupOps.simhashDedup(emptyDocs, spark).count() == 0)
    assert(DedupOps.incrDedup(emptyDocs, 0L).count() == 0)
    assert(DedupOps.pairLongestSpan(emptyDocs).count() == 0)
    assert(DedupOps.sourceOverlap(emptyDocs, spark).count() == 0)
    assert(DedupOps.jaccardSweep(emptyDocs).count() == 0)
    assert(DedupOps.sweepThreshold(emptyDocs).count() == 0)
  }

  test("clustering and keep-set return empty on an empty corpus") {
    GraphOps.clearClusterMemo()
    assert(GraphOps.dedupClusters(emptyDocs).count() == 0)
    assert(GraphOps.dedupKeep(emptyDocs).count() == 0)
  }

  test("curation family returns empty on an empty corpus") {
    assert(CurationOps.gopherRules(emptyDocs).count() == 0)
    assert(CurationOps.chunked(emptyDocs).count() == 0)
    assert(CurationOps.chunkDedup(emptyDocs).count() == 0)
    assert(CurationOps.mixPlan(emptyDocs).count() == 0)
    assert(CurationOps.langMix(emptyDocs).count() == 0)
    assert(CurationOps.sourceCaps(emptyDocs).count() == 0)
    assert(CurationOps.stratifiedSample(emptyDocs).count() == 0)
    assert(CurationOps.ppsSample(emptyDocs).count() == 0)
    assert(CurationOps.ppsSampleBySource(emptyDocs).count() == 0)
    assert(CurationOps.vocabTopGrams(emptyDocs).count() == 0)
    assert(CurationOps.diversityCensus(emptyDocs).count() == 0)
    assert(CurationOps.contamination(emptyDocs).count() == 0)
    assert(CurationOps.curated(emptyDocs).count() == 0)
    assert(CurationOps.bigramFluency(emptyDocs).count() == 0)
    assert(LmOps.trigramBackoff(emptyDocs).count() == 0)
    assert(LmOps.dsirWeights(emptyDocs).count() == 0)
    assert(CurationOps.cascadePlan(emptyDocs).count() == 0)
    assert(CurationOps.curationFunnel(emptyDocs).count() == 0)
    assert(LmOps.scoreCorr(emptyDocs).count() == 0)
    assert(CurationOps.tokenAllocation(emptyDocs).count() == 0)
    assert(LmOps.nbScore(emptyDocs).count() == 0)
    assert(LmOps.nbTopFeatures(emptyDocs).count() == 0)
    assert(CurationOps.temperatureMix(emptyDocs).count() == 0)
  }

  test("text and multimodal families return empty on an empty corpus") {
    assert(TextOps.tokenCount(emptyDocs).count() == 0)
    assert(TextOps.langId(emptyDocs).count() == 0)
    assert(MultimodalOps.frameSample(emptyDocs).count() == 0)
    assert(MultimodalOps.frameDedup(emptyDocs).count() == 0)
    assert(MultimodalOps.mediaDims(emptyDocs).count() == 0)
    assert(MultimodalOps.jpegDims(emptyDocs).count() == 0)
    assert(MultimodalOps.mediaDimsMix(emptyDocs).count() == 0)
    assert(MultimodalOps.wavDims(emptyDocs).count() == 0)
    assert(MultimodalOps.mediaSniff(emptyDocs).count() == 0)
  }

  test("ANN family returns empty on an empty vector table") {
    assert(AnnOps.bruteTopK(emptyEmb).count() == 0)
    assert(AnnOps.lshTopK(emptyEmb, spark).count() == 0)
    assert(AnnOps.nearDupPairs(emptyEmb, spark).count() == 0)
    assert(AnnOps.knnGraph(emptyEmb, spark).count() == 0)
    assert(PqOps.pqRerankTopK(emptyEmb).count() == 0)
  }

  test("retrieval, layout, curriculum, and index-ingest ops return empty on empty inputs") {
    val s = spark
    import s.implicits._
    assert(RetrievalOps.bm25TopK(emptyDocs).count() == 0)
    assert(RetrievalOps.phraseHits(emptyDocs).count() == 0)
    assert(RetrievalOps.rrfFusion(emptyDocs, emptyEmb).count() == 0)
    assert(CurationOps.qualityCurriculum(emptyDocs).count() == 0)
    assert(CurationOps.bpeMerges(emptyDocs).count() == 0)
    assert(CurationOps.tokenBudgetCut(emptyDocs).count() == 0)
    assert(CurationOps.tokenBudgetBoundary(emptyDocs).count() == 0)
    assert(AnnOps.filteredTopK(emptyEmb).count() == 0)
    assert(AnnOps.ivfAssignIncremental(emptyEmb).count() == 0)
    val emptyLineitem = Seq.empty[(Long, Long, Long)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    assert(DataLayoutOps.zorderBins(emptyLineitem).count() == 0)
    assert(DataLayoutOps.skewCensus(emptyLineitem, "l_partkey").count() == 0)
    // profile emits one row per column even on an empty table (all zeros)
    val prof = DataLayoutOps.profile(emptyLineitem, Seq("l_partkey")).collect()
    assert(prof.length == 1 && prof(0).getLong(1) == 0 && prof(0).getLong(2) == 0 &&
      prof(0).getLong(3) == 0)
    val profA = DataLayoutOps.profileApprox(emptyLineitem, Seq("l_partkey")).collect()
    assert(profA.length == 1 && profA(0).getLong(1) == 0 && profA(0).getLong(2) == 0)
    assert(DataLayoutOps.joinSizeEstimate(
      emptyLineitem, "l_orderkey", emptyLineitem, "l_orderkey").count() == 0)
    assert(DataLayoutOps.sortBounds(
      emptyLineitem, "l_partkey", Seq("l_orderkey", "l_suppkey")).count() == 0)
    // the boundary-consuming writer must not throw on an empty corpus
    DataLayoutOps.rangePartitionedWrite(
      emptyLineitem, "l_partkey", Seq("l_orderkey", "l_suppkey"),
      java.nio.file.Files.createTempDirectory("graft_rw_empty").toString, buckets = 4)
  }

  test("round-7 operators behave on empty inputs") {
    val s = spark
    import s.implicits._
    // query-table BM25: empty corpus and/or empty query table -> empty
    val emptyQueries = Seq.empty[(Long, String)].toDF("query_id", "term")
    assert(RetrievalOps.benchmarkQueries(emptyDocs).count() == 0)
    assert(RetrievalOps.bm25TopKForQueries(emptyDocs, emptyQueries).count() == 0)
    val someQueries = Seq((0L, "join")).toDF("query_id", "term")
    assert(RetrievalOps.bm25TopKForQueries(emptyDocs, someQueries).count() == 0)
    // 3-D z-order census
    val emptyLineitem = Seq.empty[(Long, Long, Long)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
    assert(DataLayoutOps.zorderBins3d(emptyLineitem).count() == 0)
    // residual IVF-PQ family
    assert(PqOps.ivfPqResidualTopK(emptyEmb).count() == 0)
    assert(PqOps.ivfPqResidualTrainedTopK(emptyEmb).count() == 0)
    // blocker recall on an empty corpus: five defined rows, vacuous
    // recall 10000 (n_true = 0), in both exact and sampled modes
    val rec = DedupOps.blockerPairRecall(emptyDocs, emptyEmb, spark).collect()
    assert(rec.length == 5 && rec.forall(r => r.getLong(1) == 0 && r.getLong(3) == 10000L))
    assert(DedupOps.blockerPairRecall(emptyDocs, emptyEmb, spark,
      samplePct = Some(40)).count() == 5)
    // span scrub family: empty corpus -> empty census, empty scrub
    assert(ScrubOps.dupSpanCensus(emptyDocs).count() == 0)
    assert(ScrubOps.spanScrub(emptyDocs).count() == 0)
    // incremental BM25: empty corpus -> empty index and empty ranking
    assert(RetrievalOps.bm25Index(emptyDocs).count() == 0)
    assert(RetrievalOps.bm25IngestTopK(emptyDocs).count() == 0)
    // Matryoshka truncation ladder: empty vector table -> empty everywhere
    assert(AnnOps.truncTopK(emptyEmb).count() == 0)
    assert(AnnOps.truncRerankTopK(emptyEmb).count() == 0)
    // source drift and BPE fertility: empty corpus -> no rows, no 0-div
    assert(CurationOps.sourceQualityDrift(emptyDocs).count() == 0)
    assert(CurationOps.bpeEncodeStats(emptyDocs).count() == 0)
    // round-8 family: selection, bucketing, intra-doc census, mining —
    // all empty-in/empty-out with no div-by-zero or null bucket
    assert(LmOps.dsirSelect(emptyDocs).count() == 0)
    assert(LmOps.pplBuckets(emptyDocs).count() == 0)
    assert(LmOps.trainPplCutoffs(emptyDocs).count() == 0)
    assert(ScrubOps.intraDupCensus(emptyDocs).count() == 0)
    assert(AnnOps.hardNegatives(emptyEmb).count() == 0)
    assert(PqOps.ivfPqResidualTrainedTopK(emptyEmb, trainPct = Some(50)).count() == 0)
    assert(graft.operators.EmbeddingStatsOps.kmeans2(emptyEmb, trainPct = Some(50)).count() == 0)
    // sketches: empty corpus -> one saturated row with zero estimates /
    // no pair rows; corpus diff of empties is empty
    val kv = SketchOps.kmvVocabSketch(emptyDocs).collect()
    assert(kv.length == 1 && kv(0).getLong(0) == 0 && kv(0).getLong(3) == 0)
    assert(SketchOps.kmvSourceOverlap(emptyDocs).count() == 0)
    assert(SketchOps.cmsFreqAudit(emptyDocs).count() == 0)
    assert(SketchOps.cmsHeavyHitters(emptyDocs).count() == 0)
    assert(CurationOps.corpusDiff(emptyDocs, emptyDocs).count() == 0)
    assert(CurationOps.allocSelect(emptyDocs).count() == 0)
    assert(DataLayoutOps.exactQuantiles(
      emptyDocs.selectExpr("doc_id AS v"), "v").count() == 0)
    assert(DataLayoutOps.exactQuantilesBy(
      emptyDocs.selectExpr("lang", "doc_id AS v"), "lang", "v").count() == 0)
    assert(DataLayoutOps.exactQuantilesByShuffled(
      emptyDocs.selectExpr("lang", "doc_id AS v"), "lang", "v").count() == 0)
    assert(MultimodalOps.mediaPixels(emptyDocs).count() == 0)
    assert(MultimodalOps.mediaAHash(emptyDocs).count() == 0)
    assert(PngCodecOps.pngPixels(emptyDocs).count() == 0)
    assert(MultimodalOps.ahashNearDups(emptyDocs).count() == 0)
  }

  test("perceptual near-dup and PCM families return empty on an empty corpus") {
    assert(PhashOps.phashHashes(emptyDocs).count() == 0)
    assert(PhashOps.phashNearDups(emptyDocs).count() == 0)
    assert(AudioFpOps.audioHashes(emptyDocs).count() == 0)
    assert(AudioFpOps.audioNearDups(emptyDocs).count() == 0)
    assert(WavCodecOps.wavPcm(emptyDocs).count() == 0)
    assert(WavCodecOps.wavFeatures(emptyDocs).count() == 0)
    assert(AviCodecOps.aviMeta(emptyDocs).count() == 0)
    assert(AviCodecOps.aviFrameSample(emptyDocs).count() == 0)
    assert(AviCodecOps.videoPhash(emptyDocs).count() == 0)
    assert(AviCodecOps.videoNearDups(emptyDocs).count() == 0)
  }

  test("as-of join with an empty right side left-joins nulls, empty left is empty") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "ts")
    val emptyRight = Seq.empty[(String, java.sql.Timestamp, String)].toDF("k", "rts", "v")
    val out = JoinsOps.asofJoin(left, emptyRight, "k", "ts", "rts")
    assert(out.count() == 1 && out.filter(out("v").isNull).count() == 1)
    val emptyLeft = Seq.empty[(Long, String, java.sql.Timestamp)].toDF("id", "k", "ts")
    val right = Seq(("k", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), "v"))
      .toDF("k", "rts", "v")
    assert(JoinsOps.asofJoin(emptyLeft, right, "k", "ts", "rts").count() == 0)
  }
}
