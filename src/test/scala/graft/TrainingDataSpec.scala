package graft

import graft.operators.{AnnOps, DedupOps, MultimodalOps, TextOps}
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

  test("frame sampling reconstructs total byte counts") {
    val frames = MultimodalOps.frameSample(docs)
      .groupBy("doc_id").agg(sum("frame_bytes").as("total"))
    val expected = MultimodalOps.mediaTable(docs)
      .select(col("doc_id"), length(col("media")).as("n_bytes"))
    assert(frames.join(expected, "doc_id").filter(col("total") =!= col("n_bytes")).count() == 0)
  }
}
