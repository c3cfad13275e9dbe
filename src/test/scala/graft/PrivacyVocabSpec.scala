package graft

import graft.operators.{AnnOps, CurationOps, PrivacyOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-3 additions: PII redaction, corpus vocab/sharing stats, IVF probe-2. */
class PrivacyVocabSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("pii redaction: every contact line has a phone and an email; redaction removes both") {
    val out = PrivacyOps.piiRedact(Tables.customer(spark, sf)).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_phone") < 1 || col("n_email") < 1).count() == 0)
    assert(out.filter(
      col("redacted").rlike(PrivacyOps.PhoneRe) ||
        col("redacted").rlike(PrivacyOps.EmailRe)).count() == 0)
    assert(out.filter(
      !col("redacted").contains("<tel>") || !col("redacted").contains("<email>")).count() == 0)
    out.unpersist()
  }

  test("cross-doc sharing: shared_e4 bounded; a planted verbatim copy scores 10000") {
    val out = CurationOps.crossDocShared(docs)
    assert(out.filter(col("shared_e4") < 0 || col("shared_e4") > 10000).count() == 0)
    val planted = docs.unionByName(
      docs.filter(col("doc_id") === 13).withColumn("doc_id", lit(99913L)))
    val hit = CurationOps.crossDocShared(planted).filter(col("doc_id") === 99913L).collect()
    assert(hit.length == 1 && hit(0).getAs[Long]("shared_e4") == 10000L)
  }

  test("vocab top grams: ranks contiguous per n, counts non-increasing") {
    val out = CurationOps.vocabTopGrams(docs, k = 10).collect()
    for (n <- Seq(1, 2)) {
      val rows = out.filter(_.getAs[Int]("n") == n).sortBy(_.getAs[Int]("rnk"))
      assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to 10).toSeq)
      val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
      assert(cnts == cnts.sorted.reverse)
    }
  }

  test("bloom-prefiltered contamination is row-identical to the exact operator") {
    val exact = CurationOps.contamination(docs, minShared = 1L).collect().toSet
    val bloom = CurationOps.contaminationBloom(docs, minShared = 1L).collect().toSet
    assert(exact.nonEmpty && bloom == exact)
  }

  test("longest shared span: a planted verbatim copy spans the whole document") {
    val base = docs.filter(col("doc_id") === 13)
    val nTok = base.select(size(split(col("text"), " ")).as("n")).collect()(0).getAs[Int]("n")
    val planted = docs.unionByName(base.withColumn("doc_id", lit(99913L)))
    val hit = graft.operators.DedupOps.pairLongestSpan(planted)
      .filter(col("da") === 13 && col("db") === 99913L)
      .collect()
    assert(hit.length == 1 && hit(0).getAs[Long]("longest_tokens") == nTok.toLong)
  }

  test("ivf probe-2: per-rank score dominates probe-1 (recall knob only adds candidates)") {
    val emb = Tables.embeddings(spark, sf)
    val p1 = AnnOps.ivfTopK(emb)
      .select(col("qid"), col("rnk"), col("cosine_e4").as("c1"))
    val p2 = AnnOps.ivfTopK(emb, nprobe = 2)
      .select(col("qid"), col("rnk"), col("cosine_e4").as("c2"))
    val joined = p1.join(p2, Seq("qid", "rnk")).cache()
    assert(joined.count() > 0)
    assert(joined.filter(col("c2") < col("c1")).count() == 0)
    joined.unpersist()
  }
}
