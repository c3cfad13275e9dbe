package graft

import graft.operators.{RetrievalOps, ScrubOps}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repeated-span scrub (ScrubOps) + incremental BM25 ingest
  * (RetrievalOps.bm25IngestTopK). */
class ScrubAndIngestSpec extends SparkSpec {

  private lazy val sp = spark
  private lazy val docs = Tables.documents(spark, sf).cache()

  /** Hand-built corpus: docs 1/2 share a 7-token span (guaranteed >= one
    * hot 5-gram run), doc 3 shares nothing, docs 4/5 are identical. */
  private lazy val tiny: DataFrame = {
    import sp.implicits._
    Seq(
      (1L, "aa bb cc dd ee ff gg xx yy zz"),
      (2L, "pp qq aa bb cc dd ee ff gg rr"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "dup dup2 dup3 dup4 dup5 dup6 tail7 tail8"),
      (5L, "dup dup2 dup3 dup4 dup5 dup6 tail7 tail8")
    ).toDF("doc_id", "text")
  }

  test("dupSpanCensus covers exactly the shared 7-token span on the tiny corpus") {
    val got = ScrubOps.dupSpanCensus(tiny).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((7L, 1L)), "doc 1: shared run of 7 tokens, one island")
    assert(got(2L) == ((7L, 1L)), "doc 2: same span, shifted position")
    assert(got(3L) == ((0L, 0L)), "doc 3: no cross-doc repeat")
    assert(got(4L)._1 == 8L && got(5L)._1 == 8L, "identical docs fully covered")
  }

  test("spanScrub drops exactly the covered tokens and keeps the rest in order") {
    import sp.implicits._
    val got = ScrubOps.spanScrub(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    // doc 1 keeps its 3-token tail, doc 2 its 2-token prefix + 1 tail
    assert(got(1L)._1 == 3L)
    assert(got(1L)._2 == tiny.sparkSession.range(1)
      .select(md5(lit("xx yy zz"))).head.getString(0))
    assert(got(2L)._1 == 3L)
    assert(got(3L)._1 == 10L, "untouched doc keeps everything")
    assert(got(4L)._1 == 0L && got(5L)._1 == 0L, "identical docs scrub to empty")
    assert(got(4L)._2 == spark.range(1).select(md5(lit(""))).head.getString(0))
  }

  test("census and scrub agree: kept_tokens == n_tokens - covered_tokens (fixture corpus)") {
    val cen = ScrubOps.dupSpanCensus(docs)
      .select(col("doc_id"), col("n_tokens"), col("covered_tokens"))
    val scr = ScrubOps.spanScrub(docs).select(col("doc_id"), col("kept_tokens"))
    val bad = cen.join(scr, "doc_id")
      .filter(col("kept_tokens") =!= col("n_tokens") - col("covered_tokens"))
    assert(bad.count() == 0)
  }

  test("raising minDf never increases span coverage (sensitivity is monotone)") {
    val loose = ScrubOps.dupSpanCensus(docs, minDf = 2L)
      .select(col("doc_id"), col("covered_tokens").as("c2"))
    val tight = ScrubOps.dupSpanCensus(docs, minDf = 5L)
      .select(col("doc_id"), col("covered_tokens").as("c5"))
    val bad = loose.join(tight, "doc_id").filter(col("c5") > col("c2"))
    assert(bad.count() == 0)
  }

  test("exactness bound: within-doc-only and sub-SpanN repeats are the documented misses") {
    import sp.implicits._
    // doc 10 repeats a 5-token span TWICE internally; no other doc shares
    // it -> df = 1 distinct doc, never hot: the constructed miss vs a
    // corpus suffix array (which flags any substring occurring twice).
    // docs 11/12 share the SAME span cross-doc -> fully covered (control:
    // the span itself is detectable, only the within-doc case is not).
    // docs 13/14 share a 4-token span (< SpanN) -> invisible at n = 5.
    val corpus = Seq(
      (10L, "s1 s2 s3 s4 s5 mid s1 s2 s3 s4 s5"),
      (11L, "left s1 s2 s3 s4 s5 right"),
      (12L, "s1 s2 s3 s4 s5 other tail"),
      (13L, "q1 q2 q3 q4 aaa bbb ccc ddd eee"),
      (14L, "fff q1 q2 q3 q4 ggg hhh iii jjj")
    ).toDF("doc_id", "text")
    val got = ScrubOps.dupSpanCensus(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the within-doc repeat in doc 10 IS covered here only because docs
    // 11/12 also carry the span; drop them and it vanishes:
    val solo = ScrubOps.dupSpanCensus(corpus.filter(col("doc_id") === 10L)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(solo(10L) == 0L, "within-doc-only repeat: df=1 distinct doc, missed by design")
    assert(got(11L) == 5L && got(12L) == 5L, "cross-doc control: the same span IS exact-covered")
    assert(got(13L) == 0L && got(14L) == 0L, "4-token repeat < SpanN: below the length threshold")
    // ... and intraDupCensus closes exactly that miss: the same solo doc's
    // two in-doc occurrences (2×5 tokens) are covered, while docs whose
    // repeats are only cross-doc stay at zero
    val intra = ScrubOps.intraDupCensus(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(intra(10L) == 10L, "within-doc repeat: both 5-token occurrences covered")
    assert(intra(11L) == 0L && intra(12L) == 0L && intra(13L) == 0L && intra(14L) == 0L,
      "cross-doc-only and sub-SpanN repeats are invisible to the intra census")
  }

  test("incremental BM25 equals the batch answer at every split fraction") {
    val batch = RetrievalOps.bm25TopK(docs).collect().toSet
    for (pct <- Seq(0L, 20L, 50L, 100L)) {
      val inc = RetrievalOps.bm25IngestTopK(docs, ingestPct = pct).collect().toSet
      assert(inc == batch, s"ingestPct=$pct diverged from batch BM25")
    }
  }
}
