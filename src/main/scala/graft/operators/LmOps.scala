package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed n-gram language-model scoring beyond the bigram
  * [[CurationOps.bigramFluency]]: the stupid-backoff trigram model of
  * Brants et al. 2007 ("Large Language Models in Machine Translation"),
  * the LM designed FOR map-reduce-shaped engines — its score
  * S(w3|w1w2) = c123/c12, backing off to 0.4·c23/c2, then 0.4²·c3/N,
  * needs only raw count tables (no Kneser-Ney normalization passes), so
  * training is three map-side-combined `groupBy` counts and scoring is
  * five 1:1 left joins. That is exactly why it beat smoothed LMs at
  * 2-trillion-token scale in the paper, and why it fits Spark: no
  * iterative normalization, no per-context state, stop-word-headed key
  * skew is AQE skew-join territory.
  *
  * Fixed-point discipline matches the rest of the repo (the arithmetic
  * tradeoff documented at [[CurationOps.bigramFluency]]): every score is
  * a rational of two counts scaled to an exact integer (0.4·1e9 = 4e8 is
  * exact in binary floating point as is 0.16·1e9 = 1.6e8), so the DuckDB
  * oracle reproduces the engine bit-for-bit with no transcendentals.
  */
object LmOps {

  /** Fraction of md5 buckets (out of 100) that form the training split. */
  val TrainBuckets = 50L

  /** Stupid-backoff trigram scoring with a held-out split: the LM trains
    * on the deterministic md5-bucket half of the corpus (same split key
    * as [[CurationOps.splitAssign]]) and scores EVERY doc, so held-out
    * docs genuinely exercise the backoff ladder (training docs always
    * trigram-hit themselves — scoring only the train split would make
    * the backoff branches dead code). Output per doc: instance counts at
    * each backoff level (`n_tri`/`n_bi`/`n_uni` — the "how novel is this
    * doc vs the reference corpus" diagnostic) and the mean score
    * `backoff_e4`.
    *
    * Shape at 100 TB: the three count tables are one `groupBy` each over
    * the train token stream (map-side partial aggregation does the heavy
    * lifting; the paper's 2-T-token LM is the existence proof). Scoring
    * groups each doc's trigrams to DISTINCT-with-count first — the join
    * input is per-doc vocabulary, not per-token positions — then runs
    * five 1:1 left joins against the count tables. Docs under 3 tokens
    * have no trigram and are absent, as in [[CurationOps.bigramFluency]].
    */
  def trigramBackoff(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val toks = docs.select(
      col("doc_id"),
      (stableHash60(col("doc_id").cast("string")) % 100L < TrainBuckets).as("in_train"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    // One window pass yields unigram/bigram/trigram instances together;
    // cached because the train counts and the score side both read it.
    val inst = graft.Caching.maybeCache(
      toks
        .withColumn("t1", lead("tok", 1).over(w))
        .withColumn("t2", lead("tok", 2).over(w)))

    val uni = inst.filter(col("in_train"))
      .groupBy(col("tok").as("u")).agg(count(lit(1)).as("cu"))
    val bi = inst.filter(col("in_train") && col("t1").isNotNull)
      .groupBy(col("tok").as("ba"), col("t1").as("bb")).agg(count(lit(1)).as("cb"))
    val tri = inst.filter(col("in_train") && col("t2").isNotNull)
      .groupBy(col("tok").as("ta"), col("t1").as("tb"), col("t2").as("tc"))
      .agg(count(lit(1)).as("ct"))
    val n = inst.filter(col("in_train")).select(count(lit(1)).as("n"))

    val dist = inst.filter(col("t2").isNotNull)
      .groupBy(col("doc_id"), col("tok").as("w1"), col("t1").as("w2"), col("t2").as("w3"))
      .agg(count(lit(1)).as("cnt"))

    val joined = dist
      .join(tri, col("w1") === col("ta") && col("w2") === col("tb") && col("w3") === col("tc"), "left")
      .join(bi.as("ctx"), col("w1") === col("ctx.ba") && col("w2") === col("ctx.bb"), "left")
      .join(bi.as("b2"), col("w2") === col("b2.ba") && col("w3") === col("b2.bb"), "left")
      .join(uni.as("u2"), col("w2") === col("u2.u"), "left")
      .join(uni.as("u3"), col("w3") === col("u3.u"), "left")
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("cnt"),
        col("ct"), col("ctx.cb").as("c12"), col("b2.cb").as("c23"),
        col("u2.cu").as("c2"), col("u3.cu").as("c3"), col("n"))

    val sE9 =
      when(col("ct").isNotNull,
        floor(col("ct") / col("c12").cast("double") * 1000000000L + 0.5).cast("long"))
        .when(col("c23").isNotNull,
          floor(col("c23") * lit(400000000.0) / col("c2") + 0.5).cast("long"))
        .when(col("c3").isNotNull,
          floor(col("c3") * lit(160000000.0) / col("n") + 0.5).cast("long"))
        .otherwise(lit(0L))
    val lvl =
      when(col("ct").isNotNull, "tri")
        .when(col("c23").isNotNull, "bi")
        .when(col("c3").isNotNull, "uni")
        .otherwise("oov")

    joined
      .withColumn("s_e9", sE9).withColumn("lvl", lvl)
      .groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_trigrams"),
        sum(when(col("lvl") === "tri", col("cnt")).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === "bi", col("cnt")).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === "uni", col("cnt")).otherwise(0L)).as("n_uni"),
        sum(col("cnt") * col("s_e9")).as("s_sum_e9"))
      .select(
        col("doc_id"), col("n_trigrams"), col("n_tri"), col("n_bi"), col("n_uni"),
        floor(col("s_sum_e9").cast("double") / col("n_trigrams") / 100000L + 0.5)
          .cast("long").as("backoff_e4"))
  }
}

object LmPack extends graft.QueryPack {
  private def d(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "trigram_backoff" -> ((s, dir) => LmOps.trigramBackoff(d(s, dir)))
  )

  /** The split-bucket predicate, identical to the Spark side's
    * stableHash60(doc_id) % 100 < TrainBuckets. */
  private val InTrain =
    s"CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) % 100 AS BIGINT) < ${LmOps.TrainBuckets}"

  override def oracles: Map[String, String] = Map(
    "trigram_backoff" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $InTrain AS in_train, string_split(text, ' ') AS t FROM documents
         |),
         |inst AS (
         |  SELECT doc_id, in_train, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
         |  FROM toks, range(1, ${OracleLimits.MaxDocTokens}) r(i) WHERE i + 2 <= len(t)
         |),
         |uni AS (
         |  SELECT tok AS u, COUNT(*) AS cu
         |  FROM (SELECT unnest(t) AS tok FROM toks WHERE in_train) GROUP BY 1
         |),
         |bi AS (
         |  SELECT t[i] AS ba, t[i+1] AS bb, COUNT(*) AS cb
         |  FROM toks, range(1, ${OracleLimits.MaxDocTokens}) r(i)
         |  WHERE in_train AND i + 1 <= len(t) GROUP BY 1, 2
         |),
         |tri AS (
         |  SELECT w1 AS ta, w2 AS tb, w3 AS tc, COUNT(*) AS ct
         |  FROM inst WHERE in_train GROUP BY 1, 2, 3
         |),
         |n AS (SELECT SUM(len(t)) AS n FROM toks WHERE in_train),
         |dist AS (
         |  SELECT doc_id, w1, w2, w3, COUNT(*) AS cnt FROM inst GROUP BY 1, 2, 3, 4
         |),
         |j AS (
         |  SELECT d.doc_id, d.cnt, tri.ct, ctx.cb AS c12, b2.cb AS c23,
         |         u2.cu AS c2, u3.cu AS c3, n.n
         |  FROM dist d
         |  LEFT JOIN tri ON d.w1 = tri.ta AND d.w2 = tri.tb AND d.w3 = tri.tc
         |  LEFT JOIN bi ctx ON d.w1 = ctx.ba AND d.w2 = ctx.bb
         |  LEFT JOIN bi b2 ON d.w2 = b2.ba AND d.w3 = b2.bb
         |  LEFT JOIN uni u2 ON d.w2 = u2.u
         |  LEFT JOIN uni u3 ON d.w3 = u3.u, n
         |),
         |s AS (
         |  SELECT doc_id, cnt,
         |         CASE WHEN ct IS NOT NULL THEN CAST(FLOOR(ct / CAST(c12 AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
         |              WHEN c23 IS NOT NULL THEN CAST(FLOOR(c23 * 400000000.0 / c2 + 0.5) AS BIGINT)
         |              WHEN c3 IS NOT NULL THEN CAST(FLOOR(c3 * 160000000.0 / n + 0.5) AS BIGINT)
         |              ELSE 0 END AS s_e9,
         |         CASE WHEN ct IS NOT NULL THEN 'tri' WHEN c23 IS NOT NULL THEN 'bi'
         |              WHEN c3 IS NOT NULL THEN 'uni' ELSE 'oov' END AS lvl
         |  FROM j
         |)
         |SELECT doc_id,
         |       CAST(SUM(cnt) AS BIGINT) AS n_trigrams,
         |       CAST(SUM(CASE WHEN lvl = 'tri' THEN cnt ELSE 0 END) AS BIGINT) AS n_tri,
         |       CAST(SUM(CASE WHEN lvl = 'bi' THEN cnt ELSE 0 END) AS BIGINT) AS n_bi,
         |       CAST(SUM(CASE WHEN lvl = 'uni' THEN cnt ELSE 0 END) AS BIGINT) AS n_uni,
         |       CAST(FLOOR(CAST(SUM(cnt * s_e9) AS DOUBLE) / SUM(cnt) / 100000 + 0.5) AS BIGINT) AS backoff_e4
         |FROM s GROUP BY doc_id""".stripMargin
  )
}
