package graft.operators

import graft.QueryPack
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text analytics: term relevance ranking (a tf-idf-shaped
  * score kept in rational arithmetic so it is engine-exact — documented
  * deviation: idf is the raw N/df ratio, not its log) and the composite
  * clean-corpus pipeline (quality gate + exact-dup removal + language
  * agreement) that a C4-style preprocessing job runs as one dataflow.
  */
object TextRankOps {

  /** Top-k most distinctive terms per document:
    * score = (tf / doc_len) * (N / df), computed in a fixed double
    * expression tree over exact integers, ranked on the scaled int. */
  def termRelevance(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    // cached: df and the score join both read the term frequencies, and
    // doc length is a fold of tf (sum of per-token counts) — so the
    // corpus explode runs once, not three times
    val tf = graft.Caching.maybeCache(
      toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf")))
    val docLen = tf.groupBy("doc_id").agg(sum(col("tf")).as("len"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(docLen, "doc_id")
      .join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn(
        "score_e4",
        floor((col("tf") * lit(1.0) / col("len")) * (col("n_docs") * lit(1.0) / col("df")) * 10000 + 0.5)
          .cast("long"))
    val w = Window.partitionBy("doc_id").orderBy(col("score_e4").desc, col("token"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("doc_id", "token", "score_e4", "rnk")
  }

  /** The composite cleaning pass: keep documents that
    *  (1) have >= minTokens tokens,
    *  (2) are the canonical copy of their head-fingerprint group,
    *  (3) have agreeing predicted/labeled language (en-profile docs only
    *      count when prediction matches the label).
    * Survivors carry the quality fields downstream jobs key on. */
  def cleanCorpus(docs: DataFrame, minTokens: Int = 20): DataFrame = {
    val toks = tokens(col("text"))
    val keyed = docs.select(
      col("doc_id"), col("lang"),
      size(toks).as("n_tokens"),
      md5(array_join(slice(toks, 1, 5), " ")).as("dup_key"))
    val w = Window.partitionBy("dup_key")
    val canon = keyed
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("canonical_id"))
    val lang = TextOps.langId(docs).select(col("doc_id"), col("predicted_lang"), col("agree"))
    canon
      .join(lang, "doc_id")
      .filter(col("n_tokens") >= minTokens && col("agree"))
      .select("doc_id", "n_tokens", "predicted_lang")
  }

  /** First-touch dedup over the event stream (batch twin of
    * dropDuplicatesWithinWatermark): earliest event per (user, type). */
  def firstTouch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"),
        unix_micros(col("ts")).as("first_ts_us"))
  }
}

object TextRankPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "term_relevance" -> ((s, d) => TextRankOps.termRelevance(Tables.documents(s, d))),
    "clean_corpus" -> ((s, d) => TextRankOps.cleanCorpus(Tables.documents(s, d))),
    "first_touch" -> ((s, d) => TextRankOps.firstTouch(Tables.events(s, d)))
  )

  override def oracles: Map[String, String] = Map(
    "term_relevance" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
        |dl AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY doc_id),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token,
        |         CAST(FLOOR((tf.tf * CAST(1.0 AS DOUBLE) / dl.len)
        |                    * (n.n_docs * CAST(1.0 AS DOUBLE) / df.df) * 10000 + 0.5) AS BIGINT) AS score_e4
        |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id JOIN df ON tf.token = df.token CROSS JOIN n
        |),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_e4 DESC, token) AS rnk
        |  FROM scored
        |)
        |SELECT doc_id, token, score_e4, rnk FROM ranked WHERE rnk <= 3""".stripMargin,
    "clean_corpus" ->
      """WITH keyed AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |         md5(array_to_string((string_split(text, ' '))[1:5], ' ')) AS dup_key
        |  FROM documents
        |),
        |canon AS (
        |  SELECT * FROM (
        |    SELECT *, MIN(doc_id) OVER (PARTITION BY dup_key) AS canonical_id FROM keyed
        |  ) WHERE doc_id = canonical_id
        |),
        |t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |         CAST(len(list_filter(toks, x -> x IN ('the','and','of','to'))) AS INT) AS s_en,
        |         CAST(len(list_filter(toks, x -> x IN ('der','und','die','das'))) AS INT) AS s_de,
        |         CAST(len(list_filter(toks, x -> x IN ('le','et','les','une'))) AS INT) AS s_fr,
        |         CAST(len(list_filter(toks, x -> x IN ('el','los','las','que'))) AS INT) AS s_es
        |  FROM t
        |),
        |pred AS (
        |  SELECT doc_id,
        |         CASE WHEN s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
        |              WHEN s_de >= GREATEST(s_fr, s_es) THEN 'de'
        |              WHEN s_fr >= s_es THEN 'fr'
        |              ELSE 'es' END AS predicted_lang,
        |         labeled_lang
        |  FROM s
        |)
        |SELECT c.doc_id, c.n_tokens, p.predicted_lang
        |FROM canon c JOIN pred p ON c.doc_id = p.doc_id
        |WHERE c.n_tokens >= 20 AND p.predicted_lang = p.labeled_lang""".stripMargin,
    "first_touch" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events
        |)
        |SELECT user_id, event_type, event_id AS first_event_id, ts_us AS first_ts_us
        |FROM ranked WHERE rn = 1""".stripMargin
  )
}
