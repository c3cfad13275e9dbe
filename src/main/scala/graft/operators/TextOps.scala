package graft.operators

import graft.QueryPack
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline over the `documents` table:
  * token counting, quality scoring, n-gram language ID, fingerprinting.
  *
  * All four are per-row projections — embarrassingly parallel, no shuffle
  * at any scale; the only cost is the scan, so column pruning matters
  * (each op selects only text + id).
  */
object TextOps {

  val Stop = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** Whitespace token count + char count. */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      length(col("text")).as("n_chars"))

  /** Per-language token-length distribution (exact percentiles): the
    * corpus-audit view behind length-based quality cuts — pick the cut
    * per language, not globally, since languages tokenize differently.
    * One map-side-combinable aggregation; percentile state is per
    * (lang) group, never a global sort. */
  def langLengthStats(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), size(tokens(col("text"))).as("n_tokens"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        percentile(col("n_tokens"), lit(0.25)).as("p25_tokens"),
        percentile(col("n_tokens"), lit(0.5)).as("p50_tokens"),
        percentile(col("n_tokens"), lit(0.95)).as("p95_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  /** Quality scoring: stopword ratio, mean token length, composite score
    * (length/punct/stopword heuristics à la C4/Gopher quality filters).
    * `keep` carries extra input columns through (appended after the
    * metrics, so the default output is unchanged) — cheaper than a
    * doc_id re-join for callers that need e.g. `source` alongside the
    * score. */
  def quality(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val toks = tokens(col("text"))
    val n = size(toks)
    val stopHits = size(filter(toks, t => t.isInCollection(Stop)))
    val meanLen = (length(col("text")) - (n - 1)) / n
    val stopRatio = stopHits / n
    docs.select(
      Seq(
        col("doc_id"),
        n.as("n_tokens"),
        floor(stopRatio * 10000 + 0.5).cast("long").as("stop_ratio_e4"),
        floor(meanLen * 10000 + 0.5).cast("long").as("mean_tok_len_e4"),
        floor((stopRatio * 100.0 + meanLen) * 10000 + 0.5).cast("long").as("quality_e4")
      ) ++ keep.map(col): _*)
  }

  private val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to"),
    "de" -> Seq("der", "und", "die", "das"),
    "fr" -> Seq("le", "et", "les", "une"),
    "es" -> Seq("el", "los", "las", "que"))

  /** n-gram-profile language ID: count stopword hits per language profile,
    * argmax with a fixed precedence ladder. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = docs.select(
      col("doc_id") +: col("lang").as("labeled_lang") +:
        Profiles.map { case (l, ws) =>
          size(filter(toks, t => t.isInCollection(ws))).as(s"s_$l")
        }: _*)
    scored
      .withColumn(
        "predicted_lang",
        when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es")), "en")
          .when(col("s_de") >= greatest(col("s_fr"), col("s_es")), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
      .select(
        col("doc_id"),
        col("predicted_lang"),
        col("labeled_lang"),
        (col("predicted_lang") === col("labeled_lang")).as("agree"))
  }

  /** Document fingerprints: full-text md5, head-shingle md5 (first 5
    * tokens), and a short prefix for bucketing. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text")).as("fp"),
      md5(array_join(slice(tokens(col("text")), 1, 5), " ")).as("head_fp"),
      substring(md5(col("text")), 1, 8).as("fp_prefix"))

  /** Opt-in normalize-at-ingest: the corpus with `text` replaced by its
    * NFC form, every other column untouched. Compose this ONCE at the
    * head of a pipeline and every byte-keyed operator downstream —
    * [[graft.operators.DedupOps.exact]]'s md5 window keys,
    * [[fingerprint]], shingle postings, vocab counts, BM25 terms —
    * stops fragmenting on mixed canonical forms. Deliberately NOT the
    * default: the stock fixtures are ASCII and the existing oracles pin
    * raw bytes, so normalization stays a visible pipeline step (the
    * byte-exactness discipline of the reference's key comparisons —
    * api/merger/Merger.java:202 — applied at the right stage instead of
    * silently everywhere). Scan-local and codegen'd
    * ([[graft.functions.NormalizeNfc]] fast-paths already-normalized
    * strings), so the pass adds no shuffle and no UDF boundary. */
  def normalizeAtIngest(docs: DataFrame): DataFrame =
    docs.withColumn("text", graft.functions.NormalizeNfc.nfc(col("text")))

  /** Unicode NFC canonicalization over the corpus — the normalization
    * pass that must run BEFORE any byte-equality downstream (exact-dedup
    * md5 keys, shingles, vocab counts, BM25 terms): web text arrives in
    * mixed canonical forms, and `é` (U+00E9) vs `e`+U+0301 fragment every
    * hash-keyed operator until composed. The fixture text is ASCII, so
    * the query PLANTS mixed forms deterministically (decomposed on
    * doc_id%3==0, precomposed on ==1, untouched otherwise) and
    * normalizes through [[graft.functions.NormalizeNfc]] — a native
    * codegen'd Expression whose JVM normalizer and DuckDB's
    * `nfc_normalize` implement the same UAX #15 tables, so the oracle
    * pins the canonicalization byte-for-byte. `changed` marks docs whose
    * bytes moved (exactly the decomposed third). Scan-local, shuffle-free
    * — the 100-TB shape of any per-doc scrub. */
  def nfcNormalize(docs: DataFrame): DataFrame = {
    val suffix = when(col("doc_id") % 3 === 0, lit("e\u0301")) // decomposed: e + combining acute
      .when(col("doc_id") % 3 === 1, lit("\u00e9")) // precomposed
      .otherwise(lit(""))
    // staged selects (the mediaSniff discipline): the normalized string
    // materializes ONCE — `changed` referencing the nfc subtree directly
    // would re-run the normalizer per output column
    docs.select(col("doc_id"), concat(col("text"), suffix).as("mixed"))
      .select(col("doc_id"), col("mixed"),
        graft.functions.NormalizeNfc.nfc(col("mixed")).as("norm"))
      .select(col("doc_id"), col("norm"),
        (col("mixed") =!= col("norm")).as("changed"))
  }
}

object TextPack extends QueryPack {
  private def d(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "token_count" -> ((s, dir) => TextOps.tokenCount(d(s, dir))),
    "text_quality" -> ((s, dir) => TextOps.quality(d(s, dir))),
    "lang_id" -> ((s, dir) => TextOps.langId(d(s, dir))),
    "doc_fingerprint" -> ((s, dir) => TextOps.fingerprint(d(s, dir))),
    "lang_lengths" -> ((s, dir) => TextOps.langLengthStats(d(s, dir))),
    "nfc_norm" -> ((s, dir) => TextOps.nfcNormalize(d(s, dir)))
  )

  override def oracles: Map[String, String] = Map(
    // chr(769) = U+0301 combining acute (decomposed), chr(233) = U+00E9
    // (precomposed) — DuckDB's nfc_normalize and the JVM normalizer
    // implement the same UAX #15 tables, so the bytes must agree exactly
    "nfc_norm" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         text || CASE CAST(doc_id % 3 AS INT)
        |                   WHEN 0 THEN 'e' || chr(769)
        |                   WHEN 1 THEN chr(233)
        |                   ELSE '' END AS mixed
        |  FROM documents
        |)
        |SELECT doc_id, nfc_normalize(mixed) AS norm,
        |       mixed <> nfc_normalize(mixed) AS changed
        |FROM m""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |       CAST(length(text) AS INT) AS n_chars
        |FROM documents""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS toks
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS INT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on'))) AS INT) AS stop_hits,
        |         n_chars
        |  FROM t
        |)
        |SELECT doc_id, n_tokens,
        |       CAST(FLOOR((stop_hits / CAST(n_tokens AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS stop_ratio_e4,
        |       CAST(FLOOR(((n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS mean_tok_len_e4,
        |       CAST(FLOOR(((stop_hits / CAST(n_tokens AS DOUBLE)) * 100.0
        |                   + (n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS quality_e4
        |FROM m""".stripMargin,
    "lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |         CAST(len(list_filter(toks, x -> x IN ('the','and','of','to'))) AS INT) AS s_en,
        |         CAST(len(list_filter(toks, x -> x IN ('der','und','die','das'))) AS INT) AS s_de,
        |         CAST(len(list_filter(toks, x -> x IN ('le','et','les','une'))) AS INT) AS s_fr,
        |         CAST(len(list_filter(toks, x -> x IN ('el','los','las','que'))) AS INT) AS s_es
        |  FROM t
        |)
        |SELECT doc_id,
        |       CASE WHEN s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
        |            WHEN s_de >= GREATEST(s_fr, s_es) THEN 'de'
        |            WHEN s_fr >= s_es THEN 'fr'
        |            ELSE 'es' END AS predicted_lang,
        |       labeled_lang,
        |       (CASE WHEN s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
        |             WHEN s_de >= GREATEST(s_fr, s_es) THEN 'de'
        |             WHEN s_fr >= s_es THEN 'fr'
        |             ELSE 'es' END) = labeled_lang AS agree
        |FROM s""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
        |       md5(array_to_string((string_split(text, ' '))[1:5], ' ')) AS head_fp,
        |       substring(md5(text), 1, 8) AS fp_prefix
        |FROM documents""".stripMargin,
    "lang_lengths" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |       quantile_cont(len(string_split(text, ' ')), 0.25) AS p25_tokens,
        |       quantile_cont(len(string_split(text, ' ')), 0.5) AS p50_tokens,
        |       quantile_cont(len(string_split(text, ' ')), 0.95) AS p95_tokens,
        |       CAST(MAX(len(string_split(text, ' '))) AS INT) AS max_tokens
        |FROM documents GROUP BY lang""".stripMargin
  )
}
