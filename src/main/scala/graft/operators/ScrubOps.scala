package graft.operators

import graft.QueryPack
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide repeated-span detection and removal — exact-substring
  * dedup in the style of "Deduplicating Training Data Makes Language
  * Models Better" (Lee et al., 2022), re-expressed as linear DataFrame
  * passes instead of a suffix array.
  *
  * A span of T >= [[SpanN]] tokens repeated across documents yields, in
  * every repeat, the same run of positional [[SpanN]]-gram hashes. So:
  * census the n-gram space for grams seen in >= `minDf` DISTINCT docs
  * ("hot" grams), mark every positional occurrence of a hot gram as a
  * covered interval `[pos, pos+n-1]`, and take the per-doc interval
  * UNION (gaps-and-islands sweep) — exactly the token set lying inside
  * some cross-doc repeated span.
  *
  * Unlike the pairwise family in [[DedupOps]] this never builds doc
  * PAIRS: the census is one x31 shuffle, the hit join is linear in gram
  * occurrences, and the interval sweep is a per-doc window — a hot gram
  * in a million docs costs a million rows, never a million². That is
  * what makes span-level dedup runnable on the full corpus at 100 TB
  * while `longest_span` (the pair-scoped twin) stays candidate-scoped.
  * No df cap is needed for safety (nothing squares); `minDf` is a
  * sensitivity knob, not a guard.
  *
  * Reference anchor: the repeated-content diagnostics the reference ships
  * per-table (api/analyzer row-value histograms) stop at whole-cell
  * granularity; span granularity is the training-data extension.
  *
  * == Exactness bound vs the suffix-array method ==
  *
  * Within its class the census is EXACT, not approximate: a token is
  * covered iff it lies inside some [[SpanN]]-token window that appears
  * verbatim in >= `minDf` DISTINCT docs. Both directions hold — every
  * qualifying repeat of length T >= [[SpanN]] yields T-[[SpanN]]+1 hot
  * windows whose union covers all T tokens (no false negatives), and
  * every hot window IS a cross-doc repeated span of exactly [[SpanN]]
  * tokens (no overcoverage beyond the class). What the fixed-n census
  * CANNOT see, and a corpus suffix array can:
  *
  *   1. '''Within-doc repeats.''' `df` counts DISTINCT docs, so a span
  *      repeated twice inside one doc (and nowhere else) is never hot.
  *      The suffix-array method deduplicates any substring occurring
  *      more than once in the corpus, including self-repeats. This is
  *      a deliberate scope choice (cross-doc contamination is the
  *      scrub target; within-doc repetition is [[CurationOps]]'s
  *      repetition signal), but it is a real divergence —
  *      ScrubAndIngestSpec constructs the miss.
  *   2. '''Repeats shorter than [[SpanN]] tokens.''' A 4-token span
  *      repeated a million times contributes nothing. The suffix-array
  *      method has the same length threshold (50 BPE tokens in Lee et
  *      al.), so this is parity at equal thresholds — but the
  *      threshold here is in WHITESPACE tokens, there in BPE tokens,
  *      so the two cuts differ on long words vs short ones.
  *   3. '''Sub-token granularity.''' Suffix arrays match raw bytes; a
  *      repeat that crosses token boundaries differently ("foo bar" vs
  *      "foobar"), or differs only in whitespace runs, matches there
  *      and not here (tokenization normalizes before hashing).
  *
  * Additionally, hot-gram identity is a [[graft.functions.TextFunctions
  * .stableHash31]] 31-bit hash, so distinct grams can collide
  * (~n_grams²/2³² expected false-hot pairs — overcoverage, never a
  * miss; negligible at fixture scale, bounded and one-sided at 100 TB).
  */
object ScrubOps {

  /** Span gram width: a repeat shorter than this many tokens is noise
    * (stopword runs), anything >= it is flagged. 5 tokens ~ the shortest
    * span worth scrubbing at fixture vocabulary size; production corpora
    * use 50 (the paper's setting) — pure knob, same plan. */
  val SpanN = 5

  /** Minimum DISTINCT-doc frequency for a gram to count as repeated. */
  val MinSpanDf = 2L

  /** Positional [[SpanN]]-grams: posexplode + 4 window leads (the
    * codegen-friendly shape [[DedupOps]] uses for trigrams — no
    * higher-order lambda on the hot path). One row per position, hash
    * folded to the shared 31-bit universe. */
  private def positionalGrams(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      .withColumn("t3", lead("tok", 3).over(w))
      .withColumn("t4", lead("tok", 4).over(w))
      .filter(col("t4").isNotNull)
      .select(col("doc_id"), col("pos"),
        stableHash31(concat_ws(" ",
          col("tok"), col("t1"), col("t2"), col("t3"), col("t4"))).as("x31"))
  }

  /** Cached gram frame: read twice per query (df census + hit join), and
    * shared between [[dupSpanCensus]] and [[spanScrub]] over the same
    * docs (CacheManager keys on the canonical plan). */
  private def grams(docs: DataFrame): DataFrame =
    graft.Caching.maybeCache(positionalGrams(docs))

  /** Grams in >= minDf distinct docs. Census over the DISTINCT
    * (doc, gram) frame — a gram repeated only WITHIN one doc is not
    * cross-doc duplication. */
  private def hotGrams(g: DataFrame, minDf: Long): DataFrame =
    g.select("doc_id", "x31").distinct()
      .groupBy("x31").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select("x31")

  /** Hot-gram occurrences as covered intervals [pos, pend]. The join
    * shuffles on x31 — the same key the census aggregated on, so the
    * exchange is reused; no broadcast hint (the hot set is census-sized
    * and AQE broadcasts it at runtime when it fits). */
  private def hotHits(docs: DataFrame, minDf: Long): DataFrame = {
    val g = grams(docs)
    g.join(hotGrams(g, minDf), Seq("x31"))
      .select(col("doc_id"), col("pos"), (col("pos") + SpanN - 1).as("pend"))
  }

  /** Per-doc duplicate-span census: how many tokens sit inside some
    * cross-doc repeated span. Interval union via one gaps-and-islands
    * window sweep per doc (sorted starts; island break when a start
    * clears the running max end) — per-doc state, never a global sort. */
  def dupSpanCensus(docs: DataFrame, minDf: Long = MinSpanDf): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sweep = hotHits(docs, minDf)
      .withColumn("prev_end",
        max(col("pend")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_end").isNull || col("pos") > col("prev_end"), 1).otherwise(0))
      .withColumn("island",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val cov = sweep
      .groupBy("doc_id", "island")
      .agg((max(col("pend")) - min(col("pos")) + 1).as("ilen"))
      .groupBy("doc_id")
      .agg(sum(col("ilen")).as("covered_tokens"), count(lit(1)).as("n_islands"))
    docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        floor(coalesce(col("covered_tokens"), lit(0L)) * 10000.0 / col("n_tokens") + 0.5)
          .cast("long").as("dup_frac_e4"))
  }

  /** The scrubbed corpus: each doc with every token inside a repeated
    * span removed, fingerprinted (md5) so the result row stays small.
    * Covered token indices come from exploding each hot hit into its
    * n positions — a ×[[SpanN]] blowup bounded to hot OCCURRENCES only,
    * not the corpus. Reassembly is one doc_id shuffle (sort-collect of
    * the kept positions). */
  def spanScrub(docs: DataFrame, minDf: Long = MinSpanDf): DataFrame = {
    val covered = hotHits(docs, minDf)
      .select(col("doc_id"), explode(sequence(col("pos"), col("pend"))).as("idx"))
      .distinct()
    val posed = docs.select(
      col("doc_id"), posexplode(tokens(col("text"))).as(Seq("idx", "tok")))
    val kept = posed
      .join(covered, Seq("doc_id", "idx"), "left_anti")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("idx"), col("tok")))).as("kt"))
      .select(col("doc_id"),
        size(col("kt")).cast("long").as("kept_tokens"),
        array_join(transform(col("kt"), e => e.getField("tok")), " ").as("scrubbed"))
    docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        md5(coalesce(col("scrubbed"), lit(""))).as("scrub_md5"))
  }
}

object ScrubPack extends QueryPack {
  private def d(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dup_spans" -> ((s, dir) => ScrubOps.dupSpanCensus(d(s, dir))),
    "span_scrub" -> ((s, dir) => ScrubOps.spanScrub(d(s, dir)))
  )

  /** Shared oracle CTEs: positional 5-grams + the hot census. */
  private val gramSql: String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |shp AS (
       |  SELECT doc_id, i AS pos,
       |         CAST(CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]), 18, 15)) AS UBIGINT)
       |              % 2147483647 AS BIGINT) AS x31
       |  FROM toks, range(1, ${OracleLimits.MaxDocTokens}) r(i)
       |  WHERE i + 4 <= len(t)
       |),
       |hot AS (
       |  SELECT x31 FROM (
       |    SELECT x31, COUNT(DISTINCT doc_id) AS df FROM shp GROUP BY x31
       |  ) WHERE df >= ${ScrubOps.MinSpanDf}
       |),
       |hits AS (SELECT doc_id, pos, pos + 4 AS pend FROM shp JOIN hot USING (x31))""".stripMargin

  override def oracles: Map[String, String] = Map(
    // interval union per doc: gaps-and-islands over sorted starts
    "dup_spans" ->
      s"""WITH $gramSql,
         |sweep AS (
         |  SELECT doc_id, pos, pend,
         |         MAX(pend) OVER (PARTITION BY doc_id ORDER BY pos
         |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM hits
         |),
         |isl AS (
         |  SELECT doc_id, pos, pend,
         |         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY pos
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM sweep
         |),
         |islands AS (
         |  SELECT doc_id, island, MAX(pend) - MIN(pos) + 1 AS ilen
         |  FROM isl GROUP BY doc_id, island
         |),
         |cov AS (
         |  SELECT doc_id, CAST(SUM(ilen) AS BIGINT) AS covered_tokens,
         |         CAST(COUNT(*) AS BIGINT) AS n_islands
         |  FROM islands GROUP BY doc_id
         |)
         |SELECT d.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |       COALESCE(c.covered_tokens, 0) AS covered_tokens,
         |       COALESCE(c.n_islands, 0) AS n_islands,
         |       CAST(FLOOR(COALESCE(c.covered_tokens, 0) * 10000.0 / len(t.t) + 0.5) AS BIGINT) AS dup_frac_e4
         |FROM documents d
         |JOIN toks t ON d.doc_id = t.doc_id
         |LEFT JOIN cov c ON d.doc_id = c.doc_id""".stripMargin,
    "span_scrub" ->
      s"""WITH $gramSql,
         |covered AS (
         |  SELECT DISTINCT doc_id, pos + j AS idx
         |  FROM hits, range(0, ${ScrubOps.SpanN}) r(j)
         |),
         |posed AS (
         |  SELECT doc_id, i AS idx, t[i] AS tok
         |  FROM toks, range(1, ${OracleLimits.MaxDocTokens}) r(i)
         |  WHERE i <= len(t)
         |),
         |kept AS (
         |  SELECT p.doc_id,
         |         CAST(COUNT(*) AS BIGINT) AS kept_tokens,
         |         string_agg(p.tok, ' ' ORDER BY p.idx) AS scrubbed
         |  FROM posed p
         |  LEFT JOIN covered c ON p.doc_id = c.doc_id AND p.idx = c.idx
         |  WHERE c.doc_id IS NULL
         |  GROUP BY p.doc_id
         |)
         |SELECT d.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |       COALESCE(k.kept_tokens, 0) AS kept_tokens,
         |       md5(COALESCE(k.scrubbed, '')) AS scrub_md5
         |FROM documents d
         |JOIN toks t ON d.doc_id = t.doc_id
         |LEFT JOIN kept k ON d.doc_id = k.doc_id""".stripMargin
  )
}
