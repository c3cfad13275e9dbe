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
  *      a deliberate scope split (cross-doc contamination is the scrub
  *      target) — ScrubAndIngestSpec constructs the miss, and
  *      [[ScrubOps.intraDupCensus]] is the operator that covers it:
  *      cross-doc census ∪ within-doc census = the suffix-array
  *      method's full token-aligned scope.
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

  /** The shared interval-union sweep: covered intervals [pos, pend] per
    * doc → (doc_id, n_tokens, covered_tokens, n_islands, dup_frac_e4)
    * via one gaps-and-islands window per doc (sorted starts; island
    * break when a start clears the running max end) — per-doc state,
    * never a global sort. Both census variants (cross-doc and
    * within-doc) differ only in which hits flow in. */
  private def coverageCensus(docs: DataFrame, hits: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sweep = hits
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

  /** Per-doc duplicate-span census: how many tokens sit inside some
    * cross-doc repeated span. */
  def dupSpanCensus(docs: DataFrame, minDf: Long = MinSpanDf): DataFrame =
    coverageCensus(docs, hotHits(docs, minDf))

  /** WITHIN-doc repeated-span census — the operator that closes the
    * exactness bound's miss #1: a [[SpanN]]-gram occurring >= 2 times at
    * different positions of the SAME doc marks all its occurrences as
    * covered (self-repetition: boilerplate, copy-paste loops, degenerate
    * generation). Together with [[dupSpanCensus]] this reaches the full
    * token-aligned scope of the suffix-array method: any substring of
    * >= [[SpanN]] tokens occurring twice anywhere in the corpus is
    * covered by one census or the other.
    *
    * Scale shape: the hot set is a (doc_id, x31) count — the SAME
    * shuffle key the hit join uses, so the exchange is reused; nothing
    * leaves its doc partition after the explode. Strictly lighter than
    * the cross-doc census (no corpus-wide df table at all). */
  def intraDupCensus(docs: DataFrame): DataFrame = {
    val g = grams(docs)
    val selfHot = g.groupBy("doc_id", "x31").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("doc_id", "x31")
    val hits = g.join(selfHot, Seq("doc_id", "x31"))
      .select(col("doc_id"), col("pos"), (col("pos") + SpanN - 1).as("pend"))
    coverageCensus(docs, hits)
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
    "span_scrub" -> ((s, dir) => ScrubOps.spanScrub(d(s, dir))),
    "intra_spans" -> ((s, dir) => ScrubOps.intraDupCensus(d(s, dir)))
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
         |LEFT JOIN kept k ON d.doc_id = k.doc_id""".stripMargin,
    // within-doc twin: hot = grams occurring >= 2 times in the SAME doc,
    // same interval-union sweep
    "intra_spans" ->
      s"""WITH $gramSql,
         |ihot AS (
         |  SELECT doc_id, x31 FROM (
         |    SELECT doc_id, x31, COUNT(*) AS c FROM shp GROUP BY doc_id, x31
         |  ) WHERE c >= 2
         |),
         |ihits AS (
         |  SELECT s.doc_id, s.pos, s.pos + 4 AS pend
         |  FROM shp s JOIN ihot h ON s.doc_id = h.doc_id AND s.x31 = h.x31
         |),
         |sweep AS (
         |  SELECT doc_id, pos, pend,
         |         MAX(pend) OVER (PARTITION BY doc_id ORDER BY pos
         |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM ihits
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
         |LEFT JOIN cov c ON d.doc_id = c.doc_id""".stripMargin
  )
}
