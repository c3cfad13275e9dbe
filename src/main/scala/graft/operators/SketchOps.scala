package graft.operators

import graft.QueryPack
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketches — the mergeable
  * approximate-COUNT-DISTINCT primitive (Bar-Yossef et al. 2002; the
  * core of the theta sketch family): hash every distinct element to a
  * uniform 60-bit integer, keep the k SMALLEST hashes; if the kth
  * smallest lands at height h in a range of size M, the element count is
  * ≈ (k−1)·M/h. Two properties make it the sketch of choice here:
  *
  *   1. '''Mergeable by construction''': the sketch of a union is the k
  *      smallest of the concatenated sketches — per-partition sketches
  *      combine associatively (k rows per partition cross the wire, the
  *      distributed-COUNT-DISTINCT shape at 100 TB), and per-SOURCE
  *      sketches combine into union/intersection estimates without
  *      touching the corpus again.
  *   2. '''Deterministic, hence oracle-able''': the hash is the repo's
  *      md5-derived [[stableHash60]] and ranking is integer — unlike
  *      HLL (whose register layout is engine-private, so
  *      [[AnalyzerOps.sizePercentilesApprox]]'s HLL twin stays
  *      un-oracled), every value here is bit-exact in both engines.
  *
  * Exactness bound: distinct TOKENS are sketched through their 60-bit
  * hashes, so hash collisions collapse (≈ n²/2⁶¹ expected — sub-1 until
  * ~10⁹ distinct tokens) — identically in both engines. The estimate's
  * statistical error is ~1/√(k−2) (k = 64 → ~13%); the fixture queries
  * carry the exact count next to the estimate so the error is measured,
  * not asserted.
  *
  * Reference anchor: the reference's analyzer reports exact per-table
  * cardinalities from small scans (api/analyzer); sketches are what the
  * same reports run on when the table stops fitting a scan budget.
  */
object SketchOps {

  /** Default sketch size: ~13% standard error, 64 longs per sketch. */
  val KmvK = 64

  /** Hash range 2^60 as a double (exact: 2^60 < 2^63). */
  private val HashRange = 1152921504606846976.0

  /** Distinct 60-bit token hashes — the sketch input stream. Cached:
    * the sketch (k rows) and the exact-count audit column both read it. */
  private def tokenHashes(docs: DataFrame): DataFrame =
    graft.Caching.maybeCache(
      docs.select(explode(tokens(col("text"))).as("tok"))
        .distinct()
        .select(stableHash60(col("tok")).as("h"))
        .distinct())

  /** The k smallest values of `h` — two-phase (per-partition prune, then
    * the global k-row window), never a total order over the hash stream. */
  private def kSmallest(hashes: DataFrame, k: Int): DataFrame = {
    val perPart = Window.partitionBy(spark_partition_id()).orderBy(col("h"))
    hashes.withColumn("prnk", row_number().over(perPart))
      .filter(col("prnk") <= k).drop("prnk")
      .withColumn("rnk", row_number().over(Window.orderBy(col("h"))))
      .filter(col("rnk") <= k)
  }

  /** The KMV estimator as a column: exact when the sketch saturated
    * below k (it holds the whole universe), (k−1)·M/kth otherwise —
    * one fixed double expression, mirrored verbatim in the oracle. The
    * `kth = 0` guard (hash value zero became the kth smallest — a
    * 2^-60 event) keeps the engines aligned where an infinite quotient
    * would otherwise cast differently (Long.MaxValue vs a cast error);
    * falling back to kUsed is the conservative lower bound. */
  private def estimate(kUsed: org.apache.spark.sql.Column,
      kth: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    when(kUsed < k || kth === 0L, kUsed)
      .otherwise(floor(lit((k - 1).toDouble) * HashRange / kth + 0.5).cast("long"))

  /** One-row corpus vocabulary sketch: sketch estimate next to the exact
    * distinct-hash count and the signed error in e4 — the self-auditing
    * shape the recall evals use. */
  def kmvVocabSketch(docs: DataFrame, k: Int = KmvK): DataFrame = {
    val hashes = tokenHashes(docs)
    kSmallest(hashes, k)
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("kth_h60"))
      .crossJoin(broadcast(hashes.agg(count(lit(1)).as("n_exact"))))
      .select(
        col("k_used"), col("kth_h60"), col("n_exact"),
        estimate(col("k_used"), col("kth_h60"), k).as("est_distinct"))
      .withColumn("err_e4",
        when(col("n_exact") === 0, lit(0L))
          .otherwise(floor((col("est_distinct") - col("n_exact"))
            * 10000.0 / col("n_exact") + 0.5).cast("long")))
  }

  /** Cross-source vocabulary overlap from per-source sketches — the
    * sketch twin of [[DedupOps.sourceOverlap]]: per unordered source
    * pair, estimate |A|, |B|, |A∪B| (the k smallest of the two sketches
    * concatenated — the KMV union rule), and |A∩B| by
    * inclusion–exclusion, floored at 0. Everything after the per-source
    * sketch pass runs on |sources|·k rows; the corpus is read once.
    * Jaccard here is an ESTIMATE (quotient of estimates) — the exact
    * pairwise operator stays [[DedupOps.sourceOverlap]]; this is what
    * replaces it when |sources| or the corpus outgrows the pair joins. */
  def kmvSourceOverlap(docs: DataFrame, k: Int = KmvK): DataFrame = {
    val perSource = graft.Caching.maybeCache {
      val hashes = docs
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .distinct()
        .select(col("source"), stableHash60(col("tok")).as("h"))
        .distinct()
      val perPart = Window.partitionBy(col("source"), spark_partition_id())
        .orderBy(col("h"))
      hashes.withColumn("prnk", row_number().over(perPart))
        .filter(col("prnk") <= k).drop("prnk")
        .withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy(col("h"))))
        .filter(col("rnk") <= k)
        .select(col("source"), col("h"))
    }
    // every pair join below is sketch×sketch — |sources|·k rows a side,
    // independent of corpus size — so the inequality joins BROADCAST
    // (the repo's no-unhinted-cartesian rule; a plain `<` join would
    // otherwise plan a CartesianProduct)
    val sketchStats = perSource.groupBy("source")
      .agg(count(lit(1)).as("ku"), max(col("h")).as("kth"))
    val pairs = sketchStats.as("a").join(broadcast(sketchStats.as("b")),
      col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        estimate(col("a.ku"), col("a.kth"), k).as("est_a"),
        estimate(col("b.ku"), col("b.kth"), k).as("est_b"))
    // union sketch: k smallest of the two sketches' DISTINCT hashes —
    // ONE pair join emitting both sides' hashes (explode of a 2-array),
    // not two identical joins unioned: same rows, half the join work
    val unioned = perSource.as("pa").join(broadcast(perSource.as("pb")),
      col("pa.source") < col("pb.source"))
      .select(col("pa.source").as("src_a"), col("pb.source").as("src_b"),
        explode(array(col("pa.h"), col("pb.h"))).as("h"))
      .distinct()
    val wu = Window.partitionBy("src_a", "src_b").orderBy(col("h"))
    val unionStats = unioned.withColumn("rnk", row_number().over(wu))
      .filter(col("rnk") <= k)
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("ku"), max(col("h")).as("kth"))
      .select(col("src_a"), col("src_b"),
        estimate(col("ku"), col("kth"), k).as("est_union"))
    pairs.join(unionStats, Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)).as("est_inter"))
      .withColumn("jaccard_est_e4",
        when(col("est_union") === 0, lit(0L))
          .otherwise(floor(col("est_inter") * 10000.0 / col("est_union") + 0.5).cast("long")))
  }

  // --------------------------------------------------------------------
  // Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
  // point-FREQUENCY estimator completing the sketch family next to KMV's
  // distinct counts: depth d independent hash rows × width w counter
  // buckets; update adds 1 to one bucket per row, estimate is the MIN
  // over the d buckets a key hashes to. Always an OVERESTIMATE (other
  // keys only ever add), within ε·N (ε = e/w) with probability 1−(1/e)^d.
  // Mergeable by elementwise counter ADDITION (per-partition sketches
  // combine associatively — at most d·w counter rows cross the wire per
  // partition via the groupBy's map-side combine, whatever the corpus
  // size), and deterministic (md5-derived row hashes), hence oracle-able
  // bit-exact like KMV — unlike HLL/approx builtins.

  /** Default Count-Min shape: 4 rows × 256 buckets = 1024 counters
    * (~8 KB) — ε ≈ 1%, failure prob ≈ 2%. */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Row `i`'s bucket for a token: an independent md5-derived hash per
    * sketch row (the row index is mixed into the hash INPUT, so no
    * side-channel constant table — same trick as the minhash perms),
    * folded into [0, width). */
  private[graft] def cmsBucket(row: Int, tok: Column, width: Int): Column =
    stableHash60(concat_ws(":", lit(row), tok)) % width

  /** One (row_id, bucket) cell per input row per sketch row, appended to
    * the input's own columns — the sketch's update stream (occurrences
    * in) and the probe stream (distinct tokens in) both derive from this
    * ONE expression, so the bucket scheme cannot diverge between the
    * batch, audit, and stream paths. */
  private[graft] def cmsCells(toks: DataFrame, depth: Int, width: Int): DataFrame =
    toks.select(toks.columns.map(col).toSeq :+
      posexplode(array((0 until depth).map(i =>
        cmsBucket(i, col("tok"), width)): _*)).as(Seq("row_id", "bucket")): _*)

  /** The sketch itself: ≤ depth·width counter rows. One corpus pass; the
    * aggregation pre-combines to ≤ d·w cells per partition before the
    * (only) shuffle. */
  def cmsSketch(docs: DataFrame,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame =
    cmsCells(docs.select(explode(tokens(col("text"))).as("tok")), depth, width)
      .groupBy("row_id", "bucket").agg(count(lit(1)).as("cnt"))

  /** Self-auditing point-frequency estimates: per distinct token, the
    * CMS estimate (min over its d buckets, probed by joining the
    * BROADCAST d·w-row sketch) next to the exact count and the signed
    * overestimate in e4 — the [[kmvVocabSketch]] audit shape. The exact
    * column is the EVAL's doing (a vocab-sized groupBy); the production
    * shape at 100 TB keeps only [[cmsSketch]] and probes it, which is
    * the point of the sketch.
    *
    * The audit derives its sketch FROM the per-token exact counts it
    * must compute anyway (counter = Σ n_exact of the tokens in the
    * bucket — bit-identical to streaming occurrences, because CMS
    * counters are linear in per-token occurrence counts), so the corpus
    * is read once and the cell explode runs on the vocab, not the
    * occurrence stream. */
  def cmsFreqAudit(docs: DataFrame,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    val tokCounts = graft.Caching.maybeCache(
      docs.select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n_exact")))
    val cells = cmsCells(tokCounts, depth, width)
    val sketch = cells.groupBy("row_id", "bucket").agg(sum(col("n_exact")).as("cnt"))
    cells.join(broadcast(sketch), Seq("row_id", "bucket"))
      .groupBy("tok", "n_exact").agg(min(col("cnt")).as("est_count"))
      .select(col("tok"), col("n_exact"), col("est_count"),
        floor((col("est_count") - col("n_exact")) * 10000.0 / col("n_exact") + 0.5)
          .cast("long").as("over_e4"))
  }

  /** φ-heavy hitters SERVED FROM the sketch — the production CMS
    * use-case (Cormode & Muthukrishnan §4): probe each candidate token
    * against the broadcast sketch and keep those whose estimate clears
    * φ·N total occurrences. CMS's one-sided error means NO FALSE
    * NEGATIVES — a truly heavy token estimates ≥ its true count ≥ φ·N,
    * so it always survives — while false positives are bounded by the
    * ε·N overcount; `is_heavy` audits which survivors are truly heavy
    * (integer-exact threshold arithmetic on both sides, so the oracle
    * agrees bit-for-bit). Candidates here are the corpus vocab; at
    * 100 TB the candidate set is whatever bounded key universe the
    * caller probes (the sketch answers any key without having stored
    * per-key state). */
  def cmsHeavyHitters(docs: DataFrame, phiE4: Long = 300L,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    // the audit frame is vocab-sized and read twice here (the total and
    // the survivors), so it gets its own materialization — without it
    // the probe join and min-aggregation run once per consumer
    val audit = graft.Caching.maybeCache(cmsFreqAudit(docs, depth, width))
    val total = audit.agg(sum(col("n_exact")).as("n_total"))
    audit.crossJoin(broadcast(total))
      .filter(col("est_count") * 10000L >= lit(phiE4) * col("n_total"))
      .select(col("tok"), col("n_exact"), col("est_count"), col("n_total"),
        (col("n_exact") * 10000L >= lit(phiE4) * col("n_total")).as("is_heavy"))
  }
}

object SketchPack extends QueryPack {
  private def d(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmv_vocab" -> ((s, dir) => SketchOps.kmvVocabSketch(d(s, dir))),
    "kmv_overlap" -> ((s, dir) => SketchOps.kmvSourceOverlap(d(s, dir))),
    // k = 8 sits BELOW the fixture vocabulary (31 distinct tokens at
    // every sf), so these twins drive the ESTIMATOR branch — the k = 64
    // defaults saturate on the fixtures and only prove the exact mode
    "kmv_vocab8" -> ((s, dir) => SketchOps.kmvVocabSketch(d(s, dir), k = 8)),
    "kmv_overlap8" -> ((s, dir) => SketchOps.kmvSourceOverlap(d(s, dir), k = 8)),
    "cms_freq" -> ((s, dir) => SketchOps.cmsFreqAudit(d(s, dir))),
    // width = 4 forces bucket collisions on the ~31-token fixture vocab,
    // driving the OVERESTIMATE branch the 4×256 default never hits there
    // (the kmv_vocab8 pattern: the non-default twin exercises the
    // estimator, the default proves the clean mode)
    "cms_freq_w4" -> ((s, dir) => SketchOps.cmsFreqAudit(d(s, dir), width = 4)),
    "cms_heavy" -> ((s, dir) => SketchOps.cmsHeavyHitters(d(s, dir))),
    // at width 4 every counter holds ~N/4, so ALL candidates clear the
    // 3% bar and is_heavy separates true hitters from the sketch's
    // (bounded, one-sided) false positives — the FP path under the oracle
    "cms_heavy_w4" -> ((s, dir) => SketchOps.cmsHeavyHitters(d(s, dir), width = 4))
  )

  private val M = "1152921504606846976.0"

  /** The estimator expression over (ku, kth) columns — mirrors
    * [[SketchOps.estimate]] operation for operation. */
  private def estSql(k: Int)(ku: String, kth: String): String =
    s"CASE WHEN $ku < $k OR $kth = 0 THEN $ku ELSE CAST(FLOOR(${k - 1}.0 * $M / $kth + 0.5) AS BIGINT) END"

  override def oracles: Map[String, String] = Map(
    "kmv_vocab" -> kmvVocabSql(SketchOps.KmvK),
    "kmv_vocab8" -> kmvVocabSql(8),
    "kmv_overlap" -> kmvOverlapSql(SketchOps.KmvK),
    "kmv_overlap8" -> kmvOverlapSql(8),
    "cms_freq" -> cmsFreqSql(SketchOps.CmsDepth, SketchOps.CmsWidth),
    "cms_freq_w4" -> cmsFreqSql(SketchOps.CmsDepth, 4),
    "cms_heavy" -> cmsHeavySql(SketchOps.CmsDepth, SketchOps.CmsWidth, 300L),
    "cms_heavy_w4" -> cmsHeavySql(SketchOps.CmsDepth, 4, 300L)
  )

  /** [[cmsFreqSql]] plus the φ·N threshold filter and the is_heavy
    * audit — integer arithmetic only, mirroring
    * [[SketchOps.cmsHeavyHitters]]. */
  private def cmsHeavySql(depth: Int, width: Int, phiE4: Long): String =
    s"""WITH est AS (${cmsFreqSql(depth, width)}),
       |tot AS (SELECT CAST(SUM(n_exact) AS BIGINT) AS n_total FROM est)
       |SELECT e.tok, e.n_exact, e.est_count, t.n_total,
       |       e.n_exact * 10000 >= $phiE4 * t.n_total AS is_heavy
       |FROM est e CROSS JOIN tot t
       |WHERE e.est_count * 10000 >= $phiE4 * t.n_total""".stripMargin

  /** Mirrors [[SketchOps.cmsFreqAudit]]: same md5-derived row hash
    * (`md5(row_id || ':' || tok)` ≡ Spark's `concat_ws(":", ...)`), same
    * bucket fold, same min-over-rows estimate. */
  private def cmsFreqSql(depth: Int, width: Int): String =
    s"""WITH occ AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |rws AS (SELECT unnest(range($depth)) AS row_id),
       |cells AS (
       |  SELECT r.row_id,
       |         CAST(CAST(('0x' || substring(md5(r.row_id || ':' || o.tok), 18, 15)) AS UBIGINT) AS BIGINT) % $width AS bucket
       |  FROM occ o CROSS JOIN rws r
       |),
       |sketch AS (SELECT row_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM cells GROUP BY row_id, bucket),
       |probes AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM occ GROUP BY tok),
       |pb AS (
       |  SELECT p.tok, p.n_exact, r.row_id,
       |         CAST(CAST(('0x' || substring(md5(r.row_id || ':' || p.tok), 18, 15)) AS UBIGINT) AS BIGINT) % $width AS bucket
       |  FROM probes p CROSS JOIN rws r
       |),
       |est AS (
       |  SELECT pb.tok, pb.n_exact, MIN(s.cnt) AS est_count
       |  FROM pb JOIN sketch s ON pb.row_id = s.row_id AND pb.bucket = s.bucket
       |  GROUP BY pb.tok, pb.n_exact
       |)
       |SELECT tok, n_exact, est_count,
       |       CAST(FLOOR((est_count - n_exact) * 10000.0 / n_exact + 0.5) AS BIGINT) AS over_e4
       |FROM est""".stripMargin

  private def kmvVocabSql(K: Int): String = {
    def estSql(ku: String, kth: String): String = SketchPack.estSql(K)(ku, kth)
      s"""WITH tk AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents),
         |h AS (SELECT DISTINCT CAST(CAST(('0x' || substring(md5(tok), 18, 15)) AS UBIGINT) AS BIGINT) AS h FROM tk),
         |kept AS (
         |  SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rnk FROM h) WHERE rnk <= $K
         |),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used, MAX(h) AS kth_h60 FROM kept),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM h),
         |est AS (
         |  SELECT k_used, kth_h60, n_exact,
         |         ${estSql("k_used", "kth_h60")} AS est_distinct
         |  FROM agg, tot
         |)
         |SELECT k_used, kth_h60, n_exact, est_distinct,
         |       CASE WHEN n_exact = 0 THEN 0
         |            ELSE CAST(FLOOR((est_distinct - n_exact) * 10000.0 / n_exact + 0.5) AS BIGINT)
         |       END AS err_e4
         |FROM est""".stripMargin
  }

  private def kmvOverlapSql(K: Int): String = {
    def estSql(ku: String, kth: String): String = SketchPack.estSql(K)(ku, kth)
      s"""WITH tk AS (
         |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok FROM documents
         |),
         |h AS (
         |  SELECT DISTINCT source,
         |         CAST(CAST(('0x' || substring(md5(tok), 18, 15)) AS UBIGINT) AS BIGINT) AS h
         |  FROM tk
         |),
         |sk AS (
         |  SELECT source, h FROM (
         |    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rnk FROM h
         |  ) WHERE rnk <= $K
         |),
         |st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ku, MAX(h) AS kth FROM sk GROUP BY source),
         |pairs AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         ${estSql("a.ku", "a.kth")} AS est_a,
         |         ${estSql("b.ku", "b.kth")} AS est_b
         |  FROM st a JOIN st b ON a.source < b.source
         |),
         |uni AS (
         |  SELECT DISTINCT pa.source AS src_a, pb.source AS src_b, x.h
         |  FROM sk pa JOIN sk pb ON pa.source < pb.source,
         |       LATERAL (SELECT pa.h AS h UNION SELECT pb.h) x
         |),
         |us AS (
         |  SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS ku, MAX(h) AS kth FROM (
         |    SELECT src_a, src_b, h,
         |           ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rnk
         |    FROM uni
         |  ) WHERE rnk <= $K GROUP BY src_a, src_b
         |),
         |ue AS (SELECT src_a, src_b, ${estSql("ku", "kth")} AS est_union FROM us),
         |fin AS (
         |  SELECT p.src_a, p.src_b, p.est_a, p.est_b, ue.est_union,
         |         GREATEST(p.est_a + p.est_b - ue.est_union, 0) AS est_inter
         |  FROM pairs p JOIN ue ON p.src_a = ue.src_a AND p.src_b = ue.src_b
         |)
         |SELECT src_a, src_b, est_a, est_b, est_union, est_inter,
         |       CASE WHEN est_union = 0 THEN 0
         |            ELSE CAST(FLOOR(est_inter * 10000.0 / est_union + 0.5) AS BIGINT)
         |       END AS jaccard_est_e4
         |FROM fin""".stripMargin
  }
}
