package graft.operators

import graft.QueryPack
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for a training-data pipeline over
  * `documents`: benchmark-contamination detection, deterministic
  * stratified sampling, and two repetition-quality signals (top-token
  * ratio, duplicate-bigram fraction — the Gopher-style repetition
  * filters).
  *
  * Scale design: contamination joins the corpus postings against a
  * benchmark posting set that is orders of magnitude smaller (a benchmark
  * suite, not a corpus) — broadcast the benchmark side, one shuffle-free
  * pass over the corpus postings. Sampling and the repetition signals are
  * per-row / per-doc single-aggregation patterns with map-side partials.
  */
object CurationOps {

  /** Deterministic "benchmark" membership for the fixtures: doc_id % 97
    * == 13 (~1% of docs). A real deployment passes its own benchmark doc
    * set to the `benchDocs` knobs below (a real benchmark table's doc
    * ids, not a modulus) — oracled non-default as `contam_src`;
    * everything downstream only sees a (doc_id, shingle) relation. */
  val BenchMod = 97L
  val BenchRem = 13L

  /** The fixture-default membership predicate (used when no benchmark
    * doc set is passed). */
  def benchPredicate: org.apache.spark.sql.Column =
    col("doc_id") % BenchMod === BenchRem

  /** (benchmark postings, candidate postings): split by the external
    * benchmark doc set when given — a broadcast semi/anti-join on
    * doc_id, since a benchmark suite is orders of magnitude smaller
    * than the corpus — else by the fixture modulus predicate. */
  private def splitPostings(
      docs: DataFrame, benchDocs: Option[DataFrame]): (DataFrame, DataFrame) = {
    val postings = DedupOps.shinglePostings(docs)
    benchDocs match {
      case None =>
        (postings.filter(benchPredicate), postings.filter(!benchPredicate))
      case Some(b) =>
        val ids = broadcast(b.select(col("doc_id")).distinct())
        (postings.join(ids, Seq("doc_id"), "left_semi"),
          postings.join(ids, Seq("doc_id"), "left_anti"))
    }
  }

  /** Benchmark contamination: for every non-benchmark doc, how many
    * distinct 3-gram shingles it shares with the benchmark set and how
    * many benchmark docs it touches; flagged above `minShared`.
    * The n-gram-overlap decontamination check run before training.
    * `benchDocs` is the production knob: the benchmark suite's doc ids
    * as a DataFrame (any frame with a doc_id column). */
  def contamination(
      docs: DataFrame, minShared: Long = 2L,
      benchDocs: Option[DataFrame] = None): DataFrame = {
    val (benchP, candidates) = splitPostings(docs, benchDocs)
    val bench = benchP.select(col("x31"), col("doc_id").as("bench_id"))
    candidates
      .join(broadcast(bench), "x31")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("x31")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_shared_shingles") >= minShared)
  }

  /** The offline benchmark shingle SET (distinct x31) the streaming
    * decontamination gate joins against — the benchmark side of
    * [[contamination]] reduced to its shingle universe, cached (it is
    * the static side of every stream-static join downstream, KB-MB for
    * millions of benchmark shingles). Deliberately a set, not the
    * (x31, bench_id) relation: the gate's keep/drop decision needs the
    * distinct shared-shingle count only, which streaming can take as a
    * plain count over the already-distinct row shingles — the forensic
    * n_bench_docs column stays a batch-report concern
    * ([[contamination]]). */
  def benchmarkShingleSet(
      docs: DataFrame, benchDocs: Option[DataFrame] = None): DataFrame =
    graft.Caching.maybeCache(
      splitPostings(docs, benchDocs)._1
        .select(col("x31"))
        .distinct())

  /** Bloom-prefiltered contamination: identical output to
    * [[contamination]], different 100-TB shape. A Bloom sketch of the
    * benchmark shingle set (KB-MB for millions of shingles) is built
    * once and broadcast; the corpus postings drop non-matching rows
    * map-side BEFORE any join, so the exact verification join only ever
    * sees probable hits (~fpp of the corpus instead of all of it).
    * False positives are eliminated by the exact join — the sketch only
    * prunes, it never decides — which is why the DuckDB oracle is the
    * same as the exact operator's.
    *
    * EAGER: building the sketch runs one Spark job over the benchmark
    * postings at call time (a Bloom filter is an aggregation result, not
    * a plan node) — unlike the rest of the API, this is not fully lazy.
    * The sketch is sized from `expectedItems` (a capacity estimate the
    * caller owns, like any Bloom deployment) rather than a separate
    * count() job. Sizing moves pruning power only, never correctness:
    * oversizing costs sketch bytes; UNDERsizing saturates the filter
    * (false-positive rate → 1) and silently degrades this operator to
    * the unfiltered exact join plus probe overhead — size for the real
    * benchmark shingle cardinality, not the default. */
  def contaminationBloom(
      docs: DataFrame,
      minShared: Long = 2L,
      fpp: Double = 0.01,
      expectedItems: Long = 1L << 20,
      benchDocs: Option[DataFrame] = None): DataFrame = {
    val (benchP, candidates) = splitPostings(docs, benchDocs)
    val bench = benchP.select(col("x31"), col("doc_id").as("bench_id"))
    val bloom = bench.stat.bloomFilter("x31", expectedItems, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((x: Long) => bc.value.mightContainLong(x))
    candidates
      .filter(mightContain(col("x31")))
      .join(broadcast(bench), "x31")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("x31")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .filter(col("n_shared_shingles") >= minShared)
  }

  /** Per-stratum sampling rates (percent kept), keyed on `lang`. */
  val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 5, "zh" -> 10, "de" -> 25, "fr" -> 50, "es" -> 75)

  /** Deterministic stratified sampling: an md5-derived bucket in [0,100)
    * per doc, kept iff bucket < rate(lang). Reproducible across runs and
    * engines (no RNG state), embarrassingly parallel, and the bucket
    * column doubles as the holdout split key. */
  def stratifiedSample(docs: DataFrame): DataFrame = {
    val bucket = (stableHash60(col("doc_id").cast("string")) % 100L).as("bucket")
    val rate = SampleRates
      .foldRight(lit(100): org.apache.spark.sql.Column) { case ((l, r), acc) =>
        when(col("lang") === l, lit(r)).otherwise(acc)
      }
    docs
      .select(col("doc_id"), col("lang"), bucket, rate.as("rate"))
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"), col("bucket"))
  }

  /** Systematic PPS (probability-proportional-to-size) sample — the
    * WEIGHTED companion of [[stratifiedSample]]: docs are selected with
    * probability proportional to their token count, deterministically.
    * The classic systematic estimator: lay the docs along a line in a
    * stable pseudo-random order (md5 priority), each occupying a segment
    * equal to its weight; drop pins at every multiple of
    * step = totalTokens DIV k; a doc is selected iff a pin lands in its
    * segment, with `n_hits` as its multiplicity (a doc heavier than the
    * step straddles several pins — the calibration weight a resampling
    * consumer divides by). All arithmetic is integral, so the selection
    * is engine-exact; k is the target sample size (selected docs ≈ k,
    * fewer when heavy docs absorb several pins).
    *
    * Scale shape (100 TB): the global cumulative weight is a DISTRIBUTED
    * prefix sum — the [[DataLayoutOps.sortBounds]] rank construction
    * applied to weights: a range shuffle on the priority order, a
    * per-partition running sum, and a broadcast prefix-offset census
    * (one row per shuffle partition). The only unpartitioned window runs
    * over that census (≤ shuffle-partitions rows, plan-gated); no task
    * ever holds the corpus, and the pin test is per-row arithmetic.
    *
    * Cache note: the shuffled frame is pinned through
    * [[graft.Caching.pinForConsistency]] (the sortBounds discipline —
    * correctness, not performance): repartitionByRange samples its
    * boundaries per instantiation, and the prefix assembly reads the
    * frame three times (local sums, offsets, total); all three must see
    * ONE materialization. Cached when the session allows (released by
    * Caching.release); an eager GC-released localCheckpoint when it
    * does not, so no-cache scale runs pay — and measure — the
    * materialization per call instead of timing a cache re-read. The
    * pinned frame is slim (doc_id, w, pri per doc). */
  def ppsSample(docs: DataFrame, k: Long = 200L): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    val weighted = docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("w"),
      stableHash60(col("doc_id").cast("string")).as("pri"))
    val sortCols = Seq(col("pri"), col("doc_id"))
    val parts = graft.Caching.pinForConsistency(
      weighted.repartitionByRange(sortCols: _*)
        .withColumn("pid", spark_partition_id()))
    val wLocal = Window.partitionBy("pid").orderBy(sortCols.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn("lc", sum(col("w")).over(wLocal))
    val wOff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // one census pass carries BOTH the prefix offsets and the corpus
    // total (a second unpartitioned window over the same ≤partitions
    // rows) — deriving the total from the census instead of a third
    // full aggregation over the cached corpus-sized frame
    val offsets = parts.groupBy("pid").agg(sum(col("w")).as("pw"))
      .withColumn("off", coalesce(sum(col("pw")).over(wOff), lit(0L)))
      .withColumn("total", sum(col("pw")).over(wAll))
      .select(col("pid"), col("off"), col("total"))
    local
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("cum", col("off") + col("lc"))
      .withColumn("step", greatest(expr(s"total DIV ${k}L"), lit(1L)))
      .withColumn("n_hits", expr("cum DIV step - (cum - w) DIV step"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("w"), col("cum"), col("n_hits"))
  }

  /** Per-source PPS sample — [[ppsSample]]'s GROUPED twin (the
    * len_quantiles_user discipline): every source gets its own pin line
    * with its own step = sourceTokens DIV kPerSource, so each source
    * lands ≈ kPerSource docs regardless of its share of the corpus (the
    * per-source quota shape [[sourceCaps]] enforces by count, here by
    * token mass). SHUFFLED throughout — the range shuffle orders by
    * (source, pri, id), per-row running sums partition by (source, pid),
    * and the census offset/total windows partition BY SOURCE: unlike the
    * corpus-wide twin there is NO unpartitioned window anywhere
    * (plan-gated), so group count can grow with the corpus freely. The
    * census itself is |sources|·|partitions| rows and is BROADCAST into
    * the stitch join — right for a bounded source dimension (the
    * [[sourceCaps]] contract); for a user-grade group key swap the
    * broadcast for a plain (group, pid) join and pay the shuffle. */
  def ppsSampleBySource(docs: DataFrame, kPerSource: Long = 50L): DataFrame = {
    require(kPerSource > 0, s"per-source sample size must be positive, got $kPerSource")
    val weighted = docs.select(
      col("source"), col("doc_id"),
      size(tokens(col("text"))).cast("long").as("w"),
      stableHash60(col("doc_id").cast("string")).as("pri"))
    val sortCols = Seq(col("source"), col("pri"), col("doc_id"))
    // pinned (cache or eager checkpoint): the sortBounds/ppsSample
    // discipline — three census reads, ONE range-shuffle instantiation
    val parts = graft.Caching.pinForConsistency(
      weighted.repartitionByRange(sortCols: _*)
        .withColumn("pid", spark_partition_id()))
    val wLocal = Window.partitionBy("source", "pid")
      .orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parts.withColumn("lc", sum(col("w")).over(wLocal))
    val wOff = Window.partitionBy("source").orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("source").orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = parts.groupBy("source", "pid").agg(sum(col("w")).as("pw"))
      .withColumn("off", coalesce(sum(col("pw")).over(wOff), lit(0L)))
      .withColumn("total", sum(col("pw")).over(wAll))
      .select(col("source"), col("pid"), col("off"), col("total"))
    local
      .join(broadcast(offsets), Seq("source", "pid"))
      .withColumn("cum", col("off") + col("lc"))
      .withColumn("step", greatest(expr(s"total DIV ${kPerSource}L"), lit(1L)))
      .withColumn("n_hits", expr("cum DIV step - (cum - w) DIV step"))
      .filter(col("n_hits") > 0)
      .select(col("source"), col("doc_id"), col("w"), col("cum"), col("n_hits"))
  }

  /** Top-token repetition: the most frequent token per doc and its share
    * of all tokens (ties broken by token asc). One explode + one
    * aggregation; the window partitions by doc_id, so parallelism is
    * per-document, never global. */
  def repTopToken(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("cnt"))
    val byDoc = Window.partitionBy("doc_id")
    counts
      .withColumn("n_tokens", sum(col("cnt")).over(byDoc))
      .withColumn("rn",
        row_number().over(byDoc.orderBy(col("cnt").desc, col("tok"))))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("tok").as("top_token"),
        col("cnt").as("top_cnt"),
        floor(col("cnt") / col("n_tokens").cast("double") * 10000 + 0.5)
          .cast("long").as("rep_ratio_e4"))
  }

  /** Cross-document shingle sharing: for each doc, what fraction of its
    * distinct 3-gram shingles occurs in at least one OTHER document —
    * corpus-level boilerplate pressure, as opposed to the within-doc
    * repetition signals. One postings aggregation (document frequency)
    * joined back to the postings on the same shuffle key, then a per-doc
    * rollup; the df table is vocab-sized, never |corpus|². */
  def crossDocShared(docs: DataFrame): DataFrame = {
    val p = DedupOps.shinglePostings(docs)
    val df = p.groupBy("x31").agg(count(lit(1)).as("df"))
    p.join(df, "x31")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(
        col("doc_id"), col("n_shingles"), col("n_shared"),
        floor(col("n_shared").cast("double") * 10000.0 / col("n_shingles").cast("double") + 0.5)
          .cast("long").as("shared_e4"))
  }

  /** Corpus vocabulary statistics: top-k unigrams and bigrams by count
    * (tokenizer-training prep). Exact two-phase top-k: rank inside each
    * shuffle partition first and keep k per partition, so the global
    * window only ever sees k×partitions rows — no single-reducer
    * bottleneck at 100 TB vocab sizes. */
  /** Per-source lexical diversity census: distinct unigrams / total
    * tokens (the type-token ratio) and the bigram twin — the corpus
    * health metric that catches template floods and synthetic loops
    * BEFORE a model memorizes them: a source whose TTR collapses versus
    * its peers is repeating itself, whatever the dedup keys say. Exact
    * counts (one map-side-combinable distinct per source — |vocab|-sized
    * state, not corpus-sized), e6-scaled integer ratios so both engines
    * agree bit-for-bit. */
  def diversityCensus(docs: DataFrame): DataFrame = {
    // one corpus tokenize feeds both branches (cached; uncached the
    // parse would run once per branch)
    val base = graft.Caching.maybeCache(
      docs.select(col("source"), tokens(col("text")).as("t")))
    val toks = base.select(col("source"), explode(col("t")).as("tok"))
    // adjacent-pair bigrams via a shuffle-free array zip (no per-doc
    // window); the greatest() guard keeps slice lengths legal on 1-token
    // docs under ANSI
    val t = col("t")
    val n1 = greatest(size(t) - 1, lit(0))
    val bg = zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    val bigrams = base.select(col("source"), explode(bg).as("bg"))
    val uni = toks.groupBy("source").agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("tok")).as("n_types"))
    val bi = bigrams.groupBy("source").agg(
      count(lit(1)).as("n_bigrams"),
      countDistinct(col("bg")).as("n_bigram_types"))
    uni.join(bi, Seq("source"), "left")
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("n_types * 1000000L DIV n_tokens").as("ttr_e6"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_bigram_types"), lit(0L)).as("n_bigram_types"),
        when(col("n_bigrams") > 0,
          expr("n_bigram_types * 1000000L DIV n_bigrams")).as("bttr_e6"))
  }

  def vocabTopGrams(docs: DataFrame, k: Int = 25): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    // cached: the unigram and bigram branches both read the token
    // explode; uncached, the corpus parse runs once per branch
    val toks = graft.Caching.maybeCache(
      docs.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok"))))
    val uni = toks.select(lit(1).as("n"), col("tok").as("gram"))
    val bi = toks
      .withColumn("t1", lead("tok", 1).over(w))
      .filter(col("t1").isNotNull)
      .select(lit(2).as("n"), concat_ws(" ", col("tok"), col("t1")).as("gram"))
    val counts = uni.unionByName(bi).groupBy("n", "gram").agg(count(lit(1)).as("cnt"))
    val perPart = Window.partitionBy(col("n"), spark_partition_id())
      .orderBy(col("cnt").desc, col("gram"))
    val pruned = counts
      .withColumn("prnk", row_number().over(perPart))
      .filter(col("prnk") <= k)
      .drop("prnk")
    pruned
      .withColumn("rnk", row_number().over(Window.partitionBy("n").orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rnk") <= k)
  }

  /** Deterministic train/val/test assignment: an md5-derived bucket in
    * [0,1000) per doc — <980 train, <990 val, else test — rolled up to
    * per-(split, lang) doc and token counts. The md5 key makes the split
    * reproducible across runs, engines, and re-shards (no RNG state to
    * seed, no sampling drift when the corpus grows); the rollup is one
    * map-side-combined aggregation. */
  def splitAssign(docs: DataFrame): DataFrame = {
    val bucket = stableHash60(col("doc_id").cast("string")) % 1000L
    docs
      .select(
        col("lang"),
        when(bucket < 980, "train").when(bucket < 990, "val").otherwise("test").as("split"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
  }

  /** Corpus version diff — [[TopologyOps.diff]]'s IN/OUT shape lifted to
    * the dataset level: per doc_id, whether the doc was added, removed,
    * changed (md5 fingerprint differs), or unchanged between two corpus
    * versions. This is the audit a dataset release runs before shipping
    * ("what did this crawl refresh actually touch") and the input to
    * incremental downstreams (only `added`/`changed` re-enter dedup /
    * scoring; `removed` feeds tombstones).
    *
    * One full-outer join on doc_id over md5-fingerprint projections —
    * both sides shuffle once on the join key, text never shuffles (the
    * fingerprint is computed in the scan projection). At 100 TB this is
    * the minimal-movement diff: 32-byte rows per side. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("old_md5"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("new_md5"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("old_md5"), col("new_md5"),
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") =!= col("new_md5"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Fixture version pair for [[corpusDiff]]'s oracle: old = docs whose
    * md5 decile != 0, new = deciles != 9 with deciles 4-5 textually
    * revised — so the diff exercises all four statuses
    * deterministically. */
  private[graft] def fixtureVersions(docs: DataFrame): (DataFrame, DataFrame) = {
    val dec = stableHash60(col("doc_id").cast("string")) % 10L
    val old = docs.filter(dec =!= 0L)
    val neu = docs.filter(dec =!= 9L)
      .withColumn("text",
        when(dec.isin(4L, 5L), concat(col("text"), lit(" v2"))).otherwise(col("text")))
    (old, neu)
  }

  /** Per-source document cap (the Common-Crawl-style domain cap): at most
    * `cap` docs kept per source, chosen by a deterministic md5 priority so
    * the survivors are a stable pseudo-random sample, not "first by id".
    * One window over the source partitioning — at 100 TB this is the
    * hot-domain skew pattern, and the md5 priority keeps any one reducer
    * from seeing more than a domain's docs (AQE splits the rest). */
  def sourceCaps(docs: DataFrame, cap: Int = 15): DataFrame = {
    val prio = stableHash60(col("doc_id").cast("string"))
    val w = Window.partitionBy("source").orderBy(col("prio"), col("doc_id"))
    docs
      .select(col("doc_id"), col("source"), prio.as("prio"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("source"), col("rk"))
  }

  /** Tokens that count as stopwords for the quality rules. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "that")

  /** Gopher-style per-doc quality rules: word-count bounds, mean-word-
    * length bounds, minimum stopword fraction, minimum alphabetic-token
    * fraction — each emitted as a scaled-int signal plus the combined
    * pass flag. Single explode + one per-doc aggregation, no shuffle
    * beyond the doc_id rollup. */
  def gopherRules(docs: DataFrame): DataFrame = {
    val isStop = Stopwords
      .foldRight(lit(false)) { case (s, acc) => (col("tok") === s) || acc }
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("tok")).cast("long")).as("n_chars"),
        sum(when(isStop, 1L).otherwise(0L)).as("n_stop"),
        sum(when(col("tok").rlike("[a-zA-Z]"), 1L).otherwise(0L)).as("n_alpha"))
      .select(
        col("doc_id"), col("n_words"),
        floor(col("n_chars").cast("double") / col("n_words").cast("double") * 10000 + 0.5)
          .cast("long").as("mwl_e4"),
        floor(col("n_stop").cast("double") / col("n_words").cast("double") * 10000 + 0.5)
          .cast("long").as("stop_e4"),
        floor(col("n_alpha").cast("double") / col("n_words").cast("double") * 10000 + 0.5)
          .cast("long").as("alpha_e4"))
      .withColumn("pass",
        col("n_words").between(50, 100000) &&
          col("mwl_e4").between(30000L, 100000L) &&
          col("stop_e4") >= 600L && col("alpha_e4") >= 8000L)
  }

  /** Repetition thresholds for the cascade planner's keep-predicates:
    * docs above either fraction are rejected by the corresponding rule. */
  val CascadeDupBigramMax = 2000L
  val CascadeTopTokenMax = 1500L

  /** Cost-based ordering of the curation filter cascade — the classic
    * query-optimizer predicate-ordering problem applied to data
    * curation. Each keep-rule gets a static per-doc evaluation cost
    * (metadata equality 1, token-aggregate rules 4, bigram/window rules
    * 6 — relative units) and a measured selectivity from one pass over
    * the corpus; the plan orders rules by rejections-per-cost
    * descending, i.e. cheapest-rejects-first, which minimizes expected
    * evaluation cost per doc under rule independence (the same greedy
    * rule Catalyst-style optimizers use for conjunctive predicates).
    * Output per rule: cost, failure count, selectivity, reject-per-cost
    * and the resulting execution order.
    *
    * Shape at 100 TB: the signals reuse the gopher/repetition aggregates
    * (token-stream groupBys, map-side combined); the rollup is one
    * 7-column aggregate unpivoted to 7 rows — the window that ranks
    * them runs on 7 rows, not the corpus. Null-signal docs (too short
    * to have the statistic) FAIL structural rules (an empty doc is not
    * quality) but PASS repetition rules (nothing repeats in 1 token);
    * both defaults are explicit in the predicate. */
  def cascadePlan(docs: DataFrame): DataFrame = {
    val sig = gopherRules(docs).drop("pass")
    val rep = repBigramFrac(docs).select(col("doc_id"), col("dup_frac_e4"))
    val top = repTopToken(docs).select(col("doc_id"), col("rep_ratio_e4"))
    val j = docs.select(col("doc_id"), col("lang"))
      .join(sig, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .join(top, Seq("doc_id"), "left")
    def fails(keep: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(coalesce(keep, lit(false)), 0L).otherwise(1L))
    val a = j.agg(
      count(lit(1)).as("n"),
      fails(col("lang") === "en").as("f_lang"),
      fails(col("n_words").between(50, 100000)).as("f_wc"),
      fails(col("mwl_e4").between(30000L, 100000L)).as("f_mwl"),
      fails(col("stop_e4") >= 600L).as("f_stop"),
      fails(col("alpha_e4") >= 8000L).as("f_alpha"),
      sum(when(coalesce(col("dup_frac_e4") <= CascadeDupBigramMax, lit(true)), 0L)
        .otherwise(1L)).as("f_dup"),
      sum(when(coalesce(col("rep_ratio_e4") <= CascadeTopTokenMax, lit(true)), 0L)
        .otherwise(1L)).as("f_top"))
    // empty corpus: no rule stats rather than 7 rows of nulls
    val rules = a.filter(col("n") > 0).select(col("n"), expr(
      """stack(7,
        |  'lang_en', 1L, f_lang,
        |  'word_count', 4L, f_wc,
        |  'mean_word_len', 4L, f_mwl,
        |  'stopword_frac', 4L, f_stop,
        |  'alpha_frac', 4L, f_alpha,
        |  'dup_bigram', 6L, f_dup,
        |  'top_token', 6L, f_top) AS (rule, cost_u, n_fail)""".stripMargin))
    val scored = rules.select(
      col("rule"), col("cost_u"), col("n").as("n_docs"), col("n_fail"),
      floor((col("n") - col("n_fail")) / col("n").cast("double") * 10000 + 0.5)
        .cast("long").as("sel_e4"),
      floor(col("n_fail") / col("n").cast("double") / col("cost_u") * 1000000 + 0.5)
        .cast("long").as("rpc_e6"))
    // 7 rows: the single-partition window is over the RULE table, never the corpus
    val w = Window.orderBy(col("rpc_e6").desc, col("rule"))
    scored.withColumn("exec_order", row_number().over(w).cast("long"))
  }

  /** The curation funnel: docs and tokens surviving each pipeline stage
    * — raw → exact dedup → near-dup cluster keep → quality pass →
    * source cap — as one 5-row observability report (the number a
    * pipeline owner reads before/after every config change: where does
    * the corpus actually shrink, in docs AND tokens, and what reaches
    * training). Stages compose CUMULATIVELY in the order [[curated]]
    * applies them; each keep-set is the existing operator's own
    * ([[DedupOps.exact]] canonicals, [[GraphOps.dedupClusters]] cluster
    * minima, [[gopherRules]] pass, [[sourceCaps]] survivors), so the
    * funnel can never drift from the pipeline it reports on.
    *
    * Shape at 100 TB: four slim keep-set joins on doc_id (each the
    * operator's own linear plan) into one map-side-combined 10-column
    * aggregate; the stack unpivot runs on ONE row. */
  def curationFunnel(docs: DataFrame): DataFrame = {
    val base = docs.select(
      col("doc_id"), size(tokens(col("text"))).cast("long").as("n_toks"))
    val exactDrop = DedupOps.exact(docs)
      .filter(col("doc_id") =!= col("canonical_id")).select("doc_id")
    val nearDrop = GraphOps.dedupClusters(docs)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val qualKeep = gopherRules(docs).filter(col("pass")).select("doc_id")
    val capKeep = sourceCaps(docs).select("doc_id")
    val flags = base
      .join(exactDrop.withColumn("xd", lit(1)), Seq("doc_id"), "left")
      .join(nearDrop.withColumn("nd", lit(1)), Seq("doc_id"), "left")
      .join(qualKeep.withColumn("qk", lit(1)), Seq("doc_id"), "left")
      .join(capKeep.withColumn("ck", lit(1)), Seq("doc_id"), "left")
      .select(col("n_toks"),
        col("xd").isNull.as("s1"),
        (col("xd").isNull && col("nd").isNull).as("s2"),
        (col("xd").isNull && col("nd").isNull && col("qk").isNotNull).as("s3"),
        (col("xd").isNull && col("nd").isNull && col("qk").isNotNull
          && col("ck").isNotNull).as("s4"))
    def dsum(f: org.apache.spark.sql.Column) = sum(when(f, 1L).otherwise(0L))
    def tsum(f: org.apache.spark.sql.Column) = sum(when(f, col("n_toks")).otherwise(0L))
    val a = flags.agg(
      count(lit(1)).as("n0"), sum(col("n_toks")).as("t0"),
      dsum(col("s1")).as("n1"), tsum(col("s1")).as("t1"),
      dsum(col("s2")).as("n2"), tsum(col("s2")).as("t2"),
      dsum(col("s3")).as("n3"), tsum(col("s3")).as("t3"),
      dsum(col("s4")).as("n4"), tsum(col("s4")).as("t4"))
      .filter(col("n0") > 0) // empty corpus: no funnel rows, not 5 nulls
    a.select(col("n0"), col("t0"), expr(
      """stack(5,
        |  'raw', 0L, n0, t0,
        |  'exact_dedup', 1L, n1, t1,
        |  'neardup_dedup', 2L, n2, t2,
        |  'quality', 3L, n3, t3,
        |  'source_cap', 4L, n4, t4) AS (stage, ord, n_docs, n_tokens)""".stripMargin))
      .select(col("stage"), col("ord"), col("n_docs"), col("n_tokens"),
        floor(col("n_docs") / col("n0").cast("double") * 10000 + 0.5)
          .cast("long").as("doc_pct_e4"),
        floor(col("n_tokens") / col("t0").cast("double") * 10000 + 0.5)
          .cast("long").as("tok_pct_e4"))
  }

  /** Context-length bucket boundaries for the packing plan. */
  val PackBuckets: Seq[Int] = Seq(16, 32, 48, 64, 96, 128)

  /** Sequence-packing plan: each doc lands in the smallest context bucket
    * that fits its token count; per bucket, the doc count, token total,
    * and padding waste (bucket width minus tokens) — the numbers a batch
    * packer needs to size its bins. Pure per-row math + one tiny
    * aggregation. */
  def lenBuckets(docs: DataFrame): DataFrame = {
    val n = size(tokens(col("text"))).cast("long")
    // ctx = smallest bucket that fits; 0 = overflow (doc needs chunking,
    // no padding waste attributed)
    val bucket = PackBuckets
      .foldRight(lit(0L): org.apache.spark.sql.Column) { case (b, acc) =>
        when(n <= b, lit(b.toLong)).otherwise(acc)
      }
    docs
      .select(bucket.as("ctx"), n.as("n_toks"))
      .groupBy("ctx")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("ctx") > 0, col("ctx") - col("n_toks")).otherwise(0L)).as("waste"))
  }

  /** Bin capacity for [[packingAssign]]: one packed training sequence. */
  val PackContext: Int = PackBuckets.max

  /** Sequence-packing ASSIGNMENT — closes [[lenBuckets]]' waste plan into
    * the doc → (bin, offset) layout an input pipeline actually consumes:
    * each doc is padded to its [[PackBuckets]] class width and placed in
    * a fixed slot of a [[PackContext]]-token bin (slots per bin =
    * PackContext div width, so a bin mixes only same-class docs and
    * never overflows BY CONSTRUCTION — first-fit inside one class is
    * exactly fill-in-rank-order when all items share a width).
    * Overflow docs (ctx 0, longer than every bucket) are the chunker's
    * job ([[chunked]]) and are not emitted.
    *
    * The global placement order within a class is (md5 bucket of
    * doc_id, doc_id) — deterministic and shuffle-friendly — and the
    * rank is computed scale-safely with the census pattern: a (ctx,
    * bkt) census (≤ |buckets|·1000 rows) gives each hash-bucket's
    * starting rank via a per-class cumulative window over ≤ 1000 census
    * rows; docs then rank inside their (ctx, bkt) cell with a
    * PARTITIONED window. No corpus-wide total order, ever: the densest
    * single window partition is one hash-bucket of one class
    * (~corpus/1000). Waste reconciles with [[lenBuckets]]: sum(pad) per
    * class equals the plan's `waste` row. */
  def packingAssign(docs: DataFrame): DataFrame = {
    val n = size(tokens(col("text"))).cast("long")
    val bucket = PackBuckets
      .foldRight(lit(0L): org.apache.spark.sql.Column) { case (b, acc) =>
        when(n <= b, lit(b.toLong)).otherwise(acc)
      }
    val t = docs
      .select(col("doc_id"), n.as("n_toks"), bucket.as("ctx"),
        (stableHash60(col("doc_id").cast("string")) % 1000L).as("bkt"))
      .filter(col("ctx") > 0)
    val census = t.groupBy("ctx", "bkt").agg(count(lit(1)).as("c"))
    val wb = Window.partitionBy("ctx").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val starts = census
      .withColumn("start", coalesce(sum(col("c")).over(wb), lit(0L)))
      .select("ctx", "bkt", "start")
    val wd = Window.partitionBy("ctx", "bkt").orderBy("doc_id")
    t.join(broadcast(starts), Seq("ctx", "bkt"))
      .withColumn("r", col("start") + row_number().over(wd) - lit(1L))
      .withColumn("slots", expr(s"CAST($PackContext AS BIGINT) div ctx"))
      .select(
        col("doc_id"), col("ctx"),
        expr("r div slots").as("bin_no"),
        (col("r") % col("slots")).as("slot"),
        ((col("r") % col("slots")) * col("ctx")).as("bin_offset"),
        col("n_toks"),
        (col("ctx") - col("n_toks")).as("pad"))
  }

  /** Corpus-mixture report: per (lang, source) document and token counts
    * plus each cell's share of ALL tokens — the table a data-mixing plan
    * starts from. The global total comes from a scalar aggregate
    * broadcast-crossed back in, NOT a whole-table window (an empty
    * partitionBy funnels 100 TB through one reducer). */
  def langMix(docs: DataFrame): DataFrame = {
    val cells = docs
      .select(col("lang"), col("source"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val total = cells.agg(sum(col("n_tokens")).as("total"))
    cells.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        floor(col("n_tokens").cast("double") * 10000 / col("total").cast("double") + 0.5)
          .cast("long").as("share_e4"))
  }

  /** The end-to-end curated corpus: the intersection of three independent
    * keep-filters — Gopher quality pass, near-dup removal (canonical doc
    * wins), and the per-source cap. Each filter is computed over the full
    * corpus and the survivors intersected, so the result is order-
    * independent and each stage stays a single shuffle; the dup list can
    * be O(corpus), so it is anti-joined unhinted (one exchange of longs —
    * AQE broadcasts at runtime iff it actually fits). */
  def curated(docs: DataFrame): DataFrame = {
    val quality = gopherRules(docs).filter(col("pass")).select("doc_id")
    val dupes = GraphOps.dedupClusters(docs)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val capped = sourceCaps(docs).select("doc_id")
    docs
      .join(quality, Seq("doc_id"), "left_semi")
      .join(capped, Seq("doc_id"), "left_semi")
      .join(dupes, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Context-window chunking with overlap: split each document into
    * fixed-token windows advancing by `stride` (< `chunkTokens` ⇒
    * overlapping chunks — the standard pretraining/RAG chunker). Emits
    * (doc_id, chunk_no, start_tok, n_toks); the final window is clipped,
    * never padded. Pure per-row arithmetic + one explode of a bounded
    * sequence — embarrassingly parallel, no shuffle at all at 100 TB. */
  def chunked(docs: DataFrame, chunkTokens: Int = 32, stride: Int = 24): DataFrame =
    chunkPlan(docs, chunkTokens, stride)
      .select(col("doc_id"), col("chunk_no"), col("start_tok"), col("n_toks"))

  /** The sliding-window chunk frame with the token array still attached
    * — shared by [[chunked]] (which prunes `t` away) and [[chunkDedup]]
    * (which hashes the chunk's own tokens). Per-doc map-side explode;
    * nothing here shuffles. */
  private def chunkPlan(docs: DataFrame, chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    // stride > chunkTokens would leave inter-window gaps AND break the
    // window-count formula (phantom tail chunks with non-positive
    // n_toks); gap-sampling is a different operator, not a chunker
    require(stride <= chunkTokens, s"stride ($stride) must not exceed chunkTokens ($chunkTokens)")
    val n = size(col("t")).cast("long")
    // number of stride steps: 1 window when n <= chunk, else enough that
    // the last window's start covers the tail: ceil((n - chunk) / stride)
    val extra = ceil((n - chunkTokens).cast("double") / stride).cast("long")
    val nChunks = when(n <= chunkTokens, 1L).otherwise(extra + 1L)
    docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), n.as("n"), nChunks.as("nc"))
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0L), col("nc") - 1L)).as("chunk_no"))
      .select(
        col("doc_id"), col("t"), col("chunk_no"),
        (col("chunk_no") * stride).as("start_tok"),
        least(lit(chunkTokens.toLong), col("n") - col("chunk_no") * stride).as("n_toks"))
  }

  /** Chunk-level exact dedup — [[DedupOps.exact]] at [[chunked]]'s
    * granularity: two long docs sharing one verbatim window collide
    * HERE even when whole-doc keys and whole-doc Jaccard both miss (the
    * "dedup before packing" pass: duplicated training windows are what
    * the model actually memorizes, per Lee et al.'s substring-dedup
    * argument). Each chunk is keyed by the md5 of ITS OWN tokens;
    * duplicate groups report the lexicographically-first (doc, chunk)
    * as canonical. Scale shape: the chunk explode and md5 keying are
    * map-side (the token array never survives the projection); the one
    * shuffle is the 16-byte key window — the exact-dedup class at
    * |chunks| ≈ n/stride rows per doc. */
  def chunkDedup(docs: DataFrame, chunkTokens: Int = 32, stride: Int = 24): DataFrame = {
    val keyed = chunkPlan(docs, chunkTokens, stride)
      .select(col("doc_id"), col("chunk_no"),
        md5(array_join(
          slice(col("t"),
            (col("chunk_no") * lit(stride.toLong) + 1L).cast("int"),
            col("n_toks").cast("int")),
          " ")).as("chunk_key"))
    DedupOps.dupGroups(keyed, "chunk_key", Seq("doc_id", "chunk_no"))
      .select(
        col("doc_id"), col("chunk_no"), col("group_sz"),
        col("__canon.doc_id").as("canon_doc"),
        col("__canon.chunk_no").as("canon_chunk"),
        (col("doc_id") === col("__canon.doc_id") &&
          col("chunk_no") === col("__canon.chunk_no")).as("is_canonical"))
  }

  /** Mixture-rebalance planner: given target token shares per language,
    * the per-language keep rate that moves the corpus toward the target —
    * keep = min(1, target_share / actual_share). Languages over their
    * target are down-sampled, under-target ones keep everything (up-
    * sampling is an epoch-repeat decision, not a filter). One tiny
    * aggregate + a scalar-total cross join, same shape as [[langMix]];
    * rates come out e4-scaled and feed [[stratifiedSample]]-style
    * deterministic bucket filters. */
  def mixPlan(docs: DataFrame, targetsE4: Seq[(String, Long)] = MixTargetsE4): DataFrame = {
    val perLang = docs
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
    val total = perLang.agg(sum(col("n_tokens")).as("total"))
    val target = targetsE4
      .foldRight(lit(0L): org.apache.spark.sql.Column) { case ((l, t), acc) =>
        when(col("lang") === l, lit(t)).otherwise(acc)
      }
    perLang.crossJoin(broadcast(total))
      .select(
        col("lang"), col("n_docs"), col("n_tokens"),
        floor(col("n_tokens").cast("double") * 10000 / col("total").cast("double") + 0.5)
          .cast("long").as("actual_e4"),
        target.as("target_e4"),
        least(lit(10000L),
          floor(target.cast("double") * col("total").cast("double")
            / (col("n_tokens").cast("double") * 10000.0) * 10000 + 0.5).cast("long"))
          .as("keep_e4"))
  }

  /** Temperature-scaled source-sampling weights — the multilingual
    * mixing rule of mBERT / XLM-R / mT5 (sample source i with
    * probability ∝ p_i^α, α < 1): flattens the size distribution so
    * head sources stop drowning tail ones. α comes in QUARTERS
    * (`alphaQ`/4 ∈ {1/4, 1/2, 3/4}, default 1/2) so every power is a
    * composition of IEEE-754 `sqrt` — correctly rounded in every
    * engine, hence the oracle stays bit-exact, where a free-α pow() is
    * transcendental and engine-divergent; the quarter grid spans the
    * 0.2–0.7 band the papers sweep (p^¼ = √√p flattens hardest,
    * p^¾ = √p·√√p stays closest to natural). Both engines evaluate the
    * SAME sqrt composition, so the rounding chain is identical.
    * Per-row outputs are e9-rounded BEFORE
    * the normalizer sums them, so every cross-row sum is an integer sum
    * — order-free, unlike a raw double Σ√p (the same discipline as the
    * e9 scores everywhere else in this file). Output per source: token
    * share `p_e6`, sqrt-temperature sampling share `w_e6`, and the
    * implied duplication factor `dup_e4` = w/p — how many times the
    * source's tokens repeat per epoch of the mixture, the number an
    * operator checks against the ~4-epoch repetition ceiling before
    * accepting the mix.
    *
    * Shape at 100 TB: one map-side-combined token-count groupBy; the
    * rest runs on |sources| rows with two broadcast scalar joins. */
  def temperatureMix(docs: DataFrame, alphaQ: Int = 2): DataFrame = {
    require(alphaQ >= 1 && alphaQ <= 3, s"alphaQ in 1..3 (quarters), got $alphaQ")
    // cached: the |sources|-row aggregate is read by the total, the z
    // normalizer, and the final projection — uncached, the corpus
    // token-count scan would run once per reader
    val perSrc = graft.Caching.maybeCache(docs
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens")))
    val total = perSrc.agg(sum(col("n_tokens")).as("total"))
    val p = col("n_tokens") / col("total").cast("double")
    val pAlpha = alphaQ match {
      case 1 => sqrt(sqrt(p))
      case 2 => sqrt(p)
      case 3 => sqrt(p) * sqrt(sqrt(p))
    }
    val qq = perSrc.crossJoin(broadcast(total))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        floor(p * 1000000L + 0.5).cast("long").as("p_e6"),
        floor(pAlpha * 1000000000L + 0.5).cast("long").as("q_e9"))
    val z = qq.agg(sum(col("q_e9")).as("z"))
    qq.crossJoin(broadcast(z))
      .withColumn("w_e6",
        floor(col("q_e9").cast("double") * 1000000L / col("z") + 0.5).cast("long"))
      .select(
        col("source"), col("n_docs"), col("n_tokens"), col("p_e6"), col("w_e6"),
        // p_e6 rounds to 0 for any source under 0.5 ppm of total tokens —
        // realistic tail sources at 100 TB. Guard the ratio or the division
        // yields Infinity→Long.MaxValue here and engine-divergent garbage in
        // the oracle; NULL is the honest "share too small to express in e6".
        when(col("p_e6") > 0,
          floor(col("w_e6") * lit(10000.0) / col("p_e6") + 0.5).cast("long"))
          .as("dup_e4"))
  }

  /** Water-filling token-budget allocation across sources — the
    * SUPPLY-CONSTRAINED mixture solver [[mixPlan]] is not: given a total
    * token budget B and per-source weights w_i, allocate
    * alloc_i = min(supply_i, λ·w_i) with the water level λ set so the
    * allocations sum to B. Small sources saturate (you take everything
    * they have); the remaining budget spreads over the rest in weight
    * proportion — the standard closed form: sort by supply/weight,
    * saturate the prefix where s_i·(W−W_i) ≤ (B−S_i)·w_i (prefix sums
    * INCLUDING row i; exact integer cross-products, no division), then
    * λ = (B−S_K)/(W−W_K) over the saturated totals.
    *
    * Shape at 100 TB: one token-count groupBy builds the per-source
    * frame; everything after runs on |sources| rows (windows, prefix
    * sums, one broadcast scalar join). `budgetPct` sets B as a
    * percentage of the corpus total. `weights` is the public mixture
    * dial (the contamination-membership convention: a DataFrame
    * parameter, columns `(source, w)`): real mixtures weight sources
    * unequally, so λ·w_i spreads the unsaturated budget in weight
    * proportion. Sources absent from the frame (and the equal-weights
    * default, `None`) get w = 1; weights are clamped to ≥ 1 — the
    * positive-integer contract every prefix cross-product relies on. */
  def tokenAllocation(docs: DataFrame, budgetPct: Long = 50L,
      weights: Option[DataFrame] = None): DataFrame = {
    val supply0 = docs
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy("source")
      .agg(sum(col("n")).as("s"))
    val supply = weights match {
      case None => supply0.withColumn("w", lit(1L))
      case Some(wdf) => supply0
        .join(broadcast(wdf.select(col("source"), col("w").cast("long").as("w0"))),
          Seq("source"), "left")
        .withColumn("w", greatest(coalesce(col("w0"), lit(1L)), lit(1L)))
        .drop("w0")
    }
    val totals = supply.agg(
      sum(col("s")).as("st"), sum(col("w")).as("wt"))
    val withB = supply.crossJoin(broadcast(totals))
      .withColumn("b", floor(col("st") * budgetPct / lit(100.0)).cast("long"))
    // ascending supply/weight order; integer cross-product comparison
    // avoids ever forming the ratio
    val ord = Window.orderBy((col("s") / col("w").cast("double")).asc, col("source"))
    val cum = withB
      .withColumn("sk", sum(col("s")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("wk", sum(col("w")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("saturated",
        col("s") * (col("wt") - col("wk")) <= (col("b") - col("sk")) * col("w"))
    val satTotals = cum.agg(
      sum(when(col("saturated"), col("s")).otherwise(0L)).as("ssat"),
      sum(when(col("saturated"), col("w")).otherwise(0L)).as("wsat"))
    cum.crossJoin(broadcast(satTotals))
      .select(
        col("source"), col("s").as("n_tokens"), col("w").as("weight"), col("saturated"),
        when(col("saturated"), col("s"))
          .when(col("wt") > col("wsat"),
            floor((col("b") - col("ssat")) / (col("wt") - col("wsat")).cast("double")
              * col("w") + 0.5).cast("long"))
          .otherwise(col("s")).as("alloc_tokens"))
  }

  /** Closes [[tokenAllocation]] into the per-source DOCUMENT selection a
    * mixture pipeline consumes — the [[packingAssign]] /
    * [[graft.operators.LmOps.dsirSelect]] closure pattern (a plan is not
    * consumable until an operator emits the doc-level decision): within
    * each source, take docs in the stable md5-priority order — bucket-
    * major (bkt, pri, doc_id), [[tokenBudgetCut]]'s convention — until
    * the source's water-filled `alloc_tokens` is reached, with
    * [[tokenBudgetBoundary]]'s greedy convention (a doc is kept iff its
    * source's budget is not exhausted BEFORE it, so the boundary doc is
    * taken and per-source overshoot is bounded by one document).
    *
    * Scale shape: the cut is planned on a per-(source, md5-bucket)
    * census — ≤1000 rows per source, windows PARTITIONED BY SOURCE, so
    * no corpus total order and no single-partition window over anything
    * corpus-sized; the verdicts frame (≤ |sources|·1000 rows, bounded by
    * construction) broadcasts back onto the per-doc pass, and only the
    * ≤1-per-source `partial` buckets (~0.1% of each source) resolve
    * exactly within the bucket. */
  def allocSelect(docs: DataFrame, budgetPct: Long = 50L,
      weights: Option[DataFrame] = None): DataFrame = {
    val alloc = tokenAllocation(docs, budgetPct, weights)
      .select(col("source"), col("alloc_tokens"))
    val t = docs.select(
      col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("n_toks"),
      stableHash60(col("doc_id").cast("string")).as("pri"))
      .withColumn("bkt", col("pri") % 1000L)
    val census = t.groupBy("source", "bkt")
      .agg(sum(col("n_toks")).as("bucket_tokens"))
      .join(broadcast(alloc), "source")
    val wb = Window.partitionBy("source").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdicts = census
      .withColumn("cum_before", coalesce(sum(col("bucket_tokens")).over(wb), lit(0L)))
      .select(col("source"), col("bkt"),
        when(col("cum_before") + col("bucket_tokens") <= col("alloc_tokens"), "keep")
          .when(col("cum_before") < col("alloc_tokens"), "partial")
          .otherwise("drop").as("status"),
        (col("alloc_tokens") - col("cum_before")).as("residual"))
    val win = Window.partitionBy("source", "bkt").orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(verdicts), Seq("source", "bkt"))
      .withColumn("cum_before_doc", coalesce(sum(col("n_toks")).over(win), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_toks"),
        when(col("status") === "keep", lit(true))
          .when(col("status") === "drop", lit(false))
          .otherwise(col("cum_before_doc") < col("residual")).as("kept"))
  }

  /** Target token shares (e4) for [[mixPlan]]'s fixture run: an even
    * 2000 per language — unlisted languages get 0 (drop). */
  val MixTargetsE4: Seq[(String, Long)] =
    Seq("en" -> 2000L, "zh" -> 2000L, "de" -> 2000L, "fr" -> 2000L, "es" -> 2000L)

  /** Token-budget cut plan: take documents in deterministic md5-priority
    * order until the corpus hits `budgetTokens` — the "train on the
    * first N tokens of a stable shuffle" primitive. The priority is
    * bucketed (1000 md5 buckets) and the cut planned on the BUCKET
    * census: a running sum over 1000 rows finds which buckets are wholly
    * kept, which one straddles the boundary, and which drop — no global
    * sort of the corpus, ever. Only the single `partial` bucket (0.1% of
    * the corpus) would then need an exact within-bucket sort to place
    * the boundary doc; the plan emits per-bucket status + cumulative
    * position so that residual step is embarrassingly small. */
  def tokenBudgetCut(docs: DataFrame, budgetTokens: Long = 10000L): DataFrame = {
    val t = docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_toks"),
      (stableHash60(col("doc_id").cast("string")) % 1000L).as("bkt"))
    val census = t.groupBy("bkt")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("bucket_tokens"))
    val w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    census
      .withColumn("cum_before", coalesce(sum(col("bucket_tokens")).over(w), lit(0L)))
      .withColumn("status",
        when(col("cum_before") + col("bucket_tokens") <= budgetTokens, "keep")
          .when(col("cum_before") < budgetTokens, "partial")
          .otherwise("drop"))
      .select("bkt", "n_docs", "bucket_tokens", "cum_before", "status")
  }

  /** Phase two of [[tokenBudgetCut]]: the exact boundary inside the one
    * `partial` bucket. Only that bucket's docs (0.1% of the corpus,
    * semi-joined out) are sorted — by the same md5 priority, finer than
    * the bucket id — and a running sum against the residual budget marks
    * each doc kept or cut. A doc is kept iff the budget is not exhausted
    * BEFORE it (the greedy "take until the budget trips" convention, so
    * the boundary doc itself is taken). Together the two phases place an
    * exact token-budget cut with one census window + one 0.1%-sized
    * sort — never a corpus total-order. */
  def tokenBudgetBoundary(docs: DataFrame, budgetTokens: Long = 10000L): DataFrame = {
    val t = docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_toks"),
      stableHash60(col("doc_id").cast("string")).as("pri"))
      .withColumn("bkt", col("pri") % 1000L)
    val census = t.groupBy("bkt")
      .agg(sum(col("n_toks")).as("bucket_tokens"))
    val wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    // the single partial bucket + its residual budget: a 1-row broadcast
    val partial = census
      .withColumn("cum_before", coalesce(sum(col("bucket_tokens")).over(wb), lit(0L)))
      .filter(col("cum_before") < budgetTokens &&
        col("cum_before") + col("bucket_tokens") > budgetTokens)
      .select(col("bkt").as("pbkt"), (lit(budgetTokens) - col("cum_before")).as("residual"))
    val win = Window.partitionBy("bkt").orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(partial), col("bkt") === col("pbkt"))
      .withColumn("cum_before_doc", coalesce(sum(col("n_toks")).over(win), lit(0L)))
      .select(col("doc_id"), col("bkt"), col("n_toks"), col("cum_before_doc"),
        (col("cum_before_doc") < col("residual")).as("kept"))
  }

  /** Two unrolled BPE training iterations over the word-frequency table
    * — the tokenizer-training prep step ([[vocabTopGrams]] counts whole
    * grams; this learns SUB-word merges). Iteration 1 counts adjacent
    * CHARACTER pairs weighted by word frequency and picks the top merge;
    * iteration 2 applies that merge to every word's symbol string and
    * recounts — exactly [[EmbeddingStatsOps.kmeans2]]'s shape: the
    * driver-side training loop unrolled into a deterministic dataflow,
    * one broadcast (the learned merge) + one aggregation per iteration.
    *
    * The merge applies through non-overlapping left-to-right string
    * replacement on a `|`-separated symbol string (words containing the
    * marker are excluded up front). For a self-pair (a,a) this consumes
    * separators so runs of 3+ collapse pessimistically — identical in
    * both engines (plain `replace` semantics), documented deviation from
    * canonical BPE's run handling.
    *
    * Scale shape: everything downstream of the one corpus explode runs
    * on the WORD-FREQUENCY table (vocab-sized, not corpus-sized) — the
    * standard BPE-trainer optimization; pair spaces are alphabet²-bounded. */
  /** Vocab with frequencies: the single corpus-sized aggregation behind
    * the BPE family; cached, shared by training and encoding. */
  private def bpeWords(docs: DataFrame): DataFrame =
    graft.Caching.maybeCache(
      docs.select(explode(tokens(col("text"))).as("w"))
        .filter(!col("w").contains("|") && length(col("w")) >= 2 &&
          length(col("w")) <= OracleLimits.MaxWordChars)
        .groupBy("w").agg(count(lit(1)).as("cnt")))

  /** it-1 adjacent char pairs, weighted by word count. */
  private def bpePairs1(words: DataFrame): DataFrame =
    graft.Caching.maybeCache(
      words
        .select(col("w"), col("cnt"),
          explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
        .select(col("cnt"), expr("substr(w, i, 1)").as("sa"),
          expr("substr(w, i + 1, 1)").as("sb"))
        .groupBy("sa", "sb").agg(sum(col("cnt")).as("pair_cnt")))

  /** Words with merge-1 applied: marker string `m` + symbol array
    * `syms`. The non-overlapping left-to-right `replace` IS the merge
    * convention, identical in both engines. */
  private def bpeMerged(words: DataFrame, top1: DataFrame): DataFrame =
    words
      .crossJoin(broadcast(top1.select(col("sa").as("ma"), col("sb").as("mb"))))
      .withColumn("s1", expr("'|' || array_join(transform(sequence(1, length(w)), i -> substr(w, i, 1)), '|') || '|'"))
      .withColumn("m", expr("replace(s1, '|' || ma || '|' || mb || '|', '|' || ma || mb || '|')"))
      .withColumn("syms", expr("filter(split(m, '\\\\|'), x -> x <> '')"))

  /** it-2 pairs over the merged symbol arrays. */
  private def bpePairs2(merged: DataFrame): DataFrame = {
    val win = Window.partitionBy("w").orderBy("pos")
    merged
      .select(col("w"), col("cnt"), posexplode(col("syms")).as(Seq("pos", "sa")))
      .withColumn("sb", lead("sa", 1).over(win))
      .filter(col("sb").isNotNull)
      .groupBy("sa", "sb").agg(sum(col("cnt")).as("pair_cnt"))
  }

  def bpeMerges(docs: DataFrame, k: Int = 15): DataFrame = {
    val words = bpeWords(docs)
    val p1 = bpePairs1(words)
    val top1 = p1.orderBy(col("pair_cnt").desc, col("sa"), col("sb")).limit(1)
    val merged = bpeMerged(words, top1)
    val p2 = bpePairs2(merged)
    def ranked(p: DataFrame, it: Int): DataFrame =
      p.withColumn("it", lit(it))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("it").orderBy(col("pair_cnt").desc, col("sa"), col("sb"))))
        .filter(col("rnk") <= k)
    ranked(p1, 1).unionByName(ranked(p2, 2))
      .select("it", "sa", "sb", "pair_cnt", "rnk")
  }

  /** Tokenizer FERTILITY under the trained BPE merges — the metric that
    * decides whether a tokenizer is worth its vocab budget (symbols
    * emitted per word; 1.0 = every word is one token). Applies the it-1
    * and it-2 winning merges from [[bpeMerges]] to the whole vocab
    * (occurrence-weighted) and reports the compression ladder: it 0 =
    * character baseline, it 1 = after merge 1, it 2 = after both.
    *
    * Engine-exact: symbol counts are integers; the single rounding is
    * integer arithmetic (floor(x+0.5) = (2a+b) DIV (2b)). Scale shape:
    * everything runs on the VOCAB frame (words × their counts — the
    * corpus never reappears after [[bpeWords]]' one aggregation), and
    * both winning merges broadcast. Measured over the BPE-eligible vocab
    * (2..MaxWordChars chars, the training population). */
  def bpeEncodeStats(docs: DataFrame): DataFrame = {
    val words = bpeWords(docs)
    val p1 = bpePairs1(words)
    val top1 = p1.orderBy(col("pair_cnt").desc, col("sa"), col("sb")).limit(1)
    val merged = bpeMerged(words, top1)
    val top2 = bpePairs2(merged)
      .orderBy(col("pair_cnt").desc, col("sa"), col("sb")).limit(1)
    val enc = merged
      .crossJoin(broadcast(top2.select(col("sa").as("ma2"), col("sb").as("mb2"))))
      .withColumn("m2", expr("replace(m, '|' || ma2 || '|' || mb2 || '|', '|' || ma2 || mb2 || '|')"))
      .withColumn("syms2", expr("filter(split(m2, '\\\\|'), x -> x <> '')"))
      .select(col("cnt"), length(col("w")).cast("long").as("n0"),
        size(col("syms")).cast("long").as("n1"), size(col("syms2")).cast("long").as("n2"))
    val agg = enc.agg(
      sum(col("cnt")).as("n_words"),
      sum(col("cnt") * col("n0")).as("s0"),
      sum(col("cnt") * col("n1")).as("s1"),
      sum(col("cnt") * col("n2")).as("s2"))
    agg
      .select(expr("stack(3, 0, s0, 1, s1, 2, s2) AS (it, total_syms)"), col("n_words"))
      .select(col("it").cast("int").as("it"),
        col("total_syms").cast("long").as("total_syms"),
        col("n_words").cast("long").as("n_words"),
        expr("CAST((20000 * total_syms + n_words) DIV (2 * n_words) AS BIGINT)")
          .as("fertility_e4"))
      // empty corpus: the global agg row is all-null — drop it rather
      // than emit three null ladder rows
      .filter(col("n_words").isNotNull)
  }

  /** Quality-curriculum sampling plan: the corpus in exact quality
    * deciles with a ramped keep rate per decile (decile d keeps d/10 of
    * its docs — the "sample harder from higher-quality strata" pattern
    * behind quality-weighted pretraining mixes), survivors chosen by the
    * same deterministic md5 priority as [[splitAssign]]/[[sourceCaps]]
    * so the sample is stable across runs and re-shards.
    *
    * Deciles WITHOUT a global sort: quality_e4 is a bounded integer
    * score, so a value census (map-side combinable) + a running sum
    * window over the TINY distinct-value frame gives exact decile
    * boundaries; docs then join their value's decile through a broadcast
    * — the histogram-quantile shape that survives 100 TB, vs an
    * ntile/rank window that would total-order the corpus. Ties share a
    * value and therefore a decile (decile of the last tied row). */
  def qualityCurriculum(docs: DataFrame): DataFrame = {
    val q = TextOps.quality(docs).select(col("doc_id"), col("quality_e4"))
    val vc = q.groupBy(col("quality_e4").as("v")).agg(count(lit(1)).as("cnt"))
    val cum = vc.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("v"))))
    val n = q.agg(count(lit(1)).as("n_total"))
    val dec = cum.crossJoin(broadcast(n))
      .withColumn("decile", expr("CAST(1 + ((cum - 1) * 10) DIV n_total AS BIGINT)"))
      .select(col("v"), col("decile"))
    q.join(broadcast(dec), col("quality_e4") === col("v"))
      .withColumn("pri", stableHash60(col("doc_id").cast("string")) % 1000L)
      .withColumn("keep", col("pri") < col("decile") * 100L)
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
        min(col("quality_e4")).as("q_min"),
        max(col("quality_e4")).as("q_max"))
  }

  /** Per-source quality-distribution drift vs the corpus baseline:
    * total-variation distance between each source's quality-DECILE
    * histogram and the corpus's decile shares. The source-health monitor
    * for a federated ingest pipeline — a crawler whose quality
    * distribution shifts lights up as tv_e4 without per-source
    * thresholds, because every source is compared to the same corpus
    * deciles (which are ~uniform by construction, so tv ≈ 0 means "this
    * source looks like the corpus").
    *
    * Engine-exact: deciles come from [[qualityCurriculum]]'s value
    * census; the TV mass is summed over INTEGER cross-products
    * |n_sd·N − n_d·N_s| with a single final integer-arithmetic rounding
    * (floor(x+0.5) as (2a+b) DIV (2b)) — no doubles anywhere. Fixture
    * longs hold the products (≤ ~1e12 at sf0.1); at 100-TB doc counts
    * lift the products to DECIMAL(38,0) — same plan.
    *
    * Scale shape: one value census (value-space-sized, map-side
    * combined), one (source, decile) groupBy, then everything is
    * source×10-sized; the decile map and corpus scalars broadcast. No
    * corpus total-order, no corpus re-join. */
  def sourceQualityDrift(docs: DataFrame): DataFrame = {
    val q = TextOps.quality(docs, keep = Seq("source"))
      .select(col("source"), col("quality_e4"))
    val vc = q.groupBy(col("quality_e4").as("v")).agg(count(lit(1)).as("cnt"))
    val cum = vc.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("v"))))
    val n = q.agg(count(lit(1)).as("n_total"))
    val dec = cum.crossJoin(broadcast(n))
      .withColumn("decile", expr("CAST(1 + ((cum - 1) * 10) DIV n_total AS BIGINT)"))
      .select(col("v"), col("decile"))
    val binned = q.join(broadcast(dec), col("quality_e4") === col("v"))
      .groupBy("source", "decile").agg(count(lit(1)).as("n_sd"))
    val perSource = binned.groupBy("source").agg(sum(col("n_sd")).as("n_s"))
    val perDecile = binned.groupBy("decile").agg(sum(col("n_sd")).as("n_d"))
    // dense source × decile grid: a decile a source never hits still
    // contributes its corpus mass |0 − n_d·N_s|
    val terms = perSource.crossJoin(broadcast(perDecile))
      .join(binned, Seq("source", "decile"), "left")
      .crossJoin(broadcast(n))
      .select(col("source"), col("n_s"), col("n_total"),
        abs(coalesce(col("n_sd"), lit(0L)) * col("n_total") - col("n_d") * col("n_s"))
          .as("term"))
    terms
      .groupBy("source", "n_s", "n_total")
      .agg(sum(col("term")).as("s_abs"))
      .select(col("source"), col("n_s").as("n_docs"),
        expr("CAST((20000 * s_abs + 2 * n_s * n_total) DIV (4 * n_s * n_total) AS BIGINT)")
          .as("tv_e4"))
  }

  /** Duplicate-bigram fraction: 1 - distinct(bigrams)/total(bigrams) per
    * doc — high values mean boilerplate/repetition (the Gopher
    * "duplicate n-gram fraction" filter). Same posexplode + lead shape as
    * the shingle builder (fully codegen'd). */
  def repBigramFrac(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .filter(col("t1").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1")).as("bg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), countDistinct(col("bg")).as("n_distinct"))
      .select(
        col("doc_id"), col("n_bigrams"), col("n_distinct"),
        floor((lit(1.0) - col("n_distinct") / col("n_bigrams").cast("double")) * 10000 + 0.5)
          .cast("long").as("dup_frac_e4"))
  }

  /** A trained bigram LM as data: unigram context counts, bigram counts,
    * and the continuation vocabulary size — everything the add-one
    * probability (c12+1)/(c1+V) needs. Produced offline by
    * [[CurationOps.trainBigramLm]], consumed at serve time by
    * streaming/StreamingOps.fluencyScoreStream via stream-static joins. */
  case class BigramLm(uni: DataFrame, bi: DataFrame, vocabSize: Long)

  /** CCNet-style LM fluency scoring: each doc scored under a bigram
    * language model trained on the corpus itself, for perplexity-filter
    * curation (drop the least-fluent tail before training). Score =
    * arithmetic mean of add-one-smoothed conditional bigram
    * probabilities P(w2|w1) = (c12+1)/(c1+V) — the arithmetic variant of
    * perplexity (which is the geometric mean's inverse): same ordering
    * signal for filtering, but free of transcendentals, so every
    * per-bigram term is one deterministic double division scaled to an
    * exact BIGINT and the score is engine-exact (the same tradeoff the
    * integer ADC makes in PqOps). Each bigram instance matches exactly
    * one LM row, so the LM joins are 1:1 — two linear shuffles, no
    * fan-out; stop-word-headed unigram skew is AQE's skew-join case. At
    * trillion-token scale the LM table itself is pruned to top-K
    * bigrams with the smoothing floor as backoff — the cap changes the
    * model, not the join shape. Docs under 2 tokens have no bigram and
    * are absent, as in [[repBigramFrac]]. */
  def bigramFluency(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bgs = graft.Caching.maybeCache(
      docs
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("t1", lead("tok", 1).over(w))
        .filter(col("t1").isNotNull)
        .select(col("doc_id"), col("tok").as("w1"), col("t1").as("w2")))
    val uni = bgs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val vocab = bgs.select(countDistinct(col("w2")).as("v"))
    // p_e9 is constant per (w1, w2), so the LM join runs over per-doc
    // DISTINCT bigrams weighted by their in-doc count — Σ cnt·p_e9 equals
    // the per-instance sum exactly, with a smaller join input
    // output cached: the per-doc fluency frame is read by the fluency
    // query, scoreCorr, and the cascade/funnel composers — the LM joins
    // re-run per consumer otherwise
    graft.Caching.maybeCache(bgs
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("cnt"))
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("p_e9",
        floor((col("c12") + 1) / (col("c1") + col("v")).cast("double") * 1000000000L + 0.5)
          .cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_bigrams"), sum(col("cnt") * col("p_e9")).as("p_sum_e9"))
      .select(col("doc_id"), col("n_bigrams"), col("p_sum_e9"),
        floor(col("p_sum_e9").cast("double") / col("n_bigrams") / 100000L + 0.5)
          .cast("long").as("fluency_e4")))
  }

  /** Train the [[BigramLm]] on a corpus — the offline step of the
    * train-offline / score-at-ingest split. Same counts and smoothing
    * universe as [[bigramFluency]] (which trains and scores in one lazy
    * plan); here the vocab size is materialized eagerly (one scalar
    * action) because the streaming scorer needs it as a literal, and the
    * count tables are cached — they are the broadcast/static side of
    * every stream-static join downstream. */
  def trainBigramLm(docs: DataFrame): BigramLm = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bgs = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .filter(col("t1").isNotNull)
      .select(col("tok").as("w1"), col("t1").as("w2"))
    val uni = graft.Caching.maybeCache(bgs.groupBy("w1").agg(count(lit(1)).as("c1")))
    val bi = graft.Caching.maybeCache(bgs.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val v = bgs.agg(countDistinct(col("w2")).as("v")).collect()(0).getLong(0)
    BigramLm(uni, bi, v)
  }
}

object CurationPack extends QueryPack {
  private def d(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "contam" -> ((s, dir) => CurationOps.contamination(d(s, dir))),
    "contam_bloom" -> ((s, dir) => CurationOps.contaminationBloom(d(s, dir))),
    // the production shape: benchmark membership from a real doc table
    // (here: one source stands in for the benchmark suite), not a modulus
    "contam_src" -> ((s, dir) => CurationOps.contamination(d(s, dir),
      benchDocs = Some(d(s, dir).filter(col("source") === "src19")))),
    "strat_sample" -> ((s, dir) => CurationOps.stratifiedSample(d(s, dir))),
    "pps_sample" -> ((s, dir) => CurationOps.ppsSample(d(s, dir))),
    // the sample-size dial at a non-default setting: 8x fewer pins,
    // step 8x wider — heavy docs start absorbing several pins each
    "pps_sample25" -> ((s, dir) => CurationOps.ppsSample(d(s, dir), k = 25L)),
    "pps_sample_src" -> ((s, dir) => CurationOps.ppsSampleBySource(d(s, dir))),
    "rep_top_token" -> ((s, dir) => CurationOps.repTopToken(d(s, dir))),
    "rep_bigram_frac" -> ((s, dir) => CurationOps.repBigramFrac(d(s, dir))),
    "fluency" -> ((s, dir) => CurationOps.bigramFluency(d(s, dir))),
    "cross_doc" -> ((s, dir) => CurationOps.crossDocShared(d(s, dir))),
    "vocab_top" -> ((s, dir) => CurationOps.vocabTopGrams(d(s, dir))),
    "diversity_census" -> ((s, dir) => CurationOps.diversityCensus(d(s, dir))),
    "splits" -> ((s, dir) => CurationOps.splitAssign(d(s, dir))),
    "corpus_diff" -> ((s, dir) => {
      val (o, n) = CurationOps.fixtureVersions(d(s, dir))
      CurationOps.corpusDiff(o, n)
    }),
    "src_caps" -> ((s, dir) => CurationOps.sourceCaps(d(s, dir))),
    "gopher" -> ((s, dir) => CurationOps.gopherRules(d(s, dir))),
    "packing" -> ((s, dir) => CurationOps.lenBuckets(d(s, dir))),
    "packing_assign" -> ((s, dir) => CurationOps.packingAssign(d(s, dir))),
    "curated" -> ((s, dir) => CurationOps.curated(d(s, dir))),
    "lang_mix" -> ((s, dir) => CurationOps.langMix(d(s, dir))),
    "chunks" -> ((s, dir) => CurationOps.chunked(d(s, dir))),
    "chunk_dedup" -> ((s, dir) => CurationOps.chunkDedup(d(s, dir))),
    "mix_plan" -> ((s, dir) => CurationOps.mixPlan(d(s, dir))),
    "curriculum" -> ((s, dir) => CurationOps.qualityCurriculum(d(s, dir))),
    "source_drift" -> ((s, dir) => CurationOps.sourceQualityDrift(d(s, dir))),
    "bpe_merges" -> ((s, dir) => CurationOps.bpeMerges(d(s, dir))),
    "bpe_fertility" -> ((s, dir) => CurationOps.bpeEncodeStats(d(s, dir))),
    "token_budget" -> ((s, dir) => CurationOps.tokenBudgetCut(d(s, dir))),
    "token_boundary" -> ((s, dir) => CurationOps.tokenBudgetBoundary(d(s, dir))),
    "cascade_plan" -> ((s, dir) => CurationOps.cascadePlan(d(s, dir))),
    "curation_funnel" -> ((s, dir) => CurationOps.curationFunnel(d(s, dir))),
    "mix_alloc" -> ((s, dir) => CurationOps.tokenAllocation(d(s, dir))),
    // 99% budget: small sources saturate, so the oracle exercises the
    // water-level prefix logic, not just the proportional branch
    "mix_alloc99" -> ((s, dir) => CurationOps.tokenAllocation(d(s, dir), budgetPct = 99L)),
    "mix_alloc_w" -> ((s, dir) => CurationOps.tokenAllocation(d(s, dir),
      weights = Some(CurationPack.weightsFixtureDf(s)))),
    "alloc_select_w" -> ((s, dir) => CurationOps.allocSelect(d(s, dir),
      weights = Some(CurationPack.weightsFixtureDf(s)))),
    "alloc_select" -> ((s, dir) => CurationOps.allocSelect(d(s, dir))),
    // 20% budget: no source saturates, every source gets a partial
    // bucket — the boundary-resolution path in every partition
    "alloc_select20" -> ((s, dir) => CurationOps.allocSelect(d(s, dir), budgetPct = 20L)),
    "temp_mix" -> ((s, dir) => CurationOps.temperatureMix(d(s, dir))),
    "temp_mix25" -> ((s, dir) => CurationOps.temperatureMix(d(s, dir), alphaQ = 1))
  )

  // Shared shingle CTE: identical to the dedup oracles' 3-gram pipeline
  // (md5-folded 31-bit hashes, 1-based token indexing).
  private val ShingleCte =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |         CAST(CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 18, 15)) AS UBIGINT)
      |              % 2147483647 AS BIGINT) AS x31
      |  FROM toks, range(1, ${OracleLimits.MaxDocTokens}) r(i) WHERE i + 2 <= len(t)
      |)""".stripMargin

  /** The contamination oracle, parameterized by the benchmark-membership
    * condition over `sh.doc_id` the way the Scala side's `benchDocs`
    * knob is (the fixture modulus, or membership in an id set). */
  private def contaminationSql(benchCond: String): String =
    s"""WITH $ShingleCte,
       |bench AS (SELECT doc_id AS bench_id, x31 FROM sh WHERE $benchCond),
       |cand AS (SELECT doc_id, x31 FROM sh WHERE NOT ($benchCond))
       |SELECT c.doc_id,
       |       CAST(COUNT(DISTINCT c.x31) AS BIGINT) AS n_shared_shingles,
       |       CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
       |FROM cand c JOIN bench b ON c.x31 = b.x31
       |GROUP BY c.doc_id
       |HAVING COUNT(DISTINCT c.x31) >= 2""".stripMargin

  private val ContaminationSql = contaminationSql("doc_id % 97 = 13")

  /** The temperature-mix oracle, parameterized by the sqrt-composition
    * power expression over `n_tokens / CAST(total AS DOUBLE)` — exactly
    * the compositions [[CurationOps.temperatureMix]]'s alphaQ selects. */
  private def tempMixSql(powerExpr: String): String =
    s"""WITH per AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source
       |),
       |tot AS (SELECT SUM(n_tokens) AS total FROM per),
       |qq AS (
       |  SELECT source, n_docs, n_tokens,
       |         CAST(FLOOR((n_tokens / CAST(total AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS p_e6,
       |         CAST(FLOOR($powerExpr * 1000000000 + 0.5) AS BIGINT) AS q_e9
       |  FROM per, tot
       |),
       |z AS (SELECT SUM(q_e9) AS z FROM qq),
       |ww AS (
       |  SELECT source, n_docs, n_tokens, p_e6,
       |         CAST(FLOOR(CAST(q_e9 AS DOUBLE) * 1000000 / z + 0.5) AS BIGINT) AS w_e6
       |  FROM qq, z
       |)
       |SELECT source, n_docs, n_tokens, p_e6, w_e6,
       |       CASE WHEN p_e6 > 0
       |            THEN CAST(FLOOR(w_e6 * 10000.0 / p_e6 + 0.5) AS BIGINT)
       |            END AS dup_e4
       |FROM ww""".stripMargin

  /** Water-filling allocation CTE chain (sup→tot→wb→cum→flg→sat→alloc),
    * parameterized by the budget percentage the way the Scala side's
    * `budgetPct` knob is — shared VERBATIM by [[mixAllocSql]] and
    * [[allocSelectSql]] so the formula can only ever change in one
    * place. */
  private def waterFillCtes(pct: Long,
      wExpr: String = "CAST(1 AS BIGINT)"): String =
    s"""sup AS (
       |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS s,
       |         $wExpr AS w
       |  FROM documents GROUP BY source
       |),
       |tot AS (SELECT CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(w) AS BIGINT) AS wt FROM sup),
       |wb AS (
       |  SELECT sup.*, tot.st, tot.wt,
       |         CAST(FLOOR(tot.st * $pct / 100.0) AS BIGINT) AS b
       |  FROM sup, tot
       |),
       |cum AS (
       |  SELECT *,
       |         CAST(SUM(s) OVER (ORDER BY s / CAST(w AS DOUBLE), source
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sk,
       |         CAST(SUM(w) OVER (ORDER BY s / CAST(w AS DOUBLE), source
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS wk
       |  FROM wb
       |),
       |flg AS (
       |  SELECT *, s * (wt - wk) <= (b - sk) * w AS saturated FROM cum
       |),
       |sat AS (
       |  SELECT CAST(SUM(CASE WHEN saturated THEN s ELSE 0 END) AS BIGINT) AS ssat,
       |         CAST(SUM(CASE WHEN saturated THEN w ELSE 0 END) AS BIGINT) AS wsat
       |  FROM flg
       |),
       |alloc AS (
       |  SELECT source, s AS n_tokens, w AS weight, saturated,
       |         CASE WHEN saturated THEN s
       |              WHEN wt > wsat THEN CAST(FLOOR((b - ssat) / CAST(wt - wsat AS DOUBLE) * w + 0.5) AS BIGINT)
       |              ELSE s END AS alloc_tokens
       |  FROM flg, sat
       |)""".stripMargin

  /** The skewed-weights fixture for the `_w` twins: src0 5×, src1 3×,
    * everything else the default 1 — also rendered as the oracle's CASE. */
  private[graft] val WeightsFixture: Seq[(String, Long)] =
    Seq("src0" -> 5L, "src1" -> 3L)

  private[graft] def weightsFixtureDf(s: SparkSession): DataFrame = {
    import s.implicits._
    WeightsFixture.toDF("source", "w")
  }

  private def weightsFixtureSql: String =
    "CAST(CASE source " +
      WeightsFixture.map { case (src, w) => s"WHEN '$src' THEN $w" }.mkString(" ") +
      " ELSE 1 END AS BIGINT)"

  /** Water-filling allocation mirrored in SQL. */
  private def mixAllocSql(pct: Long, wExpr: String = "CAST(1 AS BIGINT)"): String =
    s"""WITH ${waterFillCtes(pct, wExpr)}
       |SELECT source, n_tokens, weight, saturated, alloc_tokens FROM alloc""".stripMargin

  /** Mirrors [[CurationOps.allocSelect]]: the shared water-fill chain,
    * then the per-(source, bucket) census verdicts and the
    * within-partial-bucket greedy boundary. */
  private def allocSelectSql(pct: Long, wExpr: String = "CAST(1 AS BIGINT)"): String =
    s"""WITH ${waterFillCtes(pct, wExpr)},
       |t AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) AS BIGINT) AS pri
       |  FROM documents
       |),
       |tb AS (SELECT *, pri % 1000 AS bkt FROM t),
       |census AS (
       |  SELECT source, bkt, CAST(SUM(n_toks) AS BIGINT) AS bucket_tokens
       |  FROM tb GROUP BY source, bkt
       |),
       |v AS (
       |  SELECT c.source, c.bkt, c.bucket_tokens, a.alloc_tokens,
       |         COALESCE(SUM(c.bucket_tokens) OVER (PARTITION BY c.source ORDER BY c.bkt
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM census c JOIN alloc a USING (source)
       |),
       |vs AS (
       |  SELECT source, bkt,
       |         CASE WHEN cum_before + bucket_tokens <= alloc_tokens THEN 'keep'
       |              WHEN cum_before < alloc_tokens THEN 'partial'
       |              ELSE 'drop' END AS status,
       |         alloc_tokens - cum_before AS residual
       |  FROM v
       |),
       |j AS (
       |  SELECT tb.doc_id, tb.source, tb.n_toks, vs.status, vs.residual,
       |         COALESCE(SUM(tb.n_toks) OVER (PARTITION BY tb.source, tb.bkt
       |           ORDER BY tb.pri, tb.doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before_doc
       |  FROM tb JOIN vs ON tb.source = vs.source AND tb.bkt = vs.bkt
       |)
       |SELECT doc_id, source, n_toks,
       |       CASE WHEN status = 'keep' THEN TRUE
       |            WHEN status = 'drop' THEN FALSE
       |            ELSE cum_before_doc < residual END AS kept
       |FROM j""".stripMargin

  /** The PPS systematic sample, parameterized by the pin count the way
    * the Scala side's `k` knob is: cumulative token weight over the md5
    * priority order, pins at every multiple of step = total DIV k. */
  private def ppsSampleSql(k: Long): String =
    s"""WITH w AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
       |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) AS BIGINT) AS pri
       |  FROM documents
       |),
       |c AS (
       |  SELECT doc_id, w,
       |         CAST(SUM(w) OVER (ORDER BY pri, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM w
       |),
       |s AS (SELECT CAST(GREATEST(SUM(w) // $k, 1) AS BIGINT) AS step FROM w)
       |SELECT doc_id, w, cum, cum // step - (cum - w) // step AS n_hits
       |FROM c CROSS JOIN s
       |WHERE cum // step - (cum - w) // step > 0""".stripMargin

  override def oracles: Map[String, String] = Map(
    "pps_sample" -> ppsSampleSql(200L),
    "pps_sample25" -> ppsSampleSql(25L),
    "pps_sample_src" ->
      s"""WITH w AS (
         |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) AS BIGINT) AS pri
         |  FROM documents
         |),
         |c AS (
         |  SELECT source, doc_id, w,
         |         CAST(SUM(w) OVER (PARTITION BY source ORDER BY pri, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM w
         |),
         |s AS (
         |  SELECT source, CAST(GREATEST(SUM(w) // 50, 1) AS BIGINT) AS step
         |  FROM w GROUP BY source
         |)
         |SELECT c.source, doc_id, w, cum, cum // step - (cum - w) // step AS n_hits
         |FROM c JOIN s ON c.source = s.source
         |WHERE cum // step - (cum - w) // step > 0""".stripMargin,
    // DuckDB list slicing is 1-based end-INCLUSIVE, so the chunk window
    // is t[i*stride+1 : i*stride+n_toks] — the same elements Spark's
    // slice(t, i*stride+1, n_toks) takes
    "chunk_dedup" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |  FROM documents
         |),
         |c AS (
         |  SELECT doc_id, t, n,
         |         CASE WHEN n <= 32 THEN 1
         |              ELSE CAST(CEIL((n - 32) / CAST(24 AS DOUBLE)) AS BIGINT) + 1 END AS nc
         |  FROM tk
         |),
         |ch AS (
         |  SELECT doc_id, CAST(r.i AS BIGINT) AS chunk_no,
         |         md5(array_to_string(
         |           t[CAST(r.i * 24 + 1 AS BIGINT):CAST(r.i * 24 + LEAST(32, n - r.i * 24) AS BIGINT)],
         |           ' ')) AS chunk_key
         |  FROM c, range(0, ${OracleLimits.MaxDocTokens}) r(i)
         |  WHERE r.i < nc
         |),
         |g AS (
         |  SELECT doc_id, chunk_no,
         |         CAST(COUNT(*) OVER (PARTITION BY chunk_key) AS BIGINT) AS group_sz,
         |         FIRST_VALUE(doc_id) OVER (PARTITION BY chunk_key ORDER BY doc_id, chunk_no
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS canon_doc,
         |         FIRST_VALUE(chunk_no) OVER (PARTITION BY chunk_key ORDER BY doc_id, chunk_no
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS canon_chunk
         |  FROM ch
         |)
         |SELECT doc_id, chunk_no, group_sz, canon_doc, canon_chunk,
         |       doc_id = canon_doc AND chunk_no = canon_chunk AS is_canonical
         |FROM g WHERE group_sz > 1""".stripMargin,
    // fixture versions from md5 deciles: old = deciles != 0, new =
    // deciles != 9 with 4-5 revised — full-outer md5 diff
    "corpus_diff" ->
      """WITH dd AS (
        |  SELECT doc_id, text,
        |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) % 10 AS BIGINT) AS dec
        |  FROM documents
        |),
        |old AS (SELECT doc_id, md5(text) AS old_md5 FROM dd WHERE dec <> 0),
        |neu AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN dec IN (4, 5) THEN text || ' v2' ELSE text END) AS new_md5
        |  FROM dd WHERE dec <> 9
        |)
        |SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id, old_md5, new_md5,
        |       CASE WHEN old_md5 IS NULL THEN 'added'
        |            WHEN new_md5 IS NULL THEN 'removed'
        |            WHEN old_md5 <> new_md5 THEN 'changed'
        |            ELSE 'unchanged' END AS status
        |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id""".stripMargin,
    "token_boundary" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) AS BIGINT) AS pri
        |  FROM documents
        |),
        |tb AS (SELECT *, pri % 1000 AS bkt FROM t),
        |census AS (SELECT bkt, CAST(SUM(n_toks) AS BIGINT) AS bt FROM tb GROUP BY bkt),
        |c AS (
        |  SELECT bkt, bt, COALESCE(CAST(SUM(bt) OVER (ORDER BY bkt
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
        |  FROM census
        |),
        |p AS (SELECT bkt AS pbkt, 10000 - cb AS residual FROM c
        |      WHERE cb < 10000 AND cb + bt > 10000),
        |x AS (
        |  SELECT tb.doc_id, tb.bkt, tb.n_toks,
        |         COALESCE(CAST(SUM(tb.n_toks) OVER (PARTITION BY tb.bkt
        |              ORDER BY tb.pri, tb.doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before_doc,
        |         p.residual
        |  FROM tb JOIN p ON tb.bkt = p.pbkt
        |)
        |SELECT doc_id, bkt, n_toks, cum_before_doc, cum_before_doc < residual AS kept
        |FROM x""".stripMargin,
    "token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) % 1000 AS BIGINT) AS bkt
        |  FROM documents
        |),
        |census AS (
        |  SELECT bkt, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS bucket_tokens
        |  FROM t GROUP BY bkt
        |),
        |c AS (
        |  SELECT *, COALESCE(CAST(SUM(bucket_tokens) OVER (ORDER BY bkt
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
        |  FROM census
        |)
        |SELECT bkt, n_docs, bucket_tokens, cum_before,
        |       CASE WHEN cum_before + bucket_tokens <= 10000 THEN 'keep'
        |            WHEN cum_before < 10000 THEN 'partial'
        |            ELSE 'drop' END AS status
        |FROM c""".stripMargin,
    "contam" -> ContaminationSql,
    // the Bloom sketch only prunes; the exact join decides — same oracle
    "contam_bloom" -> ContaminationSql,
    "contam_src" -> contaminationSql(
      "doc_id IN (SELECT doc_id FROM documents WHERE source = 'src19')"),
    "strat_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) % 100 AS BIGINT) AS bucket,
        |         CASE lang WHEN 'en' THEN 5 WHEN 'zh' THEN 10 WHEN 'de' THEN 25
        |                   WHEN 'fr' THEN 50 WHEN 'es' THEN 75 ELSE 100 END AS rate
        |  FROM documents
        |)
        |SELECT doc_id, lang, bucket FROM b WHERE bucket < rate""".stripMargin,
    "diversity_census" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |uni AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
        |  FROM toks GROUP BY source
        |),
        |bgl AS (
        |  SELECT source,
        |         unnest(list_transform(range(1, len(t)), j -> t[j] || ' ' || t[j+1])) AS bg
        |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
        |),
        |bi AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |         CAST(COUNT(DISTINCT bg) AS BIGINT) AS n_bigram_types
        |  FROM bgl GROUP BY source
        |)
        |SELECT u.source, n_tokens, n_types,
        |       n_types * 1000000 // n_tokens AS ttr_e6,
        |       COALESCE(n_bigrams, 0) AS n_bigrams,
        |       COALESCE(n_bigram_types, 0) AS n_bigram_types,
        |       CASE WHEN n_bigrams > 0 THEN n_bigram_types * 1000000 // n_bigrams END AS bttr_e6
        |FROM uni u LEFT JOIN bi USING (source)""".stripMargin,
    "mix_alloc" -> mixAllocSql(50L),
    "mix_alloc99" -> mixAllocSql(99L),
    "mix_alloc_w" -> mixAllocSql(50L, weightsFixtureSql),
    "alloc_select_w" -> allocSelectSql(50L, weightsFixtureSql),
    "alloc_select" -> allocSelectSql(50L),
    "alloc_select20" -> allocSelectSql(20L),
    "temp_mix" -> tempMixSql("sqrt(n_tokens / CAST(total AS DOUBLE))"),
    "temp_mix25" -> tempMixSql("sqrt(sqrt(n_tokens / CAST(total AS DOUBLE)))"),
    "curation_funnel" ->
      s"""WITH RECURSIVE ${GraphPack.ClustersCte},
        |fx AS (
        |  SELECT doc_id,
        |         md5(array_to_string((string_split(text, ' '))[1:5], ' ')) AS dup_key
        |  FROM documents
        |),
        |fg AS (
        |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY dup_key) AS canonical_id FROM fx
        |),
        |ftoks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |fagg AS (
        |  SELECT doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_words,
        |         CAST(SUM(len(tok)) AS BIGINT) AS n_chars,
        |         CAST(SUM(CASE WHEN tok IN ('the','a','of','to','and','in','is','that') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
        |         CAST(SUM(CASE WHEN regexp_matches(tok, '[a-zA-Z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha
        |  FROM ftoks GROUP BY doc_id
        |),
        |fq AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, n_words,
        |           CAST(FLOOR(CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS mwl_e4,
        |           CAST(FLOOR(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS stop_e4,
        |           CAST(FLOOR(CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS alpha_e4
        |    FROM fagg
        |  ) WHERE (n_words BETWEEN 50 AND 100000) AND (mwl_e4 BETWEEN 30000 AND 100000)
        |          AND stop_e4 >= 600 AND alpha_e4 >= 8000
        |),
        |fc AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |           ROW_NUMBER() OVER (PARTITION BY source ORDER BY
        |             CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) AS BIGINT), doc_id) AS rk
        |    FROM documents
        |  ) WHERE rk <= 15
        |),
        |flags AS (
        |  SELECT CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
        |         fg.doc_id = fg.canonical_id AS s1,
        |         fg.doc_id = fg.canonical_id AND l.doc_id IS NULL AS s2,
        |         fg.doc_id = fg.canonical_id AND l.doc_id IS NULL AND fq.doc_id IS NOT NULL AS s3,
        |         fg.doc_id = fg.canonical_id AND l.doc_id IS NULL AND fq.doc_id IS NOT NULL
        |           AND fc.doc_id IS NOT NULL AS s4
        |  FROM documents d
        |  JOIN fg ON d.doc_id = fg.doc_id
        |  LEFT JOIN labels l ON d.doc_id = l.doc_id AND l.doc_id <> l.cluster_id
        |  LEFT JOIN fq ON d.doc_id = fq.doc_id
        |  LEFT JOIN fc ON d.doc_id = fc.doc_id
        |),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n0, CAST(SUM(n_toks) AS BIGINT) AS t0,
        |         CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(SUM(CASE WHEN s1 THEN n_toks ELSE 0 END) AS BIGINT) AS t1,
        |         CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |         CAST(SUM(CASE WHEN s2 THEN n_toks ELSE 0 END) AS BIGINT) AS t2,
        |         CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        |         CAST(SUM(CASE WHEN s3 THEN n_toks ELSE 0 END) AS BIGINT) AS t3,
        |         CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
        |         CAST(SUM(CASE WHEN s4 THEN n_toks ELSE 0 END) AS BIGINT) AS t4
        |  FROM flags
        |),
        |st AS (
        |  SELECT 'raw' AS stage, CAST(0 AS BIGINT) AS ord, n0 AS n_docs, t0 AS n_tokens, n0, t0 FROM a
        |  UNION ALL SELECT 'exact_dedup', CAST(1 AS BIGINT), n1, t1, n0, t0 FROM a
        |  UNION ALL SELECT 'neardup_dedup', CAST(2 AS BIGINT), n2, t2, n0, t0 FROM a
        |  UNION ALL SELECT 'quality', CAST(3 AS BIGINT), n3, t3, n0, t0 FROM a
        |  UNION ALL SELECT 'source_cap', CAST(4 AS BIGINT), n4, t4, n0, t0 FROM a
        |)
        |SELECT stage, ord, n_docs, n_tokens,
        |       CAST(FLOOR(n_docs / CAST(n0 AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS doc_pct_e4,
        |       CAST(FLOOR(n_tokens / CAST(t0 AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS tok_pct_e4
        |FROM st""".stripMargin,
    "cascade_plan" ->
      s"""WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |agg AS (
        |  SELECT doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_words,
        |         CAST(SUM(len(tok)) AS BIGINT) AS n_chars,
        |         CAST(SUM(CASE WHEN tok IN ('the','a','of','to','and','in','is','that') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
        |         CAST(SUM(CASE WHEN regexp_matches(tok, '[a-zA-Z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha
        |  FROM toks GROUP BY doc_id
        |),
        |sig AS (
        |  SELECT doc_id, n_words,
        |         CAST(FLOOR(CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS mwl_e4,
        |         CAST(FLOOR(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS stop_e4,
        |         CAST(FLOOR(CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS alpha_e4
        |  FROM agg
        |),
        |ta AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        |  FROM ta, range(1, ${OracleLimits.MaxDocTokens}) r(i) WHERE i + 1 <= len(t)
        |),
        |rep AS (
        |  SELECT doc_id,
        |         CAST(FLOOR((1.0 - COUNT(DISTINCT bg) / CAST(COUNT(*) AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS dup_frac_e4
        |  FROM bg GROUP BY doc_id
        |),
        |counts AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok),
        |topt AS (
        |  SELECT doc_id,
        |         CAST(FLOOR(cnt / CAST(n_tokens AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS rep_ratio_e4
        |  FROM (
        |    SELECT doc_id, cnt,
        |           SUM(cnt) OVER (PARTITION BY doc_id) AS n_tokens,
        |           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rn
        |    FROM counts
        |  ) WHERE rn = 1
        |),
        |j AS (
        |  SELECT d.doc_id, d.lang, s.n_words, s.mwl_e4, s.stop_e4, s.alpha_e4,
        |         r.dup_frac_e4, t2.rep_ratio_e4
        |  FROM documents d
        |  LEFT JOIN sig s ON d.doc_id = s.doc_id
        |  LEFT JOIN rep r ON d.doc_id = r.doc_id
        |  LEFT JOIN topt t2 ON d.doc_id = t2.doc_id
        |),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN COALESCE(lang = 'en', false) THEN 0 ELSE 1 END) AS BIGINT) AS f_lang,
        |         CAST(SUM(CASE WHEN COALESCE(n_words BETWEEN 50 AND 100000, false) THEN 0 ELSE 1 END) AS BIGINT) AS f_wc,
        |         CAST(SUM(CASE WHEN COALESCE(mwl_e4 BETWEEN 30000 AND 100000, false) THEN 0 ELSE 1 END) AS BIGINT) AS f_mwl,
        |         CAST(SUM(CASE WHEN COALESCE(stop_e4 >= 600, false) THEN 0 ELSE 1 END) AS BIGINT) AS f_stop,
        |         CAST(SUM(CASE WHEN COALESCE(alpha_e4 >= 8000, false) THEN 0 ELSE 1 END) AS BIGINT) AS f_alpha,
        |         CAST(SUM(CASE WHEN COALESCE(dup_frac_e4 <= ${CurationOps.CascadeDupBigramMax}, true) THEN 0 ELSE 1 END) AS BIGINT) AS f_dup,
        |         CAST(SUM(CASE WHEN COALESCE(rep_ratio_e4 <= ${CurationOps.CascadeTopTokenMax}, true) THEN 0 ELSE 1 END) AS BIGINT) AS f_top
        |  FROM j
        |),
        |rules AS (
        |  SELECT 'lang_en' AS rule, CAST(1 AS BIGINT) AS cost_u, f_lang AS n_fail, n FROM a
        |  UNION ALL SELECT 'word_count', CAST(4 AS BIGINT), f_wc, n FROM a
        |  UNION ALL SELECT 'mean_word_len', CAST(4 AS BIGINT), f_mwl, n FROM a
        |  UNION ALL SELECT 'stopword_frac', CAST(4 AS BIGINT), f_stop, n FROM a
        |  UNION ALL SELECT 'alpha_frac', CAST(4 AS BIGINT), f_alpha, n FROM a
        |  UNION ALL SELECT 'dup_bigram', CAST(6 AS BIGINT), f_dup, n FROM a
        |  UNION ALL SELECT 'top_token', CAST(6 AS BIGINT), f_top, n FROM a
        |),
        |scored AS (
        |  SELECT rule, cost_u, n AS n_docs, n_fail,
        |         CAST(FLOOR((n - n_fail) / CAST(n AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS sel_e4,
        |         CAST(FLOOR(n_fail / CAST(n AS DOUBLE) / cost_u * 1000000 + 0.5) AS BIGINT) AS rpc_e6
        |  FROM rules
        |)
        |SELECT rule, cost_u, n_docs, n_fail, sel_e4, rpc_e6,
        |       CAST(ROW_NUMBER() OVER (ORDER BY rpc_e6 DESC, rule) AS BIGINT) AS exec_order
        |FROM scored""".stripMargin,
    "rep_top_token" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |counts AS (
        |  SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok
        |),
        |ranked AS (
        |  SELECT doc_id, tok, cnt,
        |         SUM(cnt) OVER (PARTITION BY doc_id) AS n_tokens,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rn
        |  FROM counts
        |)
        |SELECT doc_id, tok AS top_token, cnt AS top_cnt,
        |       CAST(FLOOR(cnt / CAST(n_tokens AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS rep_ratio_e4
        |FROM ranked WHERE rn = 1""".stripMargin,
    "rep_bigram_frac" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        |  FROM toks, range(1, ${OracleLimits.MaxDocTokens}) r(i) WHERE i + 1 <= len(t)
        |)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(COUNT(DISTINCT bg) AS BIGINT) AS n_distinct,
        |       CAST(FLOOR((1.0 - COUNT(DISTINCT bg) / CAST(COUNT(*) AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS dup_frac_e4
        |FROM bg GROUP BY doc_id""".stripMargin,
    "fluency" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM toks, range(1, ${OracleLimits.MaxDocTokens}) r(i) WHERE i + 1 <= len(t)
        |),
        |uni AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
        |bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
        |vs AS (SELECT COUNT(DISTINCT w2) AS v FROM bg),
        |scored AS (
        |  SELECT bg.doc_id,
        |         CAST(FLOOR((bi.c12 + 1) / CAST(uni.c1 + vs.v AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS p_e9
        |  FROM bg JOIN bi ON bg.w1 = bi.w1 AND bg.w2 = bi.w2
        |          JOIN uni ON bg.w1 = uni.w1, vs
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(p_e9) AS BIGINT) AS p_sum_e9,
        |       CAST(FLOOR(CAST(SUM(p_e9) AS DOUBLE) / COUNT(*) / 100000 + 0.5) AS BIGINT) AS fluency_e4
        |FROM scored GROUP BY doc_id""".stripMargin,
    "cross_doc" ->
      s"""WITH $ShingleCte,
         |df AS (SELECT x31, COUNT(*) AS df FROM sh GROUP BY x31)
         |SELECT sh.doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |       CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |       CAST(FLOOR(CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) * CAST(10000 AS DOUBLE)
         |                  / CAST(COUNT(*) AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS shared_e4
         |FROM sh JOIN df ON sh.x31 = df.x31
         |GROUP BY sh.doc_id""".stripMargin,
    "splits" ->
      """WITH b AS (
        |  SELECT lang,
        |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) % 1000 AS BIGINT) AS bucket,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 980 THEN 'train' WHEN bucket < 990 THEN 'val' ELSE 'test' END AS split,
        |       lang, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        |FROM b GROUP BY 1, 2""".stripMargin,
    "src_caps" ->
      """WITH p AS (
        |  SELECT doc_id, source,
        |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) AS BIGINT) AS prio
        |  FROM documents
        |),
        |r AS (
        |  SELECT doc_id, source,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY prio, doc_id) AS rk
        |  FROM p
        |)
        |SELECT doc_id, source, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 15""".stripMargin,
    "gopher" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |agg AS (
        |  SELECT doc_id,
        |         CAST(COUNT(*) AS BIGINT) AS n_words,
        |         CAST(SUM(len(tok)) AS BIGINT) AS n_chars,
        |         CAST(SUM(CASE WHEN tok IN ('the','a','of','to','and','in','is','that') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
        |         CAST(SUM(CASE WHEN regexp_matches(tok, '[a-zA-Z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha
        |  FROM toks GROUP BY doc_id
        |),
        |sig AS (
        |  SELECT doc_id, n_words,
        |         CAST(FLOOR(CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS mwl_e4,
        |         CAST(FLOOR(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS stop_e4,
        |         CAST(FLOOR(CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS alpha_e4
        |  FROM agg
        |)
        |SELECT *, (n_words BETWEEN 50 AND 100000) AND (mwl_e4 BETWEEN 30000 AND 100000)
        |          AND stop_e4 >= 600 AND alpha_e4 >= 8000 AS pass
        |FROM sig""".stripMargin,
    "packing" ->
      """WITH n AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks FROM documents
        |),
        |b AS (
        |  SELECT n_toks,
        |         CASE WHEN n_toks <= 16 THEN 16 WHEN n_toks <= 32 THEN 32
        |              WHEN n_toks <= 48 THEN 48 WHEN n_toks <= 64 THEN 64
        |              WHEN n_toks <= 96 THEN 96 WHEN n_toks <= 128 THEN 128
        |              ELSE 0 END AS ctx
        |  FROM n
        |)
        |SELECT CAST(ctx AS BIGINT) AS ctx, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN ctx > 0 THEN ctx - n_toks ELSE 0 END) AS BIGINT) AS waste
        |FROM b GROUP BY ctx""".stripMargin,
    // placement rank mirrored as one ROW_NUMBER over (md5 bucket, doc_id)
    // within the class — equal to the engine's census-start + in-cell rank
    "packing_assign" ->
      s"""WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) % 1000 AS BIGINT) AS bkt
        |  FROM documents
        |),
        |b AS (
        |  SELECT doc_id, n_toks, bkt,
        |         CAST(CASE WHEN n_toks <= 16 THEN 16 WHEN n_toks <= 32 THEN 32
        |              WHEN n_toks <= 48 THEN 48 WHEN n_toks <= 64 THEN 64
        |              WHEN n_toks <= 96 THEN 96 WHEN n_toks <= 128 THEN 128
        |              ELSE 0 END AS BIGINT) AS ctx
        |  FROM t
        |),
        |r AS (
        |  SELECT doc_id, n_toks, ctx,
        |         ROW_NUMBER() OVER (PARTITION BY ctx ORDER BY bkt, doc_id) - 1 AS r,
        |         ${CurationOps.PackContext} // ctx AS slots
        |  FROM b WHERE ctx > 0
        |)
        |SELECT doc_id, ctx,
        |       CAST(r // slots AS BIGINT) AS bin_no,
        |       CAST(r % slots AS BIGINT) AS slot,
        |       CAST((r % slots) * ctx AS BIGINT) AS bin_offset,
        |       n_toks, CAST(ctx - n_toks AS BIGINT) AS pad
        |FROM r""".stripMargin,
    "lang_mix" ->
      """WITH cells AS (
        |  SELECT lang, source,
        |         CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang, source
        |),
        |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM cells)
        |SELECT c.lang, c.source, c.n_docs, c.n_tokens,
        |       CAST(FLOOR(CAST(c.n_tokens AS DOUBLE) * 10000 / CAST(t.total AS DOUBLE) + 0.5) AS BIGINT) AS share_e4
        |FROM cells c CROSS JOIN t""".stripMargin,
    "curated" ->
      s"""WITH RECURSIVE ${GraphPack.ClustersCte},
         |toks2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |gag AS (
         |  SELECT doc_id, COUNT(*) AS n_words, SUM(len(tok)) AS n_chars,
         |         SUM(CASE WHEN tok IN ('the','a','of','to','and','in','is','that') THEN 1 ELSE 0 END) AS n_stop,
         |         SUM(CASE WHEN regexp_matches(tok, '[a-zA-Z]') THEN 1 ELSE 0 END) AS n_alpha
         |  FROM toks2 GROUP BY doc_id
         |),
         |quality AS (
         |  SELECT doc_id FROM gag
         |  WHERE (n_words BETWEEN 50 AND 100000)
         |    AND (CAST(FLOOR(CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) BETWEEN 30000 AND 100000)
         |    AND CAST(FLOOR(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) >= 600
         |    AND CAST(FLOOR(CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) >= 8000
         |),
         |prio AS (
         |  SELECT doc_id, source,
         |         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) AS BIGINT) AS prio
         |  FROM documents
         |),
         |caps AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY source ORDER BY prio, doc_id) AS rk FROM prio
         |  ) WHERE rk <= 15
         |),
         |dupes AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id)
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id IN (SELECT doc_id FROM quality)
         |  AND d.doc_id IN (SELECT doc_id FROM caps)
         |  AND d.doc_id NOT IN (SELECT doc_id FROM dupes)""".stripMargin,
    "chunks" ->
      s"""WITH n AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents
         |),
         |c AS (
         |  SELECT doc_id, n,
         |         CASE WHEN n <= 32 THEN 1
         |              ELSE CAST(CEIL((n - 32) / CAST(24 AS DOUBLE)) AS BIGINT) + 1 END AS nc
         |  FROM n
         |)
         |SELECT doc_id, CAST(r.i AS BIGINT) AS chunk_no,
         |       CAST(r.i * 24 AS BIGINT) AS start_tok,
         |       CAST(LEAST(32, n - r.i * 24) AS BIGINT) AS n_toks
         |FROM c, range(0, ${OracleLimits.MaxDocTokens}) r(i)
         |WHERE r.i < nc""".stripMargin,
    "mix_plan" ->
      """WITH per AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang
        |),
        |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per)
        |SELECT p.lang, p.n_docs, p.n_tokens,
        |       CAST(FLOOR(CAST(p.n_tokens AS DOUBLE) * 10000 / CAST(t.total AS DOUBLE) + 0.5) AS BIGINT) AS actual_e4,
        |       CAST(CASE p.lang WHEN 'en' THEN 2000 WHEN 'zh' THEN 2000 WHEN 'de' THEN 2000
        |                        WHEN 'fr' THEN 2000 WHEN 'es' THEN 2000 ELSE 0 END AS BIGINT) AS target_e4,
        |       LEAST(10000, CAST(FLOOR(
        |         CAST(CASE p.lang WHEN 'en' THEN 2000 WHEN 'zh' THEN 2000 WHEN 'de' THEN 2000
        |                          WHEN 'fr' THEN 2000 WHEN 'es' THEN 2000 ELSE 0 END AS DOUBLE)
        |         * CAST(t.total AS DOUBLE) / (CAST(p.n_tokens AS DOUBLE) * 10000.0) * 10000 + 0.5) AS BIGINT)) AS keep_e4
        |FROM per p CROSS JOIN t""".stripMargin,
    // decile ladder mirrors the histogram shape: value census -> running
    // sum over distinct values -> integer-DIV decile of the last tied row
    // total-variation drift per source over the corpus quality deciles;
    // integer arithmetic end-to-end, floor(x+0.5) = (2a+b) // (2b)
    "source_drift" ->
      """WITH t AS (
        |  SELECT doc_id, source, length(text) AS n_chars, string_split(text, ' ') AS toks
        |  FROM documents
        |),
        |m AS (
        |  SELECT doc_id, source,
        |         CAST(len(toks) AS INT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on'))) AS INT) AS stop_hits,
        |         n_chars
        |  FROM t
        |),
        |q AS (
        |  SELECT doc_id, source,
        |         CAST(FLOOR(((stop_hits / CAST(n_tokens AS DOUBLE)) * 100.0
        |                     + (n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS quality_e4
        |  FROM m
        |),
        |vc AS (SELECT quality_e4 AS v, COUNT(*) AS cnt FROM q GROUP BY 1),
        |cum AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM vc),
        |nt AS (SELECT COUNT(*) AS n_total FROM q),
        |dec AS (SELECT v, CAST(1 + ((cum - 1) * 10) // n_total AS BIGINT) AS decile
        |        FROM cum CROSS JOIN nt),
        |binned AS (
        |  SELECT q.source, d.decile, COUNT(*) AS n_sd
        |  FROM q JOIN dec d ON q.quality_e4 = d.v
        |  GROUP BY q.source, d.decile
        |),
        |ps AS (SELECT source, SUM(n_sd) AS n_s FROM binned GROUP BY source),
        |pd AS (SELECT decile, SUM(n_sd) AS n_d FROM binned GROUP BY decile),
        |terms AS (
        |  SELECT g.source, g.n_s, nt.n_total,
        |         abs(COALESCE(b.n_sd, 0) * nt.n_total - g.n_d * g.n_s) AS term
        |  FROM (SELECT ps.source, ps.n_s, pd.decile, pd.n_d FROM ps CROSS JOIN pd) g
        |  LEFT JOIN binned b ON g.source = b.source AND g.decile = b.decile
        |  CROSS JOIN nt
        |)
        |SELECT source, CAST(n_s AS BIGINT) AS n_docs,
        |       CAST((20000 * SUM(term) + 2 * n_s * n_total) // (4 * n_s * n_total) AS BIGINT) AS tv_e4
        |FROM terms GROUP BY source, n_s, n_total""".stripMargin,
    "curriculum" ->
      """WITH t AS (
        |  SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS toks
        |  FROM documents
        |),
        |m AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS INT) AS n_tokens,
        |         CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on'))) AS INT) AS stop_hits,
        |         n_chars
        |  FROM t
        |),
        |q AS (
        |  SELECT doc_id,
        |         CAST(FLOOR(((stop_hits / CAST(n_tokens AS DOUBLE)) * 100.0
        |                     + (n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS quality_e4
        |  FROM m
        |),
        |vc AS (SELECT quality_e4 AS v, COUNT(*) AS cnt FROM q GROUP BY 1),
        |cum AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM vc),
        |nt AS (SELECT COUNT(*) AS n_total FROM q),
        |dec AS (SELECT v, CAST(1 + ((cum - 1) * 10) // n_total AS BIGINT) AS decile
        |        FROM cum CROSS JOIN nt),
        |a AS (
        |  SELECT q.doc_id, q.quality_e4, d.decile,
        |         CAST(CAST(('0x' || substring(md5(CAST(q.doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) % 1000 AS BIGINT) AS pri
        |  FROM q JOIN dec d ON q.quality_e4 = d.v
        |)
        |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN pri < decile * 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       MIN(quality_e4) AS q_min, MAX(quality_e4) AS q_max
        |FROM a GROUP BY decile""".stripMargin,
    // BPE iterations: pair spaces bounded by alphabet^2; the merge is the
    // same non-overlapping replace in both engines
    // fertility ladder under the trained merges: marker-string replace
    // is the same non-overlapping merge in both engines; one integer
    // rounding at the end
    "bpe_fertility" ->
      s"""WITH wd AS (
        |  SELECT w, COUNT(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w NOT LIKE '%|%' AND length(w) >= 2
        |    AND length(w) <= ${OracleLimits.MaxWordChars}
        |  GROUP BY w
        |),
        |p1 AS (
        |  SELECT substring(w, i, 1) AS sa, substring(w, i + 1, 1) AS sb,
        |         CAST(SUM(cnt) AS BIGINT) AS pair_cnt
        |  FROM wd, range(1, ${OracleLimits.MaxWordChars}) r(i)
        |  WHERE i + 1 <= length(w)
        |  GROUP BY 1, 2
        |),
        |t1 AS (SELECT sa AS ma, sb AS mb FROM p1 ORDER BY pair_cnt DESC, sa, sb LIMIT 1),
        |mm AS (
        |  SELECT w, cnt,
        |         replace('|' || array_to_string(list_transform(range(1, length(w) + 1),
        |                                          i -> substring(w, CAST(i AS INT), 1)), '|') || '|',
        |                 '|' || ma || '|' || mb || '|', '|' || ma || mb || '|') AS ms
        |  FROM wd CROSS JOIN t1
        |),
        |sl AS (SELECT w, cnt, ms, string_split(ms, '|') AS sl FROM mm),
        |p2 AS (
        |  SELECT sl[i] AS sa, sl[i + 1] AS sb, CAST(SUM(cnt) AS BIGINT) AS pair_cnt
        |  FROM sl, range(1, ${OracleLimits.MaxWordChars + 16}) r(i)
        |  WHERE i + 1 <= len(sl) AND sl[i] <> '' AND sl[i + 1] <> ''
        |  GROUP BY 1, 2
        |),
        |t2 AS (SELECT sa AS ma2, sb AS mb2 FROM p2 ORDER BY pair_cnt DESC, sa, sb LIMIT 1),
        |enc AS (
        |  SELECT cnt, CAST(length(w) AS BIGINT) AS n0,
        |         CAST(len(list_filter(sl, x -> x <> '')) AS BIGINT) AS n1,
        |         CAST(len(list_filter(
        |                string_split(replace(ms, '|' || ma2 || '|' || mb2 || '|',
        |                                     '|' || ma2 || mb2 || '|'), '|'),
        |                x -> x <> '')) AS BIGINT) AS n2
        |  FROM sl CROSS JOIN t2
        |),
        |agg AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_words,
        |         CAST(SUM(cnt * n0) AS BIGINT) AS s0,
        |         CAST(SUM(cnt * n1) AS BIGINT) AS s1,
        |         CAST(SUM(cnt * n2) AS BIGINT) AS s2
        |  FROM enc
        |),
        |l AS (
        |  SELECT 0 AS it, s0 AS total_syms, n_words FROM agg
        |  UNION ALL SELECT 1, s1, n_words FROM agg
        |  UNION ALL SELECT 2, s2, n_words FROM agg
        |)
        |SELECT CAST(it AS INT) AS it, total_syms, n_words,
        |       CAST((20000 * total_syms + n_words) // (2 * n_words) AS BIGINT) AS fertility_e4
        |FROM l""".stripMargin,
    "bpe_merges" ->
      s"""WITH wd AS (
        |  SELECT w, COUNT(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w NOT LIKE '%|%' AND length(w) >= 2
        |    AND length(w) <= ${OracleLimits.MaxWordChars}
        |  GROUP BY w
        |),
        |p1 AS (
        |  SELECT substring(w, i, 1) AS sa, substring(w, i + 1, 1) AS sb,
        |         CAST(SUM(cnt) AS BIGINT) AS pair_cnt
        |  FROM wd, range(1, ${OracleLimits.MaxWordChars}) r(i)
        |  WHERE i + 1 <= length(w)
        |  GROUP BY 1, 2
        |),
        |t1 AS (SELECT sa AS ma, sb AS mb FROM p1 ORDER BY pair_cnt DESC, sa, sb LIMIT 1),
        |m AS (
        |  SELECT w, cnt,
        |         string_split(
        |           replace('|' || array_to_string(list_transform(range(1, length(w) + 1),
        |                                            i -> substring(w, CAST(i AS INT), 1)), '|') || '|',
        |                   '|' || ma || '|' || mb || '|', '|' || ma || mb || '|'),
        |           '|') AS sl
        |  FROM wd CROSS JOIN t1
        |),
        |p2 AS (
        |  SELECT sl[i] AS sa, sl[i + 1] AS sb, CAST(SUM(cnt) AS BIGINT) AS pair_cnt
        |  FROM m, range(1, ${OracleLimits.MaxWordChars + 16}) r(i)
        |  WHERE i + 1 <= len(sl) AND sl[i] <> '' AND sl[i + 1] <> ''
        |  GROUP BY 1, 2
        |),
        |r1 AS (SELECT 1 AS it, sa, sb, pair_cnt,
        |              ROW_NUMBER() OVER (ORDER BY pair_cnt DESC, sa, sb) AS rnk FROM p1),
        |r2 AS (SELECT 2 AS it, sa, sb, pair_cnt,
        |              ROW_NUMBER() OVER (ORDER BY pair_cnt DESC, sa, sb) AS rnk FROM p2)
        |SELECT it, sa, sb, pair_cnt, rnk FROM r1 WHERE rnk <= 15
        |UNION ALL
        |SELECT it, sa, sb, pair_cnt, rnk FROM r2 WHERE rnk <= 15""".stripMargin,
    "vocab_top" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT 1 AS n, u.tok AS gram FROM toks, unnest(t) AS u(tok)),
        |bi AS (
        |  SELECT 2 AS n, t[i] || ' ' || t[i+1] AS gram
        |  FROM toks, range(1, ${OracleLimits.MaxDocTokens}) r(i) WHERE i + 1 <= len(t)
        |),
        |counts AS (
        |  SELECT n, gram, COUNT(*) AS cnt
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
        |  GROUP BY n, gram
        |),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY n ORDER BY cnt DESC, gram) AS rnk
        |  FROM counts
        |)
        |SELECT n, gram, cnt, rnk FROM ranked WHERE rnk <= 25""".stripMargin
  )
}
