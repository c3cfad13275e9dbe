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

    // output cached, not just the instance stream: the per-doc score
    // frame is read by the trigram_backoff query, pplBuckets, AND
    // scoreCorr-adjacent composers — the 5-way backoff join re-runs per
    // consumer otherwise (CacheManager converges the identical plans)
    graft.Caching.maybeCache(joined
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
          .cast("long").as("backoff_e4")))
  }
  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * per LANGUAGE, split the corpus into head/middle/tail thirds by LM
    * score — CCNet keeps head+middle for training and the split IS its
    * quality tiering. Score = [[trigramBackoff]]'s backoff_e4 (higher =
    * more fluent), so head = the top-scoring third, CCNet's
    * lowest-perplexity third.
    *
    * Band-census split, NOT a per-language sort of the corpus: scores
    * are e4-quantized ints, so the (lang, score) census is bounded by
    * |langs|·|score values| rows; the cumulative window runs on that
    * census and docs join their band's bucket back by (lang, score). A
    * band straddling a third boundary is assigned whole, by its START
    * position — deterministic, and the tie convention a percentile cut
    * applies to equal scores anyway. Consequence (by design, so the
    * frozen [[trainPplCutoffs]] score cutoffs can replay the split
    * exactly): a single score value holding more than a third of a
    * language swallows that whole third — the thirds are only as even
    * as the score distribution allows a pure-score cutoff to be. Docs
    * under 3 tokens have no trigram and are absent, as in
    * [[trigramBackoff]]. */
  def pplBuckets(docs: DataFrame): DataFrame = {
    // cached: read by the census and by the final doc-level join
    val scored = graft.Caching.maybeCache(
      trigramBackoff(docs).select(col("doc_id"), col("backoff_e4"))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))
    val census = scored.groupBy("lang", "backoff_e4").agg(count(lit(1)).as("c"))
    val wl = Window.partitionBy("lang").orderBy(col("backoff_e4").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cb = census.withColumn("cum_before", coalesce(sum(col("c")).over(wl), lit(0L)))
    val tot = census.groupBy("lang").agg(sum(col("c")).as("n"))
    val band = cb.join(tot, Seq("lang"))
      .select(col("lang"), col("backoff_e4"),
        when(col("cum_before") * 3 < col("n"), "head")
          .when(col("cum_before") * 3 < col("n") * 2, "middle")
          .otherwise("tail").as("bucket"))
    scored.join(band, Seq("lang", "backoff_e4"))
      .select(col("doc_id"), col("lang"), col("backoff_e4"), col("bucket"))
  }

  /** The frozen serve-time form of [[pplBuckets]]: per-language score
    * cutoffs (head_min_e4 = lowest score still in the head third,
    * middle_min_e4 likewise). Train once on the reference corpus, then
    * bucket NEW documents — batch via [[applyPplCutoffs]], streaming by
    * composing [[graft.streaming.StreamingOps.backoffScoreStream]] with
    * the same broadcast stream-static join — without re-censusing. On
    * the training corpus itself the application reproduces
    * [[pplBuckets]] EXACTLY (the cutoff is a faithful summary of the
    * band census; differential-tested). A language whose corpus slice
    * never produced a middle/tail band carries null cutoffs there —
    * unseen lower scores then fall through to tail, the conservative
    * serve-time default. */
  def trainPplCutoffs(docs: DataFrame): DataFrame =
    pplBuckets(docs).groupBy("lang").agg(
      min(when(col("bucket") === "head", col("backoff_e4"))).as("head_min_e4"),
      min(when(col("bucket") === "middle", col("backoff_e4"))).as("middle_min_e4"))

  /** Bucket scored docs (doc_id, lang, backoff_e4) with frozen
    * [[trainPplCutoffs]]: one broadcast join, no census — the shape that
    * buckets an unbounded ingest stream at 100 TB. */
  def applyPplCutoffs(scored: DataFrame, cutoffs: DataFrame): DataFrame =
    scored.join(broadcast(cutoffs), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("backoff_e4"),
        when(col("head_min_e4").isNotNull && col("backoff_e4") >= col("head_min_e4"), "head")
          .when(col("middle_min_e4").isNotNull && col("backoff_e4") >= col("middle_min_e4"), "middle")
          .otherwise("tail").as("bucket"))

  /** A trained stupid-backoff trigram LM as data: the three count tables
    * plus the train-token total — everything the backoff ladder needs.
    * Produced offline by [[trainTrigramLm]]; consumed at serve time by
    * streaming/StreamingOps.backoffScoreStream via stream-static joins
    * (the trigram analogue of [[CurationOps.BigramLm]]). */
  case class TrigramLm(uni: DataFrame, bi: DataFrame, tri: DataFrame, nTokens: Long)

  /** Train the [[TrigramLm]] on the SAME md5-bucket half of the corpus
    * that [[trigramBackoff]] trains on, so the streaming scorer is the
    * exact serve-time twin of the batch query (differential-tested).
    * Count tables are cached — they are the static side of every
    * stream-static join downstream; the token total is materialized
    * eagerly (one scalar action) because the stream scorer needs it as a
    * literal. */
  def trainTrigramLm(docs: DataFrame): TrigramLm = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val inst = docs
      .filter(stableHash60(col("doc_id").cast("string")) % 100L < TrainBuckets)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
    val uni = graft.Caching.maybeCache(
      inst.groupBy(col("tok").as("u")).agg(count(lit(1)).as("cu")))
    val bi = graft.Caching.maybeCache(
      inst.filter(col("t1").isNotNull)
        .groupBy(col("tok").as("ba"), col("t1").as("bb")).agg(count(lit(1)).as("cb")))
    val tri = graft.Caching.maybeCache(
      inst.filter(col("t2").isNotNull)
        .groupBy(col("tok").as("ta"), col("t1").as("tb"), col("t2").as("tc"))
        .agg(count(lit(1)).as("ct")))
    val n = inst.count()
    TrigramLm(uni, bi, tri, n)
  }

  /** A trained DSIR scorer as data: the B-row bucket-ratio table plus the
    * ratio an UNSEEN bucket gets (t=0, r=0 under the same add-one
    * smoothing — possible at serve time, impossible in batch where every
    * scored instance is also a raw-corpus instance). Consumed by
    * streaming/StreamingOps.dsirScoreStream via a stream-static join. */
  case class DsirModel(ratio: DataFrame, defaultRatioE6: Long)

  /** Train the [[DsirModel]] on a corpus: the exact bucket-ratio frame
    * [[dsirWeights]] builds internally, cached (it is the static side of
    * every stream-static join downstream), plus the unseen-bucket
    * default materialized as a literal (one scalar action). */
  def trainDsir(docs: DataFrame): DsirModel = {
    val B = DsirBuckets
    val target = CurationOps.gopherRules(docs)
      .filter(col("pass")).select(col("doc_id").as("t_id"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val inst = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .filter(col("t1").isNotNull)
      .join(target, col("doc_id") === col("t_id"), "left")
      .select(
        col("doc_id"),
        (stableHash60(concat_ws(" ", col("tok"), col("t1"))) % B).as("b"),
        col("t_id").isNotNull.as("in_target"))
    val raw = inst.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgt = inst.filter(col("in_target")).groupBy("b").agg(count(lit(1)).as("ct"))
    val totals = inst.select(
      count(lit(1)).as("rn"),
      sum(when(col("in_target"), 1L).otherwise(0L)).as("tn"))
    val ratio = graft.Caching.maybeCache(raw
      .join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        floor((coalesce(col("ct"), lit(0L)) + 1) / (col("cr") + 1)
          * ((col("rn") + B) / (col("tn") + B)) * 1000000L + 0.5)
          .cast("long").as("ratio_e6")))
    val d = totals
      .select(floor((lit(0L) + 1) / (lit(0L) + 1).cast("double")
        * ((col("rn") + B) / (col("tn") + B)) * 1000000L + 0.5).cast("long"))
      .collect()(0).getLong(0)
    DsirModel(ratio, d)
  }

  /** Hashed-feature bucket count for [[dsirWeights]] — small enough that
    * the bucket-ratio table always broadcasts, large enough that bucket
    * collisions wash out (the paper uses 10k buckets at web scale; the
    * ratio table is B rows regardless of corpus size). */
  val DsirBuckets = 512L

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): each doc scored by how
    * much its hashed-bigram distribution looks like a curated TARGET
    * corpus relative to the RAW corpus. Target here = the
    * [[CurationOps.gopherRules]]-passing subset (the repo's quality
    * reference); raw = everything. Per bucket b: add-one-smoothed
    * probability ratio (t_b+1)(R+B) / ((r_b+1)(T+B)); per doc: the
    * count-weighted arithmetic mean of its instances' bucket ratios —
    * the arithmetic variant of the paper's log-product weight (same
    * tradeoff as [[CurationOps.bigramFluency]]: monotone filtering
    * signal, zero transcendentals, so the oracle is bit-exact).
    * Selection is then top-k by `imp_e6` (the paper's deterministic
    * top-k alternative to Gumbel resampling) via orderBy/limit or a
    * threshold — both engine-trivial on this output.
    *
    * Shape at 100 TB: two single-pass groupBys build the B-row bucket
    * tables (map-side combined; B = [[DsirBuckets]]); the ratio table
    * broadcasts; scoring is one broadcast hash join over the instance
    * stream plus one map-side-combined groupBy(doc_id). No self-joins,
    * no windows over the corpus. Docs under 2 tokens have no bigram and
    * are absent. */
  def dsirWeights(docs: DataFrame): DataFrame = {
    val B = DsirBuckets
    val target = CurationOps.gopherRules(docs)
      .filter(col("pass")).select(col("doc_id").as("t_id"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val inst = graft.Caching.maybeCache(
      docs
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("t1", lead("tok", 1).over(w))
        .filter(col("t1").isNotNull)
        .join(target, col("doc_id") === col("t_id"), "left")
        .select(
          col("doc_id"),
          (stableHash60(concat_ws(" ", col("tok"), col("t1"))) % B).as("b"),
          col("t_id").isNotNull.as("in_target")))

    val raw = inst.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgt = inst.filter(col("in_target")).groupBy("b").agg(count(lit(1)).as("ct"))
    val totals = inst.select(
      count(lit(1)).as("rn"),
      sum(when(col("in_target"), 1L).otherwise(0L)).as("tn"))
    val ratio = raw
      .join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        floor((coalesce(col("ct"), lit(0L)) + 1) / (col("cr") + 1)
          * ((col("rn") + B) / (col("tn") + B)) * 1000000L + 0.5)
          .cast("long").as("ratio_e6"))

    // output cached: read by the dsir_weights query, dsirSelect, and
    // scoreCorr — one broadcast-join + fold instead of three
    graft.Caching.maybeCache(inst
      .join(broadcast(ratio), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("ratio_e6")).as("r_sum"))
      .select(col("doc_id"), col("n_feats"),
        floor(col("r_sum").cast("double") / col("n_feats") + 0.5)
          .cast("long").as("imp_e6")))
  }

  /** DSIR step 2 — SELECTION: keep documents in DESCENDING importance
    * order until the token budget is exhausted (the paper's
    * deterministic top-k alternative to Gumbel resampling, closed over
    * [[dsirWeights]]'s step-1 scores). Output: one row per scored doc
    * (docs under 2 tokens have no bigram features and are absent, same
    * contract as [[dsirWeights]]) with `kept` = true iff the doc makes
    * the cut.
    *
    * Same two-phase census shape as [[CurationOps.tokenBudgetCut]], with
    * the importance ORDER carried by a bounded range bucketing: imp_e6
    * is mapped order-preservingly into at most 1000 `qband` buckets via
    * a broadcast (min, max) scalar pair — qband = (imp − lo) · 1000 /
    * (hi − lo + 1), integer math, monotone in imp_e6 and equal imps
    * always share a band — so the census the cumulative window runs on
    * is ≤ 1000 rows BY CONSTRUCTION (the r8 verdict's watch item 2: the
    * previous census over DISTINCT imp_e6 values had a data-dependent,
    * unmeasured cardinality through one window task). The census finds
    * which buckets are wholly kept / dropped; only the single bucket
    * straddling the boundary gets a within-bucket running sum — ordered
    * (imp_e6 DESC, doc_id), the exact global priority, so the kept set
    * is IDENTICAL to a full-precision cut and the oracle is unchanged —
    * and only ITS docs (~corpus/1000; worst case one bucket when all
    * importances collide, same degenerate tail as any priority cut with
    * tied priorities) flow through that window. Greedy boundary
    * convention matches [[CurationOps.tokenBudgetBoundary]]: a doc is
    * kept iff the budget is not exhausted BEFORE it, so the boundary
    * doc itself is taken. */
  /** The band projection over an (imp_e6, lo, hi) frame: integral DIV
    * (the [[DataLayoutOps.exactQuantiles]] convention), NOT Column `/` —
    * true division yields a fractional DOUBLE, one band per distinct
    * imp_e6, and the ≤1000 bound would be a no-op. qband is a LONG in
    * [0, 1000), monotone in imp_e6, equal imps share a band. */
  private[graft] def qbandCol: org.apache.spark.sql.Column =
    expr("((imp_e6 - lo) * 1000L) DIV (hi - lo + 1L)")

  def dsirSelect(docs: DataFrame, budgetTokens: Long = 10000L): DataFrame = {
    // cached: read by the bounds scalar and the qband projection (and
    // measured faster than recomputing off the cached dsirWeights)
    val sel = graft.Caching.maybeCache(
      dsirWeights(docs).join(
        docs.select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_toks")),
        Seq("doc_id")))
    // order-preserving bounded bucketing: one scalar (lo, hi) broadcast;
    // long math is exact ((hi−lo)·1000 fits a long for any e6 range the
    // smoothed ratio can produce — overflow needs a 9.2e15 value spread)
    val bounds = sel.agg(min(col("imp_e6")).as("lo"), max(col("imp_e6")).as("hi"))
    val withQ = graft.Caching.maybeCache(
      sel.crossJoin(broadcast(bounds))
        .withColumn("qband", qbandCol)
        .drop("lo", "hi"))
    val census = withQ.groupBy("qband").agg(sum(col("n_toks")).as("band_tokens"))
    val wb = Window.orderBy(col("qband").desc).rowsBetween(Window.unboundedPreceding, -1)
    val cb = census
      .withColumn("cum_before", coalesce(sum(col("band_tokens")).over(wb), lit(0L)))
    // the one straddling bucket + its residual budget: <= 1 row, broadcast
    val partial = cb
      .filter(col("cum_before") < budgetTokens &&
        col("cum_before") + col("band_tokens") > budgetTokens)
      .select(col("qband").as("pband"),
        (lit(budgetTokens) - col("cum_before")).as("residual"))
    val win = Window.partitionBy("qband").orderBy(col("imp_e6").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val partDocs = withQ.join(broadcast(partial), col("qband") === col("pband"))
      .withColumn("cum_doc", coalesce(sum(col("n_toks")).over(win), lit(0L)))
      .select(col("doc_id"), (col("cum_doc") < col("residual")).as("part_kept"))
    withQ
      .join(broadcast(cb.select(col("qband"), col("cum_before"), col("band_tokens"))),
        Seq("qband"))
      .join(partDocs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"), col("imp_e6"),
        when(col("cum_before") + col("band_tokens") <= budgetTokens, lit(true))
          .when(col("cum_before") >= budgetTokens, lit(false))
          .otherwise(col("part_kept")).as("kept"))
  }
  /** Sources forming the trusted (positive) class for [[nbScore]] /
    * [[nbTopFeatures]] — the CCNet setup (Wenzek et al. 2020): a curated
    * reference corpus (Wikipedia there; two fixture sources here) vs the
    * raw remainder. */
  val NbTrusted: Seq[String] = Seq("src0", "src1")

  /** The smoothed posterior as an e9 column, given this token's class
    * counts — evaluated over a frame that carries the broadcast totals
    * (np, nn, v) and priors (dp, dn) columns. One fixed parenthesization
    * shared by the vocab table AND the unseen-token default, mirrored
    * verbatim in the oracle SQL. */
  private def nbPostE9(cp: org.apache.spark.sql.Column,
      cn: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val pi = col("dp") / col("dn").cast("double")
    val pp = (cp + 1) / (col("np") + col("v")).cast("double")
    val pn = (cn + 1) / (col("nn") + col("v")).cast("double")
    floor((pi * pp) / ((pi * pp) + ((lit(1.0) - pi) * pn)) * 1000000000L + 0.5)
      .cast("long")
  }

  /** (cached instance stream, class-count frame, one-row totals, one-row
    * doc priors) for the trusted-vs-rest NB model. The instance cache is
    * shared by training counts AND [[nbScore]]'s scoring side, so the
    * corpus parses once per query. */
  private def nbCounts(
      docs: DataFrame, trusted: Seq[String]): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val inst = graft.Caching.maybeCache(
      docs.select(
        col("doc_id"),
        col("source").isInCollection(trusted).as("pos"),
        explode(tokens(col("text"))).as("tok")))
    val stats = inst.groupBy("tok").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
    val totals = inst.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("nn"),
      countDistinct(col("tok")).as("v"))
    val priors = docs.agg(
      sum(when(col("source").isInCollection(trusted), 1L).otherwise(0L)).as("dp"),
      count(lit(1)).as("dn"))
    (inst, stats, totals, priors)
  }

  /** Add-one-smoothed Multinomial-Naive-Bayes token posteriors for the
    * trusted-vs-rest classifier: per token, P(trusted | token) under the
    * doc-count prior,
    *   post = pi·pp / (pi·pp + (1-pi)·pn),
    *   pp = (c_pos+1)/(N_pos+V),  pn = (c_neg+1)/(N_neg+V),
    *   pi = docs_pos/docs,
    * scaled to e9. All rationals of exact counts with one fixed
    * parenthesization, so the oracle is bit-exact (the
    * [[CurationOps.bigramFluency]] discipline) — the posterior-mean
    * score is the arithmetic variant of the NB log-odds sum: same
    * ordering signal, zero transcendentals.
    *
    * Cached: the instance stream feeds three aggregates (class counts,
    * totals, and each consumer's per-doc counts), and the posterior
    * table itself is read by both the scorer and the feature report. */
  private def nbPosteriors(docs: DataFrame, trusted: Seq[String]): DataFrame = {
    val (_, stats, totals, priors) = nbCounts(docs, trusted)
    graft.Caching.maybeCache(
      stats.crossJoin(broadcast(totals)).crossJoin(broadcast(priors))
        .select(col("tok"), col("cp"), col("cn"),
          nbPostE9(col("cp"), col("cn")).as("post_e9")))
  }

  /** A trained NB quality classifier as data: the vocab-sized posterior
    * table plus the posterior an UNSEEN token gets (c_pos = c_neg = 0
    * under the same add-one smoothing — possible at serve time,
    * impossible in batch where every scored token is also a training
    * token). Consumed by streaming/StreamingOps.nbScoreStream via a
    * stream-static join (the [[DsirModel]] pattern). */
  case class NbModel(post: DataFrame, defaultPostE9: Long)

  /** Train the [[NbModel]]: the exact posterior frame [[nbScore]] joins
    * against, cached (it is the static side of every stream-static join
    * downstream), plus the unseen-token default materialized as a
    * literal (one scalar action). */
  def trainNb(docs: DataFrame, trusted: Seq[String] = NbTrusted): NbModel = {
    val (_, _, totals, priors) = nbCounts(docs, trusted)
    val d = totals.crossJoin(priors)
      .select(nbPostE9(lit(0L), lit(0L)))
      .collect()(0).getLong(0)
    NbModel(nbPosteriors(docs, trusted), d)
  }

  /** The learned quality filter of the CCNet / GPT-3 data pipelines
    * (Wenzek et al. 2020; Brown et al. 2020 appendix A): a classifier
    * trained to distinguish a trusted corpus from the raw pool, applied
    * to every doc as a curation score. Model = Multinomial Naive Bayes
    * over whitespace tokens (the linear-classifier-over-token-features
    * family fastText belongs to, trainable in ONE aggregation pass —
    * no SGD, no iteration); score = count-weighted mean of per-token
    * posteriors P(trusted|token), `pred_trusted` = score ≥ 0.5.
    *
    * Shape at 100 TB: training is one explode + two map-side-combined
    * groupBys (the same shape as the [[dsirWeights]] count tables);
    * the posterior table is VOCAB-sized — independent of corpus row
    * count — so scoring joins the per-doc DISTINCT token counts against
    * it (broadcast when vocab fits, shuffle otherwise; stop-word key
    * skew is AQE's skew-join case) and rolls up per doc. No windows, no
    * self-joins. Training docs score under the full model (standard for
    * a corpus audit; the held-out variant is [[trigramBackoff]]'s
    * split). */
  /** Default decision threshold for [[nbScore]]: posterior-mean ≥ 0.5,
    * i.e. "more trusted than not" — the symmetric prior-free cut. A
    * deployment tunes it against a labeled sample (precision/recall
    * trade); it is a public knob here for exactly that reason, with a
    * non-default twin oracled (`nb_score_t10`) the dedup_jaccard64 way. */
  val NbThresholdE4 = 5000L

  def nbScore(
      docs: DataFrame, trusted: Seq[String] = NbTrusted,
      thresholdE4: Long = NbThresholdE4): DataFrame = {
    // the SAME cached instance frame training aggregates over — the
    // scoring side projects from it, so the corpus parses once
    val (inst, _, _, _) = nbCounts(docs, trusted)
    val post = nbPosteriors(docs, trusted)
    inst
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .join(post.select("tok", "post_e9"), Seq("tok"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_toks"), sum(col("cnt") * col("post_e9")).as("p_sum_e9"))
      .select(
        col("doc_id"), col("n_toks"),
        floor(col("p_sum_e9").cast("double") / col("n_toks") / 100000L + 0.5)
          .cast("long").as("nb_e4"))
      .withColumn("pred_trusted", col("nb_e4") >= thresholdE4)
  }

  /** Interpretability report for [[nbScore]]: the k most trusted-
    * discriminative and k most untrusted-discriminative tokens (highest /
    * lowest posterior, ties broken by token), restricted to tokens seen
    * at least `minCount` times — the "what does the filter key on"
    * audit a curation owner reads before deploying a learned classifier
    * (fastText's `predict`-explain equivalent). Two-phase top-k over the
    * vocab-sized posterior table (per-partition prune, then the global
    * k-row window) — never a total order over the vocabulary. */
  def nbTopFeatures(
      docs: DataFrame, trusted: Seq[String] = NbTrusted,
      k: Int = 10, minCount: Long = 3L): DataFrame = {
    val f = graft.Caching.maybeCache(
      nbPosteriors(docs, trusted).filter(col("cp") + col("cn") >= minCount))
    def topK(side: String, ord: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val perPart = Window.partitionBy(spark_partition_id()).orderBy(ord: _*)
      f.withColumn("prnk", row_number().over(perPart))
        .filter(col("prnk") <= k)
        .drop("prnk")
        .withColumn("rnk", row_number().over(Window.orderBy(ord: _*)))
        .filter(col("rnk") <= k)
        .select(lit(side).as("side"), col("tok"), col("cp"), col("cn"), col("post_e9"), col("rnk"))
    }
    topK("trusted", Seq(col("post_e9").desc, col("tok")))
      .unionByName(topK("untrusted", Seq(col("post_e9").asc, col("tok"))))
  }

  /** Cross-score calibration report: exact Pearson correlations between
    * the three per-doc quality signals the engine ships — the heuristic
    * [[TextOps.quality]] score, the LM [[CurationOps.bigramFluency]], and
    * the [[dsirWeights]] importance weight. This is the "does the cheap
    * filter predict the expensive one" question a curation owner asks
    * before swapping filters; a low correlation means the cascade stages
    * are measuring different things (keep both), a high one means the
    * cheaper stage can gate earlier (see [[CurationOps.cascadePlan]]).
    *
    * Arithmetic discipline: all five moments accumulate in
    * decimal(38,0) (exact at any corpus size — sums of e4/e6 scores
    * cross 2^63 around 10^13 docs, and the oracle's 128-bit HUGEINT
    * matches decimal(38,0) exactly); only the final r computation drops
    * to doubles, identically parenthesized in both engines. One inner
    * 3-way join on doc_id, one map-side-combined 10-sum aggregate; the
    * unpivot runs on a single row. */
  def scoreCorr(docs: DataFrame): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val q = TextOps.quality(docs).select(col("doc_id"), col("quality_e4").as("xq"))
    val f = CurationOps.bigramFluency(docs).select(col("doc_id"), col("fluency_e4").as("xf"))
    val dz = dsirWeights(docs).select(col("doc_id"), col("imp_e6").as("xd"))
    val a = q.join(f, Seq("doc_id")).join(dz, Seq("doc_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("xq"))).as("sq"), sum(dec(col("xf"))).as("sf"),
        sum(dec(col("xd"))).as("sd"),
        sum(dec(col("xq")) * dec(col("xq"))).as("sqq"),
        sum(dec(col("xf")) * dec(col("xf"))).as("sff"),
        sum(dec(col("xd")) * dec(col("xd"))).as("sdd"),
        sum(dec(col("xq")) * dec(col("xf"))).as("sqf"),
        sum(dec(col("xq")) * dec(col("xd"))).as("sqd"),
        sum(dec(col("xf")) * dec(col("xd"))).as("sfd"))
      .filter(col("n") > 0)
    val rows = a.select(col("n"), expr(
      """stack(3,
        |  'quality_vs_fluency', sq, sf, sqq, sff, sqf,
        |  'quality_vs_dsir', sq, sd, sqq, sdd, sqd,
        |  'fluency_vs_dsir', sf, sd, sff, sdd, sfd) AS (pair, sx, sy, sxx, syy, sxy)""".stripMargin))
    val nD = dec(col("n"))
    val num = (nD * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (nD * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (nD * col("syy") - col("sy") * col("sy")).cast("double")
    rows.select(col("pair"), col("n"),
      when(vx > 0 && vy > 0,
        floor(num / sqrt(vx * vy) * 10000 + 0.5).cast("long")).as("corr_e4"))
  }
}

object LmPack extends graft.QueryPack {
  private def d(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "trigram_backoff" -> ((s, dir) => LmOps.trigramBackoff(d(s, dir))),
    "dsir_weights" -> ((s, dir) => LmOps.dsirWeights(d(s, dir))),
    "dsir_select" -> ((s, dir) => LmOps.dsirSelect(d(s, dir))),
    "ppl_buckets" -> ((s, dir) => LmOps.pplBuckets(d(s, dir))),
    "score_corr" -> ((s, dir) => LmOps.scoreCorr(d(s, dir))),
    "nb_score" -> ((s, dir) => LmOps.nbScore(d(s, dir))),
    "nb_score_t10" -> ((s, dir) => LmOps.nbScore(d(s, dir), thresholdE4 = 1000L)),
    "nb_top_feats" -> ((s, dir) => LmOps.nbTopFeatures(d(s, dir)))
  )

  /** The NB posterior table as CTEs ending in `post(tok, cp, cn,
    * post_e9)` — shared by the nb_score and nb_top_feats oracles;
    * arithmetic parenthesized exactly as [[LmOps.nbPosteriors]]. */
  private val NbCtes = {
    val trusted = LmOps.NbTrusted.map(s => s"'$s'").mkString(", ")
    s"""lab AS (
       |  SELECT doc_id, source IN ($trusted) AS pos, string_split(text, ' ') AS t
       |  FROM documents
       |),
       |inst AS (SELECT doc_id, pos, unnest(t) AS tok FROM lab),
       |stats AS (
       |  SELECT tok,
       |         SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
       |         SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
       |  FROM inst GROUP BY tok
       |),
       |tot AS (
       |  SELECT SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
       |         SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS nn,
       |         COUNT(DISTINCT tok) AS v
       |  FROM inst
       |),
       |pri AS (SELECT SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS dp, COUNT(*) AS dn FROM lab),
       |post AS (
       |  SELECT tok, CAST(cp AS BIGINT) AS cp, CAST(cn AS BIGINT) AS cn,
       |         CAST(FLOOR(((dp / CAST(dn AS DOUBLE)) * ((cp + 1) / CAST(np + v AS DOUBLE)))
       |           / (((dp / CAST(dn AS DOUBLE)) * ((cp + 1) / CAST(np + v AS DOUBLE)))
       |              + ((1.0 - dp / CAST(dn AS DOUBLE)) * ((cn + 1) / CAST(nn + v AS DOUBLE))))
       |           * 1000000000 + 0.5) AS BIGINT) AS post_e9
       |  FROM stats, tot, pri
       |)""".stripMargin
  }

  /** The split-bucket predicate, identical to the Spark side's
    * stableHash60(doc_id) % 100 < TrainBuckets. */
  private val InTrain =
    s"CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 18, 15)) AS UBIGINT) % 100 AS BIGINT) < ${LmOps.TrainBuckets}"

  /** The full DSIR chain as CTEs ending in `dw(doc_id, n_feats, imp_e6)`
    * — shared by the dsir_weights and score_corr oracles. */
  private val DsirCtes =
    s"""toks AS (
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
       |tgt AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, n_words,
       |           CAST(FLOOR(CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS mwl_e4,
       |           CAST(FLOOR(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS stop_e4,
       |           CAST(FLOOR(CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS alpha_e4
       |    FROM agg
       |  ) WHERE (n_words BETWEEN 50 AND 100000) AND (mwl_e4 BETWEEN 30000 AND 100000)
       |          AND stop_e4 >= 600 AND alpha_e4 >= 8000
       |),
       |ta AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |inst AS (
       |  SELECT ta.doc_id,
       |         CAST(CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1]), 18, 15)) AS UBIGINT) % ${LmOps.DsirBuckets} AS BIGINT) AS b,
       |         tgt.doc_id IS NOT NULL AS in_target
       |  FROM ta LEFT JOIN tgt ON ta.doc_id = tgt.doc_id,
       |       range(1, ${OracleLimits.MaxDocTokens}) r(i)
       |  WHERE i + 1 <= len(t)
       |),
       |raw AS (SELECT b, COUNT(*) AS cr FROM inst GROUP BY b),
       |tg AS (SELECT b, COUNT(*) AS ct FROM inst WHERE in_target GROUP BY b),
       |tot AS (
       |  SELECT COUNT(*) AS rn,
       |         SUM(CASE WHEN in_target THEN 1 ELSE 0 END) AS tn
       |  FROM inst
       |),
       |ratio AS (
       |  SELECT raw.b,
       |         CAST(FLOOR((COALESCE(tg.ct, 0) + 1) / (raw.cr + 1)
       |           * ((tot.rn + ${LmOps.DsirBuckets}) / (tot.tn + ${LmOps.DsirBuckets})) * 1000000 + 0.5) AS BIGINT) AS ratio_e6
       |  FROM raw LEFT JOIN tg ON raw.b = tg.b, tot
       |),
       |dw AS (
       |  SELECT inst.doc_id,
       |         CAST(COUNT(*) AS BIGINT) AS n_feats,
       |         CAST(FLOOR(CAST(SUM(ratio_e6) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS imp_e6
       |  FROM inst JOIN ratio ON inst.b = ratio.b
       |  GROUP BY inst.doc_id
       |)""".stripMargin

  /** nb_score oracle, parameterized by the decision threshold the way
    * the Scala side's `thresholdE4` knob is. */
  private def nbScoreSql(thresholdE4: Long): String =
    s"""WITH $NbCtes,
       |dcnt AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM inst GROUP BY 1, 2),
       |sc AS (
       |  SELECT doc_id,
       |         CAST(SUM(cnt) AS BIGINT) AS n_toks,
       |         CAST(FLOOR(CAST(SUM(cnt * post_e9) AS DOUBLE) / SUM(cnt) / 100000 + 0.5) AS BIGINT) AS nb_e4
       |  FROM dcnt JOIN post USING (tok)
       |  GROUP BY doc_id
       |)
       |SELECT doc_id, n_toks, nb_e4, nb_e4 >= $thresholdE4 AS pred_trusted FROM sc""".stripMargin

  /** The stupid-backoff chain as CTEs ending in `bs(doc_id, n_trigrams,
    * n_tri, n_bi, n_uni, backoff_e4)` — shared by the trigram_backoff
    * and ppl_buckets oracles. */
  private val BackoffCtes =
      s"""toks AS (
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
         |),
         |bs AS (
         |  SELECT doc_id,
         |         CAST(SUM(cnt) AS BIGINT) AS n_trigrams,
         |         CAST(SUM(CASE WHEN lvl = 'tri' THEN cnt ELSE 0 END) AS BIGINT) AS n_tri,
         |         CAST(SUM(CASE WHEN lvl = 'bi' THEN cnt ELSE 0 END) AS BIGINT) AS n_bi,
         |         CAST(SUM(CASE WHEN lvl = 'uni' THEN cnt ELSE 0 END) AS BIGINT) AS n_uni,
         |         CAST(FLOOR(CAST(SUM(cnt * s_e9) AS DOUBLE) / SUM(cnt) / 100000 + 0.5) AS BIGINT) AS backoff_e4
         |  FROM s GROUP BY doc_id
         |)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "trigram_backoff" ->
      s"""WITH $BackoffCtes
         |SELECT doc_id, n_trigrams, n_tri, n_bi, n_uni, backoff_e4 FROM bs""".stripMargin,
    // CCNet head/middle/tail: per-language thirds over the (lang, score)
    // band census, bands assigned whole by their start position
    "ppl_buckets" ->
      s"""WITH $BackoffCtes,
         |ld AS (
         |  SELECT d.doc_id, d.lang, s.backoff_e4
         |  FROM documents d JOIN bs s ON d.doc_id = s.doc_id
         |),
         |pcensus AS (
         |  SELECT lang, backoff_e4, CAST(COUNT(*) AS BIGINT) AS c FROM ld GROUP BY lang, backoff_e4
         |),
         |pcb AS (
         |  SELECT lang, backoff_e4, c,
         |         COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY backoff_e4 DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM pcensus
         |),
         |ptot AS (SELECT lang, SUM(c) AS n FROM pcensus GROUP BY lang),
         |pband AS (
         |  SELECT pcb.lang, pcb.backoff_e4,
         |         CASE WHEN pcb.cum_before * 3 < t.n THEN 'head'
         |              WHEN pcb.cum_before * 3 < t.n * 2 THEN 'middle'
         |              ELSE 'tail' END AS bucket
         |  FROM pcb JOIN ptot t ON pcb.lang = t.lang
         |)
         |SELECT ld.doc_id, ld.lang, ld.backoff_e4, pb.bucket
         |FROM ld JOIN pband pb ON ld.lang = pb.lang AND ld.backoff_e4 = pb.backoff_e4""".stripMargin,
    "dsir_weights" ->
      s"""WITH $DsirCtes
         |SELECT doc_id, n_feats, imp_e6 FROM dw""".stripMargin,
    // step-2 selection: descending-importance census cut at 10000 tokens,
    // boundary band broken by doc_id with the greedy take-the-boundary-doc
    // convention — mirrors LmOps.dsirSelect band for band
    "dsir_select" ->
      s"""WITH $DsirCtes,
         |selx AS (
         |  SELECT dw.doc_id, dw.imp_e6, CAST(len(t.t) AS BIGINT) AS n_toks
         |  FROM dw JOIN ta t ON dw.doc_id = t.doc_id
         |),
         |bcensus AS (
         |  SELECT imp_e6, CAST(SUM(n_toks) AS BIGINT) AS band_tokens FROM selx GROUP BY imp_e6
         |),
         |bcb AS (
         |  SELECT imp_e6, band_tokens,
         |         COALESCE(SUM(band_tokens) OVER (ORDER BY imp_e6 DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM bcensus
         |),
         |pband AS (
         |  SELECT imp_e6 AS pb, 10000 - cum_before AS residual FROM bcb
         |  WHERE cum_before < 10000 AND cum_before + band_tokens > 10000
         |),
         |pdocs AS (
         |  SELECT s.doc_id,
         |         COALESCE(SUM(s.n_toks) OVER (PARTITION BY s.imp_e6 ORDER BY s.doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) < p.residual AS part_kept
         |  FROM selx s JOIN pband p ON s.imp_e6 = p.pb
         |)
         |SELECT s.doc_id, s.n_toks, s.imp_e6,
         |       CASE WHEN c.cum_before + c.band_tokens <= 10000 THEN TRUE
         |            WHEN c.cum_before >= 10000 THEN FALSE
         |            ELSE pd.part_kept END AS kept
         |FROM selx s
         |JOIN bcb c ON s.imp_e6 = c.imp_e6
         |LEFT JOIN pdocs pd ON s.doc_id = pd.doc_id""".stripMargin,
    "nb_score" -> nbScoreSql(LmOps.NbThresholdE4),
    // the decision threshold proven non-default: 1000 splits the fixture
    // corpus (whose posterior means center near e4=1000) about in half,
    // where the 5000 default predicts all-false
    "nb_score_t10" -> nbScoreSql(1000L),
    "nb_top_feats" ->
      s"""WITH $NbCtes,
         |f AS (SELECT tok, cp, cn, post_e9 FROM post WHERE cp + cn >= 3),
         |tr AS (
         |  SELECT * FROM (
         |    SELECT 'trusted' AS side, tok, cp, cn, post_e9,
         |           ROW_NUMBER() OVER (ORDER BY post_e9 DESC, tok) AS rnk
         |    FROM f
         |  ) WHERE rnk <= 10
         |),
         |un AS (
         |  SELECT * FROM (
         |    SELECT 'untrusted' AS side, tok, cp, cn, post_e9,
         |           ROW_NUMBER() OVER (ORDER BY post_e9 ASC, tok) AS rnk
         |    FROM f
         |  ) WHERE rnk <= 10
         |)
         |SELECT side, tok, cp, cn, post_e9, rnk FROM tr
         |UNION ALL
         |SELECT side, tok, cp, cn, post_e9, rnk FROM un""".stripMargin,
    "score_corr" ->
      s"""WITH $DsirCtes,
         |qt AS (
         |  SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS qtoks
         |  FROM documents
         |),
         |qual AS (
         |  SELECT doc_id,
         |         CAST(FLOOR(((len(list_filter(qtoks, x -> x IN ('the','a','of','and','to','in','is','on'))) / CAST(len(qtoks) AS DOUBLE)) * 100.0
         |                     + (n_chars - (len(qtoks) - 1)) / CAST(len(qtoks) AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS xq
         |  FROM qt
         |),
         |fbg AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |  FROM ta, range(1, ${OracleLimits.MaxDocTokens}) r(i) WHERE i + 1 <= len(t)
         |),
         |funi AS (SELECT w1, COUNT(*) AS c1 FROM fbg GROUP BY w1),
         |fbi AS (SELECT w1, w2, COUNT(*) AS c12 FROM fbg GROUP BY w1, w2),
         |fvs AS (SELECT COUNT(DISTINCT w2) AS v FROM fbg),
         |fsc AS (
         |  SELECT fbg.doc_id,
         |         CAST(FLOOR((fbi.c12 + 1) / CAST(funi.c1 + fvs.v AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS p_e9
         |  FROM fbg JOIN fbi ON fbg.w1 = fbi.w1 AND fbg.w2 = fbi.w2
         |           JOIN funi ON fbg.w1 = funi.w1, fvs
         |),
         |flu AS (
         |  SELECT doc_id,
         |         CAST(FLOOR(CAST(SUM(p_e9) AS DOUBLE) / COUNT(*) / 100000 + 0.5) AS BIGINT) AS xf
         |  FROM fsc GROUP BY doc_id
         |),
         |z AS (
         |  SELECT q.xq, f.xf, d.imp_e6 AS xd
         |  FROM qual q JOIN flu f ON q.doc_id = f.doc_id
         |              JOIN dw d ON q.doc_id = d.doc_id
         |),
         |a AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         SUM(CAST(xq AS HUGEINT)) AS sq, SUM(CAST(xf AS HUGEINT)) AS sf,
         |         SUM(CAST(xd AS HUGEINT)) AS sd,
         |         SUM(CAST(xq AS HUGEINT) * xq) AS sqq, SUM(CAST(xf AS HUGEINT) * xf) AS sff,
         |         SUM(CAST(xd AS HUGEINT) * xd) AS sdd,
         |         SUM(CAST(xq AS HUGEINT) * xf) AS sqf, SUM(CAST(xq AS HUGEINT) * xd) AS sqd,
         |         SUM(CAST(xf AS HUGEINT) * xd) AS sfd
         |  FROM z
         |),
         |p AS (
         |  SELECT 'quality_vs_fluency' AS pair, n, sq AS sx, sf AS sy, sqq AS sxx, sff AS syy, sqf AS sxy FROM a
         |  UNION ALL SELECT 'quality_vs_dsir', n, sq, sd, sqq, sdd, sqd FROM a
         |  UNION ALL SELECT 'fluency_vs_dsir', n, sf, sd, sff, sdd, sfd FROM a
         |)
         |SELECT pair, n,
         |       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0 AND CAST(n * syy - sy * sy AS DOUBLE) > 0
         |            THEN CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
         |                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
         |                   * 10000 + 0.5) AS BIGINT)
         |       END AS corr_e4
         |FROM p""".stripMargin
  )
}
