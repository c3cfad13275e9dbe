package graft.operators

import graft.QueryPack
import graft.functions.TextFunctions.stableHash60
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-class embedding statistics: label centroids and distance-to-
  * centroid outlier margins — the screening pass a training pipeline
  * runs before contrastive sampling or label-noise filtering.
  *
  * Exactness: vectors are quantized to e6 integers first; centroids are
  * integer sums / counts and margins are exact integer squared distances
  * (max |diff|² × 64 dims stays far below 2^63), so every value is
  * engine-exact with zero FP-ordering exposure. At 100 TB: one explode →
  * two hash aggregates (label,dim) and (vec), both map-side combinable.
  */
object EmbeddingStatsOps {

  /** (vec_id, label, dim, xq): e6-quantized elements. Cached and shared:
    * centroids / outliers / IVF / kmeans2 all re-derive this explode (a
    * single kmeans2 plan references it 4×), and CacheManager converges
    * every reference to one entry — the embedding-side twin of the
    * shingle-postings cache. MEMORY_AND_DISK spills instead of OOMing
    * when the corpus outgrows executor storage. */
  private[operators] def quantized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim0", "x")))
      .select(col("vec_id"), col("label"), (col("dim0") + 1).as("dim"),
        floor(col("x").cast("double") * 1000000 + 0.5).cast("long").as("xq"))
      .transform(graft.Caching.maybeCache)

  /** Centroid per (label, dim), in quantized units. */
  def centroids(embeddings: DataFrame): DataFrame =
    quantized(embeddings)
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum(col("xq")).as("sum_q"))
      .select(col("label"), col("dim"), col("n"),
        floor(col("sum_q") / col("n") + 0.5).cast("long").as("centroid_q"))

  /** Two deterministic Lloyd iterations of k-means over the quantized
    * vectors, seeded from the label centroids — the real trainer for the
    * IVF coarse quantizer (AnnOps uses label centroids as a stand-in;
    * this shows the quantizer converging). All-integer distances and
    * floor-rounded integer centroids keep every iteration engine-exact;
    * an empty cluster simply drops out (the standard Lloyd edge case).
    * At 100 TB each iteration is one broadcast join (centers are k×dim,
    * tiny) plus two map-side-combinable aggregates — the canonical
    * distributed k-means shape, unrolled rather than driver-looped.
    *
    * `trainPct`: production quantizers fit on a deterministic sample,
    * not the full corpus — Some(p) restricts the WHOLE fit (seed
    * centroids and both Lloyd iterations) to the stable p% of vectors
    * whose [[stableHash60]] md5 bucket falls below p (the same sampling
    * key [[DedupOps.blockerPairRecall]] and [[DataLayoutOps.sortBounds]]
    * use, so the sample is reproducible across runs and re-shards).
    * Output stays the fitted centroid table — counts then census the
    * SAMPLE members per center, which is what a sample-fitted codebook
    * reports. None = full-corpus fit (the oracled default); the
    * `kmeans2_s50` twin oracles the sampled path. */
  def kmeans2(embeddings0: DataFrame, trainPct: Option[Int] = None): DataFrame = {
    require(trainPct.forall(p => p > 0 && p <= 100), s"trainPct in 1..100, got $trainPct")
    val embeddings = trainPct.fold(embeddings0)(p =>
      embeddings0.filter(stableHash60(col("vec_id").cast("string")) % 100L < p))
    // row-wise formulation: one quantized array per vector (same integers
    // as `quantized`, same expression), distances via zip_with against
    // BROADCAST center arrays — the dim-keyed join would push
    // |vectors|·64·k rows through two aggregates per iteration, the
    // row-wise shape ships |vectors|·k slim rows into one argmin and
    // only the recompute explodes back to dims. Cached: read by both
    // iterations' assign and recompute (4 consumers).
    val qarr = graft.Caching.maybeCache(embeddings.select(
      col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000 + 0.5) as bigint))")
        .as("xq")))
    val c0 = centroids(embeddings)
      .select(col("label").cast("long").as("center"), col("dim"), col("centroid_q"))

    // (center, dim, centroid_q) -> (center, carr[64]); k rows, broadcast
    def centerArr(c: DataFrame): DataFrame =
      c.groupBy("center")
        .agg(array_sort(collect_list(struct(col("dim"), col("centroid_q")))).as("s"))
        .select(col("center"), expr("transform(s, p -> p.centroid_q)").as("carr"))

    def assign(c: DataFrame): DataFrame =
      qarr.crossJoin(broadcast(centerArr(c)))
        .select(col("vec_id"), col("center"),
          expr("aggregate(zip_with(xq, carr, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
            .as("dist2_q"))
        // argmin via min(struct): same (dist2_q, center) tie order a rank
        // window would use, but map-side combinable
        .groupBy("vec_id")
        .agg(min(struct(col("dist2_q"), col("center"))).as("best"))
        .select(col("vec_id"), col("best.center").as("center"))

    def recompute(asg: DataFrame): DataFrame =
      qarr.join(asg, Seq("vec_id"))
        .select(col("center"), posexplode(col("xq")).as(Seq("dim0", "xq")))
        .select(col("center"), (col("dim0") + 1).as("dim"), col("xq"))
        .groupBy("center", "dim")
        .agg(count(lit(1)).as("n"), sum(col("xq")).as("sum_q"))
        .select(col("center"), col("dim"), col("n"),
          floor(col("sum_q") / col("n") + 0.5).cast("long").as("centroid_q"))

    // pin the iteration-1 centroids (k×dim rows, bounded): iteration 2's
    // assign/recompute otherwise embed iteration 1's whole census DAG in
    // their plans — the chain is stage-latency-bound at fixture scale and
    // plan-depth-bound for AQE, so truncating at a bounded materialized
    // frame halves the re-planned depth. Same rows either way (integer
    // math; pinForConsistency caches or eagerly checkpoints by posture).
    val c1 = graft.Caching.pinForConsistency(
      recompute(assign(c0)).select("center", "dim", "centroid_q"))
    recompute(assign(c1))
  }

  /** Exact squared distance of each vector to its label centroid;
    * the k farthest vectors per label are the outlier candidates. */
  def outliers(embeddings: DataFrame, k: Int = 5): DataFrame = {
    val c = centroids(embeddings).select("label", "dim", "centroid_q")
    val dist = quantized(embeddings)
      .join(c, Seq("label", "dim"))
      .withColumn("d", col("xq") - col("centroid_q"))
      .groupBy("vec_id", "label")
      .agg(sum(col("d") * col("d")).as("dist2_q"))
    val w = Window.partitionBy("label").orderBy(col("dist2_q").desc, col("vec_id"))
    dist.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}

object EmbeddingStatsPack extends QueryPack {
  private def e(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_centroids" -> ((s, d) => EmbeddingStatsOps.centroids(e(s, d))),
    "emb_outliers" -> ((s, d) => EmbeddingStatsOps.outliers(e(s, d))),
    "kmeans2" -> ((s, d) => EmbeddingStatsOps.kmeans2(e(s, d))),
    "kmeans2_s50" -> ((s, d) => EmbeddingStatsOps.kmeans2(e(s, d), trainPct = Some(50)))
  )

  /** The stableHash60-mod-100 vector sample predicate in DuckDB form —
    * identical to the Scala side's md5 bucket key. */
  private[operators] def vecSamplePred(p: Int): String =
    s"CAST(CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 18, 15)) AS UBIGINT) % 100 AS BIGINT) < $p"

  private[operators] def quantSqlP(pred: String): String =
    s"""q AS (
       |  SELECT vec_id, label, d.i AS dim,
       |         CAST(FLOOR(CAST(embedding[d.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xq
       |  FROM embeddings, range(1, 65) d(i)
       |  WHERE $pred
       |)""".stripMargin

  private[operators] val quantSql = quantSqlP("TRUE")

  private[operators] def centroidSqlP(pred: String): String =
    s"""${quantSqlP(pred)},
       |c AS (
       |  SELECT label, dim, COUNT(*) AS n, CAST(SUM(xq) AS BIGINT) AS sum_q
       |  FROM q GROUP BY label, dim
       |)""".stripMargin

  private[operators] val centroidSql = centroidSqlP("TRUE")

  override def oracles: Map[String, String] = Map(
    "emb_centroids" ->
      s"""WITH $centroidSql
         |SELECT label, dim, n,
         |       CAST(FLOOR(CAST(sum_q AS DOUBLE) / n + 0.5) AS BIGINT) AS centroid_q
         |FROM c""".stripMargin,
    "emb_outliers" ->
      s"""WITH $centroidSql,
         |cq AS (SELECT label, dim,
         |              CAST(FLOOR(CAST(sum_q AS DOUBLE) / n + 0.5) AS BIGINT) AS centroid_q
         |       FROM c),
         |dist AS (
         |  SELECT q.vec_id, q.label,
         |         CAST(SUM((q.xq - cq.centroid_q) * (q.xq - cq.centroid_q)) AS BIGINT) AS dist2_q
         |  FROM q JOIN cq ON q.label = cq.label AND q.dim = cq.dim
         |  GROUP BY q.vec_id, q.label
         |),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY label ORDER BY dist2_q DESC, vec_id) AS rnk
         |  FROM dist
         |)
         |SELECT vec_id, label, dist2_q, rnk FROM ranked WHERE rnk <= 5""".stripMargin,
    "kmeans2" -> kmeans2Sql("TRUE"),
    // the sample-fitted twin: seed + both Lloyd iterations restricted to
    // the stable 50% md5 bucket, proving the trainPct knob end-to-end
    "kmeans2_s50" -> kmeans2Sql(vecSamplePred(50))
  )

  private def kmeans2Sql(pred: String): String =
      s"""WITH ${centroidSqlP(pred)},
         |c0 AS (SELECT CAST(label AS BIGINT) AS center, dim,
         |              CAST(FLOOR(CAST(sum_q AS DOUBLE) / n + 0.5) AS BIGINT) AS centroid_q FROM c),
         |d1 AS (
         |  SELECT q.vec_id, c0.center,
         |         CAST(SUM((q.xq - c0.centroid_q) * (q.xq - c0.centroid_q)) AS BIGINT) AS dist2_q
         |  FROM q JOIN c0 ON q.dim = c0.dim GROUP BY q.vec_id, c0.center
         |),
         |a1 AS (
         |  SELECT vec_id, center FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_q, center) AS rn FROM d1
         |  ) WHERE rn = 1
         |),
         |c1 AS (
         |  SELECT a1.center, q.dim, COUNT(*) AS n, CAST(SUM(q.xq) AS BIGINT) AS sum_q
         |  FROM q JOIN a1 ON q.vec_id = a1.vec_id GROUP BY a1.center, q.dim
         |),
         |c1q AS (SELECT center, dim,
         |               CAST(FLOOR(CAST(sum_q AS DOUBLE) / n + 0.5) AS BIGINT) AS centroid_q FROM c1),
         |d2 AS (
         |  SELECT q.vec_id, c1q.center,
         |         CAST(SUM((q.xq - c1q.centroid_q) * (q.xq - c1q.centroid_q)) AS BIGINT) AS dist2_q
         |  FROM q JOIN c1q ON q.dim = c1q.dim GROUP BY q.vec_id, c1q.center
         |),
         |a2 AS (
         |  SELECT vec_id, center FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2_q, center) AS rn FROM d2
         |  ) WHERE rn = 1
         |),
         |c2 AS (
         |  SELECT a2.center, q.dim, COUNT(*) AS n, CAST(SUM(q.xq) AS BIGINT) AS sum_q
         |  FROM q JOIN a2 ON q.vec_id = a2.vec_id GROUP BY a2.center, q.dim
         |)
         |SELECT center, dim, CAST(n AS BIGINT) AS n,
         |       CAST(FLOOR(CAST(sum_q AS DOUBLE) / n + 0.5) AS BIGINT) AS centroid_q
         |FROM c2""".stripMargin
}
