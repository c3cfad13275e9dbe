package graft.operators

import graft.sources.{BulkOps, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The PERSISTED IVFADC index — write-then-serve, the missing half of the
  * session-built ANN family: at 100 TB you cannot re-train codebooks per
  * query session, so the index artifacts (coarse centroids, residual
  * codebook, PQ-coded posting lists) are built ONCE, written through the
  * bulk seam, and every search reads the STORED tables with the corpus
  * vectors untouched (the [[RetrievalOps.bm25Index]] stored-postings
  * pattern, scaled up to the three-artifact quantizer; cf. the
  * reference's write-then-serve derived-state precedent,
  * api/meta/TechnicalMeta.java:167-186).
  *
  * Artifact shapes at 100 TB: `centroids` is k×dim rows and `codebook`
  * k'·M×(dim/M) — both broadcast-sized forever; `postings` is the only
  * corpus-sized table, |corpus|·M slim integer rows written PARTITIONED
  * BY COARSE CENTER, so a probe-n search prunes to n directories per
  * query (the posting-list read pattern) and never scans the rest.
  *
  * Exactness contract: [[encodeAgainst]] reproduces the session chain's
  * integer math and tie-breaking bit-for-bit (assignment argmin by
  * (dist2_q, center) = ivfAssignmentsRanked's window order; code argmin
  * by (dist2_q, code) = codesForRes's), so a served search returns
  * EXACTLY [[PqOps.ivfPqResidualTrainedTopK]]'s answer — equality IS the
  * oracle claim (`ann_served` reuses the fresh-build chain's DuckDB SQL,
  * the bm25_ingest convention), and ingest is additive: encoding a new
  * batch against the stored quantizer appends rows identical to what a
  * full re-encode would produce ([[appendBatch]] differential). */
object AnnIndexOps {

  /** The coarse quantizer, keyed for serving: (center, dim, centroid_q). */
  def coarseCentroids(embeddings: DataFrame): DataFrame =
    EmbeddingStatsOps.centroids(embeddings)
      .select(col("label").cast("long").as("center"), col("dim"), col("centroid_q"))

  /** Quantized (vec_id, dim, xq) rows for any (vec_id, embedding) frame —
    * the e6 floor-quantization every ANN operator shares. */
  private def quantizedDims(vectors: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim0", "x")))
      .select(col("vec_id"), (col("dim0") + 1).as("dim"),
        floor(col("x").cast("double") * 1000000 + 0.5).cast("long").as("xq"))

  /** Encode vectors against a FIXED (stored) quantizer: coarse-assign by
    * exact integer squared distance to the broadcast centroids, then
    * PQ-code the residual per subspace against the broadcast codebook.
    * Returns posting rows (center, vec_id, sub, code). Row-independent by
    * construction — the property that makes the stored index appendable:
    * a batch encodes to the same rows whether it arrives alone or inside
    * a full rebuild. Nothing corpus-sized shuffles except the slim
    * (vec_id, dim, xq) stream into the two argmin aggregations. */
  def encodeAgainst(vectors: DataFrame, centroids: DataFrame, cb: DataFrame): DataFrame = {
    // cached: read by the assignment and again by the residual projection
    val q = graft.Caching.maybeCache(quantizedDims(vectors))
    val assign = q.join(broadcast(centroids), Seq("dim"))
      .withColumn("d", col("xq") - col("centroid_q"))
      .groupBy("vec_id", "center")
      .agg(sum(col("d") * col("d")).as("dist2_q"))
      // min(struct) argmin = ivfAssignmentsRanked's (dist2_q, center) order
      .groupBy("vec_id")
      .agg(min(struct(col("dist2_q"), col("center"))).as("best"))
      .select(col("vec_id"), col("best.center").as("center"))
    val res = q.join(assign, "vec_id")
      .join(broadcast(centroids), Seq("center", "dim"))
      .select(col("vec_id"), col("center"), col("dim"),
        (col("xq") - col("centroid_q")).as("rq"))
      .withColumn("sub", expr(s"(dim - 1) div ${PqOps.SubDims}"))
    res.join(broadcast(cb), Seq("sub", "dim"))
      .withColumn("d", col("rq") - col("rc"))
      .groupBy("vec_id", "center", "sub", "code")
      .agg(sum(col("d") * col("d")).as("dist2_q"))
      // min(struct) argmin = codesForRes's (dist2_q, code) order
      .groupBy("vec_id", "center", "sub")
      .agg(min(struct(col("dist2_q"), col("code"))).as("best"))
      .select(col("center"), col("vec_id"), col("sub"), col("best.code").as("code"))
  }

  /** Build the three index artifacts from a corpus:
    * (centroids, codebook, postings). `trainPct` = Some(p) fits the
    * residual codebook on the stable p% md5 sample (the full corpus is
    * still encoded — only the fit shrinks, the production shape). */
  def buildIndex(embeddings: DataFrame, trainPct: Option[Int] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    val cents = coarseCentroids(embeddings)
    val cb = PqOps.trainedResidualCodebook(embeddings, trainPct)
    (cents, cb, encodeAgainst(embeddings, cents, cb))
  }

  /** Ingest path: encode a NEW batch against the STORED quantizer — the
    * rows to append to `postings`. No re-training, no corpus re-scan;
    * [[AnnOps.ivfAssignIncremental]]'s maintenance shape completed with
    * the PQ codes. */
  def appendBatch(newVectors: DataFrame, centroids: DataFrame, cb: DataFrame): DataFrame =
    encodeAgainst(newVectors, centroids, cb)

  /** Write the index under `dir` through the bulk seam: `centroids` and
    * `codebook` as single small tables, `postings` PARTITIONED BY COARSE
    * CENTER — each posting list is its own directory, so a probed search
    * reads only the probed lists (partition pruning is the 100-TB read
    * pattern; a 1000-executor scan touches nprobe·|q| directories, not
    * the corpus). */
  def writeIndex(embeddings: DataFrame, dir: String,
      trainPct: Option[Int] = None): Unit = {
    val (cents, cb, postings) = buildIndex(embeddings, trainPct)
    BulkOps.writePath(cents, SaveMode.Overwrite).save(s"$dir/centroids")
    BulkOps.writePath(cb, SaveMode.Overwrite).save(s"$dir/codebook")
    BulkOps.writePath(postings, SaveMode.Overwrite)
      .partitionBy("center").save(s"$dir/postings")
  }

  /** Ingest INTO the stored index: encode the batch against the stored
    * quantizer and APPEND the rows to the partitioned postings table —
    * new rows land inside their coarse centers' directories, existing
    * lists untouched, quantizer tables untouched. Serving from the dir
    * afterwards is identical to serving from an index rebuilt over the
    * union with the same (old-trained) quantizer — the
    * [[encodeAgainst]] row-independence made durable. */
  def appendToIndex(spark: SparkSession, dir: String, newVectors: DataFrame): Unit = {
    val cents = BulkOps.readPath(spark, s"$dir/centroids")
    val cb = BulkOps.readPath(spark, s"$dir/codebook")
    BulkOps.writePath(appendBatch(newVectors, cents, cb), SaveMode.Append)
      .partitionBy("center").save(s"$dir/postings")
  }

  /** Read the stored artifacts back. The partition column comes back as
    * the discovery-inferred integer type — normalized to the written
    * LONG so served joins are type-identical to fresh ones. */
  def readIndex(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val cents = BulkOps.readPath(spark, s"$dir/centroids")
    val cb = BulkOps.readPath(spark, s"$dir/codebook")
    val postings = BulkOps.readPath(spark, s"$dir/postings")
      .withColumn("center", col("center").cast("long"))
    (cents, cb, postings)
  }

  /** Serve a top-k search from the STORED index: queries arrive as a
    * bounded (vec_id, embedding) frame (app input — at serve time there
    * is no corpus table in the plan at all); the probe set and the
    * per-probed-center residual LUT are built from the broadcast
    * centroid/codebook tables; the only big read is the probed posting
    * lists. Output = [[PqOps.ivfPqResidualTrainedTopK]]'s exactly:
    * (qid, vec_id, adist_q, rnk). */
  def servedTopK(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, nprobe: Int = 2, cacheQueryDims: Boolean = true): DataFrame = {
    val (cents, cb, postings) = readIndex(spark, dir)
    // cached: the query dims feed both the probe ranking and the LUT.
    // Streaming serve passes cacheQueryDims=false — each micro-batch's
    // plan is distinct and never reused, so a per-batch cache entry
    // would accumulate forever; recomputing the bounded batch's dims
    // twice is the cheaper trade there.
    val qdRaw = quantizedDims(queries).withColumnRenamed("vec_id", "qid")
    val qd = if (cacheQueryDims) graft.Caching.maybeCache(qdRaw) else qdRaw
    val dist = qd.join(broadcast(cents), Seq("dim"))
      .withColumn("d", col("xq") - col("centroid_q"))
      .groupBy("qid", "center")
      .agg(sum(col("d") * col("d")).as("dist2_q"))
    val wp = Window.partitionBy("qid").orderBy(col("dist2_q"), col("center"))
    val probes = dist.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("center"))
    val lut = qd
      .join(broadcast(probes), Seq("qid"))
      .join(broadcast(cents), Seq("center", "dim"))
      .withColumn("sub", expr(s"(dim - 1) div ${PqOps.SubDims}"))
      .join(broadcast(cb), Seq("sub", "dim"))
      .withColumn("d", col("xq") - col("centroid_q") - col("rc"))
      .groupBy("qid", "center", "sub", "code")
      .agg(sum(col("d") * col("d")).as("lut_q"))
    val scored = postings
      .join(broadcast(probes), Seq("center"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(lut), Seq("qid", "center", "sub", "code"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("lut_q")).as("adist_q"))
    val w = Window.partitionBy("qid").orderBy(col("adist_q"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  // one stored index per corpus dir per JVM, under the operator-cache
  // lifecycle: the index is DERIVED STATE built once and served many
  // times (the entire point of persisting it) — with graft.cache.enabled
  // off (ScaleBench) every call rebuilds, so scale runs keep measuring
  // the full build-write-serve cycle
  private val indexDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Drop the per-JVM stored-index memo (the [[graft.Caching.release]]
    * analogue for the on-disk derived state). */
  def clearIndexMemo(): Unit = indexDirs.clear()

  /** The `ann_served` fixture chain: build + write the index into a
    * fresh temp dir (memoized per corpus dir under the cache lifecycle),
    * collect the standard 10 query vectors into a LOCAL frame (bounded
    * app input — the one deliberate driver materialization, |q| rows),
    * and serve from the stored tables. The result must equal the
    * fresh-build `ivfpq_res_t` chain row-for-row — that equality is
    * the oracle. */
  def annServed(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val dir =
      if (!spark.conf.get(graft.Caching.EnabledKey, "true").toBoolean) {
        // no-cache posture: rebuild every call (scale runs measure the
        // full cycle) but overwrite ONE scratch dir instead of leaking
        // a full posting-table copy per bench pass
        val d = graft.tools.IndexScratch.scratchFor("graft_annidx", sfDir)
        writeIndex(emb, d)
        d
      } else indexDirs.computeIfAbsent(sfDir, { _ =>
        val d = graft.tools.IndexScratch.allocate("graft_annidx")
        writeIndex(emb, d)
        d
      })
    val qrows = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toSeq
    import spark.implicits._
    servedTopK(spark, dir, qrows.toDF("vec_id", "embedding"), k, nprobe)
  }
}
