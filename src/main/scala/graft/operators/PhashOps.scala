package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERCEPTUAL (DCT) image near-dup — the pHash family, closing the
  * image-dedup ladder the repo climbs from exact bytes
  * ([[MultimodalOps.mediaAHash]] equal-hash groups) through
  * brightness-bit hamming balls ([[MultimodalOps.ahashNearDups]]):
  * pHash hashes the image's low-frequency STRUCTURE, so it survives
  * brightness shifts and local pixel noise that flip many aHash bits.
  * Per image: decode (a REAL [[PngCodecOps.decodePng]] pass — the
  * fixture media are real PNG files), nearest-sample to 32×32, a
  * 2D DCT restricted to the top-left 8×8 frequency block, threshold
  * each coefficient against the block's lower median → 64 bits.
  *
  * EVERYTHING IS INTEGER: the DCT runs over a FIXED-POINT cosine
  * table (`round(cos((2x+1)uπ/64) · 2^14)`, the unnormalized type-II
  * kernel the classic pHash uses) so coefficients are exact Longs and
  * the DuckDB oracle reproduces the hash BIT-FOR-BIT from the
  * closed-form rasters — the [[PngCodecOps]] convention extended to a
  * whole feature pipeline. The SQL mirror embeds the SAME table as a
  * generated VALUES literal (single source of truth: [[CosQ]]).
  * Bounds: |sample| ≤ 255, scale 2^14, 32 terms per stage →
  * |tmp| ≤ 2^27, |coef| ≤ 2^45 — no Long overflow.
  *
  * Near-dups are the banded-LSH shape of [[ahashNearDups]]: the 64-bit
  * hash splits into 4 bands of 16 bits (carried as four ints — no
  * sign-bit gymnastics on a full 64-bit Long), candidates share ≥1
  * band, survivors verify by exact hamming. Pigeonhole: ≤ 3 differing
  * bits spoil ≤ 3 of 4 bands, so banding is EXACT-recall at the
  * default radius and the oracle is the plain quadratic join. Buckets
  * cap at [[DedupOps.MaxBandBucket]] (degenerate corpora of identical
  * images cannot square inside one bucket; equal-hash groups remain
  * recoverable by grouping the hash itself). Scale shape: scan-local
  * per-doc decode+DCT, then one narrow (band, bits)-keyed shuffle —
  * the minhash-LSH class. */
object PhashOps {

  /** Resize target (classic pHash dials: 32×32 → 8×8 frequencies). */
  val Size = 32
  val Freq = 8

  /** Fixed-point unnormalized DCT-II kernel, `round(cos((2x+1)uπ/64)
    * · 2^14)` — shared VERBATIM by the Scala pipeline and the
    * generated SQL mirror. */
  private[operators] val CosQ: Array[Array[Long]] = Array.tabulate(Size, Freq)((x, u) =>
    math.round(math.cos((2 * x + 1) * u * math.Pi / 64) * 16384.0))


  // ---- fixture: families of near-identical real PNGs -----------------

  /** Four docs per family share a base raster; members differ by a
    * sparse +m perturbation — the near-dup plant. */
  private[operators] def famOf(docId: Long): Long = docId / 4

  private[operators] def fixtureDims(docId: Long): (Int, Int) = {
    val fam = famOf(docId)
    ((fam % 24 + 16).toInt, (fam % 20 + 16).toInt)
  }

  /** Closed-form gray sample: a textured base whose spatial
    * FREQUENCIES vary per family (the structure the DCT sees — a
    * constant-offset base would make every same-dims family collide,
    * because pHash is brightness-invariant BY DESIGN; and a
    * symmetric blocky base degenerates the spectrum into exact-zero
    * ties at the median, where thresholding is unstable — hence the
    * cross term), plus the member perturbation the hash should shrug
    * off: a global brightness shift (+3m) and sparse pixel noise. The
    * base lives in 0..199 so the shift NEVER clamps — a pure DC
    * translation. */
  private[operators] def fixturePx(docId: Long, x: Int, y: Int): Int = {
    val fam = famOf(docId)
    val m = (docId % 4).toInt
    val base = (fam * 41 + (x / 2) * (3 + 2 * (fam % 7)) + (y / 2) * (5 + 2 * (fam % 5)) +
      (x / 4) * (y / 4) * (1 + fam % 3)) % 200
    (base + 3 * m + (if ((x + y) % 37 == 0) m else 0)).toInt
  }

  /** Real gray PNG media per doc; doc_id % 7 == 3 truncated (corrupt
    * rows carry null bands and join no pairs). */
  private[operators] def encodePhashFixture(docId: Long): Array[Byte] = {
    val (w, h) = fixtureDims(docId)
    val raw = Array.tabulate(w * h)(j => fixturePx(docId, j % w, j / w))
    val whole = PngCodecOps.encodePngGeneric(w, h, 0, raw, Array.empty,
      interlace = false, filterSeed = docId)
    if (docId % 7 == 3) whole.take(whole.length - math.min(whole.length, 24)) else whole
  }

  // ---- the hash ----

  /** 64-bit pHash of a gray raster, returned as 4 × 16-bit bands
    * (band i = bits [16i, 16i+16), bit k = u·8+v set iff coef(u,v) >
    * lower-median). */
  private[operators] def phashBands(gray: Array[Int], w: Int, h: Int): Array[Int] = {
    // nearest-sample to 32×32 (integer index arithmetic — exact in SQL)
    val px = new Array[Long](Size * Size)
    var j = 0
    while (j < Size * Size) {
      val i = j % Size; val r = j / Size
      px(j) = gray((r * h / Size) * w + (i * w / Size)).toLong
      j += 1
    }
    // separable integer DCT restricted to the 8×8 low block:
    // tmp(u, y) = Σ_x px(x, y)·CosQ(x)(u); coef(u, v) = Σ_y tmp·CosQ(y)(v)
    val tmp = Array.ofDim[Long](Freq, Size)
    for (u <- 0 until Freq; y <- 0 until Size) {
      var acc = 0L; var x = 0
      while (x < Size) { acc += px(y * Size + x) * CosQ(x)(u); x += 1 }
      tmp(u)(y) = acc
    }
    val coef = new Array[Long](Freq * Freq)
    for (u <- 0 until Freq; v <- 0 until Freq) {
      var acc = 0L; var y = 0
      while (y < Size) { acc += tmp(u)(y) * CosQ(y)(v); y += 1 }
      coef(u * 8 + v) = acc
    }
    val med = coef.sorted.apply(31) // lower median of the 64
    val bands = new Array[Int](4)
    var k = 0
    while (k < 64) {
      if (coef(k) > med) bands(k / 16) |= 1 << (k % 16)
      k += 1
    }
    bands
  }

  // public for codegen: a private case class has package-private
  // accessors Janino cannot see, demoting the query to interpreted
  // row serialization (see WavCodecOps.WavPcmStats)
  case class PhashRow(
      doc_id: Long, status: String,
      b0: Option[Long], b1: Option[Long], b2: Option[Long], b3: Option[Long])

  /** (doc_id, status, b0..b3) per doc: real PNG decode → pHash.
    * Corrupt media carry null bands. */
  def phashHashes(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    Par.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { id =>
        PngCodecOps.decodePng(encodePhashFixture(id)) match {
          case Some(d) if d.channels == 1 =>
            val b = phashBands(d.samples, d.width, d.height)
            PhashRow(id, "png", Some(b(0).toLong), Some(b(1).toLong),
              Some(b(2).toLong), Some(b(3).toLong))
          case _ => PhashRow(id, "corrupt", None, None, None, None)
        }
      })
      .toDF()
  }

  /** Banded perceptual near-dup pairs: candidates share ≥1 of the 4
    * bands (exact recall for hamming < 4 — the oracle is the plain
    * quadratic join), verified by exact hamming over all four bands.
    * Bucket keys are the band values alone (pHash already normalizes
    * away the dims via the 32×32 resample, so cross-shape comparison
    * is the point, unlike [[MultimodalOps.ahashNearDups]]). */
  def phashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"4-band LSH is exact-recall only for hamming < 4, got $maxHamming")
    val h = graft.Caching.maybeCache(
      phashHashes(docs).filter(col("status") =!= "corrupt")
        .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3")))
    val banded = h
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        explode(lit((0 until 4).toArray)).as("band"))
      .withColumn("bits",
        expr("CASE band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END"))
    // cached: the candidate self-join reads the capped banding twice,
    // and each uncached read re-runs the bucket-count window (the
    // minhashCandidates convention)
    val capped = graft.Caching.maybeCache(
      DedupOps.capBuckets(banded, Seq("band", "bits")))
    def ham(a: String, b: String): Column =
      expr(s"CAST(bit_count(a.$a ^ b.$b) AS BIGINT)")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (ham("b0", "b0") + ham("b1", "b1") + ham("b2", "b2") + ham("b3", "b3"))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

object PhashPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "phash_bands" -> ((s, dir) => PhashOps.phashHashes(Tables.documents(s, dir))),
    "phash_near_dups" -> ((s, dir) => PhashOps.phashNearDups(Tables.documents(s, dir))))

  /** The full integer pipeline mirrored in SQL from the closed-form
    * rasters (codec-free — the engine must agree through a real PNG
    * encode + decode): nearest 32×32 sample, the embedded fixed-point
    * kernel, lower-median threshold, four 16-bit bands. */
  private def hashCte: String =
    s"""cosq(x, u, c) AS (VALUES ${cosSql}),
       |p AS (
       |  SELECT doc_id, (doc_id // 4) AS fam, doc_id % 4 AS m,
       |         (doc_id // 4) % 24 + 16 AS w, (doc_id // 4) % 20 + 16 AS h,
       |         doc_id % 7 = 3 AS trunc
       |  FROM documents
       |),
       |px AS (
       |  SELECT doc_id, trunc, i, r,
       |         (fam * 41 + (((i * w) // 32) // 2) * (3 + 2 * (fam % 7))
       |                   + (((r * h) // 32) // 2) * (5 + 2 * (fam % 5))
       |                   + (((i * w) // 32) // 4) * (((r * h) // 32) // 4) * (1 + fam % 3)) % 200
       |           + 3 * m
       |           + CASE WHEN ((i * w) // 32 + (r * h) // 32) % 37 = 0 THEN m ELSE 0 END AS v
       |  FROM p, LATERAL unnest(range(0, 32)) AS ti(i), LATERAL unnest(range(0, 32)) AS tr(r)
       |),
       |tmp AS (
       |  SELECT doc_id, trunc, cq.u AS u, px.r AS y, SUM(px.v * cq.c) AS t
       |  FROM px JOIN cosq cq ON cq.x = px.i
       |  GROUP BY doc_id, trunc, cq.u, px.r
       |),
       |coef AS (
       |  SELECT doc_id, trunc, tmp.u AS u, cq.u AS v, SUM(tmp.t * cq.c) AS cf
       |  FROM tmp JOIN cosq cq ON cq.x = tmp.y
       |  GROUP BY doc_id, trunc, tmp.u, cq.u
       |),
       |med AS (
       |  SELECT doc_id, cf AS medv FROM (
       |    SELECT doc_id, cf, row_number() OVER (PARTITION BY doc_id ORDER BY cf) AS rn
       |    FROM coef
       |  ) WHERE rn = 32
       |),
       |hash AS (
       |  SELECT coef.doc_id AS doc_id, coef.trunc AS trunc,
       |         SUM(CASE WHEN (u * 8 + v) // 16 = 0 AND cf > medv THEN 1 << ((u * 8 + v) % 16) ELSE 0 END) AS b0,
       |         SUM(CASE WHEN (u * 8 + v) // 16 = 1 AND cf > medv THEN 1 << ((u * 8 + v) % 16) ELSE 0 END) AS b1,
       |         SUM(CASE WHEN (u * 8 + v) // 16 = 2 AND cf > medv THEN 1 << ((u * 8 + v) % 16) ELSE 0 END) AS b2,
       |         SUM(CASE WHEN (u * 8 + v) // 16 = 3 AND cf > medv THEN 1 << ((u * 8 + v) % 16) ELSE 0 END) AS b3
       |  FROM coef JOIN med ON med.doc_id = coef.doc_id
       |  GROUP BY coef.doc_id, coef.trunc
       |)""".stripMargin

  // the SAME literal table the engine uses — single source of truth
  private def cosSql: String =
    (for (x <- 0 until PhashOps.Size; u <- 0 until PhashOps.Freq)
      yield s"($x, $u, ${PhashOps.CosQ(x)(u)})").mkString(", ")

  override def oracles: Map[String, String] = Map(
    "phash_bands" ->
      s"""WITH $hashCte
         |SELECT doc_id,
         |       CASE WHEN trunc THEN 'corrupt' ELSE 'png' END AS status,
         |       CASE WHEN NOT trunc THEN CAST(b0 AS BIGINT) END AS b0,
         |       CASE WHEN NOT trunc THEN CAST(b1 AS BIGINT) END AS b1,
         |       CASE WHEN NOT trunc THEN CAST(b2 AS BIGINT) END AS b2,
         |       CASE WHEN NOT trunc THEN CAST(b3 AS BIGINT) END AS b3
         |FROM hash""".stripMargin,
    // near-dups: the plain quadratic join — 4-band LSH at hamming ≤ 3
    // is exact-recall, so the banded plan must reproduce it
    "phash_near_dups" ->
      s"""WITH $hashCte,
         |ok AS (SELECT * FROM hash WHERE NOT trunc)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
         |FROM ok a JOIN ok b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3""".stripMargin)
}
