package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERCEPTUAL audio fingerprint near-dup — the audio member of the
  * perceptual-dedup ladder [[PhashOps]] closes for images: a
  * Haitsma/Kalker-style robust hash (the published Philips audio
  * fingerprint: "A Highly Robust Audio Fingerprinting System", ISMIR
  * 2002) re-expressed over this repo's integer-exact codec discipline.
  * Per document: REAL WAV decode ([[WavCodecOps.decodeWav]] — the
  * fixture media are real RIFF/WAVE files), frame channel 0 into
  * [[Frames]] windows of [[Win]] samples, per-frame spectral band
  * energies via the fixed-point DCT kernel, then one bit per
  * (frame, band) = the SIGN of the time-frequency DOUBLE DIFFERENCE
  *   (E(f,u) − E(f,u+1)) − (E(f−1,u) − E(f−1,u+1)) > 0
  * — 4 difference frames × 16 band pairs = 64 bits carried as four
  * 16-bit bands, the [[PhashOps]] layout.
  *
  * Why the double difference (the H/K insight): the hash is EXACTLY
  * invariant to uniform gain (every E scales by g > 0, the sign of a
  * scaled difference never moves — "volume knob" re-encodes collide by
  * construction), insensitive to DC bias (a constant feeds only the
  * u = 0 bin, which the u ≥ 1 bands never read — up to the kernel's
  * rounding residue), and robust to sparse transient clicks (a few
  * samples perturb each band energy by a bounded amount; only
  * near-tie bits can flip).
  *
  * EVERYTHING IS INTEGER: energies are |Σ sample·CosQ| over the
  * `round(cos((2x+1)uπ/128)·2^14)` table (u = 1..17, the DC row
  * deliberately excluded), so the DuckDB oracle reproduces the hash
  * BIT-FOR-BIT from the closed-form samples — the [[PhashOps]]
  * convention. Bounds: |sample| ≤ ~1100 in the fixture (≤ 2^15 for
  * any PCM input), 64 terms, scale 2^14 → |E| ≤ 2^15·2^14·2^6 = 2^35;
  * differences of differences ≤ 2^37 — no Long overflow.
  *
  * Near-dups are the banded-LSH shape of [[PhashOps.phashNearDups]]:
  * candidates share ≥1 of the 4 bands, survivors verify by exact
  * hamming; pigeonhole makes banding EXACT-recall at hamming ≤ 3, so
  * the oracle is the plain quadratic join. Buckets cap at
  * [[DedupOps.MaxBandBucket]]. Scale shape: scan-local per-doc
  * decode + DCT, then ONE narrow (band, bits)-keyed shuffle — the
  * minhash-LSH class, linear in documents at 100 TB.
  *
  * The FIXTURE waveform is deliberately NON-STATIONARY (two chirped
  * sawtooths + a staircase): a stationary signal gives every frame
  * the same spectrum and the double difference degenerates to all
  * ties — the frame axis only carries information if the spectrum
  * moves, which is also true of real audio. */
object AudioFpOps {

  /** Samples per analysis frame. */
  val Win = 64

  /** Frames hashed; frames 1..4 each yield 16 difference bits. */
  val Frames = 5

  /** Total channel-0 samples the hash reads. */
  val FpSamples: Int = Win * Frames // 320

  /** Spectral rows u = 1..17 (index 0 ⇒ u = 1): 17 energies give the
    * 16 adjacent band differences. Fixed-point unnormalized DCT-II
    * kernel `round(cos((2x+1)uπ/128)·2^14)`, shared VERBATIM with the
    * SQL mirror. */
  private[operators] val CosQ: Array[Array[Long]] = Array.tabulate(Win, 17)((x, ui) =>
    math.round(math.cos((2 * x + 1) * (ui + 1) * math.Pi / 128) * 16384.0))

  // ---- fixture: families of near-identical real WAVs -----------------

  /** Four docs per family share a base waveform; members differ by a
    * uniform gain (8+m)/8 — which the hash shrugs off EXACTLY — and a
    * sparse click train (the transient-noise plant). */
  private[operators] def famOf(docId: Long): Long = docId / 4

  /** Closed-form channel-0 sample at time t: two CHIRPED sawtooths
    * (family-dependent base period AND sweep rate — the moving
    * spectrum the frame differences need) plus a staircase, all in
    * ±98 before gain; member m scales by (8+m) (exact-invariance
    * plant) and adds amplitude-2m clicks every 53 samples. */
  private[operators] def fixtureSample(docId: Long, t: Long): Long = {
    val fam = famOf(docId)
    val m = docId % 4
    val base =
      ((fam * 31 + t * (3 + fam % 11) + t * t * (1 + fam % 13) / 16) % 97 - 48) +
        ((t * (5 + fam % 7) + t * t * (2 + fam % 9) / 32) % 61 - 30) +
        ((t / 8) * (1 + fam % 5) % 41 - 20)
    base * (8 + m) + (if (t % 53 == 0) 2 * m else 0L)
  }

  /** One real mono 16-bit 8 kHz WAV of exactly [[FpSamples]] frames;
    * doc_id % 7 == 3 truncated mid-data (corrupt rows carry null
    * bands and join no pairs). */
  private[operators] def encodeAudioFixture(docId: Long): Array[Byte] = {
    val dataLen = FpSamples * 2
    val out = new java.io.ByteArrayOutputStream
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le(v: Long, n: Int): Unit = {
      var i = 0; while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }
    tag("RIFF"); le(4L + 24 + (8 + dataLen), 4); tag("WAVE")
    tag("fmt "); le(16L, 4)
    le(1L, 2); le(1L, 2) // integer PCM, mono
    le(8000L, 4); le(16000L, 4) // rate, byte rate
    le(2L, 2); le(16L, 2) // block align, bits
    tag("data"); le(dataLen.toLong, 4)
    var t = 0L
    while (t < FpSamples) { le(fixtureSample(docId, t) & 0xffff, 2); t += 1 }
    val whole = out.toByteArray
    if (docId % 7 == 3) whole.take(whole.length - 9) else whole
  }

  // ---- the hash ----

  /** 64-bit fingerprint of a channel-0 PCM stream as 4 × 16-bit bands
    * (band f−1 bit u−1 set iff the (f, u) double difference is
    * strictly positive). Reads the first [[FpSamples]] channel-0
    * samples. */
  private[operators] def audioBands(samples: Array[Long], channels: Int): Array[Int] = {
    val e = Array.ofDim[Long](Frames, 17)
    var f = 0
    while (f < Frames) {
      var ui = 0
      while (ui < 17) {
        var acc = 0L; var x = 0
        while (x < Win) { acc += samples((f * Win + x) * channels) * CosQ(x)(ui); x += 1 }
        e(f)(ui) = math.abs(acc)
        ui += 1
      }
      f += 1
    }
    val bands = new Array[Int](4)
    f = 1
    while (f < Frames) {
      var u = 0
      while (u < 16) {
        val dd = (e(f)(u) - e(f)(u + 1)) - (e(f - 1)(u) - e(f - 1)(u + 1))
        if (dd > 0) bands(f - 1) |= 1 << u
        u += 1
      }
      f += 1
    }
    bands
  }

  // public for codegen: see WavCodecOps.WavPcmStats
  case class AudioFpRow(
      doc_id: Long, status: String,
      b0: Option[Long], b1: Option[Long], b2: Option[Long], b3: Option[Long])

  /** (doc_id, status, b0..b3) per doc: real WAV decode → fingerprint.
    * Corrupt media (and streams shorter than [[FpSamples]] frames)
    * carry null bands. */
  def audioHashes(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    Par.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { id =>
        WavCodecOps.decodeWav(encodeAudioFixture(id)) match {
          case Some(d) if d.frames >= FpSamples =>
            val b = audioBands(d.samples, d.channels)
            AudioFpRow(id, "wav", Some(b(0).toLong), Some(b(1).toLong),
              Some(b(2).toLong), Some(b(3).toLong))
          case _ => AudioFpRow(id, "corrupt", None, None, None, None)
        }
      })
      .toDF()
  }

  /** Banded perceptual near-dup pairs over the audio fingerprint:
    * candidates share ≥1 of the 4 bands (exact recall for hamming < 4
    * — the oracle is the plain quadratic join), verified by exact
    * hamming over all four bands. */
  def audioNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"4-band LSH is exact-recall only for hamming < 4, got $maxHamming")
    val h = graft.Caching.maybeCache(
      audioHashes(docs).filter(col("status") =!= "corrupt")
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

object AudioFpPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audio_fp" -> ((s, dir) => AudioFpOps.audioHashes(Tables.documents(s, dir))),
    "audio_near_dups" -> ((s, dir) => AudioFpOps.audioNearDups(Tables.documents(s, dir))))

  /** The full integer pipeline mirrored in SQL from the closed-form
    * samples (codec-free — the engine must agree through a real WAV
    * encode + decode): the embedded fixed-point kernel, per-frame
    * band energies, the sign of the double difference, four 16-bit
    * bands. DuckDB `%` and `//` match Scala on the nonnegative
    * operands used here. */
  private def hashCte: String =
    s"""cosq(x, u, c) AS (VALUES ${cosSql}),
       |p AS (
       |  SELECT doc_id, (doc_id // 4) AS fam, doc_id % 4 AS m,
       |         doc_id % 7 = 3 AS trunc
       |  FROM documents
       |),
       |s AS (
       |  SELECT doc_id, trunc, t,
       |         (((fam * 31 + t * (3 + fam % 11) + t * t * (1 + fam % 13) // 16) % 97 - 48)
       |          + ((t * (5 + fam % 7) + t * t * (2 + fam % 9) // 32) % 61 - 30)
       |          + ((t // 8) * (1 + fam % 5) % 41 - 20)) * (8 + m)
       |         + CASE WHEN t % 53 = 0 THEN 2 * m ELSE 0 END AS v
       |  FROM p, LATERAL unnest(range(0, ${AudioFpOps.FpSamples})) AS tt(t)
       |),
       |e AS (
       |  SELECT doc_id, trunc, t // ${AudioFpOps.Win} AS f, cq.u AS u,
       |         ABS(SUM(v * cq.c)) AS e
       |  FROM s JOIN cosq cq ON cq.x = t % ${AudioFpOps.Win}
       |  GROUP BY doc_id, trunc, t // ${AudioFpOps.Win}, cq.u
       |),
       |d AS (
       |  SELECT a.doc_id AS doc_id, a.trunc AS trunc, a.f AS f, a.u AS u,
       |         a.e - b.e AS d
       |  FROM e a JOIN e b ON b.doc_id = a.doc_id AND b.f = a.f AND b.u = a.u + 1
       |  WHERE a.u <= 16
       |),
       |hash AS (
       |  SELECT a.doc_id AS doc_id, a.trunc AS trunc,
       |         SUM(CASE WHEN a.f = 1 AND a.d > b.d THEN 1 << (a.u - 1) ELSE 0 END) AS b0,
       |         SUM(CASE WHEN a.f = 2 AND a.d > b.d THEN 1 << (a.u - 1) ELSE 0 END) AS b1,
       |         SUM(CASE WHEN a.f = 3 AND a.d > b.d THEN 1 << (a.u - 1) ELSE 0 END) AS b2,
       |         SUM(CASE WHEN a.f = 4 AND a.d > b.d THEN 1 << (a.u - 1) ELSE 0 END) AS b3
       |  FROM d a JOIN d b ON b.doc_id = a.doc_id AND b.u = a.u AND b.f = a.f - 1
       |  GROUP BY a.doc_id, a.trunc
       |)""".stripMargin

  // the SAME literal table the engine uses — single source of truth
  private def cosSql: String =
    (for (x <- 0 until AudioFpOps.Win; ui <- 0 until 17)
      yield s"($x, ${ui + 1}, ${AudioFpOps.CosQ(x)(ui)})").mkString(", ")

  override def oracles: Map[String, String] = Map(
    "audio_fp" ->
      s"""WITH $hashCte
         |SELECT doc_id,
         |       CASE WHEN trunc THEN 'corrupt' ELSE 'wav' END AS status,
         |       CASE WHEN NOT trunc THEN CAST(b0 AS BIGINT) END AS b0,
         |       CASE WHEN NOT trunc THEN CAST(b1 AS BIGINT) END AS b1,
         |       CASE WHEN NOT trunc THEN CAST(b2 AS BIGINT) END AS b2,
         |       CASE WHEN NOT trunc THEN CAST(b3 AS BIGINT) END AS b3
         |FROM hash""".stripMargin,
    // near-dups: the plain quadratic join — 4-band LSH at hamming ≤ 3
    // is exact-recall, so the banded plan must reproduce it
    "audio_near_dups" ->
      s"""WITH $hashCte,
         |ok AS (SELECT * FROM hash WHERE NOT trunc)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
         |FROM ok a JOIN ok b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3""".stripMargin)
}
