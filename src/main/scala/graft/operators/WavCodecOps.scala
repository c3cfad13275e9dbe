package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL PCM sample decode — the audio face of the [[PngCodecOps]] /
  * [[JpegCodecOps]] codec story. [[MultimodalOps.wavDims]] parses WAV
  * HEADERS with codegen'd expressions and stops at the data chunk; this
  * operator decodes the samples themselves: a little-endian RIFF chunk
  * walk (JUNK/LIST skipping with the odd-size pad rule, sizes EXCLUDE
  * the pad byte), the canonical 16-byte PCM fmt chunk, and the data
  * chunk's interleaved frames at ALL FOUR integer PCM widths — 8-bit
  * UNSIGNED (0..255, the format's historical quirk) and 16/24/32-bit
  * SIGNED little-endian two's complement — mono and stereo, through
  * `mapPartitions` (the codec-loop shape argued at
  * [[PngCodecOps]]: sample assembly is byte arithmetic, scan-local,
  * pure map parallelism at 100 TB).
  *
  * Correctness is pinned twice, the codec convention:
  *   - the ORACLE fixtures carry closed-form samples (raw byte pattern
  *     `(doc_id·37 + j·13) mod 2^bits` per interleaved sample index j;
  *     signed widths re-centered by 2^bits where the raw value crosses
  *     the sign bit) — the DuckDB oracle recomputes per-channel
  *     sum/min/max codec-free, and the decode must recover them
  *     through real chunk offsets and real byte assembly;
  *   - WavCodecSpec reads the same files with
  *     `javax.sound.sampled.AudioSystem` — an independent RIFF/WAVE
  *     implementation in the JDK — asserting the parsed format
  *     (channels, rate, bits, frame count) AND the raw frame bytes
  *     equal our chunk walk's view.
  *
  * Honest scope, stated: integer PCM (format tag 1) only —
  * IEEE-float (3), A-law/µ-law (6/7) and WAVE_FORMAT_EXTENSIBLE
  * (0xFFFE) return 'corrupt' rather than pretending, as do partial
  * trailing frames (dataLen not a blockAlign multiple). */
object WavCodecOps {

  /** Frame-count guard before allocation (the codec MaxSamples
    * discipline). */
  val MaxSamples: Long = 1L << 22

  // ---- fixture generation (real RIFF bytes, executor-side) -----------

  private[operators] def fixtureBits(docId: Long): Int =
    Array(8, 16, 24, 32)((docId % 4).toInt)

  private[operators] def fixtureChannels(docId: Long): Int = (docId % 2 + 1).toInt

  private[operators] def fixtureFrames(docId: Long): Int = (docId % 50 + 5).toInt

  private[operators] def fixtureRate(docId: Long): Int =
    Array(8000, 16000, 44100)((docId % 3).toInt)

  /** Closed-form RAW sample (unsigned, 0..2^bits−1) at interleaved
    * index j; [[fixtureValue]] is its decoded signed value. */
  private[operators] def fixtureRaw(docId: Long, bits: Int, j: Long): Long =
    (docId * 37 + j * 13) % (1L << bits)

  /** The decoded sample value the stats must see: 8-bit stays raw
    * (unsigned by spec), wider widths are two's complement. */
  private[operators] def fixtureValue(docId: Long, bits: Int, j: Long): Long = {
    val raw = fixtureRaw(docId, bits, j)
    if (bits == 8) raw
    else if (raw >= (1L << (bits - 1))) raw - (1L << bits)
    else raw
  }

  /** One real WAV file: RIFF/WAVE + a variable JUNK chunk (odd sizes
    * word-padded, pad excluded from the size — the walk must apply the
    * alignment rule), a LIST chunk on every 5th doc, the canonical PCM
    * fmt chunk, and a data chunk of closed-form interleaved frames.
    * doc_id % 7 == 3 truncated mid-data (the corrupt twist). */
  private[operators] def encodeWav(docId: Long): Array[Byte] = {
    val bits = fixtureBits(docId)
    val ch = fixtureChannels(docId)
    val frames = fixtureFrames(docId)
    val rate = fixtureRate(docId)
    val bytesPer = bits / 8
    val blockAlign = ch * bytesPer
    val dataLen = frames * blockAlign
    val out = new java.io.ByteArrayOutputStream
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le(v: Long, n: Int): Unit = { var i = 0; while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    val junkN = (docId % 20 + 1).toInt
    val junkPadded = junkN + junkN % 2
    val hasList = docId % 5 == 0
    val riffSize = 4L + (8 + junkPadded) + (if (hasList) 12 else 0) + 24 + (8 + dataLen)
    tag("RIFF"); le(riffSize, 4); tag("WAVE")
    tag("JUNK"); le(junkN.toLong, 4)
    for (_ <- 0 until junkN) out.write(0x4A)
    if (junkN % 2 == 1) out.write(0x00) // word-alignment pad, excluded from size
    if (hasList) { tag("LIST"); le(4L, 4); tag("INFO") }
    tag("fmt "); le(16L, 4)
    le(1L, 2) // integer PCM
    le(ch.toLong, 2)
    le(rate.toLong, 4)
    le(rate.toLong * blockAlign, 4) // byte rate
    le(blockAlign.toLong, 2)
    le(bits.toLong, 2)
    tag("data"); le(dataLen.toLong, 4)
    var j = 0L
    while (j < frames.toLong * ch) {
      le(fixtureRaw(docId, bits, j), bytesPer) // little-endian raw bytes
      j += 1
    }
    val whole = out.toByteArray
    if (docId % 7 == 3) whole.take(whole.length - math.min(whole.length, 9)) else whole
  }

  // ---- decoder (any integer-PCM RIFF/WAVE file) ----------------------

  private[operators] case class WavDecoded(
      channels: Int, rate: Int, bits: Int, frames: Int, samples: Array[Long])

  /** Full decode or None (malformed anywhere: magic, chunk walk off the
    * end, missing/undersized fmt or data, non-integer-PCM format tags,
    * widths other than 8/16/24/32, inconsistent block align, partial
    * trailing frame, frame count past the guard). Never throws. */
  private[operators] def decodeWav(bytes: Array[Byte]): Option[WavDecoded] =
    try {
      def tagAt(o: Int, s: String): Boolean =
        o + 4 <= bytes.length && (0 until 4).forall(i => (bytes(o + i) & 0xff) == s.charAt(i))
      def leAt(o: Int, n: Int): Long = {
        var v = 0L; var i = 0
        while (i < n) { v |= (bytes(o + i) & 0xffL) << (8 * i); i += 1 }
        v
      }
      if (bytes.length < 12 || !tagAt(0, "RIFF") || !tagAt(8, "WAVE")) return None
      var pos = 12
      var fmtAt = -1; var dataAt = -1; var dataLen = 0L
      while (pos + 8 <= bytes.length && (fmtAt < 0 || dataAt < 0)) {
        val size = leAt(pos + 4, 4)
        if (size < 0 || pos + 8 + size > bytes.length) return None
        if (tagAt(pos, "fmt ")) { if (size < 16) return None; fmtAt = pos + 8 }
        else if (tagAt(pos, "data")) { dataAt = pos + 8; dataLen = size }
        // odd chunk sizes carry a pad byte EXCLUDED from the size field
        pos += 8 + size.toInt + (size % 2).toInt
      }
      if (fmtAt < 0 || dataAt < 0) return None
      val fmtTag = leAt(fmtAt, 2).toInt
      if (fmtTag != 1) return None // float/A-law/µ-law/extensible: out of scope
      val ch = leAt(fmtAt + 2, 2).toInt
      val rate = leAt(fmtAt + 4, 4).toInt
      val blockAlign = leAt(fmtAt + 12, 2).toInt
      val bits = leAt(fmtAt + 14, 2).toInt
      if (ch < 1 || ch > 2 || rate < 1) return None
      if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
      val bytesPer = bits / 8
      if (blockAlign != ch * bytesPer) return None
      if (dataLen % blockAlign != 0) return None // a torn trailing frame
      val frames = dataLen / blockAlign
      if (frames * ch > MaxSamples) return None
      val n = (frames * ch).toInt
      val samples = new Array[Long](n)
      var j = 0
      while (j < n) {
        val o = dataAt + j * bytesPer
        var raw = 0L; var i = 0
        while (i < bytesPer) { raw |= (bytes(o + i) & 0xffL) << (8 * i); i += 1 }
        samples(j) =
          if (bits == 8) raw // 8-bit PCM is unsigned by spec
          else if (raw >= (1L << (bits - 1))) raw - (1L << bits)
          else raw
        j += 1
      }
      Some(WavDecoded(ch, rate, bits, frames.toInt, samples))
    } catch { case _: Exception => None }

  // ---- operators ----

  // Encoder row types are PUBLIC on purpose: a `private` case class
  // compiles to package-private accessors, which Janino's generated
  // projection class (loaded outside the package) cannot see — Spark
  // then falls back to interpreted row serialization for the whole
  // query. Public keeps the mapPartitions output inside codegen.
  case class WavPcmStats(
      doc_id: Long, status: String,
      channels: Option[Long], sample_rate: Option[Long],
      bits: Option[Long], n_frames: Option[Long],
      c0_sum: Option[Long], c0_min: Option[Long], c0_max: Option[Long],
      c1_sum: Option[Long], c1_min: Option[Long], c1_max: Option[Long])

  /** Per-channel PCM statistics from raw WAV bytes — the audio face of
    * [[PngCodecOps.pngDecodeStats]]: status + format + per-channel
    * sum/min/max of the DECODED sample values. Malformed or
    * out-of-scope payloads degrade to a 'corrupt' row, never an
    * error. */
  def wavPcmStats(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id").cast("long"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case None => WavPcmStats(id, "corrupt",
            None, None, None, None, None, None, None, None, None, None)
          case Some(d) =>
            val sums = new Array[Long](d.channels)
            val mins = Array.fill(d.channels)(Long.MaxValue)
            val maxs = Array.fill(d.channels)(Long.MinValue)
            var j = 0
            while (j < d.samples.length) {
              val k = j % d.channels; val v = d.samples(j)
              sums(k) += v
              if (v < mins(k)) mins(k) = v
              if (v > maxs(k)) maxs(k) = v
              j += 1
            }
            def st(k: Int): (Option[Long], Option[Long], Option[Long]) =
              if (k >= d.channels) (None, None, None)
              else (Some(sums(k)), Some(mins(k)), Some(maxs(k)))
            val (s0, m0, x0) = st(0); val (s1, m1, x1) = st(1)
            WavPcmStats(id, "wav", Some(d.channels.toLong), Some(d.rate.toLong),
              Some(d.bits.toLong), Some(d.frames.toLong), s0, m0, x0, s1, m1, x1)
        }
      })
      .toDF()
  }

  /** The `wav_pcm` fixture chain: generate → decode, stats out. */
  def wavPcm(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    wavPcmStats(
      Par.spread(docs.select(col("doc_id"))).as[Long]
        .mapPartitions(_.map(id => (id, encodeWav(id))))
        .toDF("doc_id", "media"))
  }

  // public for codegen: see the WavPcmStats note
  case class WavFeatures(
      doc_id: Long, status: String,
      sq_sum: Option[Long], zcr: Option[Long],
      peak: Option[Long], clipped: Option[Long])

  /** Channel-0 audio-QUALITY features over the decoded samples — the
    * curation primitives an audio pipeline filters on (the audio twin
    * of [[graft.operators.TextOps]]' quality scores): silence shows as
    * near-zero energy, noise as a high zero-crossing rate, hard
    * clipping as samples pinned at the width's extremes. ALL INTEGER
    * so the oracle is exact:
    *   - `sq_sum`: sum of squares of the samples NORMALIZED to 16-bit
    *     precision (floor-divide wider widths by 2^(bits−16); center
    *     and scale 8-bit by (v−128)·256) — energy needs no more
    *     precision and the normalized squares cannot overflow a Long;
    *   - `zcr`: count of sign changes between CONSECUTIVE channel-0
    *     samples (sign = normalized value ≥ 0);
    *   - `peak`: max |normalized|;
    *   - `clipped`: count of ORIGINAL samples pinned at the width's
    *     min/max representable value (0/255 unsigned at 8 bits,
    *     ±2^(bits−1) signed above). */
  def wavFeatures(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    Par.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { id =>
        decodeWav(encodeWav(id)) match {
          case None => WavFeatures(id, "corrupt", None, None, None, None)
          case Some(d) =>
            val (sq, zcr, peak, clip) = featuresOf(d)
            WavFeatures(id, "wav", Some(sq), Some(zcr), Some(peak), Some(clip))
        }
      })
      .toDF()
  }

  /** The feature kernel over a decoded stream: (sq_sum, zcr, peak,
    * clipped) per the [[wavFeatures]] contract. */
  private[operators] def featuresOf(d: WavDecoded): (Long, Long, Long, Long) = {
    val maxv = if (d.bits == 8) 255L else (1L << (d.bits - 1)) - 1
    val minv = if (d.bits == 8) 0L else -(1L << (d.bits - 1))
    var sq = 0L; var zcr = 0L; var peak = 0L; var clip = 0L
    var prevNonNeg = true; var first = true
    var f = 0
    while (f < d.frames) {
      val v = d.samples(f * d.channels) // channel 0
      val n = // normalize to 16-bit precision (floor semantics)
        if (d.bits == 8) (v - 128) * 256
        else Math.floorDiv(v, 1L << (d.bits - 16))
      sq += n * n
      val a = math.abs(n)
      if (a > peak) peak = a
      if (v == maxv || v == minv) clip += 1
      val nonNeg = n >= 0
      if (!first && nonNeg != prevNonNeg) zcr += 1
      prevNonNeg = nonNeg; first = false
      f += 1
    }
    (sq, zcr, peak, clip)
  }
}

object WavPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wav_pcm" -> ((s, dir) => WavCodecOps.wavPcm(Tables.documents(s, dir))),
    "wav_features" -> ((s, dir) => WavCodecOps.wavFeatures(Tables.documents(s, dir))))

  // codec-free oracle: the closed-form raw pattern re-centered for
  // signed widths, per-channel stats over interleaved index parity
  override def oracles: Map[String, String] = Map(
    "wav_pcm" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 24 ELSE 32 END AS bits,
        |         doc_id % 2 + 1 AS ch,
        |         doc_id % 50 + 5 AS frames,
        |         CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS rate,
        |         doc_id % 7 = 3 AS trunc
        |  FROM documents
        |),
        |v AS (
        |  SELECT doc_id, bits, ch, frames, rate, trunc, j,
        |         (doc_id * 37 + j * 13) % (1::BIGINT << bits) AS raw
        |  FROM p, LATERAL unnest(range(0, frames * ch)) AS t(j)
        |),
        |sv AS (
        |  SELECT doc_id, bits, ch, frames, rate, trunc, j,
        |         CASE WHEN bits = 8 THEN raw
        |              WHEN raw >= (1::BIGINT << (bits - 1)) THEN raw - (1::BIGINT << bits)
        |              ELSE raw END AS val
        |  FROM v
        |)
        |SELECT doc_id,
        |       CASE WHEN trunc THEN 'corrupt' ELSE 'wav' END AS status,
        |       CASE WHEN NOT trunc THEN CAST(MAX(ch) AS BIGINT) END AS channels,
        |       CASE WHEN NOT trunc THEN CAST(MAX(rate) AS BIGINT) END AS sample_rate,
        |       CASE WHEN NOT trunc THEN CAST(MAX(bits) AS BIGINT) END AS bits,
        |       CASE WHEN NOT trunc THEN CAST(MAX(frames) AS BIGINT) END AS n_frames,
        |       CASE WHEN NOT trunc THEN CAST(SUM(val) FILTER (WHERE j % ch = 0) AS BIGINT) END AS c0_sum,
        |       CASE WHEN NOT trunc THEN CAST(MIN(val) FILTER (WHERE j % ch = 0) AS BIGINT) END AS c0_min,
        |       CASE WHEN NOT trunc THEN CAST(MAX(val) FILTER (WHERE j % ch = 0) AS BIGINT) END AS c0_max,
        |       CASE WHEN NOT trunc AND MAX(ch) = 2 THEN CAST(SUM(val) FILTER (WHERE j % ch = 1) AS BIGINT) END AS c1_sum,
        |       CASE WHEN NOT trunc AND MAX(ch) = 2 THEN CAST(MIN(val) FILTER (WHERE j % ch = 1) AS BIGINT) END AS c1_min,
        |       CASE WHEN NOT trunc AND MAX(ch) = 2 THEN CAST(MAX(val) FILTER (WHERE j % ch = 1) AS BIGINT) END AS c1_max
        |FROM sv GROUP BY doc_id, trunc""".stripMargin,
    // the quality features mirrored integer-for-integer: 16-bit
    // normalization by floor division (DuckDB // floors, matching
    // Math.floorDiv), sign changes by LAG over channel-0 time order,
    // clipping against the width's representable extremes
    "wav_features" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 24 ELSE 32 END AS bits,
        |         doc_id % 2 + 1 AS ch,
        |         doc_id % 50 + 5 AS frames,
        |         doc_id % 7 = 3 AS trunc
        |  FROM documents
        |),
        |v AS (
        |  SELECT doc_id, bits, ch, trunc, j,
        |         (doc_id * 37 + j * 13) % (1::BIGINT << bits) AS raw
        |  FROM p, LATERAL unnest(range(0, frames * ch)) AS t(j)
        |  WHERE j % ch = 0
        |),
        |sv AS (
        |  SELECT doc_id, bits, trunc, j,
        |         CASE WHEN bits = 8 THEN raw
        |              WHEN raw >= (1::BIGINT << (bits - 1)) THEN raw - (1::BIGINT << bits)
        |              ELSE raw END AS val
        |  FROM v
        |),
        |n AS (
        |  SELECT doc_id, bits, trunc, j, val,
        |         CASE WHEN bits = 8 THEN (val - 128) * 256
        |              ELSE val // (1::BIGINT << (bits - 16)) END AS nv
        |  FROM sv
        |),
        |w AS (
        |  SELECT doc_id, bits, trunc, val, nv,
        |         lag(nv) OVER (PARTITION BY doc_id ORDER BY j) AS pv
        |  FROM n
        |)
        |SELECT doc_id,
        |       CASE WHEN trunc THEN 'corrupt' ELSE 'wav' END AS status,
        |       CASE WHEN NOT trunc THEN CAST(SUM(nv * nv) AS BIGINT) END AS sq_sum,
        |       CASE WHEN NOT trunc THEN CAST(SUM(CASE WHEN pv IS NOT NULL
        |            AND ((nv >= 0) != (pv >= 0)) THEN 1 ELSE 0 END) AS BIGINT) END AS zcr,
        |       CASE WHEN NOT trunc THEN CAST(MAX(ABS(nv)) AS BIGINT) END AS peak,
        |       CASE WHEN NOT trunc THEN CAST(SUM(CASE
        |            WHEN bits = 8 AND (val = 0 OR val = 255) THEN 1
        |            WHEN bits > 8 AND (val = (1::BIGINT << (bits - 1)) - 1
        |                            OR val = -(1::BIGINT << (bits - 1))) THEN 1
        |            ELSE 0 END) AS BIGINT) END AS clipped
        |FROM w GROUP BY doc_id, trunc""".stripMargin)
}
