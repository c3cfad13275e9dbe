package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** VIDEO container walk + frame sampling — the video face of the
  * multimodal story, and a REAL end-to-end video pipeline: a Microsoft
  * AVI RIFF-form parse (the public 'AVI ' layout: LIST hdrl{avih,
  * LIST strl{strh,strf}}, LIST movi{00dc...}, idx1) feeding the
  * in-house MJPEG frame decode ([[JpegCodecOps.decodeJpeg]] — Motion
  * JPEG frames ARE baseline JFIF streams, so the container walk plus
  * the existing codec is a complete video decoder for the MJPG
  * handler). The frame-SAMPLE shape is the one a training pipeline
  * needs at 100 TB: extract every k-th frame (scan-local byte
  * slicing, pure map parallelism), decode only the sampled frames.
  *
  * The RIFF discipline is shared with [[WavCodecOps]] (same chunk
  * grammar, same odd-size pad rule — sizes EXCLUDE the pad byte), but
  * AVI nests: LIST chunks carry a 4-byte form type then sub-chunks.
  * The walk validates every declared size against its enclosing
  * boundary and the RIFF size against the buffer up front — malformed
  * or truncated payloads degrade to None, never throw.
  *
  * Cross-validation inside the fixture chain: the avih header's
  * totalFrames must equal the movi chunk census (a header/payload
  * DISAGREEMENT refuses — the self-consistency check idx1-less
  * players apply), and the oracle pins the sampled-frame pixel stats
  * through the real entropy decode via the block-constant lossless
  * profile (the [[JpegCodecOps]] convention: the decoded raster IS
  * the closed form). */
object AviCodecOps {

  /** Sample every k-th frame (the pipeline dial; 2 in the fixture
    * chain so the stride actually skips). */
  val FrameStride = 2

  // ---- fixture shapes -------------------------------------------------

  private[operators] def fixtureDims(docId: Long): (Int, Int) =
    ((docId % 20 + 4).toInt, (docId % 14 + 4).toInt)

  private[operators] def fixtureFrames(docId: Long): Int = (docId % 6 + 3).toInt

  private[operators] def fixtureUsPf(docId: Long): Long = 40000 + (docId % 10) * 1000

  /** Block-constant sample of frame i — the lossless-profile closed
    * form with a per-frame term, so every sampled frame's stats are
    * exact through the real MJPEG entropy decode. */
  private[operators] def frameSampleVal(docId: Long, i: Int, bx: Int, by: Int): Int =
    ((docId * 37 + i * 53 + bx * 11 + by * 23) % 256).toInt

  /** Frame i as a real baseline JFIF stream. */
  private[operators] def frameBytes(docId: Long, i: Int): Array[Byte] = {
    val (w, h) = fixtureDims(docId)
    JpegCodecOps.encodeJpeg(w, h, (x, y) => frameSampleVal(docId, i, x / 8, y / 8))
  }

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** RIFF chunk: id + LE size + payload + pad byte when odd (size
    * excludes the pad — the rule the walk must apply). */
  private def chunk(id: String, payload: Array[Byte]): Array[Byte] =
    cc(id) ++ le(payload.length.toLong, 4) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  private def list(formType: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(formType) ++ children)

  /** Assemble a complete AVI RIFF form: hdrl (avih + vids/MJPG strl),
    * an optional JUNK chunk (odd-sized — the pad-rule exercise), movi
    * with one '00dc' chunk per frame, and an idx1 keyframe index. */
  private[operators] def assembleAvi(
      w: Int, h: Int, usPf: Long, frames: IndexedSeq[Array[Byte]],
      junkLen: Int): Array[Byte] = {
    val n = frames.length
    val avih = le(usPf, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0x10, 4) ++
      le(n.toLong, 4) ++ le(0, 4) ++ le(1, 4) ++ le(0, 4) ++
      le(w.toLong, 4) ++ le(h.toLong, 4) ++ le(0, 16)
    val strh = cc("vids") ++ cc("MJPG") ++ le(0, 4) ++ le(0, 2) ++ le(0, 2) ++
      le(0, 4) ++ le(usPf, 4) ++ le(1000000L, 4) ++ le(0, 4) ++
      le(n.toLong, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 8)
    val strf = le(40, 4) ++ le(w.toLong, 4) ++ le(h.toLong, 4) ++ le(1, 2) ++
      le(24, 2) ++ cc("MJPG") ++ le(w.toLong * h * 3, 4) ++ le(0, 16)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val junk =
      if (junkLen > 0) chunk("JUNK", Array.fill(junkLen)(0x4A.toByte))
      else Array.empty[Byte]
    val movi = list("movi", frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val idx1 = chunk("idx1", frames.zipWithIndex.map { case (f, i) =>
      cc("00dc") ++ le(0x10, 4) ++ le(4L + 8 * i, 4) ++ le(f.length.toLong, 4)
    }.reduce(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ junk ++ movi ++ idx1
    cc("RIFF") ++ le(body.length.toLong, 4) ++ body
  }

  /** One real AVI file per doc (JUNK on every 5th doc); doc_id % 7 == 3
    * truncated (the corrupt twist: the RIFF size outruns the buffer,
    * which the walk refuses up front). */
  private[operators] def encodeAviFixture(docId: Long): Array[Byte] = {
    val (w, h) = fixtureDims(docId)
    val n = fixtureFrames(docId)
    val whole = assembleAvi(w, h, fixtureUsPf(docId),
      (0 until n).map(i => frameBytes(docId, i)),
      if (docId % 5 == 0) ((docId % 9) + 1).toInt else 0)
    if (docId % 7 == 3) whole.take(whole.length - 9) else whole
  }

  // ---- the container walk ---------------------------------------------

  private[operators] case class AviParsed(
      width: Int, height: Int, usPerFrame: Long, nFrames: Int,
      handler: String, frames: Array[(Int, Int)]) // (offset, len) into the buffer

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def four(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  /** Full container parse or None (malformed anywhere: sizes past any
    * enclosing boundary, missing headers, a non-vids stream, or an
    * avih totalFrames that disagrees with the movi census). Never
    * throws. */
  private[operators] def parseAvi(bytes: Array[Byte]): Option[AviParsed] =
    try {
      if (bytes.length < 12) return None
      if (four(bytes, 0) != "RIFF" || four(bytes, 8) != "AVI ") return None
      val riffSize = u32(bytes, 4)
      if (8 + riffSize > bytes.length) return None
      val end = (8 + riffSize).toInt
      var pos = 12
      var width = -1; var height = -1; var usPf = -1L; var nF = -1
      var handler: String = null
      var vids = false
      val frames = ArrayBuffer.empty[(Int, Int)]
      while (pos + 8 <= end) {
        val id = four(bytes, pos); val sz = u32(bytes, pos + 4)
        if (pos + 8 + sz > end) return None
        if (id == "LIST") {
          if (sz < 4) return None
          four(bytes, pos + 8) match {
            case "hdrl" =>
              var p = pos + 12; val lend = pos + 8 + sz.toInt
              while (p + 8 <= lend) {
                val cid = four(bytes, p); val csz = u32(bytes, p + 4)
                if (p + 8 + csz > lend) return None
                if (cid == "avih") {
                  if (csz < 40) return None
                  usPf = u32(bytes, p + 8)
                  nF = u32(bytes, p + 24).toInt
                  width = u32(bytes, p + 40).toInt
                  height = u32(bytes, p + 44).toInt
                } else if (cid == "LIST" && csz >= 4 && four(bytes, p + 8) == "strl") {
                  var q = p + 12; val slend = p + 8 + csz.toInt
                  while (q + 8 <= slend) {
                    val sid = four(bytes, q); val ssz = u32(bytes, q + 4)
                    if (q + 8 + ssz > slend) return None
                    if (sid == "strh") {
                      if (ssz < 8) return None
                      if (four(bytes, q + 8) == "vids") {
                        vids = true; handler = four(bytes, q + 12)
                      }
                    }
                    q += 8 + ssz.toInt + (ssz % 2).toInt
                  }
                }
                p += 8 + csz.toInt + (csz % 2).toInt
              }
            case "movi" =>
              var p = pos + 12; val lend = pos + 8 + sz.toInt
              while (p + 8 <= lend) {
                val cid = four(bytes, p); val csz = u32(bytes, p + 4)
                if (p + 8 + csz > lend) return None
                // video frame chunks: ##dc (compressed) / ##db (raw)
                if (cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
                    (cid.endsWith("dc") || cid.endsWith("db")))
                  frames += ((p + 8, csz.toInt))
                p += 8 + csz.toInt + (csz % 2).toInt
              }
            case _ => () // other lists (INFO, ...) skipped whole
          }
        }
        pos += 8 + sz.toInt + (sz % 2).toInt
      }
      if (width <= 0 || height <= 0 || nF < 0 || usPf < 0 || !vids || handler == null) None
      else if (frames.length != nF) None // header/payload disagreement
      else Some(AviParsed(width, height, usPf, nF, handler, frames.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- operators ------------------------------------------------------

  // public for codegen: see WavCodecOps.WavPcmStats
  case class AviMetaRow(
      doc_id: Long, status: String,
      width: Option[Long], height: Option[Long], n_frames: Option[Long],
      us_per_frame: Option[Long], handler: Option[String])

  /** Container metadata per doc through the real chunk walk: dims,
    * frame count (header ≡ movi census, enforced), frame cadence, and
    * the stream handler fourcc. */
  def aviMeta(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    Par.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map { id =>
        parseAvi(encodeAviFixture(id)) match {
          case Some(p) => AviMetaRow(id, "avi", Some(p.width.toLong),
            Some(p.height.toLong), Some(p.nFrames.toLong),
            Some(p.usPerFrame), Some(p.handler))
          case None => AviMetaRow(id, "corrupt", None, None, None, None, None)
        }
      })
      .toDF()
  }

  // public for codegen: see WavCodecOps.WavPcmStats
  case class AviFrameRow(
      doc_id: Long, frame_idx: Option[Long], status: String,
      px_sum: Option[Long], px_min: Option[Long], px_max: Option[Long])

  /** Frame SAMPLING: every [[FrameStride]]-th frame's bytes sliced
    * from the container and decoded through the real MJPEG path,
    * pixel stats out. A corrupt container yields ONE corrupt row
    * (null frame_idx); a frame that fails its own decode yields a
    * 'bad_frame' row. Scan-local per doc — the 100-TB shape. */
  def aviFrameSample(docs: DataFrame, stride: Int = FrameStride): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val s = docs.sparkSession
    import s.implicits._
    Par.spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.flatMap { id =>
        val bytes = encodeAviFixture(id)
        parseAvi(bytes) match {
          case None => Iterator.single(AviFrameRow(id, None, "corrupt", None, None, None))
          case Some(p) =>
            (0 until p.nFrames by stride).iterator.map { i =>
              val (off, len) = p.frames(i)
              JpegCodecOps.decodeJpeg(java.util.Arrays.copyOfRange(bytes, off, off + len)) match {
                case Some(d) if d.channels == 1 =>
                  var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
                  var j = 0
                  while (j < d.samples.length) {
                    val v = d.samples(j).toLong
                    sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                    j += 1
                  }
                  AviFrameRow(id, Some(i.toLong), "jpeg", Some(sum), Some(mn), Some(mx))
                case _ => AviFrameRow(id, Some(i.toLong), "bad_frame", None, None, None)
              }
            }
        }
      })
      .toDF()
  }
  // ---- video perceptual near-dup (frame-aligned pHash) ---------------

  private[operators] def vidFam(docId: Long): Long = docId / 4

  /** Family-derived dims/frame count so members ALIGN frame-for-frame
    * (a near-dup video has the same length and shape — re-encodes and
    * brightness-shifted copies, not arbitrary cuts). Dims are BLOCK
    * multiples: the frame rasters are 8×8-block-constant (the JPEG
    * lossless profile) but textured ACROSS blocks, which is what the
    * 32×32-resampled pHash DCT sees. */
  private[operators] def vidDims(docId: Long): (Int, Int) = {
    val fam = vidFam(docId)
    (8 * ((fam % 4) + 4).toInt, 8 * ((fam % 3) + 4).toInt)
  }

  private[operators] def vidFrames(docId: Long): Int = ((vidFam(docId) % 4) + 3).toInt

  /** Block (bx, by) of frame i: the [[PhashOps]] textured-base recipe
    * (family-dependent spatial frequencies + a cross term) at BLOCK
    * granularity, with a per-frame term; member m adds the global
    * brightness shift and sparse noise a perceptual hash exists to
    * shrug off. Base in 0..199, shift ≤ 9, noise ≤ 3 — never clamps. */
  private[operators] def vidSampleVal(docId: Long, i: Int, bx: Int, by: Int): Int = {
    val fam = vidFam(docId); val m = (docId % 4).toInt
    // LARGE coprime-ish multipliers make adjacent blocks jump across
    // the whole 0..199 range (a smooth block ramp concentrates energy
    // in the lowest DCT bins and leaves the rest tied near zero at the
    // median, where thresholding is unstable); fam and frame feed the
    // multipliers so families AND frames differ structurally, not by a
    // DC offset the hash ignores. Noise is SPARSE at block granularity
    // (~3% of blocks, varying by frame): a block-constant perturbation
    // feeds a whole 8×8 patch, so a dense plant would swamp the
    // per-frame bit budget.
    (((fam * 41 + bx * (89 + 2 * (fam % 7) + 4 * i) + by * (131 + 2 * (fam % 5) + 6 * i) +
      bx * by * (53 + fam % 3)) % 200) + 3 * m +
      (if ((bx * 5 + by * 11 + i) % 31 == 0) m else 0)).toInt
  }

  private[operators] def vidFrameBytes(docId: Long, i: Int): Array[Byte] = {
    val (w, h) = vidDims(docId)
    JpegCodecOps.encodeJpeg(w, h, (x, y) => vidSampleVal(docId, i, x / 8, y / 8))
  }

  /** The near-dup-family AVI fixture: four docs per family share dims,
    * frame count and base texture; same corrupt twist. */
  private[operators] def encodeVideoFixture(docId: Long): Array[Byte] = {
    val (w, h) = vidDims(docId)
    val whole = assembleAvi(w, h, 40000L,
      (0 until vidFrames(docId)).map(i => vidFrameBytes(docId, i)), 0)
    if (docId % 7 == 3) whole.take(whole.length - 9) else whole
  }

  // public for codegen: see WavCodecOps.WavPcmStats
  case class VideoPhashRow(
      doc_id: Long, frame_idx: Option[Long], status: String,
      b0: Option[Long], b1: Option[Long], b2: Option[Long], b3: Option[Long])

  private def videoRowsOf(id: Long, stride: Int): Iterator[VideoPhashRow] = {
    val bytes = encodeVideoFixture(id)
    parseAvi(bytes) match {
      case None =>
        Iterator.single(VideoPhashRow(id, None, "corrupt", None, None, None, None))
      case Some(p) =>
        (0 until p.nFrames by stride).iterator.map { i =>
          val (off, len) = p.frames(i)
          JpegCodecOps.decodeJpeg(java.util.Arrays.copyOfRange(bytes, off, off + len)) match {
            case Some(d) if d.channels == 1 =>
              val b = PhashOps.phashBands(d.samples, d.width, d.height)
              VideoPhashRow(id, Some(i.toLong), "jpeg", Some(b(0).toLong),
                Some(b(1).toLong), Some(b(2).toLong), Some(b(3).toLong))
            case _ => VideoPhashRow(id, Some(i.toLong), "bad_frame",
              None, None, None, None)
          }
        }
    }
  }

  /** A module-level STABLE function for the default stride: a
    * mapPartitions lambda that captures a parameter is a fresh object
    * per call, so every invocation builds a plan the CacheManager
    * treats as distinct — [[videoNearDups]]' cached hash frame would
    * never be reused across sibling invocations. A stable `val`
    * makes re-invocations plan-equal (the non-capturing-lambda
    * property the other codec operators get for free). */
  private val defaultVideoRows: Iterator[Long] => Iterator[VideoPhashRow] =
    _.flatMap(videoRowsOf(_, FrameStride))

  /** Per SAMPLED frame: container walk → MJPEG decode → the 64-bit
    * perceptual hash ([[PhashOps.phashBands]]) as four 16-bit bands —
    * the video fingerprint is the frame-indexed hash sequence. */
  def videoPhash(docs: DataFrame, stride: Int = FrameStride): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val s = docs.sparkSession
    import s.implicits._
    val fn =
      if (stride == FrameStride) defaultVideoRows
      else (it: Iterator[Long]) => it.flatMap(videoRowsOf(_, stride))
    Par.spread(docs.select(col("doc_id"))).as[Long].mapPartitions(fn).toDF()
  }

  /** VIDEO near-dup pairs: candidates share ≥1 (frame_idx, band, bits)
    * bucket. Every fixture doc samples frames 0 and 2 (nf ≥ 3), so any
    * pair shares ≥ 2 frames = 8 bands, and by pigeonhole banding is
    * EXACT-recall at TOTAL hamming ≤ 7 over the common sampled frames
    * (the oracle is the plain quadratic join). The default radius 6 is
    * ~2 bits per aligned frame — the per-video analogue of the
    * single-image radius 3. Survivors verify by the exact hamming sum
    * over frame-aligned hashes. Scale shape: per-doc decode + DCT
    * (scan-local), one narrow (frame, band, bits) shuffle, then the
    * bounded candidate join — the minhash-LSH class with a frame
    * dimension. */
  def videoNearDups(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8,
      s"8-band (two-common-frame) LSH is exact-recall only for hamming < 8, got $maxHamming")
    val h = graft.Caching.maybeCache(
      videoPhash(docs).filter(col("status") === "jpeg")
        .select(col("doc_id"), col("frame_idx"),
          col("b0"), col("b1"), col("b2"), col("b3")))
    val banded = h
      .select(col("doc_id"), col("frame_idx"), col("b0"), col("b1"), col("b2"), col("b3"),
        explode(lit((0 until 4).toArray)).as("band"))
      .withColumn("bits",
        expr("CASE band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END"))
    // cached: the candidate self-join reads the capped banding twice,
    // and each uncached read re-runs the bucket-count window
    val capped = graft.Caching.maybeCache(
      DedupOps.capBuckets(banded, Seq("frame_idx", "band", "bits")))
    val cand = capped.as("a").join(capped.as("b"),
        col("a.frame_idx") === col("b.frame_idx") && col("a.band") === col("b.band") &&
          col("a.bits") === col("b.bits") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val ha = h.select(col("doc_id").as("doc_a"), col("frame_idx"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = h.select(col("doc_id").as("doc_b"), col("frame_idx"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(ha, Seq("doc_a")).join(hb, Seq("doc_b", "frame_idx"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(expr(
        "CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}

object AviPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "avi_meta" -> ((s, dir) => AviCodecOps.aviMeta(Tables.documents(s, dir))),
    "avi_frames" -> ((s, dir) => AviCodecOps.aviFrameSample(Tables.documents(s, dir))))

  override def oracles: Map[String, String] = Map(
    // container metadata: pure closed form (the walk must recover it
    // through real nested RIFF bytes)
    "avi_meta" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 3 THEN 'corrupt' ELSE 'avi' END AS status,
        |       CASE WHEN doc_id % 7 <> 3 THEN CAST(doc_id % 20 + 4 AS BIGINT) END AS width,
        |       CASE WHEN doc_id % 7 <> 3 THEN CAST(doc_id % 14 + 4 AS BIGINT) END AS height,
        |       CASE WHEN doc_id % 7 <> 3 THEN CAST(doc_id % 6 + 3 AS BIGINT) END AS n_frames,
        |       CASE WHEN doc_id % 7 <> 3 THEN CAST(40000 + doc_id % 10 * 1000 AS BIGINT) END AS us_per_frame,
        |       CASE WHEN doc_id % 7 <> 3 THEN 'MJPG' END AS handler
        |FROM documents""".stripMargin,
    // sampled frames: the block-constant closed form per (doc, frame),
    // which the real MJPEG entropy decode must reproduce exactly (the
    // jpeg_pixels lossless-profile convention with a per-frame term)
    "avi_frames" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id % 20 + 4 AS w, doc_id % 14 + 4 AS h,
        |         doc_id % 6 + 3 AS nf, doc_id % 7 = 3 AS trunc
        |  FROM documents
        |),
        |v AS (
        |  SELECT doc_id, i,
        |         list_transform(range(0, w * h), j ->
        |           (doc_id * 37 + i * 53 + ((j % w) // 8) * 11 + ((j // w) // 8) * 23) % 256) AS px
        |  FROM p, LATERAL unnest(range(0, nf, 2)) AS t(i)
        |  WHERE NOT trunc
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, 'jpeg' AS status,
        |       CAST(list_aggregate(px, 'sum') AS BIGINT) AS px_sum,
        |       CAST(list_aggregate(px, 'min') AS BIGINT) AS px_min,
        |       CAST(list_aggregate(px, 'max') AS BIGINT) AS px_max
        |FROM v
        |UNION ALL
        |SELECT doc_id, CAST(NULL AS BIGINT), 'corrupt',
        |       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |FROM p WHERE trunc""".stripMargin)
}

object VideoDupPack extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "video_phash" -> ((s, dir) => AviCodecOps.videoPhash(Tables.documents(s, dir))),
    "video_near_dups" -> ((s, dir) => AviCodecOps.videoNearDups(Tables.documents(s, dir))))

  /** The frame-indexed pHash pipeline mirrored in SQL from the
    * closed-form block rasters (codec-free — the engine must agree
    * through a real AVI walk + MJPEG entropy decode): nearest 32×32
    * sample of each sampled frame, the embedded fixed-point kernel,
    * lower-median threshold, four 16-bit bands per frame. */
  private def hashCte: String =
    s"""cosq(x, u, c) AS (VALUES ${cosSql}),
       |p AS (
       |  SELECT doc_id, (doc_id // 4) AS fam, doc_id % 4 AS m,
       |         8 * ((doc_id // 4) % 4 + 4) AS w, 8 * ((doc_id // 4) % 3 + 4) AS h,
       |         (doc_id // 4) % 4 + 3 AS nf,
       |         doc_id % 7 = 3 AS trunc
       |  FROM documents
       |),
       |fr AS (
       |  SELECT doc_id, fam, m, w, h, i
       |  FROM p, LATERAL unnest(range(0, nf, 2)) AS t(i)
       |  WHERE NOT trunc
       |),
       |px AS (
       |  SELECT doc_id, i, j % 32 AS cx, j // 32 AS cy,
       |         ((fam * 41
       |           + (((j % 32) * w // 32) // 8) * (89 + 2 * (fam % 7) + 4 * i)
       |           + (((j // 32) * h // 32) // 8) * (131 + 2 * (fam % 5) + 6 * i)
       |           + (((j % 32) * w // 32) // 8) * (((j // 32) * h // 32) // 8) * (53 + fam % 3)) % 200)
       |           + 3 * m
       |           + CASE WHEN ((((j % 32) * w // 32) // 8) * 5 + (((j // 32) * h // 32) // 8) * 11 + i) % 31 = 0
       |                  THEN m ELSE 0 END AS v
       |  FROM fr, LATERAL unnest(range(0, 1024)) AS tj(j)
       |),
       |tmp AS (
       |  SELECT doc_id, i, cq.u AS u, px.cy AS y, SUM(px.v * cq.c) AS t
       |  FROM px JOIN cosq cq ON cq.x = px.cx
       |  GROUP BY doc_id, i, cq.u, px.cy
       |),
       |coef AS (
       |  SELECT doc_id, i, tmp.u AS u, cq.u AS v, SUM(tmp.t * cq.c) AS cf
       |  FROM tmp JOIN cosq cq ON cq.x = tmp.y
       |  GROUP BY doc_id, i, tmp.u, cq.u
       |),
       |med AS (
       |  SELECT doc_id, i, cf AS medv FROM (
       |    SELECT doc_id, i, cf, row_number() OVER (PARTITION BY doc_id, i ORDER BY cf) AS rn
       |    FROM coef
       |  ) WHERE rn = 32
       |),
       |hash AS (
       |  SELECT coef.doc_id AS doc_id, coef.i AS i,
       |         SUM(CASE WHEN (u * 8 + v) // 16 = 0 AND cf > medv THEN 1 << ((u * 8 + v) % 16) ELSE 0 END) AS b0,
       |         SUM(CASE WHEN (u * 8 + v) // 16 = 1 AND cf > medv THEN 1 << ((u * 8 + v) % 16) ELSE 0 END) AS b1,
       |         SUM(CASE WHEN (u * 8 + v) // 16 = 2 AND cf > medv THEN 1 << ((u * 8 + v) % 16) ELSE 0 END) AS b2,
       |         SUM(CASE WHEN (u * 8 + v) // 16 = 3 AND cf > medv THEN 1 << ((u * 8 + v) % 16) ELSE 0 END) AS b3
       |  FROM coef JOIN med ON med.doc_id = coef.doc_id AND med.i = coef.i
       |  GROUP BY coef.doc_id, coef.i
       |)""".stripMargin

  // the SAME literal table the engine's pHash uses (PhashOps.CosQ)
  private def cosSql: String =
    (for (x <- 0 until PhashOps.Size; u <- 0 until PhashOps.Freq)
      yield s"($x, $u, ${PhashOps.CosQ(x)(u)})").mkString(", ")

  override def oracles: Map[String, String] = Map(
    "video_phash" ->
      s"""WITH $hashCte
         |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, 'jpeg' AS status,
         |       CAST(b0 AS BIGINT) AS b0, CAST(b1 AS BIGINT) AS b1,
         |       CAST(b2 AS BIGINT) AS b2, CAST(b3 AS BIGINT) AS b3
         |FROM hash
         |UNION ALL
         |SELECT doc_id, CAST(NULL AS BIGINT), 'corrupt',
         |       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
         |FROM p WHERE trunc""".stripMargin,
    // near-dups: the plain quadratic join over frame-ALIGNED hashes —
    // the banded plan must reproduce it exactly (pigeonhole over the
    // >= 8 common-frame bands at total hamming <= 6)
    "video_near_dups" ->
      s"""WITH $hashCte,
         |pair AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         SUM(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |           + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))) AS hamming
         |  FROM hash a JOIN hash b ON a.doc_id < b.doc_id AND a.i = b.i
         |  GROUP BY a.doc_id, b.doc_id
         |)
         |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
         |FROM pair WHERE hamming <= 6""".stripMargin)
}
