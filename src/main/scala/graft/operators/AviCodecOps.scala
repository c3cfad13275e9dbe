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

  /** One real AVI file: hdrl (avih + vids/MJPG strl), a JUNK chunk on
    * every 5th doc (odd-sized — the pad-rule exercise), movi with one
    * '00dc' MJPEG chunk per frame, and an idx1 keyframe index.
    * doc_id % 7 == 3 truncated (the corrupt twist: the RIFF size
    * outruns the buffer, which the walk refuses up front). */
  private[operators] def encodeAviFixture(docId: Long): Array[Byte] = {
    val (w, h) = fixtureDims(docId)
    val n = fixtureFrames(docId)
    val usPf = fixtureUsPf(docId)
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
      if (docId % 5 == 0) chunk("JUNK", Array.fill(((docId % 9) + 1).toInt)(0x4A.toByte))
      else Array.empty[Byte]
    val frames = (0 until n).map(i => frameBytes(docId, i))
    val movi = list("movi", frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val idx1 = chunk("idx1", frames.zipWithIndex.map { case (f, i) =>
      cc("00dc") ++ le(0x10, 4) ++ le(4L + 8 * i, 4) ++ le(f.length.toLong, 4)
    }.reduce(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ junk ++ movi ++ idx1
    val whole = cc("RIFF") ++ le(body.length.toLong, 4) ++ body
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
    docs.select(col("doc_id")).as[Long]
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
    docs.select(col("doc_id")).as[Long]
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
