package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL compressed-image decode — the closure of the modality story's
  * one deliberate seam: [[MultimodalOps]] decodes every uncompressed
  * format (PNM rasters, PNG/JPEG/WAV headers) with pure codegen'd
  * expressions, and documented that zlib-compressed pixel data stays
  * JVM-side. This operator is that JVM side, done honestly: a full
  * non-interlaced 8-bit PNG pixel decode — chunk walk with CRC checks,
  * multi-IDAT zlib inflate (`java.util.zip.Inflater`, in the JDK — no
  * new dependency), and scanline reconstruction for ALL FIVE filter
  * types (None/Sub/Up/Average/Paeth, RFC 2083 §6) — run through
  * `mapPartitions`.
  *
  * Why mapPartitions and not an Expression: DEFLATE is a bit-level
  * stateful stream (dynamic Huffman tables, 32 KiB back-references);
  * expressing it in Catalyst expressions would be an interpreter built
  * out of string ops — slower and unmaintainable. A per-partition loop
  * over a JDK-native codec is the canonical batched-decode shape (the
  * mapInPandas pattern from the Python side, minus the ser/de hop
  * because the codec is already on the JVM). The operator stays
  * scan-local: no shuffle, one pass, stats out — a 100-TB decode is
  * pure map parallelism.
  *
  * Correctness is pinned twice: the generated fixture rasters are
  * closed-form in doc_id (the [[MultimodalOps.pnmPayload]] formulas), so
  * the DuckDB oracle recomputes the expected stats WITHOUT a codec —
  * the decode must recover them through real deflate bytes and real
  * filters (filter type cycles (doc_id + row) % 5, so every filter is
  * exercised); and PngCodecSpec decodes the same payloads with
  * `javax.imageio` — an independent PNG implementation — and compares
  * pixel-for-pixel. */
object PngCodecOps {

  /** Reject fuzzed headers before allocating: dims beyond this are
    * 'corrupt' (a real pipeline sample-frames megapixel images first —
    * [[MultimodalOps]] scaladoc — rather than folding them through one
    * row). */
  val MaxSamples: Long = 1L << 22

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  // ---- fixture generation (executor-side; real Deflater, real CRCs) ----

  private[operators] def fixtureDims(docId: Long): (Int, Int, Int) =
    ((docId % 8 + 1).toInt, (docId % 6 + 1).toInt, if (docId % 2 == 0) 1 else 3)

  /** The [[MultimodalOps.pnmPayload]] closed-form sample value — shared
    * so the PNG and PNM fixtures carry the SAME rasters (the cross-codec
    * differential in PngCodecSpec). */
  private[operators] def fixtureSample(docId: Long, ch: Int, j: Long): Int =
    if (ch == 1) ((docId * 31 + j * 7) % 256).toInt
    else ((docId * 17 + j * 5) % 256).toInt

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32
    val t = typ.getBytes("US-ASCII")
    crc.update(t); crc.update(data)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
  }

  /** One real PNG file for a fixture doc: 8-bit gray (colorType 0) or
    * RGB (colorType 2), scanlines filtered with type (docId + row) % 5
    * (real filter arithmetic, so the decoder's reconstruction of all
    * five paths is load-bearing), zlib-deflated, IDAT split in two when
    * it is big enough to exercise multi-chunk concatenation. */
  private[operators] def encodePng(docId: Long): Array[Byte] = {
    val (w, h, ch) = fixtureDims(docId)
    val stride = w * ch
    val raw = Array.tabulate(h * stride)(j => fixtureSample(docId, ch, j.toLong).toByte)
    val filtered = new Array[Byte](h * (1 + stride))
    for (row <- 0 until h) {
      val f = ((docId + row) % 5).toInt
      filtered(row * (1 + stride)) = f.toByte
      for (i <- 0 until stride) {
        val x = raw(row * stride + i) & 0xff
        val a = if (i >= ch) raw(row * stride + i - ch) & 0xff else 0
        val b = if (row > 0) raw((row - 1) * stride + i) & 0xff else 0
        val c = if (row > 0 && i >= ch) raw((row - 1) * stride + i - ch) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        filtered(row * (1 + stride) + i + 1) = ((x - pred) & 0xff).toByte
      }
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(filtered)
    deflater.finish()
    val buf = new Array[Byte](filtered.length + 64)
    var zlen = 0
    while (!deflater.finished()) zlen += deflater.deflate(buf, zlen, buf.length - zlen)
    deflater.end()
    val z = buf.take(zlen)
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, if (ch == 1) 0 else 2, 0, 0, 0)
    val idats =
      if (z.length > 32) chunk("IDAT", z.take(z.length / 2)) ++ chunk("IDAT", z.drop(z.length / 2))
      else chunk("IDAT", z)
    val whole = Signature ++ chunk("IHDR", ihdr) ++ idats ++ chunk("IEND", Array.empty)
    // the corrupt twist: a mid-IDAT truncation — inflate cannot finish
    if (docId % 7 == 3) whole.take(whole.length - math.min(whole.length, 24)) else whole
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---- decode (any non-interlaced 8-bit gray/RGB PNG) ----

  private[operators] case class Decoded(width: Int, height: Int, channels: Int, samples: Array[Int])

  /** Full decode or None (malformed anywhere: signature, chunk CRC,
    * header guards, inflate failure, short raster). Never throws. */
  private[operators] def decodePng(bytes: Array[Byte]): Option[Decoded] =
    try {
      if (bytes.length < 8 || !bytes.take(8).sameElements(Signature)) return None
      var pos = 8
      var w = 0; var h = 0; var ch = 0; var seenIhdr = false; var seenIend = false
      val idat = new java.io.ByteArrayOutputStream
      def u32(o: Int): Long =
        ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      while (!seenIend) {
        if (pos + 12 > bytes.length) return None
        val len = u32(pos)
        if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
        val typ = new String(bytes, pos + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(bytes, pos + 4, 4 + len.toInt)
        if (crc.getValue != u32(pos + 8 + len.toInt)) return None
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = u32(pos + 8).toInt; h = u32(pos + 12).toInt
            val bitDepth = bytes(pos + 16) & 0xff
            val colorType = bytes(pos + 17) & 0xff
            // compression and filter METHOD bytes: only 0 is defined by
            // the spec — a nonzero value means the IDAT stream is not
            // zlib/filter-method-0, so decoding it would be garbage
            val compression = bytes(pos + 18) & 0xff
            val filterMethod = bytes(pos + 19) & 0xff
            val interlace = bytes(pos + 20) & 0xff
            if (bitDepth != 8 || compression != 0 || filterMethod != 0 || interlace != 0)
              return None
            ch = colorType match { case 0 => 1; case 2 => 3; case _ => return None }
            if (w < 1 || h < 1 || w.toLong * h * ch > MaxSamples) return None
            seenIhdr = true
          case "IDAT" => idat.write(bytes, pos + 8, len.toInt)
          case "IEND" => seenIend = true
          case _ => () // ancillary chunks skip (CRC already verified)
        }
        pos += 12 + len.toInt
      }
      if (!seenIhdr) return None
      val stride = w * ch
      val expect = h * (1 + stride)
      val inflater = new java.util.zip.Inflater
      inflater.setInput(idat.toByteArray)
      val filtered = new Array[Byte](expect)
      var got = 0
      while (got < expect && !inflater.finished()) {
        val n = inflater.inflate(filtered, got, expect - got)
        // ANY zero-progress state bails — needsInput (truncated stream),
        // needsDictionary (an FDICT zlib header: valid per RFC 1950 but
        // undecodable without the preset dictionary PNG never uses), or
        // anything else; a needsDictionary-only check would spin forever
        if (n == 0) { inflater.end(); return None }
        got += n
      }
      inflater.end()
      if (got < expect) return None
      val out = new Array[Int](h * stride)
      for (row <- 0 until h) {
        val f = filtered(row * (1 + stride)) & 0xff
        if (f > 4) return None
        for (i <- 0 until stride) {
          val x = filtered(row * (1 + stride) + i + 1) & 0xff
          val a = if (i >= ch) out(row * stride + i - ch) else 0
          val b = if (row > 0) out((row - 1) * stride + i) else 0
          val c = if (row > 0 && i >= ch) out((row - 1) * stride + i - ch) else 0
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 => paeth(a, b, c)
          }
          out(row * stride + i) = (x + pred) & 0xff
        }
      }
      Some(Decoded(w, h, ch, out))
    } catch { case _: Exception => None }

  // ---- operators ----

  /** (doc_id, media) table of real PNG files, one per fixture doc — the
    * compressed sibling of [[MultimodalOps.pnmMediaTable]], same rasters,
    * doc_id % 7 == 3 truncated mid-IDAT. */
  def pngMediaTable(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, encodePng(id))))
      .toDF("doc_id", "media")
  }

  private case class PngStats(
      doc_id: Long, status: String,
      width: Option[Long], height: Option[Long], channels: Option[Long],
      c0_sum: Option[Long], c0_min: Option[Long], c0_max: Option[Long],
      c1_sum: Option[Long], c1_min: Option[Long], c1_max: Option[Long],
      c2_sum: Option[Long], c2_min: Option[Long], c2_max: Option[Long])

  /** Per-channel pixel statistics from raw PNG bytes —
    * [[MultimodalOps.mediaPixels]]' exact output contract (status,
    * dims, per-channel sum/min/max), produced through a REAL inflate
    * and filter reconstruction. Malformed payloads degrade to a
    * 'corrupt' row with null stats, never an error. */
  def pngDecodeStats(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id").cast("long"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePng(bytes) match {
          case None => PngStats(id, "corrupt",
            None, None, None, None, None, None, None, None, None, None, None, None)
          case Some(d) =>
            // one imperative pass over the samples, zero boxed
            // intermediates — this is the per-image hot path and a
            // MaxSamples raster is 4M elements
            val ch = d.channels
            val sums = new Array[Long](ch)
            val mins = Array.fill(ch)(Long.MaxValue)
            val maxs = Array.fill(ch)(Long.MinValue)
            var j = 0
            while (j < d.samples.length) {
              val k = j % ch; val v = d.samples(j).toLong
              sums(k) += v
              if (v < mins(k)) mins(k) = v
              if (v > maxs(k)) maxs(k) = v
              j += 1
            }
            def stats(k: Int): (Option[Long], Option[Long], Option[Long]) =
              if (k >= ch) (None, None, None)
              else (Some(sums(k)), Some(mins(k)), Some(maxs(k)))
            val (s0, m0, x0) = stats(0); val (s1, m1, x1) = stats(1); val (s2, m2, x2) = stats(2)
            PngStats(id, "png", Some(d.width.toLong), Some(d.height.toLong),
              Some(d.channels.toLong), s0, m0, x0, s1, m1, x1, s2, m2, x2)
        }
      })
      .toDF()
  }

  /** The `png_pixels` fixture chain: generate → decode, stats out. */
  def pngPixels(docs: DataFrame): DataFrame = pngDecodeStats(pngMediaTable(docs))
}

object PngPack extends QueryPack {
  private def d(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "png_pixels" -> ((s, dir) => PngCodecOps.pngPixels(d(s, dir))))

  // the oracle never touches a codec: the fixture rasters are closed-form
  // in doc_id (the media_pixels formulas), so the expected stats are
  // recomputed directly — the engine must recover them through real
  // deflate bytes and all five PNG filters
  override def oracles: Map[String, String] = Map(
    "png_pixels" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch,
        |         doc_id % 8 + 1 AS w, doc_id % 6 + 1 AS h,
        |         doc_id % 7 = 3 AS trunc
        |  FROM documents
        |),
        |v AS (
        |  SELECT doc_id, ch, w, h, trunc,
        |         list_transform(range(0, w * h * ch), j ->
        |           CASE WHEN ch = 1 THEN (doc_id * 31 + j * 7) % 256
        |                ELSE (doc_id * 17 + j * 5) % 256 END) AS px
        |  FROM p
        |),
        |c AS (
        |  SELECT doc_id, ch, w, h, trunc,
        |         list_filter(px, (x, j) -> (j - 1) % ch = 0) AS c0,
        |         CASE WHEN ch = 3 THEN list_filter(px, (x, j) -> (j - 1) % ch = 1) END AS c1,
        |         CASE WHEN ch = 3 THEN list_filter(px, (x, j) -> (j - 1) % ch = 2) END AS c2
        |  FROM v
        |)
        |SELECT doc_id,
        |       CASE WHEN trunc THEN 'corrupt' ELSE 'png' END AS status,
        |       CASE WHEN NOT trunc THEN CAST(w AS BIGINT) END AS width,
        |       CASE WHEN NOT trunc THEN CAST(h AS BIGINT) END AS height,
        |       CASE WHEN NOT trunc THEN CAST(ch AS BIGINT) END AS channels,
        |       CASE WHEN NOT trunc THEN CAST(list_aggregate(c0, 'sum') AS BIGINT) END AS c0_sum,
        |       CASE WHEN NOT trunc THEN CAST(list_aggregate(c0, 'min') AS BIGINT) END AS c0_min,
        |       CASE WHEN NOT trunc THEN CAST(list_aggregate(c0, 'max') AS BIGINT) END AS c0_max,
        |       CASE WHEN NOT trunc THEN CAST(list_aggregate(c1, 'sum') AS BIGINT) END AS c1_sum,
        |       CASE WHEN NOT trunc THEN CAST(list_aggregate(c1, 'min') AS BIGINT) END AS c1_min,
        |       CASE WHEN NOT trunc THEN CAST(list_aggregate(c1, 'max') AS BIGINT) END AS c1_max,
        |       CASE WHEN NOT trunc THEN CAST(list_aggregate(c2, 'sum') AS BIGINT) END AS c2_sum,
        |       CASE WHEN NOT trunc THEN CAST(list_aggregate(c2, 'min') AS BIGINT) END AS c2_min,
        |       CASE WHEN NOT trunc THEN CAST(list_aggregate(c2, 'max') AS BIGINT) END AS c2_max
        |FROM c""".stripMargin)
}
