package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in
  * this environment): it computes deterministic fake features from the
  * raw bytes. Everything around it — schema, batch iteration via
  * mapPartitions, partition-parallel execution, frame explosion — is the
  * real Spark plumbing a codec-backed implementation would drop into.
  * (A PySpark deployment would use mapInPandas with an Arrow batch of
  * binary + metadata; mapPartitions is the Scala-native equivalent with
  * identical batch shape.)
  */
object MultimodalOps {

  /** Media table derived from documents: payload = utf-8 bytes of text
    * (opaque binary as far as the operators are concerned) + typed
    * metadata columns. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        (length(encode(col("text"), "UTF-8")) % 640).as("width"),
        (length(encode(col("text"), "UTF-8")) % 480).as("height"),
        when(col("doc_id") % 3 === 0, "jpeg")
          .when(col("doc_id") % 3 === 1, "png")
          .otherwise("webp").as("format")).as("meta"))

  /** Byte-level stats + frame-sampling plan: how many 256-byte "frames"
    * each payload yields. Pure column ops (oracled). */
  def mediaStats(docs: DataFrame): DataFrame =
    mediaTable(docs).select(
      col("doc_id"),
      length(col("media")).as("n_bytes"),
      ceil(length(col("media")) / 256.0).cast("long").as("n_frames"),
      col("meta.format").as("format"),
      col("meta.width").as("width"))

  /** Frame sampling: explode each payload into 256-byte frame slices with
    * a frame index — the shape a video/audio chunker produces. `substring`
    * on binary is byte-addressed. */
  def frameSample(docs: DataFrame): DataFrame =
    mediaTable(docs)
      .withColumn("n_frames", ceil(length(col("media")) / 256.0).cast("int"))
      // zero-byte payloads emit NO frames: sequence(0, -1) would
      // auto-step DOWN and fabricate frame_idx [0, -1] phantom rows
      .filter(col("n_frames") >= 1)
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .select(
        col("doc_id"),
        col("frame_idx"),
        expr("substring(media, frame_idx * 256 + 1, 256)").as("frame"))
      .withColumn("frame_bytes", length(col("frame")))

  /** Frame-level exact dedup: identical 256-byte frames across the whole
    * media corpus, keyed on the frame's md5 — the binary-payload twin of
    * text exact dedup (duplicate stills in video, repeated intro audio,
    * shared image assets). One hash aggregate over the exploded frames;
    * at 100 TB the 16-byte digests shuffle, never the frames themselves. */
  def frameDedup(docs: DataFrame): DataFrame =
    frameSample(docs)
      .select(md5(col("frame")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
      .filter(col("n") > 1)

  /** Media → pseudo-embedding bridge: turns the stub features into a
    * small fixed-dim double vector (deterministic fake of an image/audio
    * encoder) shaped exactly like the `embeddings` table, so the ANN /
    * near-dup operators run unchanged on media-derived vectors. */
  def mediaEmbeddings(docs: DataFrame, dim: Int = 8): DataFrame =
    decodeFeatures(docs)
      .select(
        col("doc_id").as("vec_id"),
        transform(
          sequence(lit(1), lit(dim)),
          i => (pmod(col("checksum") * i + col("n_bytes"), lit(1000L)).cast("double") - 500.0) / 500.0)
          .as("embedding"),
        (col("doc_id") % 5).cast("int").as("label"))

  /** Deterministic, spec-correct PNG payloads derived from the fixture:
    * the 8-byte PNG signature, a well-formed IHDR chunk (length 13,
    * type "IHDR", 4-byte big-endian width/height, bit depth 8, a color
    * type cycling grayscale/truecolor/RGBA, compression 0, filter 0,
    * interlace cycling 0/1, and the REAL 4-byte chunk CRC-32 over type
    * + data per the spec), then the doc's text bytes as stand-in chunk
    * data. Docs with doc_id % 7 == 3 are TRUNCATED after the
    * signature — the corrupt-input path [[mediaDims]] must survive.
    * Binary is assembled with codegen'd column ops (unhex/lpad/hex):
    * 4-byte big-endian int = unhex(lpad(hex(v), 8, '0')). */
  private[graft] def pngPayload: org.apache.spark.sql.Column = {
    def be4(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
    def be1(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 2, "0"))
    val w = (col("doc_id") % 640 + 1).cast("long")
    val h = (col("doc_id") % 480 + 1).cast("long")
    val colorType = when(col("doc_id") % 3 === 0, 0L)
      .when(col("doc_id") % 3 === 1, 2L).otherwise(6L)
    val sig = unhex(lit("89504E470D0A1A0A"))
    val typeAndData = concat(
      encode(lit("IHDR"), "UTF-8"),
      be4(w), be4(h),
      be1(lit(8L)), // bit depth
      be1(colorType),
      unhex(lit("0000")), // compression 0, filter 0
      be1((col("doc_id") % 2).cast("long"))) // interlace
    val ihdr = concat(
      unhex(lit("0000000D")), // IHDR data length = 13
      typeAndData,
      be4(crc32(typeAndData))) // real chunk CRC (spec: over type + data)
    when(col("doc_id") % 7 === 3, sig)
      .otherwise(concat(sig, ihdr, encode(col("text"), "UTF-8")))
  }

  def pngMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), pngPayload.as("media"))

  // shared byte-access combinators over a binary column (1-based
  // positions, as substring on binary is byte-addressed): one set of
  // big-endian and little-endian readers serving all three parsers
  private def byteAt(media: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
    conv(hex(substring(media, p.cast("int"), lit(1))), 16, 10).cast("long")
  private def be16At(media: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
    conv(hex(substring(media, p.cast("int"), lit(2))), 16, 10).cast("long")
  private def le16At(media: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
    byteAt(media, p) + byteAt(media, p + 1L) * 256L
  private def le32At(media: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column) =
    le16At(media, p) + le16At(media, p + 2L) * 65536L

  /** Parsed-header struct for PNG bytes: fields (width, height,
    * bit_depth, channels, interlace, status). See [[mediaDims]] for the
    * spec walk-through; shared with [[mediaDimsMix]]'s dispatch path. */
  private[graft] def pngDimsStruct(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def beInt(start: Int, len: Int) =
      conv(hex(substring(media, start, len)), 16, 10).cast("long")
    val sigOk = upper(hex(substring(media, 1, 8))) === "89504E470D0A1A0A"
    val ihdrOk = substring(media, 13, 4) === encode(lit("IHDR"), "UTF-8") &&
      length(media) >= 29 && beInt(9, 4) === 13L
    val colorType = beInt(26, 1)
    val channels = when(colorType === 0L, 1L).when(colorType === 2L, 3L)
      .when(colorType === 3L, 1L).when(colorType === 4L, 2L)
      .when(colorType === 6L, 4L)
    val ok = sigOk && ihdrOk
    struct(
      when(ok, beInt(17, 4)).as("width"),
      when(ok, beInt(21, 4)).as("height"),
      when(ok, beInt(25, 1)).as("bit_depth"),
      when(ok, channels).as("channels"),
      when(ok, beInt(29, 1)).as("interlace"),
      when(ok, "png").otherwise("corrupt").as("status"))
  }

  /** REAL image-header decode — not a stub: parses width, height, bit
    * depth, channel count, and interlace method out of raw PNG bytes
    * exactly per the PNG spec (ISO/IEC 15948: 8-byte signature, then
    * the IHDR chunk — 4-byte big-endian length, 4-byte type, 13 data
    * bytes starting with two 4-byte big-endian dimensions). Works on
    * any real PNG file's bytes, guards on the signature + a complete
    * IHDR (status 'corrupt' with null dims otherwise), and runs as
    * pure codegen'd byte surgery (substring on binary is
    * byte-addressed; hex→conv folds big-endian ints) — no UDF, no
    * decode library. Channels follow the spec's color-type table:
    * 0 gray→1, 2 truecolor→3, 3 indexed→1, 4 gray+alpha→2, 6 RGBA→4. */
  def mediaDims(docs: DataFrame): DataFrame = {
    pngMediaTable(docs)
      .select(col("doc_id"), pngDimsStruct(col("media")).as("d"))
      .select(col("doc_id"), col("d.width").as("width"), col("d.height").as("height"),
        col("d.bit_depth").as("bit_depth"), col("d.channels").as("channels"),
        col("d.interlace").as("interlace"), col("d.status").as("status"))
  }

  /** Deterministic, spec-correct JPEG/JFIF payloads derived from the
    * fixture (ITU-T T.81 / JFIF 1.02 byte layout): SOI, a JFIF APP0
    * segment, a VARIABLE-LENGTH comment segment (payload doc_id%40+1
    * bytes — so the SOF offset differs per row and a parser cannot
    * assume fixed positions), an optional DQT stub every 5th doc (so
    * the number of segments varies too), then a frame header: SOF0
    * (baseline) when doc_id%4<2 else SOF2 (progressive), 8-bit
    * precision, big-endian height=doc_id%480+1 / width=doc_id%640+1,
    * and 1 (grayscale) or 3 (YCbCr) component specs, followed by the
    * doc's text bytes as stand-in entropy-coded data. Docs with
    * doc_id%7==3 are TRUNCATED after SOI — the corrupt-input path. */
  private[graft] def jpegPayload: org.apache.spark.sql.Column = {
    def be2(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 4, "0"))
    val soi = unhex(lit("FFD8"))
    // APP0: marker FFE0, len 16, "JFIF\0", version 1.02, units 0, 1x1 density, no thumb
    val app0 = unhex(lit("FFE000104A46494600010200000100010000"))
    val comLen = (col("doc_id") % 40 + 1).cast("long")
    val com = concat(unhex(lit("FFFE")), be2(comLen + 2L),
      unhex(repeat(lit("78"), comLen.cast("int"))))
    val dqt = unhex(lit("FFDB0005010203")) // stub DQT: marker, len 5, 3 data bytes
    val ncomp = when(col("doc_id") % 3 === 0, 1L).otherwise(3L)
    val sofMarker = when(col("doc_id") % 4 < 2, lit("FFC0")).otherwise(lit("FFC2"))
    val h = (col("doc_id") % 480 + 1).cast("long")
    val w = (col("doc_id") % 640 + 1).cast("long")
    // component specs (id, sampling, qtable): gray = (1,0x11,0); YCbCr = 2x2-subsampled luma
    val comps = when(ncomp === 1L, lit("011100")).otherwise(lit("012200021101031101"))
    val sof = concat(unhex(sofMarker), be2(lit(8L) + ncomp * 3L), unhex(lit("08")),
      be2(h), be2(w), unhex(lpad(hex(ncomp), 2, "0")), unhex(comps))
    val body = concat(soi, app0, com,
      when(col("doc_id") % 5 === 0, dqt).otherwise(unhex(lit(""))),
      sof, encode(col("text"), "UTF-8"))
    when(col("doc_id") % 7 === 3, soi).otherwise(body)
  }

  def jpegMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), jpegPayload.as("media"))

  /** 1-based offset of the frame-header (SOFn) marker inside a JPEG byte
    * stream, found by a REAL segment walk per ITU-T T.81 §B.1: starting
    * after SOI, each marker segment is 0xFF, a marker byte, and a 2-byte
    * big-endian length that INCLUDES the length field itself — the walk
    * reads each length to find the next marker, so variable-length APP0/
    * COM/DQT segments are traversed, never assumed. Bounded at `maxSegs`
    * steps (a real header has ~4-10 segments before SOF; bounded ⇒ the
    * expression tree is fixed-size and codegen-able at any data scale).
    * Runs as a single codegen'd `aggregate` over a constant sequence
    * threading (offset, found) state — no UDF. Sentinels: -1 = no SOF
    * within budget, -2 = malformed/truncated stream. SOF markers are
    * C0-CF minus DHT(C4)/JPG(C8)/DAC(CC) per the spec's marker table. */
  private[graft] def jpegSofOffset(
      media: org.apache.spark.sql.Column, maxSegs: Int = 8): org.apache.spark.sql.Column = {
    val sofMarkers = Seq(0xC0L, 0xC1L, 0xC2L, 0xC3L, 0xC5L, 0xC6L, 0xC7L,
      0xC9L, 0xCAL, 0xCBL, 0xCDL, 0xCEL, 0xCFL).map(lit)
    aggregate(
      sequence(lit(1), lit(maxSegs)),
      struct(lit(3L).as("off"), lit(-1L).as("sof")),
      (acc, _) => {
        val off = acc.getField("off")
        val sof = acc.getField("sof")
        val bad = off.isNull || (off + 3L) > length(media) || byteAt(media, off) =!= 0xFFL
        when(sof =!= -1L, acc) // found (>0) or already malformed (-2): hold state
          .when(bad, struct(coalesce(off, lit(-1L)).as("off"), lit(-2L).as("sof")))
          .when(byteAt(media, off + 1L).isin(sofMarkers: _*), struct(off.as("off"), off.as("sof")))
          .otherwise(struct((off + 2L + be16At(media, off + 2L)).as("off"), lit(-1L).as("sof")))
      },
      acc => acc.getField("sof"))
  }

  /** Parsed frame-header struct for JPEG bytes, same field shape as
    * [[pngDimsStruct]] so the two dispatch under one `when` in
    * [[mediaDimsMix]]. `interlace` carries the progressive flag (a
    * progressive JPEG is the interlaced analog): 1 for SOF2/6/10/14.
    * `sofOff` is the walk result from [[jpegSofOffset]] — callers MUST
    * materialize it in its own projection first: the struct references
    * it ~12 times, lambda-bearing expressions are excluded from
    * subexpression elimination, and inlining would re-run the 8-step
    * walk per reference per row (the media_sniff incident class). */
  private[graft] def jpegDimsStruct(
      media: org.apache.spark.sql.Column,
      sofOff: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val sigOk = upper(hex(substring(media, 1, 2))) === "FFD8"
    val ok = sigOk && sofOff > 0L && (sofOff + 9L) <= length(media)
    struct(
      when(ok, be16At(media, sofOff + 7L)).as("width"),
      when(ok, be16At(media, sofOff + 5L)).as("height"),
      when(ok, byteAt(media, sofOff + 4L)).as("bit_depth"),
      when(ok, byteAt(media, sofOff + 9L)).as("channels"),
      when(ok, when(byteAt(media, sofOff + 1L).isin(0xC2L, 0xC6L, 0xCAL, 0xCEL), 1L)
        .otherwise(0L)).as("interlace"),
      when(ok, "jpeg").otherwise("corrupt").as("status"))
  }

  /** REAL JPEG frame-header decode via the segment walk above: width,
    * height, bit depth (sample precision), component count, and the
    * progressive flag, straight from the bytes — works on any baseline/
    * progressive JFIF file's header, 'corrupt' with null dims on
    * truncated streams. */
  def jpegDims(docs: DataFrame): DataFrame = {
    jpegMediaTable(docs)
      .select(col("doc_id"), col("media"), jpegSofOffset(col("media")).as("sof_off"))
      .select(col("doc_id"), jpegDimsStruct(col("media"), col("sof_off")).as("d"))
      .select(col("doc_id"), col("d.width").as("width"), col("d.height").as("height"),
        col("d.bit_depth").as("bit_depth"), col("d.channels").as("channels"),
        col("d.interlace").as("progressive"), col("d.status").as("status"))
  }

  /** Mixed-format media table: even docs carry PNG bytes, odd docs carry
    * JPEG bytes — the realistic shape of a scraped image corpus where
    * format is NOT a metadata column and must be sniffed per payload. */
  def mixedMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, pngPayload).otherwise(jpegPayload).as("media"))

  /** Format dispatch on MAGIC BYTES (not metadata): PNG signature →
    * PNG IHDR parse, JPEG SOI → SOF segment walk, anything else →
    * corrupt. One pass, both parsers as codegen'd column expressions
    * under a `when` — at 100 TB this is a scan-local projection with
    * zero shuffles, the cheapest possible format census. */
  def mediaDimsMix(docs: DataFrame): DataFrame = {
    val m = mixedMediaTable(docs)
    val isPng = upper(hex(substring(col("media"), 1, 8))) === "89504E470D0A1A0A"
    val isJpg = upper(hex(substring(col("media"), 1, 2))) === "FFD8"
    val nullDims = struct(
      lit(null).cast("long").as("width"), lit(null).cast("long").as("height"),
      lit(null).cast("long").as("bit_depth"), lit(null).cast("long").as("channels"),
      lit(null).cast("long").as("interlace"), lit("corrupt").as("status"))
    m.select(col("doc_id"), col("media"),
        // the walk runs ONCE per row in its own projection; on non-JPEG
        // bytes it terminates at the first malformed marker (-2)
        when(isJpg, jpegSofOffset(col("media"))).otherwise(-2L).as("sof_off"))
      .select(col("doc_id"),
        when(isPng, pngDimsStruct(col("media")))
          .when(isJpg, jpegDimsStruct(col("media"), col("sof_off")))
          .otherwise(nullDims).as("d"))
      .select(col("doc_id"), col("d.width").as("width"), col("d.height").as("height"),
        col("d.bit_depth").as("bit_depth"), col("d.channels").as("channels"),
        col("d.interlace").as("interlace"), col("d.status").as("status"))
  }

  /** Deterministic, spec-correct WAV/RIFF payloads derived from the
    * fixture (RIFF 1991 spec / WAVE format): "RIFF" + little-endian
    * 32-bit size + "WAVE", a VARIABLE-LENGTH "JUNK" padding chunk
    * (payload doc_id%20+1 bytes, odd sizes padded to the word boundary
    * with the pad EXCLUDED from the size field, exactly per spec — so
    * a chunk walk must apply the even-alignment rule to survive), an
    * extra "LIST" chunk every 5th doc, then the canonical 16-byte
    * "fmt " chunk (PCM, channels doc_id%2+1, sample rate cycling
    * 8000/16000/44100, bit depth 8·(doc_id%4+1), derived byte rate and
    * block align), and a "data" chunk wrapping the doc's text bytes.
    * RIFF is LITTLE-endian throughout — the opposite byte order from
    * the PNG/JPEG constructions, so the three parsers can't share a
    * lucky codepath. Docs with doc_id%7==3 are TRUNCATED after "RIFF". */
  private[graft] def wavPayload: org.apache.spark.sql.Column = {
    def byteOf(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c.bitwiseAND(lit(255L))), 2, "0"))
    def le16(c: org.apache.spark.sql.Column) = concat(byteOf(c), byteOf(shiftright(c, 8)))
    def le32(c: org.apache.spark.sql.Column) =
      concat(byteOf(c), byteOf(shiftright(c, 8)), byteOf(shiftright(c, 16)), byteOf(shiftright(c, 24)))
    def tag(s: String) = encode(lit(s), "UTF-8")
    val junkN = (col("doc_id") % 20 + 1).cast("long")
    val junk = concat(tag("JUNK"), le32(junkN),
      unhex(repeat(lit("4A"), junkN.cast("int"))),
      when(junkN % 2 === 1, unhex(lit("00"))).otherwise(unhex(lit(""))))
    val list = concat(tag("LIST"), le32(lit(4L)), tag("INFO"))
    val hasList = col("doc_id") % 5 === 0
    val channels = (col("doc_id") % 2 + 1).cast("long")
    val sampleRate = when(col("doc_id") % 3 === 0, 8000L)
      .when(col("doc_id") % 3 === 1, 16000L).otherwise(44100L)
    val bytesPerSample = (col("doc_id") % 4 + 1).cast("long")
    val blockAlign = channels * bytesPerSample
    val fmt = concat(tag("fmt "), le32(lit(16L)),
      le16(lit(1L)),             // PCM
      le16(channels),
      le32(sampleRate),
      le32(sampleRate * blockAlign), // byte rate
      le16(blockAlign),
      le16(bytesPerSample * 8L)) // bits per sample
    val dataLen = length(encode(col("text"), "UTF-8")).cast("long")
    val data = concat(tag("data"), le32(dataLen), encode(col("text"), "UTF-8"))
    val riffSize = lit(4L) + (lit(8L) + junkN + junkN % 2) +
      when(hasList, 12L).otherwise(0L) + lit(24L) + (lit(8L) + dataLen)
    val body = concat(tag("RIFF"), le32(riffSize), tag("WAVE"),
      junk, when(hasList, list).otherwise(unhex(lit(""))), fmt, data)
    when(col("doc_id") % 7 === 3, tag("RIFF")).otherwise(body)
  }

  def wavMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), wavPayload.as("media"))

  /** 1-based offset of the "fmt " chunk inside a RIFF/WAVE stream, by a
    * REAL chunk walk: each RIFF chunk is a 4-byte ID, a 4-byte
    * LITTLE-endian size, the payload, and a pad byte when the size is
    * odd (pad excluded from the size field) — the walk reads each size
    * and applies the alignment rule to reach the next chunk; unknown
    * chunk types (JUNK, LIST, ...) are skipped BY SIZE, never assumed.
    * Same bounded-`aggregate` construction as [[jpegSofOffset]];
    * sentinels -1 = not found in budget, -2 = malformed/truncated. */
  private[graft] def wavFmtOffset(
      media: org.apache.spark.sql.Column, maxChunks: Int = 8): org.apache.spark.sql.Column = {
    def le32At(p: org.apache.spark.sql.Column) = MultimodalOps.le32At(media, p)
    aggregate(
      sequence(lit(1), lit(maxChunks)),
      struct(lit(13L).as("off"), lit(-1L).as("fmt")), // 13 = after RIFF+size+WAVE
      (acc, _) => {
        val off = acc.getField("off")
        val fmt = acc.getField("fmt")
        val bad = off.isNull || (off + 7L) > length(media)
        val chunkSize = le32At(off + 4L)
        when(fmt =!= -1L, acc)
          .when(bad, struct(coalesce(off, lit(-1L)).as("off"), lit(-2L).as("fmt")))
          .when(substring(media, off.cast("int"), lit(4)) === encode(lit("fmt "), "UTF-8"),
            struct(off.as("off"), off.as("fmt")))
          .otherwise(struct((off + 8L + chunkSize + chunkSize % 2L).as("off"), lit(-1L).as("fmt")))
      },
      acc => acc.getField("fmt"))
  }

  /** Parsed PCM-header struct for WAV bytes: fields (sample_rate,
    * channels, bits, byte_rate, block_align, status). `fmtOff` is the
    * walk result from [[wavFmtOffset]] — callers MUST materialize it in
    * its own projection first (same re-evaluation hazard as
    * [[jpegDimsStruct]]'s `sofOff`). */
  private[graft] def wavDimsStruct(
      media: org.apache.spark.sql.Column,
      fmtOff: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val riffOk = substring(media, 1, 4) === encode(lit("RIFF"), "UTF-8") &&
      substring(media, 9, 4) === encode(lit("WAVE"), "UTF-8")
    val ok = riffOk && fmtOff > 0L && (fmtOff + 23L) <= length(media) &&
      le32At(media, fmtOff + 4L) >= 16L
    struct(
      when(ok, le32At(media, fmtOff + 12L)).as("sample_rate"),
      when(ok, le16At(media, fmtOff + 10L)).as("channels"),
      when(ok, le16At(media, fmtOff + 22L)).as("bits"),
      when(ok, le32At(media, fmtOff + 16L)).as("byte_rate"),
      when(ok, le16At(media, fmtOff + 20L)).as("block_align"),
      when(ok, "wav").otherwise("corrupt").as("status"))
  }

  /** REAL audio-header decode: sample rate, channel count, bit depth,
    * byte rate, and block align straight from WAV bytes via the RIFF
    * chunk walk — works on any PCM WAV file's header, 'corrupt' with
    * null fields on truncated or non-RIFF streams. Completes the
    * modality set: PNG + JPEG (image, big-endian), WAV (audio,
    * little-endian), all as scan-local codegen'd projections. */
  def wavDims(docs: DataFrame): DataFrame = {
    wavMediaTable(docs)
      .select(col("doc_id"), col("media"), wavFmtOffset(col("media")).as("fmt_off"))
      .select(col("doc_id"), wavDimsStruct(col("media"), col("fmt_off")).as("d"))
      .select(col("doc_id"), col("d.sample_rate").as("sample_rate"),
        col("d.channels").as("channels"), col("d.bits").as("bits"),
        col("d.byte_rate").as("byte_rate"), col("d.block_align").as("block_align"),
        col("d.status").as("status"))
  }

  /** The two walk offsets a sniff/parse projection needs, guarded by
    * their magics so each walk only runs on bytes of its own format
    * (on anything else it is skipped entirely, -2 = not applicable).
    * Select these AS COLUMNS in their own projection before calling
    * [[sniffStatus]] / the dims structs — see the re-evaluation note on
    * [[jpegDimsStruct]]. */
  private[graft] def walkOffsets(media: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = Seq(
    when(upper(hex(substring(media, 1, 2))) === "FFD8", jpegSofOffset(media))
      .otherwise(-2L).as("sof_off"),
    when(substring(media, 1, 4) === encode(lit("RIFF"), "UTF-8"), wavFmtOffset(media))
      .otherwise(-2L).as("fmt_off"))

  /** Per-payload format verdict across ALL three parsers, dispatched on
    * magic bytes: 'png'/'jpeg'/'wav' when the matching header parses,
    * 'corrupt' when the magic is right but the header is not, 'unknown'
    * when no magic matches. Stateless scan-local expression — shared by
    * the batch census and the streaming ingest gate so the two can never
    * disagree on a payload. `sofOff`/`fmtOff` come from [[walkOffsets]]
    * materialized in a prior projection. */
  private[graft] def sniffStatus(
      media: org.apache.spark.sql.Column,
      sofOff: org.apache.spark.sql.Column,
      fmtOff: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val isPng = upper(hex(substring(media, 1, 8))) === "89504E470D0A1A0A"
    val isJpg = upper(hex(substring(media, 1, 2))) === "FFD8"
    val isRiff = substring(media, 1, 4) === encode(lit("RIFF"), "UTF-8")
    when(isPng, pngDimsStruct(media).getField("status"))
      .when(isJpg, jpegDimsStruct(media, sofOff).getField("status"))
      .when(isRiff, wavDimsStruct(media, fmtOff).getField("status"))
      .otherwise("unknown")
  }

  /** Three-format corpus census: payloads cycle PNG/JPEG/WAV by doc_id%3
    * with every 11th doc carrying non-media bytes (ASCII text behind an
    * 'x' prefix so no magic can match by accident), and the per-payload
    * verdict comes from [[sniffStatus]] — the full dispatch (three
    * parsers + unknown) under the DuckDB oracle, not just a spec. */
  def mediaSniff(docs: DataFrame): DataFrame = {
    val payload = when(col("doc_id") % 11 === 1,
        encode(concat(lit("x"), col("text")), "UTF-8"))
      .when(col("doc_id") % 3 === 0, pngPayload)
      .when(col("doc_id") % 3 === 1, jpegPayload)
      .otherwise(wavPayload)
    // the payload and the walk offsets MUST materialize in their own
    // projections: sniffStatus references `media` ~40 times across the
    // three parsers, and inlining the construction into every reference
    // re-builds the payload per reference per row (measured 60× slower
    // before this split). Staged selects are safe — CollapseProject
    // declines to inline a non-cheap expression with multiple references.
    docs.select(col("doc_id"), payload.as("media"))
      .select(col("doc_id") +: col("media") +: walkOffsets(col("media")): _*)
      .select(col("doc_id"),
        sniffStatus(col("media"), col("sof_off"), col("fmt_off")).as("status"))
  }

  /** Deterministic, spec-correct binary Netpbm payloads — P5 (grayscale)
    * for even doc_ids, P6 (RGB) for odd: the ASCII header
    * `P5\n<w> <h>\n255\n` (single-whitespace separators per the PNM
    * spec) followed by w·h·ch RAW pixel bytes, one byte per sample,
    * row-major, RGB interleaved for P6. Dims w = doc_id%8+1,
    * h = doc_id%6+1; pixel byte j is (doc_id·31 + j·7) % 256 for P5 and
    * (doc_id·17 + j·5) % 256 for P6 — closed forms the oracle mirrors
    * without building bytes. Docs with doc_id % 7 == 3 are TRUNCATED
    * after the magic — the corrupt path [[mediaPixels]] must survive.
    * Assembled with codegen'd column ops (hex/lpad/unhex), no UDF. */
  private[graft] def pnmPayload: org.apache.spark.sql.Column = {
    val ch = when(col("doc_id") % 2 === 0, 1L).otherwise(3L)
    val w = (col("doc_id") % 8 + 1).cast("long")
    val h = (col("doc_id") % 6 + 1).cast("long")
    val n = w * h * ch
    val header = encode(concat(
      when(ch === 1L, lit("P5")).otherwise(lit("P6")),
      lit("\n"), w.cast("string"), lit(" "), h.cast("string"), lit("\n255\n")),
      "UTF-8")
    val pix = (j: org.apache.spark.sql.Column) =>
      when(ch === 1L, pmod(col("doc_id") * 31 + j * 7, lit(256L)))
        .otherwise(pmod(col("doc_id") * 17 + j * 5, lit(256L)))
    val raster = unhex(array_join(
      transform(sequence(lit(0L), n - 1L), j => lpad(hex(pix(j)), 2, "0")), ""))
    when(col("doc_id") % 7 === 3, encode(lit("P5\n"), "UTF-8"))
      .otherwise(concat(header, raster))
  }

  def pnmMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), pnmPayload.as("media"))

  /** Parse columns for raw PNM bytes: a REAL pixel-level decode, not a
    * header skim — (status, width, height, channels) plus the per-channel
    * sample arrays c0/c1/c2 decoded from the raster. The header is parsed
    * by an anchored regex over the prefix decoded as ISO-8859-1 — the
    * 1:1 byte↔char map, so arbitrary raster bytes behind the header can
    * never raise MALFORMED_CHARACTER_CODING the way an ANSI-mode UTF-8
    * decode would, ASCII header chars are unchanged, and the matched
    * prefix's char length IS the raster's byte offset. Dimension fields
    * are capped at 8 digits by the pattern — a cast that can never
    * overflow under ANSI — and the guards (magic, maxval 255, dims ≥ 1,
    * payload actually long enough for w·h·ch samples) gate EVERY
    * raster-touching branch, so fuzzed headers with absurd dims are
    * rejected before any array materializes. The raster walk itself is
    * hex → per-sample conv over a sequence, channel-deinterleaved by
    * j % ch — built-in higher-order functions, no UDF.
    *
    * Scale note: the walk materializes one n-sample array per image —
    * exact and fine for the bounded-dim uncompressed formats this
    * decodes; for megapixel rasters sample frames/tiles first
    * ([[frameSample]]) rather than folding whole images through one row.
    * Each array column materializes ONCE in its own projection
    * ([[mediaSniff]]'s staged-select discipline) so the three stats per
    * channel don't re-run the walk. */
  private[graft] def pnmParseCols(media: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = {
    // 64-byte header window: worst-case dims ("P6\n99999999 99999999\n255\n")
    // is 25 bytes, so runs of extra whitespace still fit with slack.
    // Separators are \s+ (the spec allows any whitespace run); the final
    // separator stays a SINGLE whitespace char — per spec exactly one
    // char follows maxval before the raster. '#' comment lines are NOT
    // supported and report 'corrupt' (documented limitation).
    val prefix = decode(substring(media, 1, 64), "ISO-8859-1")
    val re = "^(P[56])\\s+([0-9]{1,8})\\s+([0-9]{1,8})\\s+([0-9]{1,8})\\s"
    val m0 = regexp_extract(prefix, re, 0)
    val matched = m0 =!= ""
    def grp(i: Int) = when(matched, regexp_extract(prefix, re, i).cast("long"))
    val w = grp(2); val h = grp(3); val maxv = grp(4)
    val magic = regexp_extract(prefix, re, 1)
    val ch = when(magic === "P5", 1L).when(magic === "P6", 3L)
    val n = w * h * ch
    val off = length(m0) + 1L
    val ok = matched && maxv === 255L && w >= 1L && h >= 1L &&
      length(media) >= off + n - 1L
    lazy val rhex = hex(media.substr(off.cast("int"), n.cast("int")))
    def chan(k: Int) = {
      val idx = filter(sequence(lit(0L), n - 1L), j => pmod(j, ch) === lit(k.toLong))
      transform(idx, j =>
        conv(substring(rhex, (j * 2 + 1).cast("int"), lit(2)), 16, 10).cast("long"))
    }
    Seq(
      when(ok, when(ch === 1L, "pgm").otherwise("ppm")).otherwise("corrupt").as("status"),
      when(ok, w).as("width"),
      when(ok, h).as("height"),
      when(ok, ch).as("channels"),
      when(ok, chan(0)).as("c0"),
      when(ok && ch === 3L, chan(1)).as("c1"),
      when(ok && ch === 3L, chan(2)).as("c2"))
  }

  /** Pixel-level media decode — the end of the modality story: real
    * bytes in ([[pnmPayload]] or any comment-free P5/P6 file whose
    * header fits the 64-byte window — '#' comment lines report
    * 'corrupt'), exact per-channel pixel statistics out (sum/min/max per channel — deterministic
    * integer math, so the DuckDB oracle pins the decode bit-for-bit).
    * Corrupt payloads degrade to a 'corrupt' status row with null stats,
    * never an error. Two staged projections: the parse (arrays
    * materialize once) and the stats fold. */
  def mediaPixels(docs: DataFrame): DataFrame = {
    def stats(c: String) = Seq(
      aggregate(col(c), lit(0L), (a, x) => a + x).as(s"${c}_sum"),
      array_min(col(c)).as(s"${c}_min"),
      array_max(col(c)).as(s"${c}_max"))
    pnmMediaTable(docs)
      .select(col("doc_id") +: pnmParseCols(col("media")): _*)
      .select(Seq(col("doc_id"), col("status"), col("width"), col("height"),
        col("channels")) ++ stats("c0") ++ stats("c1") ++ stats("c2"): _*)
  }

  /** Perceptual image hash (aHash — average hash) over DECODED pixels:
    * the image-dedup primitive the pixel decoder unlocks. Per image: the
    * grayscale plane (c0 for P5; integer channel mean for P6), its
    * integer mean, and one bit per pixel — set iff the pixel is brighter
    * than the mean — folded into a LONG (row-major, bit j = pixel j; the
    * fixture's rasters are ≤48 px so the hash never overflows 63 bits).
    * Equal hashes ⇒ perceptually-identical images (the exact-dup class);
    * a hamming-ball banded join is the documented near-dup extension,
    * [[DedupOps]]' simhash machinery applied to this hash. All integer
    * math (DIV means, no doubles) so the oracle pins it bit-for-bit;
    * corrupt payloads carry a null hash. Scale shape: scan-local per-doc
    * work then a map-side-combinable census — the media twin of
    * [[graft.operators.TextOps.fingerprint]]. */
  def mediaAHash(docs: DataFrame): DataFrame = {
    val parsed = pnmMediaTable(docs)
      .select(col("doc_id") +: pnmParseCols(col("media")): _*)
    // the gray plane materializes in its own projection (the staged-
    // select discipline: three downstream references must not re-run
    // the channel zip)
    val gray = parsed.select(
      col("doc_id"), col("status"), col("width"), col("height"), col("channels"),
      when(col("channels") === 1L, col("c0"))
        .when(col("channels") === 3L,
          expr("zip_with(zip_with(c0, c1, (x, y) -> x + y), c2, (s, z) -> (s + z) DIV 3L)"))
        .as("g"))
    gray
      .withColumn("mean_px",
        expr("aggregate(g, 0L, (a, x) -> a + x) DIV size(g)"))
      .select(col("doc_id"), col("status"), col("width"), col("height"), col("channels"),
        expr("""aggregate(sequence(0L, size(g) - 1L), 0L,
                 (acc, j) -> acc + IF(element_at(g, cast(j + 1 AS int)) > mean_px,
                                      shiftleft(1L, cast(j AS int)), 0L))""")
          .as("ahash"))
  }

  /** Perceptual NEAR-dup pairs over [[mediaAHash]] — [[DedupOps]]'
    * banded-LSH machinery applied to the pixel hash: the 48-bit hash
    * splits into 4 bands of 12 bits keyed WITH the image dims (different
    * shapes never compare), candidates share ≥1 band, survivors verify
    * by exact hamming distance. Pigeonhole: hamming ≤ maxHamming < 4
    * differing bits can spoil at most maxHamming bands, so banding is
    * EXACT-recall at the default threshold — the oracle is the plain
    * quadratic self-join, and the banded plan must reproduce it.
    * Buckets are capped at [[DedupOps.MaxBandBucket]] members (dropped
    * whole, the [[DedupOps.capBuckets]] contract) so a degenerate
    * corpus of identical images cannot square inside one bucket —
    * identical-image groups a dropped bucket hides are still caught by
    * grouping [[mediaAHash]] exactly. */
  /** Bits covered by the banding: the fixture rasters are ≤ 48 px so the
    * hash always fits; `bands` must divide this. */
  val AHashBits = 48

  def ahashNearDups(docs: DataFrame, maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    // the band structure is a PUBLIC dial (the minhash (numPerms,
    // bandSize) convention): b bands of 48/b bits are exact-recall for
    // any hamming radius < b, so DIFFERENT bandings at the same radius
    // return the IDENTICAL verified pair set — banding is an
    // implementation dial, not semantics (property-tested; the 8-band
    // twin is oracled). CAVEAT: the invariance holds only while no
    // (dims, band, bits) bucket exceeds DedupOps.MaxBandBucket — capped
    // buckets drop whole, and 12-bit vs 6-bit keys flood different
    // buckets, so once the cap engages the candidate set (and thus the
    // pair set) becomes banding-dependent
    require(bands > 0 && AHashBits % bands == 0,
      s"bands must divide $AHashBits, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"banding is exact-recall only for hamming < $bands bands, got $maxHamming")
    val bw = AHashBits / bands
    val h = graft.Caching.maybeCache(
      mediaAHash(docs)
        .filter(col("status") =!= "corrupt")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("ahash")))
    val banded = h
      .select(col("doc_id"), col("width"), col("height"), col("channels"),
        col("ahash"), explode(lit((0 until bands).toArray)).as("band"))
      .withColumn("bits",
        expr(s"shiftright(ahash, band * $bw) & ${(1L << bw) - 1}L"))
    // cached: the candidate self-join reads the capped banding twice,
    // and each uncached read re-runs the bucket-count window
    val capped = graft.Caching.maybeCache(DedupOps.capBuckets(banded,
      Seq("width", "height", "channels", "band", "bits")))
    val cand = capped.as("a").join(capped.as("b"),
        col("a.width") === col("b.width") &&
          col("a.height") === col("b.height") &&
          col("a.channels") === col("b.channels") &&
          col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Decode + feature extraction over batches through the codec seam:
    * the per-partition iterator is where a JNI/FFI codec for COMPRESSED
    * formats would init once per executor task and decode per record —
    * features here are the byte-level fold (length, header, polynomial
    * checksum), all genuinely computed from the payload bytes. For the
    * uncompressed formats the engine decodes natively, the real
    * pixel-level path is [[mediaPixels]] (pure column expressions, no
    * mapPartitions needed); for the COMPRESSED formats the real decoders
    * live behind this same seam shape — [[PngCodecOps]] (zlib + the five
    * filters) and [[JpegCodecOps]] (baseline Huffman entropy decode +
    * IDCT, grayscale profile) — so this fold remains the generic
    * bytes-in features path, not a stand-in for a missing codec. */
  def decodeFeatures(docs: DataFrame): DataFrame = {
    val media = mediaTable(docs).select(col("doc_id"), col("media"))
    import media.sparkSession.implicits._
    media
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // codec seam: a compressed-format decoder inits once here, then
        // decodes per record (uncompressed formats: see mediaPixels)
        batch.map { case (id, bytes) =>
          // header as a hex string (not array<int>): scalar columns keep the
          // output sortable/hashable by generic row-comparison harnesses
          val head = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
          var checksum = 0L
          var i = 0
          while (i < bytes.length) { checksum = (checksum * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
          (id, bytes.length, head, checksum)
        }
      }
      .toDF("doc_id", "n_bytes", "header_hex", "checksum")
  }
}

object MultimodalPack extends QueryPack {
  private def d(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_stats" -> ((s, dir) => MultimodalOps.mediaStats(d(s, dir))),
    // left join from the media table so zero-byte payloads report
    // (0, 0) like the oracle, instead of vanishing with their frames
    "media_frames" -> { (s, dir) =>
      val frames = MultimodalOps.frameSample(d(s, dir))
        .groupBy("doc_id").agg(count(lit(1)).as("nf"), sum(col("frame_bytes")).as("tb"))
      MultimodalOps.mediaTable(d(s, dir)).select(col("doc_id"))
        .join(frames, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("nf"), lit(0L)).as("n_frames"),
          coalesce(col("tb"), lit(0L)).as("total_bytes"))
    },
    "media_features" -> ((s, dir) => MultimodalOps.decodeFeatures(d(s, dir))),
    "media_dims" -> ((s, dir) => MultimodalOps.mediaDims(d(s, dir))),
    "jpeg_dims" -> ((s, dir) => MultimodalOps.jpegDims(d(s, dir))),
    "media_dims_mix" -> ((s, dir) => MultimodalOps.mediaDimsMix(d(s, dir))),
    "wav_dims" -> ((s, dir) => MultimodalOps.wavDims(d(s, dir))),
    "media_sniff" -> ((s, dir) => MultimodalOps.mediaSniff(d(s, dir))),
    "media_pixels" -> ((s, dir) => MultimodalOps.mediaPixels(d(s, dir))),
    "media_ahash" -> ((s, dir) => MultimodalOps.mediaAHash(d(s, dir))),
    "ahash_near_dups" -> ((s, dir) => MultimodalOps.ahashNearDups(d(s, dir))),
    "ahash_near_dups8" -> ((s, dir) =>
      MultimodalOps.ahashNearDups(d(s, dir), maxHamming = 2, bands = 8)),
    "frame_dedup" -> ((s, dir) => MultimodalOps.frameDedup(d(s, dir)))
  )

  /** The capped-banded perceptual near-dup chain as SQL, parameterized
    * by the same (maxHamming, bands) dial as the Scala side — used by
    * the default AND the non-default-banding twin. */
  private def ahashNearDupsSql(maxHamming: Int, bands: Int): String = {
    val bw = MultimodalOps.AHashBits / bands
    s"""WITH p AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch,
       |         doc_id % 8 + 1 AS w, doc_id % 6 + 1 AS h
       |  FROM documents WHERE doc_id % 7 <> 3
       |),
       |v AS (
       |  SELECT doc_id, ch, w, h,
       |         list_transform(range(0, w * h * ch), j ->
       |           CASE WHEN ch = 1 THEN (doc_id * 31 + j * 7) % 256
       |                ELSE (doc_id * 17 + j * 5) % 256 END) AS px
       |  FROM p
       |),
       |g AS (
       |  SELECT doc_id, ch, w, h,
       |         CASE WHEN ch = 1 THEN px
       |              ELSE list_transform(range(0, w * h), j ->
       |                     (px[3*j + 1] + px[3*j + 2] + px[3*j + 3]) // 3) END AS gr
       |  FROM v
       |),
       |hh AS (
       |  SELECT doc_id, ch, w, h,
       |         CAST(list_sum(list_transform(gr, (x, j) ->
       |           CASE WHEN x > list_aggregate(gr, 'sum') // len(gr)
       |                THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE 0 END)) AS BIGINT) AS ahash
       |  FROM g
       |),
       |banded AS (
       |  SELECT doc_id, ch, w, h, ahash, j AS band,
       |         (ahash >> (j * $bw)) & ${(1L << bw) - 1} AS bits
       |  FROM hh, range(0, $bands) r(j)
       |),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY w, h, ch, band, bits) AS bsz
       |    FROM banded
       |  ) WHERE bsz <= ${DedupOps.MaxBandBucket}
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.ahash AS ha, b.ahash AS hb
       |  FROM capped a JOIN capped b
       |    ON a.w = b.w AND a.h = b.h AND a.ch = b.ch
       |   AND a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= $maxHamming""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "media_stats" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       CAST(CEIL(octet_length(encode(text)) / CAST(256.0 AS DOUBLE)) AS BIGINT) AS n_frames,
        |       CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
        |            WHEN doc_id % 3 = 1 THEN 'png'
        |            ELSE 'webp' END AS format,
        |       CAST(octet_length(encode(text)) % 640 AS INT) AS width
        |FROM documents""".stripMargin,
    "media_frames" ->
      """SELECT doc_id,
        |       CAST(CEIL(octet_length(encode(text)) / CAST(256.0 AS DOUBLE)) AS BIGINT) AS n_frames,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
        |FROM documents""".stripMargin,
    // the stub checksum is a byte-wise polynomial fold; DuckDB has no blob
    // indexing, so the oracle folds over the hex string two chars at a time
    "media_features" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       lower(substring(hex(encode(text)), 1, 8)) AS header_hex,
        |       list_reduce(list_prepend(0, list_transform(
        |           range(1, octet_length(encode(text)) + 1),
        |           i -> CAST(('0x' || substring(hex(encode(text)), 2*i-1, 2)) AS BIGINT))),
        |         (a, b) -> (a*31 + b) % 1000000007) AS checksum
        |FROM documents""".stripMargin,
    // ground truth for the PNG parse: the header fields the engine must
    // recover from the bytes are exactly the values the construction
    // encoded — agreement proves the byte-level parse inverts a
    // spec-correct PNG header, and the corrupt path degrades to nulls
    "media_dims" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(doc_id % 640 + 1 AS BIGINT) END AS width,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(doc_id % 480 + 1 AS BIGINT) END AS height,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(8 AS BIGINT) END AS bit_depth,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL
        |            WHEN doc_id % 3 = 0 THEN CAST(1 AS BIGINT)
        |            WHEN doc_id % 3 = 1 THEN CAST(3 AS BIGINT)
        |            ELSE CAST(4 AS BIGINT) END AS channels,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(doc_id % 2 AS BIGINT) END AS interlace,
        |       CASE WHEN doc_id % 7 = 3 THEN 'corrupt' ELSE 'png' END AS status
        |FROM documents""".stripMargin,
    // ground truth for the JPEG segment walk, same construction-inversion
    // contract as media_dims: the walk must traverse a variable-length COM
    // (and every 5th doc an extra DQT) to land on SOF0/SOF2, so agreement
    // proves the parser reads real segment lengths, not fixed offsets
    "jpeg_dims" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(doc_id % 640 + 1 AS BIGINT) END AS width,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(doc_id % 480 + 1 AS BIGINT) END AS height,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(8 AS BIGINT) END AS bit_depth,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL
        |            WHEN doc_id % 3 = 0 THEN CAST(1 AS BIGINT)
        |            ELSE CAST(3 AS BIGINT) END AS channels,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL
        |            WHEN doc_id % 4 < 2 THEN CAST(0 AS BIGINT)
        |            ELSE CAST(1 AS BIGINT) END AS progressive,
        |       CASE WHEN doc_id % 7 = 3 THEN 'corrupt' ELSE 'jpeg' END AS status
        |FROM documents""".stripMargin,
    // mixed corpus: even docs are PNG, odd are JPEG; the engine must sniff
    // the magic bytes per payload and route to the right parser
    "media_dims_mix" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(doc_id % 640 + 1 AS BIGINT) END AS width,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(doc_id % 480 + 1 AS BIGINT) END AS height,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(8 AS BIGINT) END AS bit_depth,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL
        |            WHEN doc_id % 2 = 0 THEN (CASE WHEN doc_id % 3 = 0 THEN CAST(1 AS BIGINT)
        |                                           WHEN doc_id % 3 = 1 THEN CAST(3 AS BIGINT)
        |                                           ELSE CAST(4 AS BIGINT) END)
        |            WHEN doc_id % 3 = 0 THEN CAST(1 AS BIGINT)
        |            ELSE CAST(3 AS BIGINT) END AS channels,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL
        |            WHEN doc_id % 2 = 0 THEN CAST(0 AS BIGINT)
        |            WHEN doc_id % 4 < 2 THEN CAST(0 AS BIGINT)
        |            ELSE CAST(1 AS BIGINT) END AS interlace,
        |       CASE WHEN doc_id % 7 = 3 THEN 'corrupt'
        |            WHEN doc_id % 2 = 0 THEN 'png'
        |            ELSE 'jpeg' END AS status
        |FROM documents""".stripMargin,
    // ground truth for the RIFF chunk walk: the walk must skip a
    // variable-length JUNK chunk (and every 5th doc a LIST chunk) with
    // correct even-byte alignment to land on "fmt " — agreement proves a
    // real little-endian chunk traversal, same contract as jpeg_dims
    "wav_dims" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL
        |            WHEN doc_id % 3 = 0 THEN CAST(8000 AS BIGINT)
        |            WHEN doc_id % 3 = 1 THEN CAST(16000 AS BIGINT)
        |            ELSE CAST(44100 AS BIGINT) END AS sample_rate,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST(doc_id % 2 + 1 AS BIGINT) END AS channels,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST((doc_id % 4 + 1) * 8 AS BIGINT) END AS bits,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL
        |            ELSE CAST((CASE WHEN doc_id % 3 = 0 THEN 8000
        |                            WHEN doc_id % 3 = 1 THEN 16000
        |                            ELSE 44100 END) * (doc_id % 2 + 1) * (doc_id % 4 + 1) AS BIGINT) END AS byte_rate,
        |       CASE WHEN doc_id % 7 = 3 THEN NULL ELSE CAST((doc_id % 2 + 1) * (doc_id % 4 + 1) AS BIGINT) END AS block_align,
        |       CASE WHEN doc_id % 7 = 3 THEN 'corrupt' ELSE 'wav' END AS status
        |FROM documents""".stripMargin,
    // sniff dispatch ground truth: non-media rows ('x'-prefixed ASCII can
    // match no magic) → unknown; truncated rows → corrupt; else by format
    "media_sniff" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 11 = 1 THEN 'unknown'
        |            WHEN doc_id % 7 = 3 THEN 'corrupt'
        |            WHEN doc_id % 3 = 0 THEN 'png'
        |            WHEN doc_id % 3 = 1 THEN 'jpeg'
        |            ELSE 'wav' END AS status
        |FROM documents""".stripMargin,
    // closed-form mirror of the PNM fixture: the engine side builds and
    // pixel-walks REAL P5/P6 bytes; the oracle recomputes the channel
    // stats straight from the deterministic pixel formula — equality
    // proves the byte walk (header offset, deinterleave, per-sample
    // decode) is exact
    "media_pixels" ->
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
        |       CASE WHEN trunc THEN 'corrupt' WHEN ch = 1 THEN 'pgm' ELSE 'ppm' END AS status,
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
        |FROM c""".stripMargin,
    // same closed-form mirror: gray plane, integer mean, one bit per
    // brighter-than-mean pixel — DuckDB list indexes are 1-based, so the
    // channel deinterleave reads px[3j+1..3j+3] and the bit index is j-1
    "media_ahash" ->
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
        |g AS (
        |  SELECT doc_id, ch, w, h, trunc,
        |         CASE WHEN ch = 1 THEN px
        |              ELSE list_transform(range(0, w * h), j ->
        |                     (px[3*j + 1] + px[3*j + 2] + px[3*j + 3]) // 3) END AS gr
        |  FROM v
        |),
        |m AS (
        |  SELECT doc_id, ch, w, h, trunc, gr,
        |         list_aggregate(gr, 'sum') // len(gr) AS mean_px
        |  FROM g
        |)
        |SELECT doc_id,
        |       CASE WHEN trunc THEN 'corrupt' WHEN ch = 1 THEN 'pgm' ELSE 'ppm' END AS status,
        |       CASE WHEN NOT trunc THEN CAST(w AS BIGINT) END AS width,
        |       CASE WHEN NOT trunc THEN CAST(h AS BIGINT) END AS height,
        |       CASE WHEN NOT trunc THEN CAST(ch AS BIGINT) END AS channels,
        |       CASE WHEN NOT trunc THEN CAST(list_sum(list_transform(gr, (x, j) ->
        |              CASE WHEN x > mean_px THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE 0 END)) AS BIGINT) END AS ahash
        |FROM m""".stripMargin,
    // mirrors the full capped-banded chain (bands, bucket cap, hamming
    // verify) — at the default threshold banding is exact-recall, so
    // below the cap this equals the plain quadratic self-join
    "ahash_near_dups" -> ahashNearDupsSql(maxHamming = 3, bands = 4),
    // the non-default banding twin: 8 bands of 6 bits, radius 2 — a
    // DIFFERENT band structure must return the identical verified set
    "ahash_near_dups8" -> ahashNearDupsSql(maxHamming = 2, bands = 8),
    // the fixture's media bytes are UTF-8 of ASCII text, so md5 over the
    // text substring equals Spark's md5 over the binary frame slice
    "frame_dedup" ->
      s"""WITH n AS (
        |  SELECT doc_id, text,
        |         CAST(CEIL(octet_length(encode(text)) / CAST(256.0 AS DOUBLE)) AS INT) AS nf
        |  FROM documents
        |),
        |f AS (
        |  SELECT doc_id, md5(substring(text, i * 256 + 1, 256)) AS fp
        |  FROM n, range(0, ${OracleLimits.MaxMediaFrames}) r(i) WHERE i < nf
        |)
        |SELECT fp, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(doc_id) AS BIGINT) AS min_doc
        |FROM f GROUP BY fp HAVING COUNT(*) > 1""".stripMargin
  )
}
