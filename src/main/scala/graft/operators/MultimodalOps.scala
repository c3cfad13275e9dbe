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
    * interlace cycling 0/1), then the doc's text bytes as stand-in
    * chunk data. Docs with doc_id % 7 == 3 are TRUNCATED after the
    * signature — the corrupt-input path [[mediaDims]] must survive.
    * Binary is assembled with codegen'd column ops (unhex/lpad/hex):
    * 4-byte big-endian int = unhex(lpad(hex(v), 8, '0')). */
  def pngMediaTable(docs: DataFrame): DataFrame = {
    def be4(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
    def be1(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 2, "0"))
    val w = (col("doc_id") % 640 + 1).cast("long")
    val h = (col("doc_id") % 480 + 1).cast("long")
    val colorType = when(col("doc_id") % 3 === 0, 0L)
      .when(col("doc_id") % 3 === 1, 2L).otherwise(6L)
    val sig = unhex(lit("89504E470D0A1A0A"))
    val ihdr = concat(
      unhex(lit("0000000D")), // IHDR data length = 13
      encode(lit("IHDR"), "UTF-8"),
      be4(w), be4(h),
      be1(lit(8L)), // bit depth
      be1(colorType),
      unhex(lit("0000")), // compression 0, filter 0
      be1((col("doc_id") % 2).cast("long"))) // interlace
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 7 === 3, sig)
        .otherwise(concat(sig, ihdr, encode(col("text"), "UTF-8"))).as("media"))
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
    val media = pngMediaTable(docs)
    def beInt(start: Int, len: Int) =
      conv(hex(expr(s"substring(media, $start, $len)")), 16, 10).cast("long")
    val sigOk = upper(hex(expr("substring(media, 1, 8)"))) === "89504E470D0A1A0A"
    val ihdrOk = expr("substring(media, 13, 4)") === encode(lit("IHDR"), "UTF-8") &&
      length(col("media")) >= 29 && beInt(9, 4) === 13L
    val colorType = beInt(26, 1)
    val channels = when(colorType === 0L, 1L).when(colorType === 2L, 3L)
      .when(colorType === 3L, 1L).when(colorType === 4L, 2L)
      .when(colorType === 6L, 4L)
    val ok = sigOk && ihdrOk
    media.select(
      col("doc_id"),
      when(ok, beInt(17, 4)).as("width"),
      when(ok, beInt(21, 4)).as("height"),
      when(ok, beInt(25, 1)).as("bit_depth"),
      when(ok, channels).as("channels"),
      when(ok, beInt(29, 1)).as("interlace"),
      when(ok, "png").otherwise("corrupt").as("status"))
  }

  /** STUB decode + feature extraction over batches. The per-partition
    * iterator is where a real codec (JNI/FFI) would run once per executor
    * task; features here are a deterministic fake (header bytes + additive
    * checksum) so the pipeline is testable end-to-end. */
  def decodeFeatures(docs: DataFrame): DataFrame = {
    val media = mediaTable(docs).select(col("doc_id"), col("media"))
    import media.sparkSession.implicits._
    media
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // STUB: real impl = codec init once here, then per-record decode
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
    "frame_dedup" -> ((s, dir) => MultimodalOps.frameDedup(d(s, dir)))
  )

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
