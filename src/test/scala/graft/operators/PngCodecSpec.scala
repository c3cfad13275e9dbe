package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The PNG codec's independent anchors: the fixture chain's oracle pins
  * the stats through closed-form rasters, but an encode/decode bug pair
  * could in principle cancel — so the decoder is ALSO checked against
  * `javax.imageio`'s PNG reader (a separate implementation in the JDK),
  * pixel for pixel, across doc ids that exercise every (filter, channel,
  * dims) combination the generator emits. */
class PngCodecSpec extends SparkSpec {

  private def imageIoPixels(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      // raster BANDS, not color-model components: sub-byte gray PNGs
      // arrive as IndexColorModel images (3 components, 1 band) whose
      // single band holds the raw sample
      val ch = img.getRaster.getNumBands
      val out = new Array[Int](w * h * ch)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w; k <- 0 until ch)
        out((y * w + x) * ch + k) = raster.getSample(x, y, k)
      Some((w, h, ch, out))
    }
  }

  test("decoder matches javax.imageio pixel-for-pixel on every generator shape") {
    // doc ids 0..59 cover w 1..8 × h 1..6 × both channel layouts with
    // filter phases (id + row) % 5 — every filter type on every layout
    var checked = 0
    (0L until 60L).filterNot(_ % 7 == 3).foreach { id =>
      val bytes = PngCodecOps.encodePng(id)
      val got = PngCodecOps.decodePng(bytes)
        .getOrElse(fail(s"doc $id: our decoder rejected a valid PNG"))
      val (w, h, ch, ref) = imageIoPixels(bytes)
        .getOrElse(fail(s"doc $id: ImageIO rejected the generated PNG — encoder is broken"))
      assert((got.width, got.height, got.channels) == ((w, h, ch)), s"doc $id dims")
      assert(got.samples.sameElements(ref), s"doc $id: pixel mismatch vs ImageIO")
      checked += 1
    }
    assert(checked > 50)
  }

  test("every corrupt or fuzzed payload degrades to None / 'corrupt', never throws") {
    // the fixture's truncation
    assert(PngCodecOps.decodePng(PngCodecOps.encodePng(3L)).isEmpty)
    // systematic single-byte corruption of a valid file: CRCs (checked
    // on every chunk) or structure guards must catch each one
    val good = PngCodecOps.encodePng(8L)
    for (i <- good.indices) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
      PngCodecOps.decodePng(bad) // must not throw; may legitimately still decode
    }
    // truncations at every length
    for (n <- 0 to good.length) PngCodecOps.decodePng(good.take(n))
    // absurd dims are rejected before any allocation: forge an IHDR
    // claiming 1e6 x 1e6 (CRC recomputed so the guard itself is what trips)
    val s = spark
    import s.implicits._
    val fuzz = Seq((1L, Array[Byte](0x89.toByte, 'P', 'N', 'G'))).toDF("doc_id", "media")
    assert(PngCodecOps.pngDecodeStats(fuzz).collect()(0).getString(1) == "corrupt")
  }

  test("golden vector: a hand-assembled stored-deflate PNG decodes to the literal pixels") {
    // 2x1 grayscale, filter 0, zlib STORED block — every payload byte
    // below is hand-derived from RFC 1950/1951/2083, so this anchors the
    // decoder against the specs themselves, not against our encoder:
    //   raw scanline = [filter 0x00, 0x12, 0x34]
    //   zlib = 78 01 | 01 03 00 FC FF | 00 12 34 | adler32 = 00 5B 00 47
    //   (a: 1+0x00+0x12+0x34 = 0x47; b: 1+0x13+0x47 = 0x5B)
    val z = Array[Int](0x78, 0x01, 0x01, 0x03, 0x00, 0xfc, 0xff,
      0x00, 0x12, 0x34, 0x00, 0x5b, 0x00, 0x47).map(_.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      val t = typ.getBytes("US-ASCII"); crc.update(t); crc.update(data)
      def be(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      be(data.length.toLong) ++ t ++ data ++ be(crc.getValue)
    }
    val ihdr = Array[Byte](0, 0, 0, 2, 0, 0, 0, 1, 8, 0, 0, 0, 0)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", z) ++ chunk("IEND", Array.empty)
    val d = PngCodecOps.decodePng(png).getOrElse(fail("golden PNG rejected"))
    assert((d.width, d.height, d.channels) == ((2, 1, 1)))
    assert(d.samples.toSeq == Seq(0x12, 0x34), "literal pixels must round out of the stored block")
    // and the independent reader agrees the bytes are a valid PNG
    assert(imageIoPixels(png).exists(_._4.toSeq == Seq(0x12, 0x34)))
  }

  test("random byte streams never throw: pure garbage and magic-prefixed garbage") {
    val rnd = new scala.util.Random(20260815L)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    for (i <- 0 until 200) {
      val body = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(body)
      PngCodecOps.decodePng(body)              // pure garbage
      PngCodecOps.decodePng(sig ++ body)       // valid signature, garbage chunks
      assert(true)
    }
  }

  test("cross-codec differential: PNG stats equal the PNM expression decode on shared rasters") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val png = PngCodecOps.pngPixels(docs)
      .withColumnRenamed("status", "s_png")
    val pnm = MultimodalOps.mediaPixels(docs)
      .withColumnRenamed("status", "s_pnm")
    // same doc_id → same raster by construction; statuses differ only in
    // the format label, corruption pattern is the same doc_id % 7 band
    val joined = png.join(pnm, Seq("doc_id"))
    assert(joined.filter((col("s_png") === "corrupt") =!= (col("s_pnm") === "corrupt")).count() == 0)
    val statCols = Seq("width", "height", "channels",
      "c0_sum", "c0_min", "c0_max", "c1_sum", "c1_min", "c1_max",
      "c2_sum", "c2_min", "c2_max")
    statCols.foreach { c =>
      assert(joined.filter(!(png(c) <=> pnm(c))).count() == 0,
        s"column $c: compressed and uncompressed decodes disagree")
    }
  }

  test("Adam7 fixtures decode EXACTLY the closed form and match ImageIO " +
      "pixel-for-pixel (per-pass defilter + scatter)") {
    var checked = 0
    (0L until 120L).filterNot(_ % 7 == 3).foreach { id =>
      val bytes = PngCodecOps.encodeI7Fixture(id)
      val (w, h, ch) = PngCodecOps.fixtureDimsI7(id)
      val got = PngCodecOps.decodePng(bytes)
        .getOrElse(fail(s"doc $id: our decoder rejected a valid interlaced PNG"))
      assert((got.width, got.height, got.channels) == ((w, h, ch)), s"doc $id dims")
      for (j <- got.samples.indices)
        assert(got.samples(j) == PngCodecOps.fixtureSample(id, ch, j.toLong),
          s"doc $id sample $j: interlacing must not change the raster")
      val (tw, th, tch, ref) = imageIoPixels(bytes)
        .getOrElse(fail(s"doc $id: ImageIO rejected the interlaced PNG — encoder broken"))
      assert((tw, th, tch) == ((w, h, ch)))
      assert(got.samples.sameElements(ref), s"doc $id: pixel mismatch vs ImageIO")
      checked += 1
    }
    assert(checked > 100)
  }

  test("palette fixtures expand EXACTLY through PLTE; ImageIO's expansion agrees") {
    var interlaced = 0
    (0L until 120L).filterNot(_ % 7 == 3).foreach { id =>
      val bytes = PngCodecOps.encodePalFixture(id)
      val (w, h) = PngCodecOps.fixtureDimsPal(id)
      val npal = PngCodecOps.fixturePalSize(id)
      if (id % 5 == 2) interlaced += 1
      val got = PngCodecOps.decodePng(bytes)
        .getOrElse(fail(s"doc $id: our decoder rejected a valid paletted PNG"))
      assert((got.width, got.height, got.channels) == ((w, h, 3)), s"doc $id dims")
      for (j <- 0 until w * h; c <- 0 until 3) {
        val idx = PngCodecOps.fixturePalIndex(id, j.toLong, npal)
        assert(got.samples(3 * j + c) == PngCodecOps.fixturePalEntry(id, idx, c),
          s"doc $id pixel $j ch $c: palette expansion must be exact")
      }
      // ImageIO expands palettes through getRGB (its raster holds indices)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO rejected the paletted PNG")
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        val j = y * w + x
        assert(got.samples(3 * j) == ((p >> 16) & 0xff) &&
          got.samples(3 * j + 1) == ((p >> 8) & 0xff) &&
          got.samples(3 * j + 2) == (p & 0xff),
          s"doc $id ($x,$y): expansion disagrees with ImageIO")
      }
    }
    assert(interlaced > 15, "the palette set must include interlaced docs")
  }

  test("alpha fixtures (gray+alpha / RGBA) decode EXACTLY and match ImageIO") {
    (0L until 120L).filterNot(_ % 7 == 3).foreach { id =>
      val bytes = PngCodecOps.encodeAlphaFixture(id)
      val (w, h, ch) = PngCodecOps.fixtureDimsAlpha(id)
      val got = PngCodecOps.decodePng(bytes)
        .getOrElse(fail(s"doc $id: our decoder rejected a valid alpha PNG"))
      assert((got.width, got.height, got.channels) == ((w, h, ch)), s"doc $id dims")
      for (j <- got.samples.indices)
        assert(got.samples(j) == PngCodecOps.fixtureAlphaSample(id, ch, j.toLong),
          s"doc $id sample $j")
      val (tw, th, tch, ref) = imageIoPixels(bytes)
        .getOrElse(fail(s"doc $id: ImageIO rejected the alpha PNG"))
      assert((tw, th, tch) == ((w, h, ch)))
      assert(got.samples.sameElements(ref), s"doc $id: pixel mismatch vs ImageIO")
    }
  }

  test("new-profile malformed payloads degrade to None, never throw; " +
      "out-of-range palette indices refuse") {
    // sweeps over an interlaced file and a paletted-interlaced file
    Seq(PngCodecOps.encodeI7Fixture(11L), PngCodecOps.encodePalFixture(7L),
        PngCodecOps.encodeAlphaFixture(9L)).foreach { good =>
      for (i <- good.indices) {
        val bad = good.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
        PngCodecOps.decodePng(bad) // must not throw
      }
      for (n <- 0 to good.length) PngCodecOps.decodePng(good.take(n))
    }
    // an index raster that exceeds the stored palette is malformed, not
    // a garbage expansion: 2-entry palette, indices up to 5
    val raw = Array.tabulate(6 * 4)(j => j % 6)
    val palette = Array.tabulate(2 * 3)(i => (i * 40).toByte)
    val overflow = PngCodecOps.encodePngGeneric(6, 4, 3, raw, palette,
      interlace = false, filterSeed = 0L)
    assert(PngCodecOps.decodePng(overflow).isEmpty,
      "palette-index overflow must refuse")
  }

  test("bit-depth fixtures (gray 1/2/4/16) decode EXACTLY and match ImageIO raw samples") {
    var sixteen = 0; var interlacedSub = 0
    (0L until 120L).filterNot(_ % 7 == 3).foreach { id =>
      val depth = PngCodecOps.fixtureDepth(id)
      val (w, h) = PngCodecOps.fixtureDimsDepth(id)
      if (depth == 16) sixteen += 1
      if (depth < 8 && id % 3 == 1) interlacedSub += 1
      val bytes = PngCodecOps.encodeDepthFixture(id)
      val got = PngCodecOps.decodePng(bytes)
        .getOrElse(fail(s"doc $id (depth $depth): our decoder rejected a valid PNG"))
      assert((got.width, got.height, got.channels) == ((w, h, 1)), s"doc $id dims")
      for (j <- got.samples.indices)
        assert(got.samples(j) == PngCodecOps.fixtureDepthSample(id, depth, j.toLong),
          s"doc $id depth $depth sample $j")
      // ImageIO reports RAW samples at every depth (probed: 4-bit 0..15,
      // 16-bit 0..65535) — exact differential
      val (tw, th, tch, ref) = imageIoPixels(bytes)
        .getOrElse(fail(s"doc $id: ImageIO rejected the depth-$depth PNG"))
      assert((tw, th, tch) == ((w, h, 1)))
      assert(got.samples.sameElements(ref), s"doc $id depth $depth: mismatch vs ImageIO")
    }
    assert(sixteen > 20 && interlacedSub > 5,
      "the set must cover 16-bit and interlaced sub-byte docs")
  }

  test("sub-byte palette fixtures (1/2/4-bit indices) expand EXACTLY; ImageIO agrees") {
    (0L until 120L).filterNot(_ % 7 == 3).foreach { id =>
      val depth = PngCodecOps.fixturePal4Depth(id)
      val npal = PngCodecOps.fixturePal4Size(id)
      val (w, h) = ((id % 11 + 2).toInt, (id % 9 + 2).toInt)
      val bytes = PngCodecOps.encodePal4Fixture(id)
      val got = PngCodecOps.decodePng(bytes)
        .getOrElse(fail(s"doc $id (pal depth $depth): decoder rejected a valid PNG"))
      assert((got.width, got.height, got.channels) == ((w, h, 3)), s"doc $id dims")
      for (j <- 0 until w * h; c <- 0 until 3) {
        val idx = PngCodecOps.fixturePalIndex(id, j.toLong, npal)
        assert(got.samples(3 * j + c) == PngCodecOps.fixturePalEntry(id, idx, c),
          s"doc $id pixel $j ch $c (depth $depth, npal $npal)")
      }
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"doc $id: ImageIO rejected the sub-byte paletted PNG")
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y); val j = y * w + x
        assert(got.samples(3 * j) == ((p >> 16) & 0xff) &&
          got.samples(3 * j + 1) == ((p >> 8) & 0xff) &&
          got.samples(3 * j + 2) == (p & 0xff),
          s"doc $id ($x,$y): expansion disagrees with ImageIO")
      }
    }
  }

  test("depth malformed sweeps never throw; invalid (type, depth) pairs refuse") {
    Seq(PngCodecOps.encodeDepthFixture(2L),  // 16-bit, non-interlaced
        PngCodecOps.encodeDepthFixture(4L),  // 1-bit, interlaced
        PngCodecOps.encodePal4Fixture(2L)).foreach { good => // 4-bit pal, interlaced
      for (i <- good.indices) {
        val bad = good.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
        PngCodecOps.decodePng(bad) // must not throw
      }
      for (n <- 0 to good.length) PngCodecOps.decodePng(good.take(n))
    }
    // spec-invalid combos must refuse via the header guard, not garble:
    // rewrite a valid gray-16 IHDR to RGB-4 (type 2 allows only 8/16)
    val base = PngCodecOps.encodeDepthFixture(2L)
    val ihdrAt = 8 + 8 // signature + len/type of IHDR
    val bad = base.clone()
    bad(ihdrAt + 8) = 4 // depth
    bad(ihdrAt + 9) = 2 // colorType RGB
    // fix the CRC so the depth guard itself is what trips
    val crc = new java.util.zip.CRC32
    crc.update(bad, 8 + 4, 4 + 13)
    val v = crc.getValue
    bad(8 + 8 + 13) = ((v >> 24) & 0xff).toByte
    bad(8 + 8 + 13 + 1) = ((v >> 16) & 0xff).toByte
    bad(8 + 8 + 13 + 2) = ((v >> 8) & 0xff).toByte
    bad(8 + 8 + 13 + 3) = (v & 0xff).toByte
    assert(PngCodecOps.decodePng(bad).isEmpty, "RGB at depth 4 must refuse")
  }
}
