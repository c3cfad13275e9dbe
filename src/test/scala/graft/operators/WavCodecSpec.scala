package graft.operators

import graft.SparkSpec

/** The PCM decoder's independent anchors: the oracle pins per-channel
  * stats through closed-form samples; this spec additionally reads the
  * same files with `javax.sound.sampled.AudioSystem` — a separate
  * RIFF/WAVE implementation in the JDK — and asserts both the parsed
  * format AND the raw frame bytes agree with our chunk walk. */
class WavCodecSpec extends SparkSpec {

  test("fixtures decode EXACTLY the closed form at all four widths and both layouts") {
    var wide = 0
    (0L until 120L).filterNot(_ % 7 == 3).foreach { id =>
      val bits = WavCodecOps.fixtureBits(id)
      val ch = WavCodecOps.fixtureChannels(id)
      val frames = WavCodecOps.fixtureFrames(id)
      if (bits >= 24) wide += 1
      val got = WavCodecOps.decodeWav(WavCodecOps.encodeWav(id))
        .getOrElse(fail(s"doc $id must decode"))
      assert((got.channels, got.bits, got.frames) == ((ch, bits, frames)), s"doc $id format")
      assert(got.rate == WavCodecOps.fixtureRate(id))
      for (j <- got.samples.indices)
        assert(got.samples(j) == WavCodecOps.fixtureValue(id, bits, j.toLong),
          s"doc $id sample $j at $bits bits")
    }
    assert(wide > 40, "the set must cover 24- and 32-bit widths")
  }

  test("cross-codec: AudioSystem parses our files identically (format + frame bytes)") {
    (0L until 60L).filterNot(_ % 7 == 3).foreach { id =>
      val bytes = WavCodecOps.encodeWav(id)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      val ours = WavCodecOps.decodeWav(bytes).getOrElse(fail(s"doc $id"))
      assert(f.getChannels == ours.channels, s"doc $id channels")
      assert(f.getSampleSizeInBits == ours.bits, s"doc $id bits")
      assert(f.getSampleRate.toInt == ours.rate, s"doc $id rate")
      assert(ais.getFrameLength == ours.frames.toLong, s"doc $id frames")
      assert(!f.isBigEndian)
      // the frame BYTES an independent walker hands back must be the
      // ones our data-chunk offset points at
      val frameBytes = ais.readAllBytes()
      val expect = new Array[Byte](frameBytes.length)
      val bytesPer = ours.bits / 8
      for (j <- 0 until ours.frames * ours.channels) {
        val raw = WavCodecOps.fixtureRaw(id, ours.bits, j.toLong)
        for (i <- 0 until bytesPer)
          expect(j * bytesPer + i) = ((raw >> (8 * i)) & 0xff).toByte
      }
      assert(frameBytes.sameElements(expect), s"doc $id: frame bytes disagree")
      ais.close()
    }
  }

  test("malformed payloads degrade to None, never throw; out-of-scope formats refuse") {
    // truncation fixture + sweeps
    assert(WavCodecOps.decodeWav(WavCodecOps.encodeWav(3L)).isEmpty)
    val good = WavCodecOps.encodeWav(8L)
    for (i <- good.indices) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
      WavCodecOps.decodeWav(bad) // must not throw
    }
    for (n <- 0 to good.length) WavCodecOps.decodeWav(good.take(n))
    // IEEE-float format tag (3) refuses honestly: find "fmt " and
    // rewrite the tag
    val fmtAt = good.indices.dropWhile(i =>
      !(i + 4 <= good.length && good(i) == 'f' && good(i + 1) == 'm' &&
        good(i + 2) == 't' && good(i + 3) == ' ')).head
    val float = good.clone()
    float(fmtAt + 8) = 3
    assert(WavCodecOps.decodeWav(float).isEmpty, "float PCM must refuse, not garble")
    // a torn trailing frame (dataLen not a blockAlign multiple) refuses
    val stereo16 = WavCodecOps.encodeWav(5L) // bits 16, ch 2
    val dataAt = stereo16.indices.dropWhile(i =>
      !(i + 4 <= stereo16.length && stereo16(i) == 'd' && stereo16(i + 1) == 'a' &&
        stereo16(i + 2) == 't' && stereo16(i + 3) == 'a')).head
    val torn = stereo16.clone()
    // shrink the data size by one byte (still within the file)
    val oldLen = (torn(dataAt + 4) & 0xff) | ((torn(dataAt + 5) & 0xff) << 8)
    torn(dataAt + 4) = ((oldLen - 1) & 0xff).toByte
    assert(WavCodecOps.decodeWav(torn).isEmpty, "a partial frame must refuse")
  }

  test("quality features: silence, alternation, and clipping read as designed") {
    import WavCodecOps.WavDecoded
    // digital silence at 16 bits: zero energy, zero crossings, no clip
    val silence = WavDecoded(1, 8000, 16, 10, Array.fill(10)(0L))
    assert(WavCodecOps.featuresOf(silence) == ((0L, 0L, 0L, 0L)))
    // a full-scale alternating square wave: every step crosses, every
    // sample is pinned at a representable extreme
    val sqw = WavDecoded(1, 8000, 16, 8,
      Array.tabulate(8)(i => if (i % 2 == 0) 32767L else -32768L))
    val (sq, zcr, peak, clip) = WavCodecOps.featuresOf(sqw)
    assert(zcr == 7 && clip == 8 && peak == 32768)
    assert(sq == 4L * 32767L * 32767L + 4L * 32768L * 32768L)
    // 8-bit silence sits at the 128 center (zero normalized), and the
    // unsigned extremes count as clipped
    val s8 = WavDecoded(1, 8000, 8, 6, Array[Long](128, 128, 255, 0, 128, 128))
    val (sq8, z8, p8, c8) = WavCodecOps.featuresOf(s8)
    assert(c8 == 2 && p8 == 32768 && z8 == 2)
    assert(sq8 == 127L * 256 * 127 * 256 + 128L * 256 * 128 * 256)
    // stereo: only channel 0 feeds the features
    val st = WavDecoded(2, 8000, 16, 4,
      Array[Long](100, -30000, 100, -30000, 100, -30000, 100, -30000))
    assert(WavCodecOps.featuresOf(st)._2 == 0, "channel-1 swings must not count")
    // 32-bit normalization floors toward negative infinity (Math.floorDiv)
    val neg = WavDecoded(1, 8000, 32, 2, Array[Long](-65537L, 65535L))
    val (sqn, zn, pn, _) = WavCodecOps.featuresOf(neg)
    assert(zn == 1 && pn == 2 && sqn == 4 + 0) // -65537/65536 floors to -2; 65535/65536 to 0
  }

  test("fixture chain: truncated docs degrade to corrupt rows; stats match the formula") {
    val s = spark
    import s.implicits._
    val docs = (0L until 60L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val rows = WavCodecOps.wavPcm(docs).collect()
    assert(rows.length == 60)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 3) assert(r.getString(1) == "corrupt" && r.isNullAt(6),
        s"doc $id must be the corrupt twist")
      else {
        val bits = WavCodecOps.fixtureBits(id)
        val ch = WavCodecOps.fixtureChannels(id)
        val frames = WavCodecOps.fixtureFrames(id)
        val c0 = (0 until frames * ch).filter(_ % ch == 0)
          .map(j => WavCodecOps.fixtureValue(id, bits, j.toLong))
        assert(r.getString(1) == "wav" && r.getLong(2) == ch &&
          r.getLong(5) == frames && r.getLong(6) == c0.sum,
          s"doc $id stats must match the closed form")
      }
    }
  }
}
