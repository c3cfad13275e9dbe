package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The AVI container walk's anchors: exact metadata and frame-payload
  * recovery through real nested RIFF bytes, the sampled-frame decode
  * against the closed form, the header/payload self-consistency
  * refusal, and the never-throws discipline under truncation and
  * corruption. */
class AviCodecSpec extends SparkSpec {

  test("metadata and frame payloads are recovered exactly (incl. JUNK/pad docs)") {
    (0L until 60L).filterNot(_ % 7 == 3).foreach { id =>
      val bytes = AviCodecOps.encodeAviFixture(id)
      val p = AviCodecOps.parseAvi(bytes).getOrElse(fail(s"doc $id refused"))
      val (w, h) = AviCodecOps.fixtureDims(id)
      assert(p.width == w && p.height == h)
      assert(p.nFrames == AviCodecOps.fixtureFrames(id))
      assert(p.usPerFrame == AviCodecOps.fixtureUsPf(id))
      assert(p.handler == "MJPG")
      // the sliced payloads must equal the encoder's frame bytes —
      // payload extraction proven independently of the JPEG decode
      p.frames.zipWithIndex.foreach { case ((off, len), i) =>
        val sliced = java.util.Arrays.copyOfRange(bytes, off, off + len)
        assert(sliced.sameElements(AviCodecOps.frameBytes(id, i)),
          s"doc $id frame $i: extracted bytes differ")
      }
    }
  }

  test("sampled frames decode EXACTLY the closed form through the real MJPEG path") {
    (0L until 40L).filterNot(_ % 7 == 3).foreach { id =>
      val bytes = AviCodecOps.encodeAviFixture(id)
      val p = AviCodecOps.parseAvi(bytes).get
      val (w, h) = AviCodecOps.fixtureDims(id)
      (0 until p.nFrames by AviCodecOps.FrameStride).foreach { i =>
        val (off, len) = p.frames(i)
        val d = JpegCodecOps.decodeJpeg(
          java.util.Arrays.copyOfRange(bytes, off, off + len)).get
        assert(d.width == w && d.height == h && d.channels == 1)
        var j = 0
        while (j < d.samples.length) {
          val x = j % w; val y = j / w
          assert(d.samples(j) == AviCodecOps.frameSampleVal(id, i, x / 8, y / 8),
            s"doc $id frame $i pixel ($x,$y)")
          j += 1
        }
      }
    }
  }

  test("header/payload disagreement refuses: a patched totalFrames is not trusted") {
    val bytes = AviCodecOps.encodeAviFixture(1L)
    assert(AviCodecOps.parseAvi(bytes).isDefined)
    // avih payload starts after RIFF(12) + LIST hdr(12) + 'avih'+size(8);
    // totalFrames is at payload offset 16
    val patched = bytes.clone()
    val tfOff = 12 + 12 + 8 + 16
    patched(tfOff) = (patched(tfOff) + 1).toByte
    assert(AviCodecOps.parseAvi(patched).isEmpty,
      "an avih totalFrames that disagrees with the movi census must refuse")
  }

  test("malformed payloads never throw: every truncation and header corruption") {
    val bytes = AviCodecOps.encodeAviFixture(2L)
    (0 until bytes.length).foreach { n =>
      AviCodecOps.parseAvi(bytes.take(n)) // must not throw
    }
    // corrupt every byte of the container region before the first frame
    // payload (headers, sizes, fourccs) — and a sweep inside movi
    val p = AviCodecOps.parseAvi(bytes).get
    val firstFrame = p.frames(0)._1
    (0 until firstFrame).foreach { o =>
      val c = bytes.clone(); c(o) = (c(o) ^ 0x5A).toByte
      AviCodecOps.parseAvi(c) // must not throw
    }
    (firstFrame until bytes.length by 7).foreach { o =>
      val c = bytes.clone(); c(o) = (c(o) ^ 0x5A).toByte
      AviCodecOps.parseAvi(c).foreach { pp =>
        // container may still parse; the frame decode must then degrade
        pp.frames.foreach { case (off, len) =>
          JpegCodecOps.decodeJpeg(java.util.Arrays.copyOfRange(c, off, off + len))
        }
      }
    }
  }

  test("fixture chain: corrupt docs degrade; meta and frame stats match the formulas") {
    val s = spark
    import s.implicits._
    val docs = (0L until 50L).map(id => (id, s"d$id")).toDF("doc_id", "text")
    val meta = AviCodecOps.aviMeta(docs).collect()
    assert(meta.count(_.getString(1) == "corrupt") == (0L until 50L).count(_ % 7 == 3))
    meta.filter(_.getString(1) == "avi").foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == id % 20 + 4 && r.getLong(3) == id % 14 + 4)
      assert(r.getLong(4) == id % 6 + 3 && r.getLong(5) == 40000 + id % 10 * 1000)
      assert(r.getString(6) == "MJPG")
    }
    val frames = AviCodecOps.aviFrameSample(docs)
    assert(frames.filter(col("status") === "bad_frame").count() == 0)
    assert(frames.filter(col("status") === "corrupt").count() ==
      (0L until 50L).count(_ % 7 == 3))
    // per-frame stats spot check against the block-constant closed form
    // (doc 11: 11 % 7 != 3, so it is not a corrupt doc)
    val row = frames.filter(col("doc_id") === 11 && col("frame_idx") === 2).collect().head
    val (w, h) = AviCodecOps.fixtureDims(11)
    val px = for (y <- 0 until h; x <- 0 until w)
      yield AviCodecOps.frameSampleVal(11, 2, x / 8, y / 8).toLong
    assert(row.getAs[Long]("px_sum") == px.sum)
    assert(row.getAs[Long]("px_min") == px.min)
    assert(row.getAs[Long]("px_max") == px.max)
  }
}
