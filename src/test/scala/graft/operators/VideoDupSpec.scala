package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The video near-dup's anchors: per-frame hash robustness through the
  * full container + codec chain, family separation, and the
  * frame-aligned banded plan's exact-recall equivalence with the
  * quadratic join. */
class VideoDupSpec extends SparkSpec {

  /** Frame-indexed bands of a doc, through the REAL chain
    * (AVI walk + MJPEG decode + pHash). */
  private def frameBands(id: Long): Map[Int, Array[Int]] = {
    val bytes = AviCodecOps.encodeVideoFixture(id)
    val p = AviCodecOps.parseAvi(bytes).get
    (0 until p.nFrames by AviCodecOps.FrameStride).map { i =>
      val (off, len) = p.frames(i)
      val d = JpegCodecOps.decodeJpeg(
        java.util.Arrays.copyOfRange(bytes, off, off + len)).get
      i -> PhashOps.phashBands(d.samples, d.width, d.height)
    }.toMap
  }

  private def totalHamming(a: Map[Int, Array[Int]], b: Map[Int, Array[Int]]): Int =
    a.keySet.intersect(b.keySet).toSeq.map { i =>
      (0 until 4).map(k => Integer.bitCount(a(i)(k) ^ b(i)(k))).sum
    }.sum

  test("family members (brightness + sparse noise per frame) stay within the radius") {
    val fams = (0L until 150L).map(_ * 4).filterNot(base =>
      (base until base + 4).exists(_ % 7 == 3))
    var within = 0; var total = 0
    fams.foreach { base =>
      val hs = (base until base + 4).map(frameBands)
      for (i <- 0 until 4; j <- i + 1 until 4) {
        total += 1
        if (totalHamming(hs(i), hs(j)) <= 6) within += 1
      }
    }
    assert(total > 200)
    assert(within.toDouble / total > 0.9,
      s"only $within/$total member pairs within total hamming 6")
  }

  test("different video structure separates across families") {
    val sample = (0L until 120L).filterNot(_ % 7 == 3)
    val hs = sample.map(id => id -> frameBands(id)).toMap
    var crossFar = 0; var cross = 0
    for (a <- sample; b <- sample if a < b &&
        AviCodecOps.vidFam(a) != AviCodecOps.vidFam(b) &&
        (AviCodecOps.vidFam(a) % 7 != AviCodecOps.vidFam(b) % 7 ||
         AviCodecOps.vidFam(a) % 5 != AviCodecOps.vidFam(b) % 5)) {
      cross += 1
      // no common sampled frames (disjoint frame sets) also separates
      val common = hs(a).keySet.intersect(hs(b).keySet)
      if (common.isEmpty || totalHamming(hs(a), hs(b)) > 6) crossFar += 1
    }
    assert(cross > 1000)
    assert(crossFar.toDouble / cross > 0.95,
      s"only $crossFar/$cross structurally-different pairs beyond the radius")
  }

  test("banded plan ≡ quadratic join over frame-aligned hashes") {
    val s = spark
    import s.implicits._
    val docs = (0L until 200L).map(id => (id, s"d$id")).toDF("doc_id", "text")
    val banded = AviCodecOps.videoNearDups(docs)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
    val hs = (0L until 200L).filterNot(_ % 7 == 3).map(id => id -> frameBands(id))
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && ha.keySet.intersect(hb.keySet).nonEmpty
      d = totalHamming(ha, hb) if d <= 6
    } yield (a, b, d.toLong)).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs vs quadratic ${brute.size} — recall must be exact")
    assert(brute.nonEmpty, "the plant must produce at least one pair")
  }

  test("corrupt containers carry one corrupt row and join no pairs") {
    val s = spark
    import s.implicits._
    val docs = (0L until 60L).map(id => (id, s"d$id")).toDF("doc_id", "text")
    val rows = AviCodecOps.videoPhash(docs)
    assert(rows.filter(col("status") === "corrupt").count() ==
      (0L until 60L).count(_ % 7 == 3))
    assert(rows.filter(col("status") === "bad_frame").count() == 0)
    val pairs = AviCodecOps.videoNearDups(docs)
      .filter(col("doc_a") % 7 === 3 || col("doc_b") % 7 === 3)
    assert(pairs.count() == 0)
  }
}
