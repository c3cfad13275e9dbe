package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The perceptual hash's anchors: robustness to the perturbations it
  * exists to shrug off (global brightness, sparse noise),
  * discrimination across genuinely different structure, and the
  * banded plan's exact-recall equivalence with the quadratic join. */
class PhashSpec extends SparkSpec {

  private def bandsOf(id: Long): Array[Int] = {
    val d = PngCodecOps.decodePng(PhashOps.encodePhashFixture(id)).get
    PhashOps.phashBands(d.samples, d.width, d.height)
  }

  private def hamming(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  test("family members (brightness shift + sparse noise) stay within the hamming radius") {
    // members of a family share the base structure; pHash must place
    // them inside the near-dup radius nearly always — the property the
    // hash exists for
    val fams = (0L until 200L).map(_ * 4).filterNot(base =>
      (base until base + 4).exists(_ % 7 == 3))
    var within = 0; var total = 0
    fams.foreach { base =>
      val hs = (base until base + 4).map(bandsOf)
      for (i <- 0 until 4; j <- i + 1 until 4) {
        total += 1
        if (hamming(hs(i).toArray, hs(j).toArray) <= 3) within += 1
      }
    }
    assert(total > 300)
    assert(within.toDouble / total > 0.9,
      s"only $within/$total member pairs within radius 3 — the hash is not robust")
  }

  test("pure global brightness shift moves the hash by at most one bit") {
    // adding a constant feeds (almost) only the DC coefficient: with
    // the rounded integer kernel the non-DC column sums are near but
    // not exactly zero, so allow a single boundary bit
    (0L until 40L).foreach { fam =>
      val w = (fam % 24 + 16).toInt; val h = (fam % 20 + 16).toInt
      def raster(shift: Int): Array[Int] = Array.tabulate(w * h) { j =>
        val x = j % w; val y = j / w
        val base = ((fam * 41 + (x / 2) * (3 + 2 * (fam % 7)) +
          (y / 2) * (5 + 2 * (fam % 5)) +
          (x / 4) * (y / 4) * (1 + fam % 3)) % 200).toInt
        base + shift
      }
      val d0 = PhashOps.phashBands(raster(0), w, h)
      val d9 = PhashOps.phashBands(raster(9), w, h)
      assert(hamming(d0, d9) <= 1, s"fam $fam: brightness shift moved the hash")
    }
  }

  test("different structure separates: cross-family distances dwarf within-family ones") {
    val sample = (0L until 120L).filterNot(_ % 7 == 3)
    val hs = sample.map(id => id -> bandsOf(id)).toMap
    var crossFar = 0; var cross = 0
    for (a <- sample; b <- sample if a < b &&
        PhashOps.famOf(a) != PhashOps.famOf(b) &&
        (PhashOps.famOf(a) % 7 != PhashOps.famOf(b) % 7 ||
         PhashOps.famOf(a) % 5 != PhashOps.famOf(b) % 5)) {
      cross += 1
      if (hamming(hs(a), hs(b)) > 3) crossFar += 1
    }
    assert(cross > 1000)
    assert(crossFar.toDouble / cross > 0.95,
      s"only $crossFar/$cross structurally-different pairs beyond the radius")
  }

  test("banded plan ≡ quadratic join (exact recall at hamming ≤ 3)") {
    val s = spark
    import s.implicits._
    val docs = (0L until 240L).map(id => (id, s"d$id")).toDF("doc_id", "text")
    val banded = PhashOps.phashNearDups(docs)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
    // brute force over the same hashes
    val hs = (0L until 240L).filterNot(_ % 7 == 3).map(id => id -> bandsOf(id))
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = hamming(ha, hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs vs quadratic ${brute.size} — recall must be exact")
    assert(brute.nonEmpty, "the plant must produce at least one pair")
  }

  test("corrupt media carry null bands and join no pairs") {
    val s = spark
    import s.implicits._
    val docs = (0L until 60L).map(id => (id, s"d$id")).toDF("doc_id", "text")
    val rows = PhashOps.phashHashes(docs)
    assert(rows.filter(col("status") === "corrupt").count() ==
      (0L until 60L).count(_ % 7 == 3))
    assert(rows.filter(col("status") === "corrupt" && col("b0").isNotNull).count() == 0)
    val pairs = PhashOps.phashNearDups(docs)
      .filter(col("doc_a") % 7 === 3 || col("doc_b") % 7 === 3)
    assert(pairs.count() == 0)
  }
}
