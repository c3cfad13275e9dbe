package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audio fingerprint's anchors, mirroring PhashSpec: exact gain
  * invariance (the property the double difference buys by
  * construction), robustness to the planted perturbations, separation
  * across families, and the banded plan's exact-recall equivalence
  * with the quadratic join. */
class AudioFpSpec extends SparkSpec {

  private def bandsOf(id: Long): Array[Int] = {
    val d = WavCodecOps.decodeWav(AudioFpOps.encodeAudioFixture(id)).get
    AudioFpOps.audioBands(d.samples, d.channels)
  }

  private def hamming(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  test("uniform gain moves ZERO bits — exact invariance, not a tolerance") {
    // every band energy scales by g > 0; the sign of a scaled
    // difference never moves (ties stay ties) — so re-encoding at a
    // different volume collides with the original by construction
    (0L until 50L).foreach { id =>
      val base = Array.tabulate(AudioFpOps.FpSamples)(t =>
        AudioFpOps.fixtureSample(id * 4, t.toLong))
      val b1 = AudioFpOps.audioBands(base, 1)
      val b7 = AudioFpOps.audioBands(base.map(_ * 7), 1)
      assert(hamming(b1, b7) == 0, s"id $id: gain x7 moved the hash")
    }
  }

  test("family members (gain + sparse clicks) stay within the hamming radius") {
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

  test("different spectral structure separates across families") {
    val sample = (0L until 120L).filterNot(_ % 7 == 3)
    val hs = sample.map(id => id -> bandsOf(id)).toMap
    var crossFar = 0; var cross = 0
    for (a <- sample; b <- sample if a < b &&
        AudioFpOps.famOf(a) != AudioFpOps.famOf(b) &&
        (AudioFpOps.famOf(a) % 11 != AudioFpOps.famOf(b) % 11 ||
         AudioFpOps.famOf(a) % 13 != AudioFpOps.famOf(b) % 13)) {
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
    val banded = AudioFpOps.audioNearDups(docs)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
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
    val rows = AudioFpOps.audioHashes(docs)
    assert(rows.filter(col("status") === "corrupt").count() ==
      (0L until 60L).count(_ % 7 == 3))
    assert(rows.filter(col("status") === "corrupt" && col("b0").isNotNull).count() == 0)
    val pairs = AudioFpOps.audioNearDups(docs)
      .filter(col("doc_a") % 7 === 3 || col("doc_b") % 7 === 3)
    assert(pairs.count() == 0)
  }
}
