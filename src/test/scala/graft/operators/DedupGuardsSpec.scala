package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Scale guards on the dedup pair generators: the shingle
  * document-frequency cap ([[DedupOps.MaxShingleDf]]) and the band-bucket
  * membership cap ([[DedupOps.MaxBandBucket]]). These bound the pair-join
  * OUTPUT — the one cost AQE skew handling cannot shrink — so the tests
  * drive synthetic hot-shingle / degenerate-signature corpora where the
  * uncapped plans would square.
  *
  * Lives in package graft.operators to reach the package-private
  * generator internals (cappedPostings / verifyJaccard / capBuckets)
  * without widening their visibility.
  */
class DedupGuardsSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, text) => (id, text, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
  }

  /** Uncached postings (the maybeCache-free probe hook) so corpus-churning
    * tests don't grow the shared session's CacheManager. */
  private def postings(docs: DataFrame): DataFrame =
    DedupOps.postingsPlanForProbe(docs)

  private def noCache[A](body: => A): A = {
    spark.conf.set(graft.Caching.EnabledKey, "false")
    try body finally spark.conf.set(graft.Caching.EnabledKey, "true")
  }

  test("df cap: a corpus-wide boilerplate shingle generates no pairs (uncapped would emit N²/2)") {
    noCache {
      val n = (DedupOps.MaxShingleDf + 72).toInt // 200 docs, hot df = 200 > cap
      val docs = mkDocs((0 until n).map { i =>
        // one trigram shared by every doc; every other trigram doc-unique
        (i.toLong, s"hot1 hot2 hot3 u${i}a u${i}b u${i}c")
      })
      // threshold 0 exposes the full co-occurring pair set of the capped space
      assert(DedupOps.ngramJaccard(docs, thresholdE4 = 0L).count() == 0,
        "hot shingle above MaxShingleDf must not act as a pair meeting point")
      // the intermediate the cap removes really was quadratic: uncapped
      // postings co-occur on the hot shingle for all N²/2 pairs
      val uncapped = DedupOps.verifyJaccard(postings(docs), None)
      assert(uncapped.count() == n.toLong * (n - 1) / 2)
    }
  }

  test("df cap: shingles at or below the cap still generate pairs") {
    noCache {
      val n = 50 // hot df = 50 <= 128: kept
      val docs = mkDocs((0 until n).map { i =>
        (i.toLong, s"hot1 hot2 hot3 u${i}a u${i}b u${i}c")
      })
      assert(DedupOps.ngramJaccard(docs, thresholdE4 = 0L).count() == n.toLong * (n - 1) / 2)
    }
  }

  test("LSH bucket cap: a degenerate corpus of identical docs does not square; exact() still catches it") {
    noCache {
      val hot = (DedupOps.MaxBandBucket + 22).toInt // 150 identical docs
      val degenerate = mkDocs((0 until hot).map(i => (i.toLong, "a b c d e f g h")))
      assert(DedupOps.minhashLsh(degenerate, spark).count() == 0,
        "an oversized band bucket must be dropped, not squared")
      // the identical-content group the dropped bucket hides is exact()'s job
      val ex = DedupOps.exact(degenerate)
      assert(ex.count() == hot && ex.filter(col("group_sz") === hot).count() == hot)

      val ok = 50 // buckets of 50 <= 128: banding intact
      val small = mkDocs((0 until ok).map(i => (i.toLong, "a b c d e f g h")))
      val found = DedupOps.minhashLsh(small, spark)
      assert(found.count() == ok.toLong * (ok - 1) / 2)
      assert(found.filter(col("jaccard_e4") =!= 10000L).count() == 0)
    }
  }

  test("SimHash bucket cap: degenerate corpus bounded, honest near-dups preserved") {
    noCache {
      val hot = (DedupOps.MaxBandBucket + 22).toInt
      val degenerate = mkDocs((0 until hot).map(i => (i.toLong, "a b c d e f g h")))
      assert(DedupOps.simhashDedup(degenerate, spark).count() == 0)

      val ok = 50
      val small = mkDocs((0 until ok).map(i => (i.toLong, "a b c d e f g h")))
      val found = DedupOps.simhashDedup(small, spark)
      assert(found.count() == ok.toLong * (ok - 1) / 2)
      assert(found.filter(col("hamming") =!= 0).count() == 0)
    }
  }

  test("embedding LSH bucket cap: a degenerate vector spike does not square, honest buckets intact") {
    noCache {
      val s = spark
      import s.implicits._
      def embs(n: Int) =
        (0 until n).map(i => (i.toLong, Array.fill(64)(0.5f))).toDF("vec_id", "embedding")
      // identical vectors all land in one bucket; above MaxEmbBucket the
      // bucket is degenerate and must be dropped, not squared
      assert(AnnOps.nearDupPairs(embs((AnnOps.MaxEmbBucket + 6).toInt), spark).count() == 0)
      val found = AnnOps.nearDupPairs(embs(40), spark)
      assert(found.count() == 40L * 39 / 2)
      assert(found.filter(col("cosine_e4") =!= 10000L).count() == 0)
    }
  }

  test("rowSimhash is bit-identical to the batch posting-aggregation simhash") {
    noCache {
      val docs = graft.sources.Tables.documents(spark, sf)
      val batch = DedupOps.simhashes(DedupOps.shinglePostings(docs), spark)
      val perRow = docs.select(col("doc_id"), DedupOps.rowSimhash(col("text")).as("rs"))
        .filter(col("rs").isNotNull)
      // same doc coverage (every doc with >=1 trigram) and same bits
      assert(perRow.count() == batch.count())
      val mismatch = perRow.join(batch, "doc_id")
        .filter(col("rs") =!= col("simhash"))
      assert(mismatch.count() == 0, "streaming and batch simhash diverged")
    }
  }

  test("property: rowSimhash equals the batch simhash on adversarial random texts") {
    noCache {
      // token pool deliberately tiny so random docs repeat trigrams (the
      // distinct-vs-multiset divergence trap) and includes docs at and
      // below the 3-token trigram floor
      val tokGen = Gen.oneOf("a", "b", "aa", "x1", "zz")
      val docGen: Gen[Seq[(Long, String)]] = for {
        n <- Gen.choose(2, 6)
        texts <- Gen.listOfN(n, Gen.choose(0, 8).flatMap(len => Gen.listOfN(len, tokGen)))
      } yield texts.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      val prop = Prop.forAll(docGen) { rows =>
        val docs = mkDocs(rows)
        val batch = DedupOps.simhashes(postings(docs), spark)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val perRow = docs
          .select(col("doc_id"), DedupOps.rowSimhash(col("text")).as("rs"))
          .filter(col("rs").isNotNull)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        perRow == batch
      }
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(20).withInitialSeed(Seed(7L)), prop)
      assert(res.passed, res.status.toString)
    }
  }

  test("minhash band dial: more bands at fixed rows-per-band only ADDS candidates (superset), verified pairs agree") {
    noCache {
      // varied mid-similarity corpus: overlapping-prefix families where
      // banding at 4 bands misses some honest pairs that 8 bands catch
      val docs = mkDocs((0 until 40).map { i =>
        val fam = i / 4
        val uniq = (0 until (i % 4) + 1).map(j => s"u${i}x$j").mkString(" ")
        (i.toLong, s"f${fam}a f${fam}b f${fam}c f${fam}d f${fam}e f${fam}f $uniq")
      })
      def candSet(perms: Int) =
        DedupOps.minhashCandidates(docs, spark, numPerms = perms, bandSize = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val c12 = candSet(12)
      val c24 = candSet(24)
      // the first 4 of 8 bands ARE the 12-perm bands (same permutation
      // family, same band layout), so every 12-perm collision recurs
      assert(c12.subsetOf(c24),
        s"12-perm candidates must be a subset of 24-perm: missing ${c12 -- c24}")
      // the extra bands exist to find MORE — on this corpus they must
      // (otherwise the test corpus exercises nothing)
      assert(c24.size > c12.size, "24-perm banding found no extra candidates on the mid-sim corpus")
      // verification is band-independent: shared pairs score identically
      val v12 = DedupOps.minhashLsh(docs, spark, thresholdE4 = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val v24 = DedupOps.minhashLsh(docs, spark, thresholdE4 = 0L, numPerms = 24, bandSize = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      v12.foreach { case (p, j) => assert(v24(p) == j, s"pair $p scored $j vs ${v24(p)}") }
      // the dial rejects a non-divisible band layout loudly
      intercept[IllegalArgumentException] {
        DedupOps.minhashLsh(docs, spark, numPerms = 13, bandSize = 3).count()
      }
    }
  }

  test("16-bit bands: honest buckets stay far below the cap as distinct-content corpora grow") {
    noCache {
      // N docs of fully distinct random content: with 65k values per band
      // an honest bucket holds E ≈ N/65536 docs, so even at 400 docs no
      // bucket should come anywhere near MaxBandBucket — the cap stays a
      // degeneracy guard, not a recall limiter. (The former 8-bit bands
      // put E = N/256 on a collision course with the cap: at 400 docs
      // buckets already averaged 1.5+ members and grew linearly with N.)
      val n = 400
      val rnd = new scala.util.Random(11)
      val docs = mkDocs((0 until n).map { i =>
        (i.toLong, Seq.fill(12)("w" + rnd.nextInt(100000)).mkString(" "))
      })
      val banded = DedupOps.cappedBanding(docs, spark)
      val maxBucket = banded.groupBy("b", "band_val").agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).collect()(0).getLong(0)
      assert(maxBucket <= 8, s"honest 16-bit band bucket unexpectedly hot: $maxBucket")
      // and the cap dropped nothing: every doc appears in all 4 bands
      assert(banded.count() == 4L * n)
    }
  }

  test("public cap knobs: tightening a cap never adds a pair (df and bucket both)") {
    noCache {
      // mixed corpus: clone groups (real near-dups), boilerplate-heavy
      // docs (hot shingles straddling the candidate caps), and uniques
      val docs = mkDocs((0 until 60).flatMap { i =>
        val bp = "bp1 bp2 bp3 bp4"
        Seq(
          (i * 3L, s"$bp u${i}a u${i}b u${i}c"),
          (i * 3L + 1, s"$bp u${i}a u${i}b u${i}d"),
          (i * 3L + 2, s"v${i}a v${i}b v${i}c v${i}d"))
      })
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // df knob: the pair set shrinks monotonically as the cap tightens
      val caps = Seq(256L, 64L, 16L, 4L)
      val jac = caps.map(c => pairs(DedupOps.ngramJaccard(docs, thresholdE4 = 0L, maxDf = c)))
      jac.zip(jac.tail).zip(caps.tail).foreach { case ((wide, tight), c) =>
        assert(tight.subsetOf(wide), s"maxDf=$c added pairs: ${tight -- wide}")
      }
      // bucket knob on both banded blockers: same monotonicity
      val mh = Seq(512L, 128L, 8L).map(c =>
        pairs(DedupOps.minhashLsh(docs, spark, thresholdE4 = 0L, bucketCap = c)))
      mh.zip(mh.tail).foreach { case (wide, tight) => assert(tight.subsetOf(wide)) }
      val sh = Seq(512L, 128L, 8L).map(c =>
        pairs(DedupOps.simhashDedup(docs, spark, maxHamming = 64, bucketCap = c)))
      sh.zip(sh.tail).foreach { case (wide, tight) => assert(tight.subsetOf(wide)) }
    }
  }

  test("capBuckets: no surviving bucket exceeds the cap") {
    noCache {
      val docs = mkDocs((0 until 150).map(i => (i.toLong, s"a b c d e f g${i % 3}")))
      val sigs = DedupOps.minhashSignatures(postings(docs), spark)
      val capped = DedupOps.capBuckets(sigs, Seq("band", "sig"), cap = 10L)
      val oversized = capped.groupBy("band", "sig").agg(count(lit(1)).as("n"))
        .filter(col("n") > 10)
      assert(oversized.count() == 0)
    }
  }

  /** Cap-tuning safety net (VERDICT r4 ask #8): on corpora whose only
    * above-cap shingle is boilerplate present in EVERY doc — the real hot-
    * shingle shape — capping is monotone: it never ADDS a pair above the
    * Jaccard threshold (removing a shingle shared by both members can only
    * lower their Jaccard: (i-c)/(u-c) <= i/u for c shared removals), and it
    * never creates a co-occurrence that wasn't there. Note the premise
    * matters: dropping a shingle present in only ONE member shrinks that
    * doc's size with the intersection intact, which can RAISE the pair's
    * Jaccard — the cap is sized (128) so only corpus-wide boilerplate,
    * which is two-sided by construction, crosses it.
    */
  test("property: df-capping never adds a pair above threshold, nor a new co-occurrence") {
    noCache {
      val corpusGen: Gen[(Seq[(Long, String)], Long)] = for {
        nTemplates <- Gen.choose(3, 5)
        clones <- Gen.listOfN(nTemplates, Gen.choose(1, 3))
        extraToks <- Gen.listOfN(nTemplates, Gen.choose(3, 6))
        threshold <- Gen.oneOf(3000L, 5000L, 8000L)
      } yield {
        val rows = clones.zip(extraToks).zipWithIndex.flatMap { case ((c, nt), t) =>
          // per-template-unique tokens: only the boilerplate prefix is
          // shared corpus-wide, so it is the ONLY shingle above a cap of 4
          // (clone groups have df <= 3)
          val text = ("bp1 bp2 bp3" +: (0 until nt).map(j => s"t${t}_$j")).mkString(" ")
          (0 until c).map(k => (t * 10L + k, text))
        }
        (rows, threshold)
      }
      val prop = Prop.forAll(corpusGen) { case (rows, threshold) =>
        val p = postings(mkDocs(rows))
        val uncapped = DedupOps.verifyJaccard(p, None).cache()
        val capped = DedupOps.verifyJaccard(DedupOps.cappedPostings(p, maxDf = 4L), None).cache()
        try {
          val addedAbove = capped.filter(col("jaccard_e4") >= threshold)
            .select("da", "db")
            .except(uncapped.filter(col("jaccard_e4") >= threshold).select("da", "db"))
            .count()
          val addedPairs = capped.select("da", "db")
            .except(uncapped.select("da", "db")).count()
          addedAbove == 0 && addedPairs == 0
        } finally {
          uncapped.unpersist(); capped.unpersist()
        }
      }
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(8).withInitialSeed(Seed(42L)), prop)
      assert(res.passed, res.status.toString)
    }
  }

  test("jaccard sweep: bins tile [0,10000], cumulative reconciles with ngramJaccard at 8000") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val sweep = DedupOps.jaccardSweep(docs).collect()
    assert(sweep.nonEmpty)
    sweep.foreach { r =>
      val lo = r.getAs[Long]("bin_lo_e4")
      assert(lo >= 0L && lo <= 10000L && lo % 500 == 0, s"bad bin: $r")
    }
    val total = sweep.map(_.getAs[Long]("n_pairs")).sum
    assert(sweep.map(_.getAs[Long]("n_at_or_above")).max == total,
      "the lowest bin's cumulative must equal the total pair count")
    // the sweep's >= 8000 cumulative is exactly what the dedup keeps
    val kept = DedupOps.ngramJaccard(docs).count()
    val at8000 = sweep.filter(_.getAs[Long]("bin_lo_e4") >= 8000L)
      .map(_.getAs[Long]("n_pairs")).sum
    assert(at8000 == kept, s"sweep >=8000 says $at8000, ngramJaccard kept $kept")
  }

  test("sweep threshold: lowest bin under the budget, reconciled with ngramJaccard") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val maxPairs = 100L
    val rows = DedupOps.sweepThreshold(docs, maxPairs).collect()
    val sweep = DedupOps.jaccardSweep(docs).collect()
    val feasible = sweep.filter(_.getAs[Long]("n_at_or_above") <= maxPairs)
    if (feasible.isEmpty) {
      assert(rows.isEmpty, "unreachable budget must yield NO row, not a clamped guess")
    } else {
      assert(rows.length == 1)
      val t = rows(0).getAs[Long]("threshold_e4")
      val kept = rows(0).getAs[Long]("n_pairs_kept")
      assert(t == feasible.map(_.getAs[Long]("bin_lo_e4")).min,
        "must pick the most inclusive feasible bin")
      assert(kept <= maxPairs)
      // the promised keep-count is exactly what the dedup at that
      // threshold produces
      assert(DedupOps.ngramJaccard(docs, thresholdE4 = t).count() == kept,
        s"ngramJaccard at $t disagrees with the sweep's $kept")
    }
  }

  test("source overlap: a planted mirror source tops the cross-source rate matrix") {
    val s = spark
    import s.implicits._
    // src_o is original content; src_m republishes it doc-for-doc (the
    // mirror case the matrix exists to expose); src_u is unrelated.
    def text(i: Long) =
      s"alpha$i bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = (
      (1L to 20L).map(i => (i, text(i), "en", "src_o")) ++
        (21L to 40L).map(i => (i, text(i - 20), "en", "src_m")) ++
        (41L to 60L).map(i => (i, s"november$i oscar$i papa$i quebec$i romeo$i sierra$i tango$i uniform$i victor$i whiskey$i xray$i", "en", "src_u"))
      ).toDF("doc_id", "text", "lang", "source")
    val out = DedupOps.sourceOverlap(docs, s).cache()
    val cross = out.filter(col("source_a") =!= col("source_b")).collect()
    assert(cross.nonEmpty, "the mirror must produce cross-source pairs")
    assert(cross.forall(r =>
      Set(r.getAs[String]("source_a"), r.getAs[String]("source_b")) == Set("src_m", "src_o")),
      s"only the mirror pair may appear cross-source, got ${cross.toSeq}")
    // 20 mirrored docs over a 20x20 pair universe: at least the 20 exact
    // mirror pairs (near-identical texts may add a few more); the mirror
    // rate must dominate every within-source rate.
    val m = cross.head
    assert(m.getAs[Long]("n_pairs") >= 20L && m.getAs[Long]("rate_e9") >= 50000000L,
      s"mirror rate must cover the doc-for-doc copies, got $m")
    val maxWithin = out.filter(col("source_a") === col("source_b"))
      .agg(coalesce(max("rate_e9"), lit(0L))).collect()(0).getLong(0)
    assert(m.getAs[Long]("rate_e9") > maxWithin,
      s"mirror rate ${m.getAs[Long]("rate_e9")} must top within-source $maxWithin")
    assert(out.filter(col("source_a") > col("source_b")).count() == 0,
      "matrix keys are unordered pairs (source_a <= source_b)")
  }

  test("NFC ingest pass: normalized dup classes ⊇ raw-byte dup classes on planted mixed forms") {
    noCache {
      // base corpus where raw keys already have a dup class (two docs
      // share a 5-token head) to prove the superset direction is real
      val docs = mkDocs(Seq(
        (0L, "alpha beta gamma delta epsilon one"),
        (1L, "alpha beta gamma delta epsilon two"),
        (2L, "zeta eta theta iota kappa three"),
        (3L, "wholly distinct text body here four")))
      val planted = DedupOps.plantedNfcTwins(docs)
      def classes(df: DataFrame): Map[Long, Long] =
        df.select(col("doc_id"), col("canonical_id")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val raw = classes(DedupOps.exact(planted))
      val norm = classes(DedupOps.exact(TextOps.normalizeAtIngest(planted)))
      // NFC is a function: byte-equal keys stay equal, so every raw dup
      // class stays together (one normalized class per raw class —
      // canonical ids may change as classes merge, membership may not)
      raw.groupBy(_._2).values.foreach { cls =>
        val ids = cls.keys.toSeq
        assert(ids.forall(norm.contains),
          s"raw-dup docs must stay dups after NFC: $ids vs $norm")
        assert(ids.map(norm).toSet.size == 1,
          s"normalization must never split a raw dup class: $ids → ${ids.map(norm)}")
      }
      // and the planted decomposed/precomposed twins collapse ONLY under
      // the ingest pass: raw bytes differ on the first token, so no raw
      // class ever spans an (even, odd) twin pair...
      raw.groupBy(_._2).values.foreach { cls =>
        assert(cls.keys.map(_ % 2).toSet.size == 1,
          s"raw keys must fragment on mixed canonical forms, got $raw")
      }
      // ...while every normalized class contains its cross-form twin
      // (doc 2k and 2k+1 share head tokens after NFC)
      (0L until 4L).foreach { k =>
        assert(norm.get(2 * k).nonEmpty && norm.get(2 * k) == norm.get(2 * k + 1),
          s"twins ${2 * k}/${2 * k + 1} must land in one normalized class, got $norm")
      }
    }
  }
}
