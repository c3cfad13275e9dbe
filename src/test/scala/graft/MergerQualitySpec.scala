package graft

import graft.operators.{MergeParams, MergeQuality, MergerOps}
import org.apache.spark.sql.DataFrame

/** Quality-mode merge ladder vs reference `api/merger/QualityMerge.java`:
  * mode-specific pair eligibility, alias parsing (incl. the colloquial
  * Russian aliases), and loop stop bounds.
  */
class MergerQualitySpec extends SparkSpec {

  test("parseQuality accepts mode names and reference aliases") {
    assert(MergeQuality.parse("small") == MergeQuality.Small)
    assert(MergeQuality.parse("SMALL") == MergeQuality.Small)
    assert(MergeQuality.parse("на-пол-шишечки") == MergeQuality.Small)
    assert(MergeQuality.parse("medium") == MergeQuality.Medium)
    assert(MergeQuality.parse("ну-сожми-чуток") == MergeQuality.Medium)
    assert(MergeQuality.parse("large") == MergeQuality.Large)
    assert(MergeQuality.parse("по-взрослому") == MergeQuality.Large)
    intercept[IllegalArgumentException](MergeQuality.parse("gently"))
  }

  test("border regions count per mode: SMALL ignores, MEDIUM honors, LARGE merges to one") {
    assert(MergeQuality.Small.borderRegionsCount(7) == -1)
    assert(MergeQuality.Medium.borderRegionsCount(7) == 7)
    assert(MergeQuality.Large.borderRegionsCount(7) == 1)
  }

  // one adjacent pair per table so greedy picking can't mask eligibility:
  //   tA (250, 50): MEDIUM yes (sub-minimum merges unconditionally even
  //                 next to an over-cap region), SMALL no (250 > max)
  //   tB (150,150): neither (SMALL: no side sub-min; MEDIUM: sum > merged cap)
  //   tC (150,100): MEDIUM yes (fits caps), SMALL no
  //   tD ( 50,150): both
  private val P = MergeParams(minMb = 100L, maxMb = 200L, maxMergedMb = 250L)

  private def fixture: (DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    val info = Seq(
      ("a1", "tA", 0L, 1L), ("a2", "tA", 1L, 2L),
      ("b1", "tB", 0L, 1L), ("b2", "tB", 1L, 2L),
      ("c1", "tC", 0L, 1L), ("c2", "tC", 1L, 2L),
      ("d1", "tD", 0L, 1L), ("d2", "tD", 1L, 2L)
    ).toDF("region_id", "table_name", "start_key", "end_key")
    val metrics = Seq(
      ("a1", 250L), ("a2", 50L),
      ("b1", 150L), ("b2", 150L),
      ("c1", 150L), ("c2", 100L),
      ("d1", 50L), ("d2", 150L)
    ).toDF("region_id", "size_mb")
    (info, metrics)
  }

  test("SMALL ladder: only pairs with a sub-minimum side and the other under the cap") {
    val (info, metrics) = fixture
    val plan = MergerOps.mergePlanQuality(info, metrics, MergeQuality.Small, P)
    assert(plan.select("table_name").collect().map(_.getString(0)).toSet == Set("tD"))
  }

  test("MEDIUM ladder: sub-minimum merges unconditionally, otherwise caps apply") {
    val (info, metrics) = fixture
    val plan = MergerOps.mergePlanQuality(info, metrics, MergeQuality.Medium, P)
    assert(plan.select("table_name").collect().map(_.getString(0)).toSet == Set("tA", "tC", "tD"))
  }

  test("LARGE ladder shares MEDIUM pair eligibility") {
    val (info, metrics) = fixture
    val med = MergerOps.mergePlanQuality(info, metrics, MergeQuality.Medium, P)
    val lg = MergerOps.mergePlanQuality(info, metrics, MergeQuality.Large, P)
    assert(med.collect().toSet == lg.collect().toSet)
  }
}
