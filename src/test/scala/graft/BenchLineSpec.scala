package graft

import graft.tools.BenchLine
import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line must stay parseable under the driver's 2000-char
  * tail capture at any realistic query count (VERDICT r4 watch item: the
  * fine line sat at ~1863/1900 with 102 queries; round 5 adds more). */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parse(line: String): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(line)

  /** Realistic name/value shape: the actual registered query names plus
    * synthetic ones of the same length distribution. Values calibrated
    * to the measured r8 bench profile (median ≈ 0.35 s, ~45% of queries
    * under 0.3 s, a handful of 1-2.5 s heavies, occasional 10 s+
    * weather) — the fold-only-noise property below is about THIS
    * distribution; a uniform 0.1-2.3 s spread would fold genuinely
    * comparable queries at any budget. */
  private def results(n: Int): Map[String, Double] = {
    val real = SparkEntry.queries.keys.toSeq.sorted
    val names = (real ++ (0 until math.max(0, n - real.size)).map(i => f"extra_query_$i%02d")).take(n)
    names.zipWithIndex.map { case (k, i) =>
      k -> (if (i % 17 == 0) 10.0 + i % 7
            else if (i % 11 == 0) 1.0 + (i % 5) * 0.3
            else 0.05 + (i % 23) * 0.03)
    }.toMap
  }

  test("current query count renders within budget, only noise-level queries fold") {
    val n = SparkEntry.queries.size
    val r = results(n)
    val line = BenchLine(r, "sf0.1")
    assert(line.length <= BenchLine.MaxLen, s"line is ${line.length} chars")
    val node = parse(line)
    val fastN = if (node.has("fast_n")) node.get("fast_n").asInt() else 0
    assert(node.get("queries").size() + fastN == n)
    // The line budget is hard (the driver tail-captures 2000 chars), so as
    // the query count grows the ladder MUST fold more of the fastest tail.
    // The property that matters is therefore not the fold COUNT but that
    // per-query visibility is only ever lost where timings are noise: the
    // fold set is the k smallest values, and its largest member must stay
    // sub-second — any query worth comparing round-over-round is named.
    if (fastN > 0) {
      val foldedMax = r.values.toSeq.sorted.take(fastN).max
      assert(foldedMax < 1.0,
        s"fold reached a $foldedMax s query; line budget needs a rethink")
    }
    // loose backstop so a rendering regression can't quietly fold half the
    // line: the 1900-char budget names ~100 queries regardless of n, so
    // the invariant that scales is a floor on NAMED queries, not a cap on
    // the fold count (which legitimately grows 1:1 with n past ~100)
    assert(n - fastN >= math.min(n, 95),
      s"only ${n - fastN} of $n queries named; line budget needs a rethink")
  }

  test("120+ queries still fit and stay parseable (degrade ladder engages)") {
    for (n <- Seq(110, 120, 150, 200)) {
      val r = results(n)
      val line = BenchLine(r, "sf0.1")
      assert(line.length <= BenchLine.MaxLen, s"$n queries: line is ${line.length} chars")
      val node = parse(line)
      assert(node.get("metric").asText() == "total")
      val shown = node.get("queries").size()
      val fastN = if (node.has("fast_n")) node.get("fast_n").asInt() else 0
      assert(shown + fastN == n, s"$n queries: $shown shown + $fastN folded")
      // total reconciles with per-query values up to rendering precision
      // (each shown value is 1-decimal or integer-rounded: <= 0.5 off)
      val it = node.get("queries").elements()
      var sum = 0.0
      while (it.hasNext) sum += it.next().asDouble()
      if (node.has("fast_sum")) sum += node.get("fast_sum").asDouble()
      assert(math.abs(sum - node.get("value").asDouble()) <= 0.5 * n + 1,
        s"$n queries: shown sum $sum vs total ${node.get("value").asDouble()}")
      // the slowest queries are never the ones folded away
      if (fastN > 0) {
        val slowest = r.toSeq.sortBy { case (k, v) => (-v, k) }.take(5).map(_._1)
        slowest.foreach(k => assert(node.get("queries").has(k), s"slow query $k was dropped"))
      }
    }
  }

  test("window-evidence meta rides the line at 190+ queries, never degraded") {
    val meta = graft.tools.BenchMeta(
      probeBefore = 0.0114, probeAfter = 0.0152, pass3 = true,
      cacheAttrMb = Seq("blocker_precision" -> 11.1, "curated" -> 9.2,
        "ivfpq_res_t" -> 7.5, "overflow_entry" -> 1.0))
    for (n <- Seq(SparkEntry.queries.size, 190, 210, 250)) {
      val r = results(n)
      val line = BenchLine(r, "sf0.1", Some(meta))
      assert(line.length <= BenchLine.MaxLen, s"$n queries: line is ${line.length} chars")
      val node = parse(line)
      // probes at 3 decimals, both ends of the run
      assert(node.get("probe").size() == 2)
      assert(math.abs(node.get("probe").get(0).asDouble() - 0.011) <= 0.001)
      assert(math.abs(node.get("probe").get(1).asDouble() - 0.015) <= 0.001)
      assert(node.get("pass3").asBoolean())
      // top-3 builders only, MB at 1 decimal
      assert(node.get("attr").size() == BenchLine.AttrTop)
      assert(math.abs(node.get("attr").get("blocker_precision").asDouble() - 11.1) <= 0.05)
      assert(!node.get("attr").has("overflow_entry"))
      // the meta costs fold budget, not correctness: totals reconcile
      val fastN = if (node.has("fast_n")) node.get("fast_n").asInt() else 0
      assert(node.get("queries").size() + fastN == n)
      // the evidence fields survive even at the deepest fold depth
      assert(node.has("probe") && node.has("pass3") && node.has("attr"))
    }
    // a clean no-attr window renders without the attr object at all
    val clean = parse(BenchLine(results(150), "sf0.1",
      Some(graft.tools.BenchMeta(0.010, 0.011, pass3 = false, Nil))))
    assert(!clean.get("pass3").asBoolean() && !clean.has("attr"))
  }

  test("empty and single-query edge cases") {
    val empty = parse(BenchLine(Map.empty, "sf0.1"))
    assert(empty.get("value").asDouble() == 0.0 && empty.get("queries").size() == 0)
    val one = parse(BenchLine(Map("q" -> 1.25), "sf0.1"))
    assert(math.abs(one.get("queries").get("q").asDouble() - 1.25) <= 0.06)
  }
}
