package graft.tools

/** Renders the one-line bench JSON under a hard length budget.
  *
  * The driver tail-captures exactly 2000 chars of build output and sbt
  * appends a ~76-char "[success]" line, so the JSON must fit in ~1900
  * chars or the driver's parse comes back null (it did in rounds 1-2).
  * Degrade ladder, applied only as far as needed:
  *
  *   1. fine — every query at 1-decimal precision (".0" stripped)
  *   2. coarse — values >= 10 s rounded to integers (digits are what
  *      weather-inflated runs add)
  *   3. drop-smallest — the k fastest queries are folded into
  *      `"fast_n":k,"fast_sum":s` instead of being silently truncated;
  *      the slow queries (the ones rounds are compared on) stay
  *      per-query, and total still reconciles: value = sum(queries) +
  *      fast_sum up to rendering precision
  *
  * The total always keeps 2 decimals — it is the 2x-of-baseline gate.
  */
object BenchLine {

  val MaxLen = 1900

  private def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
  private def f1(v: Double): String =
    "%.1f".formatLocal(java.util.Locale.ROOT, v).stripSuffix(".0") match {
      case "" => "0"
      case s => s
    }

  private def render(
      shown: Seq[(String, Double)],
      dropped: Seq[(String, Double)],
      total: Double,
      sfName: String,
      coarse: Boolean): String = {
    val qs = shown
      .map { case (k, v) =>
        val s = if (coarse && v >= 10) f1(math.floor(v + 0.5)) else f1(v)
        "\"" + k + "\":" + s
      }
      .mkString("{", ",", "}")
    val fast =
      if (dropped.isEmpty) ""
      else s""","fast_n":${dropped.size},"fast_sum":${f1(dropped.map(_._2).sum)}"""
    s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$qs$fast,"sf":"$sfName"}"""
  }

  def apply(results: Map[String, Double], sfName: String, maxLen: Int = MaxLen): String = {
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // name-sorted for stable diffs between rounds
    val sorted = results.toSeq.sortBy(_._1)
    val fine = render(sorted, Nil, total, sfName, coarse = false)
    if (fine.length <= maxLen) return fine
    val coarse = render(sorted, Nil, total, sfName, coarse = true)
    if (coarse.length <= maxLen) return coarse
    // drop the fastest queries first; ties broken by name so the set is
    // deterministic run-to-run
    val byTime = results.toSeq.sortBy { case (k, v) => (v, k) }
    var k = 1
    while (k < byTime.size) {
      val dropped = byTime.take(k)
      val shown = byTime.drop(k).sortBy(_._1)
      val line = render(shown, dropped, total, sfName, coarse = true)
      if (line.length <= maxLen) return line
      k += 1
    }
    render(Nil, byTime, total, sfName, coarse = true)
  }
}
