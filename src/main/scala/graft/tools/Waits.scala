package graft.tools

/** O-59 wait-until conditions (reference
  * `api/rstask/RSTaskControllerHelper.java:86-148` not-compacting /
  * not-in-transition polls, retry-bounded variants `:49-67`).
  *
  * These are driver-side control flow, not dataflow (SURVEY.md §2.9):
  * the condition is typically a cheap status query (connector admin call
  * or a tiny DataFrame count); the engine keeps them out of the cluster
  * path on purpose.
  */
object Waits {

  /** Poll `cond` every `delayMs` until true or `retries` exhausted;
    * returns whether the condition was met. Mirrors the reference's
    * bounded `isTableCompacting_checked` (100 retries). */
  def until(retries: Int, delayMs: Long)(cond: () => Boolean): Boolean = {
    var i = 0
    while (i < retries) {
      if (cond()) return true
      Thread.sleep(delayMs)
      i += 1
    }
    cond()
  }
}
