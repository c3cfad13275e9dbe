package graft.tools

/** Opt-in phase timer for the dev harnesses: `GRAFT_PROF=1` in the
  * environment makes every wrapped phase print `[prof] label  N.NNs` to
  * stderr; unset (production, bench, tests) it is a zero-allocation
  * pass-through. Used to attribute the stored-index append cadence cost
  * phase by phase (probe / marker / table writes / sidecar / refresh). */
private[graft] object Prof {
  val enabled: Boolean = sys.env.contains("GRAFT_PROF")

  def apply[A](label: => String)(f: => A): A =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] ${label}%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
}
