package graft.operators

/** Fixture-size bounds shared by the DuckDB oracle SQL.
  *
  * The oracle engine expands per-row sequences with `range(1, N)` (token
  * positions, media frame indices) because it has no unbounded per-row
  * generator, so every oracle that walks positions carries an explicit
  * cap. These are FIXTURE limits, not operator limits — the Spark
  * operators are uncapped (posexplode / sequence) — and they live here so
  * a single constant grows with the fixtures instead of drifting apart
  * across a dozen SQL strings. If a fixture document or media payload
  * ever exceeds a bound, the oracle truncates where Spark does not and
  * the hash check fails loudly — the intended failure mode.
  */
object OracleLimits {
  /** Exclusive upper bound on 1-based token positions per fixture doc
    * (fixture docs run tens of tokens; bound leaves 10× headroom). */
  val MaxDocTokens = 1000

  /** Exclusive upper bound on media frame indices per fixture payload. */
  val MaxMediaFrames = 1000

  /** Inclusive upper bound on word length (chars) admitted to the BPE
    * vocabulary. Unlike the pure-fixture caps above, this one is enforced
    * on BOTH sides (Spark filters words over the bound; the oracle's
    * position ranges stop at it), so the two engines agree even if a
    * future fixture grows a pathological token. */
  val MaxWordChars = 64
}
