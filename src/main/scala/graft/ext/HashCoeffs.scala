package graft.ext

/** Seeded universal-hash family h_i(x) = (a_i·x + b_i) mod P over the
  * polynomial rolling-hash domain [0, P), P = 1e9+7 (prime), a_i ∈ [1, P),
  * b_i ∈ [0, P) — the classic Carter–Wegman construction used to derive the
  * MinHash "permutations" and SimHash bit projections.
  *
  * Chosen over xxhash64 deliberately: both factors stay below 2^30, so
  * a·x + b < 2^60 never overflows a 64-bit long and the whole family is
  * expressible in portable ANSI SQL — which makes every sketch operator
  * built on it DuckDB-oracleable (the round-1/2 sketches hashed with
  * xxhash64 and could only get rows-only checks). The coefficients are
  * drawn from a fixed seed so the Spark plan and the oracle SQL inline the
  * SAME constants.
  */
object HashCoeffs {

  val P: Long = 1000000007L

  /** Midpoint threshold: m ∈ [0, P) is a "1" bit iff m <= Half. */
  val Half: Long = (P - 1) / 2

  def coeffs(n: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)((1L + r.nextLong(P - 1), r.nextLong(P)))
  }
}
