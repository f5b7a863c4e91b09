package graft.functions

/** Engine-portable polynomial hash family shared by the oracled LSH surface
  * (q29/q37/q44) and their DuckDB oracle-SQL generators.
  *
  * Everything here is plain integer arithmetic in Z/p (p = 1e9+7), so any
  * engine with 64-bit integers computes bit-identical values — unlike
  * xxhash64, which only Spark implements. Bounds that keep both engines
  * overflow-free (DuckDB BIGINT *errors* on overflow rather than wrapping):
  *   - base hash and all permuted values are < p ≈ 2^30;
  *   - a·h ≤ (p-1)² ≈ 1.0e18 < 2^63 ≈ 9.2e18;
  *   - band fold acc·BandBase ≤ p·1e6 ≈ 1e15 < 2^63.
  *
  * The permutation family π_i(h) = (a_i·h + b_i) mod p with a_i ∈ [1, p-1]
  * is a bijection on Z/p (p prime) — a universal hash family, adequate for
  * min-wise use at the signature widths used here. Coefficients derive from
  * SplitMix64 so they are deterministic and reproducible in the oracle SQL
  * as literals.
  *
  * The Spark-only xxhash64 family (64-bit multiply-shift, see
  * [[VectorExpressions.MinHashKernel]]) remains the production-scale path:
  * 64-bit keys collide less and hash faster. This family exists so the
  * SAME banding plans can be certified end-to-end against DuckDB.
  */
object PolyHash {
  /** Hash modulus (prime). */
  val Mod: Long = 1000000007L
  /** Horner base for character-level hashing (matches q40's fingerprints). */
  val Base: Long = 257L
  /** Horner base for folding band minima into a bucket key. */
  val BandBase: Long = 1000003L
  /** Fold seed for band bucket keys. */
  val BandSeed: Long = 42L

  private def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Multiplier of permutation i — in [1, Mod-1]. */
  def coefA(i: Int): Long = java.lang.Math.floorMod(splitmix(2L * i), Mod - 1) + 1
  /** Offset of permutation i — in [0, Mod-1]. */
  def coefB(i: Int): Long = java.lang.Math.floorMod(splitmix(2L * i + 1), Mod)

  /** Horner hash of a string's Unicode CODE POINTS mod p — exactly the
    * DuckDB formulation `list_reduce(ord-codepoints, (acc,x) ->
    * (acc*257+x) % p)` for ALL text, non-BMP included (ord() yields code
    * points, so iterating UTF-16 code units would diverge on emoji and
    * other astral-plane characters — round-4 advice). Bound check: a code
    * point < 0x110000 ≈ 1.1e6, so acc·257 + cp < 2.6e11 ≪ 2^63 on both
    * engines.
    */
  def horner(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += java.lang.Character.charCount(cp)
    }
    h
  }

  /** The Horner hash as a DuckDB SQL lambda body over a string expr —
    * kept HERE next to [[horner]] so the two formulations cannot drift.
    *
    * The `c != ''` guard handles the EMPTY STRING: DuckDB's
    * `regexp_split_to_array('', '')` yields `['']` (one empty element,
    * whose `ord` is -1), which would hash '' to -1 while [[horner]]
    * returns 0 — the round-11 q193 incident (a document whose every
    * chunk purges rebuilds to '', and the checksums diverged by exactly
    * that one). Non-empty strings never produce empty elements from the
    * per-character split, so the guard changes nothing else.
    */
  def hornerSql(strExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"[CAST(ord(c) AS BIGINT) for c in regexp_split_to_array($strExpr, '') " +
      s"if c != '']), " +
      s"(acc, x) -> (acc * $Base + x) % $Mod)"
}
