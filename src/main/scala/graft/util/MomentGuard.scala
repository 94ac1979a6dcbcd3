package graft.util

/** Shared overflow-envelope guards for the exact-integer-moment family
  * (q112 / q131 / q132 / q135 / q137). Two failure modes are guarded,
  * with IDENTICAL semantics on Spark and DuckDB so an out-of-envelope
  * deployment fails loudly on BOTH engines instead of diverging (Spark
  * wraps BIGINT sums silently; DuckDB accumulates in HUGEINT and raises
  * only at the final cast — either way the cross-engine hash would split):
  *
  *  1. **Per-row envelope** ([[quantizeSpark]]/[[quantizeDuck]]): the
  *     quantized term itself must be bounded, so each row's contribution
  *     to a moment is a known-magnitude BIGINT.
  *  2. **Aggregate envelope** ([[sumGuardSpark]]/[[sumGuardDuck]]): the
  *     per-row bound does NOT bound the group sum — Σterm can exceed
  *     2⁶³−1 once a group holds ~1e6 max-magnitude rows. The guard
  *     checks `n · max(|term|) ≤ 9.0e18` (a conservative certificate:
  *     |Σterm| ≤ n·max|term|, and 9.0e18 < 2⁶³−1 ≈ 9.223e18 leaves a
  *     margin far wider than the one-ulp rounding of the double
  *     product, n and max both being < 2⁵³ and exactly representable).
  *     It runs POST-aggregate over the handful of grouped rows — two
  *     extra exact aggregates (count already present + one integer max)
  *     per guarded moment, zero cost on the row stream — so unlike a
  *     static `HAVING count(*) < bound` it admits large well-behaved
  *     groups and rejects only groups that could actually wrap.
  *
  * Both fragments are generated from one template each, so the message
  * text and the comparison arithmetic cannot drift between engines.
  */
object MomentGuard {

  /** Conservative double threshold: anything ≤ this is provably < 2⁶³−1
    * even after the product's one-ulp rounding. */
  private val Limit = "9.0e18"

  private def sumFrag(raiseFn: String, sumExpr: String, nExpr: String,
      maxAbsExpr: String, tag: String): String =
    s"CASE WHEN CAST($nExpr AS DOUBLE) * CAST($maxAbsExpr AS DOUBLE) <= $Limit " +
      s"THEN $sumExpr ELSE CAST($raiseFn('$tag: BIGINT moment may overflow " +
      s"(n * max|term| > $Limit); widen to DECIMAL(38,0) or shard the group') " +
      "AS BIGINT) END"

  /** Spark guard around an aggregated BIGINT moment sum. `sumExpr`,
    * `nExpr`, `maxAbsExpr` are SQL fragments valid in the post-aggregate
    * projection (e.g. column names produced by the agg). */
  def sumGuardSpark(sumExpr: String, nExpr: String, maxAbsExpr: String,
      tag: String): String =
    sumFrag("raise_error", sumExpr, nExpr, maxAbsExpr, tag)

  /** DuckDB twin — same arithmetic, same message, `error()` instead of
    * `raise_error()`. Usable directly in the aggregate SELECT (DuckDB
    * allows mixing aggregates inside CASE). */
  def sumGuardDuck(sumExpr: String, nExpr: String, maxAbsExpr: String,
      tag: String): String =
    sumFrag("error", sumExpr, nExpr, maxAbsExpr, tag)

  private def prodFrag(raiseFn: String, aExpr: String, bExpr: String,
      tag: String): String =
    s"CASE WHEN CAST($aExpr AS DOUBLE) * CAST($bExpr AS DOUBLE) <= $Limit " +
      s"THEN ($aExpr) * ($bExpr) ELSE CAST($raiseFn('$tag: BIGINT product " +
      s"may overflow (a * b > $Limit); widen to DECIMAL(38,0) or shard the " +
      "key') AS BIGINT) END"

  /** Guard around a BIGINT × BIGINT product of NON-NEGATIVE operands
    * (counts): the product iff its double image is ≤ the limit, else a
    * loud raise on both engines. The double compare admits at most a
    * one-ulp-overestimated product, which the 2% margin under 2⁶³−1
    * absorbs. */
  def productGuardSpark(aExpr: String, bExpr: String, tag: String): String =
    prodFrag("raise_error", aExpr, bExpr, tag)

  def productGuardDuck(aExpr: String, bExpr: String, tag: String): String =
    prodFrag("error", aExpr, bExpr, tag)

  private def quantFrag(raiseFn: String, valueExpr: String, bound: Long,
      scale: Long, tag: String): String =
    s"CASE WHEN abs($valueExpr) <= ${bound}L THEN " +
      s"CAST(round(($valueExpr) * ${scale}L) AS BIGINT) " +
      s"ELSE CAST($raiseFn('$tag: value outside quantization envelope " +
      s"(|value| > $bound)') AS BIGINT) END"

  /** Per-row quantization with a loud envelope: `round(value·scale)` as
    * BIGINT iff |value| ≤ bound, else raise — so both engines fail at the
    * same row instead of one wrapping downstream. */
  def quantizeSpark(valueExpr: String, bound: Long, scale: Long,
      tag: String): String =
    quantFrag("raise_error", valueExpr, bound, scale, tag)

  def quantizeDuck(valueExpr: String, bound: Long, scale: Long,
      tag: String): String =
    // DuckDB has no BIGINT literal suffix; strip the L.
    quantFrag("error", valueExpr, bound, scale, tag)
      .replace(s"${bound}L", bound.toString)
      .replace(s"${scale}L", scale.toString)
}
