package graft.util

/** Cross-engine-safe SQL arithmetic fragments. */
object SqlArith {

  /** FLOOR division of a BIGINT expression (Spark side). Spark's `div`
    * truncates toward zero — and so does DuckDB's integer `//`
    * ((-7)//2 = -3, verified; only its FLOAT `//` floors), so the two
    * engines agree with each other on positives but BOTH disagree with
    * floor on negatives. This form subtracts the positive modulus
    * first, so the quotient is an exact multiple and `div` == floor —
    * all exact integer ops, fully codegen'd, no float round-trip. An
    * oracle twin dividing a NEGATIVE-capable expression must use
    * [[floorDivDuck]], not bare `//` (q293's power iteration is the
    * precedent; every epoch/length use in this repo is non-negative,
    * where `//` is already equal).
    */
  def floorDiv(e: String, d: Long): String =
    s"((($e) - pmod($e, ${d}L)) div ${d}L)"

  /** DuckDB twin of [[floorDiv]] for negative-capable dividends, with a
    * (positive) divisor expression: true floor via the positive-mod
    * subtraction, since DuckDB's integer `//` truncates toward zero.
    */
  def floorDivDuck(e: String, d: String): String =
    s"((($e) - ((($e) % ($d)) + ($d)) % ($d)) // ($d))"
}
