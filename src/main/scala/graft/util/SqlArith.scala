package graft.util

/** Cross-engine-safe SQL arithmetic fragments. */
object SqlArith {

  /** FLOOR division of a BIGINT expression — matches DuckDB's `//`.
    * Spark's `div` truncates toward zero, DuckDB's `//` floors; they
    * diverge on negative values (e.g. pre-1970 epoch timestamps bucketed
    * into days/weeks). This form subtracts the positive modulus first, so
    * the quotient is an exact multiple and `div` == floor — all exact
    * integer ops, fully codegen'd, no float round-trip.
    */
  def floorDiv(e: String, d: Long): String =
    s"((($e) - pmod($e, ${d}L)) div ${d}L)"
}
