package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.util.MomentGuard

/** The shared overflow-envelope certificate for the integer-moment
  * family (q112/q131/q132/q135/q137): a group whose `n·max|term|`
  * exceeds 9.0e18 must RAISE — on Spark via `raise_error`, on DuckDB via
  * `error` with byte-identical message and arithmetic (the fragments are
  * generated from one template, asserted here) — instead of Spark
  * silently wrapping the BIGINT sum where DuckDB would raise at the
  * HUGEINT→BIGINT cast, the cross-engine divergence class the guards
  * exist to kill. The DuckDB side of the raise is exercised by
  * `scripts/guard_check.py` (dev harness, same fragment text).
  */
class MomentGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def grouped(terms: Seq[Long]) =
    terms.map(("g", _)).toDF("k", "t")
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum("t").as("sr"), max(abs(col("t"))).as("m"))
      .select(expr(MomentGuard.sumGuardSpark("sr", "n", "m", "spec")).as("s"))

  test("sum guard passes a group whose certificate holds") {
    assert(grouped(Seq.fill(5)(1000000L)).collect()
      .map(_.getLong(0)).toSeq == Seq(5000000L))
  }

  test("sum guard raises when n times max-term exceeds the limit") {
    // 3 × 4e18 = 1.2e19 > 9.0e18 even though this particular sum
    // (4e18 + 2) still fits in BIGINT: the certificate is conservative
    // BY DESIGN — a group admitted this close to the edge could wrap on
    // the next partition's rows, and under non-ANSI Spark the wrap is
    // SILENT (under ANSI the sum raises its own engine-specific error;
    // the guard's message is the engine-INDEPENDENT one both DuckDB and
    // Spark produce before any wrap is reachable).
    val e = intercept[Exception](
      grouped(Seq(4000000000000000000L, 1L, 1L)).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("BIGINT moment may overflow")),
      s"expected the guard message in: ${msgs(e)}")
  }

  test("quantize passes inside and raises outside the envelope") {
    def q(v: Double) = Seq(v).toDF("value")
      .select(expr(MomentGuard.quantizeSpark("value", 3000L, 1000L, "spec")).as("q"))
    assert(q(2.5).collect().head.getLong(0) == 2500L)
    val e = intercept[Exception](q(3000.5).collect())
    assert(Option(e.getMessage).getOrElse(e.getCause.getMessage)
      .contains("outside quantization envelope"))
  }

  test("spark and duckdb fragments are one template (same arithmetic, same message)") {
    val s = MomentGuard.sumGuardSpark("S", "N", "M", "t")
    val d = MomentGuard.sumGuardDuck("S", "N", "M", "t")
    assert(s.replace("raise_error(", "error(") == d)
    val qs = MomentGuard.quantizeSpark("v", 3000L, 1000L, "t")
    val qd = MomentGuard.quantizeDuck("v", 3000L, 1000L, "t")
    assert(qs.replace("raise_error(", "error(")
      .replace("3000L", "3000").replace("1000L", "1000") == qd)
  }
}
