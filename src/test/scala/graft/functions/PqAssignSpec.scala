package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PqAssignSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  // 2 subspaces × 2 centroids × 2 dims, flattened (s*k + c)*sub + j.
  // Subspace 0 centroids: (0,0) and (1,1); subspace 1: (-1,0) and (0,-1).
  private val cb = "array(0.0D, 0.0D, 1.0D, 1.0D, -1.0D, 0.0D, 0.0D, -1.0D)"

  test("pq_assign picks the nearest centroid per subspace and sums residuals") {
    val rows = spark.sql(
      s"""SELECT pq_assign(array(0.1D, 0.1D, -0.9D, 0.05D), $cb, 2, 2) AS pq"""
    ).collect()
    val pq = rows(0).getSeq[Long](0)
    // subspace 0: (0.1,0.1) → centroid 0 at (0,0); subspace 1: (-0.9,0.05) → centroid 0 at (-1,0)
    assert(pq(0) === 0L)
    assert(pq(1) === 0L)
    // residual: round(0.01*1e9)*2 + round(0.01*1e9) + round(0.0025*1e9)
    assert(pq(2) === 10000000L * 2 + 10000000L + 2500000L)
    // per-subspace minima appended after the total (positions m+1..2m)
    assert(pq(3) === 10000000L * 2)
    assert(pq(4) === 10000000L + 2500000L)
    assert(pq.length === 5)
  }

  test("pq_assign tie-break is first-minimum, matching the oracle's <= chain") {
    // (0.5, 0.5) is equidistant from (0,0) and (1,1): first centroid wins.
    val pq = spark.sql(
      s"""SELECT pq_assign(array(0.5D, 0.5D, 0.0D, 0.0D), $cb, 2, 2) AS pq"""
    ).collect()(0).getSeq[Long](0)
    assert(pq(0) === 0L)
  }

  test("interpreted eval agrees with codegen and nulls propagate") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val v = Literal.create(Seq(0.1, 0.1, -0.9, 0.05), ArrayType(DoubleType))
    val c = Literal.create(Seq(0.0, 0.0, 1.0, 1.0, -1.0, 0.0, 0.0, -1.0),
      ArrayType(DoubleType))
    val interp = PqAssign(v, c, Literal(2), Literal(2)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val viaSql = spark.sql(
      s"SELECT pq_assign(array(0.1D, 0.1D, -0.9D, 0.05D), $cb, 2, 2)")
      .collect()(0).getSeq[Long](0)
    assert(interp.toSeq === viaSql)
    assert(spark.sql(
      s"SELECT pq_assign(CAST(NULL AS array<double>), $cb, 2, 2)")
      .collect()(0).isNullAt(0))
  }

  test("q133's full plan compiles under whole-stage codegen (no 64KB fallback)") {
    // The unrolled-SQL first cut blew the JVM method limit and silently ran
    // interpreted; spark.sql.codegen.fallback=false turns that silent
    // fallback into a hard failure, so this test pins the fix.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = graft.SparkEntry.queries("q133_pq_assign")(
        spark, "/root/testdata/sf0.001").collect().length
      assert(n > 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
