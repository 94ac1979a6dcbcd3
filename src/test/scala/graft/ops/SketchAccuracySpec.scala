package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.source.Tables

/** Accuracy contracts for the approximate operators: the scale path
  * (sketches) must stay within its documented error of the exact answer
  * the oracle-verified queries compute. This is what licenses swapping
  * `percentile` → `percentile_approx` and `count(distinct)` →
  * `approx_count_distinct` at 100 TB.
  */
class SketchAccuracySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_percentile tracks exact interpolated quantiles within 2% rank error") {
    val rows = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.9)").as("exact"),
        expr("approx_percentile(value, 0.9, 1000)").as("approx"),
        expr("percentile_approx(value, array(0.5), 1000)[0]").as("approx50"),
        expr("percentile(value, 0.5)").as("exact50"),
        // 2% rank error at accuracy=1000 → compare against the exact
        // values at the rank-error band edges
        expr("percentile(value, 0.88)").as("lo"),
        expr("percentile(value, 0.92)").as("hi"),
        expr("percentile(value, 0.48)").as("lo50"),
        expr("percentile(value, 0.52)").as("hi50"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, ap) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"),
        r.getAs[Double]("approx"))
      assert(ap >= lo && ap <= hi,
        s"${r.get(0)}: p90 approx $ap outside rank band [$lo,$hi]")
      val (lo5, hi5, ap5) = (r.getAs[Double]("lo50"), r.getAs[Double]("hi50"),
        r.getAs[Double]("approx50"))
      assert(ap5 >= lo5 && ap5 <= hi5,
        s"${r.get(0)}: p50 approx $ap5 outside rank band [$lo5,$hi5]")
    }
  }

  test("approx_count_distinct stays within 5% of the exact distinct count") {
    val r = Tables.lineitem(spark, dir)
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect().head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL estimate $approx vs exact $exact")
  }
}
