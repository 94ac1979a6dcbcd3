package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class CosineSimilaritySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  test("cosine_sim matches the higher-order-function formulation bit-for-bit") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(0.3, -0.7, 0.11, 0.999), Seq(-0.25, 0.5, 0.125, 2.0))
    ).toDF("a", "b")
    val rows = df.select(
      expr("cosine_sim(a, b)").as("native"),
      expr("""aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x)
             | / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x))
             |  * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x)))"""
        .stripMargin.replaceAll("\n", " ")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "bit-identical")
    }
    // orthogonal → 0, parallel → 1
    val simple = df.select(expr("round(cosine_sim(a, b), 9)")).collect()
    assert(simple(1).getDouble(0) === 0.0)
    val self = Seq((Seq(2.0, 3.0), Seq(2.0, 3.0))).toDF("a", "b")
      .select(expr("round(cosine_sim(a, b), 9)")).collect()
    assert(self(0).getDouble(0) === 1.0)
  }

  test("cosine_sim is null-safe and interpreted eval agrees with codegen") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq(1.0, 2.0)), Some(Seq(2.0, 4.0)))
    ).toDF("a", "b")
    val rows = df.select(expr("cosine_sim(a, b)")).collect()
    assert(rows(0).isNullAt(0))
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)

    // interpreted path (codegen off) must agree
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4.0, 5.0, 6.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    val interp = e.eval(null).asInstanceOf[Double]
    val viaSql = spark.sql(
      "SELECT cosine_sim(array(1.0D,2.0D,3.0D), array(4.0D,5.0D,6.0D))")
      .collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToLongBits(interp) ===
      java.lang.Double.doubleToLongBits(viaSql))
  }
}
