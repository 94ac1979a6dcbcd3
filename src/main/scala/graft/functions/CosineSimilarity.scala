package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double vectors.
  *
  * Why an `Expression` and not a UDF (SURVEY.md preference order): a Scala
  * UDF boxes both arrays and every element per call and is an optimizer
  * black box; the `aggregate(zip_with(...))` higher-order formulation stays
  * unboxed but builds an intermediate array and evaluates a lambda chain
  * per element. This expression compiles to a tight primitive loop inside
  * whole-stage codegen — no allocation, no virtual calls per element — and
  * `eval` provides the interpreted twin for non-codegen paths.
  *
  * Accumulation is left-to-right in double precision, identical to both the
  * higher-order-function formulation and DuckDB's `list_dot_product`, so
  * results are bit-identical across all three (oracle-safe).
  *
  * Null contract: null if either array is null; elements are assumed
  * non-null (embedding vectors) — a null element surfaces as 0.0 via
  * `ArrayData.getDouble` semantics rather than poisoning the whole result.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // Input contract: both children are ARRAY<DOUBLE> (Spark 4 keeps
  // `ExpectsInputTypes`' AbstractDataType private[sql], so the contract is
  // documented rather than analyzer-coerced; all engine call sites cast
  // the float32 embedding column to double first).
  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
