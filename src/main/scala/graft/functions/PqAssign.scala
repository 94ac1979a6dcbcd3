package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: product-quantization assignment.
  *
  * `pq_assign(vector, codebook, m, k)` splits `vector` (ARRAY<DOUBLE>,
  * length divisible by `m`) into `m` contiguous subvectors, assigns each
  * to the nearest of its `k` per-subspace codebook centroids, and returns
  * ARRAY<BIGINT> of length `2m + 1`: the `m` centroid codes, the summed
  * quantized residual, then the `m` per-subspace minimum distances (so a
  * distortion audit — q161 — can attribute error to (subspace, centroid)
  * without re-deriving distances outside the codegen'd loop; consumers of
  * the original layout read positions 1..m+1 unchanged). `codebook` is the
  * flattened ARRAY<DOUBLE> of centroids laid out `(subspace * k +
  * centroid) * subDim + dim` — in practice a broadcast-sized literal or
  * trained constant (m·k·subDim doubles).
  *
  * Why an `Expression` and not unrolled SQL (the r6 lesson): the unrolled
  * m·k·subDim-term projection (256 terms at m=4,k=4,sub=16) exceeds the
  * JVM's 64 KB method limit, so whole-stage codegen FAILS TO COMPILE and
  * the entire stage silently falls back to interpreted execution — the
  * exact performance trap r5 eliminated for the LSH family. This
  * expression compiles to three nested primitive loops inside whole-stage
  * codegen: no allocation per term, no method-size blowup at any m/k/dim.
  *
  * Cross-engine determinism (the q112/q131 discipline): each
  * per-dimension squared residual is quantized to a BIGINT before
  * summing — `round((v_i - c_i)² · 1e9)` with the identical operation
  * order and HALF_UP rounding Spark's own `round` applies
  * (`BigDecimal.valueOf(x).setScale(0, HALF_UP)`), which for the
  * always-non-negative squared term coincides with DuckDB's
  * half-away-from-zero `round`. Subspace distances are therefore exact
  * integers, and the argmin is a pure integer comparison with a
  * first-minimum tie break (strict `<`), matching the oracle's chained
  * `<=` CASE. No float comparison exists anywhere in the assignment.
  *
  * Null contract: null if any input is null; vector/codebook elements are
  * assumed non-null (embedding vectors).
  */
case class PqAssign(
    first: Expression,   // vector: ARRAY<DOUBLE>
    second: Expression,  // codebook: ARRAY<DOUBLE>, length m * k * (|v| / m)
    third: Expression,   // m: number of subspaces (INT)
    fourth: Expression)  // k: centroids per subspace (INT)
  extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "pq_assign"

  override protected def nullSafeEval(v0: Any, cb0: Any, m0: Any, k0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val cb = cb0.asInstanceOf[ArrayData]
    val m = m0.asInstanceOf[Int]
    val k = k0.asInstanceOf[Int]
    val sub = v.numElements() / m
    val out = new Array[Long](2 * m + 1)
    var err = 0L
    var s = 0
    while (s < m) {
      var bestD = Long.MaxValue
      var best = -1
      var c = 0
      while (c < k) {
        var dist = 0L
        var j = 0
        while (j < sub) {
          val d = v.getDouble(s * sub + j) - cb.getDouble((s * k + c) * sub + j)
          dist += java.math.BigDecimal.valueOf(d * d * 1e9)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(s) = best.toLong
      out(m + 1 + s) = bestD
      err += bestD
      s += 1
    }
    out(m) = err
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, m, k) => {
      val sub = ctx.freshName("sub")
      val out = ctx.freshName("out")
      val err = ctx.freshName("err")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val bestD = ctx.freshName("bestD")
      val best = ctx.freshName("best")
      val dist = ctx.freshName("dist")
      val d = ctx.freshName("d")
      s"""
         |int $sub = $v.numElements() / $m;
         |long[] $out = new long[2 * $m + 1];
         |long $err = 0L;
         |for (int $s = 0; $s < $m; $s++) {
         |  long $bestD = Long.MAX_VALUE;
         |  int $best = -1;
         |  for (int $c = 0; $c < $k; $c++) {
         |    long $dist = 0L;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      double $d = $v.getDouble($s * $sub + $j)
         |        - $cb.getDouble(($s * $k + $c) * $sub + $j);
         |      $dist += java.math.BigDecimal.valueOf($d * $d * 1e9)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).longValue();
         |    }
         |    if ($dist < $bestD) { $bestD = $dist; $best = $c; }
         |  }
         |  $out[$s] = (long) $best;
         |  $out[$m + 1 + $s] = $bestD;
         |  $err += $bestD;
         |}
         |$out[$m] = $err;
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): PqAssign =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
