package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable partial-aggregation state: running per-dimension sums + count. */
case class CentroidBuffer(var sums: Seq[Double], var n: Long)

/** Typed UDAF (SURVEY.md §2.2 "UDF/UDAF/UDTF" extension row): per-group
  * mean of a float-vector column, as a Catalyst `Aggregator` so Spark plans
  * it with partial (map-side) + final aggregation — each executor reduces
  * its partitions to one (sums, n) pair per group before the shuffle, so
  * the shuffle volume is O(groups × dims), independent of row count.
  *
  * The reference has no user-defined aggregate anywhere (its only routine
  * is a row-level plpgsql trigger, reference `src/db_utils.rs:112-118`);
  * this is the extension-layer pattern for embedding-pipeline statistics.
  */
object VectorCentroid extends Aggregator[Seq[Float], CentroidBuffer, Seq[Double]] {

  override def zero: CentroidBuffer = CentroidBuffer(Seq.empty, 0L)

  override def reduce(b: CentroidBuffer, v: Seq[Float]): CentroidBuffer = {
    if (b.n == 0L) {
      b.sums = v.map(_.toDouble)
    } else {
      val s = b.sums.toArray
      var i = 0
      while (i < s.length && i < v.length) { s(i) += v(i); i += 1 }
      b.sums = s.toSeq
    }
    b.n += 1
    b
  }

  override def merge(x: CentroidBuffer, y: CentroidBuffer): CentroidBuffer = {
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      val s = x.sums.toArray
      var i = 0
      while (i < s.length && i < y.sums.length) { s(i) += y.sums(i); i += 1 }
      CentroidBuffer(s.toSeq, x.n + y.n)
    }
  }

  override def finish(b: CentroidBuffer): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[CentroidBuffer] = Encoders.product[CentroidBuffer]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
