package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.source.Tables

/** Data-layout operators: keys that make 100 TB *scannable*, not just
  * computable. A Z-order (Morton) sort key interleaves the bits of several
  * quantized dimensions so that a range predicate on ANY of them maps to a
  * bounded set of key ranges — writing parquet sorted by `zcode` gives
  * min/max row-group statistics that prune scans on either dimension
  * (the standard layout trick behind multi-dimensional clustering in
  * modern lakehouse table formats).
  */
object Layout {

  private type Q = (SparkSession, String) => DataFrame

  /** q104 — Z-order key over the first two embedding dimensions: quantize
    * each to 8 bits ([-1,1] → 0..255, floor, clamped), then interleave —
    * bit j of dim 0 lands at position 2j, of dim 1 at 2j+1. All-integer
    * after the one float→int quantization (floor is exact cross-engine),
    * and entirely map-side: the only shuffle is the final range-
    * partitioning sort, which is exactly the write-side sort the layout
    * exists to produce.
    */
  private val q104: Q = (s, dir) =>
    Tables.spread(Tables.embeddings(s, dir))
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("q0", expr(
        "least(greatest(CAST(floor((element_at(v, 1) + 1.0D) * 128) AS INT), 0), 255)"))
      .withColumn("q1", expr(
        "least(greatest(CAST(floor((element_at(v, 2) + 1.0D) * 128) AS INT), 0), 255)"))
      .withColumn("zcode", expr(
        """aggregate(sequence(0, 7), 0, (acc, j) ->
          |  acc + shiftleft(shiftright(q0, j) % 2, 2*j)
          |      + shiftleft(shiftright(q1, j) % 2, 2*j + 1))""".stripMargin))
      .select("vec_id", "q0", "q1", "zcode")
      .orderBy("zcode", "vec_id")

  private val q104Sql =
    """SELECT vec_id, q0, q1,
      |  CAST(list_sum(list_transform(generate_series(0, 7), j ->
      |    ((q0 >> j) % 2) * (1 << (2*j)) + ((q1 >> j) % 2) * (1 << (2*j + 1))))
      |    AS INTEGER) AS zcode
      |FROM (SELECT vec_id,
      |  least(greatest(CAST(floor((embedding[1]::DOUBLE + 1.0::DOUBLE) * 128) AS INTEGER), 0), 255) AS q0,
      |  least(greatest(CAST(floor((embedding[2]::DOUBLE + 1.0::DOUBLE) * 128) AS INTEGER), 0), 255) AS q1
      |  FROM embeddings)
      |ORDER BY zcode, vec_id""".stripMargin

  val all: Map[String, Q] = Map("q104_zorder" -> q104)
  val oracle: Map[String, String] = Map("q104_zorder" -> q104Sql)
}
