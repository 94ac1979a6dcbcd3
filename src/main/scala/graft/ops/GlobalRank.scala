package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking. `row_number() OVER (ORDER BY …)` with no
  * PARTITION BY plans as `Exchange SinglePartition` + one Window — every
  * row of the relation funnels through ONE reducer, the canonical 100 TB
  * scale-killer. This helper produces the IDENTICAL dense 1-based global
  * row number with no single-partition stage:
  *
  *   1. `repartitionByRange(sortCols)` splits the total order into P
  *      contiguous key ranges (RangePartitioning's contract: every key in
  *      partition i sorts strictly before every key in partition i+1);
  *   2. each range ranks locally — a window PARTITIONED BY the physical
  *      partition id, parallel across P reducers;
  *   3. local ranks shift by the running total of earlier partitions'
  *      counts. The per-partition counts are the only driver-side step:
  *      P longs of METADATA (the same scheme `RDD.zipWithIndex` uses),
  *      never row data, and the offset table joins back as a broadcast.
  *
  * The ranged relation is persisted so the count job and the ranking job
  * observe the same partition assignment (and the upstream scan is paid
  * once). `sortCols` must define a TOTAL order (include a unique
  * tiebreak column) — with ties the split across a range boundary would
  * be arbitrary, exactly as `row_number` itself would be.
  */
object GlobalRank {

  def rowNumber(df: DataFrame, rankCol: String, sortCols: Seq[Column],
                numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numParts > 0) numParts
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.util.QueryCaches.tracked(
      df.repartitionByRange(p, sortCols: _*)
        .withColumn("__gr_pid", spark_partition_id()))
    // Metadata-sized action: one (pid, count) pair per non-empty
    // partition. Empty partitions simply contribute no offset rows.
    val counts = ranged.groupBy("__gr_pid").agg(count(lit(1)).as("__gr_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val row = (pid, acc); acc += c; row
    }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("__gr_pid", "__gr_off")
    ranged
      .join(broadcast(offDf), Seq("__gr_pid"))
      .withColumn(rankCol,
        row_number().over(
          Window.partitionBy("__gr_pid").orderBy(sortCols: _*)).cast("long")
          + col("__gr_off"))
      .drop("__gr_pid", "__gr_off")
  }
}
