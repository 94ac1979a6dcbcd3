package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe global ranking. `row_number() OVER (ORDER BY …)` with no
  * PARTITION BY plans as `Exchange SinglePartition` + one Window — every
  * row of the relation funnels through ONE reducer, the canonical 100 TB
  * scale-killer. This helper produces the IDENTICAL dense 1-based global
  * row number with no single-partition stage and NO window at all:
  *
  *   1. `repartitionByRange(sortCols)` splits the total order into P
  *      contiguous key ranges (RangePartitioning's contract: every key in
  *      partition i sorts strictly before every key in partition i+1);
  *   2. `sortWithinPartitions` + a same-stage
  *      `monotonically_increasing_id()` projection assigns each row
  *      `pid·2³³ + indexInPartition` in sorted order — the per-partition
  *      index costs ZERO extra shuffles (the sort and the projection run
  *      in one stage on the range exchange's output);
  *   3. local indices shift by the running total of earlier partitions'
  *      counts. The per-partition counts are the only driver-side step:
  *      P longs of METADATA (the same scheme `RDD.zipWithIndex` uses),
  *      never row data, and the offset table joins back as a broadcast.
  *
  * The (ranged, sorted, id-stamped) relation is persisted so the count
  * job and the ranking job observe one frozen assignment (and the
  * upstream scan is paid once). `sortCols` must define a TOTAL order
  * (include a unique tiebreak column) — with ties the split across a
  * range boundary would be arbitrary, exactly as `row_number` itself
  * would be. Partitions are capped at 2³³ rows by the id encoding —
  * ~8.6 G rows per range, far above any sane partition sizing.
  */
object GlobalRank {

  def rowNumber(df: DataFrame, rankCol: String, sortCols: Seq[Column],
                numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numParts > 0) numParts
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.util.QueryCaches.tracked(
      df.repartitionByRange(p, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("__gr_mid", monotonically_increasing_id()))
    // Metadata-sized action: one (pid, count) pair per non-empty
    // partition. Empty partitions simply contribute no offset rows.
    val counts = ranged
      .groupBy(shiftright(col("__gr_mid"), 33).as("__gr_pid"))
      .agg(count(lit(1)).as("__gr_cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val row = (pid, acc); acc += c; row
    }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("__gr_pid", "__gr_off")
    ranged
      .withColumn("__gr_pid", shiftright(col("__gr_mid"), 33))
      .join(broadcast(offDf), Seq("__gr_pid"))
      .withColumn(rankCol,
        col("__gr_off") + (col("__gr_mid") bitwiseAND ((1L << 33) - 1)) + 1L)
      .drop("__gr_pid", "__gr_off", "__gr_mid")
  }

  /** Scale-safe global EXCLUSIVE prefix max: for each row, the max of
    * `value` over all rows strictly earlier in the `sortCols` total
    * order — exactly `MAX(v) OVER (ORDER BY … ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` including its null-for-first-row
    * semantics, with no single-partition stage. Decomposition mirrors
    * [[prefixSum]]: range-partition the total order, take the exclusive
    * running max within each range (a window partitioned by the range
    * id — bounded groups), and combine with the running max of EARLIER
    * ranges' totals, which is P longs of driver metadata broadcast
    * back. `value` is cast to long (exact comparisons; no float ties).
    * Null values are ignored by both the local window max and the
    * per-range totals, matching the window form.
    */
  def prefixMax(df: DataFrame, outCol: String, value: Column,
                sortCols: Seq[Column], numParts: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = if (numParts > 0) numParts
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // The long cast is EXACT only for integral inputs; a fractional
    // DOUBLE would silently truncate maxima away from the window form
    // this decomposes, so reject it loudly at plan time.
    val vType = df.select(value.as("__gr_probe")).schema.head.dataType
    require(Seq("byte", "short", "integer", "long").contains(vType.typeName),
      s"prefixMax requires an integral value column (exact long compare); " +
        s"got ${vType.typeName} — quantize to BIGINT first (MomentGuard " +
        s"discipline) if the source is fractional")
    val ranged = graft.util.QueryCaches.tracked(
      df.repartitionByRange(p, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("__gr_v", value.cast("long"))
        .withColumn("__gr_mid", monotonically_increasing_id()))
    // Metadata-sized action: one (pid, max) pair per non-empty range.
    // A range whose values are all null yields a null max — carried as
    // None so it contributes nothing to later ranges' offsets.
    val totals = ranged
      .groupBy(shiftright(col("__gr_mid"), 33).as("__gr_pid"))
      .agg(max("__gr_v").as("__gr_max"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    var acc: Option[Long] = None
    val offsets = totals.map { case (pid, m) =>
      val row = (pid, acc)
      acc = (acc, m) match {
        case (Some(a), Some(b)) => Some(math.max(a, b))
        case (a, b) => a.orElse(b)
      }
      row
    }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("__gr_pid", "__gr_off")
    val win = Window.partitionBy("__gr_pid").orderBy("__gr_mid")
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__gr_pid", shiftright(col("__gr_mid"), 33))
      .join(broadcast(offDf), Seq("__gr_pid"))
      .withColumn("__gr_loc", max(col("__gr_v")).over(win))
      .withColumn(outCol,
        when(col("__gr_off").isNull, col("__gr_loc"))
          .when(col("__gr_loc").isNull, col("__gr_off"))
          .otherwise(greatest(col("__gr_off"), col("__gr_loc"))))
      .drop("__gr_pid", "__gr_off", "__gr_mid", "__gr_v", "__gr_loc")
  }

  /** Scale-safe global EXCLUSIVE prefix sum: for each row, the sum of
    * `weight` over all rows strictly earlier in the `sortCols` total
    * order — exactly `SUM(w) OVER (ORDER BY … ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` (null frame ≡ 0), with no
    * single-partition stage. Same decomposition as [[rowNumber]]:
    * range-partition the total order, stamp partition-local positions,
    * shift by broadcast per-range cumulative totals (P longs of driver
    * metadata). The only window in the plan partitions by the RANGE id —
    * P groups of ~n/P rows each, the bounded-partition window shape, so
    * its hash exchange scales like any groupBy; no `Exchange
    * SinglePartition` may appear.
    *
    * `weight` must be integral (it is cast to long): exact BIGINT
    * accumulation is what keeps a 100 TB prefix sum bit-identical to a
    * single-node oracle — float prefix sums are order-sensitive in the
    * last ulp. A null weight counts as 0 (coalesced before accumulation,
    * so neither the driver-side offset read nor the window sum can see a
    * null). `sortCols` must be a total order, as in [[rowNumber]].
    */
  def prefixSum(df: DataFrame, outCol: String, weight: Column,
                sortCols: Seq[Column], numParts: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = if (numParts > 0) numParts
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = graft.util.QueryCaches.tracked(
      df.repartitionByRange(p, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("__gr_w", coalesce(weight.cast("long"), lit(0L)))
        .withColumn("__gr_mid", monotonically_increasing_id()))
    // Metadata-sized action: one (pid, total) pair per non-empty range.
    val totals = ranged
      .groupBy(shiftright(col("__gr_mid"), 33).as("__gr_pid"))
      .agg(sum("__gr_w").as("__gr_tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val row = (pid, acc); acc += t; row
    }.toSeq
    import spark.implicits._
    val offDf = offsets.toDF("__gr_pid", "__gr_off")
    val win = Window.partitionBy("__gr_pid").orderBy("__gr_mid")
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__gr_pid", shiftright(col("__gr_mid"), 33))
      .join(broadcast(offDf), Seq("__gr_pid"))
      .withColumn(outCol,
        col("__gr_off") + coalesce(sum(col("__gr_w")).over(win), lit(0L)))
      .drop("__gr_pid", "__gr_off", "__gr_mid", "__gr_w")
  }
}
