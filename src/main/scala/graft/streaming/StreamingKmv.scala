package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming KMV (k-minimum-values) distinct-count sketch: q316's
  * fixed-size Beyer et al. SIGMOD'07 summary carried across micro-
  * batches the way [[StreamingLshDedup]] carries its band index — the
  * continuous cardinality monitor a join planner or an admission gate
  * consults without ever re-scanning the accumulated stream.
  *
  * Per micro-batch: hash the batch's keys with the SAME 60-bit md5
  * prefix as the batch-side q316 (a key sketched by the stream and one
  * sketched by a batch job hash identically), then fold into the carried
  * state by union → distinct → K smallest. Because "K smallest distinct
  * hashes" is an idempotent, commutative, associative fold — min-K of a
  * union is the min-K of min-Ks — the carried sketch after any batch
  * split equals the sketch of the concatenated stream; the spec pins
  * this merge associativity with MemoryStream, and the same property is
  * what makes the sketch shard-mergeable on a cluster (one ≤K-row state
  * per shard, merged where needed).
  *
  * State is ≤ K rows (K = 256, ~2 KB), eagerly materialized per batch
  * (Lineage.truncate) so it never references a dead micro-batch source
  * — the same lifetime discipline as the LSH index. The estimator
  * (exact below K; (K−1)·2⁶⁰/h_K at capacity) is q316's, evaluated on
  * demand from the tiny state.
  */
object StreamingKmv {

  val K = 256

  /** The carried state: ≤ K smallest distinct 60-bit key hashes. */
  final case class Sketch(hashes: DataFrame)

  /** q316's 60-bit md5-prefix hash of a BIGINT key column named `key`. */
  private val hashExpr =
    "CAST(conv(substring(md5(CAST(key AS STRING)), 1, 15), 16, 10) AS BIGINT)"

  def emptySketch(spark: SparkSession): Sketch = {
    import org.apache.spark.sql.types._
    Sketch(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("h", LongType)))))
  }

  /** Fold one batch of keys (any relation with a castable `key` column)
    * into the sketch. Deterministic and idempotent: re-delivered keys
    * hash to already-held values and vanish in the distinct.
    */
  def mergeBatch(batch: DataFrame, sk: Sketch): Sketch = {
    val bh = batch.select(col("key").cast("long").as("key")).distinct()
      .select(expr(hashExpr).as("h"))
    Sketch(graft.util.Lineage.truncate(
      sk.hashes.unionByName(bh).distinct().orderBy("h").limit(K)))
  }

  /** Distinct-count estimate from the carried state: one row
    * (k_filled, est) — exact when the stream held fewer than K distinct
    * keys, the (K−1)·2⁶⁰/h_K estimator at capacity (q316's branch pair).
    */
  def estimate(sk: Sketch): DataFrame =
    sk.hashes.agg(count(lit(1)).as("k_filled"), max("h").as("hk"))
      .select(col("k_filled"),
        when(col("k_filled") < K, col("k_filled").cast("double"))
          .otherwise(expr(s"CAST(${K - 1} AS DOUBLE) * " +
            "CAST(1152921504606846976 AS DOUBLE) / CAST(hk AS DOUBLE)"))
          .as("est"))

  /** Drive a streaming relation with a `key` column through the fold.
    * `onBatch` receives (post-batch estimate, batchId). Functional
    * in-memory state — the [[StreamingLshDedup.run]] caveat applies:
    * for restart-safe deployments persist the ≤K-row state per batch
    * instead (it is one tiny table append).
    */
  def run(keys: DataFrame, initial: Sketch,
      onBatch: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    var sk = initial
    state = initial
    keys.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sk = mergeBatch(batch, sk)
        state = sk
        onBatch(estimate(sk), id)
      }
      .start()
  }

  /** Last carried state of the most recent [[run]] — observable hook for
    * the merge-associativity spec (foreachBatch runs batches strictly in
    * order; single-query use only, like the LSH index handoff).
    */
  @volatile private[graft] var state: Sketch = _
}
