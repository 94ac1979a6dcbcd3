package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.TextDedup

/** Continuous near-duplicate ADMISSION: q145's incremental LSH dedup
  * (new×old banding against a persisted corpus index, candidates-only
  * exact-Jaccard verification) run per micro-batch over a document
  * stream — the ingest-time gate that keeps a training corpus near-dup-
  * free continuously instead of re-deduping it nightly.
  *
  * Per micro-batch:
  *  1. MinHash band signatures for the batch (the SAME
  *     [[TextDedup.sigColsFor]] kernel as the batch pipeline, so a doc
  *     admitted by the stream and one admitted by a batch job band
  *     identically);
  *  2. candidates = batch bands ⋈ index bands (new×old only — candidate
  *     volume scales with the batch, never the corpus) PLUS the batch's
  *     internal band self-join (a burst of mirrors inside one batch must
  *     not all pass);
  *  3. exact-Jaccard verification on candidates only; a batch doc is
  *     DROPPED when it verifies ≥ `jaccardMin` against any indexed doc
  *     or any smaller-id batch doc (greedy first-seen-wins by id, q140's
  *     deterministic rule — a chain a~b~c admits only `a`, matching the
  *     keep-min-label convention of q56's clusters);
  *  4. survivors' bands and shingle sets append to the index.
  *
  * State: the index pair (bands, shingle sets) is the SAME relation q145
  * reads ("the persisted corpus signature index") — in production it
  * lives as a bucketed table the stream appends to; here it is threaded
  * functionally so the kernel is testable and the storage choice stays
  * with the caller. Growth is linear in ADMITTED docs (duplicates never
  * enter), and every per-batch join touches the index only through its
  * (b, bh) / doc_id keys. The watermark-bounded exact-dedup stream
  * ([[EventStreams]]) drops verbatim replays cheaply BEFORE this gate;
  * this stage catches what that one structurally cannot: near-misses.
  */
object StreamingLshDedup {

  /** Corpus index: band keys + shingle sets of every admitted doc. */
  final case class Index(bands: DataFrame, sets: DataFrame)

  def emptyIndex(spark: SparkSession): Index = {
    import org.apache.spark.sql.types._
    val bands = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("b", IntegerType), StructField("bh", StringType))))
    val sets = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("sh", ArrayType(StringType)))))
    Index(bands, sets)
  }

  /** One admission step. Returns (admitted docs, dropped evidence pairs,
    * post-batch index). Deterministic: replaying the same batch against
    * the same index admits the same docs (an already-indexed doc_id
    * re-delivered is a verbatim self-match at Jaccard 1.0 and is
    * dropped — idempotent re-ingest).
    */
  def admitBatch(batch: DataFrame, index: Index,
      jaccardMin: Double = 0.5): (DataFrame, DataFrame, Index) = {
    val bBands = TextDedup.bandsFor(batch).persist()
    val bSets = TextDedup.shingleSetsFor(batch).persist()
    // new×old: batch bands against the corpus index
    val candOld = bBands.as("n").join(index.bands.as("o"),
        col("n.b") === col("o.b") && col("n.bh") === col("o.bh"))
      .select(col("n.doc_id").as("doc_a"), col("o.doc_id").as("doc_b"))
      .distinct()
    // new×new: inside the batch, greedy first-seen-wins by id
    val candNew = bBands.as("x").join(bBands.as("y"),
        col("x.b") === col("y.b") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") > col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val dropped =
      TextDedup.jaccardScoredAcross(candOld, bSets, index.sets)
        .filter(col("jaccard") >= jaccardMin)
        .withColumn("matched", lit("corpus"))
        .unionByName(
          TextDedup.jaccardScoredAcross(candNew, bSets, bSets)
            .filter(col("jaccard") >= jaccardMin)
            .withColumn("matched", lit("batch")))
        .persist()
    val admitted = batch.join(
      dropped.select(col("doc_a").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti").persist()
    // Survivors extend the index. The new index rows are MATERIALIZED
    // (eager localCheckpoint) so the returned Index never references this
    // micro-batch's source — a foreachBatch DataFrame is only readable
    // inside its own batch, and the index must outlive it. (Production:
    // append to the index TABLES instead; see the scaladoc.)
    val aBands = bBands.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val aSets = bSets.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    bBands.unpersist()
    bSets.unpersist()
    (admitted, dropped,
      Index(index.bands.unionByName(aBands), index.sets.unionByName(aSets)))
  }

  /** Drive a (doc_id, text) stream through the admission gate.
    * `onBatch` receives (admitted, dropped, batchId) — the production
    * sink writes admitted docs to the corpus and appends the index
    * tables; tests observe both.
    */
  def run(docs: DataFrame, initial: Index,
      onBatch: (DataFrame, DataFrame, Long) => Unit,
      jaccardMin: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // serialized state handoff between micro-batches: foreachBatch runs
    // them strictly in order, so a simple reference is safe here; a
    // production deployment would append to index TABLES instead of
    // holding DataFrames (the state is the data, not driver memory)
    var index = initial
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (admitted, dropped, next) = admitBatch(batch, index, jaccardMin)
        index = next
        onBatch(admitted, dropped, id)
        // per-batch working caches end with the batch
        admitted.unpersist()
        dropped.unpersist()
        ()
      }
      .start()
  }
}
