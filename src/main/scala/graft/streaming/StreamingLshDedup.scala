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
    val (admitted, dropped, aBands, aSets) = admitCore(batch, index, jaccardMin)
    (admitted, dropped,
      Index(index.bands.unionByName(aBands), index.sets.unionByName(aSets)))
  }

  /** [[admitBatch]]'s core, exposing the index DELTA (the admitted docs'
    * bands/sets) instead of the unioned index — what a durable store
    * APPENDS ([[IndexStore]]) and what the functional path unions.
    */
  private def admitCore(batch: DataFrame, index: Index,
      jaccardMin: Double): (DataFrame, DataFrame, DataFrame, DataFrame) = {
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
    val aBands = graft.util.Lineage.truncate(
      bBands.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi"))
    val aSets = graft.util.Lineage.truncate(
      bSets.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi"))
    bBands.unpersist()
    bSets.unpersist()
    (admitted, dropped, aBands, aSets)
  }

  /** Drive a (doc_id, text) stream through the admission gate with
    * FUNCTIONAL (in-memory) index state. `onBatch` receives
    * (admitted, dropped, batchId).
    *
    * NOT restart-safe: the accumulated index lives in this JVM and dies
    * with the query, while a checkpointed source would resume offsets
    * PAST already-admitted docs — a restarted query starting from the
    * caller's `initial` index would silently re-admit near-dups. Use
    * [[runDurable]] with an [[IndexStore]] for any checkpointed /
    * restartable deployment; this mode is for tests and one-shot
    * (AvailableNow) backfills.
    */
  def run(docs: DataFrame, initial: Index,
      onBatch: (DataFrame, DataFrame, Long) => Unit,
      jaccardMin: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // serialized state handoff between micro-batches: foreachBatch runs
    // them strictly in order, so a simple reference is safe here
    var index = initial
    var sinceCollapse = 0
    docs.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (admitted, dropped, next) = admitBatch(batch, index, jaccardMin)
        // the index otherwise grows one unionByName LAYER per batch:
        // analysis cost and lineage depth rise linearly with batch count
        // on a long-running stream. Collapse the union chain every few
        // batches — localCheckpoint materializes the accumulated index
        // into one flat scan.
        sinceCollapse += 1
        index = if (sinceCollapse >= 8) {
          sinceCollapse = 0
          Index(graft.util.Lineage.truncate(next.bands),
            graft.util.Lineage.truncate(next.sets))
        } else next
        onBatch(admitted, dropped, id)
        // per-batch working caches end with the batch
        admitted.unpersist()
        dropped.unpersist()
        ()
      }
      .start()
  }

  /** Durable corpus signature index: the band/shingle relations persisted
    * as a pair of bucketed catalog tables the stream APPENDS to — q145's
    * "persisted corpus signature index" made concrete. Because the state
    * IS the tables (not driver memory), a killed-and-restarted query
    * resumes admission against everything previously admitted: no
    * duplicate admission across restarts (proven in
    * StreamingLshDedupSpec's kill/restart test). Bands bucket on the
    * band-hash join key, sets on doc_id, so the per-batch new×old join
    * and the verification lookups read bucket-aligned files.
    */
  final class IndexStore(spark: SparkSession, prefix: String,
      buckets: Int = 8) {
    val bandsTable: String = s"${prefix}_bands"
    val setsTable: String = s"${prefix}_sets"

    private def write(df: DataFrame, table: String, key: String,
        mode: String): Unit =
      df.write.mode(mode).format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(table)

    /** Create both tables empty if absent. A stale on-disk location with
      * no catalog entry (a previous JVM's warehouse leftovers) is
      * removed — adopting it silently would resurrect an index whose
      * corpus this query never saw.
      */
    def init(): Unit =
      Seq((bandsTable, "bh", (i: Index) => i.bands),
          (setsTable, "doc_id", (i: Index) => i.sets)).foreach {
        case (t, key, sel) =>
          if (!spark.catalog.tableExists(t)) {
            val loc = new org.apache.hadoop.fs.Path(
              spark.conf.get("spark.sql.warehouse.dir"), t)
            val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (fs.exists(loc)) fs.delete(loc, true)
            write(sel(emptyIndex(spark)), t, key, "errorifexists")
          }
      }

    def index: Index = {
      // appends land through foreachBatch's CLONED session, which
      // invalidates the clone's relation cache but not this session's —
      // without an explicit refresh this session would keep serving the
      // stale (initially empty) file listing forever
      spark.catalog.refreshTable(bandsTable)
      spark.catalog.refreshTable(setsTable)
      Index(spark.table(bandsTable), spark.table(setsTable))
    }

    private[streaming] def append(bands: DataFrame, sets: DataFrame): Unit = {
      write(bands, bandsTable, "bh", "append")
      write(sets, setsTable, "doc_id", "append")
    }

    def drop(): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $bandsTable")
      spark.sql(s"DROP TABLE IF EXISTS $setsTable")
    }
  }

  /** Restart-durable admission: per micro-batch, admit against the
    * CURRENT persisted index tables and append the survivors' signatures
    * back — state survives the query, the session, and the JVM. Pair
    * with a `checkpointLocation` so the source resumes exactly where it
    * stopped; a batch replayed after a crash re-admits nothing (every
    * previously-admitted doc self-matches at Jaccard 1.0), so the gate
    * stays idempotent under at-least-once delivery.
    */
  def runDurable(docs: DataFrame, store: IndexStore,
      onBatch: (DataFrame, DataFrame, Long) => Unit,
      jaccardMin: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpointDir: Option[String] = None): StreamingQuery = {
    store.init()
    val base = docs.writeStream.trigger(trigger).outputMode("append")
    checkpointDir.fold(base)(d => base.option("checkpointLocation", d))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val (admitted0, dropped0, aBands, aSets) =
          admitCore(batch, store.index, jaccardMin)
        // store.index is a LAZY table reference: everything derived from
        // it must be MATERIALIZED (lineage severed) before the append
        // below mutates the tables, or the sink-side collect would
        // re-join the batch against its own freshly-appended signatures
        // and drop every doc as a self-match. aBands/aSets are already
        // eager localCheckpoints (admitCore); do the same for the two
        // caller-visible outputs.
        val admitted = graft.util.Lineage.truncate(admitted0)
        val dropped = graft.util.Lineage.truncate(dropped0)
        admitted0.unpersist()
        dropped0.unpersist()
        // append BEFORE the user sink sees the batch: if the job dies
        // between the two, the replayed batch re-verifies against an
        // index that already holds these docs and re-emits nothing
        // twice — no duplicate admission under at-least-once delivery.
        store.append(aBands, aSets)
        onBatch(admitted, dropped, id)
        ()
      }
      .start()
  }
}
