package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.diff.Reconcile
import graft.model.Schemas
import graft.sink.JdbcUpsert
import graft.source.BlazeSource

/** The reference's core dataflow EP3 (`src/main.rs:176-300`) as one Spark
  * DAG per resource type:
  *
  *   source scan → extract(id, version) → validity filter
  *     → full-outer join vs target snapshot → classify
  *     → parallel INSERT / UPDATE / DELETE → count reconciliation
  *
  * vs. the reference: the target snapshot is never collected into driver
  * memory (its BTreeMap, `src/main.rs:49-75`, is the scalability ceiling —
  * SURVEY.md §4), writes are partition-parallel instead of single-writer,
  * and the whole classification happens in one distributed join.
  */
object SyncPipeline {

  final case class SyncResult(resourceType: String, inserts: Long,
                              updates: Long, deletes: Long,
                              sourceTotal: Long, targetAfter: Long) {
    /** O12 count reconciliation (reference `src/main.rs:288-297`). */
    def reconciled: Boolean = sourceTotal == targetAfter
  }

  /** Source relation → (resource, resource_id, version_id), valid rows
    * only (reference `src/main.rs:208-225`).
    */
  def sourceVersions(resources: DataFrame): DataFrame = {
    val (id, ver) = Reconcile.extractVersion(col("resource"))
    Reconcile.validOnly(
      resources.select(col("resource"), id.as("resource_id"), ver.as("version_id")))
  }

  /** One type's sync. `snapshot` is the target's (pk_id, resource_id,
    * version_id) projection (never the JSONB payload — §4); `targetCount`
    * reads the post-write count.
    */
  def syncOne(spark: SparkSession,
              resourceType: String,
              resources: DataFrame,
              snapshot: DataFrame,
              connect: () => (String => Unit, () => Unit),
              targetCount: String => Long,
              batchSize: Int = JdbcUpsert.DefaultBatchSize): SyncResult = {
    val table = Schemas.tableName(resourceType)
    val src = sourceVersions(resources)

    val inserts = Reconcile.inserts(src, snapshot)
    // updates carry the target's pk_id through the inner join
    val updates = Reconcile.updates(src, snapshot)
    val deletes = Reconcile.deletes(src.select("resource_id", "version_id"), snapshot)

    JdbcUpsert.insertPartitions(inserts.select("resource"), table, connect, batchSize)
    JdbcUpsert.updatePartitions(
      updates.select(col("pk_id").cast("int").as("pk_id"), col("resource")),
      table, connect, batchSize)
    JdbcUpsert.deletePartitions(
      deletes.select(col("pk_id").cast("int").as("pk_id")), table, connect, batchSize)

    val srcTotal = src.count()
    SyncResult(resourceType,
      inserts = inserts.count(), updates = updates.count(),
      deletes = deletes.count(), sourceTotal = srcTotal,
      targetAfter = targetCount(table))
  }

  /** All four types sequentially (reference `src/main.rs:319-326`; Spark
    * jobs are internally parallel, so sequential per-type is fine — each
    * sync saturates the cluster).
    */
  def runSync(spark: SparkSession,
              fetch: String => String,
              baseUrl: String,
              pageSize: Int,
              snapshotFor: String => DataFrame,
              connect: () => (String => Unit, () => Unit),
              targetCount: String => Long): Seq[SyncResult] =
    Schemas.resourceTypes.map { t =>
      val resources = BlazeSource.scan(spark, baseUrl, t, pageSize, fetch)
      syncOne(spark, t, resources, snapshotFor(t), connect, targetCount)
    }
}
