package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-reconciliation diff — the semantic heart of the reference.
  *
  * The reference classifies every source resource against a driver-memory
  * `BTreeMap` snapshot of the target (reference `src/main.rs:159-175`,
  * probe loop `src/main.rs:227-248`, delete sweep `src/main.rs:278-282`):
  *
  *   - in source, not in target            → INSERT
  *   - in both, version differs (`!=`)     → UPDATE   (`src/main.rs:229-231`)
  *   - in both, version equal              → no-op
  *   - in target, not in source            → DELETE
  *
  * Here the same classification is a distributed full-outer equi-join on
  * `resource_id` — no driver-side map, no memory ceiling. At 100 TB this is
  * a shuffle on the join key (or a broadcast if one side is small; AQE
  * decides), and the classification itself is a codegen'd `CASE WHEN`
  * projection on top. The three action sets are then simple filters that
  * Catalyst collapses into the join, or can be produced independently as
  * anti/semi joins (often cheaper when only one class is needed).
  */
object Reconcile {

  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val Noop   = "noop"

  /** Extract (resource_id, version_id) from a raw-JSON `resource` column,
    * mirroring `get_version` (reference `src/main.rs:37-46`): `$.id` as
    * string, `$.meta.versionId` string→long; either missing ⇒ null (the
    * reference's `None`/skip).
    */
  def extractVersion(resource: Column): (Column, Column) = {
    // One from_json parse yields both fields; the two returned Columns share
    // the parse via codegen subexpression elimination (vs. get_json_object
    // per field = one full JSON scan per call per predicate/projection copy).
    // PERMISSIVE mode nulls the struct on malformed JSON — same visibility
    // rule as the reference's serde failure skip (`src/main.rs:210-216`).
    val parsed = from_json(resource,
      org.apache.spark.sql.types.StructType.fromDDL(
        "id STRING, meta STRUCT<versionId: STRING>"))
    (
      parsed.getField("id"),
      // try_cast, not cast: Spark 4 runs ANSI mode, and a malformed
      // versionId must become null (the reference skips the row,
      // `src/main.rs:39-45`), not kill the job.
      parsed.getField("meta").getField("versionId").try_cast("long")
    )
  }

  /** Validity filter: rows missing id or versionId are invisible to sync
    * (reference `src/main.rs:210-225` and `src/main.rs:60-72`).
    */
  def validOnly(df: DataFrame): DataFrame =
    df.filter(col("resource_id").isNotNull && col("version_id").isNotNull)

  /** Classify source vs target. Expects
    * `source(resource_id, version_id, ...)` and
    * `target(resource_id, version_id, ...)`; any extra columns are carried
    * through with `s_`/`t_` disambiguation only where names collide.
    *
    * Returns one row per distinct resource_id on either side with columns
    * `(resource_id, src_version, tgt_version, action)`.
    */
  def classify(source: DataFrame, target: DataFrame): DataFrame = {
    val s = source.select(
      col("resource_id").as("s_id"), col("version_id").as("src_version"))
    val t = target.select(
      col("resource_id").as("t_id"), col("version_id").as("tgt_version"))
    s.join(t, s("s_id") === t("t_id"), "full_outer")
      .select(
        coalesce(col("s_id"), col("t_id")).as("resource_id"),
        col("src_version"),
        col("tgt_version"),
        when(col("t_id").isNull, Insert)
          .when(col("s_id").isNull, Delete)
          .when(col("src_version") =!= col("tgt_version"), Update)
          .otherwise(Noop)
          .as("action"))
  }

  /** Insert set only — a left-anti join (no need to materialize the full
    * outer join when only one class is consumed).
    */
  def inserts(source: DataFrame, target: DataFrame): DataFrame =
    source.join(target.select("resource_id"), Seq("resource_id"), "left_anti")

  /** Update set only — inner join + `!=` version predicate
    * (reference `src/main.rs:229-231`: any mismatch updates, not only newer).
    */
  def updates(source: DataFrame, target: DataFrame): DataFrame = {
    val t = target.withColumnRenamed("version_id", "tgt_version")
    source.join(t, Seq("resource_id"), "inner")
      .filter(col("version_id") =!= col("tgt_version"))
  }

  /** Delete set only — target rows with no source counterpart
    * (the reference's "survivors of the map" sweep, `src/main.rs:278-282`).
    */
  def deletes(source: DataFrame, target: DataFrame): DataFrame =
    target.join(source.select("resource_id"), Seq("resource_id"), "left_anti")
}
