package graft.parity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.source.Tables

/** Parity casting (FIXTURES.md §A): replay the reference's sync semantics
  * with parquet standing in for the Blaze source and the PostgreSQL target.
  *
  *  - source snapshot = `lineitem`, keyed
  *    `resource_id := concat(l_orderkey,'-',l_linenumber)`,
  *    `version_id  := floor(l_quantity)`;
  *  - target snapshot = rows with `l_linenumber <= 3` (version bumped by 1
  *    when `l_returnflag='R'` → updates) plus synthetic `-9`-suffixed rows
  *    for every 5th order (ids absent from source → deletes). Rows with
  *    `l_linenumber in 4..7` exist only in source → inserts.
  *
  * `floor` (not a bare cast) keeps Spark and DuckDB identical: Spark casts
  * double→long by truncation, DuckDB by rounding.
  *
  * Each snapshot also carries a synthetic raw-JSON `resource` column shaped
  * like the reference's minimum contract (`{"id":…,"meta":{"versionId":…}}`,
  * reference `src/main.rs:37-46`) so the JSON-extraction path (O2) is
  * exercised on realistic input.
  */
object ParityData {

  /** Mirror of the reference's Blaze-side page stream, post-flatten.
    * The synthetic lineitem is NOT key-unique on (orderkey, linenumber), so
    * the casting aggregates to one version per resource_id — resource ids
    * are unique in the reference's world (`src/main.rs:49-75`). The groupBy
    * is a map-side-combinable hash aggregate: cheap at any scale.
    */
  def source(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.lineitem(spark, dir)).select(
      concat(col("l_orderkey"), lit("-"), col("l_linenumber")).as("resource_id"),
      floor(col("l_quantity")).as("v"))
      .groupBy("resource_id").agg(max(col("v")).as("version_id"))
      // shared by every parity query; plan-keyed cache → one aggregation
      // pass per session (the "materialized snapshot" a real sync keeps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Source with the raw-JSON resource column (for O1/O2/O3 queries).
    * Mimics the reference's wire corpus including its dirt: rows where
    * `l_orderkey % 97 = 0` lack `id`, rows where `l_orderkey % 89 = 0`
    * carry a non-numeric versionId — both invisible to sync in the
    * reference (`src/main.rs:37-46`, skip at `src/main.rs:210-225`).
    */
  def sourceResources(spark: SparkSession, dir: String): DataFrame = {
    val idStr = concat(col("l_orderkey"), lit("-"), col("l_linenumber"))
    val verStr = when(col("l_orderkey") % 89 === 0, lit("x"))
      .otherwise(floor(col("l_quantity")).cast("string"))
    val idPart = when(col("l_orderkey") % 97 === 0, lit(""))
      .otherwise(concat(lit(""""id":""""), idStr, lit("""",""")))
    Tables.spread(Tables.lineitem(spark, dir)).select(
      concat(
        lit("""{"resourceType":"Observation","""), idPart,
        lit(""""meta":{"versionId":""""), verStr,
        lit(""""},"status":""""), col("l_linestatus"), lit(""""}""")
      ).as("resource"))
  }

  /** Mirror of the reference's PG-side snapshot (`pk_id`, id, version). */
  def target(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.spread(Tables.lineitem(spark, dir))
    val existing = li.filter(col("l_linenumber") <= 3).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("pk"),
      concat(col("l_orderkey"), lit("-"), col("l_linenumber")).as("resource_id"),
      (floor(col("l_quantity")) +
        when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("v"))
    val targetOnly = li.filter(col("l_linenumber") === 1 && col("l_orderkey") % 5 === 0)
      .select(
        (col("l_orderkey") * 10 + 9).as("pk"),
        concat(col("l_orderkey"), lit("-"), lit(9)).as("resource_id"),
        lit(1L).as("v"))
    existing.unionAll(targetOnly)
      .groupBy("resource_id")
      .agg(max(col("pk")).as("pk_id"), max(col("v")).as("version_id"))
      .select("pk_id", "resource_id", "version_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** The CTE prelude shared by the parity oracle SQL (DuckDB dialect =
    * ANSI; kept byte-identical across queries so the oracle and the Spark
    * plan diff the same snapshots).
    */
  val srcSql: String =
    """src AS (
      |  SELECT concat(l_orderkey,'-',l_linenumber) AS resource_id,
      |         max(CAST(floor(l_quantity) AS BIGINT)) AS version_id
      |  FROM lineitem GROUP BY 1)""".stripMargin

  val tgtSql: String =
    """tgt AS (
      |  SELECT resource_id, max(pk) AS pk_id, max(v) AS version_id FROM (
      |    SELECT l_orderkey*10+l_linenumber AS pk,
      |           concat(l_orderkey,'-',l_linenumber) AS resource_id,
      |           CAST(floor(l_quantity) AS BIGINT)
      |             + (CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS v
      |    FROM lineitem WHERE l_linenumber<=3
      |    UNION ALL
      |    SELECT l_orderkey*10+9, concat(l_orderkey,'-',9), CAST(1 AS BIGINT)
      |    FROM lineitem WHERE l_linenumber=1 AND l_orderkey%5=0) GROUP BY 1)""".stripMargin

  val resourcesSql: String =
    """res AS (
      |  SELECT concat('{"resourceType":"Observation",',
      |    CASE WHEN l_orderkey%97=0 THEN ''
      |         ELSE concat('"id":"', l_orderkey, '-', l_linenumber, '",') END,
      |    '"meta":{"versionId":"',
      |    CASE WHEN l_orderkey%89=0 THEN 'x'
      |         ELSE CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) END,
      |    '"},"status":"', l_linestatus, '"}') AS resource
      |  FROM lineitem)""".stripMargin
}
