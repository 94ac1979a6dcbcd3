package graft.parity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.diff.Reconcile

/** Parity query suite (SURVEY.md §2.1, q01–q11): the reference's dataflow
  * semantics as declared Spark plans, each with a DuckDB oracle twin.
  */
object ParityQueries {

  private type Q = (SparkSession, String) => DataFrame

  /** q05 — the full-reconciliation diff (O5): full-outer join + 3-way
    * classification. Reference `src/main.rs:159-175,227-248,278-282`.
    */
  private val q05: Q = (s, dir) =>
    Reconcile.classify(ParityData.source(s, dir), ParityData.target(s, dir))
      .orderBy("resource_id")

  private val q05Sql: String =
    s"""WITH ${ParityData.srcSql},
       |${ParityData.tgtSql}
       |SELECT coalesce(s.resource_id, t.resource_id) AS resource_id,
       |       s.version_id AS src_version,
       |       t.version_id AS tgt_version,
       |       CASE WHEN t.resource_id IS NULL THEN 'insert'
       |            WHEN s.resource_id IS NULL THEN 'delete'
       |            WHEN s.version_id <> t.version_id THEN 'update'
       |            ELSE 'noop' END AS action
       |FROM src s FULL OUTER JOIN tgt t ON s.resource_id = t.resource_id
       |ORDER BY resource_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q05_diff_fullouter" -> q05
  )

  val oracle: Map[String, String] = Map(
    "q05_diff_fullouter" -> q05Sql
  )
}
