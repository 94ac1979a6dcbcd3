package graft.sink.v2

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sink.JdbcUpsert

/** Executor-side connection factory for the V2 writer: zero-arg-
  * constructible (instantiated by class name on each executor, the
  * [[graft.source.v2.PageFetcher]] pattern). Returns the same
  * `(exec, close)` statement transport the `foreachPartition` sink uses
  * — "BEGIN"/"COMMIT" open and commit the transaction; close without
  * COMMIT must discard it.
  */
trait UpsertConnector extends Serializable {
  def connect(options: Map[String, String]): (String => Unit, () => Unit)
}

/** `java.sql.DriverManager` connector — the production default.
  * BEGIN/COMMIT map to autocommit-off/commit so the transport is
  * driver-portable (PostgreSQL accepts them as statements, embedded
  * engines like Derby do not); close rolls back any open transaction.
  */
class DriverManagerConnector extends UpsertConnector {
  override def connect(options: Map[String, String]): (String => Unit, () => Unit) = {
    val c = java.sql.DriverManager.getConnection(options("url"),
      options.getOrElse("user", ""), options.getOrElse("password", ""))
    val st = c.createStatement()
    val exec: String => Unit = {
      case "BEGIN"  => c.setAutoCommit(false)
      case "COMMIT" => c.commit(); c.setAutoCommit(true)
      case sql      => st.execute(sql); ()
    }
    (exec, () => { if (!c.getAutoCommit) c.rollback(); c.close() })
  }
}

/** DataSource V2 JDBC upsert SINK (`format("graft-jdbc-upsert")`): the
  * declarative write path for the reference's O7 UPDATE / O8 INSERT /
  * O9 DELETE. The input relation is the classified diff itself —
  * `(action, pk_id, resource)` — and each partition's writer applies
  * every action through the [[JdbcUpsert.Dialect]] statement text, one
  * transaction per task attempt, riding Spark's V2 commit protocol:
  * `commit()` flushes tails and commits, `abort()` (task failure /
  * speculation loser) closes without commit so the engine rolls the
  * attempt back — the same attempt-atomicity contract as the
  * `foreachPartition` path, now enforced by the framework rather than a
  * try/finally.
  *
  * Modes: `append` applies the classified actions;
  * `overwrite` (SaveMode.Overwrite → truncate-and-append, via
  * [[SupportsTruncate]]) first issues `DELETE FROM table` once on the
  * driver — the full-reload path when a mirror must be rebuilt from
  * scratch rather than diffed.
  *
  * Options: `table` (required), `dialect` (`postgres` default | `ansi`),
  * `batchsize` (default 10000 = reference `src/main.rs:359`),
  * `connector` (class name, default [[DriverManagerConnector]]) plus
  * whatever the connector reads (`url`, `user`, `password`).
  */
class JdbcUpsertProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-jdbc-upsert"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JdbcUpsertProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new UpsertTable(
      properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

object JdbcUpsertProvider {
  /** The classified-diff relation: `action ∈ {insert, update, delete}`
    * (noop rows should be filtered out before the write — they are
    * accepted and skipped), `pk_id` for update/delete, `resource` for
    * insert/update.
    */
  val schema: StructType = StructType(Seq(
    StructField("action", StringType),
    StructField("pk_id", IntegerType),
    StructField("resource", StringType)))

  def makeConnector(className: String): UpsertConnector =
    Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[UpsertConnector]

  private[v2] def dialectFor(props: Map[String, String]): JdbcUpsert.Dialect =
    props.getOrElse("dialect", "postgres") match {
      case "ansi" => JdbcUpsert.Ansi
      case _      => JdbcUpsert.Postgres
    }
}

private[v2] class UpsertTable(props: Map[String, String])
  extends Table with SupportsWrite {

  override def name(): String = s"jdbc-upsert:${props.getOrElse("table", "?")}"
  override def schema(): StructType = JdbcUpsertProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new UpsertBatchWrite(props, info.schema(), doTruncate)
      }
    }
}

private[v2] class UpsertBatchWrite(props: Map[String, String],
                                   inputSchema: StructType,
                                   doTruncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    if (doTruncate) {
      // once, driver-side, before any task writes (truncate-and-append)
      val (exec, close) = JdbcUpsertProvider
        .makeConnector(props.getOrElse("connector",
          classOf[DriverManagerConnector].getName))
        .connect(props)
      try exec(s"DELETE FROM ${props("table")}") finally close()
    }
    new UpsertDataWriterFactory(props, inputSchema)
  }

  // Attempt atomicity lives in each task's transaction (commit/abort on
  // the writer); there is no cross-task coordinator to run here — the
  // documented at-least-once + reconcile-detect posture of the JDBC sink.
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[v2] case class UpsertCommit(inserts: Long, updates: Long,
                                    deletes: Long) extends WriterCommitMessage

private[v2] class UpsertDataWriterFactory(props: Map[String, String],
                                          inputSchema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new UpsertDataWriter(props, inputSchema)
}

private[v2] class UpsertDataWriter(props: Map[String, String],
                                   inputSchema: StructType)
  extends DataWriter[InternalRow] {

  private val table = props("table")
  private val dialect = JdbcUpsertProvider.dialectFor(props)
  private val batchSize = props.getOrElse("batchsize", "10000").toInt
  private val aIdx = inputSchema.fieldIndex("action")
  private val pIdx = inputSchema.fieldIndex("pk_id")
  private val rIdx = inputSchema.fieldIndex("resource")

  private val ins = ArrayBuffer.empty[String]
  private val upd = ArrayBuffer.empty[(Int, String)]
  private val del = ArrayBuffer.empty[Int]
  private var nIns = 0L; private var nUpd = 0L; private var nDel = 0L

  // connection opened lazily at the first row — an empty partition never
  // touches the database (same contract as transactionalPartition)
  private var conn: Option[(String => Unit, () => Unit)] = None
  private def exec(sql: String): Unit = {
    val c = conn.getOrElse {
      val t = JdbcUpsertProvider.makeConnector(props.getOrElse("connector",
        classOf[DriverManagerConnector].getName)).connect(props)
      t._1("BEGIN")
      conn = Some(t)
      t
    }
    c._1(sql)
  }

  override def write(row: InternalRow): Unit = {
    row.getUTF8String(aIdx).toString match {
      case "insert" =>
        ins += row.getUTF8String(rIdx).toString; nIns += 1
        if (ins.size >= batchSize) { exec(dialect.insertSql(table, ins.toSeq)); ins.clear() }
      case "update" =>
        upd += ((row.getInt(pIdx), row.getUTF8String(rIdx).toString)); nUpd += 1
        if (upd.size >= batchSize) { exec(dialect.updateSql(table, upd.toSeq)); upd.clear() }
      case "delete" =>
        del += row.getInt(pIdx); nDel += 1
        if (del.size >= batchSize) { exec(dialect.deleteSql(table, del.toSeq)); del.clear() }
      case _ => () // noop rows are accepted and skipped
    }
  }

  override def commit(): WriterCommitMessage = {
    if (ins.nonEmpty) { exec(dialect.insertSql(table, ins.toSeq)); ins.clear() }
    if (upd.nonEmpty) { exec(dialect.updateSql(table, upd.toSeq)); upd.clear() }
    if (del.nonEmpty) { exec(dialect.deleteSql(table, del.toSeq)); del.clear() }
    conn.foreach { case (ex, cl) => ex("COMMIT"); cl() }
    conn = None
    UpsertCommit(nIns, nUpd, nDel)
  }

  /** Task failed (or lost speculation): close WITHOUT commit — the open
    * transaction dies with the connection and the engine rolls it back.
    */
  override def abort(): Unit = {
    conn.foreach(_._2())
    conn = None
  }

  override def close(): Unit = {
    conn.foreach(_._2())
    conn = None
  }
}
