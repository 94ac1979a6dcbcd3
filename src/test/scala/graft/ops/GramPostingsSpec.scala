package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The corpus-wide postings table: content must be exactly the distinct
  * 13-gram postings the per-query kernel computes, the layout must be
  * bucketed+sorted on gram, and repeat calls must serve the same table
  * without rebuilding.
  */
class GramPostingsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("postings table content equals the direct distinct gram relation") {
    val fromTable = GramPostings.postings13(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = CorpusPrep.hashedGrams(
        graft.source.Tables.spread(graft.source.Tables.documents(spark, dir)),
        k = 13)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromTable === direct)
    assert(fromTable.nonEmpty)
  }

  test("table is bucketed and sorted on gram; repeat calls reuse it") {
    val df = GramPostings.postings13(spark, dir)
    val tbl = df.queryExecution.analyzed.collectLeaves().head.toString()
    assert(tbl.contains("graft_postings13"), s"expected the table scan in $tbl")
    // Derive the table name from THIS query's own scan — other suites
    // (SkewStressSpec's fixture corpus) legitimately register postings
    // tables for other dirs in the same JVM, so a listTables().head pick
    // is order-dependent across a full suite run.
    val name = "graft_postings13_[0-9a-f]+".r.findFirstIn(tbl)
      .getOrElse(fail(s"no postings table name in $tbl"))
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name))
    assert(meta.bucketSpec.isDefined, "table must carry a bucket spec")
    assert(meta.bucketSpec.get.bucketColumnNames === Seq("gram"))
    assert(meta.bucketSpec.get.sortColumnNames === Seq("gram"))
    // second call: same catalog table (the per-JVM registry), no rebuild
    val again = GramPostings.postings13(spark, dir)
    assert(again.queryExecution.analyzed.collectLeaves().head.toString()
      .contains(name))
  }
}
