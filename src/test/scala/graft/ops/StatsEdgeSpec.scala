package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Degenerate-corpus edges of the Stats family. */
class StatsEdgeSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  test("q245 emits one defined k=0 row when the corpus has fewer than 101 docs") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tiny").toString
    (0 until 50).map { i =>
      (i.toLong, s"doc $i text", "en", "tiny", (10L + i))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q245_hill_tail")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    assert(rows.length === 1, "one row, not an empty (failed-looking) result")
    val r = rows(0)
    assert(r.getLong(r.fieldIndex("k")) === 0L)
    assert(r.getLong(r.fieldIndex("x_ref")) === 0L)
    assert(r.getDouble(r.fieldIndex("mean_log2_ratio")) === 0.0)
    assert(r.getDouble(r.fieldIndex("alpha_hat")) === 0.0)
  }
}
