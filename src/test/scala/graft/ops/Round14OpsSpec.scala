package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** r14 optimization-round pins.
  *
  * q322's bounded-hybrid split (the boruvkaMsf discipline): below
  * `spark.graft.bpe.localTokenThreshold` the training loop runs in the
  * driver-local kernel, above it the distributed single-action-per-round
  * loop runs. The driver's correctness SFs (0.001/0.01) always take the
  * local path, so the DISTRIBUTED loop would be oracle-untested without
  * these pins: threshold 0 forces it, and its output must be
  * value-identical to the local kernel — on the real sf0.001 corpus and
  * on a crafted pair-exhausting corpus that exercises the NULL-rule
  * no-op rounds both engines must degrade to identically.
  */
class Round14OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val Thresh = "spark.graft.bpe.localTokenThreshold"

  private def runQ322(dir: String): Seq[(Int, String, String,
      java.lang.Long, Long, Long)] = {
    val r = graft.SparkEntry.queries("q322_bpe_train")(spark, dir)
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)),
        r.getLong(4), r.getLong(5))).toSeq
    graft.util.QueryCaches.drain()
    r
  }

  test("q322: distributed loop (threshold 0) ≡ local kernel on sf0.001") {
    val local = runQ322(sfDir)
    assert(local.size === 32)
    spark.conf.set(Thresh, "0")
    try assert(runQ322(sfDir) === local)
    finally spark.conf.unset(Thresh)
  }

  test("q322: NULL-rule no-op rounds identical on both paths") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r14-bpe")
      .toString
    // few distinct A ≠ B pairs: merges exhaust well before the 32-round
    // budget, so most rounds are NULL-rule no-ops on both paths
    Seq((1L, "a b a b"), (2L, "b c"), (3L, "c c c"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val local = runQ322(dir)
    assert(local.size === 32)
    assert(local.exists(_._2 == null),
      "crafted corpus must exhaust its pairs inside the budget")
    // accounting must carry through the no-op rounds unchanged
    val lastReal = local.lastIndexWhere(_._2 != null)
    assert(local.drop(lastReal).map(t => (t._5, t._6)).distinct.size === 1)
    spark.conf.set(Thresh, "0")
    try assert(runQ322(dir) === local)
    finally spark.conf.unset(Thresh)
  }
}
