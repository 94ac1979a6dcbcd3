package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}

/** Closes the IVF training loop behaviorally: q124's Lloyd step feeds
  * q126's quantizer, audited by q127 (recall) and q128 (quantization
  * quality). The monotone guarantee of Lloyd is the OBJECTIVE (q128's
  * avg best-cell cosine), not recall — on a 100-vector fixture a single
  * boundary neighbor can flip a recall sample — so quality is pinned
  * strictly and recall within one neighbor of the seed index. At the
  * driver's verify/bench SFs (0.01 / 0.1) trained recall measured equal
  * to seed (0.92 / 1.0), never below.
  */
class IvfRecallSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def meanRecall(name: String): Double =
    SparkEntry.queries(name)(spark, dir)
      .agg(avg(col("recall"))).head().getDouble(0)

  test("one Lloyd step strictly improves quantization quality (the k-means objective)") {
    val rows = SparkEntry.queries("q128_quantizer_quality")(spark, dir)
      .orderBy("variant").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("seed", "trained"))
    val Array(seed, trained) = rows.map(_.getDouble(1))
    assert(trained > seed,
      s"training did not improve avg best-cell cosine: seed=$seed trained=$trained")
  }

  test("trained-index recall@5 stays within one neighbor of the seed index") {
    val seed = meanRecall("q125_ann_recall")
    val trained = meanRecall("q127_ann_recall_trained")
    assert(seed > 0.0, "seed index found nothing — audit is vacuous")
    // 5 queries x k=5 -> one boundary neighbor moves mean recall by 0.04
    assert(trained >= seed - 0.04 - 1e-9,
      s"trained index recall $trained fell more than one neighbor below seed $seed")
  }

  test("trained quantizer keeps every query answerable (k=5 rows per query)") {
    val rows = SparkEntry.queries("q127_ann_recall_trained")(spark, dir)
      .select("query_id", "k").collect()
    assert(rows.length == 5 && rows.forall(_.getLong(1) == 5L))
  }
}
