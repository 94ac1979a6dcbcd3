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

  test("q140 semdedup: one row per vector, drops happen, first of each cell survives") {
    val out = SparkEntry.queries("q140_semdedup")(spark, dir).collect()
    graft.util.QueryCaches.drain()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.length.toLong == nVecs, "semdedup must classify every vector")
    val dropped = out.count(!_.getBoolean(2))
    assert(dropped > 0, "fixture never exercises the drop path — vacuous")
    assert(dropped < out.length, "semdedup dropped everything")
    // "first seen wins": the earliest vector of a cell has no earlier
    // in-block neighbor, so it can never be dropped
    out.groupBy(_.getLong(1)).foreach { case (cell, rows) =>
      val first = rows.minBy(_.getLong(0))
      assert(first.getBoolean(2), s"cell $cell dropped its earliest vector")
    }
  }

  test("q141 ADC search: 10 ranked rows per query, distance ascending, self excluded") {
    val out = SparkEntry.queries("q141_pq_adc_topk")(spark, dir).collect()
    assert(out.length == 50, s"expected 5 queries x 10 ranks, got ${out.length}")
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to 10), s"query $q rank gap")
      val adcs = byRank.map(_.getLong(2)).toSeq
      assert(adcs == adcs.sorted, s"query $q ADC not ascending: $adcs")
      assert(adcs.forall(_ >= 0L), s"query $q negative squared distance")
      assert(rows.forall(_.getLong(1) != q), s"query $q returned itself")
    }
  }
}
