package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Streaming KMV semantics: the min-K fold is associative/idempotent
  * (so any batch split yields the batch-built sketch), the estimator is
  * exact below capacity, and foreachBatch carries the state.
  */
class StreamingKmvSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def hashesOf(sk: StreamingKmv.Sketch): Set[Long] =
    sk.hashes.collect().map(_.getLong(0)).toSet

  private def fold(batches: Seq[Seq[Long]]): StreamingKmv.Sketch =
    batches.foldLeft(StreamingKmv.emptySketch(spark)) { (sk, b) =>
      StreamingKmv.mergeBatch(b.toDF("key"), sk)
    }

  test("mergeBatch: min-K fold is associative, order-independent, idempotent") {
    val b1 = (1L to 300L).toSeq
    val b2 = (200L to 500L).toSeq   // overlaps b1
    val b3 = Seq(7L, 9000L, 9001L)  // 7 repeats b1
    val oneShot = fold(Seq(b1 ++ b2 ++ b3))
    val folded = fold(Seq(b1, b2, b3))
    val reordered = fold(Seq(b3, b1, b2))
    val replayed = fold(Seq(b1, b2, b3, b2))
    assert(hashesOf(folded) === hashesOf(oneShot))
    assert(hashesOf(reordered) === hashesOf(oneShot))
    assert(hashesOf(replayed) === hashesOf(oneShot))
    // 502 distinct keys > K: the sketch sits exactly at capacity
    assert(hashesOf(oneShot).size === StreamingKmv.K)
  }

  test("estimate: exact below capacity, calibrated at capacity") {
    val small = fold(Seq((1L to 100L).toSeq))
    val rs = StreamingKmv.estimate(small).collect()(0)
    assert(rs.getLong(0) === 100L)
    assert(rs.getDouble(1) === 100.0, "below K the sketch IS the key set")
    val big = fold(Seq((1L to 5000L).toSeq))
    val rb = StreamingKmv.estimate(big).collect()(0)
    assert(rb.getLong(0) === StreamingKmv.K.toLong)
    // deterministic md5 draw; KMV stderr ~ 1/sqrt(K-1) = 6.3%
    assert(math.abs(rb.getDouble(1) - 5000.0) / 5000.0 < 0.25,
      s"estimate ${rb.getDouble(1)} too far from 5000")
  }

  test("run: state carried across micro-batches equals the batch-built sketch") {
    val in = MemoryStream[Long](spark)
    val ests = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val q = StreamingKmv.run(
      in.toDF().withColumnRenamed("value", "key"),
      StreamingKmv.emptySketch(spark),
      (est, _) => {
        val r = est.collect()(0)
        ests += ((r.getLong(0), r.getDouble(1)))
      },
      trigger = Trigger.ProcessingTime(0))
    try {
      in.addData(1L to 100L: _*)
      q.processAllAvailable()
      in.addData(50L to 150L: _*)
      q.processAllAvailable()
      in.addData(200L to 220L: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(ests.last._1 === 171L, "1..150 plus 200..220 distinct keys")
    assert(ests.last._2 === 171.0)
    assert(ests.map(_._1).toSeq === ests.map(_._1).sorted.toSeq,
      "fill level never shrinks across batches")
    val direct = fold(Seq(((1L to 150L) ++ (200L to 220L)).toSeq))
    assert(hashesOf(StreamingKmv.state) === hashesOf(direct),
      "carried state must equal the sketch of the concatenated stream")
  }
}
