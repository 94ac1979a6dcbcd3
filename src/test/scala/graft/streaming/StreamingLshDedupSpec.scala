package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Streaming near-dup admission semantics: new×old banding against the
  * carried index, intra-batch greedy dedup, idempotent re-ingest.
  */
class StreamingLshDedupSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def words(prefix: String, n: Int = 20): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  // near-copy: same 20 words except the last — 15 of 18 3-shingles shared
  // (Jaccard 15/21 ≈ 0.71 ≥ 0.5)
  private val textA = words("a")
  private val textANear = ((1 to 19).map(i => s"a$i") :+ "zzz").mkString(" ")
  private val textB = words("b")
  private val textD = words("d")

  test("admitBatch: novel docs pass, corpus near-dups and batch twins drop") {
    val idx0 = StreamingLshDedup.emptyIndex(spark)
    val b1 = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    val (adm1, drop1, idx1) = StreamingLshDedup.admitBatch(b1, idx0)
    assert(adm1.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(drop1.count() === 0L)
    assert(idx1.sets.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))

    // batch 2: near-copy of indexed A, a novel doc, and a verbatim twin
    // of that novel doc inside the same batch
    val b2 = Seq((3L, textANear), (4L, textD), (5L, textD)).toDF("doc_id", "text")
    val (adm2, drop2, idx2) = StreamingLshDedup.admitBatch(b2, idx1)
    assert(adm2.select("doc_id").as[Long].collect().toSeq === Seq(4L))
    val d2 = drop2.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(d2.contains((3L, 1L, "corpus")), "near-copy must name its indexed source")
    assert(d2.contains((5L, 4L, "batch")), "batch twin loses to the smaller id")
    assert(idx2.sets.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 4L), "only survivors enter the index")

    // replaying batch 2 admits nothing: 3 and 5 drop as before, and 4 is
    // now a verbatim self-match against the index — idempotent re-ingest
    val (adm3, drop3, idx3) = StreamingLshDedup.admitBatch(b2, idx2)
    assert(adm3.count() === 0L)
    assert(drop3.filter($"doc_a" === 4L && $"doc_b" === 4L).count() === 1L,
      "re-delivered doc matches itself in the index at Jaccard 1.0")
    assert(idx3.sets.count() === idx2.sets.count())
  }

  test("run: state carries across micro-batches through foreachBatch") {
    val in = MemoryStream[(Long, String)](spark)
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val dropped = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = StreamingLshDedup.run(
      in.toDF().toDF("doc_id", "text"),
      StreamingLshDedup.emptyIndex(spark),
      (adm, drop, _) => {
        admitted ++= adm.select("doc_id").collect().map(_.getLong(0))
        dropped ++= drop.collect().map(r => (r.getLong(0), r.getLong(1)))
      },
      trigger = Trigger.ProcessingTime(0))
    try {
      in.addData((10L, textA), (11L, textB))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq === Seq(10L, 11L))
      // second batch: a near-copy of a FIRST-batch doc must be caught by
      // the carried index, proving state survives the batch boundary
      in.addData((12L, textANear), (13L, textD))
      q.processAllAvailable()
      assert(admitted.sorted.toSeq === Seq(10L, 11L, 13L))
      assert(dropped.toSet === Set((12L, 10L)))
    } finally q.stop()
  }

  test("runDurable: a killed-and-restarted query admits no duplicates " +
       "(index state survives in the bucketed tables)") {
    val store = new StreamingLshDedup.IndexStore(spark, "graft_lsh_idx_spec")
    store.drop() // hermetic: clear any leftovers from a previous run
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val dropped = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    def start(in: MemoryStream[(Long, String)]) = StreamingLshDedup.runDurable(
      in.toDF().toDF("doc_id", "text"), store,
      (adm, drop, _) => {
        admitted ++= adm.select("doc_id").collect().map(_.getLong(0))
        dropped ++= drop.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(3)))
      },
      trigger = Trigger.ProcessingTime(0))
    try {
      val in1 = MemoryStream[(Long, String)](spark)
      val q1 = start(in1)
      in1.addData((20L, textA), (21L, textB))
      q1.processAllAvailable()
      assert(q1.exception.isEmpty, s"q1 failed: ${q1.exception}")
      q1.stop() // kill the query — the in-memory session keeps NOTHING
      assert(admitted.sorted.toSeq === Seq(20L, 21L),
        s"dropped=${dropped.toList} idx=${store.index.sets.count()} " +
        s"recent=${q1.recentProgress.map(_.numInputRows).toList}")

      // restart as a brand-new query: its ONLY state is the persisted
      // index tables. The new source REPLAYS one pre-restart doc
      // verbatim (at-least-once delivery after a crash) alongside a
      // near-copy of a pre-restart admit and one novel doc.
      val in2 = MemoryStream[(Long, String)](spark)
      val q2 = start(in2)
      in2.addData((22L, textANear), (20L, textA), (24L, textD))
      q2.processAllAvailable()
      assert(q2.exception.isEmpty, s"q2 failed: ${q2.exception}")
      q2.stop()
      assert(admitted.sorted.toSeq === Seq(20L, 21L, 24L),
        s"only the novel doc may be admitted after restart; " +
        s"dropped=${dropped.toList} bands=${store.index.bands.count()} " +
        s"sets=${store.index.sets.collect().map(_.getLong(0)).toList}")
      // evidence: the near-copy and the replayed doc both match the
      // PERSISTED index (the replay as a Jaccard-1.0 self-match); the
      // near-copy additionally pairs with the replayed doc INSIDE the
      // batch — both sightings are legitimate evidence rows
      assert(dropped.toSet === Set((22L, 20L, "corpus"), (20L, 20L, "corpus"),
        (22L, 20L, "batch")))
      assert(store.index.sets.select("doc_id").as[Long].collect().sorted
        .toSeq === Seq(20L, 21L, 24L), "index holds exactly the survivors")
    } finally {
      store.drop()
    }
  }
}
