package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}

/** q186's Bloom pre-pass must (a) return EXACTLY q87's rows — the bloom
  * is a plan-level pre-filter whose false positives the exact anti-join
  * removes and whose false NEGATIVES are impossible by construction
  * (every probe bit of a present key was set at build time) — and
  * (b) actually prune: the maybe-sliver that pays the anti-join must be
  * far smaller than the candidate set, else the fast path is fiction.
  */
class BloomPrefilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q186 returns exactly q87's rows (bloom is result-invisible)") {
    val a = SparkEntry.queries("q87_dedup_incremental")(spark, dir)
      .collect().map(_.toSeq).toSeq
    graft.util.QueryCaches.drain()
    val b = SparkEntry.queries("q186_dedup_bloom")(spark, dir)
      .collect().map(_.toSeq).toSeq
    graft.util.QueryCaches.drain()
    assert(a == b, s"bloom-prefiltered result diverged: ${a.size} vs ${b.size} rows")
  }

  test("the bloom pre-pass clears most candidates without a join") {
    val cand = Corpus.bloomCandidates(spark, dir)
    val n = cand.count()
    val maybe = cand.filter(col("mc")).count()
    graft.util.QueryCaches.drain()
    // sf0.001 has ~50 known digests in a 16384-bit filter: fp rate is
    // well under 1%, so the maybe sliver is duplicates + almost nothing
    assert(n > 0)
    assert(maybe < n / 2,
      s"bloom cleared only ${n - maybe} of $n candidates — no pruning")
  }

  test("a present digest can never be cleared (no false negatives)") {
    // every candidate whose digest IS in the known set must be flagged
    // maybe-present; a false negative would silently re-admit a dup
    val docs = graft.source.Tables.spread(
        graft.source.Tables.documents(spark, dir))
      .withColumn("digest", md5(col("text")))
    val known = docs.filter(col("doc_id") % 2 === 0).select("digest").distinct()
    val missedDups = Corpus.bloomCandidates(spark, dir)
      .filter(!col("mc"))
      .join(known, Seq("digest"), "left_semi")
      .count()
    graft.util.QueryCaches.drain()
    assert(missedDups == 0, s"$missedDups duplicate digests cleared the bloom")
  }
}
