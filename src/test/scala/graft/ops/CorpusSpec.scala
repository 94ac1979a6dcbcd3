package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}
import graft.source.Tables

/** Semantic invariants for the corpus suite, recomputed a second way on
  * sf0.001 — complements the DuckDB oracle (which pins VALUES) by pinning
  * the PROPERTIES the operators promise.
  */
class CorpusSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q91 chunks respect the token budget (only a chunk's last doc may cross it)") {
    // within (lang, chunk): sum of tokens minus the final doc must be
    // under budget — that's exactly the concatenate-then-chunk rule
    val docs = Tables.documents(spark, dir)
      .withColumn("tokens", size(split(col("text"), " ")))
      .select("lang", "doc_id", "tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byLang = docs.groupBy(_._1)
    byLang.foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_._2).foreach { case (_, _, tok) =>
        val chunk = (run /* pre-doc running total */) / 2000
        val chunkStart = chunk * 2000
        // doc starts inside its chunk: pre-doc total within [start, start+2000)
        assert(run >= chunkStart && run < chunkStart + 2000)
        run += tok
      }
    }
    // and the declared aggregate reproduces the same chunk populations
    val agg = SparkEntry.queries("q91_sequence_pack")(spark, dir)
      .collect().map { case Row(l: String, c: Long, n: Long, t: Long) => ((l, c), (n, t)) }.toMap
    val expected = byLang.toSeq.flatMap { case (l, rows) =>
      var run = 0L
      rows.sortBy(_._2).toSeq.map { case (_, _, tok) =>
        val chunk = run / 2000; run += tok; ((l, chunk), (1L, tok.toLong))
      }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.map(_._2._1).sum, vs.map(_._2._2).sum)) }
    assert(agg == expected)
  }

  test("q92 keeps a superset-free sample: kept counts bounded and monotone in weight") {
    SparkEntry.queries("q92_weighted_sample")(spark, dir).collect().foreach {
      case Row(_: String, total: Long, kept: Long, keptChars: Long) =>
        assert(kept <= total)
        assert(keptChars >= 0L)
    }
  }

  test("q88 equi-depth buckets hold ~25% of docs each and tile the length domain") {
    val rows = SparkEntry.queries("q88_equidepth_buckets")(spark, dir)
      .collect().map { case Row(b: Int, n: Long, lo: Long, hi: Long) => (b, n, lo, hi) }
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3))
    val total = rows.map(_._2).sum
    rows.foreach { case (b, n, _, _) =>
      assert(math.abs(n.toDouble / total - 0.25) < 0.10,
        s"bucket $b holds ${n.toDouble / total} of docs — not equi-depth")
    }
    // buckets tile: each bucket's min is above the previous bucket's max
    rows.sliding(2).foreach {
      case Array((_, _, _, hi0), (_, _, lo1, _)) => assert(lo1 >= hi0 - 1)
      case _ =>
    }
  }

  test("q157 epoch plan conserves the 2x budget up to per-source floors; caps at 4 epochs") {
    val rows = SparkEntry.queries("q157_epoch_plan")(spark, dir).collect()
    assert(rows.nonEmpty)
    val totChars = rows.map(_.getLong(1)).sum
    val sumTarget = rows.map(_.getLong(2)).sum
    // each per-source target floors once, so the total budget is met to
    // within one token per source
    assert(sumTarget <= 2L * totChars && sumTarget >= 2L * totChars - rows.length,
      s"sum(target)=$sumTarget vs budget ${2L * totChars}")
    rows.foreach { r =>
      val (chars, target, served, epochs, deficit) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))
      assert(served === math.min(target, 4L * chars))
      assert(deficit === target - served && deficit >= 0L)
      assert(epochs <= 4.0 && epochs === served.toDouble / chars)
    }
  }
}
