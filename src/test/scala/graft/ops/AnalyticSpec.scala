package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}

/** Plan-shape and semantic invariants for the analytic/corpus widening
  * (q65–q78). Plan assertions pin the scale claims made in the operators'
  * Scaladoc; semantic assertions recompute the answer a second, simpler
  * way on sf0.001.
  */
class AnalyticSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString()

  test("q65 grouping sets and q66 unpivot both plan a single Expand pass") {
    assert(plan("q65_grouping_sets").contains("Expand"),
      "grouping sets should plan one Expand, not a union of group-bys")
    assert(plan("q66_unpivot").contains("Expand"),
      "unpivot should plan one Expand")
  }

  test("q73 bucketed range join plans a broadcast HASH join, never nested-loop") {
    val p = plan("q73_range_bucket_join")
    assert(p.contains("BroadcastHashJoin"), s"expected hash join in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"bucketing must eliminate the nested-loop join:\n$p")
  }

  test("q71 sessionization shuffles once: windows and aggregate share the user_id clustering") {
    val df = SparkEntry.queries("q71_sessionize_gap")(spark, dir)
    df.collect() // finalize adaptive plan
    // AdaptiveSparkPlan prints Final AND Initial plans — count only the final
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    // one exchange for user_id, one for the final orderBy's range partitioning
    val n = "Exchange".r.findAllIn(p).length
    assert(n <= 2, s"expected <=2 exchanges (partition + final sort), got $n in:\n$p")
  }

  test("q91 sequence packing windows stay sharded (no single-partition window)") {
    val df = SparkEntry.queries("q91_sequence_pack")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("SinglePartition"),
      s"packing must shard by lang, not funnel through one partition:\n$p")
    assert(p.contains("hashpartitioning(lang"),
      s"expected the window to cluster on the shard key:\n$p")
  }

  test("q86 scalar subquery decorrelates to one left-outer aggregate join") {
    val p = plan("q86_scalar_subquery")
    assert(p.contains("LeftOuter"),
      s"expected Catalyst to decorrelate the per-row subquery into a left-outer join:\n$p")
  }

  test("q72 keep-best picks the longest doc (lowest doc_id on ties) per digest") {
    val docs = graft.source.Tables.documents(spark, dir)
      .withColumn("digest", md5(col("text")))
      .select("digest", "doc_id", "n_chars").collect()
    val expected = docs.groupBy(_.getString(0)).map { case (dig, rows) =>
      val best = rows.map(r => (r.getLong(2), -r.getLong(1))).max
      dig -> (-best._2, rows.size.toLong, best._1)
    }
    val got = SparkEntry.queries("q72_dedup_keep_best")(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { case Row(dig: String, keep: Long, n: Long, chars: Long) =>
      assert(expected(dig) == ((keep, n, chars)), s"digest $dig")
    }
  }

  test("property: bucket-densified range join equals the theta join for random bands") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      // random non-overlapping bands over the p_size domain [1, 51)
      val cuts = (Seq(0, 51) ++ Seq.fill(3)(rnd.nextInt(50) + 1))
        .distinct.sorted
      val bands = cuts.zip(cuts.tail).zipWithIndex
        .map { case ((lo, hi), i) => (lo, hi, s"b$i") }
      val bandsDf = bands.toDF("lo", "hi", "band")
      val part = graft.source.Tables.part(spark, dir)
      val theta = part.join(bandsDf,
          col("p_size") >= col("lo") && col("p_size") < col("hi"))
        .groupBy("band").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val buckets = bandsDf.select(col("band"),
        explode(sequence(col("lo"), col("hi") - 1)).as("p_size"))
      val equi = part.join(broadcast(buckets), "p_size")
        .groupBy("band").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(equi == theta, s"bands $bands: equi $equi != theta $theta")
    }
  }

  test("q77 salted join result equals the plain join") {
    val plain = graft.source.Tables.lineitem(spark, dir)
      .withColumn("cents", floor(col("l_extendedprice") * 100).cast("long"))
      .join(graft.source.Tables.part(spark, dir),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"), sum("cents").as("sum_cents"))
      .orderBy("p_brand").collect().toSeq
    val salted = SparkEntry.queries("q77_salted_join")(spark, dir).collect().toSeq
    assert(salted == plain, "salting must be semantically invisible")
  }

  test("q78 minhash estimates are exact eighths within [0,1]") {
    val ests = SparkEntry.queries("q78_minhash_est")(spark, dir)
      .select("mh_est").collect().map(_.getDouble(0))
    assert(ests.nonEmpty)
    ests.foreach { e =>
      assert(e >= 0.0 && e <= 1.0 && (e * 8) == math.rint(e * 8),
        s"estimate $e is not k/8")
    }
  }

  test("q76 stratified sample rates stay at or below the stratum target") {
    SparkEntry.queries("q76_stratified_sample")(spark, dir).collect().foreach {
      case Row(lang: String, pct: Int, total: Long, sampled: Long) =>
        assert(sampled <= total, s"$lang sampled>total")
        // digest-mod is uniform: realized rate within 15 points of target
        val rate = 100.0 * sampled / total
        assert(math.abs(rate - pct) < 15, s"$lang realized $rate%% vs target $pct%%")
    }
  }
}
