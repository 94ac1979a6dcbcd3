package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestSession

class SkewAndPropertySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  test("saltedJoin equals the plain join result (hot key included)") {
    val spark2 = spark
    import spark2.implicits._
    // key "hot" dominates: the shape salting exists for
    val left = (Seq.fill(500)("hot") ++ Seq("a", "b", "c"))
      .zipWithIndex.toDF("k", "lv")
    val right = Seq(("hot", 1), ("a", 2), ("z", 9)).toDF("k", "rv")

    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(left, right, "k", buckets = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 501)
  }

  test("AQE splits a skewed sort-merge join partition at runtime (salting's built-in complement)") {
    val spark2 = spark
    import spark2.implicits._
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pad = "x" * 200
      val left = ((1 to 2000).map(i => ("hot", i, pad)) ++
        (1 to 50).map(i => (s"k$i", i, pad))).toDF("k", "lv", "pad")
      val right = ((1 to 10).map(i => ("hot", i)) ++
        (1 to 50).map(i => (s"k$i", i))).toDF("k", "rv")
      val joined = left.join(right, Seq("k"))
      // execute THIS frame (count() would plan a separate query and leave
      // joined's adaptive plan unfinalized)
      assert(joined.collect().length === 2000 * 10 + 50)
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.toLowerCase.contains("skew"),
        s"expected AQE to mark the hot-key join skewed in:\n$p")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedAgg equals the plain aggregation") {
    val spark2 = spark
    import spark2.implicits._
    val df = (Seq.fill(300)(("hot", 2L)) ++ Seq(("a", 5L), ("a", 7L), ("b", 1L)))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedAgg(df, "k", "v", 8, sum, sum)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  // --- dedup kernel properties (driven through the engine's SQL exprs) ---

  private def simhashOf(texts: Seq[String]): Map[String, String] = {
    val spark2 = spark
    import spark2.implicits._
    texts.distinct.toDF("text").selectExpr("text",
      """array_join(transform(sequence(1,16), j ->
        |  IF(aggregate(transform(split(text, ' '), w -> md5(w)), 0, (acc, h) ->
        |       acc + IF(substring(h, j, 1) IN ('8','9','a','b','c','d','e','f'), 1, -1)) > 0,
        |     '1', '0')), '') AS fp""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("property: identical texts always share a simhash; fingerprint is 16 bits") {
    val word = Gen.oneOf("spark", "table", "row", "scan", "agg", "join", "data")
    val textGen = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val batch = Gen.listOfN(5, textGen)
    (0 until 10).foreach { i =>
      val texts = batch(Gen.Parameters.default, Seed(42L + i)).get
      val fps = simhashOf(texts)
      assert(fps.values.forall(fp => fp.length == 16 && fp.forall(c => c == '0' || c == '1')))
      // determinism: recompute equals first compute
      assert(simhashOf(texts) === fps)
    }
  }

  test("property: word-permutation invariance of simhash (bag-of-words op)") {
    val base = "spark table row scan agg join data spark row"
    val perm = "row spark data join agg scan row table spark"
    val fps = simhashOf(Seq(base, perm))
    assert(fps(base) === fps(perm), "simhash votes are order-independent")
  }

  test("property: minhash signature of a doc is stable under shingle duplication") {
    val spark2 = spark
    import spark2.implicits._
    // min over a multiset ignores duplicates: repeating the text's tail
    // cannot change any per-hash minimum that the original already attains
    def sig(text: String): Seq[Long] =
      Seq(text).toDF("text")
        .withColumn("words", split(col("text"), " "))
        .selectExpr(
          """transform(sequence(0,7), j ->
            |  array_min(transform(
            |    transform(
            |      transform(sequence(1, size(words)-2), i ->
            |        element_at(words,i) || ' ' || element_at(words,i+1) || ' ' || element_at(words,i+2)),
            |      s -> CAST(conv(substr(md5(s),1,8),16,10) AS BIGINT) % 2147483647),
            |    u -> ((2*j+3) * u + 7919 * (j+1)) % 2147483647))) AS mh""".stripMargin)
        .collect()(0).getSeq[Long](0)
    val t = "a b c d e f g"
    // extending the doc can only ADD shingles; each per-hash minimum is
    // therefore monotone non-increasing (the containment property LSH
    // banding relies on)
    val ext = t + " e f g"
    val st = sig(t)
    val se = sig(ext)
    st.zip(se).foreach { case (orig, extended) =>
      assert(extended <= orig, s"min must not increase: $extended > $orig")
    }
    // and re-evaluating is deterministic
    assert(sig(ext) === se)
  }
}
