package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.VectorCentroid
import graft.ops.Multimodal.MediaMeta

/** Kernel-level tests for the LLM-pipeline operators (the declared queries
  * are oracle-checked end-to-end; these pin the component semantics).
  */
class LlmOpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  test("VectorCentroid averages per group with partial+final merge") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, 20.0f))
    ).toDF("label", "embedding").repartition(3) // force multi-partition merge
    val centroid = udaf(VectorCentroid)
    val rows = df.groupBy("label").agg(centroid(col("embedding")).as("c"))
      .orderBy("label").collect()
    assert(rows(0).getSeq[Double](1) === Seq(2.0, 3.0))
    assert(rows(1).getSeq[Double](1) === Seq(10.0, 20.0))
  }

  test("VectorCentroid merge handles empty partitions (zero buffers)") {
    val spark2 = spark
    import spark2.implicits._
    // 1 row across 8 partitions → 7 empty partial buffers merged in
    val df = Seq((0, Seq(5.0f, 7.0f))).toDF("label", "embedding").repartition(8)
    val centroid = udaf(VectorCentroid)
    val rows = df.groupBy("label").agg(centroid(col("embedding")).as("c")).collect()
    assert(rows(0).getSeq[Double](1) === Seq(5.0, 7.0))
  }

  test("decodeStub is deterministic, partition-parallel, and length-faithful") {
    val spark2 = spark
    import spark2.implicits._
    val payloads = spark.createDataset(Seq(
      (1L, "hello".getBytes("UTF-8")),
      (2L, Array.emptyByteArray),
      (3L, "hello".getBytes("UTF-8")))).repartition(2)
    val metas = Multimodal.decodeStub(payloads).collect().sortBy(_.doc_id)
    assert(metas.map(_.n_bytes).toSeq === Seq(5L, 0L, 5L))
    // identical payloads → identical derived metadata (determinism)
    assert(metas(0).copy(doc_id = 0) === metas(2).copy(doc_id = 0))
    assert(metas.forall(m => m.width >= 0 && m.width < 1024))
    assert(metas.forall(m => Set("jpeg", "png").contains(m.format)))
    // digest matches the JVM reference md5
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(metas(0).digest === expect)
  }

  test("decodeStub metadata matches the q50 SQL expressions bit-for-bit") {
    val spark2 = spark
    import spark2.implicits._
    // Payloads chosen so md5 hex digit 9 covers both digit (0-9) and
    // letter (a-f) cases — char parity vs hex-value parity diverge on a-f.
    val texts = Seq("hello", "world", "spark", "graft", "a", "bb", "ccc", "")
    val payloads = spark.createDataset(texts.zipWithIndex.map {
      case (t, i) => (i.toLong, t.getBytes("UTF-8"))
    })
    val stub = Multimodal.decodeStub(payloads).collect().sortBy(_.doc_id)
    val sql = payloads.toDF("doc_id", "payload")
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        (conv(substring(md5(col("payload")), 1, 4), 16, 10).cast("int") % 1024).as("width"),
        (conv(substring(md5(col("payload")), 5, 4), 16, 10).cast("int") % 1024).as("height"),
        when(expr("conv(substring(md5(payload), 9, 1), 16, 10) % 2 = 0"), "jpeg")
          .otherwise("png").as("format"))
      .as[MediaMeta].collect().sortBy(_.doc_id)
    assert(stub.toSeq === sql.toSeq)
  }

  test("embedStub is deterministic, in [0,1), and consistent with q81's SQL sum") {
    val spark2 = spark
    import spark2.implicits._
    val texts = Seq("hello", "world", "graft", "")
    val payloads = spark.createDataset(texts.zipWithIndex.map {
      case (t, i) => (i.toLong, t.getBytes("UTF-8"))
    }).repartition(2)
    val feats = Multimodal.embedStub(payloads).collect().sortBy(_._1).toSeq
    assert(feats.map(_._2.length).forall(_ == 8))
    assert(feats.flatMap(_._2).forall(f => f >= 0f && f < 1f))
    // determinism across runs
    val again = Multimodal.embedStub(payloads).collect().sortBy(_._1).toSeq
    assert(feats.map(_._2.toSeq) === again.map(_._2.toSeq))
    // the q81 SQL pipeline computes the same dims (compare the exact
    // integer sum: stub floats are the same 32-bit-truncated values)
    val sqlSums = payloads.toDF("doc_id", "payload")
      .select(col("doc_id"), md5(col("payload")).as("digest"))
      .select(col("doc_id"), expr(
        """aggregate(transform(sequence(0, 7), i ->
          |  CAST(conv(substring(md5(concat(digest, cast(i AS string))), 1, 8),
          |       16, 10) AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> acc + x)"""
          .stripMargin).as("fsum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reconstruct each dim's integer from the stub by re-deriving the hash
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]) = { md.reset(); md.digest(b).map("%02x".format(_)).mkString }
    texts.zipWithIndex.foreach { case (t, i) =>
      val digest = hex(t.getBytes("UTF-8"))
      val sum = (0 until 8).map { j =>
        java.lang.Long.parseLong(hex((digest + j).getBytes("UTF-8")).substring(0, 8), 16)
      }.sum
      assert(sqlSums(i.toLong) == sum, s"doc $i: SQL fsum differs from JVM derivation")
    }
  }

  test("simhash bit semantics: single-word doc reproduces its md5 bit pattern") {
    val spark2 = spark
    import spark2.implicits._
    // For a one-word document the vote for each position j is +1 iff the
    // j-th hex digit's high bit is set — so the fingerprint is exactly the
    // high-bit pattern of md5(word).
    val df = Seq((1L, "spark")).toDF("doc_id", "text")
    df.createOrReplaceTempView("one_word")
    val fp = spark.sql(
      """SELECT array_join(transform(sequence(1,16), j ->
        |  IF(aggregate(transform(split(text, ' '), w -> md5(w)), 0, (acc, h) ->
        |       acc + IF(substring(h, j, 1) IN ('8','9','a','b','c','d','e','f'), 1, -1)) > 0,
        |     '1', '0')), '') AS fp FROM one_word""".stripMargin)
      .collect()(0).getString(0)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("spark".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = hex.take(16).map(c => if (Integer.parseInt(c.toString, 16) >= 8) '1' else '0')
    assert(fp === expected.mkString)
  }
}
