package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Crafted/closed-form semantics for the round-11 additions. For the
  * ranking-eval pair (q296 nDCG, q297 MRR/recall) the strongest pin is a
  * REFERENCE REIMPLEMENTATION: collect the (tiny) shared retrieval
  * relations at sf0.001 and recompute both metrics in plain Scala — with
  * the ideal list built by an explicit sort, NOT the production
  * closed-form IDCG — then require exact agreement. That proves the
  * closed-form-counts IDCG equals sort-based IDCG on real data and that
  * the integer discount table is applied at the right ranks.
  */
class Round11OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q296 nDCG discount constants are floor(1e9/log2(i+1)); cum table is its prefix sum") {
    val expected = (1 to 10).map(i =>
      math.floor(1e9 / (math.log(i + 1) / math.log(2))).toLong)
    assert(Retrieval.NdcgDisc === expected)
    assert(Retrieval.NdcgCum === Retrieval.NdcgDisc.scanLeft(0L)(_ + _))
  }

  test("q296 equals a sort-based Scala reimplementation at sf0.001") {
    val lex = Retrieval.lexicalTop(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val fused = Retrieval.rrfFused(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val grade: ((Long, Long)) => Long = { case (q, d) =>
      lex.find(x => x._1 == q && x._2 == d).map(_._3) match {
        case Some(rl) if rl <= 3  => 3L
        case Some(rl) if rl <= 10 => 2L
        case Some(_)              => 1L
        case None                 => 0L
      }
    }
    val disc = Retrieval.NdcgDisc
    val expected = fused.groupBy(_._1).map { case (q, rows) =>
      val dcg = rows.map { case (_, rank, d) => grade((q, d)) * disc(rank - 1) }.sum
      // ideal by EXPLICIT sort of this query's grade multiset
      val grades = lex.filter(_._1 == q).map(x => grade((q, x._2)))
        .sorted(Ordering[Long].reverse).take(10)
      val idcg = grades.zipWithIndex.map { case (g, i) => g * disc(i) }.sum
      q -> ((dcg, idcg,
        BigDecimal(dcg.toDouble / idcg.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = graft.SparkEntry.queries("q296_ndcg_fused")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (q, (dcg, idcg, ndcg)) =>
      assert(got(q)._1 === dcg, s"dcg for query $q")
      assert(got(q)._2 === idcg, s"idcg for query $q")
      assert(math.abs(got(q)._3 - ndcg) < 1e-9, s"ndcg for query $q")
    }
    graft.util.QueryCaches.drain()
  }

  private def docsDir(docs: Seq[(Long, String)]): String = {
    val spark2 = spark
    import spark2.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-r11-docs").toString
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q298 span dedup: island merge, two separated spans, coverage ratios") {
    val d = docsDir(Seq(
      1L -> "a b c d e f g h i j",                    // starts 1,2,3 dup -> span [1,7]
      2L -> "x1 x2 a b c d e f g y z w",              // starts 3,4,5 dup -> span [3,9]
      3L -> "p q r s t u v",                          // no cross-doc 5-gram
      4L -> "a b c d e u1 u2 u3 u4 u5 u6 c d e f g")) // starts 1 and 12: gap>5 -> 2 spans
    val got = graft.SparkEntry.queries("q298_span_dedup")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === Set(1L, 2L, 4L)) // doc 3 has no duplicated span
    assert(got(1L) === ((10L, 1L, 7L, 7L, 0.7)))
    assert(got(2L) === ((12L, 1L, 7L, 7L, 0.583333)))
    assert(got(4L) === ((16L, 2L, 10L, 5L, 0.625)))
    graft.util.QueryCaches.drain()
  }

  test("q299 prefix filter is EXACT: equals brute-force all-pairs J>=0.8 at sf0.001") {
    val sets = TextDedup.shingleSetsFor(
      graft.source.Tables.documents(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty).sortBy(_._1)
    val brute = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (da, sa) = sets(i); (db, sb) = sets(j)
      inter = (sa & sb).size
      if 5L * inter >= 4L * (sa.size + sb.size - inter)
    } yield (da, db)).toSet
    val got = graft.SparkEntry.queries("q299_prefix_filter_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture should contain at least one J>=0.8 pair")
    graft.util.QueryCaches.drain()
  }

  test("q300 splits partition the corpus, zero leaked pairs, assignment matches reference") {
    val got = graft.SparkEntry.queries("q300_leakage_free_split")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.values.forall(_._4 == 0L), "leaked near-dup pairs must be zero")
    // reference reimplementation: cluster id from q56 (self for singletons),
    // split from the 60-bit md5 prefix of the cluster id, mod 10
    val clusters = graft.SparkEntry.queries("q56_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.source.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def split(cid: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(cid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (BigInt(hex, 16) % 10).toInt match {
        case b if b < 8 => "train"; case 8 => "val"; case _ => "test"
      }
    }
    val expected = docs.groupBy { case (id, _) => split(clusters.getOrElse(id, id)) }
      .map { case (sp, rows) =>
        sp -> ((rows.length.toLong,
          rows.map(r => clusters.getOrElse(r._1, r._1)).distinct.length.toLong,
          rows.map(_._2).sum, 0L)) }
    assert(got === expected)
    assert(got.values.map(_._1).sum === docs.length.toLong)
    graft.util.QueryCaches.drain()
  }

  // Scala reference of q301's chunker: break BEFORE 1-based token i (i>=2)
  // iff the 60-bit md5 prefix of the 3-gram starting at i is = 0 mod 16.
  private def cdcChunks(words: Seq[String]): Seq[Seq[String]] = {
    def h60(sIdx: Int): Long = {
      val gram = words.slice(sIdx - 1, sIdx + 2).mkString(" ")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(hex.substring(0, 15), 16).toLong
    }
    val n = words.length
    val bpos = if (n < 4) Seq() else (2 to n - 2).filter(i => h60(i) % 16 == 0)
    val starts = 1 +: bpos
    starts.zipWithIndex.map { case (st, j) =>
      val end = if (j + 1 < starts.length) starts(j + 1) - 1 else n
      words.slice(st - 1, end)
    }
  }

  test("q301 CDC chunking: re-alignment after insertion; aggregates match reference") {
    val base = (1 to 200).map(i => "w" + (i * 7919 % 997))
    val shifted = Seq("junk1", "junk2", "junk3") ++ base
    assert(cdcChunks(base).length > 2, "fixture must contain boundaries")
    // the CDC property: a head insertion re-aligns after one boundary, so
    // the two docs share chunks (fixed-size blocking would share none)
    val common = cdcChunks(base).map(_.mkString(" ")).toSet &
      cdcChunks(shifted).map(_.mkString(" ")).toSet
    assert(common.nonEmpty, "insertion must re-align to common chunks")
    // exact aggregate agreement with the query on a crafted two-source dir
    val spark2 = spark
    import spark2.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-r11-cdc").toString
    Seq((1L, base.mkString(" "), "en", "srcA", 1L),
        (2L, shifted.mkString(" "), "en", "srcB", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val all = Seq("srcA" -> cdcChunks(base), "srcB" -> cdcChunks(shifted))
      .flatMap { case (src, cs) => cs.map(c => (src, c.mkString(" "), c.length.toLong)) }
    val gcount = all.groupBy(_._2).map { case (c, o) => c -> o.size }
    val expected = all.groupBy(_._1).map { case (src, rows) =>
      val dup = rows.filter(r => gcount(r._2) >= 2)
      src -> ((rows.size.toLong, rows.map(_._2).distinct.size.toLong,
        dup.size.toLong, dup.map(_._3).sum, rows.map(_._3).sum))
    }
    val got = graft.SparkEntry.queries("q301_cdc_chunking")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
    assert(got("srcA")._4 > 0, "shared chunks must register as dup token mass")
    graft.util.QueryCaches.drain()
  }

  test("q302 systematic sample: matches Scala reference; counts are floor/ceil of k*share") {
    val docs = graft.source.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val w = docs.map(_._2)
    val pfx = w.scanLeft(0L)(_ + _) // pfx(i) exclusive, last = W
    val bigW = pfx.last
    val expected = (0 until 64).map { j =>
      val target = bigW * (2 * j + 1)
      val i = docs.indices.find(i =>
        target >= pfx(i) * 128 && target < (pfx(i) + w(i)) * 128).get
      (j.toLong, target, docs(i)._1, w(i))
    }
    val got = graft.SparkEntry.queries("q302_systematic_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected)
    // SUS guarantee: every doc is picked floor(k*p) or ceil(k*p) times
    val picks = got.groupBy(_._3).view.mapValues(_.length).toMap
    docs.foreach { case (id, wi) =>
      val kp = 64.0 * wi / bigW
      val c = picks.getOrElse(id, 0)
      assert(c >= math.floor(kp) && c <= math.ceil(kp), s"doc $id count $c vs k*p $kp")
    }
    graft.util.QueryCaches.drain()
  }

  test("q303 Poisson bootstrap: thresholds match Poisson(1) CDF; output matches reference") {
    val thr = Seq(385749L, 771499L, 964373L, 1028665L, 1044738L,
      1047952L, 1048488L, 1048565L, 1048574L)
    // pin the literal table against the recomputed CDF
    var cum = 0.0; var fact = 1.0
    val recomputed = (0 to 8).map { k =>
      if (k > 0) fact *= k
      cum += math.exp(-1.0) / fact
      math.floor(cum * (1L << 20)).toLong
    }
    assert(thr === recomputed)
    // full reference at sf0.001
    val docs = graft.source.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def u(id: Long, b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}_$b".getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(hex.substring(0, 15), 16).toLong % 1048576L
    }
    val mqs = (0 to 31).map { b =>
      val ws = docs.map { case (id, nc) => (thr.count(_ <= u(id, b)).toLong, nc) }
      (10000L * ws.map(w => w._1 * w._2).sum) / ws.map(_._1).sum
    }
    val (s1, s2) = (mqs.sum, mqs.map(m => m * m).sum)
    val expSe = BigDecimal(math.sqrt((32.0 * s2 - 1.0 * s1 * s1) / (32.0 * 31.0)) / 10000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = graft.SparkEntry.queries("q303_poisson_bootstrap")(spark, dir)
      .collect().head
    assert(r.getLong(0) === docs.length.toLong)
    assert(r.getLong(1) === (10000L * docs.map(_._2).sum) / docs.length)
    assert(r.getLong(2) === mqs.min && r.getLong(3) === mqs.max)
    assert(math.abs(r.getDouble(4) - expSe) < 1e-9)
    graft.util.QueryCaches.drain()
  }

  test("q304 graph ANN beam: matches a Scala replay; beam nodes reachable in <=3 hops") {
    val emb = graft.source.Tables.spread(
      graft.source.Tables.embeddings(spark, dir))
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val sym = Similarity.symKnnEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val entry = emb.keys.filter(_ >= 5).min
    val expected = (0L to 4L).flatMap { qid =>
      val qv = emb(qid)
      var beam = Seq(entry -> cos(qv, emb(entry)))
      var frontier = Seq(entry)
      for (_ <- 1 to 3) {
        val cand = frontier.flatMap(n => sym.getOrElse(n, Set())).distinct
        val union = (beam ++ cand.map(c => c -> cos(qv, emb(c))))
          .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).max }.toSeq
        val newBeam = union.sortBy { case (n, c) => (-c, n) }.take(4)
        frontier = newBeam.map(_._1).filterNot(beam.map(_._1).toSet)
        beam = newBeam
      }
      beam.zipWithIndex.map { case ((n, c), i) => (qid, i + 1, n, c) }
    }.toSet
    val got = graft.SparkEntry.queries("q304_graph_ann_beam")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected)
    // structural pin: every beam node is within 3 hops of the entry point
    var reach = Set(entry)
    for (_ <- 1 to 3) reach = reach ++ reach.flatMap(n => sym.getOrElse(n, Set()))
    assert(got.map(_._3).forall(reach))
    graft.util.QueryCaches.drain()
  }

  test("q297 equals a Scala reimplementation at sf0.001; invariants hold") {
    val gold = Retrieval.denseTop(spark, dir).filter("rd <= 3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fused = Retrieval.rrfFused(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = fused.groupBy(_._1).map { case (q, rows) =>
      val relRanks = rows.filter(r => gold((q, r._3))).map(_._2)
      val first = if (relRanks.isEmpty) 0L else relRanks.min.toLong
      (q, first, relRanks.size.toLong)
    }.toSet
    val got = graft.SparkEntry.queries("q297_mrr_recall")(spark, dir).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet === expected)
    got.foreach { r =>
      val (first, rr, hits, rec) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(first >= 0 && first <= 10 && hits >= 0 && hits <= 3)
      if (first == 0) assert(rr === 0.0) else assert(math.abs(rr - 1.0 / first) < 1e-6)
      assert(math.abs(rec - hits / 3.0) < 1e-6)
    }
    graft.util.QueryCaches.drain()
  }
}
